from .mesh import MeshBuilder, YeeGrid, smooth_mesh_lines
from .source import gaussian_excitation, gaussian_source_params
from .fdtd import FDTDConfig, PreparedSimulation, build_simulation
from .voxelize import VoxelizedScene, voxelize

__all__ = [
    "MeshBuilder",
    "YeeGrid",
    "smooth_mesh_lines",
    "gaussian_excitation",
    "gaussian_source_params",
    "FDTDConfig",
    "PreparedSimulation",
    "build_simulation",
    "VoxelizedScene",
    "voxelize",
]
