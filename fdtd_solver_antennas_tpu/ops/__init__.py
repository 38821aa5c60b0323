from .mesh import MeshBuilder, YeeGrid, smooth_mesh_lines
from .source import gaussian_excitation, gaussian_source_params

__all__ = [
    "MeshBuilder",
    "YeeGrid",
    "smooth_mesh_lines",
    "gaussian_excitation",
    "gaussian_source_params",
]
