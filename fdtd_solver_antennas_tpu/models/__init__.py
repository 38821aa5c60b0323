from .params import (
    Metal,
    MetalProperties,
    metal_defaults,
    PatchAntennaParams,
    HornAntennaParams,
)
from .scene import (
    Material,
    PEC,
    Box,
    ConvexPolyhedron,
    make_plate,
    LumpedPortSpec,
    MSLPortSpec,
    NF2FFBoxSpec,
    Scene,
    rotation_matrix,
)

__all__ = [
    "Metal",
    "MetalProperties",
    "metal_defaults",
    "PatchAntennaParams",
    "HornAntennaParams",
    "Material",
    "PEC",
    "Box",
    "ConvexPolyhedron",
    "make_plate",
    "LumpedPortSpec",
    "MSLPortSpec",
    "NF2FFBoxSpec",
    "Scene",
    "rotation_matrix",
]
