from .analytical import AnalyticalPatchSolver, SolverResult
from .base import (
    SolverProbe,
    SolverPrepared,
    FDTDSolverResult,
    OpenEMSProbe,
    OpenEMSPrepared,
    OpenEMSResult,
)

__all__ = [
    "AnalyticalPatchSolver",
    "SolverResult",
    "SolverProbe",
    "SolverPrepared",
    "FDTDSolverResult",
    "OpenEMSProbe",
    "OpenEMSPrepared",
    "OpenEMSResult",
]
