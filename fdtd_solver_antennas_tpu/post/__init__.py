from .ports import PortSpectra, port_spectra, find_resonance
from .nf2ff import FarField, nf2ff_transform

__all__ = [
    "PortSpectra",
    "port_spectra",
    "find_resonance",
    "FarField",
    "nf2ff_transform",
]
