from .ports import PortSpectra, accepted_power, find_resonance, port_spectra
from .nf2ff import FarField, nf2ff_transform
from .checkpoint import load_state, save_state
from .touchstone import (
    format_touchstone,
    read_touchstone,
    renormalize_s,
    write_touchstone,
)

__all__ = [
    "format_touchstone",
    "read_touchstone",
    "renormalize_s",
    "write_touchstone",
    "PortSpectra",
    "port_spectra",
    "find_resonance",
    "accepted_power",
    "FarField",
    "nf2ff_transform",
    "save_state",
    "load_state",
]
