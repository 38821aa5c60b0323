"""Checkpoint / resume for long FDTD runs.

The reference's resume unit is the prepare/run split plus the C++ engine's
disk dumps, which let post-processing repeat without re-simulating
(SURVEY §5; ``streamlit_app.py:25-26,155,243``). Here the prepare/run split
is kept (prepare = build + jit, run = scan), post-processing always works
from the in-memory DFT accumulators, and *mid-run* checkpointing — which
the reference cannot do at all — saves the raw loop state (fields, CPML
ψ, port/NF2FF DFT accumulators, step count, energy tracker) to one ``.npz``
so a run can continue in a later process via
``sim.run(resume_state=load_state(path))``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np


def _npz_path(path) -> Path:
    """np.savez_compressed silently appends '.npz' to suffix-less paths;
    normalize here so save/load round-trip on the SAME string."""
    path = Path(path)
    return path if path.suffix == ".npz" else path.with_suffix(
        path.suffix + ".npz")


def save_state(path, out_or_state: Dict) -> None:
    """Persist a run's resumable state to ``path`` (.npz).

    Accepts either a full ``sim.run()`` output dict (uses its ``state``
    entry) or the state pytree itself.
    """
    path = _npz_path(path)
    state = out_or_state.get("state", out_or_state)
    flat: Dict[str, np.ndarray] = {}
    for i, f in enumerate(state["fields"]):
        flat[f"field_{i}"] = np.asarray(f)
    for grp in ("psi_e", "psi_h"):
        for k, v in state[grp].items():
            flat[f"{grp}_{k}"] = np.asarray(v)
    for k in ("uf", "if_", "nf_e", "nf_h", "n", "e_max", "e_ratio"):
        flat[k] = np.asarray(state[k])
    if "decim" in state:  # cadence tag for cross-decimation resume
        flat["decim"] = np.asarray(state["decim"])
    np.savez_compressed(Path(path), **flat)


def load_state(path) -> Dict:
    """Load a state saved by :func:`save_state` into the pytree layout
    ``sim.run(resume_state=...)`` expects."""
    with np.load(_npz_path(path)) as z:
        data = {k: z[k] for k in z.files}
    n_fields = sum(1 for k in data if k.startswith("field_"))
    fields = tuple(
        data[f"field_{i}"] for i in range(n_fields)
    )
    psi_e = {
        k.split("_", 2)[2]: v for k, v in data.items() if k.startswith("psi_e_")
    }
    psi_h = {
        k.split("_", 2)[2]: v for k, v in data.items() if k.startswith("psi_h_")
    }
    return dict(
        fields=fields,
        psi_e=psi_e,
        psi_h=psi_h,
        uf=data["uf"],
        if_=data["if_"],
        nf_e=data["nf_e"],
        nf_h=data["nf_h"],
        n=np.int32(data["n"]),
        e_max=np.float32(data["e_max"]),
        e_ratio=np.float32(data["e_ratio"]),
        **({"decim": np.int32(data["decim"])} if "decim" in data else {}),
    )
