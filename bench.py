"""Benchmark: Yee cell-update rate for the canonical 3D patch (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is Gcell-updates/s on one chip for the canonical 2.45 GHz FR-4
patch scene (the reference's fixed-solver workload, NrTS budget 30000,
EndCriteria 1e-4, MUR walls, λ/20 mesh). The reference publishes no cell
rate — BASELINE.md's north-star target is 1 Gcell/s/chip, so
``vs_baseline`` is the ratio to that 1.0 Gcell/s target.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from fdtd_solver_antennas_tpu.models.params import PatchAntennaParams
    from fdtd_solver_antennas_tpu.solvers.patch_fixed import prepare_patch_fixed

    params = PatchAntennaParams.from_user_units(
        frequency_ghz=2.45, er=4.3, h_mm=1.6, loss_tangent=0.02
    )
    prep = prepare_patch_fixed(params)
    assert prep.ok, prep.message
    sim = prep.sim

    # Warm-up: compile + one full run
    out = sim.run()
    steps_warm = int(out["steps"])

    # Timed run (compile cached)
    t0 = time.perf_counter()
    out = sim.run()
    jax.block_until_ready(out["e_ratio"])
    wall = time.perf_counter() - t0
    steps = int(out["steps"])

    # a NaN run can masquerade as a fast one (the energy guard returns
    # ratio=1.0 on NaN) — refuse to report garbage
    for f in out["fields"]:
        assert np.isfinite(np.asarray(f)).all(), "non-finite fields in bench run"
    assert float(out["e_ratio"]) < 1.0, "energy never decayed — suspicious run"

    cells = sim.grid.num_cells
    gcells = cells * steps / wall / 1e9
    result = {
        "metric": "yee_cell_updates_canonical_patch",
        "value": round(gcells, 4),
        "unit": "Gcell-updates/s/chip",
        "vs_baseline": round(gcells / 1.0, 4),
        "detail": {
            "grid": list(sim.grid.shape),
            "cells": cells,
            "steps": steps,
            "wall_s": round(wall, 4),
            "backend": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
