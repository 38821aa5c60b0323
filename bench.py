"""Benchmark: Yee cell-update rates on one chip (BASELINE.json north star).

Prints one JSON line per metric (the driver records each):

1. ``yee_cell_updates_canonical_patch`` — the canonical 2.45 GHz FR-4 patch
   (the reference's fixed-solver workload: NrTS 30000, EndCriteria 1e-4,
   MUR walls, λ/20 mesh). Runs on the VMEM-resident Pallas chunk kernel.
2. ``yee_cell_updates_large_mixed_scene`` — the 4.2M-cell mixed
   patch+horn scene (examples/mixed_patch_horn.py geometry, z > 128).
   Runs on the HBM-streaming trapezoidal Pallas kernel.
3. ``yee_cell_updates_pml_patch`` — the canonical patch with PML_8 walls
   (the reference legacy solver's boundary, ``solver_fdtd_openems.py:188``).
   Runs on the XLA path (CPML state is not in a Pallas kernel yet).

The reference publishes no cell rate — BASELINE.md's north-star target is
1 Gcell/s/chip, so ``vs_baseline`` is the ratio to 1.0 Gcell/s for every
metric.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _timed_run(sim):
    """Warm-up run (compile + full run), then a timed run."""
    import jax

    out = sim.run()
    jax.block_until_ready(out["e_ratio"])
    t0 = time.perf_counter()
    out = sim.run()
    jax.block_until_ready(out["e_ratio"])
    wall = time.perf_counter() - t0
    steps = int(out["steps"])

    # a NaN run can masquerade as a fast one (the energy guard returns
    # ratio=1.0 on NaN) — refuse to report garbage
    for f in out["fields"]:
        assert np.isfinite(np.asarray(f)).all(), "non-finite fields in bench"
    assert float(out["e_ratio"]) < 1.0, "energy never decayed — suspicious"
    return out, wall, steps


def _emit(metric: str, sim, wall: float, steps: int) -> None:
    import jax

    cells = sim.grid.num_cells
    gcells = cells * steps / wall / 1e9
    print(json.dumps({
        "metric": metric,
        "value": round(gcells, 4),
        "unit": "Gcell-updates/s/chip",
        "vs_baseline": round(gcells / 1.0, 4),
        "detail": {
            "grid": list(sim.grid.shape),
            "cells": cells,
            "steps": steps,
            "wall_s": round(wall, 4),
            "kernel": sim.pallas_mode or "xla",
            "backend": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
        },
    }), flush=True)


def bench_canonical_patch() -> None:
    from fdtd_solver_antennas_tpu.models.params import PatchAntennaParams
    from fdtd_solver_antennas_tpu.solvers.patch_fixed import prepare_patch_fixed

    params = PatchAntennaParams.from_user_units(
        frequency_ghz=2.45, er=4.3, h_mm=1.6, loss_tangent=0.02
    )
    prep = prepare_patch_fixed(params)
    assert prep.ok, prep.message
    out, wall, steps = _timed_run(prep.sim)
    _emit("yee_cell_updates_canonical_patch", prep.sim, wall, steps)


def bench_large_mixed_scene() -> None:
    """The 4.2M-cell mixed patch+horn scene from examples/mixed_patch_horn."""
    from fdtd_solver_antennas_tpu import HornAntennaParams, PatchAntennaParams
    from fdtd_solver_antennas_tpu.frontends.designer import MultiPatchScene

    scene = MultiPatchScene()
    scene.add_patch(
        PatchAntennaParams.from_user_units(
            frequency_ghz=2.45, er=4.3, h_mm=1.6, loss_tangent=0.02
        )
    )
    scene.add_horn(
        HornAntennaParams.from_user_units(
            frequency_ghz=2.45, throat_a_mm=86.0, throat_b_mm=43.0,
            aperture_A_mm=150.0, aperture_B_mm=110.0, length_mm=60.0,
        ),
        center_x_m=0.18, rot_z_deg=25.0,
    )
    scene.controls.mesh_quality = 2
    prep = scene.prepare()
    assert prep.ok, prep.message
    out, wall, steps = _timed_run(prep.sim)
    _emit("yee_cell_updates_large_mixed_scene", prep.sim, wall, steps)


def bench_pml_patch() -> None:
    from fdtd_solver_antennas_tpu.models.params import PatchAntennaParams
    from fdtd_solver_antennas_tpu.solvers.patch_fixed import prepare_patch_fixed

    params = PatchAntennaParams.from_user_units(
        frequency_ghz=2.45, er=4.3, h_mm=1.6, loss_tangent=0.02
    )
    prep = prepare_patch_fixed(params, boundary="PML_8")
    assert prep.ok, prep.message
    out, wall, steps = _timed_run(prep.sim)
    _emit("yee_cell_updates_pml_patch", prep.sim, wall, steps)


def main() -> None:
    bench_canonical_patch()
    try:
        bench_large_mixed_scene()
    except Exception as e:  # never lose the primary metric to an add-on
        print(json.dumps({"metric": "yee_cell_updates_large_mixed_scene",
                          "error": str(e)[:300]}), flush=True)
    try:
        bench_pml_patch()
    except Exception as e:
        print(json.dumps({"metric": "yee_cell_updates_pml_patch",
                          "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
