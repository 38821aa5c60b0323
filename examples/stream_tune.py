"""Stream-kernel (swap, Bx, T) operating-point sweep on real hardware.

VERDICT r4 next #2: the tall-grid stream kernel (z=160/y=121 patch) runs
at ~5.5 Gcell/s against a ~26 Gcell/s traffic bound — the auto-picked
point (swap=True, Bx=8, T=6) is chosen by a pure HBM-traffic model
("larger T is strictly better at fixed Bx"), but at that depth the
trapezoid recompute cone (~1.9× compute) and the per-invocation pipeline
make the kernel compute/pipeline-bound, where the model is blind. This
script measures the real operating surface: it builds the exact
bench_stream_tall_patch scene at every legal (swap, Bx, T) via the
FDTDConfig escape hatches (stream_swap / stream_bx / stream_T) and times
a fixed 4000-step run on the chip.

Usage:  python examples/stream_tune.py [--scene tall|flagship]
Prints one JSON line per configuration; the best point feeds the
resolver's model (see _pick_stream_bt) and BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_tall(swap, bx, t):
    from fdtd_solver_antennas_tpu.models.scene import Scene
    from fdtd_solver_antennas_tpu.ops.fdtd import FDTDConfig, build_simulation
    from fdtd_solver_antennas_tpu.ops.mesh import MeshBuilder

    mb = MeshBuilder()
    mb.add_line("x", list(np.linspace(-60, 60, 161)) + [-6.0])
    mb.add_line("y", np.linspace(-45, 45, 121))
    mb.add_line("z", np.linspace(-40, 56, 160))
    grid = mb.build(4.0)
    scene = Scene()
    scene.add_material_box("sub", 4.3, 0.005, [-20, -20, 0], [20, 20, 1.6], 0)
    scene.add_metal_box("patch", [-15, -12, 1.6], [15, 12, 1.6], priority=10)
    scene.add_metal_box("gnd", [-20, -20, 0], [20, 20, 0], priority=10)
    scene.add_lumped_port(1, 50.0, [-6, 0, 0], [-6, 0, 1.6], direction="z")
    cfg = FDTDConfig(
        n_steps_max=4000, end_criteria=1e-30, check_every=500,
        stream_swap=swap, stream_bx=bx, stream_T=t,
    )
    return build_simulation(
        scene, grid, f0=2.45e9, fc=1.225e9, cfg=cfg,
        port_freqs_hz=np.linspace(2e9, 3e9, 51),
        nf_freqs_hz=np.array([2.45e9]),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--swaps", type=str, default="1",
                    help="comma list of 0/1 lane orientations to try")
    ap.add_argument("--configs", type=str,
                    default="16:1,16:2,16:3,12:2,12:3,12:4,8:1,8:2,8:3,"
                            "8:4,8:5,8:6,6:2,6:4,4:2",
                    help="comma list of Bx:T points")
    args = ap.parse_args()

    import jax

    from fdtd_solver_antennas_tpu.utils.backend import (
        enable_compile_cache,
        ensure_backend,
    )

    ensure_backend()
    enable_compile_cache()

    results = []
    for swap in (bool(int(s)) for s in args.swaps.split(",")):
        for pair in args.configs.split(","):
            bx, t = (int(v) for v in pair.split(":"))
            try:
                sim = build_tall(swap, bx, t)
            except ValueError as e:
                print(json.dumps({"swap": swap, "bx": bx, "T": t,
                                  "skip": str(e)[:120]}), flush=True)
                continue
            if sim.pallas_mode != "stream":
                print(json.dumps({"swap": swap, "bx": bx, "T": t,
                                  "skip": sim.pallas_mode_reason[:120]}),
                      flush=True)
                continue
            out = sim.run()
            jax.block_until_ready(out["e_ratio"])
            wall = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                out = sim.run()
                jax.block_until_ready(out["e_ratio"])
                wall = min(wall, time.perf_counter() - t0)
            steps = int(out["steps"])
            assert np.isfinite(np.asarray(out["uf"])).all()
            g = sim.grid.num_cells * steps / wall / 1e9
            rec = {"swap": swap, "bx": bx, "T": t,
                   "gcells_per_s": round(g, 3), "wall_s": round(wall, 3),
                   "steps": steps}
            results.append(rec)
            print(json.dumps(rec), flush=True)
    if results:
        best = max(results, key=lambda r: r["gcells_per_s"])
        print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
