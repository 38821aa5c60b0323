"""Chunk-kernel roofline: measured roll-unit calibration + op model.

VERDICT r4 next #3: the repo's headline number (the VMEM-resident chunk
kernel, ~6.9 Gcell/s on the canonical patch) had no published bound.
BASELINE.md §chunk-kernel roofline carries the full model; the short
version, with every term grounded in the kernel source
(`ops/fdtd_pallas.py::build_pallas_chunk_stepper`, MUR path):

- ≈69 arithmetic + ≈20 lane-roll ops per padded element per leapfrog
  step; the flat layout pads z (50) onto 128 lanes → 2.71× padding.
- The binding resource is the cross-lane shift (roll) unit, not VPU
  arithmetic and not VMEM bandwidth — proven by the PML differential:
  the CPML variant adds +52% arithmetic and +24 resident arrays but
  zero rolls, and costs only −2.2% (6.72 vs 6.87 Gcell/s, bench_local).

This script calibrates the roll unit directly: a VMEM-resident pallas
kernel of the kernel's own array shape running a chain of dependent
lane rolls (by 1 and by 128 — the two patterns the curls use) with one
multiply-add between them, timed with host materialization (an earlier
draft trusted ``block_until_ready`` alone; through the axon tunnel that
returned instantly and read ~0 wall — the printed sanity guard now
rejects any wall under 1 ms).

  bound = roll_rate / (20 rolls/elem × 2.71 padding)

Usage:  python examples/chunk_roofline.py
Prints one JSON line; the derived bound backs the BASELINE.md section.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ROLL_OPS = 20
ARITH_OPS = 69
PAD = 394240 / 145530  # canonical patch: padded flat elems / valid cells


def calibrate_rolls(R: int = 56, C: int = 55 * 128, iters: int = 200,
                    best_of: int = 3) -> dict:
    """Attainable lane-roll throughput on the kernel's array shape.

    Per iteration: 4 dependent rolls (2×roll-by-1, 2×roll-by-128 — the
    curl patterns) + 2 multiply-adds keeping the chain live.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROLLS_PER_ITER = 4

    def kern(a_ref, o_ref):
        a = a_ref[:]

        def body(i, x):
            x = pltpu.roll(x, 1, 1) + a
            x = pltpu.roll(x, 128, 1) * np.float32(0.9999)
            x = pltpu.roll(x, C - 1, 1) + a
            x = pltpu.roll(x, C - 128, 1) * np.float32(0.9999)
            return x

        o_ref[:] = jax.lax.fori_loop(0, iters, body, a)

    f = jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0.5, 1.5, (R, C)), jnp.float32)
    np.asarray(f(a))  # warm-up: compile + run, host-materialized
    wall = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        s = float(np.asarray(f(a)).sum())
        wall = min(wall, time.perf_counter() - t0)
    assert np.isfinite(s)
    assert wall > 1e-3, (
        f"wall {wall:.2e}s is below the plausibility floor — the timed "
        "call did not actually execute (async-dispatch artifact)"
    )
    elems = R * C * iters
    return {
        "roll_gelems_per_s": ROLLS_PER_ITER * elems / wall / 1e9,
        "wall_s": wall,
        "shape": [R, C],
        "iters": iters,
    }


def main() -> None:
    from fdtd_solver_antennas_tpu.utils.backend import (
        enable_compile_cache,
        ensure_backend,
    )

    ensure_backend()
    enable_compile_cache()
    cal = calibrate_rolls()
    bound = cal["roll_gelems_per_s"] / ROLL_OPS / PAD
    print(json.dumps({
        "metric": "chunk_kernel_roofline",
        "roll_rate_gelems_per_s": round(cal["roll_gelems_per_s"], 1),
        "rolls_per_padded_elem": ROLL_OPS,
        "padding_factor": round(PAD, 3),
        "bound_gcells_per_s": round(bound, 2),
        "calibration": {k: (round(v, 5) if isinstance(v, float) else v)
                        for k, v in cal.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
