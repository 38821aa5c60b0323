"""Adjoint pattern-objective result: recovering broadside gain.

Round-5 extension of the inverse designer (VERDICT r4 next #9): the
adjoint is routed through the NF2FF radiation integrals
(`solvers/inverse.py::_directivity_ri`), so the optimizer can work on the
FAR FIELD — here, broadside realized gain D(θ=0)·(1−|S11(f0)|²) — instead
of only the port spectrum. No reference analog exists: the reference
explores designs by serially re-running its external engine per candidate
(`gui_app.py:2678-2874`).

Scenario: a patch PERTURBED off its design — the metallization is a
solid rectangle shrunk 12% per side, so it resonates well above 2.45 GHz
and reflects most of the feed power at f0; its broadside realized gain is
poor. The optimizer may only ADD metal around that damaged core (the seed
density), and must recover the gain by retuning the radiator.

Workflow (optimize → threshold → validate, as the module prescribes):
1. baseline: the perturbed (shrunk) patch validated through the standard
   energy-terminated engine + standard NF2FF → broadside realized gain;
2. optimize: Adam on the density logits against NEGATIVE broadside
   realized gain at f0 (fixed-step differentiable forward, the gradient
   flowing through the full FDTD loop AND the radiation integrals);
3. threshold at 0.5 and validate the binary design through the standard
   engine + `post/nf2ff.py` — the reported gain lift never rests on the
   soft density model.

Measured on one TPU v5e chip (round 5, default arguments): the 0.88×
perturbed patch has NO in-band resonance and −8.1 dBi broadside realized
gain at 2.45 GHz; after 40 Adam iterations (51 s of optimization after
compiles) the binarized design resonates at 2.548 GHz with S11 −24.9 dB
and +6.4 dBi broadside realized gain — a **+14.5 dB validated lift**,
every number from the standard energy-terminated engine + standard
NF2FF, never the soft density model. On CPU use --quick.

Usage:
    python examples/inverse_broadside_gain.py [--iters 40] [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--shrink", type=float, default=0.88,
                    help="perturbed-patch linear size vs the closed form")
    ap.add_argument("--outdir", type=str, default="outputs")
    ap.add_argument("--quick", action="store_true",
                    help="small CPU-friendly configuration (coarser mesh, "
                         "fewer iterations)")
    args = ap.parse_args()

    from fdtd_solver_antennas_tpu.models.params import PatchAntennaParams
    from fdtd_solver_antennas_tpu.physics import design_patch_for_frequency
    from fdtd_solver_antennas_tpu.solvers.inverse import prepare_patch_inverse
    from fdtd_solver_antennas_tpu.utils.backend import (
        enable_compile_cache,
        ensure_backend,
    )

    try:
        ensure_backend()
    except Exception:
        pass
    enable_compile_cache()

    f0 = 2.45e9
    params = PatchAntennaParams.from_user_units(
        frequency_ghz=2.45, er=4.3, h_mm=1.6, loss_tangent=0.02
    )
    L_m, W_m, _ = design_patch_for_frequency(f0, 4.3, 1.6e-3)

    mesh_divisor = 12.0 if args.quick else 16.0
    n_iters = 6 if args.quick else int(args.iters)
    prob = prepare_patch_inverse(
        params,
        freqs_hz=np.linspace(0.96 * f0, 1.04 * f0, 5),
        mesh_divisor=mesh_divisor,
        fc_hz=f0,  # wide band halves the source → cheaper iterations
        n_steps_max_validate=12_000,
    )
    r = prob.region
    print(f"grid {prob.sim.grid.shape}, design pixels {r.shape}, "
          f"{prob.n_steps} differentiable steps/iter")

    # -- seed: the perturbed (shrunk, detuned) patch ------------------------
    g = prob.sim.grid
    cx = 0.5 * (g.lines["x"][r.i0:r.i1] + g.lines["x"][r.i0 + 1:r.i1 + 1])
    cy = 0.5 * (g.lines["y"][r.j0:r.j1] + g.lines["y"][r.j0 + 1:r.j1 + 1])
    s = float(args.shrink)
    wx, wy = W_m / 2 * 1e3 * s, L_m / 2 * 1e3 * s
    seed = (
        (np.abs(cx)[:, None] <= wx) & (np.abs(cy)[None, :] <= wy)
    ).astype(np.float32)
    print(
        f"perturbed patch: {2 * wx:.1f} × {2 * wy:.1f} mm "
        f"(closed form {W_m * 1e3:.1f} × {L_m * 1e3:.1f} mm)"
    )

    def _fmt_res(out) -> str:
        # a badly detuned design may have no in-band dip at all —
        # find_resonance then reports None
        if out["f_res_hz"] is None or out["s11_db"] is None:
            return "no in-band resonance"
        return (f"resonance {out['f_res_hz'] / 1e9:.3f} GHz, "
                f"S11(f_res) {out['s11_db']:.1f} dB")

    base = prob.validate(seed, pattern=True)
    g_base = base["broadside_realized_gain_dbi"]
    print(
        f"baseline (perturbed patch): {_fmt_res(base)}, "
        f"broadside realized gain at f0 {g_base:.2f} dBi"
    )

    # -- adjoint optimization on the far-field objective --------------------
    t0 = time.perf_counter()
    res = prob.optimize(
        rho0=np.clip(seed, 0.02, 0.98),  # optimizer may add or trim metal
        n_iters=n_iters, lr=0.08, beta_sharpen=4.0,
        objective="broadside_gain",
    )
    print(
        f"optimized {n_iters} iterations in {time.perf_counter() - t0:.0f}s; "
        f"soft realized gain {-res.history[0]:.2f} → {-res.history[-1]:.2f} "
        "(linear)"
    )

    # -- validate the binarized design through the standard engine ----------
    val = prob.validate(res.rho, pattern=True)
    g_opt = val["broadside_realized_gain_dbi"]
    print(
        f"validated optimized design: {_fmt_res(val)}, "
        f"broadside realized gain at f0 {g_opt:.2f} dBi  "
        f"(lift {g_opt - g_base:+.2f} dB)"
    )

    # -- figure --------------------------------------------------------------
    import pathlib

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    outdir = pathlib.Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    fig, axes = plt.subplots(1, 3, figsize=(14, 4.2))
    for ax, rho, title in (
        (axes[0], seed, "perturbed seed"),
        (axes[1], (np.asarray(res.rho) >= 0.5).astype(float), "optimized"),
    ):
        ax.imshow(
            rho.T, origin="lower", cmap="copper",
            extent=[r.x_mm[0], r.x_mm[1], r.y_mm[0], r.y_mm[1]],
            aspect="equal",
        )
        ax.set_title(title)
        ax.set_xlabel("x (mm)")
    axes[0].set_ylabel("y (mm)")
    for tag, out, style in (("perturbed", base, "--"),
                            ("optimized", val, "-")):
        sp = out["spectra"]
        db = 20 * np.log10(np.abs(sp.s11) + 1e-12)
        gain = out["broadside_realized_gain_dbi"]
        axes[2].plot(sp.freq_hz / 1e9, db, style,
                     label=f"{tag}: {gain:.1f} dBi broadside")
    axes[2].axvline(f0 / 1e9, color="k", lw=0.8, alpha=0.6)
    axes[2].set_xlabel("frequency (GHz)")
    axes[2].set_ylabel("S11 (dB)")
    axes[2].set_title("validated through the standard engine")
    axes[2].legend(fontsize=8)
    axes[2].grid(alpha=0.3)
    fig.tight_layout()
    path = outdir / "inverse_broadside_gain.png"
    fig.savefig(path, dpi=160)
    print(f"Saved: {path}")

    if not args.quick:
        assert g_opt > g_base + 1.0, (
            f"expected ≥1 dB validated gain lift, got {g_opt - g_base:+.2f}"
        )
        print(f"HEADLINE OK: broadside realized gain {g_base:.1f} → "
              f"{g_opt:.1f} dBi, validated through the standard engine")


if __name__ == "__main__":
    main()
