"""Vmapped geometry sweep: S11 over a family of patch designs in one
compiled program. Prints each variant's resonance and dip depth.

Run: python examples/design_sweep.py
"""

# allow running from a source checkout without installation
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


import numpy as np

from fdtd_solver_antennas_tpu import PatchAntennaParams
from fdtd_solver_antennas_tpu.solvers.sweep import (
    prepare_patch_geometry_sweep,
    run_patch_geometry_sweep,
)


def main():
    variants = [
        PatchAntennaParams.from_user_units(
            frequency_ghz=2.45, er=4.3, h_mm=1.6, L_mm=L, W_mm=W
        )
        for (L, W) in [(26.0, 34.0), (29.1, 37.6), (32.0, 41.0)]
    ]
    prep = prepare_patch_geometry_sweep(variants, n_steps_max=12_000)
    assert prep.ok, prep.message
    res = run_patch_geometry_sweep(prep, verbose=1)
    assert res.ok, res.message
    for v, sp, s11_min in zip(variants, res.spectra, res.s11_min_db):
        db = 20 * np.log10(np.abs(sp.s11) + 1e-30)
        i = int(np.argmin(db))
        print(
            f"L={v.L_mm:.1f} W={v.W_mm:.1f} mm → dip {db[i]:.1f} dB at "
            f"{sp.freq_hz[i] / 1e9:.3f} GHz"
        )


if __name__ == "__main__":
    main()
