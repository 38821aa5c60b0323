"""Whole-chain energy conservation: radiated power through the Huygens box
must equal accepted port power, frequency by frequency.

This single check validates the port wave decomposition, the decimated DFT
scaling on both probes, the surface interpolation, and the NF2FF Poynting
flux simultaneously. It requires the resonator to ring down (tight end
criteria) — with energy still stored at termination, P_rad is truncated
while P_acc is already complete.
"""

import numpy as np
import pytest

from fdtd_solver_antennas_tpu import PatchAntennaParams
from fdtd_solver_antennas_tpu.physics import design_patch_for_frequency
from fdtd_solver_antennas_tpu.post.nf2ff import nf2ff_transform
from fdtd_solver_antennas_tpu.post.ports import accepted_power, port_spectra
from fdtd_solver_antennas_tpu.solvers.patch_fixed import prepare_patch_fixed


def _efficiencies(loss_tangent: float) -> np.ndarray:
    L_m, W_m, _ = design_patch_for_frequency(2.45e9, 4.3, 1.6e-3)
    params = PatchAntennaParams.from_user_units(
        frequency_ghz=2.45, er=4.3, h_mm=1.6, loss_tangent=loss_tangent,
        L_mm=W_m * 1e3, W_mm=L_m * 1e3,  # resonant dimension along x
    )
    prep = prepare_patch_fixed(
        params, n_steps_max=24_000, end_criteria=1e-7
    )
    assert prep.ok, prep.message
    sim = prep.sim
    out = sim.run()
    sp = port_spectra(
        sim.port_freqs_hz, out["uf"][0], out["if_"][0], sim.dft_dt
    )
    ff = nf2ff_transform(
        sim.faces, out["nf_e"], out["nf_h"], sim.dft_dt, sim.nf_freqs_hz,
        np.arange(0, 181, 5.0), np.arange(0, 360, 15.0),
    )
    pa = np.array([accepted_power(sp, f) for f in sim.nf_freqs_hz])
    return ff.P_rad / np.maximum(pa, 1e-300)


@pytest.mark.slow
def test_lossless_patch_power_balance():
    eta = _efficiencies(0.0)
    # every sampled frequency balances within 3%
    np.testing.assert_allclose(eta, 1.0, atol=0.03)


@pytest.mark.slow
def test_lossy_patch_efficiency_below_unity():
    eta = _efficiencies(0.02)
    # FR-4 losses absorb a real fraction near resonance
    assert eta.min() < 0.97
    assert np.all(eta <= 1.01)
    assert np.all(eta > 0.05)
