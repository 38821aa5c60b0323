"""Analytical solver parity tests — values pinned to the reference
implementation's output (antenna_sim/solver_approx.py) at the canonical
config, which this framework reproduces to float32 precision."""

import numpy as np
import pytest

from fdtd_solver_antennas_tpu import AnalyticalPatchSolver, PatchAntennaParams


@pytest.fixture(scope="module")
def solver():
    params = PatchAntennaParams.from_user_units(
        frequency_ghz=2.45, er=4.3, h_mm=1.6, loss_tangent=0.02
    )
    return AnalyticalPatchSolver(params)


def test_summary_reference_parity(solver):
    s = solver.summary()
    # Reference output at this exact config (run of solver_approx.summary()):
    assert s["L_mm"] == pytest.approx(29.138326192715315, rel=1e-9)
    assert s["W_mm"] == pytest.approx(37.58388632919335, rel=1e-9)
    assert s["L_eff_mm"] == pytest.approx(30.62028526143399, rel=1e-9)
    assert s["efficiency"] == pytest.approx(0.8729134855163064, rel=1e-5)
    assert s["D0_dBi"] == pytest.approx(3.0870257862476875, rel=1e-4)
    assert s["G0_dBi"] == pytest.approx(2.4967378152308743, rel=1e-4)


def test_directivity_integral(solver):
    # ∬ D sinθ dθ dφ = 4π by construction of directivity
    res = solver.compute_full_pattern(num_theta=181, num_phi=361)
    th, _ = np.meshgrid(res.theta, res.phi, indexing="ij")
    dth = res.theta[1] - res.theta[0]
    dph = res.phi[1] - res.phi[0]
    integral = float(np.sum(res.directivity * np.sin(th)) * dth * dph)
    assert integral == pytest.approx(4 * np.pi, rel=1e-3)


def test_gain_below_directivity(solver):
    res = solver.compute_full_pattern()
    assert res.peak_gain_lin < res.peak_directivity_lin
    assert np.all(res.gain <= res.directivity + 1e-9)


def test_cross_sections(solver):
    th_e, g_e = solver.cross_section_gain_lin("E")
    th_h, g_h = solver.cross_section_gain_lin("H")
    assert th_e.shape == g_e.shape == (721,)
    full = solver.compute_full_pattern()
    # cut peaks normalized to the full-pattern peak gain
    assert g_e.max() == pytest.approx(full.peak_gain_lin, rel=1e-4)
    assert g_h.max() == pytest.approx(full.peak_gain_lin, rel=1e-4)


def test_explicit_dimensions_respected():
    params = PatchAntennaParams.from_user_units(
        frequency_ghz=2.45, er=4.3, h_mm=1.6, L_mm=28.0, W_mm=36.0
    )
    s = AnalyticalPatchSolver(params)
    assert s.L_m == pytest.approx(28.0e-3)
    assert s.W_m == pytest.approx(36.0e-3)


def test_lin_to_dbi():
    out = AnalyticalPatchSolver.lin_to_dbi(np.array([1.0, 10.0, 0.0]))
    assert out[0] == pytest.approx(0.0)
    assert out[1] == pytest.approx(10.0)
    assert np.isfinite(out[2])  # floor guard
