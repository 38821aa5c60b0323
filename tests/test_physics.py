"""Unit tests for design equations — the reference behavioral contract
(SURVEY §6): canonical config 2.45 GHz / εr 4.3 / h 1.6 mm → L≈28.8 mm,
W≈37.2 mm."""

import numpy as np
import pytest

from fdtd_solver_antennas_tpu import physics


def test_constants():
    assert physics.C0 == pytest.approx(299_792_458.0)
    assert physics.ETA0 == pytest.approx(376.73, rel=1e-3)
    assert physics.EPS0 * physics.MU0 * physics.C0**2 == pytest.approx(1.0)


def test_canonical_design():
    # Exact values produced by the reference implementation
    # (antenna_sim/physics.py:41-48) at 2.45 GHz, εr 4.3, h 1.6 mm.
    L, W, eps_eff = physics.design_patch_for_frequency(2.45e9, 4.3, 1.6e-3)
    assert L * 1e3 == pytest.approx(29.138326192715315, rel=1e-9)
    assert W * 1e3 == pytest.approx(37.58388632919335, rel=1e-9)
    assert eps_eff == pytest.approx(3.992369978725543, rel=1e-9)


def test_effective_eps_bounds():
    # ε_eff must lie between 1 and εr, monotone in W/h
    for w_h in (0.5, 1.0, 2.0, 10.0):
        e = physics.effective_eps(4.3, 1.6e-3, w_h * 1.6e-3)
        assert 1.0 < e < 4.3
    wide = physics.effective_eps(4.3, 1.6e-3, 100 * 1.6e-3)
    narrow = physics.effective_eps(4.3, 1.6e-3, 0.5 * 1.6e-3)
    assert wide > narrow  # thicker line → closer to εr


def test_delta_l_positive():
    eps_eff = physics.effective_eps(4.3, 1.6e-3, 37e-3)
    dL = physics.delta_L(eps_eff, 1.6e-3, 37e-3)
    assert 0 < dL < 2e-3  # sub-mm edge extension


def test_jinc():
    x = np.array([0.0, 1e-15, np.pi / 2, np.pi])
    out = np.asarray(physics.jinc(x))
    assert out[0] == pytest.approx(1.0)
    assert out[1] == pytest.approx(1.0)
    assert out[2] == pytest.approx(2 / np.pi, rel=1e-6)
    assert abs(out[3]) < 1e-6


def test_pattern_broadside_max():
    L, W, _ = physics.design_patch_for_frequency(2.45e9, 4.3, 1.6e-3)
    k0 = 2 * np.pi * 2.45e9 / physics.C0
    th = np.linspace(0, np.pi, 91)
    ph = np.linspace(0, 2 * np.pi, 181)
    T, P = np.meshgrid(th, ph, indexing="ij")
    U = np.asarray(physics.rect_patch_power_pattern(L, W, k0, T, P))
    # maximum at broadside (θ=0)
    assert U[0, 0] == pytest.approx(U.max(), rel=1e-5)  # float32 compute
    assert np.all(U >= 0)


def test_efficiency_range():
    eta = physics.estimate_efficiency(4.3, 0.02, 5.8e7, 35e-6, 2.45e9)
    assert 0.5 <= eta <= 0.98


def test_substrate_conductivity_formula():
    # κ = 2πf·ε0·εr·tanδ — the *correct* formula (the reference's fixed
    # solver has a spurious 1e-3; we must not replicate it)
    k = physics.substrate_conductivity(2.45e9, 4.3, 0.02)
    expected = 2 * np.pi * 2.45e9 * physics.EPS0 * 4.3 * 0.02
    assert k == pytest.approx(expected, rel=1e-12)
