"""Tests for the pure pattern-processing helpers shared by the UIs."""

import numpy as np
import pytest

from fdtd_solver_antennas_tpu.viz.patterns import (
    classify_pattern,
    interpolate_cuts_to_sphere,
    mirror_half_cut,
)


def test_classify_thresholds():
    # reference thresholds: <3 dB isotropic, >20 dB highly directional
    assert classify_pattern(np.array([0.0, -2.0]))[0].startswith("Too isotropic")
    assert classify_pattern(np.array([0.0, -25.0]))[0] == "Highly directional"
    assert classify_pattern(np.array([0.0, -10.0]))[0] == "Moderately directional"
    label, dr = classify_pattern(np.array([]))
    assert label == "No data" and dr == 0.0


def test_interpolation_endpoints():
    e = np.array([0.0, -3.0, -10.0])
    h = np.array([-1.0, -5.0, -20.0])
    phi, grid = interpolate_cuts_to_sphere(e, h, num_phi=73)
    assert grid.shape == (3, 73)
    i0 = 0  # φ = 0 → pure E-plane
    i90 = np.argmin(np.abs(phi - np.pi / 2))
    i180 = np.argmin(np.abs(phi - np.pi))
    np.testing.assert_allclose(grid[:, i0], e)
    np.testing.assert_allclose(grid[:, i90], h, atol=1e-9)
    np.testing.assert_allclose(grid[:, i180], e, atol=1e-9)


def test_interpolation_bounds():
    e = np.array([0.0, -3.0])
    h = np.array([-6.0, -9.0])
    _, grid = interpolate_cuts_to_sphere(e, h)
    # blend never exceeds the cut extremes
    assert grid.max() <= max(e.max(), h.max()) + 1e-12
    assert grid.min() >= min(e.min(), h.min()) - 1e-12


def test_interpolation_validates():
    with pytest.raises(ValueError):
        interpolate_cuts_to_sphere(np.zeros(3), np.zeros(4))


def test_mirror_half_cut():
    theta = np.linspace(0, np.pi, 5)
    vals = np.array([0.0, -1.0, -2.0, -3.0, -4.0])
    th_full, v_full = mirror_half_cut(theta, vals)
    assert len(th_full) == 10
    assert th_full.max() == pytest.approx(2 * np.pi)
    np.testing.assert_allclose(v_full[:5], vals)
    np.testing.assert_allclose(v_full[5:], vals[::-1])


def test_webapp_gated_import():
    """Without streamlit installed, main() raises a clear ImportError."""
    from fdtd_solver_antennas_tpu.frontends import webapp

    try:
        import streamlit  # noqa: F401

        pytest.skip("streamlit installed; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="streamlit is not installed"):
        webapp.main()
