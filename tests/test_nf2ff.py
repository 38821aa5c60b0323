"""NF2FF validation against antenna theory: a short (Hertzian-like) dipole
must show D ≈ 1.5–1.8, sin²θ-like pattern, and vanishing cross-pol."""

import numpy as np
import pytest

from fdtd_solver_antennas_tpu.models.scene import Scene
from fdtd_solver_antennas_tpu.ops.fdtd import FDTDConfig, build_simulation
from fdtd_solver_antennas_tpu.ops.mesh import MeshBuilder
from fdtd_solver_antennas_tpu.post.nf2ff import nf2ff_transform


@pytest.fixture(scope="module")
def short_dipole_ff():
    """Short z-dipole: 10 mm arms at 1.5 GHz (L/λ = 0.1)."""
    f0 = 1.5e9
    mb = MeshBuilder()
    mb.add_line("x", [-60, 60, 0.0])
    mb.add_line("y", [-60, 60, 0.0])
    mb.add_line("z", [-60, 60])
    mb.add_line("z", [-10, -2.5, 0.0, 2.5, 10])
    grid = mb.build(5.0)
    scene = Scene()
    scene.add_metal_box("arm1", [0, 0, 2.5], [0, 0, 10], priority=10)
    scene.add_metal_box("arm2", [0, 0, -10], [0, 0, -2.5], priority=10)
    scene.add_lumped_port(1, 50.0, [0, 0, -2.5], [0, 0, 2.5], direction="z")
    cfg = FDTDConfig(n_steps_max=8000, end_criteria=1e-6, check_every=500)
    sim = build_simulation(
        scene, grid, f0=f0, fc=f0 / 2, cfg=cfg,
        nf_freqs_hz=np.array([f0]),
    )
    out = sim.run()
    theta = np.arange(0.0, 181.0, 5.0)
    phi = np.arange(0.0, 360.0, 15.0)
    ff = nf2ff_transform(
        sim.faces, out["nf_e"], out["nf_h"], sim.dt,
        np.array([f0]), theta, phi,
    )
    return ff, theta, phi


def test_dipole_directivity(short_dipole_ff):
    ff, _, _ = short_dipole_ff
    # Hertzian dipole D = 1.5 (1.76 dBi); short-but-finite → up to ~1.9
    assert 1.3 < ff.Dmax[0] < 2.1


def test_dipole_pattern_shape(short_dipole_ff):
    ff, theta, phi = short_dipole_ff
    e = ff.E_norm[0]
    i90 = int(np.argmin(np.abs(theta - 90)))
    # null on axis, max broadside (θ=90°)
    assert e[i90].min() > 5 * e[0].max()
    assert e[i90].min() > 5 * e[-1].max()
    # sin(θ) shape along a φ cut
    expect = np.sin(np.deg2rad(theta))
    got = e[:, 0] / e[:, 0].max()
    np.testing.assert_allclose(got, expect, atol=0.08)


def test_dipole_phi_symmetry(short_dipole_ff):
    ff, theta, phi = short_dipole_ff
    e = ff.E_norm[0]
    i90 = int(np.argmin(np.abs(theta - 90)))
    ring = e[i90]
    assert ring.max() / ring.min() < 1.05  # azimuthal symmetry


def test_dipole_polarization(short_dipole_ff):
    ff, theta, phi = short_dipole_ff
    # z-dipole: E_phi ≈ 0 everywhere
    ratio = np.abs(ff.E_phi[0]).max() / np.abs(ff.E_theta[0]).max()
    assert ratio < 0.05


def test_directivity_integral(short_dipole_ff):
    ff, theta, phi = short_dipole_ff
    # ∬ D sinθ dθdφ ≈ 4π when Prad is consistent with U
    th = np.deg2rad(theta)
    D = ff.directivity[0]
    dth = th[1] - th[0]
    dph = np.deg2rad(phi[1] - phi[0])
    integral = float(np.sum(D * np.sin(th)[:, None]) * dth * dph)
    assert integral == pytest.approx(4 * np.pi, rel=0.15)


def test_dbi_grid_formula(short_dipole_ff):
    ff, _, _ = short_dipole_ff
    db = ff.intensity_dbi(0)
    # peak of the dBi grid equals 10·log10(Dmax)
    assert db.max() == pytest.approx(10 * np.log10(ff.Dmax[0]), abs=1e-6)
