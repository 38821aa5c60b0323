"""Lumped-port physics: passivity, impedance sign, resonance discovery,
and the uf_inc/uf_ref contract."""

import numpy as np
import pytest

from fdtd_solver_antennas_tpu.models.scene import Scene
from fdtd_solver_antennas_tpu.ops.fdtd import FDTDConfig, build_simulation
from fdtd_solver_antennas_tpu.ops.mesh import MeshBuilder
from fdtd_solver_antennas_tpu.post.ports import (
    PortSpectra,
    find_resonance,
    port_spectra,
)


@pytest.fixture(scope="module")
def dipole_run():
    """Half-wave dipole (L = 50 mm → resonance ≈ 2.5 GHz when fat)."""
    mb = MeshBuilder()
    mb.add_line("x", [-60, 60, 0.0])
    mb.add_line("y", [-60, 60, 0.0])
    mb.add_line("z", [-60, 60])
    mb.add_line("z", [-25, -5.0, 0.0, 5.0, 25])
    grid = mb.build(5.0)
    scene = Scene()
    scene.add_metal_box("arm1", [0, 0, 5], [0, 0, 25], priority=10)
    scene.add_metal_box("arm2", [0, 0, -25], [0, 0, -5], priority=10)
    scene.add_lumped_port(1, 50.0, [0, 0, -5], [0, 0, 5], direction="z")
    cfg = FDTDConfig(n_steps_max=6000, end_criteria=1e-5, check_every=500)
    sim = build_simulation(scene, grid, f0=2.8e9, fc=1.4e9, cfg=cfg)
    out = sim.run()
    return sim, out


def test_port_passivity(dipole_run):
    sim, out = dipole_run
    sp = port_spectra(sim.port_freqs_hz, out["uf"][0], out["if_"][0], sim.dt)
    assert np.all(np.abs(sp.s11) <= 1.0 + 1e-3)  # passive network


def test_port_impedance_positive_real(dipole_run):
    sim, out = dipole_run
    sp = port_spectra(sim.port_freqs_hz, out["uf"][0], out["if_"][0], sim.dt)
    assert np.all(sp.z_in.real > 0)


def test_dipole_resonance(dipole_run):
    """Fat half-wave dipole resonates in the 2.2–2.9 GHz window with a
    deep S11 dip and near-real Zin at resonance."""
    sim, out = dipole_run
    sp = port_spectra(sim.port_freqs_hz, out["uf"][0], out["if_"][0], sim.dt)
    f_res, s11_db = find_resonance(sp, 2.8e9)
    assert s11_db is not None and s11_db < -10.0
    assert 2.2e9 < f_res < 2.9e9
    i = int(np.argmin(np.abs(sp.freq_hz - f_res)))
    z = sp.z_in[i]
    assert 20 < z.real < 150
    assert abs(z.imag) < 40


def test_uf_inc_ref_contract():
    """uf_inc = ½(uf + Z·if); uf_ref = uf − uf_inc; s11 = uf_ref/uf_inc —
    the reference's exact decomposition (microstrip.py:406-424)."""
    f = np.array([1e9, 2e9])
    uf = np.array([1.0 + 0.5j, 2.0 - 1.0j])
    if_ = np.array([0.01 + 0.002j, 0.03 - 0.01j])
    sp = port_spectra(f, uf, if_, dt=1.0, z_ref=50.0)
    np.testing.assert_allclose(sp.uf_inc, 0.5 * (uf + 50.0 * if_))
    np.testing.assert_allclose(sp.uf_ref, uf - sp.uf_inc)
    np.testing.assert_allclose(sp.s11, sp.uf_ref / sp.uf_inc)
    np.testing.assert_allclose(sp.z_in, uf / if_)


def test_find_resonance_fallback():
    """No dip below −10 dB → returns the target frequency (reference
    rule, microstrip.py:416-424)."""
    f = np.linspace(1e9, 3e9, 5)
    s11 = np.full(5, 0.9 + 0j)  # ~−0.9 dB everywhere
    sp = PortSpectra(
        freq_hz=f, uf=s11, if_=s11, uf_inc=np.ones(5), uf_ref=s11,
        s11=s11, z_in=np.ones(5) * 50, z_ref=50.0,
    )
    f_res, s11_db = find_resonance(sp, 2.2e9)
    assert f_res == 2.2e9
    assert s11_db is None
