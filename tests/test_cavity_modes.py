"""Exact analytic oracle: rectangular-cavity eigenfrequencies.

A closed PEC box has exact resonances f_mnp = (c0/2)·√((m/a)²+(n/b)²+(p/c)²).
The FDTD engine must ring at those frequencies — this measures total
discretization (dispersion) error against a closed-form answer, the
strongest pure-accuracy check available without an external solver.
"""

import numpy as np
import pytest

from fdtd_solver_antennas_tpu.models.scene import Scene
from fdtd_solver_antennas_tpu.ops.fdtd import FDTDConfig, build_simulation
from fdtd_solver_antennas_tpu.ops.mesh import MeshBuilder
from fdtd_solver_antennas_tpu.physics import C0
from fdtd_solver_antennas_tpu.post.ports import port_spectra

A_MM, B_MM, C_MM = 30.0, 20.0, 25.0  # cavity dimensions (x, y, z)


def _mode_freq(m, n, p):
    return (C0 / 2.0) * np.sqrt(
        (m / (A_MM * 1e-3)) ** 2
        + (n / (B_MM * 1e-3)) ** 2
        + (p / (C_MM * 1e-3)) ** 2
    )


@pytest.fixture(scope="module")
def cavity_spectrum():
    f101 = _mode_freq(1, 0, 1)  # 7.808 GHz (TE101, E along y)
    mb = MeshBuilder()
    mb.add_line("x", [0.0, A_MM])
    mb.add_line("y", [0.0, B_MM])
    mb.add_line("z", [0.0, C_MM])
    # off-center probe so it couples to several modes
    mb.add_line("x", [11.0])
    mb.add_line("z", [9.0])
    grid = mb.build(1.0)  # 1 mm ≈ λ/38 at f101

    scene = Scene()
    # probe along y at (11, :, 9); high R → weak loading (high Q)
    scene.add_lumped_port(
        1, 5000.0, [11.0, 0.0, 9.0], [11.0, B_MM, 9.0], direction="y"
    )
    cfg = FDTDConfig(
        n_steps_max=12_000, end_criteria=1e-30, check_every=2000,
        boundary="PEC",
    )
    sim = build_simulation(
        scene, grid, f0=f101, fc=f101 * 0.6, cfg=cfg,
        port_freqs_hz=np.linspace(4e9, 13e9, 1201),
        nf_freqs_hz=np.array([f101]),
        nf_margin_cells=2,
    )
    out = sim.run()
    sp = port_spectra(
        sim.port_freqs_hz, out["uf"][0], out["if_"][0], sim.dft_dt,
        z_ref=5000.0,
    )
    return sp


def _nearest_peak(sp, f_pred, window=0.4e9):
    mag = np.abs(sp.uf)  # cavity ringing shows as |V(f)| peaks
    win = (sp.freq_hz > f_pred - window) & (sp.freq_hz < f_pred + window)
    assert win.any()
    idx = np.where(win)[0]
    i = idx[np.argmax(mag[idx])]
    return sp.freq_hz[i], mag[i]


@pytest.mark.parametrize(
    "mode",
    [(1, 0, 1), (2, 0, 1), (1, 0, 2)],
)
def test_cavity_eigenfrequencies(cavity_spectrum, mode):
    """Measured ringing peaks within 1% of the exact eigenfrequencies."""
    f_pred = _mode_freq(*mode)
    f_meas, mag = _nearest_peak(cavity_spectrum, f_pred)
    assert f_meas == pytest.approx(f_pred, rel=0.01), (
        f"TE{mode}: predicted {f_pred / 1e9:.3f} GHz, "
        f"measured {f_meas / 1e9:.3f} GHz"
    )


def test_cavity_peaks_are_sharp(cavity_spectrum):
    """High-R probe keeps Q high: the TE101 peak towers over the floor."""
    sp = cavity_spectrum
    f101 = _mode_freq(1, 0, 1)
    _, peak = _nearest_peak(sp, f101)
    floor = np.median(np.abs(sp.uf))
    assert peak > 10 * floor


def test_dielectric_filled_cavity_scales_modes():
    """A cavity fully filled with lossless εr shifts every eigenfrequency
    by exactly 1/√εr — a closed-form check that material painting and the
    ε-dependent update coefficients are right together."""
    eps_r = 2.2
    f101 = _mode_freq(1, 0, 1) / np.sqrt(eps_r)  # ≈ 5.264 GHz

    mb = MeshBuilder()
    mb.add_line("x", [0.0, A_MM, 11.0])
    mb.add_line("y", [0.0, B_MM])
    mb.add_line("z", [0.0, C_MM, 9.0])
    grid = mb.build(1.0)

    scene = Scene()
    scene.add_material_box(
        "fill", eps_r, 0.0, [0.0, 0.0, 0.0], [A_MM, B_MM, C_MM], priority=0
    )
    scene.add_lumped_port(
        1, 5000.0, [11.0, 0.0, 9.0], [11.0, B_MM, 9.0], direction="y"
    )
    cfg = FDTDConfig(
        n_steps_max=12_000, end_criteria=1e-30, check_every=2000,
        boundary="PEC",
    )
    sim = build_simulation(
        scene, grid, f0=f101, fc=f101 * 0.6, cfg=cfg,
        port_freqs_hz=np.linspace(3e9, 9e9, 1201),
        nf_freqs_hz=np.array([f101]),
        nf_margin_cells=2,
    )
    out = sim.run()
    sp = port_spectra(
        sim.port_freqs_hz, out["uf"][0], out["if_"][0], sim.dft_dt,
        z_ref=5000.0,
    )
    f_meas, _ = _nearest_peak(sp, f101)
    assert f_meas == pytest.approx(f101, rel=0.01), (
        f"filled TE101: predicted {f101 / 1e9:.3f} GHz, "
        f"measured {f_meas / 1e9:.3f} GHz"
    )
