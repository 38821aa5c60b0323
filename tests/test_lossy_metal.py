"""Physical conductor loss: finite-conductivity thin-sheet metallization.

The reference models all metal as PEC (openEMS AddMetal); radiation
efficiency there captures dielectric loss only, with conductor loss coming
from the analytical heuristic (reference physics.py:84). Here lossy sheets
enter the FDTD update as added edge conductivity, so η = P_rad/P_acc drops
monotonically as σ decreases — a physical power-balance effect.
"""

import numpy as np
import pytest

from fdtd_solver_antennas_tpu.models.scene import Scene
from fdtd_solver_antennas_tpu.ops.fdtd import FDTDConfig, build_simulation
from fdtd_solver_antennas_tpu.ops.mesh import MeshBuilder
from fdtd_solver_antennas_tpu.physics import sheet_conductance, skin_depth
from fdtd_solver_antennas_tpu.post.nf2ff import nf2ff_transform, select_face_freqs
from fdtd_solver_antennas_tpu.post.ports import port_spectra, accepted_power


F0 = 2.45e9


def _run_patch(sigma_s=None, n_steps=8000):
    """Lossless-substrate patch; metal is PEC (sigma_s None) or a sheet."""
    mb = MeshBuilder()
    mb.add_line("x", [-40, 40, 0.0, -6.0])
    mb.add_line("y", [-40, 40, 0.0])
    mb.add_line("z", [-25, 35])
    mb.add_line("z", np.linspace(0, 1.6, 4))
    mb.add_metal_edges([-15, -12, 1.6], [15, 12, 1.6], dirs="xy",
                       metal_edge_res=1.5)
    grid = mb.build(3.0)
    scene = Scene()
    scene.add_material_box("sub", 4.3, 0.0, [-20, -20, 0], [20, 20, 1.6], 0)
    if sigma_s is None:
        scene.add_metal_box("patch", [-15, -12, 1.6], [15, 12, 1.6], priority=10)
        scene.add_metal_box("gnd", [-20, -20, 0], [20, 20, 0], priority=10)
    else:
        scene.add_conductive_sheet(
            "patch", sigma_s, [-15, -12, 1.6], [15, 12, 1.6], priority=10)
        scene.add_conductive_sheet(
            "gnd", sigma_s, [-20, -20, 0], [20, 20, 0], priority=10)
    scene.add_lumped_port(1, 50.0, [-6, 0, 0], [-6, 0, 1.6], direction="z")
    cfg = FDTDConfig(n_steps_max=n_steps, check_every=500, end_criteria=1e-6)
    # probe the NF2FF at this coarse scene's actual resonance (~2.35 GHz)
    # where port powers are strong and the power balance is clean
    sim = build_simulation(
        scene, grid, f0=F0, fc=F0 / 2, cfg=cfg,
        port_freqs_hz=np.linspace(1.2e9, 3.2e9, 81),
        nf_freqs_hz=np.array([2.35e9]),
    )
    out = sim.run()
    sp = port_spectra(sim.port_freqs_hz, np.asarray(out["uf"][0]),
                      np.asarray(out["if_"][0]), sim.dft_dt, z_ref=50.0)
    fi = 0
    ff = nf2ff_transform(
        sim.faces,
        select_face_freqs(out["nf_e"], fi),
        select_face_freqs(out["nf_h"], fi),
        sim.dft_dt, sim.nf_freqs_hz[fi : fi + 1],
        np.arange(0, 180, 10.0), np.array([0.0, 90.0]),
    )
    p_acc = accepted_power(sp, float(sim.nf_freqs_hz[fi]))
    eta = float(ff.P_rad[0]) / p_acc
    return eta, sp


def test_sheet_conductance_skin_cap():
    # 35 µm copper at 2.45 GHz: skin depth ≈ 1.33 µm → t_eff = 2δ
    d = skin_depth(F0, 5.8e7)
    assert 1.2e-6 < d < 1.5e-6
    g = sheet_conductance(5.8e7, 35e-6, F0)
    assert abs(g - 5.8e7 * 2 * d) / g < 1e-12
    # 1 µm gold layer thinner than 2δ: uses the physical thickness
    g2 = sheet_conductance(4.1e7, 1e-6, F0)
    assert g2 == pytest.approx(4.1e7 * 1e-6)


@pytest.mark.slow
def test_efficiency_decreases_with_conductor_loss():
    """η(PEC) ≥ η(copper sheet) > η(poor-metal sheet), with a lossless
    substrate so ALL loss is conductor loss."""
    eta_pec, sp_pec = _run_patch(None)
    eta_cu, sp_cu = _run_patch(sheet_conductance(5.8e7, 35e-6, F0))
    eta_bad, _ = _run_patch(sheet_conductance(1e4, 35e-6, F0))

    assert eta_pec > 0.5  # lossless metal+substrate: mostly radiated
    # copper introduces a small but nonzero ohmic loss
    assert eta_cu < eta_pec + 0.01
    assert eta_cu > 0.5
    # a 10^4 S/m metal is very lossy: large efficiency hit, strictly
    # ordered below copper
    assert eta_bad < eta_cu - 0.05

    # copper behaves nearly like PEC electrically: resonance shift small
    i_pec = int(np.argmin(np.abs(sp_pec.s11)))
    i_cu = int(np.argmin(np.abs(sp_cu.s11)))
    f_pec = sp_pec.freq_hz[i_pec]
    f_cu = sp_cu.freq_hz[i_cu]
    assert abs(f_cu - f_pec) / f_pec < 0.02


def test_solver_lossy_metal_flag():
    """prepare_patch_fixed(lossy_metal=True) produces a scene whose metal
    is ConductiveSheet and which still prepares/runs."""
    from fdtd_solver_antennas_tpu.models.params import PatchAntennaParams
    from fdtd_solver_antennas_tpu.solvers.patch_fixed import prepare_patch_fixed

    params = PatchAntennaParams.from_user_units(
        frequency_ghz=2.45, er=4.3, h_mm=1.6, loss_tangent=0.02
    )
    prep = prepare_patch_fixed(params, lossy_metal=True, n_steps_max=50)
    assert prep.ok, prep.message
    out = prep.sim.run()
    for f in out["fields"]:
        assert np.isfinite(np.asarray(f)).all()
