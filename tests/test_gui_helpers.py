"""Headless tests for the Tk GUI's module-level helpers.

The event loop itself needs a display (covered by ``main()``'s
pragma: no cover); everything data-shaped lives at module level so it
can be exercised here.
"""

import types

import numpy as np

from fdtd_solver_antennas_tpu.frontends.gui_app import (
    LogCoalescer,
    default_horn_params_for,
    is_full_sphere,
    pattern_grid_for_plot,
    principal_cut_indices,
)
from fdtd_solver_antennas_tpu.physics import C0


def test_is_full_sphere():
    assert not is_full_sphere(np.deg2rad([0.0, 90.0]))
    assert is_full_sphere(np.deg2rad(np.arange(0.0, 361.0, 15.0)))


def test_principal_cut_indices_two_cut():
    assert principal_cut_indices(np.deg2rad([0.0, 90.0])) == (0, 1)


def test_principal_cut_indices_full_sphere():
    phi = np.deg2rad(np.arange(0.0, 361.0, 15.0))
    e_idx, h_idx = principal_cut_indices(phi)
    assert phi[e_idx] == 0.0
    assert np.isclose(phi[h_idx], np.pi / 2)


def _fake_res(theta, phi, intensity):
    return types.SimpleNamespace(
        theta=theta, phi=phi, intensity=np.asarray(intensity)
    )


def test_pattern_grid_full_sphere_passthrough():
    theta = np.deg2rad(np.arange(0.0, 181.0, 15.0))
    phi = np.deg2rad(np.arange(0.0, 361.0, 30.0))
    grid = np.random.default_rng(0).normal(size=(len(theta), len(phi)))
    th, ph, out = pattern_grid_for_plot(_fake_res(theta, phi, grid))
    assert out.shape == grid.shape
    np.testing.assert_array_equal(out, grid)


def test_pattern_grid_two_cut_interpolates():
    theta = np.deg2rad(np.arange(0.0, 181.0, 10.0))
    phi = np.deg2rad([0.0, 90.0])
    cuts = np.stack(
        [np.cos(theta) ** 2 * 10 - 20, np.cos(theta) ** 2 * 8 - 20], axis=1
    )
    th, ph, out = pattern_grid_for_plot(_fake_res(theta, phi, cuts))
    assert out.shape == (len(theta), len(ph))
    assert is_full_sphere(ph)
    assert np.isfinite(out).all()


def test_default_horn_params_above_cutoff():
    p = default_horn_params_for(2.45e9)
    fc = C0 / (2.0 * p.throat_a_m)  # TE10 cutoff
    assert fc < 2.45e9
    assert p.aperture_A_m > p.throat_a_m
    assert p.aperture_B_m > p.throat_b_m


def test_log_coalescer_replaces_step_lines():
    log = LogCoalescer(max_lines=10)
    log.append("prepare: …")
    log.append("step 100")
    log.append("step 200")
    assert log.lines == ["prepare: …", "step 200"]
    for i in range(20):
        log.append(f"msg {i}")
    assert len(log.lines) == 10


def test_scene_preview_into_existing_figure():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from fdtd_solver_antennas_tpu.frontends.designer import MultiPatchScene
    from fdtd_solver_antennas_tpu.models.params import PatchAntennaParams

    scene = MultiPatchScene()
    scene.add_patch(
        PatchAntennaParams.from_user_units(
            frequency_ghz=2.45, er=4.3, h_mm=1.6
        )
    )
    scene.add_horn(default_horn_params_for(2.45e9), center_x_m=0.2)
    fig = plt.Figure()
    out = scene.render_preview(fig=fig)
    assert out is fig
    assert len(fig.axes) == 1
