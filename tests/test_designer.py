"""Headless designer tests: instance management, change callbacks, bounds,
controls, preview rendering, and the solver bridge."""

import numpy as np
import pytest

from fdtd_solver_antennas_tpu import (
    FeedDirection,
    HornAntennaParams,
    PatchAntennaParams,
)
from fdtd_solver_antennas_tpu.frontends.designer import (
    HornInstance,
    MultiPatchScene,
    PatchInstance,
)


@pytest.fixture
def params():
    return PatchAntennaParams.from_user_units(
        frequency_ghz=2.45, er=4.3, h_mm=1.6
    )


@pytest.fixture
def horn_params():
    return HornAntennaParams.from_user_units(
        frequency_ghz=10.0, throat_a_mm=22.9, throat_b_mm=10.2,
        aperture_A_mm=80.0, aperture_B_mm=60.0, length_mm=100.0,
    )


def test_add_remove_and_callbacks(params, horn_params):
    scene = MultiPatchScene()
    events = []
    scene.set_change_callback(lambda: events.append(1))
    p1 = scene.add_patch(params)
    h1 = scene.add_horn(horn_params, center_x_m=0.2)
    assert len(scene.patches) == 1 and len(scene.horns) == 1
    assert p1.name == "Patch 1" and h1.name == "Horn 2"
    scene.update_field(p1, "rot_z_deg", 45.0)
    assert p1.rot_z_deg == 45.0
    scene.remove(h1)
    assert not scene.horns
    assert len(events) == 4  # add, add, update, remove


def test_update_field_validates(params):
    scene = MultiPatchScene()
    p = scene.add_patch(params)
    with pytest.raises(AttributeError):
        scene.update_field(p, "not_a_field", 1)


def test_scene_bounds(params):
    scene = MultiPatchScene()
    scene.add_patch(params)
    scene.add_patch(params, center_x_m=0.2)
    lo, hi = scene.scene_bounds_mm()
    assert hi[0] - lo[0] > 200.0  # two substrates 200 mm apart
    assert lo[2] == pytest.approx(0.0, abs=1e-9)


def test_rotated_instance_bounds(params):
    scene = MultiPatchScene()
    p = scene.add_patch(params, rot_x_deg=90.0)
    lo, hi = scene.instance_bounds_mm(p)
    # substrate plane rotated into x-z: z-extent now spans the patch length
    assert hi[2] - lo[2] > 50.0


def test_preview_renders(params, horn_params):
    scene = MultiPatchScene()
    scene.add_patch(params)
    scene.add_patch(params, center_x_m=0.12, rot_z_deg=90.0)
    scene.add_horn(horn_params, center_y_m=0.15)
    fig = scene.render_preview()
    assert fig is not None
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_simulate_bridge(params):
    scene = MultiPatchScene()
    scene.add_patch(params)
    scene.controls.mesh_quality = 1
    scene.controls.theta_step_deg = 15.0
    scene.controls.phi_step_deg = 45.0
    prep = scene.prepare()
    assert prep.ok, prep.message


def test_simulate_guards(params):
    scene = MultiPatchScene()
    with pytest.raises(ValueError, match="no antenna"):
        scene.simulate()
    scene.add_patch(params)
    scene.locked = True
    with pytest.raises(RuntimeError, match="locked"):
        scene.simulate()
