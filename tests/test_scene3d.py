"""Tests for the portable interactive 3D scene view (viz/scene3d.py) —
the replacement for the reference's Windows-only PyVista geometry viewer
(gui_app.py:1352-2480)."""

import json
import re

import numpy as np
import pytest

from fdtd_solver_antennas_tpu.frontends.designer import MultiPatchScene
from fdtd_solver_antennas_tpu.frontends.gui_app import default_horn_params_for
from fdtd_solver_antennas_tpu.models.params import PatchAntennaParams
from fdtd_solver_antennas_tpu.models.scene import rotation_matrix
from fdtd_solver_antennas_tpu.viz.scene3d import (
    box_mesh,
    marker_mesh,
    patch_scene_meshes,
    quad_mesh,
    scene_html,
    scene_meshes,
)


def _params():
    return PatchAntennaParams.from_user_units(
        frequency_ghz=2.45, er=4.3, h_mm=1.6
    )


def _mesh_volume(m):
    """Signed volume via the divergence theorem (needs outward faces)."""
    v = m.verts
    a, b, c = v[m.faces[:, 0]], v[m.faces[:, 1]], v[m.faces[:, 2]]
    return float(np.sum(np.einsum("ij,ij->i", a, np.cross(b, c))) / 6.0)


def test_box_mesh_geometry():
    m = box_mesh((0, 0, 0), (2, 3, 4))
    assert m.verts.shape == (8, 3)
    assert m.faces.shape == (12, 3)
    # consistently wound closed surface: signed volume = 2*3*4
    assert _mesh_volume(m) == pytest.approx(24.0)


def test_box_mesh_puffs_thin_sheets():
    m = box_mesh((0, 0, 1.6), (10, 10, 1.6))  # zero-thickness PEC sheet
    dz = m.verts[:, 2].max() - m.verts[:, 2].min()
    assert dz > 0  # visible in the render


def test_quad_and_marker():
    q = quad_mesh(np.array([(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]))
    assert q.faces.shape == (2, 3)
    mk = marker_mesh((5, 6, 7), size=2.0)
    assert mk.faces.shape == (8, 3)
    np.testing.assert_allclose(mk.verts.mean(axis=0), [5, 6, 7])
    assert _mesh_volume(mk) > 0


def test_patch_scene_meshes_layout():
    ms = patch_scene_meshes(29.1, 37.6, 1.6)
    names = [m.name for m in ms]
    assert names == ["substrate", "ground", "patch", "port"]
    patch = ms[2]
    # patch plate sits at z = h and spans W × L
    assert patch.verts[:, 0].max() - patch.verts[:, 0].min() == pytest.approx(37.6)
    assert patch.verts[:, 1].max() - patch.verts[:, 1].min() == pytest.approx(29.1)


def test_scene_meshes_true_oriented_geometry():
    """Rotated instances render with rotated vertices (not AABBs)."""
    scene = MultiPatchScene()
    inst = scene.add_patch(_params(), rot_z_deg=45.0)
    ms = scene_meshes(scene)
    patch = next(m for m in ms if m.name.endswith("patch"))
    # a 45°-rotated rectangle's x-extent = (W+L)/√2 > W
    from fdtd_solver_antennas_tpu.frontends.designer import _patch_dims_mm

    W, L, _h = _patch_dims_mm(inst.params)
    span_x = patch.verts[:, 0].max() - patch.verts[:, 0].min()
    assert span_x == pytest.approx((W + L) / np.sqrt(2), rel=1e-6)
    # and matches the solver's row-vector transform convention
    R = rotation_matrix(0, 0, 45.0)
    corner_local = np.array([W / 2, L / 2, 0])
    expect = corner_local @ R.T
    d = np.linalg.norm(patch.verts[:, :2] - expect[:2], axis=1)
    assert d.min() < 0.3  # one rendered vertex lands on the true corner


def test_scene_meshes_horn_and_port_markers():
    scene = MultiPatchScene()
    scene.add_patch(_params())
    scene.add_horn(
        default_horn_params_for(2.45e9), center_x_m=0.2, rot_y_deg=90.0
    )
    ms = scene_meshes(scene)
    kinds = {m.name.split(": ")[-1] for m in ms}
    assert {"substrate", "ground", "patch", "port", "waveguide",
            "flare"} <= kinds
    ports = [m for m in ms if m.name.endswith("port")]
    assert len(ports) == 2  # one per instance
    # the horn's port marker moved to the instance's world position
    horn_port = ports[1]
    assert horn_port.verts[:, 0].mean() > 100.0  # x ≈ 200 mm


def test_scene_html_payload():
    ms = patch_scene_meshes(29.1, 37.6, 1.6)
    html = scene_html(ms)
    # self-contained: no external scripts or stylesheets
    assert "http://" not in html and "https://" not in html
    assert "<script src" not in html
    # the mesh payload round-trips
    payload = json.loads(
        re.search(r"const MESHES = (\[.*?\]);\n", html, re.S).group(1)
    )
    assert len(payload) == len(ms)
    assert payload[0]["name"] == "substrate"
    assert len(payload[2]["faces"]) == 12
    # interaction handlers present
    for evt in ("mousedown", "mousemove", "wheel"):
        assert evt in html
