"""Mesh builder tests: smoothing ratio, fixed-line preservation, metal-edge
rule, Yee grid derived quantities."""

import numpy as np
import pytest

from fdtd_solver_antennas_tpu.ops.mesh import (
    MeshBuilder,
    YeeGrid,
    smooth_mesh_lines,
)


def test_fixed_lines_kept():
    fixed = [0.0, 1.0, 7.3, 50.0]
    out = smooth_mesh_lines(fixed, max_res=4.0)
    for v in fixed:
        assert np.min(np.abs(out - v)) < 1e-9


def test_max_res_respected():
    out = smooth_mesh_lines([0.0, 100.0], max_res=4.0)
    assert np.all(np.diff(out) <= 4.0 * 1.0001)


def test_grading_ratio():
    # a fine feature next to a large gap must grade smoothly
    out = smooth_mesh_lines([0.0, 0.5, 1.0, 100.0], max_res=10.0, ratio=1.4)
    d = np.diff(out)
    ratios = d[1:] / d[:-1]
    assert np.all(ratios < 1.4 * 1.05)
    assert np.all(ratios > 1 / 1.4 / 1.05)


def test_metal_edge_rule():
    mb = MeshBuilder()
    mb.add_line("x", [-50.0, 50.0])
    mb.add_metal_edges([-10.0, -10.0, 0.0], [10.0, 10.0, 0.0], dirs="x",
                       metal_edge_res=3.0)
    lines = sorted(mb.fixed["x"])
    # 1/3 inside, 2/3 outside at each edge
    for expect in (-12.0, -9.0, 9.0, 12.0):
        assert any(abs(v - expect) < 1e-9 for v in lines)


def test_yee_grid_derived():
    g = YeeGrid(
        x=np.array([0.0, 1.0, 3.0]),
        y=np.array([0.0, 2.0]),
        z=np.array([0.0, 1.0, 2.0, 3.0]),
    )
    assert g.shape == (3, 2, 4)
    assert g.num_cells == 2 * 1 * 3
    np.testing.assert_allclose(g.deltas_m("x"), [1e-3, 2e-3])
    np.testing.assert_allclose(g.dual_deltas_m("x"), [0.5e-3, 1.5e-3, 1e-3])
    dt = g.courant_dt()
    # dt below the uniform-grid bound for the smallest cell
    from fdtd_solver_antennas_tpu.physics import C0

    assert dt < 1e-3 / C0
    assert dt > 0


def test_builder_end_to_end():
    mb = MeshBuilder()
    mb.add_line("x", [-100.0, 100.0])
    mb.add_line("y", [-100.0, 100.0])
    mb.add_line("z", [-50.0, 100.0])
    mb.add_line("z", np.linspace(0, 1.6, 5))
    grid = mb.build(max_res=4.0, ratio=1.4)
    for a in "xyz":
        d = np.diff(grid.lines[a])
        assert np.all(d > 0)
        assert np.all(d <= 4.0 * 1.0001)
    # substrate lines survived
    for v in np.linspace(0, 1.6, 5):
        assert np.min(np.abs(grid.z - v)) < 1e-9
