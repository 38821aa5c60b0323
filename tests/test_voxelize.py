"""Voxelizer tests: priority painting, PEC sheet capture, rotated boxes."""

import numpy as np
import pytest

from fdtd_solver_antennas_tpu.models.scene import Box, PEC, Scene, rotation_matrix
from fdtd_solver_antennas_tpu.ops.mesh import MeshBuilder, YeeGrid
from fdtd_solver_antennas_tpu.ops.voxelize import cell_to_edge_average, voxelize


def _grid(res=2.0, half=10.0):
    mb = MeshBuilder()
    for a in "xyz":
        mb.add_line(a, [-half, half])
    return mb.build(res)


def test_material_painting_and_priority():
    g = _grid()
    s = Scene()
    s.add_material_box("a", 4.0, 0.1, [-10, -10, -10], [10, 10, 10], priority=0)
    s.add_material_box("b", 2.0, 0.0, [-4, -4, -4], [4, 4, 4], priority=5)
    v = voxelize(s, g)
    cx = g.centers("x")
    inner = np.abs(cx) < 4
    # inner region overridden by higher priority
    assert np.all(v.eps_r[np.ix_(inner, inner, inner)] == 2.0)
    assert np.all(v.sigma[np.ix_(inner, inner, inner)] == 0.0)
    # outer region keeps the base material
    assert v.eps_r[0, 0, 0] == 4.0
    assert v.sigma[0, 0, 0] == 0.1


def test_priority_order_over_insertion():
    g = _grid()
    s = Scene()
    s.add_material_box("later_low", 2.0, 0.0, [-4, -4, -4], [4, 4, 4], priority=0)
    s.add_material_box("first_high", 3.0, 0.0, [-10, -10, -10], [10, 10, 10], priority=1)
    v = voxelize(s, g)
    # higher priority wins even though it encloses everything
    assert np.all(v.eps_r == 3.0)


def test_pec_sheet_captures_tangential_edges():
    g = _grid(res=2.0)
    s = Scene()
    s.add_metal_box("sheet", [-6, -6, 0.0], [6, 6, 0.0], priority=10)
    v = voxelize(s, g)
    k0 = int(np.argmin(np.abs(g.z)))  # z = 0 plane index
    # Ex edges in the sheet plane, inside the footprint → PEC
    i_in = np.where(np.abs(g.centers("x")) < 6)[0]
    j_in = np.where(np.abs(g.y) < 6 + 1e-9)[0]
    assert v.pec_ex[np.ix_(i_in, j_in, [k0])].all()
    # normal Ez edges must NOT be PEC (zero-thickness sheet)
    assert not v.pec_ez[:, :, k0].any()
    # edges outside the footprint unaffected
    assert not v.pec_ex[0, 0, k0]


def test_volumetric_pec_captures_all_components():
    g = _grid(res=2.0)
    s = Scene()
    s.add_metal_box("block", [-4, -4, -4], [4, 4, 4], priority=10)
    v = voxelize(s, g)
    mid = len(g.x) // 2
    assert v.pec_ex[mid, mid, mid]
    assert v.pec_ey[mid, mid, mid]
    assert v.pec_ez[mid, mid, mid]


def test_rotated_box_containment():
    # 45° z-rotated square sheet: corners reach sqrt(2)·half along axes
    R = rotation_matrix(0, 0, 45)
    b = Box(PEC("m"), (-5, -5, 0), (5, 5, 0), rotation=R)
    pts = np.array(
        [
            [0, 0, 0],  # center → inside
            [6.5, 0, 0],  # along x beyond unrotated half-width but < 5√2
            [5.1, 5.1, 0],  # old corner direction → now outside
            [0, 0, 1.0],  # off-plane → outside
        ]
    )
    got = b.contains(pts, tol=1e-6)
    assert got.tolist() == [True, True, False, False]


def test_world_transform_roundtrip():
    R = rotation_matrix(20, 30, 40)
    b = Box(PEC("m"), (-3, -2, 0), (3, 2, 1), rotation=R, translation=(5, -4, 2))
    pts = np.random.default_rng(0).uniform(-3, 3, size=(50, 3))
    back = b.to_local(b.to_world(pts))
    np.testing.assert_allclose(back, pts, atol=1e-12)


def test_cell_to_edge_average():
    cell = np.zeros((2, 2, 2))
    cell[0] = 1.0
    cell[1] = 3.0
    out = cell_to_edge_average(cell, "ey")  # averages along x and z
    # interior x-node (i=1) averages cells 0 and 1 → 2.0
    assert out[1, 0, 1] == pytest.approx(2.0)
    # boundary x-node replicates
    assert out[0, 0, 1] == pytest.approx(1.0)
    assert out[2, 0, 1] == pytest.approx(3.0)
    assert out.shape == (3, 3, 3)


def test_windowed_poly_containment_matches_full():
    """The AABB-windowed polyhedron paint must reproduce the full-grid
    containment test exactly (prepare-time optimization, no physics
    change)."""
    import numpy as np

    from fdtd_solver_antennas_tpu.models.scene import PEC, make_plate, rotation_matrix
    from fdtd_solver_antennas_tpu.ops.mesh import MeshBuilder
    from fdtd_solver_antennas_tpu.ops.voxelize import (
        _edge_axes,
        _edge_midpoints,
        _poly_contains_windowed,
    )

    mb = MeshBuilder()
    mb.add_line("x", [-50.0, 50.0])
    mb.add_line("y", [-50.0, 50.0])
    mb.add_line("z", [-50.0, 50.0])
    grid = mb.build(4.0)

    quad = np.array([(0.0, -10.0, 0.0), (0.0, 10.0, 0.0),
                     (20.0, 10.0, 15.0), (20.0, -10.0, 15.0)])
    R = rotation_matrix(10.0, 0.0, 30.0)
    plate = make_plate(quad, 2.0, PEC("p"), rotation=R,
                       translation=(5.0, -3.0, 2.0))

    for comp in ("ex", "ey", "ez"):
        pts = _edge_midpoints(grid, comp)
        full = plate.contains(pts)
        windowed = np.zeros(pts.shape[:-1], bool)
        _poly_contains_windowed(plate, *_edge_axes(grid, comp),
                                out_or=windowed)
        np.testing.assert_array_equal(windowed, full)
        assert full.any()  # the plate actually intersects the grid


def test_windowed_poly_off_grid_is_noop():
    import numpy as np

    from fdtd_solver_antennas_tpu.models.scene import PEC, make_plate
    from fdtd_solver_antennas_tpu.ops.mesh import MeshBuilder
    from fdtd_solver_antennas_tpu.ops.voxelize import (
        _edge_axes,
        _poly_contains_windowed,
    )

    mb = MeshBuilder()
    mb.add_line("x", [-10.0, 10.0])
    mb.add_line("y", [-10.0, 10.0])
    mb.add_line("z", [-10.0, 10.0])
    grid = mb.build(2.0)
    far = make_plate(
        np.array([(100.0, 0, 0), (110.0, 0, 0), (110.0, 10, 0), (100.0, 10, 0)]),
        1.0, PEC("far"),
    )
    m = np.zeros(tuple(len(a) for a in _edge_axes(grid, "ez")), bool)
    _poly_contains_windowed(far, *_edge_axes(grid, "ez"), out_or=m)
    assert not m.any()


def test_poly_with_default_bounds_not_dropped():
    """Regression: a ConvexPolyhedron constructed directly (bounds_lo/hi
    left at the (0,0,0) dataclass default) must still be rasterized —
    the AABB window falls back to the full grid instead of collapsing to
    a point and silently dropping the solid."""
    from fdtd_solver_antennas_tpu.models.scene import ConvexPolyhedron

    grid = _grid()
    # axis-aligned cube |x|,|y|,|z| <= 5 as half-spaces, no bounds given
    planes = []
    for ax in range(3):
        for sgn in (1.0, -1.0):
            n = np.zeros(3)
            n[ax] = sgn
            planes.append(np.concatenate([n, [5.0]]))
    poly = ConvexPolyhedron(prop=PEC("cube"), planes=np.array(planes),
                            priority=10)
    scene = Scene()
    scene.boxes.append(poly)
    vox = voxelize(scene, grid)
    assert vox.pec_ez.any(), "default-bounds polyhedron was dropped"


def test_higher_priority_material_carves_pec():
    """CSXCAD overlap semantics: a higher-priority material (air slot)
    removes lower-priority metal; lower-priority material does not."""
    grid = _grid()
    scene = Scene()
    scene.add_metal_box("gnd", [-8, -8, 0], [8, 8, 0], priority=10)
    scene.add_material_box("slot", 1.0, 0.0, [-2, -2, -1], [2, 2, 1],
                           priority=20)
    vox = voxelize(scene, grid)
    # the sheet still exists away from the slot
    assert vox.pec_ex.any()
    # but inside the slot footprint the metal is carved away
    from fdtd_solver_antennas_tpu.ops.voxelize import (
        _edge_midpoints,
        _inflated_contains,
    )
    from fdtd_solver_antennas_tpu.models.scene import Box, Material

    slot_box = Box(prop=Material("slot", 1.0, 0.0),
                   start=(-2.0, -2.0, -1.0), stop=(2.0, 2.0, 1.0),
                   priority=20)
    inside = _inflated_contains(slot_box, _edge_midpoints(grid, "ex"))
    assert not (vox.pec_ex & inside).any(), "slot not carved"

    # control: a LOWER-priority material must NOT carve
    scene2 = Scene()
    scene2.add_metal_box("gnd", [-8, -8, 0], [8, 8, 0], priority=10)
    scene2.add_material_box("sub", 1.0, 0.0, [-2, -2, -1], [2, 2, 1],
                            priority=0)
    vox2 = voxelize(scene2, grid)
    assert (vox2.pec_ex & inside).any(), "low-priority material carved PEC"


def test_overlapping_sheets_do_not_double_count():
    """Two overlapping ConductiveSheet boxes: edges in the overlap belong
    to exactly one sheet (highest priority), not the sum of both."""
    from fdtd_solver_antennas_tpu.models.scene import ConductiveSheet

    grid = _grid()
    scene = Scene()
    sig = 5.8e7 * 35e-6  # sigma_s of 35 um copper
    scene.boxes.append(Box(prop=ConductiveSheet("a", sig),
                           start=(-8.0, -8.0, 0.0),
                           stop=(0.0, 8.0, 0.0), priority=10))
    scene.boxes.append(Box(prop=ConductiveSheet("b", sig),
                           start=(-2.0, -8.0, 0.0),
                           stop=(8.0, 8.0, 0.0), priority=10))
    vox = voxelize(scene, grid)
    add = vox.sheet_sigma_ex
    assert add is not None and add.max() > 0
    # a single-sheet scene gives the per-edge ceiling; the overlap region
    # must not exceed it
    scene1 = Scene()
    scene1.boxes.append(Box(prop=ConductiveSheet("a", sig),
                            start=(-8.0, -8.0, 0.0),
                            stop=(8.0, 8.0, 0.0), priority=10))
    ref = voxelize(scene1, grid).sheet_sigma_ex
    assert np.all(add <= ref.max() * (1 + 1e-12)), "overlap double-counted"


def test_grid_mutation_invalidates_point_cache():
    """Voxelizing, shifting the grid lines in place, and voxelizing again
    must rasterize against the NEW coordinates (the caches are keyed on
    line content, not object identity)."""
    grid = _grid()
    scene = Scene()
    scene.add_metal_box("m", [-8, -8, 0], [8, 8, 0], priority=10)
    v1 = voxelize(scene, grid)
    assert v1.pec_ex.any()
    grid.z += 100.0  # in-place shift: the sheet plane no longer exists
    v2 = voxelize(scene, grid)
    assert not v2.pec_ex.any(), "stale cached coordinates were reused"
