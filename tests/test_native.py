"""Native (C++) voxelizer core: build, load, and NumPy-equivalence."""

import numpy as np
import pytest

from fdtd_solver_antennas_tpu.models.scene import Scene, rotation_matrix
from fdtd_solver_antennas_tpu.native import get_voxelize_lib, native_available
from fdtd_solver_antennas_tpu.ops.mesh import MeshBuilder
import importlib

# the package re-exports the voxelize *function*, which shadows the
# submodule on attribute-style imports — resolve the module explicitly
vx = importlib.import_module("fdtd_solver_antennas_tpu.ops.voxelize")


def _scene():
    s = Scene()
    s.add_material_box("sub", 4.3, 0.02, [-20, -20, 0], [20, 20, 2], priority=0)
    s.add_material_box("insert", 2.1, 0.0, [-5, -5, 0], [5, 5, 2], priority=5)
    s.add_metal_box("sheet", [-10, -8, 2], [10, 8, 2], priority=10)
    s.add_metal_box(
        "rot", [-6, -4, -10], [6, 4, -6], priority=10,
        rotation=rotation_matrix(0, 0, 30), translation=(3.0, -2.0, 0.0),
    )
    return s


def _grid():
    mb = MeshBuilder()
    for a in "xyz":
        mb.add_line(a, [-25, 25])
    mb.add_line("z", [0.0, 2.0])
    return mb.build(2.5)


def test_native_builds():
    assert native_available(), "g++ toolchain expected in this image"
    lib = get_voxelize_lib()
    assert lib is not None


def test_native_matches_numpy(monkeypatch):
    scene, grid = _scene(), _grid()
    native = vx.voxelize(scene, grid)

    # force the NumPy fallback
    import fdtd_solver_antennas_tpu.native.build as nb

    monkeypatch.setattr(nb, "_LIB", None)
    monkeypatch.setattr(nb, "_TRIED", True)
    fallback = vx.voxelize(scene, grid)

    np.testing.assert_array_equal(native.eps_r, fallback.eps_r)
    np.testing.assert_array_equal(native.sigma, fallback.sigma)
    np.testing.assert_array_equal(native.pec_ex, fallback.pec_ex)
    np.testing.assert_array_equal(native.pec_ey, fallback.pec_ey)
    np.testing.assert_array_equal(native.pec_ez, fallback.pec_ez)
    # sanity: the scene actually painted something
    assert (native.eps_r == 4.3).any()
    assert (native.eps_r == 2.1).any()
    assert native.pec_ex.any() and native.pec_ey.any()
