"""CPML absorbing-boundary tests.

Note on late-time behavior: after the pulse, a tiny curl-free static field
(charge deposited on the metal by the source's residual DC content) remains
frozen in lossless vacuum — neither MUR nor PML absorbs DC, exactly like
openEMS. Tests therefore compare *energy floors* and check for absence of
growth, not decay to zero.
"""

import numpy as np
import pytest

from fdtd_solver_antennas_tpu.models.scene import Scene
from fdtd_solver_antennas_tpu.ops.fdtd import FDTDConfig, build_simulation
from fdtd_solver_antennas_tpu.ops.mesh import MeshBuilder


def _radiator(boundary, n_steps, half_mm=50.0):
    mb = MeshBuilder()
    mb.add_line("x", [-half_mm, half_mm, 0.0])
    mb.add_line("y", [-half_mm, half_mm, 0.0])
    mb.add_line("z", [-half_mm, half_mm])
    mb.add_line("z", [-10, -2.5, 0.0, 2.5, 10])
    grid = mb.build(4.0)
    scene = Scene()
    scene.add_metal_box("arm1", [0, 0, 2.5], [0, 0, 10], priority=10)
    scene.add_metal_box("arm2", [0, 0, -10], [0, 0, -2.5], priority=10)
    scene.add_lumped_port(1, 50.0, [0, 0, -2.5], [0, 0, 2.5], direction="z")
    cfg = FDTDConfig(
        n_steps_max=n_steps, end_criteria=1e-30,  # never exit early
        check_every=n_steps, boundary=boundary,
    )
    return build_simulation(scene, grid, f0=2.5e9, fc=1.25e9, cfg=cfg)


def _e_energy(out):
    return sum(float((np.asarray(f) ** 2).sum()) for f in out["fields"][:3])


def test_pml_absorbs_better_than_mur():
    """Shortly after the pulse, the PML run must hold less residual energy
    than the MUR run (lower boundary reflections)."""
    e_mur = _e_energy(_radiator("MUR", 3000).run())
    e_pml = _e_energy(_radiator("PML_8", 3000).run())
    assert e_pml < e_mur
    # and both absorb massively compared to the closed box
    e_pec = _e_energy(_radiator("PEC", 3000).run())
    assert e_pml < 1e-6 * e_pec


@pytest.mark.slow  # long-horizon stability: 4k + 16k step runs
def test_pml_no_late_time_growth():
    """CPML recursion must not exhibit late-time growth (classic failure
    mode): energy at 16k steps ≤ energy at 4k steps; fields finite."""
    e_short = _e_energy(_radiator("PML_8", 4000).run())
    out_long = _radiator("PML_8", 16000).run()
    e_long = _e_energy(out_long)
    assert e_long <= e_short * 1.05
    for f in out_long["fields"]:
        assert np.isfinite(np.asarray(f)).all()


@pytest.mark.slow  # long-horizon stability: 4k + 16k step runs
def test_mur_no_late_time_growth():
    e_short = _e_energy(_radiator("MUR", 4000).run())
    e_long = _e_energy(_radiator("MUR", 16000).run())
    assert e_long <= e_short * 1.05


def test_pec_conserves_then_drains_through_port():
    """Closed box: energy builds during the pulse, then only the port
    resistor drains it — late energy must be below the post-pulse level
    but far above the absorbing-boundary floors."""
    e_post = _e_energy(_radiator("PEC", 2000).run())
    e_late = _e_energy(_radiator("PEC", 12000).run())
    assert e_late < e_post
    assert e_late > 1e-6 * e_post  # still ringing, no fake absorption


def test_pml_grid_too_small_raises():
    mb = MeshBuilder()
    for a in "xyz":
        mb.add_line(a, [-10, 10])
    grid = mb.build(4.0)  # ~6 cells/axis — cannot hold 2×8-cell slabs
    scene = Scene()
    scene.add_lumped_port(1, 50.0, [0, 0, -4], [0, 0, 4], direction="z")
    cfg = FDTDConfig(boundary="PML_8")
    with pytest.raises(ValueError, match="too small"):
        build_simulation(scene, grid, f0=2.5e9, fc=1.25e9, cfg=cfg)


def test_pml_cells_parsing():
    assert FDTDConfig(boundary="MUR").pml_cells() == 0
    assert FDTDConfig(boundary="PEC").pml_cells() == 0
    assert FDTDConfig(boundary="PML_8").pml_cells() == 8
    assert FDTDConfig(boundary="pml_12").pml_cells() == 12
    assert FDTDConfig(boundary="PML").pml_cells() == 8
