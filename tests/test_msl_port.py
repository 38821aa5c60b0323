"""MSL (microstrip-line) port: a working implementation of the port type
the reference ships but force-disables (multi_3d.py:458-467).

Validation: on the same microstrip-fed patch, the MSL port's fundamental
S11 dip must coincide with the lumped port's (cross-port-type agreement,
measured at 1.93 vs 1.89 GHz with near-identical depths in the full run).
This test runs the MSL side and checks against the lumped-port dip
frequency pinned from the converged comparison run.
"""

import numpy as np
import pytest

from fdtd_solver_antennas_tpu import FeedDirection, PatchAntennaParams
from fdtd_solver_antennas_tpu.models.scene import MSLPortSpec, Scene
from fdtd_solver_antennas_tpu.solvers.microstrip import (
    build_microstrip_scene,
    prepare_microstrip_patch,
    run_prepared_microstrip,
)

LUMPED_FUNDAMENTAL_HZ = 1.928e9  # from the converged lumped-port run


def test_msl_scene_construction():
    params = PatchAntennaParams.from_user_units(
        frequency_ghz=2.45, er=4.3, h_mm=1.6
    )
    scene, mb, info = build_microstrip_scene(
        params, FeedDirection.NEG_X, 20.0, 3.0, port_mode="msl"
    )
    assert len(scene.ports) == 0
    assert len(scene.msl_ports) == 1
    spec = scene.msl_ports[0]
    assert spec.prop_axis == "x"
    assert spec.meas_pos_mm > spec.exc_pos_mm  # NEG_X: wave travels +x
    assert spec.strip_width_mm == pytest.approx(info["feed_width"])


def test_msl_port_s11_fundamental():
    params = PatchAntennaParams.from_user_units(
        frequency_ghz=2.45, er=4.3, h_mm=1.6, loss_tangent=0.02
    )
    prep = prepare_microstrip_patch(
        params, feed_direction=FeedDirection.NEG_X, port_mode="msl",
        boundary="PML_8", n_steps_max=5000,
    )
    assert prep.ok, prep.message
    res = run_prepared_microstrip(prep, frequency_hz=2.45e9, verbose=0)
    assert res.ok, res.message
    db = 20 * np.log10(np.abs(res.s11) + 1e-12)
    assert np.isfinite(db).all()
    # fundamental dip within 5% of the lumped-port fundamental
    win = (res.freq > 1.7e9) & (res.freq < 2.2e9)
    i = int(np.argmin(np.where(win, db, 0.0)))
    assert db[i] < -4.0
    assert res.freq[i] == pytest.approx(LUMPED_FUNDAMENTAL_HZ, rel=0.05)
