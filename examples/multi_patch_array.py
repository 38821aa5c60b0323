"""Two-element patch array via the headless designer: build the scene,
render a preview, run the multi-patch FDTD, save the 3D pattern.

Run: python examples/multi_patch_array.py
"""

# allow running from a source checkout without installation
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


import numpy as np

from fdtd_solver_antennas_tpu import FeedDirection, PatchAntennaParams
from fdtd_solver_antennas_tpu.frontends.designer import MultiPatchScene
from fdtd_solver_antennas_tpu.viz.plotting import plot_3d_pattern_from_grid


def main():
    params = PatchAntennaParams.from_user_units(
        frequency_ghz=2.45, er=4.3, h_mm=1.6, loss_tangent=0.02
    )
    scene = MultiPatchScene()
    scene.add_patch(params, center_x_m=-0.06)
    scene.add_patch(
        params, center_x_m=0.06, feed_direction=FeedDirection.POS_X
    )
    scene.controls.mesh_quality = 2
    scene.controls.phi_step_deg = 10.0
    scene.controls.theta_step_deg = 5.0

    scene.render_preview().savefig("array_scene.png", dpi=140)
    print("saved array_scene.png")

    res = scene.simulate(verbose=1, log_cb=print)
    assert res.ok, res.message
    print(
        f"f_res {res.f_res_hz / 1e9:.3f} GHz, Dmax "
        f"{10 * np.log10(res.Dmax):.1f} dBi, {res.mcells_per_s:.0f} Mcells/s"
    )
    fig = plot_3d_pattern_from_grid(
        res.theta, res.phi, 10 ** (np.asarray(res.intensity) / 10.0),
        colors_db=res.intensity,
    )
    fig.savefig("array_pattern.png", dpi=140)
    print("saved array_pattern.png")


if __name__ == "__main__":
    main()
