"""Mixed patch + horn scene in ONE FDTD run (beyond-reference: the
reference's designer can only *preview* horns, multi_patch_designer.py:31-41).

A 2.45 GHz microstrip-fed patch next to a rotated pyramidal horn, both
excited in phase; full-sphere far field of the combined scene.

Run: python examples/mixed_patch_horn.py
"""

# allow running from a source checkout without installation
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


import numpy as np

from fdtd_solver_antennas_tpu import HornAntennaParams, PatchAntennaParams
from fdtd_solver_antennas_tpu.frontends.designer import MultiPatchScene
from fdtd_solver_antennas_tpu.viz.plotting import plot_3d_pattern_from_grid


def main():
    scene = MultiPatchScene()
    scene.add_patch(
        PatchAntennaParams.from_user_units(
            frequency_ghz=2.45, er=4.3, h_mm=1.6, loss_tangent=0.02
        )
    )
    # WR-340-like throat flaring to a 150×110 mm aperture, rotated 25°
    scene.add_horn(
        HornAntennaParams.from_user_units(
            frequency_ghz=2.45, throat_a_mm=86.0, throat_b_mm=43.0,
            aperture_A_mm=150.0, aperture_B_mm=110.0, length_mm=60.0,
        ),
        center_x_m=0.18, rot_z_deg=25.0,
    )
    scene.controls.mesh_quality = 2
    scene.controls.phi_step_deg = 10.0
    scene.controls.theta_step_deg = 5.0

    scene.render_preview().savefig("mixed_scene.png", dpi=140)
    print("saved mixed_scene.png")

    res = scene.simulate(verbose=1, log_cb=print)
    assert res.ok, res.message
    print(
        f"f_res {res.f_res_hz / 1e9:.3f} GHz, Dmax "
        f"{10 * np.log10(res.Dmax):.1f} dBi, {res.mcells_per_s:.0f} Mcells/s, "
        f"{len(res.diagnostics['s11_all_ports'])} ports"
    )
    fig = plot_3d_pattern_from_grid(
        res.theta, res.phi, 10 ** (np.asarray(res.intensity) / 10.0),
        colors_db=res.intensity,
    )
    fig.savefig("mixed_pattern.png", dpi=140)
    print("saved mixed_pattern.png")


if __name__ == "__main__":
    main()
