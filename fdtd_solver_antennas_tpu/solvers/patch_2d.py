"""Quasi-2D patch solver parity (``solver_fdtd_openems_2d.py:1-168``).

A thin y-slice (max(6 mm, L/40)) of the patch cross-section for fast
sanity checks: PML-8 walls, NrTS = 60000, EndCriteria 1e-5, λ/25 mesh
(slightly finer than 3D), NF2FF sampled on 4 φ cuts. Prepare-only in the
reference (its run is shared with the legacy solver via streamlit); here a
matching runner is provided too.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

import jax

from ..models.params import PatchAntennaParams
from ..models.scene import Scene
from ..ops.fdtd import FDTDConfig, build_simulation
from ..ops.mesh import MeshBuilder
from ..physics import C0, design_patch_for_frequency, substrate_conductivity
from ..post.nf2ff import nf2ff_transform, select_face_freqs
from ..post.ports import find_resonance, port_spectra
from .base import FDTDSolverResult, SolverPrepared, radiation_efficiency


@dataclasses.dataclass
class Prepared2D(SolverPrepared):
    """Parity alias of the reference's ``OpenEMS2DPrepared`` (:14-23)."""


def prepare_patch_2d(
    params: PatchAntennaParams,
    *,
    dll_dir: str = "",  # parity arg, ignored
    work_dir: str = "",  # parity arg, ignored
    cleanup: bool = True,  # parity arg, ignored
    verbose: int = 0,
    n_steps_max: int = 60_000,
    end_criteria: float = 1e-5,
) -> Prepared2D:
    try:
        f0 = params.frequency_hz
        fc = f0 / 2.0

        if params.patch_length_m and params.patch_width_m:
            L = params.patch_length_m * 1e3
            W = params.patch_width_m * 1e3
        else:
            L_m, W_m, _ = design_patch_for_frequency(f0, params.eps_r, params.h_m)
            L, W = L_m * 1e3, W_m * 1e3
        h = params.h_m * 1e3

        slice_len = max(6.0, L / 40.0)  # thin y-slice (reference :91)
        feed_x = -6.0
        res = C0 / (f0 + fc) / 1e-3 / 25.0  # λ/25 (reference :95)
        sim_box = np.array([200.0, 200.0, 150.0])

        kappa = substrate_conductivity(f0, params.eps_r, params.loss_tangent)
        sub_w = 60.0
        sub_l = max(60.0, slice_len)

        scene = Scene()
        scene.add_material_box(
            "substrate", params.eps_r, kappa,
            [-sub_w / 2, -sub_l / 2, 0.0], [sub_w / 2, sub_l / 2, h], priority=0,
        )
        scene.add_metal_box(
            "gnd", [-sub_w / 2, -sub_l / 2, 0.0], [sub_w / 2, sub_l / 2, 0.0],
            priority=10,
        )
        scene.add_metal_box(
            "patch", [-W / 2, -slice_len / 2, h], [W / 2, slice_len / 2, h],
            priority=10,
        )
        scene.add_lumped_port(
            1, 50.0, [feed_x, 0.0, 0.0], [feed_x, 0.0, h], direction="z"
        )

        mb = MeshBuilder()
        mb.add_line("x", [-sim_box[0] / 2, -W / 2, 0.0, W / 2, sim_box[0] / 2])
        mb.add_line("y", [-slice_len / 2, 0.0, slice_len / 2])
        # keep the slice thin (the whole point of the 2D solver — the
        # reference meshes only the slice + ground edges in y, :110):
        # pad just enough for the 8-cell PML to sit outside the ground
        # edge instead of widening to the full ±100 mm box
        y_pad = sub_l / 2 + 8.0 * res
        mb.add_line("y", [-y_pad, y_pad])
        mb.add_line("z", [-sim_box[2] / 3.0, 0.0, h, sim_box[2] * 2.0 / 3.0])
        mb.add_line("z", np.linspace(0.0, h, 5))
        mb.add_metal_edges(
            [-W / 2, -slice_len / 2, h], [W / 2, slice_len / 2, h],
            dirs="xy", metal_edge_res=res / 2.0,
        )
        mb.add_line("x", [float(feed_x)])
        grid = mb.build(res, ratio=1.4)

        cfg = FDTDConfig(
            n_steps_max=n_steps_max, end_criteria=end_criteria, boundary="PML_8"
        )
        sim = build_simulation(scene, grid, f0=f0, fc=fc, cfg=cfg)

        theta = np.linspace(0.0, np.pi, 121)  # radians (reference :160)
        phi = np.array([0.0, np.pi / 2, np.pi, 3 * np.pi / 2])
        nf_center = np.array([0.0, 0.0, 1e-3])

        if verbose:
            print(f"2D slice prepared: W={W:.1f} slice={slice_len:.1f} mm")
        return Prepared2D(
            True,
            f"Prepared 2D-like slice (grid {grid.shape})",
            sim=sim,
            theta=theta,
            phi=phi,
            nf_center=nf_center,
        )
    except Exception as e:
        return Prepared2D(False, f"prepare_2d failed: {e}")


def run_prepared_2d(
    prepared: Prepared2D,
    *,
    frequency_hz: float,
    verbose: int = 1,
) -> FDTDSolverResult:
    """Runner for the quasi-2D slice (4 φ cuts)."""
    try:
        if not prepared.ok or prepared.sim is None:
            return FDTDSolverResult(False, prepared.message)
        sim = prepared.sim
        t_start = time.perf_counter()
        out = sim.run()
        jax.block_until_ready(out["uf"])
        steps = int(out["steps"])
        wall = time.perf_counter() - t_start

        spectra = port_spectra(
            sim.port_freqs_hz, np.asarray(out["uf"][0]), np.asarray(out["if_"][0]),
            sim.dft_dt, z_ref=50.0,
        )
        f_res, s11_db_res = find_resonance(spectra, frequency_hz)
        fi = int(np.argmin(np.abs(sim.nf_freqs_hz - f_res)))
        theta_rad = np.asarray(prepared.theta)
        phi_rad = np.asarray(prepared.phi)
        ff = nf2ff_transform(
            sim.faces,
            select_face_freqs(out["nf_e"], fi),
            select_face_freqs(out["nf_h"], fi),
            sim.dft_dt,
            sim.nf_freqs_hz[fi : fi + 1],
            np.rad2deg(theta_rad),
            np.rad2deg(phi_rad),
            center_m=prepared.nf_center,
        )
        rad_eff, rad_eff_conv = radiation_efficiency(
            ff, spectra, float(out["e_ratio"])
        )
        return FDTDSolverResult(
            True,
            "Quasi-2D FDTD completed",
            theta=theta_rad,
            phi=phi_rad,
            intensity=ff.intensity_dbi(0),
            is_dBi=True,
            freq=spectra.freq_hz,
            s11=spectra.s11,
            z_in=spectra.z_in,
            f_res_hz=f_res,
            Dmax=float(ff.Dmax[0]),
            radiated_power_w=float(ff.P_rad[0]),
            radiation_efficiency=rad_eff,
            steps_run=steps,
            wall_time_s=wall,
            mcells_per_s=sim.grid.num_cells * steps / wall / 1e6,
            diagnostics={
                "s11_db_at_res": s11_db_res,
                "energy_ratio": float(out["e_ratio"]),
                "rad_eff_converged": rad_eff_conv,
            },
        )
    except Exception as e:
        return FDTDSolverResult(False, f"2D run failed: {e}")


# Reference-parity aliases
OpenEMS2DPrepared = Prepared2D
prepare_openems_patch_2d = prepare_patch_2d
