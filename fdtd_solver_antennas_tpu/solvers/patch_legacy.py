"""Legacy 3D patch solver parity (``solver_fdtd_openems.py:1-411``).

The reference's earlier solver variant: substrate and ground spanning the
whole 200×200 mm footprint, feed probe at x = −0.2·W, PML-8 walls (numeric
code 3), NrTS = 60000, EndCriteria 1e-5, and a full-sphere NF2FF grid
(θ: 91 points over 0..π, φ: 181 points over 0..2π, in radians — the legacy
module passes radians through, unlike the newer solvers' degrees).

The reference runner's multi-fallback far-field extraction
(P_rad/Prad → E_norm+Dmax → |Eθ|²+|Eφ|², solver_fdtd_openems.py:307-408)
exists because openEMS result objects vary by version; our transform always
yields E_norm/Dmax/E_theta/E_phi, so the primary path is always taken.
"""

from __future__ import annotations

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
from .base import FDTDSolverResult, SolverPrepared, SolverProbe, radiation_efficiency
from .patch_fixed import probe_fdtd


def probe_openems(dll_dir: str = "") -> SolverProbe:
    """Legacy probe name (reference: solver_fdtd_openems.py:110)."""
    return probe_fdtd(dll_dir)


def prepare_patch_legacy(
    params: PatchAntennaParams,
    *,
    dll_dir: str = "",  # parity arg, ignored
    work_dir: str = "",  # parity arg, ignored
    cleanup: bool = True,  # parity arg, ignored
    verbose: int = 0,
    n_steps_max: int = 60_000,
    end_criteria: float = 1e-5,
) -> SolverPrepared:
    try:
        f0 = params.frequency_hz
        fc = f0 / 2.0

        if params.patch_length_m and params.patch_width_m:
            L = params.patch_length_m * 1e3  # along y
            W = params.patch_width_m * 1e3  # along x
        else:
            L_m, W_m, _ = design_patch_for_frequency(f0, params.eps_r, params.h_m)
            L, W = L_m * 1e3, W_m * 1e3
        h = params.h_m * 1e3

        feed_x = -0.2 * W  # legacy feed fraction (reference :175)
        sim_box = np.array([200.0, 200.0, 150.0])
        kappa = substrate_conductivity(f0, params.eps_r, params.loss_tangent)

        # substrate + ground span the full footprint (reference :214-224)
        half_x, half_y = sim_box[0] / 2.0, sim_box[1] / 2.0
        scene = Scene()
        scene.add_material_box(
            "substrate", params.eps_r, kappa,
            [-half_x, -half_y, 0.0], [half_x, half_y, h], priority=0,
        )
        scene.add_metal_box(
            "gnd", [-half_x, -half_y, 0.0], [half_x, half_y, 0.0], priority=10
        )
        scene.add_metal_box(
            "patch", [-W / 2, -L / 2, h], [W / 2, L / 2, h], priority=10
        )
        scene.add_lumped_port(
            1, 50.0, [feed_x, 0.0, 0.0], [feed_x, 0.0, h], direction="z"
        )

        res = C0 / (f0 + fc) / 1e-3 / 20.0
        mb = MeshBuilder()
        mb.add_line("x", [-half_x, half_x])
        mb.add_line("y", [-half_y, half_y])
        mb.add_line("z", [-sim_box[2] / 3.0, sim_box[2] * 2.0 / 3.0])
        mb.add_line("z", np.linspace(0.0, h, 5))
        mb.add_metal_edges(
            [-W / 2, -L / 2, h], [W / 2, L / 2, h], dirs="xy",
            metal_edge_res=res / 2.0,
        )
        mb.add_line("x", [float(feed_x)])
        mb.add_line("y", [0.0])
        grid = mb.build(res, ratio=1.4)

        cfg = FDTDConfig(
            n_steps_max=n_steps_max, end_criteria=end_criteria,
            boundary="PML_8",  # legacy uses PML-8 (code 3), reference :188
        )
        sim = build_simulation(scene, grid, f0=f0, fc=fc, cfg=cfg)

        # legacy stores radians (reference :264-265)
        theta = np.linspace(0.0, np.pi, 91)
        phi = np.linspace(0.0, 2.0 * np.pi, 181)
        nf_center = np.array([0.0, 0.0, 1e-3])

        if verbose:
            print(
                f"legacy solver prepared: W(x)={W:.2f} L(y)={L:.2f} h={h:.3f} "
                f"feed_x={feed_x:.2f}, grid {grid.shape}"
            )
        return SolverPrepared(
            True,
            f"Legacy patch prepared (PML_8, grid {grid.shape})",
            sim=sim,
            theta=theta,
            phi=phi,
            nf_center=nf_center,
        )
    except Exception as e:
        return SolverPrepared(False, f"prepare failed: {e}")


def run_prepared_legacy(
    prepared: SolverPrepared,
    *,
    frequency_hz: float,
    verbose: int = 1,
) -> FDTDSolverResult:
    """Full-sphere legacy runner (reference: solver_fdtd_openems.py:271-411)."""
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
            "openEMS-equivalent FDTD completed",
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
                "nf2ff_freq_hz": float(sim.nf_freqs_hz[fi]),
                "energy_ratio": float(out["e_ratio"]),
                "rad_eff_converged": rad_eff_conv,
            },
        )
    except Exception as e:
        return FDTDSolverResult(False, f"run failed: {e}")


# Reference-parity aliases
prepare_openems_patch = prepare_patch_legacy
run_prepared_openems = run_prepared_legacy
