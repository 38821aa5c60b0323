"""Embedded element patterns + array synthesis (solvers/array_synth.py).

The reference can only radiate the uniform in-phase array pattern (it
drives every port identically, ``solver_fdtd_openems_microstrip_multi_3d.py:122-124``).
These tests pin the beyond-reference extractor to invariants that hold
exactly (up to discretization) by linearity of FDTD:

- superposition: the far field of the physical all-ports-on run equals
  the synthesis of the embedded patterns weighted by that run's own
  measured incident waves;
- in-phase drive of a symmetric 2-element pair beams broadside, the
  anti-phase drive nulls broadside;
- conjugate-match steering weights maximize intensity in the target
  direction over random equal-power weightings (Cauchy-Schwarz);
- radiated power never exceeds incident power (passivity);
- frequency rows outside the port DFT grid are rejected (the incident
  normalization cannot be interpolated).
"""

import numpy as np
import pytest

from fdtd_solver_antennas_tpu import compute_embedded_patterns
from fdtd_solver_antennas_tpu.models.scene import Scene
from fdtd_solver_antennas_tpu.ops.fdtd import FDTDConfig, build_simulation
from fdtd_solver_antennas_tpu.post.nf2ff import (
    nf2ff_transform,
    select_face_freqs,
)

FREQS = np.linspace(2.0e9, 3.0e9, 11)
NF_FREQ = 2.45e9
THETA = np.arange(0.0, 181.0, 15.0)
PHI = np.arange(0.0, 360.0, 15.0)


def _scene_two_patches():
    """Two identical patches over one ground plane (mirror-symmetric in
    x), lumped z-port at each patch center. Same scene as
    tests/test_sparams.py so both extractors are pinned on one geometry."""
    scene = Scene()
    scene.add_material_box("sub", 2.2, 0.0, [-30, -15, 0], [30, 15, 1.6], 0)
    scene.add_metal_box("gnd", [-30, -15, 0], [30, 15, 0], priority=10)
    for sgn, name in ((-1, "pa"), (+1, "pb")):
        cx = sgn * 13.0
        scene.add_metal_box(
            name, [cx - 6, -5, 1.6], [cx + 6, 5, 1.6], priority=10
        )
    scene.add_lumped_port(1, 50.0, [-13, 0, 0], [-13, 0, 1.6],
                          direction="z", excite=1.0)
    scene.add_lumped_port(2, 50.0, [13, 0, 0], [13, 0, 1.6],
                          direction="z", excite=1.0)
    from fdtd_solver_antennas_tpu.ops.mesh import MeshBuilder

    mb = MeshBuilder()
    mb.add_line("x", np.linspace(-34, 34, 35))
    mb.add_line("x", [-19.0, -13.0, -7.0, 7.0, 13.0, 19.0])
    mb.add_line("y", np.linspace(-19, 19, 20))
    mb.add_line("z", list(np.linspace(-8, 12, 11)) + [0.0, 0.8, 1.6])
    grid = mb.build(3.0)
    cfg = FDTDConfig(n_steps_max=3000, end_criteria=1e-5, check_every=500)
    return build_simulation(
        scene, grid, f0=2.45e9, fc=1.225e9, cfg=cfg,
        port_freqs_hz=FREQS, nf_freqs_hz=np.array([NF_FREQ]),
    )


@pytest.fixture(scope="module")
def extracted():
    """One shared extraction: (sim, EmbeddedPatternSet, all-on run out)."""
    sim = _scene_two_patches()
    eps = compute_embedded_patterns(sim, theta_deg=THETA, phi_deg=PHI)
    assert eps.ok, eps.message
    # restore=True put the physical [1, 1] excitation back
    out_all = sim.run()
    return sim, eps, out_all


def test_shapes_and_shared_smatrix(extracted):
    _, eps, _ = extracted
    assert eps.n_ports == 2
    assert eps.e_theta.shape == (2, 1, len(THETA), len(PHI))
    assert np.isfinite(eps.e_theta).all() and np.isfinite(eps.e_phi).all()
    # the S matrix rode along on the same two runs
    assert eps.smatrix is not None and eps.smatrix.ok
    assert eps.smatrix.s.shape == (2, 2, len(FREQS))
    assert eps.port_centers_m.shape == (2, 3)
    np.testing.assert_allclose(
        eps.port_centers_m[0], [-0.013, 0.0, 0.0008], atol=1e-12
    )


def test_superposition_matches_all_on_run(extracted):
    """Synthesis with the all-on run's own measured incident waves must
    reproduce that run's far field (linearity; exact up to the tiny
    residual incident wave at undriven matched ports)."""
    sim, eps, out_all = extracted
    ff_all = nf2ff_transform(
        sim.faces,
        select_face_freqs(out_all["nf_e"], 0),
        select_face_freqs(out_all["nf_h"], 0),
        sim.dft_dt,
        np.array([NF_FREQ]),
        THETA,
        PHI,
    )
    # measured incident waves of the physical run, on the NF2FF frequency
    z = np.array([50.0, 50.0])
    uf = np.asarray(out_all["uf"])[:2]
    if_ = np.asarray(out_all["if_"])[:2]
    a_pf = 0.5 * (uf + z[:, None] * if_) / np.sqrt(z)[:, None] * sim.dft_dt
    w = np.array(
        [
            np.interp(NF_FREQ, FREQS, a_pf[j].real)
            + 1j * np.interp(NF_FREQ, FREQS, a_pf[j].imag)
            for j in range(2)
        ]
    )
    pat = eps.synthesize(w, fi=0)
    ref = np.stack([ff_all.E_theta[0], ff_all.E_phi[0]])
    syn = np.stack([pat.E_theta, pat.E_phi])
    err = np.linalg.norm(syn - ref) / np.linalg.norm(ref)
    assert err < 2e-2, f"superposition residual {err:.3e}"


def test_embedded_patterns_are_mirror_images(extracted):
    """The scene is x-mirror symmetric and the z-directed port drive is
    mirror-invariant, so element 2's embedded pattern must be the exact
    x-reflection of element 1's: under x→−x a far-field direction maps
    (θ, φ)→(θ, π−φ) and the spherical components transform as
    E_θ→E_θ, E_φ→−E_φ (the broadside beam/null physics of any symmetric
    pair follows from this plus the array factor)."""
    _, eps, _ = extracted
    nph = len(PHI)
    # φ index map for φ → 180° − φ (grid is 0..345 step 15, so exact)
    pmap = np.array(
        [int(round(((180.0 - p) % 360.0) / 15.0)) % nph for p in PHI]
    )
    e1t, e1p = eps.e_theta[0, 0], eps.e_phi[0, 0]
    e2t, e2p = eps.e_theta[1, 0], eps.e_phi[1, 0]
    scale = np.linalg.norm(e1t) + np.linalg.norm(e1p)
    err_t = np.linalg.norm(e2t[:, pmap] - e1t) / scale
    err_p = np.linalg.norm(e2p[:, pmap] + e1p) / scale
    # 4e-2: mesh-snap tie-breaks are slightly asymmetric (see the x-line
    # comment in tests/test_sparams.py); a component-sign error would
    # read ~2.0 here, not 0.02
    assert err_t < 4e-2, f"E_theta mirror residual {err_t:.3e}"
    assert err_p < 4e-2, f"E_phi mirror residual {err_p:.3e}"


def _element_peak_deg(eps):
    """(θ°, φ°) grid direction where element 1's embedded pattern peaks
    — the direction where one polarization strongly dominates, making
    steering comparisons well-conditioned (broadside is a probe-feed
    null for this toy scene)."""
    mag = np.abs(eps.e_theta[0, 0]) ** 2 + np.abs(eps.e_phi[0, 0]) ** 2
    ti, pi = np.unravel_index(int(np.argmax(mag)), mag.shape)
    return float(np.degrees(eps.theta[ti])), float(np.degrees(eps.phi[pi])), ti, pi


def test_conjugate_steering_is_optimal(extracted):
    _, eps, _ = extracted
    td, pd, ti, pi = _element_peak_deg(eps)
    w_c = eps.steering_weights(td, pd, kind="conjugate")
    np.testing.assert_allclose(np.sum(np.abs(w_c) ** 2), 2.0, rtol=1e-12)
    u_c = eps.synthesize(w_c).U[ti, pi]
    rng = np.random.default_rng(7)
    for _ in range(5):
        w = rng.normal(size=2) + 1j * rng.normal(size=2)
        w *= np.sqrt(2.0 / np.sum(np.abs(w) ** 2))
        assert u_c >= eps.synthesize(w).U[ti, pi] * (1.0 - 1e-9)


def test_geometric_steering_is_near_optimal_at_peak(extracted):
    """Geometric (progressive-phase) steering ignores coupling and
    element-pattern differences, so it is bounded by the conjugate
    optimum but should land in its ballpark at a well-radiating
    direction."""
    _, eps, _ = extracted
    td, pd, ti, pi = _element_peak_deg(eps)
    w_g = eps.steering_weights(td, pd, kind="geometric")
    np.testing.assert_allclose(np.abs(w_g), 1.0, rtol=1e-12)
    u_g = eps.synthesize(w_g).U[ti, pi]
    u_c = eps.synthesize(eps.steering_weights(td, pd)).U[ti, pi]
    assert u_g <= u_c * (1.0 + 1e-9)
    assert u_g > 0.2 * u_c


def test_power_passivity_and_gain_ordering(extracted):
    _, eps, _ = extracted
    pat = eps.synthesize([1.0, 1.0])
    assert pat.P_inc == pytest.approx(1.0)
    assert not pat.partial_sphere
    # substrate + mismatch + coupling losses: strictly less than incident
    assert 0.0 < pat.P_rad < pat.P_inc
    assert pat.realized_gain.max() < pat.directivity.max()
    assert np.isfinite(pat.directivity_dbi()).all()


def test_bad_freq_idx_rejected(extracted):
    sim, _, _ = extracted
    bad = compute_embedded_patterns(sim, freq_idx=np.array([999]))
    assert not bad.ok and "freq_idx" in bad.message


def test_unknown_steering_kind_raises(extracted):
    _, eps, _ = extracted
    with pytest.raises(ValueError):
        eps.steering_weights(0.0, 0.0, kind="magic")
    with pytest.raises(ValueError):
        eps.synthesize([1.0, 2.0, 3.0])


# ---------------------------------------------------------------------------
# design_array / pick_resonance / array_run_summary (the shared workflow
# behind the CLI `array` command and the web UI Array tab)
# ---------------------------------------------------------------------------

from fdtd_solver_antennas_tpu.solvers.array_synth import (  # noqa: E402
    ArrayDesignResult,
    array_run_summary,
    design_array,
    pick_resonance,
)
from fdtd_solver_antennas_tpu.solvers.sparams import (  # noqa: E402
    SMatrixResult,
    compute_s_matrix,
)


def _synthetic_smatrix(diag_db):
    """Diagonal-only S matrix whose |S_ii| (dB) is `diag_db` (N, Nf)."""
    diag = np.asarray(diag_db, float)
    n, nf = diag.shape
    s = np.zeros((n, n, nf), complex)
    for i in range(n):
        s[i, i] = 10.0 ** (diag[i] / 20.0)
    return SMatrixResult(
        True, "synthetic", freq_hz=np.linspace(2e9, 3e9, nf), s=s,
        z_ref=np.full(n, 50.0),
    )


def test_pick_resonance_gated_dip():
    # mean dip at index 3 clears the -10 dB gate -> that frequency wins
    sm = _synthetic_smatrix([[-2, -6, -9, -18, -4], [-2, -6, -9, -16, -4]])
    f, resonant = pick_resonance(sm, 9.9e9)
    assert resonant and f == pytest.approx(sm.freq_hz[3])


def test_pick_resonance_falls_back_to_design_frequency():
    # the deepest mean dip (-9 dB) misses the gate -> design f0, flagged
    sm = _synthetic_smatrix([[-2, -9, -4], [-2, -9, -4]])
    f, resonant = pick_resonance(sm, 9.9e9)
    assert not resonant and f == pytest.approx(9.9e9)
    # band-edge noise below the gate must still win only at the argmin
    sm2 = _synthetic_smatrix([[-12, -3, -30], [-12, -3, -28]])
    f2, r2 = pick_resonance(sm2, 9.9e9)
    assert r2 and f2 == pytest.approx(sm2.freq_hz[2])


def test_design_array_rejects_tight_pitch_and_bad_counts():
    from fdtd_solver_antennas_tpu.models.params import PatchAntennaParams

    p = PatchAntennaParams.from_user_units(
        frequency_ghz=10.0, er=2.2, h_mm=0.787, loss_tangent=0.0009
    )
    # default pitch is free-space lambda/2 = 15 mm; the 10 GHz patch is
    # ~12 mm wide, so the <=4 mm gap guard must refuse before any FDTD
    d = design_array(p, 2, 1)
    assert not d.ok and "increase the pitch" in d.message
    assert d.spacing_mm == pytest.approx(14.99, abs=0.05)
    # the guard must consider the y pitch (patch L) for ny > 1 too
    dy = design_array(p, 1, 2, spacing_mm=12.0)
    assert not dy.ok and "increase the pitch" in dy.message
    assert not design_array(p, 0, 1).ok
    assert not design_array(p, 1, 0).ok


def test_array_run_summary_shapes(extracted):
    """array_run_summary on a hand-assembled design over the shared
    extraction: headline keys present, broadside == uniform synthesis."""
    _, eps, _ = extracted
    design = ArrayDesignResult(
        True, "test", patterns=eps, spacing_mm=26.0,
        f_synth_hz=float(eps.freq_hz[0]), fi=0, resonant=False,
    )
    td, pd, _, _ = _element_peak_deg(eps)
    summary, broadside, steered, w = array_run_summary(design, td, pd)
    assert summary["n_ports"] == 2
    assert summary["synth_freq_ghz"] == pytest.approx(NF_FREQ / 1e9)
    assert len(summary["s11_db"]) == 2
    assert summary["max_coupling_db"] is not None
    assert len(summary["steering_weights"]) == 2 and len(w) == 2
    ref = eps.synthesize(np.ones(2, complex), fi=0)
    np.testing.assert_allclose(broadside.U, ref.U)
    # design.steer must agree with the summary's steered beam
    np.testing.assert_allclose(design.steer(td, pd).U, steered.U)


def test_smatrix_abort_restores_excitation(extracted):
    sim, _, _ = extracted
    orig = [float(p.spec.excite) for p in sim.ports]
    res = compute_s_matrix(sim, abort_cb=lambda: True)
    assert not res.ok and "abort" in res.message
    assert [float(p.spec.excite) for p in sim.ports] == orig
