"""Gradient-based (adjoint) patch metallization design — inverse design.

Beyond-reference capability with no openEMS analog: the reference explores
designs only by re-running the solver per candidate (GUI reruns /
``multi_patch_designer`` edits; SURVEY §2.3 "vmap geometry sweeps" is the
batched version of that). Here the FDTD time loop itself is differentiated
with JAX reverse-mode autodiff, so a *continuous metallization density* on
the patch plane can be optimized directly against the port spectrum —
topology optimization of the radiating element, in the style of photonic
inverse design, on the same engine the forward solvers use.

How it works
------------
- A **base scene** (substrate, ground, lumped feed port — everything but
  the patch metal) is built once through the standard host-side pipeline
  (:func:`ops.fdtd.build_simulation`), exactly like
  ``solvers/patch_fixed.py`` builds the canonical scene.
- The design region is a rectangle on the substrate top plane. A density
  image ``rho ∈ [0,1]^(Ni,Nj)`` (one pixel per primary mesh cell) scales
  the tangential-E update coefficients there:

      ca_ex/cb_ex (and _ey) → (1 − m) · base

  where ``m`` is ``rho`` resampled onto the staggered Ex/Ey cell positions.
  ``m = 1`` reproduces the voxelizer's PEC sheet stamp (``ca = cb = 0``)
  *exactly*, so a binarized density is bit-identical to stamping metal
  boxes; intermediate densities act as partially conducting sheet — the
  standard density-interpolation trick of topology optimization.
- The forward model runs the engine's own exposed leapfrog step
  (:func:`ops.fdtd.make_single_step` — the same H/E update, MUR treatment
  and port source as every other run path) for a **fixed** number of steps
  under ``lax.scan``, with ``jax.checkpoint`` over inner chunks so the
  reverse pass stores O(n_steps / chunk) field snapshots instead of all of
  them. Port V/I are DFT-accumulated at the loss frequencies each step;
  S11 follows the engine's contract (``uf_inc = ½(uf + Z·if)``,
  ``s11 = uf_ref/uf_inc`` — ``post/ports.py``).
- ``jax.grad`` of ``loss(rho)`` is then the *adjoint field* solution —
  one reverse sweep gives the sensitivity of the whole S11 band to every
  density pixel at once, where finite differences would cost one full
  FDTD run per pixel.

The intended workflow is optimize → threshold → **validate**: the final
binary design is re-run through the standard engine path
(:meth:`InverseDesignProblem.validate`) with energy-criterion termination,
so the reported S11 never rests on the soft density model.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models.params import PatchAntennaParams
from ..models.scene import Scene
from ..ops.fdtd import (
    FDTDConfig,
    PreparedSimulation,
    build_simulation,
)
from ..ops.mesh import MeshBuilder
from ..physics import C0, ETA0, design_patch_for_frequency, \
    substrate_conductivity
from ..post.ports import find_resonance, port_spectra


@dataclass
class DesignRegion:
    """Index bookkeeping of the rectangular design region.

    The region spans primary cells ``i0..i1-1`` × ``j0..j1-1`` on plane
    ``k`` (mesh-line indices; ``i1``/``j1`` are the exclusive cell ends =
    inclusive node ends). A PEC sheet over the full region stamps
    tangential-E cells (verified against the voxelizer):

        ex: i ∈ [i0, i1),  j ∈ [j0, j1]   (x-edges: cell in x, node in y)
        ey: i ∈ [i0, i1],  j ∈ [j0, j1)   (y-edges: node in x, cell in y)
    """

    i0: int
    i1: int
    j0: int
    j1: int
    k: int
    x_mm: Tuple[float, float]
    y_mm: Tuple[float, float]

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.i1 - self.i0, self.j1 - self.j0)


def _cell_to_ex_ey(rho: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Resample a cell-centered density onto Ex / Ey staggered positions.

    Interior staggered nodes average the two adjacent cells; boundary
    nodes copy the single available cell, so ``rho ≡ 1`` maps to exactly
    1 everywhere (PEC parity) and ``rho ≡ 0`` to 0 (no metal).
    Ex: (Ni, Nj+1) — cell in x, node in y. Ey: (Ni+1, Nj).
    """
    mex = jnp.concatenate(
        [
            rho[:, :1],
            0.5 * (rho[:, 1:] + rho[:, :-1]),
            rho[:, -1:],
        ],
        axis=1,
    )
    mey = jnp.concatenate(
        [
            rho[:1, :],
            0.5 * (rho[1:, :] + rho[:-1, :]),
            rho[-1:, :],
        ],
        axis=0,
    )
    return mex, mey


def _pattern_consts(faces, theta_deg, phi_deg, f0_hz: float) -> dict:
    """Host-side constants for the differentiable far-field evaluation.

    Reuses the engine transform's geometry/angle assembly
    (``post/nf2ff.py::_face_geometry`` / ``_angles``) so the traced
    re-implementation below cannot drift from the validated NumPy path.
    """
    from ..post.nf2ff import _angles, _face_geometry

    pts, w, u_hat, v_hat, normals, slices = _face_geometry(faces)
    theta, phi, rhat, trig = _angles(theta_deg, phi_deg)
    return dict(
        pts=np.asarray(pts, np.float32),
        w=np.asarray(w, np.float32),
        u_hat=np.asarray(u_hat, np.float32),
        v_hat=np.asarray(v_hat, np.float32),
        normals=np.asarray(normals, np.float32),
        slices=slices,
        rhat=np.asarray(rhat, np.float32),
        trig=tuple(np.asarray(t, np.float32) for t in trig),
        k0=np.float32(2.0 * np.pi * f0_hz / C0),
        theta=theta,
        phi=phi,
    )


def _directivity_ri(consts: dict, face_e, face_h):
    """Traced single-frequency far-field directivity from face DFTs.

    The differentiable (real-pair) twin of the engine transform chain
    ``post/nf2ff.py::_surface_currents → _radiation_integrals →
    _assemble_far_field`` at ONE frequency: ``face_e[i]``/``face_h[i]``
    are the (2 re/im, 2 u/v, nu, nv) float32 DFT accumulators of Huygens
    face ``i``. Returns ``(D (A,), P_rad)`` — directivity at the
    ``consts`` angle grid plus the Poynting-flux radiated power. The
    Fourier dt factor is deliberately NOT applied (same float32 rationale
    as the S11 path): U ∝ dt² and P_rad ∝ dt², so it cancels in D —
    only ``P_rad`` is returned in these scaled units and is used solely
    as the normalizer. Pinned against the NumPy transform by
    ``tests/test_inverse.py::test_directivity_ri_matches_nf2ff``.
    """
    u_hat = consts["u_hat"]
    v_hat = consts["v_hat"]
    normals = consts["normals"]
    w = consts["w"]
    E_parts, H_parts = [], []
    for sl, fe, fh in zip(consts["slices"], face_e, face_h):
        # (2 re/im, n) tangential components → (2, n, 3) vectors
        eu = fe[:, 0].reshape(2, -1)
        ev = fe[:, 1].reshape(2, -1)
        hu = fh[:, 0].reshape(2, -1)
        hv = fh[:, 1].reshape(2, -1)
        E_parts.append(eu[..., None] * u_hat[sl] + ev[..., None] * v_hat[sl])
        H_parts.append(hu[..., None] * u_hat[sl] + hv[..., None] * v_hat[sl])
    E = jnp.concatenate(E_parts, axis=1)  # (2, P, 3)
    H = jnp.concatenate(H_parts, axis=1)
    J = jnp.cross(normals[None], H)  # n̂ × H  (linear: same map re/im)
    M = -jnp.cross(normals[None], E)  # −n̂ × E
    # ½ Re(E × H*) = ½ (E_re × H_re + E_im × H_im)
    S = 0.5 * (jnp.cross(E[0], H[0]) + jnp.cross(E[1], H[1]))
    P_rad = jnp.einsum("pc,pc,p->", S, normals, w)

    k0 = consts["k0"]
    ph = k0 * (consts["pts"] @ consts["rhat"].T)  # (P, A)
    c, s = jnp.cos(ph), jnp.sin(ph)

    def integrals(X):
        xw_re = (X[0] * w[:, None]).T  # (3, P)
        xw_im = (X[1] * w[:, None]).T
        return xw_re @ c - xw_im @ s, xw_re @ s + xw_im @ c  # (3, A) ×2

    N_re, N_im = integrals(J)
    L_re, L_im = integrals(M)
    ct, st, cp, sp = consts["trig"]

    def to_theta_phi(re_, im_):
        th = (re_[0] * ct * cp + re_[1] * ct * sp - re_[2] * st,
              im_[0] * ct * cp + im_[1] * ct * sp - im_[2] * st)
        phc = (-re_[0] * sp + re_[1] * cp, -im_[0] * sp + im_[1] * cp)
        return th, phc

    (N_th_re, N_th_im), (N_ph_re, N_ph_im) = to_theta_phi(N_re, N_im)
    (L_th_re, L_th_im), (L_ph_re, L_ph_im) = to_theta_phi(L_re, L_im)
    eta = np.float32(ETA0)
    pref = k0 / np.float32(4.0 * np.pi)
    # E_θ = −j·pref·(L_φ + η0 N_θ);  E_φ = +j·pref·(L_θ − η0 N_φ)
    x_re, x_im = L_ph_re + eta * N_th_re, L_ph_im + eta * N_th_im
    y_re, y_im = L_th_re - eta * N_ph_re, L_th_im - eta * N_ph_im
    e_th_re, e_th_im = pref * x_im, -pref * x_re
    e_ph_re, e_ph_im = -pref * y_im, pref * y_re
    U = (e_th_re**2 + e_th_im**2 + e_ph_re**2 + e_ph_im**2) / (2.0 * eta)
    D = 4.0 * np.pi * U / jnp.maximum(P_rad, np.float32(1e-20))
    return D, P_rad


@dataclass
class InverseDesignProblem:
    """A differentiable patch-design problem over a prepared base scene."""

    sim: PreparedSimulation
    region: DesignRegion
    freqs_hz: np.ndarray
    n_steps: int
    f0: float
    remat_chunk: int = 50
    _loss_grad: Dict = field(default=None, repr=False)
    _s11_fn: Callable = field(default=None, repr=False)
    _pattern_fns: Dict = field(default=None, repr=False)

    # -- differentiable forward --------------------------------------------

    def overlay_coeffs(self, rho: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Coefficient dict with the density applied to the design plane."""
        r = self.region
        mex, mey = _cell_to_ex_ey(rho)
        coeffs = dict(self.sim.coeffs)
        for comp, m, (i0, i1, j0, j1) in (
            ("ex", mex, (r.i0, r.i1, r.j0, r.j1 + 1)),
            ("ey", mey, (r.i0, r.i1 + 1, r.j0, r.j1)),
        ):
            keep = 1.0 - m.astype(jnp.float32)
            for name in (f"ca_{comp}", f"cb_{comp}"):
                a = coeffs[name]
                patch = a[i0:i1, j0:j1, r.k] * keep
                coeffs[name] = a.at[i0:i1, j0:j1, r.k].set(patch)
        return coeffs

    def _build_forward_fn(self, pattern: Optional[dict] = None) -> Callable:
        """The differentiable forward: ``rho → S11 (2, n_f)``, or — with
        ``pattern`` constants from :func:`_pattern_consts` — ``rho →
        (S11, D (A,))`` where D also DFT-accumulates the Huygens-face
        tangential fields at f0 inside the loop and routes them through
        the traced NF2FF twin (:func:`_directivity_ri`). With
        ``pattern=None`` the trace is exactly the original S11-only
        forward."""
        sim = self.sim
        # the same exposed step the driver's compile gate uses
        # (make_single_step), but with the carry initializer too
        from ..ops.fdtd import _make_run_fn

        inv_p, inv_d, mur_coef, pml = sim._aux
        field_step, init_carry = _make_run_fn(
            sim, inv_p, inv_d, mur_coef, pml, _expose_step=True
        )
        waveform = jnp.asarray(sim.waveform)
        n_steps = int(self.n_steps)
        chunk = max(1, int(self.remat_chunk))
        n_chunks = -(-n_steps // chunk)
        n_total = n_chunks * chunk
        # pad the waveform so the trailing (n_total - n_steps) steps
        # inject zeros rather than clamping to the last active sample
        if waveform.shape[0] < n_total:
            waveform = jnp.concatenate(
                [waveform,
                 jnp.zeros((n_total - waveform.shape[0],), waveform.dtype)]
            )
        w = jnp.asarray(2 * np.pi * np.asarray(self.freqs_hz), jnp.float32)
        dt = np.float32(sim.dt)
        n_f = len(self.freqs_hz)
        n_pf = len(sim.port_freqs_hz)
        n_nf = len(sim.nf_freqs_hz)
        w0 = None if pattern is None else np.float32(
            2.0 * np.pi * self.f0
        )
        face_shapes = [
            (f.u1 - f.u0, f.v1 - f.v0) for f in sim.faces
        ]

        def forward(rho):
            coeffs = self.overlay_coeffs(rho)
            carry0 = init_carry(coeffs, n_nf, n_pf)
            # (engine accumulators in carry0 stay zero — this path keeps
            # its own undecimated port DFTs at the loss frequencies)
            acc0 = jnp.zeros((4, n_f), jnp.float32)  # uf re/im, if re/im
            faces0 = ()
            if pattern is not None:
                faces0 = tuple(
                    jnp.zeros((2, 2, nu, nv), jnp.float32)
                    for _ in range(2) for (nu, nv) in face_shapes
                )  # e-faces then h-faces

            def one_step(state, n):
                carry, acc, faces_acc = state
                carry, probes = field_step(carry, n, coeffs, waveform)
                # E-grid sample time after step n is (n+1)·dt; H half a
                # step earlier — the engine's _flush_and_check contract
                t_e = (n.astype(jnp.float32) + 1.0) * dt
                t_h = t_e - np.float32(0.5) * dt
                v = probes["v"][0]
                i = probes["i"][0]
                acc = acc + jnp.stack(
                    [
                        v * jnp.cos(w * t_e),
                        -v * jnp.sin(w * t_e),
                        i * jnp.cos(w * t_h),
                        -i * jnp.sin(w * t_h),
                    ]
                )
                if pattern is not None:
                    nfc = len(face_shapes)
                    ce, se = jnp.cos(w0 * t_e), jnp.sin(w0 * t_e)
                    ch, sh = jnp.cos(w0 * t_h), jnp.sin(w0 * t_h)
                    faces_acc = tuple(
                        a + jnp.stack([fe * ce, -fe * se])
                        for a, fe in zip(faces_acc[:nfc], probes["faces_e"])
                    ) + tuple(
                        a + jnp.stack([fh * ch, -fh * sh])
                        for a, fh in zip(faces_acc[nfc:], probes["faces_h"])
                    )
                return (carry, acc, faces_acc), None

            @jax.checkpoint
            def chunk_body(state, ns):
                state, _ = jax.lax.scan(one_step, state, ns)
                return state, None

            steps = jnp.arange(n_total, dtype=jnp.int32).reshape(
                n_chunks, chunk
            )
            (carry, acc, faces_acc), _ = jax.lax.scan(
                chunk_body, (carry0, acc0, faces0), steps
            )
            # real-pair arithmetic throughout: complex64 stays off the jit
            # boundary (tunneled PJRT backends cannot transfer complex
            # buffers — same rule as the engine's DFT accumulators).
            # The Fourier-integral dt factor (post/ports.py multiplies
            # raw sums by dt) cancels in the uf_ref/uf_inc ratio and is
            # deliberately NOT applied: dt² ≈ 1e-24 under float32
            # squaring drives the backward pass to 0/NaN.
            uf_re, uf_im = acc[0], acc[1]
            if_re, if_im = acc[2], acc[3]
            z_ref = np.float32(self.sim.ports[0].spec.resistance)
            inc_re = 0.5 * (uf_re + z_ref * if_re)
            inc_im = 0.5 * (uf_im + z_ref * if_im)
            ref_re = uf_re - inc_re
            ref_im = uf_im - inc_im
            den = inc_re * inc_re + inc_im * inc_im
            s_re = (ref_re * inc_re + ref_im * inc_im) / den
            s_im = (ref_im * inc_re - ref_re * inc_im) / den
            s11 = jnp.stack([s_re, s_im])  # (2, n_f)
            if pattern is None:
                return s11
            nfc = len(face_shapes)
            D, _ = _directivity_ri(pattern, faces_acc[:nfc], faces_acc[nfc:])
            return s11, D

        return forward

    def _build_s11_fn(self) -> Callable:
        return self._build_forward_fn(pattern=None)

    @property
    def s11_fn(self) -> Callable:
        """``rho (Ni,Nj) → S11 at freqs_hz as (2, n_f) re/im`` —
        differentiable (real pairs keep complex off the jit boundary)."""
        if self._s11_fn is None:
            self._s11_fn = self._build_s11_fn()
        return self._s11_fn

    def s11(self, rho) -> np.ndarray:
        """Host-side convenience: complex S11 at ``freqs_hz``."""
        ri = np.asarray(self.s11_fn(jnp.asarray(rho)))
        return ri[0] + 1j * ri[1]

    def loss(self, rho: jnp.ndarray,
             weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Mean |S11|² over the loss band (optionally weighted)."""
        ri = self.s11_fn(rho)
        p = ri[0] ** 2 + ri[1] ** 2
        if weights is not None:
            return jnp.sum(p * weights) / jnp.sum(weights)
        return jnp.mean(p)

    # -- far-field (pattern) objective ---------------------------------------

    def pattern_fn(
        self,
        theta_deg: Sequence[float] = (0.0,),
        phi_deg: Sequence[float] = (0.0,),
    ) -> Callable:
        """``rho → (s11 (2, n_f), D (nθ·nφ,))`` — the differentiable
        forward extended with far-field directivity at the given angles
        (f0 only). Routed through the NF2FF surface-equivalence math
        (VERDICT r4 next #9): the loop accumulates the Huygens-face
        tangential DFTs and :func:`_directivity_ri` applies the
        radiation integrals, so ``jax.grad`` carries pattern sensitivity
        back through the transform AND the full time loop. Built (and
        cached) per angle grid."""
        key = (tuple(float(t) for t in np.atleast_1d(theta_deg)),
               tuple(float(p) for p in np.atleast_1d(phi_deg)))
        if self._pattern_fns is None:
            self._pattern_fns = {}
        if key not in self._pattern_fns:
            consts = _pattern_consts(
                self.sim.faces, np.asarray(key[0]), np.asarray(key[1]),
                self.f0,
            )
            # builders run jnp ops (static conversion in _make_run_fn);
            # when the first call arrives under a caller's jit trace,
            # those must evaluate eagerly or the cached closure captures
            # leaked tracers (same hazard prepare_patch_inverse defuses
            # by building _s11_fn eagerly)
            with jax.ensure_compile_time_eval():
                self._pattern_fns[key] = self._build_forward_fn(
                    pattern=consts
                )
        return self._pattern_fns[key]

    def broadside_gain_loss(self, rho: jnp.ndarray) -> jnp.ndarray:
        """Negative broadside realized gain: ``−D(θ=0)·(1−|S11(f0)|²)``.

        The matched objective for "make the patch radiate harder
        upward": directivity alone would reward detuning the feed
        (P_rad shrinks faster than U), so the mismatch factor keeps the
        optimizer honest about accepted power."""
        fwd = self.pattern_fn((0.0,), (0.0,))
        s11, D = fwd(rho)
        i_f0 = int(np.argmin(np.abs(np.asarray(self.freqs_hz) - self.f0)))
        p_f0 = s11[0, i_f0] ** 2 + s11[1, i_f0] ** 2
        return -(D[0] * (1.0 - p_f0))

    # -- optimization -------------------------------------------------------

    def optimize(
        self,
        rho0: Optional[np.ndarray] = None,
        *,
        n_iters: int = 40,
        lr: float = 0.05,
        beta_sharpen: float = 1.0,
        weights: Optional[np.ndarray] = None,
        callback: Optional[Callable] = None,
        objective: str = "s11_band",
    ) -> "InverseDesignResult":
        """Adam ascent on logits θ with ``rho = sigmoid(β·θ)``.

        ``rho0`` seeds the density (default 0.5 everywhere); ``callback``
        (if given) receives ``(iteration, loss, rho)`` per step.
        ``objective`` picks the loss: ``"s11_band"`` (mean |S11|² over
        ``freqs_hz``, optionally weighted) or ``"broadside_gain"``
        (negative broadside realized gain at f0 —
        :meth:`broadside_gain_loss`; ``weights`` is ignored).
        """
        import optax

        if rho0 is None:
            rho0 = 0.5 * np.ones(self.region.shape, np.float32)
        rho0 = np.clip(np.asarray(rho0, np.float32), 1e-4, 1 - 1e-4)
        theta = jnp.asarray(np.log(rho0 / (1 - rho0)) / beta_sharpen)
        w = None if weights is None else jnp.asarray(weights, jnp.float32)

        if objective == "s11_band":
            # weights ride as a jit argument, not a closure constant, so
            # re-optimizing with different weights reuses the compile
            def loss_of_theta(th, w_arr):
                return self.loss(jax.nn.sigmoid(beta_sharpen * th),
                                 weights=w_arr)
        elif objective == "broadside_gain":
            def loss_of_theta(th, w_arr):
                del w_arr
                return self.broadside_gain_loss(
                    jax.nn.sigmoid(beta_sharpen * th)
                )
        else:
            raise ValueError(
                f"unknown objective {objective!r} "
                "(expected 's11_band' or 'broadside_gain')"
            )

        if self._loss_grad is None:
            self._loss_grad = {}
        cache_key = (objective, beta_sharpen, weights is not None)
        if cache_key not in self._loss_grad:
            self._loss_grad[cache_key] = jax.jit(
                jax.value_and_grad(loss_of_theta)
            )
        loss_grad = self._loss_grad[cache_key]
        opt = optax.adam(lr)
        opt_state = opt.init(theta)
        history: List[float] = []
        t0 = time.perf_counter()
        for it in range(n_iters):
            val, g = loss_grad(theta, w)
            updates, opt_state = opt.update(g, opt_state)
            theta = optax.apply_updates(theta, updates)
            history.append(float(val))
            if callback is not None:
                callback(it, float(val),
                         np.asarray(jax.nn.sigmoid(beta_sharpen * theta)))
        rho = np.asarray(jax.nn.sigmoid(beta_sharpen * theta))
        s11 = self.s11(rho)
        return InverseDesignResult(
            rho=rho,
            history=history,
            s11=s11,
            freqs_hz=np.asarray(self.freqs_hz),
            wall_s=time.perf_counter() - t0,
            problem=self,
            objective=objective,
        )

    # -- validation through the standard engine -----------------------------

    def validate(self, rho: np.ndarray, threshold: float = 0.5,
                 pattern: bool = False) -> dict:
        """Re-run the *binarized* design through the standard engine path.

        Swaps hard-overlay coefficients into the base sim (the run
        function takes coefficients as arguments, so no rebuild is
        needed), runs with the configured termination criterion, and
        restores the base coefficients afterwards. Returns the engine's
        S11 sweep and resonance for the thresholded design. With
        ``pattern=True`` the engine's own NF2FF accumulators go through
        the standard transform (``post/nf2ff.py``) at f0 and the dict
        gains ``broadside_directivity`` (linear, θ=0), ``Dmax``, and
        ``broadside_realized_gain_dbi`` (directivity × (1−|S11(f0)|²) in
        dBi) — the independently-validated check on what the adjoint
        pattern objective optimized."""
        hard = (np.asarray(rho) >= threshold).astype(np.float32)
        sim = self.sim
        saved = sim.coeffs
        try:
            sim.coeffs = jax.tree_util.tree_map(
                jnp.asarray, self.overlay_coeffs(jnp.asarray(hard))
            )
            out = sim.run()
            spec = port_spectra(
                sim.port_freqs_hz,
                np.asarray(out["uf"][0]),
                np.asarray(out["if_"][0]),
                sim.dft_dt,
                z_ref=sim.ports[0].spec.resistance,
            )
        finally:
            sim.coeffs = saved
        f_res, s11_db = find_resonance(spec, self.f0)
        result = {
            "spectra": spec,
            "f_res_hz": f_res,
            "s11_db": s11_db,
            "steps": int(out["steps"]),
            "rho_binary": hard,
        }
        if pattern:
            from ..post.nf2ff import nf2ff_transform, select_face_freqs

            fi = int(np.argmin(np.abs(sim.nf_freqs_hz - self.f0)))
            ff = nf2ff_transform(
                sim.faces,
                select_face_freqs(out["nf_e"], fi),
                select_face_freqs(out["nf_h"], fi),
                sim.dft_dt,
                sim.nf_freqs_hz[fi : fi + 1],
                np.arange(0.0, 91.0, 5.0),
                np.array([0.0, 90.0]),
            )
            d_bs = float(ff.directivity[0, 0, 0])
            i_f0 = int(np.argmin(np.abs(spec.freq_hz - self.f0)))
            mismatch = 1.0 - min(abs(spec.s11[i_f0]) ** 2, 1.0)
            result["far_field"] = ff
            result["broadside_directivity"] = d_bs
            result["Dmax"] = float(ff.Dmax[0])
            result["broadside_realized_gain_dbi"] = float(
                10.0 * np.log10(max(d_bs * mismatch, 1e-12))
            )
        return result


@dataclass
class InverseDesignResult:
    rho: np.ndarray
    history: List[float]
    s11: np.ndarray
    freqs_hz: np.ndarray
    wall_s: float
    problem: InverseDesignProblem
    objective: str = "s11_band"

    def s11_db(self) -> np.ndarray:
        return 20.0 * np.log10(np.maximum(np.abs(self.s11), 1e-12))


def prepare_patch_inverse(
    params: PatchAntennaParams,
    *,
    region_mm: Optional[Sequence[float]] = None,
    freqs_hz: Optional[Sequence[float]] = None,
    n_steps: Optional[int] = None,
    fc_hz: Optional[float] = None,
    mesh_divisor: float = 20.0,
    sub_mm: float = 60.0,
    box_mm: Sequence[float] = (120.0, 120.0, 80.0),
    substrate_cells: int = 4,
    feed_pos_mm: float = -6.0,
    feed_r_ohm: float = 50.0,
    remat_chunk: int = 50,
    boundary: str = "MUR",
    n_steps_max_validate: int = 30_000,
) -> InverseDesignProblem:
    """Build the base scene (no patch) and the differentiable problem.

    The scene mirrors the canonical fixed-solver geometry
    (``solvers/patch_fixed.py``; reference scene
    ``solver_fdtd_openems_fixed.py:113-254``) with the patch left out:
    substrate + ground sheet + z-directed lumped feed. ``region_mm`` is
    the design rectangle ``(x0, x1, y0, y1)`` on the substrate top
    (default: the Hammerstad–Jensen designed patch footprint grown by
    25% per side — room for the optimizer to move the resonance both
    ways). ``freqs_hz`` are the loss frequencies (default: 5 points
    across ±10% of f0). ``n_steps`` is the fixed differentiable-forward
    step budget; the default covers the full Gaussian source plus half
    again for ring-down — enough to steer the resonance (the validated
    result always comes from a full energy-terminated engine run). An
    explicit ``n_steps`` shorter than the source itself is rejected:
    with no incident energy in the DFTs, ``1/|uf_inc|²`` overflows
    float32 in the backward pass and the gradient is NaN. ``fc_hz``
    widens the excitation band (default f0/2, the reference contract);
    ``fc_hz = f0`` halves the source duration — useful for cheap test
    problems.
    """
    f0 = params.frequency_hz
    fc = float(fc_hz) if fc_hz else f0 / 2.0
    h = params.h_m * 1e3
    L_m, W_m, _ = design_patch_for_frequency(f0, params.eps_r, params.h_m)
    if region_mm is None:
        gx = 0.25 * W_m * 1e3
        gy = 0.25 * L_m * 1e3
        region_mm = (
            -W_m / 2 * 1e3 - gx,
            W_m / 2 * 1e3 + gx,
            -L_m / 2 * 1e3 - gy,
            L_m / 2 * 1e3 + gy,
        )
    x0, x1, y0, y1 = (float(v) for v in region_mm)
    kappa = substrate_conductivity(f0, params.eps_r, params.loss_tangent)

    scene = Scene()
    scene.add_material_box(
        "substrate", params.eps_r, kappa,
        [-sub_mm / 2, -sub_mm / 2, 0.0], [sub_mm / 2, sub_mm / 2, h],
        priority=0,
    )
    scene.add_metal_box(
        "gnd", [-sub_mm / 2, -sub_mm / 2, 0.0],
        [sub_mm / 2, sub_mm / 2, 0.0], priority=10,
    )
    scene.add_lumped_port(
        1, feed_r_ohm, [feed_pos_mm, 0.0, 0.0], [feed_pos_mm, 0.0, h],
        direction="z", excite=1.0,
    )

    mesh_res = C0 / (f0 + fc) / 1e-3 / mesh_divisor  # mm
    mb = MeshBuilder()
    mb.add_line("x", [-box_mm[0] / 2, box_mm[0] / 2])
    mb.add_line("y", [-box_mm[1] / 2, box_mm[1] / 2])
    mb.add_line("z", [-box_mm[2] / 3, box_mm[2] * 2 / 3])
    # resolve the design region uniformly (a density pixel per cell)
    nx = max(2, int(np.ceil((x1 - x0) / mesh_res)))
    ny = max(2, int(np.ceil((y1 - y0) / mesh_res)))
    mb.add_line("x", np.linspace(x0, x1, nx + 1))
    mb.add_line("y", np.linspace(y0, y1, ny + 1))
    mb.add_metal_edges(
        [-sub_mm / 2, -sub_mm / 2, 0.0], [sub_mm / 2, sub_mm / 2, 0.0],
        dirs="xy",
    )
    mb.add_line("z", np.linspace(0.0, h, substrate_cells + 1))
    mb.add_line("x", [feed_pos_mm])
    mb.add_line("y", [0.0])
    grid = mb.build(mesh_res, ratio=1.4)

    cfg = FDTDConfig(
        n_steps_max=n_steps_max_validate,
        end_criteria=1e-4,
        boundary=boundary,
        use_pallas=False,  # autodiff needs the exposed XLA step
        probe_decimation=1,
    )
    if freqs_hz is None:
        freqs_hz = np.linspace(0.9 * f0, 1.1 * f0, 5)
    freqs_hz = np.asarray(freqs_hz, np.float64)
    sim = build_simulation(
        scene, grid, f0=f0, fc=fc, cfg=cfg,
        port_freqs_hz=np.linspace(max(1e8, f0 * 0.5), f0 * 1.5, 201),
        nf_freqs_hz=np.array([f0]),
    )
    if n_steps is None:
        n_steps = int(1.5 * sim.n_source_steps)
    elif n_steps < sim.n_source_steps:
        raise ValueError(
            f"n_steps={n_steps} is shorter than the Gaussian source "
            f"({sim.n_source_steps} steps): the port DFTs would hold no "
            "incident energy and the S11 gradient NaNs (1/|uf_inc|² "
            "overflow). Raise n_steps or widen the band via fc_hz."
        )

    tol = 1e-6
    gi = grid.lines["x"]
    gj = grid.lines["y"]
    gk = grid.lines["z"]
    i0 = int(np.searchsorted(gi, x0 - tol))
    i1 = int(np.searchsorted(gi, x1 - tol))
    j0 = int(np.searchsorted(gj, y0 - tol))
    j1 = int(np.searchsorted(gj, y1 - tol))
    k = int(np.searchsorted(gk, h - tol))
    for name, idx, lines, want in (
        ("x0", i0, gi, x0), ("x1", i1, gi, x1),
        ("y0", j0, gj, y0), ("y1", j1, gj, y1), ("z", k, gk, h),
    ):
        if abs(lines[idx] - want) > 1e-5:
            raise ValueError(
                f"design-region edge {name}={want} mm not on a mesh line "
                f"(nearest {lines[idx]:.4f})"
            )
    region = DesignRegion(
        i0=i0, i1=i1, j0=j0, j1=j1, k=k, x_mm=(x0, x1), y_mm=(y0, y1)
    )
    problem = InverseDesignProblem(
        sim=sim,
        region=region,
        freqs_hz=freqs_hz,
        n_steps=int(n_steps),
        f0=f0,
        remat_chunk=remat_chunk,
    )
    # build the forward eagerly: constructing it lazily inside a caller's
    # jit would bake trace-scoped constants into the cached closure
    # (UnexpectedTracerError on the next call outside that trace)
    problem._s11_fn = problem._build_s11_fn()
    return problem
