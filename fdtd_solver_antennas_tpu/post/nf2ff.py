"""Near-field → far-field transform (surface equivalence) as XLA einsums.

Replaces openEMS's ``nf2ff.CalcNF2FF(sim_path, f, theta, phi, center=…)``
(reference: ``solver_fdtd_openems_fixed.py:296``) which re-reads disk dumps
in C++. Here the time loop already accumulated tangential E/H DFTs on the
Huygens box; this module applies the equivalence theorem

    J_s = n̂ × H,   M_s = −n̂ × E
    N(θ,φ) = ∬ J_s e^{+jk r̂·r'} dA,   L(θ,φ) = ∬ M_s e^{+jk r̂·r'} dA
    E_θ = −jk/(4πr)·(L_φ + η0 N_θ),   E_φ = +jk/(4πr)·(L_θ − η0 N_φ)

with the radiation integrals expressed as complex matmuls over surface
points × angle grid — MXU work on TPU. Radiated power comes from the
Poynting flux through the same surface, so ``Dmax``/``E_norm`` match the
openEMS result contract (dBi grid = 20·log10(E/Emax) + 10·log10(Dmax)).

Phase-center shifts (the ``center`` argument / ``nf_center`` contract) are
applied here, so patterns can be recomputed for new centers without
re-simulating — the same property the reference gets from disk replay.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import C0, ETA0


@dataclass
class FarField:
    """openEMS-compatible far-field result (fields indexed by frequency)."""

    freq_hz: np.ndarray  # (nf,)
    theta: np.ndarray  # radians (nth,)
    phi: np.ndarray  # radians (nph,)
    E_theta: np.ndarray  # (nf, nth, nph) complex, at r = 1 m
    E_phi: np.ndarray
    E_norm: np.ndarray  # (nf, nth, nph) |E|
    Dmax: np.ndarray  # (nf,)
    P_rad: np.ndarray  # (nf,) watts
    directivity: np.ndarray  # (nf, nth, nph) linear

    def intensity_dbi(self, fi: int = 0) -> np.ndarray:
        """The reference's dBi grid (fixed.py:313)."""
        e = self.E_norm[fi]
        e_max = e.max()
        if e_max <= 0:
            return np.full_like(e, -50.0)
        return 20.0 * np.log10(np.maximum(e / e_max, 1e-15)) + 10.0 * np.log10(
            self.Dmax[fi]
        )


@jax.jit
def _radiation_integral(pts, weights, F_re, F_im, rhat, k):
    """N(θφ) = Σ_p F_s[p]·w[p]·e^{+jk r̂·r'_p}.

    pts: (P, 3) float32; weights: (P,); F_re/F_im: (P, 3) float32;
    rhat: (A, 3) float32. Returns stacked (2, 3, A) float32 (re, im) —
    complex64 is kept off the host-transfer path (some PJRT transports
    cannot move complex arrays) and the four real matmuls hit the MXU.
    """
    kr = k * (pts @ rhat.T)  # (P, A)
    c, s = jnp.cos(kr), jnp.sin(kr)
    wre = F_re * weights[:, None]
    wim = F_im * weights[:, None]
    out_re = wre.T @ c - wim.T @ s
    out_im = wre.T @ s + wim.T @ c
    return jnp.stack([out_re, out_im])


def nf2ff_transform(
    faces: Sequence,
    nf_e: Sequence[np.ndarray],
    nf_h: Sequence[np.ndarray],
    dt: float,
    freq_hz: np.ndarray,
    theta_deg: np.ndarray,
    phi_deg: np.ndarray,
    center_m: np.ndarray | None = None,
) -> FarField:
    """Transform accumulated Huygens-box DFTs to the far field.

    ``faces`` are ``ops.fdtd.FaceRuntime``; ``nf_e[i]``/``nf_h[i]`` are the
    (nf, 2, nu, nv) complex accumulators for face i (tangential u, v
    components in face order).
    """
    # accept either complex per-face accumulators or the engine's stacked
    # (re, im)-leading float format (kept real on device for transfer)
    def _face_complex(a):
        a = np.asarray(a)
        if not np.iscomplexobj(a):
            a = a[0] + 1j * a[1]
        return a

    nf_e = [_face_complex(a) for a in nf_e]
    nf_h = [_face_complex(a) for a in nf_h]

    freq_hz = np.atleast_1d(np.asarray(freq_hz, float))
    theta = np.deg2rad(np.asarray(theta_deg, float)).ravel()
    phi = np.deg2rad(np.asarray(phi_deg, float)).ravel()
    nth, nph = len(theta), len(phi)
    th, ph = np.meshgrid(theta, phi, indexing="ij")
    st, ct = np.sin(th), np.cos(th)
    sp, cp = np.sin(ph), np.cos(ph)
    rhat = np.stack([st * cp, st * sp, ct], axis=-1).reshape(-1, 3)  # (A,3)
    A = rhat.shape[0]
    center = np.zeros(3) if center_m is None else np.asarray(center_m, float)

    E_theta = np.zeros((len(freq_hz), nth, nph), np.complex128)
    E_phi = np.zeros_like(E_theta)
    P_rad = np.zeros(len(freq_hz))

    # Per-face static geometry
    geo = []
    for face in faces:
        pts = (face.centers_m.reshape(-1, 3) - center).astype(np.float32)
        w = face.areas_m2.reshape(-1).astype(np.float32)
        geo.append((pts, w, face.normal.astype(np.float32)))

    rhat32 = jnp.asarray(rhat, jnp.float32)

    for fi, f in enumerate(freq_hz):
        k = 2.0 * np.pi * f / C0
        N = np.zeros((3, A), np.complex128)
        L = np.zeros((3, A), np.complex128)
        for face, (pts, w, normal), acc_e, acc_h in zip(faces, geo, nf_e, nf_h):
            # tangential complex fields at face cells (apply DFT dt factor)
            Eu = np.asarray(acc_e[fi, 0]).reshape(-1) * dt
            Ev = np.asarray(acc_e[fi, 1]).reshape(-1) * dt
            Hu = np.asarray(acc_h[fi, 0]).reshape(-1) * dt
            Hv = np.asarray(acc_h[fi, 1]).reshape(-1) * dt
            u_hat = np.zeros(3)
            u_hat[face.u_axis] = 1.0
            v_hat = np.zeros(3)
            v_hat[face.v_axis] = 1.0
            E_t = Eu[:, None] * u_hat + Ev[:, None] * v_hat  # (P, 3)
            H_t = Hu[:, None] * u_hat + Hv[:, None] * v_hat
            J_s = np.cross(np.broadcast_to(normal, E_t.shape), H_t)
            M_s = -np.cross(np.broadcast_to(normal, E_t.shape), E_t)

            for acc, F in ((N, J_s), (L, M_s)):
                ri = np.asarray(
                    _radiation_integral(
                        jnp.asarray(pts),
                        jnp.asarray(w),
                        jnp.asarray(F.real.astype(np.float32)),
                        jnp.asarray(F.imag.astype(np.float32)),
                        rhat32,
                        jnp.float32(k),
                    )
                )
                acc += ri[0] + 1j * ri[1]
            # Poynting flux through this face (outward)
            S = 0.5 * np.real(np.cross(E_t, np.conj(H_t))) @ normal
            P_rad[fi] += float(S @ w)

        ct_f, st_f = ct.reshape(-1), st.reshape(-1)
        cp_f, sp_f = cp.reshape(-1), sp.reshape(-1)
        N_th = N[0] * ct_f * cp_f + N[1] * ct_f * sp_f - N[2] * st_f
        N_ph = -N[0] * sp_f + N[1] * cp_f
        L_th = L[0] * ct_f * cp_f + L[1] * ct_f * sp_f - L[2] * st_f
        L_ph = -L[0] * sp_f + L[1] * cp_f

        pref = 1j * k / (4.0 * np.pi)  # r = 1 m, e^{−jkr} phase dropped
        E_theta[fi] = (-pref * (L_ph + ETA0 * N_th)).reshape(nth, nph)
        E_phi[fi] = (pref * (L_th - ETA0 * N_ph)).reshape(nth, nph)

    E_norm = np.sqrt(np.abs(E_theta) ** 2 + np.abs(E_phi) ** 2)
    U = E_norm**2 / (2.0 * ETA0)  # r = 1 m
    with np.errstate(divide="ignore", invalid="ignore"):
        directivity = 4.0 * np.pi * U / np.maximum(P_rad[:, None, None], 1e-30)
    Dmax = directivity.reshape(len(freq_hz), -1).max(axis=1)

    return FarField(
        freq_hz=freq_hz,
        theta=theta,
        phi=phi,
        E_theta=E_theta,
        E_phi=E_phi,
        E_norm=E_norm,
        Dmax=Dmax,
        P_rad=P_rad,
        directivity=directivity,
    )
