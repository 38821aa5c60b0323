"""Fused VMEM-resident multi-step FDTD kernel (Pallas/Mosaic, TPU).

The XLA path streams ~20 MB of field/coefficient traffic through HBM per
leapfrog step. This kernel instead keeps all six fields *and* all six
coefficient arrays resident in VMEM and advances ``n_steps`` (the probe
decimation interval) per invocation — HBM sees the state only once per
chunk, so the loop becomes VPU-bound.

Layout: every (Px, Py, Pz) array becomes 2D ``(R, C)`` with ``R = Px`` on
sublanes and ``C = Py·128`` on lanes — z is padded to exactly one 128-wide
lane tile per y row. Neighbor shifts are then all cheap:

- x ± 1 → roll along rows (sublanes),
- y ± 1 → roll by ±128 lanes (whole-tile reindex),
- z ± 1 → roll by ±1 lane.

Roll wrap-around (z wrapping into the next y row, y wrapping across the
array) lands on entries whose update coefficients or inverse-spacing
vectors are already zero — the same masking invariant the XLA path relies
on — so the curls need no extra masks. MUR faces are fixed in the same
x→y→z order as the XLA path: x faces as row writes, y faces as aligned
lane-tile writes, z faces as a masked blend (z planes are lane-strided).

Supported: MUR/PEC boundaries, any number of lumped ports (folded into
per-component source matrices), single chip. PML and sharded runs use the
XLA path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics import MU0

LANE = 128  # z-extent is padded to exactly one lane tile


def build_pallas_stepper(sim, inv_p, inv_d, mur_coef, alias: bool = False):
    # NOTE on `alias`: input_output_aliases proved unreliable on this
    # Pallas/Mosaic build — aliased output buffers intermittently failed to
    # carry the input field state, silently corrupting long runs (NaNs
    # after ~1k steps). The default path therefore uses distinct output
    # buffers seeded from the inputs with an in-kernel VMEM copy; the copy
    # costs ~6×1.6 MB of VMEM traffic per invocation, amortized over
    # probe_decim steps.
    """Build the kernel. Returns ``(step_fn, to_flat, from_flat)`` where
    ``step_fn(fields_flat6, wf_chunk)`` advances ``sim.probe_decim`` steps
    on six (R, C) float32 arrays and ``to_flat``/``from_flat`` convert
    between the 3D padded field layout and the kernel layout."""
    Px, Py, Pz = sim.padded_shape or sim.grid.shape
    if Pz > LANE:
        raise ValueError(
            f"Pallas stepper supports Pz ≤ {LANE} (got {Pz}); use the XLA path"
        )
    R = Px
    C = Py * LANE
    D = int(sim.probe_decim)
    dtmu = np.float32(sim.dt / MU0)
    mur = sim.cfg.boundary.upper().startswith("MUR")
    if sim.cfg.pml_cells() > 0:
        raise ValueError("Pallas stepper supports MUR/PEC boundaries only")

    def to_flat(a3: jnp.ndarray) -> jnp.ndarray:
        a3 = jnp.pad(a3, ((0, 0), (0, 0), (0, LANE - Pz)))
        return a3.reshape(R, C)

    def from_flat(a2: jnp.ndarray) -> jnp.ndarray:
        return a2.reshape(R, Py, LANE)[:, :, :Pz]

    coeffs_flat = {k: to_flat(v) for k, v in sim.coeffs.items()}

    # per-axis inverse spacings broadcast to flattened lane vectors
    yy = np.repeat(np.arange(Py), LANE)
    zz = np.tile(np.arange(LANE), Py)
    z_valid = zz < Pz

    def lane_vec(per_y=None, per_z=None):
        v = np.ones(C, np.float32)
        if per_y is not None:
            v *= np.asarray(per_y, np.float32)[yy]
        if per_z is not None:
            vz = np.zeros(LANE, np.float32)
            vz[:Pz] = np.asarray(per_z, np.float32)
            v *= vz[zz]
        v *= z_valid
        return v.reshape(1, C)

    lane_vecs = [
        lane_vec(per_y=inv_p[1]),  # iy_p
        lane_vec(per_z=inv_p[2]),  # iz_p
        lane_vec(per_y=inv_d[1]),  # iy_d
        lane_vec(per_z=inv_d[2]),  # iz_d
    ]
    col_vecs = [
        np.asarray(inv_p[0], np.float32).reshape(R, 1),  # ix_p
        np.asarray(inv_d[0], np.float32).reshape(R, 1),  # ix_d
    ]

    # z-boundary masks for the lane-strided MUR faces (true grid only)
    Qx, Qy, Qz = sim.grid.shape
    mz0 = np.zeros(C, np.float32)
    mz1 = np.zeros(C, np.float32)
    mz0[(zz == 0) & (yy < Qy)] = 1.0
    mz1[(zz == Qz - 1) & (yy < Qy)] = 1.0
    z_masks = [mz0.reshape(1, C), mz1.reshape(1, C)]

    # per-component lumped-port source matrices (only those present)
    src_mats = {}
    for prt in sim.ports:
        comp = prt.spec.direction  # 'x' | 'y' | 'z'
        mat = src_mats.setdefault(comp, np.zeros((Px, Py, Pz), np.float32))
        mat[prt.sl] += prt.src_col
    src_comps = sorted(src_mats)  # deterministic arg order
    src_inputs = [
        np.asarray(to_flat(jnp.asarray(src_mats[c]))) for c in src_comps
    ]

    cxs = {k: np.float32(v) for k, v in mur_coef.items()}

    def up(a, axis, n):  # a[idx + n]  (roll shifts must be non-negative)
        return pltpu.roll(a, a.shape[axis] - n, axis)

    def dn(a, axis, n):  # a[idx − n]
        return pltpu.roll(a, n, axis)

    n_src = len(src_comps)

    def kernel(*refs):
        wf_ref = refs[0]
        (ca_ex, cb_ex, ca_ey, cb_ey, ca_ez, cb_ez) = refs[1:7]
        (iy_p_r, iz_p_r, iy_d_r, iz_d_r) = refs[7:11]
        (ix_p_r, ix_d_r) = refs[11:13]
        (mz0_r, mz1_r) = refs[13:15]
        src_refs = refs[15 : 15 + n_src]
        field_in = refs[15 + n_src : 21 + n_src]
        ex, ey, ez, hx, hy, hz = refs[21 + n_src :]
        if not alias:
            # no aliasing: output refs start uninitialized; seed them
            for dst, src in zip((ex, ey, ez, hx, hy, hz), field_in):
                dst[:] = src[:]

        iyp, izp = iy_p_r[:], iz_p_r[:]
        iyd, izd = iy_d_r[:], iz_d_r[:]
        ixp, ixd = ix_p_r[:], ix_d_r[:]
        src_vals = {c: r[:] for c, r in zip(src_comps, src_refs)}

        def body(d, _):
            Ex, Ey, Ez = ex[:], ey[:], ez[:]
            Hx, Hy, Hz = hx[:], hy[:], hz[:]

            # ---- H half-step -------------------------------------------
            Hxn = Hx - dtmu * (
                (up(Ez, 1, LANE) - Ez) * iyp - (up(Ey, 1, 1) - Ey) * izp
            )
            Hyn = Hy - dtmu * (
                (up(Ex, 1, 1) - Ex) * izp - (up(Ez, 0, 1) - Ez) * ixp
            )
            Hzn = Hz - dtmu * (
                (up(Ey, 0, 1) - Ey) * ixp - (up(Ex, 1, LANE) - Ex) * iyp
            )

            # ---- E half-step -------------------------------------------
            s_val = wf_ref[0, d]
            Exn = ca_ex[:] * Ex + cb_ex[:] * (
                (Hzn - dn(Hzn, 1, LANE)) * iyd - (Hyn - dn(Hyn, 1, 1)) * izd
            )
            Eyn = ca_ey[:] * Ey + cb_ey[:] * (
                (Hxn - dn(Hxn, 1, 1)) * izd - (Hzn - dn(Hzn, 0, 1)) * ixd
            )
            Ezn = ca_ez[:] * Ez + cb_ez[:] * (
                (Hyn - dn(Hyn, 0, 1)) * ixd - (Hxn - dn(Hxn, 1, LANE)) * iyd
            )
            if "x" in src_vals:
                Exn = Exn + src_vals["x"] * s_val
            if "y" in src_vals:
                Eyn = Eyn + src_vals["y"] * s_val
            if "z" in src_vals:
                Ezn = Ezn + src_vals["z"] * s_val

            hx[:] = Hxn
            hy[:] = Hyn
            hz[:] = Hzn
            ex[:] = Exn
            ey[:] = Eyn
            ez[:] = Ezn

            if mur:
                # x faces (rows 0 / Qx−1): tangential Ey, Ez
                c0, c1 = cxs[(0, 0)], cxs[(0, 1)]
                ey[0, :] = Ey[1, :] + c0 * (Eyn[1, :] - Ey[0, :])
                ez[0, :] = Ez[1, :] + c0 * (Ezn[1, :] - Ez[0, :])
                ey[Qx - 1, :] = Ey[Qx - 2, :] + c1 * (
                    Eyn[Qx - 2, :] - Ey[Qx - 1, :]
                )
                ez[Qx - 1, :] = Ez[Qx - 2, :] + c1 * (
                    Ezn[Qx - 2, :] - Ez[Qx - 1, :]
                )
                # y faces (aligned lane tiles): tangential Ex, Ez — read the
                # just-fixed x rows back from the refs
                c0, c1 = cxs[(1, 0)], cxs[(1, 1)]
                y0 = slice(0, LANE)
                y1 = slice(LANE, 2 * LANE)
                ylast = slice((Qy - 1) * LANE, Qy * LANE)
                yprev = slice((Qy - 2) * LANE, (Qy - 1) * LANE)
                ex[:, y0] = Ex[:, y1] + c0 * (ex[:, y1] - Ex[:, y0])
                ez[:, y0] = Ez[:, y1] + c0 * (ez[:, y1] - Ez[:, y0])
                ex[:, ylast] = Ex[:, yprev] + c1 * (ex[:, yprev] - Ex[:, ylast])
                ez[:, ylast] = Ez[:, yprev] + c1 * (ez[:, yprev] - Ez[:, ylast])
                # z faces (lane-strided): tangential Ex, Ey via masked blend
                c0, c1 = cxs[(2, 0)], cxs[(2, 1)]
                m0, m1 = mz0_r[:], mz1_r[:]
                keep = 1.0 - m0 - m1
                for ref, Eo in ((ex, Ex), (ey, Ey)):
                    cur = ref[:]
                    v0 = up(Eo, 1, 1) + c0 * (up(cur, 1, 1) - Eo)
                    v1 = dn(Eo, 1, 1) + c1 * (dn(cur, 1, 1) - Eo)
                    ref[:] = cur * keep + m0 * v0 + m1 * v1
            return 0

        jax.lax.fori_loop(0, D, body, 0)

    static_inputs = (
        [coeffs_flat[k] for k in
         ("ca_ex", "cb_ex", "ca_ey", "cb_ey", "ca_ez", "cb_ez")]
        + [jnp.asarray(v) for v in lane_vecs]
        + [jnp.asarray(v) for v in col_vecs]
        + [jnp.asarray(v) for v in z_masks]
        + [jnp.asarray(v) for v in src_inputs]
    )
    n_inputs_before_fields = 1 + len(static_inputs)
    io_aliases = (
        {n_inputs_before_fields + i: i for i in range(6)} if alias else {}
    )

    interpret = jax.default_backend() not in ("tpu", "axon")
    call = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((R, C), jnp.float32) for _ in range(6)
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(static_inputs) + 6),
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 6,
        input_output_aliases=io_aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(110 * 1024 * 1024),
        ),
        interpret=interpret,
    )

    def step_fn(fields_flat, wf_chunk):
        wf2 = wf_chunk.reshape(1, D)
        out = call(wf2, *static_inputs, *fields_flat)
        return tuple(out)

    return step_fn, to_flat, from_flat
