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

Supported: MUR/PEC and CPML boundaries, any number of lumped ports
(folded into per-component source matrices). Single-chip grids use the
VMEM chunk kernel (z ≤ 128) or the HBM-streaming trapezoidal kernel (any
z, incl. streamed CPML ψ state); the explicit multi-chip path has
per-shard variants of both (:func:`build_pallas_shard_stepper`,
:func:`build_pallas_stream_stepper` with ``shard=``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics import MU0

LANE = 128  # z-extent is padded to exactly one lane tile



def build_src_mats(sim, Px, Py, Pz, int_keys=False):
    """Per-component dense source matrices: every lumped-port column and
    MSL plane folded into ONE (Px, Py, Pz) stamp per excited E component
    (one fused FMA per component in the step, instead of per-port
    dynamic-update-slices). Keys are 'x'/'y'/'z' (or 0/1/2 with
    ``int_keys`` for the XLA paths that index component lists)."""
    src_mats = {}
    for prt in sim.ports:
        comp = prt.axis if int_keys else prt.spec.direction
        mat = src_mats.setdefault(comp, np.zeros((Px, Py, Pz), np.float32))
        mat[prt.sl] += prt.src_col
    for msl in sim.msl_ports:
        key = 2 if int_keys else "z"
        mat = src_mats.setdefault(key, np.zeros((Px, Py, Pz), np.float32))
        mat[msl.sl] += msl.src_col
    return src_mats


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

    # per-component port source matrices (lumped columns + MSL planes)
    src_mats = build_src_mats(sim, Px, Py, Pz)
    src_comps = sorted(src_mats)  # deterministic arg order
    def _to_flat_np(a3):
        a3 = np.pad(a3, ((0, 0), (0, 0), (0, LANE - Pz)))
        return np.ascontiguousarray(a3.reshape(R, C))

    src_inputs = [_to_flat_np(src_mats[c]) for c in src_comps]

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


# ---------------------------------------------------------------------------
# chunk-level kernel: D·n_sub steps + in-kernel probe extraction per sample
# ---------------------------------------------------------------------------

def stream_vmem_bytes(py: int, pz: int, n_src: int, block: int,
                      n_psi: int = 0, T: int = None,
                      lo_rows: int = 0) -> int:
    """Estimated peak VMEM of one streaming-kernel grid step at ``block``
    x-planes per block.

    Rows in the interleaved layout are ``py·128`` lanes; a block holds
    ``B = block·ceil(pz/128)`` of them.

    Two accounting modes:

    - ``T=None`` — the sharded-variant layout (everything triplicated
      prev/cur/next): double-buffered input blocks for the 12 field +
      6 coefficient + n_src source (+ ``n_psi`` CPML ψ) arrays,
      double-buffered outputs, and ~48 block-rows of window
      temporaries. Calibrated on v5e at 113.44 MB measured vs 113.6 MB
      estimated (B=8, Py=201, n_src=1, MUR).
    - ``T`` given — the round-4 single-chip layout, where the read-only
      coefficient/source arrays stream as ONE halo-extended window of
      ``Bw = B + 2·T·ZT + lo`` rows per block instead of three full
      blocks: fields (+ψ) stay triplicated (they are state), outputs
      double-buffered, plus window temporaries that scale with the
      trapezoid (the E/H window concats live across the unrolled T-step
      loop). Calibrated on v5e: flagship z=152 Bx=4/T=2 measured
      104.2 MB vs 105.9 estimated; tall z=160 Bx=8/T=3 measured
      146.95 MB vs 147.2 estimated (see BASELINE.md roofline section).
    """
    zt = -(-pz // 128)
    B = block * zt
    row_bytes = py * 128 * 4
    if T is None:
        rows = (2 * (12 + n_psi + n_src) * 3 * B
                + 2 * (6 + n_psi) * B
                + (48 + n_psi) * B)
        return rows * row_bytes
    # the halo-extended coeff/src window the kernel actually fetches
    # (exact: E-update rows of steps 1..T), Mosaic-rounded to 8 sublanes
    bw = -(-(B + 2 * (T - 1) * zt + lo_rows) // 8) * 8
    # the E/H window concats (live across the unrolled T-step loop)
    win = B + 2 * T * zt + lo_rows
    rows = (
        2 * (6 + n_psi) * 3 * B        # field/ψ inputs (p/c/n), dbuf
        + 2 * (6 + n_psi) * B          # outputs, dbuf
        + 2 * (6 + n_src) * bw         # coeff/src halo windows, dbuf
        # temporaries: calibrated at 21·win against the trip-layout
        # measurement (113.44 MB at B=8/Py=201/T=2 → 382 temp rows over
        # an 18-row window); ψ recursion intermediates add ~2 rows/ψ
        + (21 + 2 * n_psi) * win
    )
    return rows * row_bytes


# Peak VMEM allowed for one streaming-kernel invocation (as estimated by
# stream_vmem_bytes, calibrated against the XLA allocator's OOM reports).
# The v5e exposes 128 MB of VMEM; the kernel sets a 127 MB limit, and the
# flagship z=152 scene at B=8 rows estimates ~106 MB.
STREAM_VMEM_BUDGET = 120 * 1024 * 1024


def _pick_stream_bt(py, pz, n_src, qx, mur, n_psi=0, decim=None,
                    force_b=None):
    """Best (traffic_rows_per_plane_step, Bx, T) for one lane layout, or
    None when nothing fits. Shared core of :func:`pick_stream_params`
    and :func:`pick_stream_layout`. ``force_b`` restricts the block
    candidates to one value (the ``stream_bx`` tuning escape hatch)."""
    zt = -(-pz // 128)
    best = None  # (traffic_per_plane_step, Bx, T)
    for b in (16, 12, 8, 6, 4, 3):
        if force_b is not None and b != force_b:
            continue
        B = b * zt
        if B % 8:
            continue
        lo = zt if (mur and ((qx - 1) * zt) % B == 0) else 0
        t_hi = (B - lo) // zt - 1
        if decim is not None:
            t_hi = min(t_hi, decim)
        for t in range(min(t_hi, 8), 0, -1):
            if stream_vmem_bytes(py, pz, n_src, b, n_psi, T=t,
                                 lo_rows=lo) > STREAM_VMEM_BUDGET:
                continue
            bw = B + 2 * t * zt + lo
            traffic = ((6 + n_psi) * 4 * B + (6 + n_src) * bw) / (t * b)
            if best is None or traffic < best[0] - 1e-9:
                best = (traffic, b, t)
            break  # larger t is strictly better at fixed b
    return best


def pick_stream_params(py, pz, n_src, qx, mur, n_psi=0, decim=None):
    """Jointly choose (Bx, T) for the single-chip streaming kernel.

    Minimizes amortized HBM traffic per leapfrog step: one invocation
    moves ``(6+nψ)·3B`` field rows in, ``(6+nψ)·B`` out, and
    ``(6+n_src)·Bw`` halo-extended coefficient/source rows, and advances
    ``T`` steps over ``Bx`` x-planes — deeper trapezoids amortize every
    fetch but grow the VMEM windows and the redundant-compute cone, so
    the best point is the largest T whose block still fits the VMEM
    budget (for a fixed block, traffic is strictly decreasing in T).
    Round 3 hard-coded T ≤ 4 and picked the block first (the flagship
    resolved Bx=4/T=2); this joint pick lets small-row scenes take
    Bx=8/T≥3 (VERDICT r3 next #3).

    Legality: ``B = Bx·ZT ≡ 0 (mod 8)`` (Mosaic sublane tiling),
    ``T ≤ (B − lo)/ZT − 1`` (the trapezoid must fit the halo the
    neighbor block provides, ``lo`` = ZT when the MUR top x-face sits on
    a block boundary), and ``T ≤ decim`` when given (probe cadence).

    Returns ``(Bx, T)`` or ``(0, 0)`` when nothing fits.
    """
    best = _pick_stream_bt(py, pz, n_src, qx, mur, n_psi, decim)
    return (best[1], best[2]) if best else (0, 0)


def pick_stream_layout(py, pz, n_src, qx, mur, n_psi=0, decim=None,
                       force=None, force_bx=None):
    """Choose which transverse axis rides the 128-lane tiles:
    ``(swap_yz, Bx, T)``.

    The interleaved flat layout pads its lane axis to ``ZT·128`` lanes,
    so every HBM row-move pays the inflation ``ceil(L/128)·128/L`` of
    whichever axis sits on lanes. The round-3/early-round-4 kernel
    always put z there — the flagship z=152 scene paid 256/152 = 1.68×
    on every byte while y=201 would pay only 1.27×, and the tall-patch
    z=160 paid 1.60× while y=121 pays 1.06× (and drops to ZT=1, which
    unlocks deeper trapezoids). Swapping y↔z is a reflection, handled
    entirely at the layout boundary (see build_pallas_stream_stepper's
    ``swap_yz``), so this picker scores both orientations with the same
    amortized-traffic model (× the layout's true row width, which folds
    the padding inflation in) and returns the cheaper one.

    ``force``: None → auto; True/False pin the orientation (config
    escape hatch / tests).
    """
    cands = []
    for swap in (False, True):
        if force is not None and swap != bool(force):
            continue
        lpy, lpz = (pz, py) if swap else (py, pz)
        best = _pick_stream_bt(lpy, lpz, n_src, qx, mur, n_psi, decim,
                               force_b=force_bx)
        if best is not None:
            # traffic is rows per x-plane-step; a row is lpy·128 lanes,
            # so × lpy compares true bytes per (valid) cell-step
            cands.append((best[0] * lpy, swap, best[1], best[2]))
    if not cands:
        return False, 0, 0
    _, swap, bx, t = min(cands)
    return swap, bx, t


def pick_shard_stream_params(n, decim, py, pz, n_src, mur, has_pml=False):
    """Choose (Bx, T, rem) for the sharded streaming kernel, or None.

    ``n`` is the owned x-planes per device, ``decim`` the probe
    decimation. Unlike the single-chip ``_stream_prepass`` there is no global
    divisibility constraint — the per-device local extent is padded to a
    block multiple internally — but the halo must fit in the shard
    (``T + 1 ≤ n``) and the block must leave trapezoid room
    (``B ≥ (T+1)·ZT + lo``, ``lo = ZT`` under MUR since face/block
    alignment varies per device). Larger blocks amortize fetches better;
    deeper trapezoids mean fewer collectives — blocks are tried largest
    first, depths deepest first. Under CPML the 12 streamed ψ arrays
    roughly double the per-block VMEM footprint (smaller blocks
    resolve)."""
    zt = -(-pz // 128)
    lo = zt if mur else 0
    n_psi = 12 if has_pml else 0
    for b in (16, 12, 8, 6, 4, 3):
        B = b * zt
        if B % 8:
            continue
        if stream_vmem_bytes(py, pz, n_src, b, n_psi) > STREAM_VMEM_BUDGET:
            continue
        t_max = (B - lo) // zt - 1
        for t in (4, 3, 2, 1):
            if t <= t_max and t + 1 <= n and t <= decim:
                return b, t, decim % t
    return None


def build_pallas_stream_stepper(sim, inv_p, inv_d, mur_coef, shard=None,
                                pml=None, interpret=None, swap_yz=False):
    """HBM-streaming trapezoidal T-step kernel for large grids (any z).

    The VMEM-resident chunk kernel requires the whole working set in VMEM
    and z <= 128; big scenes (the 4.2M-cell mixed patch+horn workload,
    z = 152) fell back to the XLA path at ~2.5 Gcell/s. This kernel
    streams row-blocks of an *interleaved* flat layout through VMEM and
    advances T leapfrog steps per fetch with overlapped (trapezoidal)
    tiling. The layout is the round-3 row relayout (docs/ROADMAP.md):

    - rows ``r = x·ZT + zt`` (ZT = ceil(Pz/128) z lane-tiles), columns
      ``c = y·128 + zl`` — rows stay Py·128 lanes (~100 KB) regardless of
      the z extent, so z > 128 grids fit the same VMEM budget that the
      proven ZT=1 kernel validated on hardware;
    - neighbor access: y±1 = lane roll ±128; x±1 = row ±ZT (window
      slices); z±1 = lane roll ±1 with a *tile-seam* fix — at zl = 127
      the z+1 value lives in the next row (same x, zt+1), recovered as a
      roll-by-127 of the row-shifted array (and symmetrically for z−1 at
      zl = 0). Seam reads that cross x-planes (zt = ZT−1 → next x's
      zt = 0) land on z-pad lanes whose fields are identically zero, the
      same zero-coefficient invariant that kills all roll wrap-around;
    - the per-axis z inverse spacings are *not* lane-separable anymore
      (z depends on the row's zt too): they enter as ZT per-tile lane
      vectors combined under static row-parity masks (every window/block
      start is ≡ 0 mod ZT because B = Bx·ZT, so the zt of a local row is
      the compile-time pattern ``row % ZT``);
    - each grid iteration j fetches (prev, cur, next) blocks of every
      field/coefficient array (B = Bx·ZT rows per block, Bx x-planes),
      forms the halo window, and runs T Python-unrolled leapfrog steps
      whose valid row range shrinks by ZT per side per half-step — after
      T steps exactly the B cur rows are valid and written. Requires
      Bx ≥ T+1. Amortized HBM traffic ~(45+3·n_src) block moves per T
      steps ≈ 50-100 B/cell-step vs ~750 B on the XLA fallback;
    - boundary clamping of the halo specs stays safe at every step: all
      couplings across the x = 0 / x = Qx−1 planes go through terms
      masked by zero boundary cb / zero inverse spacings (the XLA path's
      invariant), so clamped garbage rows never contaminate valid rows;
    - MUR faces are pure value selects applied at every step in the XLA
      path's face order (x rows → y blend → z masked blend); the x-face
      selects cover the ZT rows of each face x-plane.

    T is ``sim.stream_T`` (must divide the probe decimation; the mode
    resolver rounds ``probe_decim`` to a multiple of T and requires
    T ≤ Bx−1). Under CPML (``pml`` given) the 12 ψ arrays stream through
    the same trapezoid windows as the fields — ψ_e rows ride with E, ψ_h
    with H — and the recursion profiles enter like the spacings
    (y-graded lane rows, z-graded per-tile rows, x-graded windowed
    columns); beyond-domain profile entries are zero so ψ stays
    identically zero in the padding.

    Returns ``(step_fn, statics, to_flat, from_flat, (R, C), T)`` with
    ``step_fn(statics, fields6_flat, psi_flat, wf_t) ->
    (fields6_flat, psi_flat)`` advancing T steps (``wf_t``: (T,)
    waveform samples; ``psi_flat``: 12-tuple pe6+ph6, or () for
    MUR/PEC).

    **Sharded variant** (``shard`` given, built for the explicit
    shard_map path — :func:`parallel.explicit.build_explicit_run`): the
    grid is decomposed along x over ``n_dev`` devices and each device
    streams a *halo-extended local* array through the same kernel —
    layout per device (in x-planes):

    ``[dead Bx][halo Hx][owned n][halo Hx][dead ≥ Bx]``

    - the ``Hx = T+1``-plane halos carry the neighbor's field rows and
      are refreshed by ONE ``ppermute`` per T-step invocation (the same
      trapezoidal-exchange amortization as the VMEM shard kernel);
    - the ``dead`` blocks hold all-zero coefficients/spacings so the
      pallas window *clamp* at the local array edges duplicates only
      zero-coupled rows — the identical invariant that makes the
      single-chip kernel's x padding safe (clamped garbage cannot
      cross a zero-``cb``/zero-inverse-spacing plane);
    - MUR x-face row selects come from per-device mask *columns*
      (windowed with the same prev/cur/next specs as the x spacings)
      instead of the single-chip global-row iota: shard_map traces one
      program for every device, so face positions must be operands.

    ``shard`` is a dict with keys ``n_dev`` (mesh size), ``n`` (owned
    x-planes per device), ``Bx`` (block planes), ``T`` (steps per
    invocation), ``rem`` (remainder steps per probe-decimation window,
    0 if T divides it). Returns a dict (see the code) with per-device
    statics, the T- and rem-step ``step_call`` variants, and the local
    layout constants the caller needs for halo exchange and probe
    extraction. Reference analog: none — the reference has no
    distributed execution (SURVEY §2.3).
    """
    Px, Py, Pz = sim.padded_shape or sim.grid.shape
    # ---- optional y↔z lane swap (single-chip; see pick_stream_layout) --
    # The swap is a REFLECTION of the scene: coordinates (x, y, z) →
    # (x, z, y) with E a polar vector (E'=(Ex, Ez, Ey)) and H an axial
    # one (H'=(−Hx, −Hz, −Hy)). The kernel body below is untouched — it
    # simply runs on the primed world: every per-axis static (spacings,
    # MUR coefficients, CPML profiles), every coefficient array, and
    # every source stamp is swapped/transposed here, while the component
    # permutation + H sign and the probe-gather index remap live at the
    # flat-layout boundary in ops/fdtd.py (_lift_resume_layout /
    # _assemble_output / build_probe_gathers). Yee staggering maps
    # exactly under the transpose (E'y sits at (i, j'+½, k') etc.), so
    # the primed run is bit-for-bit a valid FDTD of the same physics —
    # asserted against the XLA path by tests/test_stream_kernel.py.
    if swap_yz:
        if shard is not None:
            raise ValueError("swap_yz supports the single-chip path only")
        Px, Py, Pz = Px, Pz, Py
        inv_p = (inv_p[0], inv_p[2], inv_p[1])
        inv_d = (inv_d[0], inv_d[2], inv_d[1])
        mur_coef = {(a if a == 0 else 3 - a, s): v
                    for (a, s), v in mur_coef.items()}
        if pml is not None:
            pml = {0: pml[0], 1: pml[2], 2: pml[1]}
    ZT = -(-Pz // 128)
    Z = 128 * ZT
    C = Py * 128
    dtmu = np.float32(sim.dt / MU0)
    mur = sim.cfg.boundary.upper().startswith("MUR")
    if sim.cfg.pml_cells() > 0 and pml is None:
        raise ValueError("PML boundary requires the pml profile dict")
    has_pml = pml is not None
    n_psi = 12 if has_pml else 0
    Qx, Qy, Qz = sim.grid.shape
    if swap_yz:
        Qy, Qz = Qz, Qy
    if shard is None:
        R = Px * ZT
        Bx = int(sim.stream_block)      # x-planes per block
        B = Bx * ZT                     # rows per block
        T = int(sim.stream_T)
        if Bx <= 0 or Px % Bx:
            raise ValueError(f"invalid stream block {Bx} for Px={Px}")
        if not (1 <= T <= Bx - 1):
            raise ValueError(
                f"stream T={T} must satisfy 1 <= T <= Bx-1={Bx - 1}")
        nb = R // B
        r1 = ((Qx - 1) * ZT) % B        # row offset of the top face x-plane
        # When the MUR top x-face sits exactly on a block boundary
        # (r1 = 0), its x-neighbor plane belongs to the previous block;
        # extend every step's valid row range one x-plane below the
        # output block so the neighbor's E^k is always computed
        # in-window (the extra rows are discarded at write time). Costs
        # ZT rows of redundant compute per step and tightens the halo
        # requirement to B ≥ (T+1)·ZT + lo.
        lo = ZT if (mur and r1 == 0) else 0
        hi = 0  # x = 0 is always the first row of block 0 on one chip
    else:
        n_dev = int(shard["n_dev"])
        sh_n = int(shard["n"])          # owned x-planes per device
        Bx = int(shard["Bx"])
        B = Bx * ZT
        T = int(shard["T"])
        rem = int(shard["rem"])
        if Px % n_dev or Px // n_dev != sh_n:
            raise ValueError(f"Px={Px} does not shard into {n_dev}×{sh_n}")
        Hx = T + 1                      # halo planes per side
        if sh_n < Hx:
            raise ValueError(f"shard of {sh_n} planes < halo {Hx}")
        # Face positions vary per device relative to local blocks, so
        # the low-edge extension must hold for every alignment — and,
        # symmetrically, a HIGH-edge extension: the bottom x-face fix
        # reads its x+1 neighbor's E^k (shift_dn), which falls outside
        # the computed range when the face lands on the last plane of a
        # block (e.g. (T+2) % Bx == 0 puts device 0's x = 0 plane
        # there). One extra plane above keeps the neighbor in-window at
        # every step; the extension rows stay outside the output cone.
        lo = ZT if mur else 0
        hi = ZT if mur else 0
        base = Bx + Hx + sh_n + Hx + Bx
        PxL = -(-base // Bx) * Bx       # extra planes go to the top dead
        R = PxL * ZT
        nb = R // B
        own0 = (Bx + Hx) * ZT           # first owned row (local)
    if B < (T + 1) * ZT + lo:
        raise ValueError(
            f"stream block B={B} too small for T={T}, ZT={ZT}, lo={lo}"
        )

    R_g = Px * ZT                       # global row count

    def to_flat(a3):
        """Padded-3D (ORIGINAL orientation) → kernel flat layout."""
        if swap_yz:
            a3 = jnp.transpose(a3, (0, 2, 1))
        a3 = jnp.pad(a3, ((0, 0), (0, 0), (0, Z - Pz)))
        return a3.reshape(Px, Py, ZT, 128).transpose(0, 2, 1, 3).reshape(
            R_g, C)

    def from_flat(a2):
        a3 = a2.reshape(Px, ZT, Py, 128).transpose(0, 2, 1, 3)
        a3 = a3.reshape(Px, Py, Z)[:, :, :Pz]
        return jnp.transpose(a3, (0, 2, 1)) if swap_yz else a3

    # component-key swap for the E-update coefficient arrays: the primed
    # E'y is the original Ez, so ca'_ey(i,j',k') = ca_ez(i,k',j')
    _CK = ("ca_ex", "cb_ex", "ca_ey", "cb_ey", "ca_ez", "cb_ez")
    _CKMAP = {"ca_ey": "ca_ez", "cb_ey": "cb_ez",
              "ca_ez": "ca_ey", "cb_ez": "cb_ey"} if swap_yz else {}
    if shard is not None:
        def ext(ga2):
            """Global (R_g, k) rows → per-device (n_dev, R, k) local
            arrays. Only the halo+owned span is filled; the dead blocks
            (and halo rows beyond the global domain) stay zero — for
            coefficient/spacing/mask/source statics zero is exactly the
            out-of-domain value the clamp-safety invariant requires."""
            ga2 = np.asarray(ga2, np.float32)
            out = np.zeros((n_dev, R) + ga2.shape[1:], np.float32)
            for d in range(n_dev):
                gp0 = d * sh_n - Hx     # global plane of local plane Bx
                s0, s1 = max(0, gp0), min(Px, gp0 + 2 * Hx + sh_n)
                if s1 > s0:
                    l0 = (Bx + (s0 - gp0)) * ZT
                    out[d, l0 : l0 + (s1 - s0) * ZT] = ga2[s0 * ZT : s1 * ZT]
            return out

    yy = np.repeat(np.arange(Py), 128)
    zl = np.tile(np.arange(128), Py)

    def lane_vec_y(per_y):
        return (np.asarray(per_y, np.float32)[yy]).reshape(1, C)

    def lane_vec_z(per_z, t):
        """Lane vector of the z inverse spacings for lane tile ``t``."""
        vz = np.zeros(128, np.float32)
        seg = np.asarray(per_z, np.float32)[t * 128 : min((t + 1) * 128, Pz)]
        vz[: len(seg)] = seg
        return vz[zl].reshape(1, C)

    iy_p = lane_vec_y(inv_p[1])
    iy_d = lane_vec_y(inv_d[1])
    izp_tiles = [lane_vec_z(inv_p[2], t) for t in range(ZT)]
    izd_tiles = [lane_vec_z(inv_d[2], t) for t in range(ZT)]
    # per-row x inverse spacings: each x-plane's value repeated ZT times
    def x_col(per_x):
        return np.repeat(np.asarray(per_x, np.float32), ZT).reshape(R_g, 1)

    ix_p = x_col(inv_p[0])
    ix_d = x_col(inv_d[0])
    # MUR x-face row masks as global columns (sharded variant only: the
    # single-chip kernel derives them from the grid index instead)
    ftop = (Qx - 1) * ZT
    m0col = np.zeros((R_g, 1), np.float32)
    m0col[0:ZT] = 1.0
    mtcol = np.zeros((R_g, 1), np.float32)
    mtcol[ftop : ftop + ZT] = 1.0
    # CPML recursion profiles: y-graded as lane rows, z-graded as
    # per-tile lane rows (composed under row-parity masks in-kernel, like
    # the z spacings), x-graded as windowed columns (like the x spacings).
    # Beyond-domain entries are zero, so ψ stays identically zero in the
    # padding — the same invariant that protects the curls.
    if has_pml:
        pml_lane = [lane_vec_y(pml[1][kind][w])
                    for kind in ("half", "node") for w in (0, 1)]
        pml_ztiles = [
            lane_vec_z(pml[2][kind][w], t)
            for kind in ("half", "node") for w in (0, 1)
            for t in range(ZT)
        ]
        pml_xcols = [x_col(pml[0][kind][w])
                     for kind in ("half", "node") for w in (0, 1)]

    # z-face lane masks (row zt-masks are applied in-kernel via iota)
    zt1 = (Qz - 1) // 128               # tile holding the top z face
    zf1 = (Qz - 1) % 128                # its lane within the tile
    mz0 = (((zl == 0) & (yy < Qy)).astype(np.float32)).reshape(1, C)
    mz1 = (((zl == zf1) & (yy < Qy)).astype(np.float32)).reshape(1, C)
    my0 = (yy == 0).astype(np.float32).reshape(1, C)
    my1 = (yy == Qy - 1).astype(np.float32).reshape(1, C)
    # tile-seam lane masks for the z±1 shifts
    ml127 = (zl == 127).astype(np.float32).reshape(1, C)
    ml0 = (zl == 0).astype(np.float32).reshape(1, C)

    # Source stamps are built in ORIGINAL orientation (port slices are
    # original-space), then swapped: E is polar, so a z-directed port
    # becomes a y-directed primed source with NO sign. The kernel's
    # per-position component letters follow the ORIGINAL sorted order
    # (mapped, not re-sorted) so the caller's runtime src operands —
    # ordered by original sorted components in _make_run_fn — stay
    # positionally aligned.
    src_mats = build_src_mats(sim, *(sim.padded_shape or sim.grid.shape))
    _SWL = {"x": "x", "y": "z", "z": "y"}
    _orig_comps = sorted(src_mats)
    src_comps = [_SWL[c] for c in _orig_comps] if swap_yz else _orig_comps

    def _to_flat_np(a3):
        """Interleaved (x·ZT, y·128) relayout, host-side (no device trip).
        Like ``to_flat``, takes ORIGINAL-orientation arrays."""
        a3 = np.asarray(a3, np.float32)
        if swap_yz:
            a3 = a3.transpose(0, 2, 1)
        a3 = np.pad(a3, ((0, 0), (0, 0), (0, Z - Pz)))
        a3 = a3.reshape(Px, Py, ZT, 128).transpose(0, 2, 1, 3)
        return np.ascontiguousarray(a3.reshape(R_g, C))

    src_inputs = [_to_flat_np(src_mats[c]) for c in _orig_comps]
    n_src = len(src_comps)
    cxs = {k: np.float32(v) for k, v in mur_coef.items()}
    if shard is not None:
        # per-device statics: coefficients (from the host copies — a
        # device readback through the tunneled runtime costs ~50 s per
        # array), x spacings, face mask columns, sources
        coeffs_dev = [
            ext(_to_flat_np(sim._coeffs_np[k]))
            for k in ("ca_ex", "cb_ex", "ca_ey", "cb_ey", "ca_ez", "cb_ez")
        ]
        ixp_dev, ixd_dev = ext(ix_p), ext(ix_d)
        m0_dev, mt_dev = ext(m0col), ext(mtcol)
        src_dev = [ext(s) for s in src_inputs]
        pml_xcols_dev = [ext(c) for c in pml_xcols] if has_pml else []

    def up(a, axis, n):
        return pltpu.roll(a, a.shape[axis] - n, axis)

    def dn(a, axis, n):
        return pltpu.roll(a, n, axis)

    # Single-chip (round 4): the read-only coefficient/source arrays
    # stream as ONE halo-extended window per block — rows
    # [j·B − Hlo, (j+1)·B + Hhi) materialized per block on the host/at
    # build — instead of three full (prev, cur, next) blocks. The
    # E-update at step k touches rows [B−(T−k)·ZT−lo, 2B+(T−k)·ZT+hi),
    # so Hlo/Hhi = (T−1)·ZT + lo/hi cover every step exactly. This cuts
    # the kernel's HBM traffic ~12% on the flagship (coeff+src fetches
    # drop from 21·B to 7·Bw rows per invocation) and shrinks the VMEM
    # window enough for deeper trapezoids on smaller-row scenes.
    # The sharded variant keeps the triplicated layout (its per-device
    # local arrays already carry halos).
    import os as _os

    halo_coefs = shard is None and _os.environ.get(
        "FDTD_STREAM_COEF_MODE", "halo") != "trip"
    if halo_coefs:
        Hlo = (T - 1) * ZT + lo
        Hhi = (T - 1) * ZT + hi
        # Mosaic requires the block's sublane extent divisible by 8;
        # round the window up with never-read trailing rows
        BW = -(-(B + Hlo + Hhi) // 8) * 8
        Hhi = BW - B - Hlo
        woff = B - Hlo  # window coord of halo-ext ref row 0
        n_coef = 6
        n_srcw = n_src
    else:
        n_coef = 6 * 3
        n_srcw = n_src * 3

    def kernel(*refs):
        wf_ref = refs[0]
        # steps this invocation — static at trace time (the remainder
        # variant of the sharded path passes a shorter waveform window;
        # its shallower trapezoid still writes exactly [B−lo, 2B))
        Tk = wf_ref.shape[1]
        (iyp_r, iyd_r) = refs[1:3]
        izp_rs = refs[3 : 3 + ZT]
        izd_rs = refs[3 + ZT : 3 + 2 * ZT]
        o = 3 + 2 * ZT
        (mz0_r, mz1_r, my0_r, my1_r, ml127_r, ml0_r) = refs[o : o + 6]
        o = o + 6
        if has_pml:
            (bhy_r, chy_r, bey_r, cey_r) = refs[o : o + 4]
            o = o + 4
            bhz_rs = refs[o : o + ZT]
            chz_rs = refs[o + ZT : o + 2 * ZT]
            bez_rs = refs[o + 2 * ZT : o + 3 * ZT]
            cez_rs = refs[o + 3 * ZT : o + 4 * ZT]
            o = o + 4 * ZT
        ix_cols = refs[o : o + 6]        # ixp p/c/n, ixd p/c/n
        o = o + 6
        if shard is not None:
            fm_cols = refs[o : o + 6]    # m0 p/c/n, mt p/c/n
            o = o + 6
        if has_pml:
            pmlx_cols = refs[o : o + 12]  # bh/ch/be/ce_x, each p/c/n
            o = o + 12
        coef_refs = refs[o : o + n_coef]
        src_refs = refs[o + n_coef : o + n_coef + n_srcw]
        f_refs = refs[o + n_coef + n_srcw : o + n_coef + n_srcw + 18]
        o = o + n_coef + n_srcw + 18
        psi_in = refs[o : o + 3 * n_psi]  # ψ (pe6, ph6) × p/c/n
        outs = refs[o + 3 * n_psi :]
        (ex_o, ey_o, ez_o, hx_o, hy_o, hz_o) = outs[:6]
        psi_out = outs[6:]

        j = pl.program_id(0)
        iyp, iyd = iyp_r[:], iyd_r[:]
        k127, k0l = ml127_r[:], ml0_r[:]

        def win3(p, c, n, lo, hi):
            """Window rows [lo, hi) in window coords (0 = prev block start,
            B = cur block start, 2B = next block start)."""
            parts = []
            if lo < B:
                parts.append(p[lo:min(hi, B)])
            if hi > B and lo < 2 * B:
                parts.append(c[max(lo - B, 0):min(hi - B, B)])
            if hi > 2 * B:
                parts.append(n[max(lo - 2 * B, 0):hi - 2 * B])
            return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

        # z-graded vectors over the full window, built once per grid
        # step: window coord 0 is global row j·B − B ≡ 0 (mod ZT), so the
        # zt of window row w is the static pattern w % ZT.
        if ZT == 1:
            def z_full(tiles):
                return tiles[0][:]

            def iz_at(full, s, L):
                return full
        else:
            rows3 = jax.lax.broadcasted_iota(jnp.int32, (3 * B, 1), 0)
            ztr = jax.lax.rem(rows3, ZT)
            zt_masks = [(ztr == t).astype(jnp.float32) for t in range(ZT)]

            def z_full(tiles):
                return sum(zt_masks[t] * tiles[t][:] for t in range(ZT))

            def iz_at(full, s, L):
                return full[s : s + L]

        izp_full = z_full(izp_rs)
        izd_full = z_full(izd_rs)
        if has_pml:
            bhz_full = z_full(bhz_rs)
            chz_full = z_full(chz_rs)
            bez_full = z_full(bez_rs)
            cez_full = z_full(cez_rs)

        # E^0 window rows [B−T·ZT−lo, 2B+T·ZT+hi); H^0 rows [B−(T+1)·ZT−lo, ·)
        aE0, bE0 = B - Tk * ZT - lo, 2 * B + Tk * ZT + hi
        aH0 = B - (Tk + 1) * ZT - lo
        E = [win3(f_refs[c][:], f_refs[6 + c][:], f_refs[12 + c][:], aE0, bE0)
             for c in range(3)]
        H = [win3(f_refs[3 + c][:], f_refs[9 + c][:], f_refs[15 + c][:],
                  aH0, bE0) for c in range(3)]
        if has_pml:
            # ψ_e windows ride with E (same rows), ψ_h with H
            PE = [win3(psi_in[c][:], psi_in[12 + c][:], psi_in[24 + c][:],
                       aE0, bE0) for c in range(6)]
            PH = [win3(psi_in[6 + c][:], psi_in[18 + c][:],
                       psi_in[30 + c][:], aH0, bE0) for c in range(6)]
        ixp_w = jnp.concatenate([r[:] for r in ix_cols[0:3]], 0)
        ixd_w = jnp.concatenate([r[:] for r in ix_cols[3:6]], 0)
        if has_pml:
            bhx_w = jnp.concatenate([r[:] for r in pmlx_cols[0:3]], 0)
            chx_w = jnp.concatenate([r[:] for r in pmlx_cols[3:6]], 0)
            bex_w = jnp.concatenate([r[:] for r in pmlx_cols[6:9]], 0)
            cex_w = jnp.concatenate([r[:] for r in pmlx_cols[9:12]], 0)
        # Coefficient/source windows are sliced per step (win3 at
        # [a_k, b_k)) instead of materializing the full [0, 3B) concat
        # across all T steps: the full windows held 6+n_src arrays of 3B
        # rows live through the whole unrolled loop (~17 MB at B=8,
        # Py=201) and pushed the flagship z=152 scene 584 KB past the
        # 127 MB scoped-VMEM limit; per-step slices are dead after each
        # step, so the stack allocator reuses them.
        if halo_coefs:
            # halo-extended single-window refs: window coords map to ref
            # rows by a fixed offset (ref row 0 = window coord B − Hlo)
            def coef_at(c, lo_w, hi_w):
                return coef_refs[c][lo_w - woff : hi_w - woff]

            def src_at(s, lo_w, hi_w):
                return src_refs[s][lo_w - woff : hi_w - woff]
        else:
            def coef_at(c, lo_w, hi_w):
                return win3(coef_refs[c][:], coef_refs[6 + c][:],
                            coef_refs[12 + c][:], lo_w, hi_w)

            def src_at(s, lo_w, hi_w):
                return win3(src_refs[s][:], src_refs[n_src + s][:],
                            src_refs[2 * n_src + s][:], lo_w, hi_w)

        def up_z(self_a, rowp_a):
            """z+1 neighbor: lane roll +1, with zl=127 lanes patched from
            the row-above array (same x, next z tile)."""
            if ZT == 1:
                return up(self_a, 1, 1)
            return (1.0 - k127) * up(self_a, 1, 1) + k127 * dn(rowp_a, 1, 127)

        def dn_z(self_a, rowm_a):
            """z−1 neighbor: lane roll −1, with zl=0 lanes patched from
            the row-below array (same x, previous z tile)."""
            if ZT == 1:
                return dn(self_a, 1, 1)
            return (1.0 - k0l) * dn(self_a, 1, 1) + k0l * up(rowm_a, 1, 127)

        for k in range(1, Tk + 1):
            a_p = B - (Tk - k + 1) * ZT - lo  # start of E^{k-1} (window coords)
            a_k = a_p + ZT               # start of E^k
            b_k = 2 * B + (Tk - k) * ZT + hi
            LEn = b_k - a_k              # rows of E^k
            LH = LEn + ZT                # rows of H^k  [a_k−ZT, b_k)
            LE = LEn + 2 * ZT            # rows of E^{k-1}
            Ex, Ey, Ez = E               # rows [a_p, b_k+ZT), len LE
            Hx, Hy, Hz = H               # rows [a_p−ZT, b_k+ZT), len LE

            # ---- H half-step on rows [a_k−ZT, b_k) = [a_p, a_p+LH) ----
            ExL, EyL, EzL = Ex[:LH], Ey[:LH], Ez[:LH]
            Ex_zp, Ey_zp = Ex[1 : LH + 1], Ey[1 : LH + 1]
            ixp_k = ixp_w[a_p : a_p + LH]
            izp_k = iz_at(izp_full, a_p, LH)
            if has_pml:
                dEz_y = (up(EzL, 1, 128) - EzL) * iyp
                dEy_z = (up_z(EyL, Ey_zp) - EyL) * izp_k
                dEx_z = (up_z(ExL, Ex_zp) - ExL) * izp_k
                dEz_x = (Ez[ZT:LE] - EzL) * ixp_k
                dEy_x = (Ey[ZT:LE] - EyL) * ixp_k
                dEx_y = (up(ExL, 1, 128) - ExL) * iyp
                bhy, chy = bhy_r[:], chy_r[:]
                bhz_k = iz_at(bhz_full, a_p, LH)
                chz_k = iz_at(chz_full, a_p, LH)
                bhx_k = bhx_w[a_p : a_p + LH]
                chx_k = chx_w[a_p : a_p + LH]
                phxy = bhy * PH[0][ZT:LE] + chy * dEz_y
                phxz = bhz_k * PH[1][ZT:LE] + chz_k * dEy_z
                phyz = bhz_k * PH[2][ZT:LE] + chz_k * dEx_z
                phyx = bhx_k * PH[3][ZT:LE] + chx_k * dEz_x
                phzx = bhx_k * PH[4][ZT:LE] + chx_k * dEy_x
                phzy = bhy * PH[5][ZT:LE] + chy * dEx_y
                Hxn = Hx[ZT:LE] - dtmu * (
                    (dEz_y + phxy) - (dEy_z + phxz))
                Hyn = Hy[ZT:LE] - dtmu * (
                    (dEx_z + phyz) - (dEz_x + phyx))
                Hzn = Hz[ZT:LE] - dtmu * (
                    (dEy_x + phzx) - (dEx_y + phzy))
                PH = [phxy, phxz, phyz, phyx, phzx, phzy]
            else:
                # MUR/PEC hot path: spacing multiplies fused inline (the
                # hardware-proven form — keep it byte-identical)
                Hxn = Hx[ZT:LE] - dtmu * (
                    (up(EzL, 1, 128) - EzL) * iyp
                    - (up_z(EyL, Ey_zp) - EyL) * izp_k
                )
                Hyn = Hy[ZT:LE] - dtmu * (
                    (up_z(ExL, Ex_zp) - ExL) * izp_k
                    - (Ez[ZT:LE] - EzL) * ixp_k
                )
                Hzn = Hz[ZT:LE] - dtmu * (
                    (Ey[ZT:LE] - EyL) * ixp_k
                    - (up(ExL, 1, 128) - ExL) * iyp
                )

            # ---- E half-step on rows [a_k, b_k) -----------------------
            HxT, HyT, HzT = Hxn[ZT:LH], Hyn[ZT:LH], Hzn[ZT:LH]
            Hx_zm, Hy_zm = Hxn[ZT - 1 : LH - 1], Hyn[ZT - 1 : LH - 1]
            ixd_k = ixd_w[a_k : b_k]
            izd_k = iz_at(izd_full, a_k, LEn)
            ca = [coef_at(c, a_k, b_k) for c in range(6)]
            if has_pml:
                dHz_y = (HzT - dn(HzT, 1, 128)) * iyd
                dHy_z = (HyT - dn_z(HyT, Hy_zm)) * izd_k
                dHx_z = (HxT - dn_z(HxT, Hx_zm)) * izd_k
                dHz_x = (HzT - Hzn[:LEn]) * ixd_k
                dHy_x = (HyT - Hyn[:LEn]) * ixd_k
                dHx_y = (HxT - dn(HxT, 1, 128)) * iyd
                bey, cey = bey_r[:], cey_r[:]
                bez_k = iz_at(bez_full, a_k, LEn)
                cez_k = iz_at(cez_full, a_k, LEn)
                bex_k = bex_w[a_k : b_k]
                cex_k = cex_w[a_k : b_k]
                pexy = bey * PE[0][ZT : ZT + LEn] + cey * dHz_y
                pexz = bez_k * PE[1][ZT : ZT + LEn] + cez_k * dHy_z
                peyz = bez_k * PE[2][ZT : ZT + LEn] + cez_k * dHx_z
                peyx = bex_k * PE[3][ZT : ZT + LEn] + cex_k * dHz_x
                pezx = bex_k * PE[4][ZT : ZT + LEn] + cex_k * dHy_x
                pezy = bey * PE[5][ZT : ZT + LEn] + cey * dHx_y
                Exn = ca[0] * Ex[ZT : ZT + LEn] + ca[1] * (
                    (dHz_y + pexy) - (dHy_z + pexz))
                Eyn = ca[2] * Ey[ZT : ZT + LEn] + ca[3] * (
                    (dHx_z + peyz) - (dHz_x + peyx))
                Ezn = ca[4] * Ez[ZT : ZT + LEn] + ca[5] * (
                    (dHy_x + pezx) - (dHx_y + pezy))
                PE = [pexy, pexz, peyz, peyx, pezx, pezy]
            else:
                Exn = ca[0] * Ex[ZT : ZT + LEn] + ca[1] * (
                    (HzT - dn(HzT, 1, 128)) * iyd
                    - (HyT - dn_z(HyT, Hy_zm)) * izd_k
                )
                Eyn = ca[2] * Ey[ZT : ZT + LEn] + ca[3] * (
                    (HxT - dn_z(HxT, Hx_zm)) * izd_k
                    - (HzT - Hzn[:LEn]) * ixd_k
                )
                Ezn = ca[4] * Ez[ZT : ZT + LEn] + ca[5] * (
                    (HyT - Hyn[:LEn]) * ixd_k
                    - (HxT - dn(HxT, 1, 128)) * iyd
                )
            s_val = wf_ref[0, k - 1]
            for s, comp in enumerate(src_comps):
                mat = src_at(s, a_k, b_k) * s_val
                if comp == "x":
                    Exn = Exn + mat
                elif comp == "y":
                    Eyn = Eyn + mat
                else:
                    Ezn = Ezn + mat

            if mur:
                # x faces. The fix must be applied in EVERY window that
                # computes a face row, not just the block that owns it:
                # with r1 == 0 the top face is the first row of block
                # jq, and block jq−1 computes it as upper halo at every
                # intermediate step — gating the fix on j == jq left
                # those halo values un-fixed, and block jq−1's written
                # H at x = Qx−2 consumed them: a T>1-only inconsistency
                # that seeded a slow MUR instability (~0.25%/step growth
                # through the resonant mode; caught by the r3 bench's
                # stream_tall_patch energy guard). Select face rows by
                # GLOBAL row id g and form the x∓1 neighbors as uniform
                # ±ZT row shifts, so every window computes identical
                # face values (regression: test_stream_kernel.py).
                c00, c01 = cxs[(0, 0)], cxs[(0, 1)]
                if shard is None:
                    rows = jax.lax.broadcasted_iota(jnp.int32, (LEn, 1), 0)
                    g = rows + (j - 1) * B + a_k
                    m_r0 = ((g >= 0) & (g < ZT)).astype(jnp.float32)
                    m_rt = ((g >= ftop) & (g < ftop + ZT)).astype(
                        jnp.float32
                    )
                else:
                    # SPMD: face positions vary per device, so the masks
                    # ride in as per-device columns windowed like the x
                    # spacings — every window that computes a face row
                    # sees the identical mask (the seam-fix invariant)
                    m_r0 = win3(fm_cols[0][:], fm_cols[1][:],
                                fm_cols[2][:], a_k, b_k)
                    m_rt = win3(fm_cols[3][:], fm_cols[4][:],
                                fm_cols[5][:], a_k, b_k)
                EyO = Ey[ZT : ZT + LEn]
                EzO = Ez[ZT : ZT + LEn]

                def shift_dn(a):  # row ZT above: x+1 at the same zt
                    return jnp.concatenate(
                        [a[ZT:], jnp.zeros((ZT, C), a.dtype)], 0
                    )

                def shift_up(a):  # row ZT below: x−1 at the same zt
                    return jnp.concatenate(
                        [jnp.zeros((ZT, C), a.dtype), a[:-ZT]], 0
                    )

                fix0_ey = Ey[2 * ZT : 2 * ZT + LEn] + c00 * (
                    shift_dn(Eyn) - EyO
                )
                fix0_ez = Ez[2 * ZT : 2 * ZT + LEn] + c00 * (
                    shift_dn(Ezn) - EzO
                )
                fixt_ey = Ey[:LEn] + c01 * (shift_up(Eyn) - EyO)
                fixt_ez = Ez[:LEn] + c01 * (shift_up(Ezn) - EzO)
                keep_x = 1.0 - m_r0 - m_rt
                Eyn = Eyn * keep_x + m_r0 * fix0_ey + m_rt * fixt_ey
                Ezn = Ezn * keep_x + m_r0 * fix0_ez + m_rt * fixt_ez

                # y faces: lane roll ±128 masked blend, post-x-fix values
                c10, c11 = cxs[(1, 0)], cxs[(1, 1)]
                ky0, ky1 = my0_r[:], my1_r[:]
                keep_y = 1.0 - ky0 - ky1
                ExO = Ex[ZT : ZT + LEn]
                EyO = Ey[ZT : ZT + LEn]
                EzO = Ez[ZT : ZT + LEn]
                v0 = up(ExO, 1, 128) + c10 * (up(Exn, 1, 128) - ExO)
                v1 = dn(ExO, 1, 128) + c11 * (dn(Exn, 1, 128) - ExO)
                Exn = Exn * keep_y + ky0 * v0 + ky1 * v1
                v0 = up(EzO, 1, 128) + c10 * (up(Ezn, 1, 128) - EzO)
                v1 = dn(EzO, 1, 128) + c11 * (dn(Ezn, 1, 128) - EzO)
                Ezn = Ezn * keep_y + ky0 * v0 + ky1 * v1

                # z faces: masked blend on (zt-row × lane) masks. The z=0
                # neighbor (z=1) is always in-tile; the z=Qz−1 neighbor
                # crosses a tile seam only when its lane is 0.
                c20, c21 = cxs[(2, 0)], cxs[(2, 1)]
                if ZT == 1:
                    rm0 = rm1 = 1.0
                else:
                    ztrows = jax.lax.rem(
                        jax.lax.broadcasted_iota(jnp.int32, (LEn, 1), 0), ZT
                    )
                    rm0 = (ztrows == 0).astype(jnp.float32)
                    rm1 = (ztrows == zt1).astype(jnp.float32)
                m0 = rm0 * mz0_r[:]
                m1 = rm1 * mz1_r[:]
                keep_z = 1.0 - m0 - m1
                if ZT > 1 and zf1 == 0:
                    # top z face sits on a tile seam: its z−1 neighbor is
                    # the previous row's lane 127
                    EO_zm = (Ex[ZT - 1 : ZT + LEn - 1],
                             Ey[ZT - 1 : ZT + LEn - 1])
                    En_zm = tuple(
                        jnp.concatenate([a[:1] * 0.0, a[:-1]], 0)
                        for a in (Exn, Eyn)
                    )
                    v1x = up(EO_zm[0], 1, 127) + c21 * (
                        up(En_zm[0], 1, 127) - ExO
                    )
                    v1y = up(EO_zm[1], 1, 127) + c21 * (
                        up(En_zm[1], 1, 127) - EyO
                    )
                else:
                    v1x = dn(ExO, 1, 1) + c21 * (dn(Exn, 1, 1) - ExO)
                    v1y = dn(EyO, 1, 1) + c21 * (dn(Eyn, 1, 1) - EyO)
                v0 = up(ExO, 1, 1) + c20 * (up(Exn, 1, 1) - ExO)
                Exn = Exn * keep_z + m0 * v0 + m1 * v1x
                v0 = up(EyO, 1, 1) + c20 * (up(Eyn, 1, 1) - EyO)
                Eyn = Eyn * keep_z + m0 * v0 + m1 * v1y

            E = [Exn, Eyn, Ezn]
            H = [Hxn, Hyn, Hzn]

        # after T steps E covers [B−lo, 2B+hi); H covers [B−ZT−lo, 2B+hi);
        # the lo/hi extension rows are dropped at write time
        ex_o[:], ey_o[:], ez_o[:] = (e[lo : lo + B] for e in E)
        hx_o[:], hy_o[:], hz_o[:] = (h[ZT + lo : ZT + lo + B] for h in H)
        if has_pml:
            for ref, arr in zip(psi_out[:6], PE):   # ψ_e rows ride with E
                ref[:] = arr[lo : lo + B]
            for ref, arr in zip(psi_out[6:], PH):   # ψ_h rows with H
                ref[:] = arr[ZT + lo : ZT + lo + B]

    # ---- BlockSpecs --------------------------------------------------------
    blk = pl.BlockSpec((B, C), lambda j: (j, 0), memory_space=pltpu.VMEM)
    const_row = pl.BlockSpec((1, C), lambda j: (0, 0), memory_space=pltpu.VMEM)
    prev_i = lambda j: (jnp.maximum(j - 1, 0), 0)
    next_i = lambda j: (jnp.minimum(j + 1, nb - 1), 0)
    blk_p = pl.BlockSpec((B, C), prev_i, memory_space=pltpu.VMEM)
    blk_n = pl.BlockSpec((B, C), next_i, memory_space=pltpu.VMEM)
    col_p = pl.BlockSpec((B, 1), prev_i, memory_space=pltpu.VMEM)
    col_c = pl.BlockSpec((B, 1), lambda j: (j, 0), memory_space=pltpu.VMEM)
    col_n = pl.BlockSpec((B, 1), next_i, memory_space=pltpu.VMEM)

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    out6 = jax.ShapeDtypeStruct((R, C), jnp.float32)

    mask_specs = (
        [col_p, col_c, col_n, col_p, col_c, col_n] if shard is not None
        else []
    )
    pml_row_specs = [const_row] * (4 + 4 * ZT) if has_pml else []
    pml_col_specs = ([col_p, col_c, col_n] * 4) if has_pml else []
    psi_specs = (
        [blk_p] * n_psi + [blk] * n_psi + [blk_n] * n_psi
    )
    if halo_coefs:
        # halo-extended single-window specs for the read-only arrays
        blk_w = pl.BlockSpec((BW, C), lambda j: (j, 0),
                             memory_space=pltpu.VMEM)
        coefsrc_specs = [blk_w] * (6 + n_src)
    else:
        coefsrc_specs = (
            [blk_p] * 6 + [blk] * 6 + [blk_n] * 6
            + [blk_p] * n_src + [blk] * n_src + [blk_n] * n_src
        )
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM)]          # waveform (1,T)
            + [const_row] * 2                                 # iyp iyd
            + [const_row] * (2 * ZT)                          # izp/izd tiles
            + [const_row] * 6                                 # mz0 mz1 my0 my1 ml127 ml0
            + pml_row_specs                                   # CPML y rows + z tiles
            + [col_p, col_c, col_n, col_p, col_c, col_n]      # ixp3, ixd3
            + mask_specs                                      # m0/mt p/c/n
            + pml_col_specs                                   # bh/ch/be/ce_x p/c/n
            + coefsrc_specs                                   # coeffs + src
            + [blk_p] * 6 + [blk] * 6 + [blk_n] * 6           # fields p/c/n
            + psi_specs                                       # ψ p/c/n
        ),
        out_specs=(blk,) * (6 + n_psi),
        out_shape=(out6,) * (6 + n_psi),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(127 * 1024 * 1024),
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )

    lane_statics = (
        [jnp.asarray(iy_p), jnp.asarray(iy_d)]
        + [jnp.asarray(v) for v in izp_tiles]
        + [jnp.asarray(v) for v in izd_tiles]
        + [jnp.asarray(mz0), jnp.asarray(mz1),
           jnp.asarray(my0), jnp.asarray(my1),
           jnp.asarray(ml127), jnp.asarray(ml0)]
    )
    if has_pml:
        lane_statics += [jnp.asarray(v) for v in pml_lane]
        lane_statics += [jnp.asarray(v) for v in pml_ztiles]

    if shard is not None:
        # per-device row statics carry a leading n_dev axis; the caller
        # shards them with P(axis_name) and strips it inside shard_map
        dev_statics = (
            [ixp_dev] * 3 + [ixd_dev] * 3
            + [m0_dev] * 3 + [mt_dev] * 3
            + [c for c in pml_xcols_dev for _ in range(3)]
            + coeffs_dev * 3
            + src_dev * 3
        )

        def step_call(lane_in, dev_in, fields_flat, psi_flat, wf_t, nsteps):
            wf2 = jnp.asarray(wf_t, jnp.float32).reshape(1, nsteps)
            fields = tuple(fields_flat)
            psi = tuple(psi_flat)
            out = call(wf2, *lane_in, *dev_in,
                       *fields, *fields, *fields, *psi, *psi, *psi)
            return tuple(out[:6]), tuple(out[6:])

        def from_local(a2):
            """Extended local flat (R, C) → owned (n, Py, Pz) rows."""
            a3 = a2[own0 : own0 + sh_n * ZT].reshape(sh_n, ZT, Py, 128)
            return a3.transpose(0, 2, 1, 3).reshape(sh_n, Py, Z)[:, :, :Pz]

        return dict(
            step_call=step_call,
            lane_statics=tuple(lane_statics),
            dev_statics=dev_statics,
            from_local=from_local,
            R=R, C=C, T=T, rem=rem, ZT=ZT, n_psi=n_psi,
            own0=own0, n_rows=sh_n * ZT, halo_rows=Hx * ZT,
        )

    # host-side halo-extension: (R_g + pads, C) flat → (nb·BW, C) with
    # block j's rows = global [j·B − Hlo, (j+1)·B + Hhi), zero beyond
    # the domain (zero coefficients are exactly the out-of-domain value)
    if halo_coefs:
        _ext_idx = (
            np.arange(nb)[:, None] * B + np.arange(BW)[None, :]
        ).reshape(-1)

        def _halo_ext_np(flat2d: np.ndarray) -> np.ndarray:
            padded = np.pad(np.asarray(flat2d, np.float32),
                            ((Hlo, Hhi), (0, 0)))
            return np.ascontiguousarray(padded[_ext_idx])

        def _halo_ext(flat2d: jnp.ndarray) -> jnp.ndarray:
            padded = jnp.pad(flat2d, ((Hlo, Hhi), (0, 0)))
            return padded[_ext_idx]

        def _src_to_op_np(a3: np.ndarray) -> np.ndarray:
            return _halo_ext_np(_to_flat_np(a3))

        _src_rep = 1
        _coef_rep = 1
    else:
        _src_to_op_np = _to_flat_np
        _halo_ext = lambda flat2d: flat2d  # trip mode: full blocks
        _src_rep = 3
        _coef_rep = 3

    # The six ca/cb windows are RUNTIME OPERANDS (round 5; same treatment
    # the chunk kernel's coefficients and the port sources got): the
    # traced converter below rebuilds them from a padded-3D coefficient
    # dict inside any trace, so geometry swaps reuse the compiled kernel
    # and jax.vmap batches the stream kernel over design sweeps whose
    # union grid exceeds the chunk kernel's VMEM budget
    # (VERDICT r4 next #1).
    def coef_ops_from(coeffs3d: dict):
        """Padded-3D coefficient dict → the kernel's coefficient window
        operands (traced jnp ops; vmap-compatible). Handles the y↔z lane
        swap's component-key remap and the halo-window extension."""
        return tuple(
            _halo_ext(to_flat(coeffs3d[_CKMAP.get(k, k)])) for k in _CK
        ) * _coef_rep

    statics = tuple(
        lane_statics
        + [jnp.asarray(ix_p)] * 3 + [jnp.asarray(ix_d)] * 3
        + ([a for v in pml_xcols for a in [jnp.asarray(v)] * 3]
           if has_pml else [])
    )

    def step_fn(statics_in, src_ops, fields_flat, psi_flat, wf_t):
        """Advance T steps. ``statics_in`` is the returned ``statics``
        prefix (lane/column vectors) WITH the six coefficient windows
        from ``step_fn.coef_ops_from(coeffs)`` appended — passed through
        the enclosing jit as *arguments* (closure capture would embed
        ~200 MB of coefficient arrays as HLO constants, which made the
        remote-compile payload enormous and compile times explode; as
        traced operands they are also vmap-batchable for geometry
        sweeps). ``src_ops`` is the tuple of per-component source
        matrices in the layout ``step_fn.src_to_flat_np`` produces
        (sorted-component order) — a runtime operand so re-excitation
        (S-matrix one-hot runs) re-uses the compiled program.
        ``psi_flat`` is the 12-tuple of CPML ψ arrays (pe6 then ph6,
        flat layout) or () for MUR/PEC; returns (fields6, psi)."""
        wf2 = jnp.asarray(wf_t, jnp.float32).reshape(1, T)
        fields = tuple(fields_flat)
        psi = tuple(psi_flat)
        src = tuple(src_ops) * _src_rep
        out = call(wf2, *statics_in, *src, *fields, *fields, *fields,
                   *psi, *psi, *psi)
        return tuple(out[:6]), tuple(out[6:])

    step_fn.src_to_flat_np = _src_to_op_np
    step_fn.src_comps = src_comps
    step_fn.coef_ops_from = coef_ops_from
    return step_fn, statics, to_flat, from_flat, (R, C), T


# ψ key order shared between the chunk kernel and the XLA carry dicts
PSI_KEYS = ("xy", "xz", "yz", "yx", "zx", "zy")

# coefficient-operand order of the chunk kernel (matches the kernel's
# positional unpack refs[1:7])
COEF_KEYS = ("ca_ex", "cb_ex", "ca_ey", "cb_ey", "ca_ez", "cb_ez")


def chunk_fused_cols(py: int, pz: int) -> int:
    """Lane count of one fused-layout row: ``ceil(Py·Pz/128)·128``."""
    return -(-(py * pz) // LANE) * LANE


def build_pallas_chunk_stepper(sim, inv_p, inv_d, mur_coef, pml=None,
                               fused=False):
    """One kernel invocation per termination chunk.

    The kernel runs a grid of ``n_sub`` sample intervals; each grid step
    advances ``D`` leapfrog iterations with fields resident in VMEM and
    then extracts every probe quantity *in-kernel*:

    - port V (row-slice dot) and I (four scalar reads),
    - x-face tangentials as row vectors (lane rolls only),
    - y-face tangentials as lane-tile slices,
    - z-face tangentials via one-hot selection matmuls (lane-strided
      planes are unreachable by slicing; the MXU gathers them instead),

    streaming them to per-sample output windows. HBM traffic per chunk:
    one load of statics+fields, one store of fields, plus the small probe
    windows — the XLA side only assembles windows and runs the chunk DFTs.

    With ``pml`` (the :func:`fdtd._cpml_profiles` dict) the kernel also
    carries the 12 CPML recursive-convolution ψ arrays resident in VMEM —
    the reference's PML_8 boundary (``solver_fdtd_openems.py:188``) then
    runs on the fast path. The b/c profiles enter as broadcast lane/column
    vectors; ψ wrap-lane contamination is masked by the same zero
    coefficient invariant as the curls (c = 0 at pad/wrap positions, and
    ψ is only read by the co-located E/H update whose cb/inverse-spacing
    is zero on boundary planes).

    Returns ``(chunk_fn, to_flat, from_flat, n_sub)`` with
    ``chunk_fn(fields6, psi_e6, psi_h6, wf_chunk) ->
    (fields6', psi_e6', psi_h6', pv, pi, xf, yf, zf)``
    (ψ tuples are empty without ``pml``, ordered by :data:`PSI_KEYS`):
      pv, pi: (n_sub, 8)
      xf:     (n_sub, 2, 4, C)        rows at the two x-face planes
      yf:     (n_sub, 2, 4, R, 128)   lane tiles at the two y-face planes
      zf:     (n_sub, 2, 4, R, Py)    selected lanes at the two z-faces
    component order on axis=2: (E_u, E_v, H_u, H_v).

    **Fused lane packing** (``fused=True``, round 5): the tiled layout
    above gives every y its own 128-lane tile of which only ``Pz`` lanes
    are valid — the canonical patch pays a 2.71× padding tax, and the
    round-5 roofline (BASELINE.md) showed the kernel is bound by
    cross-lane roll traffic, every roll paid on all 128 lanes. The fused
    layout packs lanes **z-major**: lane ``ℓ = z·Py + y``, ``C =
    ceil(Py·Pz/128)·128`` (≤1 tile of pad total). Neighbor access stays
    two uniform lane rolls — y±1 = roll ∓1, z±1 = roll ∓Py — so the roll
    *count* is unchanged while the padded-element count drops ~2.5×.
    Seam reads (a roll crossing a y- or z-plane boundary into the
    adjacent plane's valid data) are killed by the same invariant that
    already kills the tiled layout's full-axis roll wrap-around: the
    inverse spacings / cb are zero on every boundary and pad plane, so a
    contaminated difference is always multiplied by zero. Two structural
    consequences: the y-face MUR update becomes a masked lane blend
    (exactly the z-face treatment — y planes are no longer tile-aligned
    slices), and the y-face probe tangentials are gathered by one-hot
    selection matmuls like the z-faces (output (n_sub, 2, 4, R, Pz)).
    z ≤ 128 is no longer required — eligibility is VMEM-budget-only
    (see fdtd._resolve_use_pallas).
    """
    Px, Py, Pz = sim.padded_shape or sim.grid.shape
    if not fused and Pz > LANE:
        raise ValueError(f"Pz ≤ {LANE} required")
    R = Px
    NV = Py * Pz  # valid lanes per row (fused layout)
    if fused:
        C = chunk_fused_cols(Py, Pz)
        RY, RZ = 1, Py  # lane-roll amounts for y+1 / z+1
    else:
        C = Py * LANE
        RY, RZ = LANE, 1
    D = int(sim.probe_decim)
    n_sub = max(1, int(sim.cfg.check_every) // D)
    dtmu = np.float32(sim.dt / MU0)
    mur = sim.cfg.boundary.upper().startswith("MUR")
    if sim.cfg.pml_cells() > 0 and pml is None:
        raise ValueError("PML boundary requires the pml profile dict")
    has_pml = pml is not None
    n_psi = 12 if has_pml else 0

    if fused:
        def to_flat(a3):
            a2 = jnp.swapaxes(a3, 1, 2).reshape(R, NV)
            return jnp.pad(a2, ((0, 0), (0, C - NV)))

        def from_flat(a2):
            return jnp.swapaxes(a2[:, :NV].reshape(R, Pz, Py), 1, 2)

        ll = np.arange(C)
        z_valid = ll < NV  # in-domain lane mask
        zz = np.where(z_valid, ll // Py, 0)
        yy = np.where(z_valid, ll % Py, 0)

        def col_of(y, z):
            return z * Py + y
    else:
        def to_flat(a3):
            return jnp.pad(
                a3, ((0, 0), (0, 0), (0, LANE - Pz))).reshape(R, C)

        def from_flat(a2):
            return a2.reshape(R, Py, LANE)[:, :, :Pz]

        yy = np.repeat(np.arange(Py), LANE)
        zz = np.tile(np.arange(LANE), Py)
        z_valid = zz < Pz

        def col_of(y, z):
            return y * LANE + z

    def lane_vec(per_y=None, per_z=None):
        v = np.ones(C, np.float32)
        if per_y is not None:
            v *= np.asarray(per_y, np.float32)[yy]
        if per_z is not None:
            vz = np.zeros(int(zz.max()) + 1, np.float32)
            vz[:Pz] = np.asarray(per_z, np.float32)
            v *= vz[zz]
        v *= z_valid
        return v.reshape(1, C)

    lane_vecs = [
        lane_vec(per_y=inv_p[1]), lane_vec(per_z=inv_p[2]),
        lane_vec(per_y=inv_d[1]), lane_vec(per_z=inv_d[2]),
    ]
    col_vecs = [
        np.asarray(inv_p[0], np.float32).reshape(R, 1),
        np.asarray(inv_d[0], np.float32).reshape(R, 1),
    ]
    Qx, Qy, Qz = sim.grid.shape
    mz0 = np.zeros(C, np.float32)
    mz1 = np.zeros(C, np.float32)
    mz0[(zz == 0) & (yy < Qy) & z_valid] = 1.0
    mz1[(zz == Qz - 1) & (yy < Qy) & z_valid] = 1.0
    z_masks = [mz0.reshape(1, C), mz1.reshape(1, C)]
    if fused:
        # y-face MUR masks: y planes are not tile-aligned in the fused
        # layout, so the y faces get the masked-blend treatment the
        # z faces always had (instead of tile slices)
        my0 = np.zeros(C, np.float32)
        my1 = np.zeros(C, np.float32)
        my0[(yy == 0) & (zz < Qz) & z_valid] = 1.0
        my1[(yy == Qy - 1) & (zz < Qz) & z_valid] = 1.0
        z_masks += [my0.reshape(1, C), my1.reshape(1, C)]

    # source-component key set (static); the matrices themselves enter
    # chunk_fn as runtime operands so re-excitation never re-traces
    src_comps = sorted(build_src_mats(sim, Px, Py, Pz))
    n_src = len(src_comps)

    if fused:
        def _to_flat_np(a3):
            a2 = np.swapaxes(np.asarray(a3), 1, 2).reshape(R, NV)
            return np.ascontiguousarray(
                np.pad(a2, ((0, 0), (0, C - NV))))
    else:
        def _to_flat_np(a3):
            a3 = np.pad(a3, ((0, 0), (0, 0), (0, LANE - Pz)))
            return np.ascontiguousarray(a3.reshape(R, C))

    # --- CPML b/c profiles as broadcast vectors ----------------------------
    # ψ_h uses half-position profiles, ψ_e node-position; y/z-graded ones
    # are lane vectors, x-graded ones column vectors. Order matches the
    # kernel's unpacking below.
    if has_pml:
        def _prof(axis, kind, which):
            arr = pml[axis][kind][which]
            if axis == 0:
                return np.asarray(arr, np.float32).reshape(R, 1)
            if axis == 1:
                return np.asarray(lane_vec(per_y=arr))
            return np.asarray(lane_vec(per_z=arr))

        pml_vecs = [
            _prof(a, kind, w)
            for kind in ("half", "node")
            for a in (0, 1, 2)
            for w in (0, 1)
        ]  # [bh_x, ch_x, bh_y, ch_y, bh_z, ch_z, be_x, ce_x, ...]
    else:
        pml_vecs = []

    # --- port probes: generic per-port source lists (lumped then MSL),
    # evaluated as unrolled scalar reads in flat (row, col) coordinates ----
    from .fdtd import port_probe_sources

    v_lists, i_lists = port_probe_sources(sim)
    ports_meta = [
        dict(
            v=[((comp, int(i), col_of(int(j), int(k))), float(w))
               for ((comp, i, j, k), w) in vl],
            i=[((comp, int(i), col_of(int(j), int(k))), float(w))
               for ((comp, i, j, k), w) in il],
        )
        for vl, il in zip(v_lists, i_lists)
    ]

    # --- z-face selection matrices ----------------------------------------
    faces = sim.faces
    kz = {f.name: f.m for f in faces}
    k_lo, k_hi = kz["z_lo"], kz["z_hi"]

    def sel_matrix(lanes):
        S = np.zeros((C, 2 * Py), np.float32)
        for which, k in enumerate(lanes):
            for y in range(Py):
                S[col_of(y, k), which * Py + y] = 1.0
        return S

    S_lo = sel_matrix([k_lo - 1, k_lo])  # [:, :Py] = lane m−1, [:, Py:] = m
    S_hi = sel_matrix([k_hi - 1, k_hi])

    cxs = {k: np.float32(v) for k, v in mur_coef.items()}
    x_rows = [f.m for f in faces if f.name.startswith("x_")]
    y_tiles = [f.m for f in faces if f.name.startswith("y_")]

    # fused layout: y planes are lane-strided, so the y-face probe
    # tangentials are gathered by one-hot selection matmuls (the z-face
    # treatment); [:, :Pz] = plane m−1, [:, Pz:] = plane m, z-ordered
    def sel_matrix_y(planes):
        S = np.zeros((C, 2 * Pz), np.float32)
        for which, m in enumerate(planes):
            for z in range(Pz):
                S[col_of(m, z), which * Pz + z] = 1.0
        return S

    if fused:
        Sy_faces = [sel_matrix_y([m - 1, m]) for m in y_tiles]
    else:
        Sy_faces = []

    def up(a, axis, n):
        return pltpu.roll(a, a.shape[axis] - n, axis)

    def dn(a, axis, n):
        return pltpu.roll(a, n, axis)

    def kernel(*refs):
        wf_ref = refs[0]
        (ca_ex, cb_ex, ca_ey, cb_ey, ca_ez, cb_ez) = refs[1:7]
        (iy_p_r, iz_p_r, iy_d_r, iz_d_r) = refs[7:11]
        (ix_p_r, ix_d_r) = refs[11:13]
        n_msk = len(z_masks)
        mask_refs = refs[13:13 + n_msk]
        mz0_r, mz1_r = mask_refs[0], mask_refs[1]
        o = 13 + n_msk
        s_lo_r, s_hi_r = refs[o], refs[o + 1]
        o += 2
        sy_refs = refs[o : o + len(Sy_faces)]
        o += len(Sy_faces)
        pml_refs = refs[o : o + len(pml_vecs)]
        o += len(pml_vecs)
        src_refs = refs[o : o + n_src]
        field_in = refs[o + n_src : o + n_src + 6]
        psi_in = refs[o + n_src + 6 : o + n_src + 6 + n_psi]
        outs = refs[o + n_src + 6 + n_psi :]
        (ex, ey, ez, hx, hy, hz) = outs[:6]
        psi_refs = outs[6 : 6 + n_psi]
        (pv_o, pi_o, xf_o, yf_o, zf_o) = outs[6 + n_psi :]

        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            for dst, src in zip((ex, ey, ez, hx, hy, hz), field_in):
                dst[:] = src[:]
            for dst, src in zip(psi_refs, psi_in):
                dst[:] = src[:]

        iyp, izp = iy_p_r[:], iz_p_r[:]
        iyd, izd = iy_d_r[:], iz_d_r[:]
        ixp, ixd = ix_p_r[:], ix_d_r[:]
        src_vals = {c: r[:] for c, r in zip(src_comps, src_refs)}
        if has_pml:
            (bh_x, ch_x, bh_y, ch_y, bh_z, ch_z,
             be_x, ce_x, be_y, ce_y, be_z, ce_z) = [r[:] for r in pml_refs]
            # ψ refs in PSI_KEYS order, ψ_e then ψ_h
            (pe_xy, pe_xz, pe_yz, pe_yx, pe_zx, pe_zy,
             ph_xy, ph_xz, ph_yz, ph_yx, ph_zx, ph_zy) = psi_refs

        def body(d, _):
            Ex, Ey, Ez = ex[:], ey[:], ez[:]
            Hx, Hy, Hz = hx[:], hy[:], hz[:]
            dEz_y = (up(Ez, 1, RY) - Ez) * iyp
            dEy_z = (up(Ey, 1, RZ) - Ey) * izp
            dEx_z = (up(Ex, 1, RZ) - Ex) * izp
            dEz_x = (up(Ez, 0, 1) - Ez) * ixp
            dEy_x = (up(Ey, 0, 1) - Ey) * ixp
            dEx_y = (up(Ex, 1, RY) - Ex) * iyp
            if has_pml:
                # recursive-convolution ψ_h update (half-position profiles)
                phxy = bh_y * ph_xy[:] + ch_y * dEz_y
                phxz = bh_z * ph_xz[:] + ch_z * dEy_z
                phyz = bh_z * ph_yz[:] + ch_z * dEx_z
                phyx = bh_x * ph_yx[:] + ch_x * dEz_x
                phzx = bh_x * ph_zx[:] + ch_x * dEy_x
                phzy = bh_y * ph_zy[:] + ch_y * dEx_y
                ph_xy[:], ph_xz[:], ph_yz[:] = phxy, phxz, phyz
                ph_yx[:], ph_zx[:], ph_zy[:] = phyx, phzx, phzy
                Hxn = Hx - dtmu * ((dEz_y + phxy) - (dEy_z + phxz))
                Hyn = Hy - dtmu * ((dEx_z + phyz) - (dEz_x + phyx))
                Hzn = Hz - dtmu * ((dEy_x + phzx) - (dEx_y + phzy))
            else:
                Hxn = Hx - dtmu * (dEz_y - dEy_z)
                Hyn = Hy - dtmu * (dEx_z - dEz_x)
                Hzn = Hz - dtmu * (dEy_x - dEx_y)
            s_val = wf_ref[0, j * D + d]
            dHz_y = (Hzn - dn(Hzn, 1, RY)) * iyd
            dHy_z = (Hyn - dn(Hyn, 1, RZ)) * izd
            dHx_z = (Hxn - dn(Hxn, 1, RZ)) * izd
            dHz_x = (Hzn - dn(Hzn, 0, 1)) * ixd
            dHy_x = (Hyn - dn(Hyn, 0, 1)) * ixd
            dHx_y = (Hxn - dn(Hxn, 1, RY)) * iyd
            if has_pml:
                pexy = be_y * pe_xy[:] + ce_y * dHz_y
                pexz = be_z * pe_xz[:] + ce_z * dHy_z
                peyz = be_z * pe_yz[:] + ce_z * dHx_z
                peyx = be_x * pe_yx[:] + ce_x * dHz_x
                pezx = be_x * pe_zx[:] + ce_x * dHy_x
                pezy = be_y * pe_zy[:] + ce_y * dHx_y
                pe_xy[:], pe_xz[:], pe_yz[:] = pexy, pexz, peyz
                pe_yx[:], pe_zx[:], pe_zy[:] = peyx, pezx, pezy
                Exn = ca_ex[:] * Ex + cb_ex[:] * (
                    (dHz_y + pexy) - (dHy_z + pexz)
                )
                Eyn = ca_ey[:] * Ey + cb_ey[:] * (
                    (dHx_z + peyz) - (dHz_x + peyx)
                )
                Ezn = ca_ez[:] * Ez + cb_ez[:] * (
                    (dHy_x + pezx) - (dHx_y + pezy)
                )
            else:
                Exn = ca_ex[:] * Ex + cb_ex[:] * (dHz_y - dHy_z)
                Eyn = ca_ey[:] * Ey + cb_ey[:] * (dHx_z - dHz_x)
                Ezn = ca_ez[:] * Ez + cb_ez[:] * (dHy_x - dHx_y)
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
                c0m, c1m = cxs[(0, 0)], cxs[(0, 1)]
                ey[0, :] = Ey[1, :] + c0m * (Eyn[1, :] - Ey[0, :])
                ez[0, :] = Ez[1, :] + c0m * (Ezn[1, :] - Ez[0, :])
                ey[Qx - 1, :] = Ey[Qx - 2, :] + c1m * (Eyn[Qx - 2, :] - Ey[Qx - 1, :])
                ez[Qx - 1, :] = Ez[Qx - 2, :] + c1m * (Ezn[Qx - 2, :] - Ez[Qx - 1, :])
                c0m, c1m = cxs[(1, 0)], cxs[(1, 1)]
                if fused:
                    # lane-strided y planes: masked blend (z treatment).
                    # Roll linearity folds each blend's two rolls into
                    # one: up(Eo) + c·up(cur) = up(Eo + c·cur) — the
                    # blend costs 1 roll per (comp, side), not 2.
                    m0, m1 = mask_refs[2][:], mask_refs[3][:]
                    keep = 1.0 - m0 - m1
                    for ref, Eo in ((ex, Ex), (ez, Ez)):
                        cur = ref[:]
                        v0 = up(Eo + c0m * cur, 1, RY) - c0m * Eo
                        v1 = dn(Eo + c1m * cur, 1, RY) - c1m * Eo
                        ref[:] = cur * keep + m0 * v0 + m1 * v1
                else:
                    y0s, y1s = slice(0, LANE), slice(LANE, 2 * LANE)
                    yls = slice((Qy - 1) * LANE, Qy * LANE)
                    yps = slice((Qy - 2) * LANE, (Qy - 1) * LANE)
                    ex[:, y0s] = Ex[:, y1s] + c0m * (ex[:, y1s] - Ex[:, y0s])
                    ez[:, y0s] = Ez[:, y1s] + c0m * (ez[:, y1s] - Ez[:, y0s])
                    ex[:, yls] = Ex[:, yps] + c1m * (ex[:, yps] - Ex[:, yls])
                    ez[:, yls] = Ez[:, yps] + c1m * (ez[:, yps] - Ez[:, yls])
                c0m, c1m = cxs[(2, 0)], cxs[(2, 1)]
                m0, m1 = mz0_r[:], mz1_r[:]
                keep = 1.0 - m0 - m1
                for ref, Eo in ((ex, Ex), (ey, Ey)):
                    cur = ref[:]
                    # single-roll blend (roll linearity, see y faces)
                    v0 = up(Eo + c0m * cur, 1, RZ) - c0m * Eo
                    v1 = dn(Eo + c1m * cur, 1, RZ) - c1m * Eo
                    ref[:] = cur * keep + m0 * v0 + m1 * v1
            return 0

        jax.lax.fori_loop(0, D, body, 0)

        # ---- probe extraction at the sample point -----------------------
        E = (ex[:], ey[:], ez[:])
        H = (hx[:], hy[:], hz[:])

        # ports: unrolled scalar reads; weights baked as python floats so
        # nothing is captured as a traced constant
        for pi_idx, pm in enumerate(ports_meta):
            v = sum(E[comp][r, c] * w for (comp, r, c), w in pm["v"])
            i_val = sum(H[comp][r, c] * w for (comp, r, c), w in pm["i"])
            pv_o[j, pi_idx] = v
            pi_o[j, pi_idx] = i_val

        # x-faces: row vectors, comps (E_u=Ey, E_v=Ez, H_u=Hy, H_v=Hz)
        for side, m in enumerate(x_rows):
            ey_r = ey[m : m + 1, :]
            ez_r = ez[m : m + 1, :]
            xf_o[0, side, 0, :] = (0.5 * (ey_r + up(ey_r, 1, RZ)))[0]
            xf_o[0, side, 1, :] = (0.5 * (ez_r + up(ez_r, 1, RY)))[0]
            hy_s = hy[m - 1 : m, :] + hy[m : m + 1, :]
            hz_s = hz[m - 1 : m, :] + hz[m : m + 1, :]
            xf_o[0, side, 2, :] = (0.25 * (hy_s + up(hy_s, 1, RY)))[0]
            xf_o[0, side, 3, :] = (0.25 * (hz_s + up(hz_s, 1, RZ)))[0]

        # y-faces, comps (E_u=Ex, E_v=Ez, H_u=Hx, H_v=Hz): lane tiles in
        # the tiled layout; one-hot selection matmuls (the z-face
        # treatment) in the fused layout, where y planes are lane-strided
        if fused:
            for side, sy_r in enumerate(sy_refs):
                Sy = sy_r[:]
                ex_sel = jnp.dot(ex[:], Sy,
                                 preferred_element_type=jnp.float32)
                ez_sel = jnp.dot(ez[:], Sy,
                                 preferred_element_type=jnp.float32)
                hx_sel = jnp.dot(hx[:], Sy,
                                 preferred_element_type=jnp.float32)
                hz_sel = jnp.dot(hz[:], Sy,
                                 preferred_element_type=jnp.float32)
                ex_t = ex_sel[:, Pz:]
                ez_t = ez_sel[:, Pz:]
                yf_o[0, side, 0, :, :] = 0.5 * (ex_t + up(ex_t, 1, 1))
                yf_o[0, side, 1, :, :] = 0.5 * (ez_t + up(ez_t, 0, 1))
                hx_s = hx_sel[:, :Pz] + hx_sel[:, Pz:]
                hz_s = hz_sel[:, :Pz] + hz_sel[:, Pz:]
                yf_o[0, side, 2, :, :] = 0.25 * (hx_s + up(hx_s, 0, 1))
                yf_o[0, side, 3, :, :] = 0.25 * (hz_s + up(hz_s, 1, 1))
        else:
            for side, m in enumerate(y_tiles):
                t = slice(m * LANE, (m + 1) * LANE)
                tm = slice((m - 1) * LANE, m * LANE)
                ex_t = ex[:, t]
                ez_t = ez[:, t]
                yf_o[0, side, 0, :, :] = 0.5 * (ex_t + up(ex_t, 1, 1))
                yf_o[0, side, 1, :, :] = 0.5 * (ez_t + up(ez_t, 0, 1))
                hx_s = hx[:, tm] + hx[:, t]
                hz_s = hz[:, tm] + hz[:, t]
                yf_o[0, side, 2, :, :] = 0.25 * (hx_s + up(hx_s, 0, 1))
                yf_o[0, side, 3, :, :] = 0.25 * (hz_s + up(hz_s, 1, 1))

        # z-faces: one-hot selection matmuls, comps (E_u=Ex, E_v=Ey,
        # H_u=Hx, H_v=Hy); S columns [:Py]=lane m−1, [Py:]=lane m
        for side, s_r in enumerate((s_lo_r, s_hi_r)):
            S = s_r[:]
            ex_sel = jnp.dot(ex[:], S, preferred_element_type=jnp.float32)
            ey_sel = jnp.dot(ey[:], S, preferred_element_type=jnp.float32)
            hx_sel = jnp.dot(hx[:], S, preferred_element_type=jnp.float32)
            hy_sel = jnp.dot(hy[:], S, preferred_element_type=jnp.float32)
            exm = ex_sel[:, Py:]
            eym = ey_sel[:, Py:]
            zf_o[0, side, 0, :, :] = 0.5 * (exm + up(exm, 1, 1))
            zf_o[0, side, 1, :, :] = 0.5 * (eym + up(eym, 0, 1))
            hx_s = hx_sel[:, :Py] + hx_sel[:, Py:]
            hy_s = hy_sel[:, :Py] + hy_sel[:, Py:]
            zf_o[0, side, 2, :, :] = 0.25 * (hx_s + up(hx_s, 0, 1))
            zf_o[0, side, 3, :, :] = 0.25 * (hy_s + up(hy_s, 1, 1))

    # NOTE: the six ca/cb coefficient arrays are NOT baked here — they
    # enter chunk_fn as runtime operands (same treatment round 4 gave the
    # port source matrices), so geometry changes reuse the compiled
    # kernel AND jax.vmap can batch them for geometry sweeps (the Mosaic
    # batching rule prepends a parallel grid dim; VERDICT r4 next #1).
    static_inputs = (
        [jnp.asarray(v) for v in lane_vecs]
        + [jnp.asarray(v) for v in col_vecs]
        + [jnp.asarray(v) for v in z_masks]
        + [jnp.asarray(S_lo), jnp.asarray(S_hi)]
        + [jnp.asarray(v) for v in Sy_faces]
        + [jnp.asarray(v) for v in pml_vecs]
    )

    const = lambda shape: pl.BlockSpec(
        shape, lambda j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    stepped = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda j: (j,) + tuple(0 for _ in shape),
        memory_space=pltpu.VMEM,
    )

    # SMEM probe buffers sized from the sim's probe-row count (≥ 8 keeps
    # the historical shape for small scenes; larger arrays — e.g. a 3×3
    # patch array's 9 ports — stay on this fast path instead of silently
    # demoting to stream/XLA, VERDICT r3 weak #5)
    n_prows = max(8, len(ports_meta))
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [const((R, C))] * 6              # ca/cb runtime operands
        + [const(a.shape) for a in static_inputs]
        + [const((R, C))] * n_src
        + [const((R, C))] * (6 + n_psi)
    )
    smem_full = pl.BlockSpec(
        (n_sub, n_prows), lambda j: (0, 0), memory_space=pltpu.SMEM
    )
    yf_lanes = Pz if fused else LANE
    out_specs = (
        tuple([const((R, C))] * (6 + n_psi))
        # pv/pi are scalar-indexed writes → SMEM (VMEM cannot store scalars)
        + (smem_full, smem_full,
           stepped((2, 4, C)), stepped((2, 4, R, yf_lanes)),
           stepped((2, 4, R, Py)))
    )
    out_shape = (
        tuple(jax.ShapeDtypeStruct((R, C), jnp.float32)
              for _ in range(6 + n_psi))
        + (
            jax.ShapeDtypeStruct((n_sub, n_prows), jnp.float32),
            jax.ShapeDtypeStruct((n_sub, n_prows), jnp.float32),
            jax.ShapeDtypeStruct((n_sub, 2, 4, C), jnp.float32),
            jax.ShapeDtypeStruct((n_sub, 2, 4, R, yf_lanes), jnp.float32),
            jax.ShapeDtypeStruct((n_sub, 2, 4, R, Py), jnp.float32),
        )
    )

    interpret = jax.default_backend() not in ("tpu", "axon")
    call = pl.pallas_call(
        kernel,
        grid=(n_sub,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(110 * 1024 * 1024),
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )

    def chunk_fn(fields_flat, psi_e, psi_h, wf_chunk, src_flat, coef_flat):
        """``src_flat``: per-component source matrices in the kernel's
        flat (R, C) layout, sorted-component order — a *runtime operand*,
        so re-exciting the ports (S-matrix one-hot runs) never re-traces
        this call (VERDICT r3 next #1). ``coef_flat``: the six ca/cb
        arrays (COEF_KEYS order) in the same flat layout — also runtime
        operands, so geometry is swappable through the jit cache and
        ``jax.vmap`` batches the kernel over design sweeps
        (VERDICT r4 next #1)."""
        wf2 = wf_chunk.reshape(1, n_sub * D)
        out = call(wf2, *coef_flat, *static_inputs, *src_flat,
                   *fields_flat, *psi_e, *psi_h)
        k = 6 + n_psi
        psi_out = out[6:k]
        return (tuple(out[:6]), tuple(psi_out[:6]), tuple(psi_out[6:]),
                out[k], out[k + 1], out[k + 2], out[k + 3], out[k + 4])

    chunk_fn.src_to_flat_np = _to_flat_np
    chunk_fn.src_comps = src_comps
    chunk_fn.coef_keys = COEF_KEYS
    chunk_fn.flat_shape = (R, C)
    chunk_fn.fused = fused
    return chunk_fn, to_flat, from_flat, n_sub


# ---------------------------------------------------------------------------
# per-shard kernel for the explicit multi-chip path
# ---------------------------------------------------------------------------

def shard_vmem_bytes(n_local: int, halo: int, py: int, n_src: int,
                     has_pml: bool) -> int:
    """Rough VMEM residency of the per-shard kernel for a
    ``(n_local + 2·halo, Py·128)`` extended block — used to pick the
    halo width (steps per call) and to decide kernel vs XLA step per
    shard. Counts coefficients + sources, input and output fields/ψ,
    plus ~12 block-sized temporaries the Mosaic stack needs for the six
    derivative arrays and the update intermediates (measured: the
    6+src+2·6 count alone under-predicted a real 112 MB allocation by
    ~40%)."""
    m = n_local + 2 * halo
    c = py * LANE
    n_psi = 12 if has_pml else 0
    n_arrays = 6 + n_src + 2 * (6 + n_psi) + 12
    return n_arrays * m * c * 4


def build_pallas_shard_stepper(sim, inv_p, inv_d, mur_coef, pml, n_dev,
                               k_steps=None, interpret=None):
    """K-step field advancer for one x-shard of the explicit shard_map path.

    Each device owns ``n = Px // n_dev`` rows plus a ``W = K`` row halo on
    each side. One invocation advances ``K ≤ min(n, decim)`` leapfrog
    steps with fields and CPML ψ resident in VMEM; FDTD dependencies
    travel one row per half-step, so after K steps the inner ``n`` rows
    are bit-exact while contamination stays inside the halos — the caller
    refreshes halos via ``ppermute`` between invocations (a trapezoidal
    halo exchange amortized over K steps). A probe-decimation interval of
    ``D`` steps is covered by ``D // K`` invocations plus one remainder
    invocation of ``D % K`` steps (a second compiled variant; halo width K
    covers it). Probes are NOT extracted in-kernel: shard_map traces one
    program for every device, so per-device probe structure must stay
    operand-driven — the explicit path's localized gather tables
    (parallel/explicit.py) sample the inner rows between invocations
    instead.

    Boundary handling matches the single-chip chunk kernel
    (:func:`build_pallas_chunk_stepper`) except MUR x-faces, which become
    masked row blends driven by per-device one-hot column operands (static
    row indices cannot vary per device under SPMD).

    Returns a dict with:
      ``W, m, n, K, rem, C``     — geometry / step split (rem = D % K)
      ``dev_statics``            — list of (n_dev, m, …) arrays, shard
                                   over axis 0 with P(axis, …)
      ``repl_statics``           — list of (1, C) arrays, replicate
      ``step_call(dev, repl, fields6, psi_e, psi_h, wf)``
                                 — advance K steps on (m, C) arrays;
                                   ``wf`` is the (1, K) waveform window
      ``step_call_rem``          — same for the remainder (None if rem=0)
      ``n_psi``                  — 12 with CPML, else 0

    Reference analog: none — the reference has no distributed execution
    (its engine is a single-process C++ DLL); this is the TPU-native
    scale-out fast path (SURVEY §2.3 "halos overlapped with compute").
    """
    Px, Py, Pz = sim.padded_shape or sim.grid.shape
    if Pz > LANE:
        raise ValueError(f"Pz ≤ {LANE} required for the shard kernel")
    if Px % n_dev:
        raise ValueError(f"Px={Px} not divisible by {n_dev} devices")
    n = Px // n_dev
    D = int(sim.probe_decim)
    Qx_g = sim.grid.shape[0]
    mur = sim.cfg.boundary.upper().startswith("MUR")
    # When the MUR top x-face sits on a shard boundary, its fix at the
    # K-th fused step reads the *innermost lower-halo row* (x = Qx−2),
    # which roll-wrap garbage reaches after exactly K steps with a
    # K-row halo — the halo must be one row wider than the step count
    # (the sharded streaming kernel's Hx = T+1 for the same reason).
    straddle = mur and (Qx_g - 1) % n == 0
    K = int(k_steps) if k_steps else min(n, D, 32)
    if straddle:
        K = min(K, n - 1)
    if not 1 <= K <= min(n, D):
        raise ValueError(f"k_steps={K} must be in [1, min(n={n}, D={D})]")
    W = K + 1 if straddle else K
    m = n + 2 * W
    C = Py * LANE
    dtmu = np.float32(sim.dt / MU0)
    if sim.cfg.pml_cells() > 0 and pml is None:
        raise ValueError("PML boundary requires the pml profile dict")
    has_pml = pml is not None
    n_psi = 12 if has_pml else 0
    Qx, Qy, Qz = sim.grid.shape

    def to_flat_np(a3):
        a3 = np.pad(np.asarray(a3, np.float32),
                    ((0, 0), (0, 0), (0, LANE - Pz)))
        return np.ascontiguousarray(a3.reshape(Px, C))

    def shard_rows(ga):
        """Global (Px, k) → per-device (n_dev, m, k) halo-extended slices;
        rows outside [0, Px) zero-filled (out-of-domain fields are zero and
        their update coefficients must be too)."""
        ga = np.asarray(ga, np.float32)
        out = np.zeros((n_dev, m) + ga.shape[1:], np.float32)
        for d in range(n_dev):
            g0 = d * n - W
            s0, s1 = max(0, g0), min(Px, g0 + m)
            out[d, s0 - g0 : s1 - g0] = ga[s0:s1]
        return out

    # ---- replicated lane-direction statics --------------------------------
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

    repl_statics = [
        lane_vec(per_y=inv_p[1]), lane_vec(per_z=inv_p[2]),
        lane_vec(per_y=inv_d[1]), lane_vec(per_z=inv_d[2]),
    ]
    mz0 = np.zeros(C, np.float32)
    mz1 = np.zeros(C, np.float32)
    mz0[(zz == 0) & (yy < Qy)] = 1.0
    mz1[(zz == Qz - 1) & (yy < Qy)] = 1.0
    repl_statics += [mz0.reshape(1, C), mz1.reshape(1, C)]
    if has_pml:
        for kind in ("half", "node"):
            for a in (1, 2):
                for w in (0, 1):
                    arr = pml[a][kind][w]
                    repl_statics.append(
                        lane_vec(per_y=arr) if a == 1 else lane_vec(per_z=arr)
                    )
    n_repl = len(repl_statics)

    # ---- per-device row-direction statics ---------------------------------
    # (from the host coefficient copies: a device readback through the
    # tunneled runtime costs ~50 s per array)
    coeff_keys = ("ca_ex", "cb_ex", "ca_ey", "cb_ey", "ca_ez", "cb_ez")
    dev_statics = [shard_rows(to_flat_np(sim._coeffs_np[k]))
                   for k in coeff_keys]
    dev_statics.append(
        shard_rows(np.asarray(inv_p[0], np.float32).reshape(Px, 1)))
    dev_statics.append(
        shard_rows(np.asarray(inv_d[0], np.float32).reshape(Px, 1)))
    m0_g = np.zeros((Px, 1), np.float32)
    m0_g[0] = 1.0
    mt_g = np.zeros((Px, 1), np.float32)
    mt_g[Qx - 1] = 1.0
    dev_statics.append(shard_rows(m0_g))
    dev_statics.append(shard_rows(mt_g))
    if has_pml:
        for kind in ("half", "node"):
            for w in (0, 1):
                dev_statics.append(shard_rows(
                    np.asarray(pml[0][kind][w], np.float32).reshape(Px, 1)))
    src_mats = build_src_mats(sim, Px, Py, Pz)
    src_comps = sorted(src_mats)
    n_src = len(src_comps)
    for c in src_comps:
        dev_statics.append(shard_rows(to_flat_np(src_mats[c])))
    n_dev_statics = len(dev_statics)

    cxs = {k: np.float32(v) for k, v in mur_coef.items()}

    def up(a, axis, k):
        return pltpu.roll(a, a.shape[axis] - k, axis)

    def dn(a, axis, k):
        return pltpu.roll(a, k, axis)

    def kernel(*refs):
        wf_ref = refs[0]
        repl = refs[1 : 1 + n_repl]
        dev = refs[1 + n_repl : 1 + n_repl + n_dev_statics]
        field_in = refs[1 + n_repl + n_dev_statics :
                        1 + n_repl + n_dev_statics + 6]
        psi_in = refs[1 + n_repl + n_dev_statics + 6 :
                      1 + n_repl + n_dev_statics + 6 + n_psi]
        outs = refs[1 + n_repl + n_dev_statics + 6 + n_psi :]
        (ex, ey, ez, hx, hy, hz) = outs[:6]
        psi_refs = outs[6 : 6 + n_psi]

        for dst, src in zip((ex, ey, ez, hx, hy, hz), field_in):
            dst[:] = src[:]
        for dst, src in zip(psi_refs, psi_in):
            dst[:] = src[:]

        iyp, izp, iyd, izd, mz0_v, mz1_v = [r[:] for r in repl[:6]]
        if has_pml:
            (bh_y, ch_y, bh_z, ch_z,
             be_y, ce_y, be_z, ce_z) = [r[:] for r in repl[6:14]]
        ri = 0
        (ca_ex, cb_ex, ca_ey, cb_ey, ca_ez, cb_ez) = [
            r[:] for r in dev[ri : ri + 6]]
        ri += 6
        ixp, ixd = dev[ri][:], dev[ri + 1][:]
        ri += 2
        m0c, mtc = dev[ri][:], dev[ri + 1][:]
        ri += 2
        if has_pml:
            bh_x, ch_x, be_x, ce_x = [dev[ri + k][:] for k in range(4)]
            ri += 4
        src_vals = {c: dev[ri + k][:] for k, c in enumerate(src_comps)}
        if has_pml:
            (pe_xy, pe_xz, pe_yz, pe_yx, pe_zx, pe_zy,
             ph_xy, ph_xz, ph_yz, ph_yx, ph_zx, ph_zy) = psi_refs

        def body(d, _):
            Ex, Ey, Ez = ex[:], ey[:], ez[:]
            Hx, Hy, Hz = hx[:], hy[:], hz[:]
            dEz_y = (up(Ez, 1, LANE) - Ez) * iyp
            dEy_z = (up(Ey, 1, 1) - Ey) * izp
            dEx_z = (up(Ex, 1, 1) - Ex) * izp
            dEz_x = (up(Ez, 0, 1) - Ez) * ixp
            dEy_x = (up(Ey, 0, 1) - Ey) * ixp
            dEx_y = (up(Ex, 1, LANE) - Ex) * iyp
            if has_pml:
                phxy = bh_y * ph_xy[:] + ch_y * dEz_y
                phxz = bh_z * ph_xz[:] + ch_z * dEy_z
                phyz = bh_z * ph_yz[:] + ch_z * dEx_z
                phyx = bh_x * ph_yx[:] + ch_x * dEz_x
                phzx = bh_x * ph_zx[:] + ch_x * dEy_x
                phzy = bh_y * ph_zy[:] + ch_y * dEx_y
                ph_xy[:], ph_xz[:], ph_yz[:] = phxy, phxz, phyz
                ph_yx[:], ph_zx[:], ph_zy[:] = phyx, phzx, phzy
                Hxn = Hx - dtmu * ((dEz_y + phxy) - (dEy_z + phxz))
                Hyn = Hy - dtmu * ((dEx_z + phyz) - (dEz_x + phyx))
                Hzn = Hz - dtmu * ((dEy_x + phzx) - (dEx_y + phzy))
            else:
                Hxn = Hx - dtmu * (dEz_y - dEy_z)
                Hyn = Hy - dtmu * (dEx_z - dEz_x)
                Hzn = Hz - dtmu * (dEy_x - dEx_y)
            s_val = wf_ref[0, d]
            dHz_y = (Hzn - dn(Hzn, 1, LANE)) * iyd
            dHy_z = (Hyn - dn(Hyn, 1, 1)) * izd
            dHx_z = (Hxn - dn(Hxn, 1, 1)) * izd
            dHz_x = (Hzn - dn(Hzn, 0, 1)) * ixd
            dHy_x = (Hyn - dn(Hyn, 0, 1)) * ixd
            dHx_y = (Hxn - dn(Hxn, 1, LANE)) * iyd
            if has_pml:
                pexy = be_y * pe_xy[:] + ce_y * dHz_y
                pexz = be_z * pe_xz[:] + ce_z * dHy_z
                peyz = be_z * pe_yz[:] + ce_z * dHx_z
                peyx = be_x * pe_yx[:] + ce_x * dHz_x
                pezx = be_x * pe_zx[:] + ce_x * dHy_x
                pezy = be_y * pe_zy[:] + ce_y * dHx_y
                pe_xy[:], pe_xz[:], pe_yz[:] = pexy, pexz, peyz
                pe_yx[:], pe_zx[:], pe_zy[:] = peyx, pezx, pezy
                Exn = ca_ex * Ex + cb_ex * ((dHz_y + pexy) - (dHy_z + pexz))
                Eyn = ca_ey * Ey + cb_ey * ((dHx_z + peyz) - (dHz_x + peyx))
                Ezn = ca_ez * Ez + cb_ez * ((dHy_x + pezx) - (dHx_y + pezy))
            else:
                Exn = ca_ex * Ex + cb_ex * (dHz_y - dHy_z)
                Eyn = ca_ey * Ey + cb_ey * (dHx_z - dHz_x)
                Ezn = ca_ez * Ez + cb_ez * (dHy_x - dHx_y)
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
                # x faces: masked row blends (per-device one-hot columns);
                # roll wrap lands on halo rows, overwritten at refresh
                c0m, c1m = cxs[(0, 0)], cxs[(0, 1)]
                keep = 1.0 - m0c - mtc
                for ref, Eo in ((ey, Ey), (ez, Ez)):
                    cur = ref[:]
                    v0 = up(Eo, 0, 1) + c0m * (up(cur, 0, 1) - Eo)
                    v1 = dn(Eo, 0, 1) + c1m * (dn(cur, 0, 1) - Eo)
                    ref[:] = cur * keep + m0c * v0 + mtc * v1
                # y faces: aligned lane-tile writes (same as chunk kernel)
                c0m, c1m = cxs[(1, 0)], cxs[(1, 1)]
                y0s, y1s = slice(0, LANE), slice(LANE, 2 * LANE)
                yls = slice((Qy - 1) * LANE, Qy * LANE)
                yps = slice((Qy - 2) * LANE, (Qy - 1) * LANE)
                ex[:, y0s] = Ex[:, y1s] + c0m * (ex[:, y1s] - Ex[:, y0s])
                ez[:, y0s] = Ez[:, y1s] + c0m * (ez[:, y1s] - Ez[:, y0s])
                ex[:, yls] = Ex[:, yps] + c1m * (ex[:, yps] - Ex[:, yls])
                ez[:, yls] = Ez[:, yps] + c1m * (ez[:, yps] - Ez[:, yls])
                # z faces: masked lane blends
                c0m, c1m = cxs[(2, 0)], cxs[(2, 1)]
                keep_z = 1.0 - mz0_v - mz1_v
                for ref, Eo in ((ex, Ex), (ey, Ey)):
                    cur = ref[:]
                    v0 = up(Eo, 1, 1) + c0m * (up(cur, 1, 1) - Eo)
                    v1 = dn(Eo, 1, 1) + c1m * (dn(cur, 1, 1) - Eo)
                    ref[:] = cur * keep_z + mz0_v * v0 + mz1_v * v1
            return 0

        # step count = waveform window length (static at trace time): the
        # same kernel body compiles to the K-step and remainder variants
        jax.lax.fori_loop(0, wf_ref.shape[1], body, 0)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [vspec] * (n_repl + n_dev_statics + 6 + n_psi)
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((m, C), jnp.float32) for _ in range(6 + n_psi)
    )
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=tuple([vspec] * (6 + n_psi)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(110 * 1024 * 1024),
        ),
        interpret=interpret,
    )

    def step_call(dev, repl, fields6, psi_e, psi_h, wf):
        # the step count is the (static) waveform-window width, so one
        # call object serves both the K-step and remainder variants
        out = call(wf, *repl, *dev, *fields6, *psi_e, *psi_h)
        return tuple(out[:6]), tuple(out[6:12]) if has_pml else (), (
            tuple(out[12:18]) if has_pml else ())

    rem = D % K
    return dict(
        W=W, m=m, n=n, K=K, rem=rem, C=C, n_src=n_src, n_psi=n_psi,
        dev_statics=dev_statics, repl_statics=repl_statics,
        step_call=step_call,
        step_call_rem=step_call if rem else None,
    )
