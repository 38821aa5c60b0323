"""Independent NumPy Yee-grid reference stepper for golden-value tests.

Written directly from the staggered-grid update equations (not from the
JAX engine's helper functions) so it cross-checks the engine's shifted-
difference plumbing, coefficient layout, MUR boundary and port source.
"""

from __future__ import annotations

import numpy as np

C0 = 299_792_458.0
MU0 = 4.0 * np.pi * 1e-7


def run_reference(sim, n_steps: int):
    """Run ``n_steps`` leapfrog iterations with plain NumPy slicing.

    ``sim`` is an ``ops.fdtd.PreparedSimulation``; we reuse its coefficient
    arrays (they encode geometry) but re-derive all spacings, curls, MUR
    updates and the port source independently.
    """
    grid = sim.grid
    Px, Py, Pz = sim.padded_shape or grid.shape
    dt = sim.dt
    dtmu = dt / MU0

    ca = {c: np.asarray(sim.coeffs["ca_" + c]) for c in ("ex", "ey", "ez")}
    cb = {c: np.asarray(sim.coeffs["cb_" + c]) for c in ("ex", "ey", "ez")}

    # independent spacing derivation (meters)
    d = {a: np.diff(grid.lines[a]) * grid.unit for a in "xyz"}
    dd = {}
    for a in "xyz":
        arr = np.empty(len(d[a]) + 1)
        arr[0] = d[a][0] / 2
        arr[-1] = d[a][-1] / 2
        arr[1:-1] = 0.5 * (d[a][:-1] + d[a][1:])
        dd[a] = arr

    E = {c: np.zeros((Px, Py, Pz), np.float32) for c in ("x", "y", "z")}
    H = {c: np.zeros((Px, Py, Pz), np.float32) for c in ("x", "y", "z")}

    nx, ny, nz = len(d["x"]), len(d["y"]), len(d["z"])
    Qx, Qy, Qz = len(grid.x), len(grid.y), len(grid.z)  # true line counts

    mur = sim.cfg.boundary.upper().startswith("MUR")
    mur_c = {}
    for a, name in enumerate("xyz"):
        mur_c[(a, 0)] = (C0 * dt - d[name][0]) / (C0 * dt + d[name][0])
        mur_c[(a, 1)] = (C0 * dt - d[name][-1]) / (C0 * dt + d[name][-1])

    ports = sim.ports
    wf = sim.waveform

    for n in range(n_steps):
        # --- H update (explicit index ranges) ---
        # Hx[i, j, k] -= dtmu * ((Ez[i,j+1,k]-Ez[i,j,k])/dy_j
        #                        - (Ey[i,j,k+1]-Ey[i,j,k])/dz_k)
        H["x"][:, :ny, :nz] -= dtmu * (
            (E["z"][:, 1 : ny + 1, :nz] - E["z"][:, :ny, :nz])
            / d["y"][None, :, None]
            - (E["y"][:, :ny, 1 : nz + 1] - E["y"][:, :ny, :nz])
            / d["z"][None, None, :]
        )
        H["y"][:nx, :, :nz] -= dtmu * (
            (E["x"][:nx, :, 1 : nz + 1] - E["x"][:nx, :, :nz])
            / d["z"][None, None, :]
            - (E["z"][1 : nx + 1, :, :nz] - E["z"][:nx, :, :nz])
            / d["x"][:, None, None]
        )
        H["z"][:nx, :ny, :] -= dtmu * (
            (E["y"][1 : nx + 1, :ny, :] - E["y"][:nx, :ny, :])
            / d["x"][:, None, None]
            - (E["x"][:nx, 1 : ny + 1, :] - E["x"][:nx, :ny, :])
            / d["y"][None, :, None]
        )

        # --- E update ---
        Eo = {c: E[c].copy() for c in E}
        curl = np.zeros_like(E["x"])
        curl[:, 1:Qy, 1:Qz] = (
            (H["z"][:, 1:Qy, 1:Qz] - H["z"][:, 0 : Qy - 1, 1:Qz])
            / dd["y"][None, 1:Qy, None]
            - (H["y"][:, 1:Qy, 1:Qz] - H["y"][:, 1:Qy, 0 : Qz - 1])
            / dd["z"][None, None, 1:Qz]
        )
        E["x"] = ca["ex"] * E["x"] + cb["ex"] * curl

        curl = np.zeros_like(E["y"])
        curl[1:Qx, :, 1:Qz] = (
            (H["x"][1:Qx, :, 1:Qz] - H["x"][1:Qx, :, 0 : Qz - 1])
            / dd["z"][None, None, 1:Qz]
            - (H["z"][1:Qx, :, 1:Qz] - H["z"][0 : Qx - 1, :, 1:Qz])
            / dd["x"][1:Qx, None, None]
        )
        E["y"] = ca["ey"] * E["y"] + cb["ey"] * curl

        curl = np.zeros_like(E["z"])
        curl[1:Qx, 1:Qy, :] = (
            (H["y"][1:Qx, 1:Qy, :] - H["y"][0 : Qx - 1, 1:Qy, :])
            / dd["x"][1:Qx, None, None]
            - (H["x"][1:Qx, 1:Qy, :] - H["x"][1:Qx, 0 : Qy - 1, :])
            / dd["y"][None, 1:Qy, None]
        )
        E["z"] = ca["ez"] * E["z"] + cb["ez"] * curl

        # --- port soft source ---
        s = wf[n]
        for p in ports:
            comp = "xyz"[p.axis]
            E[comp][p.sl] += p.src_col * s

        # --- MUR boundary (independent implementation) ---
        if mur:
            shp = (Qx, Qy, Qz)
            for a in range(3):
                for side, (idx, nb) in enumerate(((0, 1), (shp[a] - 1, shp[a] - 2))):
                    c = mur_c[(a, side)]
                    for comp_axis, comp in enumerate("xyz"):
                        if comp_axis == a:
                            continue
                        sl_b = [slice(None)] * 3
                        sl_b[a] = idx
                        sl_n = [slice(None)] * 3
                        sl_n[a] = nb
                        E[comp][tuple(sl_b)] = Eo[comp][tuple(sl_n)] + c * (
                            E[comp][tuple(sl_n)] - Eo[comp][tuple(sl_b)]
                        )

    return E, H
