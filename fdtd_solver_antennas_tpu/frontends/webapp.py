"""Streamlit web UI (reference parity: ``streamlit_app.py:1-469``).

Run with:  streamlit run fdtd_solver_antennas_tpu/frontends/webapp.py

Parity flows:
- sidebar parameter inputs (frequency, εr, h, L/W overrides, metal, tanδ);
- instant analytical pattern + metric tiles (L, W, D0, G0, η — :116-123);
- prepare / run buttons with ``st.session_state`` caching of the prepared
  simulation (:25-28, 146-172) — here "prepare" builds + jit-compiles and
  "run" executes the scan, so the two-phase flow is preserved;
- pattern-analysis tiles with the dynamic-range classification (:268-290);
- E/H-cut → full-sphere interpolated 3D surface (:346-469).

Unlike the reference's abort flag (which could only prevent a run from
*starting*, :165-168), runs here are fast enough on TPU that no abort
machinery is needed.

Streamlit is an optional dependency: importing this module without it
raises a clear error, and ``main()`` is only wired when streamlit exists.
"""

from __future__ import annotations

import numpy as np


def main() -> None:  # pragma: no cover - exercised manually via streamlit
    try:
        import streamlit as st
    except ImportError as e:
        raise ImportError(
            "streamlit is not installed; `pip install streamlit` to use the "
            "web UI. All functionality is also available via the CLI "
            "(python -m fdtd_solver_antennas_tpu) and the library API."
        ) from e

    import matplotlib.pyplot as plt

    from ..models.params import PatchAntennaParams
    from ..solvers.analytical import AnalyticalPatchSolver
    from ..solvers.patch_fixed import (
        prepare_patch_fixed,
        probe_fdtd,
        run_prepared_fixed,
    )
    from ..viz.patterns import classify_pattern, interpolate_cuts_to_sphere
    from ..viz.plotting import (
        draw_patch_3d_geometry,
        plot_3d_pattern_from_grid,
        plot_cross_sections,
    )

    st.set_page_config(page_title="Patch Antenna Simulator (TPU)", layout="wide")
    st.title("Patch Antenna Simulator — TPU-native FDTD")

    if "prepared_fixed" not in st.session_state:
        st.session_state.prepared_fixed = None

    with st.sidebar:
        st.header("Antenna parameters")
        frequency_ghz = st.number_input("Frequency (GHz)", 0.1, 100.0, 2.45)
        er = st.number_input("Substrate εr", 1.01, 12.0, 4.3)
        h_mm = st.number_input("Substrate h (mm)", 0.1, 10.0, 1.6)
        loss_tangent = st.number_input("Loss tangent", 0.0, 0.2, 0.02)
        metal = st.selectbox(
            "Metal", ["copper", "aluminum", "gold", "silver", "tin"]
        )
        use_custom = st.checkbox("Custom patch dimensions")
        L_mm = st.number_input("L (mm)", 1.0, 500.0, 29.1) if use_custom else None
        W_mm = st.number_input("W (mm)", 1.0, 500.0, 37.6) if use_custom else None

    params = PatchAntennaParams.from_user_units(
        frequency_ghz=frequency_ghz, er=er, h_mm=h_mm, L_mm=L_mm, W_mm=W_mm,
        metal=metal, loss_tangent=loss_tangent,
    )
    solver = AnalyticalPatchSolver(params)
    summary = solver.summary()

    # metric tiles (reference :116-123)
    cols = st.columns(5)
    for col, (label, key, fmt) in zip(
        cols,
        [
            ("L", "L_mm", "{:.2f} mm"),
            ("W", "W_mm", "{:.2f} mm"),
            ("D0", "D0_dBi", "{:.2f} dBi"),
            ("G0", "G0_dBi", "{:.2f} dBi"),
            ("η", "efficiency", "{:.1%}"),
        ],
    ):
        col.metric(label, fmt.format(summary[key]))

    tab_analytical, tab_fdtd = st.tabs(["Analytical", "FDTD (TPU)"])

    with tab_analytical:
        c1, c2 = st.columns(2)
        with c1:
            st.pyplot(draw_patch_3d_geometry(solver.L_m, solver.W_m, params.h_m))
        with c2:
            st.pyplot(plot_cross_sections(solver))

    with tab_fdtd:
        probe = probe_fdtd()
        st.caption(probe.message)
        c1, c2 = st.columns(2)
        if c1.button("Prepare simulation"):
            with st.spinner("Building mesh + compiling…"):
                st.session_state.prepared_fixed = prepare_patch_fixed(params)
            st.success(st.session_state.prepared_fixed.message)
        if c2.button("Run prepared", disabled=st.session_state.prepared_fixed is None):
            prep = st.session_state.prepared_fixed
            with st.spinner("Time-stepping on TPU…"):
                result = run_prepared_fixed(
                    prep, frequency_hz=params.frequency_hz
                )
            if not result.ok:
                st.error(result.message)
            else:
                st.success(
                    f"{result.steps_run} steps in {result.wall_time_s:.2f} s "
                    f"({result.mcells_per_s:.0f} Mcells/s); "
                    f"f_res = {result.f_res_hz / 1e9:.3f} GHz"
                )
                # S11 sweep
                s11_db = 20 * np.log10(np.maximum(np.abs(result.s11), 1e-12))
                fig, ax = plt.subplots(figsize=(8, 3))
                ax.plot(result.freq / 1e9, s11_db)
                ax.axhline(-10, ls="--", c="gray")
                ax.set_xlabel("f (GHz)")
                ax.set_ylabel("|S11| (dB)")
                ax.grid(alpha=0.4)
                st.pyplot(fig)

                # pattern tiles (reference :268-290)
                label, dr = classify_pattern(result.intensity)
                m1, m2, m3, m4 = st.columns(4)
                m1.metric("Max gain", f"{result.intensity.max():.1f} dBi")
                m2.metric("Min gain", f"{result.intensity.min():.1f} dBi")
                m3.metric("Dynamic range", f"{dr:.1f} dB")
                m4.metric("Pattern type", label)

                # E/H cuts → interpolated full sphere (reference :346-469)
                phi_full, grid_db = interpolate_cuts_to_sphere(
                    result.intensity[:, 0], result.intensity[:, 1]
                )
                st.pyplot(
                    plot_3d_pattern_from_grid(
                        result.theta,
                        phi_full,
                        10 ** (grid_db / 10.0),
                        colors_db=grid_db,
                        L_m=solver.L_m,
                        W_m=solver.W_m,
                        h_m=params.h_m,
                    )
                )


if __name__ == "__main__":
    main()
