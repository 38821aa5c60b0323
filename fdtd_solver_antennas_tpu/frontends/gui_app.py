"""Desktop GUI (Tkinter) — compact re-scope of the reference's gui_app.py.

The reference ships a ~3100-line Windows-oriented Tk application
(``gui_app.py:2484-3149`` main class) plus a Win32-reparented PyVista view.
Per SURVEY §7 the platform-specific presentation is re-scoped: this module
provides the same *capabilities* as a portable Tk app over the headless
``MultiPatchScene``/solver APIs:

- dark-themed parameter sidebar (frequency/εr/h/tanδ/metal/solver type/
  feed direction/boundary/θφ steps — gui_app.py:113-327);
- Run button executing the solver on a background thread with all UI
  mutations marshaled through ``root.after`` (the reference's thread
  contract, gui_app.py:2678-2705) and control locking during runs;
- scrolling log with openEMS-style step-line coalescing
  (``LogFrame.append_log`` analog, gui_app.py:489-517);
- tabbed matplotlib plots: geometry, S11 sweep, polar cuts (mirrored to
  360°), 3D pattern (gui_app.py:528-961, 1113-1348);
- single-antenna and multi-patch scene modes (designer-backed).

Requires a display; ``python -m fdtd_solver_antennas_tpu.frontends.gui_app``
launches it. All compute paths are the same TPU-native solvers the CLI and
web UI use.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class ModernStyle:
    """Dark theme palette (reference: gui_app.py:32-110)."""

    BG = "#1e1e2e"
    PANEL = "#27273a"
    FG = "#cdd6f4"
    ACCENT = "#89b4fa"
    GOOD = "#a6e3a1"
    WARN = "#f9e2af"
    CONSOLE_BG = "#101018"
    CONSOLE_FG = "#a6e3a1"


class LogCoalescer:
    """Coalesce rapid progress lines like the reference's LogFrame
    (gui_app.py:493-517): consecutive 'step ...' lines replace each other
    instead of flooding the console; capped backlog."""

    def __init__(self, max_lines: int = 1000):
        self.lines: list[str] = []
        self.max_lines = max_lines

    def append(self, text: str) -> None:
        is_step = text.lstrip().lower().startswith(("step", "timestep"))
        if (
            is_step
            and self.lines
            and self.lines[-1].lstrip().lower().startswith(("step", "timestep"))
        ):
            self.lines[-1] = text
        else:
            self.lines.append(text)
        if len(self.lines) > self.max_lines:
            del self.lines[: len(self.lines) - self.max_lines]


def is_full_sphere(phi_rad: np.ndarray) -> bool:
    """True when a result covers φ beyond 180° (multi/3D solvers)."""
    return float(np.max(phi_rad)) > np.pi + 1e-6


def principal_cut_indices(phi_rad: np.ndarray) -> tuple:
    """Indices of the φ samples nearest 0° (E-plane) and 90° (H-plane).

    Single-antenna solvers return exactly [0°, 90°]; full-sphere results
    (multi-patch scenes) sample many φ, so pick the nearest cuts
    (reference renders cuts the same way: gui_app.py:1113-1149).
    """
    return (
        int(np.argmin(np.abs(phi_rad - 0.0))),
        int(np.argmin(np.abs(phi_rad - np.pi / 2))),
    )


def pattern_grid_for_plot(res):
    """(theta, phi_full, grid_db) for a 3D surface render.

    Full-sphere results plot directly; two-cut results are interpolated
    around φ the way the reference GUI does (gui_app.py:1151-1348).
    """
    from ..viz.patterns import interpolate_cuts_to_sphere

    if is_full_sphere(res.phi):
        return res.theta, res.phi, np.asarray(res.intensity)
    phi_full, grid_db = interpolate_cuts_to_sphere(
        res.intensity[:, 0], res.intensity[:, 1]
    )
    return res.theta, phi_full, grid_db


def default_horn_params_for(frequency_hz: float):
    """Reasonable pyramidal-horn defaults scaled to the design frequency
    (throat above TE10 cutoff, ~15 dBi aperture)."""
    from ..models.params import HornAntennaParams

    lam_mm = 299792458.0 / frequency_hz * 1e3
    return HornAntennaParams.from_user_units(
        frequency_ghz=frequency_hz / 1e9,
        throat_a_mm=0.7 * lam_mm,
        throat_b_mm=0.35 * lam_mm,
        aperture_A_mm=1.6 * lam_mm,
        aperture_B_mm=1.2 * lam_mm,
        length_mm=1.0 * lam_mm,
    )


def main() -> None:  # pragma: no cover — needs a display
    import tkinter as tk
    from tkinter import ttk

    import matplotlib

    matplotlib.use("TkAgg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_tkagg import FigureCanvasTkAgg

    from ..models.params import PatchAntennaParams
    from ..solvers.analytical import AnalyticalPatchSolver
    from ..solvers.microstrip import FeedDirection, prepare_microstrip_patch, run_prepared_microstrip
    from ..solvers.patch_fixed import prepare_patch_fixed, run_prepared_fixed
    from ..viz.patterns import mirror_half_cut
    from .designer import MultiPatchScene

    root = tk.Tk()
    root.title("Patch Antenna Simulator — TPU-native FDTD")
    root.configure(bg=ModernStyle.BG)
    root.geometry("1280x860")

    style = ttk.Style(root)
    try:
        style.theme_use("clam")
    except Exception:
        pass
    style.configure("TFrame", background=ModernStyle.BG)
    style.configure(
        "TLabel", background=ModernStyle.BG, foreground=ModernStyle.FG
    )
    style.configure("TButton", background=ModernStyle.PANEL)
    style.configure("TNotebook", background=ModernStyle.BG)

    # ---------------- sidebar ------------------------------------------
    side = ttk.Frame(root, padding=10)
    side.pack(side="left", fill="y")

    fields = {}

    def add_field(label, default):
        ttk.Label(side, text=label).pack(anchor="w")
        var = tk.StringVar(value=str(default))
        ttk.Entry(side, textvariable=var, width=14).pack(anchor="w", pady=2)
        fields[label] = var

    add_field("Frequency (GHz)", 2.45)
    add_field("Substrate εr", 4.3)
    add_field("Substrate h (mm)", 1.6)
    add_field("Loss tangent", 0.02)
    ttk.Label(side, text="Metal").pack(anchor="w")
    metal_var = tk.StringVar(value="copper")
    ttk.Combobox(
        side, textvariable=metal_var, width=12,
        values=["copper", "aluminum", "gold", "silver", "tin"],
    ).pack(anchor="w", pady=2)
    ttk.Label(side, text="Solver").pack(anchor="w")
    solver_var = tk.StringVar(value="fixed")
    ttk.Combobox(
        side, textvariable=solver_var, width=12,
        values=["fixed", "microstrip"],
    ).pack(anchor="w", pady=2)
    ttk.Label(side, text="Feed direction").pack(anchor="w")
    feed_var = tk.StringVar(value="-X")
    ttk.Combobox(
        side, textvariable=feed_var, width=12, values=["-X", "+X", "-Y", "+Y"]
    ).pack(anchor="w", pady=2)
    ttk.Label(side, text="Boundary").pack(anchor="w")
    bc_var = tk.StringVar(value="MUR")
    ttk.Combobox(
        side, textvariable=bc_var, width=12, values=["MUR", "PML_8"]
    ).pack(anchor="w", pady=2)

    run_btn = ttk.Button(side, text="Run FDTD")
    run_btn.pack(fill="x", pady=10)
    status_var = tk.StringVar(value="ready")
    ttk.Label(side, textvariable=status_var, wraplength=150).pack(anchor="w")

    # ---------------- log console --------------------------------------
    log = LogCoalescer()
    log_text = tk.Text(
        root, height=8, bg=ModernStyle.CONSOLE_BG,
        fg=ModernStyle.CONSOLE_FG, font=("monospace", 9),
    )
    log_text.pack(side="bottom", fill="x")

    def refresh_log():
        log_text.delete("1.0", "end")
        log_text.insert("1.0", "\n".join(log.lines[-200:]))
        log_text.see("end")

    # ---------------- plot tabs ----------------------------------------
    tabs = ttk.Notebook(root)
    tabs.pack(side="right", fill="both", expand=True)
    canvases = {}
    for name in ("Geometry", "S11", "Cuts", "3D Pattern"):
        frame = ttk.Frame(tabs)
        tabs.add(frame, text=name)
        fig = plt.Figure(figsize=(7, 6))
        canvas = FigureCanvasTkAgg(fig, master=frame)
        canvas.get_tk_widget().pack(fill="both", expand=True)
        canvases[name] = (fig, canvas)

    def show_fig(name, builder):
        fig, canvas = canvases[name]
        fig.clf()
        builder(fig)
        canvas.draw_idle()

    # ---------------- scene (multi-antenna) tab --------------------------
    # Designer-backed parity with the reference's multi mode
    # (gui_app.py:2752-2848 runs the multi_3d solver; the scene model is
    # our MultiPatchScene instead of a 1600-line Tk widget).
    scene = MultiPatchScene()
    scene_frame = ttk.Frame(tabs, padding=6)
    tabs.add(scene_frame, text="Scene")
    scene_left = ttk.Frame(scene_frame)
    scene_left.pack(side="left", fill="y", padx=(0, 8))

    inst_list = tk.Listbox(
        scene_left, height=8, width=24, bg=ModernStyle.PANEL,
        fg=ModernStyle.FG,
    )
    inst_list.pack(anchor="w", pady=2)

    def scene_instances():
        return scene.patches + scene.horns

    def refresh_instances():
        inst_list.delete(0, "end")
        for inst in scene_instances():
            inst_list.insert("end", inst.name)

    scene_fig = plt.Figure(figsize=(6, 6))
    scene_canvas = FigureCanvasTkAgg(scene_fig, master=scene_frame)
    scene_canvas.get_tk_widget().pack(side="right", fill="both", expand=True)

    def refresh_preview():
        scene_fig.clf()
        if scene_instances():
            scene.render_preview(fig=scene_fig)
        scene_canvas.draw_idle()

    scene.set_change_callback(
        lambda: (refresh_instances(), refresh_preview())
    )

    def selected_instance():
        sel = inst_list.curselection()
        if not sel:
            return None
        return scene_instances()[sel[0]]

    def on_add_patch():
        try:
            scene.add_patch(params_from_ui())
        except ValueError as e:
            status_var.set(f"bad input: {e}")

    def on_add_horn():
        try:
            f_ghz = float(fields["Frequency (GHz)"].get())
            scene.add_horn(default_horn_params_for(f_ghz * 1e9))
        except ValueError as e:
            status_var.set(f"bad input: {e}")

    def on_remove():
        inst = selected_instance()
        if inst is not None:
            scene.remove(inst)

    btn_row = ttk.Frame(scene_left)
    btn_row.pack(anchor="w", pady=4)
    ttk.Button(btn_row, text="+ Patch", command=on_add_patch, width=8).pack(
        side="left", padx=2
    )
    ttk.Button(btn_row, text="+ Horn", command=on_add_horn, width=8).pack(
        side="left", padx=2
    )
    ttk.Button(btn_row, text="Remove", command=on_remove, width=8).pack(
        side="left", padx=2
    )

    place_fields = {}
    for lbl, default in (
        ("x (mm)", 0.0), ("y (mm)", 0.0), ("z (mm)", 0.0), ("rot z (°)", 0.0)
    ):
        ttk.Label(scene_left, text=lbl).pack(anchor="w")
        var = tk.StringVar(value=str(default))
        ttk.Entry(scene_left, textvariable=var, width=10).pack(
            anchor="w", pady=1
        )
        place_fields[lbl] = var

    def on_apply_placement():
        inst = selected_instance()
        if inst is None:
            status_var.set("select an instance first")
            return
        try:
            scene.update_field(
                inst, "center_x_m", float(place_fields["x (mm)"].get()) * 1e-3
            )
            scene.update_field(
                inst, "center_y_m", float(place_fields["y (mm)"].get()) * 1e-3
            )
            scene.update_field(
                inst, "center_z_m", float(place_fields["z (mm)"].get()) * 1e-3
            )
            scene.update_field(
                inst, "rot_z_deg", float(place_fields["rot z (°)"].get())
            )
        except ValueError as e:
            status_var.set(f"bad placement: {e}")

    ttk.Button(
        scene_left, text="Apply placement", command=on_apply_placement
    ).pack(anchor="w", pady=4)

    ttk.Label(scene_left, text="Mesh quality (1–10)").pack(anchor="w")
    meshq_var = tk.StringVar(value="3")
    ttk.Entry(scene_left, textvariable=meshq_var, width=10).pack(anchor="w")

    scene_run_btn = ttk.Button(scene_left, text="Run Scene FDTD")
    scene_run_btn.pack(fill="x", pady=8)

    def params_from_ui():
        return PatchAntennaParams.from_user_units(
            frequency_ghz=float(fields["Frequency (GHz)"].get()),
            er=float(fields["Substrate εr"].get()),
            h_mm=float(fields["Substrate h (mm)"].get()),
            loss_tangent=float(fields["Loss tangent"].get()),
            metal=metal_var.get(),
        )

    def update_geometry():
        params = params_from_ui()
        solver = AnalyticalPatchSolver(params)

        def build(fig):
            ax = fig.add_subplot(111, projection="3d")
            from ..viz.plotting import _add_box

            mm = 1e3
            L, W, h = solver.L_m * mm, solver.W_m * mm, params.h_m * mm
            margin = max(5.0, 0.2 * max(L, W))
            _add_box(ax, (-W / 2 - margin, -L / 2 - margin, -h / 5),
                     (W / 2 + margin, L / 2 + margin, 0), "#c9a227", 0.8)
            _add_box(ax, (-W / 2 - margin, -L / 2 - margin, 0),
                     (W / 2 + margin, L / 2 + margin, h), "#2d6a4f", 0.5)
            _add_box(ax, (-W / 2, -L / 2, h), (W / 2, L / 2, h * 1.2),
                     "#e07a1f", 0.95)
            lim = max(L, W)
            ax.set_xlim(-lim, lim)
            ax.set_ylim(-lim, lim)
            ax.set_zlim(-lim / 4, lim / 2)
            ax.set_title(f"Patch {W:.1f} × {L:.1f} mm on h={h:.2f} mm")

        show_fig("Geometry", build)

    result_q: "queue.Queue" = queue.Queue()

    def worker(params, solver_kind, feed, boundary):
        try:
            log.append("prepare: building mesh + compiling…")
            if solver_kind == "microstrip":
                prep = prepare_microstrip_patch(
                    params, feed_direction=FeedDirection(feed),
                    boundary=boundary,
                )
                runner = run_prepared_microstrip
            else:
                prep = prepare_patch_fixed(params, boundary=boundary)
                runner = run_prepared_fixed
            if not prep.ok:
                result_q.put(("error", prep.message))
                return
            log.append("run: time-stepping…")
            res = runner(prep, frequency_hz=params.frequency_hz, verbose=0)
            result_q.put(("done", res))
        except Exception as e:  # defensive: never kill the UI thread
            result_q.put(("error", str(e)))

    def poll_results():
        try:
            kind, payload = result_q.get_nowait()
        except queue.Empty:
            root.after(200, poll_results)
            return
        run_btn.state(["!disabled"])
        scene_run_btn.state(["!disabled"])
        if kind == "error":
            status_var.set(f"failed: {payload}")
            log.append(f"ERROR: {payload}")
            refresh_log()
            return
        res = payload
        status_var.set(
            f"done: {res.steps_run} steps, {res.mcells_per_s:.0f} Mcells/s, "
            f"f_res {res.f_res_hz / 1e9:.3f} GHz"
        )
        log.append(
            f"step {res.steps_run}: finished in {res.wall_time_s:.2f}s"
        )
        refresh_log()

        def build_s11(fig):
            ax = fig.add_subplot(111)
            db = 20 * np.log10(np.maximum(np.abs(res.s11), 1e-12))
            ax.plot(res.freq / 1e9, db)
            ax.axhline(-10, ls="--", c="gray")
            ax.set_xlabel("f (GHz)")
            ax.set_ylabel("|S11| (dB)")
            ax.grid(alpha=0.4)

        show_fig("S11", build_s11)

        def build_cuts(fig):
            cut_idx = principal_cut_indices(res.phi)
            for i, (col, title) in enumerate(
                (("#0b7285", "E-plane φ=0°"), ("#c2255c", "H-plane φ=90°"))
            ):
                ax = fig.add_subplot(1, 2, i + 1, projection="polar")
                th, v = mirror_half_cut(res.theta, res.intensity[:, cut_idx[i]])
                ax.plot(th, v, color=col, lw=2)
                ax.set_title(title)
                ax.set_theta_zero_location("N")

        show_fig("Cuts", build_cuts)

        def build_3d(fig):
            theta, phi_full, grid_db = pattern_grid_for_plot(res)
            ax = fig.add_subplot(111, projection="3d")
            thg, phg = np.meshgrid(theta, phi_full, indexing="ij")
            lin = 10 ** ((grid_db - grid_db.max()) / 20.0)
            x = lin * np.sin(thg) * np.cos(phg)
            y = lin * np.sin(thg) * np.sin(phg)
            z = lin * np.cos(thg)
            norm = (grid_db - grid_db.min()) / max(
                1e-9, grid_db.max() - grid_db.min()
            )
            ax.plot_surface(
                x, y, z, facecolors=plt.cm.turbo(norm), rstride=1,
                cstride=1, linewidth=0, shade=False,
            )
            ax.set_box_aspect([1, 1, 1])
            ax.set_title(f"3D pattern (Dmax {10 * np.log10(res.Dmax):.1f} dBi)")

        show_fig("3D Pattern", build_3d)

    def on_run():
        try:
            params = params_from_ui()
        except ValueError as e:
            status_var.set(f"bad input: {e}")
            return
        run_btn.state(["disabled"])
        status_var.set("running…")
        threading.Thread(
            target=worker,
            args=(params, solver_var.get(), feed_var.get(), bc_var.get()),
            daemon=True,
        ).start()
        root.after(200, poll_results)

    def scene_worker(mesh_quality):
        try:
            scene.controls.mesh_quality = mesh_quality
            log.append("scene prepare: voxelizing + compiling…")
            res = scene.simulate(log_cb=log.append)
            if not res.ok:  # failed prepare or failed run
                result_q.put(("error", res.message))
            else:
                result_q.put(("done", res))
        except Exception as e:  # defensive: never kill the UI thread
            result_q.put(("error", str(e)))

    def on_run_scene():
        if not scene_instances():
            status_var.set("scene is empty — add instances first")
            return
        try:
            mesh_quality = max(1, min(10, int(meshq_var.get())))
        except ValueError as e:
            status_var.set(f"bad mesh quality: {e}")
            return
        run_btn.state(["disabled"])
        scene_run_btn.state(["disabled"])
        status_var.set("running scene…")
        threading.Thread(
            target=scene_worker, args=(mesh_quality,), daemon=True
        ).start()
        root.after(200, poll_results)

    run_btn.configure(command=on_run)
    scene_run_btn.configure(command=on_run_scene)
    update_geometry()
    root.mainloop()


if __name__ == "__main__":
    main()
