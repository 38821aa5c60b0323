"""HBM-streaming x-blocked Pallas kernel (large grids / z > 128).

Runs in interpreter mode on CPU (no TPU needed) and requires the streamed
path to reproduce the XLA path: fields, port spectra and NF2FF surface
DFTs. Covers MUR and PEC boundaries and a grid whose z extent spans two
lane tiles (Pz > 128), which the VMEM-resident chunk kernel cannot handle.
"""

import numpy as np
import pytest

from fdtd_solver_antennas_tpu.models.scene import Scene
from fdtd_solver_antennas_tpu.ops.fdtd import FDTDConfig, build_simulation
from fdtd_solver_antennas_tpu.ops.mesh import MeshBuilder


def _build(pallas_mode, boundary="MUR", n_steps=120, tall=False,
           patch=(15.0, 12.0)):
    mb = MeshBuilder()
    # PML eats pml_cells + NF2FF margin from each wall: give it a wider
    # footprint so the nf box keeps positive extents
    res = 4.0 if boundary.upper().startswith("PML") else 5.0
    span = 52 if boundary.upper().startswith("PML") else 40
    mb.add_line("x", [-span, span, 0.0, -6.0])
    mb.add_line("y", [-span * 0.75, span * 0.75, 0.0])
    if tall:
        # force > 128 z nodes: beyond the chunk kernel's single lane tile
        mb.add_line("z", np.linspace(-20, 30, 131))
    else:
        mb.add_line("z", [-20, 30])
        mb.add_line("z", np.linspace(0, 1.6, 3))
    grid = mb.build(res)
    scene = Scene()
    scene.add_material_box("sub", 4.3, 0.005, [-20, -20, 0], [20, 20, 1.6], 0)
    pw, pl_ = patch
    scene.add_metal_box(
        "patch", [-pw, -pl_, 1.6], [pw, pl_, 1.6], priority=10)
    scene.add_metal_box("gnd", [-20, -20, 0], [20, 20, 0], priority=10)
    scene.add_lumped_port(1, 50.0, [-6, 0, 0], [-6, 0, 1.6], direction="z")
    cfg = FDTDConfig(
        n_steps_max=n_steps, check_every=40, end_criteria=1e-30,
        boundary=boundary, probe_decimation=4,
        use_pallas=pallas_mode is not None,
        pallas_mode=pallas_mode,
    )
    return build_simulation(
        scene, grid, f0=2.45e9, fc=1.225e9, cfg=cfg,
        port_freqs_hz=np.linspace(2e9, 3e9, 7),
        nf_freqs_hz=np.array([2.45e9]),
        nf_margin_cells=2,
    )


@pytest.mark.slow
@pytest.mark.parametrize("boundary", ["MUR", "PEC", "PML_4"])
@pytest.mark.parametrize("tall", [False, True])
def test_stream_matches_xla(boundary, tall):
    """Streamed trapezoid vs the XLA path. PML_4 exercises the CPML ψ
    state streamed through the same windows as the fields (ψ_e with E,
    ψ_h with H; recursion profiles as lane rows / per-tile rows /
    windowed columns)."""
    sim_ref = _build(None, boundary=boundary, tall=tall)
    sim_st = _build("stream", boundary=boundary, tall=tall)
    assert sim_st.pallas_mode == "stream", (
        sim_st.pallas_mode, sim_st.stream_block
    )
    out_ref = sim_ref.run()
    out_st = sim_st.run()
    assert int(out_ref["steps"]) == int(out_st["steps"])

    # fields may live on different padded x extents — compare true grid
    Qx, Qy, Qz = sim_ref.grid.shape
    for name, fr, fs in zip(
        ("Ex", "Ey", "Ez", "Hx", "Hy", "Hz"),
        out_ref["fields"], out_st["fields"],
    ):
        a = np.asarray(fr)[:Qx, :Qy, :Qz]
        b = np.asarray(fs)[:Qx, :Qy, :Qz]
        scale = max(np.abs(a).max(), 1e-20)
        np.testing.assert_allclose(
            b, a, atol=5e-5 * scale, rtol=5e-4,
            err_msg=f"{name} stream vs XLA mismatch ({boundary}, tall={tall})",
        )
    np.testing.assert_allclose(
        np.asarray(out_st["uf"]), np.asarray(out_ref["uf"]),
        rtol=5e-4, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(out_st["if_"]), np.asarray(out_ref["if_"]),
        rtol=5e-4, atol=1e-12,
    )
    for a, b in zip(out_st["nf_e"], out_ref["nf_e"]):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=5e-5 * max(np.abs(b).max(), 1e-30)
        )


@pytest.mark.slow
def test_mur_face_long_equality():
    """Regression: the MUR x-face fix must be applied in every window that
    computes a face row, not only the block that owns it. With the top
    face on a block boundary (r1 = 0) the neighboring block computes the
    face as upper halo at intermediate trapezoid steps; leaving those
    values un-fixed seeded a slow (~0.25%/step) instability that 120-step
    tolerance tests missed. 240 steps with reflections off the face bound
    the stream/XLA drift tightly (PEC and T=1 were always exact)."""
    n = 240

    def build(pallas_mode):
        # Qx = 33 so the top face row (Qx−1)·ZT = 64 lands on a block
        # boundary for the B = 32 the resolver picks at this size
        mb = MeshBuilder()
        mb.add_line("x", np.linspace(0, 32, 33))
        mb.add_line("y", np.linspace(0, 19, 20))
        mb.add_line("z", np.linspace(0, 130, 131))
        grid = mb.build(1.0)
        assert grid.shape == (33, 20, 131), grid.shape
        scene = Scene()
        scene.add_material_box(
            "sub", 4.3, 0.005, [10, 6, 60], [22, 13, 64], 0
        )
        scene.add_metal_box("patch", [12, 8, 64], [20, 12, 64], priority=10)
        scene.add_metal_box("gnd", [10, 6, 60], [22, 13, 60], priority=10)
        scene.add_lumped_port(
            1, 50.0, [16, 10, 60], [16, 10, 64], direction="z"
        )
        cfg = FDTDConfig(
            n_steps_max=n, check_every=40, end_criteria=1e-30,
            probe_decimation=4, use_pallas=pallas_mode is not None,
            pallas_mode=pallas_mode,
        )
        return build_simulation(
            scene, grid, f0=2.45e9, fc=1.225e9, cfg=cfg,
            port_freqs_hz=np.linspace(2e9, 3e9, 7),
            nf_freqs_hz=np.array([2.45e9]),
            nf_margin_cells=2,
        )

    sim_ref = build(None)
    sim_st = build("stream")
    assert sim_st.pallas_mode == "stream"
    # the bug only manifests when the trapezoid is deeper than one step
    # and the face row lands on a block boundary — assert the config
    # actually exercises that regime
    zt = -(-sim_st.padded_shape[2] // 128)
    B = sim_st.stream_block * zt
    assert sim_st.stream_T > 1
    assert ((sim_st.grid.shape[0] - 1) * zt) % B == 0, "face not on seam"
    out_ref = sim_ref.run()
    out_st = sim_st.run()
    assert int(out_ref["steps"]) == int(out_st["steps"])
    Qx, Qy, Qz = sim_ref.grid.shape
    for name, fr, fs in zip(
        ("Ex", "Ey", "Ez", "Hx", "Hy", "Hz"),
        out_ref["fields"], out_st["fields"],
    ):
        a = np.asarray(fr)[:Qx, :Qy, :Qz]
        b = np.asarray(fs)[:Qx, :Qy, :Qz]
        scale = max(np.abs(a).max(), 1e-20)
        np.testing.assert_allclose(
            b, a, atol=2e-5 * scale, rtol=2e-4,
            err_msg=f"{name} stream vs XLA drift after {n} steps",
        )


def test_tall_grid_auto_resolves_stream():
    """With Pallas wanted and z spanning two lane tiles, the chunk kernel
    is ineligible and the mode must auto-resolve to the streaming kernel."""
    sim = _build(None, tall=True)
    assert sim.pallas_mode is None  # CPU default: Pallas off

    cfg_forced = FDTDConfig(use_pallas=True)
    assert cfg_forced.pallas_mode is None
    mb = MeshBuilder()
    mb.add_line("x", [-40, 40, 0.0])
    mb.add_line("y", [-30, 30, 0.0])
    mb.add_line("z", np.linspace(-20, 30, 131))
    grid = mb.build(5.0)
    scene = Scene()
    scene.add_lumped_port(1, 50.0, [0, 0, 0], [0, 0, 5.0], direction="z")
    sim2 = build_simulation(
        scene, grid, f0=2.45e9, fc=1.225e9, cfg=cfg_forced,
        port_freqs_hz=np.array([2.45e9]), nf_freqs_hz=np.array([2.45e9]),
        nf_margin_cells=2,
    )
    assert sim2.pallas_mode == "stream"
    assert sim2.stream_block > 0
    assert sim2.padded_shape[0] % sim2.stream_block == 0


def test_stream_layout_pick():
    """pick_stream_layout puts whichever transverse axis pads LESS onto
    the 128-lane tiles. The flagship 4.2M-cell scene (Py=201, Pz=152)
    paid 256/152 = 1.68× HBM inflation with z on lanes; y on lanes pays
    only 256/201 = 1.27× (measured on chip: 4.01 → 6.21 Gcell/s, and
    3.90 → 5.51 on the z=160/y=121 tall patch where the swap also drops
    to ZT=1 and unlocks deeper trapezoids)."""
    from fdtd_solver_antennas_tpu.ops.fdtd_pallas import pick_stream_layout

    # flagship shape: y=201 wastes less on lanes than z=152 → swap
    swap, bx, t = pick_stream_layout(201, 152, 1, 141, True)
    assert swap and bx > 0 and t >= 1

    # tall-patch shape: y=121 → ZT=1 on lanes (6% pad) beats z=160 (60%)
    swap, bx, t = pick_stream_layout(121, 160, 1, 161, True)
    assert swap and bx > 0

    # small-y scene: y=20 on lanes would waste 128/20 = 6.4× — keep z
    swap, bx, t = pick_stream_layout(20, 131, 1, 33, True)
    assert not swap and bx > 0

    # force overrides the auto pick in both directions
    swap, _, _ = pick_stream_layout(201, 152, 1, 141, True, force=False)
    assert not swap
    swap, bx, _ = pick_stream_layout(20, 131, 1, 33, True, force=True)
    assert swap and bx > 0


@pytest.mark.slow
@pytest.mark.parametrize("boundary", ["MUR", "PML_4"])
def test_stream_swap_matches_xla(boundary):
    """The y↔z-swapped stream layout must reproduce the XLA path exactly:
    the swap is a reflection (E'=(Ex,Ez,Ey), H'=(−Hx,−Hz,−Hy)) handled at
    the flat-layout boundary, so fields, port spectra, and NF2FF face
    DFTs — fetched through the swapped gather indices with sign-folded
    H weights — must match. PML_4 additionally pins the ψ permutation
    (ψ'_e = −permuted ψ_e, ψ'_h = +permuted) through a checkpoint-resume
    crossing from an XLA checkpoint into the swapped kernel."""
    def build(mode, swap=None, n=80):
        mb = MeshBuilder()
        span = 52 if boundary.startswith("PML") else 40
        mb.add_line("x", [-span, span, 0.0, -6.0])
        mb.add_line("y", [-span * 0.75, span * 0.75, 0.0])
        mb.add_line("z", np.linspace(-20, 30, 131))
        grid = mb.build(4.0 if boundary.startswith("PML") else 5.0)
        scene = Scene()
        scene.add_material_box(
            "sub", 4.3, 0.005, [-20, -20, 0], [20, 20, 1.6], 0)
        scene.add_metal_box(
            "patch", [-15, -12, 1.6], [15, 12, 1.6], priority=10)
        scene.add_metal_box("gnd", [-20, -20, 0], [20, 20, 0], priority=10)
        scene.add_lumped_port(
            1, 50.0, [-6, 0, 0], [-6, 0, 1.6], direction="z")
        cfg = FDTDConfig(
            n_steps_max=n, check_every=40, end_criteria=1e-30,
            boundary=boundary, probe_decimation=4,
            use_pallas=mode is not None, pallas_mode=mode,
            stream_swap=swap,
        )
        return build_simulation(
            scene, grid, f0=2.45e9, fc=1.225e9, cfg=cfg,
            port_freqs_hz=np.linspace(2e9, 3e9, 7),
            nf_freqs_hz=np.array([2.45e9]), nf_margin_cells=2,
        )

    ref = build(None).run()
    st = build("stream", swap=True)
    assert st.pallas_mode == "stream" and st.stream_swap
    assert "y↔z swapped" in st.pallas_mode_reason
    out = st.run()
    assert int(out["steps"]) == int(ref["steps"])
    Qx, Qy, Qz = st.grid.shape
    for name, fr, fs in zip(
        ("Ex", "Ey", "Ez", "Hx", "Hy", "Hz"),
        ref["fields"], out["fields"],
    ):
        a = np.asarray(fr)[:Qx, :Qy, :Qz]
        b = np.asarray(fs)[:Qx, :Qy, :Qz]
        scale = max(np.abs(a).max(), 1e-20)
        np.testing.assert_allclose(
            b, a, atol=5e-5 * scale, rtol=5e-4,
            err_msg=f"{name} swapped-stream vs XLA ({boundary})",
        )
    np.testing.assert_allclose(
        np.asarray(out["uf"]), np.asarray(ref["uf"]), rtol=5e-4, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(out["if_"]), np.asarray(ref["if_"]), rtol=5e-4,
        atol=1e-12)
    for grp in ("nf_e", "nf_h"):
        for a, b in zip(out[grp], ref[grp]):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_allclose(
                a, b, rtol=5e-4, atol=5e-5 * max(np.abs(b).max(), 1e-30))

    # checkpoint written by the XLA path, resumed on the swapped kernel
    part = build(None, n=40).run()
    out2 = build("stream", swap=True, n=80).run(resume_state=part["state"])
    assert int(out2["steps"]) == 80
    for fr, fs in zip(out["fields"], out2["fields"]):
        a = np.asarray(fr)[:Qx, :Qy, :Qz]
        b = np.asarray(fs)[:Qx, :Qy, :Qz]
        scale = max(np.abs(a).max(), 1e-20)
        np.testing.assert_allclose(b, a, atol=5e-5 * scale, rtol=5e-4)
    np.testing.assert_allclose(
        np.asarray(out2["uf"]), np.asarray(out["uf"]), rtol=5e-4,
        atol=1e-10)


@pytest.mark.slow
def test_stream_vmap_batches_geometry():
    """jax.vmap of the stream-kernel traced run (round 5: coefficient
    windows are runtime operands rebuilt from the coeffs argument inside
    the trace) must reproduce per-variant single runs — the sweep fast
    path for union grids beyond the chunk kernel's VMEM budget
    (VERDICT r4 next #1). Two patch sizes share this grid (no
    metal-edge refinement here), so geometry differs only in ca/cb."""
    import jax
    import jax.numpy as jnp

    from fdtd_solver_antennas_tpu.ops.fdtd import _make_run_fn

    sim_a = _build("stream", n_steps=80)
    sim_b = _build("stream", n_steps=80, patch=(10.0, 8.0))
    assert sim_a.pallas_mode == "stream"
    assert sim_a.padded_shape == sim_b.padded_shape

    run_raw = _make_run_fn(sim_a, *sim_a._aux)
    vrun = jax.jit(jax.vmap(run_raw, in_axes=(0, None, None, None, None)))
    batched = {
        k: jnp.stack([sim_a.coeffs[k], sim_b.coeffs[k]])
        for k in sim_a.coeffs
    }
    import math

    args = (
        jnp.asarray(sim_a.waveform),
        jnp.asarray(2 * math.pi * sim_a.port_freqs_hz, jnp.float32),
        jnp.asarray(2 * math.pi * sim_a.nf_freqs_hz, jnp.float32),
        run_raw.build_src_ops(),
    )
    out = vrun(batched, *args)

    for b, sim in enumerate((sim_a, sim_b)):
        ref = sim.run()
        assert int(np.asarray(out["steps"])[b]) == int(ref["steps"])
        got_uf = np.asarray(out["uf"])[b]
        ref_uf = np.stack([np.asarray(ref["uf"]).real,
                           np.asarray(ref["uf"]).imag])
        scale = max(np.abs(ref_uf).max(), 1e-20)
        np.testing.assert_allclose(
            got_uf, ref_uf, rtol=5e-4, atol=5e-5 * scale,
            err_msg=f"variant {b} uf mismatch (vmapped stream vs single)",
        )
    # distinct geometries must give distinct spectra (the broadcast bug)
    uf = np.asarray(out["uf"])
    assert not np.allclose(uf[0], uf[1], rtol=1e-3)


def test_pick_stream_layout_force_bx():
    """The stream_bx escape hatch must pin the block height (the
    operating-point sweeps in examples/stream_tune.py rely on it) while
    leaving the orientation/T search intact."""
    from fdtd_solver_antennas_tpu.ops.fdtd_pallas import pick_stream_layout

    # tall-patch-like dims: py=121, pz=160, one source comp, MUR
    auto = pick_stream_layout(121, 160, 1, 161, True)
    assert auto[1] > 0
    for bx in (4, 8):
        swap, got_bx, t = pick_stream_layout(
            121, 160, 1, 161, True, force_bx=bx
        )
        assert got_bx == bx, (bx, got_bx)
        assert 1 <= t <= bx - 1
