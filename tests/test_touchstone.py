"""Touchstone export/import and exact S renormalization.

The reference has no machine-readable RF export at all (its sweeps live
only inside matplotlib figures), so these tests pin a beyond-reference
capability: the files must round-trip bit-faithfully through our own
reader AND encode physics correctly (renormalization is checked against
a closed-form two-port — a shunt resistor — not against the writer).
"""

import numpy as np
import pytest

from fdtd_solver_antennas_tpu.post.touchstone import (
    read_touchstone,
    renormalize_s,
    write_touchstone,
)


def _rand_s(n, nf, seed):
    rng = np.random.default_rng(seed)
    s = rng.normal(size=(n, n, nf)) + 1j * rng.normal(size=(n, n, nf))
    return 0.3 * s  # keep passive-ish / well-conditioned


def _shunt_resistor_s(r_shunt, z0):
    """Closed-form 2-port: shunt R to ground between the ports.
    Z = [[R, R], [R, R]]; S11 = -z0/(2R+z0), S21 = 2R/(2R+z0)."""
    d = 2 * r_shunt + z0
    s11 = -z0 / d
    s21 = 2 * r_shunt / d
    return np.array([[s11, s21], [s21, s11]], dtype=complex)


def test_one_port_roundtrip(tmp_path):
    freq = np.linspace(1e9, 3e9, 21)
    s11 = _rand_s(1, 21, 0)[0, 0]
    p = write_touchstone(tmp_path / "patch", freq, s11, z_ref=50.0)
    assert p.name == "patch.s1p"
    f2, s2, r = read_touchstone(p)
    assert r == 50.0
    np.testing.assert_allclose(f2, freq, rtol=1e-8)
    np.testing.assert_allclose(s2[0, 0], s11, rtol=1e-6)


@pytest.mark.parametrize("n", [2, 3, 4, 5])
def test_nport_roundtrip(tmp_path, n):
    """2-port exercises the spec's column-major quirk; n>4 exercises the
    4-pairs-per-line wrapping."""
    freq = np.linspace(2e9, 2.9e9, 7)
    s = _rand_s(n, 7, n)
    p = write_touchstone(tmp_path / "arr", freq, s, z_ref=50.0)
    assert p.suffix == f".s{n}p"
    f2, s2, r = read_touchstone(p)
    np.testing.assert_allclose(f2, freq, rtol=1e-8)
    np.testing.assert_allclose(s2, s, rtol=1e-6, atol=1e-9)


def test_renormalize_matches_closed_form():
    """Renormalizing the 50 Ω S of a shunt resistor to 75 Ω must equal
    the 75 Ω S computed directly from the circuit."""
    for r_shunt in (30.0, 100.0):
        s50 = _shunt_resistor_s(r_shunt, 50.0)[..., None]
        s75 = renormalize_s(s50, 50.0, 75.0)
        np.testing.assert_allclose(
            s75[..., 0], _shunt_resistor_s(r_shunt, 75.0), rtol=1e-12
        )


def test_renormalize_roundtrip_identity():
    s = _rand_s(3, 5, 7)
    z1 = [50.0, 75.0, 100.0]
    back = renormalize_s(renormalize_s(s, z1, 60.0), 60.0, z1)
    np.testing.assert_allclose(back, s, rtol=1e-10, atol=1e-12)


def test_mixed_port_references_renormalized_on_write(tmp_path):
    """Touchstone v1 has a single R: a mixed-z_ref matrix must land in
    the file renormalized to port 1's reference, recoverable exactly."""
    freq = np.linspace(1e9, 2e9, 4)
    s = _rand_s(2, 4, 11)
    z = [50.0, 73.0]
    p = write_touchstone(tmp_path / "mixed", freq, s, z_ref=z)
    f2, s_file, r = read_touchstone(p)
    assert r == 50.0
    np.testing.assert_allclose(
        renormalize_s(s_file, 50.0, z), s, rtol=1e-6, atol=1e-9
    )
    assert "73" in p.read_text()  # original refs preserved in comments


def test_reads_ma_db_formats_and_units(tmp_path):
    """Foreign files (VNA exports) use MA/DB and GHz — parse them."""
    s = 0.5 * np.exp(1j * np.deg2rad(30.0))
    ma = tmp_path / "vna_ma.s1p"
    ma.write_text("! VNA\n# GHZ S MA R 75\n2.45 0.5 30.0\n")
    f, sm, r = read_touchstone(ma)
    assert r == 75.0
    np.testing.assert_allclose(f, [2.45e9])
    np.testing.assert_allclose(sm[0, 0, 0], s, rtol=1e-9)

    db = tmp_path / "vna_db.s1p"
    db.write_text("# MHZ S DB R 50\n2450 -6.0205999 30.0\n")
    f, sd, r = read_touchstone(db)
    np.testing.assert_allclose(f, [2.45e9])
    np.testing.assert_allclose(sd[0, 0, 0], s, rtol=1e-6)


def test_bad_inputs(tmp_path):
    with pytest.raises(ValueError, match="frequencies"):
        write_touchstone(
            tmp_path / "x", np.ones(3), np.zeros(4, dtype=complex)
        )
    with pytest.raises(ValueError, match="positive"):
        renormalize_s(np.zeros((1, 1, 1), complex), -50.0, 50.0)
    bad = tmp_path / "bad.s2p"
    bad.write_text("# HZ S RI R 50\n1e9 0 0 0 0\n")  # 2-port needs 8 vals
    with pytest.raises(ValueError, match="token count"):
        read_touchstone(bad)


def test_nonfinite_points_dropped_on_write(tmp_path):
    """NaN S entries (port columns with no incident energy) must not
    reach the file as literal 'nan' tokens — the points are dropped and
    noted in a comment (ADVICE r4)."""
    freq = np.linspace(1e9, 2e9, 5)
    s = _rand_s(2, 5, 3)
    s[:, :, 2] = np.nan + 0j
    p = write_touchstone(tmp_path / "gappy", freq, s)
    text = p.read_text()
    assert "nan" not in text.lower().replace("non-finite", "")
    assert "omitted" in text
    f2, s2, _ = read_touchstone(p)
    assert len(f2) == 4
    np.testing.assert_allclose(f2, np.delete(freq, 2))
    np.testing.assert_allclose(s2, np.delete(s, 2, axis=2), rtol=1e-6)

    s[:] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        write_touchstone(tmp_path / "allnan", freq, s)


def test_non_s_parameter_file_rejected(tmp_path):
    """A Z/Y/H-parameter option line must raise, not silently parse as S."""
    zfile = tmp_path / "imp.s1p"
    zfile.write_text("# HZ Z RI R 50\n1e9 0.1 0.0\n")
    with pytest.raises(ValueError, match="Z-parameters"):
        read_touchstone(zfile)


def test_near_miss_suffix_message(tmp_path):
    """'.sp' / '.step' suffixes get the descriptive error, not a bare
    int() ValueError."""
    for name in ("x.sp", "x.step", "x.s2x"):
        f = tmp_path / name
        f.write_text("# HZ S RI R 50\n")
        with pytest.raises(ValueError, match="not a Touchstone"):
            read_touchstone(f)
