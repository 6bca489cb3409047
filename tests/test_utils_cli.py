"""Trajectory IO round-trips (byte parity with the reference format)
and CLI smoke tests."""

import numpy as np

from hectr_tpu.utils import (
    read_traj_bin,
    timed,
    traj_compare,
    write_traj_bin,
    write_traj_txt,
)
from tests.conftest import GOLDEN_DIR


def test_traj_bin_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(41, 3))
    u = rng.normal(size=(40, 2))
    path = tmp_path / "t.bin"
    write_traj_bin(path, x, u)
    x2, u2 = read_traj_bin(path)
    np.testing.assert_array_equal(x2, x)
    np.testing.assert_array_equal(u2[:40], u)
    # last row repeats u[-1] (reference convention, tests/hectr.c:755)
    np.testing.assert_array_equal(u2[40], u[-1])


def test_traj_bin_reads_reference_golden():
    x, u = read_traj_bin(GOLDEN_DIR / "cstr-mpc.bin")
    assert x.shape == (41, 3) and u.shape == (41, 2)
    np.testing.assert_allclose(x[0], [0.878, 324.5, 0.659], atol=1e-12)


def test_traj_compare_matches_reference_cmp():
    """Recomputing |cstr-mpc - cstr-hempc| from the reference's own
    binaries must reproduce its committed cstr-cmp.bin."""
    diff = traj_compare(GOLDEN_DIR / "cstr-mpc.bin",
                        GOLDEN_DIR / "cstr-hempc.bin")
    ref_x, ref_u = read_traj_bin(GOLDEN_DIR / "cstr-cmp.bin")
    np.testing.assert_allclose(diff[:, :3], ref_x, atol=1e-18)
    np.testing.assert_allclose(diff[:, 3:], ref_u, atol=1e-18)
    # and the headline numbers from BASELINE.md
    assert diff.max() < 1e-9


def test_timed_section(capsys):
    import sys

    with timed("unit-test-section"):
        pass
    assert "unit-test-section" in capsys.readouterr().err


def test_cli_cstr_mpc(tmp_path):
    from hectr_tpu import cli

    cli.main(["cstr-mpc", "--out-dir", str(tmp_path), "--steps", "12"])
    x, u = read_traj_bin(tmp_path / "cstr-mpc.bin")
    assert x.shape[0] == 13
    assert np.all(np.isfinite(x))


def test_cli_mpc_tracking(tmp_path):
    from hectr_tpu import cli

    cli.main(["mpc-tracking", "--out-dir", str(tmp_path)])
    got = np.loadtxt(tmp_path / "mpc-tracking-5.txt")
    golden = np.loadtxt(GOLDEN_DIR / "mpc-tracking-5.txt")
    np.testing.assert_allclose(got, golden, atol=1e-6)


def test_cli_cstr_lqr(tmp_path):
    from hectr_tpu import cli

    cli.main(["cstr-lqr", "--out-dir", str(tmp_path)])
    x, u = read_traj_bin(tmp_path / "cstr-lqr.bin")
    golden_x, golden_u = read_traj_bin(GOLDEN_DIR / "cstr-lqr.bin")
    np.testing.assert_allclose(x, golden_x, atol=1e-6)
    np.testing.assert_allclose(u, golden_u, atol=1e-6)


def test_cli_scaling_report(capsys):
    """Scaling-efficiency report on the virtual 8-device CPU mesh
    (the real-pod entry point; BASELINE north-star harness)."""
    import json

    from hectr_tpu import cli

    cli.main(["scaling", "--logn", "10", "--depth", "1"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(line)
    assert rep["devices"] == 8
    assert rep["sharded_ntt_per_s"] > 0
    assert 0 < rep["efficiency"] <= 1.5
    assert rep["ppermute_bytes_per_transform"] == 3 * (1 << 10) // 8 * 4 * 4


def test_multihost_init_noop_without_coordinator(monkeypatch):
    from hectr_tpu.parallel.multihost import init_distributed

    monkeypatch.delenv("HECTR_COORDINATOR", raising=False)
    assert init_distributed() is False
