"""bench.py result-cache policy: keep the best value per section.

The tunnel's latency variance only ever slows identical device work
down, so a lower repeat is a degraded-window artifact; the cache must
keep the max while recording that (and how often) the section re-ran.
"""

import importlib
import json


def test_cache_keeps_best_value(tmp_path, monkeypatch):
    import bench

    importlib.reload(bench)
    monkeypatch.setattr(bench, "_CACHE_PATH",
                        str(tmp_path / "bench_cache.json"))
    monkeypatch.setattr(bench, "_backend_name", lambda: "testbackend")

    bench._cache_store("ntt", 100.0)
    ent = bench._cache_load()["ntt"]
    assert ent["value"] == 100.0 and ent["runs"] == 1

    bench._cache_store("ntt", 40.0)       # degraded window
    ent = bench._cache_load()["ntt"]
    assert ent["value"] == 100.0          # best kept
    assert ent["runs"] == 2
    assert ent["last_run_value"] == 40.0  # flakiness visible

    bench._cache_store("ntt", 250.0)      # better window
    ent = bench._cache_load()["ntt"]
    assert ent["value"] == 250.0 and ent["runs"] == 3

    raw = json.loads((tmp_path / "bench_cache.json").read_text())
    assert raw["ntt"]["backend"] == "testbackend"


def test_tpu_record_never_displaced_by_cpu(tmp_path, monkeypatch):
    """ADVICE r4 (medium): a CPU reading HIGHER than the recorded TPU
    best must NOT replace the entry (CPU can out-read tunnel-laden TPU
    numbers on small sections); a TPU reading always supersedes a
    non-TPU record, even a larger one."""
    import bench

    importlib.reload(bench)
    monkeypatch.setattr(bench, "_CACHE_PATH",
                        str(tmp_path / "bench_cache.json"))

    backend = {"v": "tpu"}
    monkeypatch.setattr(bench, "_backend_name", lambda: backend["v"])
    bench._cache_store("sec", 100.0)
    backend["v"] = "cpu"
    bench._cache_store("sec", 500.0)      # higher, but CPU
    ent = bench._cache_load()["sec"]
    assert ent["value"] == 100.0 and ent["backend"] == "tpu"
    assert ent["last_run_value"] == 500.0 and ent["runs"] == 2

    backend["v"] = "tpu"
    bench._cache_store("sec2", 100.0)     # seed as cpu? no: tpu beats cpu
    backend["v"] = "cpu"
    bench._cache_store("sec3", 900.0)     # cpu stand-in
    backend["v"] = "tpu"
    bench._cache_store("sec3", 10.0)      # smaller TPU reading wins
    ent = bench._cache_load()["sec3"]
    assert ent["value"] == 10.0 and ent["backend"] == "tpu"
