"""Wedge-proofing of the driver bench (bench.py).

Round 3's verified perf record was erased when the device tunnel died at
bench time (BENCH_r03.json rc=75) — the bench now (a) runs the device
phase in a child with one backoff retry and (b) falls back to the
last-known-good metrics from BENCH_CACHE.json marked ``"stale": true``,
with the headline synthesis metric still LAST (the driver parses the
tail line).
"""

from __future__ import annotations

import importlib
import json
import sys

import pytest


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    """Import bench.py against an isolated cache file."""
    monkeypatch.setenv("MUSICGAN_BENCH_CACHE", str(tmp_path / "cache.json"))
    monkeypatch.setenv("MUSICGAN_BENCH_BACKOFF_S", "0.01")
    sys.modules.pop("bench", None)
    import bench as mod

    mod = importlib.reload(mod)
    yield mod
    sys.modules.pop("bench", None)


def _seed_cache(bench, values):
    for name, v in values.items():
        bench._cache_update(
            {"metric": name, "value": v, "unit": "u", "vs_baseline": 1.0}
        )


def test_emit_writes_through_to_cache(bench, capsys):
    bench._emit("train_steps_per_sec_stage7", 7.0, "steps/s/chip", 0.02)
    out = capsys.readouterr().out.strip()
    assert json.loads(out)["value"] == 7.0
    cached = bench._cache_load()["train_steps_per_sec_stage7"]
    assert cached["value"] == 7.0
    assert cached["vs_baseline"] == pytest.approx(350.0)
    assert "measured_at" in cached


def test_dead_device_emits_stale_metrics_with_headline_last(
    bench, capsys, monkeypatch
):
    _seed_cache(bench, {
        "device_peak_tflops_f32": 33.9,
        "device_peak_tflops_bf16": 34.1,
        "train_steps_per_sec_stage0": 5844.31,
        "train_steps_per_sec_stage7": 6.51,
        "gen_audio_sec_per_wall_sec": 2627.21,
    })
    calls = []
    monkeypatch.setattr(bench, "_run_device_child", lambda: calls.append(1) or 75)
    monkeypatch.setattr(bench, "bench_preproc", lambda: None)

    bench.main()  # must NOT raise: the record survives the dead device

    assert len(calls) == 2  # one retry after the backoff
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["metric"] == "bench_warning"
    stale = lines[1:]
    assert all(r["stale"] for r in stale)
    assert [r["metric"] for r in stale] == list(bench._DEVICE_METRICS)
    # the driver parses the TAIL line: it must stay the headline metric
    assert stale[-1]["metric"] == "gen_audio_sec_per_wall_sec"
    assert stale[-1]["value"] == 2627.21


def test_dead_device_with_empty_cache_exits_75(bench, monkeypatch):
    monkeypatch.setattr(bench, "_run_device_child", lambda: 75)
    monkeypatch.setattr(bench, "bench_preproc", lambda: None)
    with pytest.raises(SystemExit) as e:
        bench.main()
    assert e.value.code == 75


def test_partial_cache_without_headline_exits_75(bench, monkeypatch):
    """A cache holding only non-headline metrics (child wedged mid-phase
    in a previous run, before synthesis) must NOT let a non-headline
    record land on the tail line the driver parses as the headline."""
    _seed_cache(bench, {
        "train_steps_per_sec_stage0": 5844.31,
        "train_steps_per_sec_stage7": 6.51,
        # gen_audio_sec_per_wall_sec deliberately absent
    })
    monkeypatch.setattr(bench, "_run_device_child", lambda: 75)
    monkeypatch.setattr(bench, "bench_preproc", lambda: None)
    with pytest.raises(SystemExit) as e:
        bench.main()
    assert e.value.code == 75


def test_stale_replay_skips_metrics_the_child_emitted_fresh(
    bench, capsys, monkeypatch
):
    """A child that freshly emits stage0 and THEN wedges must not see
    stage0 replayed again marked stale (duplicate, self-contradictory
    records); the un-reached metrics are replayed from the cache."""
    _seed_cache(bench, {
        "train_steps_per_sec_stage0": 5000.0,
        "train_steps_per_sec_stage7": 6.51,
        "gen_audio_sec_per_wall_sec": 2627.21,
    })

    def child_emits_stage0_then_wedges():
        bench._emit("train_steps_per_sec_stage0", 5900.0, "steps/s/chip", 1.0)
        return 75

    monkeypatch.setattr(
        bench, "_run_device_child", child_emits_stage0_then_wedges
    )
    monkeypatch.setattr(bench, "bench_preproc", lambda: None)

    bench.main()

    lines = [json.loads(x)
             for x in capsys.readouterr().out.strip().splitlines()]
    stage0 = [r for r in lines if r["metric"] == "train_steps_per_sec_stage0"]
    # fresh emissions only (two child attempts), never a stale replay
    assert all(not r.get("stale") for r in stage0)
    stale = [r for r in lines if r.get("stale")]
    assert [r["metric"] for r in stale] == [
        "train_steps_per_sec_stage7", "gen_audio_sec_per_wall_sec"
    ]
    assert lines[-1]["metric"] == "gen_audio_sec_per_wall_sec"


def test_healthy_device_emits_nothing_stale(bench, capsys, monkeypatch):
    monkeypatch.setattr(bench, "_run_device_child", lambda: 0)
    monkeypatch.setattr(bench, "bench_preproc", lambda: None)
    bench.main()
    out = capsys.readouterr().out
    assert "stale" not in out and "bench_warning" not in out
