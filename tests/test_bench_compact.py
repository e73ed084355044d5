"""The bench's stdout contract: ONE JSON line that survives the
external harness's ~2000-char capture window under every payload shape
(BENCH_r07 was recorded truncated and unparseable; the round-8 fix
must not regress under the failure-heavy payloads where a parseable
artifact matters most)."""

from __future__ import annotations

import json

from bench import _is_contended, _weather_trips, compact_line


def _payload(failures):
    base = {
        "metric": "headline_queries_total",
        "value": 19.7,
        "unit": "sec",
        "value_warm": 6.6,
        "etl": {"rows": 400000, "sec": 9.0, "rows_per_sec": 44000.0,
                "complete": True, "io_dir": "tmpfs",
                "rows_per_sec_runs": [41000.5, 44000.0, 47000.5],
                "spread": 1.146, "steal_jiffies": 84,
                "steal_jiffies_runs": [84, 60, 5]},
        "tpch_total": 21.5,
        "tpch_count": 20,
        "sf": 0.1,
        "loadavg_before": [0.5, 0.5, 0.5],
        "loadavg_after": [2.0, 1.0, 1.0],
        "cpu_canary_sec_before": 0.3,
        "cpu_canary_sec_after": 0.3,
        "ncpus": 32,
        "contended": False,
        "contended_at_start": False,
        "weather_during": {
            label: {
                "wall_sec": 120.4,
                "steal_jiffies": 960,
                "steal_jiffies_per_5s": 40,
                "canary_sec": 0.29,
                "loadavg": [9.0, 3.0, 1.0],
                "tripped": False,
            }
            for label in ("after_etl", "after_headline", "after_tpch")
        },
        "quiet_wait_sec": 0.0,
        "queries_warm": {f"q{i}": 0.123456 for i in range(14)},
    }
    if failures:
        base["failures"] = failures
    return base


TIMINGS = {f"very_long_query_name_number_{i:02d}": 1.234567 for i in range(14)}
TPCH = {f"tpch_q{i}_some_description_here": 1.234567 for i in range(1, 23)}


def test_compact_line_fits_and_parses_clean_run():
    line = compact_line(_payload({}), TIMINGS, TPCH, {})
    assert len(line) <= 2000
    parsed = json.loads(line)
    assert parsed["full"] == "BENCH_LOCAL.json"
    assert "queries" in parsed  # clean runs keep the per-query map


def test_compact_line_fits_with_many_fat_failures():
    failures = {
        f"broken_query_with_a_long_name_{i:02d}": "x" * 400
        for i in range(12)
    }
    line = compact_line(_payload(failures), TIMINGS, TPCH, failures)
    assert len(line) <= 2000
    parsed = json.loads(line)
    # the failure SIGNAL always survives, even when maps get dropped
    assert parsed["failures"]["n"] == 12


def test_compact_line_never_loses_headline_metrics():
    failures = {f"q{i}": "boom" for i in range(30)}
    parsed = json.loads(compact_line(_payload(failures), TIMINGS, TPCH, failures))
    for key in ("metric", "value", "unit", "sf", "contended", "full"):
        assert key in parsed


def test_contended_gate_single_definition():
    """The recorded flag and the wait gate share one expression, and
    since round 11 (VERDICT r10 item 2) the gate trips on ANY of
    loadavg, hypervisor steal, or the cpu canary — loadavg alone
    misses this box's dominant noise source (host steal)."""

    def sig(load=(0.0, 0.0, 0.0), steal=0, canary=0.28):
        return {
            "loadavg": list(load),
            "steal_jiffies_per_5s": steal,
            "canary_sec": canary,
        }

    assert not _is_contended(sig())
    assert _is_contended(sig(load=(1e9, 0.0, 0.0)))
    assert _is_contended(sig(load=(0.0, 1e9, 0.0)))
    assert _is_contended(sig(steal=10_000))  # steal trips with loadavg at 0
    assert _is_contended(sig(canary=0.45))  # throttling trips both at 0
    assert not _is_contended(sig(steal=None))  # missing /proc/stat: no trip


def test_compact_line_pathological_residual_falls_back_to_minimal():
    """ADVICE r8: the drop loop only shrinks tpch/queries/failures —
    a pathological residual payload (e.g. a multi-KB etl error string)
    could still overflow the capture window after the last drop. The
    final re-check must degrade to the headline-only object."""
    payload = _payload({})
    payload["etl"] = {"error": "x" * 5000}
    line = compact_line(payload, TIMINGS, TPCH, {})
    assert len(line) <= 1900
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "sf", "contended", "full"):
        assert key in parsed


def test_compact_line_minimal_fallback_keeps_failure_count():
    payload = _payload({})
    payload["etl"] = {"error": "x" * 5000}
    failures = {f"q{i}": "boom" for i in range(7)}
    payload["failures"] = failures
    parsed = json.loads(compact_line(payload, TIMINGS, TPCH, failures))
    assert parsed["failures"]["n"] == 7


def test_weather_trips_ignores_loadavg():
    """round-12 (VERDICT r11 item 1): mid-run weather samples must trip
    on steal/canary only — the bench's own 32-thread work legitimately
    owns loadavg once the run has started, so a loadavg gate mid-run
    would stamp every healthy run contended."""
    assert not _weather_trips(
        {"loadavg": [30.0, 20.0, 10.0], "steal_jiffies_per_5s": 0,
         "canary_sec": 0.28}
    )
    assert _weather_trips(
        {"loadavg": [0.0, 0.0, 0.0], "steal_jiffies_per_5s": 10_000,
         "canary_sec": 0.28}
    )
    assert _weather_trips(
        {"loadavg": [0.0, 0.0, 0.0], "steal_jiffies_per_5s": 0,
         "canary_sec": 0.45}
    )
    assert not _weather_trips(
        {"loadavg": [0.0, 0.0, 0.0], "steal_jiffies_per_5s": None,
         "canary_sec": 0.28}
    )


def test_midrun_steal_level_is_stricter_than_start_gate():
    """round-12 calibration (NOTES): across six same-code runs, every
    block above ~550 steal jiffies/5s recorded inflated numbers while
    the start gate's 1500 passed them as clean — the mid-run trip uses
    the stricter 500 level so a weathered block cannot be recorded
    under a clean flag again."""
    from bench import STEAL_BUSY_JIFFIES_PER_5S, STEAL_MIDRUN_JIFFIES_PER_5S

    assert STEAL_MIDRUN_JIFFIES_PER_5S < STEAL_BUSY_JIFFIES_PER_5S
    sub_start_gate = {"loadavg": [0.0, 0.0, 0.0],
                      "steal_jiffies_per_5s": 1200, "canary_sec": 0.28}
    assert not _weather_trips(sub_start_gate)  # start gate: clean
    assert _weather_trips(                      # mid-run: tripped
        sub_start_gate, steal_limit=STEAL_MIDRUN_JIFFIES_PER_5S
    )


def test_compact_line_summarizes_weather_to_tripped_bools():
    """The compact line must carry the whole-run weather VERDICT
    without the full samples (those live in BENCH_LOCAL.json) — and
    still fit the capture window with the new fields present."""
    payload = _payload({})
    payload["weather_during"]["after_headline"]["tripped"] = True
    payload["contended"] = True  # main() ORs the trips in
    line = compact_line(payload, TIMINGS, TPCH, {})
    assert len(line) <= 2000
    parsed = json.loads(line)
    assert parsed["weather_during"] == {
        "after_etl": False, "after_headline": True, "after_tpch": False,
    }
    assert parsed["contended"] is True
    assert parsed["contended_at_start"] is False


def test_etl_block_records_spread_gate_and_protocol_key():
    """round-12 (VERDICT r11 item 4 + ADVICE r11): the recorded etl
    block says in-file whether the <=1.3 spread gate was met, and the
    sharded headline carries a protocol-distinct key so cross-round
    tooling cannot silently compare funnel vs sharded figures."""
    import bench

    calls = iter([
        {"rows": 100, "sec": 1.0, "rows_per_sec": 100.0, "complete": True,
         "shards": 8, "io_dir": "tmpfs", "steal_jiffies": 0},
    ] * 20)
    orig = bench.etl_throughput
    bench.etl_throughput = lambda spark, sf_dir, shards=8, rep=None, sink="sql": (
        dict(next(calls), shards=shards, sink=sink)
    )
    try:
        import io
        import contextlib

        out = io.StringIO()
        with contextlib.redirect_stdout(out):
            orig_get_spark = bench.get_spark
            bench.get_spark = lambda app_name=None: type(
                "S", (), {"stop": lambda self: None}
            )()
            try:
                bench.etl_main()
            finally:
                bench.get_spark = orig_get_spark
        block = json.loads(out.getvalue().strip().splitlines()[-1])
    finally:
        bench.etl_throughput = orig
    assert block["spread_gate_met"] is True  # identical runs: spread 1.0
    assert block["protocol"] == "sharded"
    assert block["rows_per_sec_sharded"] == block["rows_per_sec"] == 100.0
    assert block["funnel"]["rows_per_sec"] == 100.0
    # round-12 columnar twin: one parquet-sink sample, never gating
    assert block["parquet"]["rows_per_sec"] == 100.0
