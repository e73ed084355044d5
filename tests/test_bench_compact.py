"""The bench's stdout contract: ONE JSON line that survives the
external harness's ~2000-char capture window under every payload shape
(BENCH_r07 was recorded truncated and unparseable; the round-8 fix
must not regress under the failure-heavy payloads where a parseable
artifact matters most)."""

from __future__ import annotations

import json

from bench import _is_contended, compact_line


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
