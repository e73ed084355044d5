"""Headline benchmark — prints ONE JSON line for the driver.

Runs the headline catalog queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and reports per-query
wall seconds. Each query is forced with a noop-format write so the full
plan executes distributed (no driver-side collect cost in the number).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from rabbithole_spark.catalog import load_all  # noqa: E402
from rabbithole_spark.session import get_spark  # noqa: E402

#: Headline subset; falls back to whatever exists if a name is missing.
HEADLINE = [
    "pricing_summary",
    "join_multiway_revenue",
    "tpch_q3_shipping_priority",
    "join_asof_events",
    "window_running_totals",
    "topk_per_group",
    "agg_rollup",
    "dedup_exact_documents",
    "similarity_topk_bruteforce",
    "text_quality_stats",
    "text_chunk_documents",
    "dedup_minhash_lsh",
    "text_bm25_ranking",
    "contamination_ngram_overlap",
]


def etl_throughput(spark, sf_dir: str) -> dict:
    """Streaming ETL rows/sec through the real user surface (YAML spec
    -> spool source -> decode -> mapper -> sqlite sink) — the
    reference's actual workload shape (AMQP->SQL bridge), measured
    end-to-end including checkpointing. executemany chunk = 500 (the
    reference default of 5 is a latency knob, not a throughput one).

    The probe's entire scratch tree (spool, checkpoint, sqlite file)
    lives on tmpfs when available: the round-9 recorded sample was
    2x low purely from /tmp disk weather (sqlite executemany fsyncs
    measuring page-cache state, not the engine — VERDICT r9 "What's
    wrong"). ``io_dir`` in the result says which medium ran."""
    import shutil
    import sqlite3
    import tempfile

    from pyspark.sql import functions as F

    from rabbithole_spark.plans.spec import PipelineSpec, compile_pipeline
    from rabbithole_spark.session import table

    shm = "/dev/shm"
    io_dir = None
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        try:
            st = os.statvfs(shm)
            # spool (~70 MB) + sqlite + checkpoint with headroom; a
            # small tmpfs (Docker defaults to 64 MB) must fall back to
            # disk, not ENOSPC the probe away (round-10 review)
            if st.f_bavail * st.f_frsize >= 512 * 1024 * 1024:
                io_dir = shm
        except OSError:
            pass
    tmp = tempfile.mkdtemp(prefix="bench_etl_", dir=io_dir)
    spool, db = os.path.join(tmp, "spool"), os.path.join(tmp, "out.sqlite")
    try:
        # 4x-replicated message stream: a ~2 s probe swings ~1.6x with
        # scheduler/IO noise; ~8 s of work per run keeps the spread
        # inside the pinned-protocol target (NOTES.md round 4)
        ev = table(spark, sf_dir, "events").crossJoin(
            spark.range(4).select(F.col("id").alias("__rep"))
        ).drop("__rep")
        body = F.to_json(F.struct("event_id", "user_id", "value", "event_type"))
        env = ev.select(
            F.to_json(
                F.struct(
                    F.lit("bench").alias("exchange"),
                    F.lit("application/json").alias("content_type"),
                    body.alias("body"),
                )
            ).alias("value")
        )
        env.coalesce(4).write.mode("overwrite").text(spool)
        n = spark.read.text(spool).count()
        con = sqlite3.connect(db)
        con.execute(
            "CREATE TABLE events_out (event_id INTEGER, user_id INTEGER,"
            " value REAL, event_type TEXT)"
        )
        con.commit()
        con.close()
        spec = PipelineSpec.from_dict(
            {
                "size_limit": 500,
                "time_limit": 15,
                "blocks": [
                    {"name": "in", "type": "spool", "kwargs": {"path": spool}},
                    {"name": "out", "type": "sql",
                     "kwargs": {"url": f"sqlite:///{db}"}},
                ],
                "flows": [
                    [
                        {"name": "in", "kwargs": {"exchange": "bench"}},
                        {"name": "out", "kwargs": {
                            "query": "INSERT INTO events_out VALUES "
                            "(:event_id, :user_id, :value, :event_type)",
                            "parameters": {
                                "event_id": "event_id",
                                "user_id": "user_id",
                                "value": "value",
                                "event_type": "event_type",
                            },
                        }},
                    ]
                ],
            }
        )
        runners = compile_pipeline(spark, spec, os.path.join(tmp, "ckpt"))
        steal0 = _steal_jiffies()
        start = time.perf_counter()
        for q in runners[0].start(available_now=True):
            q.awaitTermination(600)
        wall = time.perf_counter() - start
        steal1 = _steal_jiffies()
        con = sqlite3.connect(db)
        written = con.execute("SELECT count(*) FROM events_out").fetchone()[0]
        con.close()
        return {
            "rows": written,
            "sec": round(wall, 3),
            "rows_per_sec": round(written / wall, 1),
            "complete": written == n,
            "io_dir": "tmpfs" if io_dir else "disk",
            "steal_jiffies": (
                steal1 - steal0
                if steal0 is not None and steal1 is not None
                else None
            ),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _steal_jiffies() -> int | None:
    """Cumulative hypervisor-steal jiffies from /proc/stat (col 8).

    This box's load average misses the dominant noise source: host-
    level CPU steal (round-10 measurement — single-thread CPU work
    swung 8x while loadavg sat at 0; /proc/stat showed 1.4M cumulative
    steal jiffies). Sampling steal around each ETL run lets the
    recording say whether a slow run was the engine or the host."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) if len(parts) > 8 else None
    except (OSError, ValueError, IndexError):
        return None


def _is_contended(load=None) -> bool:
    """The bench runs ~5 min, so the 5-min load average matters as much
    as the 1-min: busy when 1-min load > ncpus/4 OR 5-min load >
    ncpus/8 (recorded rounds show up to ~2x cold-total drift under
    co-tenant load on identical code — r6 post-mortem, r7 measured
    cold 17.6 -> 35.2 s same-code while a test suite's load drained).
    ONE definition for both the wait gate and the recorded
    ``contended`` flag — pass the snapshot to evaluate, default now."""
    load = os.getloadavg() if load is None else load
    ncpus = os.cpu_count() or 1
    return load[0] > ncpus / 4 or load[1] > ncpus / 8


def wait_for_quiet(max_wait_sec: float = 600.0, poll_sec: float = 20.0) -> float:
    """Block until the box looks quiet (or the budget runs out).

    Round 7's recorded bench ran contended and its numbers were ~1.5x
    machine noise (VERDICT r7); rather than record-and-annotate, hold
    the run until the load gates pass. Bounded: after max_wait_sec the
    bench proceeds anyway and the `contended` flag tells the reader.
    Returns seconds waited. Skip with SPARK_GRAFT_BENCH_NO_WAIT=1.
    """
    if os.environ.get("SPARK_GRAFT_BENCH_NO_WAIT"):
        return 0.0
    start = time.perf_counter()
    while _is_contended() and time.perf_counter() - start < max_wait_sec:
        time.sleep(poll_sec)
    return round(time.perf_counter() - start, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    waited = wait_for_quiet()

    # Machine-load context: recorded rounds have shown up to ~5x warm
    # drift on identical code under co-tenant load (NOTES r5), so the
    # JSON carries 1/5/15-min load averages from before and after the
    # run — a reader can separate drift from regression without
    # re-measuring.
    load_before = [round(x, 2) for x in os.getloadavg()]

    def cpu_canary() -> float:
        """Single-thread machine-speed probe: wall seconds for a fixed
        pure-python workload. Round-7 measurement found the box's
        effective speed swinging ~2x between same-code bench runs with
        loadavg near zero (co-tenant/frequency effects invisible to
        load average) — the canary gives a reader a direct
        normalization factor: compare query times across rounds as
        time/canary, not raw seconds."""
        t0 = time.perf_counter()
        acc = 0
        for i in range(5_000_000):
            acc += i * i
        del acc
        return round(time.perf_counter() - t0, 4)

    canary_before = cpu_canary()

    # ETL probe FIRST and in its OWN JVM (round 10): both r10
    # diagnostic bench runs showed the box ~1.5x slower by bench end
    # (cpu_canary 0.28 -> 0.43 on a zero-load box — sustained-load
    # throttling/steal), and the probe's single-thread callback work
    # is maximally exposed to it, so the engine number belongs in the
    # quietest slot right after the quiet-wait. The probe runs in a
    # subprocess because sharing the JVM cuts both ways: a closing r10
    # run measured dedup_minhash_lsh (the registry's most codegen-
    # heavy plan) at 20.6 s median vs its 2.5 s band after ~10
    # streaming foreachBatch queries had run first in the same JVM —
    # generated-class/code-cache pollution neither phase should pay
    # for the other. Probe protocol per block is unchanged (one
    # untimed warm-up, median of three); a block whose spread exceeds
    # 1.3 is re-measured up to twice and the tightest block recorded.
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--etl-only"],
            capture_output=True,
            text=True,
            timeout=1800,
            env=os.environ.copy(),
        )
        etl = json.loads(proc.stdout.strip().splitlines()[-1])
    except Exception as exc:  # throughput probe must not kill the bench
        etl = {"error": f"{type(exc).__name__}: {exc}"[:200]}

    spark = get_spark(app_name="rabbithole-spark-bench")
    specs = load_all()
    names = [n for n in HEADLINE if n in specs] or sorted(specs)

    # Warm the JVM/codegen path once so per-query numbers measure the
    # plan, not first-run classloading.
    try:
        specs[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    # Per-query protocol (round 9, VERDICT r8 item 4): THREE full
    # invocations (fresh DataFrame each — plan construction, analysis,
    # optimization, execution; the first additionally pays codegen
    # compile), headline value = per-query MEDIAN — single-sample cold
    # noise was ~1.3x between same-code quiet runs (r8 21.9 vs 16.3 s).
    # queries_cold_first keeps the first-invocation numbers (the r1-r8
    # "queries" semantics) for cross-round comparison; queries_warm
    # keeps its protocol: a repeat write of the last compiled plan.
    # CAVEAT (round 10): the ETL probe now precedes this block, so the
    # JVM enters it warmer (streaming jobs, not these batch plans —
    # the per-query codegen still compiles cold here) than in r1-r9;
    # treat r10+ cold_first vs earlier rounds as a slightly favorable
    # comparison and prefer the median/warm columns across that seam.
    timings: dict[str, float] = {}
    cold_first: dict[str, float] = {}
    warm: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name in names:
        try:
            runs = []
            df = None
            for _ in range(3):
                start = time.perf_counter()
                df = specs[name].fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - start)
            cold_first[name] = round(runs[0], 4)
            timings[name] = round(sorted(runs)[1], 4)
            start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            warm[name] = round(time.perf_counter() - start, 4)
        except Exception as exc:  # one broken query must not kill the bench
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]

    # TPC-H shape block (round 6): every registered tpch_* analog as a
    # secondary warehouse-workload number, separate from the headline so
    # cross-round comparability of the headline total is preserved.
    # NOTE the block's composition grows with the registry — it was 14
    # queries when introduced (BENCH_r05), 20 after the derived-partsupp
    # shapes landed mid-round-6 (BENCH_r06) — so cross-round tpch_total
    # comparisons must hold tpch_count equal first.
    tpch_names = sorted(n for n in specs if n.startswith("tpch_"))
    tpch: dict[str, float] = {}
    for name in tpch_names:
        start = time.perf_counter()
        try:
            specs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            tpch[name] = round(time.perf_counter() - start, 4)
        except Exception as exc:
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]

    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "protocol": "cold_median3",  # per-query median of 3 invocations
        "queries": timings,
        "queries_cold_first": cold_first,
        "value_cold_first": round(sum(cold_first.values()), 4),
        "queries_warm": warm,
        "value_warm": round(sum(warm.values()), 4),
        "etl": etl,
        "tpch": tpch,
        "tpch_total": round(sum(tpch.values()), 4),
        "tpch_count": len(tpch),
        "sf": sf,
        "loadavg_before": load_before,
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
        "cpu_canary_sec_before": canary_before,
        "cpu_canary_sec_after": cpu_canary(),
        "ncpus": os.cpu_count(),
        # contended = the box was still busy when the bench started,
        # i.e. wait_for_quiet exhausted its budget without the load
        # gates passing. Slow phases invisible to load average show up
        # in cpu_canary_sec instead.
        "contended": _is_contended(load_before),
        "quiet_wait_sec": waited,
    }
    if failures:
        payload["failures"] = failures

    # The external harness captures only a bounded tail of stdout
    # (BENCH_r07 was recorded truncated and unparseable once the TPC-H
    # block grew to 20 entries), so the full payload goes to a file and
    # stdout carries a compact line guaranteed to round-trip: 2-decimal
    # timings, failure text truncated, and whole maps dropped in a
    # fixed order (least-essential first) until the line fits — the
    # length check runs AFTER every key, including the "full" pointer,
    # is in place.
    with open(os.path.join(REPO_DIR, "BENCH_LOCAL.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)

    print(compact_line(payload, timings, tpch, failures))


def compact_line(
    payload: dict, timings: dict, tpch: dict, failures: dict
) -> str:
    """One JSON line bounded to the harness capture window (~2000
    chars): 2-decimal per-query maps, failure text clipped, then whole
    maps dropped least-essential-first until it fits — measured AFTER
    every key (including the "full" pointer) is in place."""

    def _r2(d: dict) -> dict:
        return {k: round(v, 2) for k, v in d.items()}

    compact = dict(payload)
    compact["queries"] = _r2(timings)
    compact["tpch"] = _r2(tpch)
    compact.pop("queries_warm", None)  # full maps live in BENCH_LOCAL
    compact.pop("queries_cold_first", None)
    compact["full"] = "BENCH_LOCAL.json"
    if failures:
        # failures are unbounded (one traceback head per broken
        # query): keep a count plus the first few, each clipped
        compact["failures"] = {
            "n": len(failures),
            **{k: str(v)[:80] for k, v in list(failures.items())[:3]},
        }
    for drop in ("tpch", "queries", "failures"):
        if len(json.dumps(compact)) <= 1900:
            break
        if drop == "failures" and "failures" in compact:
            compact["failures"] = {"n": len(failures)}  # keep the signal
        elif drop in compact:
            del compact[drop]
    line = json.dumps(compact)
    if len(line) > 1900:
        # Re-check AFTER the last drop too (ADVICE r8): the residual
        # payload (etl map, load averages, clipped failure heads) is
        # normally small but not provably so — a pathological payload
        # (e.g. a huge etl error string) could still blow the capture
        # window. Fall back to a headline-only object that cannot.
        minimal = {
            "metric": payload.get("metric"),
            "value": payload.get("value"),
            "unit": payload.get("unit"),
            "sf": payload.get("sf"),
            "contended": payload.get("contended"),
            "full": "BENCH_LOCAL.json",
        }
        if failures:
            minimal["failures"] = {"n": len(failures)}
        line = json.dumps(minimal)
    return line


def etl_main() -> None:
    """--etl-only child: run the probe protocol in a fresh JVM and
    print the result block as the last stdout line (parent parses)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="rabbithole-spark-bench-etl")
    etl_throughput(spark, sf_dir)  # warm-up, discarded
    best = None
    for _ in range(3):
        runs = [etl_throughput(spark, sf_dir) for _ in range(3)]
        rates = sorted(r["rows_per_sec"] for r in runs)
        block = next(r for r in runs if r["rows_per_sec"] == rates[1])
        block["rows_per_sec_runs"] = [r["rows_per_sec"] for r in runs]
        block["spread"] = (
            round(rates[-1] / rates[0], 3) if rates[0] else None
        )
        block["steal_jiffies_runs"] = [r["steal_jiffies"] for r in runs]
        if best is None or (block["spread"] or 9e9) < (best["spread"] or 9e9):
            best = block
        if block["spread"] is not None and block["spread"] <= 1.3:
            break
    spark.stop()
    print(json.dumps(best))


if __name__ == "__main__":
    if "--etl-only" in sys.argv:
        etl_main()
    else:
        main()
