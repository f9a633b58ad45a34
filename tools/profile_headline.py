#!/usr/bin/env python
"""Per-stage profile + plan capture for the headline bench queries.

For each query: one warm-up run (uncounted), then a timed run tagged with
``setJobGroup(name)``; afterwards the driver's own UI REST API
(http://localhost:<port>/api/v1) is scraped for the stages of exactly the
jobs that ran in that group, attributing wall time to executor compute,
shuffle fetch wait, shuffle write, input read and spill (guide §1/§7.1).
``explain('formatted')`` is captured per query into --plan-dir.

Usage:
    python tools/profile_headline.py [--queries a,b,...] \
        [--plan-dir plans/r15] [--suffix _before] [--runs 1] [--json OUT]

The profile run itself is NOT a benchmark (UI on, single run) — use
bench.py / tools/ab.py for before/after numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4049"))

HEADLINE = [
    "fuse_merge", "resample_1m_global", "resample_keys_1h",
    "forward_fill_global", "sessionize_30m", "tpch_q1_pricing",
    "top_orders_per_priority", "revenue_per_nation", "dedup_exact",
    "dedup_minhash_lsh", "dedup_simhash", "text_stats", "lang_id",
    "doc_fingerprint", "similarity_topk", "embedding_neardup",
]


def _api(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(HEADLINE))
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--json", default=None)
    ap.add_argument("--plan-only", action="store_true",
                    help="capture explain('formatted') only; run nothing")
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile_headline")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.retainedJobs", "10000")
        .config("spark.ui.retainedStages", "10000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    app_id = sc.applicationId

    from timeseriesfuser_spark import contract

    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    results = {}
    for name in names:
        fn = contract.QUERIES[name]
        if not args.plan_only:
            # Warm-up (codegen/classload; excluded, same as bench min-of-N).
            spark.catalog.clearCache()
            try:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                results[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
                print(f"## {name}: ERROR {results[name]['error']}")
                continue
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            plan = fn(spark, SF_DIR)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plan_dir, f"{name}{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
            print(f"## {name}: plan captured")
        if args.plan_only:
            spark.catalog.clearCache()
            continue
        spark.catalog.clearCache()
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup("", "")

        # Jobs of this group -> their stages -> stage metrics.
        jobs = [j for j in _api(f"/applications/{app_id}/jobs")
                if j.get("jobGroup") == name]
        stage_ids = sorted({s for j in jobs for s in j.get("stageIds", [])})
        stages = []
        for sid in stage_ids:
            try:
                for att in _api(f"/applications/{app_id}/stages/{sid}"):
                    if att.get("status") in ("COMPLETE", "FAILED"):
                        stages.append(att)
            except Exception:  # noqa: BLE001 — skipped stages 404
                pass
        rows = []
        for s in stages:
            rows.append({
                "stage": s["stageId"],
                "name": s.get("name", "")[:60],
                "tasks": s.get("numCompleteTasks"),
                "ms": round(
                    (s.get("executorRunTime") or 0), 1),
                "cpu_ms": round((s.get("executorCpuTime") or 0) / 1e6, 1),
                "fetchwait_ms": s.get("shuffleFetchWaitTime"),
                "swrite_ms": round((s.get("shuffleWriteTime") or 0) / 1e6, 1),
                "in_mb": round((s.get("inputBytes") or 0) / 2**20, 1),
                "sr_mb": round((s.get("shuffleReadBytes") or 0) / 2**20, 1),
                "sw_mb": round((s.get("shuffleWriteBytes") or 0) / 2**20, 1),
                "spill_mb": round((s.get("diskBytesSpilled") or 0) / 2**20, 1),
                "gc_ms": s.get("jvmGcTime"),
            })
        results[name] = {
            "wall_s": round(wall, 3),
            "n_jobs": len(jobs),
            "stages": rows,
        }
        tot_run = sum(r["ms"] for r in rows)
        print(f"## {name}: wall={wall:.3f}s jobs={len(jobs)} "
              f"stages={len(rows)} exec_run_total={tot_run/1000:.1f}s")
        for r in sorted(rows, key=lambda r: -r["ms"])[:8]:
            print(f"   stage {r['stage']:>4} run={r['ms']/1000:6.2f}s "
                  f"cpu={r['cpu_ms']/1000:6.2f}s fw={r['fetchwait_ms']}ms "
                  f"gc={r['gc_ms']}ms in={r['in_mb']}MB sr={r['sr_mb']}MB "
                  f"sw={r['sw_mb']}MB spill={r['spill_mb']}MB {r['name']}")

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
