"""Noise-robust per-query work profile (optimization-round instrument).

Wall-clock on a shared VM swings 2-6x with neighbor weather, so this tool
measures the *work* a query submits instead: it runs each named query once
(after a warm pass) with the Spark event log enabled, then attributes every
job/stage/task to its query via the job description and reports

  n_jobs n_stages n_tasks sum(executorRunTime) sum(executorCpuTime)
  shuffle_read_bytes shuffle_write_bytes input_bytes python_boundary_ms

These are deterministic plan properties (modulo AQE sizing), so a before /
after diff of this report is trustworthy even when wall-clock is not — the
guide's "empirical" loop with the UI replaced by the event log (the UI is
disabled in this sandbox).

Usage: python tools/qprofile.py [--sf SF_DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=1, help="profiled runs per query (after 1 warm run)")
    ap.add_argument("--stages", action="store_true", help="also print a per-stage breakdown")
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="qprofile_ev_")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    # Event-log confs must reach the JVM before the context starts; get_spark
    # owns the builder, so inject them via PYSPARK_SUBMIT_ARGS (local mode's
    # documented extra-conf channel).
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f"--conf spark.eventLog.enabled=true"
        f" --conf spark.eventLog.compress=false"
        f" --conf spark.eventLog.dir=file://{evdir} pyspark-shell"
    )

    import __spark_entry__ as em
    from dhs_to_database_spark.session import get_spark

    spark = get_spark("qprofile")
    qs = em.queries()

    from dhs_to_database_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, args.sf, t).count()

    walls: dict[str, list[float]] = {}
    for name in args.queries:
        if name not in qs:
            raise SystemExit(f"unknown query {name!r}")
        # warm run (codegen/JIT) — not attributed
        spark.sparkContext.setJobDescription(f"warm:{name}")
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"qprofile:{name}")
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            walls.setdefault(name, []).append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # ---- parse the event log (Spark 4 writes eventlog_v2_<appId>/events_*) ----
    paths: list[str] = []
    for root, _dirs, files in os.walk(evdir):
        for fn in files:
            if app_id in root or app_id in fn:
                if not fn.startswith("appstatus_"):
                    paths.append(os.path.join(root, fn))
    assert paths, f"no event log for {app_id} in {evdir}"
    paths.sort()

    job_of_stage: dict[int, str] = {}
    agg: dict[str, dict[str, float]] = {}
    stage_rows: dict[int, dict] = {}

    def bucket(q: str) -> dict[str, float]:
        return agg.setdefault(
            q,
            dict(
                jobs=0, stages=0, tasks=0, run_ms=0, cpu_ms=0,
                sh_read=0, sh_write=0, input=0, py_ms=0, spill=0,
            ),
        )

    def lines():
        for p in paths:
            with open(p) as f:
                yield from f

    if True:
        for line in lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get("spark.job.description", "")
                if not desc.startswith("qprofile:"):
                    continue
                q = desc.split(":", 1)[1]
                b = bucket(q)
                b["jobs"] += 1
                for sid in ev.get("Stage IDs", []):
                    job_of_stage[sid] = q
            elif et == "SparkListenerStageCompleted":
                si = ev.get("Stage Info", {})
                q = job_of_stage.get(si.get("Stage ID"))
                if q and si.get("Submission Time"):  # skipped stages have no submission
                    bucket(q)["stages"] += 1
                    r = stage_rows.setdefault(si["Stage ID"], dict(q=q, name="", wall=0.0))
                    r["name"] = si.get("Stage Name", "")[:80]
                    r["wall"] = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1e3
            elif et == "SparkListenerTaskEnd":
                q = job_of_stage.get(ev.get("Stage ID"))
                if not q:
                    continue
                m = ev.get("Task Metrics") or {}
                b = bucket(q)
                b["tasks"] += 1
                sr = stage_rows.setdefault(
                    ev.get("Stage ID"), dict(q=q, name="", wall=0.0)
                )
                for key, val in (
                    ("tasks", 1),
                    ("run_ms", m.get("Executor Run Time", 0)),
                    ("cpu_ms", m.get("Executor CPU Time", 0) / 1e6),
                ):
                    sr[key] = sr.get(key, 0) + val
                b["run_ms"] += m.get("Executor Run Time", 0)
                b["cpu_ms"] += m.get("Executor CPU Time", 0) / 1e6
                b["sh_read"] += (m.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
                b["sh_read"] += (m.get("Shuffle Read Metrics") or {}).get("Remote Bytes Read", 0)
                b["sh_write"] += (m.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0)
                b["input"] += (m.get("Input Metrics") or {}).get("Bytes Read", 0)
                b["spill"] += m.get("Disk Bytes Spilled", 0)

    for name in args.queries:
        b = agg.get(name, {})
        w = walls.get(name, [])
        print(
            f"{name}: wall_min={min(w):.2f} jobs={b.get('jobs', 0):.0f}"
            f" stages={b.get('stages', 0):.0f} tasks={b.get('tasks', 0):.0f}"
            f" run_s={b.get('run_ms', 0) / 1e3 / max(args.runs, 1):.2f}"
            f" cpu_s={b.get('cpu_ms', 0) / 1e3 / max(args.runs, 1):.2f}"
            f" shR={b.get('sh_read', 0) / 1e6 / max(args.runs, 1):.1f}MB"
            f" shW={b.get('sh_write', 0) / 1e6 / max(args.runs, 1):.1f}MB"
            f" in={b.get('input', 0) / 1e6 / max(args.runs, 1):.1f}MB"
            f" spill={b.get('spill', 0) / 1e6:.0f}MB",
            flush=True,
        )
    if args.stages:
        for sid in sorted(stage_rows):
            r = stage_rows[sid]
            print(
                f"  stage {sid} [{r['q']}] wall={r['wall']:.2f}"
                f" tasks={r.get('tasks', 0)} run={r.get('run_ms', 0) / 1e3:.2f}s"
                f" cpu={r.get('cpu_ms', 0) / 1e3:.2f}s  {r['name']}"
            )
    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main()
