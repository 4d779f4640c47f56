"""Profile one registry query: wall time plus per-Spark-job breakdown
(description, duration, task count) parsed from the Spark event log.

Usage: python scripts/profile_query.py [--sf DIR] [--runs N] query
"""

import argparse
import glob
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("query")
    args = ap.parse_args()

    from kafka_spark_streaming_app_spark import registry
    from kafka_spark_streaming_app_spark.session import get_spark

    registry.load_all()
    evdir = tempfile.mkdtemp(prefix="evlog_")
    spark = get_spark(
        app_name="profile_query",
        extra_confs={
            "spark.driver.memory": os.environ.get("BENCH_DRIVER_MEM", "48g"),
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if args.query.startswith("streaming_"):
        from kafka_spark_streaming_app_spark.queries.streaming import (
            _events_as_wire_stream,
        )
        from kafka_spark_streaming_app_spark.streaming.pipeline import (
            write_memory_stream,
        )

        _events_as_wire_stream(spark, args.sf)
        warm_dir = tempfile.mkdtemp(prefix="warm_stream_")
        spark.range(1).selectExpr("cast(id as string) as value").write.mode(
            "overwrite"
        ).text(warm_dir)
        wq = write_memory_stream(
            spark.readStream.text(warm_dir),
            "warmup_stream",
            output_mode="append",
        )
        wq.processAllAvailable()
        wq.stop()

    fn = registry.QUERIES[args.query]
    marks = []
    for run in range(args.runs):
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        marks.append((t0, wall))
        print(f"run {run}: wall {wall:.3f}s", file=sys.stderr)

    spark.stop()

    # parse the event log
    logs = [
        p
        for p in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    starts, ends, descs, ntasks = {}, {}, {}, {}
    stage_tasks = {}
    for path in logs:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    starts[jid] = ev["Submission Time"]
                    descs[jid] = (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ) or (ev.get("Properties") or {}).get(
                        "callSite.short", ""
                    )
                    ntasks[jid] = sum(
                        s.get("Number of Tasks", 0)
                        for s in ev.get("Stage Infos", [])
                    )
                elif e == "SparkListenerJobEnd":
                    ends[ev["Job ID"]] = ev["Completion Time"]
    total = 0.0
    for jid in sorted(starts):
        dur = (ends.get(jid, starts[jid]) - starts[jid]) / 1000.0
        total += dur
        print(
            f"job {jid:4d}  {dur:7.3f}s  tasks={ntasks.get(jid, 0):4d}  "
            f"{descs.get(jid, '')[:110]}"
        )
    print(f"jobs={len(starts)} sum_job_time={total:.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
