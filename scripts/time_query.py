"""Time individual registry queries at an arbitrary SF dir, using the
same session/warmup discipline as bench.py (codegen warmup, wire-replay
fixture pre-materialized, streaming-engine warm start, min-of-N noop
writes).

Usage: python scripts/time_query.py [--sf DIR] [--runs N] q1 q2 ...
"""

import argparse
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from kafka_spark_streaming_app_spark import registry
    from kafka_spark_streaming_app_spark.session import get_spark

    registry.load_all()
    spark = get_spark(
        app_name="time_query",
        extra_confs={
            "spark.driver.memory": os.environ.get("BENCH_DRIVER_MEM", "48g")
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if any(q.startswith("streaming_") for q in args.queries):
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

    for name in args.queries:
        fn = registry.QUERIES[name]
        samples = []
        for _ in range(args.runs):
            start = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - start, 3))
        print(f"{name}: min={min(samples)} samples={samples}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
