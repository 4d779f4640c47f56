"""End-to-end streaming application — the reference program
(``ecommerce_streaming.py main()``, reference :144-227) rebuilt on this
engine. A user of the reference runs this instead, with the same
topology:

    source (rate | kafka | file) → parse/clean + watermark
      ├─ sliding windowed aggregation → parquet sink (10 s trigger)
      ├─ windowed aggregation        → console sink (30 s trigger)
      └─ fraud alerts               → kafka sink (5 s trigger)
                                      (parquet fallback without a broker)

Usage (local, no Kafka needed — mirrors the reference's own test mode):
    python app.py --source rate --output-dir /tmp/engine-out --duration 30

With a broker (full reference parity):
    python app.py --source kafka --kafka-servers host:9092 \
        --input-topic ecommerce-orders --alert-topic ecommerce-alerts \
        --output-dir s3a://bucket/windowed-aggregations
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from kafka_spark_streaming_app_spark.operators.alerts import detect_fraud
from kafka_spark_streaming_app_spark.operators.windowed import windowed_aggregation
from kafka_spark_streaming_app_spark.schemas import ORDER_SCHEMA
from kafka_spark_streaming_app_spark.session import get_spark
from kafka_spark_streaming_app_spark.sources.streams import (
    read_kafka_stream,
    read_rate_orders,
)
from kafka_spark_streaming_app_spark.streaming.pipeline import (
    fan_out,
    parse_and_clean,
    write_console_stream,
    write_kafka_stream,
    write_parquet_stream,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--source",
        choices=["rate", "kafka", "file", "minikafka"],
        default="rate",
    )
    p.add_argument("--kafka-servers", default="localhost:9092")
    p.add_argument(
        "--start-broker",
        action="store_true",
        help=(
            "--source minikafka only: start an in-process wire-protocol "
            "broker, seed it with the demo producer, and consume it — "
            "the reference's full topology with zero installation"
        ),
    )
    p.add_argument(
        "--seed-orders",
        type=int,
        default=200,
        help="orders produced when --start-broker seeds the topic",
    )
    p.add_argument("--input-topic", default="ecommerce-orders")
    p.add_argument("--alert-topic", default="ecommerce-alerts")
    p.add_argument("--input-dir", help="JSON-lines dir for --source file")
    p.add_argument("--output-dir", required=True, help="sink root (local or s3a://)")
    p.add_argument("--rows-per-second", type=int, default=10)
    p.add_argument(
        "--duration", type=int, default=0,
        help="seconds to run before stopping (0 = run until interrupted)",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark(app_name="ecommerce-analytics")

    servers = args.kafka_servers
    if args.source == "kafka":
        raw = read_kafka_stream(spark, servers, args.input_topic)
        orders = parse_and_clean(raw, ORDER_SCHEMA)
    elif args.source == "minikafka":
        from kafka_spark_streaming_app_spark.sources.minikafka_ds import (
            register_minikafka,
        )

        register_minikafka(spark)
        if args.start_broker:
            from kafka_spark_streaming_app_spark.sources.minikafka import (
                MiniKafkaBroker,
            )
            from kafka_spark_streaming_app_spark.tools.producer import (
                produce_to_wire,
            )

            broker = MiniKafkaBroker()
            broker.create_topic(args.input_topic, partitions=4)
            broker.create_topic(args.alert_topic, partitions=4)
            servers = broker.bootstrap
            print(f"in-process broker at {servers}")

            # trickle the orders in waves with advancing event times,
            # like the reference's continuous producer — append-mode
            # windows only finalize once the watermark passes them,
            # which needs data that keeps arriving
            import threading

            def _feed() -> None:
                waves = 4
                per = max(args.seed_orders // waves, 1)
                for w in range(waves):
                    produce_to_wire(
                        servers,
                        n=per,
                        topic=args.input_topic,
                        alert_topic=args.alert_topic,
                        seed=w,
                        start=f"2024-01-01 10:{w:02d}:00",
                    )
                    time.sleep(max(args.duration / (waves + 1), 1))

            threading.Thread(target=_feed, daemon=True).start()
        raw = (
            spark.readStream.format("minikafka")
            .option("bootstrap", servers)
            .option("topic", args.input_topic)
            .load()
        )
        orders = parse_and_clean(raw, ORDER_SCHEMA)
    elif args.source == "file":
        if not args.input_dir:
            raise SystemExit("--source file requires --input-dir")
        raw = spark.readStream.text(args.input_dir)
        orders = parse_and_clean(raw, ORDER_SCHEMA)
    else:
        orders = read_rate_orders(spark, args.rows_per_second)

    out = args.output_dir.rstrip("/")

    aggregates = windowed_aggregation(
        orders,
        ts_col="event_timestamp",
        keys=("category", "location"),
        amount_col="total_amount",
        user_col="user_id",
        window_duration="1 minute",
        slide_duration="30 seconds",
    )

    alerts = detect_fraud(
        orders,
        select_cols=[
            "order_id", "user_id", "product_name",
            "total_amount", "location", "event_timestamp",
        ],
    ).withColumn("alert_timestamp", F.current_timestamp())

    queries = [
        write_parquet_stream(
            aggregates,
            path=f"{out}/windowed-aggregations",
            checkpoint=f"{out}/checkpoints/aggregations",
            trigger_seconds=10,
        ),
        write_console_stream(aggregates, trigger_seconds=30),
    ]
    if args.source == "minikafka":
        # the reference's alert sink over the engine's own wire
        # protocol — Kafka-in AND Kafka-out with zero installation
        from kafka_spark_streaming_app_spark.streaming.pipeline import (
            write_minikafka_stream,
        )

        queries.append(
            write_minikafka_stream(
                alerts,
                servers=servers,
                topic=args.alert_topic,
                checkpoint=f"{out}/checkpoints/alerts",
                trigger_seconds=5,
            )
        )
    else:
        try:
            queries.append(
                write_kafka_stream(
                    alerts,
                    kafka_servers=args.kafka_servers,
                    topic=args.alert_topic,
                    checkpoint=f"{out}/checkpoints/alerts",
                    trigger_seconds=5,
                )
            )
        except Exception:
            # no broker / no connector jar: keep full topology with a
            # parquet alert sink instead
            queries.append(
                write_parquet_stream(
                    alerts,
                    path=f"{out}/alerts",
                    checkpoint=f"{out}/checkpoints/alerts",
                    trigger_seconds=5,
                )
            )

    print(f"started {len(queries)} streaming queries; output under {out}")
    try:
        if args.duration > 0:
            time.sleep(args.duration)
        else:
            # blocks until ANY query terminates; re-raises sink failures
            fan_out(queries)
    except KeyboardInterrupt:
        pass
    finally:
        for q in queries:
            if q.isActive:
                q.stop()
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
