"""Synthetic order producer — parity with the reference's
``ecommerce_data_producer.py`` (catalog-driven order generation,
client-side high-value alerting, reference :46-69,90-111) with two
transports:

- **kafka** (when kafka-python is installed): JSON-per-message to the
  orders topic, client-side alert echo to the alerts topic when
  ``total_amount > 1000`` — exactly the reference's dual-rule quirk
  (the authoritative rule lives engine-side; this one only mirrors it).
- **file**: JSON-lines files (one per flush) that the engine's file
  stream source replays — the broker-less test path.

Generation is seeded-deterministic (the reference's uuid/random calls
made its stream unreproducible; we fix the seed so fixtures are
stable).
"""

from __future__ import annotations

import json
import os
import random
from datetime import datetime, timedelta

# The reference's 5-product catalog (ecommerce_data_producer.py:48-54).
CATALOG = [
    {"product_id": "P001", "product_name": "MacBook Pro", "category": "Electronics", "price": 999.99},
    {"product_id": "P002", "product_name": "Nike Shoes", "category": "Clothing", "price": 199.99},
    {"product_id": "P003", "product_name": "Coffee Maker", "category": "Home", "price": 299.99},
    {"product_id": "P004", "product_name": "Headphones", "category": "Electronics", "price": 399.99},
    {"product_id": "P005", "product_name": "Backpack", "category": "Accessories", "price": 249.99},
]

LOCATIONS = ["US", "UK", "DE", "JP", "XX"]  # XX exercises the suspicious-location rule


def generate_orders(
    n: int,
    seed: int = 42,
    start: str = "2024-01-01 10:00:00",
    ms_between: int = 500,
) -> list[dict]:
    """Deterministic order records matching the consumer's declared
    schema (schemas.ORDER_SCHEMA) — no schema drift, unlike the
    reference producer (SURVEY.md §1.2)."""
    rng = random.Random(seed)
    t0 = datetime.fromisoformat(start)
    orders = []
    for i in range(n):
        product = rng.choice(CATALOG)
        quantity = rng.randint(1, 5)
        orders.append(
            {
                "order_id": f"order_{seed}_{i}",
                "user_id": f"user_{rng.randint(0, 99)}",
                **product,
                "quantity": quantity,
                "total_amount": round(product["price"] * quantity, 2),
                "location": rng.choice(LOCATIONS),
                "timestamp": (t0 + timedelta(milliseconds=i * ms_between)).strftime(
                    "%Y-%m-%d %H:%M:%S.%f"
                ),
                "event_type": "order",
                "is_fraud_simulation": rng.random() < 0.1,
            }
        )
    return orders


def produce_to_files(
    out_dir: str, n: int = 100, batch_size: int = 20, seed: int = 42
) -> list[str]:
    """Write orders as JSON-lines files, one per micro-batch."""
    os.makedirs(out_dir, exist_ok=True)
    orders = generate_orders(n, seed=seed)
    paths = []
    for b in range(0, len(orders), batch_size):
        path = os.path.join(out_dir, f"orders_{b // batch_size:05d}.json")
        with open(path + ".tmp", "w") as f:
            for order in orders[b : b + batch_size]:
                f.write(json.dumps(order) + "\n")
        os.rename(path + ".tmp", path)
        paths.append(path)
    return paths


def producer_client_config(
    bootstrap_servers: str,
    security_protocol: str | None = None,
    sasl_mechanism: str | None = None,
    sasl_username: str | None = None,
    sasl_password: str | None = None,
    extra: dict | None = None,
) -> dict:
    """kafka-python client kwargs with generic SASL/TLS passthrough —
    the broker-agnostic counterpart of the reference producer's auth
    block (ecommerce_data_producer.py:30-44), minus any cloud-specific
    token machinery: callers supply standard ``security_protocol`` /
    ``sasl_*`` values (or arbitrary overrides via ``extra``)."""
    cfg: dict = {
        "bootstrap_servers": bootstrap_servers,
        "acks": "all",
        "retries": 3,
    }
    if security_protocol:
        cfg["security_protocol"] = security_protocol
    if sasl_mechanism:
        cfg["sasl_mechanism"] = sasl_mechanism
    if sasl_username is not None:
        cfg["sasl_plain_username"] = sasl_username
    if sasl_password is not None:
        cfg["sasl_plain_password"] = sasl_password
    cfg.update(extra or {})
    return cfg


def produce_to_kafka(
    bootstrap_servers: str,
    n: int = 100,
    topic: str = "ecommerce-orders",
    alert_topic: str = "ecommerce-alerts",
    seed: int = 42,
    security: dict | None = None,
) -> int:
    """Send orders to Kafka with the reference's client-side high-value
    alert mirror. Requires kafka-python. ``security`` holds extra
    client kwargs (see :func:`producer_client_config`)."""
    try:
        from kafka import KafkaProducer
    except ImportError as exc:  # pragma: no cover - env without the client
        raise RuntimeError(
            "kafka-python is not installed; use produce_to_files for the "
            "broker-less path"
        ) from exc
    producer = KafkaProducer(
        value_serializer=lambda x: json.dumps(x).encode(),
        **producer_client_config(bootstrap_servers, extra=security),
    )
    sent = 0
    for order in generate_orders(n, seed=seed):
        producer.send(topic, order)
        if order["total_amount"] > 1000:
            producer.send(alert_topic, {**order, "alert_type": "HIGH_VALUE_ORDER"})
        sent += 1
    producer.flush()
    return sent


def produce_to_wire(
    bootstrap_servers: str,
    n: int = 100,
    topic: str = "ecommerce-orders",
    alert_topic: str = "ecommerce-alerts",
    seed: int = 42,
    start: str = "2024-01-01 10:00:00",
) -> int:
    """The Kafka transport over the engine's OWN wire-protocol client
    (sources/minikafka.py) — no kafka-python required, so the
    reference's produce path (ecommerce_data_producer.py:90-111,
    including the client-side high-value alert mirror) executes in a
    broker-less sandbox against the in-process broker. Speaks
    protocol v0; modern Kafka clusters have dropped v0 support, so
    against a real cluster prefer :func:`produce_to_kafka`.

    Messages are keyed by order_id and batched per partition
    (crc32(key) % partitions, the same rule as the minikafka sink),
    preserving per-key order exactly like the real producer."""
    import zlib

    from ..sources.minikafka import MiniKafkaClient

    with MiniKafkaClient(bootstrap_servers) as c:
        meta = c.metadata([topic, alert_topic])["topics"]
        n_parts = len(meta[topic])
        n_alert_parts = len(meta[alert_topic])
        orders_by_pid: dict[int, list] = {}
        alerts_by_pid: dict[int, list] = {}
        sent = 0
        for order in generate_orders(n, seed=seed, start=start):
            key = order["order_id"].encode()
            value = json.dumps(order).encode()
            orders_by_pid.setdefault(
                zlib.crc32(key) % n_parts, []
            ).append((key, value))
            if order["total_amount"] > 1000:
                alert = json.dumps(
                    {**order, "alert_type": "HIGH_VALUE_ORDER"}
                ).encode()
                alerts_by_pid.setdefault(
                    zlib.crc32(key) % n_alert_parts, []
                ).append((key, alert))
            sent += 1
        for pid, msgs in sorted(orders_by_pid.items()):
            c.produce(topic, pid, msgs)
        for pid, msgs in sorted(alerts_by_pid.items()):
            c.produce(alert_topic, pid, msgs)
    return sent
