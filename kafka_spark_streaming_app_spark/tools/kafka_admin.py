"""Kafka topic administration — parity with the reference's
``setup_kafka_topics.py`` / ``delete_kafka_topics.py`` (force
delete-and-recreate with the reference's partition/replication/retention
layout, reference setup_kafka_topics.py:113-130).

The kafka-python client is not installed in this environment; every
entry point degrades to a clear actionable error so the module imports
(and is testable) everywhere.
"""

from __future__ import annotations

# The reference topology: (partitions, replication, retention_ms).
TOPIC_SPECS: dict[str, dict[str, int]] = {
    "ecommerce-orders": {
        "partitions": 3,
        "replication": 2,
        "retention_ms": 7 * 24 * 3600 * 1000,
    },
    "ecommerce-alerts": {
        "partitions": 3,
        "replication": 2,
        "retention_ms": 3 * 24 * 3600 * 1000,
    },
}

_MISSING = (
    "kafka-python is not installed; install it (pip install kafka-python) "
    "and point --bootstrap-servers at your cluster"
)


def _admin(bootstrap_servers: str):
    try:
        from kafka.admin import KafkaAdminClient
    except ImportError as exc:  # pragma: no cover - env without the client
        raise RuntimeError(_MISSING) from exc
    return KafkaAdminClient(bootstrap_servers=bootstrap_servers)


def create_topics(
    bootstrap_servers: str, specs: dict[str, dict[str, int]] | None = None
) -> list[str]:
    """Create (or recreate) the engine's topics with the reference
    layout (force delete-and-recreate, like the reference's
    setup_kafka_topics.py). Returns the created topic names."""
    admin = _admin(bootstrap_servers)  # raises the actionable error if absent
    from kafka.admin import NewTopic

    specs = specs or TOPIC_SPECS
    try:
        # best-effort delete so re-runs recreate with the declared
        # layout; deletion is async broker-side — brand-new clusters or
        # already-absent topics raise and are fine to ignore
        admin.delete_topics(list(specs))
    except Exception:
        pass
    topics = [
        NewTopic(
            name=name,
            num_partitions=spec["partitions"],
            replication_factor=spec["replication"],
            topic_configs={"retention.ms": str(spec["retention_ms"])},
        )
        for name, spec in specs.items()
    ]
    admin.create_topics(topics)
    return [t.name for t in topics]


def delete_topics(bootstrap_servers: str, names: list[str] | None = None) -> list[str]:
    admin = _admin(bootstrap_servers)
    names = names or list(TOPIC_SPECS)
    admin.delete_topics(names)
    return names
