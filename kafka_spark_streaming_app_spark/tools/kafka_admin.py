"""Kafka topic administration — parity with the reference's
``setup_kafka_topics.py`` / ``delete_kafka_topics.py`` (force
delete-and-recreate with the reference's partition/replication/
retention layout, reference setup_kafka_topics.py:113-130 and
delete_kafka_topics.py:25-56).

Two transports, mirroring ``tools/producer.py`` / ``tools/consumer.py``:

- **wire** (always available): the engine's own protocol client speaks
  CreateTopics (API 19) / DeleteTopics (API 20) v0 over TCP — the full
  reference recreate flow (list existing → force delete → verify gone
  → recreate with per-topic configs → verify layout) executes
  end-to-end against any broker that answers those APIs, including the
  in-process ``MiniKafkaBroker``. No kafka-python needed.
- **kafka-python** (when installed): the reference's own client
  against a real cluster; degrades to a clear actionable error here.
"""

from __future__ import annotations

# The reference topology (setup_kafka_topics.py:113-130):
# partitions / replication / retention.ms + cleanup.policy configs.
TOPIC_SPECS: dict[str, dict] = {
    "ecommerce-orders": {
        "partitions": 3,
        "replication": 2,
        "retention_ms": 7 * 24 * 3600 * 1000,
        "configs": {
            "retention.ms": "604800000",
            "cleanup.policy": "delete",
        },
    },
    "ecommerce-alerts": {
        "partitions": 3,
        "replication": 2,
        "retention_ms": 3 * 24 * 3600 * 1000,
        "configs": {
            "retention.ms": "259200000",
            "cleanup.policy": "delete",
        },
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


# --- wire transport (engine-native, no kafka-python) -------------------------


def recreate_topics_wire(
    bootstrap: str,
    specs: dict[str, dict] | None = None,
    replication: int | None = None,
) -> dict:
    """The reference's full setup flow over the engine's own wire
    client (setup_kafka_topics.py:49-99): list existing topics, force
    delete the ones being recreated, verify they are gone, recreate
    with per-topic partitions/RF/configs, verify the created layout.

    ``replication`` overrides the spec's replication factor (a
    single-node broker satisfies only RF 1 and answers
    INVALID_REPLICATION_FACTOR otherwise — pass 1 in-sandbox, None to
    send the reference's declared RF to a real cluster).

    Returns ``{"deleted": [...], "created": [...],
    "layout": {topic: n_partitions}}``; raises on any error code, a
    loud version of the reference's per-topic ✓/✗ report."""
    from ..sources.minikafka import MiniKafkaClient

    specs = specs or TOPIC_SPECS
    with MiniKafkaClient(bootstrap) as c:
        existing = set(c.metadata()["topics"])
        to_delete = [t for t in specs if t in existing]
        deleted = []
        if to_delete:
            for name, err in c.delete_topics(to_delete).items():
                if err:
                    raise RuntimeError(
                        f"delete_topics error {err} on {name!r}"
                    )
                deleted.append(name)
        # verify deletion completed (reference waits on the futures)
        left = set(c.metadata()["topics"]) & set(specs)
        if left:
            raise RuntimeError(f"topics survived deletion: {sorted(left)}")
        reqs = [
            (
                name,
                spec["partitions"],
                replication
                if replication is not None
                else spec["replication"],
                spec.get("configs")
                or {"retention.ms": str(spec["retention_ms"])},
            )
            for name, spec in specs.items()
        ]
        created = []
        for name, err in c.create_topics(reqs).items():
            if err:
                raise RuntimeError(
                    f"create_topics error {err} on {name!r}"
                )
            created.append(name)
        layout = {
            t: len(ps)
            for t, ps in c.metadata(list(specs))["topics"].items()
        }
        # verify the config map landed — read back over the wire
        # (DescribeConfigs), not a broker-side shortcut
        configs = {t: c.describe_configs(t) for t in specs}
    return {
        "deleted": sorted(deleted),
        "created": sorted(created),
        "layout": layout,
        "configs": configs,
    }


def delete_topics_wire(bootstrap: str, names: list[str]) -> dict:
    """delete_kafka_topics.py parity over the wire: list current
    topics, delete the requested ones that exist, report per-topic
    outcome. Returns ``{"deleted": [...], "skipped": [...],
    "remaining": [...]}``."""
    from ..sources.minikafka import MiniKafkaClient

    with MiniKafkaClient(bootstrap) as c:
        existing = set(c.metadata()["topics"])
        present = [n for n in names if n in existing]
        skipped = [n for n in names if n not in existing]
        deleted = []
        if present:
            for name, err in c.delete_topics(present).items():
                if err:
                    raise RuntimeError(
                        f"delete_topics error {err} on {name!r}"
                    )
                deleted.append(name)
        remaining = sorted(c.metadata()["topics"])
    return {
        "deleted": sorted(deleted),
        "skipped": sorted(skipped),
        "remaining": remaining,
    }
