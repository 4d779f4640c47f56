"""Wire-protocol topic administration + consumer groups: the two
reference tools (setup_kafka_topics.py force-recreate flow,
delete_kafka_topics.py, kafka_consumer_test.py group semantics) that
previously needed kafka-python against a real broker now execute
end-to-end over the engine's own CreateTopics/DeleteTopics/
FindCoordinator/OffsetCommit/OffsetFetch v0 implementation."""

import pytest

from kafka_spark_streaming_app_spark.sources.minikafka import (
    ERR_INVALID_PARTITIONS,
    ERR_INVALID_REPLICATION_FACTOR,
    ERR_INVALID_TOPIC,
    ERR_TOPIC_ALREADY_EXISTS,
    ERR_UNKNOWN_TOPIC_OR_PARTITION,
    MiniKafkaBroker,
    MiniKafkaClient,
)


@pytest.fixture()
def broker():
    b = MiniKafkaBroker()
    yield b
    b.close()


def test_create_topics_over_the_wire(broker):
    with MiniKafkaClient(broker.bootstrap) as c:
        res = c.create_topics(
            [
                ("orders", 3, 1, {"retention.ms": "604800000",
                                  "cleanup.policy": "delete"}),
                ("alerts", 2, 1, {"retention.ms": "259200000"}),
            ]
        )
        assert res == {"orders": 0, "alerts": 0}
        meta = c.metadata()["topics"]
        assert meta == {"orders": [0, 1, 2], "alerts": [0, 1]}
    # the config map was stored broker-side, recreate-verifiable
    assert broker.topic_configs("orders") == {
        "retention.ms": "604800000", "cleanup.policy": "delete",
    }
    assert broker.topic_configs("alerts") == {"retention.ms": "259200000"}


def test_create_topics_error_codes(broker):
    broker.create_topic("taken", partitions=1)
    with MiniKafkaClient(broker.bootstrap) as c:
        res = c.create_topics(
            [
                ("taken", 1, 1, {}),       # duplicate
                ("bad partitions", 0, 1, {}),  # invalid name AND parts
                ("nparts", 0, 1, {}),      # invalid partition count
                ("rf", 1, 3, {}),          # RF 3 on a 1-node cluster
                ("..", 1, 1, {}),          # illegal name
            ]
        )
    assert res["taken"] == ERR_TOPIC_ALREADY_EXISTS
    assert res["bad partitions"] == ERR_INVALID_TOPIC  # name checked first
    assert res["nparts"] == ERR_INVALID_PARTITIONS
    assert res["rf"] == ERR_INVALID_REPLICATION_FACTOR
    assert res[".."] == ERR_INVALID_TOPIC
    # none of the failed topics exist
    with MiniKafkaClient(broker.bootstrap) as c:
        assert sorted(c.metadata()["topics"]) == ["taken"]


def test_delete_topics_over_the_wire(broker):
    broker.create_topic("gone", partitions=2)
    with MiniKafkaClient(broker.bootstrap) as c:
        res = c.delete_topics(["gone", "never-was"])
        assert res == {
            "gone": 0,
            "never-was": ERR_UNKNOWN_TOPIC_OR_PARTITION,
        }
        assert c.metadata()["topics"] == {}
        # deleted topic answers unknown on produce
        with pytest.raises(ValueError, match="error 3"):
            c.produce("gone", 0, [(None, b"x")])


def test_reference_recreate_flow_end_to_end(broker):
    """setup_kafka_topics.py parity: stale topics with the WRONG
    layout exist; the flow force-deletes, verifies, recreates with
    the reference's partitions + retention/cleanup configs, and the
    new topics are immediately usable (produce/fetch roundtrip)."""
    from kafka_spark_streaming_app_spark.tools.kafka_admin import (
        TOPIC_SPECS,
        delete_topics_wire,
        recreate_topics_wire,
    )

    broker.create_topic("ecommerce-orders", partitions=1)  # stale layout
    res = recreate_topics_wire(broker.bootstrap, replication=1)
    assert res["deleted"] == ["ecommerce-orders"]
    assert res["created"] == ["ecommerce-alerts", "ecommerce-orders"]
    assert res["layout"] == {
        "ecommerce-orders": 3, "ecommerce-alerts": 3,
    }
    assert broker.topic_configs("ecommerce-orders") == {
        "retention.ms": "604800000", "cleanup.policy": "delete",
    }
    assert broker.topic_configs("ecommerce-alerts") == {
        "retention.ms": "259200000", "cleanup.policy": "delete",
    }
    # the recreated topic starts empty and is usable immediately
    with MiniKafkaClient(broker.bootstrap) as c:
        assert c.produce("ecommerce-orders", 2, [(b"k", b"v")]) == 0
        hw, msgs = c.fetch("ecommerce-orders", 2, 0)
        assert hw == 1 and msgs[0][2] == b"v"
    # RF passthrough: the reference's declared RF 2 is unsatisfiable
    # on one node and must fail loudly, not silently downgrade
    with pytest.raises(RuntimeError, match="error 38"):
        recreate_topics_wire(broker.bootstrap)
    # delete_kafka_topics.py parity
    broker.create_topic("ecommerce-orders", partitions=3)
    res = delete_topics_wire(
        broker.bootstrap, ["ecommerce-orders", "absent"]
    )
    assert res["deleted"] == ["ecommerce-orders"]
    assert res["skipped"] == ["absent"]
    assert "ecommerce-orders" not in res["remaining"]
    assert TOPIC_SPECS["ecommerce-orders"]["partitions"] == 3


def test_group_offsets_survive_reconnect(broker):
    """The consumer-group contract kafka_consumer_test.py exercises:
    committed offsets live on the coordinator, so a NEW connection in
    the same group resumes exactly where the previous one left off."""
    broker.create_topic("t", partitions=2)
    with MiniKafkaClient(broker.bootstrap) as c:
        c.produce("t", 0, [(None, f"p0-{i}".encode()) for i in range(5)])
        c.produce("t", 1, [(None, f"p1-{i}".encode()) for i in range(5)])
        assert c.find_coordinator("g1") == (0, broker.host, broker.port)
        # nothing committed yet
        assert c.offset_fetch("g1", [("t", 0), ("t", 1)]) == {
            ("t", 0): -1, ("t", 1): -1,
        }
        c.offset_commit("g1", {("t", 0): 3, ("t", 1): 5})
    # fresh socket, same group: the ledger survives
    with MiniKafkaClient(broker.bootstrap) as c2:
        got = c2.offset_fetch("g1", [("t", 0), ("t", 1)])
        assert got == {("t", 0): 3, ("t", 1): 5}
        # a different group sees nothing
        assert c2.offset_fetch("g2", [("t", 0)]) == {("t", 0): -1}
        # committing to an unknown partition errors loudly
        with pytest.raises(ValueError, match="error 3"):
            c2.offset_commit("g1", {("t", 9): 1})


def test_group_consumer_resumes_where_it_left_off(broker):
    """tools/consumer.py group mode: first call reads 6 of 10 and
    auto-commits; the second call (new connection) resumes at the
    committed positions and drains the rest exactly once."""
    from kafka_spark_streaming_app_spark.tools.consumer import (
        consume_sample_wire,
    )

    broker.create_topic("orders", partitions=2)
    with MiniKafkaClient(broker.bootstrap) as c:
        for p in (0, 1):
            c.produce(
                "orders", p,
                [(None, b'{"n": %d}' % (p * 10 + i)) for i in range(5)],
            )
    first = consume_sample_wire(
        broker.bootstrap, "orders", max_messages=6, group_id="smoke",
    )
    assert len(first["messages"]) == 6
    assert first["partitions"] == [0, 1]
    assert sum(first["positions"].values()) == 6
    second = consume_sample_wire(
        broker.bootstrap, "orders", max_messages=10, group_id="smoke",
    )
    assert len(second["messages"]) == 4  # only the remainder
    seen = sorted(
        m["value"]["n"] for m in first["messages"] + second["messages"]
    )
    assert seen == sorted([0, 1, 2, 3, 4, 10, 11, 12, 13, 14])
    # fully caught up now
    third = consume_sample_wire(
        broker.bootstrap, "orders", max_messages=10, group_id="smoke",
    )
    assert third["empty"] and third["available"] == ["orders"]


def test_group_consumer_reset_and_commit_flags(broker):
    """auto_offset_reset=latest skips the backlog for an uncommitted
    group; enable_auto_commit=False leaves the ledger untouched so
    the next read repeats (at-least-once, exactly kafka-python's
    semantics with auto-commit off and no manual commit)."""
    from kafka_spark_streaming_app_spark.tools.consumer import (
        consume_sample_wire,
    )

    broker.create_topic("orders", partitions=1)
    with MiniKafkaClient(broker.bootstrap) as c:
        c.produce("orders", 0, [(None, b'{"n": 1}'), (None, b'{"n": 2}')])
    res = consume_sample_wire(
        broker.bootstrap, "orders", group_id="late",
        auto_offset_reset="latest",
    )
    assert res["empty"] and res["available"] == ["orders"]
    # latest committed log-end: new arrivals are seen, backlog is not
    with MiniKafkaClient(broker.bootstrap) as c:
        c.produce("orders", 0, [(None, b'{"n": 3}')])
    res2 = consume_sample_wire(
        broker.bootstrap, "orders", group_id="late",
        auto_offset_reset="latest",
    )
    assert [m["value"]["n"] for m in res2["messages"]] == [3]
    # no-commit mode: two groupless reads both see everything
    a = consume_sample_wire(
        broker.bootstrap, "orders", group_id="nc",
        enable_auto_commit=False,
    )
    b = consume_sample_wire(
        broker.bootstrap, "orders", group_id="nc",
        enable_auto_commit=False,
    )
    assert len(a["messages"]) == len(b["messages"]) == 3
    assert a["positions"] == {}
    with pytest.raises(ValueError, match="earliest|latest"):
        consume_sample_wire(
            broker.bootstrap, "orders", auto_offset_reset="none"
        )


def test_describe_configs_over_the_wire(broker):
    """DescribeConfigs v0: the recreate flow's verify step reads the
    config map back over TCP — unknown topics answer error 3, and the
    recreate result carries the verified configs."""
    from kafka_spark_streaming_app_spark.tools.kafka_admin import (
        recreate_topics_wire,
    )

    res = recreate_topics_wire(broker.bootstrap, replication=1)
    assert res["configs"]["ecommerce-orders"] == {
        "retention.ms": "604800000", "cleanup.policy": "delete",
    }
    assert res["configs"]["ecommerce-alerts"] == {
        "retention.ms": "259200000", "cleanup.policy": "delete",
    }
    with MiniKafkaClient(broker.bootstrap) as c:
        assert c.describe_configs("ecommerce-orders") == {
            "retention.ms": "604800000", "cleanup.policy": "delete",
        }
        with pytest.raises(ValueError, match="error 3"):
            c.describe_configs("ghost")


def test_multi_member_group_splits_partitions(broker):
    """kafka_consumer_test.py semantics under REAL concurrency: two
    wire consumers in one group JoinGroup/SyncGroup into the same
    generation, the leader's client-side range assignment splits the
    reference's 3-partition topic with no overlap, every message is
    consumed exactly once across the pair, and each member commits
    only its own partitions."""
    import threading

    broker.create_topic("ecommerce-orders", partitions=3)
    with MiniKafkaClient(broker.bootstrap) as c:
        for p in range(3):
            c.produce(
                "ecommerce-orders", p,
                [(None, f"p{p}-{i}".encode()) for i in range(4)],
            )
    from kafka_spark_streaming_app_spark.tools.consumer import (
        consume_group_wire,
    )

    results = {}

    def run(name):
        results[name] = consume_group_wire(
            broker.bootstrap, "ecommerce-orders", "g",
            max_messages=100, session_timeout_ms=4000,
        )

    t1 = threading.Thread(target=run, args=("a",))
    t2 = threading.Thread(target=run, args=("b",))
    t1.start()
    t2.start()
    t1.join()
    t2.join()
    a, b = results["a"], results["b"]
    assert a["generation"] == b["generation"] == 1
    assert a["is_leader"] != b["is_leader"]  # exactly one leader
    assert sorted(a["assigned"] + b["assigned"]) == [0, 1, 2]
    assert not (set(a["assigned"]) & set(b["assigned"]))
    got = sorted(
        bytes(m["value"]).decode()
        if isinstance(m["value"], (bytes, bytearray))
        else str(m["value"])
        for m in a["messages"] + b["messages"]
    )
    assert got == sorted(
        f"p{p}-{i}" for p in range(3) for i in range(4)
    )
    # each member committed exactly its own partitions
    with MiniKafkaClient(broker.bootstrap) as c:
        committed = c.offset_fetch(
            "g", [("ecommerce-orders", p) for p in range(3)]
        )
    assert committed == {
        ("ecommerce-orders", p): 4 for p in range(3)
    }


def test_group_rebalances_on_join_and_leave(broker):
    """A solo member owns every partition; a second join makes the
    incumbent's heartbeat answer REBALANCE_IN_PROGRESS, the rejoin
    forms generation 2 splitting the topic; the second member's
    LeaveGroup triggers another rebalance handing everything back."""
    broker.create_topic("t3", partitions=3)
    from kafka_spark_streaming_app_spark.sources.minikafka import (
        ERR_REBALANCE_IN_PROGRESS,
        range_assign,
    )

    with MiniKafkaClient(broker.bootstrap) as a, MiniKafkaClient(
        broker.bootstrap
    ) as b:
        ja = a.join_group("g", ["t3"], session_timeout_ms=4000)
        assert ja["is_leader"] and ja["generation"] == 1
        mine = a.sync_group(
            "g", 1, ja["member_id"],
            range_assign(ja["members"], {"t3": [0, 1, 2]}),
        )
        assert mine == {"t3": [0, 1, 2]}
        assert a.heartbeat("g", 1, ja["member_id"]) == 0
        # second member joins in the background (JoinGroup blocks
        # until the incumbent rejoins)
        import threading

        jb_out = {}

        def join_b():
            jb_out["j"] = b.join_group(
                "g", ["t3"], session_timeout_ms=4000
            )

        th = threading.Thread(target=join_b)
        th.start()
        # incumbent discovers the rebalance via heartbeat
        deadline = 50
        while deadline:
            if (
                a.heartbeat("g", 1, ja["member_id"])
                == ERR_REBALANCE_IN_PROGRESS
            ):
                break
            deadline -= 1
        assert deadline, "heartbeat never saw the rebalance"
        ja2 = a.join_group(
            "g", ["t3"], member_id=ja["member_id"],
            session_timeout_ms=4000,
        )
        th.join()
        jb = jb_out["j"]
        assert ja2["generation"] == jb["generation"] == 2
        leader, follower = (
            (a, ja2) if ja2["is_leader"] else (b, jb),
            (b, jb) if ja2["is_leader"] else (a, ja2),
        )
        assigns = range_assign(
            leader[1]["members"], {"t3": [0, 1, 2]}
        )
        got_l = leader[0].sync_group(
            "g", 2, leader[1]["member_id"], assigns
        )
        got_f = follower[0].sync_group(
            "g", 2, follower[1]["member_id"]
        )
        both = sorted(got_l.get("t3", []) + got_f.get("t3", []))
        assert both == [0, 1, 2]
        assert not (set(got_l.get("t3", [])) & set(got_f.get("t3", [])))
        # b leaves: a rebalances back to sole ownership
        b.leave_group("g", jb["member_id"])
        assert (
            a.heartbeat("g", 2, ja2["member_id"])
            == ERR_REBALANCE_IN_PROGRESS
        )
        ja3 = a.join_group(
            "g", ["t3"], member_id=ja2["member_id"],
            session_timeout_ms=4000,
        )
        assert ja3["generation"] == 3 and ja3["is_leader"]
        mine3 = a.sync_group(
            "g", 3, ja3["member_id"],
            range_assign(ja3["members"], {"t3": [0, 1, 2]}),
        )
        assert mine3 == {"t3": [0, 1, 2]}


def test_group_protocol_error_paths(broker):
    """UNKNOWN_MEMBER_ID for forged members, ILLEGAL_GENERATION for
    stale generations, and sync before the leader's assignment
    blocks (then succeeds) rather than erroring."""
    broker.create_topic("t1", partitions=1)
    from kafka_spark_streaming_app_spark.sources.minikafka import (
        range_assign,
    )

    with MiniKafkaClient(broker.bootstrap) as c:
        with pytest.raises(ValueError, match="error 25"):
            c.heartbeat("g", 0, "ghost")
        with pytest.raises(ValueError, match="error 25"):
            c.sync_group("g", 0, "ghost")
        with pytest.raises(ValueError, match="error 25"):
            c.leave_group("g", "ghost")
        with pytest.raises(ValueError, match="error 25"):
            c.join_group("g", ["t1"], member_id="ghost")
        j = c.join_group("g", ["t1"], session_timeout_ms=4000)
        with pytest.raises(ValueError, match="error 22"):
            c.sync_group("g", j["generation"] + 5, j["member_id"])
        mine = c.sync_group(
            "g", j["generation"], j["member_id"],
            range_assign(j["members"], {"t1": [0]}),
        )
        assert mine == {"t1": [0]}
        with pytest.raises(ValueError, match="error 22"):
            c.heartbeat("g", j["generation"] + 1, j["member_id"])


def test_describe_and_list_groups(broker):
    """DescribeGroups (15) / ListGroups (16): the introspection
    surface kafka-consumer-groups.sh --describe/--list reads — state,
    protocol, members with decoded subscriptions and assignments."""
    broker.create_topic("t2", partitions=2)
    from kafka_spark_streaming_app_spark.sources.minikafka import (
        range_assign,
    )

    with MiniKafkaClient(broker.bootstrap) as c:
        assert c.list_groups() == {}
        assert c.describe_groups(["nope"])["nope"]["state"] == "Dead"
        j = c.join_group("g1", ["t2"], session_timeout_ms=4000)
        mine = c.sync_group(
            "g1", j["generation"], j["member_id"],
            range_assign(j["members"], {"t2": [0, 1]}),
        )
        assert mine == {"t2": [0, 1]}
        assert c.list_groups() == {"g1": "consumer"}
        d = c.describe_groups(["g1"])["g1"]
        assert d["state"] == "Stable"
        assert d["protocol_type"] == "consumer"
        assert d["protocol"] == "range"
        assert list(d["members"]) == [j["member_id"]]
        m = d["members"][j["member_id"]]
        assert m["metadata"] == ["t2"]
        assert m["assignment"] == {"t2": [0, 1]}
        c.leave_group("g1", j["member_id"])
        assert c.list_groups() == {}
        assert c.describe_groups(["g1"])["g1"]["state"] == "Dead"
