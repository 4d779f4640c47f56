"""From-scratch Kafka WIRE PROTOCOL: an in-process broker, a client,
and a Spark 4 Python DataSource (source + sink) speaking the public
Apache Kafka protocol (kafka.apache.org/protocol) over real TCP
sockets — no kafka-python, no spark-sql-kafka jar.

This closes the one reference capability (`ecommerce_streaming.py:
38-52` source options, `:119-133` kafka sink) that previously could
not execute end-to-end in a broker-less sandbox: the bytes on the
wire here are genuine Kafka protocol v0 frames, verifiable against
the published spec byte-for-byte (tests pin a hand-assembled Produce
request).

Implemented APIs (version 0 unless noted, request header v1):

  * Produce (0)         — CRC-validated MessageSet append, base offset
  * Fetch (1)           — offset-addressed read, OFFSET_OUT_OF_RANGE
  * ListOffsets (2)     — timestamp -1 => log-end, -2 => earliest
  * Metadata (3)        — broker + topic/partition/leader layout
  * OffsetCommit (8)    — group offset ledger (consumer groups)
  * OffsetFetch (9)     — committed offsets, -1 when none
  * FindCoordinator (10)— group coordinator (this single node)
  * JoinGroup (11)      — blocking rebalance entry, leader election
  * Heartbeat (12)      — liveness + REBALANCE_IN_PROGRESS signal
  * LeaveGroup (13)     — departure triggers the next rebalance
  * SyncGroup (14)      — leader distributes the opaque assignment
  * DescribeGroups (15) — state/protocol/member+assignment listing
  * ListGroups (16)     — live groups with their protocol types
  * ApiVersions (18)    — advertised (api, min, max) ranges
  * CreateTopics (19)   — partitions/RF/config map, dup/invalid errors
  * DeleteTopics (20)   — force delete, UNKNOWN for absent topics

Topic administration carries per-topic configs (``retention.ms``,
``cleanup.policy``, ...) exactly as the reference's
``setup_kafka_topics.py`` passes them; the config map is stored and
echoed back so a recreate flow can verify it. Consumer groups speak
the FULL membership protocol: the coordinator herds Empty ->
PreparingRebalance -> AwaitingSync -> Stable, the client-side leader
computes the range assignment (the embedded consumer protocol —
the broker never interprets it), and committed offsets survive
reconnects — so two concurrent consumers really split a topic's
partitions, the contract the reference's ``kafka_consumer_test.py``
exercises under kafka-python.

MessageSet format v0 (magic 0): ``offset:int64 size:int32 crc:uint32
magic:int8 attributes:int8 key:BYTES value:BYTES`` with CRC-32 over
magic..value — corrupt frames are rejected with error 2, exactly per
spec. Compression attribute bits other than 0 gate loudly ON THE v0
PATH; compressed traffic speaks the modern format instead: message
format v2 (RecordBatch — zigzag varints, CRC-32C, optional gzip;
``sources/kafkarecords.py``) rides Produce v3 / Fetch v4, the same
log serving both generations.

Scale posture: the DataSource reader is OFFSET-ADDRESSED — every
Spark input partition fetches exactly its own [start, end) range over
its own socket from the executor, no driver relay, no prefix replay —
the property that lets 1000 executors drain a topic without
coordination. The sink writes from executor tasks (one connection per
task), so micro-batch data never transits the driver. Semantics match
the real connector: producing is at-least-once under task retry
(Kafka's own contract for the non-transactional sink); readers that
need exactly-once dedup on a message key downstream.
"""

from __future__ import annotations

import io
import socket
import struct
import threading
import zlib
from typing import Iterator

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_OFFSET_COMMIT = 8
API_OFFSET_FETCH = 9
API_FIND_COORDINATOR = 10
API_JOIN_GROUP = 11
API_HEARTBEAT = 12
API_LEAVE_GROUP = 13
API_SYNC_GROUP = 14
API_DESCRIBE_GROUPS = 15
API_LIST_GROUPS = 16
API_API_VERSIONS = 18
API_CREATE_TOPICS = 19
API_DELETE_TOPICS = 20
API_DESCRIBE_CONFIGS = 32

ERR_NONE = 0
ERR_OFFSET_OUT_OF_RANGE = 1
ERR_CORRUPT_MESSAGE = 2
ERR_UNKNOWN_TOPIC_OR_PARTITION = 3
ERR_INVALID_TOPIC = 17
ERR_ILLEGAL_GENERATION = 22
ERR_INCONSISTENT_GROUP_PROTOCOL = 23
ERR_UNKNOWN_MEMBER_ID = 25
ERR_REBALANCE_IN_PROGRESS = 27
ERR_UNSUPPORTED_VERSION = 35
ERR_TOPIC_ALREADY_EXISTS = 36
ERR_INVALID_PARTITIONS = 37
ERR_INVALID_REPLICATION_FACTOR = 38

_SUPPORTED = {
    API_PRODUCE: (0, 3),  # v0-2: MessageSet v0; v3: RecordBatch v2
    API_FETCH: (0, 4),    # v0-3: MessageSet v0; v4: RecordBatch v2
    API_LIST_OFFSETS: (0, 0),
    API_METADATA: (0, 0),
    API_OFFSET_COMMIT: (0, 0),
    API_OFFSET_FETCH: (0, 0),
    API_FIND_COORDINATOR: (0, 0),
    API_JOIN_GROUP: (0, 0),
    API_HEARTBEAT: (0, 0),
    API_LEAVE_GROUP: (0, 0),
    API_SYNC_GROUP: (0, 0),
    API_DESCRIBE_GROUPS: (0, 0),
    API_LIST_GROUPS: (0, 0),
    API_API_VERSIONS: (0, 0),
    API_CREATE_TOPICS: (0, 0),
    API_DELETE_TOPICS: (0, 0),
    API_DESCRIBE_CONFIGS: (0, 0),
}


# --- primitive wire codec (big-endian, per the protocol guide) -------------


class _Writer:
    def __init__(self):
        self._b = io.BytesIO()

    def i8(self, v):
        self._b.write(struct.pack(">b", v))
        return self

    def i16(self, v):
        self._b.write(struct.pack(">h", v))
        return self

    def i32(self, v):
        self._b.write(struct.pack(">i", v))
        return self

    def i64(self, v):
        self._b.write(struct.pack(">q", v))
        return self

    def u32(self, v):
        self._b.write(struct.pack(">I", v))
        return self

    def string(self, s):
        if s is None:
            return self.i16(-1)
        raw = s.encode()
        self.i16(len(raw))
        self._b.write(raw)
        return self

    def bytes_(self, b):
        if b is None:
            return self.i32(-1)
        self.i32(len(b))
        self._b.write(b)
        return self

    def raw(self, b):
        self._b.write(b)
        return self

    def array(self, items, emit):
        self.i32(len(items))
        for it in items:
            emit(self, it)
        return self

    def value(self) -> bytes:
        return self._b.getvalue()


class _Reader:
    def __init__(self, data: bytes):
        self._d = data
        self._o = 0

    def _take(self, n):
        if self._o + n > len(self._d):
            raise ValueError("kafka frame truncated")
        v = self._d[self._o : self._o + n]
        self._o += n
        return v

    def i8(self):
        return struct.unpack(">b", self._take(1))[0]

    def i16(self):
        return struct.unpack(">h", self._take(2))[0]

    def i32(self):
        return struct.unpack(">i", self._take(4))[0]

    def i64(self):
        return struct.unpack(">q", self._take(8))[0]

    def u32(self):
        return struct.unpack(">I", self._take(4))[0]

    def string(self):
        n = self.i16()
        return None if n < 0 else self._take(n).decode()

    def bytes_(self):
        n = self.i32()
        return None if n < 0 else self._take(n)

    def raw(self, n):
        return self._take(n)

    def array(self, parse):
        return [parse(self) for _ in range(self.i32())]

    def remaining(self) -> int:
        return len(self._d) - self._o


# --- MessageSet v0 ----------------------------------------------------------


def encode_message(key: bytes | None, value: bytes | None) -> bytes:
    """One v0 message: crc over magic..value, magic 0, no compression."""
    body = _Writer().i8(0).i8(0).bytes_(key).bytes_(value).value()
    return _Writer().u32(zlib.crc32(body) & 0xFFFFFFFF).raw(body).value()


def encode_message_set(messages, base_offset: int = 0) -> bytes:
    """``messages``: [(key, value)] -> on-wire MessageSet."""
    w = _Writer()
    for i, (k, v) in enumerate(messages):
        m = encode_message(k, v)
        w.i64(base_offset + i).i32(len(m)).raw(m)
    return w.value()


def decode_message_set(data: bytes) -> list:
    """-> [(offset, key, value)]; CRC-checked; a trailing partial
    message (legal in Fetch responses) is dropped per spec."""
    out = []
    r = _Reader(data)
    while r.remaining() >= 12:
        offset = r.i64()
        size = r.i32()
        if r.remaining() < size:
            break  # partial trailing message
        m = _Reader(r.raw(size))
        crc = m.u32()
        body = m._d[m._o :]
        if zlib.crc32(body) & 0xFFFFFFFF != crc:
            raise ValueError("message CRC-32 mismatch")
        magic = m.i8()
        if magic != 0:
            raise NotImplementedError(
                f"message magic {magic} outside the v0 subset"
            )
        attrs = m.i8()
        if attrs & 0x07:
            raise NotImplementedError(
                "compressed message sets outside the v0 subset"
            )
        out.append((offset, m.bytes_(), m.bytes_()))
    return out


# --- consumer embedded protocol (the bytes inside JoinGroup/SyncGroup) -------
#
# The broker never interprets these: the CLIENT-side leader decodes
# every member's subscription metadata, computes the assignment, and
# ships it back opaque (Kafka's "embedded protocol" design). Formats
# per the protocol guide's "consumer protocol" section, version 0.


def encode_consumer_metadata(topics) -> bytes:
    """version:int16=0, topics:[string], user_data:bytes."""
    w = _Writer().i16(0)
    w.array(list(topics), lambda ww, t: ww.string(t))
    return w.bytes_(b"").value()


def decode_consumer_metadata(data: bytes) -> list:
    r = _Reader(data)
    r.i16()  # version
    return r.array(lambda rr: rr.string())


def encode_consumer_assignment(assignment: dict) -> bytes:
    """``{topic: [pids]}`` -> version:int16=0,
    [(topic, [int32])], user_data:bytes."""
    w = _Writer().i16(0)
    w.array(
        sorted(assignment.items()),
        lambda ww, t: ww.string(t[0]).array(
            sorted(t[1]), lambda w2, p: w2.i32(p)
        ),
    )
    return w.bytes_(b"").value()


def decode_consumer_assignment(data: bytes) -> dict:
    if not data:
        return {}
    r = _Reader(data)
    r.i16()  # version
    return dict(
        r.array(
            lambda rr: (
                rr.string(),
                rr.array(lambda r2: r2.i32()),
            )
        )
    )


def range_assign(member_topics: dict, topic_partitions: dict) -> dict:
    """The RANGE assignor (the consumer default the reference relies
    on): per topic, sorted partitions are split into contiguous
    chunks across the subscribed members in member-id order, the
    first ``len % n`` members taking one extra. ->
    {member_id: {topic: [pids]}}."""
    out: dict = {m: {} for m in member_topics}
    topics = sorted(
        {t for ts in member_topics.values() for t in ts}
    )
    for topic in topics:
        members = sorted(
            m for m, ts in member_topics.items() if topic in ts
        )
        pids = sorted(topic_partitions.get(topic, []))
        if not members or not pids:
            continue
        per, extra = divmod(len(pids), len(members))
        start = 0
        for i, m in enumerate(members):
            n = per + (1 if i < extra else 0)
            if n:
                out[m][topic] = pids[start : start + n]
            start += n
    return out


# --- broker -----------------------------------------------------------------


class MiniKafkaBroker:
    """Single-node in-process broker. Topics are created explicitly
    (``create_topic``); unknown topics answer error 3 exactly like a
    broker with auto-create off. Thread-per-connection; appends are
    serialized by a lock (a real broker serializes per-partition the
    same way — the log IS the ordering)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.host = host
        self._lock = threading.Lock()
        # topic -> [partition logs]; log = list[(key, value)]
        self._topics: dict[str, list[list]] = {}
        # topic -> {config_name: config_value} (CreateTopics configs)
        self._configs: dict[str, dict] = {}
        # group -> {(topic, pid): (offset, metadata)} — the committed-
        # offset ledger behind OffsetCommit/OffsetFetch
        self._group_offsets: dict[str, dict] = {}
        # group -> membership state (JoinGroup/SyncGroup/Heartbeat/
        # LeaveGroup); one condition coordinates all blocked joins
        self._groups: dict[str, MiniKafkaBroker._Group] = {}
        self._group_cond = threading.Condition()
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(64)
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._accept_thread = threading.Thread(
            target=self._accept_loop, daemon=True
        )
        self._accept_thread.start()

    @property
    def bootstrap(self) -> str:
        return f"{self.host}:{self.port}"

    def create_topic(
        self, name: str, partitions: int = 4, configs: dict | None = None
    ) -> None:
        with self._lock:
            self._topics.setdefault(
                name, [[] for _ in range(partitions)]
            )
            if configs:
                self._configs[name] = dict(configs)

    def topic_configs(self, name: str) -> dict:
        with self._lock:
            return dict(self._configs.get(name, {}))

    def end_offsets(self, topic: str) -> list:
        with self._lock:
            return [len(p) for p in self._topics[topic]]

    def close(self) -> None:
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass

    # -- plumbing

    def _accept_loop(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(
                target=self._serve, args=(conn,), daemon=True
            ).start()

    def _serve(self, conn: socket.socket):
        try:
            while not self._stop.is_set():
                hdr = _recv_exact(conn, 4)
                if hdr is None:
                    return
                (size,) = struct.unpack(">i", hdr)
                frame = _recv_exact(conn, size)
                if frame is None:
                    return
                resp = self._handle(frame)
                conn.sendall(struct.pack(">i", len(resp)) + resp)
        except (ConnectionError, ValueError, OSError):
            pass
        finally:
            conn.close()

    def _handle(self, frame: bytes) -> bytes:
        r = _Reader(frame)
        api_key = r.i16()
        api_version = r.i16()
        corr = r.i32()
        r.string()  # client_id
        w = _Writer().i32(corr)
        lo_hi = _SUPPORTED.get(api_key)
        if lo_hi is None or not lo_hi[0] <= api_version <= lo_hi[1]:
            # ApiVersions error responses still carry the full body
            if api_key == API_API_VERSIONS:
                w.i16(ERR_UNSUPPORTED_VERSION).i32(0)
            else:
                w.i16(ERR_UNSUPPORTED_VERSION)
            return w.value()
        if api_key == API_API_VERSIONS:
            w.i16(ERR_NONE)
            w.array(
                sorted(_SUPPORTED.items()),
                lambda ww, kv: ww.i16(kv[0]).i16(kv[1][0]).i16(kv[1][1]),
            )
        elif api_key == API_METADATA:
            self._metadata(r, w)
        elif api_key == API_PRODUCE:
            self._produce(r, w, api_version)
        elif api_key == API_FETCH:
            self._fetch(r, w, api_version)
        elif api_key == API_LIST_OFFSETS:
            self._list_offsets(r, w)
        elif api_key == API_OFFSET_COMMIT:
            self._offset_commit(r, w)
        elif api_key == API_OFFSET_FETCH:
            self._offset_fetch(r, w)
        elif api_key == API_FIND_COORDINATOR:
            self._find_coordinator(r, w)
        elif api_key == API_JOIN_GROUP:
            self._join_group(r, w)
        elif api_key == API_SYNC_GROUP:
            self._sync_group(r, w)
        elif api_key == API_HEARTBEAT:
            self._heartbeat(r, w)
        elif api_key == API_LEAVE_GROUP:
            self._leave_group(r, w)
        elif api_key == API_DESCRIBE_GROUPS:
            self._describe_groups(r, w)
        elif api_key == API_LIST_GROUPS:
            self._list_groups(r, w)
        elif api_key == API_CREATE_TOPICS:
            self._create_topics(r, w)
        elif api_key == API_DELETE_TOPICS:
            self._delete_topics(r, w)
        elif api_key == API_DESCRIBE_CONFIGS:
            self._describe_configs(r, w)
        return w.value()

    def _metadata(self, r: _Reader, w: _Writer):
        asked = r.array(lambda rr: rr.string())
        with self._lock:
            names = sorted(self._topics) if not asked else asked
            layout = {
                t: len(self._topics[t]) if t in self._topics else None
                for t in names
            }
        w.array(
            [(0, self.host, self.port)],
            lambda ww, b: ww.i32(b[0]).string(b[1]).i32(b[2]),
        )

        def emit_topic(ww, t):
            nparts = layout[t]
            if nparts is None:
                ww.i16(ERR_UNKNOWN_TOPIC_OR_PARTITION).string(t).i32(0)
                return
            ww.i16(ERR_NONE).string(t)
            ww.array(
                list(range(nparts)),
                lambda w2, p: (
                    w2.i16(ERR_NONE).i32(p).i32(0)
                    .array([0], lambda w3, x: w3.i32(x))
                    .array([0], lambda w3, x: w3.i32(x))
                ),
            )

        w.array(names, emit_topic)

    def _produce(self, r: _Reader, w: _Writer, version: int = 0):
        """v0-2 requests carry MessageSet v0 record data; v3 carries
        RecordBatch v2 (varints + CRC-32C + optional gzip). Responses
        grow per the spec: v1+ appends throttle_time_ms, v2+ adds
        per-partition log_append_time."""
        txn_unsupported = False
        if version >= 3:
            # transactional produce needs InitProducerId state this
            # broker does not keep; answer every partition loudly
            txn_unsupported = r.string() is not None
        r.i16()  # acks (we always ack like acks=1: after append)
        r.i32()  # timeout_ms

        def parse_part(rr):
            p = rr.i32()
            n = rr.i32()
            return (p, rr.raw(n))

        def parse_topic(rr):
            return (rr.string(), rr.array(parse_part))

        topics = r.array(parse_topic)
        results = []
        for topic, parts in topics:
            tres = []
            for pid, msgset in parts:
                if txn_unsupported:
                    tres.append((pid, ERR_UNSUPPORTED_VERSION, -1))
                    continue
                with self._lock:
                    log = self._partition(topic, pid)
                    if log is None:
                        tres.append(
                            (pid, ERR_UNKNOWN_TOPIC_OR_PARTITION, -1)
                        )
                        continue
                    try:
                        if version >= 3:
                            from .kafkarecords import (
                                decode_record_batches,
                            )

                            msgs = decode_record_batches(msgset)
                        else:
                            msgs = decode_message_set(msgset)
                    except ValueError:
                        tres.append((pid, ERR_CORRUPT_MESSAGE, -1))
                        continue
                    base = len(log)
                    log.extend((k, v) for _, k, v in msgs)
                    tres.append((pid, ERR_NONE, base))
            results.append((topic, tres))

        def emit_part(w2, p):
            w2.i32(p[0]).i16(p[1]).i64(p[2])
            if version >= 2:
                w2.i64(-1)  # log_append_time (CreateTime batches)

        w.array(
            results,
            lambda ww, t: ww.string(t[0]).array(t[1], emit_part),
        )
        if version >= 1:
            w.i32(0)  # throttle_time_ms

    def _fetch(self, r: _Reader, w: _Writer, version: int = 0):
        """v0-3 responses carry MessageSet v0 record data; v4 carries
        RecordBatch v2. Request grows per spec (v3 adds request-level
        max_bytes, v4 isolation_level); response v1+ leads with
        throttle_time_ms, v4 adds last_stable_offset + aborted txns."""
        r.i32()  # replica_id
        r.i32()  # max_wait_ms (we answer immediately; client polls)
        r.i32()  # min_bytes
        if version >= 3:
            r.i32()  # request-level max_bytes (partition cap suffices)
        if version >= 4:
            r.i8()   # isolation_level (no transactions: all committed)

        def parse_part(rr):
            return (rr.i32(), rr.i64(), rr.i32())

        def parse_topic(rr):
            return (rr.string(), rr.array(parse_part))

        topics = r.array(parse_topic)
        results = []
        for topic, parts in topics:
            tres = []
            for pid, off, max_bytes in parts:
                with self._lock:
                    log = self._partition(topic, pid)
                    if log is None:
                        tres.append(
                            (pid, ERR_UNKNOWN_TOPIC_OR_PARTITION, -1, b"")
                        )
                        continue
                    hw = len(log)
                    if off < 0 or off > hw:
                        tres.append(
                            (pid, ERR_OFFSET_OUT_OF_RANGE, hw, b"")
                        )
                        continue
                    if version >= 4:
                        recs = self._slice_as_record_batch(
                            log, off, hw, max_bytes
                        )
                        tres.append((pid, ERR_NONE, hw, recs))
                        continue
                    out = _Writer()
                    size = 0
                    i = off
                    while i < hw:
                        k, v = log[i]
                        m = encode_message(k, v)
                        frame = 12 + len(m)
                        # always return at least one message so a
                        # small max_bytes cannot livelock the client
                        if size and size + frame > max_bytes:
                            break
                        out.i64(i).i32(len(m)).raw(m)
                        size += frame
                        i += 1
                    tres.append((pid, ERR_NONE, hw, out.value()))
            results.append((topic, tres))
        if version >= 1:
            w.i32(0)  # throttle_time_ms

        def emit_part(w2, p):
            w2.i32(p[0]).i16(p[1]).i64(p[2])
            if version >= 4:
                w2.i64(p[2])  # last_stable_offset = hw (no txns)
                w2.array([], lambda w3, a: None)  # aborted_transactions
            w2.i32(len(p[3])).raw(p[3])

        w.array(
            results,
            lambda ww, t: ww.string(t[0]).array(t[1], emit_part),
        )

    @staticmethod
    def _slice_as_record_batch(
        log, off: int, hw: int, max_bytes: int
    ) -> bytes:
        """Re-encode log entries [off, …) as ONE RecordBatch v2 under
        the partition max_bytes cap (always at least one record so a
        small cap cannot livelock the client)."""
        from .kafkarecords import encode_record_batch

        msgs = []
        size = 61  # batch header overhead
        i = off
        while i < hw:
            k, v = log[i]
            rec = (len(k) if k else 0) + (len(v) if v else 0) + 12
            if msgs and size + rec > max_bytes:
                break
            msgs.append((k, v))
            size += rec
            i += 1
        return encode_record_batch(msgs, base_offset=off)

    def _list_offsets(self, r: _Reader, w: _Writer):
        r.i32()  # replica_id

        def parse_part(rr):
            return (rr.i32(), rr.i64(), rr.i32())

        def parse_topic(rr):
            return (rr.string(), rr.array(parse_part))

        topics = r.array(parse_topic)
        results = []
        for topic, parts in topics:
            tres = []
            for pid, ts, _max_n in parts:
                with self._lock:
                    log = self._partition(topic, pid)
                if log is None:
                    tres.append((pid, ERR_UNKNOWN_TOPIC_OR_PARTITION, []))
                elif ts == -1:  # latest = log-end offset
                    tres.append((pid, ERR_NONE, [len(log)]))
                elif ts == -2:  # earliest (no truncation here: 0)
                    tres.append((pid, ERR_NONE, [0]))
                else:
                    # v0 timestamp search needs segment metadata this
                    # single-log broker does not keep
                    tres.append((pid, ERR_NONE, [len(log)]))
            results.append((topic, tres))
        w.array(
            results,
            lambda ww, t: ww.string(t[0]).array(
                t[1],
                lambda w2, p: (
                    w2.i32(p[0]).i16(p[1])
                    .array(p[2], lambda w3, o: w3.i64(o))
                ),
            ),
        )

    # -- topic administration (CreateTopics v0 / DeleteTopics v0) ----

    _LEGAL_TOPIC = frozenset(
        "abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789._-"
    )

    @classmethod
    def _topic_name_error(cls, name) -> int:
        if (
            not name
            or name in (".", "..")
            or len(name) > 249
            or not set(name) <= cls._LEGAL_TOPIC
        ):
            return ERR_INVALID_TOPIC
        return ERR_NONE

    def _create_topics(self, r: _Reader, w: _Writer):
        def parse_assignment(rr):
            return (rr.i32(), rr.array(lambda r2: r2.i32()))

        def parse_config(rr):
            return (rr.string(), rr.string())

        def parse_req(rr):
            return (
                rr.string(),                 # topic
                rr.i32(),                    # num_partitions (-1: manual)
                rr.i16(),                    # replication_factor
                rr.array(parse_assignment),  # replica_assignment
                rr.array(parse_config),      # config_entries
            )

        reqs = r.array(parse_req)
        r.i32()  # timeout_ms (creation is synchronous here)
        results = []
        for name, nparts, rf, assignment, configs in reqs:
            err = self._topic_name_error(name)
            if not err:
                if nparts == -1 and assignment:
                    nparts = len(assignment)
                if nparts <= 0:
                    err = ERR_INVALID_PARTITIONS
                elif rf not in (-1, 1):
                    # single-node cluster: RF > 1 is unsatisfiable,
                    # exactly what a real broker answers
                    err = ERR_INVALID_REPLICATION_FACTOR
            if not err:
                with self._lock:
                    if name in self._topics:
                        err = ERR_TOPIC_ALREADY_EXISTS
                    else:
                        self._topics[name] = [[] for _ in range(nparts)]
                        self._configs[name] = {
                            k: v for k, v in configs
                        }
            results.append((name, err))
        w.array(
            results, lambda ww, t: ww.string(t[0]).i16(t[1])
        )

    def _delete_topics(self, r: _Reader, w: _Writer):
        names = r.array(lambda rr: rr.string())
        r.i32()  # timeout_ms
        results = []
        with self._lock:
            for name in names:
                if name in self._topics:
                    del self._topics[name]
                    self._configs.pop(name, None)
                    # committed group offsets for a deleted topic are
                    # removed (real Kafka expires them asynchronously;
                    # synchronous here so recreate flows start clean)
                    for ledger in self._group_offsets.values():
                        for tp in [t for t in ledger if t[0] == name]:
                            del ledger[tp]
                    results.append((name, ERR_NONE))
                else:
                    results.append(
                        (name, ERR_UNKNOWN_TOPIC_OR_PARTITION)
                    )
        w.array(
            results, lambda ww, t: ww.string(t[0]).i16(t[1])
        )

    def _describe_configs(self, r: _Reader, w: _Writer):
        """DescribeConfigs v0, TOPIC resources: the read side of the
        CreateTopics config map — the recreate flow's verify step can
        confirm retention.ms/cleanup.policy over the wire."""
        def parse_resource(rr):
            rtype = rr.i8()
            name = rr.string()
            n = rr.i32()
            names = (
                None if n < 0
                else [rr.string() for _ in range(n)]
            )
            return (rtype, name, names)

        resources = r.array(parse_resource)
        w.i32(0)  # throttle_time_ms

        def emit_resource(ww, res):
            rtype, name, asked = res
            if rtype != 2:  # TOPIC
                ww.i16(ERR_UNSUPPORTED_VERSION).string(
                    "only TOPIC resources"
                ).i8(rtype).string(name).i32(0)
                return
            with self._lock:
                known = name in self._topics
                cfg = dict(self._configs.get(name, {}))
            if not known:
                ww.i16(ERR_UNKNOWN_TOPIC_OR_PARTITION).string(
                    "unknown topic"
                ).i8(rtype).string(name).i32(0)
                return
            entries = sorted(
                (k, v) for k, v in cfg.items()
                if asked is None or k in asked
            )
            ww.i16(ERR_NONE).string(None).i8(rtype).string(name)
            ww.array(
                entries,
                lambda w2, e: (
                    w2.string(e[0]).string(e[1])
                    .i8(0)   # read_only=false
                    .i8(0)   # is_default=false (explicitly set)
                    .i8(0)   # is_sensitive=false
                ),
            )

        w.array(resources, emit_resource)

    # -- consumer groups ----------------------------------------------

    def _find_coordinator(self, r: _Reader, w: _Writer):
        r.string()  # group_id — this single node coordinates all
        w.i16(ERR_NONE).i32(0).string(self.host).i32(self.port)

    # Full membership protocol (JoinGroup 11 / SyncGroup 14 /
    # Heartbeat 12 / LeaveGroup 13, all v0): the coordinator herds
    # Empty -> PreparingRebalance -> AwaitingSync -> Stable exactly
    # like a real broker. JoinGroup BLOCKS its connection thread
    # until the rebalance completes (every live known member has
    # rejoined and a short quiet window admits concurrent new
    # joiners); the first joiner of the new generation is the LEADER
    # and computes the assignment CLIENT-side (the broker is
    # assignment-agnostic, per protocol), distributing it via
    # SyncGroup. Heartbeats during a rebalance answer
    # REBALANCE_IN_PROGRESS, which is what tells a stable member to
    # rejoin. Members whose heartbeat is older than their session
    # timeout stop being expected, so a dead consumer cannot wedge
    # the group.

    _JOIN_GRACE = 0.3  # quiet window for concurrent joiners (s)

    class _Group:
        def __init__(self):
            self.generation = 0
            self.state = "Empty"
            self.protocol_type = None
            self.protocol = None
            self.leader = None
            # member_id -> {"protocols": [(name, meta)],
            #               "session": ms, "seen": monotonic}
            self.members: dict = {}
            self.pending: dict = {}
            self.assignments: dict = {}
            self.last_join = 0.0
            self.seq = 0

    def _group(self, name: str):
        with self._group_cond:
            return self._groups.setdefault(
                name, MiniKafkaBroker._Group()
            )

    def _join_group(self, r: _Reader, w: _Writer):
        import time as _time

        group = r.string()
        session_ms = r.i32()
        member_id = r.string() or ""
        ptype = r.string()
        protocols = r.array(lambda rr: (rr.string(), rr.bytes_()))

        def fail(err):
            w.i16(err).i32(-1).string("").string("").string(
                member_id
            ).array([], lambda *_: None)

        if not protocols:
            return fail(ERR_INCONSISTENT_GROUP_PROTOCOL)
        self._group(group)  # ensure cond exists
        with self._group_cond:
            g = self._groups[group]
            if g.members and g.protocol_type not in (None, ptype):
                return fail(ERR_INCONSISTENT_GROUP_PROTOCOL)
            if member_id and (
                member_id not in g.members
                and member_id not in g.pending
            ):
                return fail(ERR_UNKNOWN_MEMBER_ID)
            if not member_id:
                g.seq += 1
                member_id = f"{group}-member-{g.seq}"
            if g.state != "PreparingRebalance":
                g.state = "PreparingRebalance"
                g.pending = {}
            g.protocol_type = ptype
            now = _time.monotonic()
            g.pending[member_id] = {
                "protocols": protocols,
                "session": session_ms,
                "seen": now,
            }
            g.last_join = now
            self._group_cond.notify_all()
            deadline = now + 30.0
            while g.state == "PreparingRebalance":
                now = _time.monotonic()
                live_known = {
                    m
                    for m, info in g.members.items()
                    if now - info["seen"] < info["session"] / 1000.0
                }
                expected = live_known | set(g.pending)
                if (
                    set(g.pending) >= expected
                    and now - g.last_join
                    >= MiniKafkaBroker._JOIN_GRACE
                ) or now >= deadline:
                    # this thread promotes the generation
                    g.generation += 1
                    g.members = dict(g.pending)
                    g.pending = {}
                    # leader: first joiner of the new generation
                    g.leader = next(iter(g.members))
                    common = None
                    for name, _meta in g.members[g.leader][
                        "protocols"
                    ]:
                        if all(
                            any(n == name for n, _ in m["protocols"])
                            for m in g.members.values()
                        ):
                            common = name
                            break
                    if common is None:
                        g.state = "Empty"
                        self._group_cond.notify_all()
                        return fail(ERR_INCONSISTENT_GROUP_PROTOCOL)
                    g.protocol = common
                    g.assignments = {}
                    g.state = "AwaitingSync"
                    self._group_cond.notify_all()
                    break
                self._group_cond.wait(timeout=0.05)
            is_leader = member_id == g.leader
            members_out = (
                [
                    (
                        m,
                        dict(info["protocols"]).get(g.protocol, b""),
                    )
                    for m, info in g.members.items()
                ]
                if is_leader
                else []
            )
            w.i16(ERR_NONE).i32(g.generation).string(
                g.protocol
            ).string(g.leader).string(member_id)
            w.array(
                members_out,
                lambda ww, m: ww.string(m[0]).bytes_(m[1]),
            )

    def _sync_group(self, r: _Reader, w: _Writer):
        import time as _time

        group = r.string()
        generation = r.i32()
        member_id = r.string() or ""
        assignments = r.array(
            lambda rr: (rr.string(), rr.bytes_())
        )
        self._group(group)
        with self._group_cond:
            g = self._groups[group]
            if member_id not in g.members:
                return w.i16(ERR_UNKNOWN_MEMBER_ID).bytes_(b"")
            if generation != g.generation:
                return w.i16(ERR_ILLEGAL_GENERATION).bytes_(b"")
            if g.state == "PreparingRebalance":
                return w.i16(ERR_REBALANCE_IN_PROGRESS).bytes_(b"")
            g.members[member_id]["seen"] = _time.monotonic()
            if member_id == g.leader and assignments:
                g.assignments = dict(assignments)
                g.state = "Stable"
                self._group_cond.notify_all()
            deadline = _time.monotonic() + 30.0
            while (
                g.state == "AwaitingSync"
                and generation == g.generation
            ):
                if _time.monotonic() >= deadline:
                    return w.i16(ERR_REBALANCE_IN_PROGRESS).bytes_(
                        b""
                    )
                self._group_cond.wait(timeout=0.05)
            if generation != g.generation or g.state not in (
                "Stable",
            ):
                return w.i16(ERR_REBALANCE_IN_PROGRESS).bytes_(b"")
            w.i16(ERR_NONE).bytes_(
                g.assignments.get(member_id, b"")
            )

    def _heartbeat(self, r: _Reader, w: _Writer):
        import time as _time

        group = r.string()
        generation = r.i32()
        member_id = r.string() or ""
        self._group(group)
        with self._group_cond:
            g = self._groups[group]
            if member_id not in g.members:
                return w.i16(ERR_UNKNOWN_MEMBER_ID)
            if generation != g.generation:
                return w.i16(ERR_ILLEGAL_GENERATION)
            g.members[member_id]["seen"] = _time.monotonic()
            if g.state != "Stable":
                return w.i16(ERR_REBALANCE_IN_PROGRESS)
            w.i16(ERR_NONE)

    def _describe_groups(self, r: _Reader, w: _Writer):
        """DescribeGroups v0: state/protocol/member listing — what
        kafka-consumer-groups.sh --describe reads."""
        groups = r.array(lambda rr: rr.string())
        with self._group_cond:
            def emit(ww, name):
                g = self._groups.get(name)
                if g is None or not g.members:
                    ww.i16(ERR_NONE).string(name).string("Dead")
                    ww.string("").string("")
                    ww.array([], lambda *_: None)
                    return
                ww.i16(ERR_NONE).string(name).string(g.state)
                ww.string(g.protocol_type or "").string(
                    g.protocol or ""
                )
                ww.array(
                    sorted(g.members.items()),
                    lambda w2, m: (
                        w2.string(m[0])       # member_id
                        .string("")            # client_id
                        .string(self.host)     # client_host
                        .bytes_(
                            dict(m[1]["protocols"]).get(
                                g.protocol, b""
                            )
                        )
                        .bytes_(
                            g.assignments.get(m[0], b"")
                        )
                    ),
                )

            w.array(groups, emit)

    def _list_groups(self, r: _Reader, w: _Writer):
        """ListGroups v0: every group with live members."""
        with self._group_cond:
            live = sorted(
                (name, g.protocol_type or "")
                for name, g in self._groups.items()
                if g.members
            )
        w.i16(ERR_NONE).array(
            live, lambda ww, t: ww.string(t[0]).string(t[1])
        )

    def _leave_group(self, r: _Reader, w: _Writer):
        group = r.string()
        member_id = r.string() or ""
        self._group(group)
        with self._group_cond:
            g = self._groups[group]
            if member_id not in g.members and (
                member_id not in g.pending
            ):
                return w.i16(ERR_UNKNOWN_MEMBER_ID)
            g.members.pop(member_id, None)
            g.pending.pop(member_id, None)
            if g.members or g.pending:
                # surviving members rebalance (discovered via
                # REBALANCE_IN_PROGRESS on their next heartbeat)
                g.state = "PreparingRebalance"
                g.pending = {}
            else:
                g.state = "Empty"
                g.generation += 1
                g.leader = None
            self._group_cond.notify_all()
            w.i16(ERR_NONE)

    def _offset_commit(self, r: _Reader, w: _Writer):
        group = r.string()

        def parse_part(rr):
            return (rr.i32(), rr.i64(), rr.string())

        def parse_topic(rr):
            return (rr.string(), rr.array(parse_part))

        topics = r.array(parse_topic)
        results = []
        with self._lock:
            ledger = self._group_offsets.setdefault(group, {})
            for topic, parts in topics:
                tres = []
                for pid, off, meta in parts:
                    if self._partition(topic, pid) is None:
                        tres.append(
                            (pid, ERR_UNKNOWN_TOPIC_OR_PARTITION)
                        )
                        continue
                    ledger[(topic, pid)] = (off, meta or "")
                    tres.append((pid, ERR_NONE))
                results.append((topic, tres))
        w.array(
            results,
            lambda ww, t: ww.string(t[0]).array(
                t[1], lambda w2, p: w2.i32(p[0]).i16(p[1])
            ),
        )

    def _offset_fetch(self, r: _Reader, w: _Writer):
        group = r.string()

        def parse_topic(rr):
            return (rr.string(), rr.array(lambda r2: r2.i32()))

        topics = r.array(parse_topic)
        results = []
        with self._lock:
            ledger = self._group_offsets.get(group, {})
            for topic, pids in topics:
                tres = []
                for pid in pids:
                    if self._partition(topic, pid) is None:
                        tres.append(
                            (pid, -1, "", ERR_UNKNOWN_TOPIC_OR_PARTITION)
                        )
                        continue
                    off, meta = ledger.get((topic, pid), (-1, ""))
                    tres.append((pid, off, meta, ERR_NONE))
                results.append((topic, tres))
        w.array(
            results,
            lambda ww, t: ww.string(t[0]).array(
                t[1],
                lambda w2, p: (
                    w2.i32(p[0]).i64(p[1]).string(p[2]).i16(p[3])
                ),
            ),
        )

    def _partition(self, topic: str, pid: int):
        parts = self._topics.get(topic)
        if parts is None or not 0 <= pid < len(parts):
            return None
        return parts[pid]


def _recv_exact(conn: socket.socket, n: int):
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


# --- client -----------------------------------------------------------------


class MiniKafkaClient:
    """Minimal protocol client: one socket, correlated request/
    response, v0 encodings mirroring the broker above (both sides are
    independently pinned against hand-assembled spec bytes in
    tests/test_minikafka.py)."""

    def __init__(self, bootstrap: str, client_id: str = "spark-graft"):
        host, port = bootstrap.rsplit(":", 1)
        self._sock = socket.create_connection((host, int(port)), timeout=30)
        self._client_id = client_id
        self._corr = 0
        self._lock = threading.Lock()

    def close(self):
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _request(self, api_key: int, body: bytes, version: int = 0) -> _Reader:
        with self._lock:
            self._corr += 1
            corr = self._corr
            hdr = (
                _Writer()
                .i16(api_key)
                .i16(version)
                .i32(corr)
                .string(self._client_id)
                .value()
            )
            frame = hdr + body
            self._sock.sendall(struct.pack(">i", len(frame)) + frame)
            hdr4 = _recv_exact(self._sock, 4)
            if hdr4 is None:
                raise ConnectionError("broker closed connection")
            (size,) = struct.unpack(">i", hdr4)
            payload = _recv_exact(self._sock, size)
        r = _Reader(payload)
        got = r.i32()
        if got != corr:
            raise ValueError(f"correlation id {got} != {corr}")
        return r

    def api_versions(self) -> dict:
        r = self._request(API_API_VERSIONS, b"")
        err = r.i16()
        if err:
            raise ValueError(f"ApiVersions error {err}")
        return {
            k: (lo, hi)
            for k, lo, hi in r.array(
                lambda rr: (rr.i16(), rr.i16(), rr.i16())
            )
        }

    def metadata(self, topics=()) -> dict:
        body = _Writer().array(
            list(topics), lambda ww, t: ww.string(t)
        ).value()
        r = self._request(API_METADATA, body)
        brokers = r.array(
            lambda rr: (rr.i32(), rr.string(), rr.i32())
        )

        def parse_topic(rr):
            err = rr.i16()
            name = rr.string()
            parts = rr.array(
                lambda r2: (
                    r2.i16(),
                    r2.i32(),
                    r2.i32(),
                    r2.array(lambda r3: r3.i32()),
                    r2.array(lambda r3: r3.i32()),
                )
            )
            return (err, name, parts)

        tops = r.array(parse_topic)
        out = {}
        for err, name, parts in tops:
            if err:
                raise ValueError(f"metadata error {err} for topic {name}")
            out[name] = sorted(p[1] for p in parts)
        return {"brokers": brokers, "topics": out}

    def produce(self, topic: str, partition: int, messages) -> int:
        """``messages``: [(key|None, value)] bytes. -> base offset."""
        msgset = encode_message_set(messages)
        body = (
            _Writer()
            .i16(1)  # acks
            .i32(30000)
            .array(
                [(topic, [(partition, msgset)])],
                lambda ww, t: ww.string(t[0]).array(
                    t[1],
                    lambda w2, p: w2.i32(p[0]).i32(len(p[1])).raw(p[1]),
                ),
            )
            .value()
        )
        r = self._request(API_PRODUCE, body)

        def parse_topic(rr):
            return (
                rr.string(),
                rr.array(lambda r2: (r2.i32(), r2.i16(), r2.i64())),
            )

        [(rt, [(rp, err, base)])] = r.array(parse_topic)
        if err:
            raise ValueError(
                f"produce error {err} on {rt}[{rp}]"
            )
        return base

    def produce_v2(
        self, topic: str, partition: int, messages,
        compression: str = "none",
    ) -> int:
        """Produce v3 with a RecordBatch v2 payload (``messages``:
        [(key|None, value)]; ``compression``: none|gzip|snappy). ->
        base offset. The modern wire shape every 2020s producer
        speaks (snappy in the JVM clients' xerial framing)."""
        from .kafkarecords import encode_record_batch

        batch = encode_record_batch(messages, compression=compression)
        body = (
            _Writer()
            .string(None)  # transactional_id (non-transactional)
            .i16(1)        # acks
            .i32(30000)
            .array(
                [(topic, [(partition, batch)])],
                lambda ww, t: ww.string(t[0]).array(
                    t[1],
                    lambda w2, p: w2.i32(p[0]).i32(len(p[1])).raw(p[1]),
                ),
            )
            .value()
        )
        r = self._request(API_PRODUCE, body, version=3)

        def parse_topic(rr):
            return (
                rr.string(),
                rr.array(
                    lambda r2: (r2.i32(), r2.i16(), r2.i64(), r2.i64())
                ),
            )

        [(rt, [(rp, err, base, _lat)])] = r.array(parse_topic)
        r.i32()  # throttle_time_ms
        if err:
            raise ValueError(f"produce(v3) error {err} on {rt}[{rp}]")
        return base

    def fetch_records(
        self, topic: str, partition: int, offset: int,
        max_bytes: int = 1 << 20,
    ):
        """Fetch v4: -> (high_watermark, [(offset, key, value)])
        decoded from RecordBatch v2 data."""
        from .kafkarecords import decode_record_batches

        body = (
            _Writer()
            .i32(-1)            # replica_id
            .i32(0)             # max_wait_ms
            .i32(0)             # min_bytes
            .i32(max_bytes)     # request max_bytes (v3+)
            .i8(0)              # isolation_level read_uncommitted (v4+)
            .array(
                [(topic, [(partition, offset, max_bytes)])],
                lambda ww, t: ww.string(t[0]).array(
                    t[1],
                    lambda w2, p: w2.i32(p[0]).i64(p[1]).i32(p[2]),
                ),
            )
            .value()
        )
        r = self._request(API_FETCH, body, version=4)
        r.i32()  # throttle_time_ms

        def parse_part(rr):
            pid = rr.i32()
            err = rr.i16()
            hw = rr.i64()
            rr.i64()  # last_stable_offset
            rr.array(lambda r2: (r2.i64(), r2.i64()))  # aborted txns
            n = rr.i32()
            return (pid, err, hw, rr.raw(n))

        def parse_topic(rr):
            return (rr.string(), rr.array(parse_part))

        [(_, [(_, err, hw, recs)])] = r.array(parse_topic)
        if err:
            raise ValueError(f"fetch(v4) error {err}")
        return hw, decode_record_batches(recs)

    def fetch(
        self, topic: str, partition: int, offset: int,
        max_bytes: int = 1 << 20,
    ):
        """-> (high_watermark, [(offset, key, value)])."""
        body = (
            _Writer()
            .i32(-1)
            .i32(0)
            .i32(0)
            .array(
                [(topic, [(partition, offset, max_bytes)])],
                lambda ww, t: ww.string(t[0]).array(
                    t[1],
                    lambda w2, p: w2.i32(p[0]).i64(p[1]).i32(p[2]),
                ),
            )
            .value()
        )
        r = self._request(API_FETCH, body)

        def parse_part(rr):
            pid = rr.i32()
            err = rr.i16()
            hw = rr.i64()
            n = rr.i32()
            return (pid, err, hw, rr.raw(n))

        def parse_topic(rr):
            return (rr.string(), rr.array(parse_part))

        [(_, [(_, err, hw, msgset)])] = r.array(parse_topic)
        if err:
            raise ValueError(f"fetch error {err}")
        return hw, decode_message_set(msgset)

    def offsets(self, topic: str, partition: int, ts: int) -> int:
        """ts -1 => log-end, -2 => earliest."""
        body = (
            _Writer()
            .i32(-1)
            .array(
                [(topic, [(partition, ts, 1)])],
                lambda ww, t: ww.string(t[0]).array(
                    t[1],
                    lambda w2, p: w2.i32(p[0]).i64(p[1]).i32(p[2]),
                ),
            )
            .value()
        )
        r = self._request(API_LIST_OFFSETS, body)

        def parse_topic(rr):
            return (
                rr.string(),
                rr.array(
                    lambda r2: (
                        r2.i32(),
                        r2.i16(),
                        r2.array(lambda r3: r3.i64()),
                    )
                ),
            )

        [(_, [(_, err, offs)])] = r.array(parse_topic)
        if err:
            raise ValueError(f"list_offsets error {err}")
        return offs[0]

    # -- topic administration -----------------------------------------

    def create_topics(self, topics) -> dict:
        """``topics``: [(name, num_partitions, replication_factor,
        configs_dict)] -> {name: error_code} (0 = created). Configs
        ride the wire as CreateTopics config_entries (e.g.
        retention.ms, cleanup.policy), reference setup_kafka_topics
        parity."""
        body = (
            _Writer()
            .array(
                list(topics),
                lambda ww, t: (
                    ww.string(t[0]).i32(t[1]).i16(t[2])
                    .array([], lambda w2, a: None)  # no manual assignment
                    .array(
                        sorted((t[3] or {}).items()),
                        lambda w2, c: w2.string(c[0]).string(c[1]),
                    )
                ),
            )
            .i32(30000)
            .value()
        )
        r = self._request(API_CREATE_TOPICS, body)
        return dict(r.array(lambda rr: (rr.string(), rr.i16())))

    def delete_topics(self, names) -> dict:
        """-> {name: error_code} (0 = deleted, 3 = unknown)."""
        body = (
            _Writer()
            .array(list(names), lambda ww, n: ww.string(n))
            .i32(30000)
            .value()
        )
        r = self._request(API_DELETE_TOPICS, body)
        return dict(r.array(lambda rr: (rr.string(), rr.i16())))

    def describe_configs(self, topic: str) -> dict:
        """-> {config_name: value} for a topic (DescribeConfigs v0)."""
        body = (
            _Writer()
            .array(
                [topic],
                lambda ww, t: ww.i8(2).string(t).i32(-1),  # all configs
            )
            .value()
        )
        r = self._request(API_DESCRIBE_CONFIGS, body)
        r.i32()  # throttle_time_ms

        def parse_resource(rr):
            err = rr.i16()
            msg = rr.string()
            rr.i8()  # resource_type
            name = rr.string()
            entries = rr.array(
                lambda r2: (
                    r2.string(), r2.string(),
                    r2.i8(), r2.i8(), r2.i8(),
                )
            )
            return (err, msg, name, entries)

        [(err, msg, _name, entries)] = r.array(parse_resource)
        if err:
            raise ValueError(
                f"describe_configs error {err} on {topic!r}: {msg}"
            )
        return {k: v for k, v, *_ in entries}

    # -- consumer groups ------------------------------------------------

    def find_coordinator(self, group: str) -> tuple:
        """-> (node_id, host, port) of the group coordinator."""
        r = self._request(
            API_FIND_COORDINATOR, _Writer().string(group).value()
        )
        err = r.i16()
        if err:
            raise ValueError(f"find_coordinator error {err}")
        return (r.i32(), r.string(), r.i32())

    def offset_commit(self, group: str, offsets: dict) -> None:
        """``offsets``: {(topic, pid): offset} — commit the group's
        consumption positions (metadata left empty)."""
        by_topic: dict[str, list] = {}
        for (topic, pid), off in sorted(offsets.items()):
            by_topic.setdefault(topic, []).append((pid, off))
        body = (
            _Writer()
            .string(group)
            .array(
                sorted(by_topic.items()),
                lambda ww, t: ww.string(t[0]).array(
                    t[1],
                    lambda w2, p: w2.i32(p[0]).i64(p[1]).string(""),
                ),
            )
            .value()
        )
        r = self._request(API_OFFSET_COMMIT, body)
        for topic, parts in r.array(
            lambda rr: (
                rr.string(),
                rr.array(lambda r2: (r2.i32(), r2.i16())),
            )
        ):
            for pid, err in parts:
                if err:
                    raise ValueError(
                        f"offset_commit error {err} on {topic}[{pid}]"
                    )

    def offset_fetch(self, group: str, parts) -> dict:
        """``parts``: [(topic, pid)] -> {(topic, pid): offset}
        (-1 = nothing committed)."""
        by_topic: dict[str, list] = {}
        for topic, pid in sorted(parts):
            by_topic.setdefault(topic, []).append(pid)
        body = (
            _Writer()
            .string(group)
            .array(
                sorted(by_topic.items()),
                lambda ww, t: ww.string(t[0]).array(
                    t[1], lambda w2, p: w2.i32(p)
                ),
            )
            .value()
        )
        r = self._request(API_OFFSET_FETCH, body)
        out = {}
        for topic, tparts in r.array(
            lambda rr: (
                rr.string(),
                rr.array(
                    lambda r2: (
                        r2.i32(), r2.i64(), r2.string(), r2.i16()
                    )
                ),
            )
        ):
            for pid, off, _meta, err in tparts:
                if err:
                    raise ValueError(
                        f"offset_fetch error {err} on {topic}[{pid}]"
                    )
                out[(topic, pid)] = off
        return out

    # -- group membership (the full rebalance protocol) ---------------

    def join_group(
        self, group: str, topics, member_id: str = "",
        session_timeout_ms: int = 10000,
        protocol: str = "range",
    ) -> dict:
        """JoinGroup v0 with the consumer embedded protocol
        (metadata = version + subscribed topics). Blocks until the
        coordinator completes the rebalance. -> {"generation",
        "protocol", "leader", "member_id", "is_leader",
        "members": {member_id: [topics]}} (members only for the
        leader, per protocol)."""
        body = (
            _Writer()
            .string(group)
            .i32(session_timeout_ms)
            .string(member_id)
            .string("consumer")
            .array(
                [(protocol, encode_consumer_metadata(topics))],
                lambda ww, p: ww.string(p[0]).bytes_(p[1]),
            )
            .value()
        )
        r = self._request(API_JOIN_GROUP, body)
        err = r.i16()
        generation = r.i32()
        proto = r.string()
        leader = r.string()
        me = r.string()
        members = r.array(
            lambda rr: (rr.string(), rr.bytes_())
        )
        if err:
            raise ValueError(f"join_group error {err}")
        return {
            "generation": generation,
            "protocol": proto,
            "leader": leader,
            "member_id": me,
            "is_leader": me == leader,
            "members": {
                m: decode_consumer_metadata(meta)
                for m, meta in members
            },
        }

    def sync_group(
        self, group: str, generation: int, member_id: str,
        assignments: dict | None = None,
    ) -> dict:
        """SyncGroup v0. The leader passes ``assignments``
        ({member_id: {topic: [pids]}}); followers pass None. Returns
        THIS member's assignment as {topic: [pids]}."""
        enc = [
            (m, encode_consumer_assignment(a))
            for m, a in sorted((assignments or {}).items())
        ]
        body = (
            _Writer()
            .string(group)
            .i32(generation)
            .string(member_id)
            .array(
                enc, lambda ww, p: ww.string(p[0]).bytes_(p[1])
            )
            .value()
        )
        r = self._request(API_SYNC_GROUP, body)
        err = r.i16()
        blob = r.bytes_()
        if err:
            raise ValueError(f"sync_group error {err}")
        return decode_consumer_assignment(blob or b"")

    def heartbeat(
        self, group: str, generation: int, member_id: str
    ) -> int:
        """Heartbeat v0 -> error code (0 = stable; 27 =
        REBALANCE_IN_PROGRESS means rejoin; raises on the rest)."""
        body = (
            _Writer()
            .string(group)
            .i32(generation)
            .string(member_id)
            .value()
        )
        err = self._request(API_HEARTBEAT, body).i16()
        if err not in (ERR_NONE, ERR_REBALANCE_IN_PROGRESS):
            raise ValueError(f"heartbeat error {err}")
        return err

    def leave_group(self, group: str, member_id: str) -> None:
        body = _Writer().string(group).string(member_id).value()
        err = self._request(API_LEAVE_GROUP, body).i16()
        if err:
            raise ValueError(f"leave_group error {err}")

    def describe_groups(self, groups) -> dict:
        """DescribeGroups v0 -> {group: {"state", "protocol_type",
        "protocol", "members": {member_id: {"metadata",
        "assignment"}}}}."""
        body = _Writer().array(
            list(groups), lambda ww, g: ww.string(g)
        ).value()
        r = self._request(API_DESCRIBE_GROUPS, body)
        out = {}
        for _ in range(r.i32()):
            err = r.i16()
            name = r.string()
            state = r.string()
            ptype = r.string()
            proto = r.string()
            members = {}
            for _ in range(r.i32()):
                mid = r.string()
                r.string()  # client_id
                r.string()  # client_host
                meta = r.bytes_()
                assign = r.bytes_()
                members[mid] = {
                    "metadata": decode_consumer_metadata(meta)
                    if meta
                    else [],
                    "assignment": decode_consumer_assignment(
                        assign or b""
                    ),
                }
            if err:
                raise ValueError(
                    f"describe_groups error {err} on {name!r}"
                )
            out[name] = {
                "state": state,
                "protocol_type": ptype,
                "protocol": proto,
                "members": members,
            }
        return out

    def list_groups(self) -> dict:
        """ListGroups v0 -> {group: protocol_type}."""
        r = self._request(API_LIST_GROUPS, b"")
        err = r.i16()
        if err:
            raise ValueError(f"list_groups error {err}")
        return dict(
            r.array(lambda rr: (rr.string(), rr.string()))
        )

    def fetch_range(
        self, topic: str, partition: int, start: int, end: int,
        fmt: str = "v0",
    ) -> Iterator:
        """Yield (offset, key, value) for exactly [start, end) —
        offset-addressed random access, the reader's scale property.
        ``fmt``: v0 (MessageSet) or v2 (Fetch v4 RecordBatch)."""
        fetch = self.fetch_records if fmt == "v2" else self.fetch
        off = start
        while off < end:
            _, msgs = fetch(topic, partition, off)
            if not msgs:
                raise ValueError(
                    f"fetch at {off} returned no data below end {end}"
                )
            for o, k, v in msgs:
                if o >= end:
                    return
                if o >= off:
                    yield (o, k, v)
            off = msgs[-1][0] + 1
