"""Archive codec tests: two-sided differential against the stdlib
zipfile/tarfile modules (foreign implementations — archives we write
must parse there, archives they write must parse here), CRC/checksum
tamper detection, and the Spark end-to-end path."""

import io
import random
import tarfile
import zipfile

import pytest

from kafka_spark_streaming_app_spark.operators.archivecodec import (
    read_tar,
    read_zip,
    write_tar,
    write_zip,
)


def _members(rng, trial):
    out = []
    for i in range(rng.randint(0, 10)):
        name = f"dir{i % 3}/doc_{trial}_{i}.txt"
        if rng.random() < 0.3:
            data = bytes([rng.randrange(40)]) * rng.randint(0, 3000)
        else:
            data = bytes(rng.randrange(256) for _ in range(rng.randint(0, 700)))
        out.append((name, data))
    return out


def test_zip_ours_to_stdlib_and_back():
    rng = random.Random(17)
    for trial in range(25):
        members = _members(rng, trial)
        z = write_zip(members, deflate=trial % 2 == 0)
        zf = zipfile.ZipFile(io.BytesIO(z))
        assert zf.testzip() is None
        assert [(i.filename, zf.read(i)) for i in zf.infolist()] == members
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf2:
            for n, d in members:
                zf2.writestr(n, d)
        assert read_zip(buf.getvalue()) == members
        assert read_zip(z) == members


def test_tar_ours_to_stdlib_and_back():
    rng = random.Random(23)
    for trial in range(25):
        members = _members(rng, trial)
        t = write_tar(members)
        tf = tarfile.open(fileobj=io.BytesIO(t))
        assert [
            (m.name, tf.extractfile(m).read()) for m in tf.getmembers()
        ] == members
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf2:
            for n, d in members:
                info = tarfile.TarInfo(n)
                info.size = len(d)
                tf2.addfile(info, io.BytesIO(d))
        assert read_tar(buf.getvalue()) == members
        assert read_tar(t) == members


def test_zip_crc_tamper_detected():
    z = bytearray(write_zip([("a.txt", bytes(range(256)) * 4)], deflate=False))
    z[30 + len("a.txt") + 100] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-32"):
        read_zip(bytes(z))
    with pytest.raises(ValueError, match="not a ZIP"):
        read_zip(b"PK\x03\x04" + bytes(40))  # no central directory


def test_tar_checksum_tamper_detected():
    t = bytearray(write_tar([("a.txt", b"payload")]))
    t[0] ^= 0x01  # corrupt the name inside the checksummed header
    with pytest.raises(ValueError, match="checksum"):
        read_tar(bytes(t))


def test_zip_rejects_unknown_method():
    z = bytearray(write_zip([("a", bytes(1000))]))  # deflates
    # central directory method field: find PK\x01\x02 and patch method
    at = bytes(z).find(b"PK\x01\x02")
    z[at + 10] = 99
    with pytest.raises(NotImplementedError, match="method"):
        read_zip(bytes(z))


def test_synthesized_archives_extract(spark, sf_smoke):
    from kafka_spark_streaming_app_spark.operators.multimodal import (
        _archive_member,
        archive_member_stats,
        synthesize_archive_media,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(12)
    rows = archive_member_stats(synthesize_archive_media(docs)).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert len(by_media) == 12
    for d, rs in by_media.items():
        assert len(rs) == d % 4 + 1
        for r in sorted(rs, key=lambda r: r["member"]):
            raw = _archive_member(d, r["member"])
            assert r["kind"] == ("zip" if d % 2 == 0 else "tar")
            assert r["name"] == f"part-{r['member']}.bin"
            assert r["n_bytes"] == len(raw)
            assert r["byte_sum"] == sum(raw)
