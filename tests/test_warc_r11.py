"""Round-11 WARC work: the whole-file-gzip decompress-and-reshard
pre-pass (reshard_warc_gz) — closing the module's documented serial
residual (VERDICT r10 'What's missing' #2)."""

import gzip
import os

import pytest

from hive_scd_spark.sources.warc import (
    _gz_stream_chunks,
    _iter_raw_warc_records,
    read_warc,
    reshard_warc_gz,
    write_warc_records,
)


def _mk_records(n):
    return [
        {
            "record_id": f"<urn:rs:{i}>",
            "warc_type": "response",
            "target_uri": f"https://rs.com/{i}",
            "warc_date": "2024-01-01T00:00:00Z",
            "content_type": "application/http; msgtype=response",
            "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
            + f"body {i} {'y' * (i % 400)}".encode(),
        }
        for i in range(n)
    ]


def _write(tmpdir, name, data):
    p = os.path.join(str(tmpdir), name)
    with open(p, "wb") as f:
        f.write(data)
    return p


def test_raw_record_framing_is_byte_identical():
    """The framing iterator re-emits records byte-for-byte (no
    parse/serialize round trip) with O(record) buffering."""
    recs = _mk_records(20)
    data = write_warc_records(recs)
    got = list(_iter_raw_warc_records(iter([data[:97], data[97:10000], data[10000:]])))
    assert b"".join(got) == data
    assert len(got) == 20
    for blob in got:
        assert blob.startswith(b"WARC/1.0\r\n") and blob.endswith(b"\r\n\r\n")


def test_raw_record_framing_rejects_truncation_and_garbage():
    recs = _mk_records(3)
    data = write_warc_records(recs)
    with pytest.raises(ValueError, match="Truncated WARC"):
        list(_iter_raw_warc_records(iter([data[:-10]])))
    with pytest.raises(ValueError, match="Malformed WARC"):
        list(_iter_raw_warc_records(iter([b"HTTP/1.1 200 OK\r\n\r\n"])))


def test_gz_stream_chunks_handles_whole_file_and_members():
    class _F:
        def __init__(self, data):
            self.data = data

        def read_at(self, n, off):
            return self.data[off : off + n]

    payload = write_warc_records(_mk_records(5))
    whole = gzip.compress(payload)
    members = b"".join(
        gzip.compress(write_warc_records([r])) for r in _mk_records(5)
    )
    assert b"".join(_gz_stream_chunks(_F(whole), len(whole))) == payload
    assert b"".join(_gz_stream_chunks(_F(members), len(members))) == payload


def test_reshard_monolith_then_split_read_matches_direct_read(spark, tmp_path):
    """The pre-pass contract: reshard a whole-file-gzip archive, read
    the output with small byte-range splits, and every column —
    including the parsed HTTP envelope — matches the direct
    (file-granular) read of the original archive."""
    recs = _mk_records(80)
    src = _write(
        tmp_path, "mono.warc.gz", gzip.compress(write_warc_records(recs))
    )
    dst = os.path.join(str(tmp_path), "resharded")
    manifest = reshard_warc_gz(spark, src, dst).collect()
    assert len(manifest) == 1
    assert manifest[0].n_records == 80 and manifest[0].bytes_out > 0

    cols = [
        "record_id", "warc_type", "target_uri", "http_status",
        "content_length", "payload",
    ]
    direct = sorted(map(tuple, read_warc(spark, src).select(cols).collect()))
    split = sorted(
        map(
            tuple,
            read_warc(spark, dst, split_bytes=2048).select(cols).collect(),
        )
    )
    assert split == direct and len(direct) == 80
    # the resharded file genuinely splits: more than one task
    assert read_warc(spark, dst, split_bytes=2048).rdd.getNumPartitions() > 1


def test_reshard_normalizes_mixed_layouts(spark, tmp_path):
    """One pass canonicalizes a mixed drop: uncompressed .warc,
    per-record-gzip .warc.gz, and whole-file-gzip inputs all come out
    as splittable per-record-member files with identical records."""
    recs = _mk_records(30)
    d = tmp_path / "mixed"
    d.mkdir()
    _write(d, "a.warc", write_warc_records(recs[:10]))
    _write(
        d,
        "b.warc.gz",
        b"".join(gzip.compress(write_warc_records([r])) for r in recs[10:20]),
    )
    _write(d, "c.warc.gz", gzip.compress(write_warc_records(recs[20:])))
    dst = os.path.join(str(tmp_path), "norm")
    m = {r.src.rsplit("/", 1)[-1]: r.n_records for r in reshard_warc_gz(spark, str(d), dst).collect()}
    assert m == {"a.warc": 10, "b.warc.gz": 10, "c.warc.gz": 10}
    out = {r.record_id for r in read_warc(spark, dst, split_bytes=2048).collect()}
    assert out == {f"<urn:rs:{i}>" for i in range(30)}


def test_reshard_output_is_deterministic(spark, tmp_path):
    """mtime=0 per member: two reshard runs of the same archive emit
    byte-identical output (the md5-determinism convention)."""
    recs = _mk_records(12)
    src = _write(
        tmp_path, "det.warc.gz", gzip.compress(write_warc_records(recs))
    )
    d1 = os.path.join(str(tmp_path), "r1")
    d2 = os.path.join(str(tmp_path), "r2")
    reshard_warc_gz(spark, src, d1).collect()
    reshard_warc_gz(spark, src, d2).collect()
    b1 = open(os.path.join(d1, "det.warc.gz"), "rb").read()
    b2 = open(os.path.join(d2, "det.warc.gz"), "rb").read()
    assert b1 == b2 and len(b1) > 0


def test_raw_record_framing_chunking_invariance():
    """The framing iterator's output must be independent of HOW the
    decompressed stream is chunked — random cut points, single-byte
    dribbles, and one-shot delivery all frame identically."""
    import random

    recs = _mk_records(30)
    data = write_warc_records(recs)
    rng = random.Random(7)
    for _trial in range(20):
        k = rng.randint(1, 9)
        cuts = sorted(rng.sample(range(1, len(data)), k=k))
        chunks = [data[a:b] for a, b in zip([0] + cuts, cuts + [len(data)])]
        got = list(_iter_raw_warc_records(iter(chunks)))
        assert b"".join(got) == data and len(got) == 30
    # pathological: 1-byte chunks over a small prefix of records
    small = write_warc_records(recs[:3])
    got = list(_iter_raw_warc_records(bytes([b]) for b in small))
    assert b"".join(got) == small and len(got) == 3


def test_reshard_rejects_trailing_garbage_loudly(spark, tmp_path):
    """An archive with non-gzip trailing bytes must fail the pre-pass
    loudly (strict normalization), not silently truncate."""
    data = gzip.compress(write_warc_records(_mk_records(4))) + b"#garbage"
    src = _write(tmp_path, "trail.warc.gz", data)
    with pytest.raises(Exception, match="Error|error|invalid|Malformed"):
        reshard_warc_gz(spark, src, os.path.join(str(tmp_path), "g")).collect()
