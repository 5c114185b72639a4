"""WARC source (sources/warc.py): framing, splits, gzip, HTTP parse."""

import gzip
import os

import pytest

from hive_scd_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc_records,
)


def _mk_records(n, body=lambda i: f"body of record {i}".encode()):
    return [
        {
            "record_id": f"<urn:test:{i}>",
            "warc_type": "response",
            "target_uri": f"https://ex.com/{i}",
            "warc_date": "2024-01-01T00:00:00Z",
            "content_type": "application/http; msgtype=response",
            "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
            + body(i),
        }
        for i in range(n)
    ]


def test_roundtrip_bytes():
    recs = _mk_records(5)
    out = parse_warc_bytes(write_warc_records(recs))
    assert len(out) == 5
    assert out[3]["record_id"] == "<urn:test:3>"
    assert out[3]["http_status"] == 200
    assert out[3]["http_content_type"] == "text/plain"
    assert out[3]["payload"] == b"body of record 3"
    assert out[3]["target_uri"] == "https://ex.com/3"


def test_non_response_record_keeps_raw_payload():
    recs = [
        {
            "record_id": "<urn:meta:1>",
            "warc_type": "warcinfo",
            "content_type": "application/warc-fields",
            "payload": b"software: test\r\n",
        }
    ]
    out = parse_warc_bytes(write_warc_records(recs))
    assert out[0]["warc_type"] == "warcinfo"
    assert out[0]["http_status"] is None
    assert out[0]["payload"] == b"software: test\r\n"


def test_malformed_raises():
    with pytest.raises(ValueError, match="Malformed"):
        parse_warc_bytes(b"WARC/1.0\r\nContent-Length: 5\r\n\r\nab")


def _write(tmpdir, name, data):
    p = os.path.join(str(tmpdir), name)
    with open(p, "wb") as f:
        f.write(data)
    return p


def test_read_warc_exactly_once_across_splits(spark, tmp_path):
    # 120 records, tiny split_bytes: many byte-range splits, every
    # record decoded exactly once whatever split its header lands in
    recs = _mk_records(120, body=lambda i: (f"x{i} " * (7 + i % 13)).encode())
    p = _write(tmp_path, "a.warc", write_warc_records(recs))
    for split_bytes in (257, 1024, 1 << 20):
        got = read_warc(spark, p, split_bytes=split_bytes).collect()
        ids = sorted(r.record_id for r in got)
        assert ids == sorted(f"<urn:test:{i}>" for i in range(120)), split_bytes
    by_id = {r.record_id: r for r in got}
    assert by_id["<urn:test:7>"].payload == ("x7 " * 14).encode()
    assert by_id["<urn:test:7>"].http_status == 200


def test_read_warc_adversarial_embedded_warc_bytes(spark, tmp_path):
    # a payload QUOTING a WARC file: the embedded fake header (with a
    # Content-Length whose chain does NOT land on a terminator followed
    # by a version line) must not be surfaced as a record
    fake = (
        b"an html page quoting a warc file:\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:fake:1>\r\n"
        b"Content-Length: 9\r\n\r\nfake body\r\n\r\n"
        b"and some trailing prose so the chain check fails"
    )
    recs = _mk_records(3) + [
        {
            "record_id": "<urn:test:evil>",
            "warc_type": "resource",
            "content_type": "text/html",
            "payload": fake,
        }
    ] + [
        {
            "record_id": f"<urn:test:tail{i}>",
            "warc_type": "resource",
            "content_type": "text/plain",
            "payload": f"tail {i}".encode(),
        }
        for i in range(3)
    ]
    p = _write(tmp_path, "b.warc", write_warc_records(recs))
    # split boundaries INSIDE the evil payload force realignment scans
    for split_bytes in (64, 200, 1 << 20):
        got = read_warc(spark, p, split_bytes=split_bytes).collect()
        ids = sorted(r.record_id for r in got)
        assert "<urn:fake:1>" not in ids, split_bytes
        assert len(ids) == 7, (split_bytes, ids)
    by_id = {r.record_id: r for r in got}
    assert by_id["<urn:test:evil>"].payload == fake


def test_read_warc_gzip_members(spark, tmp_path):
    recs = _mk_records(40)
    p = _write(tmp_path, "c.warc.gz", write_warc_records(recs, compress=True))
    got = read_warc(spark, p).collect()
    assert sorted(r.record_id for r in got) == sorted(
        f"<urn:test:{i}>" for i in range(40)
    )
    # sanity: the file really is multi-member per-record gzip
    raw = open(p, "rb").read()
    assert raw.count(b"\x1f\x8b\x08") >= 40


def test_read_warc_dir_mixed_and_missing(spark, tmp_path):
    _write(tmp_path, "d1.warc", write_warc_records(_mk_records(5)))
    _write(
        tmp_path,
        "d2.warc.gz",
        write_warc_records(
            [
                {
                    "record_id": "<urn:test:gz>",
                    "warc_type": "resource",
                    "payload": b"z",
                }
            ],
            compress=True,
        ),
    )
    _write(tmp_path, "_hidden.warc", b"not a warc")  # skipped by convention
    got = read_warc(spark, str(tmp_path), split_bytes=128).collect()
    assert len(got) == 6
    with pytest.raises(FileNotFoundError):
        read_warc(spark, os.path.join(str(tmp_path), "nope"))
    with pytest.raises(ValueError, match="split_bytes"):
        read_warc(spark, str(tmp_path), split_bytes=0)


def test_gzip_decode_matches_uncompressed(spark, tmp_path):
    recs = _mk_records(12, body=lambda i: bytes([i]) * (i + 1))
    plain = _write(tmp_path, "e.warc", write_warc_records(recs))
    gz = _write(tmp_path, "e2.warc.gz", write_warc_records(recs, compress=True))
    a = sorted(
        (r.record_id, bytes(r.payload))
        for r in read_warc(spark, plain, split_bytes=100).collect()
    )
    b = sorted(
        (r.record_id, bytes(r.payload)) for r in read_warc(spark, gz).collect()
    )
    assert a == b


def test_read_warc_split_fuzz_exactly_once(spark, tmp_path):
    """Seeded fuzz over corpus shapes x split sizes: whatever byte the
    split boundary lands on (mid-header, mid-payload, mid-terminator,
    mid-version-line), every record decodes exactly once."""
    import random

    rng = random.Random(99)
    for trial in range(6):
        n = rng.randint(1, 40)
        recs = []
        for i in range(n):
            kind = rng.randrange(3)
            if kind == 0:
                payload = bytes(rng.randrange(256) for _ in range(rng.randint(0, 120)))
            elif kind == 1:
                payload = b"\r\n\r\nWARC/1.0\r\n" * rng.randint(1, 4)
            else:
                payload = (f"text {i} " * rng.randint(1, 30)).encode()
            recs.append(
                {
                    "record_id": f"<urn:f{trial}:{i}>",
                    "warc_type": "resource",
                    "content_type": "application/octet-stream",
                    "payload": payload,
                }
            )
        data = write_warc_records(recs)
        p = _write(tmp_path, f"fuzz{trial}.warc", data)
        split_bytes = rng.choice([1 + rng.randrange(max(1, len(data))), 97, 256])
        got = read_warc(spark, p, split_bytes=split_bytes).collect()
        ids = sorted(r.record_id for r in got)
        want = sorted(f"<urn:f{trial}:{i}>" for i in range(n))
        assert ids == want, (trial, split_bytes, len(data))
        by_id = {r.record_id: bytes(r.payload) for r in got}
        for i, rec in enumerate(recs):
            assert by_id[f"<urn:f{trial}:{i}>"] == rec["payload"], (trial, i)


def test_read_warc_payload_larger_than_window_chunk(spark, tmp_path):
    """A payload far larger than the reader's 1 MiB window step: splits
    landing INSIDE the big payload must grow the window repeatedly to
    find the next record (exercising the ensure() path and the
    pre-growth resume offset), and the terminal-record overflow path
    must reassemble the full payload byte-for-byte."""
    big = bytes(range(256)) * (10 * 1024)  # 2.5 MiB, binary, no fake headers
    recs = (
        _mk_records(2)
        + [
            {
                "record_id": "<urn:test:big>",
                "warc_type": "resource",
                "content_type": "application/octet-stream",
                "payload": big,
            }
        ]
        + [
            {
                "record_id": f"<urn:test:after{i}>",
                "warc_type": "resource",
                "payload": f"after {i}".encode(),
            }
            for i in range(3)
        ]
    )
    p = _write(tmp_path, "big.warc", write_warc_records(recs))
    got = read_warc(spark, p, split_bytes=64 * 1024).collect()
    ids = sorted(r.record_id for r in got)
    assert len(ids) == 6 and ids.count("<urn:test:big>") == 1
    by_id = {r.record_id: bytes(r.payload) for r in got}
    assert by_id["<urn:test:big>"] == big
    assert by_id["<urn:test:after2>"] == b"after 2"
