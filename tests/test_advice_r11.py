"""Round-11 ADVICE fixes: bounded WARC alignment scans (the medium
OOM-risk finding), fractional-id round-trip guard in split_by_cluster,
and original-id-type passthrough in compression_ratio.  (The robots
most-specific-group and paragraph-counter fixes are pinned where their
families live: tests/test_corpus_clean_r10.py.)"""

import gzip
import hashlib

import pytest

from hive_scd_spark.sources.warc import (
    _CHUNK,
    _next_gz_member_at,
    _Window,
    write_warc_records,
)


class _CountingFile:
    """read_at-compatible in-memory file that counts bytes served —
    the IO meter for the bounded-scan assertions."""

    def __init__(self, data: bytes):
        self.data = data
        self.bytes_read = 0

    def read_at(self, n, off):
        chunk = self.data[off : off + n]
        self.bytes_read += len(chunk)
        return chunk


def _incompressible(n: int) -> bytes:
    """n deterministic pseudo-random bytes (md5 counter stream) — the
    compressed archive stays ~n bytes, so 'reads to EOF' and 'reads
    its own range' are megabytes apart."""
    out = []
    total = 0
    i = 0
    while total < n:
        blk = hashlib.md5(f"blk:{i}".encode()).digest()
        out.append(blk)
        total += len(blk)
        i += 1
    return b"".join(out)[:n]


def _whole_file_gz_archive(total_payload: int) -> bytes:
    recs = [
        {
            "record_id": f"<urn:t:{i}>",
            "warc_type": "resource",
            "target_uri": f"https://x.com/{i}",
            "warc_date": "2024-01-01T00:00:00Z",
            "content_type": "application/octet-stream",
            "payload": _incompressible(total_payload // 8),
        }
        for i in range(8)
    ]
    return gzip.compress(write_warc_records(recs))


def test_gz_interior_split_scan_is_bounded_by_split_end():
    """ADVICE r10 (medium): an interior split of a WHOLE-FILE-gzip
    archive has no member start inside it; the alignment scan must
    give up at the split end after ~one range of IO, not read and
    buffer to EOF."""
    data = _whole_file_gz_archive(6 * _CHUNK)
    assert len(data) > 5 * _CHUNK  # incompressible payload kept it big
    f = _CountingFile(data)
    start, end = 64 * 1024, 128 * 1024  # a 64 KiB interior split
    win = _Window(f, start, end, len(data))
    assert _next_gz_member_at(win, start, stop=end) is None
    # bound: the split range + the constructor's end+_CHUNK prefetch +
    # at most one growth step.  Without the stop bound this read the
    # remaining ~5 MiB to EOF.
    assert f.bytes_read <= (end - start) + 3 * _CHUNK
    assert f.bytes_read < len(data) - _CHUNK


def test_uncompressed_interior_garbage_split_scan_is_bounded():
    """The uncompressed twin: a split full of non-WARC bytes must stop
    scanning at its end, not walk the rest of the file."""
    data = _incompressible(6 * _CHUNK)  # no 'WARC/1.' anywhere, w.h.p.
    f = _CountingFile(data)
    start, end = 64 * 1024, 128 * 1024
    win = _Window(f, start, end, len(data))
    assert win.next_record_at(start, stop=end) is None
    assert f.bytes_read <= (end - start) + 3 * _CHUNK


def test_gz_split_reads_unchanged_by_bound(spark, tmp_path):
    """The bound must not change WHAT a real per-record-gzip split
    emits: whole-file read and split read agree record-for-record."""
    import os

    from hive_scd_spark.sources.warc import read_warc

    recs = [
        {
            "record_id": f"<urn:m:{i}>",
            "warc_type": "resource",
            "target_uri": f"https://m.com/{i}",
            "warc_date": "2024-01-01T00:00:00Z",
            "content_type": "text/plain",
            "payload": f"member {i} body {'x' * (i % 700)}".encode(),
        }
        for i in range(120)
    ]
    # CommonCrawl layout: one gzip member per record
    data = b"".join(gzip.compress(write_warc_records([r])) for r in recs)
    p = os.path.join(str(tmp_path), "members.warc.gz")
    with open(p, "wb") as fh:
        fh.write(data)
    whole = {r.record_id for r in read_warc(spark, p).collect()}
    split = {
        r.record_id
        for r in read_warc(spark, p, split_bytes=4 * 1024).collect()
    }
    assert split == whole and len(whole) == 120


def test_window_trim_preserves_parsing():
    """trim() drops consumed prefix (amortized at _CHUNK granularity)
    without disturbing offsets: records after the trim point still
    parse at their file offsets."""
    recs = [
        {
            "record_id": f"<urn:w:{i}>",
            "warc_type": "resource",
            "target_uri": f"https://w.com/{i}",
            "warc_date": "2024-01-01T00:00:00Z",
            "content_type": "text/plain",
            "payload": _incompressible(300_000),
        }
        for i in range(8)
    ]
    data = write_warc_records(recs)
    f = _CountingFile(data)
    # a small split end: the window grows on demand as records overflow
    win = _Window(f, 0, 64 * 1024, len(data))
    pos, seen = 0, []
    while pos < len(data):
        rec, nxt = win.parse_record_at(pos)
        seen.append(rec["record_id"])
        pos = nxt
        win.trim(pos)
        # the buffer never holds more than ~a record + chunk slack —
        # O(record) memory, not O(range) (ADVICE r10)
        assert len(win.buf) <= 4 * _CHUNK
    assert seen == [r["record_id"] for r in recs]
    # trim actually fired: the base advanced past the early records
    assert win.base >= len(data) - 4 - 2 * _CHUNK
    assert len(win.buf) <= 2 * _CHUNK


def test_split_by_cluster_fractional_ids_fail_loudly(spark):
    """ADVICE r10: DoubleType 3.9 try_casts to 3 by truncation, so
    distinct float ids could silently collide on split_key — the
    round-trip guard must raise instead."""
    from hive_scd_spark.operators.sampling import split_by_cluster

    docs = spark.createDataFrame(
        [(1.0,), (3.9,), (4.2,)], "doc_id double"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(Exception, match="must be integral"):
        split_by_cluster(docs, pairs).collect()


def test_split_by_cluster_integral_floats_and_noncanonical_strings(spark):
    """Whole-number doubles round-trip and assign identically to the
    same ids as longs; a non-canonical digit string ('03' → 3 ← '3')
    is a collision risk and must raise."""
    from hive_scd_spark.operators.sampling import split_by_cluster

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    as_long = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    as_dbl = spark.createDataFrame(
        [(float(i),) for i in range(1, 8)], "doc_id double"
    )
    a = {int(r.doc_id): r.split for r in split_by_cluster(as_long, pairs).collect()}
    b = {int(r.doc_id): r.split for r in split_by_cluster(as_dbl, pairs).collect()}
    assert a == b

    bad = spark.createDataFrame([("3",), ("03",)], "doc_id string")
    with pytest.raises(Exception, match="must be integral"):
        split_by_cluster(bad, pairs).collect()


def test_compression_ratio_string_ids_pass_through(spark):
    """ADVICE r10: string/UUID document ids must survive with their
    original type, not die in an int64 cast."""
    from hive_scd_spark.operators.quality import compression_ratio

    df = spark.createDataFrame(
        [("doc-a", "hello hello hello hello hello"), ("doc-b", None)],
        "doc_key string, text string",
    )
    out = {r.doc_key: r for r in compression_ratio(df, "doc_key", "text").collect()}
    assert set(out) == {"doc-a", "doc-b"}
    assert out["doc-b"].n_bytes == 0 and out["doc-b"].kept == 0
    assert out["doc-a"].n_compressed > 0
    assert dict(compression_ratio(df, "doc_key", "text").dtypes)["doc_key"] == "string"


def test_compression_ratio_reserved_id_name_raises(spark):
    from hive_scd_spark.operators.quality import compression_ratio

    df = spark.createDataFrame([(1, "t")], "ratio long, text string")
    with pytest.raises(ValueError, match="collides with an output column"):
        compression_ratio(df, "ratio", "text")


def test_ngram_jaccard_full_corpus_matches_duckdb(spark):
    """The dedup_ngram_jaccard GATE now verifies a deterministic
    half-corpus slice (contract-cost bound, VERDICT r10 task 2); this
    test keeps the FULL-corpus form value-checked against DuckDB at
    sf0.01 so the slice never silently becomes the only evidence."""
    import duckdb

    from hive_scd_spark.operators.dedup import ngram_jaccard_pairs

    sf_dir = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", k=8, threshold=0.3
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {
        tuple(r)
        for r in con.sql(
            """
        WITH sh AS (SELECT DISTINCT doc_id, substr(text, i, 8) AS s
               FROM documents,
                    LATERAL (SELECT unnest(generate_series(1,
                             GREATEST(len(text)-7, 1))) AS i) t),
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        shared AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
                          count(*) AS cnt
                   FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                   GROUP BY 1,2)
        SELECT s.id_a, s.id_b,
               ROUND(cnt*1.0/(sa.n+sb.n-cnt), 6) AS jaccard
        FROM shared s JOIN sz sa ON s.id_a = sa.doc_id
                      JOIN sz sb ON s.id_b = sb.doc_id
        WHERE cnt*1.0/(sa.n+sb.n-cnt) >= 0.3
        """
        ).fetchall()
    }
    assert got == want and len(want) == 25
