"""Streaming WARC ingestion (streaming.warc_stream): batch parity and
incremental file arrival."""

from __future__ import annotations

import os

from hive_scd_spark.sources.warc import read_warc, write_warc_records


def _recs(lo, hi):
    return [
        {
            "record_id": f"<urn:s:{i}>",
            "warc_type": "response",
            "target_uri": f"https://ex.com/{i}",
            "warc_date": "2024-01-01T00:00:00Z",
            "content_type": "application/http; msgtype=response",
            "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
            + f"body {i}".encode(),
        }
        for i in range(lo, hi)
    ]


def _drain(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()


def test_warc_stream_matches_batch_and_sees_new_files(spark, tmp_path):
    from hive_scd_spark.streaming import warc_stream

    d = tmp_path / "warc_in"
    d.mkdir()
    with open(d / "a.warc", "wb") as f:
        f.write(write_warc_records(_recs(0, 30)))
    with open(d / "b.warc.gz", "wb") as f:
        f.write(write_warc_records(_recs(30, 50), compress=True))

    stream = warc_stream(spark, str(d))
    q = (
        stream.writeStream.format("memory")
        .queryName("warc_stream_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = spark.sql("SELECT * FROM warc_stream_out").collect()
        # batch parity: the SAME rows the (split-path) batch reader
        # produces, one decode code path modulo split granularity
        batch = read_warc(spark, str(d), split_bytes=128).collect()
        key = lambda r: (r.record_id, r.http_status, bytes(r.payload))  # noqa: E731
        assert sorted(map(key, got1)) == sorted(map(key, batch))
        assert len(got1) == 50

        # a file arriving AFTER the stream started is picked up
        # incrementally, without reprocessing the old ones
        with open(d / "c.warc", "wb") as f:
            f.write(write_warc_records(_recs(50, 55)))
        q.processAllAvailable()
        got2 = spark.sql("SELECT * FROM warc_stream_out").collect()
        assert len(got2) == 55
        ids = sorted(r.record_id for r in got2)
        assert ids == sorted(f"<urn:s:{i}>" for i in range(55))
    finally:
        q.stop()


def test_warc_stream_skips_hidden_files(spark, tmp_path):
    from hive_scd_spark.streaming import warc_stream

    d = tmp_path / "warc_in2"
    d.mkdir()
    with open(d / "a.warc", "wb") as f:
        f.write(write_warc_records(_recs(0, 3)))
    with open(d / "_manifest.warc", "wb") as f:
        f.write(b"not a warc at all")
    with open(d / ".hidden.warc", "wb") as f:
        f.write(b"junk")
    got = _drain(spark, warc_stream(spark, str(d)), "warc_stream_hidden")
    assert sorted(r.record_id for r in got) == [f"<urn:s:{i}>" for i in range(3)]
    assert os.path.exists(d / "_manifest.warc")  # untouched, just skipped
