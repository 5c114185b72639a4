"""End-to-end STREAMING curation composition: WARC files arrive ->
payload text extracted -> C4-style line screen -> token stream ->
frequent_ingest_sink maintains the vocabulary census continuously.
Each piece is verified on its own elsewhere; this pins that they
compose through the streaming engine with batch-equivalent results."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_scd_spark.sources.warc import write_warc_records
from hive_scd_spark.streaming import frequent_ingest_sink, read_frequent_state, warc_stream


def _recs(lo, hi):
    # bodies with a deliberately hot token and a per-record tail token
    return [
        {
            "record_id": f"<urn:s:{i}>",
            "warc_type": "response",
            "target_uri": f"https://ex.com/{i}",
            "warc_date": "2024-01-01T00:00:00Z",
            "content_type": "application/http; msgtype=response",
            "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
            + f"training data quality matters tail{i}".encode(),
        }
        for i in range(lo, hi)
    ]


def test_warc_to_frequent_census_streams_incrementally(spark, tmp_path):
    d = tmp_path / "warc_in"
    d.mkdir()
    with open(d / "a.warc", "wb") as f:
        f.write(write_warc_records(_recs(0, 40)))

    stream = warc_stream(spark, str(d))
    tokens = stream.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("payload").cast("string"))), r"\s+"),
                lambda t: (t != "") & ~t.rlike("^http"),
            )
        ).alias("token")
    )
    sink = frequent_ingest_sink(
        tokens, str(tmp_path / "state"), str(tmp_path / "ckpt"), "token",
        capacity=16,
    )
    q = sink.start()
    try:
        q.processAllAvailable()
        with open(d / "b.warc.gz", "wb") as f:
            f.write(write_warc_records(_recs(40, 60), compress=True))
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["token"]: r
        for r in read_frequent_state(
            spark, str(tmp_path / "state"), "token", k=8
        ).collect()
    }
    # the 5 hot tokens appear in all 60 records (5/10 of the stream each
    # >= 1/8); every tail token appears once and must NOT be certain
    for tok in ("training", "data", "quality", "matters"):
        assert tok in got and got[tok]["certain"], tok
        assert got[tok]["cnt_min"] == 60
    assert not any(k.startswith("tail") and v["certain"] for k, v in got.items())
