"""Regression pins for the round-13 ADVICE findings fixed in round 14
(the streaming-anomaly items are pinned in test_streaming_anomaly.py):

- source_overlap_matrix: under a df cap, n_shared/n_a/n_b/jaccard are
  all statistics over the SAME capped gram universe.
- _pin_fingerprint hashes the whole package, not just dedup.py, so a
  helper change anywhere invalidates the quadratic-baseline pins.
"""

from __future__ import annotations

import os

from hive_scd_spark.operators.decontam import source_overlap_matrix

# one 8-word text == exactly one word 8-gram, so gram identity is
# controllable without replicating the md5 scheme
G_COMMON = "c1 c2 c3 c4 c5 c6 c7 c8"   # in s1, s2, s3  (df = 3)
G_12 = "x1 x2 x3 x4 x5 x6 x7 x8"       # in s1, s2      (df = 2)
G_1 = "u1 u2 u3 u4 u5 u6 u7 u8"        # only s1        (df = 1)


def _corpus(spark):
    rows = [
        ("s1", G_COMMON), ("s1", G_12), ("s1", G_1),
        ("s2", G_COMMON), ("s2", G_12),
        ("s3", G_COMMON),
    ]
    return spark.createDataFrame(rows, "source string, text string")


def test_overlap_matrix_cap_is_universe_consistent(spark):
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_matrix(
            _corpus(spark), "source", "text", n=8, max_sources_per_gram=2
        ).collect()
    }
    # G_COMMON (df=3) is OUT of the universe: no (s1,s3)/(s2,s3) pair
    assert set(out) == {("s1", "s2")}
    r = out[("s1", "s2")]
    # capped universe: s1 = {G_12, G_1}, s2 = {G_12}
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (1, 2, 1)
    assert r["jaccard"] == 0.5


def test_overlap_matrix_uncapped_unchanged(spark):
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_matrix(
            _corpus(spark), "source", "text", n=8
        ).collect()
    }
    r = out[("s1", "s2")]
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (2, 3, 2)
    assert r["jaccard"] == round(2 / 3, 6)
    assert out[("s1", "s3")]["n_shared"] == 1
    assert out[("s2", "s3")]["n_shared"] == 1


def test_pin_fingerprint_covers_whole_package(tmp_path, monkeypatch):
    """A change to ANY package module must invalidate the pin — not
    just operators/dedup.py (ADVICE r13)."""
    import scripts.check_contract as cc

    pkg = tmp_path / "hive_scd_spark"
    (pkg / "operators").mkdir(parents=True)
    (pkg / "operators" / "dedup.py").write_text("# dedup\n")
    helper = pkg / "queries.py"
    helper.write_text("HELPER = 1\n")
    data = tmp_path / "sf"
    data.mkdir()
    (data / "documents.parquet").write_bytes(b"stub")

    monkeypatch.setattr(cc, "_REPO", str(tmp_path))
    monkeypatch.setitem(cc._PIN_INPUTS, "__probe__", ("documents.parquet",))

    def gate():
        return None

    fp1 = cc._pin_fingerprint("__probe__", gate, "SELECT 1", str(data))
    helper.write_text("HELPER = 2\n")
    fp2 = cc._pin_fingerprint("__probe__", gate, "SELECT 1", str(data))
    assert fp1 != fp2
    # and it stays deterministic for identical content
    helper.write_text("HELPER = 1\n")
    os.utime(helper)  # mtime alone must not matter for package files
    fp3 = cc._pin_fingerprint("__probe__", gate, "SELECT 1", str(data))
    assert fp3 == fp1
