#!/usr/bin/env python
"""100x scale experiment for the dedup-family scale paths.

scale_10x.py's vowel-translation scheme only has 10 distinct maps, so
at 100 replicas every 10th replica would be text-identical (map 0 is
the identity) and the corpus would degenerate to a 10%-exact-duplicate
set — measuring pair explosion, not scale.  Each replica here applies
a CHARACTER BIJECTION instead: rotate the letter alphabet by
i mod 26 and the digits by i mod 10 — lcm(26,10)=130 distinct
compositions, so all 100 replicas are distinct.  A bijection preserves
shingle-set structure EXACTLY (every intra-replica Jaccard unchanged,
so each replica carries the original near-dup rate), while shingles
from different replicas collide only by coincidence.

(A first attempt suffixed every word with the replica index; that
made the suffix shingles — "_42 " and friends — common to EVERY doc
of a replica, which drags random pairwise Jaccard up and, worse,
makes the minhash MINIMUM come from the shared suffix shingles:
whole replicas collapsed into single LSH buckets and the candidate
set exploded to billions.  A useful failure: it is precisely the
hot-bucket pathology LSH auditing looks for, induced by a testdata
bug.)

Focused subset (the operators whose asymptotics matter most at
100 TB), warm + single timed rep at 100x (the 10x artifact carries the
min-of-2 discipline; this one answers "does the curve BEND").

Usage: python scripts/scale_100x.py [sf_dir] [n]   (default sf0.1, 100)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hive_scd_spark.session import get_spark


_LETTERS = "abcdefghijklmnopqrstuvwxyz"
_DIGITS = "0123456789"


def _rot_map(i: int) -> tuple[str, str]:
    """Source and target strings for replica *i*'s character bijection:
    letters rotated by i mod 26 (both cases), digits by i mod 10."""
    lr, dr = i % 26, i % 10
    src = _LETTERS + _LETTERS.upper() + _DIGITS
    dst = (
        _LETTERS[lr:] + _LETTERS[:lr]
        + (_LETTERS[lr:] + _LETTERS[:lr]).upper()
        + _DIGITS[dr:] + _DIGITS[:dr]
    )
    return src, dst


def replicate_translated(spark, src_parquet: str, out_dir: str, n: int):
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return
    base = spark.read.parquet(src_parquet).select("doc_id", "text", "source")
    shift = base.agg(F.max("doc_id")).first()[0] + 1
    # one plan: cross join with the replica range; per-replica translate
    # via a CASE over the 100 rotation maps (all literals, codegen)
    reps = spark.range(n).select(F.col("id").alias("__rep"))
    translated = None
    for i in range(n):
        src, dst = _rot_map(i)
        branch = F.translate(F.col("text"), src, dst)
        translated = (
            branch
            if translated is None
            else F.when(F.col("__rep") == i, branch).otherwise(translated)
        )
    # note: the when-chain above evaluates branches lazily per row; the
    # final expression is replica-indexed, replica 0 = identity rotation
    out = (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("__rep") * shift).alias("doc_id"),
            translated.alias("text"),
            "source",
        )
        .repartition(64)
    )
    out.write.mode("overwrite").parquet(out_dir)


def timed(label, thunk):
    t0 = time.perf_counter()
    thunk().write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"{label:55s}{dt:8.3f}s", flush=True)
    return dt


# Designed CONTRAST rows (VERDICT r13 task 2): measured on purpose to
# show what the production default avoids; their superlinear segments
# are the baseline, not a regression.  The label rides IN the artifact.
CONTRAST_ROWS = {
    "dedup_winnow_pairs": (
        "designed contrast row: UNCAPPED winnow pair generation - the "
        "production default is the df-capped dedup_winnow_capped; "
        "superlinear on boilerplate-dense corpora by construction "
        "(guardable via winnow_pairs_from_selected pair_budget)"
    ),
    "dedup_embedding_lsh_fixed4": (
        "designed contrast row: fixed-plane LSH pathology canary - "
        "auto-sized planes are the production path"
    ),
}


# Heavy rows (t100 > ~20 s in BENCH_100x_r14): under SCALE100X_ISOLATE
# each runs in its OWN subprocess JVM (VERDICT r14 task 1b) — the r14
# session OOM'd at pipeline_semantic_dedup because heap debt from ten
# prior experiments had consumed the unified pool; per-row JVMs make
# that impossible by construction, the way bench.py isolates its two
# sessions.  A label listed here but no longer in the experiment set
# just yields one quick no-op subprocess.
HEAVY_100X = (
    "pipeline_semantic_dedup",
    "pipeline_semantic_dedup_embed",
    "report_source_overlap",
    "graph_pagerank_dups",
    "decontam_ngram_overlap",
    "dedup_exact_substring",
    "dedup_minhash_lsh",
    "dedup_cluster_assign",
    "dedup_winnow_pairs",
    "decontam_bloom_screen",
    "dedup_embedding_lsh_auto",
    "select_dsir_weights",
)


def orchestrate(sf_dir: str, n: int) -> None:
    """SCALE100X_ISOLATE=1 driver: run the suite as a sequence of
    subprocess JVMs — one batch for every non-heavy label, then one
    process PER heavy label — merging through the crash-tolerant
    checkpoint (each child runs with SCALE100X_RESUME=1 and skips
    what's already measured).  The replicated /tmp corpora are built
    by the first child and reused by the rest (_SUCCESS markers)."""
    import json
    import subprocess

    ckpt_path = f"/tmp/scale{n}x_checkpoint.json"
    if os.environ.get("SCALE100X_RESUME") != "1" and os.path.exists(ckpt_path):
        os.remove(ckpt_path)
    env = dict(os.environ, SCALE100X_RESUME="1")
    env.pop("SCALE100X_ISOLATE", None)
    me = os.path.abspath(__file__)
    # "!a,b,c" = everything EXCEPT the heavy set; "label," = exactly it
    groups = ["!" + ",".join(HEAVY_100X)] + [f"{h}," for h in HEAVY_100X]
    for g in groups:
        rc = subprocess.call([sys.executable, me, sf_dir, str(n), g], env=env)
        print(f"[isolate] group rc={rc}: {g[:80]}", flush=True)
    prior = {"results": {}, "errors": {}}
    if os.path.exists(ckpt_path):
        with open(ckpt_path) as f:
            prior = json.load(f)
    out = {
        "metric": f"scale{n}x_ratios",
        "unit": "sec",
        "sf_base": os.path.basename(sf_dir.rstrip("/")),
        "replication": n,
        "queries": prior.get("results", {}),
        "isolated": True,
        "heavy_isolated": sorted(HEAVY_100X),
    }
    if prior.get("errors"):
        out["errors"] = prior["errors"]
        out["partial"] = True
    print(json.dumps(out))
    if prior.get("errors"):
        sys.exit(1 if not prior.get("results") else 2)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    if os.environ.get("SCALE100X_ISOLATE") == "1" and len(sys.argv) <= 3:
        return orchestrate(sf_dir, n)
    spark = get_spark("scale100x")
    docs1 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # cache key encodes the REPLICATION SCHEME: a machine that ran the
    # retired word-suffix replicator must not silently reuse its stale
    # corpus (that data reproduces the hot-bucket pathology this
    # script's docstring describes)
    d100_path = f"/tmp/scale100x_documents_rot_{n}"
    replicate_translated(spark, f"{sf_dir}/documents.parquet", d100_path, n)
    docs100 = spark.read.parquet(d100_path)
    n1, n100 = docs1.count(), docs100.count()
    print(f"docs 1x={n1} {n}x={n100}", flush=True)
    base_max_id = docs1.agg(F.max("doc_id")).first()[0]

    from hive_scd_spark.operators.dedup import (
        exact_dedup,
        minhash_incremental_pairs,
        minhash_near_dup_pairs,
        simhash_near_dups,
        substring_dup_pairs,
    )
    from hive_scd_spark.operators.text_rank import bm25_topk

    def minhash_gate(d):
        return minhash_near_dup_pairs(d, "doc_id", "text", k=8, threshold=0.3)

    def substring_gate(d):
        return substring_dup_pairs(d, "doc_id", "text", n=15, max_df=50)

    def incremental_gate(d):
        # batch bounded at the replica-0 slice; the corpus side grows
        is_new = (F.col("doc_id") % 5 == 3) & (F.col("doc_id") <= base_max_id)
        return minhash_incremental_pairs(
            d.filter(is_new), d.filter(~is_new), "doc_id", "text",
            k=8, threshold=0.3,
        )

    def exact_gate(d):
        return exact_dedup(d, "doc_id", text_col="text")

    def simhash_gate(d):
        # rotation-translated replicas have distinct token hashes, so
        # band buckets stay replica-local and the in-replica
        # Hamming-ball structure is what scales
        return simhash_near_dups(d, "doc_id", "text")

    def bm25_gate(d):
        return bm25_topk(d, "doc_id", "text",
                         ["model", "training", "data", "quality"], k=20)

    # r7 (VERDICT r6 task 4): the iterative/capstone class, whose 100x
    # slope was previously extrapolated from 10x.  All builder-inclusive
    # (timed() wraps the thunk CALL, so build-time checkpoints/counts
    # are inside the window — the bench.py ITERATIVE discipline).
    from hive_scd_spark.operators.cluster import dup_clusters, pagerank
    from hive_scd_spark.operators.decontam import ngram_contamination
    from hive_scd_spark.operators.pack import pack_sequences
    from hive_scd_spark.operators.similarity import hash_embed
    from hive_scd_spark.operators.text import token_counts

    def pagerank_gate(d):
        pairs = substring_dup_pairs(d, "doc_id", "text", n=15, max_df=50)
        return pagerank(pairs, "id_a", "id_b", iters=5)

    def cluster_gate(d):
        pairs = minhash_near_dup_pairs(d, "doc_id", "text", k=8, threshold=0.3)
        return dup_clusters(pairs)

    def decontam_gate(d):
        # replica-0-only eval slice: bounded (<=200 docs) at ANY n —
        # the operator's broadcast-eval contract
        is_eval = (F.col("doc_id") % 97 == 0) & (F.col("doc_id") < 97 * 200)
        return ngram_contamination(
            d.filter(~is_eval), d.filter(is_eval), "doc_id", "text", n=13
        )

    def pack_gate(d):
        toks = token_counts(d, "doc_id", "text").select(
            "doc_id", F.col("n_regex_tokens").alias("n_tokens")
        )
        return pack_sequences(toks, "doc_id", "n_tokens", 512)

    def semantic_gate(d):
        emb = hash_embed(d, "doc_id", "text", dim=32).select(
            "doc_id", F.col("vec").cast("array<double>").alias("vec")
        ).localCheckpoint(eager=False)
        return embedding_near_dup_pairs(
            emb, "doc_id", "vec",
            threshold=0.95, use_lsh=True, n_planes="auto", n_bands=2,
            dim=32, target_bucket=8, n_rows=d.count(),
        )

    def semantic_embed_gate(d):
        # PROFILE split (VERDICT r14 task 1c): hash_embed alone — the
        # full pipeline_semantic_dedup row minus this isolates the LSH
        # bucket join + pair-verify share of the composed ratio
        return hash_embed(d, "doc_id", "text", dim=32).select(
            "doc_id", F.col("vec").cast("array<double>").alias("vec")
        )

    # embeddings 100x: reuse scale_10x's isometric sign-flip replicator
    # (maps are md5(replica:dim)-derived — distinct at ANY n)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "scale_10x", os.path.join(os.path.dirname(os.path.abspath(__file__)), "scale_10x.py")
    )
    s10 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(s10)
    emb100_path = f"/tmp/scale100x_embeddings_{n}"
    s10.replicate_embeddings(spark, f"{sf_dir}/embeddings.parquet", emb100_path, n=n)
    emb1 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb100 = spark.read.parquet(emb100_path)
    print(f"embeddings 1x={emb1.count()} {n}x={emb100.count()}", flush=True)

    # events 100x: reuse scale_10x's key-shift replicator (r13 — the
    # zscore row needs a true event stream, not the orders-derived one)
    ev100_path = f"/tmp/scale100x_events_{n}"
    s10.replicate(spark, f"{sf_dir}/events.parquet", ev100_path,
                  ["event_id", "user_id"], n=n)
    ev1 = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev100 = spark.read.parquet(ev100_path)
    print(f"events 1x={ev1.count()} {n}x={ev100.count()}", flush=True)

    def zscore_gate(ev):
        # r13: rolling z-score — ONE key-partitioned window pass; keys
        # and rows grow with the stream, frame width fixed — expect
        # ~linear
        from hive_scd_spark.operators.asof import anomaly_zscore

        if dict(ev.dtypes)["ts"] == "bigint":
            ts_us = F.expr("ts div 1000")
        else:
            ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
        e2 = ev.select("user_id", ts_us.alias("ts_us"), "event_id", "value")
        return anomaly_zscore(
            e2, "user_id", "ts_us", "value", "event_id",
            lookback=20, min_history=8,
        )

    def overlap_matrix_gate(d):
        # r13: cross-source overlap matrix — gram shuffle grows with
        # the corpus, pair fan-out stays source-count-bounded (20
        # sources = at most 190 pair keys) — expect ~linear
        from hive_scd_spark.operators.decontam import source_overlap_matrix

        return source_overlap_matrix(d, "source", "text", n=8)

    from hive_scd_spark.operators.dedup import embedding_near_dup_pairs
    from hive_scd_spark.operators.similarity import ann_cosine_topk

    def emb_lsh_auto_gate(emb):
        return embedding_near_dup_pairs(
            emb, "vec_id", "embedding",
            threshold=0.35, use_lsh=True, n_planes="auto", n_bands=4, dim=64,
        )

    def ann_gate(emb):
        return ann_cosine_topk(
            emb, emb.filter(F.col("vec_id") < 10),
            id_col="vec_id", vec_col="embedding", k=5, n_planes=8, dim=64,
        )

    # r9 (VERDICT r8 task 8): the r7 operator family at 100x.
    def fuzzy_gate(d):
        # typo_corpus derives strings from md5(doc_id) — distinct across
        # replicas, so typo pairs stay replica-local (planted-rate
        # preserved), same design as scale_10x's fuzzy experiment
        from hive_scd_spark.operators.fuzzy import edit_distance_self_join
        from hive_scd_spark.queries import typo_corpus

        return edit_distance_self_join(typo_corpus(d), "id", "w", 1)

    def bloom_gate(d):
        # eval side bounded at the replica-0 slice (the operator's
        # constant-size-sketch contract); the probe side grows 100x and
        # must stay one shuffle-free scan.  Builder actions (the m/4
        # nibble collect) sit inside the timed thunk.
        from hive_scd_spark.operators.bloom import (
            bloom_build,
            bloom_probe,
            bloom_to_hex,
        )

        is_eval = (F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 700)
        bm = bloom_to_hex(
            bloom_build(d.filter(is_eval), "text", n=13, m_bits=1 << 18, k=4)
        )
        return bloom_probe(d.filter(~is_eval), "doc_id", "text", bm).filter(
            F.col("n_hit") > 0
        )

    def bpe_batched_gate(d):
        # Arrow mapInPandas tokenization — embarrassingly parallel, the
        # per-row Python cost is the thing that must stay flat
        from hive_scd_spark.operators.text import bpe_tokenize_batched

        return bpe_tokenize_batched(d, "doc_id", "text").select(
            "doc_id", "n_tokens"
        )

    # orders 100x for the mergeable-quantile sketch: plain id-shifted
    # replication (totalprice/date untouched — the sketch's count
    # aggregation is what scales, and identical value distributions per
    # replica keep the bucket layout comparable across scales)
    orders100_path = f"/tmp/scale100x_orders_{n}"
    if not os.path.exists(os.path.join(orders100_path, "_SUCCESS")):
        o1 = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_totalprice", "o_orderdate"
        )
        oshift = o1.agg(F.max("o_orderkey")).first()[0] + 1
        reps = spark.range(n).select(F.col("id").alias("__rep"))
        (
            o1.crossJoin(F.broadcast(reps))
            .select(
                (F.col("o_orderkey") + F.col("__rep") * oshift).alias("o_orderkey"),
                "o_totalprice",
                "o_orderdate",
            )
            .repartition(64)
            .write.mode("overwrite")
            .parquet(orders100_path)
        )
    orders1 = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    orders100 = spark.read.parquet(orders100_path)
    print(f"orders 1x={orders1.count()} {n}x={orders100.count()}", flush=True)

    def sketch_gate(o):
        # per-month build -> merge -> quantiles (the persist+merge scale
        # path; the gate's exact-percentile cross-check is a correctness
        # concern, not the sketch's scaling claim).  The min/max action
        # sits inside the timed thunk (builder-inclusive discipline).
        from hive_scd_spark.operators.profile import (
            histogram_merge,
            histogram_quantiles,
            histogram_sketch,
        )

        stats = o.agg(
            F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
        ).first()
        lo, hi, nb = float(stats["lo"]), float(stats["hi"]), 128
        monthly = histogram_sketch(
            o.withColumn("mon", F.date_trunc("month", "o_orderdate")),
            "o_totalprice",
            lo,
            hi,
            nb,
            by=["mon"],
        )
        return histogram_quantiles(
            histogram_merge(monthly), [0.5, 0.9, 0.99], lo, hi, nb
        )

    def dsir_gate(d):
        # target = a bounded replica-0 slice (DSIR's target is a small
        # eval-like corpus by construction); the RAW POOL is what grows.
        # Model fits stay n_buckets-bounded shuffles at any n.
        from hive_scd_spark.operators.selection import dsir_importance_weights

        is_tgt = (F.col("doc_id") % 50 == 0) & (F.col("doc_id") <= base_max_id)
        return dsir_importance_weights(
            d.filter(~is_tgt), d.filter(is_tgt), "doc_id", "text",
            n_buckets=4096,
        )

    # round-10 crawl family (VERDICT r9 task 3).  WARC fixtures are
    # written ONCE per corpus outside the timed thunks (streamed
    # toLocalIterator build, marker-idempotent — the first warm-shape
    # call pays it); timing measures the byte-range-split scan and the
    # downstream crawl plan, not fixture IO.
    from hive_scd_spark.queries import (
        _crawl_to_corpus_over,
        _crawl_to_corpus_v2_over,
        _warc_scan_over,
        write_warc_fixture,
    )

    def warc_fixture_for(d):
        tag = f"{n}x" if d is docs100 else "1x"
        base = f"/tmp/scale100x_warc_{os.path.basename(sf_dir.rstrip('/'))}_{tag}"
        write_warc_fixture(d.select("doc_id", "text"), base)
        return base

    def warc_scan_gate(d):
        return _warc_scan_over(spark, warc_fixture_for(d), split_bytes=1 << 20)

    def crawl_gate(d):
        return _crawl_to_corpus_over(spark, warc_fixture_for(d), split_bytes=1 << 20)

    def crawl_v2_gate(d):
        # r11: the cleaner-chained capstone over the same fixture
        return _crawl_to_corpus_v2_over(
            spark, warc_fixture_for(d), split_bytes=1 << 20
        )

    def bigram_gate(d):
        # trained corpus = src0+src1 (grows with the pool, as the gate
        # defines it); vocab held at 30 — model fits stay V²-bounded
        from hive_scd_spark.operators.quality import bigram_logprob

        is_tr = F.col("source").isin("src0", "src1")
        return bigram_logprob(
            d.filter(~is_tr), "doc_id", "text", vocab_size=30,
            train=d.filter(is_tr),
        )

    def paragraphs_gate(d):
        # promo paragraph shared by the doc_id % 997 class (class df
        # grows ~100x — the min-combine stress); bodies stay unique
        # across rotation-translated replicas
        from hive_scd_spark.operators.dedup import dedup_paragraphs

        planted = d.select(
            "doc_id",
            F.concat(
                F.lit("promo block "),
                (F.col("doc_id") % 997).cast("string"),
                F.lit("\n\n"),
                F.col("text"),
            ).alias("text"),
        )
        return dedup_paragraphs(planted, "doc_id", "text")

    def c4_gate(d):
        # ~6-word terminal-punct lines out of the real text: the line
        # rules do real row-local work at corpus scale
        from hive_scd_spark.operators.text import clean_c4_lines

        lined = F.regexp_replace(F.col("text"), r"(([^ ]+ ){5}[^ ]+) ", "$1.\n")
        return clean_c4_lines(
            d.select("doc_id", lined.alias("text")), "doc_id", "text"
        )

    def multimodal_near_video_gate(d):
        # r14: video frame-hash near-dup — head/tail-trimmed copies
        from hive_scd_spark.operators.multimodal import (
            attach_binary,
            multimodal_dedup_near_video,
        )

        src = (
            d.select(
                "doc_id", F.regexp_replace("text", "[^ -~]", "").alias("t")
            )
            .filter(F.length("t") >= 192)
        )
        head_trim = src.filter(F.col("doc_id") % 10 == 4).select(
            (F.col("doc_id") + 500000000).alias("doc_id"),
            F.expr("substring(t, 65)").alias("t"),
        )
        tail_trim = src.filter(F.col("doc_id") % 10 == 9).select(
            (F.col("doc_id") + 600000000).alias("doc_id"),
            F.expr("substring(t, 1, length(t) - 64)").alias("t"),
        )
        media = attach_binary(
            src.unionByName(head_trim).unionByName(tail_trim),
            id_col="doc_id", payload_col="t", media_type="video",
        )
        return multimodal_dedup_near_video(media.select("media_id", "payload"))

    def multimodal_near_audio_gate(d):
        # r14: the audio sibling — PCM16 envelope hash, planted 2x/3x
        # SAMPLE-duplicated copies (2-byte groups)
        from hive_scd_spark.operators.multimodal import (
            attach_binary,
            multimodal_dedup_near_audio,
        )

        src = (
            d.select(
                "doc_id", F.regexp_replace("text", "[^ -~]", "").alias("t")
            )
            .filter(F.length("t") >= 144)
        )
        up2 = src.filter(F.col("doc_id") % 10 == 2).select(
            (F.col("doc_id") + 300000000).alias("doc_id"),
            F.regexp_replace("t", "(..)", "$1$1").alias("t"),
        )
        up3 = src.filter(F.col("doc_id") % 10 == 7).select(
            (F.col("doc_id") + 400000000).alias("doc_id"),
            F.regexp_replace("t", "(..)", "$1$1$1").alias("t"),
        )
        media = attach_binary(
            src.unionByName(up2).unionByName(up3),
            id_col="doc_id", payload_col="t", media_type="audio",
        )
        return multimodal_dedup_near_audio(media.select("media_id", "payload"))

    def multimodal_near_gate(d):
        # r14: the registered gate's exact shape — printable-ASCII
        # payloads, planted 2x/3x byte-upsampled copies, stub dHash,
        # banded Hamming (ids +1e6/+2e6 per 100x replica id space:
        # replica offsets are multiples of max_id+1 so the planted id
        # ranges stay disjoint at n=100 for the sf0.1 base)
        from hive_scd_spark.operators.multimodal import (
            attach_binary,
            multimodal_dedup_near,
        )

        src = (
            d.select(
                "doc_id", F.regexp_replace("text", "[^ -~]", "").alias("t")
            )
            .filter(F.length("t") >= 72)
        )
        up2 = src.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 100000000).alias("doc_id"),
            F.regexp_replace("t", "(.)", "$1$1").alias("t"),
        )
        up3 = src.filter(F.col("doc_id") % 10 == 5).select(
            (F.col("doc_id") + 200000000).alias("doc_id"),
            F.regexp_replace("t", "(.)", "$1$1$1").alias("t"),
        )
        media = attach_binary(
            src.unionByName(up2).unionByName(up3),
            id_col="doc_id", payload_col="t", media_type="image",
        )
        return multimodal_dedup_near(media.select("media_id", "payload"))

    def winnow_gate(d):
        # substring-level fingerprint candidates; df cap bounds pair
        # fan-out whatever the corpus size
        from hive_scd_spark.operators.dedup import winnow_dup_pairs

        return winnow_dup_pairs(d, "doc_id", "text", min_shared=5)

    def winnow_capped_gate(d):
        # r12: pair generation at the tightened MOSS df cap (max_df=16)
        from hive_scd_spark.operators.dedup import (
            winnow_pairs_from_selected,
            winnow_selected,
        )

        return winnow_pairs_from_selected(
            winnow_selected(d, "doc_id", "text"), "doc_id",
            max_df=16, min_shared=5,
        )

    def multi_archives_for(d):
        # r12 (VERDICT r11 task 3): multi-archive crawl-drop shape —
        # per-archive size CONSTANT as the corpus grows (4 at 1x, 400
        # at 100x), the layout the across-archive parallel claim is
        # about.  Built untimed, marker-idempotent.
        tag, n_arch = (f"{n}x", 4 * n) if d is docs100 else ("1x", 4)
        base = f"/tmp/scale100_monomulti_{os.path.basename(sf_dir.rstrip('/'))}_{tag}"
        from hive_scd_spark.queries import write_warc_monolith as _wm

        _wm(d.select("doc_id", "text"), base, n_archives=n_arch)
        return [
            os.path.join(base, f"archive-{i:03d}.warc.gz")
            for i in range(n_arch)
        ]

    def reshard_multi_gate(d):
        # r12: one task per archive, archives grow with data — the
        # measured proof of reshard_warc_gz's across-archive
        # parallelism (expected ~n_waves = ceil(archives/cores), not
        # ~data ratio)
        from hive_scd_spark.sources.warc import reshard_warc_gz

        tag = f"{n}x" if d is docs100 else "1x"
        return reshard_warc_gz(
            spark, multi_archives_for(d), f"/tmp/scale100_reshard_multi_{tag}"
        )

    def mix_pack_gate(d):
        # r12: mix→repeat-explode→shuffle→pack capstone; budget grows
        # with the corpus (a bigger pool packs more sequences)
        from hive_scd_spark.operators.pack import pack_sequences
        from hive_scd_spark.operators.sampling import (
            shuffle_corpus,
            temperature_mix,
        )

        toks = d.select(
            "doc_id", "source",
            F.size(
                F.filter(
                    F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
                    lambda x: x != "",
                )
            ).cast("long").alias("n_tokens"),
        )
        budget = 50_000 * (n if d is docs100 else 1)
        mixed = temperature_mix(
            toks, "doc_id", "source", "n_tokens", budget=budget, alpha=0.5
        )
        reps = mixed.filter(F.col("n_repeats") > 0).select(
            "doc_id", "n_tokens",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("n_repeats"))
            ).alias("rep"),
        ).withColumn(
            "rep_id",
            F.concat(
                F.col("doc_id").cast("string"), F.lit("#"),
                F.col("rep").cast("string"),
            ),
        )
        shuffled = shuffle_corpus(reps, "rep_id", salt="mixshuf")
        return pack_sequences(
            shuffled, "shuffle_rank", "n_tokens", 512,
            keep_cols=("doc_id", "rep"),
        )

    def hh_gate(od):
        # r12 session 2: frequent-items sketch over a scale-invariant
        # Zipf stream keyed off the replicated orders (15M elements at
        # 100x) — distinct keys grow with the stream, the hitter set
        # does not; MG pruning + the broadcast recount both scale
        from hive_scd_spark.operators.profile import heavy_hitters

        h = F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 5), 16, 10
        ).cast("long")
        stream = od.select(
            F.floor(F.lit(1048576) / (h + 1)).cast("long").alias("key")
        )
        return heavy_hitters(stream, "key", k=128, capacity=256)

    def kn_gate(d):
        # r12 session 2: KN trigram — model state V-clipped whatever
        # the corpus; scoring is the bigram plan + one more self-join
        from hive_scd_spark.operators.quality import kn_trigram_logprob

        is_tr = F.col("source").isin("src0", "src1")
        return kn_trigram_logprob(
            d.filter(~is_tr), "doc_id", "text", vocab_size=30,
            train=d.filter(is_tr),
        )

    def pq_gate(emb):
        # r12 session 2: PQ end-to-end; codebook and query set fixed
        # (recipe constants), so training+encode+ADC are all ~linear
        from hive_scd_spark.operators.similarity import pq_adc_topk, pq_codebooks

        cb = pq_codebooks(emb, dim=64, n_sub=4, n_codes=16, n_iter=2)
        return pq_adc_topk(
            emb, emb.filter(F.col("vec_id") < 8), cb,
            dim=64, n_sub=4, n_candidates=32, k=5,
        )

    emb_base_max = emb1.agg(F.max("vec_id")).first()[0]
    _pq_incr_state: dict = {}

    def pq_incr_gate(emb):
        # r13: batch-arrival PQ — bounded arrival batch (replica-0
        # slice) probing the 100x standing corpus through a PERSISTED
        # code table + frozen codebooks (state built once in the
        # untimed warm pass, the amortized standing cost); the timed
        # path is the ingest cost: arrival encode + codes-only ADC
        # scan + shortlist rerank
        from hive_scd_spark.operators.similarity import (
            pq_codebooks,
            pq_encode,
            pq_incremental_topk,
        )

        is_new = (F.col("vec_id") % 25 == 0) & (F.col("vec_id") <= emb_base_max)
        standing, new = emb.filter(~is_new), emb.filter(is_new)
        key = id(emb)
        if key not in _pq_incr_state:
            cb = pq_codebooks(
                standing, dim=64, n_sub=4, n_codes=16, n_iter=2
            ).persist()
            codes = pq_encode(standing, cb, dim=64, n_sub=4).persist()
            cb.count(), codes.count()
            _pq_incr_state[key] = (cb, codes)
        cb, codes = _pq_incr_state[key]
        return pq_incremental_topk(
            new, standing, cb, corpus_codes=codes,
            dim=64, n_sub=4, n_candidates=32, k=5,
        )

    def ivf_pq_gate(emb):
        # round-15 (VERDICT r14 task 3): the composed IVF x PQ serving
        # row.  Centroid COUNT held fixed (stride ∝ corpus — the
        # ivf_cosine_topk lesson); codebook/query set recipe constants.
        from hive_scd_spark.operators.similarity import ivf_pq_topk, pq_codebooks

        nvec = emb.count()
        cb = pq_codebooks(emb, dim=64, n_sub=4, n_codes=16, n_iter=2)
        return ivf_pq_topk(
            emb, emb.filter(F.col("vec_id") < 8), cb,
            dim=64, n_sub=4, k=5, n_probe=4, n_candidates=32,
            stride=max(1, round(nvec / 172)),
        )

    _ivf_pq_incr_state: dict = {}

    def ivf_pq_incr_gate(emb):
        # round-15: frozen-index ingest — state built once in the
        # untimed warm pass (the pq_incr_gate rule); the timed path is
        # the arrival cost: bounded encode+assign + probe-restricted
        # codes scan + shortlist rerank.
        from hive_scd_spark.operators.similarity import (
            ivf_assign,
            ivf_centroids,
            ivf_pq_incremental_topk,
            pq_codebooks,
            pq_encode,
        )

        is_new = (F.col("vec_id") % 25 == 0) & (F.col("vec_id") <= emb_base_max)
        standing, new = emb.filter(~is_new), emb.filter(is_new)
        key = id(emb)
        if key not in _ivf_pq_incr_state:
            nvec = standing.count()
            cent = ivf_centroids(
                standing, stride=max(1, round(nvec / 172))
            ).persist()
            cb = pq_codebooks(
                standing, dim=64, n_sub=4, n_codes=16, n_iter=2
            ).persist()
            codes = pq_encode(standing, cb, dim=64, n_sub=4).persist()
            assign = ivf_assign(standing, centroids=cent).persist()
            cent.count(), cb.count(), codes.count(), assign.count()
            _ivf_pq_incr_state[key] = (cent, cb, codes, assign)
        cent, cb, codes, assign = _ivf_pq_incr_state[key]
        return ivf_pq_incremental_topk(
            new, standing, cb, cent,
            corpus_codes=codes, corpus_assign=assign,
            dim=64, n_sub=4, k=5, n_probe=4, n_candidates=32,
        )

    def nb_gate(d):
        # r12 session 2: NB classifier — V-bounded model, linear scans
        from hive_scd_spark.operators.quality import nb_logodds

        is_pos = F.col("source").isin("src0", "src1")
        is_neg = F.col("source").isin("src2", "src3")
        return nb_logodds(
            d.filter(~is_pos & ~is_neg), "doc_id", "text",
            pos=d.filter(is_pos), neg=d.filter(is_neg), vocab_size=30,
        )

    def codeq_gate(d):
        # r12 session 2: row-local code filters — the pure-projection row
        from hive_scd_spark.operators.quality import code_quality_stats

        return code_quality_stats(d, "doc_id", "text")

    doc_experiments = [
        ("dedup_minhash_lsh", minhash_gate),
        ("dedup_exact_substring", substring_gate),
        ("dedup_minhash_incremental", incremental_gate),
        ("dedup_exact", exact_gate),
        ("dedup_simhash_near", simhash_gate),
        ("text_bm25_topk", bm25_gate),
        ("graph_pagerank_dups", pagerank_gate),
        ("dedup_cluster_assign", cluster_gate),
        ("decontam_ngram_overlap", decontam_gate),
        ("pack_sequences_ctx", pack_gate),
        ("pipeline_semantic_dedup", semantic_gate),
        ("pipeline_semantic_dedup_embed", semantic_embed_gate),
        ("fuzzy_typo_pairs", fuzzy_gate),
        ("decontam_bloom_screen", bloom_gate),
        ("text_bpe_batched", bpe_batched_gate),
        ("select_dsir_weights", dsir_gate),
        # round-10: the crawl first mile at scale (VERDICT r9 task 3)
        ("source_warc_scan", warc_scan_gate),
        ("pipeline_crawl_to_corpus", crawl_gate),
        ("pipeline_crawl_to_corpus_v2", crawl_v2_gate),
        ("text_bigram_logprob", bigram_gate),
        ("dedup_corpus_paragraphs", paragraphs_gate),
        ("text_clean_c4", c4_gate),
        ("dedup_winnow_pairs", winnow_gate),
        # round-12: df-capped winnow pairs, across-archive reshard,
        # and the mix→shuffle→pack capstone
        ("dedup_winnow_capped", winnow_capped_gate),
        ("source_warc_reshard_multi", reshard_multi_gate),
        ("pipeline_mix_shuffle_pack", mix_pack_gate),
        # round-12 session 2: the KenLM-class KN trigram filter
        ("text_kn_trigram_logprob", kn_gate),
        # round-12 session 2, later tranches
        ("select_nb_quality", nb_gate),
        ("text_code_quality", codeq_gate),
        # round-13 second tranche
        ("report_source_overlap", overlap_matrix_gate),
        # round-14: perceptual near-dup media (stub dHash + banded
        # Hamming; character bijections fully decorrelate replica
        # byte statistics, so buckets stay replica-local)
        ("multimodal_dedup_near", multimodal_near_gate),
        ("multimodal_dedup_near_audio", multimodal_near_audio_gate),
        ("multimodal_dedup_near_video", multimodal_near_video_gate),
    ]
    emb_experiments = [
        ("dedup_embedding_lsh_auto", emb_lsh_auto_gate),
        ("ann_lsh_topk", ann_gate),
        # round-12 session 2: PQ end-to-end
        ("ann_pq_adc_topk", pq_gate),
        # round-13: arrival probe against persisted PQ state
        ("ann_pq_incremental", pq_incr_gate),
        # round-15: the composed IVF x PQ serving row (task 3)
        ("ann_ivf_pq_topk", ivf_pq_gate),
        # round-15 second tranche: the amortized frozen-index ingest row
        ("ann_ivf_pq_incremental", ivf_pq_incr_gate),
    ]
    experiments = (
        [(lbl, fn, docs1, docs100) for lbl, fn in doc_experiments]
        + [(lbl, fn, emb1, emb100) for lbl, fn in emb_experiments]
        + [("sketch_quantile_totalprice", sketch_gate, orders1, orders100)]
        # round-12 session 2: frequent-items sketch over the 15M-element
        # Zipf stream derived from replicated orders
        + [("sketch_heavy_hitters", hh_gate, orders1, orders100)]
        # round-13 second tranche: the true event stream
        + [("events_anomaly_zscore", zscore_gate, ev1, ev100)]
    )
    # Inter-experiment isolation (session.gc_isolate — its docstring
    # carries the full two-mechanism rationale): at n=100 a dozen heavy
    # experiments' pinned checkpoint blocks exhaust the 8 GB unified
    # pool — measured r7: pipeline_semantic_dedup died
    # UNABLE_TO_ACQUIRE_MEMORY until GC freed the predecessors' blocks
    # (SCALE_NOTES r7).
    from hive_scd_spark.session import gc_isolate

    def isolate() -> None:
        gc_isolate(spark)

    results: dict[str, dict] = {}
    errors: dict[str, str] = {}
    # optional substring filter: scale_100x.py <sf_dir> <n> <name_filter>
    # re-measures a single row without paying the whole suite
    name_filter = sys.argv[3] if len(sys.argv) > 3 else ""
    if name_filter:
        # "!a,b,c" = exclude exact set; "a,b" (or trailing comma) =
        # include exact set; plain token = substring (legacy) — the
        # set forms exist for the SCALE100X_ISOLATE orchestrator
        if name_filter.startswith("!"):
            excl = set(name_filter[1:].split(","))
            experiments = [e for e in experiments if e[0] not in excl]
        elif "," in name_filter:
            incl = set(name_filter.split(","))
            experiments = [e for e in experiments if e[0] in incl]
        else:
            experiments = [e for e in experiments if name_filter in e[0]]
    # SCALE100X_RESUME=1: merge the crash-tolerant checkpoint back in
    # and skip labels already measured — the full suite (~40 min with
    # the min-of-2 heavy-row protocol) can then be driven as a series
    # of bounded invocations, each continuing where the last stopped;
    # errored labels are NOT skipped (they retry; a retry that succeeds
    # clears the carried error)
    if os.environ.get("SCALE100X_RESUME") == "1":
        ckpt_path = f"/tmp/scale{n}x_checkpoint.json"
        if os.path.exists(ckpt_path):
            with open(ckpt_path) as ckpt:
                prior = json.load(ckpt)
            results.update(prior.get("results", {}))
            errors.update(prior.get("errors", {}))
            experiments = [e for e in experiments if e[0] not in results]
            print(f"resume: {len(results)} rows carried, "
                  f"{len(experiments)} to run", flush=True)
    for label, fn, d1, d100 in experiments:
        isolate()
        try:
            fn(d1).write.format("noop").mode("overwrite").save()  # warm
            t1 = min(timed(f"{label} @1x", lambda: fn(d1)) for _ in range(2))
            fn(d100).write.format("noop").mode("overwrite").save()  # warm
            t100 = timed(f"{label} @{n}x", lambda: fn(d100))
            reps100 = 1
            # min-of-2 for heavy rows (VERDICT r12 task 5): single-rep
            # cross-session machine variance on >10 s rows burned the
            # r12 decontam episode (37.8 -> 58.8 -> ~50 s on zero code
            # changes); a second rep bounds it the way the 10x artifact
            # (min-of-2 throughout) already does
            if t100 > 10.0:
                t100 = min(t100, timed(f"{label} @{n}x rep2", lambda: fn(d100)))
                reps100 = 2
            ratio = round(t100 / t1, 2)
            print(f"{label:55s} {n}x/1x ratio = {ratio:6.2f}", flush=True)
            results[label] = {"t1": round(t1, 3), f"t{n}": round(t100, 3),
                              "ratio": ratio, "reps100": reps100}
            errors.pop(label, None)  # a successful retry clears the error
            if label in CONTRAST_ROWS:
                results[label]["contrast"] = CONTRAST_ROWS[label]
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).strip().splitlines()[0] if str(exc).strip() else repr(exc)
            errors[label] = f"{type(exc).__name__}: {msg[:300]}"
        # crash-tolerant evidence: a JVM death mid-suite (the r9 re-run
        # OOM'd at pipeline_semantic_dedup and the partial ratios died
        # with the process) must not erase measured experiments
        with open(f"/tmp/scale{n}x_checkpoint.json", "w") as ckpt:
            json.dump({"results": results, "errors": errors}, ckpt)
    out = {
        "metric": f"scale{n}x_ratios",
        "unit": "sec",
        "sf_base": os.path.basename(sf_dir.rstrip("/")),
        "replication": n,
        "queries": results,
    }
    if errors:
        out["errors"] = errors
        out["partial"] = True
    print(json.dumps(out))
    if errors:
        sys.exit(1 if not results else 2)


if __name__ == "__main__":
    main()
