"""Semantics tests for the round-6 operators: Gopher-style repetition
stats, unigram LM scoring, token-budget mixing, PII redaction,
sliding-window chunking, corpus n-gram stats, int8 quantization.
Cross-engine equivalence is covered by the oracle harness
(scripts/check_contract.py); these pin hand-computed semantics on tiny
inline fixtures."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


# -- repetition_stats --------------------------------------------------------


def test_repetition_dup_lines(spark):
    from hive_scd_spark.operators.quality import repetition_stats

    # 4 lines, "aa bb" appears 3x: dup_line_frac = 2/4; dup chars =
    # 2*5 of 5+5+7+5 = 22 chars
    df = spark.createDataFrame(
        [(1, "aa bb\naa bb\ncc dd e\naa bb")], "doc_id long, text string"
    )
    r = repetition_stats(df, "doc_id", "text").collect()[0]
    assert r.n_lines == 4
    assert r.dup_line_frac == round(2 / 4, 6)
    assert r.dup_line_char_frac == round(10 / 22, 6)
    assert r.repetitive == 1  # 10/22 > 0.30


def test_repetition_top_token_and_bigram(spark):
    from hive_scd_spark.operators.quality import repetition_stats

    # tokens: x x x y -> top token 3/4; bigrams: "x x","x x","x y" -> 2/3
    df = spark.createDataFrame([(1, "x x x y")], "doc_id long, text string")
    r = repetition_stats(df, "doc_id", "text").collect()[0]
    assert r.top_token_frac == 0.75
    assert r.top_bigram_frac == round(2 / 3, 6)
    assert r.repetitive == 1  # bigram frac > 0.18


def test_repetition_single_token_no_bigrams(spark):
    from hive_scd_spark.operators.quality import repetition_stats

    df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    r = repetition_stats(df, "doc_id", "text").collect()[0]
    assert r.n_lines == 1
    assert r.top_token_frac == 1.0
    assert r.top_bigram_frac == 0.0
    assert r.repetitive == 0


def test_repetition_clean_doc_not_flagged(spark):
    from hive_scd_spark.operators.quality import repetition_stats

    df = spark.createDataFrame(
        [(1, "one two three\nfour five six\nseven eight nine")],
        "doc_id long, text string",
    )
    r = repetition_stats(df, "doc_id", "text").collect()[0]
    assert r.dup_line_frac == 0.0
    assert r.dup_line_char_frac == 0.0
    assert r.repetitive == 0


# -- unigram_logprob ---------------------------------------------------------


def test_unigram_logprob_hand_computed(spark):
    from hive_scd_spark.operators.quality import unigram_logprob

    # corpus tokens: a a a b b c — total 6; vocab_size=2 keeps a(3), b(2);
    # c is OOV with floor count 1
    df = spark.createDataFrame(
        [(1, "a a a"), (2, "b b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in unigram_logprob(df, "doc_id", "text", vocab_size=2).collect()}
    assert out[1].n_tokens == 3 and out[1].n_oov == 0
    assert out[1].avg_logprob == round(math.log(3 / 6), 6)
    assert out[2].n_tokens == 3 and out[2].n_oov == 1
    expect2 = (2 * math.log(2 / 6) + math.log(1 / 6)) / 3
    assert out[2].avg_logprob == round(expect2, 6)
    assert out[2].oov_frac == round(1 / 3, 6)


def test_unigram_logprob_vocab_tiebreak_deterministic(spark):
    from hive_scd_spark.operators.quality import unigram_logprob

    # b and c tie at count 2; vocab_size=2 keeps a(3) and b (tie -> token asc)
    df = spark.createDataFrame(
        [(1, "a a a b b c c")], "doc_id long, text string"
    )
    r = unigram_logprob(df, "doc_id", "text", vocab_size=2).collect()[0]
    assert r.n_oov == 2  # both c's fell out


def test_unigram_logprob_rejects_bad_vocab(spark):
    from hive_scd_spark.operators.quality import unigram_logprob

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="vocab_size"):
        unigram_logprob(df, "doc_id", "text", vocab_size=0)


# -- cap_tokens_per_group ----------------------------------------------------


def test_token_budget_keeps_straddling_row(spark):
    from hive_scd_spark.operators.sampling import cap_tokens_per_group

    # one group; md5 order of ids 1..4 decides the visit order; budget 10
    df = spark.createDataFrame(
        [(1, "g", 4), (2, "g", 4), (3, "g", 4), (4, "g", 4)],
        "id long, grp string, n long",
    )
    out = cap_tokens_per_group(df, "grp", "id", "n", budget=10, cum_col="before")
    rows = sorted(out.collect(), key=lambda r: r.before)
    # 4+4 = 8 < 10 so a third row straddles (before=8 < 10); the fourth
    # (before=12) is dropped
    assert [r.before for r in rows] == [0, 4, 8]
    assert sum(r.n for r in rows) == 12  # budget is a floor: >= 10


def test_token_budget_deterministic_across_layout(spark):
    from hive_scd_spark.operators.sampling import cap_tokens_per_group

    rows = [(i, f"s{i % 3}", 10 + i % 7) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, grp string, n long")
    a = sorted(r.id for r in cap_tokens_per_group(df, "grp", "id", "n", 50).collect())
    b = sorted(
        r.id
        for r in cap_tokens_per_group(
            df.repartition(13).sortWithinPartitions("n"), "grp", "id", "n", 50
        ).collect()
    )
    assert a == b


def test_token_budget_rejects_bad_budget(spark):
    from hive_scd_spark.operators.sampling import cap_tokens_per_group

    df = spark.createDataFrame([(1, "g", 1)], "id long, grp string, n long")
    with pytest.raises(ValueError, match="budget"):
        cap_tokens_per_group(df, "grp", "id", "n", budget=0)


# -- redact_pii --------------------------------------------------------------


def test_redact_pii_all_kinds(spark):
    from hive_scd_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b@test.org or call +1 555-0134 221 from 10.0.0.7 ok"),
            (2, "nothing here"),
            (3, "us style (415) 555-2671 twice (415) 555-2672"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(df, "doc_id", "text").collect()}
    assert out[1].redacted_text == "mail <EMAIL> or call <PHONE> from <IP> ok"
    assert (out[1].n_emails, out[1].n_phones, out[1].n_ips) == (1, 1, 1)
    assert out[2].redacted_text == "nothing here"
    assert (out[2].n_emails, out[2].n_phones, out[2].n_ips) == (0, 0, 0)
    assert out[3].n_phones == 2


def test_redact_pii_ip_domain_is_not_email(spark):
    from hive_scd_spark.operators.text import redact_pii

    # no alpha TLD => not an email; the embedded IPv4 still redacts
    df = spark.createDataFrame([(1, "ssh root@10.0.0.1 now")], "doc_id long, text string")
    r = redact_pii(df, "doc_id", "text").collect()[0]
    assert r.redacted_text == "ssh root@<IP> now"
    assert (r.n_emails, r.n_phones, r.n_ips) == (0, 0, 1)


# -- chunk_text_tokens -------------------------------------------------------


def test_chunk_short_doc_single_chunk(spark):
    from hive_scd_spark.operators.text import chunk_text_tokens

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = chunk_text_tokens(df, "doc_id", "text", window=8, stride=4).collect()
    assert len(rows) == 1
    assert rows[0].chunk_id == 0 and rows[0].n_chunk_tokens == 3
    assert rows[0].chunk_text == "a b c"


def test_chunk_overlap_and_tail(spark):
    from hive_scd_spark.operators.text import chunk_text_tokens

    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        chunk_text_tokens(df, "doc_id", "text", window=4, stride=3).collect(),
        key=lambda r: r.chunk_id,
    )
    # n=10, window=4, stride=3 -> 1 + ceil(6/3) = 3 chunks at 0,3,6
    assert [r.start_tok for r in rows] == [0, 3, 6]
    assert [r.n_chunk_tokens for r in rows] == [4, 4, 4]
    assert rows[1].chunk_text == "t3 t4 t5 t6"
    # every token is covered
    covered = set()
    for r in rows:
        covered.update(range(r.start_tok, r.start_tok + r.n_chunk_tokens))
    assert covered == set(range(10))


def test_chunk_tail_is_short(spark):
    from hive_scd_spark.operators.text import chunk_text_tokens

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(11)))], "doc_id long, text string"
    )
    rows = sorted(
        chunk_text_tokens(df, "doc_id", "text", window=4, stride=3).collect(),
        key=lambda r: r.chunk_id,
    )
    # n=11 -> 1 + ceil(7/3) = 4 chunks; last starts at 9, only 2 tokens
    assert [r.start_tok for r in rows] == [0, 3, 6, 9]
    assert rows[-1].n_chunk_tokens == 2


def test_chunk_rejects_bad_params(spark):
    from hive_scd_spark.operators.text import chunk_text_tokens

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_text_tokens(df, "doc_id", "text", window=0, stride=1)
    with pytest.raises(ValueError):
        chunk_text_tokens(df, "doc_id", "text", window=4, stride=8)


# -- top_ngrams --------------------------------------------------------------


def test_top_ngrams_counts_and_tiebreak(spark):
    from hive_scd_spark.operators.quality import top_ngrams

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    rows = top_ngrams(df, "text", n=2, k=3).collect()
    # "a b": 3 (two in doc1, one in doc2); "b a": 1; "b c": 1 (tie -> gram asc)
    assert [(r.ngram, r.cnt) for r in rows] == [("a b", 3), ("b a", 1), ("b c", 1)]


def test_top_ngrams_rejects_bad_params(spark):
    from hive_scd_spark.operators.quality import top_ngrams

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        top_ngrams(df, "text", n=0, k=5)


# -- quantize_embeddings -----------------------------------------------------


def test_quantize_roundtrip_bound(spark):
    from hive_scd_spark.operators.similarity import quantize_embeddings

    rows = [(1, [0.5, -1.0, 0.25, 0.0]), (2, [2.0, 1.0, -2.0, 0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in quantize_embeddings(df, "vec_id", "embedding").collect()}
    for vid, vec in rows:
        r = out[vid]
        assert max(abs(q) for q in r.q) == 127  # max magnitude maps to full scale
        for orig, q in zip(vec, r.q):
            assert -127 <= q <= 127
            # slack: r.scale is rounded to 9 places for the value hash,
            # which shifts q*scale by up to |q|*5e-10 ~ 6.4e-8
            assert abs(orig - q * r.scale) <= r.scale / 2 + 1e-6


def test_quantize_zero_vector(spark):
    from hive_scd_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    r = quantize_embeddings(df, "vec_id", "embedding").collect()[0]
    assert r.scale == 0.0 and list(r.q) == [0, 0, 0]


# -- remove_boilerplate_lines ------------------------------------------------


def test_boilerplate_strips_common_lines_keeps_rare(spark):
    from hive_scd_spark.operators.quality import remove_boilerplate_lines

    rows = [
        (1, "alpha one\nCOMMON FOOTER\nbeta"),
        (2, "gamma two\ncommon footer"),
        (3, "delta three\nCommon Footer\nrare pair"),
        (4, "epsilon four\nrare pair"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(df, "doc_id", "text", min_docs=3).collect()
    }
    # "common footer" normalizes identically in 3 docs -> stripped everywhere
    assert out[1].text == "alpha one\nbeta"
    assert out[2].text == "gamma two"
    # "rare pair" is only in 2 docs (< min_docs) -> kept
    assert out[3].text == "delta three\nrare pair"
    assert out[4].text == "epsilon four\nrare pair"
    assert out[1].n_lines_removed == 1 and out[4].n_lines_removed == 0


def test_boilerplate_preserves_order_and_empty_lines(spark):
    from hive_scd_spark.operators.quality import remove_boilerplate_lines

    rows = [
        (1, "z last\n\nbp\na first"),
        (2, "bp\nmid"),
        (3, "bp\nother"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(df, "doc_id", "text", min_docs=3).collect()
    }
    # original order kept; the empty line survives (not boilerplate-countable)
    assert out[1].text == "z last\n\na first"
    assert out[1].n_lines_kept == 3 and out[1].n_lines_removed == 1


def test_boilerplate_all_removed_yields_empty_doc(spark):
    from hive_scd_spark.operators.quality import remove_boilerplate_lines

    rows = [(1, "bp"), (2, "bp"), (3, "bp"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(df, "doc_id", "text", min_docs=3).collect()
    }
    assert out[1].text == "" and out[1].n_lines_kept == 0
    # NULL text survives as an empty document, not a dropped row
    assert out[4].text == "" and out[4].n_lines_kept == 1


def test_boilerplate_rejects_bad_min_docs(spark):
    from hive_scd_spark.operators.quality import remove_boilerplate_lines

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_docs"):
        remove_boilerplate_lines(df, "doc_id", "text", min_docs=1)


# -- url_domain_stats --------------------------------------------------------


def test_url_domains_normalize_and_block(spark):
    from hive_scd_spark.operators.text import url_domain_stats

    rows = [
        (1, "x https://www.Spam.Example/p y http://ok.org/q z"),
        (2, "no urls"),
        (3, "https://a.example https://a.example/two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in url_domain_stats(df, "doc_id", "text", blocklist=["spam.example"]).collect()
    }
    assert out[1].domains_csv == "spam.example,ok.org"
    assert out[1].n_urls == 2 and out[1].blocked == 1
    assert out[2].domains_csv == "" and out[2].n_urls == 0 and out[2].blocked == 0
    assert out[3].domains_csv == "a.example,a.example" and out[3].blocked == 0


def test_url_domains_no_blocklist(spark):
    from hive_scd_spark.operators.text import url_domain_stats

    df = spark.createDataFrame(
        [(1, "see https://x.org/a")], "doc_id long, text string"
    )
    r = url_domain_stats(df, "doc_id", "text").collect()[0]
    assert r.blocked == 0 and r.domains_csv == "x.org"


# -- split_assign ------------------------------------------------------------


def test_split_assign_partitions_and_weights(spark):
    from hive_scd_spark.operators.sampling import split_assign

    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    out = split_assign(df, "id").groupBy("split").count().collect()
    counts = {r.split: r["count"] for r in out}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    # hash uniformity: 80/10/10 within a loose tolerance
    assert 1400 < counts["train"] < 1800
    assert 100 < counts["val"] < 320
    assert 100 < counts["test"] < 320


def test_split_assign_deterministic_and_salted(spark):
    from hive_scd_spark.operators.sampling import split_assign

    df = spark.createDataFrame([(i,) for i in range(300)], "id long")
    a = {r.id: r.split for r in split_assign(df, "id").collect()}
    b = {r.id: r.split for r in split_assign(df.repartition(7), "id").collect()}
    assert a == b  # layout-independent
    c = {r.id: r.split for r in split_assign(df, "id", salt="other").collect()}
    assert a != c  # a new salt is a genuinely new split


def test_split_assign_rejects_bad_weights(spark):
    from hive_scd_spark.operators.sampling import split_assign

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="per-mille"):
        split_assign(df, "id", splits=(("a", 500), ("b", 400)))


# -- script_detect -----------------------------------------------------------


def test_script_detect_scripts(spark):
    from hive_scd_spark.operators.text import script_detect

    rows = [
        (1, "hello plain english words"),
        (2, "привет мир сегодня"),
        (3, "你好世界"),
        (4, "مرحبا بالعالم"),
        (5, "안녕하세요 세계"),
        (6, "नमस्ते दुनिया"),
        (7, "12345 !!!"),  # no letters of any script
        (8, "hello мир"),  # mixed: latin 5 vs cyrillic 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in script_detect(df, "doc_id", "text").collect()}
    assert out[1].pred_script == "latin" and out[1].script_frac == 1.0
    assert out[2].pred_script == "cyrillic"
    assert out[3].pred_script == "cjk"
    assert out[4].pred_script == "arabic"
    assert out[5].pred_script == "hangul"
    assert out[6].pred_script == "devanagari"
    assert out[7].pred_script == "und" and out[7].n_letters == 0
    assert out[8].pred_script == "latin"
    assert out[8].script_frac == round(5 / 8, 6)


def test_script_detect_null_text(spark):
    from hive_scd_spark.operators.text import script_detect

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = script_detect(df, "doc_id", "text").collect()[0]
    assert r.pred_script == "und" and r.n_letters == 0


# -- hash_embed --------------------------------------------------------------


def test_hash_embed_deterministic_and_identical_docs(spark):
    from hive_scd_spark.operators.similarity import hash_embed

    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat sat"), (3, "dogs run fast today"), (4, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in hash_embed(df, "doc_id", "text", dim=16).collect()}
    assert list(out[1].vec) == list(out[2].vec)  # same text, same vector
    assert out[1].n_tokens == 3 and out[3].n_tokens == 4
    # signed counts: component magnitudes sum to at most n_tokens
    assert sum(abs(v) for v in out[3].vec) <= 4
    # empty/NULL doc is the zero vector
    assert out[4].n_tokens == 0 and set(out[4].vec) == {0}
    # layout independence
    out2 = {
        r.doc_id: list(r.vec)
        for r in hash_embed(df.repartition(5), "doc_id", "text", dim=16).collect()
    }
    assert all(list(out[k].vec) == out2[k] for k in out2)


def test_hash_embed_case_and_whitespace_normalized(spark):
    from hive_scd_spark.operators.similarity import hash_embed

    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world")], "doc_id long, text string"
    )
    out = {r.doc_id: list(r.vec) for r in hash_embed(df, "doc_id", "text", dim=8).collect()}
    assert out[1] == out[2]


def test_hash_embed_rejects_bad_dim(spark):
    from hive_scd_spark.operators.similarity import hash_embed

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="dim"):
        hash_embed(df, "doc_id", "text", dim=0)


# -- strip_html --------------------------------------------------------------


def test_strip_html_tags_entities_whitespace(spark):
    from hive_scd_spark.operators.text import strip_html

    rows = [
        (1, '<p class="x">Hello <b>world</b></p>'),
        (2, "no markup"),
        (3, "a &amp; b &lt;kept&gt; &quot;q&quot;"),
        (4, "&amp;lt; stays escaped-once"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in strip_html(df, "doc_id", "text").collect()}
    assert out[1].stripped_text == "Hello world"
    assert out[1].n_tags == 4
    assert out[2].stripped_text == "no markup" and out[2].n_tags == 0
    assert out[3].stripped_text == 'a & b <kept> "q"'
    # &amp; decoded LAST: double-escaped input decodes exactly once
    assert out[4].stripped_text == "&lt; stays escaped-once"


def test_chunk_invariants_parameter_grid(spark):
    """Coverage invariants over a (doc_length × window × stride) grid,
    one Spark job per (window, stride): every token index is covered by
    ≥1 chunk, chunk starts advance by exactly stride, the tail chunk
    ends exactly at n, and overlap equals window - stride everywhere."""
    from hive_scd_spark.operators.text import chunk_text_tokens

    docs = [(n, " ".join(f"t{i}" for i in range(n))) for n in range(1, 40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for window, stride in [(1, 1), (4, 4), (4, 3), (8, 2), (5, 5), (7, 3)]:
        rows = chunk_text_tokens(df, "doc_id", "text", window=window, stride=stride).collect()
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        for n, _ in docs:
            chunks = sorted(by_doc[n], key=lambda r: r.chunk_id)
            # starts advance by exactly stride from zero
            assert [c.start_tok for c in chunks] == [i * stride for i in range(len(chunks))]
            covered = set()
            for c in chunks:
                assert 1 <= c.n_chunk_tokens <= window
                covered.update(range(c.start_tok, c.start_tok + c.n_chunk_tokens))
            assert covered == set(range(n)), (n, window, stride)
            # no chunk starts past the end; the final chunk reaches exactly n
            last = chunks[-1]
            assert last.start_tok < n
            assert last.start_tok + last.n_chunk_tokens == n
            # minimality: every chunk before the last is full-width
            assert all(c.n_chunk_tokens == window for c in chunks[:-1])


# -- review fixes: empty/NULL-doc semantics + contract foot-guns -------------


def test_repetition_empty_and_null_docs_are_zeroed(spark):
    from hive_scd_spark.operators.quality import repetition_stats

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "real text here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(df, "doc_id", "text").collect()}
    for i in (1, 2, 3):
        r = out[i]
        # no phantom '' token: an empty doc is NOT maximally repetitive
        assert r.n_lines == 0 and r.top_token_frac == 0.0
        assert r.repetitive == 0
    assert out[4].top_token_frac > 0


def test_repetition_line_sep_is_literal(spark):
    from hive_scd_spark.operators.quality import repetition_stats

    # '.' as separator must split on the DOT, not on every character
    df = spark.createDataFrame([(1, "aa bb.aa bb.cc")], "doc_id long, text string")
    r = repetition_stats(df, "doc_id", "text", line_sep=".").collect()[0]
    assert r.n_lines == 3
    assert r.dup_line_frac == round(1 / 3, 6)


def test_unigram_logprob_keeps_empty_docs(spark):
    from hive_scd_spark.operators.quality import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, ""), (3, None)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in unigram_logprob(df, "doc_id", "text", vocab_size=5).collect()}
    assert set(out) == {1, 2, 3}  # every input row survives
    for i in (2, 3):
        r = out[i]
        assert r.n_tokens == 0 and r.n_oov == 0 and r.oov_frac == 0.0
        assert r.avg_logprob is None
    assert out[1].n_tokens == 3


def test_chunk_empty_doc_yields_no_chunks(spark):
    from hive_scd_spark.operators.text import chunk_text_tokens

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "a b c")], "doc_id long, text string"
    )
    rows = chunk_text_tokens(df, "doc_id", "text", window=4, stride=3).collect()
    assert {r.doc_id for r in rows} == {3}  # no phantom '' chunks


def test_url_blocklist_entries_are_normalized(spark):
    from hive_scd_spark.operators.text import url_domain_stats

    df = spark.createDataFrame(
        [(1, "x https://www.spam.example/p y")], "doc_id long, text string"
    )
    # the exact forms extraction strips must still match
    for bl in (["WWW.Spam.Example"], ["www.spam.example"], ["spam.example"]):
        r = url_domain_stats(df, "doc_id", "text", blocklist=bl).collect()[0]
        assert r.blocked == 1, bl


def test_boilerplate_line_sep_is_literal(spark):
    from hive_scd_spark.operators.quality import remove_boilerplate_lines

    rows = [(1, "keep.bp"), (2, "bp.other"), (3, "bp.third")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(
            df, "doc_id", "text", min_docs=3, line_sep="."
        ).collect()
    }
    assert out[1].text == "keep" and out[1].n_lines_removed == 1
    assert out[2].text == "other"


# -- split_by_cluster --------------------------------------------------------


def test_split_by_cluster_members_share_split(spark):
    from hive_scd_spark.operators.sampling import split_by_cluster

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    # two multi-doc components, incl. a transitive chain 10-11-12-13
    # that no single pair states outright, plus a 2-cycle duplicate pair
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13), (50, 51), (51, 50)],
        "id_a long, id_b long",
    )
    out = {
        r.doc_id: (r.split_key, r.split)
        for r in split_by_cluster(docs, pairs).collect()
    }
    assert len(out) == 200
    # the leak-safety property: every component member shares key+split
    assert out[10] == out[11] == out[12] == out[13]
    assert out[10][0] == 10  # canonical id = min of the component
    assert out[50] == out[51] and out[50][0] == 50


def test_split_by_cluster_singletons_match_split_assign(spark):
    from hive_scd_spark.operators.sampling import split_assign, split_by_cluster

    docs = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    pairs = spark.createDataFrame([(7, 8)], "id_a long, id_b long")
    clustered = {
        r.doc_id: r.split for r in split_by_cluster(docs, pairs).collect()
    }
    plain = {r.doc_id: r.split for r in split_assign(docs, "doc_id").collect()}
    # introducing cluster-awareness perturbs ONLY paired documents:
    # every singleton keys on itself → identical assignment
    for i in range(300):
        if i not in (7, 8):
            assert clustered[i] == plain[i], i
    assert clustered[7] == clustered[8] == plain[7]  # both inherit min-id 7


def test_split_by_cluster_layout_independent(spark):
    from hive_scd_spark.operators.sampling import split_by_cluster

    docs = spark.createDataFrame([(i,) for i in range(120)], "doc_id long")
    pairs = spark.createDataFrame(
        [(2 * i, 2 * i + 1) for i in range(20)], "id_a long, id_b long"
    )
    a = {r.doc_id: r.split for r in split_by_cluster(docs, pairs).collect()}
    b = {
        r.doc_id: r.split
        for r in split_by_cluster(
            docs.repartition(7), pairs.repartition(3)
        ).collect()
    }
    assert a == b


# -- canonicalize_url / url_canonical_dedup ----------------------------------


def test_canonicalize_url_normalizations(spark):
    from hive_scd_spark.operators.text import canonicalize_url

    cases = {
        # scheme+host case, default port, www., trailing slash
        "HTTPS://WWW.Example.COM:443/Docs/5/": "https://example.com/Docs/5",
        "http://a.com:80/": "http://a.com",
        # NON-default port survives
        "http://a.com:8080/x": "http://a.com:8080/x",
        # tracking params stripped, remainder sorted, fragment dropped
        "https://a.com/x?utm_source=feed&b=2&a=1#frag": "https://a.com/x?a=1&b=2",
        # query emptied by tracking removal -> no '?'
        "https://a.com/x?utm_source=1&ref=rss": "https://a.com/x",
        # valueless param kept; a VALUE containing utm_ is not a key hit
        "https://a.com/x?flag&q=utm_test": "https://a.com/x?flag&q=utm_test",
        # not a URL: trimmed passthrough, never mangled
        "  not a url  ": "not a url",
        # path case is SIGNIFICANT and preserved
        "https://a.com/CaseSensitive": "https://a.com/CaseSensitive",
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    got = {r.u: r.c for r in df.select("u", canonicalize_url("u").alias("c")).collect()}
    for raw, want in cases.items():
        assert got[raw] == want, (raw, got[raw], want)


def test_url_canonical_dedup_keeper_and_flags(spark):
    from hive_scd_spark.operators.text import url_canonical_dedup

    rows = [
        (1, "https://a.com/x"),
        (2, "HTTPS://A.COM/x/"),          # same page, shouting crawl
        (3, "https://a.com/x?utm_source=t"),
        (4, "https://a.com/y"),            # distinct page
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.doc_id: r for r in url_canonical_dedup(df, "doc_id", "url").collect()}
    assert [out[i].keeper for i in (1, 2, 3)] == [1, 1, 1]
    assert [out[i].is_dup for i in (1, 2, 3, 4)] == [0, 1, 1, 0]
    assert out[4].keeper == 4
    assert out[2].url_canon == "https://a.com/x"


# -- url_optout_filter --------------------------------------------------------


def test_url_optout_filter_semantics(spark):
    from hive_scd_spark.operators.text import url_optout_filter

    rows = [
        (1, "https://a.com/private/x"),     # covered: prefix rule
        (2, "https://a.com/public/x"),      # same domain, other path
        (3, "HTTPS://WWW.B.COM/anything"),  # covered: whole-domain rule,
                                            # via www+case normalization
        (4, "https://c.com/private/x"),     # unlisted domain
        (5, "https://a.com/private"),       # exact-prefix boundary hit
        (6, "https://a.com/priv"),          # shorter than the prefix
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    rules = spark.createDataFrame(
        [("A.com", "/private"), ("www.b.com", None)],  # NULL prefix = ''
        "domain string, path_prefix string",
    )
    out = {r.doc_id: r for r in url_optout_filter(df, "doc_id", "url", rules).collect()}
    assert len(out) == 6  # every row survives
    assert [out[i].disallowed for i in (1, 2, 3, 4, 5, 6)] == [1, 0, 1, 0, 1, 0]
    assert out[3].domain == "b.com"


def test_url_optout_filter_multi_rule_domain_no_row_duplication(spark):
    from hive_scd_spark.operators.text import url_optout_filter

    df = spark.createDataFrame(
        [(i, f"https://hot.com/p{i}") for i in range(20)],
        "doc_id long, url string",
    )
    rules = spark.createDataFrame(
        [("hot.com", f"/p{i}") for i in range(5)],
        "domain string, path_prefix string",
    )
    out = url_optout_filter(df, "doc_id", "url", rules).collect()
    # rules pre-aggregate per domain: 5 rules never fan a row out 5x
    assert len(out) == 20
    assert sum(r.disallowed for r in out) == 5 + 10  # /p0../p4 + /p10../p19 via /p1


# -- quality_floor_per_group --------------------------------------------------


def test_quality_floor_rank_semantics(spark):
    from hive_scd_spark.operators.sampling import quality_floor_per_group

    rows = [
        # group a: 5 docs, scores 5..1 -> keep ceil(5*600/1000)=3
        *[(i, "a", float(5 - i)) for i in range(5)],
        # group b: 1 doc -> ceil(0.6)=1, every group keeps >= 1
        (10, "b", -7.0),
        # group c: ties broken by id (both score 1.0; keep ceil(1.2)=2)
        (20, "c", 1.0),
        (21, "c", 1.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, score double")
    out = quality_floor_per_group(df, "grp", "doc_id", "score", 600)
    got = {(r.grp, r.doc_id): (r.q_rank, r.n_group) for r in out.collect()}
    assert sorted(k[1] for k in got if k[0] == "a") == [0, 1, 2]
    assert got[("a", 0)] == (1, 5)
    assert got[("b", 10)] == (1, 1)
    assert sorted(k[1] for k in got if k[0] == "c") == [20, 21]
    assert got[("c", 20)][0] == 1  # id tiebreak: lower id ranks first


def test_quality_floor_keep_all_and_validation(spark):
    import pytest as _pytest

    from hive_scd_spark.operators.sampling import quality_floor_per_group

    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(7)],
        "doc_id long, grp string, score double",
    )
    assert quality_floor_per_group(df, "grp", "doc_id", "score", 1000).count() == 7
    with _pytest.raises(ValueError, match="keep_permille"):
        quality_floor_per_group(df, "grp", "doc_id", "score", 0)
    with _pytest.raises(ValueError, match="keep_permille"):
        quality_floor_per_group(df, "grp", "doc_id", "score", 1001)


# -- dedupe_lines_in_doc ------------------------------------------------------


def test_dedupe_lines_in_doc_semantics(spark):
    from hive_scd_spark.operators.quality import dedupe_lines_in_doc

    df = spark.createDataFrame(
        [
            # 'Menu' repeats verbatim and as a normalized variant; the
            # blank separator lines both survive; first form kept verbatim
            (1, "Menu\nitem a\nMenu\n\nbody text\n  MENU \n\ntail"),
            (2, "no repeats\nhere"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedupe_lines_in_doc(df, "doc_id", "text").collect()}
    assert out[1].text == "Menu\nitem a\n\nbody text\n\ntail"
    assert (out[1].n_lines_kept, out[1].n_lines_removed) == (6, 2)
    assert out[2].text == "no repeats\nhere"
    assert out[2].n_lines_removed == 0
    assert out[3].text == "" and out[3].n_lines_kept == 1  # [''] split semantics
    assert out[4].text == ""  # NULL rides through as empty


def test_dedupe_lines_in_doc_composes_with_boilerplate(spark):
    from hive_scd_spark.operators.quality import (
        dedupe_lines_in_doc,
        remove_boilerplate_lines,
    )

    # same contract -> the two compose: intra-doc dedup first, then the
    # cross-doc census strips the shared footer
    rows = [(i, f"unique {i}\nfooter\nfooter") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    step1 = dedupe_lines_in_doc(df, "doc_id", "text")
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(step1, "doc_id", "text", min_docs=3).collect()
    }
    assert all(out[i].text == f"unique {i}" for i in range(4))


# -- bigram_logprob -----------------------------------------------------------


def test_bigram_logprob_hand_computed(spark):
    from hive_scd_spark.operators.quality import bigram_logprob

    # corpus tokens: d1 = a b a b, d2 = a c; vocab_size=2 keeps a(3),
    # b(2); c -> <unk>.  Train bigrams: (a,b)x2, (b,a), (a,<unk>);
    # contexts: a=3, b=1; denominators c(w1)+V+1 = c(w1)+3
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "solo"), (4, "")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in bigram_logprob(df, "doc_id", "text", vocab_size=2).collect()
    }
    assert out[1].n_bigrams == 3 and out[1].n_unseen == 0
    # (a,b): ln(3/6); (b,a): ln(2/4); (a,b): ln(3/6) -> all ln(.5)
    assert out[1].avg_bigram_logprob == round(math.log(0.5), 6)
    assert out[2].n_bigrams == 1
    assert out[2].avg_bigram_logprob == round(math.log(2 / 6), 6)
    assert (out[3].n_bigrams, out[3].avg_bigram_logprob) == (0, None)
    assert (out[4].n_bigrams, out[4].avg_bigram_logprob) == (0, None)


def test_bigram_logprob_separate_train_corpus(spark):
    from hive_scd_spark.operators.quality import bigram_logprob

    # trained on ordinary transitions; scored corpus has one ordinary
    # doc and one word-salad doc with the SAME unigrams reversed into
    # transitions never seen in training
    train = spark.createDataFrame(
        [(100 + i, "the cat sat on the mat") for i in range(5)],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "mat the on sat cat the")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in bigram_logprob(
            score, "doc_id", "text", vocab_size=10, train=train
        ).collect()
    }
    assert out[1].n_unseen == 0
    assert out[2].n_unseen > 0
    # the conditional model separates them; a unigram model could not
    assert out[1].avg_bigram_logprob > out[2].avg_bigram_logprob


def test_bigram_logprob_layout_independent_and_validation(spark):
    import pytest as _pytest

    from hive_scd_spark.operators.quality import bigram_logprob

    df = spark.createDataFrame(
        [(i, f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 5}") for i in range(40)],
        "doc_id long, text string",
    )
    a = {
        r.doc_id: (r.n_bigrams, r.avg_bigram_logprob)
        for r in bigram_logprob(df, "doc_id", "text", vocab_size=4).collect()
    }
    b = {
        r.doc_id: (r.n_bigrams, r.avg_bigram_logprob)
        for r in bigram_logprob(
            df.repartition(7), "doc_id", "text", vocab_size=4
        ).collect()
    }
    assert a == b
    with _pytest.raises(ValueError, match="vocab_size"):
        bigram_logprob(df, "doc_id", "text", vocab_size=0)
