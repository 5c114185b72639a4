"""Round-10 corpus-cleaning operators: cross-document paragraph dedup
(the CCNet first pass) and the C4 line/page rules."""


def test_dedup_paragraphs_keeps_global_first_occurrence(spark):
    from hive_scd_spark.operators.dedup import dedup_paragraphs

    rows = [
        (1, "shared promo\n\nunique one"),
        (2, "unique two\n\nshared promo"),  # later doc loses the promo
        (3, "SHARED PROMO  \n\nunique three"),  # normalized dup loses too
        (4, "only unique four"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_paragraphs(df, "doc_id", "text").collect()}
    assert out[1].text == "shared promo\n\nunique one"
    assert out[1].n_paras_kept == 2 and out[1].n_paras_removed == 0
    assert out[2].text == "unique two"
    assert out[2].n_paras_removed == 1
    assert out[3].text == "unique three"  # kept verbatim, dup dropped
    assert out[4].text == "only unique four"


def test_dedup_paragraphs_first_occurrence_within_doc_order(spark):
    """The winner is the lexicographically smallest (id, paragraph
    index): a paragraph repeated WITHIN doc 1 keeps only its first
    slot, and doc 2's copy is removed."""
    from hive_scd_spark.operators.dedup import dedup_paragraphs

    rows = [
        (1, "dup para\n\nmiddle\n\ndup para"),
        (2, "dup para\n\ntail two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_paragraphs(df, "doc_id", "text").collect()}
    assert out[1].text == "dup para\n\nmiddle"
    assert out[1].n_paras_removed == 1
    assert out[2].text == "tail two"


def test_dedup_paragraphs_blanks_and_empty_docs_survive(spark):
    from hive_scd_spark.operators.dedup import dedup_paragraphs

    rows = [
        (1, "a\n\n  \n\na"),  # blank middle para survives; second 'a' dies
        (2, None),
        (3, "a"),  # fully deduped: doc 1 owns 'a'
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_paragraphs(df, "doc_id", "text").collect()}
    assert out[1].text == "a\n\n  "
    assert sorted(out) == [1, 2, 3]  # every doc survives
    # [''] is blank: it survives in the text but counts in NEITHER
    # counter (ADVICE r10 — blanks are separators, not content)
    assert out[2].text == "" and out[2].n_paras_kept == 0
    assert out[2].n_paras_removed == 0
    assert out[3].text == "" and out[3].n_paras_kept == 0
    assert out[3].n_paras_removed == 1


def test_dedup_paragraphs_layout_independent(spark):
    from hive_scd_spark.operators.dedup import dedup_paragraphs

    rows = [(i, f"common header\n\nbody {i % 3}") for i in range(1, 20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, dedup_paragraphs(df, "doc_id", "text").collect()))
    b = sorted(
        map(
            tuple,
            dedup_paragraphs(df.repartition(7, "doc_id"), "doc_id", "text").collect(),
        )
    )
    assert a == b
    by_id = {t[0]: t for t in a}
    assert by_id[1][1] == "common header\n\nbody 1"
    assert by_id[4][1] == ""  # header owned by 1, 'body 0' owned by 3... and 4 is body 1 — owned by 1
    assert by_id[2][1] == "body 2"


def test_clean_c4_lines_rules(spark):
    from hive_scd_spark.operators.text import clean_c4_lines

    good = [f"This is proper sentence number {i} indeed." for i in range(3)]
    doc_ok = "\n".join(
        good
        + [
            "too short.",  # < 5 words
            "no terminal punctuation here at all",  # no punct
            "Please enable JavaScript to view this page.",  # js filter
        ]
    )
    rows = [
        (1, doc_ok),
        (2, "\n".join(good[:2])),  # only 2 kept lines -> page dropped
        (3, doc_ok + "\nlorem ipsum dolor sit amet."),  # page filter
        (4, doc_ok.replace("number 0", "number { zero }")),  # '{' filter
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in clean_c4_lines(df, "doc_id", "text").collect()}
    assert sorted(out) == [1, 2, 3, 4, 5]  # every row survives
    assert out[1].kept == 1
    assert out[1].text == "\n".join(good)
    assert out[1].n_lines_kept == 3 and out[1].n_lines_removed == 3
    assert out[2].kept == 0 and out[2].text == ""
    assert out[2].n_lines_kept == 2  # line stats still reported
    assert out[3].kept == 0
    assert out[4].kept == 0
    assert out[5].kept == 0 and out[5].text == ""


def test_clean_c4_lines_quote_terminal_and_thresholds(spark):
    from hive_scd_spark.operators.text import clean_c4_lines

    rows = [(1, 'He said "this is a fine quoted line."\nAnother proper line is here now.')]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = clean_c4_lines(
        df, "doc_id", "text", min_words=5, min_kept_lines=2
    ).collect()[0]
    assert out.kept == 1 and out.n_lines_kept == 2
    # raising the page bar drops it
    out = clean_c4_lines(
        df, "doc_id", "text", min_kept_lines=3
    ).collect()[0]
    assert out.kept == 0


ROBOTS_BODY = """# policy file
User-agent: fancybot
Disallow: /secret

User-agent: *
User-agent: otherbot
Disallow: /docs/3   # trailing comment
Disallow:
Allow: /docs/public
Crawl-delay: 10
Disallow: /tmp

user-AGENT: GoodBot
disallow: /goodbot-only
"""


def test_parse_robots_rfc_group_semantics(spark):
    from hive_scd_spark.operators.text import parse_robots

    df = spark.createDataFrame(
        [("a.com", ROBOTS_BODY.encode("utf-8"))], "domain string, payload binary"
    )
    # default agent '*': the two-UA group applies ('/docs/3' and '/tmp' —
    # the rule AFTER Allow/Crawl-delay still attaches); fancybot's and
    # GoodBot's groups do not; the empty Disallow emits nothing
    rules = {(r.domain, r.path_prefix) for r in parse_robots(df, "domain", "payload").collect()}
    assert rules == {("a.com", "/docs/3"), ("a.com", "/tmp")}
    # RFC 9309 most-specific-group-wins (ADVICE r10): a named agent with
    # its OWN group sees only that group — the '*' group is shadowed
    rules = {
        r.path_prefix
        for r in parse_robots(df, "domain", "payload", agent="goodbot").collect()
    }
    assert rules == {"/goodbot-only"}
    rules = {
        r.path_prefix
        for r in parse_robots(df, "domain", "payload", agent="fancybot").collect()
    }
    assert rules == {"/secret"}
    # an agent named by NO group falls back to the '*' group
    rules = {
        r.path_prefix
        for r in parse_robots(df, "domain", "payload", agent="strangerbot").collect()
    }
    assert rules == {"/docs/3", "/tmp"}


def test_parse_robots_exact_empty_group_shadows_star(spark):
    """The ADVICE r10 motivating case: 'User-agent: mybot / Disallow:'
    (allow-all) beside 'User-agent: * / Disallow: /' must yield NO
    rules for mybot — the exact group wins even when it emits nothing."""
    from hive_scd_spark.operators.text import parse_robots

    body = "User-agent: mybot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    df = spark.createDataFrame([("m.com", body)], "domain string, payload string")
    assert parse_robots(df, "domain", "payload", agent="mybot").count() == 0
    # everyone else still gets the deny-all
    assert {
        r.path_prefix for r in parse_robots(df, "domain", "payload").collect()
    } == {"/"}
    # a group naming BOTH mybot and '*' is an exact group for mybot
    body2 = "User-agent: mybot\nUser-agent: *\nDisallow: /x\n"
    df2 = spark.createDataFrame([("m.com", body2)], "domain string, payload string")
    assert {
        r.path_prefix
        for r in parse_robots(df2, "domain", "payload", agent="mybot").collect()
    } == {"/x"}


def test_parse_robots_ua_after_rules_starts_new_group(spark):
    from hive_scd_spark.operators.text import parse_robots

    body = (
        "User-agent: botA\nDisallow: /a\n"
        "User-agent: botB\nDisallow: /b\n"
    )
    df = spark.createDataFrame([("x.com", body)], "domain string, payload string")
    assert {
        r.path_prefix for r in parse_robots(df, "domain", "payload", agent="botA").collect()
    } == {"/a"}
    assert {
        r.path_prefix for r in parse_robots(df, "domain", "payload", agent="botB").collect()
    } == {"/b"}


def test_parse_robots_composes_with_optout_filter(spark):
    from hive_scd_spark.operators.text import parse_robots, url_optout_filter

    robots = spark.createDataFrame(
        [("Shop.Example", "User-agent: *\nDisallow: /cart\n")],
        "domain string, payload string",
    )
    rules = parse_robots(robots, "domain", "payload")
    docs = spark.createDataFrame(
        [
            (1, "https://shop.example/cart/item9"),
            (2, "https://shop.example/about"),
            (3, "https://other.example/cart/x"),
        ],
        "doc_id long, url string",
    )
    out = {r.doc_id: r.disallowed for r in url_optout_filter(docs, "doc_id", "url", rules).collect()}
    assert out == {1: 1, 2: 0, 3: 0}


def test_parse_robots_empty_and_malformed(spark):
    from hive_scd_spark.operators.text import parse_robots

    df = spark.createDataFrame(
        [("a.com", None), ("b.com", ""), ("c.com", "just prose, no fields")],
        "domain string, payload string",
    )
    assert parse_robots(df, "domain", "payload").count() == 0


def test_winnow_guarantee_and_density(spark):
    """The winnowing guarantee: documents sharing a substring of
    length >= k + w - 1 share at least one fingerprint; the selected
    set is far smaller than the gram count."""
    from hive_scd_spark.operators.dedup import (
        winnow_dup_pairs,
        winnow_fingerprints,
    )

    shared = "the quick brown fox jumps over the lazy dog repeatedly"
    rows = [
        (1, "prefix one here. " + shared + " tail a"),
        (2, "totally different opening text! " + shared + " other end"),
        (3, "no overlap with anyone else in this corpus at all, none"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {r.doc_id: r for r in winnow_fingerprints(df, "doc_id", "text").collect()}
    # density: ~2/(w+1) of grams, far below the gram count
    n_grams = len(rows[0][1]) - 11
    assert 0 < fp[1].n_fingerprints < n_grams
    assert fp[1].fingerprints == sorted(set(fp[1].fingerprints))
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_dup_pairs(df, "doc_id", "text").collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1  # the guarantee
    assert not any(3 in p for p in pairs)


def test_winnow_hot_fingerprint_excluded(spark):
    from hive_scd_spark.operators.dedup import winnow_dup_pairs

    # every doc shares one boilerplate sentence; with max_df below the
    # corpus size the boilerplate fingerprints carry no pairs
    rows = [(i, f"unique body {i} " * 3 + "shared boilerplate sentence here") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert winnow_dup_pairs(df, "doc_id", "text", max_df=5).count() == 0
    # raising the cap lets the boilerplate pair everything
    assert winnow_dup_pairs(df, "doc_id", "text", max_df=10).count() == 45


def test_winnow_layout_independent_and_edgecases(spark):
    from hive_scd_spark.operators.dedup import winnow_fingerprints

    rows = [(1, "short"), (2, None), (3, "x" * 11)]  # all below k
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in winnow_fingerprints(df, "doc_id", "text").collect()}
    assert all(out[i].n_fingerprints == 1 for i in (1, 2, 3))  # whole-text gram
    big = spark.createDataFrame(
        [(i, f"document number {i} with some body text to hash") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, winnow_fingerprints(big, "doc_id", "text").collect()))
    b = sorted(
        map(tuple, winnow_fingerprints(big.repartition(7), "doc_id", "text").collect())
    )
    assert a == b


def test_compression_ratio_signal_and_python_reference(spark):
    """Rows-only gate discipline: exact compressed sizes pinned against
    CPython's zlib, and the signal orders as the filter assumes —
    repetitive < natural < random."""
    import zlib

    from hive_scd_spark.operators.quality import compression_ratio

    import random

    rng = random.Random(7)
    words = (
        "the quick brown fox jumps over lazy dog cat window sun day "
        "data model train corpus quality signal filter large small "
        "green river stone cloud paper metal glass night light".split()
    )
    natural = " ".join(rng.choice(words) for _ in range(200)) + "."
    repetitive = "buy now best price " * 60
    rand = "".join(chr(rng.randrange(0x21, 0x7F)) for _ in range(1000))
    rows = [(1, natural), (2, repetitive), (3, rand), (4, ""), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in compression_ratio(
            df, "doc_id", "text", min_ratio=0.2, max_ratio=0.8
        ).collect()
    }
    for i, t in rows:
        b = (t or "").encode("utf-8")
        assert out[i].n_bytes == len(b)
        assert out[i].n_compressed == len(zlib.compress(b, 6))  # exact
    assert out[2].ratio < out[1].ratio < out[3].ratio
    assert out[1].kept == 1          # varied prose inside the band
    assert out[2].kept == 0          # templated repetition: too compressible
    assert out[3].kept == 0          # random symbols: incompressible
    assert out[4].kept == 0 and out[5].kept == 0  # empty never kept
    assert out[2].ratio < 0.2 and out[3].ratio > 0.8


def test_winnow_guarantee_property(spark):
    """Property sweep: random document pairs with a planted shared
    substring of length >= k + w - 1 ALWAYS share a fingerprint
    (the winnowing theorem); unrelated random docs share none unless
    they genuinely repeat a k-gram window."""
    import random

    from hive_scd_spark.operators.dedup import winnow_dup_pairs

    rng = random.Random(42)
    k, w = 12, 8
    alphabet = "abcdefghijklmnopqrstuvwxyz "
    for trial in range(5):
        shared = "".join(rng.choice(alphabet) for _ in range(k + w - 1))
        mk = lambda: "".join(rng.choice(alphabet) for _ in range(rng.randint(30, 120)))  # noqa: E731
        rows = [
            (1, mk() + shared + mk()),
            (2, mk() + shared + mk()),
            (3, mk()),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = {
            (r.id_a, r.id_b)
            for r in winnow_dup_pairs(
                df, "doc_id", "text", k=k, w=w, min_shared=1
            ).collect()
        }
        assert (1, 2) in pairs, (trial, shared)


def _py_dedup_paragraphs(rows, sep="\n\n"):
    """Pure-Python reference for dedup_paragraphs."""
    winner = {}
    for doc_id, text in sorted(rows):
        for idx, p in enumerate((text or "").split(sep)):
            key = p.strip().lower()
            if key == "":
                continue
            if key not in winner or (doc_id, idx) < winner[key]:
                winner[key] = (doc_id, idx)
    out = {}
    for doc_id, text in rows:
        paras = (text or "").split(sep)
        kept = [
            p
            for i, p in enumerate(paras)
            if p.strip() == "" or winner[p.strip().lower()] == (doc_id, i)
        ]
        # counters see non-blank paragraphs only (ADVICE r10)
        n_kept = sum(1 for p in kept if p.strip() != "")
        n_content = sum(1 for p in paras if p.strip() != "")
        out[doc_id] = (sep.join(kept), n_kept, n_content - n_kept)
    return out


def test_dedup_paragraphs_matches_python_reference_property(spark):
    import random

    from hive_scd_spark.operators.dedup import dedup_paragraphs

    rng = random.Random(1001)
    pool = [f"para {i} content" for i in range(8)] + ["  ", ""]
    for trial in range(4):
        rows = [
            (
                d,
                "\n\n".join(
                    rng.choice(pool) for _ in range(rng.randint(1, 6))
                ),
            )
            for d in range(1, rng.randint(4, 12))
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.text, r.n_paras_kept, r.n_paras_removed)
            for r in dedup_paragraphs(df, "doc_id", "text").collect()
        }
        assert got == _py_dedup_paragraphs(rows), trial


def test_keep_cols_pass_through_both_cleaners(spark):
    """r11: keep_cols threads document metadata (URL, source) through
    clean_c4_lines and dedup_paragraphs without a downstream re-join;
    reserved-name collisions raise."""
    import pytest as _pytest

    from hive_scd_spark.operators.dedup import dedup_paragraphs
    from hive_scd_spark.operators.text import clean_c4_lines

    rows = [
        (1, "This is a proper long sentence one.\nshort", "https://a/1"),
        (2, "This is a proper long sentence one.\nAnother proper long"
            " sentence follows here too.\nAnd a third proper sentence"
            " closes the page.", "https://a/2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    c4 = clean_c4_lines(df, "doc_id", "text", keep_cols=("url",))
    got = {r.doc_id: r.url for r in c4.collect()}
    assert got == {1: "https://a/1", 2: "https://a/2"}

    dp = dedup_paragraphs(
        df.select("doc_id", "text", "url"), "doc_id", "text",
        sep="\n", keep_cols=("url",),
    )
    got = {r.doc_id: r.url for r in dp.collect()}
    assert got == {1: "https://a/1", 2: "https://a/2"}

    with _pytest.raises(ValueError, match="keep_cols.*collide"):
        clean_c4_lines(df, "doc_id", "text", keep_cols=("kept",))
    with _pytest.raises(ValueError, match="keep_cols.*collide"):
        dedup_paragraphs(df, "doc_id", "text", keep_cols=("n_paras_kept",))


def _py_parse_robots(text, agent="*"):
    """Independent Python reference implementing the documented
    semantics: comment strip, consecutive-UA group heads, empty
    Disallow emits nothing, exact-agent groups shadow '*'."""
    me = agent.lower()
    in_ua = exact = star = has_exact = False
    acc_exact, acc_star = [], []
    for raw in (text or "").split("\n"):
        line = raw.split("#", 1)[0].strip()
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip()
        is_ua = field == "user-agent"
        if is_ua:
            ua_me, ua_star = value.lower() == me, value == "*"
            if in_ua:
                exact, star = exact or ua_me, star or ua_star
            else:
                exact, star = ua_me, ua_star
            has_exact = has_exact or exact
        elif field == "disallow" and value != "":
            if exact and value not in acc_exact:
                acc_exact.append(value)
            elif star and not exact and value not in acc_star:
                acc_star.append(value)
        in_ua = is_ua
    return set(acc_exact) if has_exact else set(acc_star)


def test_parse_robots_fuzz_vs_python_reference(spark):
    """Random robots files (group shapes, case noise, comments, blank
    and junk lines, empty Disallows) against the independent Python
    reference, for '*' and two named agents."""
    import random

    from hive_scd_spark.operators.text import parse_robots

    rng = random.Random(911)
    fields = [
        lambda r: f"User-agent: {r.choice(['*', 'botA', 'BotB', 'other'])}",
        lambda r: f"user-AGENT:{r.choice(['*', 'botA', 'botb'])}",
        lambda r: f"Disallow: /p{r.randint(0, 5)}",
        lambda r: "Disallow:",
        lambda r: f"disallow: /q{r.randint(0, 3)}  # c",
        lambda r: "Allow: /x",
        lambda r: "Crawl-delay: 3",
        lambda r: "",
        lambda r: "just prose",
        lambda r: "# full comment",
    ]
    for trial in range(12):
        body = "\n".join(
            rng.choice(fields)(rng) for _ in range(rng.randint(3, 25))
        )
        df = spark.createDataFrame(
            [("f.com", body)], "domain string, payload string"
        )
        for agent in ("*", "botA", "botb"):
            got = {
                r.path_prefix
                for r in parse_robots(df, "domain", "payload", agent=agent).collect()
            }
            want = _py_parse_robots(body, agent)
            assert got == want, (trial, agent, body)
