"""Text-analysis operators: token stats / quality scoring, language ID
(stopword heuristic), document fingerprinting.  Everything is built-in
column expressions — the hot path has zero Python; at 100 TB these run
as a single codegen'd projection over the scan."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_scd_spark.functions import char_shingles

# Small per-language stopword lists (public, common knowledge).  Kept
# deliberately tiny and embedded so the DuckDB oracle can share them.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with", "for", "a"),
    "de": ("der", "die", "das", "und", "ist", "mit", "für", "ein", "nicht", "von"),
    "fr": ("le", "la", "les", "et", "est", "pour", "dans", "que", "une", "des"),
    "es": ("el", "la", "los", "y", "es", "para", "en", "que", "una", "de"),
}


def _tokens(text_col):
    # the shared tokenizer — contract (incl. the \x0B caveat) documented
    # once at functions.ws_tokens
    from hive_scd_spark.functions import ws_tokens

    return ws_tokens(text_col)


def quality_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality features: token count, char count, mean
    token length, punctuation ratio, stopword ratio, and a composite
    quality score in [0,1] (heuristic: length-normed minus punct-heavy,
    plus stopword signal — the usual pre-training filter features)."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    stop_hits = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc
        + F.when(t.isin(*STOPWORDS["en"]), F.lit(1)).otherwise(F.lit(0)),
    )
    stop_ratio = F.when(n_tokens > 0, stop_hits.cast("double") / n_tokens).otherwise(0.0)
    mean_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
        / n_tokens,
    ).otherwise(0.0)
    score = (
        F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)) * 0.5
        + (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.2
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-vote language ID: count hits per language's list, pick
    the argmax (ties → lexicographically first language; no hits →
    'und').  A deterministic n-gram-free heuristic; swap in a real
    model via mapInPandas when a language library is available."""
    toks = _tokens(text_col)

    def hits(words):
        # NB: the merge lambda must take exactly (acc, x) — extra
        # (even defaulted) params change the arity PySpark infers
        return F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc + F.when(t.isin(*words), F.lit(1)).otherwise(F.lit(0)),
        )

    scores = [
        hits(words).alias(f"score_{lang}") for lang, words in sorted(STOPWORDS.items())
    ]
    work = df.select(F.col(id_col), F.col(text_col), *scores)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties → fold from the back
        pred = F.when(
            (best > 0) & (F.col(f"score_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    return work.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        *[F.col(f"score_{lang}").alias(f"hits_{lang}") for lang in langs],
    )


def langdetect_available() -> bool:
    """True iff the ``langdetect`` package can be imported (feature
    detection — the hook for model-based language ID in environments
    that ship it)."""
    try:
        import langdetect  # noqa: F401

        return True
    except Exception:
        return False


def lang_id_model(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Model-based language ID via ``langdetect`` over Arrow-batched
    ``mapInPandas`` — the quality path over the stopword-vote heuristic
    (:func:`lang_id`, which stays the oracle-checkable default).
    Output: (id, pred_lang, confidence).  Deterministic: the detector
    seed is pinned per executor.  Raises ImportError with a clear
    message when the library is absent (use :func:`lang_id` there)."""
    if not langdetect_available():
        raise ImportError(
            "lang_id_model requires the 'langdetect' package, which is not "
            "importable here; use lang_id() (stopword-vote heuristic) instead"
        )

    schema = f"{id_col} long, pred_lang string, confidence double"

    def per_batch(batches):
        import pandas as pd
        from langdetect import DetectorFactory, detect_langs
        from langdetect.lang_detect_exception import LangDetectException

        DetectorFactory.seed = 0  # pin: langdetect is otherwise randomized
        for pdf in batches:
            preds, confs = [], []
            for text in pdf[text_col]:
                try:
                    best = detect_langs(str(text or ""))[0]
                    preds.append(best.lang)
                    confs.append(float(best.prob))
                except LangDetectException:
                    preds.append("und")
                    confs.append(0.0)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "pred_lang": preds, "confidence": confs}
            )

    return df.select(id_col, text_col).mapInPandas(per_batch, schema=schema)


# -- character-n-gram profile language ID ------------------------------------
# Seed text per language, authored here from public-knowledge common
# vocabulary (function words dominate — they ARE the n-gram signal a
# profile model keys on; cf. the Cavnar–Trenkle n-gram-profile method).
# Profiles derive deterministically from these strings at import, so
# the classifier needs no external model file and the DuckDB oracle can
# replay classification exactly from the same literal profiles.
_LANG_SEEDS: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and this is what "
        "they said when the people were there with their things because "
        "it would not have been the same for everyone that came after "
        "which of those could still be done more than once in a while"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und das "
        "ist was sie sagten als die leute dort waren mit ihren sachen "
        "weil es nicht dasselbe gewesen wäre für alle die danach kamen "
        "welche von denen noch einmal gemacht werden könnten und zwar schon"
    ),
    "fr": (
        "le renard brun rapide saute par dessus le chien paresseux et "
        "c'est ce qu'ils ont dit quand les gens étaient là avec leurs "
        "affaires parce que ce n'aurait pas été pareil pour tous ceux "
        "qui sont venus après lesquels pourraient encore être faits une fois"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y eso es "
        "lo que dijeron cuando la gente estaba allí con sus cosas porque "
        "no habría sido lo mismo para todos los que vinieron después "
        "cuáles de esos todavía podrían hacerse una vez más ahora mismo"
    ),
    # r6 second wave: the next three highest-volume Latin-script web
    # languages.  Seeds are original compositions over each language's
    # commonest function words (public knowledge), same register and
    # length as the first four so no profile dominates by seed size.
    "it": (
        "la rapida volpe marrone salta sopra il cane pigro e questo è "
        "quello che hanno detto quando le persone erano lì con le loro "
        "cose perché non sarebbe stato lo stesso per tutti quelli che "
        "sono venuti dopo alcuni dei quali si potrebbero ancora fare"
    ),
    "pt": (
        "a rápida raposa marrom pula sobre o cão preguiçoso e isso é o "
        "que eles disseram quando as pessoas estavam lá com as suas "
        "coisas porque não teria sido o mesmo para todos os que vieram "
        "depois alguns dos quais ainda poderiam ser feitos outra vez"
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond en dit is wat "
        "ze zeiden toen de mensen daar waren met hun spullen omdat het "
        "niet hetzelfde zou zijn geweest voor iedereen die daarna kwam "
        "waarvan sommige nog een keer gedaan zouden kunnen worden"
    ),
}

_PROFILE_TOP_K = 120


def _build_profiles(k: int = 3, top_k: int = _PROFILE_TOP_K) -> dict[str, list[str]]:
    """Top-*top_k* character *k*-grams of each padded, lowercased seed,
    ranked by frequency (ties broken lexically — deterministic)."""
    profiles = {}
    for lang, seed in _LANG_SEEDS.items():
        padded = f" {seed.lower()} "
        counts: dict[str, int] = {}
        for i in range(len(padded) - k + 1):
            g = padded[i : i + k]
            counts[g] = counts.get(g, 0) + 1
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        profiles[lang] = [g for g, _ in ranked[:top_k]]
    return profiles


LANG_PROFILES: dict[str, list[str]] = _build_profiles()


def lang_id_ngram(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Language ID by character-trigram profile overlap — the
    deterministic, dependency-free model path (VERDICT r5 task 7;
    ``lang_id`` stays the stopword-vote baseline and
    :func:`lang_id_model` the optional langdetect hook).

    Per document: distinct trigrams of the space-padded lowercased
    text, scored against each language's embedded profile by DISTINCT
    overlap count; prediction is the argmax (ties broken by profile
    declaration order), ``confidence = overlap / n_doc_trigrams``,
    'und' when nothing overlaps.  The oracle replays the identical
    profiles from a VALUES list, so classification is value-checked
    exactly.

    r12 formulation: trigram ROWS, not a trigram array.  The previous
    array form built ``array_distinct(transform(...))`` and referenced
    it once per language plus once for the size — projection collapse
    re-evaluated the INTERPRETED HOF lambda per reference (the known
    Generate/duplication trap, SCALE_NOTES r10/r12): measured 8.3 s at
    sf0.1.  Exploding positions first keeps the substring in codegen;
    doc rows are hash-partitioned by id up front so the distinct and
    the per-id score aggregation are both partition-local (one doc-row
    exchange total); per-language scores are codegen `isin` sums over
    the distinct rows: 2.0 s, byte-identical output.

    Honest quality note: the synthetic testdata's ``lang`` column is
    assigned independently of its (English pseudo-word) text, so
    corpus-label agreement is not a meaningful quality metric there;
    quality is pinned instead by multilingual fixtures in
    ``tests/test_operators.py`` (real sentences in all four languages
    must classify correctly)."""
    # coalesce: NULL text classifies as 'und' instead of propagating
    sc = df.sparkSession.sparkContext
    d = df.repartition(sc.defaultParallelism, F.col(id_col))
    padded = F.concat(
        F.lit(" "), F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(" ")
    )
    base = d.select(
        F.col(id_col),
        padded.alias("__p"),
        F.greatest(F.length(padded) - 2, F.lit(1)).alias("__n"),
    )
    e = (
        base.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("__i"),
            "__p",
        )
        .select(
            F.col(id_col), F.substring(F.col("__p"), F.col("__i"), 3).alias("__t")
        )
        .distinct()
    )
    langs = list(LANG_PROFILES)
    aggs = [
        F.sum(
            F.when(F.col("__t").isin(*LANG_PROFILES[lang]), 1).otherwise(0)
        )
        .cast("int")
        .alias(f"__s_{lang}")
        for lang in langs
    ]
    g = e.groupBy(id_col).agg(F.count("*").alias("__ntri"), *aggs)
    # argmax with declaration-order tiebreak: struct compare is
    # lexicographic, so (score, -position, lang) picks the highest
    # score and the EARLIEST language on ties
    best = F.greatest(
        *[
            F.struct(
                F.col(f"__s_{lang}").alias("s"),
                F.lit(-i).alias("o"),
                F.lit(lang).alias("l"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    pred = F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))
    conf = F.when(
        best["s"] > 0,
        F.round(best["s"].cast("double") / F.col("__ntri"), 6),
    ).otherwise(F.lit(0.0))
    return g.select(
        F.col(id_col), pred.alias("pred_lang"), conf.alias("confidence")
    )


TOKEN_REGEX = r"\w+|[^\w\s]"  # BPE-ish pre-tokenization: words + punct marks


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counting two ways: whitespace tokens (cheap length proxy)
    and a BPE-ish regex pre-tokenization (words and punctuation marks
    counted separately — the usual LLM-cost estimator input)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    bpe = F.regexp_count(F.col(text_col), F.lit(TOKEN_REGEX))
    chars_per_tok = F.when(bpe > 0, F.length(text_col).cast("double") / bpe).otherwise(
        F.lit(0.0)
    )
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_regex_tokens"),
        F.round(chars_per_tok, 6).alias("chars_per_token"),
    )


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str, k: int = 8) -> DataFrame:
    """Content fingerprint: (min, max) of shingle hashes + shingle count
    — a cheap rolling-hash-style signature for fast pre-filtering before
    exact comparison.  One projection, no shuffle."""
    sh = char_shingles(text_col, k)
    hashes = F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    )
    return df.select(
        F.col(id_col),
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
        F.size(sh).alias("n_shingles"),
    )


# text-cleaning regexes — deliberately lookahead-free so Java regex
# (Spark) and RE2 (DuckDB oracle) agree byte-for-byte.  Whitespace is an
# EXPLICIT class rather than \s: Java's ASCII \s includes vertical tab
# \x0B while RE2's does not, so \s would silently diverge on a corpus
# containing \x0B.  The explicit class pins Java's (wider) definition in
# both engines.
WS_CLASS = "[ \\t\\n\\x0B\\f\\r]"
NON_WS_CLASS = "[^ \\t\\n\\x0B\\f\\r]"
URL_REGEX = rf"https?://{NON_WS_CLASS}+"
EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"


def clean_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    r"""Pre-training text hygiene as ONE codegen projection: strip URLs
    and email addresses, collapse whitespace runs, trim.  Output keeps
    the cleaned text plus the audit columns a pipeline filters/reports
    on (flags + before/after lengths).  Order of operations is part of
    the contract (URL → email → whitespace → trim) — the oracle
    replays the identical regex sequence, including the explicit
    whitespace class (see WS_CLASS: \s itself differs on \x0B between
    Java and RE2)."""
    t0 = F.col(text_col)
    no_url = F.regexp_replace(t0, URL_REGEX, " ")
    no_email = F.regexp_replace(no_url, EMAIL_REGEX, " ")
    cleaned = F.trim(F.regexp_replace(no_email, WS_CLASS + "+", " "))
    return df.select(
        F.col(id_col),
        cleaned.alias("clean_text"),
        (F.length(t0) != F.length(no_url)).cast("int").alias("had_url"),
        (F.length(no_url) != F.length(no_email)).cast("int").alias("had_email"),
        F.length(t0).cast("long").alias("n_chars_raw"),
        F.length(cleaned).cast("long").alias("n_chars_clean"),
    )


# PII patterns — same cross-engine contract as clean_text: lookahead-free,
# no \s/\b-divergent constructs beyond word boundaries (\b agrees between
# Java and RE2 on ASCII word chars, which is all these patterns touch).
# Phone alternation covers the two shapes a redaction pass conventionally
# targets: +CC-prefixed international runs and (NNN) NNN-NNNN US style.
IPV4_REGEX = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"
PHONE_REGEX = r"\+[0-9]{1,3}([- ][0-9]{2,4}){2,4}|\([0-9]{3}\) [0-9]{3}-[0-9]{4}"


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII redaction as ONE codegen projection: replace emails, phone
    numbers, and IPv4 addresses with typed placeholder tokens
    (``<EMAIL>``/``<PHONE>``/``<IP>``) and report per-kind counts for
    the audit trail a compliance pass needs.

    Order of operations is part of the contract (email → phone → IP) —
    notably the IP count runs AFTER email removal so a numeric mail
    domain (``user@10.0.0.1``) redacts as one email, not email+IP.  The
    oracle replays the identical regex sequence; counts come from
    ``regexp_count`` on the same intermediate the replacement ran on.

    Scale: row-local regex over the scan, no shuffle, no UDF — the
    plan cost is the regex engine, identical at sf0.01 and 100 TB.
    """
    t0 = F.col(text_col)
    no_email = F.regexp_replace(t0, EMAIL_REGEX, "<EMAIL>")
    no_phone = F.regexp_replace(no_email, PHONE_REGEX, "<PHONE>")
    redacted = F.regexp_replace(no_phone, IPV4_REGEX, "<IP>")
    return df.select(
        F.col(id_col),
        redacted.alias("redacted_text"),
        F.regexp_count(t0, F.lit(EMAIL_REGEX)).cast("long").alias("n_emails"),
        F.regexp_count(no_email, F.lit(PHONE_REGEX)).cast("long").alias("n_phones"),
        F.regexp_count(no_phone, F.lit(IPV4_REGEX)).cast("long").alias("n_ips"),
    )


def chunk_text_tokens(
    df: DataFrame, id_col: str, text_col: str, window: int = 64, stride: int = 48
) -> DataFrame:
    """RAG-style sliding-window chunking: split each document's token
    stream into overlapping chunks of *window* tokens advancing by
    *stride* (overlap = window - stride).  The retrieval counterpart of
    ``pack.pack_sequences`` (which packs WITHOUT overlap for training):
    same 1→N explode shape, different windowing contract.

    Output one row per (doc, chunk): chunk index, first-token offset,
    chunk token count (the tail chunk may be short), and the chunk
    text itself.  Chunk count for n tokens is
    ``1 + ceil((n - window)/stride)`` (one chunk when n ≤ window) —
    all-integer arithmetic, so the oracle replays it exactly.

    Scale: row-local transform + explode; output size is
    n/stride rows per doc, no shuffle introduced.  Token slicing uses
    ``F.slice`` (clips at the array end, matching DuckDB list slices).
    """
    if window < 1 or stride < 1:
        raise ValueError(f"window and stride must be positive, got {window}/{stride}")
    if stride > window:
        # stride > window would leave token gaps AND can produce an empty
        # trailing chunk; gapped sampling is pack/sampling territory
        raise ValueError(f"stride ({stride}) must be <= window ({window})")
    # row-level empty guard: split of empty text is [''] — without it an
    # empty/NULL doc emits one phantom chunk of one '' token.  NULL
    # array → the sequence/explode below drops the doc: no content, no
    # chunks (the retrieval-side convention; cf. pack's n > 0 filter).
    base = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.when(F.length(base) > 0, F.split(base, r"\s+")).otherwise(
        F.lit(None).cast("array<string>")
    )
    work = df.select(F.col(id_col), toks.alias("__toks"))
    n = F.size("__toks")
    # ceil((n-window)/stride) in EXACT integer arithmetic: m % stride is
    # integer-exact, so (m - m%stride)/stride divides exactly and the
    # double division cannot round (the oracle's '//' replays it)
    m = n - window + stride - 1
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        (m - m % stride) / stride + 1
    ).cast("int")
    work = work.select(
        F.col(id_col),
        F.col("__toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    chunk = F.slice(F.col("__toks"), start + 1, window)
    return work.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


# URL host extraction — group 1 is the host; same explicit-whitespace
# cross-engine discipline as URL_REGEX (\s differs on \x0B), plus '/'
# to stop at the path.
URL_HOST_REGEX = r"https?://([^/ \t\n\x0B\f\r]+)"


def url_domain_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    blocklist: list[str] | None = None,
) -> DataFrame:
    """Domain-level URL audit + blocklist screen — the standard
    provenance filter (UT1/adult-domain blocklists, spam domains) a web
    corpus passes through before training.  Per document:

    - ``domains_csv`` — normalized hosts (lowercased, leading ``www.``
      stripped) of every URL, in order of appearance, comma-joined
    - ``n_urls`` — URL count
    - ``blocked`` — 1 when any normalized host is on *blocklist*

    The blocklist enters the plan as a literal IN-list (bounded: real
    blocklists are ~1e6 rows — at that size swap the literal for a
    broadcast join on an exploded host column; the literal form keeps
    the one-projection shape for the common few-hundred-domain case).
    Row-local regex, no shuffle, no UDF.
    """
    hosts = F.regexp_extract_all(F.col(text_col), F.lit(URL_HOST_REGEX), 1)
    norm = F.transform(
        hosts, lambda h: F.regexp_replace(F.lower(h), r"^www\.", "")
    )
    work = df.select(F.col(id_col), norm.alias("__hosts"))
    # normalize the blocklist the same way the hosts are normalized —
    # otherwise 'WWW.Spam.Example' or 'www.spam.example' entries (the
    # exact forms the extraction strips) silently never match
    norm_block = (
        sorted({b.lower().removeprefix("www.") for b in blocklist})
        if blocklist
        else []
    )
    blocked = (
        F.exists(F.col("__hosts"), lambda h: h.isin(*norm_block))
        if norm_block
        else F.lit(False)
    )
    return work.select(
        F.col(id_col),
        F.array_join(F.col("__hosts"), ",").alias("domains_csv"),
        F.size("__hosts").cast("long").alias("n_urls"),
        blocked.cast("int").alias("blocked"),
    )


# Tracking query parameters (anchored key match): campaign tags and
# click identifiers carry no content identity, so URL-level dedup must
# strip them or every ad-campaign variant of a page survives as a
# "distinct" document.  Keys only — a legitimate param VALUE containing
# 'utm_' is untouched.
TRACKING_PARAM_REGEX = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref)="

# One parse regex, four groups: scheme, authority, path, '?query'.
# No lookahead (RE2-compatible), greedy runs are unambiguous because
# the classes are disjoint ('[^/?]*' stops at the path, '[^?]*' at the
# query).
_URL_PARTS_REGEX = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?]*)([^?]*)(.*)$"


def canonicalize_url(col):
    """Canonical form of a URL column — the equivalence key for
    URL-exact dedup (the first, cheapest dedup pass of a web-crawl
    pipeline: no text is read).  Normalizations, each a real duplicate
    source in crawl data:

    - scheme and host lowercased (``HTTPS://EXAMPLE.COM`` ≡ the lower
      form); leading ``www.`` stripped (same rule as
      :func:`url_domain_stats`)
    - default port dropped (``:443`` for https, ``:80`` for http)
    - fragment dropped (client-side only, never reaches the server)
    - trailing slashes dropped from the path (``/docs/`` ≡ ``/docs``)
    - tracking params removed (:data:`TRACKING_PARAM_REGEX`), remaining
      query params SORTED (param order is almost never semantic; the
      rare order-sensitive endpoint is the miss this trades for
      collapsing the common reordered-param duplicates); empty query →
      no ``?``

    Deliberately NOT merged: http vs https (different resources by
    spec), userinfo, percent-encoding case.  A value with no
    ``scheme://`` prefix is returned trimmed but otherwise untouched —
    not-a-URL is not this function's failure to report.

    Pure row-local expression — no shuffle, no UDF; the param
    filter/sort lambdas run interpreted (one short array per row, the
    remove_boilerplate_lines precedent).
    """
    # keep the trimmed ORIGINAL for the not-a-URL passthrough branch:
    # the fragment strip below must not mangle plain text containing
    # '#' (the docstring's "trimmed but otherwise untouched" contract)
    orig = F.trim(F.col(col) if isinstance(col, str) else col)
    u = F.regexp_replace(orig, r"#.*", "")
    scheme = F.lower(F.regexp_extract(u, _URL_PARTS_REGEX, 1))
    auth = F.lower(F.regexp_extract(u, _URL_PARTS_REGEX, 2))
    auth = F.regexp_replace(auth, r"^www\.", "")
    auth = (
        F.when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
        .when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
        .otherwise(auth)
    )
    path = F.regexp_replace(F.regexp_extract(u, _URL_PARTS_REGEX, 3), r"/+$", "")
    qs = F.substring(F.regexp_extract(u, _URL_PARTS_REGEX, 4), 2, 1 << 30)
    kept = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_REGEX),
        )
    )
    query = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    rebuilt = F.concat(scheme, F.lit("://"), auth, path, query)
    return F.when(scheme == "", orig).otherwise(rebuilt)


def url_canonical_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Exact dedup on the canonical URL (:func:`canonicalize_url`):
    every input row labeled with its equivalence key, the keeper (min
    *id_col* in the group — deterministic, layout-independent), and an
    ``is_dup`` flag.  ``WHERE is_dup = 0`` is the deduped corpus.

    Scale: one shuffle on the canonical key (groupBy with map-side
    combine — never a per-key window, which would buffer each key's
    rows whole) + one equi-join grafting the keeper back.  Key skew is
    bounded by how many times one URL was crawled; a hot key degrades
    only its own reduce task.
    """
    keyed = df.withColumn("url_canon", canonicalize_url(url_col))
    # NULL urls canonicalize to NULL; an inner join on that key would
    # silently drop the rows (ADVICE r9).  A NULL url is a duplicate of
    # nothing, so each such row groups under a private sentinel key
    # (NUL-prefixed — no canonical URL starts with NUL) and survives as
    # its own keeper with url_canon still NULL in the output.
    keyed = keyed.withColumn(
        "__ucd_key",
        F.coalesce(
            F.col("url_canon"),
            F.concat(F.lit("\x00null-url:"), F.col(id_col).cast("string")),
        ),
    )
    keepers = keyed.groupBy("__ucd_key").agg(
        F.min(F.col(id_col)).alias("keeper")
    )
    return (
        keyed.join(keepers, "__ucd_key")
        .drop("__ucd_key")
        .withColumn("is_dup", (F.col(id_col) != F.col("keeper")).cast("int"))
    )


def url_optout_filter(
    df: DataFrame,
    id_col: str,
    url_col: str,
    rules: DataFrame,
    domain_col: str = "domain",
    prefix_col: str = "path_prefix",
) -> DataFrame:
    """Robots/opt-out URL screen — the compliance filter a crawl corpus
    passes before training: a (domain, path_prefix) rules table
    (robots ``Disallow`` lines, publisher opt-out registries, DMCA
    lists) marks every document whose URL it covers.  A row is
    ``disallowed`` when its canonical URL's hostname (www- and
    port-stripped) equals a rule's domain AND its path starts with the
    rule's prefix (empty prefix = the whole domain).

    Output: *df* + ``url_canon``, ``domain``, ``disallowed`` (int).
    Every input row survives (the package convention) — ``WHERE
    disallowed = 0`` is the compliant corpus.

    Scale: the naive shape (join on domain, one output row per
    MATCHING RULE, then re-aggregate) duplicates hot domains by their
    rule count; instead the rules AGGREGATE to one row per domain
    first (``collect_list`` of prefixes — bounded: robots files are
    small, a pathological domain caps at its own rule count, never the
    corpus), then ONE left equi-join on the domain and a row-local
    ``F.exists`` prefix test.  No nested loop, no crossJoin; AQE
    broadcasts the per-domain rules frame at real-world sizes.  Rule
    domains are normalized the same way the URL hosts are (the
    url_domain_stats lesson: un-normalized 'WWW.Spam.Example' entries
    silently never match).
    """
    canon = canonicalize_url(url_col)
    host = F.regexp_replace(
        F.regexp_extract(canon, r"^[a-z][a-z0-9+.-]*://([^/?]*)", 1),
        r":\d+$",
        "",
    )
    path = F.regexp_extract(canon, r"^[a-z][a-z0-9+.-]*://[^/?]*([^?]*)", 1)
    keyed = df.select(
        *df.columns,
        canon.alias("url_canon"),
        host.alias("domain"),
        path.alias("__path"),
    )
    per_domain = (
        rules.select(
            F.regexp_replace(F.lower(F.col(domain_col)), r"^www\.", "").alias(
                "domain"
            ),
            F.coalesce(F.col(prefix_col), F.lit("")).alias("__pfx"),
        )
        .groupBy("domain")
        .agg(F.collect_list("__pfx").alias("__pfxs"))
    )
    hit = F.exists(F.col("__pfxs"), lambda p: F.col("__path").startswith(p))
    return (
        keyed.join(per_domain, "domain", "left")
        .withColumn(
            "disallowed", F.coalesce(hit, F.lit(False)).cast("int")
        )
        .drop("__path", "__pfxs")
    )


# Unicode script ranges (public Unicode block boundaries).  \x{...}
# class syntax is shared by Java regex (Spark) and RE2 (DuckDB), so the
# same literal works in both engines.  Declaration order is the
# tie-break order for pred_script.
SCRIPT_CLASSES: dict[str, str] = {
    "latin": r"[A-Za-z]",
    "cyrillic": r"[\x{0400}-\x{04FF}]",
    "cjk": r"[\x{4E00}-\x{9FFF}]",
    "arabic": r"[\x{0600}-\x{06FF}]",
    "hangul": r"[\x{AC00}-\x{D7AF}]",
    "devanagari": r"[\x{0900}-\x{097F}]",
    "greek": r"[\x{0370}-\x{03FF}]",
    # hiragana + katakana — the signal that separates Japanese from
    # Chinese inside the shared CJK-ideograph block (appended last so
    # existing argmax tie-break order is unchanged)
    "kana": r"[\x{3040}-\x{30FF}]",
}

# Scripts that map 1:1 to a language at corpus-filter granularity (the
# fused model's fast path; cjk/kana take the kana-ratio rule instead)
SCRIPT_LANGS: dict[str, str] = {
    "cyrillic": "ru",
    "arabic": "ar",
    "hangul": "ko",
    "devanagari": "hi",
    "greek": "el",
}


def script_detect(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Unicode-script detection — the coverage layer the Latin-only
    trigram model (:func:`lang_id_ngram`) lacks: non-Latin text gets a
    concrete script label ('cyrillic', 'cjk', ...) instead of 'und'.
    The standard composition is script first, then a per-script
    language model for scripts that need one (Latin → trigram
    profiles; Cyrillic/CJK/... map 1:1 or near-1:1 to languages at
    corpus-filter granularity).

    Per document: per-script letter counts (``regexp_count`` over the
    Unicode block class), ``pred_script`` = argmax with declaration-
    order tie-break ('und' when no letters), ``script_frac`` =
    top count / total counted letters.  One codegen projection, no
    shuffle, no UDF; the oracle counts the identical RE2 classes.
    """
    work = df.select(
        F.col(id_col),
        *[
            F.regexp_count(F.coalesce(F.col(text_col), F.lit("")), F.lit(pat))
            .cast("long")
            .alias(f"__s_{name}")
            for name, pat in SCRIPT_CLASSES.items()
        ],
    )
    names = list(SCRIPT_CLASSES)
    total = sum((F.col(f"__s_{n}") for n in names[1:]), F.col(f"__s_{names[0]}"))
    best = F.greatest(
        *[
            F.struct(
                F.col(f"__s_{n}").alias("s"),
                F.lit(-i).alias("o"),
                F.lit(n).alias("l"),
            )
            for i, n in enumerate(names)
        ]
    )
    pred = F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))
    frac = F.when(
        best["s"] > 0, F.round(best["s"].cast("double") / total, 6)
    ).otherwise(F.lit(0.0))
    return work.select(
        F.col(id_col),
        pred.alias("pred_script"),
        frac.alias("script_frac"),
        total.alias("n_letters"),
    )


# HTML stripping — tag regex is lookahead-free ('<' then anything-but-'>'),
# identical in Java regex and RE2.  Entity decode covers the named
# entities that matter for token statistics; &#NN; numeric forms are out
# of scope (documented) — a full HTML5 parser is an extraction library's
# job, this is the corpus-hygiene regex pass.
HTML_TAG_REGEX = r"<[^>]+>"
_HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST: otherwise &amp;lt; would double-decode
]


def strip_html(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Web-extraction hygiene as ONE codegen projection: drop HTML tags,
    decode the common named entities (&amp; deliberately decoded last so
    double-escaped text cannot double-decode), collapse the whitespace
    the removed markup leaves behind.  Output keeps the audit columns
    (tag count, before/after lengths).

    The oracle replays the identical replace sequence; same explicit
    whitespace class as clean_text (Java \\s and RE2 \\s diverge on
    \\x0B)."""
    t0 = F.col(text_col)
    no_tags = F.regexp_replace(t0, HTML_TAG_REGEX, " ")
    decoded = no_tags
    for ent, rep in _HTML_ENTITIES:
        decoded = F.replace(decoded, F.lit(ent), F.lit(rep))
    cleaned = F.trim(F.regexp_replace(decoded, WS_CLASS + "+", " "))
    return df.select(
        F.col(id_col),
        cleaned.alias("stripped_text"),
        F.regexp_count(t0, F.lit(HTML_TAG_REGEX)).cast("long").alias("n_tags"),
        F.length(t0).cast("long").alias("n_chars_raw"),
        F.length(cleaned).cast("long").alias("n_chars_stripped"),
    )


# A deterministic mini merge table (BPE, Sennrich et al. 2016 — public
# technique): common English digraphs first, then second-order merges
# over earlier outputs.  WELL-FORMED by construction: every pair's
# operands exist before it fires (single chars, or products of
# earlier-ranked merges), which is what makes sequential exhaustive
# application in rank order equivalent to the classic
# lowest-rank-pair-first loop (each merge's output can only
# participate in LATER-ranked merges).
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("e", "r"), ("a", "n"), ("i", "n"), ("o", "n"),
    ("r", "e"), ("a", "t"), ("o", "r"), ("e", "n"), ("e", "s"),
    ("a", "l"), ("s", "t"), ("l", "e"), ("q", "u"), ("c", "o"),
    ("d", "e"), ("m", "a"), ("s", "c"), ("th", "e"), ("an", "d"),
    ("in", "g"), ("er", "</w>"), ("es", "</w>"), ("the", "</w>"),
    ("on", "</w>"), ("at", "a"), ("qu", "er"), ("quer", "y"),
    ("ma", "p"), ("sc", "an"),
]


def bpe_tokenize(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """BPE tokenization as a PURE column expression — no UDF, no
    Python, no external tokenizer: the merge table is applied as a
    chain of literal ``replace`` calls over a space-separated symbol
    string, so the whole tokenizer lives in one whole-stage-codegen
    projection AND replays exactly in the DuckDB oracle (same replace
    chain, same merge table).

    Encoding: lowercase → non-alphanumerics to word breaks → each word
    spelled as space-separated characters with a ``</w>`` end-of-word
    symbol → each merge ``(a, b)`` rewrites `` a b `` → `` ab ``.
    Each merge's replace runs TWICE: a literal replace consumes the
    boundary space, so an occurrence adjacent to a replaced one is
    only caught by the second pass — and after pass one every missed
    occurrence is flanked by merged (non-matching) tokens, so pass two
    is exact.  That argument REQUIRES ``a != b``: a SELF-pair ``(x,
    x)`` over a run of identical symbols pairs greedily differently
    than the classic leftmost scan (``x x x x x x`` → ``xx x xx x``
    here vs ``xx xx xx`` canonically — caught by this module's fuzz
    review), so self-pairs are REJECTED loudly rather than silently
    mistokenized; tables that need them (real 32k vocabs do) take
    :func:`bpe_tokenize_batched`.  With that restriction, sequential
    rank-order application is equivalent to the classic priority loop
    for a well-formed table (see BPE_MERGES) — property-fuzzed against
    a Python reference in tests.  Cost: 2x|merges| string scans per
    row — linear, JVM-side, no shuffle.

    Output: ``(id, tokens array<string>, n_tokens)``.  Production-size
    merge tables are refused past ``BPE_EXPR_MAX_MERGES`` (the plan
    compile goes pathological, not the row work) — the production path
    is :func:`bpe_tokenize_batched`, semantically identical (pinned by
    the shared fuzz reference) at any table size; THIS operator's
    value is tokenizer-exact budgeting with zero dependencies and an
    exact cross-engine contract.

    Cost anatomy (SCALE_NOTES r6): ~3 s CONSTANT plan-compile for the
    ~120-deep expression (Catalyst traversals; the projection runs as
    interpreted expression eval — too deep for whole-stage codegen)
    plus linear row work (~43k docs/s on 32 threads).  The constant
    amortizes to zero at scale; the linear term is the price."""
    merges = BPE_MERGES if merges is None else merges
    if len(merges) > BPE_EXPR_MAX_MERGES:
        raise ValueError(
            f"merge table has {len(merges)} entries — past "
            f"BPE_EXPR_MAX_MERGES={BPE_EXPR_MAX_MERGES} the expression "
            "chain's plan-compile cost is pathological (the driver spends "
            "minutes in Catalyst before the first row); use "
            "bpe_tokenize_batched, which has identical semantics and "
            "O(tokens) cost at any table size"
        )
    for a, b in merges:
        if " " in a or " " in b:
            raise ValueError(f"merge symbols cannot contain spaces: {(a, b)}")
        if a == b:
            raise ValueError(
                f"self-pair merge {(a, b)} unsupported: non-overlapping "
                "replace pairs runs differently than canonical BPE's "
                "leftmost scan (see docstring); use the Pandas path"
            )
        # canonical BPE is PER-WORD: nothing ever follows the </w>
        # marker inside a word, so a first operand containing it (or a
        # second operand with the marker anywhere but its end) would
        # merge ACROSS word boundaries — silent mistokenization, same
        # class as self-pairs
        if "</w>" in a or ("</w>" in b and not b.endswith("</w>")):
            raise ValueError(
                f"merge {(a, b)} crosses a word boundary: '</w>' may "
                "only appear as the suffix of the second operand"
            )
    t1 = F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))),
            "[^a-z0-9]+",
            " ",
        )
    )
    # spell out characters: every char gains a trailing space, so the
    # single word-break space becomes a 3-space run -> '</w>' marker
    spelled = F.regexp_replace(t1, "(.)", "$1 ")
    s = F.when(t1 == "", F.lit("")).otherwise(
        F.concat(
            F.lit(" "),
            F.replace(spelled, F.lit("   "), F.lit(" </w> ")),
            F.lit("</w> "),
        )
    )
    for a, b in merges:
        pat, rep = F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
        s = F.replace(F.replace(s, pat, rep), pat, rep)
    toks = F.split(F.trim(s), " +")
    toks = F.when(F.trim(s) == "", F.array().cast("array<string>")).otherwise(toks)
    return df.select(
        F.col(id_col),
        toks.alias("tokens"),
        F.size(toks).alias("n_tokens"),
    )


# Past this depth the expression-chain tokenizer is refused: the plan
# compiles O(depth) Catalyst traversals (~3 s at ~120 replaces,
# super-linear beyond) and a 32k table would effectively hang the
# driver building one projection.  The batched path has no such bound.
BPE_EXPR_MAX_MERGES = 256


def _bpe_encode_word(
    word: str,
    merges: list[tuple[str, str]],
    ranks: dict[tuple[str, str], int],
) -> list[str]:
    """Canonical BPE over one word: repeatedly merge ALL occurrences of
    the lowest-ranked adjacent pair with a leftmost scan (Sennrich et
    al. 2016, the reference loop the expression path is fuzzed
    against).  Handles self-pairs correctly — the leftmost scan pairs a
    run ``x x x x`` as ``xx xx``, exactly the semantics the expression
    path must reject."""
    syms = list(word) + ["</w>"]
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        a, b = merges[best]
        merged: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                merged.append(a + b)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    return syms


def bpe_tokenize_batched(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]] | None = None,
    cache_limit: int = 1 << 18,
) -> DataFrame:
    """Production BPE: the same canonical tokenizer as
    :func:`bpe_tokenize` but as an Arrow-batched ``mapInPandas``
    stage, for the tables the expression chain refuses — SELF-PAIR
    merges (every real 32k vocab has runs like ``(e, e)``) and
    arbitrary table sizes (the replace chain's plan-compile cost is
    O(depth); this path's per-row cost is O(tokens), independent of
    table depth once the ranks dict is built).

    Semantics: the classic lowest-rank-pair-first loop with a leftmost
    merge scan, per word, over the same cleaning (lowercase,
    non-alphanumerics to word breaks, ``</w>`` end-of-word marker) —
    fuzzed against the same Python reference as the expression path,
    INCLUDING self-pairs and ≥1k-entry tables.  For tables both paths
    accept, outputs are bit-identical (pinned in tests), so the
    expression path's SQL oracle replays this one too.

    Scale shape: one ``mapInPandas`` projection — no shuffle, no
    driver action; the merge table ships once per task via closure
    (a 32k table is ~1 MB — broadcast-sized, far under task-binary
    limits).  A per-task word→tokens memo exploits Zipf reuse (corpus
    token hit rates >95 %); it is CLEARED at *cache_limit* entries so
    a pathological all-distinct-words corpus is bounded-memory, not
    OOM.  Word boundaries are row-local, so partitioning is free to be
    anything upstream chose.

    Output schema matches :func:`bpe_tokenize` exactly:
    ``(id, tokens array<string>, n_tokens long)``."""
    import re as _re

    merges = BPE_MERGES if merges is None else list(merges)
    for a, b in merges:
        if " " in a or " " in b:
            raise ValueError(f"merge symbols cannot contain spaces: {(a, b)}")
        # cross-word merges are structurally meaningless in the
        # canonical per-word loop too — same loud contract as the
        # expression path
        if "</w>" in a or ("</w>" in b and not b.endswith("</w>")):
            raise ValueError(
                f"merge {(a, b)} crosses a word boundary: '</w>' may "
                "only appear as the suffix of the second operand"
            )
    ranks = {pair: i for i, pair in enumerate(merges)}
    id_type = dict(df.dtypes)[id_col]
    out_schema = f"`{id_col}` {id_type}, tokens array<string>, n_tokens long"
    clean = _re.compile(r"[^a-z0-9]+")

    def _encode(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col = []
            for text in pdf[text_col]:
                text = "" if text is None else str(text)
                toks: list[str] = []
                for word in clean.sub(" ", text.lower()).split():
                    hit = cache.get(word)
                    if hit is None:
                        if len(cache) >= cache_limit:
                            cache.clear()
                        hit = _bpe_encode_word(word, merges, ranks)
                        cache[word] = hit
                    toks.extend(hit)
                toks_col.append(toks)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks_col,
                    "n_tokens": [len(t) for t in toks_col],
                }
            )

    return df.select(id_col, text_col).mapInPandas(_encode, out_schema)


def lang_id_fused(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Script detection FUSED with the trigram language model (VERDICT
    r6 task 8): one projection that first routes on Unicode script,
    then applies the per-script rule —

    - **latin** → the :func:`lang_id_ngram` trigram-profile argmax
      (en/de/fr/es/it/pt/nl), with its overlap confidence;
    - **cjk / kana** → ``ja`` when kana make up >5 % of
      ideograph+kana letters (hiragana/katakana are the ja-vs-zh
      separator; pure-ideograph text is ``zh``), else ``zh``;
    - single-language scripts map directly (cyrillic→ru, arabic→ar,
      hangul→ko, devanagari→hi, greek→el — corpus-filter granularity,
      see SCRIPT_LANGS);
    - no letters at all → ``und``.

    Confidence is the trigram overlap ratio on the latin path and the
    dominant-script fraction otherwise.  Everything stays one
    shuffle-free codegen projection (regexp_count per script class +
    the trigram intersects); the mixed-script ``und`` rate bound and
    the zh/ja/ko/ru labels are pinned by multilingual fixtures in
    tests."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    names = list(SCRIPT_CLASSES)
    work = df.select(
        F.col(id_col),
        txt.alias("__t"),
        *[
            F.regexp_count(txt, F.lit(pat)).cast("long").alias(f"__sc_{n}")
            for n, pat in SCRIPT_CLASSES.items()
        ],
    )
    script_best = F.greatest(
        *[
            F.struct(
                F.col(f"__sc_{n}").alias("s"),
                F.lit(-i).alias("o"),
                F.lit(n).alias("l"),
            )
            for i, n in enumerate(names)
        ]
    )
    script_total = sum(
        (F.col(f"__sc_{n}") for n in names[1:]), F.col(f"__sc_{names[0]}")
    )
    # the latin trigram sub-model — identical construction to
    # lang_id_ngram (distinct trigrams of the padded lowercased text,
    # profile-overlap argmax with declaration-order tie-break)
    padded = F.concat(F.lit(" "), F.lower(F.col("__t")), F.lit(" "))
    tri = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(padded) - 2, F.lit(1))),
            lambda i: F.substring(padded, i, 3),
        )
    )
    work = work.withColumn("__tri", tri)
    langs = list(LANG_PROFILES)
    for lang in langs:
        work = work.withColumn(
            f"__lp_{lang}",
            F.size(F.array_intersect("__tri", F.lit(LANG_PROFILES[lang]))),
        )
    latin_best = F.greatest(
        *[
            F.struct(
                F.col(f"__lp_{lang}").alias("s"),
                F.lit(-i).alias("o"),
                F.lit(lang).alias("l"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    latin_pred = F.when(latin_best["s"] > 0, latin_best["l"]).otherwise(F.lit("und"))
    latin_conf = F.when(
        latin_best["s"] > 0,
        F.round(latin_best["s"].cast("double") / F.size("__tri"), 6),
    ).otherwise(F.lit(0.0))
    kana, cjk = F.col("__sc_kana"), F.col("__sc_cjk")
    ja_rule = F.when(
        kana.cast("double") > 0.05 * (kana + cjk), F.lit("ja")
    ).otherwise(F.lit("zh"))
    pred = F.when(script_best["s"] == 0, F.lit("und")).when(
        script_best["l"] == "latin", latin_pred
    )
    for script, lang in SCRIPT_LANGS.items():
        pred = pred.when(script_best["l"] == script, F.lit(lang))
    pred = pred.otherwise(ja_rule)  # cjk / kana
    conf = F.when(script_best["s"] == 0, F.lit(0.0)).when(
        script_best["l"] == "latin", latin_conf
    ).otherwise(F.round(script_best["s"].cast("double") / script_total, 6))
    return work.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        F.when(script_best["s"] > 0, script_best["l"])
        .otherwise(F.lit("und"))
        .alias("pred_script"),
        conf.alias("confidence"),
    )


_BPE_MAX_MERGES = 131_072


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 20,
    token_pattern: str = "[a-z]+",
    batch: int = 64,
    _stats: dict | None = None,
) -> list[tuple[str, str]]:
    """Distributed BPE vocabulary induction (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units" —
    the learn_bpe algorithm): greedily merge the most frequent
    adjacent symbol pair *n_merges* times, and return the ordered
    merge list that :func:`bpe_tokenize` / :func:`bpe_tokenize_batched`
    consume.

    The 100 TB shape: the corpus is scanned ONCE, for lowercased word
    frequencies; every training round then runs over the DISTINCT-word
    table weighted by frequency — vocabulary-sized, not corpus-sized —
    the same placement argument as feature hashing's post-distinct
    vocabulary (corpus instances >> distinct words).  Per round: one
    vocab-sized pair-explode + map-combined groupBy (persisted for the
    round), bounded driver collects (the top-``batch`` pairs plus the
    per-symbol neighbor maxima needed for the safety proof below), and
    one fold-left merge projection per emitted merge.  Lineage is
    truncated with a lazy checkpoint every round so round n's plan
    does not replay rounds 0..n-1.

    **Batched rounds, exactly sequential-equivalent** (VERDICT r8 task
    6): a production vocabulary is tens of thousands of merges, and one
    driver round-trip per merge is the scale killer.  Each round emits
    a PREFIX of the count-sorted candidate list, where a candidate is
    emitted only while it is provably what sequential greedy would pick
    next:

    - *non-interacting*: its symbols are disjoint from every earlier
      emitted pair's {a, b, a+b}, so its count is still exact (merges
      only destroy adjacencies touching their own symbols, and only
      create adjacencies involving the new symbol);
    - *stop at the first interacting candidate*: an interacting pair's
      count may have silently decreased, and every pair ranked below it
      could then be overtaken — so the batch ends there rather than
      skipping (a skip could reorder the merge list);
    - *dominates every creatable pair*: a merge of (a, b) can only
      create pairs (x, a+b) with count <= the pre-merge count of
      (x, a), or (a+b, y) bounded by cnt(b, y); chains of created
      pairs stay under the same bound because counts never increase
      after creation.  Self-pairs (a, a) — the dominant shape on
      run-heavy corpora — get a refined bound: a leftmost scan never
      leaves an unmerged `a` directly before a merged `aa`, and each
      created (aa, aa) / (aa, a) instance consumes a distinct (a, a)
      adjacency, so the bound is the NON-self neighbor maxima plus
      cnt(a,a)//2 rather than the pair's own count.  A candidate is
      emitted only while its count STRICTLY exceeds the running bound
      (ties could flip the lexicographic tiebreak toward a created
      pair).

    On corpora where the proof fails immediately (steep skew sharing
    symbols) the batch degenerates to one merge per round — the
    sequential pace, never a wrong order.  Run-heavy corpora with many
    independent frequent pairs emit up to ``batch`` merges per round
    (jobs-count asserted in tests).  ``_stats``, when a dict, receives
    ``{"rounds": r, "batch_sizes": [...]}`` for those assertions.

    Determinism: pair counting weights EVERY adjacency (``zip(w,
    w[1:])`` — a run ``aaa`` counts (a,a) twice), the winner is
    (max count, then lexicographically smallest pair), and merging is
    the leftmost non-overlapping scan — a fold-left replace is
    EQUIVALENT to the canonical scan within one round because a
    freshly merged symbol ``a+b`` can never equal the left element
    ``a`` (b is non-empty), so it cannot cascade.  The whole loop is
    pinned against a Python reference trainer in tests.

    Stops early when no adjacent pair occurs at least twice (merging
    singletons adds vocabulary entries no tokenizer would use).
    ``n_merges`` beyond 131072 (double the largest practical subword
    vocabulary) is rejected loudly — a runaway argument would otherwise
    schedule unbounded driver work.
    """
    if n_merges > _BPE_MAX_MERGES:
        raise ValueError(
            f"n_merges={n_merges} exceeds the documented bound "
            f"{_BPE_MAX_MERGES} (double the largest practical subword "
            f"vocabulary) — a runaway value would schedule unbounded "
            f"driver-side training rounds"
        )
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    words = (
        df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(token_pattern), 0)
            ).alias("__w")
        )
        .groupBy("__w")
        .agg(F.count("*").alias("__freq"))
    )
    syms = words.select(
        "__freq",
        F.concat(
            F.filter(F.split("__w", ""), lambda x: x != ""),
            F.array(F.lit("</w>")),
        ).alias("__syms"),
    ).localCheckpoint(eager=False)

    merges: list[tuple[str, str]] = []
    batch_sizes: list[int] = []
    cur = syms
    while len(merges) < n_merges:
        # the >= 2 guard sits BELOW the explode structurally (filter
        # first, then select): a 1-symbol row would make sequence(0,-1)
        # descend and element_at(.., 0) throw — relying on the
        # optimizer to push the filter under the Generate would be
        # correctness-by-rewrite
        pairs = (
            cur.filter(F.size("__syms") >= 2)
            .select(
                "__freq",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("__syms") - 2),
                        lambda i: F.struct(
                            F.element_at("__syms", i + 1).alias("a"),
                            F.element_at("__syms", i + 2).alias("b"),
                        ),
                    )
                ).alias("__p"),
            )
            .groupBy(F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
            .agg(F.sum("__freq").alias("cnt"))
        )
        want = min(batch, n_merges - len(merges))
        pairs.persist()  # one heavy aggregation shared by the collects
        try:
            top = (
                pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(want)
                .collect()
            )
            if not top or top[0]["cnt"] < 2:
                break
            emitted: list[tuple[str, str]] = [(top[0]["a"], top[0]["b"])]
            first_touch = set(emitted[0]) | {emitted[0][0] + emitted[0][1]}
            if (
                want > 1
                and len(top) > 1
                and top[1]["cnt"] >= 2
                # driver-side pre-check: an interacting #2 ends the
                # batch at size 1 regardless — skip the neighbor-maxima
                # jobs entirely in that (skewed) case
                and not ({top[1]["a"], top[1]["b"]} & first_touch)
            ):
                # Neighbor maxima over the FULL pair table for the
                # safety bound — collects bounded by 2*want symbols.
                # Self-pairs (a, a) are split out: a self-merge's
                # created pairs are NOT bounded by the pair's own count
                # (which sits in its own neighbor column) but by the
                # non-self neighbor maxima plus cnt//2 — a leftmost
                # scan never leaves an unmerged `a` directly before a
                # merged `aa`, and each created (aa, aa)/(aa, a)
                # instance consumes a distinct (a, a) adjacency, at
                # most half of them.
                a_syms = list({r["a"] for r in top})
                b_syms = list({r["b"] for r in top})
                all_syms = list(set(a_syms) | set(b_syms))
                nonself = pairs.filter(F.col("a") != F.col("b"))
                in_ex = {
                    r["b"]: r["m"]
                    for r in nonself.filter(F.col("b").isin(a_syms))
                    .groupBy("b")
                    .agg(F.max("cnt").alias("m"))
                    .collect()
                }
                out_ex = {
                    r["a"]: r["m"]
                    for r in nonself.filter(F.col("a").isin(b_syms))
                    .groupBy("a")
                    .agg(F.max("cnt").alias("m"))
                    .collect()
                }
                self_c = {
                    r["a"]: r["cnt"]
                    for r in pairs.filter(
                        (F.col("a") == F.col("b")) & F.col("a").isin(all_syms)
                    ).collect()
                }

                def _contrib(a: str, b: str) -> int:
                    if a == b:
                        return max(
                            in_ex.get(a, 0), out_ex.get(a, 0), self_c.get(a, 0) // 2
                        )
                    return max(
                        in_ex.get(a, 0),
                        self_c.get(a, 0),
                        out_ex.get(b, 0),
                        self_c.get(b, 0),
                    )

                touched = set(first_touch)
                bound = _contrib(*emitted[0])
                for r in top[1:]:
                    a, b, cnt = r["a"], r["b"], r["cnt"]
                    if cnt < 2:
                        break
                    if a in touched or b in touched:
                        break  # count may be stale: end the batch here
                    if cnt <= bound:
                        break  # a created pair could outrank (or tie) it
                    emitted.append((a, b))
                    touched |= {a, b, a + b}
                    bound = max(bound, _contrib(a, b))
        finally:
            pairs.unpersist()
        def _merge_step(a: str, b: str):
            # closure factory, not default-arg capture: PySpark
            # introspects the HOF lambda's arity
            ab = a + b

            def step(acc, x):
                return F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(a))
                    & (x == F.lit(b)),
                    F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))),
                ).otherwise(F.concat(acc, F.array(x)))

            return step

        for a, b in emitted:
            cur = cur.select(
                "__freq",
                F.aggregate(
                    "__syms",
                    F.array().cast("array<string>"),
                    _merge_step(a, b),
                ).alias("__syms"),
            )
        merges.extend(emitted)
        batch_sizes.append(len(emitted))
        cur = cur.localCheckpoint(eager=False)
    if _stats is not None:
        _stats["rounds"] = len(batch_sizes)
        _stats["batch_sizes"] = batch_sizes
    return merges


def clean_c4_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    line_sep: str = "\n",
    min_words: int = 5,
    min_kept_lines: int = 3,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al., arXiv:1910.10683 §2.2 —
    the public heuristics behind the C4 corpus), line level first,
    then page level:

    - a LINE is kept iff it ends in a terminal punctuation mark
      (``.``/``!``/``?``/closing ``"``), has at least *min_words*
      whitespace words, and does not contain the word ``javascript``
      (case-insensitive) — the cookie/JS-warning line filter;
    - a PAGE is kept iff it retains at least *min_kept_lines* lines
      and its ORIGINAL text contains neither ``lorem ipsum`` nor a
      ``{`` (the code/placeholder page filters).

    Every input row survives with a ``kept`` flag (the package's
    every-row-survives convention — ``WHERE kept = 1`` is the C4-clean
    corpus); ``text`` is the kept lines re-joined in original order
    (empty when the page is dropped or no line passes).  Output:
    (id, text, n_lines_kept, n_lines_removed, kept [, *keep_cols]) —
    *keep_cols* (r11) pass through untouched, so document metadata
    (URL, source, timestamps) survives the cleaning stage without a
    corpus-sized re-join downstream.

    Scale: a pure row-local projection — no shuffle, no UDF, whole
    plan inside codegen; per-row cost is linear in the document.  The
    quality.py rule bundles (Gopher) and this one compose freely —
    they see different failure modes (statistical vs. structural).
    """
    import re as _re

    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), _re.escape(line_sep))
    lower = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    page_ok = (~lower.contains("lorem ipsum")) & (~lower.contains("{"))

    def line_ok(x):
        t = F.trim(x)
        terminal = (
            t.endswith(".") | t.endswith("!") | t.endswith("?") | t.endswith('"')
        )
        n_words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
        return (
            terminal
            & (n_words >= min_words)
            & ~F.lower(t).contains("javascript")
        )

    reserved = {id_col, text_col, "n_lines_kept", "n_lines_removed", "kept"}
    bad = [c for c in keep_cols if c in reserved]
    if bad:
        raise ValueError(
            f"clean_c4_lines: keep_cols {bad} collide with output columns"
        )
    kept_lines = F.filter(lines, line_ok)
    n_kept = F.size(kept_lines)
    kept = (page_ok & (n_kept >= min_kept_lines)).cast("int")
    return df.select(
        F.col(id_col),
        F.when(kept == 1, F.array_join(kept_lines, line_sep))
        .otherwise(F.lit(""))
        .alias(text_col),
        n_kept.cast("long").alias("n_lines_kept"),
        (F.size(lines) - n_kept).cast("long").alias("n_lines_removed"),
        kept.alias("kept"),
        *[F.col(c) for c in keep_cols],
    )


def parse_robots(
    df: DataFrame,
    domain_col: str,
    payload_col: str,
    agent: str = "*",
) -> DataFrame:
    """Parse robots.txt documents into the ``(domain, path_prefix)``
    rules table :func:`url_optout_filter` consumes — closing the crawl
    compliance chain: raw robots bytes (e.g. WARC ``robots.txt``
    responses) → rules → screen, no hand-maintained tables.

    Implements the Disallow subset of RFC 9309 group semantics:

    - ``#`` comments strip to end of line; field names are
      case-insensitive; values trim.
    - Consecutive ``User-agent`` lines form ONE group head (their
      rules apply to every named agent); a ``User-agent`` line after
      a non-User-agent line starts a NEW group.
    - **Most-specific group wins** (RFC 9309 §2.2.1, ADVICE r10): when
      ANY group names *agent* exactly (case-insensitive token
      equality), only exact groups apply and every ``*`` group is
      ignored — ``User-agent: mybot / Disallow:`` (allow-all) beside
      ``User-agent: * / Disallow: /`` yields NO rules for mybot, not
      deny-all.  ``*`` groups apply only when no exact group exists.
      Documented simplification vs the full RFC: specificity is
      exact-name-vs-``*`` (the two tiers robots files actually use),
      not longest-prefix agent matching (``googlebot-news`` vs
      ``googlebot``).
    - ``Disallow`` lines in applying groups emit rules; an EMPTY
      ``Disallow:`` value means allow-all and emits nothing (but the
      group still exists — an exact empty group SHADOWS star rules).
    - ``Allow``/``Crawl-delay``/``Sitemap`` and unknown fields are
      ignored (this operator builds the DISALLOW screen only) but do
      not end the group — rules after them still attach.

    Output: one row per (domain, path_prefix), distinct.  Scale: the
    state machine is ONE row-local ``F.aggregate`` pass over each
    file's lines (struct accumulator — no shuffle, no UDF); the final
    distinct is one shuffle bounded by the rule count, never the
    corpus.
    """
    text = F.coalesce(F.col(payload_col).cast("string"), F.lit(""))
    lines = F.transform(
        F.split(text, "\n"),
        lambda x: F.trim(F.regexp_replace(F.rtrim(x), r"#.*$", "")),
    )
    field = lambda x: F.lower(F.trim(F.regexp_extract(x, r"^([^:]+):", 1)))  # noqa: E731
    value = lambda x: F.trim(F.regexp_extract(x, r"^[^:]+:(.*)$", 1))  # noqa: E731
    me = F.lit(agent.lower())

    empty = F.array().cast("array<string>")
    init = F.struct(
        F.lit(False).alias("in_ua"),
        F.lit(False).alias("exact"),  # current group names *agent* itself
        F.lit(False).alias("star"),  # current group has a '*' UA line
        F.lit(False).alias("has_exact"),  # ANY group so far is exact
        empty.alias("acc_exact"),
        empty.alias("acc_star"),
    )

    def step(s, x):
        is_ua = field(x) == "user-agent"
        is_dis = field(x) == "disallow"
        ua_me = F.lower(value(x)) == me
        ua_star = value(x) == "*"
        # a UA line extends the current head (in_ua) or starts a new one
        exact = (
            F.when(is_ua & s["in_ua"], s["exact"] | ua_me)
            .when(is_ua, ua_me)
            .otherwise(s["exact"])
        )
        star = (
            F.when(is_ua & s["in_ua"], s["star"] | ua_star)
            .when(is_ua, ua_star)
            .otherwise(s["star"])
        )
        has_exact = s["has_exact"] | (is_ua & exact)
        rule = is_dis & (value(x) != "")
        acc_exact = F.when(
            rule & s["exact"], F.array_union(s["acc_exact"], F.array(value(x)))
        ).otherwise(s["acc_exact"])
        acc_star = F.when(
            rule & s["star"] & ~s["exact"],
            F.array_union(s["acc_star"], F.array(value(x))),
        ).otherwise(s["acc_star"])
        return F.struct(
            is_ua.alias("in_ua"),
            exact.alias("exact"),
            star.alias("star"),
            has_exact.alias("has_exact"),
            acc_exact.alias("acc_exact"),
            acc_star.alias("acc_star"),
        )

    rules = F.aggregate(
        lines,
        init,
        step,
        lambda s: F.when(s["has_exact"], s["acc_exact"]).otherwise(s["acc_star"]),
    )
    return (
        df.select(
            F.col(domain_col).alias("domain"),
            F.explode(rules).alias("path_prefix"),
        )
        .distinct()
    )


# -- span-attribute pipeline (the Dolma tagger/mixer architecture) -----------
# Taggers and the mixer are DECOUPLED through an attribute table keyed
# by (doc, span) with character offsets — taggers run independently
# (and incrementally) over the span table; the mixer applies any rule
# set without re-running a tagger.  That separation — not any single
# filter — is the published Dolma/RedPajama pipeline architecture.


def paragraph_spans(
    df: DataFrame, id_col: str, text_col: str, sep: str = "\n\n"
) -> DataFrame:
    """Explode each document into paragraph spans WITH character
    offsets: (id, span_idx, span_start, span_len, span) where
    ``text[span_start : span_start+span_len] == span`` — the offset
    discipline an attribute file needs to stay valid against the raw
    text it was computed from.

    Offsets are built row-locally by a higher-order ``aggregate``
    running sum over the split lengths (shuffle-free; the oracle
    replays them with a per-document window running sum — same
    values).  NULL text yields no spans; empty paragraphs are real
    spans (the mixer decides their fate).  Scale: one projection +
    one explode, no shuffle, no Python."""
    import re as _re

    parts = F.split(
        F.coalesce(F.col(text_col), F.lit("")), _re.escape(sep)
    )
    lens = F.transform(parts, lambda p: F.length(p).cast("bigint"))
    acc0 = F.struct(
        F.array().cast("array<bigint>").alias("st"),
        F.lit(0).cast("bigint").alias("cur"),
    )
    starts = F.aggregate(
        lens,
        acc0,
        lambda acc, ln: F.struct(
            F.concat(acc.st, F.array(acc.cur)).alias("st"),
            (acc.cur + ln + F.lit(len(sep)).cast("bigint")).alias("cur"),
        ),
        lambda acc: acc.st,
    )
    zipped = F.arrays_zip(parts.alias("span"), starts.alias("span_start"))
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(zipped).alias("span_idx", "__z"),
    ).select(
        id_col,
        F.col("span_idx").cast("bigint").alias("span_idx"),
        F.col("__z.span_start").alias("span_start"),
        F.length("__z.span").cast("bigint").alias("span_len"),
        F.col("__z.span").alias("span"),
    )


def tag_span_attrs(
    spans: DataFrame,
    id_col: str,
    min_tokens: int = 3,
    max_symbol_ratio: float = 0.5,
) -> DataFrame:
    """Built-in span taggers, long-form: (id, span_idx, attr, score)
    with one row per attribute that FIRES — the Dolma attribute-file
    shape, unioned across taggers so new taggers append without
    touching existing rows.

    - ``too_short``: fewer than *min_tokens* whitespace tokens
      (score = token count);
    - ``has_pii``: email / phone / IPv4 present (score = match count,
      the redact_pii patterns and order);
    - ``symbol_heavy``: non-alphanumeric-non-space character ratio
      above *max_symbol_ratio* on the lowered span (score = ratio,
      round-6).

    All row-local projections over the span table — no shuffle; a
    tagger added tomorrow reads the same span table and appends its
    own rows."""
    toks = F.size(
        F.filter(F.split(F.trim(F.col("span")), r"\s+"), lambda t: t != "")
    ).cast("double")
    pii_n = (
        F.regexp_count(F.col("span"), F.lit(EMAIL_REGEX))
        + F.regexp_count(
            F.regexp_replace(F.col("span"), EMAIL_REGEX, "<EMAIL>"),
            F.lit(PHONE_REGEX),
        )
        + F.regexp_count(
            F.regexp_replace(
                F.regexp_replace(F.col("span"), EMAIL_REGEX, "<EMAIL>"),
                PHONE_REGEX,
                "<PHONE>",
            ),
            F.lit(IPV4_REGEX),
        )
    ).cast("double")
    low = F.lower(F.col("span"))
    sym_ratio = F.round(
        F.try_divide(
            F.length(F.regexp_replace(low, r"[a-z0-9\s]", "")).cast("double"),
            F.length(low).cast("double"),
        ),
        6,
    )
    base = ["span_idx"]
    short_rows = spans.filter(toks < min_tokens).select(
        id_col, *base, F.lit("too_short").alias("attr"), toks.alias("score")
    )
    pii_rows = spans.filter(pii_n > 0).select(
        id_col, *base, F.lit("has_pii").alias("attr"), pii_n.alias("score")
    )
    sym_rows = spans.filter(
        sym_ratio.isNotNull() & (sym_ratio > max_symbol_ratio)
    ).select(
        id_col, *base, F.lit("symbol_heavy").alias("attr"), sym_ratio.alias("score")
    )
    return short_rows.unionByName(pii_rows).unionByName(sym_rows)


def scrub_spans(
    df: DataFrame,
    spans: DataFrame,
    attrs: DataFrame,
    id_col: str,
    text_col: str,
    drop_attrs: tuple[str, ...],
    sep: str = "\n\n",
) -> DataFrame:
    """The mixer: rebuild each document keeping only spans NOT flagged
    with any attr in *drop_attrs* — kept spans stay VERBATIM in their
    original order, joined by *sep*.  Output: (id, scrubbed_text,
    n_spans_kept, n_spans_removed, chars_removed); chars_removed
    counts span content only (separators excluded).  Every input
    document survives — a fully-scrubbed document comes back with
    empty text and n_spans_kept = 0.

    Scale: the flag set is an anti-join on (id, span_idx) — attribute
    rows per span are tagger-bounded; reassembly is ONE shuffle by
    document id (the dedup_paragraphs argument); everything else is
    row-local."""
    flagged = (
        attrs.filter(F.col("attr").isin(*drop_attrs))
        .select(id_col, "span_idx")
        .distinct()
    )
    kept = spans.join(flagged, [id_col, "span_idx"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("span_idx", "span"))),
                lambda s: s.span,
            ),
            sep,
        ).alias("scrubbed_text"),
        F.count("*").cast("long").alias("n_spans_kept"),
        F.sum("span_len").cast("long").alias("__kept_chars"),
    )
    totals = spans.groupBy(id_col).agg(
        F.count("*").cast("long").alias("__n_spans"),
        F.sum("span_len").cast("long").alias("__total_chars"),
    )
    return (
        df.select(F.col(id_col))
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("scrubbed_text"), F.lit("")).alias("scrubbed_text"),
            F.coalesce(F.col("n_spans_kept"), F.lit(0)).alias("n_spans_kept"),
            (
                F.coalesce(F.col("__n_spans"), F.lit(0))
                - F.coalesce(F.col("n_spans_kept"), F.lit(0))
            ).alias("n_spans_removed"),
            (
                F.coalesce(F.col("__total_chars"), F.lit(0))
                - F.coalesce(F.col("__kept_chars"), F.lit(0))
            ).alias("chars_removed"),
        )
    )
