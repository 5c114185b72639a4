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
    # tokenizer splits on \s, which Java extends to \x0B and RE2 does
    # not — the oracle contract therefore assumes \x0B-free text (true
    # of the synthetic corpus).  clean_text uses an explicit class
    # (WS_CLASS) and is the sanctioned pre-step for corpora where the
    # distinction matters.
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


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
    """Pre-training text hygiene as ONE codegen projection: strip URLs
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
