"""Text analysis for training-data curation: language ID, quality
scoring, token counting, document fingerprinting.

Everything is a pure-Catalyst expression pipeline (no UDF): these run
as map-only stages over the corpus scan, so they cost one pass at any
scale and pipeline into downstream filters for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..fulltext import SPLIT_PATTERN, STOPWORDS
from .dedup import tokens_array

# tiny per-language stopword sets for the n-gram/stopword-ratio
# heuristic (the classic "profile" approach scaled down; real systems
# plug fasttext via a pandas UDF — same plumbing, different scorer)
LANG_MARKERS = {
    "en": STOPWORDS,
    "es": ("el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es", "por"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "de", "et", "est", "un", "une", "dans", "pour", "que", "qui"),
}


def _marker_ratio(toks: Column, markers) -> Column:
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda x: x.isin(*markers)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_lang, en_ratio): argmax of per-language stopword
    hit ratios; 'und' (undetermined) when no profile clears 5%.
    Deterministic int/int ratios; ties break by profile order."""
    toks = tokens_array(F.col(text_col))
    out = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    for lang, markers in LANG_MARKERS.items():
        out = out.withColumn(f"r_{lang}", _marker_ratio(F.col("toks"), markers))
    best = F.lit("und")
    best_r = F.lit(0.05)
    for lang in LANG_MARKERS:  # later profiles win only strictly-greater
        cond = F.col(f"r_{lang}") > best_r
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_r = F.when(cond, F.col(f"r_{lang}")).otherwise(best_r)
    return out.select(
        "doc_id", best.alias("pred_lang"),
        F.round(F.col("r_en"), 6).alias("en_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_chars, n_tokens, stop_ratio, alnum_ratio, quality):
    length/stopword/character-class heuristics; quality in [0,1] =
    min(1, n_tokens/64) * (1 - |stop_ratio - 0.4|). All ratios are
    int/int doubles — bit-deterministic."""
    toks = tokens_array(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    n_alnum = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""))
    n_tokens = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    stop_ratio = F.when(n_tokens > 0, stop_hits.cast("double") / n_tokens.cast("double")).otherwise(F.lit(0.0))
    alnum_ratio = F.when(n_chars > 0, n_alnum.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0))
    quality = F.least(F.lit(1.0), n_tokens.cast("double") / F.lit(64.0)) * (
        F.lit(1.0) - F.abs(stop_ratio - F.lit(0.4))
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(alnum_ratio, 6).alias("alnum_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def token_counts(df: DataFrame, group_col: str = "source",
                 text_col: str = "text") -> DataFrame:
    """Per-group corpus accounting: docs, whitespace tokens, analyzer
    tokens, BPE-ish subword estimate (ceil(chars/4) per word token —
    the standard chars/4 rule of thumb), total chars. Integer sums —
    exact at any scale (one partial+final agg)."""
    ws_tokens = F.size(F.filter(F.split(F.col(text_col), "\\s+"), lambda x: x != F.lit("")))
    an_tokens = F.size(tokens_array(F.col(text_col)))
    bpe_est = F.aggregate(
        tokens_array(F.col(text_col)),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.ceil(F.length(t).cast("double") / F.lit(4.0)).cast("bigint"),
    )
    return (
        df.select(
            F.col(group_col).alias("grp"),
            ws_tokens.alias("ws"), an_tokens.alias("an"),
            bpe_est.alias("bpe"), F.length(F.col(text_col)).alias("ch"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("an").alias("analyzer_tokens"),
            F.sum("bpe").alias("bpe_tokens_est"),
            F.sum("ch").alias("total_chars"),
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp): content fingerprint = md5 of the normalized text
    (lowercase, non-alnum runs collapsed to single spaces, trimmed) —
    robust to whitespace/punctuation-only edits. Map-only."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " "))
    return df.select(F.col(id_col).alias("doc_id"), F.md5(norm).alias("fp"))
