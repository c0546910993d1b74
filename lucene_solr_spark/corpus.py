"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
  (repo:string, path:string, commit:string, lang:string, content:string)

Generation is seeded PER DOC (seed mixed with global seed 42), so any
slice can be produced independently and in parallel — this is what lets
the bench-scale corpus (2M docs) be generated distributed inside Spark
via mapInPandas over a range, with no driver-side materialization.

Canonical docID order: dense ints in ORDER BY (repo, path); the
generator emits docs already in that order when iterated 0..n.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterator, List

import numpy as np
import pandas as pd

GLOBAL_SEED = 42

KEYWORDS = (
    "def class import return if for while public static void function var const".split()
)
STOPWORDS_33 = (
    """a an and are as at be but by for if in into is it no not of on or such that the
    their then there these they this to was will with""".split()
)
# 'if'/'for' are both keywords and stopwords; count distinct words
_NUM_IDENTS = 2000 - len(set(KEYWORDS) | set(STOPWORDS_33)) - 50  # numbers take 50 slots
IDENTS = [f"ident{i:03d}" for i in range(_NUM_IDENTS)]
NUMBERS = [str(n) for n in range(100, 150)]

VOCAB: List[str] = sorted(set(KEYWORDS) | set(STOPWORDS_33) | set(IDENTS) | set(NUMBERS))
# Zipf rank order: keywords + stopwords take the top ranks so that
# `import`, `the`, `def` are the skewed mega-terms (SURVEY §7 risk 3),
# then identifiers, then numbers.
_ZIPF_ORDER: List[str] = (
    KEYWORDS
    + [w for w in dict.fromkeys(STOPWORDS_33) if w not in KEYWORDS]
    + IDENTS
    + NUMBERS
)
VOCAB_ARR = np.array(_ZIPF_ORDER)

LANGS = ["py", "java", "js", "go", "md"]
LANG_W = np.array([0.30, 0.25, 0.20, 0.15, 0.10])
EXT = {"py": "py", "java": "java", "js": "js", "go": "go", "md": "md"}

UNICODE_GOLDEN_LINES = [
    "Վիքիպեդիայի 13 հոդված",
    "Testing 1234 B2B 2B",
]

# Zipf(s=1.1) pmf over the vocab, fixed order
_ranks = np.arange(1, len(VOCAB) + 1, dtype=np.float64)
_zipf_w = 1.0 / np.power(_ranks, 1.1)
ZIPF_P = _zipf_w / _zipf_w.sum()
ZIPF_CDF = np.cumsum(ZIPF_P)


def _doc_rng(i: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([GLOBAL_SEED, int(i)]))


def n_repos_for(n_docs: int) -> int:
    if n_docs <= 200:
        return 2
    if n_docs <= 20000:
        return 50
    return max(50, n_docs // 2000)


def gen_doc(i: int, n_docs: int) -> Dict[str, str]:
    """Deterministically generate doc i of an n_docs corpus."""
    rng = _doc_rng(i)
    n_repos = n_repos_for(n_docs)
    per_repo = (n_docs + n_repos - 1) // n_repos
    repo_i = i // per_repo
    j = i % per_repo
    repo = f"repo{repo_i:04d}"
    lang = LANGS[int(rng.choice(len(LANGS), p=LANG_W))]
    d = int(rng.integers(0, 8))
    path = f"src/d{d}/f{j:06d}.{EXT[lang]}"

    # doc length: log-normal, median 120 tokens, capped 4000
    length = int(min(4000, max(1, np.exp(rng.normal(np.log(120), 0.9)))))
    draws = np.searchsorted(ZIPF_CDF, rng.random(length), side="right")
    words = VOCAB_ARR[np.clip(draws, 0, len(VOCAB) - 1)]

    # assemble "source code" lines with mixed case + punctuation
    out: List[str] = []
    k = 0
    while k < len(words):
        line_len = int(rng.integers(3, 9))
        chunk = list(words[k : k + line_len])
        k += line_len
        style = int(rng.integers(0, 10))
        if style == 0 and len(chunk) >= 2:
            chunk[0] = chunk[0].capitalize()
        elif style == 1:
            chunk[-1] = chunk[-1].upper()
        if style == 2 and len(chunk) >= 3:
            line = f"{chunk[0]}.{chunk[1]}({' '.join(chunk[2:])});"
        elif style == 3 and len(chunk) >= 2:
            line = f"{chunk[0]} = {' '.join(chunk[1:])};"
        else:
            line = " ".join(chunk)
        out.append(line)
    if i % 100 == 0:  # fixed 1% embed Unicode goldens
        out.append(UNICODE_GOLDEN_LINES[(i // 100) % len(UNICODE_GOLDEN_LINES)])
    content = "\n".join(out)

    commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()[:40]
    return {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
    }


def gen_range(lo: int, hi: int, n_docs: int) -> pd.DataFrame:
    return pd.DataFrame([gen_doc(i, n_docs) for i in range(lo, hi)])


def gen_corpus_pdf(n_docs: int) -> pd.DataFrame:
    """Whole corpus as pandas (tests / oracle); ordered by (repo, path)."""
    df = gen_range(0, n_docs, n_docs)
    return df.sort_values(["repo", "path"], kind="mergesort").reset_index(drop=True)


def gen_corpus_spark(spark, n_docs: int, partitions: int | None = None):
    """Distributed deterministic generation: spark.range -> mapInPandas.
    Scales to bench size with no driver materialization."""
    from pyspark.sql import functions as F

    parts = partitions or spark.sparkContext.defaultParallelism
    rng_df = spark.range(0, n_docs, numPartitions=parts)

    def gen_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            yield pd.DataFrame([gen_doc(int(i), n_docs) for i in ids])

    schema = "repo string, path string, commit string, lang string, content string"
    return rng_df.mapInPandas(gen_batches, schema=schema)


def content_sha256_pdf(df: pd.DataFrame) -> pd.Series:
    return df["content"].map(lambda c: hashlib.sha256(c.encode()).hexdigest())
