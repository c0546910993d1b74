"""Driver-contract query registry: name -> (spark_fn, oracle_sql).

Each entry implements one operator from SURVEY.md §2 as an idiomatic
Spark DataFrame plan (see fulltext.py for the fulltext surface) and an
ANSI-SQL oracle that DuckDB runs over the same parquet tables. The
driver compares row-count + schema + order-insensitive value hashes, so
every computed column is aliased identically on both sides, floats are
rounded to 6 digits on both sides, and aggregates are CAST to matching
types (DuckDB sum(int) is HUGEINT -> cast to BIGINT).

The fulltext queries run over the `documents` table with the engine's
SQL-replicable "simple" analyzer (lowercase, split [^a-z0-9]+, 33-word
Lucene stop set); the float32 Lucene-parity path is exercised by pytest
(tests/ vs the pandas oracle) and by bench.py over the segment index.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F

from .fulltext import STOPWORDS, FulltextIndex

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: Dict[str, Tuple[QueryFn, Optional[str]]] = {}


def register(name: str, sql: Optional[str]):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, sql)
        return fn
    return deco


def queries() -> Dict[str, QueryFn]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> Dict[str, str]:
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ft(spark: SparkSession, sf_dir: str) -> FulltextIndex:
    return FulltextIndex(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB). __STOPS__ is replaced with the stop list.
# ---------------------------------------------------------------------------

_STOPS_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

_TOKS_CTE = """
toks AS (
  SELECT d.doc_id, u.t AS term
  FROM (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '' AND x NOT IN (__STOPS__)) AS l
    FROM documents
  ) d, unnest(d.l) AS u(t)
)"""

_POSTOKS_CTE = """
postoks AS (
  SELECT d.doc_id, u.s['term'] AS term, CAST(u.s['pos'] AS INT) AS pos
  FROM (
    SELECT doc_id,
           list_transform(
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '' AND x NOT IN (__STOPS__)),
             (x, i) -> {'term': x, 'pos': i}) AS l
    FROM documents
  ) d, unnest(d.l) AS u(s)
)"""

_POST_CTE = """
post AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
)"""

_DL_CTE = """
dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
)"""

_STATS_CTE = """
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(count(*) AS DOUBLE) FROM toks)
           / (SELECT count(*) FROM documents) AS avgdl
)"""

# BM25 with df computed per term; mirrors fulltext.bm25_expr operation
# order exactly: idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75*dl/avgdl))
_SCORED_CTE = """
dfs AS (
  SELECT term, count(*) AS df FROM post GROUP BY term
),
scored AS (
  SELECT p.doc_id, p.term,
         ln(1 + ((SELECT n FROM stats) - f.df + 0.5) / (f.df + 0.5))
           * (p.tf * 2.2)
           / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / (SELECT avgdl FROM stats)))
           AS score
  FROM post p
  JOIN dfs f USING (term)
  JOIN dl l USING (doc_id)
)"""


def _ft_sql(body: str, positions: bool = False) -> str:
    ctes = [_POSTOKS_CTE if positions else _TOKS_CTE]
    if positions:
        ctes.append("toks AS (SELECT doc_id, term FROM postoks)")
    ctes += [_POST_CTE, _DL_CTE, _STATS_CTE, _SCORED_CTE]
    sql = "WITH " + ",".join(ctes) + "\n" + body
    return sql.replace("__STOPS__", _STOPS_SQL)


# ---------------------------------------------------------------------------
# fulltext operators (SURVEY §2.4, §2.5, §2.7)
# ---------------------------------------------------------------------------

@register("ft_term_bm25", _ft_sql("""
SELECT doc_id, round(score, 6) AS score
FROM scored WHERE term = 'spark'
ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 10
"""))
def ft_term_bm25(spark, sf_dir):
    """TermQuery + top-k BM25 (TermQuery.java:41, TopScoreDocCollector)."""
    return ft(spark, sf_dir).term_query("spark", k=10)


@register("ft_bool_and_bm25", _ft_sql("""
SELECT doc_id, round(score, 6) AS score FROM (
  SELECT doc_id, sum(score) AS score, count(*) AS nm
  FROM scored WHERE term IN ('spark', 'vector') GROUP BY doc_id
) WHERE nm = 2
ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 10
"""))
def ft_bool_and_bm25(spark, sf_dir):
    """Boolean MUST conjunction: count-intersection hash agg
    (ConjunctionDISI.java:185 leapfrog analog, one shuffle)."""
    return ft(spark, sf_dir).boolean_and(["spark", "vector"], k=10)


@register("ft_bool_or_bm25", _ft_sql("""
SELECT doc_id, round(score, 6) AS score FROM (
  SELECT doc_id, sum(score) AS score
  FROM scored WHERE term IN ('spark', 'vector', 'dup') GROUP BY doc_id
)
ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 10
"""))
def ft_bool_or_bm25(spark, sf_dir):
    """Boolean SHOULD disjunction: union + group-sum
    (DisjunctionSumScorer)."""
    return ft(spark, sf_dir).boolean_or(["spark", "vector", "dup"], k=10)


@register("ft_min_should_match", _ft_sql("""
SELECT doc_id, round(score, 6) AS score FROM (
  SELECT doc_id, sum(score) AS score, count(*) AS nm
  FROM scored WHERE term IN ('spark', 'vector', 'dup') GROUP BY doc_id
) WHERE nm >= 2
ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 10
"""))
def ft_min_should_match(spark, sf_dir):
    """minimumShouldMatch=2 of 3 (MinShouldMatchSumScorer.java:49)."""
    return ft(spark, sf_dir).boolean_or(["spark", "vector", "dup"], k=10,
                                        min_should_match=2)


@register("ft_bool_not", _ft_sql("""
SELECT doc_id, round(score, 6) AS score FROM (
  SELECT doc_id, sum(score) AS score
  FROM scored WHERE term = 'spark' GROUP BY doc_id
) m WHERE m.doc_id NOT IN (
  SELECT DISTINCT doc_id FROM post WHERE term = 'vector'
)
ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 10
"""))
def ft_bool_not(spark, sf_dir):
    """MUST + MUST_NOT (ReqExclScorer -> left_anti join)."""
    return ft(spark, sf_dir).boolean_not(["spark"], ["vector"], k=10)


@register("ft_filter_clause", _ft_sql("""
SELECT doc_id, round(score, 6) AS score FROM (
  SELECT doc_id, sum(score) AS score
  FROM scored WHERE term = 'spark' GROUP BY doc_id
) m WHERE m.doc_id IN (SELECT DISTINCT doc_id FROM post WHERE term = 'dup')
ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 10
"""))
def ft_filter_clause(spark, sf_dir):
    """Occur.FILTER: match-without-score semi join
    (Boolean2ScorerSupplier.java:120-152)."""
    return ft(spark, sf_dir).boolean_filter(["spark"], ["dup"], k=10)


@register("ft_dismax", _ft_sql("""
SELECT doc_id, round(mx + 0.1 * (sm - mx), 6) AS score FROM (
  SELECT doc_id, max(score) AS mx, sum(score) AS sm
  FROM scored WHERE term IN ('spark', 'vector') GROUP BY doc_id
)
ORDER BY round(mx + 0.1 * (sm - mx), 6) DESC, doc_id ASC LIMIT 10
"""))
def ft_dismax(spark, sf_dir):
    """DisjunctionMaxQuery tie_breaker=0.1 (DisjunctionMaxQuery.java:47)."""
    return ft(spark, sf_dir).dismax(["spark", "vector"], tie_breaker=0.1, k=10)


@register("ft_synonym", _ft_sql("""
SELECT doc_id, round(score, 6) AS score FROM (
  SELECT m.doc_id,
         ln(1 + ((SELECT n FROM stats) - b.df + 0.5) / (b.df + 0.5))
           * (m.tf * 2.2)
           / (m.tf + 1.2 * (0.25 + 0.75 * l.dl / (SELECT avgdl FROM stats)))
           AS score
  FROM (
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS tf FROM post
    WHERE term IN ('merge', 'join') GROUP BY doc_id
  ) m
  JOIN dl l USING (doc_id)
  CROSS JOIN (SELECT max(df) AS df FROM dfs WHERE term IN ('merge', 'join')) b
)
ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 10
"""))
def ft_synonym(spark, sf_dir):
    """SynonymQuery: summed tf, blended df = max (SynonymQuery.java:47)."""
    return ft(spark, sf_dir).synonym_query(["merge", "join"], k=10)


@register("ft_term_in_set", _ft_sql("""
SELECT DISTINCT doc_id FROM post WHERE term IN ('dup', 'vector')
"""))
def ft_term_in_set(spark, sf_dir):
    """TermInSetQuery constant-score doc set (TermInSetQuery.java:68)."""
    return ft(spark, sf_dir).term_in_set(["dup", "vector"])


@register("ft_prefix_terms", _ft_sql("""
SELECT term, count(*) AS df FROM post WHERE term LIKE 'st%' GROUP BY term
"""))
def ft_prefix_terms(spark, sf_dir):
    """PrefixQuery dictionary expansion (PrefixQuery.java:31; the
    BlockTree intersect analog — pushdown on the term column)."""
    return ft(spark, sf_dir).prefix_terms("st")


@register("ft_wildcard", _ft_sql("""
SELECT DISTINCT doc_id FROM post WHERE term LIKE 's_an'
"""))
def ft_wildcard(spark, sf_dir):
    """WildcardQuery cr?ne -> CONSTANT_SCORE doc set
    (WildcardQuery.java:42)."""
    return ft(spark, sf_dir).wildcard_match("s_an")


@register("ft_fuzzy_terms", _ft_sql("""
SELECT DISTINCT term FROM post
WHERE length(term) BETWEEN 3 AND 5 AND levenshtein(term, 'scan') <= 1
"""))
def ft_fuzzy_terms(spark, sf_dir):
    """FuzzyQuery~1 dictionary expansion (FuzzyQuery.java:53)."""
    return ft(spark, sf_dir).fuzzy_terms("scan", max_edits=1)


@register("ft_term_range", _ft_sql("""
SELECT doc_id, CAST(count(*) AS BIGINT) AS nterms FROM post
WHERE term BETWEEN 'query' AND 'sort' GROUP BY doc_id
"""))
def ft_term_range(spark, sf_dir):
    """TermRangeQuery [query TO sort] (TermRangeQuery.java:37)."""
    return ft(spark, sf_dir).term_range("query", "sort")


@register("ft_phrase_bm25", _ft_sql("""
SELECT doc_id, round(score, 6) AS score FROM (
  SELECT f.doc_id,
         ((SELECT ln(1 + ((SELECT n FROM stats) - df + 0.5) / (df + 0.5))
             FROM dfs WHERE term = 'hash')
          + (SELECT ln(1 + ((SELECT n FROM stats) - df + 0.5) / (df + 0.5))
             FROM dfs WHERE term = 'join'))
           * (f.tf * 2.2)
           / (f.tf + 1.2 * (0.25 + 0.75 * l.dl / (SELECT avgdl FROM stats)))
           AS score
  FROM (
    SELECT a.doc_id, count(*) AS tf
    FROM postoks a JOIN postoks b
      ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    WHERE a.term = 'hash' AND b.term = 'join'
    GROUP BY a.doc_id
  ) f JOIN dl l USING (doc_id)
)
ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 10
""", positions=True))
def ft_phrase_bm25(spark, sf_dir):
    """Exact PhraseQuery "hash join" (PhraseQuery.java:68,
    ExactPhraseMatcher): position-stream self-join, idf summed."""
    return ft(spark, sf_dir).phrase_query(["hash", "join"], k=10)


@register("ft_total_hits", _ft_sql("""
SELECT CAST(count(*) AS BIGINT) AS total_hits FROM (
  SELECT doc_id FROM post WHERE term IN ('spark', 'vector') GROUP BY doc_id
)
"""))
def ft_total_hits(spark, sf_dir):
    """TotalHitCountCollector over an OR query."""
    return ft(spark, sf_dir).total_hits(["spark", "vector"], mode="or")


@register("ft_term_facet", _ft_sql("""
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS ttf
FROM post GROUP BY term
ORDER BY df DESC, term ASC LIMIT 20
"""))
def ft_term_facet(spark, sf_dir):
    """Terms facet over the dictionary: top-20 by df
    (FacetFieldProcessorByHashDV hash agg)."""
    return ft(spark, sf_dir).term_facet(n=20)
