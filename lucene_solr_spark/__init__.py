"""lucene_solr_spark — a PySpark-native inverted-index + BM25 engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of the reference Lucene/Solr 7.7.1 tree at /root/reference:

- analysis chains (StandardTokenizer-style UAX#29 tokenization,
  lowercase, stop filter) as vectorized Arrow/pandas UDFs,
- segment-shaped inverted-index build (posting blocks: docID deltas +
  tfs, FOR-128 bit-packed + VByte, per-block max_doc/max_tf for
  block-max WAND) over partitioned DataFrames,
- log-structured tiered segment merge with manifest-based lineage and
  mid-build resume,
- top-k BM25 queries (k1=1.2, b=0.75 — formula of
  lucene/core/.../search/similarities/BM25Similarity.java:72-74,208-263)
  rank-identical to the reference (score desc, docID asc tie-break per
  lucene/core/.../search/HitQueue.java:76-81),
- boolean composition (MUST/SHOULD/MUST_NOT/FILTER, minShouldMatch,
  dismax), multi-term expansion (prefix/wildcard/fuzzy/range),
- facets/grouping/rollups and training-data-pipeline operators
  (dedup, similarity search, text quality) expressed Spark-first.

Architecture is idiomatic PySpark: DataFrames + Catalyst for everything
relational; numpy/Arrow batch UDFs only for the non-relational parts
(posting compression, block-max pruning, tokenization).
"""

__version__ = "0.1.0"
