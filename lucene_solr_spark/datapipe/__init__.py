"""Large-scale training-data pipeline operators over the engine's
analysis chain: deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding cosine), similarity search (brute-force + LSH ANN),
text analysis (language ID, quality scoring, token counting,
fingerprinting), and multimodal binary-column plumbing.

All operators are DataFrame-first: built-in functions and higher-order
lambdas in the hot path, Arrow-batched pandas UDFs only where Spark
lacks the primitive (multimodal decode). Where the algorithm needs a
hash, two variants exist:

  h60(s)  — portable 60-bit md5 prefix (int(md5[:15], 16)): identical
            in Spark and DuckDB, used by oracle-checked operators.
  xxhash64 — Spark's JVM xxhash, cheaper; used by the at-scale variants
            (MinHash signatures, hyperplane LSH) that the SQL oracle
            cannot replicate (rows-only correctness check).
"""

from . import dedup, multimodal, similarity, textqa  # noqa: F401
