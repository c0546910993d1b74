"""Segment builder: corpus DataFrame -> inverted-index segment.

The Spark-first restatement of the reference write path
(IndexWriter.addDocument -> DefaultIndexingChain.invert ->
FreqProxTermsWriter flush -> Lucene50PostingsWriter blocks; SURVEY §3.3):

  DWPT (thread-private chamber)       == Spark partition
  invert (tokens -> term hash pools)  == explode + run-aggregation
  flush sort (sortPostings:77)        == one hash shuffle on
                                         (term, doc-chunk) + sortWithinPartitions
  FOR-128 block write                 == mapInPandas numpy bit-packing
  segment + segments_N commit         == parquet dirs + manifest commit

Scale/skew design (north rule):
  - ONE shuffle moves the exploded tokens; partition key is
    (term, doc_id >> CHUNK_BITS) — the salting analog: a mega-term
    (`import`, `the`) is split into disjoint doc-range chunks that
    hash-balance across partitions, so no task owns a whole hot
    posting list (CompositeIdRouter.java:45-54 is the reference's
    hash-routing; the chunk salt is ours).
  - no repartitionByRange: range partitioning samples its input, which
    would run the (expensive) analysis UDF twice.
  - analysis runs once: the tokenized frame is persisted
    (MEMORY_AND_DISK -> executor spill at scale) and feeds both the
    doc_meta write and the postings shuffle.
  - term stats aggregate per-block metadata (two-level agg), never the
    raw postings.
"""

from __future__ import annotations

import hashlib
import os
import time
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd

from ..analysis import make_analyze_udf
from ..codec import split_blocks
from ..smallfloat import int_to_byte4_np
from .docids import assign_doc_ids
from .manifest import Manifest, ManifestStore, SegmentInfo

POSTINGS_SCHEMA = (
    "term string, n int, min_doc long, max_doc long, max_tf int, "
    "sum_tf long, min_norm int, blob binary"
)

CHUNK_BITS = 13  # 8192-doc chunks: the unit of mega-term splitting
BLOCK = 128


class _TermBuffer:
    """Aggregated postings of the current term, pending block emission."""

    __slots__ = ("docs", "tfs", "norms", "pos")

    def __init__(self):
        self.docs: List[int] = []
        self.tfs: List[int] = []
        self.norms: List[int] = []
        self.pos: List[np.ndarray] = []  # one array per posting


def _emit_blocks(term: str, buf: _TermBuffer, out: List[dict], *, final: bool,
                 with_positions: bool) -> None:
    """Emit FOR-128 block rows. Non-final: hold back the last posting
    (the next input batch may continue the same doc) and emit only full
    blocks."""
    n = len(buf.docs)
    limit = n if final else n - 1
    cut = limit if final else (limit // BLOCK) * BLOCK
    if cut <= 0:
        return
    d = np.asarray(buf.docs[:cut], dtype=np.int64)
    f = np.asarray(buf.tfs[:cut], dtype=np.int64)
    nb = np.asarray(buf.norms[:cut], dtype=np.int64)
    p = None
    if with_positions:
        p = (
            np.concatenate(buf.pos[:cut])
            if cut
            else np.array([], dtype=np.int64)
        )
    for blk in split_blocks(d, f, nb, nb, p):
        out.append(
            {
                "term": term,
                **{k: blk[k] for k in ("n", "min_doc", "max_doc", "max_tf", "sum_tf", "min_norm", "blob")},
            }
        )
    del buf.docs[:cut], buf.tfs[:cut], buf.norms[:cut]
    if with_positions:
        del buf.pos[:cut]


def _pack_partition(batches: Iterator[pd.DataFrame], with_positions: bool) -> Iterator[pd.DataFrame]:
    """Aggregate raw (term, doc_id, norm[, pos]) token rows — sorted by
    (term, doc_id[, pos]) within the partition — into per-(term, doc)
    postings, then into block rows. Docs and terms may span input
    batches; buffers carry across."""
    cur_term: Optional[str] = None
    buf = _TermBuffer()
    out_rows: List[dict] = []

    for pdf in batches:
        if len(pdf) == 0:
            continue
        terms = pdf["term"].to_numpy()
        docs = pdf["doc_id"].to_numpy(dtype=np.int64)
        norms = pdf["norm"].to_numpy(dtype=np.int64)
        pos = pdf["pos"].to_numpy(dtype=np.int64) if with_positions else None
        # run boundaries where (term, doc) changes
        term_change = np.empty(len(pdf), dtype=bool)
        term_change[0] = True
        term_change[1:] = terms[1:] != terms[:-1]
        doc_change = np.empty(len(pdf), dtype=bool)
        doc_change[0] = True
        doc_change[1:] = docs[1:] != docs[:-1]
        starts = np.flatnonzero(term_change | doc_change)
        ends = np.append(starts[1:], len(pdf))
        for s, e in zip(starts, ends):
            term = terms[s]
            if term != cur_term:
                if cur_term is not None:
                    _emit_blocks(cur_term, buf, out_rows, final=True,
                                 with_positions=with_positions)
                cur_term = term
            doc = int(docs[s])
            tf = int(e - s)
            if buf.docs and buf.docs[-1] == doc:
                # same doc continued from the previous batch
                buf.tfs[-1] += tf
                if with_positions:
                    buf.pos[-1] = np.concatenate([buf.pos[-1], pos[s:e]])
            else:
                buf.docs.append(doc)
                buf.tfs.append(tf)
                buf.norms.append(int(norms[s]))
                if with_positions:
                    buf.pos.append(pos[s:e])
        _emit_blocks(cur_term, buf, out_rows, final=False, with_positions=with_positions)
        if out_rows:
            yield pd.DataFrame(out_rows)
            out_rows = []
    if cur_term is not None:
        _emit_blocks(cur_term, buf, out_rows, final=True, with_positions=with_positions)
    if out_rows:
        yield pd.DataFrame(out_rows)


def build_segment(
    spark,
    corpus_df,
    seg_dir: str,
    doc_base: int = 0,
    analyzer: str = "standard",
    norms: str = "byte",
    positions: bool = True,
    num_partitions: Optional[int] = None,
) -> dict:
    """Build one segment from a corpus batch. Returns counters.

    norms='byte': Lucene intToByte4-quantized field length (bit-parity
    with the reference); norms='exact': raw field length stored instead
    (used by the SQL-oracle-checked query surface).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.storagelevel import StorageLevel

    parts = num_partitions or spark.sparkContext.defaultParallelism
    t0 = time.time()

    with_ids, id_cache = assign_doc_ids(
        corpus_df, ["repo", "path"], base=doc_base, num_partitions=parts
    )

    analyze = make_analyze_udf(analyzer)

    @pandas_udf("string")
    def sha256_udf(texts: pd.Series) -> pd.Series:
        # independent of Spark's sha2() so the per-row integrity check
        # compares two implementations (input_hint: content sha256 equality)
        return texts.map(lambda t: hashlib.sha256((t or "").encode()).hexdigest())

    analyzed = with_ids.withColumn("tokens", analyze(F.col("content"))).withColumn(
        "length", F.size("tokens")
    )
    if norms == "byte":

        @pandas_udf("int")
        def norm_udf(lengths: pd.Series) -> pd.Series:
            return pd.Series(int_to_byte4_np(lengths.to_numpy()).astype(np.int64))

        analyzed = analyzed.withColumn("norm", norm_udf(F.col("length")))
    else:
        analyzed = analyzed.withColumn("norm", F.col("length"))
    analyzed = analyzed.persist(StorageLevel.MEMORY_AND_DISK)

    doc_meta = analyzed.select(
        "doc_id", "repo", "path", "commit", "lang", "length", "norm",
        sha256_udf(F.col("content")).alias("sha256"),
    )
    os.makedirs(seg_dir, exist_ok=True)
    doc_meta.write.mode("overwrite").parquet(os.path.join(seg_dir, "doc_meta.parquet"))

    # invert + flush: explode, ONE hash shuffle on (term, chunk), sort, pack
    cols = ["doc_id", "norm", F.explode("tokens").alias("t")]
    flat = analyzed.select(*cols).select(
        "doc_id",
        "norm",
        F.col("t.term").alias("term"),
        F.col("t.pos").alias("pos"),
        F.shiftright("doc_id", CHUNK_BITS).alias("chunk"),
    )
    sort_cols = ["term", "doc_id"] + (["pos"] if positions else [])
    shuffled = flat.repartition(parts, "term", "chunk").sortWithinPartitions(*sort_cols)
    if not positions:
        shuffled = shuffled.select("term", "doc_id", "norm")
    packed = shuffled.mapInPandas(
        lambda it: _pack_partition(it, positions), schema=POSTINGS_SCHEMA
    )
    postings_path = os.path.join(seg_dir, "postings.parquet")
    packed.write.mode("overwrite").parquet(postings_path)

    # two-level term stats: per-block metadata -> per-term (reads only
    # the small metadata columns back from the written postings)
    blocks = spark.read.parquet(postings_path)
    term_stats = blocks.groupBy("term").agg(
        F.sum("n").alias("df"), F.sum("sum_tf").alias("ttf")
    )
    term_stats.write.mode("overwrite").parquet(os.path.join(seg_dir, "term_stats.parquet"))

    meta = spark.read.parquet(os.path.join(seg_dir, "doc_meta.parquet"))
    counters_row = meta.agg(
        F.count(F.lit(1)).alias("doc_count"), F.sum("length").alias("sum_dl")
    ).collect()[0]

    # per-row integrity: recompute sha with Spark's JVM-side sha2 over the
    # source and compare against the python-hashlib values in doc_meta
    src_sha = corpus_df.select(
        "repo", "path", F.sha2(F.col("content"), 256).alias("sha_jvm")
    )
    mismatches = (
        meta.join(src_sha, ["repo", "path"], "inner")
        .where(F.col("sha256") != F.col("sha_jvm"))
        .count()
    )
    analyzed.unpersist()
    id_cache.unpersist()
    if mismatches:
        raise RuntimeError(f"content sha256 mismatch on {mismatches} rows")

    size_bytes = sum(
        os.path.getsize(os.path.join(dp, fn))
        for dp, _, fns in os.walk(seg_dir)
        for fn in fns
    )
    return {
        "doc_count": int(counters_row["doc_count"]),
        "sum_dl": int(counters_row["sum_dl"] or 0),
        "size_bytes": size_bytes,
        "wall_s": time.time() - t0,
        "sha_mismatches": int(mismatches),
    }


def build_index(
    spark,
    index_dir: str,
    corpus_batches,
    analyzer: str = "standard",
    norms: str = "byte",
    positions: bool = True,
    fail_after_batch: Optional[int] = None,
) -> Manifest:
    """Log-structured index build: one segment per batch, manifest commit
    after each — resumable at batch granularity (north rule). Completed
    batches (recorded in the live manifest) are skipped on re-run.

    corpus_batches: ordered list of (batch_id, DataFrame). Order is part
    of the contract: docID bases are assigned cumulatively.
    fail_after_batch: test hook — simulate a crash after N batches.
    """
    store = ManifestStore(index_dir)
    manifest = store.load()
    done = manifest.completed_batches()
    for i, (batch_id, df) in enumerate(corpus_batches):
        if batch_id in done:
            continue
        seg_name = f"seg_{batch_id}"
        seg_dir = store.segment_dir(seg_name)
        counters = build_segment(
            spark, df, seg_dir, doc_base=manifest.total_docs,
            analyzer=analyzer, norms=norms, positions=positions,
        )
        manifest.segments.append(
            SegmentInfo(
                name=seg_name,
                doc_base=manifest.total_docs,
                doc_count=counters["doc_count"],
                sum_dl=counters["sum_dl"],
                size_bytes=counters["size_bytes"],
                source_batch=batch_id,
            )
        )
        manifest = store.commit(
            manifest,
            lineage_entry={
                "kind": "build",
                "batch": batch_id,
                **{k: counters[k] for k in ("doc_count", "sum_dl", "wall_s", "sha_mismatches")},
            },
        )
        if fail_after_batch is not None and i + 1 >= fail_after_batch:
            raise KeyboardInterrupt(f"simulated crash after batch {batch_id}")
    return manifest
