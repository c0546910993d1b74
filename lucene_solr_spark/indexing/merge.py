"""Log-structured tiered segment merge.

Policy is a faithful port of the reference's scoring math
(lucene/core/.../index/TieredMergePolicy.java:96-103 defaults,
score():566-610: skew × totAfterMergeBytes^0.05 × nonDelRatio², lower
is better; allowed-segment budget per tier) — the mechanism is ours:
the driver picks candidate sets and runs each merge as a Spark job that
unions the segments' postings blocks, decodes, re-sorts and re-packs.

Because docIDs are GLOBAL in this engine (assigned once at build from
the canonical (repo, path) order and never remapped), a merge is a pure
re-layout: no DocIDMerger analog is needed, resume is trivial (the
merged segment's name is a deterministic function of its inputs; the
manifest swap is the only commit point), and query results are
byte-identical before and after any merge.
"""

from __future__ import annotations

import hashlib
import math
import os
import shutil
import time
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd

from ..codec import BLOCK_SIZE, decode_block_positions, split_blocks_batch
from .builder import POSTINGS_SCHEMA, _pack_partition, compute_term_stats
from .manifest import Manifest, ManifestStore, SegmentInfo, doc_meta_path, postings_path

# TieredMergePolicy.java:96-101 defaults
MAX_MERGE_AT_ONCE = 10
SEGS_PER_TIER = 10.0
MAX_MERGED_SEGMENT_BYTES = 5 * 1024**3
FLOOR_SEGMENT_BYTES = 2 * 1024**2
# repack flush threshold (rows buffered before encoding complete terms);
# module constant so tests can shrink it to exercise the mid-term path
REPACK_FLUSH_ROWS = 2_000_000


def _floor_size(bytes_: int) -> int:
    return max(FLOOR_SEGMENT_BYTES, bytes_)


def merge_score(candidate: List[SegmentInfo], hit_too_large: bool) -> float:
    """TieredMergePolicy.score():566-610 — lower is better."""
    tot_after = sum(s.size_bytes for s in candidate)
    tot_after_floored = sum(_floor_size(s.size_bytes) for s in candidate)
    if hit_too_large:
        skew = 1.0 / min(MAX_MERGE_AT_ONCE, SEGS_PER_TIER)
    else:
        skew = _floor_size(candidate[0].size_bytes) / tot_after_floored
    score = skew * math.pow(tot_after, 0.05)
    non_del_ratio = 1.0  # no deletes in v1; nonDelRatio² term kept for parity
    score *= math.pow(non_del_ratio, 2)
    return score


def find_merges(segments: List[SegmentInfo]) -> Optional[List[SegmentInfo]]:
    """One round of the findMerges loop (TieredMergePolicy.java:~420-560,
    simplified to the essential algorithm): if the segment count exceeds
    the tier budget, score all contiguous windows (size-sorted, up to
    maxMergeAtOnce, byte-capped) and return the best candidate."""
    if len(segments) < 2:
        return None
    by_size = sorted(segments, key=lambda s: -s.size_bytes)
    tot_bytes = sum(_floor_size(s.size_bytes) for s in by_size)
    # allowed segment budget: segsPerTier per exponential tier
    level = FLOOR_SEGMENT_BYTES
    allowed = 0.0
    remaining = tot_bytes
    while True:
        seg_count_level = remaining / level
        if seg_count_level < SEGS_PER_TIER:
            allowed += math.ceil(seg_count_level)
            break
        allowed += SEGS_PER_TIER
        remaining -= SEGS_PER_TIER * level
        level *= MAX_MERGE_AT_ONCE
    if len(segments) <= max(2.0, allowed):
        return None

    best, best_score = None, None
    for start in range(len(by_size)):
        candidate: List[SegmentInfo] = []
        tot = 0
        hit_too_large = False
        for s in by_size[start:]:
            if tot + s.size_bytes > MAX_MERGED_SEGMENT_BYTES:
                hit_too_large = True
                continue
            candidate.append(s)
            tot += s.size_bytes
            if len(candidate) >= MAX_MERGE_AT_ONCE:
                break
        if len(candidate) < 2:
            continue
        sc = merge_score(candidate, hit_too_large)
        if best_score is None or sc < best_score:
            best, best_score = candidate, sc
    return best


def merged_segment_name(inputs: List[SegmentInfo]) -> str:
    h = hashlib.sha1("|".join(sorted(s.name for s in inputs)).encode()).hexdigest()[:12]
    return f"seg_m_{h}"


def run_merge(spark, store: ManifestStore, manifest: Manifest,
              inputs: List[SegmentInfo], num_partitions: Optional[int] = None) -> Manifest:
    """Execute one merge as a Spark job + manifest swap. Idempotent: the
    output dir name is deterministic, data writes are overwrite-by-name,
    and the manifest commit is the only visibility point — a crash at
    any moment leaves the old generation live (kill/resume test relies
    on this)."""
    t0 = time.time()
    merged_info = _merge_data(spark, store, inputs, num_partitions)
    in_names = {s.name for s in inputs}
    manifest.segments = [s for s in manifest.segments if s.name not in in_names]
    manifest.segments.append(merged_info)
    manifest.segments.sort(key=lambda s: s.doc_base)
    manifest = store.commit(
        manifest,
        lineage_entry={
            "kind": "merge",
            "inputs": sorted(in_names),
            "output": merged_info.name,
            "wall_s": time.time() - t0,
        },
    )
    # old segment dirs are now garbage; reclaim (safe post-commit)
    for s in inputs:
        shutil.rmtree(store.segment_dir(s.name), ignore_errors=True)
    return manifest


def run_merge_concurrent(spark, store: ManifestStore,
                         inputs: List[SegmentInfo],
                         num_partitions: Optional[int] = None) -> Optional[Manifest]:
    """Background-thread merge (ConcurrentMergeScheduler's OneMerge):
    the heavy Spark work runs WITHOUT any lock against the inputs'
    immutable segment dirs; the manifest swap takes the per-index
    commit lock, RELOADS the live manifest (a batch build may have
    committed meanwhile) and re-validates that every input is still
    live — if another merge claimed one, the output is abandoned
    (garbage, never corruption). Returns the committed manifest, or
    None if abandoned."""
    from .manifest import commit_lock

    t0 = time.time()
    merged_info = _merge_data(spark, store, inputs, num_partitions)
    in_names = {s.name for s in inputs}
    with commit_lock(store.index_dir):
        manifest = store.load()
        live = {s.name for s in manifest.segments}
        if not in_names <= live:
            shutil.rmtree(store.segment_dir(merged_info.name), ignore_errors=True)
            return None
        manifest.segments = [s for s in manifest.segments if s.name not in in_names]
        manifest.segments.append(merged_info)
        manifest.segments.sort(key=lambda s: s.doc_base)
        manifest = store.commit(
            manifest,
            lineage_entry={
                "kind": "merge",
                "inputs": sorted(in_names),
                "output": merged_info.name,
                "concurrent": True,
                "wall_s": time.time() - t0,
            },
        )
    for s in inputs:
        shutil.rmtree(store.segment_dir(s.name), ignore_errors=True)
    return manifest


def _merge_data(spark, store: ManifestStore, inputs: List[SegmentInfo],
                num_partitions: Optional[int] = None) -> SegmentInfo:
    """The merge's data phase: read + purge + re-pack + write the merged
    segment dir. Touches NO manifest state — inputs are immutable once
    committed, so this is safe off-thread."""
    from pyspark.sql import functions as F
    parts = num_partitions or spark.sparkContext.defaultParallelism
    name = merged_segment_name(inputs)
    out_dir = store.segment_dir(name)
    in_dirs = [store.segment_dir(s.name) for s in inputs]

    # mergeSchema: inputs may straddle the inline-positions -> split
    # pblob-column format change (an index appended across versions);
    # the union schema keeps pblob, null-filled for old segments
    blocks = (spark.read.option("mergeSchema", "true")
              .parquet(*[postings_path(d) for d in in_dirs]))
    has_positions = _segment_has_positions(spark, in_dirs[0])
    from .deletes import deleted_docs_df, delete_generations

    deletes = (
        deleted_docs_df(spark, store.index_dir)
        if delete_generations(store.index_dir)
        else None
    )

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {"term": [], "doc_id": [], "norm": [], "tf": [], "pos_blob": []}
            pbs = (pdf["pblob"] if "pblob" in pdf.columns
                   else pd.Series([None] * len(pdf)))
            for term, blob, pb in zip(pdf["term"], pdf["blob"], pbs):
                d, f, nb, pos = decode_block_positions(
                    bytes(blob), None if pb is None else bytes(pb))
                cols["term"].append(np.full(len(d), term, dtype=object))
                cols["doc_id"].append(d)
                cols["norm"].append(nb)
                cols["tf"].append(f)
                if has_positions:
                    off = np.concatenate([[0], np.cumsum(f)])
                    cols["pos_blob"].append(
                        [pos[off[i]:off[i + 1]].tolist() for i in range(len(d))]
                    )
            if cols["doc_id"]:
                out = {
                    "term": np.concatenate(cols["term"]),
                    "doc_id": np.concatenate(cols["doc_id"]),
                    "norm": np.concatenate(cols["norm"]),
                    "tf": np.concatenate(cols["tf"]),
                }
                if has_positions:
                    out["positions"] = [p for sub in cols["pos_blob"] for p in sub]
                yield pd.DataFrame(out)

    schema = "term string, doc_id long, norm int, tf long"
    if has_positions:
        schema += ", positions array<int>"
    postings = blocks.mapInPandas(unpack, schema=schema)
    if deletes is not None:
        # physical purge: tombstoned docs drop out of the rewrite
        # (SegmentMerger skips liveDocs=false rows)
        postings = postings.join(deletes, "doc_id", "left_anti")

    # same chunk-salted shuffle + sorted pack as the builder
    shuffled = (
        postings.withColumn("chunk", F.shiftright("doc_id", 13))
        .repartition(parts, "term", "chunk")
        .sortWithinPartitions("term", "doc_id")
        .drop("chunk")
    )
    repacked = shuffled.mapInPandas(
        lambda it: _repack_aggregated(it, has_positions), schema=POSTINGS_SCHEMA
    )
    os.makedirs(out_dir, exist_ok=True)
    repacked.write.mode("overwrite").parquet(os.path.join(out_dir, "postings.parquet"))

    new_blocks = spark.read.parquet(os.path.join(out_dir, "postings.parquet"))
    # cost-gate quantile sketch inputs: canonical avgdl from the input
    # segments' persisted counters (deleted docs' lengths are still in
    # sum_dl — canonical ORDERING tolerance, query-time bounds are
    # re-evaluated under the live avgdl); norms mode from the manifest
    # (None on pre-norms-field manifests -> sketch skipped, legacy OK).
    in_docs = sum(s.doc_count for s in inputs)
    in_dl = sum(s.sum_dl for s in inputs)
    norms_mode = store.load().norms
    is_multifield = any(s.field_stats for s in inputs)
    avgdl_m = (float(in_dl) / in_docs
               if in_docs and norms_mode and not is_multifield else None)
    compute_term_stats(
        new_blocks, avgdl=avgdl_m,
        norms_mode=None if is_multifield else norms_mode,
    ).write.mode("overwrite").parquet(
        os.path.join(out_dir, "term_stats.parquet"))

    meta = spark.read.parquet(*[doc_meta_path(d) for d in in_dirs])
    if deletes is not None:
        meta = meta.join(deletes, "doc_id", "left_anti")
    meta.write.mode("overwrite").parquet(os.path.join(out_dir, "doc_meta.parquet"))
    meta_out = spark.read.parquet(os.path.join(out_dir, "doc_meta.parquet"))
    # multi-field indexes: recompute per-field (docCount, sum_dl) over
    # the LIVE docs — purged docs drop out of the field stats here,
    # exactly when Lucene's FieldInfos stats shed deletions
    from ..fields import field_stats_from_meta_cols

    field_names = field_stats_from_meta_cols(meta_out.columns)
    aggs = [F.count(F.lit(1)).alias("n"), F.sum("length").alias("dl")]
    for fn in field_names:
        aggs.append(F.sum(f"fdl_{fn}").alias(f"dl_{fn}"))
        aggs.append(F.sum((F.col(f"fdl_{fn}") > 0).cast("long")).alias(f"dc_{fn}"))
    live_row = meta_out.agg(*aggs).collect()[0]
    merged_field_stats = (
        {fn: [int(live_row[f"dc_{fn}"] or 0), int(live_row[f"dl_{fn}"] or 0)]
         for fn in field_names}
        if field_names else None
    )

    size_bytes = sum(
        os.path.getsize(os.path.join(dp, fn))
        for dp, _, fns in os.walk(out_dir)
        for fn in fns
    )
    return SegmentInfo(
        name=name,
        doc_base=min(s.doc_base for s in inputs),
        doc_count=int(live_row["n"]),
        sum_dl=int(live_row["dl"] or 0),
        size_bytes=size_bytes,
        source_batch=f"merge:{'+'.join(s.source_batch for s in inputs)}",
        field_stats=merged_field_stats,
    )


def _repack_aggregated(batches: Iterator[pd.DataFrame], with_positions: bool) -> Iterator[pd.DataFrame]:
    """Re-block already-aggregated (term, doc_id, norm, tf[, positions])
    rows — sorted by (term, doc_id) within the partition — via the batch
    block encoder. Unlike the builder's raw-token packer, (term, doc)
    pairs are unique here (each doc lived in exactly one input segment).

    Memory is bounded: rows buffer up to ~2M and COMPLETE terms are
    encoded per round, the (possibly batch-straddling) final term
    carried into the next round. A single term LARGER than the buffer
    (a stop-word-class term in a big merged partition) is encoded
    mid-term at a BLOCK_SIZE multiple — all emitted blocks are full,
    so the codec invariant (a tail block only at true term end) holds,
    and the carried remainder stays < BLOCK_SIZE + one input batch."""

    def encode(pdf: pd.DataFrame) -> Iterator[pd.DataFrame]:
        terms = pdf["term"].to_numpy()
        n = len(terms)
        tc = np.empty(n, dtype=bool)
        tc[0] = True
        tc[1:] = terms[1:] != terms[:-1]
        term_first = np.flatnonzero(tc)
        term_last = np.append(term_first[1:], n)
        P = None
        if with_positions:
            plists = pdf["positions"].to_numpy()
            P = (np.concatenate([np.asarray(x, dtype=np.int64) for x in plists])
                 if n else np.array([], dtype=np.int64))
        res = split_blocks_batch(
            pdf["doc_id"].to_numpy(dtype=np.int64),
            pdf["tf"].to_numpy(dtype=np.int64),
            pdf["norm"].to_numpy(dtype=np.int64),
            term_first, term_last, positions=P, split_pos=True)
        nblocks = len(res["n"])
        if not nblocks:
            return
        cols = {"term": terms[term_first][res["term_idx"]],
                **{k: res[k] for k in ("n", "min_doc", "max_doc", "max_tf",
                                       "sum_tf", "min_norm", "imp_tf",
                                       "imp_norm", "blob", "pblob")}}
        for lo in range(0, nblocks, 65536):
            yield pd.DataFrame({k: v[lo:lo + 65536] for k, v in cols.items()})

    pending: List[pd.DataFrame] = []
    n_pending = 0
    for pdf in batches:
        if not len(pdf):
            continue
        pending.append(pdf)
        n_pending += len(pdf)
        if n_pending >= REPACK_FLUSH_ROWS:
            buf = (pending[0] if len(pending) == 1
                   else pd.concat(pending, ignore_index=True))
            terms = buf["term"].to_numpy()
            heads = np.flatnonzero(
                np.concatenate(([True], terms[1:] != terms[:-1])))
            cut = int(heads[-1])
            if cut == 0:
                # ONE term fills the whole buffer: encode full blocks
                # mid-term (cut at a BLOCK_SIZE multiple — no tail
                # block is emitted, so the term can continue in later
                # rounds) instead of growing the buffer without bound
                cut = (len(buf) // BLOCK_SIZE) * BLOCK_SIZE
            if cut > 0:
                yield from encode(buf.iloc[:cut])
                buf = buf.iloc[cut:].reset_index(drop=True)
            pending = [buf]
            n_pending = len(buf)
    if n_pending:
        buf = (pending[0] if len(pending) == 1
               else pd.concat(pending, ignore_index=True))
        if len(buf):
            yield from encode(buf)


def _segment_has_positions(spark, seg_dir: str) -> bool:
    row = spark.read.parquet(postings_path(seg_dir)).select("blob").head(1)
    if not row:
        return False
    # 1 = inline positions (old format), 2 = split pblob column
    return bytes(row[0]["blob"])[8] in (1, 2)


def maybe_merge(spark, index_dir: str, max_rounds: int = 100) -> Manifest:
    """Driver-side merge loop: apply the tiered policy until no merge is
    selected (ConcurrentMergeScheduler analog, run synchronously)."""
    from .deletes import compact_tombstones, delete_generations

    store = ManifestStore(index_dir)
    manifest = store.load()
    merged_any = False
    for _ in range(max_rounds):
        cand = find_merges(manifest.segments)
        if not cand:
            break
        manifest = run_merge(spark, store, manifest, cand)
        merged_any = True
    if merged_any and delete_generations(index_dir):
        compact_tombstones(spark, index_dir)
    return manifest


def force_merge(spark, index_dir: str, max_segments: int = 1) -> Manifest:
    """forceMerge analog: merge down to max_segments, then rewrite any
    remaining segment that still carries tombstoned docs
    (forceMergeDeletes semantics) and compact the tombstones."""
    from .deletes import compact_tombstones, delete_generations, deleted_docs_df

    store = ManifestStore(index_dir)
    manifest = store.load()
    while len(manifest.segments) > max_segments:
        group = manifest.segments[: max(2, min(MAX_MERGE_AT_ONCE, len(manifest.segments)))]
        manifest = run_merge(spark, store, manifest, group)
    if delete_generations(index_dir):
        dele = deleted_docs_df(spark, index_dir)
        for seg in list(manifest.segments):
            seg_meta = spark.read.parquet(doc_meta_path(store.segment_dir(seg.name)))
            if seg_meta.join(dele, "doc_id", "left_semi").limit(1).count():
                manifest = run_merge(spark, store, manifest, [seg])
        compact_tombstones(spark, index_dir)
    return manifest
