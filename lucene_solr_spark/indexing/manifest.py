"""Segment manifest: the index's single source of truth.

The Spark analog of Lucene's segments_N generation files
(lucene/core/.../index/SegmentInfos.java:57-67,119,137) plus the
per-partition lineage / counters the north rule requires for resume.

Layout under <index_dir>/:
  segments/<seg_name>/{inverted.parquet/kind={blk,doc}, term_stats.parquet}
  (merged segments use the legacy split layout postings.parquet +
  doc_meta.parquet; postings_path/doc_meta_path resolve either)
  manifest/segments_<N>.json    immutable generation files
  manifest/current              text file holding the live generation N

Commit protocol (crash-safe on a posix fs; on object stores the
production target is an Iceberg/metastore atomic swap):
  1. segment data fully written (parquet _SUCCESS markers),
  2. write segments_<N+1>.json via temp file + atomic rename,
  3. flip manifest/current via temp file + atomic rename.
A crash between any steps leaves the previous generation live; stale
segment dirs are garbage, never corruption. Rebuilding a batch is
idempotent: segment names are deterministic functions of the batch id.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
import time
from dataclasses import asdict, dataclass, field
from typing import Dict, List, Optional

# Per-index commit serialization (the IndexWriter commitLock analog,
# index/IndexWriter.java commitLock): concurrent driver threads — a
# batch build and background merges — serialize ONLY the
# load-mutate-commit critical section; the heavy Spark work runs
# outside it. Process-wide by index path.
_COMMIT_LOCKS: Dict[str, threading.Lock] = {}
_COMMIT_LOCKS_GUARD = threading.Lock()


def commit_lock(index_dir: str) -> threading.Lock:
    key = os.path.abspath(index_dir)
    with _COMMIT_LOCKS_GUARD:
        lock = _COMMIT_LOCKS.get(key)
        if lock is None:
            _COMMIT_LOCKS[key] = lock = threading.Lock()
        return lock


@dataclass
class SegmentInfo:
    name: str
    doc_base: int
    doc_count: int
    sum_dl: int  # sum of post-stop field lengths (for global avgdl)
    size_bytes: int
    source_batch: str
    n_deleted: int = 0
    # multi-field builds: {field: [docCount, sumTotalTermFreq]} — the
    # FieldInfos/CollectionStatistics analog (per-field BM25 stats)
    field_stats: Optional[Dict[str, List[int]]] = None


@dataclass
class Manifest:
    generation: int = 0
    segments: List[SegmentInfo] = field(default_factory=list)
    # lineage: one entry per completed build/merge step (counters +
    # watermarks so a 10^12-file build resumes mid-merge)
    lineage: List[dict] = field(default_factory=list)
    # Monotonic docID high-water mark (IndexWriter's never-reused docID
    # allocation). total_docs is NOT safe as a doc_base after a purging
    # merge drops live counts below previously-assigned IDs — reusing an
    # ID of a live doc would sum scores across distinct docs and make
    # tombstones delete the wrong doc. next_doc_id only ever grows.
    next_doc_id: int = 0
    # IndexWriterConfig.setIndexSort analog: docIDs were assigned in
    # this column order, so per-segment physical doc order == sort
    # order and sorted top-k can early-terminate (collectors.py).
    index_sort: Optional[List[str]] = None
    # norm encoding of the index ('byte' = Lucene intToByte4 quantized,
    # 'exact' = raw field length). Recorded so merges can decode
    # min_norm -> doc length when recomputing the per-term block-UB
    # quantile sketch (cost-gate inputs). None on pre-sketch manifests.
    norms: Optional[str] = None

    @property
    def total_docs(self) -> int:
        return sum(s.doc_count for s in self.segments)

    @property
    def sum_dl(self) -> int:
        return sum(s.sum_dl for s in self.segments)

    def completed_batches(self) -> set:
        return {s.source_batch for s in self.segments} | {
            e["batch"] for e in self.lineage if e.get("kind") == "build"
        }


def _atomic_write(path: str, data: str) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d)
    with os.fdopen(fd, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class ManifestStore:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.mdir = os.path.join(index_dir, "manifest")

    def current_generation(self) -> int:
        cur = os.path.join(self.mdir, "current")
        if not os.path.exists(cur):
            return 0
        with open(cur) as f:
            return int(f.read().strip())

    def load(self) -> Manifest:
        gen = self.current_generation()
        if gen == 0:
            return Manifest()
        with open(os.path.join(self.mdir, f"segments_{gen}.json")) as f:
            raw = json.load(f)
        segments = [SegmentInfo(**s) for s in raw["segments"]]
        # pre-next_doc_id manifests: doc_base + doc_count is the best
        # available bound (exact unless a purging merge already ran)
        fallback_hwm = max((s.doc_base + s.doc_count for s in segments), default=0)
        return Manifest(
            generation=raw["generation"],
            segments=segments,
            lineage=raw.get("lineage", []),
            next_doc_id=int(raw.get("next_doc_id", fallback_hwm)),
            index_sort=raw.get("index_sort"),
            norms=raw.get("norms"),
        )

    def commit(self, manifest: Manifest, lineage_entry: Optional[dict] = None) -> Manifest:
        """Two-phase commit: write next-generation file, flip pointer."""
        gen = self.current_generation() + 1
        manifest.generation = gen
        if lineage_entry is not None:
            lineage_entry = dict(lineage_entry, committed_at=time.time(), generation=gen)
            manifest.lineage.append(lineage_entry)
        payload = json.dumps(
            {
                "generation": gen,
                "segments": [asdict(s) for s in manifest.segments],
                "next_doc_id": manifest.next_doc_id,
                "index_sort": manifest.index_sort,
                "norms": manifest.norms,
                "lineage": manifest.lineage,
                "counters": {
                    "total_docs": manifest.total_docs,
                    "sum_dl": manifest.sum_dl,
                    "n_segments": len(manifest.segments),
                },
            },
            indent=1,
        )
        _atomic_write(os.path.join(self.mdir, f"segments_{gen}.json"), payload)
        _atomic_write(os.path.join(self.mdir, "current"), str(gen))
        return manifest

    def segment_dir(self, name: str) -> str:
        return os.path.join(self.index_dir, "segments", name)


def postings_path(seg_dir: str) -> str:
    """Postings blocks location — single-write layout (kind=blk) or the
    legacy/merge layout (postings.parquet)."""
    p = os.path.join(seg_dir, "inverted.parquet", "kind=blk")
    return p if os.path.isdir(p) else os.path.join(seg_dir, "postings.parquet")


def doc_meta_path(seg_dir: str) -> str:
    p = os.path.join(seg_dir, "inverted.parquet", "kind=doc")
    return p if os.path.isdir(p) else os.path.join(seg_dir, "doc_meta.parquet")
