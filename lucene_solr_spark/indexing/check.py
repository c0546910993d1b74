"""CheckIndex analog: full-index integrity verification.

Reference: lucene/core/.../index/CheckIndex.java (the `java -ea
org.apache.lucene.index.CheckIndex` tool) — walks every segment and
cross-checks terms, postings, norms, stored fields and deletions
against the segment metadata. Same contract here, as Spark jobs over
the index relations:

  manifest       generation file readable, counters match data
  doc ranges     segment doc_id ranges disjoint; ids within
                 [doc_base, next_doc_id)
  doc meta       doc_count / sum_dl match manifest; no duplicate ids
  postings       block invariants (n >= 1, min_doc <= max_doc,
                 max_tf >= 1); decoded block length == n; decoded docs
                 sorted, within [min_doc, max_doc]; min norm matches
  term stats     df == sum(block n), ttf == sum(block sum_tf) per term
  tombstones     every tombstoned doc exists in some live segment

Returns a report dict; raises CheckIndexFailure when `raise_on_error`.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd

from ..codec import decode_block, decode_block_positions
from .deletes import delete_generations, deleted_docs_df
from .manifest import ManifestStore, doc_meta_path, postings_path


class CheckIndexFailure(RuntimeError):
    pass


def check_index(spark, index_dir: str, decode_blocks: bool = True,
                raise_on_error: bool = True) -> dict:
    from pyspark.sql import functions as F

    store = ManifestStore(index_dir)
    manifest = store.load()
    errors: List[str] = []
    report: dict = {"generation": manifest.generation,
                    "segments": len(manifest.segments)}

    # segment doc ranges: disjoint, under the high-water mark
    spans = sorted((s.doc_base, s.doc_count, s.name) for s in manifest.segments)
    for (b1, c1, n1), (b2, c2, n2) in zip(spans, spans[1:]):
        # merged segments keep global ids: their span is [doc_base, ...)
        # but never overlaps a later base only if data agrees — checked
        # from doc_meta below; here check bases are distinct
        if b1 == b2:
            errors.append(f"segments {n1}/{n2} share doc_base {b1}")

    seg_dirs = {s.name: store.segment_dir(s.name) for s in manifest.segments}
    total_docs = 0
    total_dl = 0
    for s in manifest.segments:
        meta = spark.read.parquet(doc_meta_path(seg_dirs[s.name]))
        row = meta.agg(
            F.count(F.lit(1)).alias("n"), F.sum("length").alias("dl"),
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"),
            F.count_distinct("doc_id").alias("nd"),
        ).collect()[0]
        if int(row["n"]) != s.doc_count:
            errors.append(f"{s.name}: doc_count {row['n']} != manifest {s.doc_count}")
        if int(row["dl"] or 0) != s.sum_dl:
            errors.append(f"{s.name}: sum_dl {row['dl']} != manifest {s.sum_dl}")
        if int(row["nd"]) != int(row["n"]):
            errors.append(f"{s.name}: duplicate doc_ids")
        if row["lo"] is not None and int(row["lo"]) < s.doc_base:
            errors.append(f"{s.name}: doc_id {row['lo']} below doc_base {s.doc_base}")
        if row["hi"] is not None and int(row["hi"]) >= manifest.next_doc_id:
            errors.append(
                f"{s.name}: doc_id {row['hi']} >= next_doc_id {manifest.next_doc_id}")
        total_docs += int(row["n"])
        total_dl += int(row["dl"] or 0)
    report["docs"] = total_docs
    report["sum_dl"] = total_dl

    # cross-segment uniqueness of doc ids
    if len(manifest.segments) > 1:
        all_meta = spark.read.parquet(
            *[doc_meta_path(d) for d in seg_dirs.values()])
        dup = (
            all_meta.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 1).count()
        )
        if dup:
            errors.append(f"{dup} doc_ids shared across segments")

    # postings block invariants + stats reconciliation per segment
    n_blocks = 0
    for s in manifest.segments:
        blocks = spark.read.parquet(postings_path(seg_dirs[s.name]))
        bad = blocks.where(
            (F.col("n") < 1) | (F.col("min_doc") > F.col("max_doc"))
            | (F.col("max_tf") < 1) | (F.col("sum_tf") < F.col("n"))
        ).count()
        if bad:
            errors.append(f"{s.name}: {bad} blocks violate metadata invariants")
        n_blocks += blocks.count()

        stats = spark.read.parquet(f"{seg_dirs[s.name]}/term_stats.parquet")
        derived = blocks.groupBy("term").agg(
            F.sum("n").alias("df2"), F.sum("sum_tf").alias("ttf2"))
        mism = (
            stats.join(derived, "term", "full")
            .where(
                F.col("df").isNull() | F.col("df2").isNull()
                | (F.col("df") != F.col("df2")) | (F.col("ttf") != F.col("ttf2"))
            ).count()
        )
        if mism:
            errors.append(f"{s.name}: {mism} terms with stats/postings mismatch")

        if decode_blocks:
            has_pblob = "pblob" in blocks.columns

            def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                n_bad = 0
                n_seen = 0
                for pdf in batches:
                    pbs = (pdf["pblob"] if "pblob" in pdf.columns
                           else [None] * len(pdf))
                    for nrow, lo, hi, mn, blob, pb in zip(
                        pdf["n"], pdf["min_doc"], pdf["max_doc"],
                        pdf["min_norm"], pdf["blob"], pbs,
                    ):
                        n_seen += 1
                        d, f, nb = decode_block(bytes(blob))
                        ok = (
                            len(d) == nrow
                            and (len(d) == 0 or (
                                d[0] == lo and d[-1] == hi
                                and bool(np.all(np.diff(d) > 0))
                                and int(nb.min()) == mn
                                and bool(np.all(f >= 1))
                            ))
                        )
                        # split-format consistency: flag 2 (positions
                        # external) requires a pblob whose decoded
                        # occurrence count equals sum(tf); flags 0/1
                        # must not carry one (CheckIndex's term/postings
                        # cross-check extended to the .pos analog)
                        hp = bytes(blob)[8]
                        if hp == 2:
                            if pb is None:
                                ok = False
                            else:
                                _, _, _, pos = decode_block_positions(
                                    bytes(blob), bytes(pb))
                                ok = ok and len(pos) == int(f.sum())
                        elif pb is not None:
                            ok = False
                        if not ok:
                            n_bad += 1
                yield pd.DataFrame({"n_seen": [n_seen], "n_bad": [n_bad]})

            vcols = ["n", "min_doc", "max_doc", "min_norm", "blob"]
            if has_pblob:
                vcols.append("pblob")
            res = (
                blocks.select(*vcols)
                .mapInPandas(verify, "n_seen long, n_bad long")
                .agg(F.sum("n_seen").alias("s"), F.sum("n_bad").alias("b"))
                .collect()[0]
            )
            if int(res["b"] or 0):
                errors.append(f"{s.name}: {res['b']} blocks fail decode verification")
    report["blocks"] = n_blocks

    # tombstones point at live docs
    if delete_generations(index_dir) and manifest.segments:
        dele = deleted_docs_df(spark, index_dir)
        all_meta = spark.read.parquet(
            *[doc_meta_path(d) for d in seg_dirs.values()]).select("doc_id")
        orphans = dele.join(all_meta, "doc_id", "left_anti").count()
        if orphans:
            errors.append(f"{orphans} tombstones reference unknown doc_ids")

    report["errors"] = errors
    report["clean"] = not errors
    if errors and raise_on_error:
        raise CheckIndexFailure("; ".join(errors))
    return report
