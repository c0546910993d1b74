"""CheckIndex analog: clean index verifies; corruptions are caught."""

from __future__ import annotations

import json
import os

import pytest

from lucene_solr_spark.indexing.check import CheckIndexFailure, check_index

pytestmark = pytest.mark.spark


def test_clean_index_checks_out(spark, tiny_index):
    rep = check_index(spark, tiny_index)
    assert rep["clean"] and rep["errors"] == []
    assert rep["docs"] == 200 and rep["blocks"] > 0


def test_check_catches_manifest_corruption(spark, tiny_corpus_pdf, tmp_path):
    from lucene_solr_spark.indexing.builder import build_index
    from lucene_solr_spark.indexing.manifest import ManifestStore

    idx = str(tmp_path / "bad")
    build_index(spark, idx, [("b0", spark.createDataFrame(tiny_corpus_pdf))])
    store = ManifestStore(idx)
    gen = store.current_generation()
    path = os.path.join(store.mdir, f"segments_{gen}.json")
    raw = json.load(open(path))
    raw["segments"][0]["doc_count"] += 7  # counters now lie
    json.dump(raw, open(path, "w"))

    with pytest.raises(CheckIndexFailure, match="doc_count"):
        check_index(spark, idx)
    rep = check_index(spark, idx, raise_on_error=False)
    assert not rep["clean"] and any("doc_count" in e for e in rep["errors"])


def test_check_after_delete_and_merge(spark, tiny_corpus_pdf, tmp_path):
    from lucene_solr_spark.indexing import deletes
    from lucene_solr_spark.indexing.builder import build_index
    from lucene_solr_spark.indexing.merge import force_merge

    idx = str(tmp_path / "dm")
    n = len(tiny_corpus_pdf)
    build_index(spark, idx, [("b0", spark.createDataFrame(tiny_corpus_pdf.iloc[:n // 2])),
                             ("b1", spark.createDataFrame(tiny_corpus_pdf.iloc[n // 2:]))])
    deletes.delete_by_terms(spark, idx, ["ident007"])
    assert check_index(spark, idx)["clean"]
    force_merge(spark, idx, max_segments=1)
    rep = check_index(spark, idx)
    assert rep["clean"] and rep["segments"] == 1
