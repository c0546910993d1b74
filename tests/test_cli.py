"""CLI end-to-end: index -> stats -> search -> count -> delete -> merge
through `python -m lucene_solr_spark` subprocesses (one per command, a
fresh SparkSession each — exactly how a user drives it)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

ENV = dict(os.environ, SPARK_GRAFT_CPUS="4", SPARK_DRIVER_MEM="4g")


def run_cli(*argv):
    r = subprocess.run(
        [sys.executable, "-m", "lucene_solr_spark", *argv],
        capture_output=True, text=True, cwd="/root/repo", env=ENV, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_cli_workflow(tmp_path, tiny_corpus_pdf):
    corpus = str(tmp_path / "corpus.parquet")
    tiny_corpus_pdf.to_parquet(corpus, index=False)
    idx = str(tmp_path / "idx")

    out = run_cli("index", "--corpus", corpus, "--index", idx, "--batch", "b0")
    assert out["docs"] == len(tiny_corpus_pdf)

    st = run_cli("stats", "--index", idx)
    assert st["docs"] == len(tiny_corpus_pdf) and st["segments"]

    hits = run_cli("search", "--index", idx, "--query", "import AND def", "-k", "5")
    assert 0 < len(hits["hits"]) <= 5
    assert hits["hits"][0]["rank"] == 1

    wand = run_cli("search", "--index", idx, "--query", "import", "--wand")
    plain = run_cli("search", "--index", idx, "--query", "import")
    assert [h["doc_id"] for h in wand["hits"]] == [h["doc_id"] for h in plain["hits"]]

    n = run_cli("count", "--index", idx, "--query", "ident007")["count"]
    assert n > 0
    deleted = run_cli("delete", "--index", idx, "--terms", "ident007")["deleted"]
    assert deleted == n
    assert run_cli("count", "--index", idx, "--query", "ident007")["count"] == 0

    merged = run_cli("merge", "--index", idx, "--force", "1")
    assert merged["segments"] == 1
    assert merged["docs"] == len(tiny_corpus_pdf) - deleted
