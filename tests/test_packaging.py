"""spark-submit --py-files packaging: the zip must be importable via
zipimport (what executors do) and carry every subpackage."""

from __future__ import annotations

import subprocess
import sys


def test_pyfiles_zip_importable(tmp_path):
    import scripts.build_pyfiles as bp

    out = bp.main()
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import lucene_solr_spark, lucene_solr_spark.codec, "
        "lucene_solr_spark.indexing.builder, lucene_solr_spark.search.executor, "
        "lucene_solr_spark.datapipe.dedup, lucene_solr_spark.streaming, "
        "lucene_solr_spark.sources, lucene_solr_spark.fulltext, "
        "lucene_solr_spark.fields, lucene_solr_spark.geo, "
        "lucene_solr_spark.sql, lucene_solr_spark.search.cache, "
        "lucene_solr_spark.indexing.check, lucene_solr_spark.facets; "
        "print('zip-ok')" % out
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd="/", timeout=120)
    assert "zip-ok" in r.stdout, r.stderr
