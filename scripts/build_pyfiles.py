#!/usr/bin/env python
"""Package lucene_solr_spark for `spark-submit --py-files` (north rule:
run via spark-submit at N and 4N executors).

Usage:
  python scripts/build_pyfiles.py           # writes dist/lucene_solr_spark.zip
  spark-submit --py-files dist/lucene_solr_spark.zip scripts/submit_build.py \
      --corpus /path/corpus.parquet --index /path/index
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "lucene_solr_spark.zip")
    pkg = os.path.join(ROOT, "lucene_solr_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
