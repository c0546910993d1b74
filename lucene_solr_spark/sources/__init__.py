"""Table-format adapters (the Iceberg seam).

The north rule targets Iceberg tables; this container has no Iceberg
runtime jars (and no network), so the engine runs on the
`ParquetManifestFormat`: plain parquet dirs + our generation-numbered
manifest (manifest.py), which reproduces the Iceberg properties the
engine relies on — atomic snapshot commits, immutable data files,
column stats pruning, schema-on-read. `IcebergFormat` is the drop-in
for a real cluster: same call surface, `writeTo(...).append()` +
catalog snapshots; it raises with a clear message when the runtime is
absent.
"""

from .jdbc import jdbc_stream  # noqa: F401
from .tables import IcebergFormat, ParquetManifestFormat, table_format  # noqa: F401
