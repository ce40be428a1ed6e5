"""Source/sink adapters (SURVEY.md §2 A, §3.2).

The reference's ingestion layer is dask-ms (casacore MS -> xarray,
[R] daskms.xds_from_ms); the Spark-native equivalent is DataSource
V2: partition discovery plays TAQL group discovery, row-group pruning
plays group skipping.  Parquet is the primary format; CSV/JSON
adapters cover interchange, and the streaming source lives in
shadems_spark.streaming.windows.
"""

from shadems_spark.sources.io import (  # noqa: F401
    read_csv,
    read_json,
    read_parquet,
    write_partitioned,
)
