"""shadems_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of IanHeywood/shadeMS.

shadeMS renders rasterized scatter plots of radio-interferometry
visibility data: scan -> project (derived quantities) -> filter ->
explode (row x chan x corr) -> 2-D binned group-by aggregation ->
normalization -> sink.  This package re-expresses that pipeline —
plus the dedup / similarity / text-analysis operators a large-scale
training-data pipeline needs — as idiomatic Spark DataFrame plans so
Catalyst/Tungsten pick the physical strategy.

Reference anchors cited in docstrings use the convention of
/root/repo/SURVEY.md §0 ([R] = reconstructed public-knowledge anchor;
the reference checkout at /root/reference was empty this round).
"""

__version__ = "0.1.0"

from shadems_spark.session import get_spark, tune  # noqa: F401
from shadems_spark.catalog import load_table, load_all, TABLES  # noqa: F401
