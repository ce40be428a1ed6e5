"""Analytics query families — the round-9 split of the former
10.7k-line queries/analytics.py (VERDICT r8 #6) into family modules
with UNCHANGED registry names and plans:

- :mod:`._shared`   cross-family helpers (scratch root, facet engine
                    plumbing, Poisson/AMS/SPRT protocol constants)
- :mod:`.sqlcore`   TPC-H-style star-schema checks, format
                    roundtrips, SQL-surface sugar, IVM, data quality
- :mod:`.behavioral` sessions, funnels, journeys, attribution,
                    market baskets
- :mod:`.graph`     pagerank, k-hop over the star graph
- :mod:`.sketches`  t-digest, KLL, theta, count-min, AMS, sampling
- :mod:`.timeseries` decomposition, forecasting, control charts,
                    change detection
- :mod:`.stats`     hypothesis tests, correlation, inequality, FDR
- :mod:`.causal`    experiments, uplift, matching, conformal, ridge

Importing this package registers every query (the submodule imports
below run each ``@register`` decorator); ``load_registry`` imports
``shadems_spark.queries.analytics`` exactly as before the split.
"""

from shadems_spark.queries.analytics import (  # noqa: F401
    _shared,
    behavioral,
    causal,
    graph,
    sketches,
    sqlcore,
    stats,
    timeseries,
)

# names other modules/tests import from the old flat module — keep the
# public surface of `shadems_spark.queries.analytics` stable.
from shadems_spark.queries.analytics._shared import (  # noqa: F401
    _CM_SCALE,
    _CM_VARS,
    _HURST_WS,
    _POIS_T,
    _SCRATCH,
    _SPRT_DN,
    _SPRT_LA,
    _SPRT_LB,
    _SPRT_UP,
    _ams_coeffs,
)
