"""Empty/degenerate-input guards (ADVICE r6): the in-plan fold
operators must return empty/NULL results — not runtime errors — when
their inputs are empty, because F.sequence(1, n) auto-DESCENDS for
n <= 0 and element_at(arr, 0) always raises in Spark.
"""

from pyspark.sql import functions as F


def test_global_ops_empty_input(spark):
    """global_index / global_cumsum / global_ntile / global_cummax on
    an EMPTY frame return empty frames (e.g. q_time_to_convert with
    zero converters), instead of erroring inside _offsets_row."""
    from shadems_spark.operators.profile import (
        global_cummax,
        global_cumsum,
        global_index,
        global_ntile,
    )

    empty = spark.createDataFrame([], "k long, v long")
    assert global_index(empty, ["k"]).count() == 0
    assert global_cumsum(empty, ["k"], {"cs": "v"}).count() == 0
    assert global_ntile(empty, 4, ["k"], "t").count() == 0
    assert global_cummax(empty, ["k"], "v", "m").count() == 0


def test_dtw_fold_empty_series_null(spark):
    """dtw_fold returns NULL (not an array-index error) when either
    side is empty; non-empty pairs still fold exactly."""
    from shadems_spark.operators.series import dtw_fold

    df = spark.createDataFrame(
        [([1, 2], []), ([], [1]), ([], []), ([1, 2], [2, 2])],
        "va array<long>, vb array<long>",
    )
    got = [r["d"] for r in df.select(dtw_fold("va", "vb").alias("d")).collect()]
    assert got == [None, None, None, 1]


def test_motif_short_series_dropped(spark, sf_dir):
    """q_motif drops event types with < 7 distinct days (the oracle's
    range(1, n-5) is empty there) instead of crashing on F.slice with
    a descending index sequence."""
    from shadems_spark.queries import load_registry

    fn = load_registry()["q_motif"][0]
    df = fn(spark, sf_dir)
    # plan must execute even if some type has a short calendar; every
    # surviving (i, j) pair is a valid non-overlapping window pair.
    for r in df.collect():
        assert r["j"] >= r["i"] + 7


def test_cuts_row_skew_resistant(spark):
    """_cuts_row samples DISTINCT values: a 99%-one-value key still
    yields spread-out cuts (the old row-sampler collapsed to ~1
    distinct sample value, re-concentrating the two-phase scan)."""
    from shadems_spark.operators.profile import _cuts_row

    rows = [(0,)] * 5000 + [(i,) for i in range(1, 65)]
    df = spark.createDataFrame(rows, "k long")
    cuts = _cuts_row(df, F.col("k"), 8, False).collect()[0]["__cuts"]
    # 7 cuts requested over 65 distinct values; skew must not shrink
    # the usable cut set below a healthy fraction of that.
    assert len(cuts) >= 5
    assert len(set(cuts)) == len(cuts)


def test_prefix_max_prune_lossless_and_empty(spark):
    """prefix_max_prune (the q_skyline candidate diet): the pruned
    set must contain EVERY Pareto-staircase point of the full data
    (losslessness-by-induction claim), only ever shrink the input,
    and return empty on empty input.  Staircase replayed in Python:
    per-distinct-key max measure, survivor iff measure > max over
    all strictly-smaller keys."""
    from shadems_spark.operators.profile import prefix_max_prune

    # deterministic pseudo-random (key, measure) pairs with heavy
    # key duplication and measure ties — the hazard cases.
    rows = [
        ((i * 2654435761) % 97, (i * 40503) % 251)
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "k long, v long")

    def staircase(pairs):
        best = {}
        for k, v in pairs:
            best[k] = max(best.get(k, -1), v)
        sky, run = set(), -1
        for k in sorted(best):
            if best[k] > run:
                sky.add((k, best[k]))
            run = max(run, best[k])
        return sky

    full_sky = staircase(rows)
    pruned = [(r["k"], r["v"]) for r in prefix_max_prune(df, "k", "v").collect()]
    assert len(pruned) <= len(rows)
    assert staircase(pruned) == full_sky
    assert full_sky <= set(pruned)  # every skyline point survives the prune

    empty = spark.createDataFrame([], "k long, v long")
    assert prefix_max_prune(empty, "k", "v").count() == 0
