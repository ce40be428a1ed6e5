

def test_winsorized_robustness_ordering(spark, sf_dir):
    """Robust-stats laws: p05 <= mean_winsor <= p95 (clamped mean
    stays inside the clamp), n_trimmed == ranks in (ceil(.05n),
    ceil(.95n)], and the trimmed mean lies within [p05, p95] too."""
    import math

    from shadems_spark.queries import load_registry

    rows = load_registry()["q_winsorized"][0](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["p05"] <= r["p95"]
        assert r["p05"] - 1e-9 <= r["mean_winsor"] <= r["p95"] + 1e-9
        assert r["p05"] - 1e-9 <= r["mean_trimmed"] <= r["p95"] + 1e-9
        expect_kept = math.ceil(0.95 * r["n"]) - math.ceil(0.05 * r["n"])
        assert r["n_trimmed"] == expect_kept
