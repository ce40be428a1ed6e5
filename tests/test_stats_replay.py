"""Literature-form replays of the statistics battery.

Both real round-7 defects (q_mcnemar's unclamped continuity
correction, q_motif's short-series crash) were INVISIBLE to the
hash-exact DuckDB oracles because both engines shared the same wrong
formula — a hash-exact oracle proves engine agreement, not formula
correctness (VERDICT r7 "What's wrong" preamble; #4 asks for this
module).  Each test here recomputes the statistic FROM SCRATCH with
an independent textbook/numpy implementation (plain float math,
average-rank helpers, scipy-free) on the same fixture and compares at
the emitted rounding precision.  The replays deliberately do NOT copy
the queries' integer-ladder algebra — a transcription would inherit a
formula bug; plain float math on the same (quantized) inputs agrees
to ~1e-9 when the formula is right and diverges loudly when not.

Degenerate fixtures (synthetic parquet dirs) pin the guard behavior
the oracles cannot see either: b == c discordance (McNemar clamp),
n = 1 groups (Welch/TOST NULLs), all-tied values (Kruskal tie_c = 0),
zero-urgent segments (Simpson NULL rates).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR

# ------------------------------------------------------------------ helpers


def _run(spark, name, sf_dir=SF_DIR) -> pd.DataFrame:
    import __spark_entry__ as entry

    return entry.queries()[name](spark, sf_dir).toPandas()


@pytest.fixture(scope="module")
def events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def _milli(v: np.ndarray) -> np.ndarray:
    """The queries' input quantization (HALF_UP milli-rounding) — data
    definition, not formula; fixture values are 2dp so any rounding
    mode agrees, but mirror HALF_UP for safety."""
    return np.floor(np.asarray(v, dtype=float) * 1000.0 + 0.5) / 1000.0


def _avg_ranks(x: np.ndarray) -> np.ndarray:
    """Average (midrank) ranks, 1-based — independent of the queries'
    half-rank integer encoding."""
    x = np.asarray(x)
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=float)
    i = 0
    while i < len(x):
        j = i
        while j + 1 < len(x) and x[order[j + 1]] == x[order[i]]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def _norm_sf(z: float) -> float:
    """Exact upper-tail P(Z >= z) — math.erfc, NOT the queries' A-S
    polynomial (abs err ~1.5e-7, inside the test tolerances)."""
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def _two_sided_p(z: float) -> float:
    return math.erfc(abs(z) / math.sqrt(2.0))


def _welch_groups(events: pd.DataFrame):
    v = _milli(events["value"].fillna(0.0).to_numpy())
    is1 = (events["event_type"] == "purchase").to_numpy()
    return v[is1], v[~is1]


def _write_events(tmp_path, rows: list[dict]) -> str:
    """A synthetic sf_dir holding just an events table with the full
    fixture schema."""
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    df["value"] = df["value"].astype(float)
    df["props"] = "{}"
    df = df[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    df.to_parquet(f"{tmp_path}/events.parquet", index=False)
    return str(tmp_path)


# ------------------------------------------------------- two-sample family


def test_welch_replay(spark, events):
    x1, x2 = _welch_groups(events)
    m1, m2 = x1.mean(), x2.mean()
    v1, v2 = x1.var(ddof=1), x2.var(ddof=1)
    se2 = v1 / len(x1) + v2 / len(x2)
    t = (m1 - m2) / math.sqrt(se2)
    df_ws = se2**2 / (
        (v1 / len(x1)) ** 2 / (len(x1) - 1)
        + (v2 / len(x2)) ** 2 / (len(x2) - 1)
    )
    row = _run(spark, "q_welch").iloc[0]
    assert row["n1"] == len(x1) and row["n2"] == len(x2)
    assert row["mean_diff"] == pytest.approx(m1 - m2, abs=2e-6)
    assert row["t"] == pytest.approx(t, abs=2e-6)
    assert row["df"] == pytest.approx(df_ws, abs=2e-4)
    assert row["p"] == pytest.approx(_two_sided_p(t), abs=1e-5)


def test_tost_replay(spark, events):
    x1, x2 = _welch_groups(events)
    se = math.sqrt(x1.var(ddof=1) / len(x1) + x2.var(ddof=1) / len(x2))
    diff = x1.mean() - x2.mean()
    tl, tu = (diff + 0.05) / se, (diff - 0.05) / se
    # one-sided p's (Schuirmann): reject lower H0 for LARGE tl (upper
    # tail), upper H0 for SMALL tu (lower tail)
    p_lower = _norm_sf(tl)
    p_upper = 1.0 - _norm_sf(tu)
    row = _run(spark, "q_tost").iloc[0]
    assert row["t_lower"] == pytest.approx(tl, abs=2e-6)
    assert row["t_upper"] == pytest.approx(tu, abs=2e-6)
    assert row["p_lower"] == pytest.approx(p_lower, abs=1e-5)
    assert row["p_upper"] == pytest.approx(p_upper, abs=1e-5)
    zc = 1.6448536269514722
    assert row["equivalent"] == int(tl > zc and tu < -zc)
    # internal consistency (the ADVICE r7 defect class): equivalent=1
    # must correspond to BOTH one-sided p's < 0.05
    if row["equivalent"] == 1:
        assert row["p_lower"] < 0.05 and row["p_upper"] < 0.05


def test_mcnemar_replay(spark, events):
    day = events["ts"].dt.date.astype(str)
    hi = (
        (events["event_type"] == "purchase")
        & (events["value"] > 95)
    )
    pre = day < "2024-01-16"
    u = pd.DataFrame(
        {"u": events["user_id"], "p1": hi & pre, "p2": hi & ~pre}
    ).groupby("u").max()
    b = int((u["p1"] & ~u["p2"]).sum())
    c = int((~u["p1"] & u["p2"]).sum())
    chi2 = max(abs(b - c) - 1, 0) ** 2 / (b + c) if b + c else 0.0
    row = _run(spark, "q_mcnemar").iloc[0]
    assert (row["b"], row["c"]) == (b, c)
    assert row["chi2"] == pytest.approx(chi2, abs=2e-6)
    assert row["p"] == pytest.approx(
        _two_sided_p(math.sqrt(chi2)) if b + c else 1.0, abs=1e-5
    )


# ------------------------------------------------------------ k-group family


def test_anova_replay(spark, events):
    ev = events[events["value"].notna()]
    groups = [
        _milli(g["value"].to_numpy())
        for _, g in ev.groupby("event_type")
    ]
    allv = np.concatenate(groups)
    grand = allv.mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k, n = len(groups), len(allv)
    f_stat = (ssb / (k - 1)) / (ssw / (n - k))
    eta2 = ssb / (ssb + ssw)
    row = _run(spark, "q_anova").iloc[0]
    assert (row["k_groups"], row["n"]) == (k, n)
    assert row["ss_between"] == pytest.approx(ssb, rel=1e-6, abs=1e-4)
    assert row["ss_within"] == pytest.approx(ssw, rel=1e-6, abs=1e-4)
    assert row["f_stat"] == pytest.approx(f_stat, abs=2e-5)
    assert row["eta_squared"] == pytest.approx(eta2, abs=2e-6)


def test_levene_replay(spark, events):
    ev = events.assign(v=_milli(events["value"].fillna(0.0).to_numpy()))
    groups = [g["v"].to_numpy() for _, g in ev.groupby("event_type")]
    z = [np.abs(g - g.mean()) for g in groups]  # mean-centered form
    zbar = np.concatenate(z).mean()
    k = len(groups)
    n = sum(len(g) for g in groups)
    num = sum(len(zj) * (zj.mean() - zbar) ** 2 for zj in z)
    den = sum(((zj - zj.mean()) ** 2).sum() for zj in z)
    w = ((n - k) / (k - 1)) * (num / den)
    row = _run(spark, "q_levene").iloc[0]
    assert (row["k"], row["n"]) == (k, n)
    assert row["w"] == pytest.approx(w, abs=2e-4)


def test_tukey_replay(spark, events):
    ev = events[events["value"].notna()]
    by_type = {
        t: _milli(g["value"].to_numpy()) for t, g in ev.groupby("event_type")
    }
    k = len(by_type)
    n = sum(len(g) for g in by_type.values())
    msw = sum(((g - g.mean()) ** 2).sum() for g in by_type.values()) / (n - k)
    out = _run(spark, "q_tukey")
    assert len(out) == k * (k - 1) // 2
    for _, row in out.iterrows():
        a, b = by_type[row["type_a"]], by_type[row["type_b"]]
        diff = a.mean() - b.mean()
        se = math.sqrt(msw / 2.0 * (1.0 / len(a) + 1.0 / len(b)))
        assert row["mean_diff"] == pytest.approx(diff, abs=2e-6)
        assert row["q_stat"] == pytest.approx(abs(diff) / se, abs=2e-5)
        assert row["significant"] == int(abs(diff) / se > 3.858)


def test_kruskal_replay(spark, events):
    ev = events[events["value"].notna()]
    v = _milli(ev["value"].to_numpy())
    types = ev["event_type"].to_numpy()
    ranks = _avg_ranks(v)
    n = len(v)
    h = (
        12.0 / (n * (n + 1))
        * sum(
            ranks[types == t].sum() ** 2 / (types == t).sum()
            for t in np.unique(types)
        )
        - 3 * (n + 1)
    )
    _, counts = np.unique(v, return_counts=True)
    tie_c = 1.0 - (counts.astype(float) ** 3 - counts).sum() / (n**3 - n)
    row = _run(spark, "q_kruskal").iloc[0]
    assert (row["k"], row["n"]) == (len(np.unique(types)), n)
    assert row["h"] == pytest.approx(h, abs=2e-5)
    assert row["tie_c"] == pytest.approx(tie_c, abs=2e-9)
    assert row["h_corrected"] == pytest.approx(h / tie_c, abs=2e-5)


def test_friedman_replay(spark, events):
    d = events.assign(day=events["ts"].dt.date).groupby(
        ["event_type", "day"], as_index=False
    ).size()
    # zero-filled day x type grid
    grid = (
        d.pivot(index="day", columns="event_type", values="size")
        .reindex(
            pd.date_range(d["day"].min(), d["day"].max(), freq="D").date
        )
        .fillna(0.0)
    )
    k, n = grid.shape[1], grid.shape[0]
    ranks = np.vstack([_avg_ranks(row) for row in grid.to_numpy()])
    rj = ranks.sum(axis=0)
    t3t = 0.0
    for row in grid.to_numpy():
        _, counts = np.unique(row, return_counts=True)
        t3t += (counts.astype(float) ** 3 - counts).sum()
    chi2 = (
        12.0 / (n * k * (k + 1)) * (rj**2).sum() - 3.0 * n * (k + 1)
    ) / (1.0 - t3t / (n * k * (k**2 - 1)))
    out = _run(spark, "q_friedman").sort_values("event_type")
    assert list(out["event_type"]) == list(grid.columns)
    assert (out["k_types"] == k).all() and (out["n_days"] == n).all()
    np.testing.assert_allclose(
        out["mean_rank"].to_numpy(), rj / n, atol=2e-4
    )
    assert out["chi2_f"].iloc[0] == pytest.approx(chi2, abs=2e-5)


# ------------------------------------------------------- trend / rank tests


def test_wilcoxon_replay(spark, events):
    d = events.assign(day=events["ts"].dt.date).groupby("day").agg(
        x=("event_type", lambda s: (s == "view").sum()),
        y=("event_type", lambda s: (s == "click").sum()),
    )
    diff = (d["x"] - d["y"]).to_numpy(dtype=float)
    diff = diff[diff != 0]
    ad = np.abs(diff)
    ranks = _avg_ranks(ad)
    n = len(diff)
    w_plus = ranks[diff > 0].sum()
    _, counts = np.unique(ad, return_counts=True)
    t3t = (counts.astype(float) ** 3 - counts).sum()
    var = n * (n + 1) * (2 * n + 1) / 24.0 - t3t / 48.0
    z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(var)
    row = _run(spark, "q_wilcoxon").iloc[0]
    assert row["n_pairs"] == n
    assert row["w_plus"] == pytest.approx(w_plus, abs=0.05)
    assert row["z"] == pytest.approx(z, abs=2e-6)


def test_mann_kendall_replay(spark, events):
    d = events.assign(day=events["ts"].dt.date).groupby(
        ["event_type", "day"], as_index=False
    ).size()
    out = _run(spark, "q_mann_kendall").set_index("event_type")
    for t, g in d.groupby("event_type"):
        y = g.sort_values("day")["size"].to_numpy(dtype=float)
        n = len(y)
        s = int(np.sign(y[None, :] - y[:, None])[np.triu_indices(n, 1)].sum())
        _, counts = np.unique(y, return_counts=True)
        tsum = (
            counts.astype(float) * (counts - 1) * (2 * counts + 5)
        ).sum()
        var = (n * (n - 1) * (2 * n + 5) - tsum) / 18.0
        z = (s - np.sign(s)) / math.sqrt(var)
        row = out.loc[t]
        assert row["n_days"] == n and row["s_statistic"] == s
        assert row["z"] == pytest.approx(z, abs=2e-6)


def test_bh_fdr_replay(spark, events):
    v = _milli(events["value"].fillna(0.0).to_numpy())
    types = events["event_type"].to_numpy()
    uniq = np.unique(types)
    m = len(uniq)
    ps = {}
    for t in uniq:
        a, b = v[types == t], v[types != t]
        z = (a.mean() - b.mean()) / math.sqrt(
            a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        )
        ps[t] = _two_sided_p(z)
    # BH step-up at q = 0.1
    ordered = sorted(uniq, key=lambda t: (ps[t], t))
    k_star = max(
        (i + 1 for i, t in enumerate(ordered) if ps[t] <= (i + 1) * 0.1 / m),
        default=0,
    )
    out = _run(spark, "q_bh_fdr").set_index("event_type")
    for i, t in enumerate(ordered):
        row = out.loc[t]
        assert row["rk"] == i + 1
        assert row["p"] == pytest.approx(ps[t], abs=1e-5)
        assert row["discovery"] == int(i + 1 <= k_star)


def test_benjamini_yekutieli_replay(spark, events):
    """BY 2001 step-up under arbitrary dependence: the BH line shrunk
    by the harmonic factor c(m); discoveries are a subset of BH's."""
    v = _milli(events["value"].fillna(0.0).to_numpy())
    types = events["event_type"].to_numpy()
    uniq = np.unique(types)
    m = len(uniq)
    ps = {}
    for t in uniq:
        a, b = v[types == t], v[types != t]
        z = (a.mean() - b.mean()) / math.sqrt(
            a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        )
        ps[t] = _two_sided_p(z)
    c_m = sum(1.0 / i for i in range(1, m + 1))
    ordered = sorted(uniq, key=lambda t: (ps[t], t))
    k_star = max(
        (i + 1 for i, t in enumerate(ordered)
         if ps[t] <= (i + 1) * 0.1 / (m * c_m)),
        default=0,
    )
    out = _run(spark, "q_benjamini_yekutieli").set_index("event_type")
    bh = _run(spark, "q_bh_fdr").set_index("event_type")
    for i, t in enumerate(ordered):
        row = out.loc[t]
        assert row["rk"] == i + 1
        assert row["p"] == pytest.approx(ps[t], abs=1e-5)
        assert row["by_thresh"] == pytest.approx(
            (i + 1) * 0.1 / (m * c_m), abs=1e-6
        )
        assert row["discovery"] == int(i + 1 <= k_star)
        # BY is strictly more conservative than BH
        assert row["discovery"] <= bh.loc[t]["discovery"]


def test_mad_replay(spark, events):
    d = events.assign(day=events["ts"].dt.date).groupby(
        ["event_type", "day"], as_index=False
    ).size()
    out = _run(spark, "q_mad").set_index("event_type")
    for t, g in d.groupby("event_type"):
        ys = np.sort(g["size"].to_numpy())
        lower_med = ys[(len(ys) + 1) // 2 - 1]  # documented LOWER median
        mad = np.sort(np.abs(ys - lower_med))[(len(ys) + 1) // 2 - 1]
        row = out.loc[t]
        assert row["med"] == lower_med and row["mad"] == mad


# ------------------------------------------------ degenerate-input fixtures


def test_mcnemar_equal_discordance_is_zero(spark, tmp_path):
    """b == c > 0: perfectly symmetric discordance carries ZERO
    evidence of change — the unclamped (|b-c|-1)^2 form would emit a
    spurious chi2 = 1/(b+c) here (the actual r7 defect, invisible to
    the oracle because both engines shared it)."""
    rows = []
    # user 1: high-value purchase ONLY pre; user 2: ONLY post (b=c=1)
    rows.append(dict(ts="2024-01-05", user_id=1, event_type="purchase", value=99.0))
    rows.append(dict(ts="2024-01-20", user_id=1, event_type="view", value=1.0))
    rows.append(dict(ts="2024-01-05", user_id=2, event_type="view", value=1.0))
    rows.append(dict(ts="2024-01-20", user_id=2, event_type="purchase", value=99.0))
    sf = _write_events(tmp_path, rows)
    row = _run(spark, "q_mcnemar", sf).iloc[0]
    assert (row["b"], row["c"]) == (1, 1)
    assert row["chi2"] == 0.0
    assert row["p"] == pytest.approx(1.0, abs=1e-6)


def test_welch_tost_single_row_group_nulls(spark, tmp_path):
    """n2 = 1 (single non-purchase row): no sample variance exists —
    every variance-derived output must be NULL on both engines, never
    a div-by-zero NaN/inf (ADVICE r7)."""
    rows = [
        dict(ts="2024-01-05", user_id=1, event_type="purchase", value=10.0),
        dict(ts="2024-01-06", user_id=2, event_type="purchase", value=12.0),
        dict(ts="2024-01-07", user_id=3, event_type="view", value=5.0),
    ]
    sf = _write_events(tmp_path, rows)
    w = _run(spark, "q_welch", sf).iloc[0]
    assert (w["n1"], w["n2"]) == (2, 1)
    assert w["mean_diff"] == pytest.approx(6.0)  # means still defined
    for colname in ("t", "df", "p"):
        assert pd.isna(w[colname]), colname
    t = _run(spark, "q_tost", sf).iloc[0]
    for colname in ("se", "t_lower", "t_upper", "p_lower", "p_upper",
                    "equivalent"):
        assert pd.isna(t[colname]), colname


def test_fdr_single_row_type_excluded(spark, tmp_path):
    """A 1-row event type carries no variance estimate: it is EXCLUDED
    from the FDR hypothesis family (m shrinks, no NaN z poisons the
    p-ranking) while its rows still count toward the other types'
    complements — on both q_bh_fdr and q_benjamini_yekutieli."""
    rows = [
        dict(ts="2024-01-05", user_id=1, event_type="purchase", value=10.0),
        dict(ts="2024-01-06", user_id=2, event_type="purchase", value=12.0),
        dict(ts="2024-01-07", user_id=3, event_type="view", value=5.0),
        dict(ts="2024-01-08", user_id=4, event_type="view", value=6.0),
        dict(ts="2024-01-09", user_id=5, event_type="click", value=7.0),
    ]
    sf = _write_events(tmp_path, rows)
    for qname in ("q_bh_fdr", "q_benjamini_yekutieli"):
        out = _run(spark, qname, sf)
        assert sorted(out["event_type"]) == ["purchase", "view"], qname
        assert not out[["z", "p"]].isna().any().any(), qname
        # the complement still sees the excluded click row: purchase
        # (n=2) is contrasted against view+click (n=3), not view alone
        assert out["n"].sum() == 4, qname


def test_kruskal_all_tied_corrected_null(spark, tmp_path):
    """All values identical: tie_c = 0, no rank information — the
    corrected statistic is undefined (NULL), not inf/NaN."""
    rows = [
        dict(ts=f"2024-01-{d:02d}", user_id=u, event_type=t, value=7.0)
        for d, (u, t) in enumerate(
            [(1, "view"), (2, "view"), (3, "click"), (4, "click"),
             (5, "purchase"), (6, "purchase")], start=2
        )
    ]
    sf = _write_events(tmp_path, rows)
    row = _run(spark, "q_kruskal", sf).iloc[0]
    assert row["tie_c"] == 0.0
    assert pd.isna(row["h_corrected"])


def test_simpson_degenerate_segment_null_rates(spark, tmp_path):
    """A segment with zero urgent orders has no urgent rate: NULL on
    both engines, sgn falls to 0, never flags a reversal (ADVICE
    r7)."""
    o = pd.DataFrame(
        {
            "o_orderkey": np.arange(4, dtype=np.int64),
            "o_custkey": np.arange(4, dtype=np.int64),
            "o_orderstatus": ["F", "F", "O", "O"],
            "o_totalprice": [200000.0, 100000.0, 200000.0, 100000.0],
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 4).astype(
                "datetime64[us]"
            ),
            # segment F has NO urgent orders
            "o_orderpriority": ["5-LOW", "5-LOW", "1-URGENT", "5-LOW"],
        }
    )
    o.to_parquet(f"{tmp_path}/orders.parquet", index=False)
    out = _run(spark, "q_simpson", str(tmp_path)).set_index("segment")
    f_row = out.loc["F"]
    assert pd.isna(f_row["rate_urgent"])
    assert f_row["reversed"] == 0


def test_ewma_control_replay(spark, events):
    """EWMA chart recursion replayed in plain float (no nano
    quantization): z_t = λy + (1-λ)z, time-varying half-width
    Lσ·sqrt(λ/(2-λ)·(1-(1-λ)^{2t}))."""
    lam, L = 0.2, 2.7
    d = events.assign(day=events["ts"].dt.date).groupby(
        ["event_type", "day"], as_index=False
    ).size()
    out = _run(spark, "q_ewma_control").set_index("event_type")
    for t, g in d.groupby("event_type"):
        y = g.sort_values("day")["size"].to_numpy(dtype=float)
        mu, sd = y.mean(), y.std(ddof=1)
        z, w, nviol, maxm = mu, 1.0, 0, -np.inf
        for v in y:
            z = lam * v + (1 - lam) * z
            w *= (1 - lam) ** 2
            hw = L * sd * math.sqrt(lam / (2 - lam) * (1 - w))
            nviol += abs(z - mu) > hw
            maxm = max(maxm, abs(z - mu) - hw)
        row = out.loc[t]
        assert row["center"] == pytest.approx(mu, abs=2e-6)
        assert row["ewma_final"] == pytest.approx(z, abs=1e-4)
        assert row["ucl_asym"] == pytest.approx(
            mu + L * sd * math.sqrt(lam / (2 - lam)), abs=2e-6
        )
        assert row["n_violations"] == nviol
        assert row["max_margin"] == pytest.approx(maxm, abs=1e-4)


def test_fisher_exact_replay(spark, events):
    """Hypergeometric enumeration from scratch (math.comb) on the
    weekend x high-volume 2x2 derived independently in pandas."""
    from math import comb

    d = events[events["event_type"] == "purchase"].assign(
        day=events["ts"].dt.date
    ).groupby("day").size()
    # zero-filled over the 30 observed event days
    all_days = pd.Index(sorted(events["ts"].dt.date.unique()))
    cnt = d.reindex(all_days).fillna(0).astype(int)
    wk = np.array([dd.weekday() >= 5 for dd in all_days])
    hi = (cnt.to_numpy() * len(all_days) > cnt.sum()).astype(bool)
    a = int((wk & hi).sum())
    r1, c1, n = int(wk.sum()), int(hi.sum()), len(all_days)
    r2 = n - r1
    nobs = comb(r1, a) * comb(r2, c1 - a)
    ks = range(max(0, c1 - r2), min(r1, c1) + 1)
    p_two = sum(
        comb(r1, k) * comb(r2, c1 - k)
        for k in ks
        if comb(r1, k) * comb(r2, c1 - k) <= nobs
    ) / comb(n, c1)
    p_gr = sum(
        comb(r1, k) * comb(r2, c1 - k) for k in ks if k >= a
    ) / comb(n, c1)
    row = _run(spark, "q_fisher_exact").iloc[0]
    assert (row["a"], row["b"]) == (a, r1 - a)
    assert (row["c"], row["d"]) == (c1 - a, n - r1 - c1 + a)
    assert row["p_two_sided"] == pytest.approx(p_two, abs=1e-8)
    assert row["p_greater"] == pytest.approx(p_gr, abs=1e-8)


def test_bayes_ab_replay(spark, events):
    """The Fraction-exact Cook table validated by Monte-Carlo at the
    observed posterior state, plus an independent cohort re-pick."""
    u = events.groupby("user_id").apply(
        lambda g: int(
            ((g["event_type"] == "purchase") & (g["value"] > 95)).any()
        ),
        include_groups=False,
    ).rename("conv").reset_index()
    u["arm"] = (u["user_id"] % 2).astype(int)
    u["h"] = (u["user_id"] * 2654435761) % 4294967296
    picked = (
        u.sort_values(["arm", "h", "user_id"]).groupby("arm").head(7)
    )
    ka = int(picked[picked["arm"] == 0]["conv"].sum())
    kb = int(picked[picked["arm"] == 1]["conv"].sum())
    row = _run(spark, "q_bayes_ab").iloc[0]
    assert (row["ka"], row["kb"]) == (ka, kb)
    rng = np.random.default_rng(7)
    mc = (
        rng.beta(kb + 1, 7 - kb + 1, 400_000)
        > rng.beta(ka + 1, 7 - ka + 1, 400_000)
    ).mean()
    assert row["p_b_beats_a"] == pytest.approx(mc, abs=0.005)


def test_mood_median_replay(spark, events):
    """Mood's median test recomputed from scratch: lower pooled
    median, strictly-above counts, chi2 = sum (a - np)^2/(np(1-p))."""
    ev = events[events["value"].notna()]
    v = _milli(ev["value"].to_numpy())
    types = ev["event_type"].to_numpy()
    sv = np.sort(v)
    med = sv[(len(sv) + 1) // 2 - 1]  # lower median
    uniq = np.unique(types)
    n_j = {t: int((types == t).sum()) for t in uniq}
    a_j = {t: int(((types == t) & (v > med)).sum()) for t in uniq}
    n, a_tot = len(v), sum(a_j.values())
    p = a_tot / n
    chi2 = sum(
        (a_j[t] - n_j[t] * p) ** 2 / (n_j[t] * p * (1 - p)) for t in uniq
    )
    out = _run(spark, "q_mood_median").set_index("event_type")
    for t in uniq:
        row = out.loc[t]
        assert (row["n"], row["n_above"]) == (n_j[t], a_j[t])
        assert row["e_above"] == pytest.approx(n_j[t] * p, abs=2e-6)
        assert row["grand_median"] == pytest.approx(med, abs=1e-6)
        assert row["chi2"] == pytest.approx(chi2, abs=2e-5)
        assert row["dof"] == len(uniq) - 1


def test_cochran_q_replay(spark, events):
    """Cochran's Q recomputed from the zero-filled day x type binary
    grid (any high-value event that day)."""
    d = events.assign(day=events["ts"].dt.date)
    days = sorted(d["day"].unique())
    types = sorted(d["event_type"].unique())
    hit = {
        (t, dd)
        for t, dd in d[
            (d["event_type"].notna()) & (d["value"] > 95)
        ][["event_type", "day"]].itertuples(index=False)
    }
    X = np.array(
        [[1 if (t, dd) in hit else 0 for t in types] for dd in days]
    )
    cj = X.sum(axis=0)
    ri = X.sum(axis=1)
    k, T = len(types), int(cj.sum())
    denom = k * T - int((ri**2).sum())
    q_stat = (k - 1) * (k * int((cj**2).sum()) - T**2) / denom
    out = _run(spark, "q_cochran_q").set_index("event_type")
    for j, t in enumerate(types):
        row = out.loc[t]
        assert row["n_active_days"] == cj[j]
        assert row["n_days"] == len(days)
        assert row["dof"] == k - 1
        assert row["q"] == pytest.approx(q_stat, abs=2e-6)


def test_theil_entropy_replay(spark):
    """Theil T and its within/between decomposition recomputed in
    plain float from the raw orders/customer tables; also pins the
    exact decomposition identity T_total = T(all customers)."""
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    o = o.assign(rc=np.floor(o["o_totalprice"] * 100 + 0.5))
    r = (
        o.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .groupby(["c_nationkey", "o_custkey"], as_index=False)["rc"].sum()
    )
    out = _run(spark, "q_theil_entropy").set_index("nation")
    s_all = r["rc"].sum()
    n_all = len(r)
    mu_all = s_all / n_all
    t_within = t_between = 0.0
    for nat, g in r.groupby("c_nationkey"):
        x = g["rc"].to_numpy(dtype=float)
        mu = x.mean()
        tg = float(np.mean((x / mu) * np.log(x / mu)))
        share = x.sum() / s_all
        t_within += share * tg
        t_between += share * math.log(mu / mu_all)
        row = out.loc[nat]
        assert row["n_cust"] == len(x)
        assert row["share"] == pytest.approx(share, abs=2e-6)
        assert row["theil_g"] == pytest.approx(tg, abs=1e-5)
        assert row["between_term"] == pytest.approx(
            share * math.log(mu / mu_all), abs=1e-5
        )
    first = out.iloc[0]
    assert first["t_within"] == pytest.approx(t_within, abs=1e-4)
    assert first["t_between"] == pytest.approx(t_between, abs=1e-4)
    # the decomposition identity: within + between == total Theil
    xa = r["rc"].to_numpy(dtype=float)
    t_direct = float(np.mean((xa / mu_all) * np.log(xa / mu_all)))
    assert first["t_total"] == pytest.approx(t_direct, abs=1e-4)
