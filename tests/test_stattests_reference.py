"""Third-implementation differential tests for the statistical-test
family: the Spark results must match an independent NumPy computation on
the same raw parquet (not just the DuckDB oracle, which could share a
formula-transcription mistake). Tolerances are 1e-9 relative — the
operators are exact-by-construction, NumPy is the one doing floating
accumulation."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import TEST_SF_DIR

from aind_data_transformation_spark.queries.stattests import (
    q_ml_ols_multifeat,
    q_stats_chi2,
    q_stats_ks_twosample,
    q_stats_mannwhitney,
    q_survival_kaplan_meier,
)
from aind_data_transformation_spark.queries.ml_eval import (
    q_ml_auc_roc,
    q_ml_psi_drift,
)


def _orders() -> pd.DataFrame:
    return pd.read_parquet(f"{TEST_SF_DIR}/orders.parquet")


def _lineitem() -> pd.DataFrame:
    return pd.read_parquet(f"{TEST_SF_DIR}/lineitem.parquet")


def _cents(s: pd.Series) -> np.ndarray:
    return np.round(s.to_numpy() * 100).astype(np.int64)


def test_ks_matches_numpy(spark):
    o = _orders()
    x = np.sort(_cents(o[o.o_orderpriority == "1-URGENT"].o_totalprice))
    y = np.sort(_cents(o[o.o_orderpriority == "5-LOW"].o_totalprice))
    grid = np.union1d(x, y)
    f1 = np.searchsorted(x, grid, side="right") / len(x)
    f2 = np.searchsorted(y, grid, side="right") / len(y)
    d_ref = np.max(np.abs(f1 - f2))
    row = q_stats_ks_twosample(spark, TEST_SF_DIR).collect()[0]
    assert row.n1 == len(x) and row.n2 == len(y)
    assert math.isclose(row.ks_d, d_ref, rel_tol=1e-9)


def test_mannwhitney_matches_numpy(spark):
    o = _orders()
    x = _cents(o[o.o_orderpriority == "1-URGENT"].o_totalprice)
    y = _cents(o[o.o_orderpriority == "5-LOW"].o_totalprice)
    pooled = np.concatenate([x, y])
    order = np.argsort(pooled, kind="mergesort")
    ranks = np.empty(len(pooled))
    sorted_v = pooled[order]
    # average ranks with ties
    i = 0
    rank_of = np.empty(len(pooled))
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        rank_of[i:j] = (i + 1 + j) / 2.0
        i = j
    ranks[order] = rank_of
    r1 = ranks[: len(x)].sum()
    u1_ref = r1 - len(x) * (len(x) + 1) / 2.0
    row = q_stats_mannwhitney(spark, TEST_SF_DIR).collect()[0]
    assert math.isclose(row.u1, u1_ref, rel_tol=1e-12)
    assert math.isclose(row.u2, len(x) * len(y) - u1_ref, rel_tol=1e-12)


def test_chi2_matches_numpy(spark):
    o = _orders()
    cont = pd.crosstab(o.o_orderstatus, o.o_orderpriority).to_numpy().astype(float)
    n = cont.sum()
    exp = np.outer(cont.sum(axis=1), cont.sum(axis=0)) / n
    chi2_ref = ((cont - exp) ** 2 / exp).sum()
    row = q_stats_chi2(spark, TEST_SF_DIR).collect()[0]
    assert row.n_orders == int(n)
    assert row.dof == (cont.shape[0] - 1) * (cont.shape[1] - 1)
    # the engine nano-rounds each cell term before summing
    assert math.isclose(row.chi2, chi2_ref, rel_tol=0, abs_tol=1e-6 * cont.size)


def test_ols_matches_numpy_lstsq(spark):
    li = _lineitem()
    X = np.column_stack(
        [
            np.ones(len(li)),
            _cents(li.l_quantity),
            _cents(li.l_discount),
            _cents(li.l_tax),
        ]
    ).astype(float)
    yv = _cents(li.l_extendedprice).astype(float)
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    row = q_ml_ols_multifeat(spark, TEST_SF_DIR).collect()[0]
    for got, ref in zip(
        [row.beta0, row.beta1, row.beta2, row.beta3], beta
    ):
        assert math.isclose(got, ref, rel_tol=1e-6, abs_tol=1e-6)
    resid = yv - X @ beta
    ss_tot = ((yv - yv.mean()) ** 2).sum()
    r2_ref = 1.0 - (resid**2).sum() / ss_tot
    assert math.isclose(row.r2, r2_ref, rel_tol=1e-6)


def test_kaplan_meier_matches_numpy(spark):
    o = _orders()
    d = pd.to_datetime(o.o_orderdate).dt.date
    per = pd.DataFrame({"k": o.o_custkey, "d": d}).groupby("k").agg(["min", "max"])
    first = per[("d", "min")].to_numpy()
    last = per[("d", "max")].to_numpy()
    end = d.max()
    dur = np.array([(b - a).days for a, b in zip(first, last)], dtype=np.int64)
    event = np.array([(end - b).days > 90 for b in last], dtype=np.int64)
    rows = {
        r.dur_days: r
        for r in q_survival_kaplan_meier(spark, TEST_SF_DIR).collect()
    }
    # replay KM in numpy over every distinct duration
    surv = 1.0
    total = len(dur)
    removed = 0
    for t in np.sort(np.unique(dur)):
        at_risk = total - removed
        d_i = int(event[dur == t].sum())
        m_i = int((dur == t).sum())
        if d_i > 0:
            if d_i < at_risk:
                surv *= 1.0 - d_i / at_risk
            else:
                surv = 0.0
            row = rows[int(t)]
            assert row.n_risk == at_risk
            assert row.n_events == d_i
            assert math.isclose(row.survival, surv, rel_tol=0, abs_tol=5e-6)
        removed += m_i
    assert set(rows) == {int(t) for t in np.unique(dur) if event[dur == t].sum() > 0}


def test_auc_matches_numpy(spark):
    # independent third implementation: recompute the quality score from
    # the raw parquet and the AUC via the tie-corrected rank-sum identity
    docs = pd.read_parquet(f"{TEST_SF_DIR}/documents.parquet")
    toks = docs.text.str.split(" ")
    n = toks.map(len).to_numpy(dtype=float)
    nd = toks.map(lambda t: len(set(t))).to_numpy(dtype=float)
    nthe = toks.map(lambda t: sum(1 for x in t if x == "the")).to_numpy(
        dtype=float
    )
    quality = (
        0.4 * np.minimum(1.0, n / 50.0) + 0.3 * (nd / n) + 0.3 * (1.0 - nthe / n)
    )
    s = np.round(quality * 1e6).astype(np.int64)
    is_pos = (docs.lang == "en").to_numpy()
    # average ranks with ties over the discretized scores
    order = np.argsort(s, kind="mergesort")
    sorted_s = s[order]
    ranks = np.empty(len(s), dtype=float)
    i = 0
    while i < len(sorted_s):
        j = i
        while j < len(sorted_s) and sorted_s[j] == sorted_s[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    n_pos = int(is_pos.sum())
    n_neg = len(s) - n_pos
    u1 = ranks[is_pos].sum() - n_pos * (n_pos + 1) / 2.0
    auc_ref = u1 / (n_pos * n_neg)
    row = q_ml_auc_roc(spark, TEST_SF_DIR).collect()[0]
    assert row.n_pos == n_pos and row.n_neg == n_neg
    assert math.isclose(row.auc, auc_ref, rel_tol=1e-9)


def test_psi_matches_numpy(spark):
    o = _orders()
    cents = _cents(o.o_totalprice)
    bins = np.minimum(19, cents // 3000000)
    half = (o.o_orderkey.to_numpy() % 2).astype(np.int64)
    psi_ref = 0.0
    na_tot = int((half == 0).sum())
    nb_tot = int((half == 1).sum())
    for b in range(20):
        na = int(((bins == b) & (half == 0)).sum())
        nb = int(((bins == b) & (half == 1)).sum())
        p = (na + 1) / (na_tot + 20)
        q = (nb + 1) / (nb_tot + 20)
        psi_ref += (p - q) * math.log(p / q)
    row = q_ml_psi_drift(spark, TEST_SF_DIR).collect()[0]
    assert math.isclose(row.psi, psi_ref, rel_tol=0, abs_tol=1e-6)
    assert row.is_stable == (psi_ref < 0.1)


def test_pr_curve_ap_matches_numpy(spark):
    """Independent third implementation of the PR curve's final average
    precision: recompute scores + AP in NumPy from the raw parquet."""
    from aind_data_transformation_spark.queries.ml_eval import q_ml_pr_curve

    docs = pd.read_parquet(f"{TEST_SF_DIR}/documents.parquet")
    toks = docs.text.str.split(" ")
    n = toks.map(len).to_numpy(dtype=float)
    nd = toks.map(lambda t: len(set(t))).to_numpy(dtype=float)
    nthe = toks.map(lambda t: sum(1 for x in t if x == "the")).to_numpy(
        dtype=float
    )
    # floor(x+0.5): Spark/DuckDB round() is HALF_UP; np.round is HALF_EVEN
    s = np.floor(
        (0.4 * np.minimum(1.0, n / 50.0) + 0.3 * (nd / n) + 0.3 * (1.0 - nthe / n))
        * 1e6
        + 0.5
    ).astype(np.int64)
    is_pos = (docs.lang == "en").to_numpy().astype(np.int64)
    n_pos = int(is_pos.sum())
    ap_nano = 0  # the engine nano-rounds each AP increment (1e-9 grid)
    tp = fp = 0
    rows = {}
    for sv in sorted(set(s), reverse=True):
        mask = s == sv
        c1 = int(is_pos[mask].sum())
        c0 = int((mask & (is_pos == 0)).sum())
        tp += c1
        fp += c0
        prec = tp / (tp + fp)
        ap_nano += int(np.floor((c1 / n_pos) * prec * 1e9 + 0.5))
        rows[int(sv)] = (tp, fp, prec, tp / n_pos, ap_nano / 1e9)
    got = {
        int(r.s): (r.tp, r.fp, r.precision, r.recall, r.ap_cum)
        for r in q_ml_pr_curve(spark, TEST_SF_DIR).collect()
    }
    assert set(got) == set(rows)
    for sv, (tp_r, fp_r, prec_r, rec_r, ap_r) in rows.items():
        g = got[sv]
        assert g[0] == tp_r and g[1] == fp_r
        assert math.isclose(g[2], prec_r, rel_tol=1e-9)
        assert math.isclose(g[3], rec_r, rel_tol=1e-9)
        assert math.isclose(g[4], ap_r, rel_tol=1e-9)


def test_anova_matches_numpy(spark):
    from aind_data_transformation_spark.queries.stattests import q_stats_anova

    o = _orders()
    cents = _cents(o.o_totalprice).astype(float)
    groups = [cents[(o.o_orderpriority == g).to_numpy()]
              for g in sorted(o.o_orderpriority.unique())]
    k = len(groups)
    nt = sum(len(g) for g in groups)
    grand = cents.mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f_ref = (ssb / (k - 1)) / (ssw / (nt - k))
    row = q_stats_anova(spark, TEST_SF_DIR).collect()[0]
    assert row.k_groups == k and row.n_rows == nt
    # the engine integer-rounds each s_g^2/n_g term (±0.5 per group)
    assert math.isclose(row.f_stat, f_ref, rel_tol=1e-6)
    assert math.isclose(row.eta_squared, ssb / (ssb + ssw), rel_tol=1e-6)


def test_levene_brown_forsythe_matches_numpy(spark):
    from aind_data_transformation_spark.queries.stattests import q_stats_levene

    o = _orders()
    cents = _cents(o.o_totalprice)
    prios = sorted(o.o_orderpriority.unique())
    zs = []
    for g in prios:
        vals = np.sort(cents[(o.o_orderpriority == g).to_numpy()])
        med = vals[(len(vals) + 1) // 2 - 1]  # exact lower median
        zs.append(np.abs(vals - med).astype(float))
    k = len(zs)
    nt = sum(len(z) for z in zs)
    grand = np.concatenate(zs).mean()
    ssb = sum(len(z) * (z.mean() - grand) ** 2 for z in zs)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
    w_ref = (ssb / (k - 1)) / (ssw / (nt - k))
    row = q_stats_levene(spark, TEST_SF_DIR).collect()[0]
    assert row.k_groups == k and row.n_rows == nt
    assert math.isclose(row.bf_stat, w_ref, rel_tol=1e-6)


def test_welch_ttest_matches_scipy_formula(spark):
    """Independent NumPy recomputation of Welch's t and the
    Welch-Satterthwaite df from the raw parquet."""
    from aind_data_transformation_spark.queries.stattests import (
        _G1,
        _G2,
        q_stats_welch_ttest,
    )

    got = q_stats_welch_ttest(spark, TEST_SF_DIR).collect()[0]
    o = _orders()
    a = _cents(o.loc[o.o_orderpriority == _G1, "o_totalprice"]) / 100.0
    b = _cents(o.loc[o.o_orderpriority == _G2, "o_totalprice"]) / 100.0
    v1, v2 = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(v1 + v2)
    df = (v1 + v2) ** 2 / (v1**2 / (len(a) - 1) + v2**2 / (len(b) - 1))
    assert got["n1"] == len(a) and got["n2"] == len(b)
    assert got["t_stat"] == pytest.approx(t, rel=1e-6)
    assert got["welch_df"] == pytest.approx(df, rel=1e-6)


def test_gini_best_split_matches_numpy(spark):
    """Independent NumPy recomputation of the best decision-stump
    threshold: exhaustive weighted-Gini scan over the distinct feature
    values of the raw parquet."""
    from aind_data_transformation_spark.queries.ml_eval import (
        q_ml_gini_best_split,
    )

    got = q_ml_gini_best_split(spark, TEST_SF_DIR).collect()[0]
    d = pd.read_parquet(f"{TEST_SF_DIR}/documents.parquet")
    x = d["n_chars"].to_numpy()
    y = (d["lang"] == "en").to_numpy().astype(np.int64)
    vals = np.unique(x)
    best = (np.inf, None)
    nt, pt = len(x), int(y.sum())
    for v in vals[:-1]:
        m = x <= v
        nl, pl = int(m.sum()), int(y[m].sum())
        gl = 1 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2
        nr, pr = nt - nl, pt - pl
        gr = 1 - (pr / nr) ** 2 - ((nr - pr) / nr) ** 2
        g = nl / nt * gl + nr / nt * gr
        # match the query's 1e-9 integer grid + smaller-threshold ties
        g = math.floor(g * 1e9 + 0.5) / 1e9
        if g < best[0]:
            best = (g, v)
    assert got["n_rows"] == nt
    assert got["threshold"] == best[1]
    assert got["weighted_gini"] == pytest.approx(best[0], abs=1e-9)


def test_bootstrap_ci_matches_numpy_exact(spark):
    """The Poisson bootstrap is fully deterministic (hash-quantized
    weights), so NumPy can reproduce the 64 resample means and the
    order-statistic envelope EXACTLY — not just approximately."""
    from aind_data_transformation_spark.queries.stattests import (
        _BOOT_B,
        _BOOT_THRESH,
        q_ml_bootstrap_ci,
    )

    got = q_ml_bootstrap_ci(spark, TEST_SF_DIR).collect()[0]
    o = _orders()
    keys = o["o_orderkey"].to_numpy().astype(np.int64)
    c = _cents(o["o_totalprice"])
    means = []
    for b in range(_BOOT_B):
        u = ((keys * _BOOT_B + b) * 2654435761) % 4294967296
        w = np.searchsorted(np.array(_BOOT_THRESH), u, side="right")
        means.append((b, (w * c).sum() / w.sum()))
    ranked = sorted(means, key=lambda t: (t[1], t[0]))
    lo = math.floor(ranked[3][1] / 100 * 1e6 + 0.5) / 1e6
    hi = math.floor(ranked[60][1] / 100 * 1e6 + 0.5) / 1e6
    assert got["ci_lo"] == lo
    assert got["ci_hi"] == hi
    assert got["mean_value"] == math.floor(
        c.sum() / len(c) / 100 * 1e6 + 0.5
    ) / 1e6


def test_spearman_matches_numpy_ranks(spark):
    """Independent NumPy recomputation: average ranks (scipy-style) on
    both variables, then Pearson over the ranks."""
    from aind_data_transformation_spark.queries.stattests import (
        q_stats_spearman_corr,
    )

    got = q_stats_spearman_corr(spark, TEST_SF_DIR).collect()[0]
    o = _orders()
    x = _cents(o["o_totalprice"]).astype(np.float64)
    y = (
        (pd.to_datetime(o["o_orderdate"]) - pd.Timestamp("1970-01-01"))
        .dt.days.to_numpy()
        .astype(np.float64)
    )

    def avg_rank(a):
        order = np.argsort(a, kind="mergesort")
        ranks = np.empty(len(a), dtype=np.float64)
        sa = a[order]
        i = 0
        while i < len(a):
            j = i
            while j + 1 < len(a) and sa[j + 1] == sa[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    rx, ry = avg_rank(x), avg_rank(y)
    rho = np.corrcoef(rx, ry)[0, 1]
    assert got["n_rows"] == len(x)
    # the query emits round(rho, 6) — compare at half-grid tolerance
    assert got["spearman_rho"] == pytest.approx(rho, abs=5.1e-7)


def test_hash32_matches_true_product_beyond_int64_range():
    """_hash32 must equal (x*2654435761) mod 2^32 for x far past the
    point where the naive int64 product overflows (~3.5e9), in BOTH
    engines, byte-identically."""
    import duckdb

    from aind_data_transformation_spark.queries.stattests import _hash32

    xs = [0, 1, 65535, 65536, 2**31, 2**32 - 1, 2**32, 10**12,
          2**40 + 12345, 2**56 - 1]
    expr = _hash32("x")
    con = duckdb.connect()
    for x in xs:
        want = (x * 2654435761) % 2**32
        got = con.execute(
            f"SELECT {expr} FROM (SELECT CAST({x} AS BIGINT) AS x)"
        ).fetchone()[0]
        assert got == want, (x, got, want)


def test_hash32_spark_duckdb_identical(spark):
    from pyspark.sql import functions as F

    from aind_data_transformation_spark.queries.stattests import _hash32

    xs = [1, 2**32 - 1, 10**12, 2**40 + 12345, 2**56 - 1]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = {
        r["x"]: r["h"]
        for r in df.select("x", F.expr(_hash32("x")).alias("h")).collect()
    }
    for x in xs:
        assert got[x] == (x * 2654435761) % 2**32, x
