"""Long-tail distribution / inference evaluators (functions/distributions.py).

Oracles are independent closed forms: integer-parameter gamma/beta cdfs have
exact finite-sum formulas (Poisson sum, binomial sum), chi-square critical
values are textbook constants, everything else is recomputed in numpy from the
published density/cdf formulas.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_spark.functions import distributions as D
from solr_spark.functions import evaluators as E


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _eval_at(spark, dist, xs, what="cdf"):
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    col = (dist.cumulative_probability(F.col("x")) if what == "cdf"
           else dist.probability(F.col("x")))
    return [r["v"] for r in df.select(col.alias("v")).orderBy(F.col("x")).collect()]


# ---------------------------------------------------------------- special fns

def test_gammainc_driver_textbook():
    # chi-square 95% critical values: sf(3.841, 1) = sf(5.991, 2) = 0.05
    assert D.chi2_sf(3.841458820694124, 1) == pytest.approx(0.05, abs=1e-9)
    assert D.chi2_sf(5.991464547107979, 2) == pytest.approx(0.05, abs=1e-9)
    # P(a, x) for integer a has the exact Poisson-sum form
    for a in (1, 3, 7):
        for x in (0.5, 2.0, 9.0, 40.0):
            exact = 1.0 - math.exp(-x) * sum(x ** n / math.factorial(n)
                                             for n in range(a))
            assert D.gammainc_p(a, x) == pytest.approx(exact, abs=1e-12)


def test_gammainc_column_matches_driver(spark):
    xs = [0.1, 0.7, 1.5, 3.0, 8.0, 25.0, 80.0]
    for a in (0.5, 2.0, 5.5):
        got = _eval_at(spark, D.gamma_distribution(a, 1.0), xs)
        want = [D.gammainc_p(a, x) for x in xs]
        assert got == pytest.approx(want, abs=1e-9)


def test_betainc_column_integer_oracle(spark):
    # I_x(a, b) with integer a,b == binomial tail: sum_{j=a}^{n} C(n,j) x^j (1-x)^(n-j), n=a+b-1
    for a, b in ((2, 3), (4, 4), (1, 6)):
        n = a + b - 1
        xs = [0.05, 0.2, 0.5, 0.8, 0.95]
        got = _eval_at(spark, D.beta_distribution(a, b), xs)
        want = [sum(math.comb(n, j) * x ** j * (1 - x) ** (n - j)
                    for j in range(a, n + 1)) for x in xs]
        assert got == pytest.approx(want, abs=1e-9)


# ------------------------------------------------------------- distributions

def test_weibull_lognormal_triangular_geometric(spark):
    xs = [0.2, 0.9, 1.7, 3.5]
    w = D.weibull_distribution(1.5, 2.0)
    assert _eval_at(spark, w, xs) == pytest.approx(
        [1 - math.exp(-((x / 2.0) ** 1.5)) for x in xs], abs=1e-12)
    assert _eval_at(spark, w, xs, "pdf") == pytest.approx(
        [(1.5 / 2.0) * (x / 2.0) ** 0.5 * math.exp(-((x / 2.0) ** 1.5))
         for x in xs], abs=1e-12)

    ln = D.log_normal_distribution(0.3, 0.8)
    assert _eval_at(spark, ln, xs) == pytest.approx(
        [0.5 * (1 + math.erf((math.log(x) - 0.3) / (0.8 * math.sqrt(2))))
         for x in xs], abs=1e-6)  # erf polynomial |err| <= 1.5e-7

    tri = D.triangular_distribution(0.0, 1.0, 4.0)
    assert _eval_at(spark, tri, [0.5, 1.0, 2.0, 3.9]) == pytest.approx(
        [0.25 * 0.25, 0.25, 1 - (2.0 ** 2) / 12.0, 1 - (0.1 ** 2) / 12.0],
        abs=1e-12)

    geo = D.geometric_distribution(0.3)
    assert _eval_at(spark, geo, [0, 1, 4], "pdf") == pytest.approx(
        [0.3, 0.3 * 0.7, 0.3 * 0.7 ** 4], abs=1e-12)
    assert _eval_at(spark, geo, [0, 1, 4]) == pytest.approx(
        [1 - 0.7, 1 - 0.7 ** 2, 1 - 0.7 ** 5], abs=1e-12)


def test_discrete_distributions(spark):
    ui = D.uniform_integer_distribution(3, 7)
    assert _eval_at(spark, ui, [2.5, 3.0, 5.0, 7.0, 9.0]) == pytest.approx(
        [0.0, 0.2, 0.6, 1.0, 1.0], abs=1e-12)

    en = D.enumerated_distribution([10.0, 20.0, 30.0], [0.2, 0.5, 0.3])
    assert _eval_at(spark, en, [10.0], "pdf") == pytest.approx([0.2])
    assert _eval_at(spark, en, [5.0, 10.0, 25.0, 30.0]) == pytest.approx(
        [0.0, 0.2, 0.7, 1.0], abs=1e-12)

    z = D.zipf_distribution(10, 1.2)
    h = sum(k ** -1.2 for k in range(1, 11))
    assert _eval_at(spark, z, [1.0, 3.0], "pdf") == pytest.approx(
        [1 / h, 3 ** -1.2 / h], abs=1e-12)
    assert _eval_at(spark, z, [3.0]) == pytest.approx(
        [sum(k ** -1.2 for k in (1, 2, 3)) / h], abs=1e-12)

    const = D.constant_distribution(4.0)
    assert _eval_at(spark, const, [3.9, 4.0, 4.1]) == [0.0, 1.0, 1.0]


def test_multivariate_normal(spark):
    means = [1.0, -2.0]
    cov = [[2.0, 0.6], [0.6, 1.0]]
    mvn = D.multivariate_normal_distribution(means, cov)
    pts = [[1.0, -2.0], [0.0, 0.0], [3.0, -1.0]]
    df = spark.createDataFrame([(p,) for p in pts], "x array<double>")
    got = [r["v"] for r in df.select(mvn.probability(F.col("x")).alias("v")).collect()]
    prec = np.linalg.inv(np.array(cov))
    norm = 1.0 / (2 * math.pi * math.sqrt(np.linalg.det(np.array(cov))))
    want = [float(norm * math.exp(-0.5 * (np.array(p) - means) @ prec
                                  @ (np.array(p) - means))) for p in pts]
    assert got == pytest.approx(want, rel=1e-9)

    samp = mvn.sample(spark, 4000, seed=11).toPandas()["sample"]
    arr = np.stack(samp.to_numpy())
    assert arr.mean(axis=0) == pytest.approx(means, abs=0.15)
    assert np.cov(arr.T) == pytest.approx(np.array(cov), abs=0.2)


def test_sampling_moments(spark):
    w = D.weibull_distribution(2.0, 3.0)
    s = np.array(w.sample(spark, 5000, seed=3).toPandas()["sample"])
    assert s.mean() == pytest.approx(3.0 * math.gamma(1.5), rel=0.05)

    g = D.gamma_distribution(4.0, 2.0)
    s = np.array(g.sample(spark, 5000, seed=5).toPandas()["sample"])
    assert s.mean() == pytest.approx(8.0, rel=0.05)
    assert s.var() == pytest.approx(16.0, rel=0.15)

    geo = D.geometric_distribution(0.25)
    s = np.array(geo.sample(spark, 5000, seed=7).toPandas()["sample"])
    assert s.mean() == pytest.approx(3.0, rel=0.1)  # (1-p)/p

    with pytest.raises(NotImplementedError):
        D.beta_distribution(2.0, 3.0).sample(spark, 10)


def test_outliers_and_density(spark):
    # outliers/density accept the base evaluators.Distribution kinds too
    from solr_spark.functions.evaluators import normal_distribution
    dist = normal_distribution(0.0, 1.0)
    df = spark.createDataFrame([([0.1, -4.0, 0.5, 3.8, -0.2],)], "a array<double>")
    got = df.select(D.outliers(dist, F.col("a"), 0.01, 0.99).alias("o")) \
            .collect()[0]["o"]
    assert got == [-4.0, 3.8]
    pdf = df.select(D.density(dist, F.lit(0.0)).alias("v")).collect()[0]["v"]
    assert pdf == pytest.approx(1 / math.sqrt(2 * math.pi), abs=1e-9)


# ------------------------------------------------------------------ inference

def test_chi_square_dataset():
    a, b = [30, 40, 30], [40, 30, 30]
    n1, n2 = 100.0, 100.0
    stat = sum((oa - ob) ** 2 / (oa + ob) for oa, ob in zip(a, b))
    got = D.chi_square_dataset(a, b)
    assert got["chisquare_statistic"] == pytest.approx(stat, rel=1e-12)
    assert got["p_value"] == pytest.approx(D.chi2_sf(stat, 2), rel=1e-12)
    # unequal totals exercise the scaling branch
    got2 = D.chi_square_dataset([60, 80, 60], [40, 30, 30])
    assert 0.0 < got2["p_value"] < 1.0


def test_gtest_dataset():
    a, b = [268, 199, 42], [807, 759, 184]
    got = D.gtest_dataset(a, b)
    # independent recomputation from the 2xk table
    n1, n2 = sum(a), sum(b)
    tot = n1 + n2
    g = 0.0
    for oa, ob in zip(a, b):
        cs = oa + ob
        g += 2 * oa * math.log(oa / (n1 * cs / tot))
        g += 2 * ob * math.log(ob / (n2 * cs / tot))
    assert got["g_statistic"] == pytest.approx(g, rel=1e-12)
    assert 0.0 <= got["p_value"] <= 1.0


def test_corr_pvalues(spark):
    rng = np.random.default_rng(17)
    x = rng.normal(0, 1, 300)
    y = 2.0 * x + rng.normal(0, 0.5, 300)   # strongly correlated
    z = rng.normal(0, 1, 300)               # independent
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double")
    p = D.corr_pvalues(df, ["x", "y", "z"])
    assert p[0][1] < 1e-10 and p[1][0] < 1e-10      # x-y: certain
    assert p[0][2] > 0.01 and p[1][2] > 0.01        # x-z, y-z: noise
    assert p[0][0] == 0.0                           # diagonal untouched


# ------------------------------------------------------------ array long tail

def test_array_long_tail(spark):
    df = spark.createDataFrame(
        [([1.0, 3.0, 2.0, 3.0],
          [2.0, 2.0, 2.0, 2.0])], "a array<double>, b array<double>")

    def got(col):
        return df.select(col.alias("v")).collect()[0]["v"]

    # earth movers: prefix sums of a-b = [-1, 0, 0, 1] -> |.| sum = 2
    assert got(E.earth_movers("a", "b")) == pytest.approx(2.0)
    assert got(E.mode_ev("a")) == [3.0]
    assert got(E.mode_ev(F.array(*[F.lit(v) for v in [1.0, 1.0, 2.0, 2.0, 5.0]]))) \
        == [1.0, 2.0]
    # NaturalRanking with tie averaging: [1,3,2,3] -> [1, 3.5, 2, 3.5]
    assert got(E.rank_ev("a")) == [1.0, 3.5, 2.0, 3.5]
    assert got(E.scale_ev(0.0, 10.0, "a")) == [0.0, 10.0, 5.0, 10.0]
    assert got(E.sum_difference("a", "b")) == pytest.approx(1.0)
    assert got(E.mean_difference("a", "b")) == pytest.approx(0.25)
    assert got(E.primes_ev(5, 10)) == [11, 13, 17, 19, 23]
    # lerp on points (0,0),(2,4),(4,0)
    xs, ys = [0.0, 2.0, 4.0], [0.0, 4.0, 0.0]
    xa = F.array(*[F.lit(v) for v in xs])
    ya = F.array(*[F.lit(v) for v in ys])
    assert got(E.lerp_interpolate(xa, ya, F.lit(1.0))) == pytest.approx(2.0)
    assert got(E.lerp_interpolate(xa, ya, F.lit(3.0))) == pytest.approx(2.0)
    assert got(E.lerp_interpolate(xa, ya, F.lit(-5.0))) == 0.0
    assert got(E.lerp_interpolate(xa, ya, F.lit(9.0))) == 0.0
    # distance matrix of rows
    m = F.array(F.array(F.lit(0.0), F.lit(0.0)), F.array(F.lit(3.0), F.lit(4.0)))
    dm = got(E.distance_matrix(m))
    assert dm[0][1] == pytest.approx(5.0) and dm[1][0] == pytest.approx(5.0)
    assert dm[0][0] == 0.0


def test_registry_dispatch(spark):
    # the Lang names resolve through ev()
    d = E.ev("weibullDistribution", 1.5, 2.0)
    assert isinstance(d, D.ParamDistribution)
    r = E.ev("chiSquareDataSet", [30, 40, 30], [40, 30, 30])
    assert "p_value" in r
    col = E.ev("earthMovers",
               F.array(F.lit(1.0), F.lit(2.0)), F.array(F.lit(2.0), F.lit(1.0)))
    df = spark.range(1).select(col.alias("v"))
    assert df.collect()[0]["v"] == pytest.approx(1.0)
