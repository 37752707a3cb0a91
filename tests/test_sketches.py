"""Mergeable-sketch operators (operators/sketches.py): HLL cardinality
and Count-Min frequency, plus the two-pass exact prefilter plans.

Everything is deterministic (xxhash64), so the probabilistic error
bounds are pinned as plain assertions on fixed inputs.
"""

import pytest
from pyspark.sql import functions as F

from dbp_etl_spark.operators.sketches import (
    cm_estimate,
    cm_heavy_hitters_exact,
    cm_merge,
    cm_sketch,
    hll_error_bound,
    hll_estimate,
    hll_merge,
    hll_prefilter_groups,
    hll_registers,
)


@pytest.fixture(scope="module")
def items(spark):
    # 5000 distinct keys, skewed repetition: key i appears (i % 7) + 1 times
    df = spark.range(5000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
        ((F.col("id") % 7) + 1).alias("reps"),
        (F.col("id") % 4).alias("grp"),
    )
    return df.select("grp", "k", F.explode(F.sequence(F.lit(1), F.col("reps"))).alias("_")).drop(
        "_"
    )


def test_hll_estimate_within_bound(spark, items):
    p = 12
    est = hll_estimate(hll_registers(items, "k", p=p), p=p).collect()[0]["approx_distinct"]
    true = items.select("k").distinct().count()
    assert abs(est - true) / true <= hll_error_bound(p, sigmas=4.0)


def test_hll_grouped_and_merge_equivalence(spark, items):
    p = 11
    # sketch(full) == merge(sketch(split A), sketch(split B)) — the
    # mergeability property that makes HLL a distributed aggregate
    a = items.filter(F.xxhash64("k") % 2 == 0)
    b = items.filter(F.xxhash64("k") % 2 != 0)
    merged = hll_merge(
        hll_registers(a, "k", p=p, group_by=["grp"]),
        hll_registers(b, "k", p=p, group_by=["grp"]),
    )
    full = hll_registers(items, "k", p=p, group_by=["grp"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    # and each group estimate tracks its exact distinct
    ests = {r["grp"]: r["approx_distinct"] for r in hll_estimate(merged, p=p, group_by=["grp"]).collect()}
    exact = {
        r["grp"]: r["c"]
        for r in items.groupBy("grp").agg(F.countDistinct("k").alias("c")).collect()
    }
    for g, c in exact.items():
        assert abs(ests[g] - c) / c <= hll_error_bound(p, sigmas=4.0)


def test_hll_small_range_linear_counting(spark):
    # tiny cardinality: linear counting should be near-exact
    df = spark.range(37).select(F.concat(F.lit("x"), F.col("id").cast("string")).alias("k"))
    est = hll_estimate(hll_registers(df, "k", p=12), p=12).collect()[0]["approx_distinct"]
    assert abs(est - 37) <= 1.0


def test_hll_prefilter_matches_exact_having(spark, items):
    got = {
        (r["grp"], r["distinct_cnt"])
        for r in hll_prefilter_groups(items, "grp", "k", min_distinct=1200, p=12).collect()
    }
    want = {
        (r["grp"], r["c"])
        for r in items.groupBy("grp")
        .agg(F.countDistinct("k").alias("c"))
        .filter(F.col("c") >= 1200)
        .collect()
    }
    assert got == want and got  # non-trivial: some groups pass, some don't


def test_cm_never_underestimates_and_bounds(spark, items):
    width, depth = 1024, 4
    sk = cm_sketch(items, "k", width=width, depth=depth)
    est = cm_estimate(sk, items.select("k"), "k", width=width, depth=depth)
    true = items.groupBy("k").agg(F.count("*").alias("true_cnt"))
    joined = est.join(true, "k").select("k", "approx_cnt", "true_cnt").collect()
    n = items.count()
    eps_n = (2.718281828 / width) * n  # e/width * N — the CM error bound
    assert all(r["approx_cnt"] >= r["true_cnt"] for r in joined)
    # the bound holds w.p. 1-(1/2)^depth per key; with a fixed hash we
    # just require the vast majority inside it
    inside = sum(1 for r in joined if r["approx_cnt"] - r["true_cnt"] <= eps_n)
    assert inside / len(joined) > 0.95


def test_cm_merge_equivalence(spark, items):
    a = items.filter(F.xxhash64("k") % 2 == 0)
    b = items.filter(F.xxhash64("k") % 2 != 0)
    merged = cm_merge(cm_sketch(a, "k", width=512, depth=3), cm_sketch(b, "k", width=512, depth=3))
    full = cm_sketch(items, "k", width=512, depth=3)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_cm_heavy_hitters_exact_matches(spark, items):
    got = {(r["k"], r["cnt"]) for r in cm_heavy_hitters_exact(items, "k", min_count=6, width=1024).collect()}
    want = {
        (r["k"], r["c"])
        for r in items.groupBy("k").agg(F.count("*").alias("c")).filter(F.col("c") >= 6).collect()
    }
    assert got == want and got


def test_sketch_plans_have_no_python_udf(spark, items):
    # the whole module must stay JVM-side: no BatchEvalPython / ArrowEval
    for df in (
        hll_registers(items, "k", p=10),
        cm_sketch(items, "k", width=256, depth=2),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


# ------------------------------------------------- fixed-bin histogram


def test_fixed_histogram_bins_clamp_and_merge(spark):
    from dbp_etl_spark.operators.sketches import fixed_histogram, hist_merge

    df = spark.createDataFrame([(v,) for v in [-5.0, 0.0, 9.9, 10.0, 55.0, 999.0]], "v double")
    got = {r["bin"]: r["cnt"] for r in fixed_histogram(df, "v", 0.0, 100.0, 10).collect()}
    assert got == {0: 3, 1: 1, 5: 1, 9: 1}  # out-of-range clamps to edge bins
    a = df.filter(F.col("v") < 10)
    b = df.filter(F.col("v") >= 10)
    merged = hist_merge(
        fixed_histogram(a, "v", 0.0, 100.0, 10), fixed_histogram(b, "v", 0.0, 100.0, 10)
    )
    assert {r["bin"]: r["cnt"] for r in merged.collect()} == got


def test_hist_quantiles_interpolation_and_error_bound(spark):
    from dbp_etl_spark.operators.sketches import fixed_histogram, hist_quantiles

    # 1..1000 uniform: p50 ~ 500, p99 ~ 990; bin width 10 bounds error
    df = spark.range(1, 1001).select(F.col("id").cast("double").alias("v"))
    hist = fixed_histogram(df, "v", 0.0, 1000.0, 100)
    got = {r["q"]: r["est"] for r in hist_quantiles(hist, [0.5, 0.99], 0.0, 1000.0, 100).collect()}
    assert abs(got[0.5] - 500.0) <= 10.0
    assert abs(got[0.99] - 990.0) <= 10.0


def test_hist_quantiles_partitioning_invariant(spark):
    from dbp_etl_spark.operators.sketches import fixed_histogram, hist_quantiles

    df = spark.range(0, 5000).select((F.xxhash64("id") % 1000).cast("double").alias("v"))
    qs = [0.25, 0.5, 0.75, 0.9]
    outs = []
    for parts in (1, 7, 32):
        hist = fixed_histogram(df.repartition(parts), "v", -1000.0, 1000.0, 64)
        outs.append(sorted(map(tuple, hist_quantiles(hist, qs, -1000.0, 1000.0, 64).collect())))
    assert outs[0] == outs[1] == outs[2]  # deterministic across partitionings


def test_fixed_histogram_stays_jvm_side(spark):
    from dbp_etl_spark.operators.sketches import fixed_histogram

    df = spark.range(10).select(F.col("id").cast("double").alias("v"))
    plan = fixed_histogram(df, "v", 0.0, 10.0, 5)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_cohort_overlap_matches_bruteforce(spark):
    from dbp_etl_spark.operators.sketches import cohort_overlap_exact_pruned

    # deterministic memberships with varied overlaps
    rows = [
        (u, c)
        for u in range(300)
        for i, c in enumerate(["a", "b", "c", "d"])
        if (u * (i + 3)) % 7 < 4
    ]
    df = spark.createDataFrame(rows, "user_id long, cohort string")
    got = {
        (r.type_a, r.type_b): r.n_common
        for r in cohort_overlap_exact_pruned(df, "cohort", "user_id", 100).collect()
    }
    # brute force
    members = {}
    for u, c in rows:
        members.setdefault(c, set()).add(u)
    want = {}
    cs = sorted(members)
    for i in range(len(cs)):
        for j in range(i + 1, len(cs)):
            n = len(members[cs[i]] & members[cs[j]])
            if n >= 100:
                want[(cs[i], cs[j])] = n
    assert got == want and want  # threshold must bind on something


def test_cohort_overlap_disjoint_cohorts_empty(spark):
    from dbp_etl_spark.operators.sketches import cohort_overlap_exact_pruned

    df = spark.createDataFrame(
        [(u, "a" if u < 100 else "b") for u in range(200)],
        "user_id long, cohort string",
    )
    assert cohort_overlap_exact_pruned(df, "cohort", "user_id", 1).count() == 0


def test_cohort_overlap_duplicate_events_counted_once(spark):
    from dbp_etl_spark.operators.sketches import cohort_overlap_exact_pruned

    rows = [(1, "a"), (1, "a"), (1, "b"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "user_id long, cohort string")
    out = cohort_overlap_exact_pruned(df, "cohort", "user_id", 2).collect()
    assert [(r.type_a, r.type_b, r.n_common) for r in out] == [("a", "b", 2)]
