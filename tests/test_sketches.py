"""Sketch-operator invariants: HLL accuracy + partition invariance, CMS
one-sided error, and sampling determinism. Cross-engine value parity is the
driver gate's job (queries/sketchops oracles); these tests pin the
algorithmic guarantees the oracles can't express."""

import pytest
from pyspark.sql import functions as F

from spider_go_spark.operators import sketches

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_hll_within_error_bound(spark, events):
    est = {
        r["event_type"]: r["hll_est"]
        for r in sketches.hll_estimate(events, "user_id", ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        # raw HLL with m=64: ~13% std error; 4 sigma bound, generous on
        # the low-cardinality side where raw HLL biases high
        assert est[t] == pytest.approx(n, rel=0.55), (t, est[t], n)


def test_hll_partition_invariant(spark, events):
    a = sketches.hll_estimate(events, "user_id", ["event_type"])
    b = sketches.hll_estimate(events.repartition(13), "user_id", ["event_type"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_cms_one_sided_and_tight_for_heavy(spark, events):
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "user_id").limit(10)
    est = sketches.cms_estimates(events, "user_id", top.select("user_id"))
    rows = top.join(est, "user_id").collect()
    assert len(rows) == 10
    total = events.count()
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"]  # never underestimates
        # standard CMS bound: err <= e*N/w with prob 1-e^-d; be loose
        assert r["cms_est"] - r["exact_cnt"] <= 4 * total / sketches.CMS_W


def test_sketch_queries_partition_invariant(spark):
    from spider_go_spark.queries import sketchops

    for name in (
        "tfidf_top_terms",
        "repetition_quality",
        "stratified_sample",
        "histogram_quantiles",
    ):
        df = sketchops.QUERIES[name](spark, SF)
        once = sorted(map(tuple, df.collect()))
        again = sorted(map(tuple, df.repartition(7).collect()))
        assert once == again, name


def test_hll_pair_intersection_matches_python(spark, events):
    """Full pure-Python replay of the pair-intersection pipeline (same
    hash, registers, union-max, integer estimator), plus the lattice
    invariants: est_union >= max(est_a, est_b) (register-max dominates)
    and inter_est = max(est_a + est_b - est_union, 0)."""
    got = {
        (r["g_a"], r["g_b"]): r.asDict()
        for r in sketches.hll_pair_intersection(events, "user_id", "event_type").collect()
    }

    P, A = sketches.HASH_P, sketches.CMS_AS[0]
    M, BITS, CAP = sketches.HLL_M, sketches.HLL_RANK_BITS, sketches.HLL_RANK_CAP
    NUM = sketches.HLL_NUM

    rows = events.select("event_type", "user_id").collect()
    regs: dict[str, dict[int, int]] = {}
    members: dict[str, set] = {}
    for r in rows:
        g, k = r["event_type"], r["user_id"]
        h = ((k % P) * A) % P
        b, w = h % M, h // M
        rho = CAP
        for i in range(BITS):
            if (w >> i) & 1:
                rho = i + 1
                break
        regs.setdefault(g, {})
        regs[g][b] = max(regs[g].get(b, 0), rho)
        members.setdefault(g, set()).add(k)

    def est(reg: dict[int, int]) -> int:
        s = sum(1 << (CAP - m) for m in reg.values()) + (M - len(reg)) * (1 << CAP)
        return NUM // (1000 * s)

    groups = sorted(regs)
    want_pairs = {(a, b) for i, a in enumerate(groups) for b in groups[i + 1:]}
    assert set(got) == want_pairs
    for ga, gb in want_pairs:
        u = dict(regs[ga])
        for b, m in regs[gb].items():
            u[b] = max(u.get(b, 0), m)
        ea, eb, eu = est(regs[ga]), est(regs[gb]), est(u)
        row = got[(ga, gb)]
        assert (row["est_a"], row["est_b"], row["est_union"]) == (ea, eb, eu)
        assert row["inter_est"] == max(ea + eb - eu, 0)
        assert row["exact_overlap"] == len(members[ga] & members[gb])
        assert eu >= max(ea, eb)  # union registers dominate both inputs


def test_hll_cumulative_users_matches_python(spark):
    """Prefix-merged weekly registers ≡ a pure-Python HLL replay, and the
    final week's estimate equals the whole-table sketch (merge is lossless
    w.r.t. running the sketch over the union)."""
    from collections import defaultdict
    from datetime import datetime, timedelta

    from spider_go_spark.operators import sketches as sk
    from spider_go_spark.queries.sketchops import HLL_WEEK_US, hll_cumulative_users

    rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet").collect()
    epoch = datetime(1970, 1, 1)
    a, P, M = sk.CMS_AS[0], sk.HASH_P, sk.HLL_M

    def rho(w):
        for k in range(sk.HLL_RANK_BITS):
            if (w >> k) & 1:
                return k + 1
        return sk.HLL_RANK_CAP

    weekly = defaultdict(dict)  # week -> bucket -> max rho
    seen_weeks = set()
    first_week = {}
    for r in rows:
        us = (r["ts"] - epoch) // timedelta(microseconds=1)
        wk = us // HLL_WEEK_US
        seen_weeks.add(wk)
        u = r["user_id"]
        first_week[u] = min(first_week.get(u, wk), wk)
        h = ((u % P) * a) % P
        b, w = h % M, h // M
        weekly[wk][b] = max(weekly[wk].get(b, 0), rho(w))
    expect = {}
    merged = {}
    total = 0
    for wk in sorted(seen_weeks):
        for b, m in weekly[wk].items():
            merged[b] = max(merged.get(b, 0), m)
        s = sum(
            1 << (sk.HLL_RANK_CAP - merged.get(b, 0)) if b in merged
            else 1 << sk.HLL_RANK_CAP
            for b in range(M)
        )
        total += sum(1 for u, fw in first_week.items() if fw == wk)
        expect[wk] = (sk.HLL_NUM // (1000 * s), len(merged), total)
    got = {
        r["week"]: (r["hll_prefix_est"], r["n_registers_used"],
                    r["exact_prefix_distinct"])
        for r in hll_cumulative_users(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == expect
    # the last prefix ≡ the sketch of the whole table
    whole = sk.hll_estimate(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("g", F.lit(1)),
        "user_id", ["g"],
    ).collect()[0]["hll_est"]
    assert got[max(got)][0] == whole
