"""Cron-spec revisit schedules: the 5-field parser/next-fire kernel is
property-tested against a brute-force minute walker (the semantic
definition of cron), the round mapping is checked on worked examples, and
a crawl with a cron host must match the pure-Python oracle's ordering
exactly (both sides share functions/cron.cron_gap, so this gates the
engine plumbing, not the arithmetic)."""

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spider_go_spark.functions.cron import (
    cron_gap,
    cron_matches,
    next_fire,
    parse_cron,
)

# --------------------------------------------------------------------------
# parser + next_fire kernel (no Spark)
# --------------------------------------------------------------------------


def brute_next_fire(expr: str, after: dt.datetime) -> dt.datetime:
    """Reference semantics: walk forward one minute at a time."""
    t = after.replace(second=0, microsecond=0) + dt.timedelta(minutes=1)
    for _ in range(4 * 366 * 24 * 60):
        if cron_matches(expr, t):
            return t
        t += dt.timedelta(minutes=1)
    raise AssertionError("no fire in 4 years")


def _field(lo, hi):
    single = st.integers(lo, hi).map(str)
    rng = st.tuples(st.integers(lo, hi), st.integers(lo, hi)).map(
        lambda ab: f"{min(ab)}-{max(ab)}"
    )
    step = st.integers(2, 15).map(lambda s: f"*/{s}")
    rng_step = st.tuples(
        st.integers(lo, hi), st.integers(lo, hi), st.integers(2, 9)
    ).map(lambda t: f"{min(t[:2])}-{max(t[:2])}/{t[2]}")
    alist = st.lists(single, min_size=2, max_size=3, unique=True).map(",".join)
    return st.one_of(st.just("*"), single, rng, step, rng_step, alist)


cron_exprs = st.tuples(
    _field(0, 59), _field(0, 23), _field(1, 31), _field(1, 12), _field(0, 6)
).map(" ".join)

datetimes = st.datetimes(
    min_value=dt.datetime(2024, 1, 1), max_value=dt.datetime(2025, 12, 31)
).map(lambda t: t.replace(second=0, microsecond=0))


@settings(max_examples=150, deadline=None)
@given(expr=cron_exprs, after=datetimes)
def test_next_fire_matches_brute_force(expr, after):
    try:
        got = next_fire(expr, after)
    except ValueError:
        # impossible spec (e.g. dom 31 in a 30-day month set) — the brute
        # walker must agree there is no fire in the same horizon
        with pytest.raises(AssertionError):
            brute_next_fire(expr, after)
        return
    assert got == brute_next_fire(expr, after)
    assert got > after
    assert cron_matches(expr, got)


def test_parse_rejects_garbage():
    for bad in ("* * * *", "61 * * * *", "* 24 * * *", "a * * * *",
                "*/0 * * * *", "5-1 * * * *", "* * 0 * *"):
        with pytest.raises(ValueError):
            parse_cron(bad)


def test_dow_seven_is_sunday():
    # 2024-01-07 is a Sunday
    assert cron_matches("0 0 * * 7", dt.datetime(2024, 1, 7, 0, 0))
    assert cron_matches("0 0 * * 0", dt.datetime(2024, 1, 7, 0, 0))
    assert not cron_matches("0 0 * * 7", dt.datetime(2024, 1, 8, 0, 0))


def test_dom_dow_or_rule():
    # both restricted → OR: fires on the 15th AND on every Sunday
    expr = "0 0 15 * 0"
    assert cron_matches(expr, dt.datetime(2024, 1, 15, 0, 0))  # a Monday
    assert cron_matches(expr, dt.datetime(2024, 1, 7, 0, 0))   # a Sunday
    assert not cron_matches(expr, dt.datetime(2024, 1, 8, 0, 0))


def test_cron_gap_worked_examples():
    # epoch 2024-01-01T00:00, hourly rounds: "0 */2 * * *" fires at even
    # hours → a fetch at round 3 (03:00) is next eligible at round 4
    assert cron_gap("0 */2 * * *", 3, 3600) == 1
    assert cron_gap("0 */2 * * *", 4, 3600) == 2
    # daily-at-01:30 spec, hourly rounds: from round 0 (00:00) the fire at
    # 01:30 lands in round 2 (02:00 is the first round-time ≥ 01:30)
    assert cron_gap("30 1 * * *", 0, 3600) == 2
    assert cron_gap("30 1 * * *", 2, 3600) == 24
    # minute rounds: every-5-minutes spec from round 7 (00:07) → 00:10 = round 10
    assert cron_gap("*/5 * * * *", 7, 60) == 3
    assert cron_gap("*/5 * * * *", 10, 60) == 5


@settings(max_examples=60, deadline=None)
@given(expr=cron_exprs, rnd=st.integers(0, 500), period=st.sampled_from([60, 900, 3600]))
def test_cron_gap_invariants(expr, rnd, period):
    try:
        k = cron_gap(expr, rnd, period)
    except ValueError:
        return  # impossible spec
    assert k >= 1
    # the eligibility round's wall time has reached the next fire, and the
    # round before it had not
    t0 = dt.datetime(2024, 1, 1)
    fire = next_fire(expr, t0 + dt.timedelta(seconds=rnd * period))
    assert t0 + dt.timedelta(seconds=(rnd + k) * period) >= fire
    if k > 1:
        assert t0 + dt.timedelta(seconds=(rnd + k - 1) * period) < fire


# --------------------------------------------------------------------------
# engine ≡ oracle with a cron host
# --------------------------------------------------------------------------

N_URLS = 120
N_HOSTS = 4
MAX_ROUNDS = 8


def test_cron_revisit_matches_oracle(spark, tmp_path):
    """A host scheduled by "5 * * * *" at 15-minute rounds (non-uniform
    gaps: fires at minute 5 of each hour, rounds land at :00/:15/:30/:45)
    plus a fixed-interval host — fetch ordering must equal the oracle's."""
    from pyspark.sql import functions as F

    from spider_go_spark import schemas
    from spider_go_spark.oracle.pyoracle import crawl_oracle
    from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
    from spider_go_spark.sources.webgraph import make_seeds

    policy_rows = [
        # (host, delay, max_in_flight, robots, disabled, revisit, cron)
        ("hot.example.test", 0, 4, None, False, None, "5 * * * *"),
        ("h2.example.test", 0, 6, None, False, 3, None),
    ]
    schema = schemas.HOST_POLICY_CRON
    policy_df = spark.createDataFrame(policy_rows, schema)

    seeds_df = make_seeds(spark, 15, N_URLS, N_HOSTS)
    cfg = CrawlConfig(
        workdir=str(tmp_path / "cron"), n_urls=N_URLS, n_hosts=N_HOSTS,
        num_shards=4, max_rounds=MAX_ROUNDS, round_period_s=900,
    )
    engine = CrawlEngine(spark, cfg, policy_df)
    engine.crawl(seeds=seeds_df, max_rounds=MAX_ROUNDS)

    seeds = [(r.url, r.priority) for r in seeds_df.collect()]
    policy = {
        h: {
            "crawl_delay_ms": d, "max_in_flight": m, "robots_txt": r,
            "disabled": x, "revisit_after_rounds": rv, "cron": c,
        }
        for h, d, m, r, x, rv, c in policy_rows
    }
    oracle = crawl_oracle(
        seeds, policy, N_URLS, N_HOSTS, max_rounds=MAX_ROUNDS, round_period_s=900
    )
    got = sorted(
        (r["round"], r["fetch_rank"], r["url_norm"], r["status"])
        for r in engine.fetched_docs.read()
        .select("round", "fetch_rank", "url_norm", "status")
        .collect()
    )
    expect = sorted(
        (d["round"], d["fetch_rank"], d["url_norm"], d["status"])
        for d in oracle.fetched
    )
    assert got == expect
    # the cron host really was refetched, and on the cron cadence: a fetch
    # at round r is refetched at the first round whose time reaches the
    # next minute-5 fire
    refetched = (
        engine.fetched_docs.read()
        .filter(F.col("host") == "hot.example.test")
        .groupBy("url_norm")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert refetched and max(r["n"] for r in refetched) >= 2
