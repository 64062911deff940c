"""Adaptive revisit (change-detection recrawl): unchanged content doubles a
URL's revisit interval up to the cap, changed content resets it to the policy
base — the freshness-driven schedule of Cho & Garcia-Molina (SIGMOD 2000),
implemented as a pure passthrough comparison (the revisit entry carries
last_hash + interval; no join against the fetched-docs history).

Strict gate: the engine's full fetch log must equal the pure-Python oracle's
under the same adaptive semantics."""

import pytest
from pyspark.sql import functions as F

from spider_go_spark import schemas
from spider_go_spark.oracle.pyoracle import crawl_oracle
from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
from spider_go_spark.sources.webgraph import make_seeds

N_URLS = 100
N_HOSTS = 4
MAX_ROUNDS = 10
BASE_K = 2
CAP = 8
CHANGE_PERIOD = 2  # half the nodes publish new content every 2 rounds

# budgets exceed any host's URL count so refetch gaps equal the revisit
# intervals exactly (no budget-contention delay blurring the assertions)
POLICY_ROWS = [
    ("hot.example.test", 0, 64, None, False, BASE_K),
    ("h1.example.test", 0, 64, None, False, BASE_K),
    ("h2.example.test", 0, 64, None, False, None),  # never revisited
]


@pytest.fixture(scope="module")
def outputs(spark, tmp_path_factory):
    seeds_df = make_seeds(spark, 12, N_URLS, N_HOSTS)
    policy_df = spark.createDataFrame(POLICY_ROWS, schemas.HOST_POLICY)
    cfg = CrawlConfig(
        workdir=str(tmp_path_factory.mktemp("adaptive")),
        n_urls=N_URLS, n_hosts=N_HOSTS, num_shards=4, max_rounds=MAX_ROUNDS,
        adaptive_revisit=True, revisit_max_interval=CAP,
        change_period=CHANGE_PERIOD,
    )
    engine = CrawlEngine(spark, cfg, policy_df)
    engine.crawl(seeds=seeds_df, max_rounds=MAX_ROUNDS)

    seeds = [(r.url, r.priority) for r in seeds_df.collect()]
    policy = {
        h: {
            "crawl_delay_ms": d, "max_in_flight": m, "robots_txt": r,
            "disabled": x, "revisit_after_rounds": rv,
        }
        for h, d, m, r, x, rv in POLICY_ROWS
    }
    oracle = crawl_oracle(
        seeds, policy, N_URLS, N_HOSTS, max_rounds=MAX_ROUNDS,
        adaptive_revisit=True, revisit_max_interval=CAP,
        change_period=CHANGE_PERIOD,
    )
    return engine, oracle


def _fetch_rounds_by_url(engine):
    rows = (
        engine.fetched_docs.read()
        .filter(F.col("status") == "200")
        .select("url_norm", "round", "content_hash")
        .collect()
    )
    per_url: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        per_url.setdefault(r.url_norm, []).append((r.round, r.content_hash))
    return {u: sorted(v) for u, v in per_url.items()}


def test_fetch_ordering_matches_oracle(outputs):
    engine, oracle = outputs
    got = sorted(
        (r["round"], r["fetch_rank"], r["url_norm"], r["status"])
        for r in engine.fetched_docs.read()
        .select("round", "fetch_rank", "url_norm", "status")
        .collect()
    )
    expect = sorted(
        (d["round"], d["fetch_rank"], d["url_norm"], d["status"]) for d in oracle.fetched
    )
    assert got == expect


def test_static_content_interval_doubles(outputs):
    """URLs whose content never changed must show strictly growing refetch
    gaps (base, 2·base, ...); the scenario must actually contain some."""
    engine, _ = outputs
    grew = 0
    for fetches in _fetch_rounds_by_url(engine).values():
        if len(fetches) < 3:
            continue
        hashes = {h for _, h in fetches}
        gaps = [b[0] - a[0] for a, b in zip(fetches, fetches[1:])]
        if len(hashes) == 1:  # content static across every observation
            assert gaps[0] == BASE_K
            for g1, g2 in zip(gaps, gaps[1:]):
                assert g2 == min(g1 * 2, CAP)
            grew += 1
    assert grew > 0


def test_changed_content_resets_interval(outputs):
    """URLs that changed on every observation stay at the base interval."""
    engine, _ = outputs
    reset = 0
    for fetches in _fetch_rounds_by_url(engine).values():
        if len(fetches) < 3:
            continue
        hashes = [h for _, h in fetches]
        gaps = [b[0] - a[0] for a, b in zip(fetches, fetches[1:])]
        if len(set(hashes)) == len(hashes):  # changed every time
            assert all(g == BASE_K for g in gaps)
            reset += 1
    assert reset > 0


def test_revisit_state_carries_change_detection(outputs):
    """Pending revisit entries persist (last_hash, interval) — the state
    that makes detection a passthrough, not a history join."""
    engine, _ = outputs
    pending = engine.revisit.read().collect()
    assert pending
    # permanent-404 URLs never get a 200, so their last_hash stays NULL;
    # every URL that has been successfully fetched must carry one
    fetched_ok = {
        r.url_norm
        for r in engine.fetched_docs.read()
        .filter(F.col("status") == "200")
        .select("url_norm")
        .collect()
    }
    for r in pending:
        assert (r.last_hash is not None) == (r.url_norm in fetched_ok)
        assert BASE_K <= r.interval <= CAP
    assert any(r.interval > BASE_K for r in pending)


def test_no_revisit_host_never_refetched(outputs):
    engine, _ = outputs
    per_url = (
        engine.fetched_docs.read()
        .filter(F.col("host") == "h2.example.test")
        .groupBy("url_norm")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert per_url and all(r.n == 1 for r in per_url)
