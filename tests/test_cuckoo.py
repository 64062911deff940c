"""Cuckoo-filter seen set: kernel properties, engine equivalence with the
Bloom arm (identical crawl semantics — both compose with the exact
verify), and the forget_urls takedown op on both filter arms."""

import numpy as np
import pytest

from spider_go_spark import schemas
from spider_go_spark.operators.cuckoo import (
    cuckoo_params,
    delete_batch,
    fp_index,
    insert_batch,
    lookup_batch,
    new_table,
)
from spider_go_spark.oracle.pyoracle import crawl_oracle
from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
from spider_go_spark.sources.webgraph import make_seeds


def _urls(n, tag="p"):
    return np.array(
        [f"http://h{i % 7}.example.test/{tag}/{i}" for i in range(n)], dtype=object
    )


def _stash_arr(stash):
    return np.asarray([x for s in stash for x in s], dtype=np.int64)


# --- kernel ------------------------------------------------------------------


def test_no_false_negatives_and_low_fp():
    urls = _urls(20000)
    nb = cuckoo_params(20000, 1)
    table, stash = new_table(nb), []
    fp, i1, i2 = fp_index(urls, nb)
    insert_batch(table, stash, fp, i1, i2)
    assert lookup_batch(table, _stash_arr(stash), fp, i1, i2).all()
    f2, j1, j2 = fp_index(_urls(20000, "q"), nb)
    assert lookup_batch(table, _stash_arr(stash), f2, j1, j2).mean() < 0.01


def test_delete_removes_exactly_the_deleted():
    urls = _urls(8000)
    nb = cuckoo_params(8000, 1)
    table, stash = new_table(nb), []
    fp, i1, i2 = fp_index(urls, nb)
    insert_batch(table, stash, fp, i1, i2)
    n = delete_batch(table, stash, fp[:4000], i1[:4000], i2[:4000])
    assert n == 4000
    st = _stash_arr(stash)
    assert lookup_batch(table, st, fp[4000:], i1[4000:], i2[4000:]).all()
    # deleted mostly gone (residual hits are fp collisions with survivors)
    assert lookup_batch(table, st, fp[:4000], i1[:4000], i2[:4000]).mean() < 0.01


def test_overflow_goes_to_stash_never_dropped():
    table, stash = new_table(4), []  # 16 slots for 64 items
    fp, i1, i2 = fp_index(_urls(64), 4)
    insert_batch(table, stash, fp, i1, i2)
    assert len(stash) == 64 - 16
    assert lookup_batch(table, _stash_arr(stash), fp, i1, i2).all()


def test_sorted_rebuild_is_deterministic():
    urls = _urls(5000)
    nb = cuckoo_params(5000, 1)
    out = []
    for order in (urls, urls[::-1]):
        table, stash = new_table(nb), []
        s = np.sort(order)  # the build path sorts before inserting
        fp, i1, i2 = fp_index(s, nb)
        insert_batch(table, stash, fp, i1, i2)
        out.append((table.tobytes(), tuple(stash)))
    assert out[0] == out[1]


# --- engine ------------------------------------------------------------------

N_URLS, N_HOSTS, ROUNDS = 150, 5, 3


def _fetched(engine):
    return sorted(
        (r["round"], r["fetch_rank"], r["url_norm"], r["status"])
        for r in engine.fetched_docs.read()
        .select("round", "fetch_rank", "url_norm", "status")
        .collect()
    )


def test_cuckoo_crawl_matches_oracle(spark, tmp_path_factory):
    seeds_df = make_seeds(spark, 20, N_URLS, N_HOSTS)
    cfg = CrawlConfig(
        workdir=str(tmp_path_factory.mktemp("ck")),
        n_urls=N_URLS, n_hosts=N_HOSTS, num_shards=4,
        max_rounds=ROUNDS, seen_filter="cuckoo",
    )
    engine = CrawlEngine(spark, cfg)
    engine.crawl(seeds=seeds_df, max_rounds=ROUNDS)
    oracle = crawl_oracle(
        [(r.url, r.priority) for r in seeds_df.collect()],
        {}, N_URLS, N_HOSTS, max_rounds=ROUNDS,
    )
    assert _fetched(engine) == sorted(
        (d["round"], d["fetch_rank"], d["url_norm"], d["status"])
        for d in oracle.fetched
    )
    got = {r.url_norm for r in engine.seen_urls.read().select("url_norm").collect()}
    assert got == oracle.seen


def test_bloom_checkpoint_refuses_cuckoo_resume(spark, tmp_path_factory):
    w = str(tmp_path_factory.mktemp("mix"))
    seeds_df = make_seeds(spark, 10, N_URLS, N_HOSTS)
    base = dict(n_urls=N_URLS, n_hosts=N_HOSTS, num_shards=4, max_rounds=1)
    CrawlEngine(spark, CrawlConfig(workdir=w, **base)).crawl(
        seeds=seeds_df, max_rounds=1
    )
    with pytest.raises(ValueError, match="refusing to resume"):
        CrawlEngine(
            spark, CrawlConfig(workdir=w, seen_filter="cuckoo", **base)
        ).crawl(max_rounds=2)


@pytest.mark.parametrize("filt", ["bloom", "cuckoo"])
def test_forget_urls_allows_refetch(spark, tmp_path_factory, filt):
    w = str(tmp_path_factory.mktemp(f"forget_{filt}"))
    seeds_df = make_seeds(spark, 20, N_URLS, N_HOSTS)
    cfg = CrawlConfig(
        workdir=w, n_urls=N_URLS, n_hosts=N_HOSTS, num_shards=4,
        max_rounds=ROUNDS, seen_filter=filt,
    )
    engine = CrawlEngine(spark, cfg)
    engine.crawl(seeds=seeds_df, max_rounds=ROUNDS)
    before = _fetched(engine)
    victim = before[0][2]
    n_seen_before = engine.seen_urls.read().count()

    m = engine.forget_urls([victim, "http://never.example.test/p/9999"])
    assert m == {"forget_requested": 2, "forget_present": 1}
    # every trace of the victim is gone; nothing else was touched
    assert engine.seen_urls.read().filter(f"url_norm = '{victim}'").count() == 0
    assert engine.seen_urls.read().count() == n_seen_before - 1
    assert engine.fetched_docs.read().filter(f"url_norm = '{victim}'").count() == 0
    assert engine.frontier.read().filter(f"url_norm = '{victim}'").count() == 0

    # resume over the cleaned state: re-seed the victim, it refetches ONCE
    engine2 = CrawlEngine(spark, cfg)
    engine2.add_seeds(
        spark.createDataFrame([(victim, 9.9)], schemas.SEEDS)
    )
    engine2.crawl(max_rounds=ROUNDS + 3)
    refetched = [
        r for r in _fetched(engine2) if r[2] == victim
    ]
    assert len(refetched) == 1 and refetched[0][0] > ROUNDS
    # and the rest of the corpus did NOT refetch
    others_before = {u for _, _, u, _ in before if u != victim}
    others_after = {
        u for rnd, _, u, _ in _fetched(engine2) if u != victim and rnd <= ROUNDS
    }
    assert others_before == others_after
