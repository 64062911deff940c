"""Incremental inverted index (plans/index_build.py): per-round postings
through the docs_sink contract must equal a full rebuild; redelivery is
idempotent; search reads only the query terms' buckets (partition pruning
audited in the plan) and its exact integer tf·idf matches a pure-Python
replay over the full postings."""

import re
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from spider_go_spark.functions.intmath import int_log2_q20
from spider_go_spark.plans.index_build import IncrementalIndexer, _poly
from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
from spider_go_spark.sources.webgraph import make_seeds


@pytest.fixture(scope="module")
def indexed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("idx")
    cfg = CrawlConfig(
        workdir=str(root / "crawl"), n_urls=150, n_hosts=5, num_shards=4,
        max_rounds=3,
    )
    indexer = IncrementalIndexer(spark, str(root / "index"), n_buckets=8)
    eng = CrawlEngine(spark, cfg, docs_sink=indexer.sink())
    eng.crawl(seeds=make_seeds(spark, 20, 150, 5))
    return spark, cfg, eng, indexer


def _expected_postings(spark, eng, cfg):
    from spider_go_spark.functions.spans import assembled_col

    docs = eng.fetched_docs.read().filter(F.col("crawl_id") == cfg.crawl_id)
    rows = docs.select(
        "round", "fetch_rank", assembled_col("spans").alias("text")
    ).collect()
    post = {}
    dls = {}
    for r in rows:
        key = (r["round"] << 32) + r["fetch_rank"]
        toks = [t for t in re.split(r"\s+", r["text"]) if t]
        dls[key] = len(toks)
        for h, tf in Counter(_poly(t) for t in toks).items():
            post[(h, key)] = tf
    return post, dls


def test_incremental_equals_full_rebuild(indexed):
    spark, cfg, eng, indexer = indexed
    expect, dls = _expected_postings(spark, eng, cfg)
    got = {
        (r["term_h"], r["doc_key"]): (r["tf"], r["dl"], r["bucket"], r["round"])
        for r in indexer.postings().collect()
    }
    assert {k: v[0] for k, v in got.items()} == expect
    for (h, key), (tf, dl, bucket, rnd) in got.items():
        assert dl == dls[key]
        assert bucket == h % indexer.n_buckets
        assert rnd == key >> 32
    # stats count docs visible to retrieval (≥ 1 token)
    n_docs, total_dl = indexer.corpus_stats()
    assert n_docs == sum(1 for v in dls.values() if v > 0)
    assert total_dl == sum(dls.values())


def test_redelivery_is_idempotent(indexed):
    spark, cfg, eng, indexer = indexed
    docs = eng.fetched_docs.read().filter(
        (F.col("crawl_id") == cfg.crawl_id) & (F.col("round") == 1)
    )
    before = indexer.postings().count()
    indexer.update(1, docs)  # simulated crash-replay redelivery
    assert indexer.postings().count() == before


def test_search_matches_python_and_prunes(indexed):
    spark, cfg, eng, indexer = indexed
    expect_post, dls = _expected_postings(spark, eng, cfg)
    # pick two real tokens from the corpus
    by_term = defaultdict(dict)
    for (h, key), tf in expect_post.items():
        by_term[h][key] = tf
    freq = sorted(by_term, key=lambda h: (-len(by_term[h]), h))
    terms_h = [freq[0], freq[len(freq) // 2]]
    # map hashes back to actual token strings via one doc's text
    from spider_go_spark.functions.spans import assembled_col

    texts = eng.fetched_docs.read().filter(F.col("crawl_id") == cfg.crawl_id) \
        .select(assembled_col("spans").alias("text")).collect()
    tok2h = {}
    for r in texts:
        for t in re.split(r"\s+", r["text"]):
            if t:
                tok2h.setdefault(_poly(t), t)
    terms = [tok2h[h] for h in terms_h]

    n_docs = sum(1 for v in dls.values() if v > 0)  # the engine's N
    df_by_h = {h: len(by_term[h]) for h in terms_h}
    scores = defaultdict(lambda: [0, 0])
    for h in terms_h:
        idf = int_log2_q20(2 * n_docs, df_by_h[h])
        for key, tf in by_term[h].items():
            scores[key][0] += 1
            scores[key][1] += tf * idf
    expect = sorted(
        ((key, n, s) for key, (n, s) in scores.items()),
        key=lambda t: (-t[2], t[0]),
    )[:10]

    res = indexer.search(terms, k=10)
    got = [(r["doc_key"], r["n_hit_terms"], r["score_u"]) for r in res.collect()]
    assert got == expect

    # pruning audit: every postings FileScan carries a PartitionFilters
    # bucket IN (...) with exactly the query terms' buckets — the scan
    # lists only those directories at any index size
    plan = res._jdf.queryExecution().executedPlan().toString()
    want = sorted({h % indexer.n_buckets for h in terms_h})
    pf = re.findall(r"PartitionFilters: \[bucket#\d+ IN \(([\d,]+)\)\]", plan)
    assert pf, plan
    for grp in pf:
        assert sorted(int(x) for x in grp.split(",")) == want


def test_delete_docs_partition_scoped(indexed):
    # LAST test in the module: mutates the shared index fixture
    spark, cfg, eng, indexer = indexed
    import os

    expect_before, dls = _expected_postings(spark, eng, cfg)
    keys = sorted(dls)
    victims = [k for k in keys if k >> 32 == 1][:3] + [k for k in keys if k >> 32 == 2][:1]
    assert len(victims) == 4
    untouched_rounds = sorted({k >> 32 for k in keys} - {1, 2})
    snap = {}
    for rnd in untouched_rounds:
        rd = os.path.join(indexer.index_dir, f"round={rnd}")
        snap[rnd] = {
            os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
            for dp, _, fs in os.walk(rd) for f in fs
        }

    indexer.delete_docs(victims)

    got = {
        (r["term_h"], r["doc_key"]): r["tf"] for r in indexer.postings().collect()
    }
    expect = {k: v for k, v in expect_before.items() if k[1] not in set(victims)}
    assert got == expect
    # untouched rounds: identical files on disk, not rewritten equivalents
    for rnd in untouched_rounds:
        rd = os.path.join(indexer.index_dir, f"round={rnd}")
        now = {
            os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
            for dp, _, fs in os.walk(rd) for f in fs
        }
        assert now == snap[rnd], rnd
    # stats sidecar re-derived from surviving postings
    n_docs, total_dl = indexer.corpus_stats()
    survivors = {k for k in dls if k not in set(victims) and dls[k] > 0}
    assert n_docs == len(survivors)
    assert total_dl == sum(dls[k] for k in survivors)


def test_staging_sweep_recovers_and_cleans(indexed):
    # runs after the delete test (alphabetically later would not hold —
    # pytest runs in file order, and this is below it on purpose)
    spark, cfg, eng, indexer = indexed
    import os
    import shutil

    before = {
        (r["term_h"], r["doc_key"]): r["tf"] for r in indexer.postings().collect()
    }
    rd = os.path.join(indexer.index_dir, "round=2")
    stage = os.path.join(indexer.index_dir, "_staging-round=2")

    # crash after rmtree(rd), before os.replace: only a complete
    # (_SUCCESS-marked) stage remains → sweep must finish the rename
    os.replace(rd, stage)
    assert os.path.isfile(os.path.join(stage, "_SUCCESS"))
    got = {
        (r["term_h"], r["doc_key"]): r["tf"] for r in indexer.postings().collect()
    }
    assert got == before
    assert os.path.isdir(rd) and not os.path.isdir(stage)

    # crash mid-stage-write: incomplete stage (no _SUCCESS) beside a live
    # round dir → sweep deletes the stage, round dir untouched
    os.makedirs(stage)
    with open(os.path.join(stage, "part-00000.parquet"), "wb") as fh:
        fh.write(b"half-written")
    got = {
        (r["term_h"], r["doc_key"]): r["tf"] for r in indexer.postings().collect()
    }
    assert got == before
    assert os.path.isdir(rd) and not os.path.isdir(stage)


def test_stats_selfheal_crash_after_replace(indexed, monkeypatch):
    # ADVICE r4: crash BETWEEN os.replace(tmp, rd) and _write_stats leaves
    # no staging dir at all but a stale stats sidecar. The epoch markers
    # (round=N/_EPOCH vs _stats/round=N/_EPOCH) must flag the mismatch and
    # the next sweep recompute stats from the promoted postings.
    spark, cfg, eng, indexer = indexed

    keys = sorted(r["doc_key"] for r in
                  indexer.postings().select("doc_key").distinct().collect())
    victims = [k for k in keys if k >> 32 == 3][:2]
    assert victims, "fixture must still have round-3 docs"

    def boom(self, rnd, post, epoch=1):
        raise RuntimeError("simulated crash before stats write")

    monkeypatch.setattr(IncrementalIndexer, "_write_stats", boom)
    with pytest.raises(RuntimeError):
        indexer.delete_docs(victims)
    monkeypatch.undo()

    # stats sidecar is now stale (pre-delete). corpus_stats sweeps first,
    # detects the epoch mismatch, and re-derives stats from the postings.
    n_docs, total_dl = indexer.corpus_stats()
    rows = indexer.postings().select("doc_key", "dl").distinct().collect()
    assert {r["doc_key"] for r in rows}.isdisjoint(victims)
    assert n_docs == len(rows)
    assert total_dl == sum(r["dl"] for r in rows)


def test_stats_selfheal_crash_before_replace(indexed, monkeypatch):
    # ADVICE r4: crash AFTER the complete staging write but BEFORE
    # os.replace — sweep promotes the stage; promoted postings differ from
    # the stale stats sidecar, which the same sweep must then recompute.
    import os as _os

    spark, cfg, eng, indexer = indexed
    keys = sorted(r["doc_key"] for r in
                  indexer.postings().select("doc_key").distinct().collect())
    victims = [k for k in keys if k >> 32 == 3][:1]
    assert victims, "fixture must still have round-3 docs"

    real_replace = _os.replace

    def flaky_replace(src, dst):
        if "_staging-round=" in str(src):
            raise RuntimeError("simulated crash before promote")
        return real_replace(src, dst)

    monkeypatch.setattr(_os, "replace", flaky_replace)
    with pytest.raises(RuntimeError):
        indexer.delete_docs(victims)
    monkeypatch.undo()

    rnd = victims[0] >> 32
    stage = _os.path.join(indexer.index_dir, f"_staging-round={rnd}")
    rd = _os.path.join(indexer.index_dir, f"round={rnd}")
    assert _os.path.isdir(stage) and not _os.path.isdir(rd)

    # any entry point recovers: promote + stats recompute in one sweep
    n_docs, total_dl = indexer.corpus_stats()
    assert _os.path.isdir(rd) and not _os.path.isdir(stage)
    rows = indexer.postings().select("doc_key", "dl").distinct().collect()
    assert {r["doc_key"] for r in rows}.isdisjoint(victims)
    assert n_docs == len(rows)
    assert total_dl == sum(r["dl"] for r in rows)
