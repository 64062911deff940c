"""Per-partition fetch-metrics table (north rule: per-partition lineage +
fetch metrics, checkpointed with the round)."""

from pyspark.sql import functions as F

from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
from spider_go_spark.sources.webgraph import make_seeds


def test_fetch_metrics_table(spark, tmp_path):
    cfg = CrawlConfig(
        workdir=str(tmp_path / "crawl"), n_urls=150, n_hosts=5, num_shards=4, max_rounds=3
    )
    eng = CrawlEngine(spark, cfg)
    eng.crawl(seeds=make_seeds(spark, 20, 150, 5))

    m = eng.fetch_metrics.read()
    f = eng.fetched_docs.read()
    # totals reconcile with the fetched table, per round
    got = {r["round"]: (r["nf"], r["nok"]) for r in m.groupBy("round").agg(
        F.sum("n_fetched").alias("nf"), F.sum("n_ok").alias("nok")).collect()}
    want = {r["round"]: (r["nf"], r["nok"]) for r in f.groupBy("round").agg(
        F.count(F.lit(1)).alias("nf"),
        F.count(F.when(F.col("status") == "200", 1)).alias("nok")).collect()}
    assert got == want and got
    # link totals reconcile too
    links_m = m.agg(F.sum("n_links_out")).first()[0]
    links_f = f.agg(F.sum(F.size("out_links"))).first()[0]
    assert links_m == links_f
    # metrics snapshots are part of the checkpoint
    assert "fetch_metrics" in eng._snapshot_ids()
