"""Physical-plan audits: the optimizations SURVEY.md §4 promises must be
visible in the executed plans (pushdown, pruning, broadcast joins,
whole-stage codegen, no row-at-a-time Python anywhere)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def unpartitioned_windows(plan: str) -> list[str]:
    """Lines of ``plan`` that are WindowExec nodes with NO partition spec
    (Spark's 'moving all data to a single partition' warning case — the
    scale killer the r4 verdict flagged). A partitioned window prints
    ``Window [exprs], [partSpec], [orderSpec]`` (3 top-level bracket
    groups); an unpartitioned ordered one prints only ``[exprs], [order]``
    (2 groups, the last carrying ASC/DESC)."""
    import re

    bad = []
    for line in plan.splitlines():
        m = re.search(r"\bWindow\s+(\[.*)$", line)
        if not m:
            continue
        groups, depth, buf = [], 0, ""
        for ch in m.group(1):
            if ch == "[":
                if depth == 0:
                    buf = ""
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(buf)
            if depth > 0:
                buf += ch
        if len(groups) == 2 and ("ASC" in groups[1] or "DESC" in groups[1]):
            bad.append(line.strip())
    return bad


def test_filter_pushdown_and_column_pruning(spark):
    from spider_go_spark.queries.relational import pricing_summary

    plan = plan_of(pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read join-irrelevant columns
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_star_join_broadcasts_all_dims(spark):
    from spider_go_spark.queries.relational import region_revenue

    plan = plan_of(region_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_topk_uses_take_ordered(spark):
    from spider_go_spark.queries.relational import topk_orders

    assert "TakeOrderedAndProject" in plan_of(topk_orders(spark, SF))


def test_no_batch_eval_python_anywhere(spark):
    """Two full-registry plan audits in one pass (building ~170 plans is
    the expensive part, so both properties share the loop):

    - Row-at-a-time Python UDFs (BatchEvalPython) are forbidden in every
      registered query plan (SURVEY.md §7.4). Arrow stages
      (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) are the only
      sanctioned Python.
    - Unpartitioned ordered windows (WindowExec with no partition spec —
      Spark's 'moving all data to a single partition' case) are forbidden
      in every registered query plan (r4 verdict task #1): a global
      row_number/ntile/running-sum must go through
      operators/ranking.global_rank, histogram pre-bucketing, or a
      broadcast triangular self-join instead."""
    import __spark_entry__ as entry_mod

    for name, fn in entry_mod.queries().items():
        if name.startswith("crawl_"):
            continue  # runs a full engine crawl; covered separately below
        plan = plan_of(fn(spark, SF))
        assert "BatchEvalPython" not in plan, f"per-row Python in {name}"
        bad = unpartitioned_windows(plan)
        assert not bad, f"single-partition window in {name}: {bad}"


def test_crawl_schedule_plan_is_arrow_only(spark):
    """The politeness schedule (with a non-empty policy → robots UDF path)
    uses Arrow, never per-row Python, and broadcasts the policy dim."""
    from spider_go_spark import schemas
    from spider_go_spark.operators.politeness import schedule_round
    from spider_go_spark.sources.webgraph import make_seeds
    from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine

    policy = spark.createDataFrame(
        [("h1.example.test", 100, 3, "User-agent: *\nDisallow: /private", False, None)],
        schemas.HOST_POLICY,
    )
    frontier = spark.createDataFrame(
        [
            ("http://h1.example.test/p/1", "http://h1.example.test/p/1", 1, "h1.example.test", 7, 0, 1.0, None, 0, 0),
        ],
        schemas.FRONTIER,
    )
    plan = plan_of(schedule_round(frontier, policy))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan  # the robots matcher
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_text_kernel_stays_jvm(spark):
    """Higher-order array functions aren't codegen-compatible, but they are
    still JVM expression evaluation — the scan stage is codegen'd ("*(n)")
    and no Python appears anywhere in the kernel plan."""
    from spider_go_spark.queries.textops import token_stats

    plan = plan_of(token_stats(spark, SF))
    assert "*(" in plan  # whole-stage-codegen'd scan stage
    assert "Python" not in plan


def test_explode_fanout_generates(spark):
    from spider_go_spark.queries.relational import token_fanout

    plan = plan_of(token_fanout(spark, SF))
    assert "Generate explode" in plan
    # partial (map-side) aggregation before the shuffle
    assert plan.count("HashAggregate") >= 2


def test_ivf_assignment_is_projection_only(spark):
    """IVF list assignment must be a pure map stage: the per-row nearest-
    centroid argmax is a sort_array over literal-centroid cosine structs —
    never a crossJoin + per-vector Window (that formulation shuffles O(N·C)
    rows at 10^9-vector scale). The only Window left in the whole plan is
    the final per-query top-k rank; the only joins are the centroid-keyed
    candidate equi-join and broadcasts."""
    import re

    from spider_go_spark.queries.vectorops import ann_ivf_topk

    plan = plan_of(ann_ivf_topk(spark, SF))
    # exactly one Window operator (the top-k rank; WindowGroupLimit rows are
    # the pushed-down partial/final limit of that same window, not extras)
    assert len(re.findall(r"\bWindow \[", plan)) == 1, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_temporal_joins_are_linear_plans(spark):
    """The as-of join must be ONE exchange + window (no join operator at
    all); the bounded range join must be a hash equi-join on
    (key, bucket) — never a nested-loop/cartesian range scan."""
    import re

    from spider_go_spark.queries.temporal import asof_last_click, range_click_error_pairs

    asof_plan = plan_of(asof_last_click(spark, SF))
    assert "Join" not in asof_plan  # union + running window, no join
    assert len(re.findall(r"\bWindow \[", asof_plan)) == 1

    range_plan = plan_of(range_click_error_pairs(spark, SF))
    assert "CartesianProduct" not in range_plan
    assert "BroadcastNestedLoopJoin" not in range_plan
    assert ("SortMergeJoin" in range_plan) or ("HashJoin" in range_plan)


def test_pagination_clamps(spark):
    """≙ the REST layer's ListFlows clamps (apis/flow.go:108-116)."""
    from spider_go_spark.queries.relational import clamp_page, list_page

    assert clamp_page(-3, 500) == (1, 20)
    assert clamp_page(0, 0) == (1, 20)
    assert clamp_page(2, 100) == (2, 100)
    assert clamp_page(2, 101) == (2, 20)
    assert clamp_page(7, 1) == (7, 1)

    df = spark.range(50).withColumnRenamed("id", "k")
    page = list_page(df, F.col("k").desc(), page=2, page_size=10).collect()
    assert [r.k for r in page] == list(range(39, 29, -1))
    assert all(r.total == 50 and r.page == 2 and r.page_size == 10 for r in page)


def test_kmeans_assignment_no_window(spark):
    """The Lloyd-step cluster assignment must be broadcast-centroids +
    struct-min hash agg — never a per-vector Window rank (the O(N·C)-row
    shuffle the IVF audit above also forbids). Windows allowed: zero."""
    from spider_go_spark.queries.vectorops import kmeans_step

    plan = plan_of(kmeans_step(spark, SF))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan
    # centroid side is broadcast (K rows), never shuffled against N vectors
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_bpe_and_source_stats_plan_shapes(spark):
    """bpe_token_count is a pure projection (no exchange at all);
    corpus_source_stats is one partial+final hash agg pair per branch with
    the scalar total broadcast back."""
    from spider_go_spark.queries.pipelineops import corpus_source_stats
    from spider_go_spark.queries.textops import bpe_token_count

    bpe_plan = plan_of(bpe_token_count(spark, SF))
    assert "Exchange" not in bpe_plan, bpe_plan
    assert "*(1)" in bpe_plan  # whole-stage-codegen'd single stage

    stats_plan = plan_of(corpus_source_stats(spark, SF))
    assert "partial_" in stats_plan.lower() or "HashAggregate" in stats_plan
    assert "BroadcastNestedLoopJoin" in stats_plan or "BroadcastExchange" in stats_plan


def test_unpartitioned_window_detector_fires(spark):
    """The audit above is only meaningful if the detector actually flags
    the bad shape: build one unpartitioned and one partitioned window and
    check the classifier on their real executed plans."""
    from pyspark.sql import Window

    df = spark.range(10).select(F.col("id").alias("a"), (F.col("id") % 2).alias("b"))
    bad_plan = plan_of(df.withColumn("r", F.row_number().over(Window.orderBy("a"))))
    good_plan = plan_of(
        df.withColumn("r", F.row_number().over(Window.partitionBy("b").orderBy("a")))
    )
    assert unpartitioned_windows(bad_plan), bad_plan
    assert not unpartitioned_windows(good_plan), good_plan
