"""SURVEY.md §2 operator analogues over the driver's TPC-H-ish testdata.

Each query exercises one operator family the crawl engine is built from,
re-expressed on relational tables so the driver's DuckDB oracle can verify
it value-for-value. The crawl-engine counterpart is named in each docstring
with its reference citation (spider-go, /root/reference).

Float discipline: aggregates over doubles are rounded to 2 decimals on BOTH
sides (summation order differs between engines; unrounded doubles would
hash-mismatch). Exact values (keys, counts, strings, timestamps) are never
rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spider_go_spark.queries import T


# --------------------------------------------------------------------------
# Aggregation (hash agg, partial+final) — SURVEY §2.5
# --------------------------------------------------------------------------
def pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1-shaped groupBy/agg; ≙ per-round fetch metrics
    (groupBy(host).agg(...) — SURVEY §2.5; spider-go has only Mongo
    CountDocuments, storage_workflow_mongodb.go:413-417)."""
    li = T(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                               AS sum_qty,
       round(sum(l_extendedprice), 2)                          AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)       AS sum_disc_price,
       round(avg(l_quantity), 2)                               AS avg_qty,
       count(*)                                                AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Broadcast star join — SURVEY §2.4 (frontier ⋈ host_policy; N+1 lookup fix)
# --------------------------------------------------------------------------
def region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """4-way star join + agg; ≙ message ⋈ action broadcast join
    (workflow.go:87,209) replacing the reference's N+1 point lookups
    (storage_workflow_mongodb.go:283-291). Dims are broadcast explicitly."""
    li = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    n = T(spark, sf, "nation")
    r = T(spark, sf, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


REGION_REVENUE_SQL = """
SELECT r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)                                          AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --------------------------------------------------------------------------
# Top-k — SURVEY §2.7 (TakeOrderedAndProject; priority order of assignments)
# --------------------------------------------------------------------------
def topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-10 by priority with a unique tiebreaker; ≙ the frontier's
    strict total order (NATS FIFO, nats.go:196, made explicit)."""
    o = T(spark, sf, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


TOPK_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Window rank budget cut — SURVEY §2.6 (THE politeness scheduler op)
# --------------------------------------------------------------------------
def politeness_window_cut(spark: SparkSession, sf: str) -> DataFrame:
    """row_number over (partition, order) with a budget filter; ≙
    per-host max_in_flight cut (worker semaphore 10,
    messenger_worker_nats.go:103-106) — same plan shape as
    operators.politeness.budget_cut."""
    e = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        e.withColumn("host_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("host_rank") <= 3)
        .select("user_id", "event_id", "value", "host_rank")
    )


POLITENESS_WINDOW_CUT_SQL = """
SELECT user_id, event_id, value, host_rank
FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS host_rank
  FROM events
) WHERE host_rank <= 3
"""


# --------------------------------------------------------------------------
# Anti join — SURVEY §2.4 (the core dedup op: candidates ∖ seen)
# --------------------------------------------------------------------------
def anti_join_unseen(spark: SparkSession, sf: str) -> DataFrame:
    """left-anti membership test; ≙ Mongo unique-index insert failure =
    already-seen (storage_workflow_mongodb.go:81-119) → operators.seen."""
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


ANTI_JOIN_UNSEEN_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def semi_join_active(spark: SparkSession, sf: str) -> DataFrame:
    """left-semi membership test (positive side of the same op)."""
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders")
    return (
        c.join(o.filter(F.col("o_orderstatus") == "O"), c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


SEMI_JOIN_ACTIVE_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""


# --------------------------------------------------------------------------
# Explode fan-out — SURVEY §2.11 (1 page → N links; fd-order-worker multi-emit)
# --------------------------------------------------------------------------
def token_fanout(spark: SparkSession, sf: str) -> DataFrame:
    """explode(split(text)) → count per token; ≙ link extraction fan-out
    (workflow.go:140-191; cmd/fd-order-worker/main.go:29-52 emits 10 per
    input) — same Generate+HashAggregate plan as round_loop link explode."""
    d = T(spark, sf, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), r"\s+")).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
    )


TOKEN_FANOUT_SQL = r"""
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split_regex(text, '\s+')) AS token FROM documents)
WHERE length(token) > 0
GROUP BY token
HAVING count(*) >= 5
"""


# --------------------------------------------------------------------------
# Set ops — SURVEY §2.8 (unionByName + except for frontier maintenance)
# --------------------------------------------------------------------------
def union_except_set(spark: SparkSession, sf: str) -> DataFrame:
    """(BUILDING ∪ rich) ∖ nation-0 customers, distinct; ≙ new candidates ∪
    carried-over frontier, minus seen."""
    c = T(spark, sf, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    nation0 = c.filter(F.col("c_nationkey") == 0).select("c_custkey")
    return building.union(rich).distinct().exceptAll(nation0.distinct())


UNION_EXCEPT_SET_SQL = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 9000
EXCEPT
SELECT c_custkey FROM customer WHERE c_nationkey = 0
"""


# --------------------------------------------------------------------------
# Rollup — SURVEY §2.5 (absent in reference; needed for metrics rollups)
# --------------------------------------------------------------------------
def rollup_shipping(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


ROLLUP_SHIPPING_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# Analytic window (lag) — SURVEY §2.6 (crawl-delay gating between fetches)
# --------------------------------------------------------------------------
def lag_interevent_gap(spark: SparkSession, sf: str) -> DataFrame:
    """lag() inter-event gap per user; ≙ crawl_delay_ms spacing between
    consecutive fetches of one host (scheduled_offset_ms in politeness).
    Exact micros arithmetic → no float rounding needed: avg = one division
    of exact ints, bit-identical across engines."""
    e = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # testdata ts is TIMESTAMP_NTZ; session tz is pinned UTC so the cast is
    # deterministic
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = e.withColumn("gap_us", us - F.lag(us).over(w))
    return (
        gaps.filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(F.avg("gap_us").alias("avg_gap_us"), F.count(F.lit(1)).alias("n_gaps"))
    )


LAG_INTEREVENT_GAP_SQL = """
SELECT user_id, avg(gap_us) AS avg_gap_us, count(*) AS n_gaps
FROM (
  SELECT user_id,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
                   ts) AS gap_us
  FROM events
) WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Branch routing — SURVEY §2.3 (meta_output labels; control-flow-worker)
# --------------------------------------------------------------------------
def branch_routing(spark: SparkSession, sf: str) -> DataFrame:
    """when/otherwise branch labels + per-branch counts; ≙ meta_output edge
    routing (workflow.go:129,247) and the yes/no condition worker
    (cmd/control-flow-worker/main.go:15-46)."""
    o = T(spark, sf, "orders")
    branch = (
        F.when(F.col("o_totalprice") > 300000, F.lit("high"))
        .when(F.col("o_totalprice") > 100000, F.lit("mid"))
        .otherwise(F.lit("low"))
    )
    return (
        o.withColumn("branch", branch)
        .groupBy("branch", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


BRANCH_ROUTING_SQL = """
SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS branch,
       o_orderstatus,
       count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Pagination — SURVEY §2.7 (ListFlows skip/limit, storage_workflow_mongodb.go:408-460)
# --------------------------------------------------------------------------
def pagination_page3(spark: SparkSession, sf: str) -> DataFrame:
    """orderBy desc + offset + limit; ≙ flow listing page 3 of size 20
    (sort `_id` desc, skip, limit)."""
    o = T(spark, sf, "orders")
    return (
        o.orderBy(F.col("o_orderkey").desc())
        .offset(40)
        .limit(20)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


PAGINATION_PAGE3_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
ORDER BY o_orderkey DESC
LIMIT 20 OFFSET 40
"""


def clamp_page(page: int, page_size: int) -> tuple[int, int]:
    """≙ the REST control plane's pagination clamps
    (/root/reference/pkg/spider/apis/flow.go:108-116): page < 1 → 1;
    page_size outside [1, 100] → the default 20."""
    if page < 1:
        page = 1
    if page_size < 1 or page_size > 100:
        page_size = 20
    return page, page_size


def list_page(df: DataFrame, order, page: int, page_size: int) -> DataFrame:
    """≙ ListFlows (storage_workflow_mongodb.go:408-459): clamp, skip
    (page−1)·size, limit size, sort desc, and attach the total row count
    (the FlowListResponse ``total`` field) — the count aggregate broadcasts
    as a single row, never a second full pass on the client."""
    page, page_size = clamp_page(page, page_size)
    total = df.select(F.count(F.lit(1)).cast("bigint").alias("total"))
    page_rows = df.orderBy(order).offset((page - 1) * page_size).limit(page_size)
    return (
        page_rows.crossJoin(F.broadcast(total))
        .withColumn("page", F.lit(page).cast("bigint"))
        .withColumn("page_size", F.lit(page_size).cast("bigint"))
    )


def pagination_clamped(spark: SparkSession, sf: str) -> DataFrame:
    """Out-of-range pagination inputs (page −3, size 500) clamp to
    (1, 20) exactly as the reference's HTTP layer does, and the response
    carries total/page/page_size like FlowListResponse."""
    o = T(spark, sf, "orders")
    return list_page(
        o.select("o_orderkey", "o_orderstatus", "o_totalprice"),
        F.col("o_orderkey").desc(),
        page=-3,
        page_size=500,
    )


PAGINATION_CLAMPED_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice,
       (SELECT count(*) FROM orders)::BIGINT AS total,
       1::BIGINT AS page, 20::BIGINT AS page_size
FROM orders
ORDER BY o_orderkey DESC
LIMIT 20 OFFSET 0
"""


# --------------------------------------------------------------------------
# Expression mapper — SURVEY §2.9 (ex(): fixed / key / expression modes)
# --------------------------------------------------------------------------
def expr_mapper_projection(spark: SparkSession, sf: str) -> DataFrame:
    """The three mapper modes of workflow.go:347-399 as one projection:
    fixed literal, key passthrough, and expression (string concat +
    arithmetic, mirroring examples/basic '… + _updatedx1' and
    examples/expression arithmetic)."""
    d = T(spark, sf, "documents")
    return d.select(
        F.col("doc_id"),
        F.lit("fixed_value").alias("fixed_col"),
        F.col("source").alias("key_col"),
        F.concat(F.col("source"), F.lit("_updatedx1")).alias("expr_concat"),
        ((F.col("n_chars") + 10) * 2).cast("bigint").alias("expr_arith"),
        F.when(F.col("n_chars") > 200, F.lit("yes")).otherwise(F.lit("no")).alias("expr_bool"),
    )


EXPR_MAPPER_PROJECTION_SQL = """
SELECT doc_id,
       'fixed_value'                                    AS fixed_col,
       source                                           AS key_col,
       source || '_updatedx1'                           AS expr_concat,
       CAST((n_chars + 10) * 2 AS BIGINT)               AS expr_arith,
       CASE WHEN n_chars > 200 THEN 'yes' ELSE 'no' END AS expr_bool
FROM documents
"""


# --------------------------------------------------------------------------
# Full-outer diff join — SURVEY §2.4 (cron config diff, cron-trigger/main.go:94-129)
# --------------------------------------------------------------------------
def config_diff_fullouter(spark: SparkSession, sf: str) -> DataFrame:
    """Old-vs-new snapshot diff with create/update/delete/unchanged
    classification; ≙ the cron trigger's config diff → MERGE INTO shape."""
    e = T(spark, sf, "events")
    t0 = F.lit("2024-01-15").cast("timestamp")
    old = (
        e.filter(F.col("ts") < t0).groupBy("user_id").agg(F.count(F.lit(1)).alias("old_n"))
    )
    new = (
        e.filter(F.col("ts") >= t0).groupBy("user_id").agg(F.count(F.lit(1)).alias("new_n"))
    )
    j = old.join(new, "user_id", "full_outer")
    change = (
        F.when(F.col("old_n").isNull(), F.lit("created"))
        .when(F.col("new_n").isNull(), F.lit("deleted"))
        .when(F.col("old_n") != F.col("new_n"), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select("user_id", "old_n", "new_n", change.alias("change"))


CONFIG_DIFF_FULLOUTER_SQL = """
WITH old AS (
  SELECT user_id, count(*) AS old_n FROM events WHERE ts < TIMESTAMP '2024-01-15' GROUP BY user_id
), new AS (
  SELECT user_id, count(*) AS new_n FROM events WHERE ts >= TIMESTAMP '2024-01-15' GROUP BY user_id
)
SELECT coalesce(old.user_id, new.user_id) AS user_id, old_n, new_n,
       CASE WHEN old_n IS NULL THEN 'created'
            WHEN new_n IS NULL THEN 'deleted'
            WHEN old_n <> new_n THEN 'updated'
            ELSE 'unchanged' END AS change
FROM old FULL OUTER JOIN new ON old.user_id = new.user_id
"""


# --------------------------------------------------------------------------
# Distinct aggregation — SURVEY §2.5
# --------------------------------------------------------------------------
def distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """exact count(distinct) per group; ≙ seen-set cardinality accounting."""
    e = T(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"), F.count(F.lit(1)).alias("n_events")
    )


DISTINCT_USERS_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Tumbling time window — SURVEY §2.10 (round micro-batches; batch twin of
# the Structured Streaming pipeline in spider_go_spark.streaming)
# --------------------------------------------------------------------------
def tumbling_window_counts(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    return (
        e.groupBy(F.window(F.col("ts"), "1 hour").getField("start").alias("bucket_start"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


TUMBLING_WINDOW_COUNTS_SQL = """
SELECT time_bucket(INTERVAL 1 hour, ts) AS bucket_start,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1
"""


QUERIES = {
    "pricing_summary": pricing_summary,
    "region_revenue": region_revenue,
    "topk_orders": topk_orders,
    "politeness_window_cut": politeness_window_cut,
    "anti_join_unseen": anti_join_unseen,
    "semi_join_active": semi_join_active,
    "token_fanout": token_fanout,
    "union_except_set": union_except_set,
    "rollup_shipping": rollup_shipping,
    "lag_interevent_gap": lag_interevent_gap,
    "branch_routing": branch_routing,
    "pagination_page3": pagination_page3,
    "pagination_clamped": pagination_clamped,
    "expr_mapper_projection": expr_mapper_projection,
    "config_diff_fullouter": config_diff_fullouter,
    "distinct_users": distinct_users,
    "tumbling_window_counts": tumbling_window_counts,
}

ORACLES = {
    "pricing_summary": PRICING_SUMMARY_SQL,
    "region_revenue": REGION_REVENUE_SQL,
    "topk_orders": TOPK_ORDERS_SQL,
    "politeness_window_cut": POLITENESS_WINDOW_CUT_SQL,
    "anti_join_unseen": ANTI_JOIN_UNSEEN_SQL,
    "semi_join_active": SEMI_JOIN_ACTIVE_SQL,
    "token_fanout": TOKEN_FANOUT_SQL,
    "union_except_set": UNION_EXCEPT_SET_SQL,
    "rollup_shipping": ROLLUP_SHIPPING_SQL,
    "lag_interevent_gap": LAG_INTEREVENT_GAP_SQL,
    "branch_routing": BRANCH_ROUTING_SQL,
    "pagination_page3": PAGINATION_PAGE3_SQL,
    "pagination_clamped": PAGINATION_CLAMPED_SQL,
    "expr_mapper_projection": EXPR_MAPPER_PROJECTION_SQL,
    "config_diff_fullouter": CONFIG_DIFF_FULLOUTER_SQL,
    "distinct_users": DISTINCT_USERS_SQL,
    "tumbling_window_counts": TUMBLING_WINDOW_COUNTS_SQL,
}
