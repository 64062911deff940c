"""Second batch of SURVEY.md §2 operator analogues: semi-structured (JSON)
extraction, cube, explicit-formula variance, date bucketing, string scalar
functions, and order-stable array aggregation.

Float discipline: variance uses the explicit sum-of-squares formula written
identically on both sides (single divisions of exact aggregates) instead of
each engine's built-in var_samp (different one-pass algorithms ⇒ different
last-ulp doubles ⇒ hash mismatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_go_spark.queries import T


# --------------------------------------------------------------------------
# JSON extraction — SURVEY §2.9 (the reference's payloads are opaque JSON
# strings decoded per message, workflow.go:104-111; here: pushed-down typed
# extraction instead of per-message Unmarshal)
# --------------------------------------------------------------------------
def json_props_extract(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        e.withColumn("k", k)
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


JSON_PROPS_EXTRACT_SQL = """
SELECT event_type, count(*) AS n,
       sum(k)::BIGINT AS sum_k, min(k) AS min_k, max(k) AS max_k
FROM (SELECT event_type, json_extract(props, '$.k')::BIGINT AS k FROM events)
WHERE k IS NOT NULL
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Cube — SURVEY §2.5 (grouping sets family; rollup covered in batch 1)
# --------------------------------------------------------------------------
def cube_order_status(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


CUBE_ORDER_STATUS_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# Variance via explicit formula (bit-stable across engines)
# --------------------------------------------------------------------------
def value_variance(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value")).alias("s1"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    return g.select(
        "event_type", "n", F.round(var, 4).alias("var_value"), F.round(F.col("s1") / F.col("n"), 4).alias("mean_value")
    )


VALUE_VARIANCE_SQL = """
SELECT event_type, n,
       round((s2 - s1 * s1 / n) / (n - 1), 4) AS var_value,
       round(s1 / n, 4) AS mean_value
FROM (
  SELECT event_type, count(*)::BIGINT AS n,
         sum(value) AS s1, sum(value * value) AS s2
  FROM events GROUP BY event_type
)
"""


# --------------------------------------------------------------------------
# Date bucketing — SURVEY §2.9 (no date functions exist in the reference;
# needed for revisit scheduling / crawl_after)
# --------------------------------------------------------------------------
def orders_by_month(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    return (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
    )


ORDERS_BY_MONTH_SQL = """
SELECT date_trunc('month', o_orderdate) AS month,
       count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
FROM orders
GROUP BY 1
"""


# --------------------------------------------------------------------------
# String scalar kernel — SURVEY §2.9 (upper/substr/replace/length/trim)
# --------------------------------------------------------------------------
def name_string_kernel(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.col("c_name")).alias("upper_name"),
        F.substring(F.col("c_name"), 1, 8).alias("prefix8"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.length(F.col("c_name")).cast("bigint").alias("name_len"),
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_name")).alias("tagged"),
    )


NAME_STRING_KERNEL_SQL = """
SELECT c_custkey,
       upper(c_name) AS upper_name,
       substring(c_name, 1, 8) AS prefix8,
       replace(c_name, 'Customer', 'Cust') AS replaced,
       length(c_name)::BIGINT AS name_len,
       concat_ws('|', c_mktsegment, c_name) AS tagged
FROM customer
"""


# --------------------------------------------------------------------------
# Order-stable array aggregation — SURVEY §2.8/§2.9 (lineage paths are
# ordered arrays; order must be explicit, never engine-implicit)
# --------------------------------------------------------------------------
def top_balances_per_nation(spark: SparkSession, sf: str) -> DataFrame:
    # The array is serialized to a scalar string (comma-joined, fixed 2-dp
    # decimal rendering identical in Spark and DuckDB) so the driver's
    # canonicalizer can sort/hash the cell — raw array<double> cells are
    # unhashable in its pandas sort. Ties among equal balances are
    # interchangeable, so the DESC sort is deterministic in value.
    c = T(spark, sf, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.sort_array(F.collect_list("c_acctbal"), asc=False).alias("bals"))
        .select(
            F.col("c_nationkey").cast("bigint").alias("nationkey"),
            F.array_join(
                F.transform(
                    F.slice(F.col("bals"), 1, 5),
                    lambda x: x.cast("decimal(12,2)").cast("string"),
                ),
                ",",
            ).alias("top5_bal"),
            F.size(F.col("bals")).cast("bigint").alias("n_customers"),
        )
    )


TOP_BALANCES_PER_NATION_SQL = """
SELECT c_nationkey::BIGINT AS nationkey,
       array_to_string(
         list_transform((list_sort(list(c_acctbal), 'DESC'))[1:5],
                        x -> (x::DECIMAL(12,2))::VARCHAR),
         ',') AS top5_bal,
       count(*)::BIGINT AS n_customers
FROM customer
GROUP BY c_nationkey
"""


# --------------------------------------------------------------------------
# Session windows — SURVEY §2.6/§2.10 (absent in reference; the event-time
# session primitive for revisit/visit analysis). Oracle via gaps-and-islands.
# --------------------------------------------------------------------------
def session_counts(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    w = F.session_window(F.col("ts").cast("timestamp"), "30 minutes")
    return (
        e.groupBy("user_id", w.alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


SESSION_COUNTS_SQL = """
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 minutes
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), islands AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id, min(ts) AS session_start,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM islands
GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------------
# Exact percentiles — SURVEY §2.5 (exact sort-based aggregate; both engines
# use the same (n−1)·p linear interpolation, verified bit-exact)
# --------------------------------------------------------------------------
def value_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("p25"),
        F.percentile("value", F.lit(0.5)).alias("median"),
        F.percentile("value", F.lit(0.75)).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )


VALUE_PERCENTILES_SQL = """
SELECT event_type,
       quantile_cont(value, 0.25) AS p25,
       quantile_cont(value, 0.5)  AS median,
       quantile_cont(value, 0.75) AS p75,
       count(*) AS n
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
def length_deciles(spark: SparkSession, sf: str) -> DataFrame:
    """NTILE length-binning over the corpus — the export-sharding shape a
    training pipeline uses to build similar-sized document buckets: decile
    by (n_chars, doc_id) total order, then per-decile row count, char
    bounds, and char mass.

    Scale shape (the histogram pre-bucketing path, shipped as THE plan):
    a naive NTILE over a global order is a single-partition sort of the
    whole corpus. But every output statistic (n_docs, min/max/total chars
    per decile) depends only on the MULTISET of lengths in each decile —
    tied docs all share the same n_chars, so the doc_id tie-break decides
    WHICH docs straddle a boundary but never changes any per-decile
    number. The exact result therefore derives from the length histogram
    alone: one map-side-combining hash agg over n_chars (the corpus scan,
    fully distributed, zero row-level shuffle), then a driver-side prefix
    walk over |distinct lengths| rows (bounded by max document length —
    ~10^6 even at web scale, vs 10^10 docs) that splits histogram buckets
    across NTILE's floor/ceil decile sizes. The NTILE formulation stays as
    the DuckDB oracle, pinning the semantics this derivation must match."""
    d = T(spark, sf, "documents")
    hist = sorted(
        (int(r["n_chars"]), int(r["cnt"]))
        for r in d.groupBy("n_chars")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()  # bounded: one row per DISTINCT length, not per doc
    )
    n = sum(c for _, c in hist)
    base, extra = divmod(n, 10)
    out_rows = []
    it = iter(hist)
    cur_len, cur_cnt = next(it, (None, 0))
    for k in range(1, 11):
        size = base + (1 if k <= extra else 0)  # NTILE bucket size
        if size == 0:
            continue
        need, n_docs, mn, mx, tot = size, 0, None, None, 0
        while need > 0:
            take = min(need, cur_cnt)
            if take > 0:
                n_docs += take
                tot += take * cur_len
                mn = cur_len if mn is None else min(mn, cur_len)
                mx = cur_len if mx is None else max(mx, cur_len)
                cur_cnt -= take
                need -= take
            if cur_cnt == 0:
                cur_len, cur_cnt = next(it, (None, 0))
                if cur_len is None and need > 0:
                    raise AssertionError("histogram exhausted early")
        out_rows.append((k, n_docs, mn, mx, tot))
    return spark.createDataFrame(
        out_rows,
        "decile int, n_docs bigint, min_chars bigint, "
        "max_chars bigint, total_chars bigint",
    )


LENGTH_DECILES_SQL = """
SELECT decile,
       count(*)::BIGINT AS n_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       sum(n_chars)::BIGINT AS total_chars
FROM (
  SELECT doc_id, n_chars,
         ntile(10) OVER (ORDER BY n_chars ASC, doc_id ASC) AS decile
  FROM documents
)
GROUP BY decile
"""


# --------------------------------------------------------------------------
def moving_value_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit window-FRAME aggregate (ROWS BETWEEN 3 PRECEDING AND
    CURRENT ROW): per user, the 4-event moving sum/avg of the event value in
    integer fixed-point (floor(value·10^6) — value-exact cross-engine; the
    events table's values are non-negative so integer div ≡ floor div on
    both engines). Completes the window family next to the analytic (lag),
    ranking (row_number/ntile) and session-window queries.

    Scale shape: one hash-partition shuffle on user_id + per-partition sort
    — the same single-exchange shape as lag_interevent_gap; the frame is
    bounded (4 rows) so the running state is O(1) per row."""
    from pyspark.sql import Window

    e = T(spark, sf, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * F.lit(1_000_000.0)).cast("long").alias("vq"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-3, Window.currentRow)
    )
    out = e.select(
        "event_id",
        "user_id",
        F.sum("vq").over(w).alias("mov_sum_q"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("mov_n"),
    )
    return out.withColumn("mov_avg_q", F.expr("mov_sum_q div mov_n").cast("bigint"))


MOVING_VALUE_AVG_SQL = """
SELECT event_id, user_id, mov_sum_q, mov_n,
       (mov_sum_q // mov_n)::BIGINT AS mov_avg_q
FROM (
  SELECT event_id, user_id,
         (sum(vq) OVER w)::BIGINT AS mov_sum_q,
         (count(*) OVER w)::BIGINT AS mov_n
  FROM (SELECT event_id, user_id, ts,
               floor(value * 1000000.0)::BIGINT AS vq FROM events)
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
)
"""


QUERIES = {
    "session_counts": session_counts,
    "value_percentiles": value_percentiles,
    "json_props_extract": json_props_extract,
    "cube_order_status": cube_order_status,
    "value_variance": value_variance,
    "orders_by_month": orders_by_month,
    "name_string_kernel": name_string_kernel,
    "top_balances_per_nation": top_balances_per_nation,
    "length_deciles": length_deciles,
    "moving_value_avg": moving_value_avg,
}

ORACLES = {
    "session_counts": SESSION_COUNTS_SQL,
    "value_percentiles": VALUE_PERCENTILES_SQL,
    "json_props_extract": JSON_PROPS_EXTRACT_SQL,
    "cube_order_status": CUBE_ORDER_STATUS_SQL,
    "value_variance": VALUE_VARIANCE_SQL,
    "orders_by_month": ORDERS_BY_MONTH_SQL,
    "name_string_kernel": NAME_STRING_KERNEL_SQL,
    "top_balances_per_nation": TOP_BALANCES_PER_NATION_SQL,
    "length_deciles": LENGTH_DECILES_SQL,
    "moving_value_avg": MOVING_VALUE_AVG_SQL,
}
