"""Temporal joins over the ``events`` table: as-of (backward) join and
bounded range join — operators the reference engine lacks entirely
(SURVEY.md §2.12) but that every event-log analysis on top of a crawl
needs. Both use single-shuffle linear plans (see operators/asof.py for the
scale argument); both are value-exact against DuckDB (native ASOF JOIN /
interval join as the oracle — a genuinely independent implementation).

Timestamp arithmetic is done in integer microseconds (``unix_micros`` /
``epoch_us``) so gaps are exact BIGINTs, never float seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_go_spark.operators.asof import asof_join_backward, range_join_buckets
from spider_go_spark.queries import T

RANGE_GAP_US = 1800 * 1_000_000  # 30 minutes


def _us(col: str):
    """Epoch microseconds of a (naive) event timestamp. The testdata
    parquet stores TIMESTAMP_NTZ; the engine session is pinned to UTC, so
    casting NTZ → TIMESTAMP interprets the naive value as UTC — exactly
    what DuckDB's ``epoch_us`` does with its (naive) TIMESTAMP type."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def asof_last_click(spark: SparkSession, sf: str) -> DataFrame:
    """For every error event: the latest click by the same user at or
    before the error (NULL when none), plus the exact gap in microseconds.
    ≙ "state of X as of this event" — the reference answers this with a
    per-message Mongo point-read (storage_workflow_mongodb.go:213-222);
    here it is one distributed window pass."""
    ev = T(spark, sf, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_event_id")
    )
    out = asof_join_backward(
        errors,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_payload=["click_event_id"],
        prefix="",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "click_event_id",
        "click_ts",
        (_us("ts") - _us("click_ts")).alias("gap_us"),
    )


ASOF_LAST_CLICK_SQL = """
SELECT e.event_id, e.user_id, e.ts,
       c.event_id AS click_event_id, c.ts AS click_ts,
       epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts >= c.ts
"""


def range_click_error_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """All (click, error) pairs of the same user with the error at most 30
    minutes after the click — a bounded-interval range join, executed as a
    time-bucketed equi-join (each pair generated exactly once; see
    operators/asof.range_join_buckets for why this survives hot keys)."""
    ev = T(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        _us("ts").alias("click_us"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_event_id"),
        "user_id",
        _us("ts").alias("error_us"),
    )
    pairs = range_join_buckets(
        clicks,
        errors,
        on=["user_id"],
        left_us="click_us",
        right_us="error_us",
        max_gap_us=RANGE_GAP_US,
    )
    return pairs.select(
        "click_event_id",
        "error_event_id",
        "user_id",
        (F.col("error_us") - F.col("click_us")).alias("gap_us"),
    )


RANGE_CLICK_ERROR_PAIRS_SQL = f"""
SELECT c.event_id AS click_event_id, e.event_id AS error_event_id,
       c.user_id, epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON c.user_id = e.user_id
 AND epoch_us(e.ts) >= epoch_us(c.ts)
 AND epoch_us(e.ts) - epoch_us(c.ts) <= {RANGE_GAP_US}
"""


WEEK_US = 7 * 86400 * 1_000_000  # integer week id = epoch_us div WEEK_US


def retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly retention cohort matrix over the event log: users are
    cohorted by their first-activity week; each (cohort_week,
    offset_weeks) cell counts the cohort's users still active that many
    weeks later, with retention in exact integer per-mille. Weeks are
    ``epoch_us div WEEK_US`` — pure integer bucketing, engine-neutral,
    no calendar/timezone semantics to drift.

    Scale shape: one distinct on (user, week) — the natural-key shuffle —
    then a groupBy(user) for cohorts whose join back to activity is
    co-partitioned on user_id; the cell aggregation and the offset-0 size
    join run on the tiny (cohorts × offsets) aggregate."""
    ev = T(spark, sf, "events")
    uw = ev.select(
        "user_id", (_us("ts") / WEEK_US).cast("long").alias("week")
    ).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cells = (
        uw.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("offset_weeks"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )
    size = cells.filter(F.col("offset_weeks") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return cells.join(size, "cohort_week").select(
        "cohort_week",
        "offset_weeks",
        "n_active",
        "cohort_size",
        (F.lit(1000) * F.col("n_active") / F.col("cohort_size")).cast("bigint")
        .alias("retention_pm"),
    )


RETENTION_COHORTS_SQL = f"""
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {WEEK_US} AS week FROM events
), cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id
), cells AS (
  SELECT c.cohort_week, (uw.week - c.cohort_week) AS offset_weeks,
         count(DISTINCT uw.user_id)::BIGINT AS n_active
  FROM uw JOIN cohort c USING (user_id)
  GROUP BY 1, 2
)
SELECT cells.cohort_week, cells.offset_weeks, cells.n_active,
       s.n_active AS cohort_size,
       (1000 * cells.n_active // s.n_active)::BIGINT AS retention_pm
FROM cells JOIN cells s
  ON s.cohort_week = cells.cohort_week AND s.offset_weeks = 0
"""


def scd2_event_type_history(spark: SparkSession, sf: str) -> DataFrame:
    """(user_id, event_type, valid_from_us, valid_to_us, n_events,
    is_current) — a slowly-changing-dimension type-2 history built from
    the raw event log: per user, consecutive runs of the same event_type
    collapse into one validity interval; ``valid_to_us`` is the start of
    the next run (NULL on the open current run). This is the standard
    change-log → dimension-history build (the reference's Mongo documents
    are version-stamped in place, storage_workflow_mongodb.go — an SCD2
    table is the lakehouse twin that preserves every version).

    Gaps-and-islands with a deterministic (ts, event_id) tie-break; runs
    are numbered by a running sum over the change flag. Scale shape
    (10^10 events): every window partitions by user_id — per-user
    partitions sort locally after one hash shuffle, nothing global; a
    skewed mega-user is the politeness salting case
    (operators/politeness.py)."""
    from pyspark.sql.window import Window

    ev = T(spark, sf, "events").select(
        "user_id", "event_id", "event_type", _us("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    chg = (
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type"))
    ).cast("long")
    runs = ev.withColumn(
        "run_id",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    grp = runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("event_type"),
        F.min("us").alias("valid_from_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    # equal-ts events can start two runs at the same microsecond; run_id is
    # monotone in the (us, event_id) order, so it is the deterministic tie-break
    w2 = Window.partitionBy("user_id").orderBy("valid_from_us", "run_id")
    return grp.select(
        "user_id",
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(w2).alias("valid_to_us"),
        "n_events",
        F.lead("valid_from_us").over(w2).isNull().alias("is_current"),
    )


SCD2_EVENT_TYPE_HISTORY_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
), flagged AS (
  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
                   OR lag(event_type) OVER w <> event_type
            THEN 1 ELSE 0 END AS chg
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), runs AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged
), grp AS (
  SELECT user_id, run_id, min(event_type) AS event_type,
         min(us) AS valid_from_us, count(*)::BIGINT AS n_events
  FROM runs GROUP BY user_id, run_id
)
SELECT user_id, event_type, valid_from_us,
       lead(valid_from_us) OVER w2 AS valid_to_us, n_events,
       (lead(valid_from_us) OVER w2 IS NULL) AS is_current
FROM grp WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from_us, run_id)
"""


QUERIES = {
    "asof_last_click": asof_last_click,
    "range_click_error_pairs": range_click_error_pairs,
    "retention_cohorts": retention_cohorts,
    "scd2_event_type_history": scd2_event_type_history,
}

ORACLES = {
    "asof_last_click": ASOF_LAST_CLICK_SQL,
    "range_click_error_pairs": RANGE_CLICK_ERROR_PAIRS_SQL,
    "retention_cohorts": RETENTION_COHORTS_SQL,
    "scd2_event_type_history": SCD2_EVENT_TYPE_HISTORY_SQL,
}
