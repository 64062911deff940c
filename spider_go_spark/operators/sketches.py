"""Cardinality and frequency sketches in engine-reproducible integer
arithmetic: HyperLogLog distinct counting and Count-Min heavy-hitter
estimation.

At 100 TB, exact `count(distinct)` over a high-cardinality key is a full
shuffle of every distinct value; exact per-key frequency for heavy-hitter
detection shuffles the whole key space. Both sketches replace that with
map-side-combinable fixed-size state:

- HLL registers combine with `max` — Spark's partial aggregation runs the
  merge on the map side, so the shuffle carries at most
  `groups x m` register rows regardless of input size.
- CMS cells combine with `sum` — same map-side combine; the sketch is
  `d x w` cells per group, constant in input size.

Everything is int64 arithmetic on the same multiplicative-hash family as
:mod:`spider_go_spark.operators.sampling` (``h(k) = ((k mod P) * A) mod P``,
P = 1e9+7, every intermediate < 2^62), and the final HLL estimate is a
single integer division of precomputed integer constants — so both sketches
are bit-reproducible across engines, partitionings, and runs, and
value-checkable against a DuckDB oracle running the identical SQL
arithmetic (same discipline as the MinHash/SimHash kernels in
:mod:`spider_go_spark.functions.textkernel`).

Reference parity: the reference engine has no sketches (its dedup is the
exact Mongo unique-index membership check,
/root/reference/pkg/spider/storage_workflow_mongodb.go); these are part of
the north-rule training-data surface, where "how many distinct urls/users"
and "which keys are hot" must not cost a key-space shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_P = 1_000_000_007

# HLL geometry: m = 64 registers (p = 6), rank from the low 24 bits of the
# 30-bit hash. Relative error ~ 1.04/sqrt(64) = 13%.
HLL_M = 64
HLL_RANK_BITS = 24
HLL_RANK_CAP = HLL_RANK_BITS + 1  # rho when the rank bits are all zero
# alpha_64 = 0.709; estimate = alpha * m^2 / sum_j 2^(-M_j). With registers
# rescaled to integers R_j = 2^(CAP - M_j), the denominator is the integer
# S = sum_j R_j and estimate = alpha * m^2 * 2^CAP / S. Numerator held as
# the exact integer 709 * 64^2 * 2^25 (with the /1000 for alpha moved into
# the divisor) so the whole estimate is one integer division.
HLL_NUM = 709 * HLL_M * HLL_M * (2 ** HLL_RANK_CAP)  # ~9.74e13 < 2^63

# CMS geometry: d = 4 rows x w = 128 buckets; four odd multipliers from the
# same family as the MinHash permutations.
CMS_W = 128
CMS_AS = (2_654_435_761, 1_866_812_693, 1_111_111_121, 2_971_215_073)


def _h(col: Column, a: int) -> Column:
    return (col % HASH_P) * F.lit(a) % HASH_P


def hll_rho(col: Column) -> Column:
    """HLL rank of an integer key: 1 + index of the lowest set bit of the
    rank field (the hash divided by m), capped at HLL_RANK_CAP for zero.

    Closed form, no higher-order functions: ``w & -w`` isolates the lowest
    set bit and ``length(bin(...))`` is 1 + its index (bin() prints no
    leading zeros) — identical outputs to the oracle's min-over-bits scan
    (unnest(range(25))), and a plain scalar expression tree, so it stays
    inside whole-stage codegen and composes safely under checkpoint/union
    plans (the previous lambda-capturing HOF form hit a Catalyst
    outer-reference binding bug when the sketch column flowed into an
    iterated join+union, as HyperBall does).
    """
    w = _h(col, CMS_AS[0])  # reuse the first multiplier; bucket uses mod m
    rank_field = F.floor(w / F.lit(HLL_M)).cast("long")  # h div m, < 2^24
    lowbit = rank_field.bitwiseAND(-rank_field)
    return (
        F.when(rank_field == 0, F.lit(HLL_RANK_CAP))
        .otherwise(F.length(F.bin(lowbit)))
        .cast("int")
    )


def hll_bucket(col: Column) -> Column:
    """HLL register index in [0, m)."""
    return (_h(col, CMS_AS[0]) % HLL_M).cast("int")


def hll_estimate(df: DataFrame, key: str, group_cols: list[str]) -> DataFrame:
    """Per-group HLL distinct estimate of ``key``.

    Plan shape: one hash aggregation to (group, bucket) -> max(rho) —
    map-side combined, shuffle carries <= groups*64 rows — then a second
    tiny aggregation to the per-group register sum and the integer-division
    estimate. Raw HLL (no small-range linear counting): the estimator is
    documented as-is and mirrored exactly by the oracle.

    Output: group_cols + (hll_est bigint, n_registers_used int).
    """
    k = F.col(key)
    regs = (
        df.select(*group_cols, hll_bucket(k).alias("__b"), hll_rho(k).alias("__rho"))
        .groupBy(*group_cols, "__b")
        .agg(F.max("__rho").alias("__m"))
    )
    # integer register value 2^(CAP - M_j); empty registers contribute 2^CAP
    reg_val = F.expr(f"shiftleft(cast(1 as bigint), {HLL_RANK_CAP} - __m)")
    per_group = regs.groupBy(*group_cols).agg(
        F.sum(reg_val).alias("__s_used"),
        F.count(F.lit(1)).cast("int").alias("n_registers_used"),
    )
    empty = (F.lit(HLL_M) - F.col("n_registers_used")).cast("long") * F.lit(
        2 ** HLL_RANK_CAP
    )
    s_total = F.col("__s_used") + empty
    est = F.expr(f"{HLL_NUM} div (1000 * (__s_used + __empty))")
    return (
        per_group.withColumn("__empty", empty)
        .withColumn("hll_est", est)
        .select(*group_cols, "hll_est", "n_registers_used")
    )


def hll_oracle_sql(table: str, key: str, group_cols: list[str]) -> str:
    """DuckDB twin of :func:`hll_estimate` — identical integer arithmetic."""
    g = ", ".join(group_cols)
    a = CMS_AS[0]
    return f"""
WITH hashed AS (
  SELECT {g},
         ((({key} % {HASH_P}) * {a}) % {HASH_P}) % {HLL_M} AS b,
         ((({key} % {HASH_P}) * {a}) % {HASH_P}) // {HLL_M} AS w
  FROM {table}
), rho AS (
  SELECT {g}, b,
         coalesce(
           (SELECT min(k.k) + 1 FROM (SELECT unnest(range(0, {HLL_RANK_BITS})) AS k) k
            WHERE (w // (1::BIGINT << k.k)) % 2 = 1),
           {HLL_RANK_CAP}) AS rho
  FROM hashed
), regs AS (
  SELECT {g}, b, max(rho) AS m FROM rho GROUP BY {g}, b
), agg AS (
  SELECT {g},
         sum(1::BIGINT << ({HLL_RANK_CAP} - m))::BIGINT AS s_used,
         count(*)::INT AS n_registers_used
  FROM regs GROUP BY {g}
)
SELECT {g},
       {HLL_NUM} // (1000 * (s_used + ({HLL_M} - n_registers_used)::BIGINT * {2 ** HLL_RANK_CAP})) AS hll_est,
       n_registers_used
FROM agg
"""


def hll_pair_intersection(df: DataFrame, key: str, group_col: str) -> DataFrame:
    """Estimated distinct-``key`` overlap between every unordered pair of
    ``group_col`` values, by HLL inclusion-exclusion:
    ``|A ∩ B| ≈ E(A) + E(B) − E(A ∪ B)`` with the union sketch the
    register-wise max of the two groups' registers (HLL unions are exact
    on sketch state — the merged registers equal the registers of the
    merged stream, so E(A ∪ B) carries no extra merge error).

    Plan shape: ONE pass over the data builds per-(group, bucket) max-rho
    registers (map-side combined, shuffle ≤ groups·m rows); everything
    after — the pair fan-out, union-max, and estimates — runs on that
    ≤ groups·m-row aggregate, so cost at 100 TB is the cost of one
    register aggregation regardless of pair count. The exact overlap
    (a distinct self-join) is emitted alongside to document the sketch's
    error in the gate output itself — at scale the exact branch is the
    one you drop. Estimate can undershoot: inclusion-exclusion subtracts
    two ~13%-error estimates, so the result is clamped at 0.

    Output: g_a, g_b, est_a, est_b, est_union, inter_est, exact_overlap.
    """
    k = F.col(key)
    regs = (
        df.select(F.col(group_col).alias("g"), hll_bucket(k).alias("b"), hll_rho(k).alias("r"))
        .groupBy("g", "b")
        .agg(F.max("r").alias("m"))
    )
    reg_val = F.expr(f"shiftleft(cast(1 as bigint), {HLL_RANK_CAP} - m)")
    empty = (F.lit(HLL_M) - F.count(F.lit(1))).cast("long") * F.lit(2 ** HLL_RANK_CAP)
    est_expr = F.expr(f"{HLL_NUM} div (1000 * __s)").alias("e")

    def _estimate(r: DataFrame, keys: list[str]) -> DataFrame:
        return (
            r.groupBy(*keys)
            .agg((F.sum(reg_val) + empty).alias("__s"))
            .select(*keys, est_expr)
        )

    est = _estimate(regs, ["g"])
    groups = regs.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("g_a"))
        .join(groups.select(F.col("g").alias("g_b")), F.col("g_a") < F.col("g_b"))
    )
    union_regs = (
        pairs.join(regs, F.col("g") == F.col("g_a")).select("g_a", "g_b", "b", "m")
        .union(pairs.join(regs, F.col("g") == F.col("g_b")).select("g_a", "g_b", "b", "m"))
        .groupBy("g_a", "g_b", "b")
        .agg(F.max("m").alias("m"))
    )
    est_union = _estimate(union_regs, ["g_a", "g_b"]).withColumnRenamed("e", "est_union")
    members = df.select(F.col(group_col).alias("g"), k.alias("__k")).distinct()
    exact = (
        members.alias("x")
        .join(members.alias("y"),
              (F.col("x.__k") == F.col("y.__k")) & (F.col("x.g") < F.col("y.g")))
        .groupBy(F.col("x.g").alias("g_a"), F.col("y.g").alias("g_b"))
        .agg(F.countDistinct("x.__k").cast("bigint").alias("exact_overlap"))
    )
    return (
        est_union
        .join(est.select(F.col("g").alias("g_a"), F.col("e").alias("est_a")), "g_a")
        .join(est.select(F.col("g").alias("g_b"), F.col("e").alias("est_b")), "g_b")
        .join(exact, ["g_a", "g_b"], "left")
        .select(
            "g_a", "g_b", "est_a", "est_b", "est_union",
            F.greatest(F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0))
            .cast("bigint").alias("inter_est"),
            F.coalesce("exact_overlap", F.lit(0)).cast("bigint").alias("exact_overlap"),
        )
    )


def hll_pair_oracle_sql(table: str, key: str, group_col: str) -> str:
    """DuckDB twin of :func:`hll_pair_intersection` — identical integer
    arithmetic, same register/union/estimate pipeline in SQL."""
    a = CMS_AS[0]
    cap_val = 2 ** HLL_RANK_CAP
    est = (
        f"({HLL_NUM} // (1000 * (sum(1::BIGINT << ({HLL_RANK_CAP} - m))"
        f" + ({HLL_M} - count(*))::BIGINT * {cap_val})))::BIGINT"
    )
    return f"""
WITH hashed AS (
  SELECT {group_col} AS g,
         ((({key} % {HASH_P}) * {a}) % {HASH_P}) % {HLL_M} AS b,
         ((({key} % {HASH_P}) * {a}) % {HASH_P}) // {HLL_M} AS w
  FROM {table}
), rho AS (
  SELECT g, b,
         coalesce(
           (SELECT min(k.k) + 1 FROM (SELECT unnest(range(0, {HLL_RANK_BITS})) AS k) k
            WHERE (w // (1::BIGINT << k.k)) % 2 = 1),
           {HLL_RANK_CAP}) AS rho
  FROM hashed
), regs AS (
  SELECT g, b, max(rho) AS m FROM rho GROUP BY g, b
), est AS (
  SELECT g, {est} AS e FROM regs GROUP BY g
), pairs AS (
  SELECT x.g AS g_a, y.g AS g_b
  FROM (SELECT DISTINCT g FROM regs) x JOIN (SELECT DISTINCT g FROM regs) y
  ON x.g < y.g
), union_regs AS (
  SELECT g_a, g_b, b, max(m) AS m FROM (
    SELECT p.g_a, p.g_b, r.b, r.m FROM pairs p JOIN regs r ON r.g = p.g_a
    UNION ALL
    SELECT p.g_a, p.g_b, r.b, r.m FROM pairs p JOIN regs r ON r.g = p.g_b
  ) GROUP BY g_a, g_b, b
), uest AS (
  SELECT g_a, g_b, {est} AS est_union FROM union_regs GROUP BY g_a, g_b
), members AS (
  SELECT DISTINCT {group_col} AS g, {key} AS k FROM {table}
), exact AS (
  SELECT x.g AS g_a, y.g AS g_b, count(DISTINCT x.k)::BIGINT AS exact_overlap
  FROM members x JOIN members y ON x.k = y.k AND x.g < y.g
  GROUP BY x.g, y.g
)
SELECT u.g_a, u.g_b, ea.e AS est_a, eb.e AS est_b, u.est_union,
       greatest(ea.e + eb.e - u.est_union, 0)::BIGINT AS inter_est,
       coalesce(exact.exact_overlap, 0)::BIGINT AS exact_overlap
FROM uest u
JOIN est ea ON ea.g = u.g_a
JOIN est eb ON eb.g = u.g_b
LEFT JOIN exact ON exact.g_a = u.g_a AND exact.g_b = u.g_b
"""


def cms_bucket(col: Column, row: int) -> Column:
    """Count-Min bucket of an integer key for sketch row ``row``."""
    return (_h(col, CMS_AS[row]) % CMS_W).cast("int")


def cms_estimates(df: DataFrame, key: str, candidates: DataFrame) -> DataFrame:
    """Count-Min frequency estimate for each candidate key.

    Builds the d x w sketch with one map-side-combined aggregation over the
    full input (shuffle carries <= d*w = 512 rows), then probes it with a
    broadcast-joined explode of the candidate set; the estimate is the min
    cell over the d rows. cms_est >= true count always (one-sided error).

    ``candidates`` must have a column named ``key``. Output: key, cms_est.
    """
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(len(CMS_AS))])
    ).alias("__i")
    keyed = df.select(F.col(key)).select(F.col(key), rows)
    bucket = F.element_at(
        F.array(*[cms_bucket(F.col(key), i) for i in range(len(CMS_AS))]),
        F.col("__i") + 1,
    )
    cells = (
        keyed.withColumn("__b", bucket)
        .groupBy("__i", "__b")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    probe = (
        candidates.select(F.col(key))
        .withColumn("__i", F.explode(F.array(*[F.lit(i) for i in range(len(CMS_AS))])))
        .withColumn(
            "__b",
            F.element_at(
                F.array(*[cms_bucket(F.col(key), i) for i in range(len(CMS_AS))]),
                F.col("__i") + 1,
            ),
        )
    )
    return (
        probe.join(cells, ["__i", "__b"])
        .groupBy(key)
        .agg(F.min("__cnt").cast("bigint").alias("cms_est"))
    )


def cms_cells_sql(table: str, key: str) -> str:
    """SQL CTE body producing the (i, b, cnt) sketch cells for the oracle."""
    arms = " UNION ALL ".join(
        f"SELECT {i} AS i, ((({key} % {HASH_P}) * {a}) % {HASH_P}) % {CMS_W} AS b "
        f"FROM {table}"
        for i, a in enumerate(CMS_AS)
    )
    return f"SELECT i, b, count(*)::BIGINT AS cnt FROM ({arms}) GROUP BY i, b"
