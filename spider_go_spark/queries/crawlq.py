"""Crawl-engine end-to-end queries (rows-only checks).

These drive the actual frontier/politeness/seen/fetch machinery, which is
not expressible in ANSI SQL (multi-round iterative state) — the driver
records rows-only checks here; the pytest oracle-replay suite
(tests/test_crawl_vs_oracle.py) is the strict correctness gate for these
semantics, asserting ordering + seen-set equality against a pure-Python
simulator of spider-go's scheduler.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


_CRAWL_ENGINE = None  # per-process memo: both crawl gate queries read the
# SAME committed 3-round crawl (the crawl is deterministic, so splitting it
# per query only doubled the gate's cost — the driver's capped pass was
# spending >60 s on these two rows-only checks alone)


def _shared_crawl(spark: SparkSession):
    global _CRAWL_ENGINE
    if _CRAWL_ENGINE is not None:
        return _CRAWL_ENGINE
    from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
    from spider_go_spark.sources.webgraph import make_seeds

    workdir = tempfile.mkdtemp(prefix="crawlq-", dir=os.environ.get("TMPDIR", "/tmp"))
    cfg = CrawlConfig(workdir=workdir, n_urls=150, n_hosts=5, num_shards=4, max_rounds=3)
    eng = CrawlEngine(spark, cfg)
    eng.crawl(seeds=make_seeds(spark, 20, cfg.n_urls, cfg.n_hosts))
    _CRAWL_ENGINE = eng
    return eng


def crawl_fetch_ordering(spark: SparkSession, sf: str) -> DataFrame:
    """Full 3-round crawl of the deterministic synthetic graph (150 URLs,
    5 hosts, skewed hot host): returns the fetch log in scheduler order.
    Deterministic across runs/partitionings (tested at local[2] vs
    local[8])."""
    eng = _shared_crawl(spark)
    return (
        eng.fetched_docs.read()
        .select("round", "fetch_rank", "url_norm", "host", "status")
        .orderBy("round", "fetch_rank")
    )


def crawl_frontier_lineage(spark: SparkSession, sf: str) -> DataFrame:
    """Same crawl; returns per-URL lineage (url, parent, discovery round) —
    the reference's session-context accumulation
    (storage_workflow_mongodb.go:751-757) as a table."""
    eng = _shared_crawl(spark)
    return (
        eng.lineage.read()
        .select("url_norm", "parent_hash", "round")
        .orderBy("round", "url_norm")
        .withColumn("parent_hash", F.coalesce(F.col("parent_hash"), F.lit(0)))
    )


def schedule_one_round(spark: SparkSession, sf: str) -> DataFrame:
    """ONE politeness scheduling round over a static frontier, driven
    through the real ``schedule_round`` operator (policy broadcast join +
    disabled filter + crawl-delay budget + salted two-phase window cut +
    per-host offsets) — and value-checked against a plain ANSI-SQL oracle.

    The iterative crawl is not SQL-expressible, but a single round over a
    fixed frontier IS: the salted two-phase cut is provably identical to a
    single per-host window (politeness.py module docstring), so the oracle
    uses the single-window form. Frontier and policy are derived
    deterministically from lineitem/nation; robots bodies are null here
    (robots semantics are covered by the pytest oracle-replay suite)."""
    from spider_go_spark.operators.politeness import schedule_round
    from spider_go_spark.queries import T

    li = T(spark, sf, "lineitem")
    na = T(spark, sf, "nation")
    host = F.concat(
        F.lit("h"), (F.col("l_suppkey") % 25).cast("string"), F.lit(".example.test")
    )
    url = F.concat(
        F.lit("http://"), host, F.lit("/p/"),
        F.col("l_orderkey").cast("string"), F.lit("/"),
        F.col("l_linenumber").cast("string"),
    )
    frontier = li.select(
        url.alias("url_norm"),
        host.alias("host"),
        F.col("l_discount").cast("double").alias("priority"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("long").alias("discovery_rank"),
    ).withColumns(
        {
            "url_hash": F.xxhash64(F.col("url_norm")),  # salt key only — the
            # two-phase cut's output is salt-invariant, so the oracle never
            # needs this value
            "discovered_round": F.lit(0).cast("int"),
        }
    )
    policy = na.filter(F.col("n_nationkey") % 4 != 3).select(
        F.concat(F.lit("h"), F.col("n_nationkey").cast("string"), F.lit(".example.test")).alias("host"),
        (F.col("n_nationkey") * 300).cast("long").alias("crawl_delay_ms"),
        (F.lit(5) + F.col("n_nationkey") % 7).cast("int").alias("max_in_flight"),
        F.lit(None).cast("string").alias("robots_txt"),
        (F.col("n_nationkey") % 5 == 0).alias("disabled"),
    )
    out = schedule_round(frontier, policy, policy_empty=False)
    return out.select(
        "url_norm",
        "host",
        "priority",
        F.col("host_rank").cast("bigint").alias("host_rank"),
        F.col("scheduled_offset_ms").cast("bigint").alias("scheduled_offset_ms"),
    )


SCHEDULE_ONE_ROUND_SQL = """
WITH f AS (
  SELECT 'http://h' || (l_suppkey % 25)::VARCHAR || '.example.test/p/'
           || l_orderkey::VARCHAR || '/' || l_linenumber::VARCHAR AS url_norm,
         'h' || (l_suppkey % 25)::VARCHAR || '.example.test' AS host,
         l_discount::DOUBLE AS priority,
         (l_orderkey * 8 + l_linenumber)::BIGINT AS discovery_rank
  FROM lineitem
), p AS (
  SELECT 'h' || n_nationkey::VARCHAR || '.example.test' AS host,
         (n_nationkey * 300)::BIGINT AS crawl_delay_ms,
         (5 + n_nationkey % 7)::INT AS max_in_flight,
         (n_nationkey % 5 = 0) AS disabled
  FROM nation
  WHERE n_nationkey % 4 <> 3
), j AS (
  SELECT f.*, coalesce(p.crawl_delay_ms, 0) AS delay,
         coalesce(p.max_in_flight, 10) AS mif,
         coalesce(p.disabled, false) AS dis
  FROM f LEFT JOIN p ON f.host = p.host
), e AS (
  SELECT *, CASE WHEN delay > 0
                 THEN least(mif, greatest(1, CAST(trunc(10000.0 / delay) AS INT)))
                 ELSE mif END AS budget
  FROM j WHERE NOT dis
), r AS (
  SELECT *, row_number() OVER (
              PARTITION BY host
              ORDER BY priority DESC, discovery_rank ASC, url_norm ASC
            ) AS host_rank
  FROM e
)
SELECT url_norm, host, priority, host_rank::BIGINT AS host_rank,
       ((host_rank - 1) * delay)::BIGINT AS scheduled_offset_ms
FROM r WHERE host_rank <= budget
"""


def url_trap_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Crawler-trap detection by URL shape — the guard every frontier needs
    before enqueueing extracted links (calendar pages, session-id loops and
    mirror recursion otherwise fill 10^10-URL frontiers with junk). Rules,
    applied in precedence order per URL: ``too_deep`` (path depth > 6),
    ``repeat_loop`` (depth ≥ 4 with ≤ 2 distinct segments — the self-similar
    path signature of a trap), ``too_long`` (> 70 chars), else ``ok``.

    URLs are synthesized deterministically from lineitem (same recipe style
    as schedule_one_round) so the rule arithmetic is value-exact
    cross-engine. Emits (url_norm, depth, n_uniq_segments, url_len,
    verdict).

    Scale shape: pure projection (sequence/transform/array_distinct inside
    codegen, no Python, no shuffle) — at enqueue time this pins at the link
    stream's scan speed."""
    from spider_go_spark.queries import T

    li = T(spark, sf, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    d = (F.lit(1) + F.col("l_orderkey") % 9).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), d - 1),
        lambda i: F.concat(
            F.lit("s"), ((F.col("l_partkey") + i * i) % 3).cast("string")
        ),
    )
    url = F.concat(
        F.lit("http://h"),
        (F.col("l_suppkey") % 25).cast("string"),
        F.lit(".example.test/"),
        F.array_join(segs, "/"),
    )
    base = li.select(
        url.alias("url_norm"),
        d.alias("depth"),
        F.size(F.array_distinct(segs)).alias("n_uniq_segments"),
        F.length(url).cast("bigint").alias("url_len"),
    )
    verdict = (
        F.when(F.col("depth") > 6, F.lit("too_deep"))
        .when(
            (F.col("depth") >= 4) & (F.col("n_uniq_segments") <= 2),
            F.lit("repeat_loop"),
        )
        .when(F.col("url_len") > 70, F.lit("too_long"))
        .otherwise(F.lit("ok"))
    )
    return base.withColumn("verdict", verdict)


URL_TRAP_FILTER_SQL = """
WITH base AS (
  SELECT 'http://h' || (l_suppkey % 25)::VARCHAR || '.example.test/'
           || array_to_string(segs, '/') AS url_norm,
         d AS depth,
         len(list_distinct(segs))::INT AS n_uniq_segments
  FROM (
    SELECT l_suppkey, d,
           list_transform(range(0, d),
             i -> 's' || ((l_partkey + i*i) % 3)::VARCHAR) AS segs
    FROM (
      SELECT l_orderkey, l_partkey, l_suppkey,
             (1 + l_orderkey % 9)::INT AS d
      FROM lineitem WHERE l_orderkey % 3 = 0
    )
  )
)
SELECT url_norm, depth, n_uniq_segments,
       length(url_norm)::BIGINT AS url_len,
       CASE WHEN depth > 6 THEN 'too_deep'
            WHEN depth >= 4 AND n_uniq_segments <= 2 THEN 'repeat_loop'
            WHEN length(url_norm) > 70 THEN 'too_long'
            ELSE 'ok' END AS verdict
FROM base
"""


RERANK_ITERS = 3
RERANK_PART_OFFSET = 1_000_000  # disjoint node-id spaces for the two sides
N_RERANK_HOSTS = 25


def frontier_pagerank_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Authority-weighted frontier re-prioritization: rank hosts by the
    PageRank mass of their nodes in the link graph, then reorder the
    frontier by (host authority, page priority) and take the global
    top-100 — the OPIC/PageRank-ordered scheduling real crawlers use to
    spend fetch budget on authoritative sites first (the reference carries
    only a static per-message priority, SURVEY §2.6; this derives it from
    the graph).

    Scale shape: PageRank is the fixed-point integer operator
    (operators/graph.py — uniform equi-join shuffles, no windows); host
    authority is a tiny agg (≤ n_hosts rows) broadcast back onto the
    frontier (pure map), and the top-100 is a TakeOrderedAndProject —
    no global sort materialization."""
    from spider_go_spark.operators.graph import pagerank_int
    from spider_go_spark.queries import T

    li = T(spark, sf, "lineitem")
    pairs = li.select("l_suppkey", "l_partkey").distinct()
    fwd = pairs.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey") + RERANK_PART_OFFSET).cast("long").alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank_int(edges, RERANK_ITERS)
    host_auth = (
        ranks.filter(F.col("node") < RERANK_PART_OFFSET)
        .groupBy((F.col("node") % N_RERANK_HOSTS).alias("hostid"))
        .agg(F.sum("rank_u").cast("long").alias("authority"))
    )
    frontier = li.select(
        F.concat(
            F.lit("http://h"), (F.col("l_suppkey") % N_RERANK_HOSTS).cast("string"),
            F.lit(".example.test/p/"), F.col("l_orderkey").cast("string"),
            F.lit("/"), F.col("l_linenumber").cast("string"),
        ).alias("url_norm"),
        (F.col("l_suppkey") % N_RERANK_HOSTS).cast("long").alias("hostid"),
        F.col("l_discount").cast("double").alias("priority"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("long").alias("discovery_rank"),
    )
    return (
        frontier.join(F.broadcast(host_auth), "hostid")
        .orderBy(
            F.col("authority").desc(), F.col("priority").desc(),
            "discovery_rank", "url_norm",
        )
        .limit(100)
        .select("url_norm", "hostid", "authority", "priority", "discovery_rank")
    )


def _rerank_sql() -> str:
    from spider_go_spark.operators.graph import pagerank_oracle_sql

    edges_cte = f"""
WITH pairs AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
edges AS (
  SELECT l_suppkey::BIGINT AS src, (l_partkey + {RERANK_PART_OFFSET})::BIGINT AS dst FROM pairs
  UNION ALL
  SELECT (l_partkey + {RERANK_PART_OFFSET})::BIGINT, l_suppkey::BIGINT FROM pairs
)"""
    return (
        pagerank_oracle_sql(edges_cte, RERANK_ITERS)
        + f"""
, host_auth AS (
  SELECT (node % {N_RERANK_HOSTS})::BIGINT AS hostid, sum(rank_u)::BIGINT AS authority
  FROM rank{RERANK_ITERS} WHERE node < {RERANK_PART_OFFSET} GROUP BY 1
), f AS (
  SELECT 'http://h' || (l_suppkey % {N_RERANK_HOSTS})::VARCHAR || '.example.test/p/'
           || l_orderkey::VARCHAR || '/' || l_linenumber::VARCHAR AS url_norm,
         (l_suppkey % {N_RERANK_HOSTS})::BIGINT AS hostid,
         l_discount::DOUBLE AS priority,
         (l_orderkey * 8 + l_linenumber)::BIGINT AS discovery_rank
  FROM lineitem
)
SELECT url_norm, hostid, authority, priority, discovery_rank
FROM f JOIN host_auth USING (hostid)
ORDER BY authority DESC, priority DESC, discovery_rank, url_norm
LIMIT 100
"""
    )


BUDGET_TOTAL = 10_000  # global per-round fetch budget to split across hosts
N_BUDGET_HOSTS = 25
N_BUDGET_PAGES = 200


def crawl_budget_allocation(spark: SparkSession, sf: str) -> DataFrame:
    """Proportional-fair split of a global round budget across hosts by the
    integer largest-remainder method: each host's ideal share is
    B·demand/Σdemand; every host gets the floor, and the leftover
    B − Σfloor units go to the largest fractional remainders (remainder
    compared as the exact integer ``B·demand mod Σdemand`` — no floats
    anywhere, so the allocation is bit-identical on any engine and any
    partitioning). Output: (host, demand, alloc); Σalloc = B exactly.

    This is the budget-setting step that feeds the politeness scheduler's
    per-host cut (operators/politeness.py takes the per-host budget as
    given): hosts with more discovered URLs earn proportionally more of
    the round, with no host starved by rounding.

    Scale shape: demand is one hash agg over distinct URLs; the two global
    scalars (Σdemand, Σfloor) are single-row broadcast joins; the remainder
    ranking runs over |hosts| rows — the host dimension, ~10^7 at web
    scale — through operators/ranking.global_rank (range-repartition +
    per-partition offsets), NOT a global row_number window: an
    unpartitioned WindowExec would drag every host row through ONE
    partition and serialize the round's budget step on a single core.
    global_rank is partition-count independent (tests/test_ranking), so
    the allocation stays bit-identical to the former window form."""
    from spider_go_spark.operators.ranking import global_rank
    from spider_go_spark.queries import T

    li = T(spark, sf, "lineitem")
    urls = li.select(
        F.concat(
            F.lit("http://h"),
            (F.col("l_suppkey") % N_BUDGET_HOSTS).cast("string"),
            F.lit(".example.test/p/"),
            (F.col("l_partkey") % N_BUDGET_PAGES).cast("string"),
        ).alias("url_norm"),
        F.concat(
            F.lit("h"), (F.col("l_suppkey") % N_BUDGET_HOSTS).cast("string")
        ).alias("host"),
    ).distinct()
    demand = urls.groupBy("host").agg(F.count(F.lit(1)).alias("demand"))
    total = demand.agg(F.sum("demand").alias("total"))
    d = demand.join(F.broadcast(total)).select(
        "host",
        "demand",
        F.expr(f"({BUDGET_TOTAL} * demand) div total").alias("base"),
        F.expr(f"({BUDGET_TOTAL} * demand) % total").alias("rem"),
    )
    sum_base = d.agg(F.sum("base").alias("sum_base"))
    ranked = global_rank(
        d.join(F.broadcast(sum_base)),
        [F.desc("rem"), F.asc("host")],
        rank_col="rnk",
    )
    return (
        ranked
        .select(
            "host",
            "demand",
            F.expr(
                f"base + CASE WHEN rnk <= {BUDGET_TOTAL} - sum_base THEN 1 ELSE 0 END"
            ).alias("alloc"),
        )
        .orderBy("host")
    )


CRAWL_BUDGET_ALLOCATION_SQL = f"""
WITH urls AS (
  SELECT DISTINCT
         'http://h' || (l_suppkey % {N_BUDGET_HOSTS})::VARCHAR
           || '.example.test/p/' || (l_partkey % {N_BUDGET_PAGES})::VARCHAR AS url_norm,
         'h' || (l_suppkey % {N_BUDGET_HOSTS})::VARCHAR AS host
  FROM lineitem
), demand AS (
  SELECT host, count(*) AS demand FROM urls GROUP BY host
), d AS (
  SELECT host, demand,
         ({BUDGET_TOTAL} * demand) // (SELECT sum(demand) FROM demand) AS base,
         ({BUDGET_TOTAL} * demand) % (SELECT sum(demand) FROM demand) AS rem
  FROM demand
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, host ASC) AS rnk,
         (SELECT sum(base) FROM d) AS sum_base
  FROM d
)
SELECT host, demand,
       (base + CASE WHEN rnk <= {BUDGET_TOTAL} - sum_base THEN 1 ELSE 0 END)::BIGINT AS alloc
FROM ranked ORDER BY host
"""


def budget_fairness_report(spark: SparkSession, sf: str) -> DataFrame:
    """(metric, n_hosts, sum_x, sum_sq, jain_ppm) — Jain's fairness index
    J = (Σx)² / (n·Σx²) in exact integer ppm, for both the raw per-host
    demand and the proportional-fair allocation it produces
    (crawl_budget_allocation). J = 1 ⇔ perfectly even; 1/n ⇔ one host
    takes everything. This is the per-round dashboard number an operator
    watches to see whether the budget allocator is starving hosts — and
    the allocation's J should exceed the demand's when demand is skewed
    less than the allocator's cap smooths it.

    Scale shape: two single-row aggregates over the |hosts| dimension
    (the demand agg is shared with the allocation op); everything else is
    scalar arithmetic. (Σx)²·10^6 is computed in decimal(38,0) (Spark) /
    HUGEINT (DuckDB) so it can never silently wrap int64 at web-scale
    budgets; all-zero demand (Σx²=0, J undefined 0/0) reports the
    perfectly-even value 10^6 instead of NULL."""
    alloc = crawl_budget_allocation(spark, sf)
    parts = []
    for metric in ("demand", "alloc"):
        parts.append(
            alloc.agg(
                F.lit(metric).alias("metric"),
                F.count(F.lit(1)).cast("bigint").alias("n_hosts"),
                F.sum(metric).cast("bigint").alias("sum_x"),
                F.sum(F.col(metric) * F.col(metric)).cast("bigint").alias("sum_sq"),
            )
        )
    out = parts[0].unionByName(parts[1])
    return out.select(
        "metric",
        "n_hosts",
        "sum_x",
        "sum_sq",
        F.expr(
            "CASE WHEN sum_sq = 0 THEN 1000000 ELSE cast("
            "(cast(sum_x as decimal(38,0)) * sum_x * 1000000)"
            " div (cast(n_hosts as decimal(38,0)) * sum_sq) as bigint) END"
        ).alias("jain_ppm"),
    )


BUDGET_FAIRNESS_REPORT_SQL = f"""
WITH alloc AS ({CRAWL_BUDGET_ALLOCATION_SQL}),
m AS (
  SELECT 'demand' AS metric, count(*)::BIGINT AS n_hosts,
         sum(demand)::BIGINT AS sum_x, sum(demand * demand)::BIGINT AS sum_sq
  FROM alloc
  UNION ALL
  SELECT 'alloc', count(*)::BIGINT, sum(alloc)::BIGINT,
         sum(alloc * alloc)::BIGINT
  FROM alloc
)
SELECT metric, n_hosts, sum_x, sum_sq,
       CASE WHEN sum_sq = 0 THEN 1000000
            ELSE ((sum_x::HUGEINT * sum_x * 1000000)
                  // (n_hosts::HUGEINT * sum_sq))::BIGINT END AS jain_ppm
FROM m
"""


NOVELTY_ROUNDS = 3  # pseudo-rounds: doc_id % NOVELTY_ROUNDS


def round_novelty_report(spark: SparkSession, sf: str) -> DataFrame:
    """(round, n_docs, n_shingles, n_new_shingles, novelty_ppm) — how much
    genuinely NEW content each crawl round fetched: a round's distinct
    3-token shingle hashes that no earlier round produced, as exact ppm of
    its shingle set. The crawl-quality dial every operator watches — a
    collapsing novelty curve means the frontier is re-fetching mirrors,
    templates and traps instead of discovering (why adaptive revisit and
    trap filters exist). Rounds are simulated as ``doc_id %
    NOVELTY_ROUNDS`` over ``documents`` so the metric is value-exact
    cross-engine; on the live engine the same query runs over
    fetched_docs.round.

    Scale shape: one explode → (shingle, min-round) hash agg (the
    first-seen computation — uniform content keys, map-side partials) +
    one per-round distinct count joined back; no pairs, no windows over
    the corpus."""
    from spider_go_spark.functions import textkernel as tk
    from spider_go_spark.queries import T

    d = T(spark, sf, "documents")
    sh = (
        d.select(
            (F.col("doc_id") % NOVELTY_ROUNDS).cast("int").alias("round"),
            F.explode(tk.shingle_hashes(F.col("text"))).alias("h"),
        )
        .distinct()
    )
    first = sh.groupBy("h").agg(F.min("round").alias("first_round"))
    per_round = sh.groupBy("round").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    new = (
        first.groupBy(F.col("first_round").alias("round"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new_shingles"))
    )
    ndocs = d.groupBy((F.col("doc_id") % NOVELTY_ROUNDS).cast("int").alias("round")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    return (
        per_round.join(new, "round", "left")
        .join(ndocs, "round")
        .select(
            "round",
            "n_docs",
            "n_shingles",
            F.coalesce("n_new_shingles", F.lit(0)).cast("bigint").alias("n_new_shingles"),
            F.expr(
                "CASE WHEN n_shingles > 0 THEN"
                " (coalesce(n_new_shingles, 0) * 1000000) div n_shingles"
                " ELSE 0 END"
            ).alias("novelty_ppm"),
        )
    )


ROUND_NOVELTY_REPORT_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), th AS (
  SELECT doc_id,
         list_transform(tokens,
            t -> list_reduce(
                   list_prepend(0::BIGINT,
                     list_transform(string_split(t, ''), c -> unicode(c)::BIGINT)),
                   (a, b) -> (a*31 + b) % 1000000007)) AS th
  FROM toks
), sh AS (
  SELECT DISTINCT (doc_id % {NOVELTY_ROUNDS})::INT AS round,
         unnest(list_transform(range(0, greatest(len(th)-2, 0)),
            i -> ((th[i+1]*1000003 + th[i+2]) % 1000000007 * 1000003 + th[i+3]) % 1000000007)) AS h
  FROM th
), first AS (
  SELECT h, min(round) AS first_round FROM sh GROUP BY h
), per_round AS (
  SELECT round, count(*)::BIGINT AS n_shingles FROM sh GROUP BY round
), nw AS (
  SELECT first_round AS round, count(*)::BIGINT AS n_new_shingles
  FROM first GROUP BY first_round
), nd AS (
  SELECT (doc_id % {NOVELTY_ROUNDS})::INT AS round, count(*)::BIGINT AS n_docs
  FROM documents GROUP BY 1
)
SELECT p.round, nd.n_docs, p.n_shingles,
       coalesce(nw.n_new_shingles, 0)::BIGINT AS n_new_shingles,
       CASE WHEN p.n_shingles > 0
            THEN (coalesce(nw.n_new_shingles, 0) * 1000000) // p.n_shingles
            ELSE 0 END AS novelty_ppm
FROM per_round p LEFT JOIN nw USING (round) JOIN nd USING (round)
"""


REDIR_NODES = 4096  # 512 chains of 8 slots; chain c uses 1 + c%8 of them


def redirect_resolution(spark: SparkSession, sf: str) -> DataFrame:
    """Redirect-chain resolution through the REAL pointer-doubling operator
    (operators/graph.resolve_pointer_chains): every URL with a redirect is
    mapped to its terminal target and hop count in ⌈log2(max_hops)⌉
    equi-join rounds instead of hop-at-a-time walking — the canonical-URL
    step a crawler runs before dedup (3xx chains alias many URLs to one
    target; seen-set membership must key on the TERMINAL).

    Chains are synthesized deterministically: chain c owns ids
    [8c, 8c+7] and redirects through its first 1 + c%8 slots, so hop
    counts 1..7 and straight-to-terminal cases all occur. The oracle
    resolves the same chains with a recursive CTE — an independent
    hop-at-a-time route to the same fixpoint.

    Scale shape: 3 doubling self-joins (left, equi on the successor key),
    each lineage-truncated; output rows = redirecting URLs only."""
    from spider_go_spark.operators.graph import resolve_pointer_chains

    ids = spark.range(REDIR_NODES).select(F.col("id").cast("long").alias("i"))
    url = lambda c: F.concat(F.lit("http://redir.example.test/u/"), c.cast("string"))
    edges = ids.filter(
        (F.col("i") % 8) < (1 + (F.col("i") / 8).cast("long") % 8) - 1
    ).select(url(F.col("i")).alias("src"), url(F.col("i") + 1).alias("dst"))
    out = resolve_pointer_chains(edges, max_hops=8)
    return out.select(
        F.col("src").alias("src_url"),
        F.col("final").alias("final_url"),
        "hops",
    ).orderBy("src_url")


REDIRECT_RESOLUTION_SQL = f"""
WITH RECURSIVE edges AS (
  SELECT r AS src, r + 1 AS dst
  FROM range({REDIR_NODES}) t(r)
  WHERE (r % 8) < (1 + ((r // 8) % 8)) - 1
), walk AS (
  SELECT src, dst AS cur, 1::BIGINT AS hops FROM edges
  UNION ALL
  SELECT w.src, e.dst, w.hops + 1 FROM walk w JOIN edges e ON w.cur = e.src
)
SELECT 'http://redir.example.test/u/' || src::VARCHAR AS src_url,
       'http://redir.example.test/u/' || cur::VARCHAR AS final_url,
       hops
FROM walk
WHERE cur NOT IN (SELECT src FROM edges)
ORDER BY src_url
"""


N_DIFF_HOSTS = 12
N_DIFF_PAGES = 400


def _diff_captures(spark: SparkSession, sf: str):
    """Two deterministic captures of the same sites (shared by
    recrawl_diff_audit and change_rate_revisit): capture A = pages 0..349
    per host, capture B = pages 50..399 (50 gone, 50 added), every 7th
    page's content version bumped in B."""
    from spider_go_spark.queries import T

    li = T(spark, sf, "lineitem")
    host = (F.col("l_suppkey") % N_DIFF_HOSTS).cast("long")
    page = (F.col("l_partkey") % N_DIFF_PAGES).cast("long")
    base = li.select(host.alias("h"), page.alias("p")).distinct()
    url = F.concat(
        F.lit("http://d"), F.col("h").cast("string"),
        F.lit(".example.test/p/"), F.col("p").cast("string"),
    )
    cap_a = base.filter(F.col("p") < 350).select(
        "h", url.alias("url"), (F.col("p") * 31 % 1000).alias("content_v")
    )
    cap_b = base.filter(F.col("p") >= 50).select(
        "h",
        url.alias("url"),
        (F.col("p") * 31 % 1000
         + F.when(F.col("p") % 7 == 0, 1).otherwise(0)).alias("content_v"),
    )
    return cap_a, cap_b


def recrawl_diff_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Recrawl diff: two captures of the same sites compared URL-by-URL —
    per host, how many pages were ADDED, GONE, CHANGED (content hash
    moved) or UNCHANGED between rounds, with a change-rate per-mille. This
    is the corpus-level audit that tunes adaptive revisit (a host at
    900 pm change rate deserves short intervals; one at 0 pm wastes
    budget), the static twin of the engine's per-URL change detection
    (plans/round_loop adaptive revisit).

    Synthesis: capture A = pages 0..349 per host, capture B = pages
    50..399 (50 gone, 50 added), with every 7th page's content version
    bumped in B. The operator is generic: one full-outer join on the URL
    key, a classify projection, one host-keyed agg.

    Scale shape: the join is URL-keyed (uniform hash); both sides prune
    to the compared rounds via partition filters on a real capture table;
    output rows = hosts."""
    cap_a, cap_b = _diff_captures(spark, sf)
    j = cap_a.alias("a").join(
        cap_b.alias("b"), F.col("a.url") == F.col("b.url"), "full_outer"
    )
    cls = j.select(
        F.coalesce(F.col("a.h"), F.col("b.h")).alias("h"),
        F.when(F.col("a.url").isNull(), "added")
        .when(F.col("b.url").isNull(), "gone")
        .when(F.col("a.content_v") != F.col("b.content_v"), "changed")
        .otherwise("unchanged")
        .alias("cls"),
    )
    agg = cls.groupBy("h").agg(
        F.sum(F.when(F.col("cls") == "added", 1).otherwise(0)).alias("n_added"),
        F.sum(F.when(F.col("cls") == "gone", 1).otherwise(0)).alias("n_gone"),
        F.sum(F.when(F.col("cls") == "changed", 1).otherwise(0)).alias("n_changed"),
        F.sum(F.when(F.col("cls") == "unchanged", 1).otherwise(0)).alias("n_unchanged"),
    )
    return agg.select(
        F.concat(F.lit("d"), F.col("h").cast("string"), F.lit(".example.test"))
        .alias("host"),
        "n_added", "n_gone", "n_changed", "n_unchanged",
        F.expr(
            "1000 * (n_added + n_gone + n_changed)"
            " div (n_added + n_gone + n_changed + n_unchanged)"
        ).alias("pm_changed"),
    ).orderBy("host")


_DIFF_CAPS_CTES = f"""base AS (
  SELECT DISTINCT (l_suppkey % {N_DIFF_HOSTS})::BIGINT AS h,
                  (l_partkey % {N_DIFF_PAGES})::BIGINT AS p
  FROM lineitem
), cap_a AS (
  SELECT h, 'http://d' || h::VARCHAR || '.example.test/p/' || p::VARCHAR AS url,
         (p * 31 % 1000) AS content_v
  FROM base WHERE p < 350
), cap_b AS (
  SELECT h, 'http://d' || h::VARCHAR || '.example.test/p/' || p::VARCHAR AS url,
         (p * 31 % 1000 + CASE WHEN p % 7 = 0 THEN 1 ELSE 0 END) AS content_v
  FROM base WHERE p >= 50
)"""

RECRAWL_DIFF_SQL = f"""
WITH {_DIFF_CAPS_CTES}, cls AS (
  SELECT coalesce(a.h, b.h) AS h,
         CASE WHEN a.url IS NULL THEN 'added'
              WHEN b.url IS NULL THEN 'gone'
              WHEN a.content_v <> b.content_v THEN 'changed'
              ELSE 'unchanged' END AS cls
  FROM cap_a a FULL OUTER JOIN cap_b b ON a.url = b.url
), agg AS (
  SELECT h,
         sum(CASE WHEN cls = 'added' THEN 1 ELSE 0 END)::BIGINT AS n_added,
         sum(CASE WHEN cls = 'gone' THEN 1 ELSE 0 END)::BIGINT AS n_gone,
         sum(CASE WHEN cls = 'changed' THEN 1 ELSE 0 END)::BIGINT AS n_changed,
         sum(CASE WHEN cls = 'unchanged' THEN 1 ELSE 0 END)::BIGINT AS n_unchanged
  FROM cls GROUP BY h
)
SELECT 'd' || h::VARCHAR || '.example.test' AS host,
       n_added, n_gone, n_changed, n_unchanged,
       ((1000 * (n_added + n_gone + n_changed))
        // (n_added + n_gone + n_changed + n_unchanged))::BIGINT AS pm_changed
FROM agg ORDER BY host
"""


# --------------------------------------------------------------------------
# Change-rate estimation → revisit interval (Cho & Garcia-Molina, "Estimating
# frequency of change", TOIT 2003): a page sampled every I rounds that
# changed in X of n comparable observations has Poisson-MLE change rate
# λ̂·I = ln(n / (n − X)). Kept in exact log2 Q20 units (the same integer
# binary-log kernel BM25 uses — ln and log2 differ by a constant factor, so
# the recommended-interval RANKING is identical), the freshness-optimal
# revisit interval is ∝ I / λ̂: interval = clamp((I << 20) div rate_q20).
# This is the published estimator behind the engine's adaptive revisit
# (plans/round_loop.py doubles/halves empirically; this computes the rate).
# --------------------------------------------------------------------------

PROBE_INTERVAL_ROUNDS = 8
REVISIT_MIN_ROUNDS = 1
REVISIT_MAX_ROUNDS = 64


def change_rate_revisit(spark: SparkSession, sf: str) -> DataFrame:
    """Per-host Poisson change-rate estimate from the two-capture diff,
    and the recommended revisit interval in rounds. Only URLs present in
    BOTH captures are comparable observations (added/gone pages say
    nothing about in-place change); X is clamped to n−1 so an
    every-page-changed host gets the shortest interval instead of a
    division by ln(∞), and a never-changed host gets the max interval.

    Scale shape: one URL-keyed inner join + one host-keyed agg; the log2
    kernel is a per-host projection (rows = hosts)."""
    from spider_go_spark.functions.intmath import log2_q20

    cap_a, cap_b = _diff_captures(spark, sf)
    j = cap_a.alias("a").join(cap_b.alias("b"), "url")
    per_host = (
        j.select(
            F.col("a.h").alias("h"),
            F.when(F.col("a.content_v") != F.col("b.content_v"), 1)
            .otherwise(0)
            .alias("chg"),
        )
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_compared"),
            F.sum("chg").cast("long").alias("n_changed"),
        )
    )
    rated = per_host.withColumn(
        "rate_q20",
        log2_q20("n_compared", "n_compared - least(n_changed, n_compared - 1)"),
    )
    return rated.select(
        F.concat(F.lit("d"), F.col("h").cast("string"), F.lit(".example.test"))
        .alias("host"),
        "n_compared",
        "n_changed",
        "rate_q20",
        F.expr(
            f"CASE WHEN rate_q20 = 0 THEN {REVISIT_MAX_ROUNDS}"
            f" ELSE greatest({REVISIT_MIN_ROUNDS}, least({REVISIT_MAX_ROUNDS},"
            f"   ({PROBE_INTERVAL_ROUNDS} * 1048576) div rate_q20)) END"
        )
        .cast("long")
        .alias("revisit_rounds"),
    ).orderBy("host")


def _change_rate_sql() -> str:
    from spider_go_spark.functions.intmath import log2_q20_duckdb_ctes

    lg = log2_q20_duckdb_ctes(
        "n_compared",
        "n_compared - least(n_changed, n_compared - 1)",
        "per_host",
        "h",
    )
    return f"""
WITH RECURSIVE {_DIFF_CAPS_CTES}, per_host AS (
  SELECT a.h,
         count(*)::BIGINT AS n_compared,
         sum(CASE WHEN a.content_v <> b.content_v THEN 1 ELSE 0 END)::BIGINT AS n_changed
  FROM cap_a a JOIN cap_b b USING (url) GROUP BY a.h
), {lg}
SELECT 'd' || p.h::VARCHAR || '.example.test' AS host,
       p.n_compared, p.n_changed, l.log2_q20 AS rate_q20,
       (CASE WHEN l.log2_q20 = 0 THEN {REVISIT_MAX_ROUNDS}
             ELSE greatest({REVISIT_MIN_ROUNDS}, least({REVISIT_MAX_ROUNDS},
               ({PROBE_INTERVAL_ROUNDS} * 1048576) // l.log2_q20)) END)::BIGINT
         AS revisit_rounds
FROM per_host p JOIN lg l USING (h)
ORDER BY host
"""


CHANGE_RATE_REVISIT_SQL = _change_rate_sql()


QUERIES = {
    "crawl_fetch_ordering": crawl_fetch_ordering,
    "crawl_budget_allocation": crawl_budget_allocation,
    "budget_fairness_report": budget_fairness_report,
    "round_novelty_report": round_novelty_report,
    "frontier_pagerank_rerank": frontier_pagerank_rerank,
    "crawl_frontier_lineage": crawl_frontier_lineage,
    "schedule_one_round": schedule_one_round,
    "url_trap_filter": url_trap_filter,
    "redirect_resolution": redirect_resolution,
    "recrawl_diff_audit": recrawl_diff_audit,
    "change_rate_revisit": change_rate_revisit,
}

# The iterative crawl queries are non-SQL-expressible (rows-only checks);
# the single scheduling round has a full value-exact oracle.
ORACLES: dict[str, str] = {
    "schedule_one_round": SCHEDULE_ONE_ROUND_SQL,
    "crawl_budget_allocation": CRAWL_BUDGET_ALLOCATION_SQL,
    "budget_fairness_report": BUDGET_FAIRNESS_REPORT_SQL,
    "round_novelty_report": ROUND_NOVELTY_REPORT_SQL,
    "url_trap_filter": URL_TRAP_FILTER_SQL,
    "frontier_pagerank_rerank": _rerank_sql(),
    "redirect_resolution": REDIRECT_RESOLUTION_SQL,
    "recrawl_diff_audit": RECRAWL_DIFF_SQL,
    "change_rate_revisit": CHANGE_RATE_REVISIT_SQL,
}
