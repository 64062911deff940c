"""Link-analysis operators over the synthesized web graph: exact triangle
/ clustering census, SALSA authority ranking, and the HyperBall-derived
effective diameter.

These complete the web-graph census family started in queries/pipelineops
(PageRank / HITS / bow-tie / neighbourhood function / degree distribution)
and queries/siteops (k-core, mirrors):

- **Triangle census** — exact per-node triangle counts and local
  clustering coefficients by degree-ordered edge orientation (Latapy, TCS
  2008). Clustering separates tightly-knit community hosts from star-hub
  link farms with identical degree — a spam signal PageRank alone misses
  (Becchetti et al., "Efficient semi-streaming algorithms for local
  triangle counting", KDD 2008 use exactly this at web scale).
- **SALSA** (Lempel & Moran, WWW 2000) — the degree-normalized random-walk
  alternative to HITS, resistant to the tightly-knit-community effect that
  lets link farms capture HITS's principal eigenvector.
- **Effective diameter** — the standard Broder-census headline number
  (smallest hop count covering ≥90% of reachable pairs), read off the
  HyperBall neighbourhood function that ``neighbourhood_function`` already
  computes; at 10^10 nodes a sketch is the only way to get it.

Reference parity: spider-go has no link analysis (SURVEY.md §2.12 — its
scheduler is FIFO); these extend the frontier-prioritization surface the
north rule's 10^10-URL crawl needs. All arithmetic is int64 fixed-point
(operators/graph.py discipline) so every query carries a value-exact
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_go_spark.operators.graph import (
    salsa_int,
    salsa_oracle_sql,
    triangles_per_node,
    triangles_oracle_sql,
)
from spider_go_spark.queries import T

# --- synthetic link graph ----------------------------------------------------
# A directed host graph from lineitem, disjoint constants from the bow-tie
# census model (pipelineops._CENSUS_EDGES) so the two families stay
# independently tunable. ~LINK_M nodes; the l_orderkey sparsifier keeps the
# edge count proportional to SF without going dense at sf0.1.
LINK_M = 900
LINK_EDGE_MOD = 7
TRIANGLE_TOPK = 15
SALSA_ITERS = 3
SALSA_TOPK = 15

_LINK_EDGES = f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT (l_partkey % {LINK_M})::BIGINT AS src,
         ((l_suppkey * 5 + l_linenumber * 17) % {LINK_M})::BIGINT AS dst
  FROM lineitem
  WHERE l_orderkey % {LINK_EDGE_MOD} = 0
    AND (l_partkey % {LINK_M}) <> ((l_suppkey * 5 + l_linenumber * 17) % {LINK_M})
)"""

_UND_EDGES = (
    _LINK_EDGES
    + """
, und_edges AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
)"""
)


def _link_edges_df(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_orderkey") % LINK_EDGE_MOD == 0)
        .select(
            (F.col("l_partkey") % LINK_M).cast("long").alias("src"),
            ((F.col("l_suppkey") * 5 + F.col("l_linenumber") * 17) % LINK_M)
            .cast("long")
            .alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _und_edges_df(spark: SparkSession, sf: str) -> DataFrame:
    e = _link_edges_df(spark, sf)
    return e.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()


def triangle_census(spark: SparkSession, sf: str) -> DataFrame:
    """Top-TRIANGLE_TOPK nodes by exact triangle count (ties by node id)
    with degree and local clustering coefficient in integer ppm, over the
    undirected link graph. Degree-ordered orientation bounds the wedge
    fan-out by oriented out-degree — O(sqrt(E)) per node on any graph —
    so the plan survives power-law hubs that would explode a naive
    neighbor self-join; see operators/graph.triangles_per_node."""
    cc = triangles_per_node(_und_edges_df(spark, sf))
    return cc.orderBy(F.col("tri").desc(), "node").limit(TRIANGLE_TOPK)


TRIANGLE_CENSUS_SQL = (
    triangles_oracle_sql(_UND_EDGES)
    + f"""
SELECT node, deg, tri, cc_ppm FROM tri_final
ORDER BY tri DESC, node LIMIT {TRIANGLE_TOPK}
"""
)


def salsa_authorities(spark: SparkSession, sf: str) -> DataFrame:
    """Top-SALSA_TOPK authorities by SALSA_ITERS iterations of the SALSA
    authority chain over the directed link graph — degree-normalized
    back-forward walk pushes in int64 micro-units, max-normed per
    iteration (operators/graph.salsa_int). The link-farm-resistant
    complement to hits_top_nodes over the same census machinery."""
    ranks = salsa_int(_link_edges_df(spark, sf), SALSA_ITERS)
    return ranks.orderBy(F.col("salsa_auth_u").desc(), "node").limit(SALSA_TOPK)


SALSA_AUTHORITIES_SQL = (
    salsa_oracle_sql(_LINK_EDGES, SALSA_ITERS)
    + f"""
SELECT node, salsa_auth_u FROM salsafinal
ORDER BY salsa_auth_u DESC, node LIMIT {SALSA_TOPK}
"""
)


def effective_diameter(spark: SparkSession, sf: str) -> DataFrame:
    """The 90% effective diameter of the bow-tie census graph: the
    smallest hop count h (within the BOWTIE_HOPS bound) at which the
    HyperBall neighbourhood function N(h) reaches ≥ 90% of N(max) — the
    headline number of every web-structure census since Broder et al.
    (WWW 2000), and computable at 10^10 nodes ONLY from sketches.

    Pure integer derivation over the (hops+1)-row N(h) table that
    neighbourhood_function already produces: the 90% test is
    ``10·N(h) ≥ 9·N(max)`` (no floats; N ≤ ~10^13 pairs keeps 10·N
    int64-safe), the argmin is a min over qualifying hops. Returns one
    row (eff_diameter, nf_at_d, nf_max)."""
    from spider_go_spark.operators.graph import hyperball_int
    from spider_go_spark.queries.pipelineops import BOWTIE_HOPS, _census_edges_df

    nf = hyperball_int(_census_edges_df(spark, sf), BOWTIE_HOPS)
    mx = nf.agg(F.max("n_pairs_est").alias("nf_max"))
    qual = (
        nf.crossJoin(F.broadcast(mx))
        .filter(F.col("n_pairs_est") * 10 >= F.col("nf_max") * 9)
        .groupBy("nf_max")
        .agg(F.min("hop").cast("int").alias("eff_diameter"))
    )
    return (
        qual.join(nf, F.col("eff_diameter") == F.col("hop"))
        .select(
            "eff_diameter",
            F.col("n_pairs_est").alias("nf_at_d"),
            "nf_max",
        )
    )


def _effective_diameter_sql() -> str:
    from spider_go_spark.queries.pipelineops import NEIGHBOURHOOD_FUNCTION_SQL

    return f"""
WITH nf AS MATERIALIZED (
{NEIGHBOURHOOD_FUNCTION_SQL}
), mx AS (SELECT max(n_pairs_est) AS nf_max FROM nf),
d AS (
  SELECT min(hop)::INT AS eff_diameter, any_value(m.nf_max)::BIGINT AS nf_max
  FROM nf CROSS JOIN mx m
  WHERE nf.n_pairs_est * 10 >= m.nf_max * 9
)
SELECT d.eff_diameter, nf.n_pairs_est::BIGINT AS nf_at_d, d.nf_max
FROM d JOIN nf ON d.eff_diameter = nf.hop
"""


EFFECTIVE_DIAMETER_SQL = _effective_diameter_sql()


HARMONIC_HOPS = 3
HARMONIC_TOPK = 15


def harmonic_centrality_top(spark: SparkSession, sf: str) -> DataFrame:
    """Top-HARMONIC_TOPK nodes of the directed link graph by bounded-hop
    harmonic centrality H(v) = Σ_h (|ball_v(h)| − |ball_v(h−1)|)/h, read
    off the per-node HyperBall ball-size estimates
    (operators/graph.harmonic_centrality_int) — the centrality Boldi &
    Vigna built HyperBall for, and the only one of the census family
    that weights *distance*, not just volume. Ties by node id; harm_u in
    micro-units, bit-exact vs the unrolled SQL twin."""
    from spider_go_spark.operators.graph import harmonic_centrality_int

    h = harmonic_centrality_int(_link_edges_df(spark, sf), HARMONIC_HOPS)
    return h.orderBy(F.col("harm_u").desc(), "node").limit(HARMONIC_TOPK)


def _harmonic_top_sql() -> str:
    from spider_go_spark.operators.graph import harmonic_oracle_sql

    return f"""
WITH harm AS MATERIALIZED (
{harmonic_oracle_sql(_LINK_EDGES, HARMONIC_HOPS)}
)
SELECT node, harm_u FROM harm ORDER BY harm_u DESC, node LIMIT {HARMONIC_TOPK}
"""


HARMONIC_CENTRALITY_SQL = _harmonic_top_sql()


QUERIES = {
    "triangle_census": triangle_census,
    "salsa_authorities": salsa_authorities,
    "effective_diameter": effective_diameter,
    "harmonic_centrality_top": harmonic_centrality_top,
}

ORACLES = {
    "triangle_census": TRIANGLE_CENSUS_SQL,
    "salsa_authorities": SALSA_AUTHORITIES_SQL,
    "effective_diameter": EFFECTIVE_DIAMETER_SQL,
    "harmonic_centrality_top": HARMONIC_CENTRALITY_SQL,
}
