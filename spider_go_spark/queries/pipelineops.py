"""Training-data pipeline operators beyond text/vector dedup: deterministic
train/val/test splits, weighted corpus mixing, benchmark-contamination
checks, sequence packing, and PageRank frontier prioritization.

These are the operations a 100 TB pretraining-data build runs between
"crawl" and "tokenize" (the reference engine stops at fetch+store —
SURVEY.md §2.12); each is implemented as the scale-shaped Spark plan
(map-only hash decisions, single-window packing, shingle-join
contamination, integer PageRank) and every one is value-exact against a
DuckDB oracle — including PageRank, via fixed-point integer arithmetic
(operators/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spider_go_spark.functions import textkernel as tk
from spider_go_spark.operators import sampling
from spider_go_spark.operators.graph import (
    bfs_oracle_sql,
    label_prop_oracle_sql,
    label_propagation_min,
    opic_int,
    opic_oracle_sql,
    pagerank_int,
    pagerank_oracle_sql,
)
from spider_go_spark.queries import T
from spider_go_spark.queries.textops import _HASHES_CTE, _docs_hashes

# --------------------------------------------------------------------------
# Train/val/test split — stratified report
# --------------------------------------------------------------------------


def train_split_strata(spark: SparkSession, sf: str) -> DataFrame:
    """80/10/10 deterministic hash split of ``documents``, reported per
    (lang, split): a document's split is a pure function of doc_id —
    stable under appends, repartitioning, and engine choice."""
    d = sampling.hash_split(T(spark, sf, "documents"), "doc_id")
    return d.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )


_BUCKET = sampling.id_bucket_sql("doc_id")

TRAIN_SPLIT_STRATA_SQL = f"""
SELECT lang,
       CASE WHEN {_BUCKET} < 800 THEN 'train'
            WHEN {_BUCKET} < 900 THEN 'val'
            ELSE 'test' END AS split,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS n_chars
FROM documents
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Weighted corpus mixing
# --------------------------------------------------------------------------


def corpus_mix_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic mixture sampling: per-source keep rates (ppt) derived
    from the source id — 1000/500/250/125 by source-index mod 4, the
    "oversample curated, downsample bulk" pattern of pretraining mixes.
    Map-only filter; returns the kept membership itself (doc_id, source,
    n_chars) so the oracle checks every sampling decision, not just counts."""
    d = T(spark, sf, "documents")
    idx = F.substring("source", 4, 10).cast("int")
    w = (
        F.when(idx % 4 == 0, 1000)
        .when(idx % 4 == 1, 500)
        .when(idx % 4 == 2, 250)
        .otherwise(125)
    )
    kept = sampling.weighted_mix(d, "doc_id", w)
    return kept.select("doc_id", "source", "n_chars")


CORPUS_MIX_WEIGHTED_SQL = f"""
SELECT doc_id, source, n_chars
FROM documents
WHERE {_BUCKET} < CASE (substr(source, 4)::INT) % 4
                  WHEN 0 THEN 1000 WHEN 1 THEN 500
                  WHEN 2 THEN 250 ELSE 125 END
"""


# --------------------------------------------------------------------------
# Benchmark contamination check
# --------------------------------------------------------------------------


def contamination_check(spark: SparkSession, sf: str) -> DataFrame:
    """Which training documents share ≥ 3 distinct 3-gram shingles with a
    benchmark document? (Benchmark set: doc_id % 97 == 0 — stands in for an
    eval-set manifest.) The scale path is the same content-keyed shingle
    equi-join as n-gram dedup: candidates come from hash equality — never
    an all-pairs comparison — and only the small benchmark side explodes
    into the join twice."""
    h = _docs_hashes(spark, sf).localCheckpoint(eager=True)
    bench = h.filter(F.col("doc_id") % 97 == 0)
    train = h.filter(F.col("doc_id") % 97 != 0)
    tx = train.select("doc_id", F.explode("hashes").alias("h"))
    bx = bench.select(F.col("doc_id").alias("bench_doc_id"), F.explode("hashes").alias("h"))
    return (
        tx.join(bx, "h")
        .groupBy("doc_id", "bench_doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
    )


CONTAMINATION_CHECK_SQL = (
    _HASHES_CTE
    + """
, tx AS (SELECT doc_id, unnest(hashes) AS h FROM hs WHERE doc_id % 97 <> 0),
bx AS (SELECT doc_id AS bench_doc_id, unnest(hashes) AS h FROM hs WHERE doc_id % 97 = 0)
SELECT tx.doc_id, bx.bench_doc_id, count(*)::BIGINT AS n_shared
FROM tx JOIN bx USING (h)
GROUP BY 1, 2
HAVING count(*) >= 3
"""
)


# --------------------------------------------------------------------------
# Sequence packing
# --------------------------------------------------------------------------

PACK_BUDGET = 2000  # tokens per packed sequence


def pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Pack documents into fixed token-budget bins per language (greedy in
    doc_id order — the deterministic, window-expressible packing; see
    operators/sampling.pack_bins), reporting each bin's document count and
    token total."""
    d = T(spark, sf, "documents")
    from spider_go_spark.functions import textkernel as tk

    sized = d.select("lang", "doc_id", F.size(tk.tokens(F.col("text"))).cast("long").alias("n_tokens"))
    packed = sampling.pack_bins(sized, "lang", "doc_id", "n_tokens", PACK_BUDGET)
    return packed.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


PACK_SEQUENCES_SQL = rf"""
WITH sized AS (
  SELECT lang, doc_id,
         len(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0))::BIGINT AS n_tokens
  FROM documents
), packed AS (
  SELECT lang, n_tokens,
         (coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
          // {PACK_BUDGET})::BIGINT AS bin_id
  FROM sized
)
SELECT lang, bin_id, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS n_tokens
FROM packed GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# PageRank over the supplier↔part graph
# --------------------------------------------------------------------------

PAGERANK_ITERS = 5
PART_NODE_OFFSET = 1_000_000  # disjoint node-id spaces for the two sides


def pagerank_top20(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 nodes by 5-iteration integer PageRank over the bidirectional
    supplier↔part graph from lineitem (parts offset into their own id
    space). Bit-exact vs the SQL oracle because all rank arithmetic is
    int64 fixed-point — see operators/graph.py."""
    li = T(spark, sf, "lineitem").select("l_suppkey", "l_partkey").distinct()
    fwd = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey") + PART_NODE_OFFSET).cast("long").alias("dst"),
    )
    edges = fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank_int(edges, PAGERANK_ITERS)
    return ranks.orderBy(F.col("rank_u").desc(), "node").limit(20)


_PAGERANK_EDGES_CTE = f"""
WITH pairs AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
edges AS (
  SELECT l_suppkey::BIGINT AS src, (l_partkey + {PART_NODE_OFFSET})::BIGINT AS dst FROM pairs
  UNION ALL
  SELECT (l_partkey + {PART_NODE_OFFSET})::BIGINT, l_suppkey::BIGINT FROM pairs
)"""

PAGERANK_TOP20_SQL = (
    pagerank_oracle_sql(_PAGERANK_EDGES_CTE, PAGERANK_ITERS)
    + f"""
SELECT node, rank_u FROM rank{PAGERANK_ITERS}
ORDER BY rank_u DESC, node LIMIT 20
"""
)


BOWTIE_HOPS = 4
BOWTIE_M = 2000
BOWTIE_EDGE_MOD = 11  # sparsifier: dense graphs collapse to all-core


_CENSUS_EDGES = f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT (l_suppkey % {BOWTIE_M})::BIGINT AS src,
         ((l_partkey * 3 + l_linenumber) % {BOWTIE_M})::BIGINT AS dst
  FROM lineitem
  WHERE l_orderkey % {BOWTIE_EDGE_MOD} = 0
    AND (l_suppkey % {BOWTIE_M}) <> ((l_partkey * 3 + l_linenumber) % {BOWTIE_M})
)"""


def _census_edges_df(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_orderkey") % BOWTIE_EDGE_MOD == 0)
        .select(
            (F.col("l_suppkey") % BOWTIE_M).cast("long").alias("src"),
            ((F.col("l_partkey") * 3 + F.col("l_linenumber")) % BOWTIE_M)
            .cast("long")
            .alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )




def bowtie_structure(spark: SparkSession, sf: str) -> DataFrame:
    """Bow-tie macro-structure of a directed graph (Broder et al., WWW
    2000): pick the best-connected hub, run a FORWARD and a BACKWARD
    bounded BFS from it, and classify every node as ``core`` (reaches and
    is reached — the strongly-connected heart, within the hop bound),
    ``in`` (reaches the core but isn't reached), ``out`` (reached but
    doesn't reach back), or ``other`` (tendrils/disconnected). The classic
    whole-web census a crawl operator runs to know what share of the graph
    a seed placement can ever discover.

    Bounded-hop contract: both BFS runs expand exactly ``BOWTIE_HOPS``
    levels (the unrolled oracle matches join-for-join), so "reaches" means
    within k hops — the exact question a depth-capped crawl asks. Scale
    shape: two bfs_levels runs (equi-join + anti-join per hop, lineage
    checkpointed) + two left joins + one 4-row agg."""
    from spider_go_spark.operators.graph import bowtie_components

    return bowtie_components(_census_edges_df(spark, sf), BOWTIE_HOPS)


def _bowtie_sql() -> str:
    from spider_go_spark.operators.graph import bfs_iters_sql

    h = BOWTIE_HOPS
    return (
        _CENSUS_EDGES
        + """
, redges AS MATERIALIZED (SELECT dst AS src, src AS dst FROM edges),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
                       UNION SELECT DISTINCT dst FROM edges),
hub AS (
  SELECT node FROM (
    SELECT node, count(*) AS deg FROM
      (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
    GROUP BY node
  ) ORDER BY deg DESC, node LIMIT 1
)"""
        + bfs_iters_sql("SELECT node FROM hub", h, "fd", "edges")
        + bfs_iters_sql("SELECT node FROM hub", h, "bd", "redges")
        + f"""
SELECT CASE WHEN f.node IS NOT NULL AND b.node IS NOT NULL THEN 'core'
            WHEN b.node IS NOT NULL THEN 'in'
            WHEN f.node IS NOT NULL THEN 'out'
            ELSE 'other' END AS component,
       count(*)::BIGINT AS n_nodes
FROM nodes n
LEFT JOIN (SELECT DISTINCT node FROM fd{h}) f ON n.node = f.node
LEFT JOIN (SELECT DISTINCT node FROM bd{h}) b ON n.node = b.node
GROUP BY component ORDER BY component
"""
    )


BOWTIE_STRUCTURE_SQL = _bowtie_sql()


def neighbourhood_function(spark: SparkSession, sf: str) -> DataFrame:
    """N(h) for h = 0..BOWTIE_HOPS of the same sparsified directed graph
    the bow-tie census runs on, by HyperBall
    (operators/graph.hyperball_int): per-node HLL out-ball sketches
    unioned by register-wise max each hop. The hop where N(h) flattens is
    the graph's effective diameter — together with bowtie_structure this
    is the full Broder-style web census, and the ONLY way either is
    computable at 10^10 nodes is sketched, exactly as here."""
    from spider_go_spark.operators.graph import hyperball_int

    return hyperball_int(_census_edges_df(spark, sf), BOWTIE_HOPS)


def _neighbourhood_sql() -> str:
    from spider_go_spark.operators.graph import hyperball_oracle_sql

    return hyperball_oracle_sql(_CENSUS_EDGES, BOWTIE_HOPS)


NEIGHBOURHOOD_FUNCTION_SQL = _neighbourhood_sql()


def degree_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Log-binned in/out degree distribution of the census graph: per
    direction, the number of nodes whose degree falls in [2^k, 2^(k+1)) —
    the power-law census every web-graph paper leads with, and the skew
    audit a crawl partitioner reads before choosing salting factors.
    Log2 bucket = length(bin(deg)) − 1 on both engines (no floats), one
    hash agg per direction."""
    edges = _census_edges_df(spark, sf)
    out = []
    for direction, key in (("out", "src"), ("in", "dst")):
        deg = edges.groupBy(F.col(key).alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        out.append(
            deg.groupBy(
                F.lit(direction).alias("direction"),
                (F.length(F.bin(F.col("deg"))) - 1).cast("int").alias("log2_deg"),
            ).agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        )
    return out[0].unionByName(out[1]).orderBy("direction", "log2_deg")


DEGREE_DISTRIBUTION_SQL = (
    _CENSUS_EDGES
    + """
, outd AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
ind  AS (SELECT dst AS node, count(*) AS deg FROM edges GROUP BY dst)
SELECT direction, log2_deg, count(*)::BIGINT AS n_nodes FROM (
  SELECT 'out' AS direction, (length(bin(deg)) - 1)::INT AS log2_deg FROM outd
  UNION ALL
  SELECT 'in', (length(bin(deg)) - 1)::INT FROM ind
) GROUP BY direction, log2_deg
ORDER BY direction, log2_deg
"""
)


WCC_ITERS = 8


def wcc_size_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Weakly-connected-component size histogram of the census graph:
    min-label propagation over the bidirectional edge set (the dedup-
    groups kernel re-aimed at the web graph; fixed-k contract — after
    WCC_ITERS rounds components of diameter ≤ k have converged, mirrored
    join-for-join by the unrolled oracle), then component sizes binned by
    log2. The 'is the web one giant component or dust' census — what a
    seed-list designer checks before promising coverage."""
    from spider_go_spark.operators.graph import label_propagation_min

    edges = _census_edges_df(spark, sf)
    bidir = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nodes = edges.select(F.col("src").alias("node")).unionByName(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    sizes = (
        label_propagation_min(nodes, bidir, WCC_ITERS)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return (
        sizes.groupBy(
            (F.length(F.bin(F.col("sz"))) - 1).cast("int").alias("log2_size")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_components"))
        .orderBy("log2_size")
    )


def _wcc_sql() -> str:
    from spider_go_spark.operators.graph import label_prop_oracle_sql

    return (
        _CENSUS_EDGES
        + """
, nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
            UNION SELECT DISTINCT dst FROM edges),
e AS MATERIALIZED (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)
"""
        + label_prop_oracle_sql(WCC_ITERS)
        + f"""
, sizes AS (SELECT label, count(*) AS sz FROM lab{WCC_ITERS} GROUP BY label)
SELECT (length(bin(sz)) - 1)::INT AS log2_size, count(*)::BIGINT AS n_components
FROM sizes GROUP BY log2_size ORDER BY log2_size
"""
    )


WCC_SIZE_HISTOGRAM_SQL = _wcc_sql()


KCORE_K = 6  # at k ≤ 5 the census graph's core stabilizes after one peel;
# k = 6 yields a genuine multi-iteration peeling trajectory at every sf
KCORE_ITERS = 5


def kcore_census(spark: SparkSession, sf: str) -> DataFrame:
    """k-core peeling census (k = 3, Seidman 1983) of the undirected census
    graph: iteration i drops every node with degree < k plus every edge
    touching one, and reports ``(iter, n_nodes, n_edges_dir)`` after each
    peel — iter 0 is the unpeeled graph; ``n_edges_dir`` counts directed
    (both-way) rows so every figure stays integral. Fixed KCORE_ITERS
    iterations make this a deterministic bounded-hop contract like the
    bow-tie census: once an iteration changes nothing the counts repeat,
    and the trajectory itself is the census signal (how fast the fringe
    peels off).

    Crawl-side use: the k-core is the densely-linked heart of the web graph
    (Broder's CORE is roughly a high-k core), and core membership is a
    link-farm-resistant priority signal — farms are shallow fringes that
    peel in one or two rounds. Scale shape: each iteration is one hash agg
    (degree) + two semi joins on node id with lineage truncated by an eager
    localCheckpoint — the same fixed-k iterative contract as the WCC and
    PageRank operators; no window, nothing quadratic."""
    edges = _census_edges_df(spark, sf)
    bidir = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def peel_stats(df: DataFrame, i: int) -> DataFrame:
        return df.agg(
            F.count_distinct("src").alias("n_nodes"),
            F.count(F.lit(1)).alias("n_edges_dir"),
        ).select(F.lit(i).cast("int").alias("iter"), "n_nodes", "n_edges_dir")

    out = [peel_stats(bidir, 0)]
    cur = bidir
    for i in range(1, KCORE_ITERS + 1):
        keep = (
            cur.groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select("node")
            .localCheckpoint(eager=True)
        )
        cur = (
            cur.join(keep, F.col("src") == F.col("node"), "left_semi")
            .join(keep, F.col("dst") == F.col("node"), "left_semi")
            .localCheckpoint(eager=True)
        )
        out.append(peel_stats(cur, i))
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.orderBy("iter")


def _kcore_sql() -> str:
    parts = [
        _CENSUS_EDGES,
        "\n, b0 AS MATERIALIZED (SELECT src, dst FROM edges"
        " UNION SELECT dst, src FROM edges)",
    ]
    for i in range(1, KCORE_ITERS + 1):
        p = i - 1
        parts.append(
            f"""
, k{i} AS MATERIALIZED (
    SELECT src AS node FROM b{p} GROUP BY src HAVING count(*) >= {KCORE_K})
, b{i} AS MATERIALIZED (
    SELECT src, dst FROM b{p}
    WHERE src IN (SELECT node FROM k{i}) AND dst IN (SELECT node FROM k{i}))"""
        )
    selects = [
        f"SELECT {i}::INT AS iter, count(DISTINCT src)::BIGINT AS n_nodes,"
        f" count(*)::BIGINT AS n_edges_dir FROM b{i}"
        for i in range(0, KCORE_ITERS + 1)
    ]
    parts.append("\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY iter\n")
    return "".join(parts)


KCORE_CENSUS_SQL = _kcore_sql()


OPIC_ITERS = 4


def opic_top20(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 nodes by 4-round batch OPIC (online page importance —
    operators/graph.opic_int) over the DIRECTED supplier→part graph from
    lineitem. Directed on purpose: every part node is dangling, so the
    virtual-page pot path (OPIC's strong-connectivity device) carries real
    mass here, not just division remainders. Importance = hist_u + cash_u
    (the estimator a crawler reads mid-crawl). Bit-exact vs the SQL oracle:
    all arithmetic is int64 fixed-point."""
    li = T(spark, sf, "lineitem").select("l_suppkey", "l_partkey").distinct()
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey") + PART_NODE_OFFSET).cast("long").alias("dst"),
    )
    state = opic_int(edges, OPIC_ITERS)
    return (
        state.select(
            "node", "cash_u", "hist_u", (F.col("hist_u") + F.col("cash_u")).alias("imp_u")
        )
        .orderBy(F.col("imp_u").desc(), "node")
        .limit(20)
    )


_OPIC_EDGES_CTE = f"""
WITH pairs AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
edges AS (
  SELECT l_suppkey::BIGINT AS src, (l_partkey + {PART_NODE_OFFSET})::BIGINT AS dst FROM pairs
)"""

OPIC_TOP20_SQL = (
    opic_oracle_sql(_OPIC_EDGES_CTE, OPIC_ITERS)
    + f"""
SELECT node, cash_u, hist_u, (hist_u + cash_u)::BIGINT AS imp_u FROM state{OPIC_ITERS}
ORDER BY imp_u DESC, node LIMIT 20
"""
)


BFS_HOPS = 3
BFS_SEED_EVERY = 25


def seed_distance_bfs(spark: SparkSession, sf: str) -> DataFrame:
    """Hop distance from a seed list over the bidirectional supplier↔part
    graph (operators/graph.bfs_levels): the static crawl-reachability
    question — every node a depth-3 crawl from these seeds would visit,
    with its discovery depth. Seeds are suppliers with key ≡ 0 (mod 25).

    The iterative operator is SQL-expressible by unrolling one CTE per hop
    (frontier⋈edges + anti-join against visited — the dedup plan of a real
    crawl round), so the gate is value-exact."""
    from spider_go_spark.operators.graph import bfs_levels

    li = T(spark, sf, "lineitem").select("l_suppkey", "l_partkey").distinct()
    fwd = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey") + PART_NODE_OFFSET).cast("long").alias("dst"),
    )
    edges = fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    seeds = (
        li.filter(F.col("l_suppkey") % BFS_SEED_EVERY == 0)
        .select(F.col("l_suppkey").cast("long").alias("node"))
        .distinct()
    )
    return bfs_levels(edges, seeds, BFS_HOPS).orderBy("dist", "node")


SEED_DISTANCE_BFS_SQL = (
    bfs_oracle_sql(
        _PAGERANK_EDGES_CTE,
        f"SELECT DISTINCT l_suppkey AS node FROM lineitem WHERE l_suppkey % {BFS_SEED_EVERY} = 0",
        BFS_HOPS,
    )
    + f"""
SELECT node, dist::INTEGER AS dist FROM dist{BFS_HOPS} ORDER BY dist, node
"""
)


# --------------------------------------------------------------------------
# Dedup groups: near-dup pairs → connected components
# --------------------------------------------------------------------------

CC_ITERS = 5


def dedup_groups(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical dedup groups over the whole corpus: 3-gram Jaccard ≥ 0.5
    near-dup pairs (the exact-verify output of the LSH pipeline) become
    undirected edges; 5 rounds of min-label propagation assign every doc
    the minimum doc_id of its near-dup component (singletons keep their own
    id). This is the step that turns pairwise similarity into "keep one per
    group" at 100 TB — never materializing components in driver memory."""
    from spider_go_spark.queries.textops import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(spark, sf).select("doc_id_a", "doc_id_b")
    edges = pairs.select(
        F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_id_b").alias("src"), F.col("doc_id_a").alias("dst"))
    )
    nodes = T(spark, sf, "documents").select(F.col("doc_id").alias("node"))
    labels = label_propagation_min(nodes, edges, CC_ITERS)
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("group_id"))


# CTE chain shared by dedup_groups and canonical_docs: hashes → candidate
# pairs → Jaccard-verified edges → CC_ITERS rounds of min-label propagation,
# ending in lab{CC_ITERS}(node, label).
_GROUPS_CTE = (
    _HASHES_CTE
    + """
, ex AS (SELECT doc_id, unnest(hashes) AS h FROM hs),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT doc_id_a, doc_id_b FROM (
    SELECT doc_id_a, doc_id_b,
           (len(list_intersect(x.hashes, y.hashes))::DOUBLE
            / (len(x.hashes) + len(y.hashes) - len(list_intersect(x.hashes, y.hashes)))::DOUBLE) AS jaccard
    FROM cand JOIN hs x ON x.doc_id = cand.doc_id_a JOIN hs y ON y.doc_id = cand.doc_id_b
  ) WHERE jaccard >= 0.5
),
e AS (SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
      UNION ALL SELECT doc_id_b, doc_id_a FROM pairs),
nodes AS (SELECT doc_id AS node FROM documents)
"""
    + label_prop_oracle_sql(CC_ITERS)
)

DEDUP_GROUPS_SQL = (
    _GROUPS_CTE
    + f"""
SELECT node AS doc_id, label AS group_id FROM lab{CC_ITERS}
"""
)


# --------------------------------------------------------------------------
# Canonical-doc retention: keep one document per dedup group
# --------------------------------------------------------------------------


def canonical_docs(spark: SparkSession, sf: str) -> DataFrame:
    """The retention step after :func:`dedup_groups`: within each near-dup
    component keep exactly one canonical document — the longest one
    (``n_chars`` DESC), ties to the smallest ``doc_id``. Output is one row
    per group: canonical doc, its length, and the group size.

    Scale shape: the ranking is one window partitioned by ``group_id`` —
    a single shuffle on a key whose cardinality is ~n_docs and whose
    partitions are near-dup clusters (small by construction), so there is
    no skew hazard; group sizes ride the same labels frame with one more
    hash agg. Nothing touches the driver — at 10^10 docs this is two
    exchanges over the label table, not a component materialization."""
    labels = dedup_groups(spark, sf)
    d = T(spark, sf, "documents").select("doc_id", "n_chars")
    m = labels.join(d, "doc_id")
    w = Window.partitionBy("group_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    kept = (
        m.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("group_id", F.col("doc_id").alias("kept_doc_id"), "n_chars")
    )
    sizes = labels.groupBy("group_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("group_size")
    )
    return kept.join(sizes, "group_id")


CANONICAL_DOCS_SQL = (
    _GROUPS_CTE
    + f"""
, labels AS (SELECT node AS doc_id, label AS group_id FROM lab{CC_ITERS}),
ranked AS (
  SELECT l.group_id, l.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY l.group_id
                            ORDER BY d.n_chars DESC, l.doc_id ASC) AS rk
  FROM labels l JOIN documents d USING (doc_id)
),
sizes AS (SELECT group_id, count(*)::BIGINT AS group_size FROM labels GROUP BY group_id)
SELECT r.group_id, r.doc_id AS kept_doc_id, r.n_chars, s.group_size
FROM ranked r JOIN sizes s USING (group_id)
WHERE r.rk = 1
"""
)


# --------------------------------------------------------------------------
# Inverted index: term → document-frequency + posting-list head
# --------------------------------------------------------------------------

_INDEX_TOP_TERMS = 50
_POSTINGS_HEAD = 10


def inverted_index_topterms(spark: SparkSession, sf: str) -> DataFrame:
    """The downstream consumer a spider exists to feed: build the inverted
    index for the ``_INDEX_TOP_TERMS`` highest-document-frequency terms —
    (term, doc_freq, first ``_POSTINGS_HEAD`` doc_ids of the posting list,
    comma-joined ascending).

    Scale shape: per-doc distinct terms come from one Arrow-free
    higher-order-function projection (no Python), the explode feeds a
    map-side-combined hash agg for document frequency, and posting heads
    are a per-term window cut (row_number ≤ k) — the same salted-cut shape
    as politeness would apply if a stop-word term got hot. The top-term
    filter is a broadcast semi-join, so the full posting lists of the
    10^6-term tail are never materialized."""
    d = T(spark, sf, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(tk.tokens(F.col("text")))).alias("term")
    )
    dfreq = toks.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("doc_freq"))
    top = dfreq.orderBy(F.desc("doc_freq"), F.asc("term")).limit(_INDEX_TOP_TERMS)
    w = Window.partitionBy("term").orderBy("doc_id")
    heads = (
        toks.join(F.broadcast(top.select("term")), "term")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _POSTINGS_HEAD)
        .groupBy("term")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")
                ),
            ).alias("postings_head")
        )
    )
    return top.join(heads, "term")


INVERTED_INDEX_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(
           list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0))) AS term
  FROM documents
),
dfreq AS (SELECT term, count(*)::BIGINT AS doc_freq FROM toks GROUP BY term),
top AS (SELECT term, doc_freq FROM dfreq
        ORDER BY doc_freq DESC, term ASC LIMIT {_INDEX_TOP_TERMS}),
heads AS (
  SELECT term, array_to_string(list_sort(list(doc_id)), ',') AS postings_head
  FROM (
    SELECT term, doc_id,
           row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rk
    FROM toks WHERE term IN (SELECT term FROM top)
  ) WHERE rk <= {_POSTINGS_HEAD}
  GROUP BY term
)
SELECT top.term, top.doc_freq, heads.postings_head
FROM top JOIN heads USING (term)
"""


# --------------------------------------------------------------------------
def corpus_source_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Dataset-card composition report: per (source, lang) cell — document
    count, char mass, floor-mean/min/max doc length, and the cell's share of
    the corpus char mass in ppm. The first table any corpus release ships,
    and the input to mixture-weight decisions (corpus_mix_weighted consumes
    exactly these cells).

    Scale shape: one hash agg on (source, lang) — low-cardinality uniform
    keys, map-side partials — plus a broadcast of the single global-total
    row back onto the cells (scalar cross join)."""
    d = T(spark, sf, "documents")
    cells = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.expr("sum(n_chars) div count(1)").cast("bigint").alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )
    total = d.agg(F.sum("n_chars").cast("bigint").alias("corpus_chars"))
    return cells.crossJoin(F.broadcast(total)).select(
        "source",
        "lang",
        "n_docs",
        "total_chars",
        "avg_chars",
        "min_chars",
        "max_chars",
        F.expr("(total_chars * 1000000) div corpus_chars")
        .cast("bigint")
        .alias("char_share_ppm"),
    )


CORPUS_SOURCE_STATS_SQL = """
WITH cells AS (
  SELECT source, lang,
         count(*)::BIGINT AS n_docs,
         sum(n_chars)::BIGINT AS total_chars,
         (sum(n_chars) // count(*))::BIGINT AS avg_chars,
         min(n_chars) AS min_chars,
         max(n_chars) AS max_chars
  FROM documents GROUP BY source, lang
), total AS (
  SELECT sum(n_chars)::BIGINT AS corpus_chars FROM documents
)
SELECT source, lang, n_docs, total_chars, avg_chars, min_chars, max_chars,
       ((total_chars * 1000000) // corpus_chars)::BIGINT AS char_share_ppm
FROM cells, total
"""


# --------------------------------------------------------------------------
# HITS hubs/authorities over the directed supplier→part graph
# --------------------------------------------------------------------------

HITS_ITERS = 3


def hits_top_nodes(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 nodes by (authority, hub) from 3-iteration integer HITS over
    the DIRECTED supplier→part purchase graph — Kleinberg's
    hubs-and-authorities, the crawl-prioritization complement to PageRank
    (a hub is worth fetching because it links to many authorities; on this
    bipartite graph suppliers are pure hubs and parts pure authorities,
    so both score vectors are exercised). Bit-exact vs the SQL oracle via
    int64 max-norm fixed point (operators/graph.hits_int)."""
    from spider_go_spark.operators.graph import hits_int

    li = T(spark, sf, "lineitem").select("l_suppkey", "l_partkey").distinct()
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey") + PART_NODE_OFFSET).cast("long").alias("dst"),
    )
    scores = hits_int(edges, HITS_ITERS)
    return scores.orderBy(
        F.col("auth_u").desc(), F.col("hub_u").desc(), "node"
    ).limit(20)


def _hits_sql() -> str:
    from spider_go_spark.operators.graph import hits_oracle_sql

    edges_cte = f"""
WITH pairs AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
edges AS (
  SELECT l_suppkey::BIGINT AS src, (l_partkey + {PART_NODE_OFFSET})::BIGINT AS dst FROM pairs
)"""
    return (
        hits_oracle_sql(edges_cte, HITS_ITERS)
        + f"""
SELECT h.node, h.hub_u, a.auth_u
FROM hub{HITS_ITERS} h JOIN auth{HITS_ITERS} a USING (node)
ORDER BY a.auth_u DESC, h.hub_u DESC, h.node LIMIT 20
"""
    )


# --------------------------------------------------------------------------
# Document chunking: fixed-size overlapping token windows (training inputs)
# --------------------------------------------------------------------------

CHUNK_W = 32  # tokens per chunk
CHUNK_STRIDE = 24  # overlap = W - stride


def chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Split every document into fixed-size overlapping token windows —
    the doc→chunk explosion a pretraining/RAG pipeline runs before
    embedding or packing (the complement of pack_sequences). Each chunk
    row carries (doc_id, chunk_idx, n_tokens, chunk_hash); the hash is a
    left fold of the chunk's token hashes in the engine's int64 family, so
    chunk identity is comparable (and dedupable) cross-engine.

    Scale shape: pure per-row Catalyst HOFs (tokenize once, slice per
    chunk, fold) — a map-only stage with output fan-out ~n_tokens/stride;
    no shuffle at all."""
    d = T(spark, sf, "documents")
    th = d.select(
        "doc_id", tk.token_hashes(F.col("text")).alias("th")
    ).repartition(spark.sparkContext.defaultParallelism, "doc_id")
    n = F.size("th")
    # chunk starts: 0, stride, 2·stride, … while start < n (last chunk may
    # be short); docs shorter than one stride yield exactly one chunk
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        (n + CHUNK_STRIDE - 1) / F.lit(CHUNK_STRIDE)
    ).cast("int")
    chunks = th.select(
        "doc_id",
        "th",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).filter(
        # chunk_idx >= 0 guards the empty-doc case: n_chunks = 0 makes
        # sequence(0, -1) = [0, -1] (Spark sequences step DOWN), and the
        # start-bound alone would admit the spurious chunk_idx = -1 row
        # the oracle's range(0, 0) never emits
        (F.col("chunk_idx") >= 0)
        & (F.col("chunk_idx") * CHUNK_STRIDE < F.size("th"))
    )
    piece = F.slice(
        F.col("th"), F.col("chunk_idx") * CHUNK_STRIDE + 1, CHUNK_W
    )
    fold = F.aggregate(
        piece,
        F.lit(0).cast("long"),
        lambda a, h: (a * F.lit(tk.COMBINE_A) + h) % F.lit(tk.POLY_P),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size(piece).cast("bigint").alias("n_tokens"),
        fold.alias("chunk_hash"),
    )


CHUNK_DOCUMENTS_SQL = rf"""
WITH th AS (
  SELECT doc_id,
         list_transform(
           list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0),
           t -> list_reduce(
                  list_prepend(0::BIGINT,
                    list_transform(string_split(t, ''), c -> unicode(c)::BIGINT)),
                  (a, b) -> (a*31 + b) % 1000000007)) AS th
  FROM documents
), c AS (
  SELECT doc_id, th,
         unnest(range(0, CASE WHEN len(th) <= 0 THEN 0
                              ELSE (len(th) + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} END)) AS chunk_idx
  FROM th
), p AS (
  SELECT doc_id, chunk_idx,
         th[chunk_idx*{CHUNK_STRIDE} + 1 : chunk_idx*{CHUNK_STRIDE} + {CHUNK_W}] AS piece
  FROM c WHERE chunk_idx*{CHUNK_STRIDE} < len(th)
)
SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
       len(piece)::BIGINT AS n_tokens,
       list_reduce(list_prepend(0::BIGINT, piece),
                   (a, b) -> (a*{tk.COMBINE_A} + b) % {tk.POLY_P}) AS chunk_hash
FROM p
"""


# --------------------------------------------------------------------------
# BPE merge candidates: the first tokenizer-training iteration
# --------------------------------------------------------------------------

BPE_TOP = 20


def bpe_merge_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """The first iteration of BPE tokenizer training: count every adjacent
    character pair inside corpus tokens, weighted by token frequency, and
    return the top-20 merge candidates — what `learn_bpe` computes before
    its first merge.

    Scale shape: token counting is one hash agg on the token string
    (uniform keys); pair explosion runs over DISTINCT tokens only (the
    classic BPE-training trick — vocabulary is tiny next to the corpus),
    so the second agg is over |vocab|·avg_len rows, not corpus size."""
    d = T(spark, sf, "documents")
    vocab = (
        d.select(F.explode(tk.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    chars = F.split(F.col("tok"), "")
    pairs = vocab.select(
        "freq",
        F.explode(
            F.zip_with(
                F.slice(chars, 1, F.size(chars) - 1),
                F.slice(chars, 2, F.size(chars) - 1),
                lambda a, b: F.concat(a, F.lit("|"), b),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("weight"))
        .orderBy(F.col("weight").desc(), "pair")
        .limit(BPE_TOP)
    )


BPE_MERGE_PAIRS_SQL = rf"""
WITH vocab AS (
  SELECT tok, count(*)::BIGINT AS freq
  FROM (
    SELECT unnest(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)) AS tok
    FROM documents
  ) GROUP BY tok
), pairs AS (
  SELECT freq,
         unnest(list_transform(range(1, length(tok)),
                i -> tok[i:i] || '|' || tok[i+1:i+1])) AS pair
  FROM vocab WHERE length(tok) >= 2
)
SELECT pair, sum(freq)::BIGINT AS weight
FROM pairs GROUP BY pair
ORDER BY weight DESC, pair LIMIT {BPE_TOP}
"""


BPE_TRAIN_STEPS = 10


def bpe_train_merges(spark: SparkSession, sf: str) -> DataFrame:
    """FULL BPE tokenizer training (Sennrich et al. 2016 ``learn_bpe``),
    not just the first candidate count: iterate BPE_TRAIN_STEPS greedy
    merges — each step counts adjacent symbol pairs weighted by token
    frequency, picks the max (ties broken by the 'left right' string — a
    strict total order both engines compare identically, symbols can never
    contain the space separator), and rewrites every vocabulary word's
    symbol sequence with that merge applied left-to-right non-overlapping.
    Output: the learned merge table (step, left, right, weight) — the
    artifact a training-data pipeline ships to its tokenizer.

    The merge rewrite is a pure fold: append each symbol, except when the
    accumulator ends with `left` and the symbol is `right` — then replace
    the tail with the fused symbol. No just-merged flag is needed because
    left+right can never equal `left` (symbols are non-empty), so a fused
    tail never re-triggers the rule — which is also why repeatedly
    replacing the LEFTMOST occurrence (the DuckDB oracle's recursive CTE)
    is provably the same greedy scan.

    Scale shape: the corpus is touched ONCE (the token-frequency hash
    agg); every training step then runs over the DISTINCT-token vocabulary
    only — a tiny pair agg + a 1-row top-1 collect + a map-side fold
    rewrite, with eager localCheckpoint truncating the per-step lineage
    exactly like the PageRank loop. At 10^10 docs the vocabulary is
    O(10^7) words — the steps cost nothing next to the one corpus scan."""
    merges, _ = _bpe_train(spark, sf)
    return spark.createDataFrame(
        merges, "step int, left string, right string, weight bigint"
    )


def _bpe_train(spark: SparkSession, sf: str):
    """Shared training loop: returns (merge list, final segmented vocab
    DataFrame (freq, syms)) — bpe_train_merges reports the merges,
    bpe_vocab_symbols tokenizes the corpus with them."""
    d = T(spark, sf, "documents")
    chars = F.split(F.col("tok"), "")
    v = (
        d.select(F.explode(tk.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .select("freq", chars.alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, BPE_TRAIN_STEPS + 1):
        n = F.size("syms")
        pairs = v.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, n - 1),
                    F.slice("syms", 2, n - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("freq").cast("bigint").alias("w"))
            .orderBy(
                F.col("w").desc(),
                F.concat(F.col("p.l"), F.lit(" "), F.col("p.r")).asc(),
            )
            .limit(1)
            .collect()  # exactly one row per step (convention: scalar probe)
        )
        if not best:
            break
        left, right, w = best[0]["p"]["l"], best[0]["p"]["r"], int(best[0]["w"])
        merges.append((step, left, right, w))
        fused = left + right
        merged = F.aggregate(
            "syms",
            F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (s == F.lit(right)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(fused))
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        v = v.select("freq", merged.alias("syms")).localCheckpoint(eager=True)
    return merges, v


def _bpe_train_sql() -> str:
    """Unrolled recursive-CTE oracle for :func:`bpe_train_merges` (the
    trigram-SBO unrolling pattern): per step, a MATERIALIZED pair count +
    top-1, then a recursive CTE that repeatedly replaces the LEFTMOST
    ' left right ' occurrence in each word's space-joined symbol string —
    provably the same greedy merge as the Spark fold (see the builder's
    docstring). MATERIALIZED is load-bearing: without it DuckDB inlines
    each step's CTEs into the next, exponentially re-evaluating the
    chain."""
    steps = []
    for s in range(1, BPE_TRAIN_STEPS + 1):
        prev = f"v{s-1}"
        pat = f"' ' || (SELECT l FROM b{s}) || ' ' || (SELECT r FROM b{s}) || ' '"
        rep = f"' ' || (SELECT l FROM b{s}) || (SELECT r FROM b{s}) || ' '"
        steps.append(f"""
p{s} AS MATERIALIZED (
  SELECT (pr).l AS l, (pr).r AS r, sum(freq)::BIGINT AS w
  FROM (
    SELECT freq, unnest(list_transform(range(1, len(syms)),
                 i -> {{'l': syms[i], 'r': syms[i+1]}})) AS pr
    FROM (SELECT freq, list_filter(string_split(seg, ' '), x -> x <> '') AS syms
          FROM {prev})
  ) GROUP BY 1, 2
),
b{s} AS MATERIALIZED (SELECT l, r, w FROM p{s} ORDER BY w DESC, l || ' ' || r ASC LIMIT 1),
r{s} AS (
  SELECT tok, freq, seg FROM {prev}
  UNION ALL
  SELECT tok, freq,
         substr(seg, 1, instr(seg, {pat}) - 1) || {rep}
           || substr(seg, instr(seg, {pat}) + length({pat}))
  FROM r{s}
  WHERE instr(seg, {pat}) > 0
),
v{s} AS MATERIALIZED (SELECT tok, freq, seg FROM r{s} WHERE instr(seg, {pat}) = 0)""")
    union = " UNION ALL ".join(
        f"SELECT {s} AS step, l AS left, r AS right, w AS weight FROM b{s}"
        for s in range(1, BPE_TRAIN_STEPS + 1)
    )
    return (
        r"""WITH RECURSIVE v0 AS MATERIALIZED (
  SELECT tok, count(*)::BIGINT AS freq,
         ' ' || array_to_string(list_transform(range(1, length(tok)+1),
                i -> tok[i:i]), ' ') || ' ' AS seg
  FROM (
    SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                  t -> length(t) > 0)) AS tok
    FROM documents
  ) GROUP BY tok
),"""
        + ",".join(steps)
        + f"\nSELECT * FROM ({union}) ORDER BY step"
    )


BPE_TRAIN_MERGES_SQL = _bpe_train_sql()


BPE_SYMBOL_TOP = 20


def bpe_vocab_symbols(spark: SparkSession, sf: str) -> DataFrame:
    """The APPLY side of the trained tokenizer: segment the corpus with
    the BPE_TRAIN_STEPS learned merges and report the top-20 subword
    symbols by corpus frequency (freq = Σ over vocabulary words of
    word_freq · occurrences in the word's final segmentation; ties broken
    by symbol ASC). This is what a training pipeline ships next to the
    merge table — the effective subword vocabulary and its mass, the
    fertility/coverage dashboard for the tokenizer it just trained.

    Scale shape: identical to training (one corpus scan, then
    vocabulary-only folds) plus one explode + hash agg over the final
    |vocab|·avg_syms segmentation — still never corpus-sized."""
    _, v = _bpe_train(spark, sf)
    return (
        v.select("freq", F.explode("syms").alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("freq").cast("bigint").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("symbol"))
        .limit(BPE_SYMBOL_TOP)
    )


def _bpe_vocab_symbols_sql() -> str:
    """Oracle: the training chain's final vocab CTE (v{N}) exploded back
    to symbols — shares every training-step CTE with the train oracle."""
    train = _bpe_train_sql()
    prefix = train[: train.rindex("\nSELECT * FROM (")]
    return (
        prefix
        + f"""
SELECT symbol, sum(freq)::BIGINT AS freq
FROM (
  SELECT freq, unnest(list_filter(string_split(seg, ' '), x -> x <> '')) AS symbol
  FROM v{BPE_TRAIN_STEPS}
)
GROUP BY symbol
ORDER BY freq DESC, symbol ASC
LIMIT {BPE_SYMBOL_TOP}
"""
    )


BPE_VOCAB_SYMBOLS_SQL = _bpe_vocab_symbols_sql()


# --------------------------------------------------------------------------
# Filter funnel: per-stage rejection yield of the corpus filter pipeline
# --------------------------------------------------------------------------


def filter_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-filter yield report: classify every document by the FIRST
    pipeline stage that rejects it (too_short → low_stopword → exact_dup →
    kept) and count docs + chars per stage — the funnel/yield table every
    production data pipeline publishes per snapshot.

    Scale shape: the token tests are a pure map stage; the only shuffle is
    the md5-keyed dup count (uniform keys), re-joined on the same key. The
    final agg is over ≤ 4 rows. All decisions are exact-integer, so the
    DuckDB oracle matches bit-for-bit."""
    d = T(spark, sf, "documents")
    toks = tk.tokens(F.col("text"))
    sw = F.array(*[F.lit(w) for w in ["the", "a", "of", "and", "to"]])
    scored = d.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.md5("text").alias("text_md5"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        .cast("long")
        .alias("n_stop"),
    )
    dups = scored.groupBy("text_md5").agg(
        F.count(F.lit(1)).alias("md5_n"), F.min("doc_id").alias("md5_first")
    )
    j = scored.join(dups, "text_md5")
    stage = (
        F.when(F.col("n_tokens") < 16, F.lit("1_too_short"))
        .when(F.col("lang") != "en", F.lit("2_non_english"))
        # stop_ratio < 0.05 as exact ints: 20·n_stop < n_tokens
        .when(F.col("n_stop") * 20 < F.col("n_tokens"), F.lit("3_low_stopword"))
        .when(
            (F.col("md5_n") >= 2) & (F.col("doc_id") != F.col("md5_first")),
            F.lit("4_exact_dup"),
        )
        .otherwise(F.lit("5_kept"))
    )
    return (
        j.groupBy(stage.alias("stage"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


from spider_go_spark.functions.textkernel import (  # noqa: E402
    CDC_MASK,
    CDC_P,
    CDC_POWS,
    CDC_W,
    UNI_NMAX,
)

CDC_TOP = 20

UNI_MIN = 5  # support floor for multi-char pieces
UNI_TOP = 48  # multi-char piece budget (1-grams always kept: segmentability)
UNI_OUT = 20


def unigram_viterbi_pieces(spark: SparkSession, sf: str) -> DataFrame:
    """SentencePiece-style unigram-LM tokenization (Kudo 2018), the other
    major tokenizer family next to BPE: build a piece inventory from the
    corpus (every 1-gram — so any token is segmentable — plus the top
    UNI_TOP 2..4-grams with support ≥ UNI_MIN), give each piece the exact
    integer cost ``cost_u = log2_q20(Σcnt, cnt)`` (≙ −log P(piece) in Q20,
    via the shared shift-and-square kernel — bit-identical on every
    engine), Viterbi-segment every vocabulary word to the MINIMUM total
    cost (ties → fewest pieces, then the shortest final piece — a strict
    total order both engines implement identically), and report the
    top-20 pieces by corpus-weighted usage. This is the inference step a
    unigram-LM tokenizer runs per document at training-data scale.

    Scale shape: gram counting and the usage aggregation are
    vocabulary-scale hash aggs (never corpus-scale); the piece model is
    ≤ alphabet + UNI_TOP rows collected once (the PQ-codebook bounded-
    model convention) with costs computed driver-side by the SAME integer
    kernel the oracle replays; the Viterbi DP is a vectorized-per-batch
    Arrow map over vocabulary words (O(len·4) integer ops each).
    Oracle: the DP replayed as a recursive CTE that carries the trailing
    UNI_NMAX states (cost, n_pieces, piece list) through each position —
    struct sort gives the same composite argmin."""
    from spider_go_spark.functions.intmath import int_log2_q20

    d = T(spark, sf, "documents")
    vocab = (
        d.select(F.explode(tk.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .localCheckpoint(eager=True)  # feeds gram count AND segmentation
    )
    per_n = [
        F.when(
            F.length("tok") >= n,
            F.expr(
                f"transform(sequence(1, length(tok) - {n} + 1),"
                f" i -> substring(tok, i, {n}))"
            ),
        ).otherwise(F.expr("array()"))
        for n in range(1, UNI_NMAX + 1)
    ]
    grams = (
        vocab.select("freq", F.explode(F.flatten(F.array(*per_n))).alias("gram"))
        .groupBy("gram")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    ones = grams.filter(F.length("gram") == 1).collect()
    multi = (
        grams.filter((F.length("gram") >= 2) & (F.col("cnt") >= UNI_MIN))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(UNI_TOP)
        .collect()
    )
    cnts = {r["gram"]: int(r["cnt"]) for r in [*ones, *multi]}
    total = sum(cnts.values())
    cost = {g: int_log2_q20(total, c) for g, c in cnts.items()}

    from spider_go_spark.functions.arrowkernels import make_unigram_segmenter

    segment = make_unigram_segmenter(cost)

    return (
        vocab.select("freq", F.explode(segment(F.col("tok"))).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("used"))
        .orderBy(F.desc("used"), F.asc("piece"))
        .limit(UNI_OUT)
    )


def _unigram_viterbi_sql() -> str:
    from spider_go_spark.functions.intmath import log2_q20_duckdb_ctes

    ns = ", ".join(str(n) for n in range(1, UNI_NMAX + 1))
    # candidate struct per l: prev state slot (a=dp[i], b=dp[i-1], …),
    # piece = the l chars ending at position i+1 (substr start i+2-l)
    slots = ["ac, an, ap", "bc, bn, bp", "cc, cn, cp", "dc, dn, dp_"]
    cands = []
    for l in range(1, UNI_NMAX + 1):
        pc, pn, pp = slots[l - 1].split(", ")
        cands.append(
            f"CASE WHEN t.{pc} IS NOT NULL AND q{l}.cost_u IS NOT NULL THEN "
            f"{{'c': t.{pc} + q{l}.cost_u, 'np': t.{pn} + 1, 'l': {l}, "
            f"'ps': list_append(t.{pp}, substr(t.tok, t.i + 2 - {l}, {l}))}} END"
        )
    joins = "\n    ".join(
        f"LEFT JOIN pcost q{l} ON q{l}.gram = substr(t.tok, t.i + 2 - {l}, {l}) "
        f"AND t.i + 1 >= {l}"
        for l in range(1, UNI_NMAX + 1)
    )
    return rf"""WITH RECURSIVE vocab AS MATERIALIZED (
  SELECT tok, count(*)::BIGINT AS freq
  FROM (
    SELECT unnest(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)) AS tok
    FROM documents
  ) GROUP BY tok
), grams AS MATERIALIZED (
  SELECT gram, sum(freq)::BIGINT AS cnt FROM (
    SELECT v.freq,
           unnest(list_transform(range(1, length(v.tok) - n.n + 2),
                                 i -> substr(v.tok, i, n.n))) AS gram
    FROM vocab v CROSS JOIN (SELECT unnest([{ns}]) AS n) n
    WHERE length(v.tok) >= n.n
  ) GROUP BY gram
), pieces AS MATERIALIZED (
  SELECT gram, cnt FROM grams WHERE length(gram) = 1
  UNION ALL
  SELECT gram, cnt FROM (
    SELECT gram, cnt FROM grams
    WHERE length(gram) >= 2 AND cnt >= {UNI_MIN}
    ORDER BY cnt DESC, gram ASC LIMIT {UNI_TOP}
  )
), pc AS (
  SELECT gram, cnt, (SELECT sum(cnt)::BIGINT FROM pieces) AS total FROM pieces
), {log2_q20_duckdb_ctes("total", "cnt", "pc", "gram")},
pcost AS MATERIALIZED (SELECT gram, log2_q20 AS cost_u FROM lg),
vit AS (
  SELECT v.tok, v.freq, 0 AS i,
         0::BIGINT AS ac, 0::BIGINT AS an, []::VARCHAR[] AS ap,
         NULL::BIGINT AS bc, NULL::BIGINT AS bn, NULL::VARCHAR[] AS bp,
         NULL::BIGINT AS cc, NULL::BIGINT AS cn, NULL::VARCHAR[] AS cp,
         NULL::BIGINT AS dc, NULL::BIGINT AS dn, NULL::VARCHAR[] AS dp_
  FROM vocab v
  UNION ALL
  SELECT tok, freq, i + 1,
         best.c, best.np, best.ps,
         ac, an, ap, bc, bn, bp, cc, cn, cp
  FROM (
    SELECT t.tok, t.freq, t.i, t.ac, t.an, t.ap, t.bc, t.bn, t.bp,
           t.cc, t.cn, t.cp,
           list_sort(list_filter([
             {", ".join(cands)}
           ], x -> x IS NOT NULL))[1] AS best
    FROM vit t
    {joins}
    WHERE t.i < length(t.tok)
  )
)
SELECT piece, sum(freq)::BIGINT AS used
FROM (
  SELECT freq, unnest(ap) AS piece
  FROM vit WHERE i = length(tok)
)
GROUP BY piece
ORDER BY used DESC, piece ASC
LIMIT {UNI_OUT}
"""


UNIGRAM_VITERBI_PIECES_SQL = _unigram_viterbi_sql()


def cdc_chunk_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Content-defined chunking dedup (the FastCDC/rsync family): split
    every document at content-derived boundaries — position i ends a chunk
    iff the polynomial hash of the trailing CDC_W-char window is ≡ 0
    mod CDC_MASK — then report the top-20 most-duplicated chunks
    (n_occurrences, distinct docs, chunk length; ties by hash). Unlike
    fixed-width shingles, CDC boundaries RESYNC after an insertion, so a
    boilerplate block shared by thousands of pages lands in identical
    chunks no matter where it sits in each page — the storage/near-dup
    primitive behind rsync, restic, and chunk-level corpus dedup.

    The window hash is h_i = Σ_j code(c_{i-j})·B^j mod P over the FIXED
    trailing window — each position's boundary decision is independent of
    every other, so the chunker is one vectorized Arrow pass per doc
    (functions/arrowkernels.cdc_chunks_arrow; the pure-HOF form computed
    identical values but paid an interpreted lambda per position×window
    element — ~80 s vs <2 s at sf0.01, the SimHash lesson) and the DuckDB
    oracle is the equivalent list expression. Docs shorter than the window
    form one chunk.

    Scale shape: chunking is a pure Arrow map (O(len·W) vectorized integer
    ops per doc, no shuffle); the only shuffle is the chunk-hash groupBy
    (uniform md5 keys, map-side combined); top-k is
    TakeOrderedAndProject."""
    from spider_go_spark.functions.arrowkernels import cdc_chunks_arrow

    d = T(spark, sf, "documents").filter(F.length("text") > 0)
    c = d.select(
        "doc_id", F.explode(cdc_chunks_arrow(F.col("text"))).alias("chunk")
    )
    return (
        c.groupBy(F.md5("chunk").alias("chunk_md5"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.min(F.length("chunk")).cast("bigint").alias("chunk_len"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("chunk_md5"))
        .limit(CDC_TOP)
    )


_CDC_TERMS_SQL = " + ".join(
    f"codes[i - {j}] * {CDC_POWS[j]}" for j in range(CDC_W)
)

CDC_CHUNK_DEDUP_SQL = f"""
WITH d AS (
  SELECT doc_id, text,
         list_transform(range(1, length(text) + 1), i -> ascii(text[i:i])) AS codes
  FROM documents WHERE length(text) > 0
), b AS (
  SELECT doc_id, text, len(codes) AS n,
         list_filter(range({CDC_W}, len(codes) + 1),
                     i -> (({_CDC_TERMS_SQL}) % {CDC_P}) % {CDC_MASK} = 0) AS bounds
  FROM d
), chunks AS (
  SELECT doc_id,
         unnest(list_transform(
           list_zip(
             list_prepend(1, list_transform(list_filter(bounds, x -> x < n), x -> x + 1)),
             list_append(list_filter(bounds, x -> x < n), n)),
           p -> substr(text, p[1], p[2] - p[1] + 1))) AS chunk
  FROM b
)
SELECT md5(chunk) AS chunk_md5,
       count(*)::BIGINT AS n_occurrences,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       min(length(chunk))::BIGINT AS chunk_len
FROM chunks
GROUP BY 1
ORDER BY n_occurrences DESC, chunk_md5 ASC
LIMIT {CDC_TOP}
"""


FILTER_FUNNEL_SQL = r"""
WITH scored AS (
  SELECT doc_id, lang, n_chars::BIGINT AS n_chars, md5(text) AS text_md5,
         len(tokens)::BIGINT AS n_tokens,
         len(list_filter(tokens, t -> list_contains(['the','a','of','and','to'], t)))::BIGINT AS n_stop
  FROM (
    SELECT *, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
    FROM documents
  )
), dups AS (
  SELECT text_md5, count(*) AS md5_n, min(doc_id) AS md5_first
  FROM scored GROUP BY text_md5
)
SELECT CASE WHEN n_tokens < 16 THEN '1_too_short'
            WHEN lang <> 'en' THEN '2_non_english'
            WHEN n_stop * 20 < n_tokens THEN '3_low_stopword'
            WHEN md5_n >= 2 AND doc_id <> md5_first THEN '4_exact_dup'
            ELSE '5_kept' END AS stage,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS n_chars
FROM scored JOIN dups USING (text_md5)
GROUP BY 1
"""


VOCAB_K = 24  # tokenizer vocabulary size for the OOV gate


def oov_rate(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: build a VOCAB_K-entry vocabulary from
    corpus token frequencies (ties broken by token hash — deterministic
    cross-engine), then report per-document (doc_id, n_tokens, n_oov,
    oov_pm) where n_oov counts tokens outside the vocabulary and oov_pm is
    the integer per-mille OOV rate. This is the coverage check run before
    committing to a tokenizer: a rising OOV rate on new crawl slices means
    the vocab no longer fits the corpus.

    Scale shape: vocab build is one hash agg + top-k (24 rows, collected
    into a broadcast); scoring is explode → broadcast LEFT join → per-doc
    re-agg — the per-token shuffle is keyed by doc_id only in the final
    agg, and the vocab side never leaves the driver-size class."""
    d = T(spark, sf, "documents")
    toks = d.select(
        "doc_id", F.explode(tk.token_hashes(F.col("text"))).alias("tok_hash")
    )
    vocab = (
        toks.groupBy("tok_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok_hash"))
        .limit(VOCAB_K)
        .select("tok_hash", F.lit(1).alias("in_vocab"))
    )
    scored = toks.join(F.broadcast(vocab), "tok_hash", "left")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.expr("1000 * n_oov div n_tokens").alias("oov_pm"),
        )
        .orderBy("doc_id")
    )


OOV_RATE_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), tok_rows AS (
  SELECT doc_id,
         unnest(list_transform(tokens,
            t -> list_reduce(
                   list_prepend(0::BIGINT,
                     list_transform(string_split(t, ''), c -> unicode(c)::BIGINT)),
                   (a, b) -> (a*31 + b) % 1000000007))) AS tok_hash
  FROM toks WHERE len(tokens) > 0
), vocab AS (
  SELECT tok_hash FROM tok_rows
  GROUP BY tok_hash ORDER BY count(*) DESC, tok_hash ASC LIMIT {VOCAB_K}
)
SELECT r.doc_id,
       count(*) AS n_tokens,
       sum(CASE WHEN v.tok_hash IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
       (1000 * sum(CASE WHEN v.tok_hash IS NULL THEN 1 ELSE 0 END)::BIGINT)
         // count(*) AS oov_pm
FROM tok_rows r LEFT JOIN vocab v USING (tok_hash)
GROUP BY r.doc_id
ORDER BY r.doc_id
"""


PMI_SCALE = 1_000_000
PMI_TOP = 20
PMI_MIN_COUNT = 5  # ignore rare bigrams (PMI is noise below a support floor)


def pmi_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Collocation mining: the top-20 adjacent token bigrams by pointwise
    mutual information, ranked with the EXACT integer cross-ratio
    ``pmi_ratio_u = n_ab·N·SCALE div (n_a·n_b)`` (monotone in PMI — the log
    is order-preserving, so ranking needs no floats; a support floor of
    ``n_ab ≥ 5`` drops the rare-pair noise PMI is notorious for).
    Output: (bigram, n_ab, pmi_ratio_u). Tokenizer training and phrase
    detection (word2vec-style) both start from exactly this table.

    Scale shape: bigram counting is one explode (zip_with over two slices —
    no self-join) + hash agg on the bigram string; unigram counts are a
    second hash agg joined back TWICE by token (broadcastable — it's the
    vocabulary); top-k is TakeOrderedAndProject. Overflow (r5 audit): the
    cross-ratio numerator n_ab·N·SCALE is ≤ N²·10^6 — wraps int64 beyond
    N ≈ 3·10^6 corpus tokens, so the product runs in decimal(38,0)
    (Spark) / HUGEINT (DuckDB), the jain_ppm recipe. The RATIO itself is
    ≤ N·SCALE/PMI_MIN_COUNT (worst case n_a = n_b = n_ab), which fits
    int64 for any N < 4.6·10^13 tokens; a runtime assert guards the final
    bigint cast so even that limit can never wrap silently."""
    d = T(spark, sf, "documents")
    toks = d.select("doc_id", tk.tokens(F.col("text")).alias("tokens"))
    n = F.size("tokens")
    big = toks.select(
        F.explode(
            F.zip_with(
                F.slice("tokens", 1, n - 1),
                F.slice("tokens", 2, n - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    uni = (
        toks.select(F.explode("tokens").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_tok"))
    )
    total = uni.agg(F.sum("n_tok").alias("n_total"))
    pairs = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    scored = (
        pairs.filter(F.col("n_ab") >= PMI_MIN_COUNT)
        .join(F.broadcast(uni.select(F.col("tok").alias("w1"), F.col("n_tok").alias("n_a"))), "w1")
        .join(F.broadcast(uni.select(F.col("tok").alias("w2"), F.col("n_tok").alias("n_b"))), "w2")
        .join(F.broadcast(total))
        .select(
            F.concat("w1", F.lit(" "), "w2").alias("bigram"),
            "n_ab",
            F.expr(
                f"cast(n_ab as decimal(38,0)) * n_total * {PMI_SCALE}"
                " div (cast(n_a as decimal(38,0)) * n_b)"
            ).alias("ratio_wide"),
        )
        .select(
            "bigram",
            "n_ab",
            F.expr(
                "CASE WHEN ratio_wide <= 9223372036854775807 "
                "THEN cast(ratio_wide as bigint) "
                "ELSE cast(assert_true(false, 'pmi_collocations: ratio "
                "exceeds int64 (corpus past the 4.6e13-token bound)') "
                "as bigint) END"
            ).alias("pmi_ratio_u"),
        )
    )
    return scored.orderBy(
        F.desc("pmi_ratio_u"), F.desc("n_ab"), F.asc("bigram")
    ).limit(PMI_TOP)


PMI_COLLOCATIONS_SQL = rf"""
WITH toks AS (
  SELECT list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), big AS (
  SELECT unnest(list_transform(range(1, len(tokens)),
           i -> tokens[i] || ' ' || tokens[i+1])) AS bigram
  FROM toks WHERE len(tokens) >= 2
), uni AS (
  SELECT unnest(tokens) AS tok FROM toks
), ucnt AS (
  SELECT tok, count(*)::BIGINT AS n_tok FROM uni GROUP BY tok
), pcnt AS (
  SELECT bigram, count(*)::BIGINT AS n_ab FROM big GROUP BY bigram
  HAVING count(*) >= {PMI_MIN_COUNT}
)
SELECT bigram, n_ab,
       ((n_ab::HUGEINT * (SELECT sum(n_tok) FROM ucnt) * {PMI_SCALE})
         // (a.n_tok::HUGEINT * b.n_tok))::BIGINT AS pmi_ratio_u
FROM pcnt
JOIN ucnt a ON a.tok = string_split(bigram, ' ')[1]
JOIN ucnt b ON b.tok = string_split(bigram, ' ')[2]
ORDER BY pmi_ratio_u DESC, n_ab DESC, bigram ASC
LIMIT {PMI_TOP}
"""


# --------------------------------------------------------------------------
# token_shard_samples — the shard-ready projection (tokenize → fixed-width
# chunk → pad) behind the binary token-shard sink (sources/tokenshards.py).
# The sink itself is gated by bit-exact roundtrip tests; this gate pins the
# (sample_id, tokens) VALUES cross-engine, so the bytes the sink writes are
# oracle-checked one projection earlier.
# --------------------------------------------------------------------------

SHARD_SEQ_LEN = 32


def token_shard_samples(spark: SparkSession, sf: str) -> DataFrame:
    """(sample_id, doc_id, chunk_idx, n_real, tokens) — every document cut
    into SHARD_SEQ_LEN-wide padded token-id samples (poly-hash ids mod
    2^15). Map-only projection; see sources/tokenshards.fixed_width_samples
    for the scale argument."""
    from spider_go_spark.sources.tokenshards import fixed_width_samples

    return fixed_width_samples(T(spark, sf, "documents"), SHARD_SEQ_LEN)


TOKEN_SHARD_SAMPLES_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), ids AS (
  SELECT doc_id,
         list_transform(tokens,
            t -> (list_reduce(
                   list_prepend(0::BIGINT,
                     list_transform(string_split(t, ''), c -> unicode(c)::BIGINT)),
                   (a, b) -> (a*31 + b) % 1000000007) % 32768)::INT) AS ids
  FROM toks
), chunked AS (
  SELECT doc_id, ids, ceil(len(ids)::DOUBLE / {SHARD_SEQ_LEN})::INT AS n_chunks
  FROM ids WHERE len(ids) > 0
), ex AS (
  SELECT doc_id, ids, unnest(range(0, n_chunks))::INT AS chunk_idx FROM chunked
), cut AS (
  SELECT doc_id, chunk_idx,
         ids[chunk_idx*{SHARD_SEQ_LEN}+1 : chunk_idx*{SHARD_SEQ_LEN}+{SHARD_SEQ_LEN}] AS chunk
  FROM ex
)
SELECT (doc_id::BIGINT * {1 << 20} + chunk_idx) AS sample_id, doc_id, chunk_idx,
       len(chunk)::INT AS n_real,
       list_concat(chunk, list_transform(range(0, {SHARD_SEQ_LEN} - len(chunk)),
                                         x -> 0::INT)) AS tokens
FROM cut
"""


# --------------------------------------------------------------------------
# lpa_communities — frequency-based label-propagation community detection
# over the sparsified census graph (deterministic synchronous variant,
# operators/graph.lpa_frequency). Where dedup_groups answers "which docs
# are the same", communities answer "which hosts/pages cluster together"
# — link farms, mirror rings, topical hubs.
# --------------------------------------------------------------------------

LPA_ITERS = 3
LPA_TOP = 20


def lpa_communities(spark: SparkSession, sf: str) -> DataFrame:
    """(community, size) — the LPA_TOP largest communities after
    LPA_ITERS synchronous frequency-LPA rounds on the undirected census
    graph. Scale shape: three equi-key shuffles per round (see
    lpa_frequency), one size agg, one top-k."""
    from spider_go_spark.operators.graph import lpa_frequency

    d = _census_edges_df(spark, sf)
    und = d.unionByName(
        d.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    nodes = und.select(F.col("src").alias("node")).distinct()
    labels = lpa_frequency(nodes, und, LPA_ITERS)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("size"))
        .orderBy(F.col("size").desc(), "community")
        .limit(LPA_TOP)
    )


def _lpa_communities_sql() -> str:
    from spider_go_spark.operators.graph import lpa_frequency_oracle_sql

    return (
        _CENSUS_EDGES
        + """
, e AS MATERIALIZED (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
), nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e)
"""
        + lpa_frequency_oracle_sql(LPA_ITERS)
        + f"""
SELECT label AS community, count(*)::BIGINT AS size
FROM flab{LPA_ITERS} GROUP BY label
ORDER BY size DESC, community LIMIT {LPA_TOP}
"""
    )


# --------------------------------------------------------------------------
# degree_assortativity — Newman (2002): the Pearson correlation of degrees
# across edge endpoints. Positive = hubs link hubs (social-network shape);
# the web graph is famously DISassortative (hubs link leaves) — the single
# scalar a crawl operator quotes about graph shape. All five sums are
# exact int64; only the final r is a double (one division and one sqrt of
# exactly-computed integers — deterministic IEEE in both engines, same
# discipline as the cosine operators).
# --------------------------------------------------------------------------


def degree_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    """(n_dir_edges, sxy, sx, sx2, assortativity) over the symmetrized
    census graph: per directed edge, x = deg(src), y = deg(dst); by
    symmetry Σx = Σy and Σx² = Σy², so r = (n·sxy − sx²) / (n·sx2 − sx²).

    Scale shape: one degree agg (host-dimension keys), two broadcast-able
    joins to stamp endpoint degrees on the edge stream, one single-row
    sum — no windows, no pairs beyond the edges themselves."""
    d = _census_edges_df(spark, sf)
    und = d.unionByName(
        d.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = und.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    e = (
        und.join(deg.withColumnRenamed("deg", "dx"), "src")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("deg").alias("dy")), "dst"
        )
    )
    s = e.agg(
        F.count(F.lit(1)).cast("long").alias("n_dir_edges"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum("dx").alias("sx"),
        F.sum(F.col("dx") * F.col("dx")).alias("sx2"),
    )
    return s.select(
        "n_dir_edges",
        "sxy",
        "sx",
        "sx2",
        (
            (F.col("n_dir_edges") * F.col("sxy") - F.col("sx") * F.col("sx"))
            .cast("double")
            / (F.col("n_dir_edges") * F.col("sx2") - F.col("sx") * F.col("sx"))
            .cast("double")
        ).alias("assortativity"),
    )


DEGREE_ASSORTATIVITY_SQL = (
    _CENSUS_EDGES
    + """
, und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
), deg AS (
  SELECT src, count(*)::BIGINT AS deg FROM und GROUP BY src
), e AS (
  SELECT a.deg AS dx, b.deg AS dy
  FROM und JOIN deg a ON a.src = und.src JOIN deg b ON b.src = und.dst
), s AS (
  SELECT count(*)::BIGINT AS n_dir_edges, sum(dx * dy)::BIGINT AS sxy,
         sum(dx)::BIGINT AS sx, sum(dx * dx)::BIGINT AS sx2
  FROM e
)
SELECT n_dir_edges, sxy, sx, sx2,
       (n_dir_edges * sxy - sx * sx)::DOUBLE
         / (n_dir_edges * sx2 - sx * sx)::DOUBLE AS assortativity
FROM s
"""
)


QUERIES = {
    "token_shard_samples": token_shard_samples,
    "lpa_communities": lpa_communities,
    "degree_assortativity": degree_assortativity,
    "train_split_strata": train_split_strata,
    "oov_rate": oov_rate,
    "pmi_collocations": pmi_collocations,
    "filter_funnel": filter_funnel,
    "chunk_documents": chunk_documents,
    "hits_top_nodes": hits_top_nodes,
    "bpe_merge_pairs": bpe_merge_pairs,
    "bpe_train_merges": bpe_train_merges,
    "bpe_vocab_symbols": bpe_vocab_symbols,
    "cdc_chunk_dedup": cdc_chunk_dedup,
    "unigram_viterbi_pieces": unigram_viterbi_pieces,
    "corpus_mix_weighted": corpus_mix_weighted,
    "contamination_check": contamination_check,
    "pack_sequences": pack_sequences,
    "pagerank_top20": pagerank_top20,
    "opic_top20": opic_top20,
    "bowtie_structure": bowtie_structure,
    "neighbourhood_function": neighbourhood_function,
    "degree_distribution": degree_distribution,
    "wcc_size_histogram": wcc_size_histogram,
    "kcore_census": kcore_census,
    "seed_distance_bfs": seed_distance_bfs,
    "dedup_groups": dedup_groups,
    "canonical_docs": canonical_docs,
    "inverted_index_topterms": inverted_index_topterms,
    "corpus_source_stats": corpus_source_stats,
}

ORACLES = {
    "token_shard_samples": TOKEN_SHARD_SAMPLES_SQL,
    "lpa_communities": _lpa_communities_sql(),
    "degree_assortativity": DEGREE_ASSORTATIVITY_SQL,
    "train_split_strata": TRAIN_SPLIT_STRATA_SQL,
    "oov_rate": OOV_RATE_SQL,
    "pmi_collocations": PMI_COLLOCATIONS_SQL,
    "filter_funnel": FILTER_FUNNEL_SQL,
    "chunk_documents": CHUNK_DOCUMENTS_SQL,
    "hits_top_nodes": _hits_sql(),
    "bpe_merge_pairs": BPE_MERGE_PAIRS_SQL,
    "bpe_train_merges": BPE_TRAIN_MERGES_SQL,
    "bpe_vocab_symbols": BPE_VOCAB_SYMBOLS_SQL,
    "cdc_chunk_dedup": CDC_CHUNK_DEDUP_SQL,
    "unigram_viterbi_pieces": UNIGRAM_VITERBI_PIECES_SQL,
    "corpus_mix_weighted": CORPUS_MIX_WEIGHTED_SQL,
    "contamination_check": CONTAMINATION_CHECK_SQL,
    "pack_sequences": PACK_SEQUENCES_SQL,
    "pagerank_top20": PAGERANK_TOP20_SQL,
    "opic_top20": OPIC_TOP20_SQL,
    "bowtie_structure": BOWTIE_STRUCTURE_SQL,
    "neighbourhood_function": NEIGHBOURHOOD_FUNCTION_SQL,
    "degree_distribution": DEGREE_DISTRIBUTION_SQL,
    "wcc_size_histogram": WCC_SIZE_HISTOGRAM_SQL,
    "kcore_census": KCORE_CENSUS_SQL,
    "seed_distance_bfs": SEED_DISTANCE_BFS_SQL,
    "dedup_groups": DEDUP_GROUPS_SQL,
    "canonical_docs": CANONICAL_DOCS_SQL,
    "inverted_index_topterms": INVERTED_INDEX_SQL,
    "corpus_source_stats": CORPUS_SOURCE_STATS_SQL,
}
