"""Iterative graph algorithms in fixed-point integer arithmetic.

PageRank is the canonical frontier-prioritization signal for a crawl
engine (the reference's scheduler has no ranking beyond FIFO —
SURVEY.md §2.12 — but any 10^10-URL crawl needs one). The twist here is
*bit-exact cross-engine reproducibility*: floating-point PageRank sums
contributions in shuffle order, so two runs (or two engines) disagree in
the last ulp and a value-hash oracle can never pass. Instead ranks are
kept in integer micro-units (SCALE = 10^6) and every operation is int64:

- contribution of u to each out-neighbor: ``rank_u div outdeg(u)``
  (truncating integer division),
- damping: ``floor(s · d)`` for d = DAMPING_PPM/SCALE, computed as
  ``(s div SCALE)·DAMPING_PPM + ((s mod SCALE)·DAMPING_PPM) div SCALE``
  — algebraically identical to ``(s·DAMPING_PPM) div SCALE`` (write
  s = q·SCALE + r; the q term is integral) but every intermediate stays
  below s + SCALE·DAMPING_PPM, so it cannot overflow int64 even when the
  total rank mass of a 10^9-node graph concentrates on one node.

Integer sums are associative and commutative — the groupBy order does not
matter, so the result is identical on any partitioning, any engine.

Scale shape per iteration: one shuffle for the contribution groupBy and a
broadcast-or-shuffle join back to the node list; lineage is truncated with
an eager localCheckpoint each iteration (no CacheManager entries, and the
plan does not grow exponentially with iteration count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000
# largest per-node in-sum whose ·SCALE rescale product still fits int64
# (hits_int runtime bound; see COVERAGE.md int64-bounds table)
_MAX_RESCALE_SUM = 9_223_372_036_854_775_807 // SCALE
DAMPING_PPM = 850_000  # d = 0.85
TELEPORT_U = SCALE - DAMPING_PPM  # (1-d) in micro-units = 150_000


def pagerank_int(edges: DataFrame, iters: int = 5) -> DataFrame:
    """(node, rank_u) after ``iters`` synchronous PageRank iterations over
    ``edges(src, dst)``; rank_u is in micro-units (initial mass = SCALE per
    node). Dangling nodes keep the teleport term only — both sides of the
    oracle implement the same simplified (non-redistributed) contract.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = edges.join(outdeg, "src").localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank_u", F.lit(SCALE).cast("long"))
    for _ in range(iters):
        contrib = e.join(ranks.withColumnRenamed("node", "src"), "src").select(
            F.col("dst").alias("node"), F.expr("rank_u div outdeg").alias("c")
        )
        s = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(s, "node", "left")
            .withColumn("s0", F.coalesce(F.col("s"), F.lit(0).cast("long")))
            .select(
                "node",
                F.expr(
                    f"{TELEPORT_U} + (s0 div {SCALE}) * {DAMPING_PPM}"
                    f" + ((s0 % {SCALE}) * {DAMPING_PPM}) div {SCALE}"
                )
                .cast("long")
                .alias("rank_u"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def hits_int(edges: DataFrame, iters: int = 3) -> DataFrame:
    """(node, hub_u, auth_u) after ``iters`` HITS iterations over DIRECTED
    ``edges(src, dst)`` — Kleinberg's hubs-and-authorities, the classic
    complement to PageRank for crawl prioritization (a good hub page is
    worth fetching because it points at many authorities).

    Same bit-exact cross-engine discipline as :func:`pagerank_int`: scores
    live in int64 micro-units, and the per-iteration normalization is
    ``x·SCALE div max(x)`` (max-norm, not L2 — integer-exact and
    order-independent). Overflow bound: a raw sum is ≤ max_indegree·SCALE;
    the rescale multiplies by SCALE, so max_indegree must stay < ~9·10^6 —
    far above any real host-graph degree after the usual dedup.

    Scale shape per iteration: two equi-join + groupBy shuffles (auth then
    hub) and two single-row max aggregations broadcast back; lineage
    truncated per iteration with eager localCheckpoints."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = edges.localCheckpoint(eager=True)
    hub = nodes.withColumn("hub_u", F.lit(SCALE).cast("long"))
    auth = nodes.withColumn("auth_u", F.lit(0).cast("long"))
    for _ in range(iters):
        a_raw = (
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub_u").alias("s"))
        )
        a_max = a_raw.agg(F.greatest(F.max("s"), F.lit(1)).alias("m"))
        auth = (
            nodes.join(a_raw, "node", "left")
            .crossJoin(F.broadcast(a_max))
            .select(
                "node",
                F.expr(
                    f"CASE WHEN coalesce(s, 0) <= {_MAX_RESCALE_SUM} "
                    f"THEN coalesce(s, 0) * {SCALE} div m "
                    "ELSE cast(assert_true(false, 'hits_int: auth in-sum "
                    "exceeds the int64 rescale bound (max in-degree too "
                    "large for SCALE products)') as bigint) END"
                ).cast("long").alias("auth_u"),
            )
            .localCheckpoint(eager=True)
        )
        h_raw = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth_u").alias("s"))
        )
        h_max = h_raw.agg(F.greatest(F.max("s"), F.lit(1)).alias("m"))
        hub = (
            nodes.join(h_raw, "node", "left")
            .crossJoin(F.broadcast(h_max))
            .select(
                "node",
                F.expr(
                    f"CASE WHEN coalesce(s, 0) <= {_MAX_RESCALE_SUM} "
                    f"THEN coalesce(s, 0) * {SCALE} div m "
                    "ELSE cast(assert_true(false, 'hits_int: hub in-sum "
                    "exceeds the int64 rescale bound (max out-degree too "
                    "large for SCALE products)') as bigint) END"
                ).cast("long").alias("hub_u"),
            )
            .localCheckpoint(eager=True)
        )
    return hub.join(auth, "node")


def pagerank_weighted_int(edges: DataFrame, iters: int = 5) -> DataFrame:
    """(node, rank_u) — weighted PageRank over ``edges(src, dst, w)``: each
    source splits its rank proportionally to edge weight, contribution =
    ``(rank_u·w) div out_w``. The natural rank for collapsed multigraphs
    (e.g. a host graph where w = number of URL-level links between two
    hosts — dropping multiplicity there, as unweighted PageRank would,
    erases exactly the linkage signal the collapse kept).

    Same int64 fixed-point discipline as :func:`pagerank_int` (micro-unit
    SCALE, split damping multiply, simplified dangling contract). Overflow
    bound: rank_u ≤ total mass ≈ N·SCALE, so rank_u·w needs
    N·w_max < 9.2·10^12 — comfortably above any collapsed graph (10^8
    hosts × 10^4 max inter-host links still fits)."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    e = edges.join(outw, "src").localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank_u", F.lit(SCALE).cast("long"))
    for _ in range(iters):
        contrib = e.join(ranks.withColumnRenamed("node", "src"), "src").select(
            F.col("dst").alias("node"),
            # runtime int64 bound (r5 audit): rank_u·w must not wrap —
            # reachable when N·SCALE·w_max ≥ 2^63 (e.g. 10^9 hosts with
            # 10^4-weight edges); non-ANSI Spark would wrap silently
            F.expr(
                "CASE WHEN rank_u <= 9223372036854775807 div w "
                "THEN (rank_u * w) div out_w "
                "ELSE cast(assert_true(false, 'pagerank_weighted_int: "
                "rank_u*w exceeds int64 — rescale weights or shard the "
                "graph') as bigint) END"
            ).alias("c"),
        )
        s = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(s, "node", "left")
            .withColumn("s0", F.coalesce(F.col("s"), F.lit(0).cast("long")))
            .select(
                "node",
                F.expr(
                    f"{TELEPORT_U} + (s0 div {SCALE}) * {DAMPING_PPM}"
                    f" + ((s0 % {SCALE}) * {DAMPING_PPM}) div {SCALE}"
                )
                .cast("long")
                .alias("rank_u"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank_weighted_oracle_sql(edges_cte: str, iters: int = 5) -> str:
    """DuckDB twin of :func:`pagerank_weighted_int`. ``edges_cte`` must
    define ``edges(src, dst, w)``; ends in ``rank{iters}(node, rank_u)``."""
    parts = [
        edges_cte,
        f"""
, nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
            UNION SELECT DISTINCT dst FROM edges),
outw AS (SELECT src, sum(w)::BIGINT AS out_w FROM edges GROUP BY src),
e AS MATERIALIZED (SELECT edges.src, edges.dst, edges.w, outw.out_w
                   FROM edges JOIN outw USING (src)),
rank0 AS (SELECT node, {SCALE}::BIGINT AS rank_u FROM nodes)
""",
    ]
    for i in range(iters):
        parts.append(
            f""", rank{i + 1} AS (
  SELECT n.node,
         ({TELEPORT_U} + (coalesce(a.s, 0) // {SCALE}) * {DAMPING_PPM}
          + ((coalesce(a.s, 0) % {SCALE}) * {DAMPING_PPM}) // {SCALE})::BIGINT AS rank_u
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum((r.rank_u * e.w) // e.out_w)::BIGINT AS s
    FROM e JOIN rank{i} r ON e.src = r.node GROUP BY e.dst
  ) a ON n.node = a.node
)
"""
        )
    return "".join(parts)


def opic_int(edges: DataFrame, iters: int = 4) -> DataFrame:
    """(node, cash_u, hist_u) after ``iters`` synchronous batch rounds of
    OPIC — On-line Page Importance Computation (Abiteboul, Preda & Cobena,
    WWW 2003), the classic *online* frontier prioritizer: unlike PageRank
    it needs no convergence loop over the whole graph, so a crawler can
    read a page's importance estimate (history + cash) at any time while
    the crawl is still running. The reference's scheduler has no ranking
    at all (FIFO — SURVEY.md §2.12); this is the signal a 10^10-URL crawl
    would actually maintain incrementally between rounds.

    Contract (integer-exact, so the DuckDB oracle is bit-identical):
    every node starts with cash = SCALE micro-units and history = 0. Each
    round, simultaneously for all nodes:

    - history += cash (the node is "fetched", banking its cash),
    - each out-neighbor receives ``cash div outdeg``,
    - the truncation remainders plus the full cash of dangling nodes form
      the *virtual-page pot* (OPIC's strong-connectivity device), which is
      redistributed uniformly: every node also receives ``pot div N``.

    Total mass only ever shrinks by truncation (≤ N per round), so all
    values stay bounded by N·SCALE + iters·N·SCALE — int64-safe up to
    ~10^11 nodes. Integer sums are associative/commutative: identical on
    any partitioning, any engine.

    Scale shape per round: one equi-join + groupBy shuffle for the
    contributions, one scalar aggregate for the pot (broadcast back), and
    an eager localCheckpoint to truncate lineage.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_df = nodes.agg(F.count(F.lit(1)).alias("n"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = edges.join(outdeg, "src").localCheckpoint(eager=True)

    state = nodes.select(
        "node",
        F.lit(SCALE).cast("long").alias("cash_u"),
        F.lit(0).cast("long").alias("hist_u"),
    )
    for _ in range(iters):
        # pot = total cash minus what the out-links carry away: per linked
        # node outdeg·(cash div outdeg) leaves, a dangling node sends 0.
        pot_df = (
            state.join(outdeg.withColumnRenamed("src", "node"), "node", "left")
            .agg(
                (
                    F.sum("cash_u")
                    - F.sum(
                        F.when(F.col("outdeg").isNull(), F.lit(0).cast("long")).otherwise(
                            F.expr("outdeg * (cash_u div outdeg)")
                        )
                    )
                ).alias("pot")
            )
        )
        recv = (
            e.join(state.withColumnRenamed("node", "src").select("src", "cash_u"), "src")
            .select(F.col("dst").alias("node"), F.expr("cash_u div outdeg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("r"))
        )
        state = (
            state.join(recv, "node", "left")
            .crossJoin(F.broadcast(pot_df))
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                (F.coalesce(F.col("r"), F.lit(0).cast("long")) + F.expr("pot div n"))
                .cast("long")
                .alias("cash_u"),
                (F.col("hist_u") + F.col("cash_u")).cast("long").alias("hist_u"),
            )
            .localCheckpoint(eager=True)
        )
    return state


def opic_oracle_sql(edges_cte: str, iters: int = 4) -> str:
    """DuckDB twin of :func:`opic_int`: unrolled fixed-iteration CTE chain
    (one pot + recv + state triple per round). ``edges_cte`` must define
    ``edges(src, dst)``; ends in ``state{iters}(node, cash_u, hist_u)``."""
    parts = [
        edges_cte,
        f"""
, nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
            UNION SELECT DISTINCT dst FROM edges),
n_nodes AS (SELECT count(*)::BIGINT AS n FROM nodes),
outdeg AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY src),
e AS MATERIALIZED (SELECT edges.src, edges.dst, outdeg.outdeg
                   FROM edges JOIN outdeg USING (src)),
state0 AS (SELECT node, {SCALE}::BIGINT AS cash_u, 0::BIGINT AS hist_u FROM nodes)
""",
    ]
    for i in range(iters):
        parts.append(
            f""", pot{i} AS (
  SELECT (sum(s.cash_u) - sum(CASE WHEN o.outdeg IS NULL THEN 0
                                   ELSE o.outdeg * (s.cash_u // o.outdeg) END))::BIGINT AS pot
  FROM state{i} s LEFT JOIN outdeg o ON s.node = o.src
), recv{i} AS (
  SELECT e.dst AS node, sum(s.cash_u // e.outdeg)::BIGINT AS r
  FROM e JOIN state{i} s ON e.src = s.node GROUP BY e.dst
), state{i + 1} AS (
  SELECT s.node,
         (coalesce(r.r, 0) + (SELECT pot FROM pot{i}) // (SELECT n FROM n_nodes))::BIGINT AS cash_u,
         (s.hist_u + s.cash_u)::BIGINT AS hist_u
  FROM state{i} s LEFT JOIN recv{i} r ON s.node = r.node
)
"""
        )
    return "".join(parts)


def hits_oracle_sql(edges_cte: str, iters: int = 3) -> str:
    """DuckDB twin of :func:`hits_int`: unrolled CTE chain with scalar-
    subquery max-norms. ``edges_cte`` must define ``edges(src, dst)``;
    ends with ``hub{iters}(node, hub_u)`` and ``auth{iters}(node, auth_u)``."""
    parts = [
        edges_cte,
        f"""
, nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
            UNION SELECT DISTINCT dst FROM edges),
hub0 AS (SELECT node, {SCALE}::BIGINT AS hub_u FROM nodes)
""",
    ]
    for i in range(iters):
        parts.append(
            f""", a{i + 1}r AS MATERIALIZED (
  SELECT e.dst AS node, sum(h.hub_u)::BIGINT AS s
  FROM edges e JOIN hub{i} h ON e.src = h.node GROUP BY e.dst
), auth{i + 1} AS MATERIALIZED (
  SELECT n.node,
         (coalesce(a.s, 0) * {SCALE} // greatest((SELECT max(s) FROM a{i + 1}r), 1))::BIGINT AS auth_u
  FROM nodes n LEFT JOIN a{i + 1}r a ON n.node = a.node
), h{i + 1}r AS MATERIALIZED (
  SELECT e.src AS node, sum(a.auth_u)::BIGINT AS s
  FROM edges e JOIN auth{i + 1} a ON e.dst = a.node GROUP BY e.src
), hub{i + 1} AS MATERIALIZED (
  SELECT n.node,
         (coalesce(h.s, 0) * {SCALE} // greatest((SELECT max(s) FROM h{i + 1}r), 1))::BIGINT AS hub_u
  FROM nodes n LEFT JOIN h{i + 1}r h ON n.node = h.node
)
"""
        )
    return "".join(parts)


def label_propagation_min(nodes: DataFrame, edges: DataFrame, iters: int = 5) -> DataFrame:
    """(node, label) after ``iters`` rounds of min-label propagation —
    the distributed connected-components kernel that turns near-duplicate
    PAIRS (MinHash-LSH / Jaccard output) into dedup GROUPS: every member
    of a component converges to the component's minimum node id, which
    becomes the canonical document of the group.

    ``edges`` must already be bidirectional (src→dst and dst→src); nodes
    with no edges keep their own id (singleton groups). Each round is one
    groupBy-min over (own labels ∪ neighbor labels) — integer min is
    order-independent, so the result is bit-identical on any partitioning
    and any engine, and after k rounds every component with diameter ≤ k
    has fully converged (the fixed-k contract is what the unrolled SQL
    oracle checks; near-dup clusters are shallow, so small k suffices —
    for adversarial long chains, iterate to a fixed point instead).

    Scale shape per round: one shuffle (the union groupBy); the join of
    edges to labels shuffles on src — at 10^10 edges both are plain
    equi-key exchanges, AQE-skew-splittable, no driver state."""
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint(eager=True)
    e = edges.localCheckpoint(eager=True)
    for _ in range(iters):
        nbr = e.join(labels.withColumnRenamed("node", "src"), "src").select(
            F.col("dst").alias("node"), "label"
        )
        labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


def label_propagation_fixed_point(
    nodes: DataFrame, edges: DataFrame, max_iters: int = 64
) -> DataFrame:
    """:func:`label_propagation_min` iterated to a FIXED POINT: rounds run
    until no node's label changes, so components of ANY diameter fully
    converge (the fixed-k variant only guarantees diameter ≤ k — LSH
    chaining can exceed it, silently retaining duplicates).

    Convergence check without a self-join: min-label propagation only ever
    DECREASES a node's label, so the label sum is strictly monotone
    non-increasing and is unchanged iff no label changed. One decimal(38)
    agg per round (int64 sum could wrap at 10^10 nodes × 2^52 keys) —
    driver traffic is a single scalar. ``max_iters`` is a runaway bound
    (diameter can't exceed node count; 64 covers any plausible near-dup
    chain), not a correctness knob."""
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint(eager=True)
    e = edges.localCheckpoint(eager=True)
    dec_sum = F.sum(F.col("label").cast("decimal(38,0)"))
    prev = labels.agg(dec_sum).collect()[0][0]
    for _ in range(max_iters):
        nbr = e.join(labels.withColumnRenamed("node", "src"), "src").select(
            F.col("dst").alias("node"), "label"
        )
        labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        cur = labels.agg(dec_sum).collect()[0][0]
        if cur == prev:
            break
        prev = cur
    return labels


def label_prop_oracle_sql(iters: int = 5) -> str:
    """DuckDB twin of :func:`label_propagation_min` as an unrolled CTE
    chain; expects CTEs ``nodes(node)`` and ``e(src, dst)`` (bidirectional)
    to be defined upstream, defines ``lab0..lab{iters}``."""
    parts = ["\n, lab0 AS (SELECT node, node AS label FROM nodes)\n"]
    for i in range(iters):
        parts.append(
            f""", lab{i + 1} AS MATERIALIZED (
  SELECT node, min(label) AS label FROM (
    SELECT node, label FROM lab{i}
    UNION ALL
    SELECT e.dst AS node, l.label FROM e JOIN lab{i} l ON e.src = l.node
  ) GROUP BY node
)
"""
        )
    return "".join(parts)


def pagerank_oracle_sql(edges_cte: str, iters: int = 5) -> str:
    """DuckDB twin of :func:`pagerank_int`: unrolled fixed-iteration CTE
    chain (standard SQL forbids aggregation in a recursive CTE term, so the
    loop is unrolled — exactly as many joins/groupBys as the Spark plan).
    ``edges_cte`` must define ``edges(src, dst)``; returns a query ending in
    ``rank{iters}(node, rank_u)`` ready for a final SELECT."""
    prelude = f"""
, nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
            UNION SELECT DISTINCT dst FROM edges),
outdeg AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY src),
e AS MATERIALIZED (SELECT edges.src, edges.dst, outdeg.outdeg FROM edges JOIN outdeg USING (src))
"""
    return edges_cte + prelude + pagerank_iters_sql(iters)


def pagerank_iters_sql(iters: int = 5, prefix: str = "rank") -> str:
    """The PageRank iteration CTEs alone (``{prefix}0..{prefix}{iters}``),
    expecting ``nodes(node, …)`` and ``e(src, dst, outdeg)`` CTEs upstream
    — the composition hook for oracles that run PageRank *and* another
    chain (e.g. TrustRank for spam mass) over one shared edge set; same
    contract as :func:`pagerank_oracle_sql`."""
    parts = [f"\n, {prefix}0 AS (SELECT node, {SCALE}::BIGINT AS rank_u FROM nodes)\n"]
    for i in range(iters):
        parts.append(
            f""", {prefix}{i + 1} AS (
  SELECT n.node,
         ({TELEPORT_U} + (coalesce(a.s, 0) // {SCALE}) * {DAMPING_PPM}
          + ((coalesce(a.s, 0) % {SCALE}) * {DAMPING_PPM}) // {SCALE})::BIGINT AS rank_u
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank_u // e.outdeg)::BIGINT AS s
    FROM e JOIN {prefix}{i} r ON e.src = r.node GROUP BY e.dst
  ) a ON n.node = a.node
)
"""
        )
    return "".join(parts)


def trustrank_int(edges: DataFrame, trusted: DataFrame, iters: int = 5) -> DataFrame:
    """(node, trust_u) — TrustRank (Gyöngyi, Garcia-Molina & Pedersen,
    VLDB 2004): PageRank whose teleport mass lands ONLY on a trusted seed
    set, so score flows outward from vetted pages along links and spam
    neighborhoods — reachable mostly from other spam — earn ~none. The
    classic crawl-side spam-demotion signal, paired with plain PageRank
    (high rank + low trust = the spam farm fingerprint).

    ``trusted`` is a one-column ``node`` DataFrame. Init: SCALE micro-units
    per trusted node, 0 elsewhere; per iteration
    ``trust = [node∈trusted]·(1-d)·SCALE + d·Σ in-contrib`` with the same
    overflow-safe split multiplication and int64 fixed-point contract as
    :func:`pagerank_int` (bit-exact vs the unrolled-CTE oracle). Note the
    teleport term is SCALE·TELEPORT_U-scaled per seed, not divided across
    the seed set — both engines share the convention, and per-seed scaling
    keeps every intermediate integral.

    Scale shape: identical to pagerank_int — equi-join + groupBy shuffles
    only, per-iteration eager localCheckpoint truncates lineage; the seed
    flag is a broadcast-sized left join (seed lists are small)."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .join(trusted.select("node").distinct().withColumn("t", F.lit(1)), "node", "left")
        .select("node", F.coalesce(F.col("t"), F.lit(0)).alias("t"))
        .localCheckpoint(eager=True)
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = edges.join(outdeg, "src").localCheckpoint(eager=True)

    ranks = nodes.select(
        "node", F.expr(f"t * {SCALE}").cast("long").alias("trust_u")
    )
    for _ in range(iters):
        contrib = e.join(ranks.withColumnRenamed("node", "src"), "src").select(
            F.col("dst").alias("node"), F.expr("trust_u div outdeg").alias("c")
        )
        s = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(s, "node", "left")
            .withColumn("s0", F.coalesce(F.col("s"), F.lit(0).cast("long")))
            .select(
                "node",
                F.expr(
                    f"t * {TELEPORT_U} + (s0 div {SCALE}) * {DAMPING_PPM}"
                    f" + ((s0 % {SCALE}) * {DAMPING_PPM}) div {SCALE}"
                )
                .cast("long")
                .alias("trust_u"),
            )
            .localCheckpoint(eager=True)
        )
    # re-attach the seed flag for downstream spam-fingerprint joins
    return ranks


def trustrank_oracle_sql(edges_cte: str, trusted_sql: str, iters: int = 5) -> str:
    """DuckDB twin of :func:`trustrank_int` (same unrolled-CTE shape as
    :func:`pagerank_oracle_sql`). ``edges_cte`` must define
    ``edges(src, dst)``; ``trusted_sql`` is a SELECT yielding one ``node``
    column. Ends in ``trust{iters}(node, trust_u)``."""
    parts = [
        edges_cte,
        f"""
, nodes AS MATERIALIZED (
  SELECT an.node, CASE WHEN tr.node IS NULL THEN 0 ELSE 1 END AS t
  FROM (SELECT DISTINCT src AS node FROM edges
        UNION SELECT DISTINCT dst FROM edges) an
  LEFT JOIN (SELECT DISTINCT node FROM ({trusted_sql})) tr ON an.node = tr.node),
outdeg AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY src),
e AS MATERIALIZED (SELECT edges.src, edges.dst, outdeg.outdeg FROM edges JOIN outdeg USING (src)),
trust0 AS (SELECT node, (t * {SCALE})::BIGINT AS trust_u FROM nodes)
""",
    ]
    for i in range(iters):
        parts.append(
            f""", trust{i + 1} AS (
  SELECT n.node,
         (n.t * {TELEPORT_U} + (coalesce(a.s, 0) // {SCALE}) * {DAMPING_PPM}
          + ((coalesce(a.s, 0) % {SCALE}) * {DAMPING_PPM}) // {SCALE})::BIGINT AS trust_u
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r.trust_u // e.outdeg)::BIGINT AS s
    FROM e JOIN trust{i} r ON e.src = r.node GROUP BY e.dst
  ) a ON n.node = a.node
)
"""
        )
    return "".join(parts)


def bfs_levels(edges: DataFrame, seeds: DataFrame, max_hops: int) -> DataFrame:
    """(node, dist) — breadth-first hop distance from the seed set over
    ``edges(src, dst)``, up to ``max_hops`` synchronous expansions: the
    crawl-reachability operator (which pages are within k link hops of the
    seed list, and at what depth — the set a depth-capped crawl will ever
    see, computed without running the crawl).

    Shape per hop: one equi-join frontier⋈edges, a distinct, and one
    left-anti join against the visited set — the exact plan a crawl round's
    dedup uses (operators/seen.py), so BFS here is the *static* twin of the
    frontier loop. Lineage is truncated each hop with an eager
    localCheckpoint; the loop always runs ``max_hops`` expansions (an empty
    frontier joins to empty for free), so there is no per-hop driver-side
    isEmpty() job."""
    dist = (
        seeds.select(F.col("node").cast("long"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = dist.select("node")
    for k in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("dist", F.lit(k))
            .localCheckpoint(eager=True)
        )
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return dist.select("node", F.col("dist").cast("int").alias("dist"))


def bfs_iters_sql(
    seeds_sql: str, max_hops: int, prefix: str = "dist", edges_name: str = "edges"
) -> str:
    """The BFS per-hop CTE chain alone (``{prefix}0..{prefix}{max_hops}``),
    expanding over an upstream CTE named ``edges_name(src, dst)`` — the
    composition hook for oracles that run more than one BFS in a single
    query (e.g. forward + backward reachability for bow-tie structure).
    ``seeds_sql`` is a query producing ``node``."""
    parts = [
        f""",
{prefix}0 AS MATERIALIZED (SELECT DISTINCT node::BIGINT AS node, 0 AS dist FROM ({seeds_sql}))
""",
    ]
    for k in range(1, max_hops + 1):
        parts.append(
            f""", {prefix}nx{k} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS node, {k} AS dist
  FROM {prefix}{k - 1} f JOIN {edges_name} e ON f.node = e.src
  WHERE f.dist = {k - 1} AND e.dst NOT IN (SELECT node FROM {prefix}{k - 1})
), {prefix}{k} AS MATERIALIZED (
  SELECT node, dist FROM {prefix}{k - 1} UNION ALL SELECT node, dist FROM {prefix}nx{k}
)
"""
        )
    return "".join(parts)


def bfs_oracle_sql(edges_cte: str, seeds_sql: str, max_hops: int) -> str:
    """DuckDB twin of :func:`bfs_levels`: unrolled per-hop CTE chain
    (matching the Spark loop join-for-join; CTEs materialized so DuckDB
    doesn't re-derive every prior level per hop). ``edges_cte`` must define
    ``edges(src, dst)``; ``seeds_sql`` is a query producing ``node``;
    returns SQL ending in ``dist{max_hops}(node, dist)``."""
    return edges_cte + bfs_iters_sql(seeds_sql, max_hops)


def hyperball_int(edges: DataFrame, max_hops: int) -> DataFrame:
    """(hop, n_pairs_est) — the neighbourhood function N(h) of a directed
    graph by HyperBall (Boldi & Vigna, 2013): every node carries a
    HyperLogLog sketch of its out-ball (the set it reaches within h hops);
    one hop is "union my ball with my out-neighbors' balls", and HLL union
    is REGISTER-WISE MAX — associative, commutative, idempotent — so the
    whole iteration is an equi-join + groupBy-max, bit-identical on any
    partitioning and any engine. N(h) = Σ_v |ball_v(h)| estimates the
    number of reachable pairs within h hops; the h where N(h) flattens is
    the effective diameter — the census (avg distance, diameter) that is
    flatly impossible to compute exactly at 10^10 nodes but falls out of
    64 registers per node here.

    Register state is kept in LONG format — rows (node, b, m), never an
    array column — so the per-hop state is ≤ 64·N rows that partial-agg
    (map-side max) before every shuffle, and skewed in-degree nodes just
    mean more pre-combined rows, not a bigger per-row payload. Uses the
    same 64-register integer HLL geometry as operators/sketches (raw
    estimator, no small-range correction — documented, and mirrored
    exactly by the oracle). Per-node estimates are ≤ ~1.5·10^9 and the
    hop sum stays int64-safe past 10^9 nodes."""
    from spider_go_spark.operators.sketches import (
        HLL_M,
        HLL_NUM,
        HLL_RANK_CAP,
        hll_bucket,
        hll_rho,
    )

    out = (
        hyperball_node_estimates(edges, max_hops)
        .groupBy("hop")
        .agg(F.sum("est").cast("long").alias("n_pairs_est"))
    )
    return out.orderBy("hop")


def hyperball_node_estimates(edges: DataFrame, max_hops: int) -> DataFrame:
    """(node, hop, est) — per-node HyperBall out-ball size estimates for
    every hop 0..max_hops: the raw per-node readout under
    :func:`hyperball_int` (which sums it into the neighbourhood function)
    and :func:`harmonic_centrality_int` (which differences it per hop).
    Same long-format register discipline and per-hop eager localCheckpoint
    as documented on :func:`hyperball_int`; estimates are monotone
    non-decreasing in hop because registers only ever max-increase."""
    from spider_go_spark.operators.sketches import (
        HLL_M,
        HLL_NUM,
        HLL_RANK_CAP,
        hll_bucket,
        hll_rho,
    )

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = edges.localCheckpoint(eager=True)
    regs = nodes.select(
        "node",
        hll_bucket(F.col("node")).alias("b"),
        hll_rho(F.col("node")).alias("m"),
    ).localCheckpoint(eager=True)

    def _hop_estimate(r: DataFrame, hop: int) -> DataFrame:
        per_node = r.groupBy("node").agg(
            F.sum(F.expr(f"shiftleft(cast(1 as bigint), {HLL_RANK_CAP} - m)")).alias(
                "s_used"
            ),
            F.count(F.lit(1)).cast("long").alias("n_used"),
        )
        est = F.expr(
            f"{HLL_NUM} div (1000 * (s_used + ({HLL_M} - n_used) * {2 ** HLL_RANK_CAP}))"
        )
        return per_node.select(
            "node", F.lit(hop).cast("int").alias("hop"), est.cast("long").alias("est")
        )

    out = _hop_estimate(regs, 0)
    for k in range(1, max_hops + 1):
        nbr = (
            e.alias("e")
            .join(regs.alias("r"), F.col("e.dst") == F.col("r.node"))
            .select(
                F.col("e.src").alias("node"),
                F.col("r.b").alias("b"),
                F.col("r.m").alias("m"),
            )
        )
        regs = (
            regs.unionByName(nbr)
            .groupBy("node", "b")
            .agg(F.max("m").alias("m"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(_hop_estimate(regs, k))
    return out


def harmonic_centrality_int(edges: DataFrame, max_hops: int) -> DataFrame:
    """(node, harm_u) — bounded-hop harmonic centrality by HyperBall
    (Boldi & Vigna 2013, §5: centrality readouts of the per-node ball
    sizes): H(v) = Σ_{h=1..H} (|ball_v(h)| − |ball_v(h−1)|) / h, the
    number of nodes first reached at hop h weighted 1/h. Exact harmonic
    centrality is an all-pairs BFS — flatly impossible at 10^10 nodes;
    the sketch form is ONE extra window + agg over the (H+1)·N per-node
    estimate rows hyperball already produces.

    harm_u is in micro-units: contrib = (est_h − est_{h−1}) · SCALE div h,
    summed. Ball estimates are monotone in h (registers only max-grow), so
    every contribution is ≥ 0; est ≤ ~1.5·10^9 keeps diff·SCALE < 2^51.
    Directed OUT-ball centrality (documented choice): ranks nodes by how
    cheaply they reach the web, the frontier-prioritization signal — flip
    the edges for the classic "how reachable am I" in-ball form."""
    est = hyperball_node_estimates(edges, max_hops)
    w = Window.partitionBy("node").orderBy("hop")
    return (
        est.withColumn("prev", F.lag("est").over(w))
        .filter(F.col("hop") >= 1)
        .withColumn("contrib", F.expr(f"(est - prev) * {SCALE} div hop"))
        .groupBy("node")
        .agg(F.sum("contrib").cast("long").alias("harm_u"))
    )


def harmonic_oracle_sql(edges_cte: str, max_hops: int) -> str:
    """DuckDB twin of :func:`harmonic_centrality_int`: the per-node,
    per-hop estimate CTEs of :func:`hyperball_oracle_sql` kept un-summed,
    then the identical lag-window difference/divide/aggregate."""
    from spider_go_spark.operators.sketches import (
        CMS_AS,
        HASH_P,
        HLL_M,
        HLL_NUM,
        HLL_RANK_BITS,
        HLL_RANK_CAP,
    )

    a = CMS_AS[0]
    cap2 = 2 ** HLL_RANK_CAP

    def est_cte(k: int) -> str:
        return f""", nest{k} AS (
  SELECT node, {k} AS hop,
         ({HLL_NUM} // (1000 * (sum(1::BIGINT << ({HLL_RANK_CAP} - m))
           + ({HLL_M} - count(*))::BIGINT * {cap2})))::BIGINT AS est
  FROM r{k} GROUP BY node
)
"""

    parts = [
        edges_cte,
        f""", nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
            UNION SELECT DISTINCT dst FROM edges),
r0 AS MATERIALIZED (
  SELECT node,
         (((node % {HASH_P}) * {a}) % {HASH_P}) % {HLL_M} AS b,
         coalesce(
           (SELECT min(k.k) + 1 FROM (SELECT unnest(range(0, {HLL_RANK_BITS})) AS k) k
            WHERE (((((node % {HASH_P}) * {a}) % {HASH_P}) // {HLL_M})
                    // (1::BIGINT << k.k)) % 2 = 1),
           {HLL_RANK_CAP}) AS m
  FROM nodes
)""",
        est_cte(0),
    ]
    for k in range(1, max_hops + 1):
        parts.append(
            f""", r{k} AS MATERIALIZED (
  SELECT node, b, max(m) AS m FROM (
    SELECT node, b, m FROM r{k - 1}
    UNION ALL
    SELECT e.src AS node, r.b, r.m FROM edges e JOIN r{k - 1} r ON e.dst = r.node
  ) GROUP BY node, b
)
"""
        )
        parts.append(est_cte(k))
    union = " UNION ALL ".join(f"SELECT * FROM nest{k}" for k in range(max_hops + 1))
    parts.append(
        f"""
, all_est AS (SELECT * FROM ({union}))
, lagged AS (
  SELECT node, hop, est,
         lag(est) OVER (PARTITION BY node ORDER BY hop) AS prev
  FROM all_est
)
SELECT node, sum((est - prev) * {SCALE} // hop)::BIGINT AS harm_u
FROM lagged WHERE hop >= 1 GROUP BY node
"""
    )
    return "".join(parts)


def hyperball_oracle_sql(edges_cte: str, max_hops: int) -> str:
    """DuckDB twin of :func:`hyperball_int`: unrolled per-hop register
    CTEs with the identical integer HLL arithmetic as
    :func:`spider_go_spark.operators.sketches.hll_oracle_sql`.
    ``edges_cte`` must define ``edges(src, dst)``; the final SELECT
    returns (hop, n_pairs_est) for hops 0..max_hops."""
    from spider_go_spark.operators.sketches import (
        CMS_AS,
        HASH_P,
        HLL_M,
        HLL_NUM,
        HLL_RANK_BITS,
        HLL_RANK_CAP,
    )

    a = CMS_AS[0]
    cap2 = 2 ** HLL_RANK_CAP

    def est_cte(k: int) -> str:
        return f""", est{k} AS (
  SELECT {k} AS hop, sum(est)::BIGINT AS n_pairs_est FROM (
    SELECT node,
           {HLL_NUM} // (1000 * (sum(1::BIGINT << ({HLL_RANK_CAP} - m))
             + ({HLL_M} - count(*))::BIGINT * {cap2})) AS est
    FROM r{k} GROUP BY node)
)
"""

    parts = [
        edges_cte,
        f""", nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
            UNION SELECT DISTINCT dst FROM edges),
r0 AS MATERIALIZED (
  SELECT node,
         (((node % {HASH_P}) * {a}) % {HASH_P}) % {HLL_M} AS b,
         coalesce(
           (SELECT min(k.k) + 1 FROM (SELECT unnest(range(0, {HLL_RANK_BITS})) AS k) k
            WHERE (((((node % {HASH_P}) * {a}) % {HASH_P}) // {HLL_M})
                    // (1::BIGINT << k.k)) % 2 = 1),
           {HLL_RANK_CAP}) AS m
  FROM nodes
)""",
        est_cte(0),
    ]
    for k in range(1, max_hops + 1):
        parts.append(
            f""", r{k} AS MATERIALIZED (
  SELECT node, b, max(m) AS m FROM (
    SELECT node, b, m FROM r{k - 1}
    UNION ALL
    SELECT e.src AS node, r.b, r.m FROM edges e JOIN r{k - 1} r ON e.dst = r.node
  ) GROUP BY node, b
)
"""
        )
        parts.append(est_cte(k))
    union = " UNION ALL ".join(f"SELECT * FROM est{k}" for k in range(max_hops + 1))
    parts.append(f"\nSELECT hop, n_pairs_est FROM ({union}) ORDER BY hop\n")
    return "".join(parts)


def bowtie_components(edges: DataFrame, max_hops: int) -> DataFrame:
    """(component, n_nodes) — bow-tie census of a directed graph (Broder
    et al., WWW 2000) under a bounded-hop contract: from the
    best-connected hub (max total degree, ties to the smallest node id)
    run a forward and a backward ``max_hops`` BFS and classify every node
    as ``core`` (both reach), ``in`` (reaches the hub only), ``out``
    (reached from the hub only) or ``other`` (neither — tendrils and
    disconnected pieces). See queries/pipelineops.bowtie_structure for the
    gate query and the matching unrolled-CTE oracle."""
    ends = edges.select(F.col("src").alias("node")).unionByName(
        edges.select(F.col("dst").alias("node"))
    )
    nodes = ends.distinct()
    hub = (
        ends.groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy(F.desc("deg"), "node")
        .limit(1)
        .select("node")
    )
    fwd = bfs_levels(edges, hub, max_hops).select("node")
    bwd = bfs_levels(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        hub,
        max_hops,
    ).select("node")
    cls = (
        nodes.join(fwd.withColumn("in_f", F.lit(1)), "node", "left")
        .join(bwd.withColumn("in_b", F.lit(1)), "node", "left")
        .select(
            F.when(F.col("in_f").isNotNull() & F.col("in_b").isNotNull(), "core")
            .when(F.col("in_b").isNotNull(), "in")
            .when(F.col("in_f").isNotNull(), "out")
            .otherwise("other")
            .alias("component")
        )
    )
    return (
        cls.groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy("component")
    )


def resolve_pointer_chains(edges: DataFrame, max_hops: int) -> DataFrame:
    """Resolve successor chains (redirect hops, alias links, moved-to
    pointers) to their terminal node by POINTER DOUBLING: ``edges(src,
    dst)`` with at most one ``dst`` per ``src`` is a successor forest, and
    each self-join round doubles the resolved depth, so chains up to
    ``max_hops`` need only ⌈log2(max_hops)⌉ equi-join shuffles — the
    scale-correct shape (a naive walk is ``max_hops`` sequential joins; a
    crawl's redirect graph at 10^10 URLs cannot afford 30 of them, but 5
    doubling rounds reach depth 32).

    Returns ``(src, final, hops)`` for every node with an outgoing edge.
    Rows whose successor has no further edge keep their mapping through
    the left join (terminals contribute 0 extra hops). A redirect CYCLE
    never terminates semantically; bounded rounds mean the op still
    returns (with hops capped at 2^rounds), mirroring the hop caps real
    fetchers apply. Lineage is truncated per round with eager
    localCheckpoints like every iterative op in this module.

    Reference parity: spider-go re-queries its dep edges one hop per
    message round-trip (/root/reference/pkg/spider/workflow.go:129,247);
    this collapses hop-at-a-time resolution into log-round joins.
    """
    import math

    cur = edges.select(
        F.col("src"),
        F.col("dst").alias("nxt"),
        F.lit(1).cast("long").alias("hops"),
    ).localCheckpoint(eager=True)
    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    for _ in range(rounds):
        b = cur.select(
            F.col("src").alias("b_src"),
            F.col("nxt").alias("b_nxt"),
            F.col("hops").alias("b_hops"),
        )
        cur = (
            cur.join(b, cur["nxt"] == b["b_src"], "left")
            .select(
                "src",
                F.coalesce("b_nxt", "nxt").alias("nxt"),
                (F.col("hops") + F.coalesce("b_hops", F.lit(0))).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    return cur.withColumnRenamed("nxt", "final")


def salsa_int(edges: DataFrame, iters: int = 3) -> DataFrame:
    """(node, salsa_auth_u) after ``iters`` iterations of the SALSA
    authority chain (Lempel & Moran, "The stochastic approach for
    link-structure analysis", WWW 2000) over DIRECTED ``edges(src, dst)``
    — HITS's random-walk cousin: instead of summing raw neighbor scores,
    every push is DEGREE-NORMALIZED (back along an in-edge with weight
    1/indeg, forward along an out-edge with weight 1/outdeg), which makes
    the ranking far more resistant to tightly-knit link farms than HITS
    (the TKC effect the paper is about — a farm inflates raw sums but not
    normalized walk probabilities).

    Same bit-exact cross-engine discipline as :func:`hits_int`: scores in
    int64 micro-units, truncating integer division for each normalized
    push (``score div indeg``, then ``score div outdeg`` — the leaked
    remainder mass is deterministic and mirrored by the oracle), and a
    ``x·SCALE div max(x)`` max-norm after each full back-forward step.
    Overflow bound: a raw sum is ≤ max_degree·SCALE, so the rescale is
    int64-safe for degrees < ~9·10^6, same bound as HITS.

    Scale shape per iteration: two equi-join + groupBy shuffles (the
    back-step to hubs, the forward-step to authorities) over edge lists
    that carry the degree of their normalizing endpoint (joined ONCE,
    before the loop — not per iteration), plus one single-row max
    broadcast back."""
    indeg = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("indeg")
    )
    auths = indeg.localCheckpoint(eager=True)  # (node, indeg): authority side
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    )
    # per-edge normalizers attached once: e_in carries indeg(dst) for the
    # back-step, e_out carries outdeg(src) for the forward-step
    e_in = (
        edges.join(indeg.withColumnRenamed("node", "dst"), "dst")
        .select("src", "dst", "indeg")
        .localCheckpoint(eager=True)
    )
    e_out = (
        edges.join(outdeg.withColumnRenamed("node", "src"), "src")
        .select("src", "dst", "outdeg")
        .localCheckpoint(eager=True)
    )
    auth = auths.select("node", F.lit(SCALE).cast("long").alias("auth_u"))
    for _ in range(iters):
        # back-step: authority a sends auth_u div indeg(a) along each
        # in-edge (i -> a) to hub i
        h = (
            e_in.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(F.expr("auth_u div indeg")).alias("h_u"))
        )
        # forward-step: hub i sends h_u div outdeg(i) along each out-edge
        a_raw = (
            e_out.join(h.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("h_u div outdeg")).alias("s"))
        )
        a_max = a_raw.agg(F.greatest(F.max("s"), F.lit(1)).alias("m"))
        auth = (
            auths.select("node")
            .join(a_raw, "node", "left")
            .crossJoin(F.broadcast(a_max))
            .select(
                "node",
                F.expr(
                    f"CASE WHEN coalesce(s, 0) <= {_MAX_RESCALE_SUM} "
                    f"THEN coalesce(s, 0) * {SCALE} div m "
                    "ELSE cast(assert_true(false, 'hits_int: auth in-sum "
                    "exceeds the int64 rescale bound (max in-degree too "
                    "large for SCALE products)') as bigint) END"
                ).cast("long").alias("auth_u"),
            )
            .localCheckpoint(eager=True)
        )
    return auth.withColumnRenamed("auth_u", "salsa_auth_u")


def salsa_oracle_sql(edges_cte: str, iters: int = 3) -> str:
    """DuckDB twin of :func:`salsa_int`: unrolled CTE chain with the
    identical degree-normalized integer pushes and max-norm. ``edges_cte``
    must define ``edges(src, dst)``; ends with
    ``salsa{iters}(node, salsa_auth_u)``."""
    parts = [
        edges_cte,
        f"""
, sindeg AS MATERIALIZED (SELECT dst AS node, count(*)::BIGINT AS indeg
                          FROM edges GROUP BY dst),
soutdeg AS MATERIALIZED (SELECT src AS node, count(*)::BIGINT AS outdeg
                         FROM edges GROUP BY src),
salsa0 AS (SELECT node, {SCALE}::BIGINT AS auth_u FROM sindeg)
""",
    ]
    for i in range(iters):
        parts.append(
            f""", sh{i + 1} AS MATERIALIZED (
  SELECT e.src AS node, sum(a.auth_u // d.indeg)::BIGINT AS h_u
  FROM edges e
  JOIN salsa{i} a ON e.dst = a.node
  JOIN sindeg d ON e.dst = d.node
  GROUP BY e.src
), sa{i + 1}r AS MATERIALIZED (
  SELECT e.dst AS node, sum(h.h_u // d.outdeg)::BIGINT AS s
  FROM edges e
  JOIN sh{i + 1} h ON e.src = h.node
  JOIN soutdeg d ON e.src = d.node
  GROUP BY e.dst
), salsa{i + 1} AS MATERIALIZED (
  SELECT n.node,
         (coalesce(a.s, 0) * {SCALE} // greatest((SELECT max(s) FROM sa{i + 1}r), 1))::BIGINT AS auth_u
  FROM sindeg n LEFT JOIN sa{i + 1}r a ON n.node = a.node
)
"""
        )
    parts.append(
        f", salsafinal AS (SELECT node, auth_u AS salsa_auth_u FROM salsa{iters})\n"
    )
    return "".join(parts)


# rank = deg·RANK_BASE + node gives the degree-ordered total order used to
# orient triangle edges; node ids must stay below RANK_BASE.
TRIANGLE_RANK_BASE = 1_000_000


def triangles_per_node(und_edges: DataFrame) -> DataFrame:
    """(node, deg, tri, cc_ppm) — exact per-node triangle counts and local
    clustering coefficients over UNDIRECTED canonical edges ``(a, b)``
    with a < b, distinct, no self-loops.

    Algorithm: degree-ordered edge orientation (the compact-forward /
    node-iterator++ scheme of Latapy, "Main-memory triangle computations
    for very large (sparse (power-law)) graphs", TCS 2008 — the same trick
    every distributed triangle counter uses): orient each edge from the
    endpoint with the SMALLER (degree, node) rank to the larger. Every
    wedge is then generated exactly once, at its minimum-rank vertex, and
    each triangle is found exactly once by closing the wedge with the
    (also oriented) third edge. The wedge fan-out at a hub of degree d is
    O(d²) in a naive scheme but only O(sum over u of oriented-outdeg(u)²)
    here, and oriented out-degree is bounded by O(sqrt(edges)) on any
    graph — THE property that makes triangle counting feasible on
    power-law web graphs where raw hub degrees are huge.

    cc_ppm = 2·tri·10^6 div (deg·(deg−1)) for deg ≥ 2 else 0 — integer
    ppm, bit-exact cross-engine. Scale shape: one degree agg, two
    equi-join shuffles (wedge build, wedge close), one explode + agg."""
    deg = (
        und_edges.select(F.col("a").alias("node"))
        .unionByName(und_edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .localCheckpoint(eager=True)
    )
    ranked = (
        und_edges.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("deg", "deg_a")
        .join(deg.withColumnRenamed("node", "b"), "b")
        .withColumnRenamed("deg", "deg_b")
        .select(
            "a",
            "b",
            (F.col("deg_a") * TRIANGLE_RANK_BASE + F.col("a")).alias("rank_a"),
            (F.col("deg_b") * TRIANGLE_RANK_BASE + F.col("b")).alias("rank_b"),
        )
    )
    oriented = ranked.select(
        F.when(F.col("rank_a") < F.col("rank_b"), F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(F.col("rank_a") < F.col("rank_b"), F.col("b")).otherwise(F.col("a")).alias("v"),
        F.greatest("rank_a", "rank_b").alias("rank_v"),
    ).localCheckpoint(eager=True)
    e1 = oriented.select("u", F.col("v").alias("w1"), F.col("rank_v").alias("r1"))
    e2 = oriented.select("u", F.col("v").alias("w2"), F.col("rank_v").alias("r2"))
    wedges = e1.join(e2, "u").filter(F.col("r1") < F.col("r2"))
    closer = oriented.select(F.col("u").alias("w1"), F.col("v").alias("w2"))
    tri_rows = wedges.join(closer, ["w1", "w2"]).select(
        F.explode(F.array("u", "w1", "w2")).alias("node")
    )
    tri = tri_rows.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("tri"))
    return deg.join(tri, "node", "left").select(
        "node",
        "deg",
        F.coalesce("tri", F.lit(0)).cast("long").alias("tri"),
        F.when(
            F.col("deg") >= 2,
            F.expr(f"2 * coalesce(tri, 0) * {SCALE} div (deg * (deg - 1))"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("cc_ppm"),
    )


def triangles_oracle_sql(und_edges_cte: str) -> str:
    """DuckDB twin of :func:`triangles_per_node`. ``und_edges_cte`` must
    define ``und_edges(a, b)`` canonical (a < b, distinct); ends with
    ``tri_final(node, deg, tri, cc_ppm)``."""
    return (
        und_edges_cte
        + f"""
, tdeg AS MATERIALIZED (
  SELECT node, count(*)::BIGINT AS deg FROM
    (SELECT a AS node FROM und_edges UNION ALL SELECT b FROM und_edges)
  GROUP BY node
), toriented AS MATERIALIZED (
  SELECT CASE WHEN da.deg * {TRIANGLE_RANK_BASE} + e.a < db.deg * {TRIANGLE_RANK_BASE} + e.b
              THEN e.a ELSE e.b END AS u,
         CASE WHEN da.deg * {TRIANGLE_RANK_BASE} + e.a < db.deg * {TRIANGLE_RANK_BASE} + e.b
              THEN e.b ELSE e.a END AS v,
         greatest(da.deg * {TRIANGLE_RANK_BASE} + e.a,
                  db.deg * {TRIANGLE_RANK_BASE} + e.b) AS rank_v
  FROM und_edges e
  JOIN tdeg da ON e.a = da.node
  JOIN tdeg db ON e.b = db.node
), ttris AS MATERIALIZED (
  SELECT e1.u AS n1, e1.v AS n2, e2.v AS n3
  FROM toriented e1
  JOIN toriented e2 ON e1.u = e2.u AND e1.rank_v < e2.rank_v
  JOIN toriented c ON c.u = e1.v AND c.v = e2.v
), tcnt AS MATERIALIZED (
  SELECT node, count(*)::BIGINT AS tri FROM
    (SELECT n1 AS node FROM ttris UNION ALL SELECT n2 FROM ttris
     UNION ALL SELECT n3 FROM ttris)
  GROUP BY node
), tri_final AS (
  SELECT d.node, d.deg, coalesce(t.tri, 0)::BIGINT AS tri,
         CASE WHEN d.deg >= 2
              THEN (2 * coalesce(t.tri, 0) * {SCALE} // (d.deg * (d.deg - 1)))::BIGINT
              ELSE 0 END AS cc_ppm
  FROM tdeg d LEFT JOIN tcnt t ON d.node = t.node
)
"""
    )


def lpa_frequency(nodes: DataFrame, edges: DataFrame, iters: int = 3) -> DataFrame:
    """(node, label) after ``iters`` rounds of SYNCHRONOUS frequency-based
    label propagation (Raghavan et al. 2007) — community detection, the
    denser cousin of :func:`label_propagation_min`: instead of the
    component-wide minimum, every node adopts the label most frequent
    among its neighbors, ties broken by the smaller label. Deterministic
    (the published async/random-order variant is not): synchronous rounds
    + (count DESC, label ASC) argmin make the result bit-identical on any
    partitioning and engine — the same determinism contract as every
    fixed-point op here (pagerank_int's int64 lattice, hits_int max-norm).

    ``edges`` must be bidirectional. Nodes whose neighbors haven't
    changed label since the previous round still recompute (synchronous
    semantics); isolated nodes keep their own id via the left join.

    Scale shape per round: edges⋈labels shuffles on src, the frequency
    count is one (node, label)-keyed hash agg with map-side partials, and
    the argmin is a struct-min groupBy — three equi-key exchanges, no
    windows, no driver state; lineage is truncated per round with an
    eager localCheckpoint like every iterative op in this module."""
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint(eager=True)
    e = edges.localCheckpoint(eager=True)
    for _ in range(iters):
        freq = (
            e.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        best = (
            freq.groupBy("node")
            .agg(F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("label").alias("lb"))).alias("b"))
            .select("node", F.col("b.lb").alias("new_label"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select("node", F.coalesce("new_label", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


def lpa_frequency_oracle_sql(iters: int = 3) -> str:
    """DuckDB twin of :func:`lpa_frequency` as an unrolled CTE chain;
    expects ``nodes(node)`` and ``e(src, dst)`` (bidirectional) upstream,
    defines ``flab0..flab{iters}``."""
    parts = ["\n, flab0 AS (SELECT node, node AS label FROM nodes)\n"]
    for i in range(iters):
        parts.append(
            f""", ffreq{i + 1} AS (
  SELECT e.dst AS node, l.label, count(*)::BIGINT AS cnt
  FROM e JOIN flab{i} l ON l.node = e.src
  GROUP BY e.dst, l.label
), fbest{i + 1} AS (
  SELECT node, min(struct_pack(nc := -cnt, lb := label)).lb AS new_label
  FROM ffreq{i + 1} GROUP BY node
), flab{i + 1} AS (
  SELECT l.node, coalesce(b.new_label, l.label) AS label
  FROM flab{i} l LEFT JOIN fbest{i + 1} b ON b.node = l.node
)
"""
        )
    return "".join(parts)
