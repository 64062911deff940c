"""Similarity-search operators over embedding columns.

Two strategies with one contract (query vectors → top-k neighbors):

- :func:`brute_force_topk` — exact cosine over the full corpus. O(Q·N);
  right when Q is small (queries broadcast, corpus streams, per-query
  window rank). The exactness baseline.
- :func:`lsh_topk` — random-hyperplane LSH bucketing: corpus and queries
  hash to sign-pattern buckets; candidates are same-bucket (optionally
  near-bucket) pairs joined on bucket id — a content-keyed equi-join
  instead of a cross join. Sub-linear candidates at 10^9+ vectors; recall
  tunable via number of planes / multi-probe radius.

spider-go has no vector ops (SURVEY.md §2.12); this is the north-rule
training-data surface ("similarity search: brute-force cosine top-k as the
baseline; an IVF or LSH-bucketed variant as the scale path").

Hyperplane weights are deterministic integer lattices (exact in doubles,
reproducible in any engine — same discipline as the text-kernel hashes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DIMS = 64
LSH_PLANES = 8


def dot(a: Column, b: Column) -> Column:
    """Left-fold double dot product (order-stable across engines)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def plane_weights(h: int, dims: int = DIMS) -> list[int]:
    """Deterministic integer hyperplane h: w(h,d) = ((1103515245·(h·dims+d)
    + 12345) mod 2048) − 1024."""
    return [((1103515245 * (h * dims + d) + 12345) % 2048) - 1024 for d in range(dims)]


def lsh_bucket(emb: Column, planes: int = LSH_PLANES, dims: int = DIMS) -> Column:
    """Sign-pattern bucket id (0 .. 2^planes − 1) for an embedding column."""
    bucket = F.lit(0).cast("bigint")
    for h in range(planes):
        w = F.array(*[F.lit(float(x)) for x in plane_weights(h, dims)])
        bucket = bucket + F.when(dot(emb, w) >= 0, F.lit(2**h).cast("bigint")).otherwise(
            F.lit(0)
        )
    return bucket


def _scored(
    queries: DataFrame, candidates: DataFrame, join_on, k: int
) -> DataFrame:
    """Common scoring tail: cosine + per-query window rank ≤ k."""
    cos = dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
    scored = (
        candidates.join(queries, join_on)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .distinct()  # multi-probe can surface the same pair via several buckets
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w).cast("bigint")).filter(
        F.col("rank") <= k
    )


def _prep(df: DataFrame, id_col: str, emb_col: str, side: str) -> DataFrame:
    pref = {"q": ("query_id", "q_emb", "q_nrm"), "c": ("neighbor_id", "c_emb", "c_nrm")}[side]
    return df.select(
        F.col(id_col).alias(pref[0]),
        F.col(emb_col).alias(pref[1]),
        norm(F.col(emb_col)).alias(pref[2]),
    )


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × streaming corpus."""
    q = F.broadcast(_prep(queries, id_col, emb_col, "q"))
    c = _prep(corpus, id_col, emb_col, "c")
    return _scored(q, c, F.lit(True), k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: the corpus is partitioned into inverted
    lists by nearest centroid (one broadcast centroid pass — the centroid
    set is tiny and ships to every task); each query probes its ``nprobe``
    nearest lists and ranks only those lists' members.

    Deterministic: list assignment ranks by (cosine desc, centroid id asc).
    Centroid choice is the caller's (deterministic anchors here; a k-means
    refinement drops in without changing this operator). At 10^9+ vectors
    the candidate set per query is ~nprobe/C of the corpus, joined on
    centroid id — content-keyed shuffle, no cross join.

    List assignment is a PURE PROJECTION: the (tiny) centroid set is
    collected once at plan-build time and inlined as literal arrays, and the
    per-row nearest-centroid argmax is a ``sort_array`` over per-centroid
    cosine structs — no crossJoin, no Window, no Exchange. At 10^9 vectors ×
    C centroids the previous crossJoin+row_number formulation shuffled
    O(N·C) rows solely to compute a row-local argmax; this form shuffles
    nothing until the centroid-keyed candidate join itself.
    """
    # Tiny dim collect (≙ broadcasting centroids to every task, but folded
    # into the expression tree instead of a join build side). Norms are
    # computed with the SAME norm() expression on the literal arrays, so
    # doubles stay bit-identical with the window-ranked formulation and the
    # DuckDB oracle; Catalyst constant-folds them.
    cent_rows = sorted(
        centroids.select(
            F.col(id_col).alias("centroid_id"), F.col(emb_col).alias("cent_emb")
        ).collect(),
        key=lambda r: r["centroid_id"],
    )
    cent_exprs = []
    for r in cent_rows:
        arr = F.array(*[F.lit(float(x)) for x in r["cent_emb"]])
        cent_exprs.append((r["centroid_id"], arr, norm(arr)))

    def assign(df: DataFrame, side: str, probes: int) -> DataFrame:
        idc, embc, nrmc = {
            "q": ("query_id", "q_emb", "q_nrm"),
            "c": ("neighbor_id", "c_emb", "c_nrm"),
        }[side]
        p = _prep(df, id_col, emb_col, side)
        # (−cos, centroid_id) structs sorted ascending ≡ rank by
        # (cos desc, centroid_id asc) — identical tie-break to the oracle.
        ranked = F.sort_array(
            F.array(
                *[
                    F.struct(
                        (-(dot(F.col(embc), arr) / (F.col(nrmc) * nrm))).alias("negcos"),
                        F.lit(cid).alias("centroid_id"),
                    )
                    for cid, arr, nrm in cent_exprs
                ]
            )
        )
        return p.select(
            idc,
            embc,
            nrmc,
            F.explode(F.slice(ranked, 1, probes)).alias("probe"),
        ).select(idc, embc, nrmc, F.col("probe.centroid_id").alias("centroid_id"))

    q = assign(queries, "q", nprobe)
    c = assign(corpus, "c", 1)
    return _scored(F.broadcast(q), c, "centroid_id", k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = LSH_PLANES,
    probe_radius: int = 1,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket(s)
    — an equi-join on bucket id (shuffle keyed by content, no cross join).

    Multi-probe: each query also probes the buckets within Hamming distance
    ``probe_radius`` of its own sign pattern (radius 1 ⇒ 1 + planes probe
    buckets per query), trading a linear factor in candidates for a large
    recall gain — the standard LSH recall knob. Only the (small) query side
    explodes; the corpus is hashed exactly once."""
    q = _prep(queries, id_col, emb_col, "q").withColumn(
        "bucket0", lsh_bucket(F.col("q_emb"), planes)
    )
    if probe_radius >= 1:
        flips = F.array(
            F.lit(0), *[F.lit(2**h).cast("bigint") for h in range(planes)]
        )
        q = q.withColumn(
            "bucket", F.explode(F.transform(flips, lambda m: F.col("bucket0").bitwiseXOR(m)))
        ).drop("bucket0")
    else:
        q = q.withColumnRenamed("bucket0", "bucket")
    c = _prep(corpus, id_col, emb_col, "c").withColumn(
        "bucket", lsh_bucket(F.col("c_emb"), planes)
    )
    return _scored(F.broadcast(q), c, "bucket", k)
