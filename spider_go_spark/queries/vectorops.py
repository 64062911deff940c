"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

- ``ann_cosine_topk`` — brute-force cosine top-k: the exactness baseline.
  Queries are broadcast; candidates stream; per-query top-k via window rank.
- ``ann_lsh_buckets`` — random-hyperplane LSH bucketing: the scale path
  (bucket-join instead of cross-join). Hyperplane weights are deterministic
  integer lattices so the bucketing is reproducible anywhere.
- ``embedding_near_dup_pairs`` — embedding-cosine near-duplicate detection
  (the dedup-by-embedding operator for training-data pipelines).

Float discipline: dot products fold left-to-right over the array in both
engines (Spark ``aggregate`` ≡ DuckDB ``list_reduce``), which makes the
doubles — and therefore the driver's value hashes — bit-identical; no
rounding needed (verified empirically at sf0.01).

Scale notes (10^9+ vectors): brute force is O(Q·N) — only for small Q with
broadcast; LSH buckets give sub-linear candidate sets with a content-keyed
shuffle (band join), the same pattern as MinHash-LSH in textops. spider-go
has no vector ops (SURVEY.md §2.12); this is north-rule training-data
surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spider_go_spark.queries import T

DIMS = 64
N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 10
LSH_PLANES = 8
NEAR_DUP_THRESHOLD = 0.4


def _dot(a: Column, b: Column) -> Column:
    """Left-fold double dot product (order-stable across engines)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


_DOT_SQL = (
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65),"
    " i -> ({a}[i]::DOUBLE) * ({b}[i]::DOUBLE))), (x, y) -> x + y)"
)


def _dot_sql(a: str, b: str) -> str:
    return _DOT_SQL.format(a=a, b=b)


# --------------------------------------------------------------------------
def ann_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-10 for each query vector (vec_id < 5) over all
    other vectors. Broadcast the query side; rank per query."""
    e = T(spark, sf, "embeddings").select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    j = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
    scored = j.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
    )


ANN_COSINE_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({_dot_sql("embedding", "embedding")}) AS nrm
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_dot_sql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
  FROM e q JOIN e c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
def _plane_weights(h: int) -> list[int]:
    """Deterministic integer hyperplane: w(h,d) = ((1103515245·(h·64+d) + 12345)
    mod 2048) − 1024. Exact in doubles, reproducible in any engine."""
    return [((1103515245 * (h * DIMS + d) + 12345) % 2048) - 1024 for d in range(DIMS)]


def ann_lsh_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Random-hyperplane LSH: 8 sign bits → bucket id per vector. The
    bucket-equi-join replaces the cross join at scale."""
    e = T(spark, sf, "embeddings")
    bucket = F.lit(0).cast("bigint")
    for h in range(LSH_PLANES):
        w = F.array(*[F.lit(float(x)) for x in _plane_weights(h)])
        d = _dot(F.col("embedding"), w)
        bucket = bucket + F.when(d >= 0, F.lit(2**h).cast("bigint")).otherwise(F.lit(0))
    return e.select("vec_id", bucket.alias("bucket"))


def _plane_sql(h: int) -> str:
    w = ",".join(str(float(x)) for x in _plane_weights(h))
    dot = (
        "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65),"
        f" i -> (embedding[i]::DOUBLE) * ([{w}])[i])), (x, y) -> x + y)"
    )
    return f"CASE WHEN {dot} >= 0 THEN {2**h}::BIGINT ELSE 0::BIGINT END"


ANN_LSH_BUCKETS_SQL = (
    "SELECT vec_id, ("
    + " + ".join(_plane_sql(h) for h in range(LSH_PLANES))
    + ") AS bucket FROM embeddings"
)


# --------------------------------------------------------------------------
def embedding_near_dup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.4). Quadratic
    verify stage — at scale, run after ann_lsh_buckets restricts candidates
    to same-bucket pairs."""
    # Eager localCheckpoint (not persist): materializes the norm column once
    # for both join sides without leaking a CacheManager entry per call.
    e = T(spark, sf, "embeddings").select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    ).localCheckpoint(eager=True)
    a = e.select(
        F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("ea"), F.col("nrm").alias("na")
    )
    b = e.select(
        F.col("vec_id").alias("vec_id_b"), F.col("embedding").alias("eb"), F.col("nrm").alias("nb")
    )
    j = a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return j.select("vec_id_a", "vec_id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= NEAR_DUP_THRESHOLD
    )


EMBEDDING_NEAR_DUP_PAIRS_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({_dot_sql("embedding", "embedding")}) AS nrm
  FROM embeddings
)
SELECT vec_id_a, vec_id_b, cosine FROM (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         {_dot_sql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
  FROM e a JOIN e b ON a.vec_id < b.vec_id
) WHERE cosine >= {NEAR_DUP_THRESHOLD}
"""


# --------------------------------------------------------------------------
def ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-bucketed ANN top-k (the scale path): candidates restricted to the
    query's sign-pattern bucket — equi-join on bucket id, never a cross
    join. Same output contract as ann_cosine_topk; recall is tested in
    tests/test_similarity.py."""
    from spider_go_spark.operators.similarity import lsh_topk

    e = T(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    return lsh_topk(e, q, k=TOP_K, planes=LSH_PLANES)


_BUCKET_CTE = (
    "SELECT vec_id, embedding, ("
    + " + ".join(_plane_sql(h) for h in range(LSH_PLANES))
    + f"""
  ) AS bucket,
  sqrt({_dot_sql("embedding", "embedding")}) AS nrm
  FROM embeddings"""
)

# multi-probe radius 1 ≙ candidates within Hamming distance 1 of the
# query's bucket (the exploded-probe equi-join and this inequality join
# produce the same candidate set; the join strategies differ by design —
# the engine's must scale, the oracle's must only be correct)
ANN_LSH_TOPK_SQL = f"""
WITH e AS ({_BUCKET_CTE}),
scored AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_dot_sql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
  FROM e q JOIN e c ON bit_count(xor(c.bucket, q.bucket)) <= 1 AND c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
N_CENTROIDS = 16  # deterministic anchors: vec_id < 16
IVF_NPROBE = 2


def ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-bucketed ANN top-k: corpus partitioned into inverted lists by
    nearest deterministic anchor centroid; queries probe their 2 nearest
    lists. Same output contract as the other ANN queries."""
    from spider_go_spark.operators.similarity import ivf_topk

    e = T(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    cent = e.filter(F.col("vec_id") < N_CENTROIDS)
    return ivf_topk(e, q, cent, k=TOP_K, nprobe=IVF_NPROBE)


ANN_IVF_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({_dot_sql("embedding", "embedding")}) AS nrm
  FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, embedding AS cent_emb, nrm AS cent_nrm
  FROM e WHERE vec_id < {N_CENTROIDS}
), assigned AS (
  SELECT vec_id, embedding, nrm, centroid_id, crank FROM (
    SELECT v.vec_id, v.embedding, v.nrm, c.centroid_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_dot_sql("v.embedding", "c.cent_emb")} / (v.nrm * c.cent_nrm) DESC,
                      c.centroid_id ASC) AS crank
    FROM e v CROSS JOIN cent c
  )
), scored AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_dot_sql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
  FROM assigned q JOIN assigned c
    ON c.centroid_id = q.centroid_id AND c.crank = 1 AND c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES} AND q.crank <= {IVF_NPROBE}
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# k-means step (Lloyd iteration) — integer fixed-point, value-exact oracle
# --------------------------------------------------------------------------

KM_K = 8
KM_SCALE = 1_000_000
# embeddings live in ~[-1, 1]; shifting the scaled ints by +KM_SHIFT makes
# every value (and every per-dim sum) non-negative, so integer division is
# floor division on BOTH engines (Spark `div` and DuckDB `//` truncate
# toward zero — identical to floor only for non-negative operands)
KM_SHIFT = 1_000_000


def kmeans_step(spark: SparkSession, sf: str) -> DataFrame:
    """One exact Lloyd iteration over the embeddings: quantize to int64
    fixed-point (floor(x·10^6), shifted non-negative), seed centroids from
    vec_id < KM_K, assign every vector to its nearest centroid by integer
    squared-L2 (ties → smallest centroid id), and emit per cluster: size,
    inertia (Σ min-d²), and the updated centroid (element-wise floor-mean,
    unshifted, comma-joined in dim order). Integer arithmetic end-to-end —
    bit-identical on any engine and any partitioning, like pagerank_int.

    Scale shape (10^9 vectors): centroids broadcast (K rows); assignment is
    a map-side broadcast join + per-vector struct-min hash agg — NO window,
    no O(N·C) shuffle (the IVF lesson); the centroid update explodes to
    (cluster, dim) keys whose partial sums combine map-side, so the shuffle
    carries ≤ K·D rows per task regardless of N."""
    e = T(spark, sf, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(float(KM_SCALE))).cast("long")
            + F.lit(KM_SHIFT),
        ).alias("v"),
    )
    cent = e.filter(F.col("vec_id") < KM_K).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("v").alias("cv")
    )
    j = e.crossJoin(F.broadcast(cent))
    d2 = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = j.select("vec_id", "v", "cid", d2.alias("d2"))
    # deterministic argmin: struct-min on (d2, cid); v rides along, never
    # compared ((d2, cid) is unique within a vec_id group)
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct(F.col("d2"), F.col("cid"), F.col("v"))).alias("m")
    ).select("vec_id", F.col("m.cid").alias("cid"), F.col("m.d2").alias("d2"), F.col("m.v").alias("v"))
    stats = best.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("size"),
        F.sum("d2").cast("bigint").alias("inertia"),
    )
    dims = (
        best.select("cid", F.posexplode("v").alias("dim", "x"))
        .groupBy("cid", "dim")
        .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("cnt"))
    )
    coords = dims.select(
        "cid", "dim", (F.expr("sx div cnt") - F.lit(KM_SHIFT)).alias("cq")
    )
    cents = coords.groupBy("cid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cq"))),
                lambda s: s["cq"].cast("string"),
            ),
            ",",
        ).alias("centroid_q")
    )
    return (
        stats.join(cents, "cid")
        .select(F.col("cid").alias("cluster_id"), "size", "inertia", "centroid_q")
    )


KMEANS_STEP_SQL = f"""
WITH sq AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * {KM_SCALE})::BIGINT + {KM_SHIFT}) AS v
  FROM embeddings
), cent AS (
  SELECT vec_id::INT AS cid, v AS cv FROM sq WHERE vec_id < {KM_K}
), scored AS (
  SELECT s.vec_id, c.cid,
         list_reduce(list_prepend(0::BIGINT,
           list_transform(range(1, {DIMS + 1}), i -> (s.v[i]-c.cv[i])*(s.v[i]-c.cv[i]))),
           (a, b) -> a + b) AS d2
  FROM sq s CROSS JOIN cent c
), assign AS (
  SELECT vec_id, cid, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk FROM scored
  ) WHERE rk = 1
), av AS (
  SELECT a.vec_id, a.cid, a.d2, s.v FROM assign a JOIN sq s USING (vec_id)
), dims AS (
  SELECT cid, i AS dim, sum(v[i]) AS sx, count(*) AS cnt
  FROM av, range(1, {DIMS + 1}) t(i)
  GROUP BY cid, i
), cents AS (
  SELECT cid, string_agg((sx // cnt - {KM_SHIFT})::VARCHAR, ',' ORDER BY dim) AS centroid_q
  FROM dims GROUP BY cid
), stats AS (
  SELECT cid, count(*)::BIGINT AS size, sum(d2)::BIGINT AS inertia FROM av GROUP BY cid
)
SELECT s.cid AS cluster_id, s.size, s.inertia, c.centroid_q
FROM stats s JOIN cents c USING (cid)
"""


KM_TRAIN_ITERS = 4


def kmeans_train(spark: SparkSession, sf: str) -> DataFrame:
    """FULL Lloyd's k-means training (KM_TRAIN_ITERS iterations), not the
    single step: seed centroids from vec_id < KM_K, then repeat
    assign-by-integer-squared-L2 → element-wise floor-mean update.
    Everything lives in the same int64 fixed point as :func:`kmeans_step`
    (quantize floor(x·10^6) + shift; ties → smallest centroid id; an
    emptied cluster carries its previous centroid forward — the standard
    Lloyd convention, deterministic on both engines). Output mirrors
    kmeans_step — (cluster_id, size, inertia, centroid_q) of the FINAL
    assignment against the last-but-one centroids, with the final updated
    centroid string — so KM_TRAIN_ITERS=1 would reproduce the step gate
    exactly. The training-loop upgrade of the one-step op, same as
    bpe_merge_pairs → bpe_train_merges.

    Scale shape per iteration (10^9 vectors): centroids broadcast as K
    literal rows, assignment is a map-side broadcast join + struct-min
    hash agg (no window, no O(N·C) shuffle), the update shuffles ≤ K·D
    partial sums, and the ONLY driver traffic is one K·D-value collect —
    the centroid model, the same bounded-model convention as the PQ
    codebooks and PCA's 64-value vector."""
    e = (
        T(spark, sf, "embeddings")
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * F.lit(float(KM_SCALE))).cast("long")
                + F.lit(KM_SHIFT),
            ).alias("v"),
        )
        .localCheckpoint(eager=True)  # one quantize pass feeds every iteration
    )
    cents: dict[int, list[int]] = {
        int(r["vec_id"]): [int(x) for x in r["v"]]
        for r in e.filter(F.col("vec_id") < KM_K).collect()
    }
    last_stats: list = []
    for _ in range(KM_TRAIN_ITERS):
        cent_df = spark.createDataFrame(
            sorted((cid, cv) for cid, cv in cents.items()), "cid int, cv array<long>"
        )
        j = e.crossJoin(F.broadcast(cent_df))
        d2 = F.aggregate(
            F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        best = (
            j.select("vec_id", "v", "cid", d2.alias("d2"))
            .groupBy("vec_id")
            .agg(F.min(F.struct(F.col("d2"), F.col("cid"), F.col("v"))).alias("m"))
            .select(
                "vec_id", F.col("m.cid").alias("cid"),
                F.col("m.d2").alias("d2"), F.col("m.v").alias("v"),
            )
            .localCheckpoint(eager=True)  # one assignment feeds stats + update
        )
        last_stats = best.groupBy("cid").agg(
            F.count(F.lit(1)).cast("bigint").alias("size"),
            F.sum("d2").cast("bigint").alias("inertia"),
        ).collect()
        coords = (
            best.select("cid", F.posexplode("v").alias("dim", "x"))
            .groupBy("cid", "dim")
            .agg(F.expr("sum(x) div count(1)").alias("cq"))
            .collect()  # ≤ K·D rows — the model, not the data
        )
        new_cents: dict[int, list[int]] = {}
        for r in coords:
            new_cents.setdefault(int(r["cid"]), [0] * DIMS)[int(r["dim"])] = int(r["cq"])
        for cid, cv in cents.items():  # emptied cluster keeps its centroid
            new_cents.setdefault(cid, cv)
        cents = new_cents
    rows = [
        (
            int(s["cid"]),
            int(s["size"]),
            int(s["inertia"]),
            ",".join(str(c - KM_SHIFT) for c in cents[int(s["cid"])]),
        )
        for s in sorted(last_stats, key=lambda s: int(s["cid"]))
    ]
    return spark.createDataFrame(
        rows, "cluster_id int, size bigint, inertia bigint, centroid_q string"
    )


def _kmeans_train_sql() -> str:
    """Unrolled oracle: cent0 = seeds; per iteration a MATERIALIZED
    assign (row_number argmin) + floor-mean centroid update with
    carry-forward for emptied clusters; final select = last assignment's
    stats joined to the last centroids."""
    its = KM_TRAIN_ITERS
    parts = [f"""
WITH sq AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * {KM_SCALE})::BIGINT + {KM_SHIFT}) AS v
  FROM embeddings
), cent0 AS MATERIALIZED (
  SELECT vec_id::INT AS cid, v AS cv FROM sq WHERE vec_id < {KM_K}
)"""]
    for i in range(1, its + 1):
        parts.append(f""",
scored{i} AS (
  SELECT s.vec_id, c.cid,
         list_reduce(list_prepend(0::BIGINT,
           list_transform(range(1, {DIMS + 1}), j -> (s.v[j]-c.cv[j])*(s.v[j]-c.cv[j]))),
           (a, b) -> a + b) AS d2
  FROM sq s CROSS JOIN cent{i - 1} c
),
assign{i} AS MATERIALIZED (
  SELECT vec_id, cid, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk FROM scored{i}
  ) WHERE rk = 1
),
dims{i} AS (
  SELECT a.cid, j AS dim, (sum(s.v[j]) // count(*))::BIGINT AS cq
  FROM assign{i} a JOIN sq s USING (vec_id), range(1, {DIMS + 1}) t(j)
  GROUP BY a.cid, j
),
cent{i} AS MATERIALIZED (
  SELECT p.cid,
         CASE WHEN count(d.cq) = 0 THEN p.cv
              ELSE list(d.cq ORDER BY d.dim) END AS cv
  FROM cent{i - 1} p
  LEFT JOIN dims{i} d ON d.cid = p.cid
  GROUP BY p.cid, p.cv
)""")
    parts.append(f"""
SELECT a.cid AS cluster_id, count(*)::BIGINT AS size, sum(a.d2)::BIGINT AS inertia,
       c.txt AS centroid_q
FROM assign{its} a
JOIN (SELECT cid, list_reduce(list_transform(cv, x -> (x - {KM_SHIFT})::VARCHAR),
             (s, t) -> s || ',' || t) AS txt FROM cent{its}) c USING (cid)
GROUP BY a.cid, c.txt
""")
    return "".join(parts)


KMEANS_TRAIN_SQL = _kmeans_train_sql()


# --------------------------------------------------------------------------
# int8-quantized ANN — the memory-scale path (4× smaller vectors, integer
# dot products). Exact integer arithmetic → value-exact oracle.
# --------------------------------------------------------------------------

I8_SCALE = 127


def ann_int8_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-10 neighbors per query (vec_id < 5) under int8 scalar
    quantization: q = floor(x·127) per dimension (embeddings live in
    [-1, 1]), score = integer dot product, ties broken by neighbor_id.
    This is the production memory-scale trick — a 10^9×64-d corpus drops
    from 256 GB float32 to 64 GB int8, and the scoring loop is integer
    SIMD — while this query also MEASURES the quantization's ranking drift
    against ann_cosine_topk (same queries, same candidates).

    Scale shape: identical to ann_cosine_topk (queries broadcast, one pass
    over candidates, per-query top-k); the quantized column is a pure
    projection so at scale you materialize it once next to the float
    vectors and scan only the int8 copy."""
    e = T(spark, sf, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(float(I8_SCALE))).cast("long"),
        ).alias("qv"),
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("c_qv"))
    j = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    score = F.aggregate(
        F.zip_with("q_qv", "c_qv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = j.select("query_id", "neighbor_id", score.alias("score_i8"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_i8").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("bigint")).filter(
        F.col("rank") <= TOP_K
    )


ANN_INT8_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * {I8_SCALE})::BIGINT) AS qv
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_reduce(list_prepend(0::BIGINT,
           list_transform(range(1, {DIMS + 1}), i -> q.qv[i] * c.qv[i])),
           (a, b) -> a + b) AS score_i8
  FROM e q JOIN e c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id, neighbor_id, score_i8, rank FROM (
  SELECT query_id, neighbor_id, score_i8,
         row_number() OVER (PARTITION BY query_id ORDER BY score_i8 DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# Product quantization (PQ) ANN — the 16-32× memory-scale path. Codebook =
# deterministic anchors (vec_id < PQ_CODES), int64 fixed-point throughout →
# value-exact oracle.
# --------------------------------------------------------------------------

PQ_M = 8  # subspaces (64 dims → 8 × 8)
PQ_SUBDIM = DIMS // PQ_M
PQ_CODES = 16  # codebook entries per subspace
PQ_SCALE = 1_000_000
PQ_SHORTLIST = 50  # ADC shortlist size fed to the exact rerank


def _pq_quantize(col: Column) -> Column:
    """floor(x·10^6) int64 lattice — only differences are taken downstream,
    so no non-negativity shift is needed (cf. KM_SHIFT)."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * F.lit(float(PQ_SCALE))).cast("long")
    )


def _long_array_sql(xs: list[int]) -> str:
    return "array(" + ",".join(f"{int(x)}L" for x in xs) + ")"


def _sub_d2_sql(vec: str, code_ints: list[int], s: int) -> str:
    """Integer squared-L2 between subspace s of ``vec`` and a literal code —
    as a SQL expression string: building 128 of these through the py4j
    Column API costs seconds of driver time; one parse of a string doesn't."""
    lo = s * PQ_SUBDIM
    cs = _long_array_sql(code_ints[lo : lo + PQ_SUBDIM])
    return (
        f"aggregate(zip_with(slice({vec}, {lo + 1}, {PQ_SUBDIM}), {cs},"
        " (a, b) -> (a-b)*(a-b)), 0L, (acc, x) -> acc + x)"
    )


def pq_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN with exact rerank, top-10 per query
    (vec_id < 5). Stage 1 (ADC shortlist): each vector is encoded as PQ_M=8
    one-byte codes (nearest of 16 codebook sub-vectors per 8-dim subspace,
    integer squared-L2, ties → smallest code); queries shortlist the
    PQ_SHORTLIST=50 nearest neighbors by asymmetric distance (exact query
    sub-vector vs the neighbor's reconstructed codebook entries). Stage 2
    (rerank): exact float cosine over shortlist members only, top-10. This
    is the production memory-scale pattern beyond int8: a 10^9×64-d corpus
    drops from 256 GB float32 to 8 GB of codes for the scan, and the floats
    are touched for only Q·50 rows in the rerank.

    Scale shape: the codebook (16×64 ints) is collected once at plan-build
    time and inlined as literals (the ivf_topk lesson) — encoding is a PURE
    PROJECTION (struct-min argmin per subspace, no join, no window, no
    shuffle); ADC is the same broadcast-queries single corpus pass as
    ann_cosine_topk, reading only the 8-code column, never the floats; the
    rerank joins the tiny shortlist back to the float column by equi-key."""
    e = T(spark, sf, "embeddings").select(
        "vec_id", _pq_quantize(F.col("embedding")).alias("v")
    )
    cb_rows = sorted(
        e.filter(F.col("vec_id") < PQ_CODES).collect(), key=lambda r: r["vec_id"]
    )
    cb = [list(r["v"]) for r in cb_rows]

    code_cols = []
    for s in range(PQ_M):
        structs = ", ".join(
            f"struct({_sub_d2_sql('v', cb[c], s)} as d2, {c} as code)"
            for c in range(PQ_CODES)
        )
        code_cols.append(F.expr(f"array_min(array({structs})).code").alias(f"c{s}"))
    enc = e.select("vec_id", "v", *code_cols)

    q = enc.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q_v")
    )
    c = enc.select(
        F.col("vec_id").alias("neighbor_id"), *[F.col(f"c{s}") for s in range(PQ_M)]
    )
    j = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))

    # per-subspace codebook slices as literal array<array<long>> — the ADC
    # lookup only ever reads subspace s of code row c
    terms = []
    for s in range(PQ_M):
        lo = s * PQ_SUBDIM
        cbs = (
            "array("
            + ",".join(_long_array_sql(row[lo : lo + PQ_SUBDIM]) for row in cb)
            + ")"
        )
        terms.append(
            f"aggregate(zip_with(slice(q_v, {lo + 1}, {PQ_SUBDIM}),"
            f" element_at({cbs}, c{s} + 1),"
            " (a, b) -> (a-b)*(a-b)), 0L, (acc, x) -> acc + x)"
        )
    dist = F.expr(" + ".join(terms))
    scored = j.select("query_id", "neighbor_id", dist.alias("dist_pq"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_pq").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        scored.withColumn("adc_rank", F.row_number().over(w))
        .filter(F.col("adc_rank") <= PQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )

    ef = T(spark, sf, "embeddings").select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    qf = ef.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cf = ef.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    rer = shortlist.join(cf, "neighbor_id").join(F.broadcast(qf), "query_id")
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
    )


_PQ_SUB_D2 = (
    "list_reduce(list_prepend(0::BIGINT, list_transform(range(1, {n}),"
    " i -> ({a}[{off}+i]-{b}[{off}+i])*({a}[{off}+i]-{b}[{off}+i]))), (x, y) -> x + y)"
)


def _pq_sub_d2_sql(a: str, b: str, off: str) -> str:
    return _PQ_SUB_D2.format(a=a, b=b, off=off, n=PQ_SUBDIM + 1)


PQ_ANN_TOPK_SQL = f"""
WITH sq AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * {PQ_SCALE})::BIGINT) AS v
  FROM embeddings
), cb AS (
  SELECT vec_id::INT AS code_id, v AS cv FROM sq WHERE vec_id < {PQ_CODES}
), subd AS (
  SELECT v0.vec_id, t.ss, c.code_id,
         {_pq_sub_d2_sql("v0.v", "c.cv", "t.ss*" + str(PQ_SUBDIM))} AS d2
  FROM sq v0 CROSS JOIN range(0, {PQ_M}) t(ss) CROSS JOIN cb c
), enc AS (
  SELECT vec_id, ss, code_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, ss ORDER BY d2, code_id) AS rk
    FROM subd
  ) WHERE rk = 1
), adc AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         sum({_pq_sub_d2_sql("q.v", "c.cv", "e.ss*" + str(PQ_SUBDIM))})::BIGINT AS dist_pq
  FROM enc e JOIN cb c ON c.code_id = e.code_id
  JOIN sq q ON q.vec_id < {N_QUERIES} AND q.vec_id <> e.vec_id
  GROUP BY 1, 2
), short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY dist_pq ASC, neighbor_id ASC) AS adc_rank
    FROM adc
  ) WHERE adc_rank <= {PQ_SHORTLIST}
), ef AS (
  SELECT vec_id, embedding,
         sqrt({_dot_sql("embedding", "embedding")}) AS nrm
  FROM embeddings
), rer AS (
  SELECT s.query_id, s.neighbor_id,
         {_dot_sql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
  FROM short s
  JOIN ef c ON c.vec_id = s.neighbor_id
  JOIN ef q ON q.vec_id = s.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM rer
) WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# SemDeDup: cluster-scoped semantic near-dup pairs — the scale path for
# embedding dedup (cluster first, compare only within clusters).
# --------------------------------------------------------------------------

SEMDEDUP_K = 8  # deterministic anchor centroids: vec_id < 8


def semdedup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-style semantic dedup: assign every vector to its nearest
    anchor centroid (integer squared-L2 on the 10^6 fixed-point lattice,
    ties → smallest centroid id), then emit near-duplicate pairs (cosine ≥
    0.4) ONLY within a cluster. Same threshold as embedding_near_dup_pairs,
    so the output is exactly the subset of true near-dup pairs whose members
    land in the same cluster — the recall/cost trade the SemDeDup recipe
    makes at corpus scale.

    Scale shape (10^9 vectors): assignment is a pure projection (centroids
    collected once, inlined as literals, struct-min argmin — no join/window/
    shuffle); the pair stage is an equi-join on cluster_id (candidate count
    Σ|cluster|², not N²) — the all-pairs cosine join of
    embedding_near_dup_pairs restricted to cluster-local work."""
    e = T(spark, sf, "embeddings").select(
        "vec_id",
        "embedding",
        _pq_quantize(F.col("embedding")).alias("v"),
        _norm(F.col("embedding")).alias("nrm"),
    )
    cent_rows = sorted(
        e.filter(F.col("vec_id") < SEMDEDUP_K).select("vec_id", "v").collect(),
        key=lambda r: r["vec_id"],
    )

    structs = ", ".join(
        "struct(aggregate(zip_with(v, "
        + _long_array_sql(list(r["v"]))
        + ", (a, b) -> (a-b)*(a-b)), 0L, (acc, x) -> acc + x)"
        + f" as d2, {int(r['vec_id'])} as cid)"
        for r in cent_rows
    )
    best = F.expr(f"array_min(array({structs}))")
    # eager localCheckpoint: one assignment pass feeds both join sides, no
    # CacheManager entry leaked (same pattern as embedding_near_dup_pairs)
    a = e.select(
        "vec_id", "embedding", "nrm", best["cid"].cast("int").alias("cluster_id")
    ).localCheckpoint(eager=True)
    left = a.select(
        "cluster_id",
        F.col("vec_id").alias("vec_id_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    right = a.select(
        "cluster_id",
        F.col("vec_id").alias("vec_id_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    j = left.join(right, "cluster_id").filter(F.col("vec_id_a") < F.col("vec_id_b"))
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        j.select("cluster_id", "vec_id_a", "vec_id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_THRESHOLD)
    )


SEMDEDUP_PAIRS_SQL = f"""
WITH sq AS (
  SELECT vec_id, embedding,
         list_transform(embedding, x -> floor(x::DOUBLE * {PQ_SCALE})::BIGINT) AS v,
         sqrt({_dot_sql("embedding", "embedding")}) AS nrm
  FROM embeddings
), cent AS (
  SELECT vec_id::INT AS cid, v AS cv FROM sq WHERE vec_id < {SEMDEDUP_K}
), scored AS (
  SELECT s.vec_id, c.cid,
         list_reduce(list_prepend(0::BIGINT, list_transform(range(1, {DIMS + 1}),
           i -> (s.v[i]-c.cv[i])*(s.v[i]-c.cv[i]))), (a, b) -> a + b) AS d2
  FROM sq s CROSS JOIN cent c
), assign AS (
  SELECT vec_id, cid AS cluster_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk FROM scored
  ) WHERE rk = 1
)
SELECT cluster_id, vec_id_a, vec_id_b, cosine FROM (
  SELECT xa.cluster_id, x.vec_id AS vec_id_a, y.vec_id AS vec_id_b,
         {_dot_sql("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cosine
  FROM assign xa JOIN assign ya ON xa.cluster_id = ya.cluster_id AND xa.vec_id < ya.vec_id
  JOIN sq x ON x.vec_id = xa.vec_id
  JOIN sq y ON y.vec_id = ya.vec_id
) WHERE cosine >= {NEAR_DUP_THRESHOLD}
"""


# --------------------------------------------------------------------------
# Per-label centroid outliers: semantic outlier detection inside each
# cluster/source — the "wrong-cluster / mislabeled / off-topic" filter a
# training-data pipeline runs after clustering (the flip side of SemDeDup:
# SemDeDup drops what is too CLOSE to the centroid's neighbors, this flags
# what is too FAR from its own centroid). Same int64 fixed-point discipline
# as kmeans_step, so the gate is value-exact.
# --------------------------------------------------------------------------

OUTLIER_TOP = 2


def label_centroid_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Per label: the element-wise integer-mean centroid of its vectors,
    then the ``OUTLIER_TOP`` furthest members by integer squared-L2 — with
    their distances, for thresholding downstream.

    Scale shape (10^9 vectors): the centroid is a (label, dim)-keyed hash
    agg whose partial sums combine map-side (shuffle carries ≤ labels·D
    rows per task); centroids broadcast back (labels·D values); distance is
    a pure projection. The final top-k-per-label window sorts only within a
    label partition — with balanced labels that is corpus/labels rows per
    task, and a skewed giant label is exactly the AQE skew-join/salting
    case the engine handles elsewhere (operators/politeness.py)."""
    from pyspark.sql.window import Window

    e = T(spark, sf, "embeddings").select(
        "vec_id",
        F.col("label").cast("int").alias("label"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(float(KM_SCALE))).cast("long")
            + F.lit(KM_SHIFT),
        ).alias("v"),
    )
    dims = (
        e.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("cnt"))
    )
    cent = (
        dims.select("label", "dim", F.expr("sx div cnt").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
            ).alias("cv")
        )
    )
    d2 = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = e.join(F.broadcast(cent), "label").select("label", "vec_id", d2.alias("d2"))
    w = Window.partitionBy("label").orderBy(F.desc("d2"), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= OUTLIER_TOP)
        .orderBy("label", "rnk")
    )


LABEL_CENTROID_OUTLIERS_SQL = f"""
WITH sq AS (
  SELECT vec_id, label::INT AS label,
         list_transform(embedding, x -> floor(x::DOUBLE * {KM_SCALE})::BIGINT + {KM_SHIFT}) AS v
  FROM embeddings
), dims AS (
  SELECT label, i AS dim, sum(v[i]) AS sx, count(*) AS cnt
  FROM sq, range(1, {DIMS + 1}) t(i)
  GROUP BY label, i
), cent AS (
  SELECT label, list((sx // cnt)::BIGINT ORDER BY dim) AS cv FROM dims GROUP BY label
), scored AS (
  SELECT s.label, s.vec_id,
         list_reduce(list_prepend(0::BIGINT,
           list_transform(range(1, {DIMS + 1}), i -> (s.v[i]-c.cv[i])*(s.v[i]-c.cv[i]))),
           (a, b) -> a + b)::BIGINT AS d2
  FROM sq s JOIN cent c USING (label)
)
SELECT label, vec_id, d2,
       row_number() OVER (PARTITION BY label ORDER BY d2 DESC, vec_id) AS rnk
FROM scored
QUALIFY rnk <= {OUTLIER_TOP}
ORDER BY label, rnk
"""


# --------------------------------------------------------------------------
# Random-projection (Johnson–Lindenstrauss) ANN: project 64-d floats onto
# RP_DIMS deterministic integer directions, shortlist by projected cosine,
# exact rerank — the dimensionality-reduction scale path (4× fewer bytes and
# flops in the scan; floats touched only for Q·shortlist rows).
# --------------------------------------------------------------------------

RP_DIMS = 32
RP_SHORTLIST = 100


def _rp_weights(j: int) -> list[int]:
    """Deterministic well-mixed integer direction j (murmur3-finalizer
    mixing). NOT the _plane_weights LCG family: that one is affine in the
    index mod 2048 (consecutive dims step by a constant), fine for sign
    bits but badly correlated as a JL projection matrix — measured top-10
    recall 0.30 (LCG family) vs 0.70 (this mixing) at sf0.01."""
    out = []
    for d in range(DIMS):
        z = ((j * DIMS + d + 0x9E3779B9) * 0x85EBCA6B) % (1 << 32)
        z ^= z >> 13
        z = (z * 0xC2B2AE35) % (1 << 32)
        z ^= z >> 16
        out.append((z % 2048) - 1024)
    return out


def _rp_proj_expr(vec: str, j: int) -> str:
    """Spark-SQL string for projection j: Σ_d vec[d]·w(j,d) as a left fold
    (same evaluation order as the DuckDB twin — bit-identical doubles)."""
    w = ",".join(f"{float(x)}D" for x in _rp_weights(j))
    return (
        f"aggregate(zip_with({vec}, array({w}),"
        " (x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (a, b) -> a + b)"
    )


def _rp_proj_sql(j: int) -> str:
    w = ",".join(str(float(x)) for x in _rp_weights(j))
    return (
        "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65),"
        f" i -> (embedding[i]::DOUBLE) * ([{w}])[i])), (x, y) -> x + y)"
    )


_DOT_RP_SQL = (
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, "
    + str(RP_DIMS + 1)
    + "), i -> ({a}[i]::DOUBLE) * ({b}[i]::DOUBLE))), (x, y) -> x + y)"
)


def rp_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Random-projection ANN with exact rerank, top-10 per query (vec_id <
    5): stage 1 projects every embedding onto RP_DIMS=32 deterministic
    integer directions (a JL sketch — inlined as literals, pure projection,
    no shuffle) and shortlists RP_SHORTLIST=100 neighbors per query by
    *projected* cosine; stage 2 reranks the shortlist with exact 64-d
    cosine. Complements the PQ path: PQ compresses per-dimension precision,
    RP compresses dimensionality — at 10^9 vectors the projected scan moves
    half the bytes with no codebook training step at all. (This corpus's
    cosine margins are narrow — top-10 sits just above the p98 of the
    distribution — so 64→16 dims lost too much order; 32 holds 0.70
    recall.)

    Cross-engine exactness: projections, norms and cosines are left-fold
    doubles evaluated in the same order on both engines; shortlist and
    final rank use deterministic tie-breaks.

    The 32×64 projection matrix rides along as ONE broadcast nested-array
    column consumed by a single ``transform`` HOF (not 32 inlined
    64-literal expressions — that shape cost ~10 s of codegen/eval at
    sf0.01 for 500 rows; same math, same fold order, tiny plan)."""
    wq = [[float(x) for x in _rp_weights(j)] for j in range(RP_DIMS)]
    wdf = spark.createDataFrame([(wq,)], "W: array<array<double>>")
    parr = F.expr(
        "transform(W, wj -> aggregate(zip_with(embedding, wj,"
        " (x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (a, b) -> a + b))"
    )
    e = (
        T(spark, sf, "embeddings")
        .crossJoin(F.broadcast(wdf))
        .select("vec_id", parr.alias("parr"))
    )
    e = e.select("vec_id", "parr", _norm(F.col("parr")).alias("pnrm"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("parr").alias("q_p"),
        F.col("pnrm").alias("q_n"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("parr").alias("c_p"),
        F.col("pnrm").alias("c_n"),
    )
    j = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    pcos = _dot(F.col("q_p"), F.col("c_p")) / (F.col("q_n") * F.col("c_n"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("pcos").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        j.select("query_id", "neighbor_id", pcos.alias("pcos"))
        .withColumn("rp_rank", F.row_number().over(w))
        .filter(F.col("rp_rank") <= RP_SHORTLIST)
        .select("query_id", "neighbor_id")
    )

    ef = T(spark, sf, "embeddings").select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    qf = ef.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cf = ef.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    rer = shortlist.join(cf, "neighbor_id").join(F.broadcast(qf), "query_id")
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
    )


RP_ANN_TOPK_SQL = f"""
WITH wt AS (
  SELECT [{",".join("[" + ",".join(str(float(x)) for x in _rp_weights(j)) + "]" for j in range(RP_DIMS))}] AS W
), proj AS (
  SELECT vec_id,
         list_transform(W, wj -> list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(range(1, 65), i -> (embedding[i]::DOUBLE) * wj[i])),
           (x, y) -> x + y)) AS parr
  FROM embeddings CROSS JOIN wt
), p AS (
  SELECT vec_id, parr,
         sqrt({_DOT_RP_SQL.format(a="parr", b="parr")}) AS pnrm
  FROM proj
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DOT_RP_SQL.format(a="q.parr", b="c.parr")} / (q.pnrm * c.pnrm) AS pcos
  FROM p q JOIN p c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
), short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY pcos DESC, neighbor_id ASC) AS rp_rank
    FROM scored
  ) WHERE rp_rank <= {RP_SHORTLIST}
), ef AS (
  SELECT vec_id, embedding,
         sqrt({_dot_sql("embedding", "embedding")}) AS nrm
  FROM embeddings
), rer AS (
  SELECT s.query_id, s.neighbor_id,
         {_dot_sql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
  FROM short s
  JOIN ef c ON c.vec_id = s.neighbor_id
  JOIN ef q ON q.vec_id = s.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM rer
) WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# pca_power_iteration — the dominant principal component of the embedding
# cloud, in int64 max-norm fixed point. Dimensionality reduction is the
# missing member of the vector family (ANN, clustering, dedup are above);
# the dominant PC is what a curation pipeline uses to de-bias ("remove the
# top component" à la all-but-the-top post-processing) and what IVF/PQ
# codebook builders seed from.
#
# Scale-correct algorithm: the covariance matrix is NEVER materialized —
# each power-iteration step computes w = Xᶜᵀ(Xᶜ v) in one pass over the
# data (per-row integer dot s = ⟨q - mean, v⟩ scaled down, then a
# (dim)-keyed sum of (q - mean)·s), so an iteration costs one projection
# plus one 64-key hash agg with map-side partials regardless of corpus
# size. v is renormalized by max-|component| (the hits_int max-norm trick)
# so everything stays in int64; both engines run the identical integer
# recurrence, making the gate value-exact.
# --------------------------------------------------------------------------

PCA_SCALE = 1_000_000
PCA_ITERS = 4


def pca_power_iteration(spark: SparkSession, sf: str) -> DataFrame:
    """(dim, loading) — the 64 components of the dominant principal
    direction after PCA_ITERS max-norm power-iteration steps on the
    mean-centered quantized embeddings. ``loading`` is fixed-point at
    PCA_SCALE (the largest-|·| component is ±PCA_SCALE by construction).

    Per-iteration driver traffic is one 64-value collect (the new v),
    the same bounded-literal convention as the inlined IVF centroids.
    Int64 headroom: |s| ≤ DIMS·SCALE², scaled down by SCALE before the
    second product; the dim-sum then holds N·SCALE·(DIMS·SCALE) — rescale
    per shard / use decimal beyond ~10^5 rows per partial (the gate SFs
    are far under; a 10^9-row run sums per-executor partials at 128 bits
    first)."""
    e = T(spark, sf, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(float(PCA_SCALE))).cast("long"),
        ).alias("q"),
    ).localCheckpoint(eager=True)

    # integer per-dim means (floor), collected once and inlined
    n = e.count()
    dim_sums = (
        e.select(F.posexplode("q").alias("dim", "v"))
        .groupBy("dim")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    mean = [0] * DIMS
    for r in dim_sums:
        # Python // floors like SQL "div" truncates only for non-negative;
        # use explicit floor division on both engines via floor(s / n)
        mean[r["dim"]] = r["s"] // n if r["s"] >= 0 else -((-r["s"] + n - 1) // n)

    mean_sql = "array(" + ", ".join(f"{m}L" for m in mean) + ")"
    qc = F.expr(f"zip_with(q, {mean_sql}, (a, b) -> a - b)")
    c = e.select("vec_id", qc.alias("x")).localCheckpoint(eager=True)

    v = [PCA_SCALE] * DIMS
    for _ in range(PCA_ITERS):
        v_sql = "array(" + ", ".join(f"{int(x)}L" for x in v) + ")"
        s = F.expr(
            f"aggregate(zip_with(x, {v_sql}, (a, b) -> a * b), 0L, (acc, p) -> acc + p)"
            f" div {PCA_SCALE}"
        )
        w_rows = (
            c.select(F.posexplode("x").alias("dim", "xv"), s.alias("s"))
            .groupBy("dim")
            .agg(F.sum(F.col("xv") * F.col("s")).alias("w"))
            .collect()
        )
        w = [0] * DIMS
        for r in w_rows:
            w[r["dim"]] = r["w"]
        m = max(abs(x) for x in w) or 1
        # truncating div toward zero, exactly Spark's `div` / DuckDB's `//`
        v = [(PCA_SCALE * x) // m if x >= 0 else -((PCA_SCALE * -x) // m) for x in w]

    return spark.createDataFrame(
        [(i, int(v[i])) for i in range(DIMS)], "dim int, loading long"
    )


def _pca_sql() -> str:
    q_cte = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * {PCA_SCALE})::BIGINT) AS q
  FROM embeddings
), mean AS (
  SELECT list(m ORDER BY dim) AS m FROM (
    SELECT dim,
           CASE WHEN sum(q[dim]) >= 0 THEN sum(q[dim]) // count(*)
                ELSE -((-sum(q[dim]) + count(*) - 1) // count(*)) END::BIGINT AS m
    FROM q CROSS JOIN (SELECT unnest(range(1, {DIMS + 1})) AS dim)
    GROUP BY dim
  )
), c AS (
  SELECT vec_id, list_transform(range(1, {DIMS + 1}), i -> q.q[i] - mean.m[i]) AS x
  FROM q CROSS JOIN mean
), v0 AS (
  SELECT list_transform(range(1, {DIMS + 1}), i -> {PCA_SCALE}::BIGINT) AS v
)"""
    steps = []
    for k in range(PCA_ITERS):
        steps.append(f""", s{k + 1} AS (
  SELECT c.vec_id, c.x,
         list_reduce(list_prepend(0::BIGINT,
           list_transform(range(1, {DIMS + 1}), i -> c.x[i] * v{k}.v[i])),
           (a, b) -> a + b) // {PCA_SCALE} AS s
  FROM c CROSS JOIN v{k}
), w{k + 1} AS (
  SELECT dim, sum(x[dim] * s)::BIGINT AS w
  FROM s{k + 1} CROSS JOIN (SELECT unnest(range(1, {DIMS + 1})) AS dim)
  GROUP BY dim
), v{k + 1} AS (
  -- HUGEINT for the SCALE·w product only: |w| can reach N·|x|·|s| ≈ 10^17,
  -- so the 10^6 rescale multiply needs 128-bit headroom before the divide
  SELECT list((({PCA_SCALE}::HUGEINT * w)
               // greatest((SELECT max(abs(w)) FROM w{k + 1}), 1)::HUGEINT)::BIGINT
              ORDER BY dim) AS v
  FROM w{k + 1}
)""")
    return (
        q_cte
        + "".join(steps)
        + f"""
SELECT (dim - 1)::INT AS dim, v[dim] AS loading
FROM v{PCA_ITERS} CROSS JOIN (SELECT unnest(range(1, {DIMS + 1})) AS dim)
"""
    )


PCA_POWER_ITERATION_SQL = _pca_sql()


QUERIES = {
    "pca_power_iteration": pca_power_iteration,
    "rp_ann_topk": rp_ann_topk,
    "ann_cosine_topk": ann_cosine_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_lsh_buckets": ann_lsh_buckets,
    "ann_lsh_topk": ann_lsh_topk,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
    "kmeans_step": kmeans_step,
    "kmeans_train": kmeans_train,
    "ann_int8_topk": ann_int8_topk,
    "pq_ann_topk": pq_ann_topk,
    "semdedup_pairs": semdedup_pairs,
    "label_centroid_outliers": label_centroid_outliers,
}

ORACLES = {
    "pca_power_iteration": PCA_POWER_ITERATION_SQL,
    "rp_ann_topk": RP_ANN_TOPK_SQL,
    "ann_cosine_topk": ANN_COSINE_TOPK_SQL,
    "ann_ivf_topk": ANN_IVF_TOPK_SQL,
    "ann_lsh_buckets": ANN_LSH_BUCKETS_SQL,
    "ann_lsh_topk": ANN_LSH_TOPK_SQL,
    "embedding_near_dup_pairs": EMBEDDING_NEAR_DUP_PAIRS_SQL,
    "kmeans_step": KMEANS_STEP_SQL,
    "kmeans_train": KMEANS_TRAIN_SQL,
    "ann_int8_topk": ANN_INT8_TOPK_SQL,
    "pq_ann_topk": PQ_ANN_TOPK_SQL,
    "semdedup_pairs": SEMDEDUP_PAIRS_SQL,
    "label_centroid_outliers": LABEL_CENTROID_OUTLIERS_SQL,
}
