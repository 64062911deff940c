"""Site-level corpus analytics: mirror-host detection, soft-404/template
dominance, and cross-document shared-substring runs.

These are the host- and document-granularity audits a crawl operator runs
over what was fetched: which hosts are mirrors of each other (Bharat &
Broder, "Mirror, mirror on the Web", WWW 1999 — skip one of every mirror
pair and the crawl budget doubles), which hosts answer every dead path with
the same 200-status template page (soft-404s, Bar-Yossef et al., "Sic
transit gloria telae", WWW 2004 — those pages poison both the dedup stats
and the training corpus), and which document pairs share long verbatim
token runs (the exact-substring dedup signal of Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022 — MinHash misses
partial containment; run length is the right unit for cut-and-paste text).

Reference parity: spider-go has no host-level analytics (it is a generic
DAG engine); these extend the north rule's corpus-curation surface over the
same synthesized page/fingerprint model the rest of the engine uses. All
inputs derive deterministically from the driver's testdata tables, all
arithmetic is int64, and every query carries a value-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spider_go_spark.functions import textkernel as tk
from spider_go_spark.queries import T

# --- mirror-host model ------------------------------------------------------
# host from l_suppkey, path from l_partkey; content fingerprint is a pure
# int64 function of (path, host family): hosts in the same family (host mod
# NFAM) serve byte-identical content on shared paths, except every fifth
# path which is host-unique (mirrors are never perfect), and path 0 which is
# universal boilerplate (every host serves it — the hub the cap must drop).
MIRROR_HOSTS = 24
MIRROR_PATHS = 120
MIRROR_FAMILIES = 7
MIRROR_HUB_CAP = 8  # max hosts sharing one (path, fp) before it is dropped
MIRROR_MIN_OVERLAP = 10
_FP_P = 1_000_000_007


def _mirror_pages(li: DataFrame) -> DataFrame:
    host = (F.col("l_suppkey") % MIRROR_HOSTS).cast("long")
    path = (F.col("l_partkey") % MIRROR_PATHS).cast("long")
    fam = host % MIRROR_FAMILIES
    fp = (
        F.when(path == 0, F.lit(424242).cast("long"))
        .when(path % 5 == 0, (path * 1000003 + host * 131 + 7) % _FP_P)
        .otherwise((path * 1000003 + fam * 131 + 7) % _FP_P)
    )
    # per-host partial coverage: each host is missing a different ~9% slice
    # of the path space (a deterministic function of the PAGE key, so dense
    # testdata can't fill the hole back in), making mirror overlaps and
    # Jaccards vary by pair instead of being uniform
    return (
        li.select(host.alias("host"), path.alias("path"), fp.alias("fp"))
        .filter((F.col("path") * 7 + F.col("host") * 13) % 11 != 0)
        .distinct()
    )


def host_mirror_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Mirror-host pairs: hosts sharing ≥ MIRROR_MIN_OVERLAP identical
    (path, content-fingerprint) pages, with the shared-page count and the
    integer-ppm Jaccard over the two hosts' page sets — the Bharat-Broder
    signal a frontier scheduler reads to fetch one replica per mirror set.

    Scale shape: candidate pairs come from a (path, fp) equi-join, never a
    host cross join, and the join is hub-capped first — a (path, fp) group
    on more than MIRROR_HUB_CAP hosts is boilerplate, not mirroring, and is
    dropped before pairing (same cap discipline as host_cocitation), so the
    pair fan-out is ≤ cap²/2 per group. One hash agg per pair afterwards;
    all math int64 (jaccard in ppm via integer div)."""
    pages = _mirror_pages(T(spark, sf, "lineitem")).localCheckpoint(eager=True)
    grp = (
        pages.groupBy("path", "fp")
        .agg(F.count(F.lit(1)).alias("n_hosts"))
        .filter((F.col("n_hosts") >= 2) & (F.col("n_hosts") <= MIRROR_HUB_CAP))
        .select("path", "fp")
    )
    pg = pages.join(grp, ["path", "fp"], "left_semi")
    a, b = pg.alias("a"), pg.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.path") == F.col("b.path"))
            & (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.host") < F.col("b.host")),
        )
        .groupBy(
            F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b")
        )
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    hsz = pages.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    return (
        pairs.join(hsz.select(F.col("host").alias("host_a"), F.col("n").alias("na")), "host_a")
        .join(hsz.select(F.col("host").alias("host_b"), F.col("n").alias("nb")), "host_b")
        .filter(F.col("overlap") >= MIRROR_MIN_OVERLAP)
        .select(
            "host_a",
            "host_b",
            "overlap",
            F.expr("overlap * 1000000 div (na + nb - overlap)").alias("jaccard_ppm"),
        )
        .orderBy(F.col("jaccard_ppm").desc(), "host_a", "host_b")
    )


_MIRROR_PAGES_CTE = f"""
WITH pages AS MATERIALIZED (
  SELECT DISTINCT
    (l_suppkey % {MIRROR_HOSTS})::BIGINT AS host,
    (l_partkey % {MIRROR_PATHS})::BIGINT AS path,
    (CASE WHEN l_partkey % {MIRROR_PATHS} = 0 THEN 424242
          WHEN (l_partkey % {MIRROR_PATHS}) % 5 = 0
            THEN ((l_partkey % {MIRROR_PATHS})*1000003
                  + (l_suppkey % {MIRROR_HOSTS})*131 + 7) % {_FP_P}
          ELSE ((l_partkey % {MIRROR_PATHS})*1000003
                + ((l_suppkey % {MIRROR_HOSTS}) % {MIRROR_FAMILIES})*131 + 7)
               % {_FP_P}
     END)::BIGINT AS fp
  FROM lineitem
  WHERE ((l_partkey % {MIRROR_PATHS}) * 7 + (l_suppkey % {MIRROR_HOSTS}) * 13) % 11 <> 0
)"""

HOST_MIRROR_PAIRS_SQL = (
    _MIRROR_PAGES_CTE
    + f"""
, grp AS (
  SELECT path, fp FROM pages GROUP BY path, fp
  HAVING count(*) BETWEEN 2 AND {MIRROR_HUB_CAP}
), pg AS (SELECT p.* FROM pages p JOIN grp USING (path, fp)),
pairs AS (
  SELECT a.host AS host_a, b.host AS host_b, count(*)::BIGINT AS overlap
  FROM pg a JOIN pg b ON a.path = b.path AND a.fp = b.fp AND a.host < b.host
  GROUP BY 1, 2
), hsz AS (SELECT host, count(*)::BIGINT AS n FROM pages GROUP BY host)
SELECT host_a, host_b, overlap,
       overlap * 1000000 // (x.n + y.n - overlap) AS jaccard_ppm
FROM pairs JOIN hsz x ON x.host = host_a JOIN hsz y ON y.host = host_b
WHERE overlap >= {MIRROR_MIN_OVERLAP}
ORDER BY jaccard_ppm DESC, host_a, host_b
"""
)


# --- soft-404 / template dominance -------------------------------------------
# host from l_suppkey, path from l_orderkey; every fifth host serves ONE
# template fingerprint for three of every four paths (a soft-404 farm), all
# other (host, path) pairs get a unique fingerprint. Error-template fps
# (host*977 + 13 ≤ 22484) and unique fps (host*1000003 + path + 1000; the
# host-0 block is [1000, 1399]) occupy disjoint int64 ranges by construction.
SOFT404_HOSTS = 24
SOFT404_PATHS = 400
SOFT404_MIN_PAGES = 20
SOFT404_MIN_SHARE_PPM = 300_000


def _soft404_pages(li: DataFrame) -> DataFrame:
    host = (F.col("l_suppkey") % SOFT404_HOSTS).cast("long")
    path = (F.col("l_orderkey") % SOFT404_PATHS).cast("long")
    fp = F.when(
        (host % 5 == 0) & (path % 4 != 0), host * 977 + 13
    ).otherwise(host * 1000003 + path + 1000)
    return li.select(
        host.alias("host"), path.alias("path"), fp.alias("fp")
    ).distinct()


def soft404_template_hosts(spark: SparkSession, sf: str) -> DataFrame:
    """Soft-404 detection by template dominance: per host, the modal
    content fingerprint and its integer-ppm share of the host's distinct
    pages; hosts whose modal fingerprint covers ≥ 30% of ≥ 20 pages are
    template farms — a crawler stops spending budget on them and a corpus
    builder drops the template rows (Bar-Yossef et al. 2004 detect
    soft-404s by probing random dead paths; at corpus scale the dominance
    statistic finds the same hosts without extra fetches).

    Scale shape: one (host, fp) hash agg, then a per-host window for the
    modal row — the window partitions by host (10^7 partitions at design
    scale, each a handful of fingerprint groups), never over the corpus.
    Tie-break is (count desc, fp desc), deterministic on both engines."""
    pages = _soft404_pages(T(spark, sf, "lineitem"))
    by_fp = pages.groupBy("host", "fp").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("host").orderBy(F.col("cnt").desc(), F.col("fp").desc())
    modal = (
        by_fp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("host", F.col("fp").alias("modal_fp"), F.col("cnt").alias("modal_cnt"))
    )
    totals = pages.groupBy("host").agg(F.count(F.lit(1)).alias("n_pages"))
    return (
        modal.join(totals, "host")
        .select(
            "host",
            "n_pages",
            "modal_fp",
            "modal_cnt",
            F.expr("modal_cnt * 1000000 div n_pages").alias("share_ppm"),
        )
        .filter(
            (F.col("n_pages") >= SOFT404_MIN_PAGES)
            & (F.col("share_ppm") >= SOFT404_MIN_SHARE_PPM)
        )
        .orderBy("host")
    )


SOFT404_TEMPLATE_HOSTS_SQL = f"""
WITH pages AS MATERIALIZED (
  SELECT DISTINCT
    (l_suppkey % {SOFT404_HOSTS})::BIGINT AS host,
    (l_orderkey % {SOFT404_PATHS})::BIGINT AS path,
    (CASE WHEN (l_suppkey % {SOFT404_HOSTS}) % 5 = 0
               AND (l_orderkey % {SOFT404_PATHS}) % 4 <> 0
          THEN (l_suppkey % {SOFT404_HOSTS})*977 + 13
          ELSE (l_suppkey % {SOFT404_HOSTS})*1000003
               + (l_orderkey % {SOFT404_PATHS}) + 1000
     END)::BIGINT AS fp
  FROM lineitem
), by_fp AS (
  SELECT host, fp, count(*)::BIGINT AS cnt FROM pages GROUP BY host, fp
), modal AS (
  SELECT host, fp AS modal_fp, cnt AS modal_cnt FROM (
    SELECT host, fp, cnt,
           row_number() OVER (PARTITION BY host ORDER BY cnt DESC, fp DESC) AS rn
    FROM by_fp
  ) WHERE rn = 1
), totals AS (SELECT host, count(*)::BIGINT AS n_pages FROM pages GROUP BY host)
SELECT host, n_pages, modal_fp, modal_cnt,
       modal_cnt * 1000000 // n_pages AS share_ppm
FROM modal JOIN totals USING (host)
WHERE n_pages >= {SOFT404_MIN_PAGES}
  AND modal_cnt * 1000000 // n_pages >= {SOFT404_MIN_SHARE_PPM}
ORDER BY host
"""


# --- cross-document shared token runs ----------------------------------------
RUN_K = 5  # token-window width (positional, NOT distinct — order matters)
RUN_HUB_CAP = 16  # max corpus occurrences of a window hash before it's noise
RUN_MIN_WINS = 8  # min shared consecutive windows (= RUN_K+RUN_MIN_WINS-1 tokens)
RUN_LIMIT = 200


def shared_run_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Longest shared verbatim token run per document pair: positional
    5-token window hashes, an equi-join on the window hash across documents
    (hub-capped: a window occurring more than RUN_HUB_CAP times corpus-wide
    is boilerplate and generates no candidates), then the classic
    gaps-and-islands trick — matches on the same (doc_a, doc_b) with equal
    position offset (the diagonal) and consecutive positions form one run,
    found by grouping on ``pos − row_number()`` inside each diagonal.
    Returns pairs with a run of ≥ RUN_MIN_WINS windows, the run length in
    windows and in tokens. This is the exact-substring dedup signal (Lee et
    al., ACL 2022): MinHash scores whole-document overlap and misses a long
    quote inside an otherwise-unique page; run length catches exactly that.

    Scale shape: the join is content-keyed (window hash), never doc×doc;
    the hub cap bounds per-key fan-out; the islands window partitions by
    (pair, diagonal) — small groups by construction. Top-N is a
    deterministic order + limit."""
    d = T(spark, sf, "documents")
    # materialization barrier per token_hashes docstring (Catalyst re-evaluates
    # HOF-captured expressions per reference)
    th = d.select("doc_id", tk.token_hashes(F.col("text")).alias("th"))
    wins = th.select(
        "doc_id", tk.combine_windows(F.col("th"), RUN_K, distinct=False).alias("wins")
    )
    ex = wins.select(
        "doc_id", F.posexplode("wins").alias("pos", "sh")
    ).localCheckpoint(eager=True)
    keep = (
        ex.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") <= RUN_HUB_CAP)
        .select("sh")
    )
    exk = ex.join(keep, "sh", "left_semi")
    a, b = exk.alias("a"), exk.alias("b")
    m = a.join(
        b,
        (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_id_a"),
        F.col("b.doc_id").alias("doc_id_b"),
        F.col("a.pos").alias("pa"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    w = Window.partitionBy("doc_id_a", "doc_id_b", "diag").orderBy("pa")
    runs = (
        m.withColumn("island", F.col("pa") - F.row_number().over(w))
        .groupBy("doc_id_a", "doc_id_b", "diag", "island")
        .agg(F.count(F.lit(1)).alias("run_wins"))
    )
    return (
        runs.groupBy("doc_id_a", "doc_id_b")
        .agg(F.max("run_wins").alias("max_run_wins"))
        .filter(F.col("max_run_wins") >= RUN_MIN_WINS)
        .select(
            "doc_id_a",
            "doc_id_b",
            "max_run_wins",
            (F.col("max_run_wins") + F.lit(RUN_K - 1)).alias("max_run_tokens"),
        )
        .orderBy(F.col("max_run_wins").desc(), "doc_id_a", "doc_id_b")
        .limit(RUN_LIMIT)
    )


def _win_expr() -> str:
    """DuckDB expression for the positional RUN_K-window combined hash at
    0-based window index i, mirroring textkernel.combine_windows fold order:
    h = fold(h·COMBINE_A + tok_hash mod P) over th[i+1 .. i+RUN_K]."""
    e = f"th[i+1]"
    for j in range(2, RUN_K + 1):
        e = f"(({e})*{tk.COMBINE_A} + th[i+{j}]) % {tk.POLY_P}"
    return e


SHARED_RUN_PAIRS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), th AS (
  SELECT doc_id,
         list_transform(tokens,
            t -> list_reduce(
                   list_prepend(0::BIGINT,
                     list_transform(string_split(t, ''), c -> unicode(c)::BIGINT)),
                   (a, b) -> (a*31 + b) % {tk.POLY_P})) AS th
  FROM toks
), w AS (
  SELECT doc_id,
         list_transform(range(0, greatest(len(th)-{RUN_K - 1}, 0)),
            i -> {{'pos': i, 'sh': {_win_expr()}}}) AS lst
  FROM th
), ex AS (
  SELECT doc_id, u.pos AS pos, u.sh AS sh
  FROM (SELECT doc_id, unnest(lst) AS u FROM w)
), keep AS (
  SELECT sh FROM ex GROUP BY sh HAVING count(*) <= {RUN_HUB_CAP}
), exk AS (SELECT e.* FROM ex e JOIN keep USING (sh)),
m AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         a.pos AS pa, a.pos - b.pos AS diag
  FROM exk a JOIN exk b ON a.sh = b.sh AND a.doc_id < b.doc_id
), runs AS (
  SELECT doc_id_a, doc_id_b, count(*)::BIGINT AS run_wins
  FROM (
    SELECT doc_id_a, doc_id_b, diag,
           pa - row_number() OVER (PARTITION BY doc_id_a, doc_id_b, diag ORDER BY pa) AS island
    FROM m
  ) GROUP BY doc_id_a, doc_id_b, diag, island
)
SELECT doc_id_a, doc_id_b, max_run_wins,
       max_run_wins + {RUN_K - 1} AS max_run_tokens
FROM (
  SELECT doc_id_a, doc_id_b, max(run_wins) AS max_run_wins
  FROM runs GROUP BY doc_id_a, doc_id_b
) WHERE max_run_wins >= {RUN_MIN_WINS}
ORDER BY max_run_wins DESC, doc_id_a, doc_id_b
LIMIT {RUN_LIMIT}
"""


QUERIES = {
    "host_mirror_pairs": host_mirror_pairs,
    "soft404_template_hosts": soft404_template_hosts,
    "shared_run_pairs": shared_run_pairs,
}
ORACLES = {
    "host_mirror_pairs": HOST_MIRROR_PAIRS_SQL,
    "soft404_template_hosts": SOFT404_TEMPLATE_HOSTS_SQL,
    "shared_run_pairs": SHARED_RUN_PAIRS_SQL,
}
