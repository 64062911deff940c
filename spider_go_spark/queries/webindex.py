"""Web-index queries: SURT/CDX capture index, URL template mining, sitemap
ingestion, and anchor-text aggregation over interleaved link spans.

These are the crawl-adjacent *index-side* operators (what a crawler builds
and queries over what it fetched): a web-archive CDX lookup keyed by SURT,
crawler-trap analytics over URL path templates, sitemap-driven seed
discovery, and the per-target anchor-text signal. Inputs are synthesized
deterministically from the driver's testdata tables (no external data), so
every query carries a value-exact DuckDB oracle.

Reference parity: spider-go keeps no URL index (it is a generic DAG engine,
/root/reference/pkg/spider/storage_workflow_mongodb.go:57-80); these are the
crawl-engine reading of its catalog scans (SURVEY §2.1) over the north
rule's URL corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spider_go_spark.functions.urls import surt_key
from spider_go_spark.queries import T

# shared deterministic URL synthesis (no dependence on table row counts, so
# the same rule runs at every sf): host from l_suppkey, path from l_partkey —
# many lineitem rows collapse onto one URL, giving the CDX dedup real groups
N_CDX_HOSTS = 25
N_CDX_PAGES = 200
CDX_PREFIX_HOST = "h7"  # the host whose SURT range the lookup scans
CDX_LIMIT = 200


def _capture_urls(li: DataFrame) -> DataFrame:
    return li.select(
        F.concat(
            F.lit("http://h"),
            (F.col("l_suppkey") % N_CDX_HOSTS).cast("string"),
            F.lit(".example.test/p/"),
            (F.col("l_partkey") % N_CDX_PAGES).cast("string"),
        ).alias("url_norm"),
        (F.col("l_orderkey") % 97).cast("long").alias("capture_round"),
    )


def cdx_prefix_scan(spark: SparkSession, sf: str) -> DataFrame:
    """CDX index build + prefix lookup: canonical capture URLs keyed by
    SURT (functions/urls.surt_key — host-reversed sort key), deduped to one
    index row per URL (latest capture round + capture count), then a
    host-scoped *prefix range scan* (``test,example,h7)…``) — the lookup
    shape a web archive serves and a recrawler uses to skip known pages.

    Scale shape: surt_key is a codegen'd projection; the dedup is one hash
    agg on the SURT key; the prefix filter is a sargable range predicate —
    on a SURT-sorted/bucketed index table it prunes to one key range
    instead of scanning 10^10 rows. Top-N is TakeOrderedAndProject."""
    caps = _capture_urls(T(spark, sf, "lineitem"))
    idx = (
        caps.select(surt_key("url_norm").alias("surt"), "capture_round")
        .groupBy("surt")
        .agg(
            F.max("capture_round").alias("last_capture"),
            F.count("*").cast("long").alias("n_captures"),
        )
    )
    prefix = f"test,example,{CDX_PREFIX_HOST})"
    return (
        idx.filter(F.col("surt").startswith(prefix))
        .orderBy("surt")
        .limit(CDX_LIMIT)
    )


CDX_PREFIX_SCAN_SQL = f"""
WITH caps AS (
  SELECT 'http://h' || (l_suppkey % {N_CDX_HOSTS})::VARCHAR
           || '.example.test/p/' || (l_partkey % {N_CDX_PAGES})::VARCHAR AS url_norm,
         (l_orderkey % 97)::BIGINT AS capture_round
  FROM lineitem
), keyed AS (
  SELECT array_to_string(
           list_reverse(string_split(regexp_extract(url_norm,
             '^[a-z0-9+.-]+://(?:[^/?#]*@)?([^/?#]*)', 1), '.')), ',')
         || ')' || regexp_replace(url_norm, '^[a-z0-9+.-]+://[^/?#]*', '') AS surt,
         capture_round
  FROM caps
)
SELECT surt, max(capture_round) AS last_capture, count(*)::BIGINT AS n_captures
FROM keyed
WHERE surt LIKE 'test,example,{CDX_PREFIX_HOST}){"%"}'
GROUP BY surt
ORDER BY surt
LIMIT {CDX_LIMIT}
"""


N_TPL_HOSTS = 10
TPL_TOP_K = 3


def url_template_mining(spark: SparkSession, sf: str) -> DataFrame:
    """URL template mining: mask digit runs in paths (``/p/N/N``,
    ``/item-N.html``) and rank each host's most common templates — the
    crawler-trap / site-structure analytic (a host whose top template holds
    millions of URLs is a calendar/session trap; a handful of fat templates
    means a schema-regular site worth a custom extractor).

    Two deterministic path shapes are synthesized per lineitem row; the
    operator itself is generic: regexp digit-masking (codegen'd projection),
    hash agg on (host, template) — a key space of site-count × templates,
    tiny vs the URL count — and a per-host top-k window over that already
    aggregated (small) set, never over raw URLs."""
    li = T(spark, sf, "lineitem")
    path = F.when(
        F.col("l_linenumber") % 2 == 1,
        F.concat(
            F.lit("/p/"), F.col("l_orderkey").cast("string"),
            F.lit("/"), F.col("l_linenumber").cast("string"),
        ),
    ).otherwise(
        F.concat(F.lit("/item-"), F.col("l_partkey").cast("string"), F.lit(".html"))
    )
    urls = li.select(
        F.concat(
            F.lit("h"), (F.col("l_suppkey") % N_TPL_HOSTS).cast("string"),
            F.lit(".example.test"),
        ).alias("host"),
        F.regexp_replace(path, "[0-9]+", "N").alias("template"),
    )
    counts = urls.groupBy("host", "template").agg(F.count("*").alias("n_urls"))
    w = Window.partitionBy("host").orderBy(F.desc("n_urls"), "template")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TPL_TOP_K)
        .orderBy("host", "rnk")
    )


URL_TEMPLATE_MINING_SQL = f"""
WITH urls AS (
  SELECT 'h' || (l_suppkey % {N_TPL_HOSTS})::VARCHAR || '.example.test' AS host,
         regexp_replace(
           CASE WHEN l_linenumber % 2 = 1
                THEN '/p/' || l_orderkey::VARCHAR || '/' || l_linenumber::VARCHAR
                ELSE '/item-' || l_partkey::VARCHAR || '.html' END,
           '[0-9]+', 'N', 'g') AS template
  FROM lineitem
), counts AS (
  SELECT host, template, count(*) AS n_urls FROM urls GROUP BY host, template
)
SELECT host, template, n_urls,
       row_number() OVER (PARTITION BY host ORDER BY n_urls DESC, template) AS rnk
FROM counts
QUALIFY rnk <= {TPL_TOP_K}
ORDER BY host, rnk
"""


N_SITEMAP_HOSTS = 5


def sitemap_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Sitemap ingestion: per-host sitemap XML bodies (synthesized from
    ``orders`` — one ``<url><loc>…</loc><lastmod>…</lastmod></url>`` entry
    per order) parsed back into seed rows with ``regexp_extract_all`` and a
    zipped double explode — the mid-crawl seed source a polite crawler
    reads before spending fetch budget on link discovery.

    Scale shape: bodies are one hash agg per host (sitemaps are ≤ 50k URLs
    by spec, so a body row is bounded); extraction is a codegen'd
    projection + explode with output rows = sitemap entries. No Python."""
    o = T(spark, sf, "orders").filter(F.col("o_custkey") % 20 < N_SITEMAP_HOSTS)
    entries = o.select(
        (F.col("o_custkey") % 20).cast("long").alias("hostid"),
        F.concat(
            F.lit("<url><loc>http://s"),
            (F.col("o_custkey") % 20).cast("string"),
            F.lit(".example.test/o/"),
            F.col("o_orderkey").cast("string"),
            F.lit("</loc><lastmod>"),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
            F.lit("</lastmod></url>"),
        ).alias("entry"),
    )
    bodies = entries.groupBy("hostid").agg(
        F.array_join(F.array_sort(F.collect_list("entry")), "").alias("body")
    )
    parsed = bodies.select(
        "hostid",
        F.explode(
            F.arrays_zip(
                F.expr(r"regexp_extract_all(body, '<loc>([^<]+)</loc>', 1)").alias("url"),
                F.expr(
                    r"regexp_extract_all(body, '<lastmod>([^<]+)</lastmod>', 1)"
                ).alias("lastmod"),
            )
        ).alias("e"),
    )
    return parsed.select(
        "hostid", F.col("e.url").alias("url"), F.col("e.lastmod").alias("lastmod")
    ).orderBy("hostid", "url")


SITEMAP_EXTRACT_SQL = f"""
WITH entries AS (
  SELECT (o_custkey % 20)::BIGINT AS hostid,
         '<url><loc>http://s' || (o_custkey % 20)::VARCHAR || '.example.test/o/'
           || o_orderkey::VARCHAR || '</loc><lastmod>'
           || strftime(o_orderdate, '%Y-%m-%d') || '</lastmod></url>' AS entry
  FROM orders WHERE o_custkey % 20 < {N_SITEMAP_HOSTS}
), bodies AS (
  SELECT hostid, string_agg(entry, '' ORDER BY entry) AS body
  FROM entries GROUP BY hostid
)
SELECT hostid,
       unnest(regexp_extract_all(body, '<loc>([^<]+)</loc>', 1)) AS url,
       unnest(regexp_extract_all(body, '<lastmod>([^<]+)</lastmod>', 1)) AS lastmod
FROM bodies
ORDER BY hostid, url
"""


N_ROBOTS_HOSTS = 8


def robots_sitemap_discovery(spark: SparkSession, sf: str) -> DataFrame:
    """Sitemap autodiscovery from robots.txt: per-host robots bodies
    (synthesized from ``supplier`` — Disallow rules interleaved with
    ``Sitemap:`` lines in mixed case/spacing, one with a trailing comment)
    parsed back to (host, sitemap_url) with
    :func:`spider_go_spark.functions.robots.sitemap_urls_col` — the JVM
    higher-order-function twin of the Python kernel's
    ``robots_sitemaps`` (RFC 9309 §2.3: Sitemap records are
    group-independent).

    Scale shape: body assembly is one hash agg per host; extraction is a
    codegen'd map-only projection + explode. No Python, no extra
    shuffle."""
    from spider_go_spark.functions.robots import sitemap_urls_col

    s = T(spark, sf, "supplier")
    hostid = (F.col("s_suppkey") % N_ROBOTS_HOSTS).cast("long")
    key = F.col("s_suppkey").cast("string")
    line = (
        F.when(
            F.col("s_suppkey") % 3 == 0,
            F.concat(
                F.lit("Sitemap: http://h"), hostid.cast("string"),
                F.lit(".example.test/sm/"), key,
                F.lit(".xml # autodiscovered"),
            ),
        )
        .when(
            F.col("s_suppkey") % 3 == 1,
            F.concat(
                F.lit("sitemap : http://h"), hostid.cast("string"),
                F.lit(".example.test/alt/"), key, F.lit(".xml"),
            ),
        )
        .otherwise(F.concat(F.lit("Disallow: /s/"), key))
    )
    bodies = (
        s.select(hostid.alias("hostid"), line.alias("line"))
        .groupBy("hostid")
        .agg(
            F.concat(
                F.lit("User-agent: *\n"),
                F.array_join(F.array_sort(F.collect_list("line")), "\n"),
            ).alias("body")
        )
    )
    return (
        bodies.select(
            "hostid", F.explode(sitemap_urls_col("body")).alias("sitemap_url")
        )
        .orderBy("hostid", "sitemap_url")
    )


ROBOTS_SITEMAP_DISCOVERY_SQL = f"""
WITH lines AS (
  SELECT (s_suppkey % {N_ROBOTS_HOSTS})::BIGINT AS hostid,
         CASE s_suppkey % 3
           WHEN 0 THEN 'Sitemap: http://h' || (s_suppkey % {N_ROBOTS_HOSTS})::VARCHAR
                       || '.example.test/sm/' || s_suppkey::VARCHAR
                       || '.xml # autodiscovered'
           WHEN 1 THEN 'sitemap : http://h' || (s_suppkey % {N_ROBOTS_HOSTS})::VARCHAR
                       || '.example.test/alt/' || s_suppkey::VARCHAR || '.xml'
           ELSE 'Disallow: /s/' || s_suppkey::VARCHAR
         END AS line
  FROM supplier
), bodies AS (
  SELECT hostid,
         'User-agent: *' || chr(10) || string_agg(line, chr(10) ORDER BY line) AS body
  FROM lines GROUP BY hostid
), exploded AS (
  SELECT hostid, unnest(string_split(body, chr(10))) AS l FROM bodies
), parsed AS (
  SELECT hostid,
         lower(trim(split_part(split_part(l, '#', 1), ':', 1))) AS k,
         trim(substr(split_part(l, '#', 1),
                     strpos(split_part(l, '#', 1), ':') + 1)) AS sitemap_url
  FROM exploded
)
SELECT hostid, sitemap_url FROM parsed
WHERE k = 'sitemap' AND sitemap_url <> ''
ORDER BY hostid, sitemap_url
"""


# anchor-text synthesis over interleaved spans: a text span per 5-token
# group at offset 2g; after every 2nd group, a link span at offset 2g+1
# whose media_ref is the target URL and whose text is the group's tokens
# (the <a> inner prose). Shares GROUP_TOKENS with the mediaops synthesis.
ANCHOR_GROUP_TOKENS = 5
ANCHOR_LINK_EVERY = 2
N_ANCHOR_TARGETS = 40


def _synth_link_docs(spark: SparkSession, sf: str) -> DataFrame:
    from spider_go_spark.functions import textkernel as tk

    d = T(spark, sf, "documents")
    toks = d.select("doc_id", tk.tokens(F.col("text")).alias("tokens"))
    n_groups = F.ceil(F.size("tokens") / ANCHOR_GROUP_TOKENS).cast("int")
    gidx = F.sequence(F.lit(0), n_groups - 1)

    def text_span(g):
        return F.struct(
            F.lit("text").alias("kind"),
            F.array_join(
                F.slice(F.col("tokens"), g * ANCHOR_GROUP_TOKENS + 1, ANCHOR_GROUP_TOKENS),
                " ",
            ).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            (g * 2).cast("int").alias("offset"),
        )

    def link_span(g):
        return F.struct(
            F.when(g % ANCHOR_LINK_EVERY == 0, F.lit("link"))
            .otherwise(F.lit("skip"))
            .alias("kind"),
            F.array_join(
                F.slice(F.col("tokens"), g * ANCHOR_GROUP_TOKENS + 1, ANCHOR_GROUP_TOKENS),
                " ",
            ).alias("text"),
            F.concat(
                F.lit("http://t"),
                ((F.col("doc_id") * 7 + g) % N_ANCHOR_TARGETS).cast("string"),
                F.lit(".example.test/"),
            ).alias("media_ref"),
            (g * 2 + 1).cast("int").alias("offset"),
        )

    spans = F.filter(
        F.flatten(F.transform(gidx, lambda g: F.array(text_span(g), link_span(g)))),
        lambda s: s["kind"] != F.lit("skip"),
    )
    return toks.filter(F.size("tokens") > 0).select("doc_id", spans.alias("spans"))


def anchor_text_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Anchor-text aggregation through the REAL interleaved-span operator
    (functions/spans.link_anchor_texts): extract (href, anchor) from link
    spans, tokenize the anchor prose, and keep each target's most frequent
    anchor term — the off-page relevance signal (what other pages call a
    page) that crawl prioritizers and rankers consume.

    Scale shape: extraction is a map-only HOF projection; the only
    shuffles are the hash agg on (href, term) — bounded by targets ×
    vocabulary, not by corpus size — and a top-1 window over that already
    aggregated set."""
    from spider_go_spark.functions import textkernel as tk
    from spider_go_spark.functions.spans import link_anchor_texts

    anchors = link_anchor_texts(_synth_link_docs(spark, sf))
    terms = anchors.select(
        "href", F.explode(tk.tokens(F.col("anchor"))).alias("term")
    )
    counts = terms.groupBy("href", "term").agg(F.count("*").alias("n_mentions"))
    w = Window.partitionBy("href").orderBy(F.desc("n_mentions"), "term")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
        .orderBy("href")
    )


FOCUS_TOPIC = ("spark", "scan", "window")  # shares the BM25 query terms
FOCUS_REL_MIN_PM = 300  # a link counts as on-topic at ≥ 0.3 Jaccard


def focused_crawl_relevance(spark: SparkSession, sf: str) -> DataFrame:
    """Focused-crawl target scoring (Shark-Search family, Hersovici et
    al. 1998): rank un-fetched link targets by how well their ANCHOR
    TEXT matches the crawl topic — the signal a focused crawler uses to
    decide which frontier URLs are worth budget before ever fetching
    them. Relevance is integer Jaccard per-mille between the link's
    distinct anchor tokens and the topic term set; per target we report
    the best link's relevance, the total in-links, and how many clear
    the on-topic threshold (multiply-free: the threshold test is on the
    already-integer per-mille score).

    Scale shape: anchor extraction is the map-only span HOF; the Jaccard
    is a pure projection (array_intersect/union on a 3-term literal);
    the only shuffle is the per-target hash agg — bounded by distinct
    targets, not corpus size."""
    from spider_go_spark.functions import textkernel as tk
    from spider_go_spark.functions.spans import link_anchor_texts

    anchors = link_anchor_texts(_synth_link_docs(spark, sf))
    topic = F.array(*[F.lit(t) for t in FOCUS_TOPIC])
    rel = anchors.select(
        "href",
        (
            1000
            * F.size(F.array_intersect(F.array_distinct(tk.tokens(F.col("anchor"))), topic))
        )
        .cast("long")
        .alias("inter_k"),
        F.size(F.array_union(F.array_distinct(tk.tokens(F.col("anchor"))), topic))
        .cast("long")
        .alias("union_n"),
    ).select("href", F.expr("inter_k div union_n").alias("rel_pm"))
    return (
        rel.groupBy("href")
        .agg(
            F.max("rel_pm").alias("best_pm"),
            F.count(F.lit(1)).cast("long").alias("n_links"),
            F.sum(F.when(F.col("rel_pm") >= FOCUS_REL_MIN_PM, 1).otherwise(0))
            .cast("long")
            .alias("n_on_topic"),
        )
        .orderBy(F.desc("best_pm"), "href")
    )


def _focused_sql() -> str:
    topic = ", ".join(f"'{t}'" for t in FOCUS_TOPIC)
    return rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), gs AS (
  SELECT doc_id, tokens,
         unnest(range(0, (len(tokens) + {ANCHOR_GROUP_TOKENS} - 1) // {ANCHOR_GROUP_TOKENS})) AS g
  FROM toks WHERE len(tokens) > 0
), links AS (
  SELECT 'http://t' || ((doc_id * 7 + g) % {N_ANCHOR_TARGETS})::VARCHAR
           || '.example.test/' AS href,
         list_distinct(tokens[{ANCHOR_GROUP_TOKENS}*g + 1 : {ANCHOR_GROUP_TOKENS}*(g+1)]) AS at
  FROM gs WHERE g % {ANCHOR_LINK_EVERY} = 0
), rel AS (
  SELECT href,
         ((1000 * len(list_intersect(at, [{topic}])))
           // len(list_distinct(at || [{topic}])))::BIGINT AS rel_pm
  FROM links
)
SELECT href, max(rel_pm)::BIGINT AS best_pm, count(*)::BIGINT AS n_links,
       sum(CASE WHEN rel_pm >= {FOCUS_REL_MIN_PM} THEN 1 ELSE 0 END)::BIGINT AS n_on_topic
FROM rel GROUP BY href
ORDER BY best_pm DESC, href
"""


FOCUSED_CRAWL_RELEVANCE_SQL = _focused_sql()
ANCHOR_TEXT_TOPK_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), gs AS (
  SELECT doc_id, tokens,
         unnest(range(0, (len(tokens) + {ANCHOR_GROUP_TOKENS} - 1) // {ANCHOR_GROUP_TOKENS})) AS g
  FROM toks WHERE len(tokens) > 0
), links AS (
  SELECT 'http://t' || ((doc_id * 7 + g) % {N_ANCHOR_TARGETS})::VARCHAR
           || '.example.test/' AS href,
         unnest(tokens[{ANCHOR_GROUP_TOKENS}*g + 1 : {ANCHOR_GROUP_TOKENS}*(g+1)]) AS term
  FROM gs WHERE g % {ANCHOR_LINK_EVERY} = 0
), counts AS (
  SELECT href, term, count(*) AS n_mentions FROM links GROUP BY href, term
)
SELECT href, term, n_mentions
FROM counts
QUALIFY row_number() OVER (PARTITION BY href ORDER BY n_mentions DESC, term) = 1
ORDER BY href
"""


N_SRC_HOSTS = 12  # host collapse of the link-doc sources
HOST_PR_ITERS = 3
HOST_PR_TOPK = 15


def host_pagerank_top(spark: SparkSession, sf: str) -> DataFrame:
    """Host-graph PageRank: collapse the URL-level link graph to host
    level (src host = the linking doc's host, dst host = the link target's
    host, edge weight = number of URL-level links between the pair), then
    rank hosts with weighted int64 PageRank
    (operators/graph.pagerank_weighted_int) — the domain-authority signal
    crawl schedulers budget by (a host pointed at by many others earns
    fetch priority for ALL its URLs, far cheaper to maintain than
    URL-level rank at 10^10 frontier scale: the collapsed graph is ~10^4×
    smaller).

    Scale shape: the collapse is one (src,dst) hash agg — the iteration
    then runs on the host graph, whose size is independent of corpus
    size; top-k is TakeOrderedAndProject. Bit-exact vs the unrolled-CTE
    oracle (same fixed-point contract as pagerank_top20)."""
    from spider_go_spark.functions.spans import link_anchor_texts
    from spider_go_spark.operators.graph import pagerank_weighted_int

    links = link_anchor_texts(_synth_link_docs(spark, sf))
    edges = (
        links.select(
            F.concat(F.lit("d"), (F.col("doc_id") % N_SRC_HOSTS).cast("string")).alias(
                "src"
            ),
            F.regexp_extract("href", r"^[a-z0-9+.-]+://([^/:?#]*)", 1).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = pagerank_weighted_int(edges, HOST_PR_ITERS)
    return ranks.orderBy(F.col("rank_u").desc(), "node").limit(HOST_PR_TOPK)


from spider_go_spark.operators.graph import pagerank_weighted_oracle_sql  # noqa: E402

_HOST_EDGES_CTE = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), gs AS (
  SELECT doc_id,
         unnest(range(0, (len(tokens) + {ANCHOR_GROUP_TOKENS} - 1) // {ANCHOR_GROUP_TOKENS})) AS g
  FROM toks WHERE len(tokens) > 0
), edges AS (
  SELECT 'd' || (doc_id % {N_SRC_HOSTS})::VARCHAR AS src,
         't' || ((doc_id * 7 + g) % {N_ANCHOR_TARGETS})::VARCHAR || '.example.test' AS dst,
         count(*)::BIGINT AS w
  FROM gs WHERE g % {ANCHOR_LINK_EVERY} = 0
  GROUP BY 1, 2
)"""

HOST_PAGERANK_TOP_SQL = (
    pagerank_weighted_oracle_sql(_HOST_EDGES_CTE, HOST_PR_ITERS)
    + f"""
SELECT node, rank_u FROM rank{HOST_PR_ITERS}
ORDER BY rank_u DESC, node LIMIT {HOST_PR_TOPK}
"""
)


TRUSTED_HOSTS = ["d0", "d1", "d2"]  # the vetted seed-list stand-in
TRUSTRANK_ITERS = 3


def host_trustrank_top(spark: SparkSession, sf: str) -> DataFrame:
    """Host-graph TrustRank (Gyöngyi et al. 2004): teleport mass lands only
    on the vetted seed hosts, so trust flows outward along links — hosts
    unreachable from the seed list score ~0 even if heavily interlinked.
    Paired with host_pagerank_top this is the crawl-side spam fingerprint
    (high rank + low trust); as a standalone signal it is the whitelist-
    biased fetch-priority crawlers use for new/unknown hosts.

    Scale shape: identical to host PageRank — the iteration runs on the
    collapsed host graph (~10^4× smaller than the URL graph); the seed
    flag is a broadcast left join. Bit-exact int64 fixed point vs the
    unrolled-CTE oracle (operators/graph.trustrank_oracle_sql)."""
    from spider_go_spark.functions.spans import link_anchor_texts
    from spider_go_spark.operators.graph import trustrank_int

    links = link_anchor_texts(_synth_link_docs(spark, sf))
    edges = links.select(
        F.concat(F.lit("d"), (F.col("doc_id") % N_SRC_HOSTS).cast("string")).alias(
            "src"
        ),
        F.regexp_extract("href", r"^[a-z0-9+.-]+://([^/:?#]*)", 1).alias("dst"),
    ).distinct()
    trusted = spark.createDataFrame([(h,) for h in TRUSTED_HOSTS], "node string")
    ranks = trustrank_int(edges, trusted, TRUSTRANK_ITERS)
    return ranks.orderBy(F.col("trust_u").desc(), "node").limit(HOST_PR_TOPK)


from spider_go_spark.operators.graph import trustrank_oracle_sql  # noqa: E402

_HOST_EDGES_UNW_CTE = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), gs AS (
  SELECT doc_id,
         unnest(range(0, (len(tokens) + {ANCHOR_GROUP_TOKENS} - 1) // {ANCHOR_GROUP_TOKENS})) AS g
  FROM toks WHERE len(tokens) > 0
), edges AS (
  SELECT DISTINCT 'd' || (doc_id % {N_SRC_HOSTS})::VARCHAR AS src,
         't' || ((doc_id * 7 + g) % {N_ANCHOR_TARGETS})::VARCHAR || '.example.test' AS dst
  FROM gs WHERE g % {ANCHOR_LINK_EVERY} = 0
)"""

_TRUSTED_SQL = " UNION ALL ".join(f"SELECT '{h}' AS node" for h in TRUSTED_HOSTS)

HOST_TRUSTRANK_TOP_SQL = (
    trustrank_oracle_sql(_HOST_EDGES_UNW_CTE, _TRUSTED_SQL, TRUSTRANK_ITERS)
    + f"""
SELECT node, trust_u FROM trust{TRUSTRANK_ITERS}
ORDER BY trust_u DESC, node LIMIT {HOST_PR_TOPK}
"""
)


SPAM_MASS_TOPK = 25
SPAM_MASS_MIN_RANK = 160_000  # above the 150k teleport floor: earns rank from links


def host_spam_mass(spark: SparkSession, sf: str) -> DataFrame:
    """Relative spam mass (Gyöngyi, Garcia-Molina & Pedersen, "Link Spam
    Detection Based on Mass Estimation", VLDB 2006): the fraction of a
    host's PageRank NOT accounted for by trust flowing from the vetted
    seed list — ``mass_pm = (rank − min(trust, rank)) · 1000 div rank``
    per-mille. High rank + high mass is the link-farm fingerprint: the
    host earns its rank from pages the seed set cannot reach. This is the
    demotion signal a crawl scheduler applies on top of raw host rank.

    Both kernels run over ONE shared host edge set (the same collapsed
    graph host_trustrank_top uses), so the scale shape is two independent
    fixed-point iterations on the ~10^4×-collapsed graph plus one final
    equi-join. Integer per-mille keeps the product rank_u·1000 int64-safe
    to ~9·10^9 hosts. Bit-exact vs the composed unrolled-CTE oracle
    (trustrank chain + pagerank_iters_sql over the same nodes/e CTEs)."""
    from spider_go_spark.functions.spans import link_anchor_texts
    from spider_go_spark.operators.graph import pagerank_int, trustrank_int

    links = link_anchor_texts(_synth_link_docs(spark, sf))
    edges = links.select(
        F.concat(F.lit("d"), (F.col("doc_id") % N_SRC_HOSTS).cast("string")).alias(
            "src"
        ),
        F.regexp_extract("href", r"^[a-z0-9+.-]+://([^/:?#]*)", 1).alias("dst"),
    ).distinct()
    trusted = spark.createDataFrame([(h,) for h in TRUSTED_HOSTS], "node string")
    pr = pagerank_int(edges, TRUSTRANK_ITERS)
    tr = trustrank_int(edges, trusted, TRUSTRANK_ITERS)
    return (
        pr.join(tr, "node")
        .filter(F.col("rank_u") >= SPAM_MASS_MIN_RANK)
        .select(
            "node",
            "rank_u",
            "trust_u",
            F.expr("((rank_u - least(trust_u, rank_u)) * 1000) div rank_u").alias(
                "mass_pm"
            ),
        )
        .orderBy(F.col("mass_pm").desc(), F.col("rank_u").desc(), "node")
        .limit(SPAM_MASS_TOPK)
    )


from spider_go_spark.operators.graph import pagerank_iters_sql  # noqa: E402

HOST_SPAM_MASS_SQL = (
    trustrank_oracle_sql(_HOST_EDGES_UNW_CTE, _TRUSTED_SQL, TRUSTRANK_ITERS)
    + pagerank_iters_sql(TRUSTRANK_ITERS)
    + f"""
SELECT r.node, r.rank_u, t.trust_u,
       ((r.rank_u - least(t.trust_u, r.rank_u)) * 1000) // r.rank_u AS mass_pm
FROM rank{TRUSTRANK_ITERS} r JOIN trust{TRUSTRANK_ITERS} t ON r.node = t.node
WHERE r.rank_u >= {SPAM_MASS_MIN_RANK}
ORDER BY mass_pm DESC, r.rank_u DESC, r.node LIMIT {SPAM_MASS_TOPK}
"""
)


COCITE_MAX_OUTDEG = 64  # hub cap: a source linking to everything says nothing
COCITE_TOPK = 30


def host_cocitation(spark: SparkSession, sf: str) -> DataFrame:
    """Co-citation host similarity (Small 1973, applied to the web by
    Dean & Henzinger's related-pages work): two hosts are related when
    many SOURCES link to both — the crawl-side "users who fetched A also
    need B" signal for seed expansion and related-host discovery.

    Scale shape: the pair generation is a self-equi-join on the source
    key, which is quadratic in per-source out-degree — so sources above
    ``COCITE_MAX_OUTDEG`` are dropped first (the standard hub cap: a page
    linking to everything carries no discrimination, and the cap bounds
    the join fan-out at outdeg²/2 per source). After the cap the plan is
    one equi-join + one hash agg on the pair key; the canonical a < b
    ordering halves the pair space and makes the count engine-invariant."""
    from spider_go_spark.functions.spans import link_anchor_texts

    links = link_anchor_texts(_synth_link_docs(spark, sf))
    edges = links.select(
        F.concat(F.lit("d"), (F.col("doc_id") % N_SRC_HOSTS).cast("string")).alias(
            "src"
        ),
        F.regexp_extract("href", r"^[a-z0-9+.-]+://([^/:?#]*)", 1).alias("dst"),
    ).distinct()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    capped = edges.join(
        outdeg.filter(F.col("outdeg") <= COCITE_MAX_OUTDEG).select("src"), "src"
    )
    pairs = (
        capped.alias("a")
        .join(capped.alias("b"), "src")
        .filter(F.col("a.dst") < F.col("b.dst"))
        .select(F.col("a.dst").alias("host_a"), F.col("b.dst").alias("host_b"))
    )
    return (
        pairs.groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cociting"))
        .orderBy(F.desc("n_cociting"), "host_a", "host_b")
        .limit(COCITE_TOPK)
    )


HOST_COCITATION_SQL = rf"""
{_HOST_EDGES_UNW_CTE}
, outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
capped AS (
  SELECT e.src, e.dst FROM edges e JOIN outdeg o USING (src)
  WHERE o.outdeg <= {COCITE_MAX_OUTDEG}
)
SELECT a.dst AS host_a, b.dst AS host_b, count(*)::BIGINT AS n_cociting
FROM capped a JOIN capped b ON a.src = b.src AND a.dst < b.dst
GROUP BY a.dst, b.dst
ORDER BY n_cociting DESC, host_a, host_b LIMIT {COCITE_TOPK}
"""



# --------------------------------------------------------------------------
# retrieval over the fetched corpus: inverted-index dictionary, positional
# phrase match, boolean posting-list retrieval
# --------------------------------------------------------------------------

INDEX_TOP_TERMS = 50
PHRASE = ("table", "part")  # the two-term phrase the gate scans for
BOOL_MUST = "join"
BOOL_MUST_NOT = "hash"
BOOL_LIMIT = 100


def inverted_index_stats(spark: SparkSession, sf: str) -> DataFrame:
    """The inverted-index *dictionary*: per term, document frequency,
    total term frequency, the maximum per-document tf and the first
    posting (min doc_id) — the stats a query planner reads before touching
    posting lists (term selectivity ordering, tf ceiling for score
    bounds). Top INDEX_TOP_TERMS by df. Complements
    ``pipelineops.inverted_index_topterms``, which materializes posting-
    list HEADS over distinct (doc, term) presence; this op aggregates the
    tf-weighted dictionary a scorer needs (tf_total / tf_max bounds) and
    never materializes postings at all.

    Scale shape: one explode of the token stream, one (doc, term) hash agg
    (map-side partials collapse within-doc repeats), one term-keyed agg —
    both shuffles keyed by near-uniform term/doc hashes; top-k is
    TakeOrderedAndProject. This IS the distributed index build: persisting
    the (term, doc_id, tf) intermediate as a SURT-style sorted table would
    be the posting store."""
    from spider_go_spark.functions import textkernel as tk

    d = T(spark, sf, "documents")
    occ = d.select(
        "doc_id", F.explode(tk.tokens(F.col("text"))).alias("term")
    )
    postings = occ.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    return (
        postings.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("tf_total"),
            F.max("tf").alias("tf_max"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy(F.col("df").desc(), "term")
        .limit(INDEX_TOP_TERMS)
    )


INVERTED_INDEX_STATS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), occ AS (
  SELECT doc_id, unnest(tokens) AS term FROM toks
), postings AS (
  SELECT term, doc_id, count(*)::BIGINT AS tf FROM occ GROUP BY term, doc_id
)
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS tf_total,
       max(tf)::BIGINT AS tf_max, min(doc_id) AS first_doc
FROM postings GROUP BY term
ORDER BY df DESC, term LIMIT {INDEX_TOP_TERMS}
"""


def phrase_match(spark: SparkSession, sf: str) -> DataFrame:
    """Positional phrase match: per document, the number of adjacent
    ``"{PHRASE[0]} {PHRASE[1]}"`` occurrences in the token stream — the
    positional-index query shape (terms must co-occur at consecutive
    positions, not merely in the same doc).

    Spark-first: positions live inside the per-doc token array, so the
    adjacency test is one higher-order fold over 1-based ``element_at``
    pairs — a pure codegen projection, NO shuffle and no posting self-join
    at any corpus size (the oracle recomputes the same count from raw
    text). Docs with fewer than two tokens short-circuit to zero (guards
    Spark's descending ``sequence(1, 0)``)."""
    from spider_go_spark.functions import textkernel as tk

    a, b = PHRASE
    # one small parquet file = one input partition: spread the CPU-heavy
    # HOF fold across cores before paying it (tiny-row/heavy-CPU stages
    # under-parallelize on bytes-based splits — README scale note)
    d = T(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    hits = F.expr(
        f"""CASE WHEN size(_toks) >= 2 THEN size(filter(
              sequence(1, size(_toks) - 1),
              i -> element_at(_toks, i) = '{a}'
                   AND element_at(_toks, i + 1) = '{b}'))
            ELSE 0 END"""
    ).cast("bigint")
    # the trivial groupBy on the unique doc_id is an AGGREGATION BARRIER:
    # without it Catalyst pushes filter(n_hits > 0) — with the whole HOF
    # fold inlined — below the repartition onto the single-partition scan,
    # serializing the CPU-heavy predicate onto one core (measured 3.7s vs
    # 0.4s at sf0.1). Predicates cannot push below an aggregate, so the
    # fold runs once, post-exchange, on all cores; the extra shuffle is
    # (doc_id, n_hits) pairs only.
    return (
        d.select("doc_id", tk.tokens(F.col("text")).alias("_toks"))
        .select("doc_id", hits.alias("n_hits"))
        .groupBy("doc_id")
        .agg(F.max("n_hits").alias("n_hits"))
        .filter(F.col("n_hits") > 0)
        .orderBy("doc_id")
    )


PHRASE_MATCH_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), hits AS (
  SELECT doc_id,
         CASE WHEN len(tokens) >= 2 THEN len(list_filter(range(1, len(tokens)),
           i -> tokens[i] = '{PHRASE[0]}' AND tokens[i + 1] = '{PHRASE[1]}'))
         ELSE 0 END::BIGINT AS n_hits
  FROM toks
)
SELECT doc_id, n_hits FROM hits WHERE n_hits > 0 ORDER BY doc_id
"""


def boolean_retrieval(spark: SparkSession, sf: str) -> DataFrame:
    """Boolean retrieval ``{BOOL_MUST} AND NOT {BOOL_MUST_NOT}``: documents
    whose postings contain the MUST term and not the MUST-NOT term, with
    the MUST term's tf. The posting-list shape: per-term postings are
    pre-filtered BEFORE any join, so the semi/anti joins run over two
    term-sized lists (each ≪ corpus), keyed by doc_id — never a corpus
    self-join. At index scale both sides come straight off the term's
    bucket of a sorted posting store."""
    from spider_go_spark.functions import textkernel as tk

    d = T(spark, sf, "documents")
    occ = d.select("doc_id", F.explode(tk.tokens(F.col("text"))).alias("term"))
    must = (
        occ.filter(F.col("term") == BOOL_MUST)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    must_not = occ.filter(F.col("term") == BOOL_MUST_NOT).select("doc_id").distinct()
    return (
        must.join(must_not, "doc_id", "left_anti")
        .orderBy(F.col("tf").desc(), "doc_id")
        .limit(BOOL_LIMIT)
    )


BOOLEAN_RETRIEVAL_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), occ AS (
  SELECT doc_id, unnest(tokens) AS term FROM toks
), must AS (
  SELECT doc_id, count(*)::BIGINT AS tf FROM occ WHERE term = '{BOOL_MUST}' GROUP BY doc_id
), must_not AS (
  SELECT DISTINCT doc_id FROM occ WHERE term = '{BOOL_MUST_NOT}'
)
SELECT m.doc_id, m.tf FROM must m
WHERE m.doc_id NOT IN (SELECT doc_id FROM must_not)
ORDER BY m.tf DESC, m.doc_id LIMIT {BOOL_LIMIT}
"""


N_LOC_HOSTS = 6  # registrable domains on the example.test side


def link_locality_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Link-locality audit: classify every link edge as intra-host,
    intra-domain (same eTLD+1, different subdomain) or cross-domain using
    the PSL kernel, and profile each source host's mix — the nepotistic-
    link spam signal (a host whose "inlink wealth" is manufactured inside
    its own registrable domain earns no authority; rankers like TrustRank
    discount intra-domain edges, and this op is the audit that says by how
    much per host). Four deterministic target shapes per lineitem row:
    self-link, sibling-subdomain, sibling-domain, off-site.

    Scale shape: the PSL classification is a codegen'd regexp projection
    on both endpoints (no dictionary join), then one hash agg keyed by
    source host — output rows = hosts, not edges."""
    from spider_go_spark.functions.urls import registrable_domain

    li = T(spark, sf, "lineitem")
    k = (F.col("l_suppkey") % N_LOC_HOSTS).cast("string")
    k2 = ((F.col("l_suppkey") + 1) % N_LOC_HOSTS).cast("string")
    src = F.concat(
        F.lit("s"), (F.col("l_linenumber") % 3).cast("string"),
        F.lit(".h"), k, F.lit(".example.test"),
    )
    dst = (
        F.when(F.col("l_partkey") % 4 == 0, src)
        .when(F.col("l_partkey") % 4 == 1,
              F.concat(F.lit("w.h"), k, F.lit(".example.test")))
        .when(F.col("l_partkey") % 4 == 2,
              F.concat(F.lit("s1.h"), k2, F.lit(".example.test")))
        .otherwise(
            F.concat(F.lit("b"), (F.col("l_partkey") % 20).cast("string"),
                     F.lit(".blog.fake")))
    )
    edges = (
        li.select(src.alias("src_host"), dst.alias("dst_host"))
        .withColumn("src_dom", registrable_domain("src_host"))
        .withColumn("dst_dom", registrable_domain("dst_host"))
    )
    same_host = (F.col("src_host") == F.col("dst_host")).cast("long")
    same_dom = (F.col("src_dom") == F.col("dst_dom")).cast("long")
    return (
        edges.groupBy("src_host")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.sum(same_host).alias("n_intra_host"),
            F.sum(same_dom * (1 - same_host)).alias("n_intra_domain"),
            F.sum(1 - same_dom).alias("n_cross_domain"),
        )
        .withColumn("pm_cross", F.expr("1000 * n_cross_domain div n_links"))
        .orderBy("src_host")
    )


def _link_locality_sql() -> str:
    from spider_go_spark.functions.urls import registrable_domain_sql

    return f"""
WITH edges AS (
  SELECT 's' || (l_linenumber % 3)::VARCHAR || '.h' || (l_suppkey % {N_LOC_HOSTS})::VARCHAR
           || '.example.test' AS src_host,
         CASE l_partkey % 4
           WHEN 0 THEN 's' || (l_linenumber % 3)::VARCHAR || '.h'
                       || (l_suppkey % {N_LOC_HOSTS})::VARCHAR || '.example.test'
           WHEN 1 THEN 'w.h' || (l_suppkey % {N_LOC_HOSTS})::VARCHAR || '.example.test'
           WHEN 2 THEN 's1.h' || ((l_suppkey + 1) % {N_LOC_HOSTS})::VARCHAR || '.example.test'
           ELSE 'b' || (l_partkey % 20)::VARCHAR || '.blog.fake' END AS dst_host
  FROM lineitem
), cls AS (
  SELECT src_host,
         (src_host = dst_host)::BIGINT AS same_host,
         ({registrable_domain_sql('src_host')} = {registrable_domain_sql('dst_host')})::BIGINT
           AS same_dom
  FROM edges
)
SELECT src_host, count(*)::BIGINT AS n_links,
       sum(same_host)::BIGINT AS n_intra_host,
       sum(same_dom * (1 - same_host))::BIGINT AS n_intra_domain,
       sum(1 - same_dom)::BIGINT AS n_cross_domain,
       ((1000 * sum(1 - same_dom)) // count(*))::BIGINT AS pm_cross
FROM cls GROUP BY src_host ORDER BY src_host
"""


LINK_LOCALITY_AUDIT_SQL = _link_locality_sql()


POSTING_MIN_DF = 50
POSTING_TOP = 50


def posting_compression_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Posting-list compression planning: per frequent term, the exact
    byte cost of its delta-encoded posting list under LEB128 varints —
    gap = doc_id − previous doc_id (first entry stores doc_id + 1), varint
    bytes = ⌈bit_length(gap)/7⌉ — plus the maximum gap. This is how an
    index sizes itself before materializing: Σ index_bytes over the
    dictionary is the posting-store footprint, and high-df terms compress
    toward 1 byte/posting (dense ids ⇒ small gaps), which this makes
    visible term by term.

    Scale shape: one distinct on (term, doc_id); the lag window runs
    per-term — the posting sort IS the index build, so the shuffle it
    costs is the one the real artifact needs anyway; bit_length is
    length(bin(x)) on both engines; top-N is TakeOrderedAndProject."""
    from spider_go_spark.functions import textkernel as tk

    d = T(spark, sf, "documents")
    postings = (
        d.select("doc_id", F.explode(tk.tokens(F.col("text"))).alias("term"))
        .select("term", "doc_id")
        .distinct()
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    gaps = postings.withColumn(
        "gap",
        F.coalesce(F.col("doc_id") - F.lag("doc_id").over(w), F.col("doc_id") + 1),
    )
    vbytes = F.expr("(length(bin(gap)) + 6) div 7")
    return (
        gaps.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum(vbytes).alias("index_bytes"),
            F.max("gap").alias("max_gap"),
        )
        .filter(F.col("df") >= POSTING_MIN_DF)
        .orderBy(F.desc("index_bytes"), "term")
        .limit(POSTING_TOP)
    )


POSTING_COMPRESSION_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), postings AS (
  SELECT DISTINCT term, doc_id
  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
), gaps AS (
  SELECT term,
         coalesce(doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id),
                  doc_id + 1) AS gap
  FROM postings
)
SELECT term, count(*)::BIGINT AS df,
       sum((length(bin(gap)) + 6) // 7)::BIGINT AS index_bytes,
       max(gap)::BIGINT AS max_gap
FROM gaps GROUP BY term
HAVING count(*) >= {POSTING_MIN_DF}
ORDER BY index_bytes DESC, term LIMIT {POSTING_TOP}
"""


N_FARM_SUBS = 8  # distinct registrable domains on the subdomain-farm side
FARM_HOST_FLAG = 4  # >= this many distinct hosts under one domain => farm


def domain_farm_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Registrable-domain (eTLD+1) politeness/spam audit: hosts collapse to
    their PUBLIC-SUFFIX-LIST registrable domain (functions/urls.
    registrable_domain — longest-rule-wins incl. wildcard/exception
    semantics), then per domain: distinct-host and URL counts plus a
    subdomain-farm flag. Per-host budgets alone hand a link farm the whole
    round (one registered name, thousands of subdomains); this is the
    grouping politeness must ALSO cap on, and the farm flag is the spam
    signal. Two synthetic shapes: subdomain farms (sN.hK.example.test —
    many hosts per domain) and a blogspot-like private suffix
    (bK.blog.fake — each subdomain its own registrable domain).

    Scale shape: the PSL cascade is a codegen'd regexp projection (no
    Python, no dictionary join); then one hash agg keyed by domain —
    key count ≈ registered domains ≪ hosts ≪ URLs."""
    from spider_go_spark.functions.urls import registrable_domain

    li = T(spark, sf, "lineitem")
    host = F.when(
        F.col("l_linenumber") % 2 == 1,
        F.concat(
            F.lit("s"), F.col("l_linenumber").cast("string"),
            F.lit(".h"), (F.col("l_suppkey") % N_FARM_SUBS).cast("string"),
            F.lit(".example.test"),
        ),
    ).otherwise(
        F.concat(
            F.lit("b"), (F.col("l_partkey") % 50).cast("string"),
            F.lit(".blog.fake"),
        )
    )
    return (
        li.select(host.alias("host"))
        .withColumn("domain", registrable_domain("host"))
        .groupBy("domain")
        .agg(
            F.countDistinct("host").cast("long").alias("n_hosts"),
            F.count(F.lit(1)).alias("n_urls"),
        )
        .withColumn("is_farm", F.col("n_hosts") >= F.lit(FARM_HOST_FLAG))
        .orderBy(F.desc("n_urls"), "domain")
        .limit(40)
    )


def _domain_farm_sql() -> str:
    from spider_go_spark.functions.urls import registrable_domain_sql

    return f"""
WITH hosts AS (
  SELECT CASE WHEN l_linenumber % 2 = 1
              THEN 's' || l_linenumber::VARCHAR || '.h'
                   || (l_suppkey % {N_FARM_SUBS})::VARCHAR || '.example.test'
              ELSE 'b' || (l_partkey % 50)::VARCHAR || '.blog.fake' END AS host
  FROM lineitem
), dom AS (
  SELECT host, {registrable_domain_sql('host')} AS domain FROM hosts
)
SELECT domain, count(DISTINCT host)::BIGINT AS n_hosts, count(*)::BIGINT AS n_urls,
       (count(DISTINCT host) >= {FARM_HOST_FLAG}) AS is_farm
FROM dom GROUP BY domain
ORDER BY n_urls DESC, domain LIMIT 40
"""


DOMAIN_FARM_AUDIT_SQL = _domain_farm_sql()


# --------------------------------------------------------------------------
# BM25 ranked retrieval — the scoring layer over the posting lists above.
# All math is int64 fixed point: the Robertson idf log2((N - df + 0.5)/
# (df + 0.5) + 1) = log2((2N+2)/(2df+1)) runs through the exact integer
# binary-log kernel (functions/intmath.log2_q20, Q20 fixed point — a float
# ln() would not hash-match cross-engine), and the tf saturation uses
# milli-unit integer division with k1 = 1.2, b = 0.75. log2 vs ln scales
# every score by the same 1/ln(2), so the ranking is exactly classic BM25's.
# --------------------------------------------------------------------------

BM25_TERMS = ("spark", "scan", "window")
BM25_K1 = 1200  # k1 = 1.2 in milli-units
BM25_B = 750  # b = 0.75 in milli-units
BM25_TOP_K = 25


def bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 top-k: rank documents for the {BM25_TERMS} query.

    Posting-list shape end to end: the token stream is filtered to the
    query terms BEFORE any aggregation (term-sized postings, never a
    corpus-wide (doc, term) matrix); doc lengths are a map-side size()
    projection; corpus stats (N, total length) are a single-row agg
    broadcast back; idf is computed on |query| rows; the final score join
    runs over |postings| rows keyed by doc_id and the top-k is
    TakeOrderedAndProject. At index scale, postings come straight off each
    term's bucket of a sorted posting store and everything after the
    per-term scan is proportional to hits, not corpus.
    """
    from spider_go_spark.functions import textkernel as tk
    from spider_go_spark.functions.intmath import log2_q20

    d = T(spark, sf, "documents")
    toks = d.select("doc_id", tk.tokens(F.col("text")).alias("toks"))
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    occ = toks.select("doc_id", F.explode("toks").alias("term")).filter(
        F.col("term").isin(*BM25_TERMS)
    )
    postings = occ.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = df_t.crossJoin(F.broadcast(corpus)).select(
        "term", log2_q20("2 * n_docs + 2", "2 * df + 1").alias("idf_q20")
    )
    scored = (
        postings.join(dl, "doc_id")
        .join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "s_q20",
            F.expr(
                f"(idf_q20 * ((1000 * tf * (1000 + {BM25_K1})) div"
                f" (1000 * tf + {BM25_K1} * (1000 - {BM25_B}"
                f"   + ({BM25_B} * ((dl * n_docs * 1000) div total_dl)) div 1000))))"
                f" div 1000"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("s_q20").alias("score_q20"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
        .orderBy(F.desc("score_q20"), "doc_id")
        .limit(BM25_TOP_K)
    )


def _bm25_sql() -> str:
    from spider_go_spark.functions.intmath import log2_q20_duckdb_ctes

    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    lg = log2_q20_duckdb_ctes(
        "2 * n_docs + 2", "2 * df + 1", "(SELECT term, df, n_docs FROM dft, corpus)", "term"
    )
    return rf"""
WITH RECURSIVE toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM toks
), corpus AS (
  SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_dl FROM dl
), occ AS (
  SELECT doc_id, unnest(tokens) AS term FROM toks
), postings AS (
  SELECT term, doc_id, count(*)::BIGINT AS tf
  FROM occ WHERE term IN ({terms}) GROUP BY term, doc_id
), dft AS (
  SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY term
), {lg}, scored AS (
  SELECT p.doc_id,
         (lg.log2_q20 * ((1000 * p.tf * (1000 + {BM25_K1})) //
           (1000 * p.tf + {BM25_K1} * (1000 - {BM25_B}
             + ({BM25_B} * ((d.dl * c.n_docs * 1000) // c.total_dl)) // 1000)))) // 1000
           AS s_q20
  FROM postings p JOIN dl d USING (doc_id) JOIN lg USING (term), corpus c
)
SELECT doc_id, sum(s_q20)::BIGINT AS score_q20, count(*)::BIGINT AS n_terms
FROM scored GROUP BY doc_id
ORDER BY score_q20 DESC, doc_id LIMIT {BM25_TOP_K}
"""


BM25_TOPK_SQL = _bm25_sql()


# --------------------------------------------------------------------------
# Static index pruning (Carmel et al., SIGIR 2001): for each frequent term,
# keep only the postings whose BM25 impact is within ε of the term's top
# impact — the lossy index-size/quality dial large search deployments tune
# (impact-ordered posting lists store exactly these per-term score tops).
# --------------------------------------------------------------------------

PRUNE_TOP_TERMS = 40
PRUNE_EPS_PM = 500  # keep postings scoring ≥ 0.5 × the term's top impact


def index_prune_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-term static-pruning report over the ``PRUNE_TOP_TERMS`` most
    frequent terms: posting count (df), postings kept at the ε threshold,
    the pruned fraction in per-mille, and the term's top impact score.

    Scale shape: term selection and df are one hash agg over the token
    stream; scoring reuses the BM25 int64 kernel on postings of the
    selected terms only (a broadcast semi-join — 40 rows); the keep test
    is the multiply-compare ``s·1000 ≥ top·ε`` so no division truncation
    can disagree across engines. Everything after the term cut is
    proportional to the selected postings, not the corpus."""
    from spider_go_spark.functions import textkernel as tk
    from spider_go_spark.functions.intmath import log2_q20

    d = T(spark, sf, "documents")
    toks = d.select("doc_id", tk.tokens(F.col("text")).alias("toks"))
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    occ = toks.select("doc_id", F.explode("toks").alias("term"))
    top_terms = (
        occ.groupBy("term")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
        .orderBy(F.desc("df"), "term")
        .limit(PRUNE_TOP_TERMS)
    )
    idf = top_terms.crossJoin(F.broadcast(corpus)).select(
        "term", "df", log2_q20("2 * n_docs + 2", "2 * df + 1").alias("idf_q20")
    )
    postings = (
        occ.join(F.broadcast(top_terms.select("term")), "term")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = (
        postings.join(dl, "doc_id")
        .join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "s_q20",
            F.expr(
                f"(idf_q20 * ((1000 * tf * (1000 + {BM25_K1})) div"
                f" (1000 * tf + {BM25_K1} * (1000 - {BM25_B}"
                f"   + ({BM25_B} * ((dl * n_docs * 1000) div total_dl)) div 1000))))"
                f" div 1000"
            ),
        )
    )
    tops = scored.groupBy("term").agg(F.max("s_q20").alias("top_s_q20"))
    return (
        scored.join(F.broadcast(tops), "term")
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum(
                F.when(
                    F.expr(f"s_q20 * 1000 >= top_s_q20 * {PRUNE_EPS_PM}"), F.lit(1)
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("kept"),
            F.max("top_s_q20").alias("top_s_q20"),
        )
        .withColumn("pruned_pm", F.expr("((df - kept) * 1000) div df"))
        .orderBy(F.desc("df"), "term")
    )


def _index_prune_sql() -> str:
    from spider_go_spark.functions.intmath import log2_q20_duckdb_ctes

    lg = log2_q20_duckdb_ctes(
        "2 * n_docs + 2", "2 * df + 1", "(SELECT term, df, n_docs FROM topt, corpus)", "term"
    )
    return rf"""
WITH RECURSIVE toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM toks
), corpus AS (
  SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_dl FROM dl
), occ AS (
  SELECT doc_id, unnest(tokens) AS term FROM toks
), topt AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df
  FROM occ GROUP BY term ORDER BY df DESC, term LIMIT {PRUNE_TOP_TERMS}
), postings AS (
  SELECT o.term, o.doc_id, count(*)::BIGINT AS tf
  FROM occ o JOIN topt USING (term) GROUP BY o.term, o.doc_id
), {lg}, scored AS (
  SELECT p.term,
         (l.log2_q20 * ((1000 * p.tf * (1000 + {BM25_K1})) //
           (1000 * p.tf + {BM25_K1} * (1000 - {BM25_B}
             + ({BM25_B} * ((d.dl * c.n_docs * 1000) // c.total_dl)) // 1000)))) // 1000
           AS s_q20
  FROM postings p JOIN dl d USING (doc_id) JOIN lg l USING (term), corpus c
), tops AS (
  SELECT term, max(s_q20) AS top_s_q20 FROM scored GROUP BY term
)
SELECT s.term, count(*)::BIGINT AS df,
       sum(CASE WHEN s.s_q20 * 1000 >= t.top_s_q20 * {PRUNE_EPS_PM}
                THEN 1 ELSE 0 END)::BIGINT AS kept,
       max(t.top_s_q20) AS top_s_q20,
       (((count(*) - sum(CASE WHEN s.s_q20 * 1000 >= t.top_s_q20 * {PRUNE_EPS_PM}
                              THEN 1 ELSE 0 END)) * 1000) // count(*))::BIGINT AS pruned_pm
FROM scored s JOIN tops t USING (term) GROUP BY s.term
ORDER BY df DESC, term
"""


INDEX_PRUNE_STATS_SQL = _index_prune_sql()


N_RECIP_HOSTS = 20


def host_link_reciprocity(spark: SparkSession, sf: str) -> DataFrame:
    """Host-graph reciprocity: the share of each host's distinct outlink
    edges that are RECIPROCATED (the target links back) — the link-exchange
    spam signal (organic authority links are overwhelmingly one-way;
    pairwise mutual linking at scale is traded, and rankers discount it).

    Scale shape: edges dedup to distinct (src, dst) host pairs — the
    collapsed host graph, ~10^4× smaller than URL edges — then ONE
    self-equi-join on the reversed key (left semi) and a src-keyed agg.
    No corpus-size shuffle anywhere."""
    li = T(spark, sf, "lineitem")
    h = lambda c: F.concat(F.lit("h"), c.cast("string"), F.lit(".example.test"))
    # directed pairs: k -> (k + step), steps {1, 10, 5} mod 20 — only 10 is
    # its own inverse, so step-10 edges are mutual and the rest one-way
    step = (
        F.when(F.col("l_partkey") % 3 == 0, 1)
        .when(F.col("l_partkey") % 3 == 1, 10)
        .otherwise(5)
    )
    edges = (
        li.select(
            h(F.col("l_suppkey") % N_RECIP_HOSTS).alias("src"),
            h((F.col("l_suppkey") + step) % N_RECIP_HOSTS).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    back = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = edges.join(back, ["src", "dst"], "left_semi")
    stats = edges.groupBy("src").agg(F.count(F.lit(1)).alias("n_out"))
    mstats = mutual.groupBy("src").agg(F.count(F.lit(1)).alias("n_mutual"))
    return (
        stats.join(mstats, "src", "left")
        .fillna(0, ["n_mutual"])
        .select(
            F.col("src").alias("host"),
            "n_out",
            "n_mutual",
            F.expr("1000 * n_mutual div n_out").alias("pm_mutual"),
        )
        .orderBy("host")
    )


HOST_LINK_RECIPROCITY_SQL = f"""
WITH edges AS (
  SELECT DISTINCT
    'h' || (l_suppkey % {N_RECIP_HOSTS})::VARCHAR || '.example.test' AS src,
    'h' || ((l_suppkey + CASE l_partkey % 3 WHEN 0 THEN 1 WHEN 1 THEN 10 ELSE 5 END)
            % {N_RECIP_HOSTS})::VARCHAR || '.example.test' AS dst
  FROM lineitem
  WHERE (l_suppkey % {N_RECIP_HOSTS})
        <> ((l_suppkey + CASE l_partkey % 3 WHEN 0 THEN 1 WHEN 1 THEN 10 ELSE 5 END)
            % {N_RECIP_HOSTS})
), mutual AS (
  SELECT e.src, e.dst FROM edges e
  WHERE EXISTS (SELECT 1 FROM edges b WHERE b.src = e.dst AND b.dst = e.src)
), stats AS (
  SELECT src, count(*)::BIGINT AS n_out FROM edges GROUP BY src
), mstats AS (
  SELECT src, count(*)::BIGINT AS n_mutual FROM mutual GROUP BY src
)
SELECT s.src AS host, s.n_out,
       coalesce(m.n_mutual, 0)::BIGINT AS n_mutual,
       ((1000 * coalesce(m.n_mutual, 0)) // s.n_out)::BIGINT AS pm_mutual
FROM stats s LEFT JOIN mstats m ON s.src = m.src
ORDER BY host
"""


# --------------------------------------------------------------------------
# Proximity ranking: the positional-index query between exact phrase match
# (distance == 1, in order) and bag-of-words AND (any distance).
# --------------------------------------------------------------------------

PROX_TERMS = ("merge", "sort")
PROX_TOP_K = 25


def proximity_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Proximity retrieval: docs containing BOTH query terms, ranked by the
    minimum token distance between any occurrence pair (then by combined
    tf) — how positional indexes rank "near" matches that aren't exact
    phrases. Positions live inside the per-doc token array, so the
    pairwise distance scan is a pure HOF projection (positions_a ×
    positions_b per doc — occurrence counts, not corpus size), with NO
    posting self-join and no shuffle before the final top-k.
    """
    from spider_go_spark.functions import textkernel as tk

    a, b = PROX_TERMS
    d = T(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )

    def positions(term: str) -> str:
        return (f"filter(sequence(1, size(_toks)), i -> element_at(_toks, i)"
                f" = '{term}')")

    # min_dist is NULL when either term is absent; the match filter runs
    # AFTER a trivial unique-key agg — the same aggregation barrier as
    # phrase_match (predicate pushdown would serialize the heavy position
    # scan onto the single-partition parquet scan).
    scored = (
        d.select("doc_id", tk.tokens(F.col("text")).alias("_toks"))
        .withColumn("pa", F.expr(positions(a)))
        .withColumn("pb", F.expr(positions(b)))
        .select(
            "doc_id",
            F.expr(
                "array_min(flatten(transform(pa, i ->"
                " transform(pb, j -> abs(i - j)))))"
            ).cast("long").alias("min_dist"),
            F.when(
                (F.size("pa") > 0) & (F.size("pb") > 0),
                (F.size("pa") + F.size("pb")).cast("long"),
            ).alias("tf_both"),
        )
        .groupBy("doc_id")
        .agg(
            F.max("min_dist").alias("min_dist"),
            F.max("tf_both").alias("tf_both"),
        )
        .filter(F.col("tf_both").isNotNull())
    )
    return scored.orderBy("min_dist", F.desc("tf_both"), "doc_id").limit(PROX_TOP_K)


PROXIMITY_TOPK_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), pos AS (
  SELECT doc_id,
         list_filter(range(1, len(tokens) + 1), i -> tokens[i] = '{PROX_TERMS[0]}') AS pa,
         list_filter(range(1, len(tokens) + 1), i -> tokens[i] = '{PROX_TERMS[1]}') AS pb
  FROM toks
), scored AS (
  SELECT doc_id,
         list_min(flatten(list_transform(pa, i ->
           list_transform(pb, j -> abs(i - j)))))::BIGINT AS min_dist,
         (len(pa) + len(pb))::BIGINT AS tf_both
  FROM pos WHERE len(pa) > 0 AND len(pb) > 0
)
SELECT doc_id, min_dist, tf_both FROM scored
ORDER BY min_dist, tf_both DESC, doc_id LIMIT {PROX_TOP_K}
"""


KWIC_TERM = "stream"
KWIC_CTX = 3  # tokens of context on each side
KWIC_LIMIT = 100


def kwic_snippets(spark: SparkSession, sf: str) -> DataFrame:
    """KWIC (keyword-in-context) snippet extraction: for every document
    containing the query term, the ±{KWIC_CTX}-token window around its
    FIRST occurrence — the serving-side op a search result page runs after
    ranking. Window bounds clamp at document edges.

    Scale shape: first-position lookup (array_position) and the window
    slice are pure HOF projections over the per-doc token array — map-only
    at any corpus size; at serving scale this runs over the ranked top-k
    only, never the corpus. Top-N here is just a bounded gate output."""
    from spider_go_spark.functions import textkernel as tk

    d = T(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = d.select("doc_id", tk.tokens(F.col("text")).alias("_toks"))
    pos = F.array_position("_toks", KWIC_TERM).cast("long")
    out = (
        toks.withColumn("pos", pos)
        .filter(F.col("pos") > 0)
        .withColumn("lo", F.greatest(F.lit(1), F.col("pos") - KWIC_CTX))
        .withColumn(
            "hi", F.least(F.size("_toks").cast("long"), F.col("pos") + KWIC_CTX)
        )
        .select(
            "doc_id",
            "pos",
            F.array_join(
                F.slice(
                    "_toks",
                    F.col("lo").cast("int"),
                    (F.col("hi") - F.col("lo") + 1).cast("int"),
                ),
                " ",
            ).alias("snippet"),
        )
    )
    return out.orderBy("doc_id").limit(KWIC_LIMIT)


KWIC_SNIPPETS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), hits AS (
  SELECT doc_id, tokens, list_position(tokens, '{KWIC_TERM}')::BIGINT AS pos
  FROM toks WHERE coalesce(list_position(tokens, '{KWIC_TERM}'), 0) > 0
)
SELECT doc_id, pos,
       array_to_string(
         tokens[greatest(1, pos - {KWIC_CTX}) : least(len(tokens), pos + {KWIC_CTX})],
         ' ') AS snippet
FROM hits ORDER BY doc_id LIMIT {KWIC_LIMIT}
"""


# --------------------------------------------------------------------------
# Dirichlet query-likelihood retrieval: the language-model ranking family
# beside BM25, exact through the same integer log kernel. Score(d) =
# Σ_t∈q∩d log2(1 + tf·T/(μ·ctf)) − |q|·log2((dl+μ)/μ)  (T = corpus tokens,
# ctf = collection tf, μ = Dirichlet pseudo-count) — the standard
# decomposition of Π p(t|d) under Dirichlet smoothing, every log argument
# a ratio of int64s ≥ 1, so scores are bit-exact cross-engine in Q20.
# --------------------------------------------------------------------------

LM_TERMS = ("group", "filter", "stream")
LM_MU = 2000
LM_TOP_K = 25


def lm_dirichlet_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Query-likelihood top-k under Dirichlet smoothing — same posting-list
    shape as bm25_topk (terms filtered before any agg, corpus stats one
    broadcast row, idf-like collection stats on |query| rows), different
    scoring family: smoothing mixes in collection frequency, so document
    LENGTH is penalized through the exact −|q|·log2((dl+μ)/μ) term rather
    than BM25's tf saturation. Only docs matching ≥ 1 query term are
    scored (the per-doc length penalty is constant across a doc's terms,
    added once)."""
    from spider_go_spark.functions import textkernel as tk
    from spider_go_spark.functions.intmath import log2_q20

    d = T(spark, sf, "documents")
    toks = d.select("doc_id", tk.tokens(F.col("text")).alias("toks"))
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    corpus = dl.agg(F.sum("dl").alias("total_t"))
    occ = toks.select("doc_id", F.explode("toks").alias("term")).filter(
        F.col("term").isin(*LM_TERMS)
    )
    postings = occ.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    ctf = postings.groupBy("term").agg(F.sum("tf").alias("ctf"))
    matched = (
        postings.join(F.broadcast(ctf), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "gain_q20",
            log2_q20(f"{LM_MU} * ctf + tf * total_t", f"{LM_MU} * ctf"),
        )
    )
    return (
        matched.groupBy("doc_id")
        .agg(
            F.sum("gain_q20").alias("gain_q20"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
        .join(dl, "doc_id")
        .withColumn(
            "score_q20",
            F.col("gain_q20")
            - F.lit(len(LM_TERMS)) * log2_q20(f"dl + {LM_MU}", f"{LM_MU}"),
        )
        .select("doc_id", "score_q20", "n_terms")
        .orderBy(F.desc("score_q20"), "doc_id")
        .limit(LM_TOP_K)
    )


def _lm_dirichlet_sql() -> str:
    from spider_go_spark.functions.intmath import log2_q20_duckdb_ctes

    terms = ", ".join(f"'{t}'" for t in LM_TERMS)
    gain = log2_q20_duckdb_ctes(
        f"{LM_MU} * ctf + tf * total_t", f"{LM_MU} * ctf",
        "(SELECT p.term, p.doc_id, p.tf, c.ctf, x.total_t"
        " FROM postings p JOIN ctf c USING (term), corpus x)",
        "term, doc_id",
    )
    # second kernel instance for the per-doc length penalty
    pen = log2_q20_duckdb_ctes(
        f"dl + {LM_MU}", f"{LM_MU}", "dl", "doc_id"
    ).replace("lg0", "pn0").replace("lg1", "pn1").replace("lgi", "pni").replace("lg ", "pn ")
    return rf"""
WITH RECURSIVE toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM toks
), corpus AS (
  SELECT sum(dl)::BIGINT AS total_t FROM dl
), occ AS (
  SELECT doc_id, unnest(tokens) AS term FROM toks
), postings AS (
  SELECT term, doc_id, count(*)::BIGINT AS tf
  FROM occ WHERE term IN ({terms}) GROUP BY term, doc_id
), ctf AS (
  SELECT term, sum(tf)::BIGINT AS ctf FROM postings GROUP BY term
), {gain}, {pen}, gains AS (
  SELECT doc_id, sum(log2_q20)::BIGINT AS gain_q20, count(*)::BIGINT AS n_terms
  FROM lg GROUP BY doc_id
)
SELECT g.doc_id,
       (g.gain_q20 - {len(LM_TERMS)} * pn.log2_q20)::BIGINT AS score_q20,
       g.n_terms
FROM gains g JOIN pn ON g.doc_id = pn.doc_id
ORDER BY score_q20 DESC, g.doc_id LIMIT {LM_TOP_K}
"""


LM_DIRICHLET_SQL = _lm_dirichlet_sql()


N_AUDIT_SHARDS = 64


def frontier_shard_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Frontier shard-balance audit: distinct canonical URLs assigned to
    N_AUDIT_SHARDS shards by a 64-bit URL hash, reporting per shard
    (shard_id, n_urls, n_hosts, pm_of_total) — the report an operator reads
    before resizing the seen-set sharding or diagnosing a hot partition
    (north rule: "salted repartition by host-hash to break hot-domain
    skew" needs exactly this visibility).

    Hash note: the production seen set shards by Spark's engine-private
    xxhash64 (operators/seen.py); this gate shards by the repo's portable
    polynomial hash (functions/textkernel.poly_hash) so the DuckDB oracle
    recomputes the assignment value-exactly — the operator shape (dedup →
    map-side shard projection → 64-row agg) is identical whichever hash
    feeds it.

    Scale shape: one distinct on url_norm (hash-partitioned, uniform), a
    codegen'd shard projection, then an agg onto 64 rows with map-side
    combine; the total for pm_of_total is a broadcast single-row agg, not
    a window over the corpus."""
    from spider_go_spark.functions import textkernel as tk

    urls = _capture_urls(T(spark, sf, "lineitem")).select("url_norm").distinct()
    host = F.regexp_extract("url_norm", r"^[a-z0-9+.-]+://([^/:?#]*)", 1)
    sharded = urls.select(
        F.pmod(tk.poly_hash(F.col("url_norm")), F.lit(N_AUDIT_SHARDS))
        .cast("int")
        .alias("shard_id"),
        host.alias("host"),
    )
    per_shard = sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("host").cast("long").alias("n_hosts"),
    )
    total = per_shard.agg(F.sum("n_urls").alias("total"))
    return (
        per_shard.join(F.broadcast(total))
        .select(
            "shard_id",
            "n_urls",
            "n_hosts",
            F.expr("1000 * n_urls div total").alias("pm_of_total"),
        )
        .orderBy("shard_id")
    )


FRONTIER_SHARD_SKEW_SQL = f"""
WITH urls AS (
  SELECT DISTINCT 'http://h' || (l_suppkey % {N_CDX_HOSTS})::VARCHAR
           || '.example.test/p/' || (l_partkey % {N_CDX_PAGES})::VARCHAR AS url_norm
  FROM lineitem
), sharded AS (
  SELECT list_reduce(
           list_prepend(0::BIGINT,
             list_transform(string_split(url_norm, ''), c -> unicode(c)::BIGINT)),
           (a, b) -> (a*31 + b) % 1000000007) % {N_AUDIT_SHARDS} AS shard_id,
         regexp_extract(url_norm, '^[a-z0-9+.-]+://([^/:?#]*)', 1) AS host
  FROM urls
), per_shard AS (
  SELECT shard_id::INTEGER AS shard_id, count(*) AS n_urls,
         count(DISTINCT host)::BIGINT AS n_hosts
  FROM sharded GROUP BY shard_id
)
SELECT shard_id, n_urls, n_hosts,
       ((1000 * n_urls) // (SELECT sum(n_urls) FROM per_shard))::BIGINT AS pm_of_total
FROM per_shard ORDER BY shard_id
"""


# --------------------------------------------------------------------------
# prf_expanded_topk — pseudo-relevance feedback (Rocchio's two-pass query
# expansion, the classical retrieval-quality lever): retrieve with the
# original query, mine expansion terms from the top feedback docs, retrieve
# again with the widened weighted query. Integer tf·idf end to end (the
# exact log kernel), deterministic tie-breaks at both the feedback-doc and
# expansion-term cuts, so the two-pass composition is value-exact.
# --------------------------------------------------------------------------

PRF_FB_DOCS = 5     # feedback depth
PRF_FB_TERMS = 3    # expansion terms mined from the feedback docs
PRF_W_ORIG = 2      # weight of original query terms in pass 2
PRF_W_EXP = 1       # weight of expansion terms
PRF_TOP_K = 15


def prf_expanded_topk(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, score_u, n_hit_terms) — final ranking after one PRF round
    for the BM25_TERMS query. Pass 1 ranks by Σ tf·idf_q20; the top
    PRF_FB_DOCS docs donate their highest-tf terms (stopword-guarded:
    df ≤ N/2, original terms excluded) as PRF_FB_TERMS expansions; pass 2
    scores Σ w·tf·idf_q20 with w = PRF_W_ORIG/PRF_W_EXP.

    Scale shape: both passes are posting-list plans (term-filtered before
    any agg, broadcast idf, doc-keyed score agg, TakeOrderedAndProject);
    the feedback stage's term mining aggregates only the ≤ FB_DOCS docs'
    tokens against the precomputed dictionary df (inverted_index_stats is
    that dictionary at index scale). The two driver literals (5 doc ids,
    3 terms) are bounded by the constants — the inlined-literal
    convention."""
    from spider_go_spark.functions import textkernel as tk
    from spider_go_spark.functions.intmath import log2_q20

    d = T(spark, sf, "documents")
    toks = d.select("doc_id", tk.tokens(F.col("text")).alias("toks"))
    occ_all = toks.select("doc_id", F.explode("toks").alias("term"))
    dict_df = occ_all.distinct().groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    n_docs = d.count()

    def ranked(terms_w: dict[str, int], k: int) -> DataFrame:
        occ = occ_all.filter(F.col("term").isin(*terms_w))
        postings = occ.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
        w_map = F.create_map(
            *[x for t, w in sorted(terms_w.items()) for x in (F.lit(t), F.lit(w))]
        )
        scored = postings.join(F.broadcast(dict_df), "term").select(
            "doc_id",
            (
                w_map[F.col("term")]
                * F.col("tf")
                * log2_q20(f"{2 * n_docs}", "df")
            ).alias("s"),
        )
        return (
            scored.groupBy("doc_id")
            .agg(
                F.sum("s").alias("score_u"),
                F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
            )
            .orderBy(F.desc("score_u"), "doc_id")
            .limit(k)
        )

    fb_docs = [
        r["doc_id"] for r in ranked({t: 1 for t in BM25_TERMS}, PRF_FB_DOCS).collect()
    ]
    cand = (
        occ_all.filter(F.col("doc_id").isin(fb_docs))
        .filter(~F.col("term").isin(*BM25_TERMS))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("fb_tf"))
        .join(dict_df, "term")
        .filter(F.col("df") * 2 <= n_docs)
        .orderBy(F.desc("fb_tf"), "term")
        .limit(PRF_FB_TERMS)
    )
    expansion = [r["term"] for r in cand.collect()]
    terms_w = {t: PRF_W_ORIG for t in BM25_TERMS}
    terms_w.update({t: PRF_W_EXP for t in expansion})
    return ranked(terms_w, PRF_TOP_K)


def _prf_sql() -> str:
    from spider_go_spark.functions.intmath import log2_q20_duckdb_ctes

    q_terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    lg = log2_q20_duckdb_ctes(
        "2 * n_docs", "df", "(SELECT term, df, n_docs FROM dict, n)", "term, df"
    )
    return rf"""
WITH RECURSIVE toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
  FROM documents
), occ AS (
  SELECT doc_id, unnest(toks) AS term FROM toks
), dict AS (
  SELECT term, count(*)::BIGINT AS df FROM (SELECT DISTINCT doc_id, term FROM occ) GROUP BY term
), n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
{lg}, idf AS (
  SELECT term, df, log2_q20 AS idf_q20 FROM lg
), p1 AS (
  SELECT doc_id, sum(tf * idf_q20)::BIGINT AS score_u
  FROM (SELECT term, doc_id, count(*)::BIGINT AS tf FROM occ
        WHERE term IN ({q_terms}) GROUP BY 1, 2) p
  JOIN idf USING (term) GROUP BY doc_id
), fb AS (
  SELECT doc_id FROM p1 ORDER BY score_u DESC, doc_id LIMIT {PRF_FB_DOCS}
), cand AS (
  SELECT o.term, count(*)::BIGINT AS fb_tf
  FROM occ o JOIN fb USING (doc_id)
  WHERE o.term NOT IN ({q_terms})
  GROUP BY o.term
), exp AS (
  SELECT cand.term FROM cand JOIN dict USING (term) CROSS JOIN n
  WHERE dict.df * 2 <= n.n_docs
  ORDER BY fb_tf DESC, term LIMIT {PRF_FB_TERMS}
), q2 AS (
  SELECT term, {PRF_W_ORIG}::BIGINT AS w FROM (SELECT unnest([{q_terms}]) AS term)
  UNION ALL
  SELECT term, {PRF_W_EXP}::BIGINT FROM exp
), p2 AS (
  SELECT p.doc_id, sum(q2.w * p.tf * idf.idf_q20)::BIGINT AS score_u,
         count(*)::BIGINT AS n_hit_terms
  FROM (SELECT term, doc_id, count(*)::BIGINT AS tf FROM occ
        WHERE term IN (SELECT term FROM q2) GROUP BY 1, 2) p
  JOIN q2 USING (term) JOIN idf USING (term)
  GROUP BY p.doc_id
)
SELECT doc_id, score_u, n_hit_terms FROM p2
ORDER BY score_u DESC, doc_id LIMIT {PRF_TOP_K}
"""


QUERIES = {
    "prf_expanded_topk": prf_expanded_topk,
    "cdx_prefix_scan": cdx_prefix_scan,
    "frontier_shard_skew": frontier_shard_skew,
    "url_template_mining": url_template_mining,
    "sitemap_extract": sitemap_extract,
    "robots_sitemap_discovery": robots_sitemap_discovery,
    "anchor_text_topk": anchor_text_topk,
    "host_pagerank_top": host_pagerank_top,
    "host_trustrank_top": host_trustrank_top,
    "host_spam_mass": host_spam_mass,
    "inverted_index_stats": inverted_index_stats,
    "phrase_match": phrase_match,
    "boolean_retrieval": boolean_retrieval,
    "bm25_topk": bm25_topk,
    "index_prune_stats": index_prune_stats,
    "focused_crawl_relevance": focused_crawl_relevance,
    "host_cocitation": host_cocitation,
    "domain_farm_audit": domain_farm_audit,
    "link_locality_audit": link_locality_audit,
    "posting_compression_stats": posting_compression_stats,
    "proximity_topk": proximity_topk,
    "lm_dirichlet_topk": lm_dirichlet_topk,
    "host_link_reciprocity": host_link_reciprocity,
    "kwic_snippets": kwic_snippets,
}
ORACLES = {
    "prf_expanded_topk": _prf_sql(),
    "cdx_prefix_scan": CDX_PREFIX_SCAN_SQL,
    "frontier_shard_skew": FRONTIER_SHARD_SKEW_SQL,
    "url_template_mining": URL_TEMPLATE_MINING_SQL,
    "sitemap_extract": SITEMAP_EXTRACT_SQL,
    "robots_sitemap_discovery": ROBOTS_SITEMAP_DISCOVERY_SQL,
    "anchor_text_topk": ANCHOR_TEXT_TOPK_SQL,
    "host_pagerank_top": HOST_PAGERANK_TOP_SQL,
    "host_trustrank_top": HOST_TRUSTRANK_TOP_SQL,
    "host_spam_mass": HOST_SPAM_MASS_SQL,
    "inverted_index_stats": INVERTED_INDEX_STATS_SQL,
    "phrase_match": PHRASE_MATCH_SQL,
    "boolean_retrieval": BOOLEAN_RETRIEVAL_SQL,
    "bm25_topk": BM25_TOPK_SQL,
    "index_prune_stats": INDEX_PRUNE_STATS_SQL,
    "focused_crawl_relevance": FOCUSED_CRAWL_RELEVANCE_SQL,
    "host_cocitation": HOST_COCITATION_SQL,
    "domain_farm_audit": DOMAIN_FARM_AUDIT_SQL,
    "link_locality_audit": LINK_LOCALITY_AUDIT_SQL,
    "posting_compression_stats": POSTING_COMPRESSION_SQL,
    "proximity_topk": PROXIMITY_TOPK_SQL,
    "lm_dirichlet_topk": LM_DIRICHLET_SQL,
    "host_link_reciprocity": HOST_LINK_RECIPROCITY_SQL,
    "kwic_snippets": KWIC_SNIPPETS_SQL,
}
