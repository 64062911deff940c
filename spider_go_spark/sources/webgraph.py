"""Deterministic synthetic web graph + fetcher (no network, no external data).

The graph is a pure function of the node id (seeded splitmix64 mixing), so a
"fetch" needs no stored graph table: given a canonical URL, the fetcher
recomputes spans + out-links from the node id embedded in the path. The
pure-Python oracle (spider_go_spark.oracle) calls the SAME vectorized
functions on single-element arrays, guaranteeing bit-parity between engine
and oracle.

Shape requirements from FIXTURES.md §3:
- Zipf-ish host distribution with one hot host holding ≥30% of URLs
  (exercises politeness-window skew salting),
- out_links contain duplicates, already-seen targets, and messy raw URL
  variants (uppercase host, default port, fragments, dot segments) that all
  canonicalize to the same URL (exercises canonicalization + dedup),
- fetched documents are interleaved text+media spans per BASELINE.json
  input_hint; link spans carry the raw out-links (link extraction reads
  them back out of the spans).

Reference analogue: the fetch stage is the worker handler ``h(c, m)`` running
arbitrary user code per message (/root/reference/pkg/spider/worker.go:39-67);
multi-emit ≙ fd-order-worker emitting 10 outputs per input
(/root/reference/cmd/fd-order-worker/main.go:29-52).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_go_spark.schemas import FETCHED_DOCS, SEEDS

SEED = np.uint64(42)
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_HOT_HOST = "hot.example.test"
_MAX_DEG = 8


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 mixing."""
    z = x.astype(np.uint64) + np.uint64((salt * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF) + SEED
    z = (z ^ (z >> np.uint64(30))) * _C1
    z = (z ^ (z >> np.uint64(27))) * _C2
    return z ^ (z >> np.uint64(31))


def host_of_nodes(node_ids: np.ndarray, n_hosts: int) -> np.ndarray:
    """30% of nodes on the hot host; the rest spread over n_hosts-1 hosts."""
    ids = node_ids.astype(np.uint64)
    hot = (_mix(ids, 1) % np.uint64(10)) < np.uint64(3)
    hidx = (_mix(ids, 2) % np.uint64(max(1, n_hosts - 1))).astype(np.int64) + 1
    hosts = np.char.add(np.char.add("h", hidx.astype(str)), ".example.test")
    return np.where(hot, _HOT_HOST, hosts)


def canonical_urls(node_ids: np.ndarray, n_hosts: int) -> np.ndarray:
    hosts = host_of_nodes(node_ids, n_hosts)
    return np.char.add(
        np.char.add(np.char.add("http://", hosts.astype(str)), "/p/"),
        node_ids.astype(np.int64).astype(str),
    )


def _messy_variant(urls: np.ndarray, hosts: np.ndarray, targets: np.ndarray, variant: np.ndarray) -> np.ndarray:
    """Raw (pre-canonicalization) link forms; all variants canonicalize to
    the same canonical URL."""
    t = targets.astype(np.int64).astype(str)
    v0 = urls
    v1 = np.char.add(np.char.add("HTTP://", np.char.upper(hosts.astype(str))), np.char.add("/p/", t))
    v2 = np.char.add(urls.astype(str), "#frag")
    v3 = np.char.add(np.char.add("http://", np.char.add(hosts.astype(str), ":80")), np.char.add("/p/./", t))
    return np.select([variant == 1, variant == 2, variant == 3], [v1, v2, v3], default=v0)


def out_links_of_nodes(node_ids: np.ndarray, n_urls: int, n_hosts: int) -> list[list[str]]:
    """Raw out-link lists per node (duplicates + messy variants included)."""
    ids = node_ids.astype(np.uint64)
    deg = (_mix(ids, 3) % np.uint64(_MAX_DEG + 1)).astype(np.int64)
    out: list[list[str]] = []
    max_d = int(deg.max()) if len(deg) else 0
    # vectorized target matrix (len(ids) × max_d)
    ks = np.arange(max(1, max_d), dtype=np.uint64)
    tmat = (_mix(ids[:, None] * np.uint64(2654435761) + ks[None, :], 4) % np.uint64(n_urls)).astype(np.int64)
    # deterministic duplicate: every node with deg>=2 repeats its first link last
    vmat = (_mix(ids[:, None] + ks[None, :], 5) % np.uint64(4)).astype(np.int64)
    thosts = host_of_nodes(tmat.ravel(), n_hosts).reshape(tmat.shape)
    turls = canonical_urls(tmat.ravel(), n_hosts).reshape(tmat.shape)
    raw = _messy_variant(turls.ravel(), thosts.ravel(), tmat.ravel(), vmat.ravel()).reshape(tmat.shape)
    for i in range(len(ids)):
        d = deg[i]
        links = list(raw[i, :d])
        if d >= 2:
            links.append(links[0])  # duplicate to exercise in-round dedup
        out.append([str(x) for x in links])
    return out


def spans_of_nodes(
    node_ids: np.ndarray,
    n_urls: int,
    n_hosts: int,
    links: list[list[str]] | None = None,
) -> list[list[dict]]:
    """Interleaved text+media+link spans per node; offsets strictly increase;
    link spans carry the raw out-links in order. ``links`` lets a caller that
    already computed ``out_links_of_nodes`` for the same ids pass it in
    instead of paying the link generation twice (it is the dominant cost of
    a synthetic fetch)."""
    ids = node_ids.astype(np.uint64)
    if links is None:
        links = out_links_of_nodes(node_ids, n_urls, n_hosts)
    n_content = (1 + _mix(ids, 6) % np.uint64(4)).astype(np.int64)
    kinds_pick = _mix(ids, 7)
    out: list[list[dict]] = []
    for i in range(len(ids)):
        n = int(node_ids[i])
        spans: list[dict] = []
        offset = 0
        k = int(kinds_pick[i])
        for j in range(int(n_content[i])):
            kind = ("text", "image", "video")[(k >> (2 * j)) % 3]
            if kind == "text":
                spans.append(
                    {"kind": "text", "text": f"tok{n}_{j} body{(n + j) % 97}", "media_ref": None, "offset": offset}
                )
            else:
                spans.append(
                    {"kind": kind, "text": None, "media_ref": f"media://{kind}/{n}/{j}", "offset": offset}
                )
            offset += 1
            # interleave link spans between content spans
            if j < len(links[i]):
                spans.append({"kind": "link", "text": links[i][j], "media_ref": None, "offset": offset})
                offset += 1
        for j in range(int(n_content[i]), len(links[i])):
            spans.append({"kind": "link", "text": links[i][j], "media_ref": None, "offset": offset})
            offset += 1
        out.append(spans)
    return out


def status_of_nodes(
    node_ids: np.ndarray,
    attempts: np.ndarray | None = None,
    transient_every: int = 0,
) -> np.ndarray:
    """~5% deterministic permanent 404s (no spans, no links extracted
    downstream). With ``transient_every`` = N > 0, an additional disjoint
    1/N of nodes fail with a transient 503 on their FIRST fetch attempt and
    succeed on any retry (``attempts`` ≥ 1) — the deterministic stand-in for
    real-world transient fetch failures, exercised by the engine's
    retry-with-backoff path. Default (0) keeps the historical status
    function bit-for-bit."""
    u = node_ids.astype(np.uint64)
    perm404 = (_mix(u, 8) % np.uint64(20)) == np.uint64(0)
    status = np.where(perm404, "404", "200")
    if transient_every:
        trans = (~perm404) & (
            (_mix(u, 12) % np.uint64(transient_every)) == np.uint64(0)
        )
        att = (
            attempts.astype(np.int64)
            if attempts is not None
            else np.zeros(len(node_ids), dtype=np.int64)
        )
        status = np.where(trans & (att == 0), "503", status)
    return status


def content_hash_of_nodes(
    node_ids: np.ndarray, rounds: np.ndarray, change_period: int = 0
) -> np.ndarray:
    """Deterministic int64 content hash per fetch — a pure function of
    (node, content epoch), so engine and oracle agree bit-for-bit.

    ``change_period`` = 0 (default): content is static; the hash depends on
    the node only (historical behavior, nothing to detect). With p > 0, half
    the nodes (mix(id,13) even) publish new content every p rounds — the
    deterministic stand-in for pages that change between recrawls, exercised
    by the adaptive-revisit (change-detection) scheduler path.

    Masked to 50 bits: the hash rides through an Arrow/pandas fetch stage as
    a NULLABLE int64 column, which pandas represents as float64 — values
    must stay < 2^53 to survive that round-trip bit-exactly (full-width
    64-bit hashes silently lose their low bits and equality comparisons
    break)."""
    ids = node_ids.astype(np.uint64)
    if change_period:
        changing = (_mix(ids, 13) % np.uint64(2)) == np.uint64(0)
        epoch = np.where(
            changing, rounds.astype(np.int64) // change_period, 0
        ).astype(np.uint64)
    else:
        epoch = np.zeros(len(ids), dtype=np.uint64)
    h = _mix(ids * np.uint64(0x9E3779B97F4A7C15) + epoch, 14)
    return (h & np.uint64((1 << 50) - 1)).astype(np.int64)


def node_id_of_url(url_norm: pd.Series) -> pd.Series:
    return url_norm.str.extract(r"/p/(\d+)$", expand=False).astype("int64")


# --- seeds -------------------------------------------------------------------
def make_seeds(spark: SparkSession, n_seeds: int, n_urls: int, n_hosts: int) -> DataFrame:
    """Seed list with messy variants and deliberate priority ties
    (FIXTURES.md §2)."""
    ids = (_mix(np.arange(n_seeds, dtype=np.uint64), 9) % np.uint64(n_urls)).astype(np.int64)
    hosts = host_of_nodes(ids, n_hosts)
    urls = canonical_urls(ids, n_hosts)
    variant = (_mix(ids.astype(np.uint64), 10) % np.uint64(4)).astype(np.int64)
    raw = _messy_variant(urls, hosts, ids, variant)
    prio = ((_mix(ids.astype(np.uint64), 11) % np.uint64(5)).astype(np.float64)) / 2.0  # ties guaranteed
    pdf = pd.DataFrame({"url": [str(u) for u in raw], "priority": prio})
    return spark.createDataFrame(pdf, SEEDS)


# --- the fetch operator -------------------------------------------------------
def synthetic_fetch(
    assignments: DataFrame,
    n_urls: int,
    n_hosts: int,
    passthrough: tuple[str, ...] = (),
    transient_every: int = 0,
    change_period: int = 0,
    dead_hosts: tuple[str, ...] = (),
) -> DataFrame:
    """mapInPandas fetch+parse: assignment rows → FETCHED_DOCS rows.

    ``dead_hosts``: every fetch on these hosts returns 503 on every attempt
    — the deterministic stand-in for a host that is down, exercised by the
    per-host circuit-breaker path (CrawlConfig.breaker_threshold).

    Vectorized Arrow batches; doc_id is deterministic (url_hash + round),
    never wall-clock (the reference's uuidv7 ids — workflow.go:113-119 —
    are unreproducible; SURVEY.md §1.3 documents this deliberate change).

    ``passthrough`` names assignment columns (e.g. priority, depth) copied
    onto the output rows unchanged. Carrying the parent's scheduling fields
    through the fetch is what lets link extraction derive child priority /
    depth with NO join back to the assignment set — at a 10^7-fetch round
    that join was a shuffle of every extracted link against every
    assignment row."""
    out_schema = FETCHED_DOCS
    if passthrough:
        from pyspark.sql import types as T

        asg = {f.name: f for f in assignments.schema.fields}
        out_schema = T.StructType(
            list(FETCHED_DOCS.fields) + [asg[c] for c in passthrough]
        )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            nodes = node_id_of_url(pdf["url_norm"]).to_numpy()
            att = pdf["attempt"].to_numpy() if "attempt" in pdf.columns else None
            status = status_of_nodes(nodes, attempts=att, transient_every=transient_every)
            if dead_hosts:
                status = np.where(
                    pdf["host"].isin(dead_hosts).to_numpy(), "503", status
                )
            ok = status == "200"
            spans: list[list[dict]] = [[] for _ in range(len(pdf))]
            links: list[list[str]] = [[] for _ in range(len(pdf))]
            if ok.any():
                ok_nodes = nodes[ok]
                ok_links = out_links_of_nodes(ok_nodes, n_urls, n_hosts)
                ok_spans = spans_of_nodes(ok_nodes, n_urls, n_hosts, links=ok_links)
                for j, i in enumerate(np.nonzero(ok)[0]):
                    spans[i] = ok_spans[j]
                    links[i] = ok_links[j]
            out = {
                "doc_id": "d" + pdf["round"].astype(str) + "-" + pdf["url_hash"].map(lambda h: format(h & 0xFFFFFFFFFFFFFFFF, "016x")),
                "url": pdf["url"],
                "url_norm": pdf["url_norm"],
                "url_hash": pdf["url_hash"],
                "host": pdf["host"],
                "round": pdf["round"],
                "fetch_rank": pdf["fetch_rank"],
                "status": status,
                "spans": spans,
                "out_links": links,
                "content_hash": content_hash_of_nodes(
                    nodes, pdf["round"].to_numpy(), change_period
                ),
            }
            for c in passthrough:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    cols = ["url", "url_norm", "url_hash", "host", "round", "fetch_rank", *passthrough]
    return assignments.select(*cols).mapInPandas(fetch, out_schema)
