"""Vectorized URL kernel: canonicalization, host extraction, hashing.

All heavy lifting happens on pandas Series with vectorized string ops inside
Arrow-batched pandas UDFs — no per-row Python in the hot path (rows that need
the rare slow-path dot-segment resolution are isolated first). The 64-bit URL
hash is Spark's built-in ``xxhash64`` (JVM-side, codegen'd).

Reference analogue: spider-go has no URL handling (it is a generic DAG
engine); canonicalization is the crawl-engine reading of its `ex()` field
mapper that computes derived fields per message
(/root/reference/pkg/spider/workflow.go:347-399).

Canonicalization rules (deterministic, order-stable):
- strip surrounding whitespace and the fragment,
- lowercase scheme and host, strip a trailing dot on the host,
- drop default ports (http:80, https:443),
- empty path -> "/", collapse duplicate slashes, resolve "." / ".." segments,
- sort query parameters bytewise (stable dedup requires one canonical order),
- drop an empty query's "?".
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_URL_RE = re.compile(
    r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)://(?P<auth>[^/?#]*)(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _normalize_path_slow(path: str) -> str:
    """Dot-segment removal (RFC 3986 §5.2.4) — slow path, rare rows only."""
    segs: list[str] = []
    for seg in path.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if segs:
                segs.pop()
            continue
        segs.append(seg)
    out = "/" + "/".join(segs)
    if path.endswith("/") and out != "/":
        out += "/"
    return out


def canonicalize_series(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalization of a Series of raw URL strings.

    Invalid URLs (no scheme://host) canonicalize to ``None``.
    """
    s = urls.fillna("").str.strip()
    parts = s.str.extract(_URL_RE)
    scheme = parts["scheme"].str.lower()
    auth = parts["auth"].fillna("")
    path = parts["path"].fillna("")
    query = parts["query"]

    # authority: [userinfo@]host[:port] — lowercase host, strip trailing dot
    userinfo = auth.str.extract(r"^(.*@)", expand=False).fillna("")
    hostport = auth.str.replace(r"^.*@", "", regex=True)
    host = hostport.str.replace(r":\d*$", "", regex=True).str.lower().str.rstrip(".")
    port = hostport.str.extract(r":(\d+)$", expand=False)
    default_port = scheme.map(_DEFAULT_PORTS)
    port = port.where(port.notna() & (port != default_port))
    port_str = (":" + port).fillna("")

    # path: vectorized fast path; slow path only for rows with dot segments
    # or duplicate slashes (rare in real crawls)
    path = path.where(path != "", "/")
    needs_slow = path.str.contains(r"//|/\.(?:/|$)|/\.\.(?:/|$)", regex=True)
    if needs_slow.any():
        slow = path[needs_slow].map(_normalize_path_slow)
        path = path.copy()
        path[needs_slow] = slow

    # query: sort params bytewise; empty/missing query -> no "?"
    q = query.copy()
    has_q = q.notna() & (q != "")
    if has_q.any():
        sorted_q = q[has_q].str.split("&").map(lambda ps: "&".join(sorted(ps)))
        q[has_q] = "?" + sorted_q
    q = q.where(has_q, "")

    out = scheme + "://" + userinfo + host + port_str + path + q
    out = out.where(scheme.notna() & (host != ""), None)
    return out


def canonicalize_one(url: str) -> str | None:
    """Single-URL canonicalization (used by the pure-Python oracle)."""
    return canonicalize_series(pd.Series([url])).iloc[0]


def host_of_series(url_norms: pd.Series) -> pd.Series:
    """Host component of already-canonical URLs."""
    return url_norms.str.extract(r"^[a-z0-9+.-]+://(?:[^/?#]*@)?([^/:?#]*)", expand=False)


def host_of_one(url_norm: str) -> str | None:
    h = host_of_series(pd.Series([url_norm])).iloc[0]
    return None if pd.isna(h) else h


def path_of_series(url_norms: pd.Series) -> pd.Series:
    """Path+query of canonical URLs (the part robots rules match against)."""
    return url_norms.str.replace(r"^[a-z0-9+.-]+://[^/?#]*", "", regex=True).replace("", "/")


def surt_key(url_norm: Column | str) -> Column:
    """SURT key (Sort-friendly URI Reordering Transform) of a canonical URL
    — the sort key web-archive CDX indexes use: scheme (and userinfo)
    dropped, host components reversed and comma-joined, a non-default port
    kept as ``:port``, then ``)`` + path?query. Every URL under one host —
    and one registered domain — becomes a contiguous key range
    (``test,example,h7)/…``), so host- and domain-scoped index lookups are
    range scans instead of full scans when the index table is sorted or
    bucketed by this key.

    Pure Catalyst projection (regexp + split/reverse/concat): codegen'd,
    no Python — map-only at 10^10 rows. Input must already be canonical
    (:func:`canonicalize_series` output: lowercase host, default ports
    stripped, non-empty path).

    Reference analogue: spider-go keys messages by opaque ids
    (/root/reference/pkg/spider/message.go:14-24); the crawl reading needs
    a key under which one host's URLs cluster — SURT is that key.
    """
    c = F.col(url_norm) if isinstance(url_norm, str) else url_norm
    hostport = F.regexp_extract(c, r"^[a-z0-9+.-]+://(?:[^/?#]*@)?([^/?#]*)", 1)
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    host = F.regexp_replace(hostport, r":\d+$", "")
    pathq = F.regexp_replace(c, r"^[a-z0-9+.-]+://[^/?#]*", "")
    pathq = F.when(pathq == "", F.lit("/")).otherwise(pathq)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(
        rev,
        F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        F.lit(")"),
        pathq,
    )


def surt_key_one(url_norm: str) -> str:
    """Single-URL pure-Python SURT twin (oracle/test replay of
    :func:`surt_key` — same spec, independent implementation)."""
    m = re.match(r"^[a-z0-9+.-]+://(?:[^/?#]*@)?([^/?#]*)", url_norm)
    hostport = m.group(1) if m else ""
    pm = re.search(r":(\d+)$", hostport)
    port = pm.group(1) if pm else ""
    host = re.sub(r":\d+$", "", hostport)
    pathq = re.sub(r"^[a-z0-9+.-]+://[^/?#]*", "", url_norm) or "/"
    rev = ",".join(reversed(host.split(".")))
    return rev + (f":{port}" if port else "") + ")" + pathq


# --- Spark-facing pandas UDFs ----------------------------------------------
@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return canonicalize_series(urls)


@F.pandas_udf(T.StringType())
def host_udf(url_norms: pd.Series) -> pd.Series:
    return host_of_series(url_norms)


def url_hash_col(url_norm_col: str | Column = "url_norm") -> Column:
    """64-bit URL hash: Spark built-in xxhash64 (JVM-side)."""
    c = F.col(url_norm_col) if isinstance(url_norm_col, str) else url_norm_col
    return F.xxhash64(c)


def host_hash_col(host_col: str | Column = "host", buckets: int = 2**31 - 1) -> Column:
    """Non-negative int host hash for salting/partitioning."""
    c = F.col(host_col) if isinstance(host_col, str) else host_col
    return F.pmod(F.xxhash64(c), F.lit(buckets)).cast("int")


# --- Python-side hashing for Bloom shards ----------------------------------
# Build and probe both run in pandas UDFs, so they only need to agree with
# each other (exact membership truth comes from the seen_urls anti-join).
def bloom_hashes(url_norms: pd.Series | np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(urls), k) array of bit indices via double hashing h1 + i*h2 mod m."""
    vals = np.asarray(url_norms, dtype=object)
    h1 = pd.util.hash_array(vals, hash_key="sgs-bloom-hash-1")  # 16-byte keys
    h2 = pd.util.hash_array(vals, hash_key="sgs-bloom-hash-2") | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


# --------------------------------------------------------------------------
# Registrable domain (eTLD+1) against an embedded public-suffix rule subset.
# Politeness and spam analytics group by the REGISTRABLE domain, not the
# host: a link farm spreads over thousands of subdomains of one registered
# name, and per-host budgets alone would hand it the whole crawl round.
# Rule semantics follow the Public Suffix List algorithm (publicsuffix.org,
# public knowledge): among matching rules the longest wins, exception
# rules (leading '!') prevail over wildcards, '*' matches exactly one
# label, and an unmatched host falls back to the implicit '*' rule. The
# registrable domain is the public suffix plus one label; a host that IS a
# public suffix has none (NULL).
#
# The subset below keeps the shapes (plain, nested, wildcard, exception,
# private-domain entries like github.io) without shipping the full list;
# swap in the real PSL file at deploy time.
# --------------------------------------------------------------------------

PSL_RULES = (
    "com", "org", "net", "io", "co", "test", "fake",
    "co.uk", "org.uk", "com.au",
    "github.io", "blogspot.com",  # private-domain entries
    "example.test", "blog.fake",  # synthetic-corpus eTLDs (same shape)
    "*.ck", "!www.ck",
)


def _psl_order(rules: tuple[str, ...]) -> list[tuple[str, bool, int]]:
    """Rules as (pattern, is_exception, suffix_label_count), cascade-ordered:
    exceptions first, then longest (most labels) first — the PSL prevailing-
    rule order expressed as a first-match cascade."""
    parsed = []
    for r in rules:
        exc = r.startswith("!")
        body = r[1:] if exc else r
        labels = body.count(".") + 1
        # the public suffix is the rule itself, minus one label for exceptions
        parsed.append((body, exc, labels - 1 if exc else labels))
    parsed.sort(key=lambda t: (not t[1], -t[0].count(".")))
    return parsed


def _rule_regex(body: str) -> str:
    return body.replace(".", "[.]").replace("*", "[^.]+")


def registrable_domain_sql(host_expr: str, rules: tuple[str, ...] = PSL_RULES) -> str:
    """Registrable-domain CASE expression in the Spark-SQL ∩ DuckDB dialect
    (regexp_extract + nullif only), generated from the same rule table as
    the Python twin — both engines and the oracle share one artifact."""
    branches = []
    for body, _exc, k in _psl_order(rules):
        match = f"regexp_extract({host_expr}, '(^|[.]){_rule_regex(body)}$', 0) <> ''"
        reg = f"nullif(regexp_extract({host_expr}, '([^.]+(?:[.][^.]+){{{k}}})$', 1), '')"
        branches.append(f"WHEN {match} THEN {reg}")
    default = f"nullif(regexp_extract({host_expr}, '([^.]+[.][^.]+)$', 1), '')"
    return "CASE " + " ".join(branches) + f" ELSE {default} END"


def registrable_domain(host: Column | str) -> Column:
    """Catalyst projection of the PSL algorithm (codegen, no Python)."""
    name = host if isinstance(host, str) else None
    if name is None:
        raise TypeError("registrable_domain takes a column NAME (it compiles "
                        "to a SQL expression); pass a string")
    return F.expr(registrable_domain_sql(name))


def registrable_domain_one(host: str, rules: tuple[str, ...] = PSL_RULES) -> str | None:
    """Pure-Python PSL twin (direct algorithm, not the cascade) for tests."""
    labels = host.split(".")
    best: tuple[bool, int, int] | None = None  # (is_exception, n_labels, k)
    for r in rules:
        exc = r.startswith("!")
        body = r[1:] if exc else r
        rl = body.split(".")
        if len(rl) > len(labels):
            continue
        tail = labels[len(labels) - len(rl):]
        if all(a == "*" or a == b for a, b in zip(rl, tail)):
            cand = (exc, len(rl), len(rl) - 1 if exc else len(rl))
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
    k = best[2] if best is not None else 1
    if len(labels) <= k:
        return None
    return ".".join(labels[len(labels) - k - 1:])
