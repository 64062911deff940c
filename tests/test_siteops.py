"""Independent pure-Python oracles for the site-level analytics operators
(queries/siteops.py + the k-core census in queries/pipelineops.py) — the
DuckDB gate twins run in tools/parity_check.py; these re-derive each result
from the raw parquet rows with plain Python dict/set code, so a bug shared
by the two SQL engines' plans can't hide."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import duckdb

from spider_go_spark.functions.textkernel import COMBINE_A, POLY_P
from spider_go_spark.queries import pipelineops as po
from spider_go_spark.queries import siteops as so

SF = "/root/testdata/sf0.001"


def _lineitem_rows():
    con = duckdb.connect()
    return con.sql(
        f"SELECT l_suppkey, l_partkey, l_orderkey, l_linenumber"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()


# --------------------------------------------------------------------------
# k-core census
# --------------------------------------------------------------------------


def test_kcore_census_matches_python_peeling(spark):
    got = [tuple(r) for r in po.kcore_census(spark, SF).collect()]

    edges = set()
    for sk, pk, ok, ln in _lineitem_rows():
        if ok % po.BOWTIE_EDGE_MOD != 0:
            continue
        s, d = sk % po.BOWTIE_M, (pk * 3 + ln) % po.BOWTIE_M
        if s != d:
            edges.add((s, d))
    bidir = edges | {(d, s) for s, d in edges}

    want = []
    cur = set(bidir)
    for i in range(po.KCORE_ITERS + 1):
        nodes = {s for s, _ in cur}
        want.append((i, len(nodes), len(cur)))
        deg = Counter(s for s, _ in cur)
        keep = {n for n, c in deg.items() if c >= po.KCORE_K}
        cur = {(s, d) for s, d in cur if s in keep and d in keep}
    assert got == want


def test_kcore_census_counts_monotone(spark):
    rows = po.kcore_census(spark, SF).collect()
    assert [r["iter"] for r in rows] == list(range(po.KCORE_ITERS + 1))
    for prev, nxt in zip(rows, rows[1:]):
        assert nxt["n_nodes"] <= prev["n_nodes"]
        assert nxt["n_edges_dir"] <= prev["n_edges_dir"]
    for r in rows:  # the bidirectional edge set is symmetric
        assert r["n_edges_dir"] % 2 == 0


# --------------------------------------------------------------------------
# mirror hosts
# --------------------------------------------------------------------------


def _mirror_pages_py():
    pages = set()
    for sk, pk, _, _ in _lineitem_rows():
        host, path = sk % so.MIRROR_HOSTS, pk % so.MIRROR_PATHS
        if (path * 7 + host * 13) % 11 == 0:
            continue
        if path == 0:
            fp = 424242
        elif path % 5 == 0:
            fp = (path * 1000003 + host * 131 + 7) % so._FP_P
        else:
            fp = (path * 1000003 + (host % so.MIRROR_FAMILIES) * 131 + 7) % so._FP_P
        pages.add((host, path, fp))
    return pages


def test_host_mirror_pairs_matches_python(spark):
    got = [tuple(r) for r in so.host_mirror_pairs(spark, SF).collect()]

    pages = _mirror_pages_py()
    grp = Counter((path, fp) for _, path, fp in pages)
    hosts_by_key = defaultdict(list)
    for host, path, fp in pages:
        if 2 <= grp[(path, fp)] <= so.MIRROR_HUB_CAP:
            hosts_by_key[(path, fp)].append(host)
    overlap = Counter()
    for hs in hosts_by_key.values():
        hs.sort()
        for i, a in enumerate(hs):
            for b in hs[i + 1 :]:
                overlap[(a, b)] += 1
    n = Counter(host for host, _, _ in pages)
    want = sorted(
        (
            (a, b, o, o * 1_000_000 // (n[a] + n[b] - o))
            for (a, b), o in overlap.items()
            if o >= so.MIRROR_MIN_OVERLAP
        ),
        key=lambda t: (-t[3], t[0], t[1]),
    )
    assert got == want
    assert got, "mirror model must produce pairs at this sf"
    # mirrors only arise inside a host family (host-unique fps can't collide)
    for a, b, _, _ in got:
        assert a % so.MIRROR_FAMILIES == b % so.MIRROR_FAMILIES


# --------------------------------------------------------------------------
# soft-404 template dominance
# --------------------------------------------------------------------------


def test_soft404_flags_exactly_the_template_hosts(spark):
    got = {r["host"]: r for r in so.soft404_template_hosts(spark, SF).collect()}

    pages = set()
    for sk, _, ok, _ in _lineitem_rows():
        host, path = sk % so.SOFT404_HOSTS, ok % so.SOFT404_PATHS
        if host % 5 == 0 and path % 4 != 0:
            fp = host * 977 + 13
        else:
            fp = host * 1000003 + path + 1000
        pages.add((host, path, fp))
    by_host = defaultdict(list)
    for host, _, fp in pages:
        by_host[host].append(fp)
    want = {}
    for host, fps in by_host.items():
        cnt = Counter(fps)
        modal_cnt, modal_fp = max((c, fp) for fp, c in cnt.items())
        share = modal_cnt * 1_000_000 // len(fps)
        if len(fps) >= so.SOFT404_MIN_PAGES and share >= so.SOFT404_MIN_SHARE_PPM:
            want[host] = (host, len(fps), modal_fp, modal_cnt, share)
    assert {h: tuple(r) for h, r in got.items()} == want
    assert want, "soft-404 model must flag hosts at this sf"
    for h in got:  # only the every-fifth-host template farms are flagged
        assert h % 5 == 0


# --------------------------------------------------------------------------
# shared token runs
# --------------------------------------------------------------------------


def _poly(tok: str) -> int:
    h = 0
    for ch in tok:
        h = (h * 31 + ord(ch)) % POLY_P
    return h


def test_shared_run_pairs_matches_python(spark):
    got = [tuple(r) for r in so.shared_run_pairs(spark, SF).collect()]

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    ex = []  # (doc_id, pos, window-hash)
    for doc_id, text in docs:
        th = [_poly(t) for t in re.split(r"\s+", text) if t]
        for i in range(len(th) - so.RUN_K + 1):
            h = th[i]
            for j in range(1, so.RUN_K):
                h = (h * COMBINE_A + th[i + j]) % POLY_P
            ex.append((doc_id, i, h))
    occ = Counter(h for _, _, h in ex)
    by_hash = defaultdict(list)
    for doc_id, pos, h in ex:
        if occ[h] <= so.RUN_HUB_CAP:
            by_hash[h].append((doc_id, pos))
    diags = defaultdict(list)  # (a, b, diag) -> [pa]
    for entries in by_hash.values():
        for da, pa in entries:
            for db, pb in entries:
                if da < db:
                    diags[(da, db, pa - pb)].append(pa)
    best = Counter()
    for (da, db, _), pas in diags.items():
        pas.sort()
        run = 1
        best[(da, db)] = max(best[(da, db)], 1)
        for prev, nxt in zip(pas, pas[1:]):
            run = run + 1 if nxt == prev + 1 else 1
            best[(da, db)] = max(best[(da, db)], run)
    want = sorted(
        (
            (a, b, r, r + so.RUN_K - 1)
            for (a, b), r in best.items()
            if r >= so.RUN_MIN_WINS
        ),
        key=lambda t: (-t[2], t[0], t[1]),
    )[: so.RUN_LIMIT]
    assert got == want
    assert got, "corpus must contain shared runs at this sf"
