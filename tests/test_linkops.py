"""Independent pure-Python oracles for the link-analysis operators
(queries/linkops.py) — the DuckDB gate twins run in tools/parity_check.py;
these re-derive triangle counts, SALSA scores, and the effective diameter
from the raw parquet rows with plain Python dict/set code, so a bug shared
by the two SQL engines' plans can't hide."""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

import duckdb

from spider_go_spark.operators.graph import SCALE
from spider_go_spark.queries import linkops as lo

SF = "/root/testdata/sf0.001"


def _directed_edges():
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()
    edges = set()
    for pk, sk, ok, ln in rows:
        if ok % lo.LINK_EDGE_MOD != 0:
            continue
        s, d = pk % lo.LINK_M, (sk * 5 + ln * 17) % lo.LINK_M
        if s != d:
            edges.add((s, d))
    return edges


def test_triangle_census_matches_bruteforce(spark):
    got = [tuple(r) for r in lo.triangle_census(spark, SF).collect()]

    und = {tuple(sorted(e)) for e in _directed_edges()}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    tri = defaultdict(int)
    # brute force: for each node, count edges among its neighbors (each
    # triangle counted once per corner — exactly the per-node count)
    for v, nbrs in adj.items():
        for x, y in combinations(sorted(nbrs), 2):
            if (min(x, y), max(x, y)) in und:
                tri[v] += 1
    want = []
    for v, nbrs in adj.items():
        d = len(nbrs)
        cc = 2 * tri[v] * SCALE // (d * (d - 1)) if d >= 2 else 0
        want.append((v, d, tri[v], cc))
    want.sort(key=lambda r: (-r[2], r[0]))
    assert got == want[: lo.TRIANGLE_TOPK]
    # and the census must actually contain triangles (model sanity)
    assert got[0][2] > 0


def test_salsa_matches_python_walk(spark):
    got = [tuple(r) for r in lo.salsa_authorities(spark, SF).collect()]

    edges = _directed_edges()
    indeg = defaultdict(int)
    outdeg = defaultdict(int)
    in_nbrs = defaultdict(list)   # authority -> hubs pointing at it
    out_nbrs = defaultdict(list)  # hub -> authorities it points at
    for s, d in edges:
        outdeg[s] += 1
        indeg[d] += 1
        in_nbrs[d].append(s)
        out_nbrs[s].append(d)

    auth = {a: SCALE for a in indeg}
    for _ in range(lo.SALSA_ITERS):
        h = defaultdict(int)
        for a, score in auth.items():
            push = score // indeg[a]
            for i in in_nbrs[a]:
                h[i] += push
        raw = defaultdict(int)
        for i, score in h.items():
            push = score // outdeg[i]
            for b in out_nbrs[i]:
                raw[b] += push
        m = max(max(raw.values(), default=0), 1)
        auth = {a: raw.get(a, 0) * SCALE // m for a in indeg}

    want = sorted(auth.items(), key=lambda kv: (-kv[1], kv[0]))[: lo.SALSA_TOPK]
    assert got == [tuple(r) for r in want]
    # degree normalization must leave a non-degenerate ranking
    assert got[0][1] == SCALE and got[-1][1] < SCALE


def test_effective_diameter_bounds(spark):
    from spider_go_spark.queries.pipelineops import BOWTIE_HOPS, neighbourhood_function

    (d, nf_at_d, nf_max), = lo.effective_diameter(spark, SF).collect()
    nf = dict(neighbourhood_function(spark, SF).collect())
    assert 0 <= d <= BOWTIE_HOPS
    assert nf_max == max(nf.values())
    assert nf_at_d == nf[d]
    assert 10 * nf_at_d >= 9 * nf_max
    if d > 0:
        assert 10 * nf[d - 1] < 9 * nf_max


def test_harmonic_centrality_matches_python_hyperball(spark):
    """Replay per-node HyperBall registers (same hash geometry) + the
    harmonic readout in plain Python dicts, over the exact ball sets
    computed by BFS — checks both the register math and that the
    engine's lag-window differencing implements Σ (Δball/h)·SCALE."""
    from spider_go_spark.operators import sketches as sk

    got = [tuple(r) for r in lo.harmonic_centrality_top(spark, SF).collect()]

    edges = _directed_edges()
    nodes = {n for e in edges for n in e}
    out = defaultdict(set)
    for s, d in edges:
        out[s].add(d)

    P, A = sk.HASH_P, sk.CMS_AS[0]
    M, BITS, CAP = sk.HLL_M, sk.HLL_RANK_BITS, sk.HLL_RANK_CAP

    def reg_of(n):
        h = ((n % P) * A) % P
        b, w = h % M, h // M
        rho = CAP
        for i in range(BITS):
            if (w >> i) & 1:
                rho = i + 1
                break
        return b, rho

    def est(ball):
        regs = {}
        for n in ball:
            b, rho = reg_of(n)
            regs[b] = max(regs.get(b, 0), rho)
        s = sum(1 << (CAP - m) for m in regs.values()) + (M - len(regs)) * (1 << CAP)
        return sk.HLL_NUM // (1000 * s)

    # exact balls by BFS — HyperBall's register state after h hops is
    # EXACTLY the sketch of the exact h-ball (union-max is lossless on
    # sketch state), so the replay needs no register iteration.
    harm = {}
    for v in nodes:
        ball = {v}
        prev_est = est(ball)
        h_u = 0
        for hop in range(1, lo.HARMONIC_HOPS + 1):
            ball |= {d for n in ball for d in out.get(n, ())}
            e = est(ball)
            h_u += (e - prev_est) * SCALE // hop
            prev_est = e
        harm[v] = h_u
    want = sorted(harm.items(), key=lambda kv: (-kv[1], kv[0]))[: lo.HARMONIC_TOPK]
    assert got == want
    assert all(h >= 0 for _, h in got)
