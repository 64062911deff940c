"""Frequency-based label propagation (operators/graph.lpa_frequency):
pure-Python synchronous replay on the sf0.001 census graph, a known
two-clique fixture, and partitioning invariance (the determinism the
synchronous + (count DESC, label ASC) contract buys)."""

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from spider_go_spark.operators.graph import lpa_frequency
from spider_go_spark.queries.pipelineops import (
    LPA_ITERS,
    _census_edges_df,
    lpa_communities,
)

SF = "/root/testdata/sf0.001"


def _py_lpa(edges, iters):
    nbrs = defaultdict(list)
    for s, d in edges:
        nbrs[d].append(s)
    labels = {n: n for n in {x for e in edges for x in e}}
    for _ in range(iters):
        new = {}
        for n, lab in labels.items():
            cnt = Counter(labels[m] for m in nbrs.get(n, []))
            if cnt:
                new[n] = min((-c, l) for l, c in cnt.items())[1]
            else:
                new[n] = lab
        labels = new
    return labels


def _und(edges):
    out = set()
    for s, d in edges:
        out.add((s, d))
        out.add((d, s))
    return sorted(out)


def test_lpa_matches_python_on_census_graph(spark):
    e = _census_edges_df(spark, SF)
    edges = _und([(r["src"], r["dst"]) for r in e.collect()])
    labels = _py_lpa(edges, LPA_ITERS)
    sizes = Counter(labels.values())
    expect = sorted(((-s, c) for c, s in sizes.items()))[:20]
    expect = [(c, -ns) for ns, c in expect]
    got = [
        (r["community"], r["size"]) for r in lpa_communities(spark, SF).collect()
    ]
    assert sorted(got, key=lambda t: (-t[1], t[0])) == expect


def test_lpa_two_cliques(spark):
    # two 4-cliques bridged by one edge: each clique converges to its own
    # minimum id; the bridge does not merge them in 3 synchronous rounds
    cl1 = [(a, b) for a in range(4) for b in range(4) if a != b]
    cl2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a != b]
    edges = _und(cl1 + cl2 + [(3, 10)])
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = e.select(F.col("src").alias("node")).distinct()
    got = {r["node"]: r["label"] for r in lpa_frequency(nodes, e, 3).collect()}
    assert got == _py_lpa(edges, 3)
    assert {got[n] for n in range(4)} == {0}
    assert {got[n] for n in range(10, 14)} == {10}


def test_lpa_partitioning_invariance(spark):
    e = _census_edges_df(spark, SF)
    und = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    nodes = und.select(F.col("src").alias("node")).distinct()
    a = {(r["node"], r["label"]) for r in lpa_frequency(nodes.repartition(1), und.repartition(1), 2).collect()}
    b = {(r["node"], r["label"]) for r in lpa_frequency(nodes.repartition(7), und.repartition(13), 2).collect()}
    assert a == b


def test_degree_assortativity_matches_python(spark):
    """Newman's r ≡ a plain-Python Pearson over edge-endpoint degrees."""
    from collections import Counter

    from spider_go_spark.queries.pipelineops import degree_assortativity

    e = _census_edges_df(spark, SF)
    und = set()
    for r in e.collect():
        und.add((r["src"], r["dst"]))
        und.add((r["dst"], r["src"]))
    deg = Counter(s for s, _ in und)
    xs = [(deg[s], deg[d]) for s, d in und]
    n = len(xs)
    sxy = sum(x * y for x, y in xs)
    sx = sum(x for x, _ in xs)
    sx2 = sum(x * x for x, _ in xs)
    expect_r = (n * sxy - sx * sx) / (n * sx2 - sx * sx)
    row = degree_assortativity(spark, SF).collect()[0]
    assert (row["n_dir_edges"], row["sxy"], row["sx"], row["sx2"]) == (n, sxy, sx, sx2)
    assert row["assortativity"] == expect_r


def test_budget_fairness_report_matches_python(spark):
    """Jain index ≡ plain-Python recomputation from the allocation rows;
    the allocation (rounding-smoothed) is never less fair than demand."""
    from spider_go_spark.queries.crawlq import (
        budget_fairness_report,
        crawl_budget_allocation,
    )

    rows = crawl_budget_allocation(spark, SF).collect()
    expect = {}
    for metric in ("demand", "alloc"):
        xs = [r[metric] for r in rows]
        n, sx, sq = len(xs), sum(xs), sum(x * x for x in xs)
        expect[metric] = (n, sx, sq, sx * sx * 1_000_000 // (n * sq))
    got = {
        r["metric"]: (r["n_hosts"], r["sum_x"], r["sum_sq"], r["jain_ppm"])
        for r in budget_fairness_report(spark, SF).collect()
    }
    assert got == expect
    # proportional-fair allocation preserves fairness up to rounding jitter
    assert abs(got["alloc"][3] - got["demand"][3]) <= 100


def test_round_novelty_matches_python(spark):
    """First-seen shingle novelty ≡ pure-Python replay; round 0 is always
    all-new and the counts telescope to the global distinct shingle set."""
    import re
    from collections import defaultdict

    from spider_go_spark.queries.crawlq import NOVELTY_ROUNDS, round_novelty_report

    P, A = 1_000_000_007, 1_000_003
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    by_round = defaultdict(set)
    ndocs = defaultdict(int)
    for r in docs:
        rnd = r["doc_id"] % NOVELTY_ROUNDS
        ndocs[rnd] += 1
        th = []
        for t in re.split(r"\s+", r["text"]):
            if not t:
                continue
            h = 0
            for ch in t:
                h = (h * 31 + ord(ch)) % P
            th.append(h)
        for i in range(len(th) - 2):
            by_round[rnd].add(((th[i] * A + th[i + 1]) % P * A + th[i + 2]) % P)
    expect = {}
    seen = set()
    for rnd in sorted(by_round):
        sh = by_round[rnd]
        new = sh - seen
        seen |= sh
        expect[rnd] = (ndocs[rnd], len(sh), len(new),
                       len(new) * 1_000_000 // len(sh) if sh else 0)
    got = {
        r["round"]: (r["n_docs"], r["n_shingles"], r["n_new_shingles"], r["novelty_ppm"])
        for r in round_novelty_report(spark, SF).collect()
    }
    assert got == expect
    assert got[0][3] == 1_000_000  # round 0 is all-new by definition
    assert sum(v[2] for v in got.values()) == len(seen)  # telescoping
