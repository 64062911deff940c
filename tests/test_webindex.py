"""Web-index kernel tests: SURT keys vs the pure-Python twin, link-anchor
extraction and kind-transition counting vs direct replays over handcrafted
span streams (cases the lineitem-derived gate synthesis never produces:
ports, userinfo, deep hosts, media runs, single-span docs)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spider_go_spark.functions.spans import link_anchor_texts, span_kind_transitions
from spider_go_spark.functions.urls import surt_key, surt_key_one

SURT_CASES = [
    "http://example.test/",
    "http://h7.example.test/p/12/3",
    "https://a.b.c.d.example.test/deep/path?b=2&a=1",
    "http://example.test:8080/port/kept",
    "https://example.test/q?only=1",
    "http://user:pw@example.test/with/userinfo",
    "http://single/",
    "http://example.test/trailing/",
]


def test_surt_key_matches_python_twin(spark):
    df = spark.createDataFrame([Row(url_norm=u) for u in SURT_CASES])
    got = {
        r["url_norm"]: r["surt"]
        for r in df.select("url_norm", surt_key("url_norm").alias("surt")).collect()
    }
    for u in SURT_CASES:
        assert got[u] == surt_key_one(u), u


def test_surt_key_specifics():
    # host reversed + comma-joined, scheme and userinfo dropped
    assert surt_key_one("http://h7.example.test/p/1") == "test,example,h7)/p/1"
    # non-default port kept after the host
    assert surt_key_one("http://example.test:8080/x") == "test,example:8080)/x"
    # userinfo dropped
    assert surt_key_one("http://u@example.test/x") == "test,example)/x"
    # query survives; one host is one contiguous prefix range
    a = surt_key_one("https://example.test/q?a=1")
    assert a.startswith("test,example)") and a.endswith("?a=1")


SPAN_DOCS = [
    # prose with isolated figures
    (1, [("text", "alpha beta", None, 0), ("image", None, "m://1", 1),
         ("text", "gamma", None, 2)]),
    # media wall (gallery): image, image, video
    (2, [("image", None, "m://2a", 0), ("image", None, "m://2b", 1),
         ("video", None, "m://2c", 2)]),
    # link farm: alternating text/link with anchors
    (3, [("text", "intro", None, 0),
         ("link", "click here", "http://t1.example.test/", 1),
         ("link", "here again", "http://t2.example.test/", 2),
         ("text", "outro", None, 3)]),
    # single span: no transitions, no links
    (4, [("text", "solo", None, 0)]),
]


@pytest.fixture(scope="module")
def span_df(spark):
    rows = [
        Row(doc_id=d, spans=[
            Row(kind=k, text=t, media_ref=m, offset=o) for (k, t, m, o) in spans
        ])
        for d, spans in SPAN_DOCS
    ]
    return spark.createDataFrame(rows)


def test_link_anchor_texts_extracts_only_links(span_df):
    got = sorted(
        (r["doc_id"], r["href"], r["anchor"], r["link_offset"])
        for r in link_anchor_texts(span_df).collect()
    )
    assert got == [
        (3, "http://t1.example.test/", "click here", 1),
        (3, "http://t2.example.test/", "here again", 2),
    ]


def test_span_kind_transitions_vs_replay(span_df):
    expected: dict[tuple[str, str], int] = {}
    for _, spans in SPAN_DOCS:
        for a, b in zip(spans, spans[1:]):
            expected[(a[0], b[0])] = expected.get((a[0], b[0]), 0) + 1
    got = {
        (r["prev_kind"], r["next_kind"]): r["n_transitions"]
        for r in span_kind_transitions(span_df).collect()
    }
    assert got == expected


def test_span_kind_transitions_partition_invariant(span_df):
    one = span_kind_transitions(span_df.coalesce(1))
    many = span_kind_transitions(span_df.repartition(7))
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_transitions_plan_has_no_python(span_df):
    plan = span_kind_transitions(span_df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_frontier_shard_skew_totals(spark):
    from spider_go_spark.queries.webindex import N_AUDIT_SHARDS, frontier_shard_skew

    rows = frontier_shard_skew(spark, "/root/testdata/sf0.001").collect()
    assert 1 <= len(rows) <= N_AUDIT_SHARDS
    assert all(0 <= r.shard_id < N_AUDIT_SHARDS for r in rows)
    total = sum(r.n_urls for r in rows)
    for r in rows:
        assert r.n_hosts <= r.n_urls
        assert r.pm_of_total == 1000 * r.n_urls // total


def test_trustrank_flows_only_from_seeds(spark):
    """TrustRank invariants on a handcrafted graph: teleport mass lands
    only on seeds, trust reaches only seed-reachable nodes, and the
    engine matches an exact integer Python replay of the fixed-point
    contract."""
    from spider_go_spark.operators.graph import (
        DAMPING_PPM, SCALE, TELEPORT_U, trustrank_int,
    )

    # seed s -> a -> b ; spam farm x <-> y interlinked but unreachable
    edges = spark.createDataFrame(
        [("s", "a"), ("a", "b"), ("x", "y"), ("y", "x")], "src string, dst string"
    )
    trusted = spark.createDataFrame([("s",)], "node string")
    got = {r.node: r.trust_u for r in trustrank_int(edges, trusted, 3).collect()}

    # exact python replay (same split-multiplication damping)
    def damp(s0):
        return (s0 // SCALE) * DAMPING_PPM + ((s0 % SCALE) * DAMPING_PPM) // SCALE

    nodes = {"s", "a", "b", "x", "y"}
    out = {"s": ["a"], "a": ["b"], "x": ["y"], "y": ["x"]}
    t = {n: SCALE if n == "s" else 0 for n in nodes}
    for _ in range(3):
        s0 = {n: 0 for n in nodes}
        for src, dsts in out.items():
            for d in dsts:
                s0[d] += t[src] // len(dsts)
        t = {n: (TELEPORT_U if n == "s" else 0) + damp(s0[n]) for n in nodes}
    assert got == t
    assert got["x"] == 0 and got["y"] == 0  # spam farm earns nothing
    assert got["s"] >= TELEPORT_U and got["a"] > 0 and got["b"] > 0


def test_spam_mass_fingerprint(spark):
    """Relative spam mass on the same handcrafted graph: the interlinked
    farm {x, y} is unreachable from the seed, so its mass_pm is 1000
    (pure spam rank); the seed-reachable chain carries low mass."""
    from spider_go_spark.operators.graph import pagerank_int, trustrank_int

    edges = spark.createDataFrame(
        [("s", "a"), ("a", "b"), ("x", "y"), ("y", "x")], "src string, dst string"
    )
    trusted = spark.createDataFrame([("s",)], "node string")
    pr = pagerank_int(edges, 3)
    tr = trustrank_int(edges, trusted, 3)
    mass = {
        r["node"]: r["mass_pm"]
        for r in pr.join(tr, "node")
        .select(
            "node",
            F.expr("((rank_u - least(trust_u, rank_u)) * 1000) div rank_u").alias(
                "mass_pm"
            ),
        )
        .collect()
    }
    assert mass["x"] == 1000 and mass["y"] == 1000  # farm: all rank untrusted
    assert all(0 <= v <= 1000 for v in mass.values())
    assert mass["a"] < 1000 and mass["b"] < 1000  # trust reaches the chain


def test_resolve_pointer_chains_doubling(spark):
    from pyspark.sql import Row

    from spider_go_spark.operators.graph import resolve_pointer_chains

    # one 5-hop chain (needs 3 doubling rounds), one 1-hop, one isolated pair
    edges = [(f"c{i}", f"c{i+1}") for i in range(5)] + [("x", "y"), ("p", "q")]
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = {r["src"]: (r["final"], r["hops"])
           for r in resolve_pointer_chains(df, max_hops=8).collect()}
    assert len(got) == len(edges)  # every redirecting node, nothing else
    for i in range(5):
        assert got[f"c{i}"] == ("c5", 5 - i)
    assert got["x"] == ("y", 1) and got["p"] == ("q", 1)


def test_resolve_pointer_chains_cycle_bounded(spark):
    from pyspark.sql import Row

    from spider_go_spark.operators.graph import resolve_pointer_chains

    # a 3-cycle never terminates semantically; bounded rounds still return,
    # with hops capped at 2^rounds (max_hops=4 -> 2 rounds -> 4 hops)
    df = spark.createDataFrame(
        [Row(src="a", dst="b"), Row(src="b", dst="c"), Row(src="c", dst="a")]
    )
    rows = resolve_pointer_chains(df, max_hops=4).collect()
    assert len(rows) == 3 and all(r["hops"] == 4 for r in rows)


def test_prf_expanded_topk_matches_python(spark):
    """Two-pass PRF ≡ a pure-Python replay: same feedback docs, same
    expansion terms, same final integer ranking."""
    import re
    from collections import Counter, defaultdict

    from spider_go_spark.functions.intmath import int_log2_q20
    from spider_go_spark.queries.webindex import (
        BM25_TERMS,
        PRF_FB_DOCS,
        PRF_FB_TERMS,
        PRF_TOP_K,
        PRF_W_EXP,
        PRF_W_ORIG,
        prf_expanded_topk,
    )

    docs = {
        r["doc_id"]: [t for t in re.split(r"\s+", r["text"]) if t]
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet").collect()
    }
    n_docs = len(docs)
    df = Counter()
    for toks in docs.values():
        for t in set(toks):
            df[t] += 1

    def rank(terms_w, k):
        scores = defaultdict(lambda: [0, 0])
        for did, toks in docs.items():
            tf = Counter(toks)
            for t, w in terms_w.items():
                if tf[t]:
                    scores[did][0] += w * tf[t] * int_log2_q20(2 * n_docs, df[t])
                    scores[did][1] += 1
        return sorted(
            ((did, s, nh) for did, (s, nh) in scores.items()),
            key=lambda x: (-x[1], x[0]),
        )[:k]

    fb = [d for d, _, _ in rank({t: 1 for t in BM25_TERMS}, PRF_FB_DOCS)]
    cand = Counter()
    for d in fb:
        for t in docs[d]:
            if t not in BM25_TERMS and df[t] * 2 <= n_docs:
                cand[t] += 1
    exp = [t for t, _ in sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:PRF_FB_TERMS]]
    terms_w = {t: PRF_W_ORIG for t in BM25_TERMS}
    terms_w.update({t: PRF_W_EXP for t in exp})
    expect = rank(terms_w, PRF_TOP_K)
    got = [
        (r["doc_id"], r["score_u"], r["n_hit_terms"])
        for r in prf_expanded_topk(spark, "/root/testdata/sf0.001").collect()
    ]
    assert got == expect
    # the expansion genuinely fired (the tiny sf0.001 vocabulary passes
    # fewer than PRF_FB_TERMS candidates through the df ≤ N/2 guard)
    assert 1 <= len(exp) <= PRF_FB_TERMS
