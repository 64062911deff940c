"""Tests for the temporal-join and training-pipeline operators added in
round 2 — invariants independent of the DuckDB gate oracles (those run in
tools/parity_check.py / the driver): brute-force as-of equivalence, range
pair exactness, split determinism under repartitioning, packing budget
invariants, and PageRank mass conservation / partitioning-invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spider_go_spark.operators.asof import asof_join_backward, range_join_buckets
from spider_go_spark.operators.graph import SCALE, pagerank_int
from spider_go_spark.operators import sampling

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# as-of join
# --------------------------------------------------------------------------


def test_asof_matches_bruteforce(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_event_id")
    )
    got = {
        r["event_id"]: r["click_event_id"]
        for r in asof_join_backward(
            errors, clicks, ["user_id"], "ts", "click_ts", ["click_event_id"], prefix=""
        ).collect()
    }

    # brute force in python
    c_by_user: dict[int, list] = {}
    for r in clicks.collect():
        c_by_user.setdefault(r["user_id"], []).append((r["click_ts"], r["click_event_id"]))
    for v in c_by_user.values():
        v.sort()
    n_matched = 0
    for e in errors.collect():
        cands = [c for c in c_by_user.get(e["user_id"], []) if c[0] <= e["ts"]]
        want = cands[-1][1] if cands else None
        assert got[e["event_id"]] == want, e
        n_matched += want is not None
    assert len(got) == errors.count()  # every left row kept
    assert n_matched > 0


def test_asof_tie_matches_right_row(spark):
    left = spark.createDataFrame([Row(k=1, ts=10, lid=100)])
    right = spark.createDataFrame([Row(k=1, rts=10, rid=7), Row(k=1, rts=9, rid=6)])
    out = asof_join_backward(left, right, ["k"], "ts", "rts", ["rid"], prefix="m_").collect()
    assert out[0]["m_rid"] == 7  # inclusive: rts == ts matches


# --------------------------------------------------------------------------
# range join
# --------------------------------------------------------------------------


def test_range_join_exact_pairs(spark):
    # pairs straddling bucket boundaries must appear exactly once
    left = spark.createDataFrame(
        [Row(lid=i, k=1, lus=i * 7) for i in range(0, 40)]
    )
    right = spark.createDataFrame(
        [Row(rid=j, k=1, rus=j * 11 + 3) for j in range(0, 30)]
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in range_join_buckets(left, right, ["k"], "lus", "rus", max_gap_us=10).collect()
    )
    want = sorted(
        (i, j)
        for i in range(40)
        for j in range(30)
        if 0 <= (j * 11 + 3) - i * 7 <= 10
    )
    assert got == want  # exact set, no duplicates from the bucket explode


# --------------------------------------------------------------------------
# sampling: split / mix / packing
# --------------------------------------------------------------------------


def test_hash_split_deterministic_and_partition_invariant(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    s1 = {r["doc_id"]: r["split"] for r in sampling.hash_split(d, "doc_id").collect()}
    s2 = {
        r["doc_id"]: r["split"]
        for r in sampling.hash_split(d.repartition(13), "doc_id").collect()
    }
    assert s1 == s2  # a doc's split is a pure function of its id
    frac_train = sum(v == "train" for v in s1.values()) / len(s1)
    assert 0.7 < frac_train < 0.9  # ~80% within hash noise


def test_weighted_mix_subset_semantics(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    keep_low = {r["doc_id"] for r in sampling.weighted_mix(d, "doc_id", F.lit(250)).collect()}
    keep_high = {r["doc_id"] for r in sampling.weighted_mix(d, "doc_id", F.lit(500)).collect()}
    assert keep_low <= keep_high  # raising a weight only adds documents
    n = d.count()
    assert abs(len(keep_high) / n - 0.5) < 0.1


def test_pack_bins_budget_invariant(spark):
    rows = [Row(g="a", i=i, sz=(i * 37) % 95 + 5) for i in range(200)]
    df = spark.createDataFrame(rows)
    packed = sampling.pack_bins(df, "g", "i", "sz", budget=100).collect()
    by_bin: dict[int, list] = {}
    for r in sorted(packed, key=lambda r: r["i"]):
        by_bin.setdefault(r["bin_id"], []).append(r["sz"])
    bins = sorted(by_bin)
    assert bins == list(range(len(bins)))  # dense bin ids from 0
    cum = 0
    for b in bins:
        total = sum(by_bin[b])
        # a bin never exceeds budget + one straddling row
        assert total < 100 + max(by_bin[b])
        cum += total
        # the stream through the end of bin b fills all budgets 0..b
        if b != bins[-1]:
            assert cum >= 100 * (b + 1)


# --------------------------------------------------------------------------
# pagerank
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def star_edges(spark):
    # hub 0 <- spokes 1..10, plus chain 1->2->3
    rows = [Row(src=i, dst=0) for i in range(1, 11)]
    rows += [Row(src=0, dst=1), Row(src=1, dst=2), Row(src=2, dst=3)]
    return spark.createDataFrame(rows)


def test_pagerank_hub_dominates_and_mass_bounded(star_edges):
    ranks = {r["node"]: r["rank_u"] for r in pagerank_int(star_edges, iters=5).collect()}
    assert max(ranks, key=ranks.get) == 0  # the hub wins
    n = len(ranks)
    # total mass stays <= initial mass (truncating division only loses)
    assert sum(ranks.values()) <= n * SCALE
    assert all(v >= 150_000 for v in ranks.values())  # teleport floor


def test_label_propagation_components(spark):
    from spider_go_spark.operators.graph import label_propagation_min

    # components: {1,2,3} (triangle), {10,11,12,13} (chain), {99} singleton
    pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13)]
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs] + [Row(src=b, dst=a) for a, b in pairs]
    )
    nodes = spark.createDataFrame([Row(node=n) for n in [1, 2, 3, 10, 11, 12, 13, 99]])
    got = {r["node"]: r["label"] for r in label_propagation_min(nodes, edges, 5).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10, 99: 99}

    # partitioning invariance (pure integer min)
    got2 = {
        r["node"]: r["label"]
        for r in label_propagation_min(nodes.repartition(5), edges.repartition(3), 5).collect()
    }
    assert got2 == got


def test_label_propagation_fixed_point_long_chain(spark):
    from spider_go_spark.operators.graph import (
        label_propagation_fixed_point,
        label_propagation_min,
    )

    # a 12-hop chain with the min id at one END and ids DECREASING toward
    # the other (0-12-11-…-1): after k=5 rounds the far end's 5-hop window
    # never sees 0, so node 1 still carries its own id — a second
    # "canonical" — while the fixed-point variant converges the whole
    # chain to min-label 0
    seq = [0] + list(range(12, 0, -1))
    pairs = list(zip(seq, seq[1:]))
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs] + [Row(src=b, dst=a) for a, b in pairs]
    )
    nodes = spark.createDataFrame([Row(node=n) for n in range(13)])
    fixed_k = label_propagation_min(nodes, edges, 5)
    assert fixed_k.filter(F.col("node") == F.col("label")).count() > 1
    got = {r["node"]: r["label"] for r in label_propagation_fixed_point(nodes, edges).collect()}
    assert got == {n: 0 for n in range(13)}


def test_pagerank_partitioning_invariant(spark, star_edges):
    r1 = sorted(map(tuple, pagerank_int(star_edges, iters=4).collect()))
    r2 = sorted(map(tuple, pagerank_int(star_edges.repartition(7), iters=4).collect()))
    assert r1 == r2  # integer arithmetic: bit-identical on any partitioning


# --------------------------------------------------------------------------
# OPIC (online page importance)
# --------------------------------------------------------------------------


def _opic_py(pairs: list[tuple[int, int]], iters: int) -> dict[int, tuple[int, int]]:
    """Pure-Python twin of operators/graph.opic_int's integer contract."""
    nodes = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    out: dict[int, list[int]] = {}
    for u, v in pairs:
        out.setdefault(u, []).append(v)
    cash = {n: SCALE for n in nodes}
    hist = {n: 0 for n in nodes}
    for _ in range(iters):
        pot = sum(cash.values()) - sum(
            len(out[u]) * (cash[u] // len(out[u])) for u in out
        )
        recv = {n: 0 for n in nodes}
        for u, vs in out.items():
            share = cash[u] // len(vs)
            for v in vs:
                recv[v] += share
        per_node = pot // len(nodes)
        for n in nodes:
            hist[n] += cash[n]
            cash[n] = recv[n] + per_node
    return {n: (cash[n], hist[n]) for n in nodes}


def test_opic_matches_python_twin(spark):
    from spider_go_spark.operators.graph import opic_int

    # hub + chain + TWO dangling sinks (20, 21): the virtual-page pot path
    # carries real dangling mass, not just division remainders
    pairs = [(i, 0) for i in range(1, 8)] + [(0, 1), (1, 2), (2, 3), (3, 20), (2, 21)]
    edges = spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])
    got = {r["node"]: (r["cash_u"], r["hist_u"]) for r in opic_int(edges, iters=4).collect()}
    assert got == _opic_py(pairs, 4)

    # partitioning invariance (pure integer arithmetic)
    got2 = {
        r["node"]: (r["cash_u"], r["hist_u"])
        for r in opic_int(edges.repartition(5), iters=4).collect()
    }
    assert got2 == got


def test_bowtie_handcrafted(spark):
    """Classification exactness on a graph with every component type:
    core cycle {2,3}, in side {1, 5→1}, out {4}, disconnected pair {8,9}.
    Hub = node 2 (max total degree 3, tie broken to the smaller id)."""
    from spider_go_spark.operators.graph import bowtie_components

    pairs = [(1, 2), (2, 3), (3, 2), (3, 4), (5, 1), (8, 9)]
    edges = spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])
    got = {r["component"]: r["n_nodes"] for r in bowtie_components(edges, 4).collect()}
    assert got == {"core": 2, "in": 2, "out": 1, "other": 2}

    # partitioning invariance (joins + integer counts only)
    got2 = {
        r["component"]: r["n_nodes"]
        for r in bowtie_components(edges.repartition(5), 4).collect()
    }
    assert got2 == got


def test_hyperball_equals_hll_of_exact_reachability(spark):
    """HLL union IS register-wise max, so HyperBall's ball sketch of a
    node must be bit-identical to sketching the node's EXACT reachable
    set directly — per hop, the N(h) totals must match exactly (no
    tolerance: same registers, same estimator)."""
    from spider_go_spark.operators.graph import hyperball_int
    from spider_go_spark.operators.sketches import hll_estimate

    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (6, 1), (8, 9)]
    edges = spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])
    got = {r["hop"]: r["n_pairs_est"] for r in hyperball_int(edges, 3).collect()}

    adj: dict[int, set[int]] = {}
    nodes = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
    for h in range(4):
        reach = []
        for n in nodes:
            ball = {n}
            for _ in range(h):
                ball = ball | {w for u in ball for w in adj.get(u, ())}
            reach += [Row(node=n, member=m) for m in sorted(ball)]
        per_node = hll_estimate(
            spark.createDataFrame(reach), "member", ["node"]
        )
        want = sum(r["hll_est"] for r in per_node.collect())
        assert got[h] == want, f"hop {h}"

    # monotone in h, and bit-identical on any partitioning
    assert got[0] <= got[1] <= got[2] <= got[3]
    got2 = {
        r["hop"]: r["n_pairs_est"]
        for r in hyperball_int(edges.repartition(5), 3).collect()
    }
    assert got2 == got


def test_opic_mass_conserved_up_to_truncation(spark, star_edges):
    from spider_go_spark.operators.graph import opic_int

    rows = opic_int(star_edges, iters=5).collect()
    n = len(rows)
    total_cash = sum(r["cash_u"] for r in rows)
    # cash mass only shrinks by truncation: ≤ N lost per round to the
    # pot division remainder (shares' remainders re-enter via the pot)
    assert n * SCALE - 5 * n <= total_cash <= n * SCALE
    # the hub banks the most importance
    imp = {r["node"]: r["cash_u"] + r["hist_u"] for r in rows}
    assert max(imp, key=imp.get) == 0


# --------------------------------------------------------------------------
# canonical-doc retention + inverted index (gate queries; invariants here,
# value-exact parity in tools/parity_check.py / the driver)
# --------------------------------------------------------------------------


def test_canonical_docs_invariants(spark):
    from spider_go_spark.queries.pipelineops import canonical_docs, dedup_groups

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    labels = {r["doc_id"]: r["group_id"] for r in dedup_groups(spark, SF).collect()}
    chars = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    got = canonical_docs(spark, SF).collect()

    # exactly one row per group, covering every group
    assert sorted(r["group_id"] for r in got) == sorted(set(labels.values()))
    # sizes sum to the corpus size
    assert sum(r["group_size"] for r in got) == docs.count()
    for r in got:
        members = [d for d, g in labels.items() if g == r["group_id"]]
        assert r["group_size"] == len(members)
        # kept doc is in its group and is the (n_chars DESC, doc_id ASC) argmax
        best = max(members, key=lambda d: (chars[d], -d))
        assert r["kept_doc_id"] == best
        assert r["n_chars"] == chars[best]


def test_inverted_index_topterms(spark):
    from spider_go_spark.queries.pipelineops import (
        _INDEX_TOP_TERMS,
        _POSTINGS_HEAD,
        inverted_index_topterms,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    # brute-force document frequency over whitespace tokens
    dfreq: dict[str, set] = {}
    for r in docs:
        for t in set(r["text"].split()):
            if t:
                dfreq.setdefault(t, set()).add(r["doc_id"])

    got = inverted_index_topterms(spark, SF).collect()
    assert len(got) == min(_INDEX_TOP_TERMS, len(dfreq))
    expected_top = sorted(dfreq.items(), key=lambda kv: (-len(kv[1]), kv[0]))
    expected = {t: ids for t, ids in expected_top[: len(got)]}
    for r in got:
        ids = expected[r["term"]]
        assert r["doc_freq"] == len(ids)
        head = [int(x) for x in r["postings_head"].split(",")]
        assert head == sorted(ids)[:_POSTINGS_HEAD]


# --------------------------------------------------------------------------
# chunking / BPE merge pairs / filter funnel / frontier rerank (round 2)
# --------------------------------------------------------------------------


def test_chunk_documents_covers_every_token_exactly(spark):
    """Chunk geometry: per doc, chunk count = ceil(n_tokens/stride), every
    chunk but the last is exactly W tokens or reaches the doc end, and
    chunk starts tile the doc with the configured stride."""
    from spider_go_spark.queries.pipelineops import CHUNK_STRIDE, CHUNK_W, chunk_documents
    from spider_go_spark.functions import textkernel as tk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_tokens = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(tk.tokens(F.col("text"))).alias("n")
        ).collect()
    }
    per_doc: dict[int, list] = {}
    for r in chunk_documents(spark, SF).collect():
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert set(per_doc) == {d for d, n in n_tokens.items() if n > 0}
    for doc_id, rows in per_doc.items():
        n = n_tokens[doc_id]
        rows.sort(key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in rows] == list(range((n + CHUNK_STRIDE - 1) // CHUNK_STRIDE))
        for r in rows:
            start = r["chunk_idx"] * CHUNK_STRIDE
            assert r["n_tokens"] == min(CHUNK_W, n - start)


def test_bpe_merge_pairs_matches_python_counter(spark):
    """Top-20 merge candidates equal a pure-Python BPE pair count."""
    from collections import Counter

    from spider_go_spark.queries.pipelineops import BPE_TOP, bpe_merge_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    vocab: Counter = Counter()
    for r in docs:
        vocab.update(t for t in r["text"].split() if t)
    pairs: Counter = Counter()
    for tok, freq in vocab.items():
        for a, b in zip(tok, tok[1:]):
            pairs[f"{a}|{b}"] += freq
    expect = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP]
    got = [(r["pair"], r["weight"]) for r in bpe_merge_pairs(spark, SF).collect()]
    assert got == expect


def test_filter_funnel_partitions_the_corpus(spark):
    """Funnel stages partition the corpus: stage doc counts sum to the
    corpus size and char counts to the corpus char total."""
    from spider_go_spark.queries.pipelineops import filter_funnel

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = filter_funnel(spark, SF).collect()
    assert sum(r["n_docs"] for r in got) == docs.count()
    assert sum(r["n_chars"] for r in got) == docs.agg(F.sum("n_chars")).first()[0]
    stages = {r["stage"] for r in got}
    assert "5_kept" in stages and len(stages) >= 3


def test_frontier_rerank_orders_by_host_authority(spark):
    """Every returned row's host authority is ≥ any later row's; within a
    host-authority tie, priority is non-increasing."""
    from spider_go_spark.queries.crawlq import frontier_pagerank_rerank

    rows = frontier_pagerank_rerank(spark, SF).collect()
    assert len(rows) == 100
    key = [(r["authority"], r["priority"]) for r in rows]
    for (a1, p1), (a2, p2) in zip(key, key[1:]):
        assert a1 > a2 or (a1 == a2 and p1 >= p2)


def test_hits_bipartite_scores(spark):
    """On a directed star (h0→a1..a4, h1→a1): a1 is the top authority,
    h0 the top hub; max-norm puts the best of each at exactly SCALE;
    pure hubs score 0 authority and vice versa."""
    from spider_go_spark.operators.graph import hits_int

    edges = spark.createDataFrame(
        [(0, 11), (0, 12), (0, 13), (0, 14), (1, 11)], "src long, dst long"
    )
    s = {r["node"]: (r["hub_u"], r["auth_u"]) for r in hits_int(edges, 3).collect()}
    assert s[0][0] == SCALE  # h0 is the max-normed hub
    assert s[11][1] == SCALE  # a1 is the max-normed authority
    assert s[0][1] == 0 and s[1][1] == 0  # hubs have no in-links
    assert all(s[a][0] == 0 for a in (11, 12, 13, 14))  # authorities: no out
    assert s[1][0] < s[0][0]  # fewer out-links -> smaller hub score
    assert all(s[a][1] <= s[11][1] for a in (12, 13, 14))


def test_chunk_documents_skips_empty_docs(spark, tmp_path):
    """An empty / whitespace-only document has zero tokens and must emit
    ZERO chunk rows — not the spurious chunk_idx = -1 row that Spark's
    descending sequence(0, -1) = [0, -1] would otherwise admit (the
    DuckDB oracle's range(0, 0) emits nothing)."""
    from spider_go_spark.queries.pipelineops import chunk_documents

    spark.createDataFrame(
        [("d-empty", ""), ("d-blank", "   \n\t  "), ("d-one", "solo token")],
        "doc_id string, text string",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = chunk_documents(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert "d-empty" not in by_doc and "d-blank" not in by_doc
    assert [r["chunk_idx"] for r in by_doc["d-one"]] == [0]
    assert all(r["chunk_idx"] >= 0 for r in rows)


def test_bfs_levels_vs_python_replay(spark):
    """BFS hop distances vs a direct Python BFS on a graph with a cycle,
    a diamond, an unreachable component, and a node beyond the hop cap."""
    from collections import deque

    from pyspark.sql import Row

    from spider_go_spark.operators.graph import bfs_levels

    edges = [(1, 2), (2, 3), (3, 1), (1, 4), (2, 4), (4, 5), (5, 6), (6, 7),
             (10, 11)]  # 10-11 unreachable from seed 1; 7 is 4 hops out
    seeds = [1]
    max_hops = 3

    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    expected, q = {1: 0}, deque([(1, 0)])
    while q:
        n, d = q.popleft()
        if d == max_hops:
            continue
        for m in adj.get(n, []):
            if m not in expected:
                expected[m] = d + 1
                q.append((m, d + 1))

    e_df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    s_df = spark.createDataFrame([Row(node=n) for n in seeds])
    got = {r["node"]: r["dist"] for r in bfs_levels(e_df, s_df, max_hops).collect()}
    assert got == expected
    assert 7 not in got and 10 not in got  # depth cap + unreachability

    # partition invariance: dist assignment must not depend on layout
    got2 = {
        r["node"]: r["dist"]
        for r in bfs_levels(e_df.repartition(7), s_df.repartition(3), max_hops).collect()
    }
    assert got2 == expected


def test_oov_rate_bounds_and_vocab_coverage(spark):
    from spider_go_spark.queries.pipelineops import oov_rate

    rows = oov_rate(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert r.oov_pm == 1000 * r.n_oov // r.n_tokens
    # vocab holds the 24 most frequent of a ~36-word vocabulary: corpus-wide
    # OOV mass must be a strict minority of tokens
    assert sum(r.n_oov for r in rows) * 2 < sum(r.n_tokens for r in rows)


def test_pagerank_weighted_reduces_to_unweighted(spark, star_edges):
    from spider_go_spark.operators.graph import pagerank_weighted_int

    w1 = star_edges.withColumn("w", F.lit(1).cast("long"))
    got = {r["node"]: r["rank_u"] for r in pagerank_weighted_int(w1, iters=4).collect()}
    want = {r["node"]: r["rank_u"] for r in pagerank_int(star_edges, iters=4).collect()}
    assert got == want


def test_pagerank_weighted_matches_python_replay(spark):
    from spider_go_spark.operators.graph import (
        DAMPING_PPM,
        TELEPORT_U,
        pagerank_weighted_int,
    )

    edges = [(0, 1, 3), (0, 2, 1), (1, 2, 2), (2, 0, 5), (3, 0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    iters = 4
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    rank = {n: SCALE for n in nodes}
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for a, b, w in edges:
            s[b] += rank[a] * w // outw[a]
        rank = {
            n: TELEPORT_U + (s[n] // SCALE) * DAMPING_PPM + (s[n] % SCALE) * DAMPING_PPM // SCALE
            for n in nodes
        }
    got = {r["node"]: r["rank_u"] for r in pagerank_weighted_int(df, iters=iters).collect()}
    assert got == rank


def test_crawl_budget_allocation_largest_remainder(spark):
    from spider_go_spark.queries.crawlq import (
        BUDGET_TOTAL,
        crawl_budget_allocation,
    )

    rows = crawl_budget_allocation(spark, SF).collect()
    assert sum(r.alloc for r in rows) == BUDGET_TOTAL
    # exact largest-remainder replay in python ints
    demand = {r.host: r.demand for r in rows}
    total = sum(demand.values())
    base = {h: BUDGET_TOTAL * d // total for h, d in demand.items()}
    rem = {h: BUDGET_TOTAL * d % total for h, d in demand.items()}
    leftover = BUDGET_TOTAL - sum(base.values())
    order = sorted(demand, key=lambda h: (-rem[h], h))
    want = {h: base[h] + (1 if i < leftover else 0) for i, h in enumerate(order)}
    assert {r.host: r.alloc for r in rows} == want
    # proportionality: every allocation within 1 of its ideal share
    for h, d in demand.items():
        assert abs(want[h] - BUDGET_TOTAL * d / total) < 1


def test_pmi_collocations_replay(spark):
    from spider_go_spark.queries.pipelineops import (
        PMI_MIN_COUNT,
        PMI_SCALE,
        PMI_TOP,
        pmi_collocations,
    )
    import duckdb

    rows = pmi_collocations(spark, SF).collect()
    assert 0 < len(rows) <= PMI_TOP
    # exact python replay over the raw corpus
    texts = [
        r[0]
        for r in duckdb.sql(f"SELECT text FROM '{SF}/documents.parquet'").fetchall()
    ]
    uni, pairs, total = {}, {}, 0
    for t in texts:
        toks = [x for x in t.split() if x]
        total += len(toks)
        for x in toks:
            uni[x] = uni.get(x, 0) + 1
        for a, b in zip(toks, toks[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    scored = [
        (f"{a} {b}", n, n * total * PMI_SCALE // (uni[a] * uni[b]))
        for (a, b), n in pairs.items()
        if n >= PMI_MIN_COUNT
    ]
    scored.sort(key=lambda x: (-x[2], -x[1], x[0]))
    want = scored[:PMI_TOP]
    got = [(r.bigram, r.n_ab, r.pmi_ratio_u) for r in rows]
    assert got == want


def test_containment_pairs_matches_python(spark):
    """Brute-force shingle-containment replay: recompute every doc's
    3-token shingle-hash set in Python (same polynomial kernel) and check
    the directed pair list and integer per-mille values exactly."""
    from spider_go_spark.queries.textops import CONT_MIN_PM, containment_pairs

    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in containment_pairs(spark, sf).collect())

    import duckdb

    P, MUL = 1_000_000_007, 1_000_003
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    hs = {}
    for doc_id, text in docs:
        toks = [t for t in text.split() if t]
        th = []
        for t in toks:
            h = 0
            for ch in t:
                h = (h * 31 + ord(ch)) % P
            th.append(h)
        hs[doc_id] = {
            ((th[i] * MUL + th[i + 1]) % P * MUL + th[i + 2]) % P
            for i in range(max(len(th) - 2, 0))
        }
    want = []
    for a, ha in hs.items():
        if not ha:
            continue
        for b, hb in hs.items():
            if a == b:
                continue
            inter = len(ha & hb)
            pm = 1000 * inter // len(ha)
            if pm >= CONT_MIN_PM:
                want.append((a, b, len(ha), inter, pm))
    assert got == sorted(want)
    assert got  # the corpus has near-dups, so containment pairs must exist
    # full containment (a's shingles all inside b) must occur — and it is
    # directional: b need not be contained in a
    assert any(pm == 1000 for _, _, _, _, pm in got)


def test_retention_cohorts_matches_python(spark):
    """Replay the weekly cohort matrix with Python dicts over raw
    (user, epoch_us) rows — integer week buckets, per-mille retention."""
    from spider_go_spark.queries.temporal import WEEK_US, retention_cohorts

    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in retention_cohorts(spark, sf).collect())

    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT user_id, epoch_us(ts) FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    weeks = {}
    for uid, us in rows:
        weeks.setdefault(uid, set()).add(us // WEEK_US)
    cells = {}
    for uid, ws in weeks.items():
        c = min(ws)
        for w in ws:
            cells.setdefault((c, w - c), set()).add(uid)
    want = []
    for (c, off), users in cells.items():
        size = len(cells[(c, 0)])
        want.append((c, off, len(users), size, 1000 * len(users) // size))
    assert got == sorted(want)
    # offset-0 cells retain everyone by construction
    assert all(pm == 1000 for _, off, _, _, pm in got if off == 0)


def test_bpe_train_matches_python_replay(spark):
    """Full BPE training loop (r4 verdict task #6): the engine's merge
    table at sf0.001 must equal an independent pure-Python learn_bpe
    (Sennrich-style: greedy left-to-right non-overlapping merges, max
    pair by (weight DESC, 'left right' ASC))."""
    import re
    from collections import Counter

    from spider_go_spark.queries.pipelineops import (
        BPE_SYMBOL_TOP,
        BPE_TRAIN_STEPS,
        bpe_train_merges,
        bpe_vocab_symbols,
    )

    got = [
        (r["step"], r["left"], r["right"], r["weight"])
        for r in bpe_train_merges(spark, SF).orderBy("step").collect()
    ]
    got_syms = [
        (r["symbol"], r["freq"]) for r in bpe_vocab_symbols(spark, SF).collect()
    ]

    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    ]
    vocab = Counter(t for x in texts for t in re.split(r"\s+", x) if t)
    segs = {t: list(t) for t in vocab}
    want = []
    for step in range(1, BPE_TRAIN_STEPS + 1):
        pc = Counter()
        for t, f in vocab.items():
            s = segs[t]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (a, b), w = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        want.append((step, a, b, w))
        for t, s in segs.items():
            out = []
            for sym in s:
                if out and out[-1] == a and sym == b:
                    out[-1] = a + b
                else:
                    out.append(sym)
            segs[t] = out
    assert got == want
    # apply side: top subword symbols of the final segmentation
    sym_freq = Counter()
    for t, f in vocab.items():
        for sym in segs[t]:
            sym_freq[sym] += f
    want_syms = sorted(sym_freq.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_SYMBOL_TOP]
    assert got_syms == want_syms


def test_weighted_pagerank_overflow_guard_fires(spark):
    """r5 int64-bound audit: rank_u·w products that would wrap int64 must
    raise (assert_true in the contrib expression), never wrap silently."""
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    from spider_go_spark.operators.graph import pagerank_weighted_int

    edges = spark.createDataFrame(
        [(1, 2, 1 << 62), (2, 1, 1 << 62)], "src long, dst long, w long"
    )
    with pytest.raises(Exception, match="rank_u\\*w exceeds int64"):
        pagerank_weighted_int(edges, iters=1).collect()


def _py_cdc_chunks(text):
    from spider_go_spark.functions.arrowkernels import (
        CDC_MASK, CDC_P, CDC_W, _CDC_POWS,
    )

    if not text:
        return []
    codes = [ord(c) for c in text]
    n = len(codes)
    if n < CDC_W:
        return [text]
    chunks, start = [], 0
    for i in range(CDC_W, n + 1):  # 1-based window end
        h = sum(codes[i - 1 - j] * int(_CDC_POWS[j]) for j in range(CDC_W))
        if (h % CDC_P) % CDC_MASK == 0 and i < n:
            chunks.append(text[start:i])
            start = i
    chunks.append(text[start:])
    return chunks


def test_cdc_chunker_matches_python_and_resyncs(spark):
    """r5: the Arrow CDC kernel must equal a scalar python replay on
    corpus docs, and exhibit the defining CDC property — an insertion
    changes only chunks near the edit, with the chunk stream resyncing
    after it (fixed-width chunking would shift every later chunk)."""
    from spider_go_spark.functions.arrowkernels import cdc_chunks_arrow

    df = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    rows = df.select(
        "text", cdc_chunks_arrow(F.col("text")).alias("chunks")
    ).collect()
    for r in rows:
        assert r["chunks"] == _py_cdc_chunks(r["text"]), r["text"][:80]
        assert "".join(r["chunks"]) == (r["text"] or "")

    import random

    rng = random.Random(42)  # varied windows: repeated prose may never hit
    base = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(2000))
    edited = base[:100] + "INSERTED-TEXT-HERE " + base[100:]
    a, b = _py_cdc_chunks(base), _py_cdc_chunks(edited)
    # suffix chunks resynchronize: everything ≥ window-past-the-edit is shared
    tail_shared = 0
    while (tail_shared < min(len(a), len(b))
           and a[-1 - tail_shared] == b[-1 - tail_shared]):
        tail_shared += 1
    assert len(a) >= 10, len(a)  # the base text must actually chunk
    assert tail_shared >= len(a) - 6, (len(a), len(b), tail_shared)


def test_unigram_viterbi_matches_python_replay(spark):
    """r5: the unigram-LM tokenizer gate must equal an independent
    pure-python pipeline (gram counts → piece inventory → Q20 costs via
    int_log2_q20 → Viterbi min-(cost, n_pieces) with l-ascending strict-<
    tie-break → corpus-weighted usage top-20)."""
    import re
    from collections import Counter

    from spider_go_spark.functions.intmath import int_log2_q20
    from spider_go_spark.queries.pipelineops import (
        UNI_MIN, UNI_NMAX, UNI_OUT, UNI_TOP, unigram_viterbi_pieces,
    )

    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    ]
    vocab = Counter(t for x in texts for t in re.split(r"\s+", x) if t)
    grams = Counter()
    for tok, f in vocab.items():
        for n in range(1, UNI_NMAX + 1):
            for i in range(len(tok) - n + 1):
                grams[tok[i:i + n]] += f
    ones = {g: c for g, c in grams.items() if len(g) == 1}
    multi = sorted(
        ((g, c) for g, c in grams.items() if len(g) >= 2 and c >= UNI_MIN),
        key=lambda kv: (-kv[1], kv[0]),
    )[:UNI_TOP]
    cnts = {**ones, **dict(multi)}
    total = sum(cnts.values())
    cost = {g: int_log2_q20(total, c) for g, c in cnts.items()}

    usage = Counter()
    for tok, f in vocab.items():
        n = len(tok)
        dp = [None] * (n + 1)
        dp[0] = (0, 0, [])
        for i in range(1, n + 1):
            best = None
            for l in range(1, min(UNI_NMAX, i) + 1):
                prev = dp[i - l]
                c = cost.get(tok[i - l:i])
                if prev is None or c is None:
                    continue
                cand = (prev[0] + c, prev[1] + 1)
                if best is None or cand < (best[0], best[1]):
                    best = (cand[0], cand[1], prev[2] + [tok[i - l:i]])
            dp[i] = best
        for piece in dp[n][2]:
            usage[piece] += f
    want = sorted(usage.items(), key=lambda kv: (-kv[1], kv[0]))[:UNI_OUT]
    got = [
        (r["piece"], r["used"])
        for r in unigram_viterbi_pieces(spark, SF).collect()
    ]
    assert got == want
