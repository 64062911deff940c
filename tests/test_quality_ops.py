"""Algorithmic invariants for the corpus-quality / quantized-vector queries
(bigram LM score, duplicated-n-gram fraction, int8 ANN, k-means step,
moving frame aggregate, length deciles). Cross-engine value parity is the
driver gate's job; these pin semantics the SQL oracles can't express —
pure-Python replays, recall vs the float baseline, partition invariance."""

import math
import re

import pytest
from pyspark.sql import functions as F

from spider_go_spark.queries import relational2, textops, vectorops

SF = "/root/testdata/sf0.001"
POLY_P = 1_000_000_007


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _py_token_hashes(text: str) -> list[int]:
    out = []
    for t in re.split(r"\s+", text):
        if not t:
            continue
        h = 0
        for ch in t:
            h = (h * 31 + ord(ch)) % POLY_P
        out.append(h)
    return out


def test_bigram_lm_score_matches_python_oracle(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    c2: dict[tuple[int, int], int] = {}
    c1: dict[int, int] = {}
    doc_bigrams: dict[int, list[tuple[int, int]]] = {}
    for did, text in docs.items():
        th = _py_token_hashes(text)
        bgs = list(zip(th, th[1:]))
        if not bgs:
            continue
        doc_bigrams[did] = bgs
        for w1, w2 in bgs:
            c2[(w1, w2)] = c2.get((w1, w2), 0) + 1
            c1[w1] = c1.get(w1, 0) + 1
    expected = {}
    for did, bgs in doc_bigrams.items():
        ppms = [(1_000_000 * c2[bg]) // c1[bg[0]] for bg in bgs]
        expected[did] = (len(bgs), sum(ppms) // len(bgs))
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score_ppm"])
        for r in textops.bigram_lm_score(spark, SF).collect()
    }
    assert got == expected


def test_dup_ngram_fraction_bounds_and_python_oracle(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    # replay: k=5 combined-window hashes, dup = window hash seen in >= 2 docs
    win_sets: dict[int, list[int]] = {}
    for did, text in docs.items():
        th = _py_token_hashes(text)
        wins = []
        for i in range(len(th) - 4):
            h = th[i]
            for j in range(1, 5):
                h = (h * 1_000_003 + th[i + j]) % POLY_P
            wins.append(h)
        if wins:
            win_sets[did] = wins
    owners: dict[int, set[int]] = {}
    for did, wins in win_sets.items():
        for h in set(wins):
            owners.setdefault(h, set()).add(did)
    expected = {}
    for did, wins in win_sets.items():
        dup = sum(1 for h in wins if len(owners[h]) >= 2)
        expected[did] = (len(wins), dup, (dup * 1_000_000) // len(wins))
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_ppm"])
        for r in textops.dup_ngram_fraction(spark, SF).collect()
    }
    assert got == expected
    assert all(0 <= v[2] <= 1_000_000 for v in got.values())


def test_ann_int8_recall_vs_float_baseline(spark):
    base = {
        (r["query_id"], r["neighbor_id"])
        for r in vectorops.ann_cosine_topk(spark, SF).collect()
    }
    quant = vectorops.ann_int8_topk(spark, SF).collect()
    q_pairs = {(r["query_id"], r["neighbor_id"]) for r in quant}
    queries = {q for q, _ in base}
    assert {q for q, _ in q_pairs} == queries
    # int8 quantization drifts the ranking only slightly: >= 60% top-10
    # overlap with the float32 cosine baseline on every query
    for q in queries:
        b = {n for qq, n in base if qq == q}
        g = {n for qq, n in q_pairs if qq == q}
        assert len(b & g) >= 6, (q, sorted(b), sorted(g))
    # per-query ranks are exactly 1..10 with integer scores
    by_q: dict[int, list[int]] = {}
    for r in quant:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 11)) for v in by_q.values())


def test_kmeans_step_invariants_and_partition_invariance(spark):
    out = vectorops.kmeans_step(spark, SF)
    rows = out.collect()
    n_vec = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r["size"] for r in rows) == n_vec
    assert all(r["inertia"] >= 0 for r in rows)
    assert {r["cluster_id"] for r in rows} <= set(range(vectorops.KM_K))
    # seed centroids assign to themselves with distance 0 -> every seed's
    # cluster is nonempty
    assert len(rows) == vectorops.KM_K
    a = _rows(out)
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = _rows(vectorops.kmeans_step(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert a == b


def test_moving_value_avg_python_replay(spark):
    ev = [
        (r["event_id"], r["user_id"], r["ts"], r["value"])
        for r in spark.read.parquet(f"{SF}/events.parquet").collect()
    ]
    import math

    by_user: dict[int, list[tuple]] = {}
    for eid, uid, ts, val in ev:
        by_user.setdefault(uid, []).append((ts, eid, math.floor(val * 1_000_000.0)))
    expected = {}
    for uid, rows in by_user.items():
        rows.sort()
        for i, (_, eid, _) in enumerate(rows):
            frame = [vq for _, _, vq in rows[max(0, i - 3) : i + 1]]
            s, n = sum(frame), len(frame)
            # Spark `div` truncates toward zero; values are non-negative
            # here, so truncation == floor division
            expected[eid] = (uid, s, n, s // n)
    got = {
        r["event_id"]: (r["user_id"], r["mov_sum_q"], r["mov_n"], r["mov_avg_q"])
        for r in relational2.moving_value_avg(spark, SF).collect()
    }
    assert got == expected


def test_length_deciles_balanced_partition(spark):
    rows = relational2.length_deciles(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # NTILE balance guarantee
    assert sorted(r["decile"] for r in rows) == list(range(1, 11))
    # decile char ranges are non-overlapping and ordered
    ordered = sorted(rows, key=lambda r: r["decile"])
    for prev, cur in zip(ordered, ordered[1:]):
        assert prev["max_chars"] <= cur["min_chars"]


# --------------------------------------------------------------------------
# PQ ANN, SemDeDup, PII scrub (round-2 additions)
# --------------------------------------------------------------------------

SF01 = "/root/testdata/sf0.01"  # 500 embeddings — shortlist < corpus


def test_pq_ann_recall_vs_exact(spark):
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in vectorops.ann_cosine_topk(spark, SF01).collect()
    }
    pq_rows = vectorops.pq_ann_topk(spark, SF01).collect()
    pq = {(r["query_id"], r["neighbor_id"]) for r in pq_rows}
    assert len(exact & pq) / len(exact) >= 0.5  # measured 0.64 @ sf0.01
    # the rerank stage reports EXACT cosines: any overlap pair's cosine must
    # match the brute-force query bit-for-bit
    exact_cos = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in vectorops.ann_cosine_topk(spark, SF01).collect()
    }
    for r in pq_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert r["cosine"] == exact_cos[key]


def _py_cluster_assign(embs: dict[int, list[float]], k: int) -> dict[int, int]:
    q = {
        vid: [math.floor(float(x) * 1_000_000.0) for x in v]
        for vid, v in embs.items()
    }
    cents = {cid: q[cid] for cid in range(k)}
    out = {}
    for vid, v in q.items():
        best = min(
            (sum((a - b) * (a - b) for a, b in zip(v, cv)), cid)
            for cid, cv in cents.items()
        )
        out[vid] = best[1]
    return out


def test_semdedup_subset_and_cluster_scoped(spark):
    sem_rows = vectorops.semdedup_pairs(spark, SF01).collect()
    assert sem_rows
    pairs = {(r["vec_id_a"], r["vec_id_b"]) for r in sem_rows}
    full = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in vectorops.embedding_near_dup_pairs(spark, SF01).collect()
    }
    assert pairs <= full  # SemDeDup = near-dup pairs restricted to clusters
    embs = {
        r["vec_id"]: list(r["embedding"])
        for r in spark.read.parquet(f"{SF01}/embeddings.parquet").collect()
    }
    assign = _py_cluster_assign(embs, vectorops.SEMDEDUP_K)
    for r in sem_rows:
        assert assign[r["vec_id_a"]] == r["cluster_id"]
        assert assign[r["vec_id_b"]] == r["cluster_id"]
    # and completeness: every full near-dup pair in one cluster IS emitted
    expected = {(a, b) for a, b in full if assign[a] == assign[b]}
    assert pairs == expected


def test_pii_scrub_matches_python(spark):
    import hashlib

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    email_re = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    phone_re = re.compile(r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}")
    expected = {}
    for r in docs:
        synth = (
            f"{r['text']} contact user{r['doc_id']}@{r['source']}"
            f".example.test or call +1-555-{r['n_chars'] % 10000:04d}"
        )
        scrubbed = phone_re.sub("<PHONE>", email_re.sub("<EMAIL>", synth))
        expected[r["doc_id"]] = (
            len(email_re.findall(synth)),
            len(phone_re.findall(synth)),
            len(scrubbed),
            hashlib.md5(scrubbed.encode()).hexdigest(),
        )
    got = {
        r["doc_id"]: (r["n_emails"], r["n_phones"], r["clean_len"], r["clean_md5"])
        for r in textops.pii_scrub(spark, SF).collect()
    }
    assert got == expected
    assert all(v[0] >= 1 and v[1] >= 1 for v in got.values())  # regexes fired


def test_label_centroid_outliers_invariants(spark):
    """Outlier ranking is partition-invariant; each label with enough
    members yields exactly OUTLIER_TOP rows ranked by descending distance."""
    from spider_go_spark.queries.vectorops import (
        OUTLIER_TOP,
        label_centroid_outliers,
    )

    sf = "/root/testdata/sf0.001"
    out = label_centroid_outliers(spark, sf).collect()
    by_label: dict[int, list] = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r)
    for label, rows in by_label.items():
        assert len(rows) <= OUTLIER_TOP
        ds = [r["d2"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert ds == sorted(ds, reverse=True) and all(d >= 0 for d in ds)

    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        again = label_centroid_outliers(spark, sf).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_rp_ann_recall_vs_exact(spark):
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in vectorops.ann_cosine_topk(spark, SF01).collect()
    }
    rp_rows = vectorops.rp_ann_topk(spark, SF01).collect()
    rp = {(r["query_id"], r["neighbor_id"]) for r in rp_rows}
    assert len(set(exact) & rp) / len(exact) >= 0.6  # measured 0.70 @ sf0.01
    # rerank reports EXACT cosines: overlap pairs match brute force bit-for-bit
    for r in rp_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert r["cosine"] == exact[key]


def test_kmeans_train_matches_python_lloyd(spark):
    """Full Lloyd loop (r5): the engine's KM_TRAIN_ITERS-iteration
    training must equal an independent pure-python Lloyd's in the same
    int64 fixed point (floor-quantize, squared-L2 argmin with cid
    tie-break, floor-mean update, emptied clusters carry forward), and
    per-iteration total inertia must be non-increasing."""
    import math

    K, SCALE, SHIFT, ITERS = (
        vectorops.KM_K, vectorops.KM_SCALE, vectorops.KM_SHIFT,
        vectorops.KM_TRAIN_ITERS,
    )
    vecs = {
        int(r["vec_id"]): [math.floor(float(x) * SCALE) + SHIFT for x in r["embedding"]]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    cents = {cid: list(vecs[cid]) for cid in range(K)}
    inertias = []
    stats = {}
    for _ in range(ITERS):
        assign = {}
        for vid, v in vecs.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(v, cv)), cid)
                for cid, cv in cents.items()
            )
            assign[vid] = best
        inertias.append(sum(d2 for d2, _ in assign.values()))
        stats = {}
        for vid, (d2, cid) in assign.items():
            s = stats.setdefault(cid, [0, 0])
            s[0] += 1
            s[1] += d2
        new_cents = {}
        for cid in cents:
            members = [vecs[vid] for vid, (_, c) in assign.items() if c == cid]
            if members:
                new_cents[cid] = [
                    sum(col) // len(members) for col in zip(*members)
                ]
            else:
                new_cents[cid] = cents[cid]
        cents = new_cents
    assert all(b <= a for a, b in zip(inertias, inertias[1:])), inertias
    want = sorted(
        (cid, s[0], s[1], ",".join(str(c - SHIFT) for c in cents[cid]))
        for cid, s in stats.items()
    )
    got = sorted(
        (r["cluster_id"], r["size"], r["inertia"], r["centroid_q"])
        for r in vectorops.kmeans_train(spark, SF).collect()
    )
    assert got == want
