"""Pure-Python replay of the trigram Stupid-Backoff LM score
(queries/textops.trigram_sbo_score): independent evaluator over sf0.001 so
a matched Spark/DuckDB bug can't hide, plus the structural properties that
make the score meaningful (training docs score via the trigram level;
backoff levels only fire on held-out docs)."""

import re
from collections import Counter, defaultdict

from spider_go_spark.queries.textops import (
    SBO_A,
    SBO_L1,
    SBO_L2,
    SBO_L3,
    SBO_P,
    trigram_sbo_score,
)

SF = "/root/testdata/sf0.001"


def _th(text):
    out = []
    for t in re.split(r"\s+", text):
        if not t:
            continue
        h = 0
        for ch in t:
            h = (h * 31 + ord(ch)) % SBO_P
        out.append(h)
    return out


def _python_sbo(docs):
    m1, m2, m3 = Counter(), Counter(), Counter()
    n_train = 0
    for did, th in docs.items():
        if did % 2 != 0:
            continue
        n_train += len(th)
        m1.update(th)
        for i in range(len(th) - 1):
            m2[(th[i] * SBO_A + th[i + 1]) % SBO_P] += 1
        for i in range(len(th) - 2):
            h12 = (th[i] * SBO_A + th[i + 1]) % SBO_P
            m3[(h12 * SBO_A + th[i + 2]) % SBO_P] += 1
    n_train = max(n_train, 1)
    expect, levels = {}, defaultdict(Counter)
    for did, th in docs.items():
        if len(th) < 3:
            continue
        total, n = 0, 0
        for i in range(len(th) - 2):
            h12 = (th[i] * SBO_A + th[i + 1]) % SBO_P
            h123 = (h12 * SBO_A + th[i + 2]) % SBO_P
            h23 = (th[i + 1] * SBO_A + th[i + 2]) % SBO_P
            if m3[h123]:
                s = SBO_L1 * m3[h123] // m2[h12]
                levels[did]["l1"] += 1
            elif m2[h23]:
                s = SBO_L2 * m2[h23] // m1[th[i + 1]]
                levels[did]["l2"] += 1
            else:
                s = SBO_L3 * m1[th[i + 2]] // n_train
                levels[did]["l3"] += 1
            total += s
            n += 1
        expect[did] = (n, total // n)
    return expect, levels


def test_trigram_sbo_matches_python(spark):
    docs = {
        r["doc_id"]: _th(r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    expect, levels = _python_sbo(docs)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["sbo_score_ppm"])
        for r in trigram_sbo_score(spark, SF).collect()
    }
    assert got == expect
    # training docs (even ids, ≥3 tokens) never back off: every trigram is
    # observed by construction
    for did, lv in levels.items():
        if did % 2 == 0:
            assert lv["l2"] == lv["l3"] == 0, did
    # the held-out half genuinely exercises the backoff chain
    assert sum(lv["l2"] + lv["l3"] for did, lv in levels.items() if did % 2) > 0
