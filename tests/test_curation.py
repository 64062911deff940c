"""Pure-Python replays of the corpus-curation operators
(queries/curation.py): the model-based quality filter and DSIR importance
weighting. Cross-engine value parity vs DuckDB is the driver gate's job;
these pin the integer-feature semantics against an independent Python
evaluator so a matched Spark/SQL bug can't hide."""

import re

from spider_go_spark.queries import curation
from spider_go_spark.queries.textops import _STOPWORDS

SF = "/root/testdata/sf0.001"
POLY_P = 1_000_000_007


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text) if t]


def _poly(t: str) -> int:
    h = 0
    for ch in t:
        h = (h * 31 + ord(ch)) % POLY_P
    return h


def test_quality_logit_filter_matches_python(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    sw = set(_STOPWORDS["en"])
    expect = {}
    for did, text in docs.items():
        toks = _tokens(text)
        n = len(toks)
        if n:
            stop_pm = 1000 * sum(t in sw for t in toks) // n
            ttr_pm = 1000 * len(set(toks)) // n
            cpt_cpm = 100 * sum(len(t) for t in toks) // n
        else:
            stop_pm = ttr_pm = cpt_cpm = 0
        logit = (
            curation.W_BIAS
            + curation.W_STOP * stop_pm
            + curation.W_TTR * ttr_pm
            + curation.W_LEN * min(n, curation.LEN_CAP)
            + curation.W_CPT * abs(cpt_cpm - curation.CPT_IDEAL)
        )
        expect[did] = (n, stop_pm, ttr_pm, cpt_cpm, logit, logit >= 0)

    got = {
        r["doc_id"]: (
            r["n_tokens"], r["stop_pm"], r["ttr_pm"], r["cpt_cpm"],
            r["logit_u"], r["keep"],
        )
        for r in curation.quality_logit_filter(spark, SF).collect()
    }
    assert got == expect
    # the threshold actually separates: both classes present in testdata
    kept = sum(v[-1] for v in expect.values())
    assert 0 < kept < len(expect)


def test_dsir_importance_matches_python(spark):
    rows = spark.read.parquet(f"{SF}/documents.parquet").collect()
    occ = []  # (doc_id, lang, bucket)
    for r in rows:
        for t in _tokens(r["text"]):
            occ.append((r["doc_id"], r["lang"], _poly(t) % curation.DSIR_BUCKETS))
    n_s: dict[int, int] = {}
    n_t: dict[int, int] = {}
    for _, lang, b in occ:
        n_s[b] = n_s.get(b, 0) + 1
        if lang == curation.DSIR_TARGET_LANG:
            n_t[b] = n_t.get(b, 0) + 1
    tot_s, tot_t = sum(n_s.values()), sum(n_t.values())
    delta = {
        b: curation.DSIR_SCALE * n_t.get(b, 0) // tot_t
        - curation.DSIR_SCALE * n_s[b] // tot_s
        for b in n_s
    }
    expect = {r["doc_id"]: [0, 0] for r in rows}
    for did, _, b in occ:
        expect[did][0] += 1
        expect[did][1] += delta[b]

    got = {
        r["doc_id"]: [r["n_tokens"], r["dsir_weight_u"]]
        for r in curation.dsir_importance(spark, SF).collect()
    }
    assert got == expect
    # target-language docs must score higher on average than the rest:
    # the weight is literally "looks like the en slice"
    langs = {r["doc_id"]: r["lang"] for r in rows}
    en = [w for d, (n, w) in got.items() if langs[d] == "en" and n]
    rest = [w for d, (n, w) in got.items() if langs[d] != "en" and n]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_gopher_rules_filter_matches_python(spark):
    """Per-rule flags ≡ an exact Python replay of the published rules over
    the raw corpus, and the gate splits the corpus (both classes present —
    the point of flag-level output is attributing rejections)."""
    import re

    import duckdb

    from spider_go_spark.queries.curation import (
        GOPHER_MAX_SYMBOL_PM, GOPHER_MAX_WORDS, GOPHER_MIN_ALPHA_PM,
        GOPHER_MIN_STOP_KINDS, GOPHER_MIN_WORDS, GOPHER_MWL_MAX_PM,
        GOPHER_MWL_MIN_PM, GOPHER_STOPWORDS, gopher_rules_filter,
    )

    sf = "/root/testdata/sf0.001"
    got = {r["doc_id"]: r.asDict() for r in gopher_rules_filter(spark, sf).collect()}

    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    assert len(got) == len(docs)
    kept = 0
    for doc_id, text in docs:
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        n = len(toks)
        nc = sum(len(t) for t in toks)
        na = sum(1 for t in toks if re.search("[a-z]", t))
        stop_kinds = len(set(toks) & set(GOPHER_STOPWORDS))
        sy = text.count("#") + text.count("...")
        mwl = 1000 * nc // n if n else 0
        alpha = 1000 * na // n if n else 0
        sym = 1000 * sy // n if n else 0
        want = {
            "doc_id": doc_id, "n_words": n, "mwl_pm": mwl, "alpha_pm": alpha,
            "stop_kinds": stop_kinds, "symbol_pm": sym,
            "r_words": GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS,
            "r_mwl": GOPHER_MWL_MIN_PM <= mwl <= GOPHER_MWL_MAX_PM,
            "r_alpha": alpha >= GOPHER_MIN_ALPHA_PM,
            "r_stop": stop_kinds >= GOPHER_MIN_STOP_KINDS,
            "r_symbol": sym <= GOPHER_MAX_SYMBOL_PM,
        }
        want["keep"] = all(want[k] for k in
                           ("r_words", "r_mwl", "r_alpha", "r_stop", "r_symbol"))
        assert got[doc_id] == want, doc_id
        kept += want["keep"]
    assert 0 < kept < len(docs)


def test_weighted_doc_sample_matches_python(spark):
    """Bottom-K weighted priority sample per lang stratum vs a brute-force
    Python replay, plus the weight-monotonicity contract: raising a
    sampled document's weight (n_chars) keeps it in the sample."""
    import duckdb

    from spider_go_spark.queries.curation import (
        WSAMPLE_A, WSAMPLE_B, WSAMPLE_K, WSAMPLE_P, weighted_doc_sample,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["lang"], r["doc_id"], r["n_chars"], r["priority"])
        for r in weighted_doc_sample(spark, sf).collect()
    )

    docs = duckdb.connect().execute(
        f"SELECT lang, doc_id, n_chars FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    by_lang = {}
    for lang, doc_id, n_chars in docs:
        prio = ((doc_id * WSAMPLE_A + WSAMPLE_B) % WSAMPLE_P) // max(n_chars, 1)
        by_lang.setdefault(lang, []).append((prio, doc_id, n_chars))
    want = sorted(
        (lang, doc_id, n_chars, prio)
        for lang, rows in by_lang.items()
        for prio, doc_id, n_chars in sorted(rows)[:WSAMPLE_K]
    )
    assert got == want
    assert len(got) == sum(min(WSAMPLE_K, len(v)) for v in by_lang.values())

    # weight monotonicity: double every sampled doc's weight -> halved
    # priority -> still in the bottom-K of its stratum.
    sampled = {(lang, doc_id) for lang, doc_id, _, _ in got}
    boosted = {}
    for lang, doc_id, n_chars in docs:
        w = 2 * n_chars if (lang, doc_id) in sampled else n_chars
        prio = ((doc_id * WSAMPLE_A + WSAMPLE_B) % WSAMPLE_P) // max(w, 1)
        boosted.setdefault(lang, []).append((prio, doc_id))
    for lang, rows in boosted.items():
        resampled = {d for _, d in sorted(rows)[:WSAMPLE_K]}
        assert {d for l, d in sampled if l == lang} <= resampled


def test_bitext_candidates_matches_python(spark):
    """Anchor-join bitext mining ≡ brute-force pure-Python pair scan."""
    from collections import Counter

    from spider_go_spark.queries.curation import (
        ANCHOR_DF_MAX,
        ANCHOR_MIN,
        bitext_candidates,
    )

    rows = [
        (r["doc_id"], r["lang"], r["source"], _tokens(r["text"]))
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    df = Counter()
    for _, _, _, toks in rows:
        for t in set(toks):
            df[t] += 1
    anchors = {t for t, c in df.items() if c <= ANCHOR_DF_MAX}
    expect = set()
    for i, (da, la, sa, ta) in enumerate(rows):
        for db, lb, sb, tb in rows[i + 1:]:
            if sa != sb or la == lb:
                continue
            (da2, la2, na), (db2, lb2, nb) = sorted(
                [(da, la, len(ta)), (db, lb, len(tb))], key=lambda x: x[1]
            )
            shared = (set(ta) & set(tb)) & anchors
            if len(shared) < ANCHOR_MIN:
                continue
            lo, hi = min(na, nb), max(na, nb)
            if lo == 0 or 2 * lo < hi:
                continue
            expect.add((sa, da2, db2, la2, lb2, len(shared), 1000 * lo // hi))
    got = {
        (r["source"], r["doc_id_a"], r["doc_id_b"], r["lang_a"], r["lang_b"],
         r["n_anchors"], r["len_ratio_pm"])
        for r in bitext_candidates(spark, SF).collect()
    }
    assert got == expect
