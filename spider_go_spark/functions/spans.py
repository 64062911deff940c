"""Interleaved span-stream operators (the input_hint's text+media timeline).

A fetched document is an ordered stream of text / image / video / link
spans (schemas.SPAN; produced by the fetch worker ≙ worker SendOutput
values, /root/reference/pkg/spider/worker.go:45-53). These operators read
that stream structurally — the multimodal pipeline steps that precede any
actual media decoding (which stays behind functions/media.py's codec hook).

Everything here is a pure Catalyst projection over the spans array —
higher-order functions only, no explode, no shuffle, no Python. At 100 TB
that matters: caption mining over 10^10 documents is a map-only pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _texts(spans: Column) -> Column:
    return F.filter(spans, lambda s: s["kind"] == F.lit("text"))


def media_text_pairs(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """(doc_id, media_ref, media_kind, media_offset, caption_before,
    caption_after) — one row per media span, paired with the nearest text
    span before and after it in the interleaved stream.

    This is the caption-mining step of an image-text training pipeline
    (CLIP/LAION-style alt-text pairing): the surrounding prose is the
    candidate caption. NULL on either side when no text span exists there.

    Shape: one projection with HOFs (filter + element_at on offset-ordered
    slices) followed by a single inline explode of the per-doc pair array —
    output rows ≈ media spans, no join, no window, no shuffle."""
    spans = F.col(spans_col)
    texts = _texts(spans)
    media = F.filter(
        spans, lambda s: (s["kind"] == F.lit("image")) | (s["kind"] == F.lit("video"))
    )
    def pair(m: Column) -> Column:
        # try_element_at: NULL (not an error) when no text exists on a side
        before = F.try_element_at(
            F.filter(texts, lambda t: t["offset"] < m["offset"]), F.lit(-1)
        )
        after = F.try_element_at(
            F.filter(texts, lambda t: t["offset"] > m["offset"]), F.lit(1)
        )
        return F.struct(
            m["media_ref"].alias("media_ref"),
            m["kind"].alias("media_kind"),
            m["offset"].alias("media_offset"),
            before["text"].alias("caption_before"),
            after["text"].alias("caption_after"),
        )

    return docs.select(
        "doc_id", F.explode(F.transform(media, pair)).alias("p")
    ).select("doc_id", "p.*")


def span_stream_stats(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Per-document interleaving profile: span counts by kind, text length,
    and the longest run of consecutive media spans (a page that is all
    media with no prose is a gallery/trap signal; all prose means no
    multimodal value). Pure HOF aggregates — map-only."""
    spans = F.col(spans_col)

    def count_kind(k: str) -> Column:
        return F.size(F.filter(spans, lambda s: s["kind"] == F.lit(k))).cast("long")

    is_media = lambda s: (s["kind"] == F.lit("image")) | (s["kind"] == F.lit("video"))
    # longest media run: fold carrying (current_run, best_run)
    runs = F.aggregate(
        spans,
        F.struct(F.lit(0).cast("long").alias("cur"), F.lit(0).cast("long").alias("best")),
        lambda acc, s: F.struct(
            F.when(is_media(s), acc["cur"] + 1).otherwise(F.lit(0).cast("long")).alias("cur"),
            F.greatest(
                acc["best"],
                F.when(is_media(s), acc["cur"] + 1).otherwise(F.lit(0).cast("long")),
            ).alias("best"),
        ),
    )
    text_chars = F.aggregate(
        _texts(spans), F.lit(0).cast("long"), lambda a, t: a + F.length(t["text"])
    )
    return docs.select(
        "doc_id",
        count_kind("text").alias("n_text"),
        count_kind("image").alias("n_image"),
        count_kind("video").alias("n_video"),
        count_kind("link").alias("n_link"),
        text_chars.alias("n_text_chars"),
        runs["best"].alias("max_media_run"),
    )


def link_anchor_texts(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """(doc_id, href, anchor, link_offset) — one row per ``link`` span: the
    link target (carried in ``media_ref``, the span schema's reference slot)
    and its anchor text (the span's own ``text``, i.e. the ``<a>…</a>``
    inner prose the fetch worker recorded at that stream position).

    Anchor text is the classic off-page relevance/priority signal a crawler
    aggregates per *target* URL (what other pages call this page); the
    downstream groupBy is the consumer's choice — this operator is the
    map-only extraction: one HOF filter + inline explode, rows ≈ link
    spans, no join, no window, no Python."""
    spans = F.col(spans_col)
    links = F.filter(spans, lambda s: s["kind"] == F.lit("link"))
    return docs.select(
        "doc_id",
        F.explode(
            F.transform(
                links,
                lambda s: F.struct(
                    s["media_ref"].alias("href"),
                    s["text"].alias("anchor"),
                    s["offset"].alias("link_offset"),
                ),
            )
        ).alias("l"),
    ).select("doc_id", "l.*")


def _by_offset(spans: Column) -> Column:
    """Spans sorted by stream position (offset) — reading order."""
    return F.array_sort(
        spans,
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )


def assemble_text(
    docs: DataFrame,
    spans_col: str = "spans",
    placeholders: dict[str, str] | None = None,
) -> DataFrame:
    """(doc_id, assembled) — the document's reading-order plain text: text
    spans joined by single spaces in offset order, media/link spans replaced
    by a typed placeholder token ("[IMG]"/"[VID]"/"[LNK]") at their stream
    position.

    This is the canonical "render the interleaved stream to trainable text"
    step (the form multimodal corpora serialize to before tokenization, with
    placeholders later swapped for media embeddings). Pure HOF projection —
    sort + transform + array_join, map-only at any corpus size."""
    return docs.select(
        "doc_id", assembled_col(spans_col, placeholders).alias("assembled")
    )


def assembled_col(
    spans_col: str = "spans", placeholders: dict[str, str] | None = None
) -> Column:
    """The reading-order plain-text Column used by :func:`assemble_text`
    (exposed separately so projections can keep other columns, e.g. the
    WET archive export keeps the target URL)."""
    ph = placeholders or {"image": "[IMG]", "video": "[VID]", "link": "[LNK]"}
    spans = _by_offset(F.col(spans_col))

    def render(s: Column) -> Column:
        out = F.when(s["kind"] == F.lit("text"), s["text"])
        for kind, token in ph.items():
            out = out.when(s["kind"] == F.lit(kind), F.lit(token))
        return out.otherwise(F.lit("[UNK]"))

    return F.array_join(F.transform(spans, render), " ")


def pack_spans(
    docs: DataFrame,
    budget: int,
    media_tokens: int = 4,
    spans_col: str = "spans",
) -> DataFrame:
    """(doc_id, sample_id, n_text_spans, n_media_spans, n_tokens) —
    interleaved spans packed into fixed token-budget training samples.
    Each text span costs its whitespace token count; every non-text span
    costs a flat ``media_tokens`` (the image-embedding slot count). A span
    goes to sample ``prefix_cost_before div budget`` in reading order, so
    spans are never split and sample boundaries are deterministic.

    Scale shape: the prefix costs are computed with an in-array fold
    (aggregate building the running total) — NO window, NO per-doc shuffle;
    the only shuffle is the final (doc_id, sample_id) hash agg. The fold's
    array append is O(spans²) per document, fine for page-sized span counts
    and strictly cheaper than shuffling 10^10 docs through a window."""
    spans = _by_offset(F.col(spans_col))
    costs = F.transform(
        spans,
        lambda s: F.when(
            s["kind"] == F.lit("text"),
            F.size(F.filter(F.split(s["text"], r"\s+"), lambda t: F.length(t) > 0)),
        )
        .otherwise(F.lit(media_tokens))
        .cast("long"),
    )
    # prefix-before fold: acc.arr[i] = Σ costs[0..i-1]
    prefix = F.aggregate(
        costs,
        F.struct(
            F.array().cast("array<long>").alias("arr"),
            F.lit(0).cast("long").alias("total"),
        ),
        lambda acc, x: F.struct(
            F.concat(acc["arr"], F.array(acc["total"])).alias("arr"),
            (acc["total"] + x).alias("total"),
        ),
        lambda acc: acc["arr"],
    )
    tagged = F.zip_with(
        F.zip_with(
            spans, costs, lambda s, c: F.struct(s["kind"].alias("kind"), c.alias("cost"))
        ),
        prefix,
        lambda sc, p: F.struct(
            sc["kind"].alias("kind"),
            sc["cost"].alias("cost"),
            F.floor(p / F.lit(budget)).cast("long").alias("sample_id"),
        ),
    )
    rows = docs.select("doc_id", F.explode(tagged).alias("s"))
    return (
        rows.groupBy("doc_id", F.col("s.sample_id").alias("sample_id"))
        .agg(
            F.sum(F.when(F.col("s.kind") == "text", 1).otherwise(0)).alias(
                "n_text_spans"
            ),
            F.sum(F.when(F.col("s.kind") != "text", 1).otherwise(0)).alias(
                "n_media_spans"
            ),
            F.sum("s.cost").alias("n_tokens"),
        )
    )


def span_kind_transitions(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Corpus-level kind-transition counts over the interleaved stream:
    (prev_kind, next_kind, n_transitions) for every adjacent span pair —
    the layout profile that separates prose-with-figures pages from
    galleries, link farms and media walls (and, per-source, drives
    extraction-template choices).

    Shape: zip_with over two slices of the same array builds the adjacent
    pairs in place (no self-join on offset!), one inline explode, one hash
    agg on a tiny key space (kinds²) with map-side partial aggregation —
    the shuffle carries ≤ |kinds|² rows per partition regardless of corpus
    size."""
    spans = F.col(spans_col)
    n = F.size(spans)
    pairs = F.zip_with(
        F.slice(spans, 1, n - 1),
        F.slice(spans, 2, n - 1),
        lambda a, b: F.struct(
            a["kind"].alias("prev_kind"), b["kind"].alias("next_kind")
        ),
    )
    return (
        docs.filter(n >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.prev_kind").alias("prev_kind"), F.col("p.next_kind").alias("next_kind"))
        .agg(F.count("*").alias("n_transitions"))
    )
