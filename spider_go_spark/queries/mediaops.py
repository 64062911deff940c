"""Multimodal queries: binary-payload feature extraction with a value-exact
SQL oracle.

The flagship ``media_features`` gate runs REAL codecs end to end: each
document's payload is a real container synthesized deterministically from
(doc_id, length(text)) — an uncompressed 24-bit BMP image, a PCM-16 WAV
clip, or an SGV1 video of BMP frames — and the extractor
(:func:`spider_go_spark.functions.media.extract_media_features_real`)
sniffs the kind from the container magic, decodes the bytes for real, and
digests the CANONICAL decoded content (md5 of its hex rendering — a
re-encode-invariant identity). The lossless containers make every output
cell reproducible in SQL: dimensions and sizes from the synthesis rule,
the digest from the same hex string built with printf/string_agg. The
legacy fake-decoder path survives as ``media_features_plumbing`` —
plumbing verification for kinds with no real codec yet.
"""

from __future__ import annotations

# (caption-mining gate query appended below — see caption_pairs_synth)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_go_spark.functions.media import (
    extract_media_features,
    extract_media_features_real,
)
from spider_go_spark.queries import T

# synthesis rule (d = doc_id, L = length(text)):
#   image (d%3==0): BMP, w = 4 + L%9, h = 3 + d%7, pixel byte j
#                   (row-major top-down RGB) = (d*19 + j*7) % 256
#   audio (d%3==1): WAV, n = 40 + L%50 samples at 8000 + (d%3 of rate
#                   rule: (d//3)%3)*4000 Hz, sample i = ((d*131 + i*97)
#                   % 4001) - 2000
#   video (d%3==2): SGV1 of f = 1 + d%4 BMP frames, each 8×5, frame k
#                   pixel byte j = (d*29 + k*41 + j*7) % 256


def _synth_media_payloads(spark: SparkSession, sf: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from spider_go_spark.functions.media import encode_bmp, encode_video, encode_wav

    docs = T(spark, sf, "documents").select("doc_id", F.length("text").alias("L"))

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for d, L in zip(pdf["doc_id"], pdf["L"]):
                d, L = int(d), int(L)
                if d % 3 == 0:
                    w, h = 4 + L % 9, 3 + d % 7
                    j = np.arange(w * h * 3, dtype=np.int64)
                    payload = encode_bmp(w, h, ((d * 19 + j * 7) % 256).astype(np.uint8))
                elif d % 3 == 1:
                    n = 40 + L % 50
                    i = np.arange(n, dtype=np.int64)
                    payload = encode_wav(
                        8000 + ((d // 3) % 3) * 4000,
                        ((d * 131 + i * 97) % 4001) - 2000,
                    )
                else:
                    f = 1 + d % 4
                    frames = []
                    for k in range(f):
                        j = np.arange(8 * 5 * 3, dtype=np.int64)
                        frames.append(
                            encode_bmp(8, 5, ((d * 29 + k * 41 + j * 7) % 256).astype(np.uint8))
                        )
                    payload = encode_video(frames)
                rows.append({"doc_id": d, "payload": payload})
            yield pd.DataFrame(rows)

    return docs.mapInPandas(synth, "doc_id bigint, payload binary")


def media_features(spark: SparkSession, sf: str) -> DataFrame:
    """Real-codec media features over synthesized real containers: kind
    sniffed from magic, dimensions/frames from real decodes, digest over
    canonical decoded content. Scale shape: two chained Arrow map stages
    (synthesize, decode) — no shuffle."""
    return extract_media_features_real(_synth_media_payloads(spark, sf))


def media_features_plumbing(spark: SparkSession, sf: str) -> DataFrame:
    """The legacy fake-decoder path (arithmetic features on byte length):
    still the plumbing gate for payload kinds with no real codec in this
    environment (compressed video/audio containers beyond the real set)."""
    d = T(spark, sf, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return extract_media_features(d)


# the oracle rebuilds every feature from the synthesis rule: sizes are the
# container formulas (BMP 54 + stride·h with stride = 4-byte-padded rows;
# WAV 44 + 2n; SGV1 8 + (4+174)·f with a 174-byte 8×5 BMP per frame) and
# the digest is md5 over the same lowercase-hex canonical-content string
# the extractor hashes (images/video: row-major RGB; audio: int16-LE PCM).
MEDIA_FEATURES_SQL = """
WITH base AS (
  SELECT doc_id AS d, length(text)::BIGINT AS L FROM documents
), img AS (
  SELECT d, L, 4 + L % 9 AS w, 3 + d % 7 AS h FROM base WHERE d % 3 = 0
), aud AS (
  SELECT d, L, 40 + L % 50 AS n FROM base WHERE d % 3 = 1
), vid AS (
  SELECT d, L, 1 + d % 4 AS f FROM base WHERE d % 3 = 2
)
SELECT d AS doc_id, 'image' AS media_kind,
       (54 + ((w*3 + 3) // 4) * 4 * h)::BIGINT AS n_bytes,
       md5(list_aggregate(list_transform(range(w*h*3),
           j -> printf('%02x', (d*19 + j*7) % 256)), 'string_agg', '')) AS digest,
       w::INTEGER AS width, h::INTEGER AS height, NULL::INTEGER AS frame_count
FROM img
UNION ALL
SELECT d, 'audio', (44 + 2*n)::BIGINT,
       md5(list_aggregate(list_transform(range(n),
           i -> printf('%02x%02x', ((d*131 + i*97) % 4001 - 2000) & 255,
                       (((d*131 + i*97) % 4001 - 2000) >> 8) & 255)),
           'string_agg', '')),
       NULL, NULL, NULL
FROM aud
UNION ALL
SELECT d, 'video', (8 + 178*f)::BIGINT,
       md5(list_aggregate(list_transform(range(f*120),
           m -> printf('%02x', (d*29 + (m // 120)*41 + (m % 120)*7) % 256)),
           'string_agg', '')),
       8, 5, f::INTEGER
FROM vid
"""

# media_kind by doc_id % 3; width/height/frame_count arithmetic on n_bytes
# (text is ASCII → n_bytes = length(text)); digest = md5(text).
MEDIA_FEATURES_PLUMBING_SQL = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_kind,
       length(text)::BIGINT AS n_bytes,
       md5(text) AS digest,
       CASE WHEN doc_id % 3 = 1 THEN NULL ELSE ((length(text)::BIGINT * 7) % 1024)::INTEGER END AS width,
       CASE WHEN doc_id % 3 = 1 THEN NULL ELSE ((length(text)::BIGINT * 13) % 768)::INTEGER END AS height,
       CASE WHEN doc_id % 3 = 2 THEN ((length(text)::BIGINT % 120) + 1)::INTEGER ELSE NULL END AS frame_count
FROM documents
"""


GROUP_TOKENS = 5  # tokens per synthetic text span
MEDIA_EVERY = 3  # an image span follows every 3rd text group


def caption_pairs_synth(spark: SparkSession, sf: str) -> DataFrame:
    """Caption mining through the REAL interleaved-span operator
    (functions/spans.media_text_pairs), driver-gated: the span stream is
    synthesized deterministically from ``documents.text`` (a text span per
    5-token group at offset 2g; an image span at offset 2g+1 after every
    3rd group), so the DuckDB twin can compute the expected pairs by pure
    position arithmetic while Spark runs the actual HOF pairing operator.

    Scale shape: synthesis + pairing are one Python-free projection; the
    only fan-out is the per-media explode (rows ≈ media spans)."""
    from spider_go_spark.functions.spans import media_text_pairs

    docs = _synth_span_docs(spark, sf)
    return media_text_pairs(docs).select(
        "doc_id", "media_ref", "media_kind",
        F.col("media_offset").cast("bigint").alias("media_offset"),
        "caption_before", "caption_after",
    )


CAPTION_PAIRS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), gs AS (
  SELECT doc_id, tokens,
         (len(tokens) + {GROUP_TOKENS} - 1) // {GROUP_TOKENS} AS n_groups,
         unnest(range(0, (len(tokens) + {GROUP_TOKENS} - 1) // {GROUP_TOKENS})) AS g
  FROM toks WHERE len(tokens) > 0
)
SELECT doc_id,
       'media://img/' || doc_id::VARCHAR || '/' || g::VARCHAR AS media_ref,
       'image' AS media_kind,
       (2*g + 1)::BIGINT AS media_offset,
       array_to_string(tokens[{GROUP_TOKENS}*g + 1 : {GROUP_TOKENS}*(g+1)], ' ') AS caption_before,
       CASE WHEN g + 1 < n_groups
            THEN array_to_string(tokens[{GROUP_TOKENS}*(g+1) + 1 : {GROUP_TOKENS}*(g+2)], ' ')
            ELSE NULL END AS caption_after
FROM gs WHERE g % {MEDIA_EVERY} = 0
"""


def _synth_span_docs(spark: SparkSession, sf: str) -> DataFrame:
    """The deterministic documents→spans synthesis shared by the two
    span-operator gate queries (see caption_pairs_synth docstring)."""
    from spider_go_spark.functions import textkernel as tk

    d = T(spark, sf, "documents")
    toks = d.select("doc_id", tk.tokens(F.col("text")).alias("tokens"))
    n_groups = F.ceil(F.size("tokens") / GROUP_TOKENS).cast("int")
    gidx = F.sequence(F.lit(0), n_groups - 1)

    def text_span(g):
        return F.struct(
            F.lit("text").alias("kind"),
            F.array_join(
                F.slice(F.col("tokens"), g * GROUP_TOKENS + 1, GROUP_TOKENS), " "
            ).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            (g * 2).cast("int").alias("offset"),
        )

    def img_span(g):
        return F.struct(
            F.when(g % MEDIA_EVERY == 0, F.lit("image"))
            .otherwise(F.lit("skip"))
            .alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(
                F.lit("media://img/"), F.col("doc_id").cast("string"),
                F.lit("/"), g.cast("string"),
            ).alias("media_ref"),
            (g * 2 + 1).cast("int").alias("offset"),
        )

    spans = F.filter(
        F.flatten(F.transform(gidx, lambda g: F.array(text_span(g), img_span(g)))),
        lambda s: s["kind"] != F.lit("skip"),
    )
    return toks.filter(F.size("tokens") > 0).select("doc_id", spans.alias("spans"))


def span_stats_synth(spark: SparkSession, sf: str) -> DataFrame:
    """The span_stream_stats interleaving profile through the REAL HOF-fold
    operator, over the same deterministic synthesized stream as
    caption_pairs_synth — the oracle recomputes every count (including the
    fold's longest-media-run) by token arithmetic."""
    from spider_go_spark.functions.spans import span_stream_stats

    return span_stream_stats(_synth_span_docs(spark, sf))


# per doc: n_groups text spans; an image after every 3rd group; text chars =
# Σ token lengths + (n_tokens - n_groups) joining spaces; media spans are
# always isolated between text spans → max run = 1 when any image exists.
SPAN_STATS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
)
SELECT doc_id,
       ((len(tokens) + {GROUP_TOKENS} - 1) // {GROUP_TOKENS})::BIGINT AS n_text,
       (((len(tokens) + {GROUP_TOKENS} - 1) // {GROUP_TOKENS}) + {MEDIA_EVERY} - 1)
         // {MEDIA_EVERY} AS n_image,
       0::BIGINT AS n_video,
       0::BIGINT AS n_link,
       (list_reduce(list_prepend(0::BIGINT, list_transform(tokens, t -> length(t)::BIGINT)),
                    (a, b) -> a + b)
        + len(tokens) - (len(tokens) + {GROUP_TOKENS} - 1) // {GROUP_TOKENS})::BIGINT
         AS n_text_chars,
       1::BIGINT AS max_media_run
FROM toks WHERE len(tokens) > 0
"""


def span_transitions_synth(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus layout profile through the REAL kind-transition operator
    (functions/spans.span_kind_transitions — zip_with over adjacent slices,
    no self-join) on the same deterministic synthesized stream as
    caption_pairs_synth. The oracle recomputes all three transition counts
    by pure group arithmetic: G text groups with an image after every 3rd
    group give n_img = ⌈G/3⌉ text→image, n_img minus the trailing image
    image→text, and the remaining adjacencies text→text."""
    from spider_go_spark.functions.spans import span_kind_transitions

    return span_kind_transitions(_synth_span_docs(spark, sf)).orderBy(
        "prev_kind", "next_kind"
    )


SPAN_TRANSITIONS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), per AS (
  SELECT (len(tokens) + {GROUP_TOKENS} - 1) // {GROUP_TOKENS} AS G,
         ((len(tokens) + {GROUP_TOKENS} - 1) // {GROUP_TOKENS} + {MEDIA_EVERY} - 1)
           // {MEDIA_EVERY} AS n_img,
         CASE WHEN ((len(tokens) + {GROUP_TOKENS} - 1) // {GROUP_TOKENS} - 1)
                   % {MEDIA_EVERY} = 0 THEN 1 ELSE 0 END AS img_last
  FROM toks WHERE len(tokens) > 0
)
SELECT prev_kind, next_kind, n_transitions FROM (
  SELECT 'image' AS prev_kind, 'text' AS next_kind,
         sum(n_img - img_last)::BIGINT AS n_transitions FROM per
  UNION ALL
  SELECT 'text', 'image', sum(n_img)::BIGINT FROM per
  UNION ALL
  SELECT 'text', 'text', sum(G - 1 - (n_img - img_last))::BIGINT FROM per
)
ORDER BY prev_kind, next_kind
"""


# --------------------------------------------------------------------------
# REAL byte-level image decode gate: P6 PPM payloads synthesized from a
# deterministic pixel rule, decoded by functions/media.decode_ppm (header
# parse + numpy stats). The oracle recomputes the channel sums from the
# SAME pixel rule in SQL — so the gate verifies genuine binary decoding
# (any header/offset/reshape bug breaks the sums), not a copied constant.
# --------------------------------------------------------------------------

PPM_DOCS = 200
# pixel rule: doc d is w×h, w = 4 + d%5, h = 3 + d%4, and raw pixel byte j
# (row-major RGB) has value (d*31 + j*7) % 256
PPM_STATS_DDL = (
    "doc_id bigint, width int, height int, n_pixels bigint, "
    "sum_r bigint, sum_g bigint, sum_b bigint"
)


def media_ppm_decode(spark: SparkSession, sf: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from spider_go_spark.functions.media import encode_ppm, real_decode

    def gen_and_decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                w, h = 4 + d % 5, 3 + d % 4
                j = np.arange(w * h * 3, dtype=np.int64)
                payload = encode_ppm(w, h, ((d * 31 + j * 7) % 256).astype(np.uint8))
                stats = real_decode(payload, "image")
                rows.append({"doc_id": d, **stats})
            yield pd.DataFrame(rows)

    from pyspark.sql import types as T_

    return spark.range(PPM_DOCS).repartition(8).mapInPandas(
        gen_and_decode, T_._parse_datatype_string(PPM_STATS_DDL)
    )


MEDIA_PPM_SQL = f"""
SELECT r AS doc_id,
       (4 + r % 5)::INTEGER AS width,
       (3 + r % 4)::INTEGER AS height,
       ((4 + r % 5) * (3 + r % 4))::BIGINT AS n_pixels,
       list_sum(list_transform(range((4 + r % 5) * (3 + r % 4)),
                p -> (r*31 + (p*3 + 0)*7) % 256))::BIGINT AS sum_r,
       list_sum(list_transform(range((4 + r % 5) * (3 + r % 4)),
                p -> (r*31 + (p*3 + 1)*7) % 256))::BIGINT AS sum_g,
       list_sum(list_transform(range((4 + r % 5) * (3 + r % 4)),
                p -> (r*31 + (p*3 + 2)*7) % 256))::BIGINT AS sum_b
FROM range({PPM_DOCS}) t(r)
"""


# --------------------------------------------------------------------------
# REAL BMP decode gate: 24-bit uncompressed BMPs synthesized from a
# deterministic pixel rule. The encoder stores BGR triples bottom-up with
# 4-byte row padding; the decoder must undo all three, so any
# stride/flip/channel-order bug breaks the channel sums vs the oracle's
# direct recomputation of the rule. Width varies mod 6 so every padding
# residue (w*3 mod 4) is exercised.
# --------------------------------------------------------------------------

BMP_DOCS = 200
# pixel rule: doc d is w×h, w = 3 + d%6, h = 2 + d%3, raw pixel byte j
# (row-major top-down RGB) has value (d*17 + j*11) % 256
BMP_STATS_DDL = PPM_STATS_DDL


def media_bmp_decode(spark: SparkSession, sf: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from spider_go_spark.functions.media import encode_bmp, real_decode

    def gen_and_decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                w, h = 3 + d % 6, 2 + d % 3
                j = np.arange(w * h * 3, dtype=np.int64)
                payload = encode_bmp(w, h, ((d * 17 + j * 11) % 256).astype(np.uint8))
                stats = real_decode(payload, "image")
                rows.append({"doc_id": d, **stats})
            yield pd.DataFrame(rows)

    from pyspark.sql import types as T_

    return spark.range(BMP_DOCS).repartition(8).mapInPandas(
        gen_and_decode, T_._parse_datatype_string(BMP_STATS_DDL)
    )


MEDIA_BMP_SQL = f"""
SELECT r AS doc_id,
       (3 + r % 6)::INTEGER AS width,
       (2 + r % 3)::INTEGER AS height,
       ((3 + r % 6) * (2 + r % 3))::BIGINT AS n_pixels,
       list_sum(list_transform(range((3 + r % 6) * (2 + r % 3)),
                p -> (r*17 + (p*3 + 0)*11) % 256))::BIGINT AS sum_r,
       list_sum(list_transform(range((3 + r % 6) * (2 + r % 3)),
                p -> (r*17 + (p*3 + 1)*11) % 256))::BIGINT AS sum_g,
       list_sum(list_transform(range((3 + r % 6) * (2 + r % 3)),
                p -> (r*17 + (p*3 + 2)*11) % 256))::BIGINT AS sum_b
FROM range({BMP_DOCS}) t(r)
"""


# --------------------------------------------------------------------------
# REAL PNG decode gate: 8-bit truecolor PNGs synthesized from a
# deterministic pixel rule. The payload goes through genuine DEFLATE
# (stdlib zlib) and the writer rotates all five scanline filter types
# (row y uses filter y%5), so the decoder must verify chunk CRC32s,
# inflate, and reverse Sub/Up/Average/Paeth reconstruction — any filter or
# predictor bug breaks the channel sums vs the oracle's direct
# recomputation of the rule. Heights run 2..8 so Average and Paeth rows
# (y=3,4) are present in most images.
# --------------------------------------------------------------------------

PNG_DOCS = 200
# pixel rule: doc d is w×h, w = 3 + d%6, h = 2 + d%7, raw pixel byte j
# (row-major top-down RGB) has value (d*23 + j*13) % 256
PNG_STATS_DDL = PPM_STATS_DDL


def media_png_decode(spark: SparkSession, sf: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from spider_go_spark.functions.media import encode_png, real_decode

    def gen_and_decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                w, h = 3 + d % 6, 2 + d % 7
                j = np.arange(w * h * 3, dtype=np.int64)
                payload = encode_png(w, h, ((d * 23 + j * 13) % 256).astype(np.uint8))
                stats = real_decode(payload, "image")
                rows.append({"doc_id": d, **stats})
            yield pd.DataFrame(rows)

    from pyspark.sql import types as T_

    return spark.range(PNG_DOCS).repartition(8).mapInPandas(
        gen_and_decode, T_._parse_datatype_string(PNG_STATS_DDL)
    )


MEDIA_PNG_SQL = f"""
SELECT r AS doc_id,
       (3 + r % 6)::INTEGER AS width,
       (2 + r % 7)::INTEGER AS height,
       ((3 + r % 6) * (2 + r % 7))::BIGINT AS n_pixels,
       list_sum(list_transform(range((3 + r % 6) * (2 + r % 7)),
                p -> (r*23 + (p*3 + 0)*13) % 256))::BIGINT AS sum_r,
       list_sum(list_transform(range((3 + r % 6) * (2 + r % 7)),
                p -> (r*23 + (p*3 + 1)*13) % 256))::BIGINT AS sum_g,
       list_sum(list_transform(range((3 + r % 6) * (2 + r % 7)),
                p -> (r*23 + (p*3 + 2)*13) % 256))::BIGINT AS sum_b
FROM range({PNG_DOCS}) t(r)
"""


# --------------------------------------------------------------------------
# REAL JPEG decode gate: baseline JFIF files synthesized block-constant
# (every 8×8 tile one RGB value), pushed through the full encoder
# (integer fDCT, Annex-K quality-scaled quantization, canonical Huffman
# with byte stuffing) and the full decoder (marker walk, DHT-driven
# Huffman decode with DC prediction across MCUs, integer IDCT, YCbCr→RGB).
# Because constant blocks produce a pure-DC spectrum (the Q13 cosine
# table's u≥1 rows sum to exactly 0), the decoded value of each block is
# ONE closed-form integer expression of (r,g,b,quality) — which the DuckDB
# oracle recomputes stage by stage: quality scaling, YCbCr forward, DC
# fDCT, round-half-away quantize, dequantize, DC IDCT, clamp, YCbCr
# inverse. Any entropy-coding, predictor, quantizer or color-space bug
# breaks the channel sums. Width/height vary over 8/16 so single-block
# and multi-block (DC-diff chain) layouts are both exercised; quality runs
# 30..94 so both IJG scaling branches are hit.
# --------------------------------------------------------------------------

JPEG_DOCS = 200
# rule: doc d is w=8·(1+d%2) × h=8·(1+(d//2)%2); block bi (row-major) is
# constant RGB ((d·7+bi·29)%256, (d·11+bi·31)%256, (d·13+bi·37)%256);
# quality = 30 + (d·7)%65
JPEG_STATS_DDL = PPM_STATS_DDL


def media_jpeg_decode(spark: SparkSession, sf: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from spider_go_spark.functions.jpeg import encode_jpeg
    from spider_go_spark.functions.media import real_decode

    def gen_and_decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                w, h = 8 * (1 + d % 2), 8 * (1 + (d // 2) % 2)
                nbx = w // 8
                img = np.zeros((h, w, 3), dtype=np.uint8)
                for bi in range(nbx * (h // 8)):
                    by, bx = divmod(bi, nbx)
                    img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = (
                        (d * 7 + bi * 29) % 256,
                        (d * 11 + bi * 31) % 256,
                        (d * 13 + bi * 37) % 256,
                    )
                payload = encode_jpeg(w, h, img, quality=30 + (d * 7) % 65)
                stats = real_decode(payload, "image")
                rows.append({"doc_id": d, **stats})
            yield pd.DataFrame(rows)

    from pyspark.sql import types as T_

    return spark.range(JPEG_DOCS).repartition(8).mapInPandas(
        gen_and_decode, T_._parse_datatype_string(JPEG_STATS_DDL)
    )


def _fdiv(a: str, b: int) -> str:
    """SQL floor division of a possibly-negative numerator by positive
    ``b`` (DuckDB ``//`` truncates toward zero — the repo's standard
    trick)."""
    return (
        f"(CASE WHEN ({a}) >= 0 THEN ({a}) // {b}"
        f" ELSE -((-({a}) + {b} - 1) // {b}) END)"
    )


def _rha(v: str, q: str) -> str:
    """SQL round-half-away-from-zero division (the JPEG quantizer)."""
    return (
        f"(CASE WHEN ({v}) >= 0 THEN (2*({v}) + {q}) // (2*{q})"
        f" ELSE -((-2*({v}) + {q}) // (2*{q})) END)"
    )


# 2147766336 = (8·5793)², 33558849 = 5793², 134217728 = 2^27,
# 268435456 = 2^28, 8421376 = (128<<16)+32768 (chroma offset incl. the
# rounding term) — the exact constants of functions/jpeg.py's kernels.
MEDIA_JPEG_SQL = f"""
WITH docs AS (
  SELECT r AS d, 8*(1 + r % 2) AS w, 8*(1 + (r//2) % 2) AS h,
         30 + (r*7) % 65 AS qq
  FROM range({JPEG_DOCS}) t(r)
), scaled AS (
  SELECT *, CASE WHEN qq < 50 THEN 5000 // qq ELSE 200 - 2*qq END AS sc
  FROM docs
), qtabs AS (
  SELECT *, least(255, greatest(1, (16*sc + 50) // 100)) AS qy,
            least(255, greatest(1, (17*sc + 50) // 100)) AS qc
  FROM scaled
), blocks AS (
  SELECT qtabs.*, bi FROM qtabs, range(4) tb(bi) WHERE bi < (w//8)*(h//8)
), rgb AS (
  SELECT *, (d*7 + bi*29) % 256 AS r0, (d*11 + bi*31) % 256 AS g0,
            (d*13 + bi*37) % 256 AS b0
  FROM blocks
), ycc AS (
  SELECT *,
    (19595*r0 + 38470*g0 + 7471*b0 + 32768) // 65536 AS yy,
    ((-11059)*r0 + (-21709)*g0 + 32768*b0 + 8421376) // 65536 AS cb,
    (32768*r0 + (-27439)*g0 + (-5329)*b0 + 8421376) // 65536 AS cr
  FROM rgb
), f00 AS (
  SELECT *,
    {_fdiv('(yy-128)*2147766336 + 134217728', 268435456)} AS fy,
    {_fdiv('(cb-128)*2147766336 + 134217728', 268435456)} AS fcb,
    {_fdiv('(cr-128)*2147766336 + 134217728', 268435456)} AS fcr
  FROM ycc
), deq AS (
  SELECT *, {_rha('fy', 'qy')} * qy AS dfy,
            {_rha('fcb', 'qc')} * qc AS dfcb,
            {_rha('fcr', 'qc')} * qc AS dfcr
  FROM f00
), rec AS (
  SELECT *,
    least(255, greatest(0, {_fdiv('dfy*33558849 + 134217728', 268435456)} + 128)) AS ry,
    least(255, greatest(0, {_fdiv('dfcb*33558849 + 134217728', 268435456)} + 128)) AS rcb,
    least(255, greatest(0, {_fdiv('dfcr*33558849 + 134217728', 268435456)} + 128)) AS rcr
  FROM deq
), px AS (
  SELECT *,
    least(255, greatest(0, ry + {_fdiv('91881*(rcr-128) + 32768', 65536)})) AS rr,
    least(255, greatest(0, ry - {_fdiv('22554*(rcb-128) + 46802*(rcr-128) + 32768', 65536)})) AS gg,
    least(255, greatest(0, ry + {_fdiv('116130*(rcb-128) + 32768', 65536)})) AS bb
  FROM rec
)
SELECT d AS doc_id, max(w)::INTEGER AS width, max(h)::INTEGER AS height,
       (max(w)*max(h))::BIGINT AS n_pixels,
       sum(64*rr)::BIGINT AS sum_r, sum(64*gg)::BIGINT AS sum_g,
       sum(64*bb)::BIGINT AS sum_b
FROM px GROUP BY d
"""


# --------------------------------------------------------------------------
# REAL WAV decode gate: canonical RIFF/WAVE PCM-16 mono files synthesized
# from a deterministic sample rule; the decoder walks the chunk list and
# interprets little-endian int16 — an endianness, chunk-offset or
# sign-extension bug breaks sum_abs / sum_sq vs the oracle.
# --------------------------------------------------------------------------

WAV_DOCS = 200
# sample rule: doc d has n = 50 + d%17 samples at rate 8000 + (d%3)*4000;
# sample i has value ((d*131 + i*97) % 4001) - 2000
WAV_STATS_DDL = (
    "doc_id bigint, sample_rate int, n_samples bigint, "
    "sum_abs bigint, peak bigint, sum_sq bigint"
)


def media_wav_decode(spark: SparkSession, sf: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from spider_go_spark.functions.media import encode_wav, real_decode

    def gen_and_decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                n = 50 + d % 17
                i = np.arange(n, dtype=np.int64)
                samples = ((d * 131 + i * 97) % 4001) - 2000
                payload = encode_wav(8000 + (d % 3) * 4000, samples)
                stats = real_decode(payload, "audio")
                rows.append({"doc_id": d, **stats})
            yield pd.DataFrame(rows)

    from pyspark.sql import types as T_

    return spark.range(WAV_DOCS).repartition(8).mapInPandas(
        gen_and_decode, T_._parse_datatype_string(WAV_STATS_DDL)
    )


MEDIA_WAV_SQL = f"""
SELECT r AS doc_id,
       (8000 + (r % 3) * 4000)::INTEGER AS sample_rate,
       (50 + r % 17)::BIGINT AS n_samples,
       list_sum(list_transform(range(50 + r % 17),
                i -> abs((r*131 + i*97) % 4001 - 2000)))::BIGINT AS sum_abs,
       list_max(list_transform(range(50 + r % 17),
                i -> abs((r*131 + i*97) % 4001 - 2000)))::BIGINT AS peak,
       list_sum(list_transform(range(50 + r % 17),
                i -> ((r*131 + i*97) % 4001 - 2000)
                   * ((r*131 + i*97) % 4001 - 2000)))::BIGINT AS sum_sq
FROM range({WAV_DOCS}) t(r)
"""


# --------------------------------------------------------------------------
# REAL 4:2:0 JPEG decode gate: the same closed-form DC story as
# media_jpeg_decode, but through the SUBSAMPLED bitstream layout — MCU =
# 4 interleaved Y blocks + box-averaged Cb + Cr over a 16×16 tile, nearest
# chroma upsampling on decode. MCU-constant input makes the chroma box
# average exact ((4v+2)>>2 = v), so the per-MCU decoded value is the SAME
# closed-form integer expression — any interleave-order, subsample or
# upsample bug breaks the channel sums while the oracle stays analytic.
# --------------------------------------------------------------------------

JPEG420_DOCS = 200
# rule: doc d is w=16·(1+d%2) × 16 (1 or 2 MCUs); MCU bi is constant RGB
# ((d·7+bi·29)%256, (d·11+bi·31)%256, (d·13+bi·37)%256); quality 30+(d·7)%65


def media_jpeg420_decode(spark: SparkSession, sf: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from spider_go_spark.functions.jpeg import encode_jpeg
    from spider_go_spark.functions.media import real_decode

    def gen_and_decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                w, h = 16 * (1 + d % 2), 16
                img = np.zeros((h, w, 3), dtype=np.uint8)
                for bi in range(w // 16):
                    img[:, bi * 16 : (bi + 1) * 16] = (
                        (d * 7 + bi * 29) % 256,
                        (d * 11 + bi * 31) % 256,
                        (d * 13 + bi * 37) % 256,
                    )
                payload = encode_jpeg(
                    w, h, img, quality=30 + (d * 7) % 65, subsampling="420"
                )
                stats = real_decode(payload, "image")
                rows.append({"doc_id": d, **stats})
            yield pd.DataFrame(rows)

    from pyspark.sql import types as T_

    return spark.range(JPEG420_DOCS).repartition(8).mapInPandas(
        gen_and_decode, T_._parse_datatype_string(JPEG_STATS_DDL)
    )


MEDIA_JPEG420_SQL = f"""
WITH docs AS (
  SELECT r AS d, 16*(1 + r % 2) AS w, 16 AS h, 30 + (r*7) % 65 AS qq
  FROM range({JPEG420_DOCS}) t(r)
), scaled AS (
  SELECT *, CASE WHEN qq < 50 THEN 5000 // qq ELSE 200 - 2*qq END AS sc
  FROM docs
), qtabs AS (
  SELECT *, least(255, greatest(1, (16*sc + 50) // 100)) AS qy,
            least(255, greatest(1, (17*sc + 50) // 100)) AS qc
  FROM scaled
), blocks AS (
  SELECT qtabs.*, bi FROM qtabs, range(2) tb(bi) WHERE bi < w//16
), rgb AS (
  SELECT *, (d*7 + bi*29) % 256 AS r0, (d*11 + bi*31) % 256 AS g0,
            (d*13 + bi*37) % 256 AS b0
  FROM blocks
), ycc AS (
  SELECT *,
    (19595*r0 + 38470*g0 + 7471*b0 + 32768) // 65536 AS yy,
    ((-11059)*r0 + (-21709)*g0 + 32768*b0 + 8421376) // 65536 AS cb,
    (32768*r0 + (-27439)*g0 + (-5329)*b0 + 8421376) // 65536 AS cr
  FROM rgb
), f00 AS (
  SELECT *,
    {_fdiv('(yy-128)*2147766336 + 134217728', 268435456)} AS fy,
    {_fdiv('(cb-128)*2147766336 + 134217728', 268435456)} AS fcb,
    {_fdiv('(cr-128)*2147766336 + 134217728', 268435456)} AS fcr
  FROM ycc
), deq AS (
  SELECT *, {_rha('fy', 'qy')} * qy AS dfy,
            {_rha('fcb', 'qc')} * qc AS dfcb,
            {_rha('fcr', 'qc')} * qc AS dfcr
  FROM f00
), rec AS (
  SELECT *,
    least(255, greatest(0, {_fdiv('dfy*33558849 + 134217728', 268435456)} + 128)) AS ry,
    least(255, greatest(0, {_fdiv('dfcb*33558849 + 134217728', 268435456)} + 128)) AS rcb,
    least(255, greatest(0, {_fdiv('dfcr*33558849 + 134217728', 268435456)} + 128)) AS rcr
  FROM deq
), px AS (
  SELECT *,
    least(255, greatest(0, ry + {_fdiv('91881*(rcr-128) + 32768', 65536)})) AS rr,
    least(255, greatest(0, ry - {_fdiv('22554*(rcb-128) + 46802*(rcr-128) + 32768', 65536)})) AS gg,
    least(255, greatest(0, ry + {_fdiv('116130*(rcb-128) + 32768', 65536)})) AS bb
  FROM rec
)
SELECT d AS doc_id, max(w)::INTEGER AS width, max(h)::INTEGER AS height,
       (max(w)*max(h))::BIGINT AS n_pixels,
       sum(256*rr)::BIGINT AS sum_r, sum(256*gg)::BIGINT AS sum_g,
       sum(256*bb)::BIGINT AS sum_b
FROM px GROUP BY d
"""


# --------------------------------------------------------------------------
# REAL grayscale JPEG decode gate: single-component baseline files (the
# common scanned/monochrome web layout) — one SOF component, luma tables
# only, no color transform on either side. Block-constant input keeps the
# decoded value closed-form: out = clamp(floor((rha(F00,qY)·qY·5793² +
# 2^27)/2^28) + 128) replicated across RGB.
# --------------------------------------------------------------------------

JPEG_GRAY_DOCS = 200
# rule: doc d is w=8·(1+d%2) × 8; block bi constant gray (d*13+bi*41)%256;
# quality 30 + (d*7)%65


def media_jpeg_gray_decode(spark: SparkSession, sf: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from spider_go_spark.functions.jpeg import encode_jpeg_gray
    from spider_go_spark.functions.media import real_decode

    def gen_and_decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                w, h = 8 * (1 + d % 2), 8
                img = np.zeros((h, w), dtype=np.uint8)
                for bi in range(w // 8):
                    img[:, bi * 8 : (bi + 1) * 8] = (d * 13 + bi * 41) % 256
                payload = encode_jpeg_gray(w, h, img, quality=30 + (d * 7) % 65)
                stats = real_decode(payload, "image")
                rows.append({"doc_id": d, **stats})
            yield pd.DataFrame(rows)

    from pyspark.sql import types as T_

    return spark.range(JPEG_GRAY_DOCS).repartition(8).mapInPandas(
        gen_and_decode, T_._parse_datatype_string(JPEG_STATS_DDL)
    )


MEDIA_JPEG_GRAY_SQL = f"""
WITH docs AS (
  SELECT r AS d, 8*(1 + r % 2) AS w, 8 AS h, 30 + (r*7) % 65 AS qq
  FROM range({JPEG_GRAY_DOCS}) t(r)
), scaled AS (
  SELECT *, CASE WHEN qq < 50 THEN 5000 // qq ELSE 200 - 2*qq END AS sc
  FROM docs
), qtabs AS (
  SELECT *, least(255, greatest(1, (16*sc + 50) // 100)) AS qy
  FROM scaled
), blocks AS (
  SELECT qtabs.*, bi FROM qtabs, range(2) tb(bi) WHERE bi < w//8
), gv AS (
  SELECT *, (d*13 + bi*41) % 256 AS g0 FROM blocks
), f00 AS (
  SELECT *, {_fdiv('(g0-128)*2147766336 + 134217728', 268435456)} AS fy FROM gv
), rec AS (
  SELECT *,
    least(255, greatest(0,
      {_fdiv(_rha('fy', 'qy') + '*qy*33558849 + 134217728', 268435456)} + 128)) AS gd
  FROM f00
)
SELECT d AS doc_id, max(w)::INTEGER AS width, max(h)::INTEGER AS height,
       (max(w)*max(h))::BIGINT AS n_pixels,
       sum(64*gd)::BIGINT AS sum_r, sum(64*gd)::BIGINT AS sum_g,
       sum(64*gd)::BIGINT AS sum_b
FROM rec GROUP BY d
"""


# --------------------------------------------------------------------------
# REAL AVI/MJPEG decode gate: genuine RIFF AVI containers (avih → strl
# with a vids/MJPG stream → movi 00dc chunks → idx1) holding real baseline
# JPEG frames. The sampler walks the real container, decodes every 2nd
# frame through the real Huffman+IDCT pipeline; constant frames keep the
# decoded value closed-form, so the oracle recomputes the sums
# analytically while the bytes exercise RIFF list nesting, word alignment
# and the full JPEG stack per frame.
# --------------------------------------------------------------------------

AVI_DOCS = 150
# rule: doc d is an AVI of f = 1 + d%4 16×16 frames; frame k is constant
# RGB ((d*7+k*29)%256, (d*11+k*31)%256, (d*13+k*37)%256); quality
# 30 + (d*7)%65; the sampler takes frames 0, 2, ...


def media_avi_decode(spark: SparkSession, sf: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from spider_go_spark.functions.jpeg import encode_jpeg
    from spider_go_spark.functions.media import encode_avi_mjpeg, real_decode

    def gen_and_decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                f = 1 + d % 4
                q = 30 + (d * 7) % 65
                frames = []
                for k in range(f):
                    img = np.zeros((16, 16, 3), dtype=np.uint8)
                    img[:] = (
                        (d * 7 + k * 29) % 256,
                        (d * 11 + k * 31) % 256,
                        (d * 13 + k * 37) % 256,
                    )
                    frames.append(encode_jpeg(16, 16, img, quality=q))
                payload = encode_avi_mjpeg(16, 16, 10, frames)
                stats = real_decode(payload, "video")
                rows.append({"doc_id": d, **stats})
            yield pd.DataFrame(rows)

    from pyspark.sql import types as T_

    return spark.range(AVI_DOCS).repartition(8).mapInPandas(
        gen_and_decode,
        T_._parse_datatype_string(
            "doc_id bigint, width int, height int, n_frames int, "
            "n_sampled int, sum_r bigint, sum_g bigint, sum_b bigint"
        ),
    )


MEDIA_AVI_SQL = f"""
WITH docs AS (
  SELECT r AS d, 1 + r % 4 AS f, 30 + (r*7) % 65 AS qq
  FROM range({AVI_DOCS}) t(r)
), scaled AS (
  SELECT *, CASE WHEN qq < 50 THEN 5000 // qq ELSE 200 - 2*qq END AS sc
  FROM docs
), qtabs AS (
  SELECT *, least(255, greatest(1, (16*sc + 50) // 100)) AS qy,
            least(255, greatest(1, (17*sc + 50) // 100)) AS qc
  FROM scaled
), frames AS (
  SELECT qtabs.*, k FROM qtabs, range(4) tk(k) WHERE k < f AND k % 2 = 0
), rgb AS (
  SELECT *, (d*7 + k*29) % 256 AS r0, (d*11 + k*31) % 256 AS g0,
            (d*13 + k*37) % 256 AS b0
  FROM frames
), ycc AS (
  SELECT *,
    (19595*r0 + 38470*g0 + 7471*b0 + 32768) // 65536 AS yy,
    ((-11059)*r0 + (-21709)*g0 + 32768*b0 + 8421376) // 65536 AS cb,
    (32768*r0 + (-27439)*g0 + (-5329)*b0 + 8421376) // 65536 AS cr
  FROM rgb
), f00 AS (
  SELECT *,
    {_fdiv('(yy-128)*2147766336 + 134217728', 268435456)} AS fy,
    {_fdiv('(cb-128)*2147766336 + 134217728', 268435456)} AS fcb,
    {_fdiv('(cr-128)*2147766336 + 134217728', 268435456)} AS fcr
  FROM ycc
), deq AS (
  SELECT *, {_rha('fy', 'qy')} * qy AS dfy,
            {_rha('fcb', 'qc')} * qc AS dfcb,
            {_rha('fcr', 'qc')} * qc AS dfcr
  FROM f00
), rec AS (
  SELECT *,
    least(255, greatest(0, {_fdiv('dfy*33558849 + 134217728', 268435456)} + 128)) AS ry,
    least(255, greatest(0, {_fdiv('dfcb*33558849 + 134217728', 268435456)} + 128)) AS rcb,
    least(255, greatest(0, {_fdiv('dfcr*33558849 + 134217728', 268435456)} + 128)) AS rcr
  FROM deq
), px AS (
  SELECT *,
    least(255, greatest(0, ry + {_fdiv('91881*(rcr-128) + 32768', 65536)})) AS rr,
    least(255, greatest(0, ry - {_fdiv('22554*(rcb-128) + 46802*(rcr-128) + 32768', 65536)})) AS gg,
    least(255, greatest(0, ry + {_fdiv('116130*(rcb-128) + 32768', 65536)})) AS bb
  FROM rec
)
SELECT d AS doc_id, 16 AS width, 16 AS height, max(f)::INTEGER AS n_frames,
       ((max(f) + 1) // 2)::INTEGER AS n_sampled,
       sum(256*rr)::BIGINT AS sum_r, sum(256*gg)::BIGINT AS sum_g,
       sum(256*bb)::BIGINT AS sum_b
FROM px GROUP BY d
"""


# --------------------------------------------------------------------------
# REAL IMA ADPCM decode gate: compressed-audio WAVs (format tag 0x0011)
# synthesized from the same deterministic sample rule as the PCM gate,
# 4-bit-quantized through the genuine step-table encoder, then decoded by
# the real state machine. ADPCM is LOSSY and stateful, so the oracle can't
# recompute the input rule — instead a recursive CTE replays the exact
# integer encoder+decoder recurrence (quantize → reconstruct → clamp →
# step-index walk) sample by sample and aggregates the decoded stats. Any
# quantizer, clamp, nibble-order or table bug breaks the value hash.
# --------------------------------------------------------------------------

ADPCM_DOCS = 200
# sample rule: doc d has n = 41 + d%32 samples at rate 8000 + (d%3)*4000;
# sample i has value ((d*131 + i*97) % 4001) - 2000; one ADPCM block/doc
ADPCM_STATS_DDL = WAV_STATS_DDL


def media_adpcm_decode(spark: SparkSession, sf: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from spider_go_spark.functions.media import encode_wav_ima, real_decode

    def gen_and_decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                n = 41 + d % 32
                i = np.arange(n, dtype=np.int64)
                samples = ((d * 131 + i * 97) % 4001) - 2000
                payload = encode_wav_ima(8000 + (d % 3) * 4000, samples)
                stats = real_decode(payload, "audio")
                rows.append({"doc_id": d, **stats})
            yield pd.DataFrame(rows)

    from pyspark.sql import types as T_

    return spark.range(ADPCM_DOCS).repartition(8).mapInPandas(
        gen_and_decode, T_._parse_datatype_string(ADPCM_STATS_DDL)
    )


def _adpcm_oracle_sql() -> str:
    from spider_go_spark.functions.media import IMA_INDEX_ADJ, IMA_STEPS

    steps = "[" + ",".join(map(str, IMA_STEPS)) + "]"
    adj = "[" + ",".join(map(str, IMA_INDEX_ADJ)) + "]"
    return f"""
WITH RECURSIVE docs AS (
  SELECT r AS d, 41 + r % 32 AS n FROM range({ADPCM_DOCS}) t(r)
), st AS (
  SELECT d, n, 0 AS i,
         ((d*131) % 4001 - 2000)::BIGINT AS dec,
         ((d*131) % 4001 - 2000)::BIGINT AS pred,
         0::BIGINT AS idx
  FROM docs
  UNION ALL
  SELECT d, n, i,
         greatest(-32768, least(32767, pred + CASE WHEN neg THEN -delta ELSE delta END)) AS dec,
         greatest(-32768, least(32767, pred + CASE WHEN neg THEN -delta ELSE delta END)) AS pred,
         greatest(0, least(88, idx + {adj}[4*c4 + 2*c2 + c1 + 1])) AS idx
  FROM (
    SELECT d, n, i, pred, idx, neg, c4, c2,
           CASE WHEN m2 >= (step >> 2) THEN 1 ELSE 0 END AS c1,
           (step >> 3) + (CASE WHEN m2 >= (step >> 2) THEN 1 ELSE 0 END)*(step >> 2)
             + c2*(step >> 1) + c4*step AS delta
    FROM (
      SELECT d, n, i, pred, idx, neg, step, c4, m1,
             CASE WHEN m1 >= (step >> 1) THEN 1 ELSE 0 END AS c2,
             m1 - (CASE WHEN m1 >= (step >> 1) THEN 1 ELSE 0 END)*(step >> 1) AS m2
      FROM (
        SELECT d, n, i, pred, idx, neg, step, mag,
               CASE WHEN mag >= step THEN 1 ELSE 0 END AS c4,
               mag - (CASE WHEN mag >= step THEN 1 ELSE 0 END)*step AS m1
        FROM (
          SELECT d, n, i + 1 AS i, pred, idx,
                 (diff < 0) AS neg, abs(diff) AS mag, step
          FROM (
            SELECT d, n, i, pred, idx,
                   ((d*131 + (i+1)*97) % 4001 - 2000) - pred AS diff,
                   {steps}[idx + 1] AS step
            FROM st WHERE i + 1 < n
          )
        )
      )
    )
  )
)
SELECT d AS doc_id,
       (8000 + (d % 3) * 4000)::INTEGER AS sample_rate,
       count(*)::BIGINT AS n_samples,
       sum(abs(dec))::BIGINT AS sum_abs,
       max(abs(dec))::BIGINT AS peak,
       sum(dec*dec)::BIGINT AS sum_sq
FROM st GROUP BY d
"""


MEDIA_ADPCM_SQL = _adpcm_oracle_sql()


# --------------------------------------------------------------------------
# Perceptual image dedup over REAL decoded bytes: 16×16 BMPs synthesized
# from a deterministic pixel rule (pattern p = doc % 24 repeats every 24
# docs → true duplicate groups), decoded byte-for-byte by
# functions/media.decode_bmp_pixels, block-mean aHashed, and grouped. The
# oracle recomputes the hash from the SAME pixel rule in SQL — all-integer
# grayscale/downsample/threshold, so any decode or hash bug breaks parity.
# --------------------------------------------------------------------------

AHASH_DOCS = 240
AHASH_PATTERNS = 24
AHASH_W = 16  # 16×16 source → real 2×2 block-mean downsample to the 8×8 grid


def image_ahash_groups(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual (average-hash) image dedup: encode → REAL byte decode →
    integer aHash → hash-groupBy — the image twin of exact text dedup, and
    the bucket key under which near-identical images (re-encodes, resizes)
    collapse at 100 TB without any pairwise comparison.

    Scale shape: encode/decode/hash is one Arrow map stage (rows = images,
    no shuffle); the dedup is a single hash agg on the 64-bit-equivalent
    key. Raw pixel rule: byte j of pattern p is (p*37 + j*j*11 + j*7) % 256."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from spider_go_spark.functions.media import (
        ahash_bits,
        decode_bmp_pixels,
        encode_bmp,
    )

    n_px = AHASH_W * AHASH_W * 3

    def gen_hash(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        j = np.arange(n_px, dtype=np.int64)
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                p = d % AHASH_PATTERNS
                payload = encode_bmp(
                    AHASH_W, AHASH_W, ((p * 37 + j * j * 11 + j * 7) % 256).astype(np.uint8)
                )
                rows.append({"doc_id": d, "ahash": ahash_bits(decode_bmp_pixels(payload))})
            yield pd.DataFrame(rows)

    hashed = (
        spark.range(AHASH_DOCS)
        .repartition(8)
        .mapInPandas(gen_hash, "doc_id bigint, ahash string")
    )
    return (
        hashed.groupBy("ahash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("ahash")
    )


MEDIA_AHASH_SQL = f"""
WITH px AS (
  SELECT p, i,
         (((p*37 + (3*i)*(3*i)*11 + (3*i)*7) % 256)
        + ((p*37 + (3*i+1)*(3*i+1)*11 + (3*i+1)*7) % 256)
        + ((p*37 + (3*i+2)*(3*i+2)*11 + (3*i+2)*7) % 256)) // 3 AS gray,
         ((i // {AHASH_W}) // 2) * 8 + ((i % {AHASH_W}) // 2) AS b
  FROM range({AHASH_PATTERNS}) t(p), range({AHASH_W * AHASH_W}) s(i)
), blocks AS (
  SELECT p, b, sum(gray) // 4 AS bval FROM px GROUP BY p, b
), means AS (
  SELECT p, sum(bval) // 64 AS mean FROM blocks GROUP BY p
), bits AS (
  SELECT blocks.p,
         string_agg(CASE WHEN bval > mean THEN '1' ELSE '0' END, '' ORDER BY b) AS ahash
  FROM blocks JOIN means ON blocks.p = means.p GROUP BY blocks.p
)
SELECT ahash, sum({AHASH_DOCS // AHASH_PATTERNS})::BIGINT AS n_docs,
       min(p)::BIGINT AS first_doc
FROM bits GROUP BY ahash ORDER BY ahash
"""


# --------------------------------------------------------------------------
# Perceptual DCT-hash (pHash) dedup over REAL decoded bytes: the
# industry-standard perceptual key (robust to re-encoding across codecs
# and quality levels — tests pin BMP≡JPEG-q60≡JPEG-420 collisions).
# Same pattern-rule corpus as the aHash gate; the oracle recomputes the
# ENTIRE integer pipeline in SQL: grayscale → nearest 32×32 resize (each
# source pixel repeats 2×2, folded into a precomputed 8×16 paired-basis
# table M2[u][xs] = M[u][2xs]+M[u][2xs+1]) → 8×8 low-frequency integer DCT
# (floor shift ≫26) → lower-median threshold → 64-bit string.
# --------------------------------------------------------------------------


def image_phash_groups(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual DCT-hash image dedup: encode → REAL byte decode →
    integer pHash (functions/media.phash_bits) → hash-groupBy. Same scale
    shape as the aHash gate (one Arrow map stage + one hash agg); the
    stronger perceptual key of the two — DCT low-frequency structure
    survives re-encoding where block means drift."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from spider_go_spark.functions.media import (
        decode_bmp_pixels,
        encode_bmp,
        phash_bits,
    )

    n_px = AHASH_W * AHASH_W * 3

    def gen_hash(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        j = np.arange(n_px, dtype=np.int64)
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                p = d % AHASH_PATTERNS
                payload = encode_bmp(
                    AHASH_W, AHASH_W, ((p * 37 + j * j * 11 + j * 7) % 256).astype(np.uint8)
                )
                rows.append({"doc_id": d, "phash": phash_bits(decode_bmp_pixels(payload))})
            yield pd.DataFrame(rows)

    hashed = (
        spark.range(AHASH_DOCS)
        .repartition(8)
        .mapInPandas(gen_hash, "doc_id bigint, phash string")
    )
    return (
        hashed.groupBy("phash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("phash")
    )


def _phash_oracle_sql() -> str:
    from spider_go_spark.functions.media import _phash_basis

    m = _phash_basis()
    m2_rows = ",".join(
        f"({u},{k},{int(m[u, 2 * k] + m[u, 2 * k + 1])})"
        for u in range(8)
        for k in range(16)
    )
    return f"""
WITH m2(u, k, val) AS (VALUES {m2_rows}),
px AS (
  SELECT p, i % {AHASH_W} AS xs, i // {AHASH_W} AS ys,
         (((p*37 + (3*i)*(3*i)*11 + (3*i)*7) % 256)
        + ((p*37 + (3*i+1)*(3*i+1)*11 + (3*i+1)*7) % 256)
        + ((p*37 + (3*i+2)*(3*i+2)*11 + (3*i+2)*7) % 256)) // 3 AS gray
  FROM range({AHASH_PATTERNS}) t(p), range({AHASH_W * AHASH_W}) s(i)
), coef AS (
  SELECT px.p, a.u AS u, b.u AS v,
         sum(px.gray * a.val * b.val) AS s
  FROM px
  JOIN m2 a ON a.k = px.ys  -- u rides the row (y) axis, as in M·g32·Mᵀ
  JOIN m2 b ON b.k = px.xs
  GROUP BY px.p, a.u, b.u
), fq AS (
  SELECT p, u, v, {_fdiv('s', 1 << 26)} AS f FROM coef
), med AS (
  SELECT p, (list_sort(list(f)))[32] AS med
  FROM fq WHERE NOT (u = 0 AND v = 0) GROUP BY p
), bits AS (
  SELECT fq.p,
         string_agg(CASE WHEN f > med THEN '1' ELSE '0' END, ''
                    ORDER BY u, v) AS phash
  FROM fq JOIN med ON fq.p = med.p GROUP BY fq.p
)
SELECT phash, sum({AHASH_DOCS // AHASH_PATTERNS})::BIGINT AS n_docs,
       min(p)::BIGINT AS first_doc
FROM bits GROUP BY phash ORDER BY phash
"""


MEDIA_PHASH_SQL = _phash_oracle_sql()


# --------------------------------------------------------------------------
# Image resize gate: variable-size PNGs (through the REAL codec: DEFLATE +
# rotated scanline filters) decoded and nearest-neighbor downsampled to a
# fixed thumbnail grid (functions/media.resize_nearest) — the
# normalize-before-embedding step of an image pipeline. The position-
# weighted checksum pins WHERE each resized pixel landed, not just the
# channel multisets; the oracle recomputes the floor source-index mapping
# ((y*h)//TH, (x*w)//TW) directly from the pixel rule.
# --------------------------------------------------------------------------

RESIZE_DOCS = 200
RESIZE_TW, RESIZE_TH = 3, 2
# source rule: doc d is w×h, w = 4 + d%7, h = 3 + d%5, raw byte j
# (row-major top-down RGB) has value (d*29 + j*7) % 256
RESIZE_STATS_DDL = (
    "doc_id bigint, src_w int, src_h int, "
    "sum_r bigint, sum_g bigint, sum_b bigint, chk bigint"
)


def image_resize_stats(spark: SparkSession, sf: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from spider_go_spark.functions.media import (
        decode_png_pixels,
        encode_png,
        resize_nearest,
    )

    tw, th = RESIZE_TW, RESIZE_TH
    # chk weight: (target_cell_index + 1) * (channel + 1)
    wts = (
        (np.arange(th * tw, dtype=np.int64)[:, None] + 1)
        * (np.arange(3, dtype=np.int64)[None, :] + 1)
    ).reshape(th, tw, 3)

    def gen_resize(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                w, h = 4 + d % 7, 3 + d % 5
                j = np.arange(w * h * 3, dtype=np.int64)
                payload = encode_png(w, h, ((d * 29 + j * 7) % 256).astype(np.uint8))
                small = resize_nearest(
                    decode_png_pixels(payload).astype(np.int64), tw, th
                )
                rows.append({
                    "doc_id": d, "src_w": w, "src_h": h,
                    "sum_r": int(small[:, :, 0].sum()),
                    "sum_g": int(small[:, :, 1].sum()),
                    "sum_b": int(small[:, :, 2].sum()),
                    "chk": int((small * wts).sum()),
                })
            yield pd.DataFrame(rows)

    from pyspark.sql import types as T_

    return spark.range(RESIZE_DOCS).repartition(8).mapInPandas(
        gen_resize, T_._parse_datatype_string(RESIZE_STATS_DDL)
    )


def _resize_px(c: int) -> str:
    """Oracle expression: resized channel-c value at target cell t of doc r."""
    sy = f"((t // {RESIZE_TW}) * (3 + r % 5)) // {RESIZE_TH}"
    sx = f"((t % {RESIZE_TW}) * (4 + r % 7)) // {RESIZE_TW}"
    j = f"((({sy}) * (4 + r % 7) + ({sx})) * 3 + {c})"
    return f"(r*29 + ({j})*7) % 256"


IMAGE_RESIZE_SQL = f"""
SELECT r AS doc_id,
       (4 + r % 7)::INTEGER AS src_w,
       (3 + r % 5)::INTEGER AS src_h,
       list_sum(list_transform(range({RESIZE_TW * RESIZE_TH}),
                t -> {_resize_px(0)}))::BIGINT AS sum_r,
       list_sum(list_transform(range({RESIZE_TW * RESIZE_TH}),
                t -> {_resize_px(1)}))::BIGINT AS sum_g,
       list_sum(list_transform(range({RESIZE_TW * RESIZE_TH}),
                t -> {_resize_px(2)}))::BIGINT AS sum_b,
       list_sum(list_transform(range({RESIZE_TW * RESIZE_TH}),
                t -> (t + 1) * (({_resize_px(0)}) + 2*({_resize_px(1)})
                                + 3*({_resize_px(2)}))))::BIGINT AS chk
FROM range({RESIZE_DOCS}) s(r)
"""


# --------------------------------------------------------------------------
# Audio fingerprint dedup: the audio twin of image aHash — REAL RIFF/PCM
# decode → per-frame |sample| energies → bit = frame energy > integer mean
# → hash-groupBy. Re-encodes of the same source collapse to one
# fingerprint with no pairwise comparison; all-integer arithmetic so the
# oracle recomputes the fingerprint from the sample rule in SQL.
# --------------------------------------------------------------------------

AFP_DOCS = 240
AFP_PATTERNS = 24
AFP_SAMPLES = 64
AFP_FRAME = 8  # 8 frames of 8 samples -> 8-bit fingerprint string
# sample rule: pattern p = doc % AFP_PATTERNS; sample i of pattern p has
# value ((p*131 + i*37) % 4001) - 2000
def audio_fingerprint_groups(spark: SparkSession, sf: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from spider_go_spark.functions.media import decode_wav_samples, encode_wav

    def gen_fp(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        i = np.arange(AFP_SAMPLES, dtype=np.int64)
        src = lambda p: ((p * 131 + i * 37) % 4001) - 2000
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                payload = encode_wav(8000, src(d % AFP_PATTERNS).astype(np.int16))
                _, samples = decode_wav_samples(payload)
                e = np.abs(samples.astype(np.int64)).reshape(-1, AFP_FRAME).sum(axis=1)
                mean = int(e.sum()) // len(e)
                fp = "".join("1" if int(v) > mean else "0" for v in e.tolist())
                rows.append({"doc_id": d, "fingerprint": fp})
            yield pd.DataFrame(rows)

    hashed = (
        spark.range(AFP_DOCS)
        .repartition(8)
        .mapInPandas(gen_fp, "doc_id bigint, fingerprint string")
    )
    return (
        hashed.groupBy("fingerprint")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("fingerprint")
    )


AUDIO_FP_SQL = f"""
WITH e AS (
  SELECT p, f,
         list_sum(list_transform(range({AFP_FRAME}),
           j -> abs(((p*131 + (f*{AFP_FRAME} + j)*37) % 4001) - 2000))) AS energy
  FROM range({AFP_PATTERNS}) t(p),
       range({AFP_SAMPLES // AFP_FRAME}) s(f)
), means AS (
  SELECT p, sum(energy) // {AFP_SAMPLES // AFP_FRAME} AS mean FROM e GROUP BY p
), bits AS (
  SELECT e.p,
         string_agg(CASE WHEN energy > mean THEN '1' ELSE '0' END, '' ORDER BY f)
           AS fingerprint
  FROM e JOIN means ON e.p = means.p GROUP BY e.p
)
SELECT fingerprint, sum({AFP_DOCS // AFP_PATTERNS})::BIGINT AS n_docs,
       min(p)::BIGINT AS first_doc
FROM bits GROUP BY fingerprint ORDER BY fingerprint
"""


def assemble_text_synth(spark: SparkSession, sf: str) -> DataFrame:
    """Reading-order text assembly through the REAL span renderer
    (functions/spans.assemble_text): text spans joined in offset order with
    media spans replaced by "[IMG]" placeholders — the serialize-to-
    trainable-text step of a multimodal pipeline. Gate output keeps rows
    small: (doc_id, n_chars, text_md5). Map-only HOF projection; the
    oracle rebuilds the same string from documents.text group math."""
    from spider_go_spark.functions.spans import assemble_text

    out = assemble_text(_synth_span_docs(spark, sf))
    return out.select(
        "doc_id",
        F.length("assembled").cast("long").alias("n_chars"),
        F.md5(F.col("assembled").cast("binary")).alias("text_md5"),
    ).orderBy("doc_id")


ASSEMBLE_TEXT_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), grp AS (
  SELECT doc_id,
         list_transform(range(0, (len(tokens) + {GROUP_TOKENS} - 1) // {GROUP_TOKENS}),
            g -> array_to_string(tokens[{GROUP_TOKENS}*g + 1 : {GROUP_TOKENS}*(g+1)], ' ')
                 || CASE WHEN g % {MEDIA_EVERY} = 0 THEN ' [IMG]' ELSE '' END) AS parts
  FROM toks WHERE len(tokens) > 0
), asm AS (
  SELECT doc_id, array_to_string(parts, ' ') AS assembled FROM grp
)
SELECT doc_id, length(assembled)::BIGINT AS n_chars, md5(assembled) AS text_md5
FROM asm ORDER BY doc_id
"""

PACK_BUDGET = 16  # tokens per packed training sample
PACK_MEDIA_TOKENS = 4  # flat embedding-slot cost of one media span


def multimodal_pack_synth(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget packing of interleaved spans through the REAL packer
    (functions/spans.pack_spans): text spans cost their token count, media
    spans a flat 4, and each span lands in sample floor(prefix_cost/16) in
    reading order. The Spark side computes prefix costs with an in-array
    fold (no window, no per-doc shuffle); the oracle recomputes them with a
    SQL window over the synthesized span units — two independent routes to
    the same packing."""
    from spider_go_spark.functions.spans import pack_spans

    return pack_spans(
        _synth_span_docs(spark, sf),
        budget=PACK_BUDGET,
        media_tokens=PACK_MEDIA_TOKENS,
    ).orderBy("doc_id", "sample_id")


MULTIMODAL_PACK_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), gs AS (
  SELECT doc_id, len(tokens) AS n,
         unnest(range(0, (len(tokens) + {GROUP_TOKENS} - 1) // {GROUP_TOKENS})) AS g
  FROM toks WHERE len(tokens) > 0
), units AS (
  SELECT doc_id, 2*g AS ord, 'text' AS kind,
         least({GROUP_TOKENS}, n - g*{GROUP_TOKENS})::BIGINT AS cost
  FROM gs
  UNION ALL
  SELECT doc_id, 2*g + 1 AS ord, 'image' AS kind, {PACK_MEDIA_TOKENS}::BIGINT AS cost
  FROM gs WHERE g % {MEDIA_EVERY} = 0
), cum AS (
  SELECT doc_id, kind, cost,
         coalesce(sum(cost) OVER (PARTITION BY doc_id ORDER BY ord
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cost_before
  FROM units
)
SELECT doc_id,
       (cost_before // {PACK_BUDGET})::BIGINT AS sample_id,
       sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END)::BIGINT AS n_text_spans,
       sum(CASE WHEN kind <> 'text' THEN 1 ELSE 0 END)::BIGINT AS n_media_spans,
       sum(cost)::BIGINT AS n_tokens
FROM cum
GROUP BY doc_id, cost_before // {PACK_BUDGET}
ORDER BY doc_id, sample_id
"""


WAV_TRIM_DOCS = 400
WAV_FRAME = 16
WAV_TRIM_DDL = (
    "doc_id bigint, n_frames bigint, n_silent bigint, lead_silent bigint,"
    " total_abs bigint"
)


def wav_silence_trim(spark: SparkSession, sf: str) -> DataFrame:
    """Silence-trim profile through the REAL audio path: each doc's PCM WAV
    is synthesized with a frame-aligned silent lead-in ((doc%5)·16 zero
    samples) followed by a deterministic signal, encoded to real RIFF
    bytes, decoded byte-for-byte (functions/media.decode_wav_samples) and
    framed into 16-sample windows (functions/media.wav_frame_profile). The
    gate reports (n_frames, n_silent, lead_silent, total_abs) per doc —
    the drop-lead-in / reject-mostly-silent step of an audio pipeline.
    The oracle recomputes the frame energies from the SAME sample rule in
    SQL, so any encode, chunk-walk, decode, or framing bug breaks parity.

    Scale shape: one Arrow map stage over doc ids (the decode+frame is the
    honest per-payload CPU); no shuffle at all."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from spider_go_spark.functions.media import encode_wav, wav_frame_profile

    def gen_and_profile(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                n = 200 + d % 31
                p = (d % 5) * WAV_FRAME
                i = np.arange(n, dtype=np.int64)
                sig = ((d * 131 + i * 97) % 4001) - 2000
                samples = np.where(i < p, 0, sig)
                stats = wav_frame_profile(
                    encode_wav(16000, samples), frame=WAV_FRAME
                )
                rows.append({"doc_id": d, **stats})
            yield pd.DataFrame(rows)

    from pyspark.sql import types as T_

    return spark.range(WAV_TRIM_DOCS).repartition(8).mapInPandas(
        gen_and_profile, T_._parse_datatype_string(WAV_TRIM_DDL)
    )


# per-frame energies from the same sample rule; lead_silent = number of
# prefix frames whose cumulative energy is still zero.
WAV_TRIM_SQL = f"""
WITH fe AS (
  SELECT r AS doc_id,
         list_transform(range(0, (200 + r % 31 + {WAV_FRAME - 1}) // {WAV_FRAME}),
            g -> list_sum(list_transform(
                   range(g*{WAV_FRAME}, least(g*{WAV_FRAME} + {WAV_FRAME}, 200 + r % 31)),
                   i -> CASE WHEN i < (r % 5) * {WAV_FRAME} THEN 0
                             ELSE abs((r*131 + i*97) % 4001 - 2000) END))) AS fes
  FROM range({WAV_TRIM_DOCS}) t(r)
)
SELECT doc_id,
       len(fes)::BIGINT AS n_frames,
       len(list_filter(fes, x -> x = 0))::BIGINT AS n_silent,
       len(list_filter(range(1, len(fes) + 1),
           k -> list_sum(fes[1:k]) = 0))::BIGINT AS lead_silent,
       list_sum(fes)::BIGINT AS total_abs
FROM fe
"""


VID_DOCS = 300
VID_SAMPLE_EVERY = 2
VID_DDL = (
    "doc_id bigint, n_frames bigint, n_sampled bigint, sum_r bigint,"
    " sum_g bigint, sum_b bigint"
)


def video_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Video frame-sampling through the REAL container+image path: each doc
    gets an SGV1 container (functions/media.encode_video — an MJPEG-style
    still-frame index; honest toy container, real codecs stay behind the
    hook) of 4–8 real 24-bit BMP frames, the sampler walks the index, takes
    every 2nd frame and decodes its pixels byte-for-byte
    (functions/media.video_sample_stats → decode_bmp_pixels), reporting
    integer channel sums over the sampled frames — the frame-sample +
    feature-extract step of a video training pipeline. The oracle
    recomputes the sums from the same pixel rule in SQL, so container
    index, frame slicing, BMP decode, and sampling stride are all under
    the parity gate.

    Scale shape: one Arrow map stage over doc ids; no shuffle."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from spider_go_spark.functions.media import encode_bmp, encode_video, video_sample_stats

    def gen_and_sample(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                frames = []
                for f in range(4 + d % 5):
                    w, h = 3 + (d + f) % 6, 2 + (d + f) % 3
                    j = np.arange(w * h * 3, dtype=np.int64)
                    frames.append(
                        encode_bmp(w, h, ((d * 17 + f * 29 + j * 11) % 256).astype(np.uint8))
                    )
                stats = video_sample_stats(encode_video(frames), every=VID_SAMPLE_EVERY)
                rows.append({"doc_id": d, **stats})
            yield pd.DataFrame(rows)

    from pyspark.sql import types as T_

    return spark.range(VID_DOCS).repartition(8).mapInPandas(
        gen_and_sample, T_._parse_datatype_string(VID_DDL)
    )


def _vid_channel_sql(c: int) -> str:
    return (
        f"list_sum(list_transform(range(0, 4 + r % 5, {VID_SAMPLE_EVERY}), f ->"
        f" list_sum(list_transform(range((3 + (r+f) % 6) * (2 + (r+f) % 3)),"
        f" p -> (r*17 + f*29 + (p*3 + {c})*11) % 256))))::BIGINT"
    )


VIDEO_FRAME_SAMPLE_SQL = f"""
SELECT r AS doc_id,
       (4 + r % 5)::BIGINT AS n_frames,
       len(range(0, 4 + r % 5, {VID_SAMPLE_EVERY}))::BIGINT AS n_sampled,
       {_vid_channel_sql(0)} AS sum_r,
       {_vid_channel_sql(1)} AS sum_g,
       {_vid_channel_sql(2)} AS sum_b
FROM range({VID_DOCS}) t(r)
"""


QUERIES = {
    "media_features": media_features,
    "media_features_plumbing": media_features_plumbing,
    "wav_silence_trim": wav_silence_trim,
    "video_frame_sample": video_frame_sample,
    "caption_pairs_synth": caption_pairs_synth,
    "span_stats_synth": span_stats_synth,
    "span_transitions_synth": span_transitions_synth,
    "media_ppm_decode": media_ppm_decode,
    "media_bmp_decode": media_bmp_decode,
    "media_png_decode": media_png_decode,
    "media_jpeg_decode": media_jpeg_decode,
    "media_adpcm_decode": media_adpcm_decode,
    "media_jpeg420_decode": media_jpeg420_decode,
    "media_avi_decode": media_avi_decode,
    "media_jpeg_gray_decode": media_jpeg_gray_decode,
    "media_wav_decode": media_wav_decode,
    "image_ahash_groups": image_ahash_groups,
    "image_phash_groups": image_phash_groups,
    "image_resize_stats": image_resize_stats,
    "audio_fingerprint_groups": audio_fingerprint_groups,
    "assemble_text_synth": assemble_text_synth,
    "multimodal_pack_synth": multimodal_pack_synth,
}
ORACLES = {
    "media_features": MEDIA_FEATURES_SQL,
    "media_features_plumbing": MEDIA_FEATURES_PLUMBING_SQL,
    "wav_silence_trim": WAV_TRIM_SQL,
    "video_frame_sample": VIDEO_FRAME_SAMPLE_SQL,
    "caption_pairs_synth": CAPTION_PAIRS_SQL,
    "span_stats_synth": SPAN_STATS_SQL,
    "span_transitions_synth": SPAN_TRANSITIONS_SQL,
    "media_ppm_decode": MEDIA_PPM_SQL,
    "media_bmp_decode": MEDIA_BMP_SQL,
    "media_png_decode": MEDIA_PNG_SQL,
    "media_jpeg_decode": MEDIA_JPEG_SQL,
    "media_adpcm_decode": MEDIA_ADPCM_SQL,
    "media_jpeg420_decode": MEDIA_JPEG420_SQL,
    "media_avi_decode": MEDIA_AVI_SQL,
    "media_jpeg_gray_decode": MEDIA_JPEG_GRAY_SQL,
    "media_wav_decode": MEDIA_WAV_SQL,
    "image_ahash_groups": MEDIA_AHASH_SQL,
    "image_phash_groups": MEDIA_PHASH_SQL,
    "image_resize_stats": IMAGE_RESIZE_SQL,
    "audio_fingerprint_groups": AUDIO_FP_SQL,
    "assemble_text_synth": ASSEMBLE_TEXT_SQL,
    "multimodal_pack_synth": MULTIMODAL_PACK_SQL,
}
