"""Multimodal queries: binary-payload feature extraction with a value-exact
SQL oracle.

The payload is the UTF-8 encoding of ``documents.text`` (the corpus is the
only driver-provided content), pushed through the full binary-column +
``mapInPandas`` pipeline of :mod:`spider_go_spark.functions.media`. Because
the (fake) decoder's features are arithmetic on byte length and the digest
is md5, every output cell is reproducible in SQL — the plumbing is what's
being verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_go_spark.functions.media import extract_media_features
from spider_go_spark.queries import T


def media_features(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return extract_media_features(d)


# media_kind by doc_id % 3; width/height/frame_count arithmetic on n_bytes
# (text is ASCII → n_bytes = length(text)); digest = md5(text).
MEDIA_FEATURES_SQL = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_kind,
       length(text)::BIGINT AS n_bytes,
       md5(text) AS digest,
       CASE WHEN doc_id % 3 = 1 THEN NULL ELSE ((length(text)::BIGINT * 7) % 1024)::INTEGER END AS width,
       CASE WHEN doc_id % 3 = 1 THEN NULL ELSE ((length(text)::BIGINT * 13) % 768)::INTEGER END AS height,
       CASE WHEN doc_id % 3 = 2 THEN ((length(text)::BIGINT % 120) + 1)::INTEGER ELSE NULL END AS frame_count
FROM documents
"""


QUERIES = {"media_features": media_features}
ORACLES = {"media_features": MEDIA_FEATURES_SQL}
