"""Multimodal plumbing query: binary media columns through the
Arrow-batched mapInPandas feature extractor (deterministic fake decode —
md5-derived stats), value-checked against the DuckDB restatement. The
real codec swaps in behind operators/multimodal.decode_image without
touching this plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io.sources import load_table
from ..operators.multimodal import documents_as_media, extract_media_features
from .registry import query


@query(
    "mm1_media_features",
    oracle="""
    SELECT doc_id AS media_id,
           'text' AS modality,
           octet_length(encode(text)) AS n_bytes,
           ('0x'||substr(md5(text), 1, 15))::BIGINT AS h0,
           ('0x'||substr(md5(text), 16, 15))::BIGINT AS h1,
           (('0x'||substr(md5(text), 1, 15))::BIGINT % 1000) / 1000.0 AS feat0,
           (('0x'||substr(md5(text), 16, 15))::BIGINT % 1000) / 1000.0 AS feat1
    FROM documents WHERE text IS NOT NULL
    """,
)
def mm1_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return extract_media_features(media)
