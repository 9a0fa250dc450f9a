"""Similarity-search queries over the embeddings table (64-dim float
vectors). Cosine values are cross-engine exact: double-cast arrays,
index-order dot product (Spark ``aggregate(zip_with(...))`` ≡ DuckDB
``list_inner_product`` on DOUBLE[]), rounded to 6.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_table
from ..operators.similarity import (
    brute_force_topk,
    embedding_near_dups,
    ivf_topk,
    lsh_topk,
    srp_buckets,
)
from .registry import query

# Fixed SRP hyperplanes (seeded, 4 planes × 64 dims) — inlined as literals
# on both engines so bucket ids agree exactly.
_rng = random.Random(42)
SRP_PLANES: list[list[float]] = [
    [_rng.uniform(-1.0, 1.0) for _ in range(64)] for _ in range(4)
]


def _plane_sql(p: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in p) + "]"


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN list_inner_product(ve, {_plane_sql(p)}) > 0 THEN {1 << i} ELSE 0 END)"
    for i, p in enumerate(SRP_PLANES)
)

_V = "v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings)"


# --- N1: brute-force cosine top-k ---------------------------------------------
# Queries = vec_id < 10 probe batch; exact top-5 over the whole corpus.
@query(
    "n1_ann_brute_topk",
    oracle=f"""
    WITH {_V},
    q AS (SELECT vec_id AS query_id, ve AS qve FROM v WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             round(list_inner_product(v.ve, q.qve)
                   / (sqrt(list_inner_product(v.ve, v.ve)) * sqrt(list_inner_product(q.qve, q.qve))), 6) AS cos_sim
      FROM v CROSS JOIN q WHERE v.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def n1_ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


# --- N2: signed-random-projection buckets ---------------------------------------
@query(
    "n2_srp_buckets",
    oracle=f"""
    WITH {_V}
    SELECT vec_id, CAST({_BUCKET_SQL} AS BIGINT) AS bucket FROM v
    """,
)
def n2_srp_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return srp_buckets(emb, SRP_PLANES).select("vec_id", "bucket")


# --- N3: LSH-bucketed ANN top-k --------------------------------------------------
@query(
    "n3_ann_lsh_topk",
    oracle=f"""
    WITH {_V},
    bv AS (SELECT vec_id, ve, CAST({_BUCKET_SQL} AS BIGINT) AS bucket FROM v),
    q AS (SELECT vec_id AS query_id, ve AS qve, bucket FROM bv WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, bv.vec_id AS neighbor_id,
             round(list_inner_product(bv.ve, q.qve)
                   / (sqrt(list_inner_product(bv.ve, bv.ve)) * sqrt(list_inner_product(q.qve, q.qve))), 6) AS cos_sim
      FROM bv JOIN q ON bv.bucket = q.bucket
      WHERE bv.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def n3_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(emb, emb.where(F.col("vec_id") < 10), SRP_PLANES, k=5)


# --- N4: embedding near-duplicates (blocked pairwise cosine) ---------------------
@query(
    "n4_embedding_near_dups",
    oracle=f"""
    WITH {_V}
    SELECT vec_a, vec_b, cos_sim FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(list_inner_product(a.ve, b.ve)
                   / (sqrt(list_inner_product(a.ve, a.ve)) * sqrt(list_inner_product(b.ve, b.ve))), 6) AS cos_sim
      FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    ) WHERE cos_sim >= 0.35
    """,
)
def n4_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dups(emb, threshold=0.35, block_col="label")


# --- N5: IVF ANN top-k (coarse-quantizer inverted file) --------------------------
# The second scale path SURVEY names beside SRP-LSH: KMeans cells as the
# inverted file, nprobe nearest cells probed per query, exact cosine only
# within them. Estimator-backed (cell centers aren't SQL-expressible) →
# rows-only driver check; recall/exactness invariants live in
# tests/test_similarity_ivf.py (nprobe=nlist ≡ brute force).
@query("n5_ann_ivf_topk")
def n5_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, emb.where(F.col("vec_id") < 10), nlist=16, nprobe=4, k=5, seed=123
    )
