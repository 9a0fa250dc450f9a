"""Cluster refinement (SURVEY.md §2.8 M3/M4/M6/M7/M11, §2.7 J2):
coherence-gated adaptive LDA splitting, renumbering, and
centroid-similarity merging — the reference's
``optimize_clusters_with_coherence`` pipeline
(``02_build_models_with_auto_lables._optimised_clusters.R:831-911``;
``split_clusters_with_lda_adaptive`` at ``02_build_models.R:487-564``)
re-expressed as pure DataFrame state transitions.

State is never mutated: each step maps
``assignments(doc_id, cluster_id)`` → new assignments. The driver-side
loop over split candidates is inherent (the reference's too); each
candidate's LDA fit is an MLlib job over only that cluster's rows.
Candidate sets are small by construction (guards P6: ≥ min_docs, low
coherence) so the loop is bounded; everything inside stays distributed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.ml.clustering import LDA
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .centroids import centroid_cosine_pairs, group_centroids, merge_components
from .coherence import binary_doc_term, prob_coherence
from .tfidf import cluster_term_scores


@dataclass
class RefineConfig:
    """Defaults mirror the reference's optimized pipeline
    (02_build_models_with_auto_lables._optimised_clusters.R:905-911):
    threshold 0.05, k_range 2:6, merge 0.9, min 10 docs, top 30 terms;
    LDA iters 200 search / 500 final (02_build_models.R:520,550)."""

    coherence_threshold: float = 0.05
    k_range: tuple[int, ...] = (2, 3, 4, 5, 6)
    min_docs: int = 10
    merge_threshold: float = 0.9
    top_m: int = 5
    seed: int = 1234
    lda_search_iter: int = 20
    lda_final_iter: int = 50
    max_rounds: int = 1
    # scale guard beyond the reference: bound the per-round split fan-out
    # (lowest-coherence clusters first); None = split every candidate.
    max_split_clusters: int | None = None


def renumber_clusters(assignments: DataFrame) -> DataFrame:
    """J2 — renumber_clusters (02_build_models.R:380-389): compact ids to
    1..K by dense_rank over the old id (order-preserving, deterministic)."""
    w = Window.orderBy("cluster_id")
    ids = assignments.select("cluster_id").distinct().select(
        "cluster_id", F.dense_rank().over(w).alias("new_id")
    )
    return (
        assignments.join(F.broadcast(ids), "cluster_id")
        .select("doc_id", F.col("new_id").alias("cluster_id"))
    )


def cluster_coherence(
    tfidf: DataFrame,
    assignments: DataFrame,
    n_docs: int,
    top_m: int = 5,
    binary: DataFrame | None = None,
) -> DataFrame:
    """A5 — per-cluster mean probabilistic coherence over the cluster's
    top-M terms (02_build_models.R:346-348,837-838).
    Returns (cluster_id, coherence). Pass a cached ``binary`` when calling
    in a loop — rebuilding it re-runs the whole tokenize lineage."""
    topterms = cluster_term_scores(tfidf, assignments, top_n=top_m).select(
        "cluster_id", "term", "rank"
    )
    if binary is None:
        binary = binary_doc_term(tfidf.select("doc_id", "term"))
    return prob_coherence(binary, topterms, n_docs)


def lda_topic_assignments(tf_vectors: DataFrame, k: int, seed: int, max_iter: int) -> DataFrame:
    """M3+M4+A8 — fit LDA(k) on a (doc_id, tf) count-vector frame and
    return (doc_id, topic) by argmax of the topic distribution
    (apply(theta, 1, which.max), 02_build_models.R:363)."""
    lda = LDA(k=k, seed=seed, maxIter=max_iter, featuresCol="tf", optimizer="em")
    model = lda.fit(tf_vectors)
    dist = model.transform(tf_vectors).select(
        "doc_id", vector_to_array(F.col("topicDistribution")).alias("theta")
    )
    # argmax with lowest-index tie-break (R which.max semantics)
    return dist.select(
        "doc_id",
        (F.expr("array_position(theta, array_max(theta))") - 1).cast("int").alias("topic"),
    )


def split_low_coherence_clusters(
    tf_vectors: DataFrame,
    tfidf: DataFrame,
    assignments: DataFrame,
    n_docs: int,
    cfg: RefineConfig,
) -> tuple[DataFrame, list[int]]:
    """M6 — split_clusters_with_lda_adaptive (02_build_models.R:487-564):
    for each cluster with coherence < threshold and ≥ min_docs, search
    k ∈ k_range for the best mean topic coherence (cheap-probe iters),
    refit at the winner (final iters), and mint new cluster ids above the
    current max (A9). Returns (new_assignments, split_cluster_ids)."""
    binary = binary_doc_term(tfidf.select("doc_id", "term")).cache()
    coh = cluster_coherence(tfidf, assignments, n_docs, cfg.top_m, binary=binary)
    sizes = assignments.groupBy("cluster_id").agg(F.count("*").alias("size"))
    cand_df = (
        coh.join(sizes, "cluster_id")
        .where((F.col("coherence") < cfg.coherence_threshold) & (F.col("size") >= cfg.min_docs))
        .orderBy(F.asc("coherence"), F.asc("cluster_id"))
        .select("cluster_id")
    )
    if cfg.max_split_clusters is not None:
        cand_df = cand_df.limit(cfg.max_split_clusters)
    candidates = [int(r["cluster_id"]) for r in cand_df.collect()]
    if not candidates:
        binary.unpersist()
        return assignments, []
    max_id = assignments.agg(F.max("cluster_id")).first()[0]
    out = assignments
    next_id = int(max_id)
    for cid in sorted(candidates):
        members = assignments.where(F.col("cluster_id") == cid).select("doc_id")
        sub = tf_vectors.join(members, "doc_id").cache()
        n_sub = sub.count()
        if n_sub < cfg.min_docs:
            sub.unpersist()
            continue
        ks = [k for k in cfg.k_range if k < n_sub]
        best_k, best_score = None, None
        if len(ks) == 1:
            best_k = ks[0]  # no search needed — skip the probe fits
        else:
            for k in ks:
                probe = lda_topic_assignments(sub, k, cfg.seed, cfg.lda_search_iter)
                probe_assign = probe.select("doc_id", F.col("topic").alias("cluster_id"))
                probe_coh = cluster_coherence(
                    tfidf.join(members, "doc_id"), probe_assign, n_docs, cfg.top_m, binary=binary
                )
                score_row = probe_coh.agg(F.avg("coherence")).first()
                score = score_row[0] if score_row and score_row[0] is not None else float("-inf")
                if best_score is None or score > best_score:
                    best_k, best_score = k, score
        if best_k is None:
            sub.unpersist()
            continue
        final = lda_topic_assignments(sub, best_k, cfg.seed, cfg.lda_final_iter)
        minted = final.select(
            "doc_id", (F.lit(next_id) + F.col("topic") + 1).alias("cluster_id")
        )
        next_id += best_k
        out = out.join(minted.select("doc_id"), "doc_id", "left_anti").unionByName(minted)
        sub.unpersist()
    binary.unpersist()
    return out, sorted(candidates)


def merge_similar_clusters(
    tfidf: DataFrame, assignments: DataFrame, threshold: float
) -> DataFrame:
    """M7 — centroid-cosine merge (02_opt:861-879) on the long-format
    term centroids: mean TF-IDF per (cluster, term), pairwise cosine,
    transitive merge above threshold, relabel via broadcast map (J1)."""
    expl = (
        tfidf.join(assignments, "doc_id")
        .select(F.col("cluster_id").alias("grp"), F.col("doc_id").alias("vid"),
                F.col("term").alias("idx"), F.col("weight").alias("val"))
    )
    sizes = assignments.groupBy("cluster_id").agg(F.count("*").alias("n"))
    # colMeans over the cluster INCLUDING implicit zeros: sum/size, not avg
    sums = expl.groupBy("grp", "idx").agg(F.sum("val").alias("s"))
    cents = (
        sums.join(sizes.select(F.col("cluster_id").alias("grp"), "n"), "grp")
        .select("grp", "idx", (F.col("s") / F.col("n")).alias("centroid"))
    )
    pairs = centroid_cosine_pairs(cents)
    mapping = merge_components(pairs, threshold)
    return (
        assignments.join(
            F.broadcast(mapping.select(F.col("grp").alias("cluster_id"), "new_grp")),
            "cluster_id",
            "left",
        )
        .select("doc_id", F.coalesce("new_grp", "cluster_id").alias("cluster_id"))
    )


def refine(
    tf_vectors: DataFrame,
    tfidf: DataFrame,
    assignments: DataFrame,
    cfg: RefineConfig | None = None,
) -> DataFrame:
    """M11 — optimize_clusters_with_coherence (02_opt:831-911):
    split low-coherence clusters → renumber → merge similar → renumber.
    Each round checkpoints lineage via localCheckpoint (the reference's
    eager materialization, kept deliberately: iterative loops otherwise
    accumulate unbounded plan depth)."""
    cfg = cfg or RefineConfig()
    tfidf = tfidf.cache()
    tf_vectors = tf_vectors.cache()
    n_docs = tfidf.select("doc_id").distinct().count()
    out = assignments
    for _ in range(cfg.max_rounds):
        out, split_ids = split_low_coherence_clusters(tf_vectors, tfidf, out, n_docs, cfg)
        # checkpoint BEFORE merge: the split output carries LDA-transform
        # lineage that merge's aggregations would otherwise re-execute per
        # downstream job.
        out = renumber_clusters(out).localCheckpoint(eager=True)
        out = merge_similar_clusters(tfidf, out, cfg.merge_threshold)
        out = renumber_clusters(out).localCheckpoint(eager=True)
        if not split_ids:
            break
    return out
