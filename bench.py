"""Benchmark harness (driver contract): runs the engine's headline queries
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline set covers every engine family: heavy aggregation, star-join,
n-gram TF-IDF, vocabulary ranking, cluster term scores, MinHash-LSH dedup,
ANN top-k, sessionization, quality scoring, and the KMeans flagship.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "h1_lineitem_pricing_summary",
    "h2_revenue_per_nation",
    "v1_tfidf_ngram",
    "v4_vocab_top2000",
    "c1_cluster_term_scores",
    "d4_minhash_dedup",
    "n1_ann_brute_topk",
    "w2_sessionization",
    "x2_quality_scores",
    "m2_kmeans_cluster_sizes",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from ml_training_data_pipeline_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)
    spark = get_spark("bench", shuffle_partitions=int(cpus))
    from ml_training_data_pipeline_spark.plans import registry

    registry._load_all()

    # warm the JVM/codegen path so the numbers measure the queries, not
    # first-compile overhead (a real deployment is long-running)
    spark.range(1000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()  # full materialization, no driver transfer cost
        times[name] = round(time.time() - t0, 3)
        print(f"# {name}: {times[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
