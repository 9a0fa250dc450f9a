"""Round-5 additions: connected-components closure (the dedup grouping
step) and the banded-SimHash completeness guarantee on a crafted pair."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_training_data_pipeline_spark.operators.dedup import (
    connected_components,
    simhash_banded_near_dups,
)


def test_components_transitive_chain(spark):
    # chain 1-2-3-4 (diameter 3 — forces >1 propagation round) plus an
    # isolated pair 10-11: labels must collapse to the component minimum.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], schema="doc_a long, doc_b long"
    )
    out = {r["doc_id"]: r["component_id"] for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_components_converge_regardless_of_edge_direction(spark):
    # same component however the pair was oriented by the a<b convention
    edges = spark.createDataFrame(
        [(5, 1), (2, 5), (3, 2)], schema="doc_a long, doc_b long"
    )
    out = {r["doc_id"]: r["component_id"] for r in connected_components(edges).collect()}
    assert set(out.values()) == {1}


def test_banded_simhash_catches_high_bit_diff(spark):
    # two signatures differing ONLY in the top bit: single high-byte
    # bucketing (d6's shape) separates them; multi-band bucketing must
    # still pair them because they agree on 3 of 4 bands.
    a = 0b1 << 59 | 0b1010
    b = 0b1010
    sim = spark.createDataFrame([(1, a), (2, b)], schema="doc_id long, simhash long")
    out = simhash_banded_near_dups(sim, max_hamming=3, bands=4, bits=60).collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in out] == [(1, 2, 1)]
