"""Similarity-search queries (BASELINE.json scale extensions) —
brute-force cosine top-k + LSH-bucketed ANN over the embeddings table.

Filled in incrementally; see operators/similarity.py.
"""

from __future__ import annotations
