"""Cluster-analytics queries (SURVEY.md §2.5-2.8: centroid aggregates,
coherence statistics, centroid-similarity merge candidates) using a
deterministic cluster proxy (embeddings.label) so they stay
oracle-checkable; the estimator-backed variants are in queries_ml.py.
"""

from __future__ import annotations
