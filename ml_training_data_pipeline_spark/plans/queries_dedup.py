"""Deduplication queries (BASELINE.json scale extensions) — exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding near-dup.

Filled in incrementally; see operators/dedup.py.
"""

from __future__ import annotations
