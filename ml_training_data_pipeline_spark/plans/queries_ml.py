"""Estimator-backed (🔶) queries: K-means fit/predict, LDA split, the
refine pipeline, mocked-LLM enrichment. Rows-only driver checks (no
oracle SQL) with deterministic seeds; invariants are tested in tests/.
"""

from __future__ import annotations
