"""PySpark-native analytics engine for ML training-data pipelines.

A brand-new, idiomatic PySpark re-expression of the capabilities of
``maraqa1/ml-training-data-pipeline`` (an R dataflow pipeline that enriches
documents with LLM features, builds n-gram TF-IDF, clusters with K-means,
refines clusters with coherence-gated LDA splitting + cosine merging, and
labels clusters — see SURVEY.md).

Design stance (SURVEY.md §7):

- Everything is a DataFrame keyed by ``doc_id`` — no positional alignment.
- The document-feature matrix lives in two forms: a ``SparseVector`` column
  (for MLlib estimators) and an exploded long format
  ``(doc_id, term, weight)`` (for term analytics, coherence, and oracle SQL).
- Declarative plans: built-in ``pyspark.sql.functions`` everywhere; Pandas
  UDFs only where semantics genuinely require Python (LLM transport, POS
  tagging, multimodal decode).
- Every operator is designed for a 1000-executor / 100 TB deployment even
  though tests run on ``local[*]``: broadcast the small side, partial
  aggregation before shuffles, no driver-side collect loops on big tables.
"""

__version__ = "0.1.0"

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
