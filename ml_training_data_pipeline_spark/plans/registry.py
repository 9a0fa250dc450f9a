"""Named-query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers here as a named
query ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` re-exports this
registry verbatim.

Determinism rules (so the order-insensitive value-hash matches):
- every float column is ``round(x, 6)`` (or decimal-summed then cast) on
  BOTH sides;
- every top-k uses ``row_number`` with a total order (explicit tie-break);
- column aliases are identical on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a named query; ``oracle=None`` marks a non-SQL-expressible
    operator (driver falls back to a rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# Importing the query modules populates the registry.
def _load_all() -> None:
    from . import queries_relational  # noqa: F401
    from . import queries_text  # noqa: F401
    from . import queries_dedup  # noqa: F401
    from . import queries_similarity  # noqa: F401
    from . import queries_events  # noqa: F401
    from . import queries_cluster  # noqa: F401
    from . import queries_ml  # noqa: F401
    from . import queries_llm  # noqa: F401
    from . import queries_stream  # noqa: F401
    from . import queries_multimodal  # noqa: F401
    from . import queries_misc  # noqa: F401
