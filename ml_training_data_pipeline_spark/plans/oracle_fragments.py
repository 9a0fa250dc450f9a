"""Shared DuckDB SQL fragments that restate the engine's canonical
contracts (tokenizer, TF-IDF formula, stopword list) — single source of
truth for every text-family oracle query.

These must mirror ``functions/text.py`` exactly:
    lower → strip non-[a-z0-9 space] → collapse ws → split(' ') → drop ''
    weight = tf * ln(N / df), round 6
"""

from __future__ import annotations

from ..functions.text import ALL_STOPWORDS

# token-array expression over a text column (DuckDB)
# NB: RE2's \s is [\t\n\f\r ] while Java's \s adds \x0B (vertical tab),
# so every oracle whitespace class spells \s\x0b to match the Spark side
# exactly (pinned by tests/test_properties.py tokenizer-contract test).
TOKS_EXPR = (
    r"list_filter(string_split(trim(regexp_replace(regexp_replace(lower({col}),"
    r" '[^a-z0-9\s\x0b]', '', 'g'), '[\s\x0b]+', ' ', 'g')), ' '), x -> x <> '')"
)


def toks_cte(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    """CTE `toks(doc_id, toks)` — canonical token arrays."""
    expr = TOKS_EXPR.format(col=text_col)
    return f"""
    toks AS (
      SELECT {id_col} AS doc_id, {expr} AS toks
      FROM {table}
      WHERE {text_col} IS NOT NULL
    )"""


def unigram_cte() -> str:
    """CTE `tok(doc_id, term)` — exploded unigrams (requires toks CTE)."""
    return """
    tok AS (
      SELECT doc_id, unnest(toks) AS term FROM toks WHERE len(toks) > 0
    )"""


def ngram_cte(max_n: int = 3) -> str:
    """CTE `tok(doc_id, term)` — 1..max_n-grams via list comprehension
    (requires toks CTE). Mirrors functions/text.py ngrams_up_to."""
    parts = ["toks"]
    for n in range(2, max_n + 1):
        joined = "||' '||".join(f"toks[i+{j}]" if j else "toks[i]" for j in range(n))
        parts.append(f"[{joined} for i in range(1, len(toks) - {n - 2})]")
    concat = " || ".join(parts)
    return f"""
    tok AS (
      SELECT doc_id, unnest({concat}) AS term
      FROM toks WHERE len(toks) > 0
    )"""


def tfidf_cte() -> str:
    """CTEs `counts`, `dft`, `n`, `tfidf(doc_id, term, tf, weight)` —
    requires a `tok(doc_id, term)` CTE upstream."""
    return """
    counts AS (
      SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    dft AS (SELECT term, count(*) AS df FROM counts GROUP BY term),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM counts),
    tfidf AS (
      SELECT c.doc_id, c.term, c.tf,
             round(c.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 6) AS weight
      FROM counts c JOIN dft d USING (term) CROSS JOIN n
    )"""


def stopword_list_sql() -> str:
    """The engine's stopword list as a SQL array literal."""
    inner = ", ".join(f"'{w}'" for w in ALL_STOPWORDS)
    return f"[{inner}]"
