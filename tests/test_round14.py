"""Round-14 regression pins: the d24 exact-substring SCRUB transform
(VERDICT r13 #2 — cur6's byte-exact reassembly discipline at d22's span
grain), the d25 quality-survivor cascade (VERDICT r13 #5 — d23's
exact-first ordering composed with cur2's keep-the-best-copy policy),
and their consistency with the parents they extend.

The planted-truth style follows tests/test_round13.py: tiny corpora
written to parquet with a known duplication structure, so the expected
ledger (and the expected scrubbed BYTES, via md5) is computable by hand
— the engine must reproduce it exactly, not just plausibly.
"""

from __future__ import annotations

import hashlib
import os

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR


def _write_documents(tmpdir: str, texts: list[str]) -> str:
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": range(1, len(texts) + 1),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["planted"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(os.path.join(tmpdir, "documents.parquet"), index=False)
    return tmpdir


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# --- d24: the scrub is byte-exact against a planted truth -----------------------


def test_d24_planted_span_scrubbed_byte_exact(spark, tmp_path_factory):
    """Two docs share one 12-token span; the keeper (min doc_id) must come
    through untouched and the other doc must lose EXACTLY the span — the
    md5 fingerprints prove the reassembled bytes, not just the counts."""
    span = " ".join(f"shared{i:03d}" for i in range(12))
    a_pre = " ".join(f"apre{i:03d}" for i in range(10))
    a_post = " ".join(f"apost{i:03d}" for i in range(10))
    b_pre = " ".join(f"bpre{i:03d}" for i in range(7))
    b_post = " ".join(f"bpost{i:03d}" for i in range(12))
    a = f"{a_pre} {span} {a_post}"
    b = f"{b_pre} {span} {b_post}"
    d = _write_documents(str(tmp_path_factory.mktemp("scrub")), [a, b])
    pdf = (
        entry_mod.queries()["d24_span_scrub"](spark, d)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(pdf.index) == [1, 2]
    # keeper: nothing removed, fingerprint of the ORIGINAL token stream
    assert pdf.loc[1, "tokens_removed"] == 0
    assert pdf.loc[1, "tokens_kept"] == 32
    assert pdf.loc[1, "scrubbed_fp"] == _md5(a)
    # non-keeper: exactly the span excised, byte-exact reassembly
    assert pdf.loc[2, "tokens_removed"] == 12
    assert pdf.loc[2, "tokens_kept"] == 19
    assert pdf.loc[2, "scrubbed_fp"] == _md5(f"{b_pre} {b_post}")


def test_d24_three_way_span_keeps_first_only(spark, tmp_path_factory):
    span = " ".join(f"common{i:03d}" for i in range(9))
    fill = lambda p, n: " ".join(f"{p}{i:03d}" for i in range(n))  # noqa: E731
    docs = [
        f"{fill('x', 8)} {span}",
        f"{fill('y', 8)} {span}",
        f"{span} {fill('z', 8)}",
    ]
    d = _write_documents(str(tmp_path_factory.mktemp("scrub3")), docs)
    pdf = (
        entry_mod.queries()["d24_span_scrub"](spark, d)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert pdf["tokens_removed"].tolist() == [0, 9, 9]
    assert pdf.loc[2, "scrubbed_fp"] == _md5(fill("y", 8))
    assert pdf.loc[3, "scrubbed_fp"] == _md5(fill("z", 8))


def test_d24_intra_doc_repeat_is_kept(spark, tmp_path_factory):
    """A span repeated WITHIN one doc is x9's domain (repetition quality),
    not cross-doc duplication — the scrub must keep it (the duplicated-
    window rule counts DISTINCT docs, exactly as d22 does)."""
    run = " ".join(f"loop{i:03d}" for i in range(8))
    a = f"{run} {run}"
    d = _write_documents(str(tmp_path_factory.mktemp("intra")), [a])
    pdf = entry_mod.queries()["d24_span_scrub"](spark, d).toPandas()
    assert len(pdf) == 1
    assert pdf.iloc[0]["tokens_removed"] == 0
    assert pdf.iloc[0]["scrubbed_fp"] == _md5(a)


def test_d24_consistent_with_d22_report(spark):
    """d24 is the transform d22's report feeds: same doc universe, and a
    doc can never lose more tokens than d22 says are duplicated (the
    keeper's copy of every span is d22-counted but never removed — so
    corpus-wide the scrub strictly undershoots the report when any
    cross-doc duplication exists)."""
    qs = entry_mod.queries()
    d22 = qs["d22_exact_substring_spans"](spark, SF_DIR).toPandas().set_index("doc_id")
    d24 = qs["d24_span_scrub"](spark, SF_DIR).toPandas().set_index("doc_id")
    assert set(d22.index) == set(d24.index)
    j = d22.join(d24, lsuffix="_22")
    assert (j["tokens_removed"] <= j["dup_tokens"]).all()
    assert (j["tokens_removed"] + j["tokens_kept"] == j["n_tokens"]).all()
    # the fixture corpus carries real cross-doc duplication, so the
    # keeper discipline must show as a strict corpus-level gap
    assert j["dup_tokens"].sum() > 0, "fixture corpus should have duplicated spans"
    assert j["tokens_removed"].sum() < j["dup_tokens"].sum()


# --- d25: the quality policy picks the better copy, not the earlier id ----------


def _planted_quality_corpus() -> tuple[list[str], int]:
    """doc1 = near-dup of doc2 with heavy punctuation noise (lower
    quality, EARLIER id), doc2 = the clean twin, doc3 = unrelated and
    also noisy. Tokens are punctuation-insensitive, so doc1/doc2 must
    differ in token content too (else they'd be the same EXACT group
    and quality could never arbitrate): doc1 drops doc2's last token.
    Returns (texts, expected_survivor_doc_id)."""
    words = [
        "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
        "from", "has", "have", "he", "her", "his", "in", "is", "it", "its",
    ]
    clean = " ".join(words)
    noisy_twin = " ".join(words[:19]) + " !!!???!!!???!!!???!!!???"
    other = " ".join(f"zebra{i:02d}" for i in range(8)) + " ###!!!###!!!###!!!###"
    return [noisy_twin, clean, other], 2


def test_d25_planted_higher_quality_twin_survives(spark, tmp_path_factory):
    texts, survivor = _planted_quality_corpus()
    d = _write_documents(str(tmp_path_factory.mktemp("qsurv")), texts)
    pdf = entry_mod.queries()["d25_cascade_quality_survivors"](spark, d).toPandas()
    assert len(pdf) == 1
    r = pdf.iloc[0]
    # no exact dups; docs 1+2 form one near component; doc3 is alone
    assert (r["n_docs"], r["n_exact_dropped"], r["n_near_dropped"], r["n_survivors"]) \
        == (3, 0, 1, 2), dict(r)
    # THE policy pin: the surviving twin is the high-quality LATER id —
    # best_survivor_quality must equal doc2's engine quality score, which
    # is strictly above the noisy earlier-id twin's (min-doc-id policy
    # would have kept doc1 and read the lower value here)
    from pyspark.sql import functions as F

    from ml_training_data_pipeline_spark.functions.analysis import quality_score

    q = {
        row.doc_id: row.q
        for row in spark.createDataFrame(
            [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        .select("doc_id", quality_score(F.col("text")).alias("q"))
        .collect()
    }
    assert q[survivor] > q[1], q
    assert abs(r["best_survivor_quality"] - q[survivor]) < 1e-9, (dict(r), q)


def test_d25_ledger_closes_against_d23(spark):
    """Stage 1 is d23's verbatim (same exact groups, same representative
    set), so per-source n_docs and n_exact_dropped must agree exactly;
    stage 2's component policy drops every non-argmax member, so the
    total near-drop count dominates d23's pairwise rule and the ledger
    still partitions every doc."""
    qs = entry_mod.queries()
    d23 = qs["d23_dedup_cascade"](spark, SF_DIR).toPandas().set_index("source").sort_index()
    d25 = (
        qs["d25_cascade_quality_survivors"](spark, SF_DIR)
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    assert list(d23.index) == list(d25.index)
    assert (d23["n_docs"] == d25["n_docs"]).all()
    assert (d23["n_exact_dropped"] == d25["n_exact_dropped"]).all()
    assert d25["n_near_dropped"].sum() >= d23["n_near_dropped"].sum()
    assert (
        d25["n_exact_dropped"] + d25["n_near_dropped"] + d25["n_survivors"]
        == d25["n_docs"]
    ).all()
