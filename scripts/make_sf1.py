"""Generate an sf1 dataset (10x sf0.1) for the one-scale-up insurance probe.

Every scale claim in SURVEY §6 is design-argument + sf0.1 measurement;
this script manufactures the 10x datapoint that validates (or falsifies)
the extrapolation. Replicates each sf0.1 table 10x with per-replica key
OFFSETS so join fan-out scales linearly (a key matches only its own
replica's rows), while dimension tables with fixed cardinality (nation,
region) are copied untouched — the same shape a real 10x TPC-H scale-up
has. Document text and embedding vectors are replicated VERBATIM:
a 10x web corpus genuinely carries massive duplication, and the dedup /
ANN operators' banding and candidate caps are exactly what is being
probed.

Replica 0 keeps the original keys, so the exact-dedup representatives
of a replicated corpus ARE the source corpus — the property
tests/test_round13.py's pair-count identity relies on.

Usage:
    python scripts/make_sf1.py [--src /root/testdata/sf0.1] [--out /tmp/sf1] [--reps 10]
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 1_000_000_000  # > any source key

# table -> columns to offset per replica
KEYED = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPIED = ("nation", "region")


def generate(
    src: str,
    out: str,
    reps: int,
    quiet: bool = False,
    perturb_docs: bool = False,
    tables: tuple[str, ...] | None = None,
) -> None:
    """``perturb_docs=True`` builds the LOW-DUP 10× corpus: replica 0
    keeps the original text, every other replica suffixes EVERY token
    with a replica-unique marker (``r{r}x``), so replicas share no
    8-token window / shingle / fingerprint with each other — the corpus
    is 10× the bytes at the ORIGINAL duplication rate (VERDICT r14 #7:
    the verbatim-replica corpus pushes span coverage ~2%→~90%, the
    opposite endpoint from a real low-dup web crawl). ``tables`` limits
    generation (e.g. just ``("documents",)`` for the d24/ep14 probe)."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # OFF must exceed every source key or replicas silently ALIAS keys
    # across each other, corrupting the linear-fan-out property the scale
    # probe and the pair-count identity test depend on (ADVICE r13) —
    # validate instead of trusting the comment
    for t, keys in KEYED.items():
        for k in keys:
            mx = con.execute(
                f"SELECT max({k}) FROM read_parquet('{src}/{t}.parquet')"
            ).fetchone()[0]
            if mx is not None and mx >= OFF:
                raise SystemExit(
                    f"{t}.{k} max {mx} >= replica offset {OFF}: "
                    "replicas would alias keys; raise OFF"
                )
    for t, keys in KEYED.items():
        if tables is not None and t not in tables:
            continue
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]

        def col_sel(c: str) -> str:
            if c in keys:
                return f"{c} + r.r * {OFF} AS {c}"
            if perturb_docs and t == "documents" and c == "text":
                # token-suffix every replica except 0: replicas share NO
                # window/shingle/fingerprint, so duplication stays at the
                # source corpus's natural rate while bytes scale 10×
                return (
                    r"CASE WHEN r.r = 0 THEN text ELSE "
                    r"regexp_replace(text, '(\S+)', "
                    r"'\1r' || r.r::VARCHAR || 'x', 'g') END AS text"
                )
            return c

        sel = ", ".join(col_sel(c) for c in cols)
        con.execute(
            f"""COPY (
              SELECT {sel}
              FROM read_parquet('{src}/{t}.parquet')
              CROSS JOIN (SELECT unnest(range({reps})) AS r) r
            ) TO '{out}/{t}.parquet' (FORMAT PARQUET)"""
        )
        if not quiet:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
            ).fetchone()[0]
            print(f"{t}: {n} rows")
    for t in COPIED:
        if tables is not None and t not in tables:
            continue
        shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
        if not quiet:
            print(f"{t}: copied")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument(
        "--perturb-docs",
        action="store_true",
        help="low-dup corpus: suffix every token in replicas 1..n-1",
    )
    ap.add_argument("--tables", nargs="*", default=None, help="limit to these tables")
    args = ap.parse_args()
    generate(
        args.src,
        args.out,
        args.reps,
        perturb_docs=args.perturb_docs,
        tables=tuple(args.tables) if args.tables else None,
    )


if __name__ == "__main__":
    main()
