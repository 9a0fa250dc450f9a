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


def generate(src: str, out: str, reps: int, quiet: bool = False) -> None:
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
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + r.r * {OFF} AS {c}" if c in keys else c for c in cols
        )
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
        shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
        if not quiet:
            print(f"{t}: copied")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    generate(args.src, args.out, args.reps)


if __name__ == "__main__":
    main()
