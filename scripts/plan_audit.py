"""Physical-plan anti-pattern audit over the whole registry.

For every registered query, build the DataFrame at a small SF and scan its
executed plan for the scale-killers the 100 TB design forbids:

- ``CartesianProduct``      — an unconditioned join that enumerates pairs
- ``BatchEvalPython``       — a row-at-a-time Python UDF in the plan
  (Arrow-batched pandas UDFs compile to ArrowEvalPython /
  FlatMapGroupsInPandas / MapInPandas and are allowed)
- ``BroadcastNestedLoopJoin`` carrying a non-trivial build side is reported
  as a WARNING count only: every intended use in this repo broadcasts a
  singleton/≤10-row frame (crossJoin of a stats row), which is the correct
  shape; the count is printed so a reviewer can diff it round-over-round.

Constructing a DataFrame executes any eager ``localCheckpoint`` inside the
query (and st-family queries run their bounded stream to completion), so a
full audit costs about as much as a correctness sweep — run it from /tmp
like the driver would:

    cd /tmp && python /root/repo/scripts/plan_audit.py            # all
    cd /tmp && python /root/repo/scripts/plan_audit.py --names d4_minhash_dedup
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = args.names or list(qs)

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(args.cores))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    violations: dict[str, list[str]] = {}
    bnlj_counts: dict[str, int] = {}
    errors: dict[str, str] = {}
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            errors[name] = repr(e)[:200]
            print(f"[{i+1}/{len(names)}] {name}: ERROR {errors[name]}", flush=True)
            continue
        bad = [p for p in FORBIDDEN if p in plan]
        nb = plan.count("BroadcastNestedLoopJoin")
        if bad:
            violations[name] = bad
        if nb:
            bnlj_counts[name] = nb
        status = f"VIOLATION {bad}" if bad else "ok"
        print(
            f"[{i+1}/{len(names)}] {name}: {status}"
            f"{f' (bnlj={nb})' if nb else ''} ({round(time.time() - t0, 2)}s)",
            flush=True,
        )

    print(
        json.dumps(
            {
                "audited": len(names) - len(errors),
                "violations": violations,
                "errors": errors,
                "bnlj_total": sum(bnlj_counts.values()),
                "bnlj_queries": len(bnlj_counts),
            }
        )
    )
    return 1 if (violations or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
