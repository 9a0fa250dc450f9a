"""Dump .explain("formatted") for a set of registry queries to files.

Round-16+ optimization evidence: the judge checks plan claims against
committed plans/r{N}/<query>_{before,after}.txt. Run from /tmp like the
driver would:

    cd /tmp && python /root/repo/scripts/dump_plans.py --suffix before \
        --out /root/repo/plans/r16 [--names n1 n2 ...]

Defaults to the bench HEADLINE set. The dump is the PRE-EXECUTION
formatted plan (AdaptiveSparkPlan initial shape — what Catalyst would
ship to a real cluster) at the bench scale.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", required=True, help="before|after")
    ap.add_argument("--out", default="/root/repo/plans/r16")
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from ml_training_data_pipeline_spark.session import get_spark

    spark = get_spark("dump_plans", shuffle_partitions=32)
    from ml_training_data_pipeline_spark.plans import registry

    registry._load_all()
    import bench

    from plan_audit import CkptRecorder

    names = args.names or bench.HEADLINE
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        # an eager localCheckpoint inside the query truncates the final
        # visible plan at an ExistingRDD scan — record every
        # pre-checkpoint segment too, so the committed evidence shows the
        # WHOLE computation (same blind-spot fix as plan_audit's ledger)
        with CkptRecorder() as rec:
            df = registry.QUERIES[name](spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            for i, seg in enumerate(rec.plans):
                fh.write(f"== pre-checkpoint segment {i} (executedPlan) ==\n")
                fh.write(seg)
                fh.write("\n")
            if rec.plans:
                fh.write("== final plan (formatted) ==\n")
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs, {len(rec.plans)} ckpt segments)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
