"""Full-registry wall/CPU profile at the bench scale — optimization triage.

For every registry query: one warm-free noop-sink execution at
$SPARK_GRAFT_SF_DIR (default sf0.1), recording wall seconds and the
process-tree CPU delta (user+sys of this PID, which owns the local-mode
executors). One rep per query — this ranks queries for optimization
attention; bench.py remains the measurement of record.

    cd /tmp && python /root/repo/scripts/profile_all.py --out /tmp/profile_all.json
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cpu_now() -> float:
    r = resource.getrusage(resource.RUSAGE_SELF)
    c = resource.getrusage(resource.RUSAGE_CHILDREN)
    return r.ru_utime + r.ru_stime + c.ru_utime + c.ru_stime


def jvm_cpu(spark) -> float:
    """Total JVM process CPU seconds (local mode: driver+executors share it)."""
    try:
        jvm = spark._jvm
        bean = jvm.java.lang.management.ManagementFactory.getOperatingSystemMXBean()
        return bean.getProcessCpuTime() / 1e9
    except Exception:  # noqa: BLE001
        return 0.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/profile_all.json")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument(
        "--reps", type=int, default=1,
        help="executions per query; rep walls recorded separately so a "
             "warm rep (no codegen/JIT) is distinguishable from the cold one",
    )
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from ml_training_data_pipeline_spark.session import get_spark

    spark = get_spark("profile_all", shuffle_partitions=int(os.environ["SPARK_GRAFT_CPUS"]))
    spark.sparkContext.setLogLevel("ERROR")
    from ml_training_data_pipeline_spark.plans import registry

    registry._load_all()
    names = args.names or [n for n in registry.QUERIES if n not in set(args.skip)]

    def clear_state() -> None:
        # cache-cold reps, same discipline as bench.one_rep: clearCache
        # only drops SQL-catalog entries; localCheckpoint'd RDD blocks
        # stay persisted and skew later reps unless unpersisted.
        spark.catalog.clearCache()
        try:
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist(True)
        except Exception:  # noqa: BLE001
            pass

    out: dict[str, dict] = {}
    for i, name in enumerate(names):
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        walls: list[float] = []
        cpus_l: list[float] = []
        err = None
        for _ in range(max(1, args.reps)):
            clear_state()
            t0, c0, j0 = time.monotonic(), cpu_now(), jvm_cpu(spark)
            try:
                df = fn(spark, args.sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                err = f"{type(e).__name__}: {e}"[:200]
            walls.append(round(time.monotonic() - t0, 3))
            cpus_l.append(round((cpu_now() - c0) + (jvm_cpu(spark) - j0), 2))
            if err:
                break
        out[name] = {"wall": walls[-1], "cpu": cpus_l[-1],
                     "walls": walls, "cpus": cpus_l}
        if err:
            out[name]["err"] = err
        print(f"[{i+1}/{len(names)}] {name}: {walls} wall / {cpus_l} cpu"
              + (f" ERR {err}" if err else ""), flush=True)
        clear_state()
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
