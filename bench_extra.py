"""Per-query isolation harness for optimization work (guide §1.4).

NOT the frozen driver bench (bench.py) — this file exists so individual
queries can be timed with the noop sink, labelled in the UI, and their
formatted plans dumped, without touching the measurement contract.

Usage:
  python bench_extra.py q1 q2 ...          # time listed queries (cold + 2 warm)
  python bench_extra.py --plans q1 ...     # also dump .explain('formatted')
  python bench_extra.py --reps 3 q1 ...

Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and
$SPARK_GRAFT_CPUS (default 32) exactly like bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hatchery_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", action="store_true",
                    help="write .explain('formatted') to plans/r06/<q>_now.txt")
    ap.add_argument("--plan-suffix", default="now")
    args = ap.parse_args()

    spark = get_spark("hatchery_bench_extra", cpus=CPUS)
    spark.range(1000).count()

    import __spark_entry__ as entry

    qs = entry.queries()
    out: dict[str, dict] = {}
    for name in args.queries:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        fn = qs[name]
        if args.plans:
            os.makedirs("plans/r06", exist_ok=True)
            df = fn(spark, SF_DIR)
            with open(f"plans/r06/{name}_{args.plan_suffix}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        times = []
        for i in range(args.reps + 1):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"cold": times[0], "warm": round(min(times[1:]), 3),
                     "all": times}
        print(f"{name}: cold={times[0]} warm={min(times[1:])}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
