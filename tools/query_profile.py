"""Decompose per-query wall time: DataFrame build (Python + analysis),
optimize/plan (explain), and N repeated executions (collect), plus the
Spark job count per execution.  Usage:

    python tools/query_profile.py [sf_dir] q1 q2 ... [--reps N]

Job counts are load-insensitive; execution times are min-of-reps to
shave host noise (guide §1: measure first, and measure something
stable).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _next_job_id(spark) -> int:
    v = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    try:
        return int(v.get())  # AtomicInteger on some Spark builds
    except AttributeError:
        return int(v)


def main() -> int:
    # ADVICE r13: the documented `--reps N` form crashed (no '=' to
    # split on, and the stray N was parsed as a query name). Handle
    # both `--reps N` and `--reps=N`.
    argv = sys.argv[1:]
    args: list[str] = []
    reps = 3
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--reps":
            reps = int(argv[i + 1])
            i += 2
            continue
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    from open_tlm_spark.plans import REGISTRY
    from open_tlm_spark.session import get_spark, load_tables

    spark = get_spark("query-profile")
    spark.sparkContext.setLogLevel("ERROR")
    tables = load_tables(spark, sf_dir)
    for t in tables:
        spark.table(t).count()
    st = spark.sparkContext.statusTracker()

    print(f"{'query':36s} {'build':>7s} {'plan':>7s} "
          f"{'exec1':>7s} {'execmin':>8s} {'jobs':>5s}")
    for name in names:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        t_plan = time.perf_counter() - t0
        execs = []
        j0 = _next_job_id(spark)
        for i in range(reps):
            t0 = time.perf_counter()
            # fresh df each rep: include per-run analysis like the bench
            d2 = q.fn(spark, sf_dir)
            d2.collect()
            execs.append(time.perf_counter() - t0)
        j1 = _next_job_id(spark)
        njobs = (j1 - j0) / reps
        print(f"{name:36s} {t_build:7.3f} {t_plan:7.3f} "
              f"{execs[0]:7.3f} {min(execs):8.3f} {njobs:5.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
