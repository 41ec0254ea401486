#!/usr/bin/env python
"""Per-query profiling harness for the optimization rounds.

For each named query it reports, separately:
  * build_s   — time for queries()[name](spark, sf_dir) to return
                (Python-side plan construction; for eager entries —
                streaming runs, artifact writes, driver loops — this is
                where the work happens)
  * plan_s    — time for the physical plan to materialize
                (queryExecution().executedPlan(): analysis + optimization
                + physical planning, driver-side)
  * exec1_s   — first noop-sink run (codegen JIT included)
  * exec2_s   — second noop-sink run after clearCache + fresh build
                (bench.py's min-of-2 protocol: this is the number the
                bench reports when the plan is cache-free)

Usage: python bench_profile.py <query> [<query> ...]
       python bench_profile.py --plans <outdir> <query> ...   # also save
       explain("formatted") to <outdir>/<query>_<suffix>.txt (suffix via
       --suffix, default "before").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hnsw_vector_db_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    suffix = "before"
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        args = args[:i] + args[i + 2:]
    if args and args[0] == "--plans":
        plans_dir = args[1]
        os.makedirs(plans_dir, exist_ok=True)
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "bench_profile", **{"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    queries["vector_stats"](spark, sf_dir).count()  # warmup

    out = {}
    for name in names:
        fn = queries[name]
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        _ = df._jdf.queryExecution().executedPlan()
        t2 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        if plans_dir:
            plan_txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan_txt)
        # run 2: fresh build, bench protocol
        spark.catalog.clearCache()
        t4 = time.time()
        df2 = fn(spark, sf_dir)
        df2.write.format("noop").mode("overwrite").save()
        t5 = time.time()
        out[name] = {
            "build_s": round(t1 - t0, 3),
            "plan_s": round(t2 - t1, 3),
            "exec1_s": round(t3 - t2, 3),
            "run2_total_s": round(t5 - t4, 3),
        }
        print(f"# {name}: {json.dumps(out[name])}", file=sys.stderr)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
