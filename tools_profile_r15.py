#!/usr/bin/env python
"""r15 optimization-round instrumentation (guide §1): for each headline
query, separate DRIVER-SIDE construction cost (QUERIES[name] call:
Python query building, KQL parse/compile, Catalyst analysis) from
EXECUTION cost (noop-sink write of the prebuilt DataFrame), and dump
.explain('formatted') to plans/r15/<name>_before.txt.

Not part of the bench contract — a measurement tool only.
Usage: python tools_profile_r14.py [query ...]   (default: all headline)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from azure_kusto_parquet_conv_spark.session import get_spark
    from azure_kusto_parquet_conv_spark.queries import QUERIES

    spark = get_spark("r15-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    names = sys.argv[1:] or HEADLINE
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r15")
    os.makedirs(plans_dir, exist_ok=True)
    suffix = os.environ.get("PLAN_SUFFIX", "before")

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # warm-up: full build + exec (plan/codegen/JIT outside the
        # measured samples, mirroring bench.py)
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        build_cold = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()

        # measured: build twice, exec the SAME prebuilt df twice
        builds, execs, totals = [], [], []
        for _ in range(2):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            builds.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            execs.append(time.perf_counter() - t0)
            totals.append(builds[-1] + execs[-1])
        try:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception:
            import contextlib
            import io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"),
                  "w") as f:
            f.write(plan)
        out[name] = {
            "build_cold": round(build_cold, 3),
            "build": round(min(builds), 3),
            "exec": round(min(execs), 3),
            "total": round(min(totals), 3),
            "n_exchanges": plan.count("Exchange"),
            "n_python": (plan.count("BatchEvalPython")
                         + plan.count("ArrowEvalPython")
                         + plan.count("MapInPandas")
                         + plan.count("FlatMapGroupsInPandas")),
        }
        print(f"{name:32s} build={out[name]['build']:6.3f} "
              f"exec={out[name]['exec']:6.3f} "
              f"exch={out[name]['n_exchanges']:2d} "
              f"py={out[name]['n_python']}", flush=True)

    with open(f"/tmp/profile_r15_{suffix}.json", "w") as f:
        json.dump(out, f, indent=1)
    tot_b = sum(v["build"] for v in out.values())
    tot_e = sum(v["exec"] for v in out.values())
    print(f"TOTAL build={tot_b:.1f}s exec={tot_e:.1f}s")


if __name__ == "__main__":
    main()
