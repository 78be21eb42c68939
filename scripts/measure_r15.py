"""Optimization-round measurement harness (guide §1): time every
queries() entry the bench way (fn + count) AND against the noop sink
(computation only, no count-pruning), capture .explain("formatted")
for each, and label jobs. Output: one JSON line per query on stdout
plus plan files under plans/r15/.

Usage: python scripts/measure_r15.py [out_dir] [query ...]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transferia_spark import get_spark  # noqa: E402
from transferia_spark.session import load_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "__spark_entry__.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/measure_r15"
    only = sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)
    mod = _load_entry()
    queries = mod.queries()
    spark = get_spark("measure_r15")
    # same warmup as bench.py
    load_tables(spark, SF_DIR, ["region"])["region"].count()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    names = only or list(queries)
    results = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"measure:{name}")
        rec: dict = {}
        try:
            # bench methodology: build + count
            t0 = time.time()
            df = fn(spark, SF_DIR)
            rec["build_s"] = round(time.time() - t0, 3)
            t0 = time.time()
            n = df.count()
            rec["count_s"] = round(time.time() - t0, 3)
            rec["rows"] = n
            # noop sink: computes every column (guide §1.4); separate
            # build so a query with internal state (temp dirs) is fresh
            t0 = time.time()
            df2 = fn(spark, SF_DIR)
            df2.write.format("noop").mode("overwrite").save()
            rec["noop_s"] = round(time.time() - t0, 3)
            # plan capture
            try:
                plan = df2._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            except Exception:
                plan = df2._sc._jvm.PythonSQLUtils.explainString(
                    df2._jdf.queryExecution(), "formatted"
                )
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
            rec["exchanges"] = plan.count("Exchange")
            rec["python_eval"] = (
                plan.count("BatchEvalPython")
                + plan.count("ArrowEvalPython")
                + plan.count("MapInArrow")
                + plan.count("MapInPandas")
            )
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {e}"
            traceback.print_exc()
        finally:
            spark.sparkContext.setJobDescription(None)
        results[name] = rec
        print(json.dumps({name: rec}), flush=True)

    with open(os.path.join(out_dir, "_summary.json"), "w") as f:
        json.dump(results, f, indent=1)
    ranked = sorted(
        (
            (r.get("build_s", 0) + r.get("count_s", 0), n)
            for n, r in results.items()
            if "error" not in r
        ),
        reverse=True,
    )
    print("== slowest (build+count) ==")
    for s, n in ranked[:25]:
        print(f"{s:8.3f}  {n}")


if __name__ == "__main__":
    main()
