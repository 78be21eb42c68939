"""Stage-level attribution for a single query (guide §1.1/§7.1 without
the UI): run with spark.eventLog.enabled into a temp dir, then parse
the event log and print per-stage task count, wall span, executor
run/CPU time, GC time, and shuffle bytes.

Usage: python scripts/stageprof_r15.py <query_name> [reps]
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import sys
import tempfile
import time

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
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    evdir = tempfile.mkdtemp(prefix="evlog_")
    mod = _load_entry()
    queries = mod.queries()
    spark = get_spark(
        f"stageprof_{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    load_tables(spark, SF_DIR, ["region"])["region"].count()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()
    walls = []
    for _ in range(reps):
        t0 = time.time()
        df = queries[name](spark, SF_DIR)
        n = df.count()
        walls.append(round(time.time() - t0, 3))
    print(f"# {name} rows={n} walls={walls} cpus={os.environ.get('SPARK_GRAFT_CPUS')}")
    spark.stop()
    time.sleep(1)

    stages = {}
    tasks = {}
    stage_job = {}  # stage id -> (job id, job description/callsite)
    paths = [
        p
        for pat in ("*", "*/*")
        for p in glob.glob(os.path.join(evdir, pat))
        if os.path.isfile(p) and "appstatus" not in p
    ]
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    desc = (
                        props.get("spark.job.description")
                        or props.get("callSite.short")
                        or ""
                    )[:48]
                    for sid in ev.get("Stage IDs", []):
                        stage_job[sid] = (jid, desc)
                if e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    stages[sid] = {
                        "name": si["Stage Name"].split("\n")[0][:60],
                        "ntasks": si["Number of Tasks"],
                        "wall_ms": (si.get("Completion Time", 0) or 0)
                        - (si.get("Submission Time", 0) or 0),
                    }
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    agg = tasks.setdefault(
                        sid, {"run": 0, "cpu": 0, "gc": 0, "sr": 0, "sw": 0,
                              "deser": 0, "result": 0}
                    )
                    agg["run"] += m.get("Executor Run Time", 0)
                    agg["cpu"] += m.get("Executor CPU Time", 0) // 1_000_000
                    agg["gc"] += m.get("JVM GC Time", 0)
                    agg["deser"] += m.get("Executor Deserialize Time", 0)
                    agg["result"] += m.get("Result Serialization Time", 0)
                    agg["sr"] += (m.get("Shuffle Read Metrics") or {}).get(
                        "Remote Bytes Read", 0
                    ) + (m.get("Shuffle Read Metrics") or {}).get(
                        "Local Bytes Read", 0
                    )
                    agg["sw"] += (m.get("Shuffle Write Metrics") or {}).get(
                        "Shuffle Bytes Written", 0
                    )

    tot_wall = sum(s["wall_ms"] for s in stages.values())
    tot_run = sum(t["run"] for t in tasks.values())
    tot_gc = sum(t["gc"] for t in tasks.values())
    print(
        f"# stages={len(stages)} total_stage_wall={tot_wall}ms "
        f"total_task_run={tot_run}ms total_gc={tot_gc}ms"
    )
    print("stage ntask wall_ms run_ms cpu_ms gc_ms deser_ms sr_kb sw_kb  name")
    for sid in sorted(stages, key=lambda s: -stages[s]["wall_ms"])[:30]:
        s, t_ = stages[sid], tasks.get(sid, {})
        print(
            f"{sid:5d} {s['ntasks']:5d} {s['wall_ms']:7d} "
            f"{t_.get('run', 0):6d} {t_.get('cpu', 0):6d} {t_.get('gc', 0):5d} "
            f"{t_.get('deser', 0):8d} "
            f"{t_.get('sr', 0) // 1024:5d} {t_.get('sw', 0) // 1024:5d}  "
            f"j{stage_job.get(sid, ('?', ''))[0]} "
            f"{stage_job.get(sid, ('?', ''))[1]} | {s['name'][:40]}"
        )


if __name__ == "__main__":
    main()
