"""Per-micro-batch cost breakdown for the CDC bench pipeline: runs
bench_cdc_pipeline's exact topology and prints each batch's
durationMs split (addBatch / latestOffset / getBatch / commitOffsets /
walCommit / triggerExecution) from the streaming progress events, plus
the Spark job count per batch — the r10/r11 fixed-cost hunt's
instrument. Usage: python scripts/profile_cdc.py [sf_dir] [mode]."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transferia_spark import get_spark  # noqa: E402
from transferia_spark.session import load_tables  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mode = sys.argv[2] if len(sys.argv) > 2 else "rewrite"
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = get_spark("profile_cdc")
    if os.environ.get("PROFILE_AQE") == "off":
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    from pyspark.sql import functions as F  # noqa: F401

    from transferia_spark.streaming.bucketed_table import (
        BucketedCdcApplySink,
        BucketedParquetTable,
    )
    from transferia_spark.streaming.pipeline import ReplicationPipeline
    from transferia_spark.streaming.wal_source import (
        WalJsonDataSource,
        wal_output_schema,
    )

    tmp = tempfile.mkdtemp(prefix="profile_cdc_")
    wal = os.path.join(tmp, "wal")
    os.makedirs(wal)
    tables = load_tables(spark, sf_dir, ["customer", "events"])
    cust = tables["customer"].select("c_custkey", "c_name", "c_acctbal")
    target = BucketedParquetTable(
        spark, os.path.join(tmp, "target"), keys=["c_custkey"],
        n_buckets=16, merge_mode=mode,
    )
    target.overwrite(cust)

    evs = sorted(
        tables["events"]
        .select("event_id", "user_id", "value", "event_type")
        .collect(),
        key=lambda r: r.event_id,
    )

    def line(r, lsn):
        op = {"signup": "I", "error": "D"}.get(r.event_type, "U")
        if op == "D":
            return {"action": "D", "lsn": lsn,
                    "identity": [{"name": "c_custkey", "value": r.user_id}]}
        return {"action": op, "lsn": lsn, "columns": [
            {"name": "c_custkey", "value": r.user_id},
            {"name": "c_name", "value": f"u{r.user_id}"},
            {"name": "c_acctbal", "value": r.value},
        ]}

    warm, backlog = evs[:1000], evs[1000:]
    with open(os.path.join(wal, "000.jsonl"), "w") as f:
        for i, r in enumerate(warm):
            f.write(json.dumps(line(r, i + 1)) + "\n")
    base = len(warm)
    stage = os.path.join(tmp, "staged.jsonl")
    with open(stage, "w") as f:
        for i, r in enumerate(backlog):
            f.write(json.dumps(line(r, base + i + 1)) + "\n")

    spark.dataSource.register(WalJsonDataSource)
    stream = (
        spark.readStream.format("waljson")
        .schema(wal_output_schema(
            "c_custkey long, c_name string, c_acctbal double"))
        .option("path", wal)
        .option("ack_file", os.path.join(tmp, "ack.json"))
        .option("decode_splits",
                os.environ.get("PROFILE_SPLITS", "8"))
        .option(
            "max_events_per_batch",
            str(max(1, len(backlog) // n_batches)),
        )
        .load()
    )
    ckpt = os.path.join(tmp, "ckpt")
    pipe = ReplicationPipeline(
        stream=stream,
        sink=BucketedCdcApplySink(target),
        checkpoint_dir=ckpt,
        trigger={"processingTime": "50 milliseconds"},
    )
    # split plan-construction (py4j expression building) from action
    import transferia_spark.cdc.merge as mm
    import transferia_spark.streaming.bucketed_table as bt

    times = {"plan": 0.0, "commit": 0.0, "read": 0.0, "n": 0}
    orig_mbc = mm.merge_batch_clustered
    orig_commit = bt.BucketedParquetTable._commit
    orig_read = bt.BucketedParquetTable.read
    orig_merge = bt.BucketedParquetTable.merge
    orig_cm = bt.BucketedParquetTable._commit_manifest
    orig_call = bt.BucketedCdcApplySink.__call__
    from pyspark.sql.readwriter import DataFrameWriter

    orig_pq = DataFrameWriter.parquet

    def timed_pq(self, *a, **k):
        t = time.time()
        out = orig_pq(self, *a, **k)
        times["action"] = times.get("action", 0.0) + time.time() - t
        return out

    DataFrameWriter.parquet = timed_pq

    def timed_mbc(*a, **k):
        t = time.time()
        out = orig_mbc(*a, **k)
        times["plan"] += time.time() - t
        times["n"] += 1
        return out

    def timed_commit(self, *a, **k):
        t = time.time()
        out = orig_commit(self, *a, **k)
        times["commit"] += time.time() - t
        return out

    def timed_read(self, *a, **k):
        t = time.time()
        out = orig_read(self, *a, **k)
        times["read"] += time.time() - t
        return out

    def timed_merge(self, *a, **k):
        t = time.time()
        out = orig_merge(self, *a, **k)
        times["merge"] = times.get("merge", 0.0) + time.time() - t
        return out

    def timed_cm(self, *a, **k):
        t = time.time()
        out = orig_cm(self, *a, **k)
        times["manifest"] = times.get("manifest", 0.0) + time.time() - t
        return out

    def timed_call(self, *a, **k):
        t = time.time()
        _ = a[0].schema  # cost of the batch frame's first analysis
        times["bschema"] = times.get("bschema", 0.0) + time.time() - t
        t = time.time()
        out = orig_call(self, *a, **k)
        times["sink"] = times.get("sink", 0.0) + time.time() - t
        return out

    bt.BucketedParquetTable.merge = timed_merge
    bt.BucketedParquetTable._commit_manifest = timed_cm
    bt.BucketedCdcApplySink.__call__ = timed_call
    mm.merge_batch_clustered = timed_mbc
    bt.BucketedParquetTable._commit = timed_commit
    bt.BucketedParquetTable.read = timed_read
    import transferia_spark.streaming.bucketed_table as _bt2
    _bt2.merge_batch_clustered = timed_mbc
    q = pipe.start("profile_cdc")

    def committed_end() -> int:
        try:
            done = [
                int(n) for n in os.listdir(os.path.join(ckpt, "commits"))
                if n.isdigit()
            ]
            if not done:
                return 0
            with open(
                os.path.join(ckpt, "offsets", str(max(done)))
            ) as f:
                return int(json.loads(f.read().splitlines()[-1])["lsn"])
        except (FileNotFoundError, ValueError, KeyError, IndexError):
            return 0

    deadline = time.time() + 300
    while committed_end() < base and time.time() < deadline:
        time.sleep(0.05)
    sc = spark.sparkContext
    jobs0 = sc._jsc.sc().dagScheduler().nextJobId()
    t0 = time.time()
    os.rename(stage, os.path.join(wal, "001.jsonl"))
    final = base + len(backlog)
    while committed_end() < final and time.time() < deadline:
        time.sleep(0.05)
    dt = time.time() - t0
    jobs1 = sc._jsc.sc().dagScheduler().nextJobId()

    seen = set()
    rows = []
    for p in q.recentProgress:
        if p["batchId"] in seen or p["numInputRows"] == 0:
            continue
        seen.add(p["batchId"])
        d = p["durationMs"]
        rows.append((
            p["batchId"], p["numInputRows"],
            d.get("triggerExecution"), d.get("addBatch"),
            d.get("latestOffset"), d.get("getBatch"),
            d.get("commitOffsets"), d.get("walCommit"),
        ))
    q.stop()
    try:
        tracker = sc.statusTracker()
        from collections import Counter

        names = Counter()
        for jid in range(jobs0, jobs1):
            ji = tracker.getJobInfo(jid)
            if ji is None:
                names["<gone>"] += 1
                continue
            stages = []
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    stages.append(si.name.split(" at ")[0])
            names[" | ".join(sorted(set(stages))) or "<?>"] += 1
        for k, v in names.most_common():
            print(f"  {v:3d}x  {k}")
        print("-- per-job detail (window) --")
        for jid in range(jobs0, jobs1):
            ji = tracker.getJobInfo(jid)
            if ji is None:
                print(f"  job {jid}: <gone>")
                continue
            det = []
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    det.append(f"{si.name}[{si.numTasks}t]")
            print(f"  job {jid}: " + " ; ".join(det))
    except Exception as e:
        print("job histogram unavailable:", e)
    print(f"\nmode={mode} backlog={len(backlog)} wall={dt:.2f}s "
          f"rows/s={len(backlog)/dt:.0f} spark_jobs={jobs1 - jobs0}")
    print("batch  rows  trigger  addBatch  latestOff  getBatch  "
          "commitOff  walCommit")
    for r in rows:
        print("  ".join(str(x) for x in r))
    tot = [sum(x[i] or 0 for x in rows) for i in range(2, 8)]
    print("TOTALS trigger/addBatch/latestOff/getBatch/commitOff/wal:",
          tot)
    print(f"SINK SPLIT over {times['n']} merges: plan-build "
          f"{times['plan']:.2f}s  read-build {times['read']:.2f}s  "
          f"commit(incl action) {times['commit']:.2f}s  "
          f"manifest {times.get('manifest', 0):.2f}s  "
          f"merge-total {times.get('merge', 0):.2f}s  "
          f"sink-total {times.get('sink', 0):.2f}s  "
          f"write-action {times.get('action', 0):.2f}s  "
          f"batch-schema {times.get('bschema', 0):.2f}s")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
