"""Profile one extraction pass (the scaling-gate workload) with Spark
event logging, then print a stage timeline: per-stage wall, task count,
task-time stats, and inter-stage driver gaps. Diagnostic tool for the
per-pass serial component the gate's Amdahl fit exposes (~4.5s at HEAD,
BENCH/gate_attempts_r5.md attempt 6).

Usage: python scripts/profile_gate.py [cores] [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 30000
TUNED = len(sys.argv) > 3 and sys.argv[3] == "tuned"


def main() -> None:
    from ocr_text_recognition_spark import corpus
    from ocr_text_recognition_spark.io_pandas import write_corpus_parquet
    from ocr_text_recognition_spark.session import get_spark
    from ocr_text_recognition_spark.extraction.pipeline import run_extraction
    from pyspark.sql import functions as F

    corpus_dir = tempfile.mkdtemp(prefix="profile_corpus_")
    docs_pd, media_pd = corpus.make_corpus(N_DOCS, seed=42, media_pool_per_doc=0.9)
    write_corpus_parquet(docs_pd, media_pd, corpus_dir)

    evdir = tempfile.mkdtemp(prefix="profile_events_")
    conf = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    }
    if TUNED:
        from ocr_text_recognition_spark.extraction.pipeline import (
            extraction_session_conf,
        )

        input_bytes = sum(
            os.path.getsize(os.path.join(corpus_dir, f))
            for f in os.listdir(corpus_dir)
        )
        tuned = extraction_session_conf(input_bytes, CORES)
        print("tuned conf:", tuned)
        conf.update(tuned)
    spark = get_spark(
        f"profile_{CORES}",
        cores=CORES,
        shuffle_partitions=CORES * 2,
        extra_conf=conf,
    )
    docs = spark.read.parquet(corpus_dir + "/documents.parquet")
    media = spark.read.parquet(corpus_dir + "/media.parquet")

    def stats_of(df):
        return df.agg(
            F.count("*").alias("docs"),
            F.sum(F.size("spans")).alias("spans"),
        ).collect()[0]

    # warm-up (same shape as bench_scaling child)
    stats_of(run_extraction(spark, docs.sample(False, 0.1, seed=1), media))
    t0 = time.time()
    stats_of(run_extraction(spark, docs, media))
    t1 = time.time()
    wall = t1 - t0
    print(f"timed pass: {wall:.3f}s at local[{CORES}], {N_DOCS} docs")
    app_id = spark.sparkContext.applicationId
    spark.stop()  # flush event log

    evfile = os.path.join(evdir, app_id)
    if not os.path.exists(evfile):
        # Spark 4 rolling layout: eventlog_v2_<appId>/events_*
        d = os.path.join(evdir, f"eventlog_v2_{app_id}")
        parts = sorted(
            os.path.join(d, p) for p in os.listdir(d) if p.startswith("events")
        )
        lines = []
        for p in parts:
            with open(p) as f:
                lines.extend(f.readlines())
    else:
        with open(evfile) as f:
            lines = f.readlines()
    stages = {}  # id -> dict
    tasks = {}  # stage id -> [task ms]
    if True:
        for line in lines:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                scopes = []
                for rdd in si.get("RDD Info", []):
                    sc = rdd.get("Scope")
                    if sc:
                        nm = json.loads(sc).get("name", "")
                        if nm and nm not in scopes:
                            scopes.append(nm)
                stages[si["Stage ID"]] = {
                    "name": ",".join(scopes[:6]) or si["Stage Name"].split("\n")[0][:40],
                    "ntasks": si["Number of Tasks"],
                }
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                d = stages.setdefault(si["Stage ID"], {"name": "?", "ntasks": si["Number of Tasks"]})
                d["sub"] = si.get("Submission Time")
                d["done"] = si.get("Completion Time")
            elif e == "SparkListenerTaskEnd":
                ti = ev["Task Info"]
                sid = ev["Stage ID"]
                tasks.setdefault(sid, []).append(
                    ti["Finish Time"] - ti["Launch Time"]
                )

    done_stages = sorted(
        (sid, d) for sid, d in stages.items() if d.get("sub") and d.get("done")
    )
    if not done_stages:
        print("no completed stages in event log", evfile)
        return
    t_origin = done_stages[0][1]["sub"]
    # keep only stages of the timed pass: those submitted in the last
    # `wall` seconds of the log
    t_end = max(d["done"] for _, d in done_stages)
    window_start = t_end - wall * 1000 - 500
    print(f"\n{'stage':>5} {'start':>8} {'end':>8} {'wall':>7} {'tasks':>5} "
          f"{'tsum':>8} {'tmax':>7} {'tmed':>7}  name")
    prev_end = None
    total_gap = 0.0
    total_wall = 0.0
    for sid, d in done_stages:
        if d["sub"] < window_start:
            continue
        ts = sorted(tasks.get(sid, []))
        tsum = sum(ts) / 1000
        tmax = (ts[-1] / 1000) if ts else 0
        tmed = (ts[len(ts) // 2] / 1000) if ts else 0
        s = (d["sub"] - t_origin) / 1000
        e2 = (d["done"] - t_origin) / 1000
        w = e2 - s
        total_wall += w
        gap = ""
        if prev_end is not None and d["sub"] > prev_end:
            g = (d["sub"] - prev_end) / 1000
            total_gap += g
            gap = f"  [gap {g:.2f}s before]"
        prev_end = max(prev_end or 0, d["done"])
        print(f"{sid:>5} {s:>8.2f} {e2:>8.2f} {w:>7.2f} {d['ntasks']:>5} "
              f"{tsum:>8.2f} {tmax:>7.2f} {tmed:>7.2f}  {d['name']}{gap}")
    print(f"\npass wall {wall:.2f}s; sum stage wall {total_wall:.2f}s; "
          f"inter-stage driver gaps {total_gap:.2f}s")
    print("straggler cost per stage = stage wall - (task sum / cores)")


if __name__ == "__main__":
    main()
