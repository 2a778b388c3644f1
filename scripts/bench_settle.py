"""Settle-run for bench lines flagged as suspected noise (VERDICT r4 #3).

Re-times a handful of named queries with MORE trials than bench.py
(median of 5 after one warm pass, vs bench.py's 3) on a quiet box, so a
round-over-round delta on UNCHANGED code can be attributed: if the
quiet-box median returns to the earlier level, the delta was shared-VM
noise (the q40 precedent from round 4); if it reproduces, it's real.

    python scripts/bench_settle.py q26_windowed_events q91_kmv_distinct_users q93_local_supplier_volume
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "5"))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as entrymod
    from ocr_text_recognition_spark.session import get_spark

    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: bench_settle.py <query_name> [...]")
    spark = get_spark("bench_settle", cores=CPUS, shuffle_partitions=CPUS)
    qs = entrymod.queries()
    out = {}
    for name in names:
        fn = qs[name]
        force(fn(spark, SF_DIR))  # warm pass
        secs = []
        for _ in range(TRIALS):
            t0 = time.time()
            force(fn(spark, SF_DIR))
            secs.append(round(time.time() - t0, 3))
        out[name] = {"median_sec": statistics.median(secs), "all_secs": secs}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"settle": out, "sf_dir": SF_DIR, "cpus": CPUS, "trials": TRIALS}))


if __name__ == "__main__":
    main()
