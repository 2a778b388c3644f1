"""Scaling-efficiency benchmark: run the SAME extraction job at local[8]
and local[32] (sandbox stand-in for N vs 4N executors, per BASELINE.json's
north rule) and write BENCH/BASELINE.md with throughput at both levels plus
scaling efficiency = (thr_4N / thr_N) / 4.

Each level runs in a fresh child process (a JVM can't change master); the
corpus is identical (same seed) and generated off the clock.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "1200"))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from ocr_text_recognition_spark.session import get_spark
from ocr_text_recognition_spark import corpus
from ocr_text_recognition_spark.io_pandas import pandas_to_spark
from ocr_text_recognition_spark.extraction.pipeline import run_extraction
from pyspark.sql import functions as F

cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
spark = get_spark("scaling_%%d" %% cores, cores=cores, shuffle_partitions=cores)
docs_pd, media_pd = corpus.make_corpus(n_docs, seed=42, media_pool_per_doc=0.8)
docs = pandas_to_spark(spark, docs_pd, "documents").persist(); docs.count()
media = pandas_to_spark(spark, media_pd, "media").persist(); media.count()
# warm-up (JIT, python worker pool) on a slice
run_extraction(spark, docs.limit(24), media).count()
t0 = time.time()
out = run_extraction(spark, docs, media)
stats = out.agg(F.count("*").alias("docs"),
                F.sum(F.size("spans")).alias("spans"),
                F.sum(F.aggregate(F.transform("spans", lambda s: F.length(s["text"])),
                                  F.lit(0), lambda a, b: a + b)).alias("chars")).collect()[0]
sec = time.time() - t0
print(json.dumps({"cores": cores, "sec": round(sec, 3),
                  "docs": int(stats["docs"]), "spans": int(stats["spans"]),
                  "chars": int(stats["chars"]),
                  "docs_per_sec": round(stats["docs"] / sec, 2),
                  "chars_per_sec": round(stats["chars"] / sec, 1)}))
""" % {"repo": REPO}


def run_level(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), str(N_DOCS)],
        capture_output=True, text=True, cwd=REPO, timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    lo = run_level(8)
    print(json.dumps(lo))
    hi = run_level(32)
    print(json.dumps(hi))
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0
    md = f"""# BENCH / BASELINE — measured numbers

Generated {datetime.now(timezone.utc).isoformat(timespec="seconds")} by
`scripts/bench_scaling.py` (same job, same {N_DOCS}-doc seeded interleaved
corpus, two parallelism levels — the sandbox stand-in for N vs 4N executor
clusters per the north rule).

| parallelism | wall sec | docs/sec | chars/sec |
|---|---|---|---|
| local[8]  (N)  | {lo['sec']} | {lo['docs_per_sec']} | {lo['chars_per_sec']} |
| local[32] (4N) | {hi['sec']} | {hi['docs_per_sec']} | {hi['chars_per_sec']} |

**Scaling efficiency (N -> 4N): {eff:.3f}** (target >= 0.8)

Corpus: {lo['docs']} docs, {lo['spans']} spans, {lo['chars']} chars extracted.
Reference baseline: the reference app publishes no numbers; its cost model is
one EasyOCR NN inference per image + one Tesseract subprocess per table cell
on a single thread (BASELINE.md). This engine recognizes each distinct image
once, batched, across all cores.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(f"efficiency={eff:.3f}")


if __name__ == "__main__":
    main()
