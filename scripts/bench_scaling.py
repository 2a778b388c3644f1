"""Scaling-efficiency benchmark: run the SAME extraction job at local[8]
and local[32] (sandbox stand-in for N vs 4N executors, per BASELINE.json's
north rule) and write BENCH/BASELINE.md with throughput at both levels plus
scaling efficiency = (thr_4N / thr_N) / 4.

The corpus is generated ONCE to parquet (off the clock); each level runs in
a fresh child process (a JVM can't change master) and reads the same files —
the realistic shape of a job reading a pre-existing documents table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "6000"))
LEVELS = tuple(int(x) for x in os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "2,8").split(","))
POOL = float(os.environ.get("SPARK_GRAFT_SCALING_POOL", "0.9"))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from ocr_text_recognition_spark.session import get_spark
from ocr_text_recognition_spark.extraction.pipeline import run_extraction
from pyspark.sql import functions as F

cores, corpus_dir = int(sys.argv[1]), sys.argv[2]
spark = get_spark("scaling_%%d" %% cores, cores=cores, shuffle_partitions=cores)
docs = spark.read.parquet(corpus_dir + "/documents.parquet")
media = spark.read.parquet(corpus_dir + "/media.parquet")
# warm-up (JIT, python worker pool) on a slice
run_extraction(spark, docs.limit(16), media).count()
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


def run_level(cores: int, corpus_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), corpus_dir],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"child failed:\n{out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> None:
    from ocr_text_recognition_spark import corpus
    from ocr_text_recognition_spark.io_pandas import write_corpus_parquet

    corpus_dir = tempfile.mkdtemp(prefix="scaling_corpus_")
    print(f"generating {N_DOCS}-doc corpus -> {corpus_dir} ...", flush=True)
    docs_pd, media_pd = corpus.make_corpus(N_DOCS, seed=42, media_pool_per_doc=POOL)
    write_corpus_parquet(docs_pd, media_pd, corpus_dir)
    print(f"corpus ready: {len(docs_pd)} docs, {len(media_pd)} media", flush=True)

    lo = run_level(LEVELS[0], corpus_dir)
    print(json.dumps(lo), flush=True)
    hi = run_level(LEVELS[1], corpus_dir)
    print(json.dumps(hi), flush=True)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0
    md = f"""# BENCH / BASELINE — measured numbers

Generated {datetime.now(timezone.utc).isoformat(timespec="seconds")} by
`scripts/bench_scaling.py` (same job, same {N_DOCS}-doc seeded interleaved
corpus read from parquet, two parallelism levels — the sandbox stand-in for
N vs 4N executor clusters per the north rule).

| parallelism | wall sec | docs/sec | chars/sec |
|---|---|---|---|
| local[{LEVELS[0]}]  (N)  | {lo['sec']} | {lo['docs_per_sec']} | {lo['chars_per_sec']} |
| local[{LEVELS[1]}] (4N) | {hi['sec']} | {hi['docs_per_sec']} | {hi['chars_per_sec']} |

**Scaling efficiency (N -> 4N): {eff:.3f}** (target >= 0.8)

Corpus: {lo['docs']} docs, {lo['spans']} spans, {lo['chars']} chars extracted,
{len(media_pd)} distinct media images.
Reference baseline: the reference app publishes no numbers; its cost model is
one EasyOCR NN inference per image + one Tesseract subprocess per table cell
on a single thread (BASELINE.md). This engine recognizes each distinct image
once, Arrow-batched, across all cores.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(f"efficiency={eff:.3f}")


if __name__ == "__main__":
    main()
