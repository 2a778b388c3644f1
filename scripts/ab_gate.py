"""Quick A/B harness for gate-job overhead fixes: run the extraction pass
at local[2] and local[8] under named config variants, interleaved, and
print per-variant walls + the implied 2->8 ratio. Diagnostic only —
the committed gate artifact comes from scripts/bench_scaling.py.

Usage: python scripts/ab_gate.py [variant ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("AB_DOCS", "30000"))
TRIALS = int(os.environ.get("AB_TRIALS", "2"))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from ocr_text_recognition_spark.session import get_spark
from ocr_text_recognition_spark.extraction.pipeline import run_extraction
from pyspark.sql import functions as F

cores, corpus_dir, trials, conf_json, kp = (
    int(sys.argv[1]), sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5])
if conf_json == "TUNED":
    import os
    from ocr_text_recognition_spark.extraction.pipeline import extraction_session_conf
    nbytes = sum(os.path.getsize(os.path.join(corpus_dir, f))
                 for f in os.listdir(corpus_dir))
    extra = extraction_session_conf(nbytes, cores)
else:
    extra = json.loads(conf_json)
kernel_parallelism = None if kp == "none" else int(kp) * cores
spark = get_spark("ab_%%d" %% cores, cores=cores, shuffle_partitions=cores * 2,
                  extra_conf=extra)
docs = spark.read.parquet(corpus_dir + "/documents.parquet")
media = spark.read.parquet(corpus_dir + "/media.parquet")

def stats_of(df):
    return df.agg(F.count("*").alias("docs"),
                  F.sum(F.size("spans")).alias("spans")).collect()[0]

stats_of(run_extraction(spark, docs.sample(False, 0.1, seed=1), media,
                        kernel_parallelism=kernel_parallelism))
secs = []
for _ in range(trials):
    t0 = time.time()
    stats = stats_of(run_extraction(spark, docs, media,
                                    kernel_parallelism=kernel_parallelism))
    secs.append(time.time() - t0)
print(json.dumps({"cores": cores, "secs": [round(s, 3) for s in secs]}))
""" % {"repo": REPO}

VARIANTS: dict[str, tuple[object, str]] = {
    # name -> (extra_conf | "TUNED", kernel_parallelism multiplier or "none")
    "base": ({}, "none"),
    "tuned": ("TUNED", "none"),
    "tuned+kp4": ("TUNED", "4"),
}


def run(cores: int, corpus_dir: str, conf, kp: str) -> list[float]:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), corpus_dir, str(TRIALS),
         conf if conf == "TUNED" else json.dumps(conf), kp],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"child failed:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])["secs"]


def main() -> None:
    from ocr_text_recognition_spark import corpus
    from ocr_text_recognition_spark.io_pandas import write_corpus_parquet

    names = sys.argv[1:] or list(VARIANTS)
    corpus_dir = tempfile.mkdtemp(prefix="ab_corpus_")
    docs_pd, media_pd = corpus.make_corpus(N_DOCS, seed=42, media_pool_per_doc=0.9)
    write_corpus_parquet(docs_pd, media_pd, corpus_dir)
    print(f"corpus: {len(docs_pd)} docs -> {corpus_dir}", flush=True)

    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    acc = {n: {"lo": [], "hi": []} for n in names}
    # interleave variants within each round so slow box drift hits all
    # variants alike; per-round ratios are neighbor-resistant like the
    # gate protocol's.
    for rnd in range(rounds):
        for name in names:
            conf, kp = VARIANTS[name]
            lo = run(2, corpus_dir, conf, kp)
            hi = run(8, corpus_dir, conf, kp)
            acc[name]["lo"] += lo
            acc[name]["hi"] += hi
            print(f"round {rnd + 1} {name:12s} local[2] {lo} local[8] {hi} "
                  f"ratio {(min(lo) / min(hi)) / 4:.3f}", flush=True)
    print("\nsummary (min of all trials — least-noise estimate):")
    for name in names:
        lo, hi = min(acc[name]["lo"]), min(acc[name]["hi"])
        print(f"{name:12s} lo {lo:.2f}s hi {hi:.2f}s ratio {(lo / hi) / 4:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
