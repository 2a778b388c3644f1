"""Measure this box's RAW kernel scaling ceiling — no Spark involved.

Substantiates the hardware-ceiling claim in BENCH/BASELINE.md: K
independent worker processes each run the plain-numpy recognition kernel
over the same payload set; we report aggregate images/sec at each K and
the efficiency of each doubling. Any gap below 1.0 here is a property of
the machine (memory bandwidth, turbo scaling, hypervisor neighbors), not
of the Spark job — an upper bound on what ANY parallel compute can show
on this box.

Methodology (noise-robust; the box is a shared VM whose single-shot
numbers swing 10-20%):
- every worker warms its caches with a full pass, then all workers
  synchronize on a Barrier before the timed pass — process startup and
  import time never pollute the measurement;
- aggregate throughput = sum of in-worker rates (workers start together
  and run near-equal durations, so the sum is the true concurrent rate);
- each level is measured REPEATS times and the median-aggregate run is
  reported, with the spread kept alongside.

    python scripts/bench_ceiling.py          # K = 1,2,4,8
    SPARK_GRAFT_CEILING_LEVELS=1,4 python scripts/bench_ceiling.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LEVELS = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_CEILING_LEVELS", "1,2,4,8").split(",")
)
N_IMAGES = int(os.environ.get("SPARK_GRAFT_CEILING_IMAGES", "300"))
REPEATS = int(os.environ.get("SPARK_GRAFT_CEILING_REPEATS", "3"))


def _worker(payloads: list[bytes], barrier, out: mp.Queue) -> None:
    from ocr_text_recognition_spark.kernel import reference_kernel

    for p in payloads:  # full warm pass: glyph memo, template tensors, heap
        reference_kernel.recognize_media_bytes(p)
    barrier.wait()  # all workers start the timed pass together
    t0 = time.time()
    for p in payloads:
        reference_kernel.recognize_media_bytes(p)
    out.put(len(payloads) / (time.time() - t0))


def _measure_once(payloads: list[bytes], k: int) -> dict:
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(k)
    procs = [mp.Process(target=_worker, args=(payloads, barrier, q)) for _ in range(k)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return {
        "workers": k,
        "agg_imgs_per_sec": round(sum(rates), 1),
        "per_worker": sorted((round(r, 1) for r in rates), reverse=True),
    }


def measure_ceiling(
    levels: tuple[int, ...] = LEVELS,
    n_images: int = N_IMAGES,
    repeats: int = REPEATS,
) -> dict[int, dict]:
    """Run the raw-kernel ceiling measurement; returns {K: {workers,
    agg_imgs_per_sec, per_worker, all_aggs}}. Importable so
    bench_scaling.py can co-measure the ceiling in the SAME run/artifact
    as the Spark job. agg_imgs_per_sec is the MEDIAN aggregate over
    ``repeats`` barrier-synchronized runs."""
    from ocr_text_recognition_spark import corpus

    _, media = corpus.make_corpus(n_images + 30, seed=3)
    payloads = media["content"].tolist()[:n_images]

    results: dict[int, dict] = {}
    for k in levels:
        runs = [_measure_once(payloads, k) for _ in range(repeats)]
        runs.sort(key=lambda r: r["agg_imgs_per_sec"])
        med = runs[len(runs) // 2]
        med["all_aggs"] = [r["agg_imgs_per_sec"] for r in runs]
        results[k] = med
        print(json.dumps(med), flush=True)
    return results


def main() -> None:
    results = measure_ceiling()
    base = results[LEVELS[0]]["agg_imgs_per_sec"] / LEVELS[0]
    for k in LEVELS[1:]:
        eff = (results[k]["agg_imgs_per_sec"] / k) / base
        print(f"per-core efficiency at {k} workers vs {LEVELS[0]}: {eff:.3f}", flush=True)


if __name__ == "__main__":
    main()
