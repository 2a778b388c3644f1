"""Measure this box's RAW kernel scaling ceiling — no Spark involved.

Substantiates the hardware-ceiling claim in BENCH/BASELINE.md: K
independent worker processes each run the plain-numpy recognition kernel
over the same payload set; we report aggregate images/sec at each K and
the efficiency of each doubling. Any gap below 1.0 here is a property of
the machine (memory bandwidth, turbo scaling), not of the Spark job —
an upper bound on what ANY parallel compute can show on this box.

    python scripts/bench_ceiling.py          # K = 1,2,4,8
    SPARK_GRAFT_CEILING_LEVELS=1,4 python scripts/bench_ceiling.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LEVELS = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_CEILING_LEVELS", "1,2,4,8").split(",")
)
N_IMAGES = int(os.environ.get("SPARK_GRAFT_CEILING_IMAGES", "150"))


def _worker(payloads: list[bytes], out: mp.Queue) -> None:
    from ocr_text_recognition_spark.kernel import reference_kernel

    reference_kernel.recognize_media_bytes(payloads[0])  # warm caches
    t0 = time.time()
    for p in payloads:
        reference_kernel.recognize_media_bytes(p)
    out.put(len(payloads) / (time.time() - t0))


def measure_ceiling(levels: tuple[int, ...] = LEVELS, n_images: int = N_IMAGES) -> dict[int, dict]:
    """Run the raw-kernel ceiling measurement; returns {K: {workers,
    agg_imgs_per_sec, per_worker}}. Importable so bench_scaling.py can
    co-measure the ceiling in the SAME run/artifact as the Spark job."""
    from ocr_text_recognition_spark import corpus

    _, media = corpus.make_corpus(n_images + 30, seed=3)
    payloads = media["content"].tolist()[:n_images]

    results: dict[int, dict] = {}
    for k in levels:
        q: mp.Queue = mp.Queue()
        procs = [mp.Process(target=_worker, args=(payloads, q)) for _ in range(k)]
        t0 = time.time()
        for p in procs:
            p.start()
        rates = [q.get() for _ in procs]
        for p in procs:
            p.join()
        wall = time.time() - t0
        agg = k * len(payloads) / wall
        results[k] = {"workers": k, "agg_imgs_per_sec": round(agg, 1),
                      "per_worker": [round(r, 1) for r in rates]}
        print(json.dumps(results[k]), flush=True)
    return results


def main() -> None:
    results = measure_ceiling()
    base = results[LEVELS[0]]["agg_imgs_per_sec"] / LEVELS[0]
    for k in LEVELS[1:]:
        eff = (results[k]["agg_imgs_per_sec"] / k) / base
        print(f"per-core efficiency at {k} workers vs {LEVELS[0]}: {eff:.3f}", flush=True)


if __name__ == "__main__":
    main()
