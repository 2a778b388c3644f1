"""spark-submit job entry (north star: 'packaged for spark-submit --py-files').

    zip -r engine.zip ocr_text_recognition_spark
    spark-submit --py-files engine.zip jobs/extract.py \
        --docs  s3://.../documents   (parquet/Iceberg path: doc_id, spans) \
        --media s3://.../media       (media_ref, content) \
        --out   s3://.../extracted \
        --ledger s3://.../ledger \
        [--resume] [--n-buckets 4096] [--n-salt 16]

Resumes idempotently from the bucket ledger when --resume is set.
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--media", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ledger", required=True)
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--n-buckets", type=int, default=256)
    ap.add_argument("--buckets-per-wave", type=int, default=8)
    ap.add_argument("--run-id", default=None)
    # kernel preprocessing for photographed/scanned corpora
    # (enhanced_table_ocr_service.py:58-60 / ocr_model.py:66-68 semantics)
    ap.add_argument("--binarizer", choices=["otsu", "adaptive"], default="otsu")
    ap.add_argument("--adaptive-block", type=int, default=11)
    ap.add_argument("--rotate-portrait", action="store_true")
    ap.add_argument("--denoise", choices=["median", "morph"], default="median")
    ap.add_argument("--sharpen-first", action="store_true")
    ap.add_argument("--deskew", choices=["shear", "rotation"], default="shear")
    args = ap.parse_args()

    if args.adaptive_block != 11 and args.binarizer != "adaptive":
        ap.error("--adaptive-block requires --binarizer adaptive")
    preprocess_kwargs = None
    if (
        args.binarizer != "otsu"
        or args.rotate_portrait
        or args.denoise != "median"
        or args.sharpen_first
        or args.deskew != "shear"
    ):
        preprocess_kwargs = {
            "binarizer": args.binarizer,
            "adaptive_block": args.adaptive_block,
            "rotate_portrait": args.rotate_portrait,
            "denoise": args.denoise,
            "sharpen_first": args.sharpen_first,
            "deskew": args.deskew,
        }

    from ocr_text_recognition_spark.extraction.checkpoint import run_with_checkpoints
    from ocr_text_recognition_spark.extraction.metrics import partition_metrics
    from ocr_text_recognition_spark.extraction.pipeline import extraction_session_conf
    from ocr_text_recognition_spark.session import get_spark

    # Scan/shuffle sizing for a compute-bound job: target >= 4 splits per
    # slot, clamped back to Spark's stock values at multi-GB inputs (the
    # helper is a no-op on a production-scale table). Local paths only;
    # object-store inputs size themselves via the catalog/manifest.
    def _local_bytes(path: str) -> int:
        if os.path.isfile(path):
            return os.path.getsize(path)
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(root, f))
                for root, _, files in os.walk(path)
                for f in files
            )
        return 0

    extra_conf = None
    nbytes = _local_bytes(args.docs) + _local_bytes(args.media)
    if nbytes:
        extra_conf = extraction_session_conf(nbytes, os.cpu_count() or 8)
    spark = get_spark("extract_job", extra_conf=extra_conf)
    docs = spark.read.parquet(args.docs)
    media = spark.read.parquet(args.media)
    processed = run_with_checkpoints(
        spark,
        docs,
        media,
        out_dir=args.out,
        ledger_dir=args.ledger,
        n_buckets=args.n_buckets,
        buckets_per_wave=args.buckets_per_wave,
        run_id=args.run_id,
        preprocess_kwargs=preprocess_kwargs,
    )
    print(f"processed buckets: {processed}")
    if args.metrics:
        out = spark.read.parquet(args.out)
        partition_metrics(out, run_id=args.run_id or "job").write.mode("append").parquet(
            args.metrics
        )


if __name__ == "__main__":
    main()
