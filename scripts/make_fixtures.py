"""Generate the committed oracle fixtures under fixtures/.

The driver's correctness gate (CORRECTNESS_r{N}.json) can only verify a
query that has a DuckDB-runnable oracle. The extraction pipeline (q29) and
image-metadata (q30) queries run numpy kernels DuckDB cannot reproduce, so
their oracles read *frozen golden fixtures* instead: parquet files produced
once by the plain-Python reference path (corpus.make_golden — the same
independent implementation the pytest span-equality suite trusts) and
committed to the repo. tests/test_fixtures.py regenerates both and asserts
byte-level equality with the committed files, so silent drift between the
kernel and the fixtures fails CI.

Usage: python scripts/make_fixtures.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_text_recognition_spark import corpus
from ocr_text_recognition_spark.kernel.imgcodec import decode_image

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")

SPANS_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)


def golden_spans_table(n_docs: int = 24, seed: int = 42) -> pa.Table:
    """Golden extracted spans for the q29 corpus (make_corpus(24, seed=42))."""
    docs_pd, media_pd = corpus.make_corpus(n_docs, seed=seed)
    golden = corpus.make_golden(docs_pd, media_pd)
    return pa.Table.from_arrays(
        [
            pa.array(golden["doc_id"].tolist(), pa.string()),
            pa.array(golden["spans"].tolist(), SPANS_TYPE),
        ],
        names=["doc_id", "spans"],
    )


def image_meta_table(n_docs: int = 16, seed: int = 42) -> pa.Table:
    """Image metadata for the q30 media pool, computed by the plain-Python
    twin of operators.multimodal.image_metadata (same decode + ink stats)."""
    _, media_pd = corpus.make_corpus(n_docs, seed=seed)
    rows = []
    for ref, content in zip(media_pd["media_ref"], media_pd["content"]):
        n = len(content) if content is not None else 0
        try:
            img = decode_image(bytes(content))
            rows.append(
                {
                    "media_ref": ref,
                    "height": img.shape[0],
                    "width": img.shape[1],
                    "n_bytes": n,
                    "ink_density": float((img < 128).mean()),
                    "valid": True,
                }
            )
        except Exception:
            rows.append(
                {
                    "media_ref": ref,
                    "height": None,
                    "width": None,
                    "n_bytes": n,
                    "ink_density": None,
                    "valid": False,
                }
            )
    df = pd.DataFrame(rows)
    return pa.Table.from_arrays(
        [
            pa.array(df["media_ref"], pa.string()),
            pa.array(df["height"], pa.int32()),
            pa.array(df["width"], pa.int32()),
            pa.array(df["n_bytes"], pa.int64()),
            pa.array(df["ink_density"], pa.float64()),
            pa.array(df["valid"], pa.bool_()),
        ],
        names=["media_ref", "height", "width", "n_bytes", "ink_density", "valid"],
    )


def resized_meta_table(n_docs: int = 16, seed: int = 42, max_side: int = 32) -> pa.Table:
    """Metadata of block-mean-resized images — the plain-Python twin of
    operators.multimodal.resize_images |> image_metadata (same decode,
    same block-mean downsample, same ink stats)."""
    _, media_pd = corpus.make_corpus(n_docs, seed=seed)
    from ocr_text_recognition_spark.kernel.imgcodec import encode_image

    rows = []
    for ref, content in zip(media_pd["media_ref"], media_pd["content"]):
        img = decode_image(bytes(content))
        f = max(1, int(np.ceil(max(img.shape) / max_side)))
        h, w = (img.shape[0] // f) * f, (img.shape[1] // f) * f
        small = img[:h, :w].reshape(h // f, f, w // f, f).mean(axis=(1, 3)).astype(np.uint8)
        payload = encode_image(small)
        rows.append(
            {
                "media_ref": ref,
                "height": small.shape[0],
                "width": small.shape[1],
                "n_bytes": len(payload),
                "ink_density": float((small < 128).mean()),
                "valid": True,
            }
        )
    df = pd.DataFrame(rows)
    return pa.Table.from_arrays(
        [
            pa.array(df["media_ref"], pa.string()),
            pa.array(df["height"], pa.int32()),
            pa.array(df["width"], pa.int32()),
            pa.array(df["n_bytes"], pa.int64()),
            pa.array(df["ink_density"], pa.float64()),
            pa.array(df["valid"], pa.bool_()),
        ],
        names=["media_ref", "height", "width", "n_bytes", "ink_density", "valid"],
    )


def main() -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    golden = golden_spans_table()
    pq.write_table(golden, os.path.join(FIXTURE_DIR, "golden_spans_24.parquet"))
    meta = image_meta_table()
    pq.write_table(meta, os.path.join(FIXTURE_DIR, "image_meta_16.parquet"))
    resized = resized_meta_table()
    pq.write_table(resized, os.path.join(FIXTURE_DIR, "resized_meta_16.parquet"))
    n_spans = sum(len(s) for s in golden.column("spans").to_pylist())
    print(f"golden_spans_24.parquet: {golden.num_rows} docs, {n_spans} spans")
    print(f"image_meta_16.parquet: {meta.num_rows} media refs")
    print(f"resized_meta_16.parquet: {resized.num_rows} media refs")


if __name__ == "__main__":
    main()
