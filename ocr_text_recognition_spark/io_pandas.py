"""pandas <-> Spark bridging for the nested corpus tables.

Production reads the documents table from Iceberg/parquet directly; this
module only serves tests and demos, converting the generator's pandas
frames through the fixed schemas (nested array<struct> needs an explicit
schema — inference from dicts is both slow and nondeterministic).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ocr_text_recognition_spark.schemas import DOCUMENTS_SCHEMA, MEDIA_SCHEMA

_SCHEMAS = {"documents": DOCUMENTS_SCHEMA, "media": MEDIA_SCHEMA}


def pandas_to_spark(spark: SparkSession, pdf: pd.DataFrame, table: str) -> DataFrame:
    schema = _SCHEMAS[table]
    if table == "documents":
        rows = [
            (
                r.doc_id,
                [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r.spans],
            )
            for r in pdf.itertuples()
        ]
    else:
        rows = [(r.media_ref, bytearray(r.content)) for r in pdf.itertuples()]
    return spark.createDataFrame(rows, schema)


def write_corpus_parquet(docs: pd.DataFrame, media: pd.DataFrame, out_dir: str) -> None:
    """Write the generated corpus as parquet (the scale-path input format)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    span_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    docs_tbl = pa.table(
        {
            "doc_id": pa.array(docs["doc_id"], pa.string()),
            "spans": pa.array(
                [
                    [
                        {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"], "offset": s["offset"]}
                        for s in spans
                    ]
                    for spans in docs["spans"]
                ],
                span_type,
            ),
        }
    )
    media_tbl = pa.table(
        {
            "media_ref": pa.array(media["media_ref"], pa.string()),
            "content": pa.array(media["content"], pa.binary()),
        }
    )
    # Small row groups so Spark's file-split planning can parallelize the
    # scan (a single giant row group = a single task, no matter the core
    # count — the scale path reads many files, this mimics that).
    pq.write_table(docs_tbl, f"{out_dir}/documents.parquet", row_group_size=max(len(docs) // 64, 16))
    pq.write_table(media_tbl, f"{out_dir}/media.parquet", row_group_size=max(len(media) // 64, 16))
