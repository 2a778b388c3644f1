"""Fixed outer schemas (SURVEY.md §1.3: dynamic table width never leaks into
the Spark schema — that is what keeps the job plannable at 10^12 rows)."""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("docs", T.LongType(), False),
        T.StructField("spans", T.LongType(), False),
        T.StructField("chars_decoded", T.LongType(), False),
        T.StructField("media_spans", T.LongType(), False),
        T.StructField("elapsed_sec", T.DoubleType(), False),
        T.StructField("spans_per_sec", T.DoubleType(), False),
    ]
)
