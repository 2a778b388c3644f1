"""Inverted-index construction — the search-side primitive a corpus
engine needs next to dedup and similarity.

``inverted_index`` builds token -> posting-list rows from a document
table. The shape is chosen for 100 TB inputs:

- one lower+split per document (JVM-side ``split``/``filter``, no
  tokenizer UDF), ``array_distinct`` BEFORE the explode so a token
  appearing 500x in one doc contributes one (token, doc) row, not 500;
- the only shuffle is the token-keyed groupBy, which map-side combines;
- ``min_df`` prunes hapax tokens (the overwhelming majority of the
  vocabulary at web scale) AFTER the aggregate — a cheap post-shuffle
  scan; a hapax's collected payload is a single id, so collecting
  then filtering costs one shuffle instead of the two a
  count-filter-rejoin pass would pay;
- posting lists are emitted as a comma-joined string of numerically
  sorted doc ids: deterministic bytes, directly comparable across
  engines, and the natural on-disk layout for a postings shard.

A stop-token cap (``max_df``) bounds the worst-case posting list: a
token present in every document ("the") would otherwise concentrate
|corpus| ids in one aggregation key — the same hot-key pathology
``dedup.max_shingle_df`` guards against, handled the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textanalysis import TOKEN_SPLIT


def inverted_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """token -> (df, postings) over ``docs``. ``df`` counts DISTINCT
    documents containing the token; ``postings`` is the ascending
    doc-id list joined with ','. Tokens outside [min_df, max_df] are
    dropped (max_df=None keeps the hot tail)."""
    tok = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                    lambda t: t != "",
                )
            )
        ).alias("token"),
    )
    agg = tok.groupBy("token").agg(
        F.count("*").alias("df"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("doc_id")),
                lambda d: d.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )
    out = agg.filter(F.col("df") >= F.lit(min_df))
    if max_df is not None:
        out = out.filter(F.col("df") <= F.lit(max_df))
    return out.select("token", F.col("df").cast("long").alias("df"), "postings")
