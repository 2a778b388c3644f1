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


def bm25_topk(
    docs: DataFrame,
    query_tokens: list[str],
    id_col: str,
    text_col: str,
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k retrieval over a document table — the ranked-search
    primitive next to ``inverted_index`` (same tokenizer), and the
    retrieval half of retrieval-based curation (dedup against a seed
    set, eval-set decontamination by lexical match, RAG corpus probes).

    Pure DataFrame ops, shaped for 100 TB:

    - the (doc, token) explode is FILTERED to the query's tokens before
      any aggregation, so per-query work scales with posting-list sizes
      (like a real index probe), not corpus token count; only the
      doc-length table ``dl`` scans everything, and that aggregate is
      map-side combined on the doc key;
    - corpus scalars (N, avgdl) ride the established 1-row broadcast
      crossJoin idiom — never a driver collect;
    - idf is the Robertson/Sparck-Jones ln(1 + (N - df + .5)/(df + .5))
      form (always positive, no stop-word negative scores);
    - final ranking orders by the ROUNDED score (4 dp) with doc_id
      tiebreak, so cross-engine float ulp drift cannot reorder the
      top-k boundary; global top-k compiles to TakeOrderedAndProject.
    """
    from .textanalysis import tokens

    toks = [t.lower() for t in query_tokens]
    tok = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    qtok = tok.filter(F.col("token").isin(toks))
    tf = qtok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    # tf already holds exactly one row per (doc, token), so document
    # frequency is a count over tf — no second distinct/aggregation pass
    # over the exploded tokens
    dfc = tf.groupBy("token").agg(F.count("*").alias("df"))
    scalars = F.broadcast(
        dl.agg(
            F.count("*").alias("n_docs"),
            (F.sum("dl") / F.count("*")).alias("avgdl"),
        )
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dfc), "token")
        .crossJoin(scalars)
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )
