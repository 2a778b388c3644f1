"""Snapshot diff — the changelog between two corpus versions.

Recurring-crawl pipelines re-ingest the same sources and need to know
what actually changed before spending compute downstream: only `added`
and `changed` documents re-enter extraction/dedup, `removed` ids
propagate as deletes to derived tables. Comparing full payloads would
move the whole corpus through the join twice, so each side reduces to
(id, md5(payload)) first — the join then shuffles two narrow columns,
co-partitioned on the id key, and the full-outer join classifies every
id in one pass. `unchanged` rows (the overwhelming majority between
consecutive crawls) are dropped before anything else sees them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """(id, status) for every id whose presence or payload hash differs
    between ``old`` and ``new``; status in added / removed / changed."""
    def hashed(df: DataFrame, name: str) -> DataFrame:
        # concat_ws silently SKIPS NULL columns, so (NULL,'a') and
        # ('a',NULL) — or NULL vs '' — would hash identically and be
        # misclassified as unchanged. Coalesce each column to a sentinel
        # containing \x00 — a byte text payloads essentially never carry
        # (binary-ish columns cast to string COULD, so the encoding is
        # not strictly injective; if such columns matter, hash a per-
        # column null bitmap alongside) — so NULLs are distinguishable
        # both from empty strings and by position.
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL\x00"))
            for c in payload_cols
        ]
        return df.select(
            F.col(id_col),
            F.md5(F.concat_ws("\x1f", *parts)).alias(name),
        )

    j = hashed(old, "old_h").join(hashed(new, "new_h"), id_col, "full_outer")
    status = (
        F.when(F.col("old_h").isNull(), F.lit("added"))
        .when(F.col("new_h").isNull(), F.lit("removed"))
        .when(F.col("old_h") != F.col("new_h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(id_col, status.alias("status")).filter(
        F.col("status") != "unchanged"
    )


def apply_changelog(
    old: DataFrame,
    changes: DataFrame,
    new_payloads: DataFrame,
    id_col: str,
) -> DataFrame:
    """Rebuild the NEW snapshot from the old one plus a
    ``snapshot_diff`` changelog — the incremental-recompute consumer:
    the standing corpus is only touched by one id-keyed anti-join
    (evicting removed + stale-changed rows), and only the O(|changes|)
    added/changed payloads are read from the new crawl. Invariant
    (pinned by the q104 oracle): apply(old, diff(old, new), new) == new,
    row for row."""
    touched = changes.select(id_col)
    upsert_ids = changes.filter(F.col("status") != "removed").select(id_col)
    kept = old.join(touched, id_col, "left_anti")
    incoming = new_payloads.join(upsert_ids, id_col, "left_semi")
    return kept.unionByName(incoming)
