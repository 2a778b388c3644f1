"""Custom stateful streaming operator (applyInPandasWithState).

The batch pipeline's core invariant is span-sequence reassembly: every
document's spans re-emitted in original offset order. This module is the
streaming twin — spans for a document ARRIVE INCREMENTALLY across
micro-batches (the shape a crawl/ingest feed has), and per-doc_id state
accumulates them until the document's terminal ``eof`` marker arrives, at
which point the assembled document is emitted in offset order and its
state is dropped.

Scale shape: state is partitioned by doc_id (the same key the batch job
buckets on), each group's state holds only that document's spans, and the
HDFS/RocksDB state store checkpoints it — executor loss replays from the
stream checkpoint, matching the batch job's ledger semantics.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# one row per completed document, same shape as the batch pipeline output
ASSEMBLED_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)
# parallel arrays (state schemas cannot nest arrays of structs)
STATE_SCHEMA = (
    "kinds array<string>, texts array<string>, refs array<string>, "
    "offsets array<int>, done boolean"
)


DEFAULT_ORPHAN_TIMEOUT_MS = 60 * 60 * 1000  # 1h of processing time


def _make_assemble(orphan_timeout_ms: int):
    def _assemble(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Orphaned state: a doc whose eof never arrived within the
            # window, or a straggler span that arrived AFTER its doc's eof
            # (eof removes the state; the straggler would otherwise
            # recreate a group that is never emitted and never expires —
            # the unbounded leak in a long-running stream). Drop it.
            state.remove()
            return
        if state.exists:
            kinds, texts, refs, offsets, done = state.get
            kinds, texts, refs, offsets = list(kinds), list(texts), list(refs), list(offsets)
        else:
            kinds, texts, refs, offsets, done = [], [], [], [], False
        for pdf in pdf_iter:
            for r in pdf.itertuples(index=False):
                if r.kind == "eof":
                    done = True
                else:
                    kinds.append(r.kind)
                    texts.append(None if pd.isna(r.text) else r.text)
                    refs.append(None if pd.isna(r.media_ref) else r.media_ref)
                    offsets.append(int(r.offset))
        if done:
            if not offsets and not state.exists:
                # An eof with zero accumulated spans and no standing state
                # is a post-expiry straggler (the doc's spans were dropped
                # when its state timed out): suppress emission entirely so
                # downstream never sees a phantom empty document. Live
                # documents always carry >= 1 span before their eof.
                return
            order = sorted(range(len(offsets)), key=offsets.__getitem__)
            spans = [
                {"kind": kinds[i], "text": texts[i], "media_ref": refs[i], "offset": offsets[i]}
                for i in order
            ]
            state.remove()
            yield pd.DataFrame([{"doc_id": key[0], "spans": spans}])
        else:
            state.update((kinds, texts, refs, offsets, done))
            state.setTimeoutDuration(orphan_timeout_ms)

    return _assemble


def assemble_spans_stream(
    spans_stream: DataFrame, orphan_timeout_ms: int = DEFAULT_ORPHAN_TIMEOUT_MS
) -> DataFrame:
    """Stateful streaming span assembly.

    ``spans_stream``: streaming DataFrame (doc_id, kind, text, media_ref,
    offset); a row with kind='eof' marks the document complete. Emits one
    (doc_id, spans) row per completed document, spans in offset order.

    ``orphan_timeout_ms``: processing-time expiry for state whose eof
    never arrives (crawler died mid-doc, or a span arrived after its
    doc's eof and recreated state) — without it, such groups accumulate
    forever in a long-running stream. Expired docs are dropped, not
    emitted partially: the input contract is >= 1 span + exactly one eof
    per doc (at-least-once delivery), so a missing eof means the doc is
    incomplete. An eof arriving AFTER expiry (zero accumulated spans, no
    standing state) emits nothing at all — the doc vanishes rather than
    surfacing as a phantom empty document.
    """
    return spans_stream.groupBy("doc_id").applyInPandasWithState(
        _make_assemble(orphan_timeout_ms),
        ASSEMBLED_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
