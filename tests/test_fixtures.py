"""The committed oracle fixtures (fixtures/*.parquet) must stay in lockstep
with the kernel: regenerate both via scripts/make_fixtures.py's builders and
assert value equality with the committed files. A kernel change that alters
extraction output without re-running make_fixtures.py fails here before the
driver's correctness gate ever sees a q29/q30 mismatch."""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from make_fixtures import FIXTURE_DIR, golden_spans_table, image_meta_table


def test_golden_spans_fixture_current():
    committed = pq.read_table(os.path.join(FIXTURE_DIR, "golden_spans_24.parquet"))
    regenerated = golden_spans_table()
    assert committed.num_rows == regenerated.num_rows == 24
    assert committed.column("doc_id").to_pylist() == regenerated.column("doc_id").to_pylist()
    assert committed.column("spans").to_pylist() == regenerated.column("spans").to_pylist()


def test_image_meta_fixture_current():
    committed = pq.read_table(os.path.join(FIXTURE_DIR, "image_meta_16.parquet"))
    regenerated = image_meta_table()
    assert committed.to_pylist() == regenerated.to_pylist()
    assert all(r["valid"] for r in committed.to_pylist())


def test_resized_meta_fixture_current():
    from make_fixtures import resized_meta_table

    committed = pq.read_table(os.path.join(FIXTURE_DIR, "resized_meta_16.parquet"))
    assert committed.to_pylist() == resized_meta_table().to_pylist()
