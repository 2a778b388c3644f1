"""PDF/layout parse (extraction/pdflayout.py) — unit + end-to-end.

North rule: "main-content extraction pipeline (HTML boilerplate strip,
PDF/layout parse, DOM heuristics)". The layout stages (furniture strip,
fine-print drop, y-gap line grouping, reading order) are golden-tested
through the same span-sequence-equality pipeline as the other two kinds.
"""

from __future__ import annotations

from ocr_text_recognition_spark.extraction.pdflayout import extract_pdf_text


def _page(runs: list[str], w: float = 612, h: float = 792) -> bytes:
    return "\n".join([f"%PDFISH 1.0 {w:g} {h:g}", *runs]).encode()


def test_reading_order_and_line_grouping():
    # out-of-order input; two runs share a line (y 100 vs 103, size 11)
    payload = _page(
        [
            "300 103 11 world",
            "50 200 11 second line",
            "50 100 11 hello",
        ]
    )
    assert extract_pdf_text(payload) == "hello world\nsecond line"


def test_furniture_and_fine_print_stripped():
    payload = _page(
        [
            "50 10 9 running header",  # top margin (<6% of 792)
            "300 780 9 page 7",  # bottom margin
            "50 400 11 body text",
            "50 420 4 tiny footnote",  # size < 6
        ]
    )
    assert extract_pdf_text(payload) == "body text"


def test_corrupt_and_empty_payloads():
    assert extract_pdf_text(None) == ""
    assert extract_pdf_text(b"\x89PNG not a pdfish payload") == ""
    assert extract_pdf_text(_page([])) == ""
    assert extract_pdf_text(_page(["50 10 9 only furniture"])) == ""


def test_pipeline_pdf_spans_golden_equality(spark):
    """End-to-end: corpus with kind='pdf' spans through run_extraction
    matches the plain-python golden path (span-sequence equality)."""
    from ocr_text_recognition_spark import corpus
    from ocr_text_recognition_spark.extraction.pipeline import run_extraction
    from ocr_text_recognition_spark.io_pandas import pandas_to_spark

    docs_pd, media_pd = corpus.make_corpus(16, seed=5, pdf_fraction=0.6)
    kinds = {s["kind"] for spans in docs_pd["spans"] for s in spans}
    assert "pdf" in kinds  # the corpus really exercises the branch
    golden_pd = corpus.make_golden(docs_pd, media_pd)

    docs = pandas_to_spark(spark, docs_pd, "documents")
    media = pandas_to_spark(spark, media_pd, "media")
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in run_extraction(spark, docs, media).collect()
    }
    want = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for _, r in golden_pd.iterrows()
    }
    assert got == want
    # at least one extracted pdf span is non-empty and multi-line
    pdf_texts = [t for spans in want.values() for k, t, _, _ in spans if k == "pdf"]
    assert any("\n" in t for t in pdf_texts)
