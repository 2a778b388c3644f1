"""PDF/layout parse for ``kind='pdf'`` spans (north rule: "main-content
extraction pipeline (HTML boilerplate strip, PDF/layout parse, DOM
heuristics)").

The container has no PDF decoder library, so the *binary decode* stage
operates on a deterministic "PDF-ish" page payload — the shape a real PDF's
content stream has AFTER token decode: positioned text runs. Everything a
layout parser actually does downstream of decode is implemented for real
and golden-tested:

    %PDFISH 1.0 <page_w> <page_h>
    <x> <y> <size> <text...>        # one positioned text run per line

1. **furniture strip** — runs inside the top/bottom page margins (6% of
   page height: running headers, footers, page numbers) are dropped, the
   positional analog of the HTML path's <nav>/<footer> strip;
2. **fine-print drop** — runs with font size < MIN_FONT_PT (footnotes,
   legalese) are dropped, the text-density analog;
3. **line grouping** — remaining runs are clustered into lines by y-gap
   sessionization (gap > 0.6×font-size starts a new line) — the same
   1-D sessionize the OCR kernel uses for scanlines and the reference uses
   for token rows (/root/reference/src/services/table_ocr_service.py:260-282);
4. **reading order** — lines emit top-to-bottom, runs within a line
   left-to-right; output is newline-joined text.

Pure bytes->str and deterministic, so it runs identically in the golden
fixture path and inside the Arrow-batched pandas UDF. A real-PDF backend
(pdfminer/pypdf) would replace only the run tokenizer behind
``parse_runs``; the layout stages are format-agnostic.
"""

from __future__ import annotations

MAGIC = "%PDFISH 1.0"
MARGIN_FRAC = 0.06  # header/footer band as a fraction of page height
MIN_FONT_PT = 6.0  # runs smaller than this are fine print / footnotes
LINE_GAP_FACTOR = 0.6  # new line when y-gap exceeds this × font size


def parse_runs(payload: bytes | str) -> tuple[float, list[tuple[float, float, float, str]]]:
    """Decode the payload -> (page_height, [(x, y, size, text), ...]).

    Raises ValueError on a payload without the PDFISH magic (the caller
    maps that to an empty extraction, mirroring the OCR kernel's
    corrupt-image behavior).
    """
    text = payload.decode("utf-8", errors="replace") if isinstance(payload, bytes) else payload
    lines = text.splitlines()
    if not lines or not lines[0].startswith(MAGIC):
        raise ValueError("not a PDFISH payload")
    header = lines[0].split()
    page_h = float(header[3]) if len(header) >= 4 else 792.0
    runs = []
    for ln in lines[1:]:
        parts = ln.split(None, 3)
        if len(parts) < 4:
            continue
        try:
            x, y, size = float(parts[0]), float(parts[1]), float(parts[2])
        except ValueError:
            continue
        runs.append((x, y, size, parts[3]))
    return page_h, runs


def extract_pdf_text(payload: bytes | str | None) -> str:
    """Full layout parse: furniture strip -> fine-print drop -> y-gap line
    grouping -> reading order. Returns '' for missing/corrupt payloads."""
    if payload is None:
        return ""
    try:
        page_h, runs = parse_runs(payload)
    except ValueError:
        return ""
    top, bottom = MARGIN_FRAC * page_h, (1.0 - MARGIN_FRAC) * page_h
    body = [r for r in runs if top <= r[1] <= bottom and r[2] >= MIN_FONT_PT]
    if not body:
        return ""
    body.sort(key=lambda r: (r[1], r[0]))
    lines: list[list[tuple[float, float, float, str]]] = [[body[0]]]
    for run in body[1:]:
        prev = lines[-1][-1]
        if run[1] - prev[1] > LINE_GAP_FACTOR * max(run[2], prev[2]):
            lines.append([run])
        else:
            lines[-1].append(run)
    out = []
    for line in lines:
        line.sort(key=lambda r: (r[0], r[1]))
        out.append(" ".join(r[3] for r in line))
    return "\n".join(out)
