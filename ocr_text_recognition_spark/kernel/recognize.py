"""Glyph recognizer — the deterministic stand-in for the reference's
EasyOCR CNN+CTC greedy decoder (/root/reference/src/model/ocr_model.py:109,
SURVEY.md §2.10, step-3 decision in §7).

Per detected glyph segment we compute a logit vector over the atlas
(template-agreement scores, one vectorized tensor comparison against ALL
templates at once) and greedily take the argmax — the same
classify-then-greedy-decode shape as CTC greedy decoding, with explicit
segmentation supplying the frame boundaries. An exact-bitmap lookup fast
path handles the clean case.

Confidence: exact match -> 1.0; tensor match -> best agreement in [0,1].
Segments scoring below MIN_CONFIDENCE are dropped, mirroring the
reference's conf>0.5 filter (/root/reference/src/model/ocr_model.py:113-115).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ocr_text_recognition_spark.kernel import segment
from ocr_text_recognition_spark.kernel.font import GLYPHS, glyph_atlas
from ocr_text_recognition_spark.kernel.render import RGLYPH_H, SCALE

MIN_CONFIDENCE = 0.5


def _crop_to_cols(g: np.ndarray) -> np.ndarray:
    cols = np.nonzero(g.sum(axis=0))[0]
    return g[:, cols[0] : cols[-1] + 1]


@lru_cache(maxsize=1)
def _template_tensor() -> tuple[np.ndarray, np.ndarray, int]:
    """(templates (n, H, Wmax) int8 zero-padded, widths (n,), Wmax).
    Templates are column-cropped to their ink range (rows kept, so vertical
    position distinguishes '.' from '-')."""
    cropped = []
    for g in glyph_atlas():
        up = np.kron(g, np.ones((SCALE, SCALE), dtype=np.uint8))
        cropped.append(_crop_to_cols(up))
    wmax = max(c.shape[1] for c in cropped)
    t = np.zeros((len(cropped), RGLYPH_H, wmax), dtype=np.int8)
    widths = np.zeros(len(cropped), dtype=np.int64)
    for i, c in enumerate(cropped):
        t[i, :, : c.shape[1]] = c
        widths[i] = c.shape[1]
    return t, widths, wmax


@lru_cache(maxsize=1)
def _exact_lookup() -> dict[bytes, int]:
    t, widths, _ = _template_tensor()
    return {t[i, :, : widths[i]].astype(np.uint8).tobytes(): i for i in range(len(widths))}


def classify_glyph(cell: np.ndarray) -> tuple[str, float]:
    """One glyph segment (line-band height x run width, binary) ->
    (char, confidence). Returns ('', 0.0) for empty segments."""
    if not cell.any():
        return "", 0.0
    templates, widths, wmax = _template_tensor()
    h, w = cell.shape
    if h < RGLYPH_H:
        cell = np.pad(cell, ((0, RGLYPH_H - h), (0, 0)))
    elif h > RGLYPH_H:
        cell = cell[:RGLYPH_H]
    hit = _exact_lookup().get(cell.astype(np.uint8).tobytes())
    if hit is not None:
        return GLYPHS[hit], 1.0
    # Logits: agreement with every template in one vectorized comparison on
    # a common canvas of width max(w, wmax); both sides zero-padded, so
    # extra ink on either side counts against the score symmetrically.
    cw = max(w, wmax)
    canvas = np.zeros((RGLYPH_H, cw), dtype=np.int8)
    canvas[:, :w] = cell
    if cw == wmax:
        tt = templates
    else:
        tt = np.zeros((templates.shape[0], RGLYPH_H, cw), dtype=np.int8)
        tt[:, :, :wmax] = templates
    agree = (tt == canvas[None, :, :]).mean(axis=(1, 2))
    best = int(np.argmax(agree))
    return GLYPHS[best], float(agree[best])


def recognize_line(line_mask: np.ndarray) -> str:
    """One text-line band -> decoded string (greedy per-segment argmax)."""
    if not line_mask.any():
        return ""
    out: list[str] = []
    for left, right, space_before in segment.segment_glyph_boxes(line_mask):
        ch, conf = classify_glyph(line_mask[:, left:right])
        if conf < MIN_CONFIDENCE:
            continue
        if space_before and out:
            out.append(" ")
        out.append(ch)
    return "".join(out)


def recognize_text(mask: np.ndarray) -> str:
    """Cleaned ink mask -> newline-joined text in reading order.

    Reading order = line bands top-to-bottom, glyphs left-to-right — the
    reference's sort-by-(top,left) (/root/reference/src/services/table_ocr_service.py:258)
    followed by '\\n'.join (/root/reference/src/model/ocr_model.py:117).
    Expects a despeckled mask (preprocess_image removes specks once per
    image; see kernel/reference_kernel.py)."""
    lines = []
    for top, bottom in segment.segment_lines(mask):
        txt = recognize_line(mask[top:bottom])
        if txt.strip():
            lines.append(txt.strip())
    return "\n".join(lines)
