"""Glyph recognizer — the deterministic stand-in for the reference's
EasyOCR CNN+CTC greedy decoder (/root/reference/src/model/ocr_model.py:109,
SURVEY.md §2.10, step-3 decision in §7).

Per detected glyph segment we compute a logit vector over the atlas
(template-correlation scores) and greedily take the argmax — the same
classify-then-greedy-decode shape as CTC greedy decoding, but with explicit
segmentation supplying the frame boundaries. An exact-bitmap lookup fast
path handles the (common) clean case; the correlation path is the fallback
for blur/deskew artifacts.

Confidence: exact match -> 1.0; correlation match -> best score in [0,1].
Segments scoring below MIN_CONFIDENCE are dropped, mirroring the
reference's conf>0.5 filter (/root/reference/src/model/ocr_model.py:113-115).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ocr_text_recognition_spark.kernel import imageops, segment
from ocr_text_recognition_spark.kernel.font import GLYPHS, glyph_atlas
from ocr_text_recognition_spark.kernel.render import SCALE

MIN_CONFIDENCE = 0.5


def _crop_to_cols(g: np.ndarray) -> np.ndarray:
    cols = np.nonzero(g.sum(axis=0))[0]
    return g[:, cols[0] : cols[-1] + 1]


@lru_cache(maxsize=1)
def _atlas_colcropped() -> list[np.ndarray]:
    """Atlas glyphs at render scale, cropped to their ink column range
    (rows kept so vertical position distinguishes '.' from '-' etc.)."""
    out = []
    for g in glyph_atlas():
        up = np.kron(g, np.ones((SCALE, SCALE), dtype=np.uint8))
        out.append(_crop_to_cols(up))
    return out


@lru_cache(maxsize=1)
def _exact_lookup() -> dict[bytes, int]:
    return {g.tobytes(): i for i, g in enumerate(_atlas_colcropped())}


def classify_glyph(cell: np.ndarray) -> tuple[str, float]:
    """One glyph segment (full line-band height x run width, binary) ->
    (char, confidence). Returns ('', 0.0) for empty segments."""
    if not cell.any():
        return "", 0.0
    templates = _atlas_colcropped()
    th = templates[0].shape[0]  # render-scale glyph height
    # Normalize band height to the glyph box: pad/crop at the bottom
    # (line bands are anchored at the tallest glyph's top row).
    h, w = cell.shape
    if h < th:
        cell = np.pad(cell, ((0, th - h), (0, 0)))
    elif h > th:
        cell = cell[:th]
    # Exact fast path
    hit = _exact_lookup().get(cell.tobytes())
    if hit is not None:
        return GLYPHS[hit], 1.0
    # Logits: normalized pixel agreement vs each column-cropped template.
    best_i, best_score = -1, -1.0
    for i, t in enumerate(templates):
        tw = t.shape[1]
        if tw >= w:
            c = np.pad(cell, ((0, 0), (0, tw - w)))
            score = float((c == t).mean())
        else:
            c = cell[:, :tw]
            # penalize candidate ink beyond the template width
            extra = float(cell[:, tw:].sum()) / cell.size
            score = float((c == t).mean()) - extra
        if score > best_score:
            best_score, best_i = score, i
    return GLYPHS[best_i], max(min(best_score, 1.0), 0.0)


def recognize_line(line_mask: np.ndarray) -> str:
    """One text-line band -> decoded string (greedy per-segment argmax)."""
    # Anchor the band at its own ink top so glyph rows align to the atlas.
    rows = np.nonzero(line_mask.sum(axis=1))[0]
    if len(rows) == 0:
        return ""
    # Low glyphs like '.' have ink only in the bottom rows; anchoring at the
    # ink top would misalign them, so keep the band top as-is when the band
    # is already glyph-height, else trim leading blank rows.
    band = line_mask
    out: list[str] = []
    for left, right, space_before in segment.segment_glyph_boxes(band):
        ch, conf = classify_glyph(band[:, left:right])
        if conf < MIN_CONFIDENCE:
            continue
        if space_before and out:
            out.append(" ")
        out.append(ch)
    return "".join(out)


def recognize_text(mask: np.ndarray) -> str:
    """Full ink mask -> newline-joined text in reading order.

    Reading order = line bands top-to-bottom, glyphs left-to-right — the
    reference's sort-by-(top,left) (/root/reference/src/services/table_ocr_service.py:258)
    followed by '\\n'.join (/root/reference/src/model/ocr_model.py:117).
    """
    clean = segment.remove_specks(mask)
    lines = []
    for top, bottom in segment.segment_lines(clean):
        txt = recognize_line(clean[top:bottom])
        if txt.strip():
            lines.append(txt.strip())
    return "\n".join(lines)
