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


RESIDUAL_SHEAR_PX = 2  # tolerate ±this much x-drift across a glyph's height


def _shear_px(up: np.ndarray, total_px: int) -> np.ndarray:
    """Shear an upscaled glyph bitmap by ``total_px`` columns across its
    height (linear, rounded per row) on a widened canvas."""
    h, w = up.shape
    out = np.zeros((h, w + abs(total_px)), dtype=up.dtype)
    for y in range(h):
        s = int(round(y * total_px / max(h - 1, 1)))
        if total_px < 0:
            s += abs(total_px)
        out[y, s : s + w] = up[y]
    return out


@lru_cache(maxsize=1)
def _template_tensor() -> tuple[np.ndarray, np.ndarray, int, np.ndarray]:
    """(templates (n, H, Wmax) int8 zero-padded, widths (n,), Wmax,
    labels (n,) glyph index). Templates are column-cropped to their ink
    range (rows kept, so vertical position distinguishes '.' from '-').
    Each glyph contributes ±RESIDUAL_SHEAR_PX pre-sheared variants, making
    recognition tolerant to the small residual shear the deskew estimator
    cannot detect (implied shift below stroke scale on short images)."""
    cropped: list[np.ndarray] = []
    labels: list[int] = []
    for gi, g in enumerate(glyph_atlas()):
        up = np.kron(g, np.ones((SCALE, SCALE), dtype=np.uint8))
        for spx in range(-RESIDUAL_SHEAR_PX, RESIDUAL_SHEAR_PX + 1):
            cropped.append(_crop_to_cols(_shear_px(up, spx) if spx else up))
            labels.append(gi)
    wmax = max(c.shape[1] for c in cropped)
    t = np.zeros((len(cropped), RGLYPH_H, wmax), dtype=np.int8)
    widths = np.zeros(len(cropped), dtype=np.int64)
    for i, c in enumerate(cropped):
        t[i, :, : c.shape[1]] = c
        widths[i] = c.shape[1]
    return t, widths, wmax, np.asarray(labels, dtype=np.int64)



@lru_cache(maxsize=1)
def _exact_lookup() -> dict[bytes, int]:
    """bitmap -> glyph index; keys colliding across DIFFERENT glyphs are
    dropped (the logits path then decides)."""
    t, widths, _, labels = _template_tensor()
    out: dict[bytes, int] = {}
    bad: set[bytes] = set()
    for i in range(len(widths)):
        key = t[i, :, : widths[i]].astype(np.uint8).tobytes()
        gi = int(labels[i])
        if key in out and out[key] != gi:
            bad.add(key)
        out.setdefault(key, gi)
    for key in bad:
        del out[key]
    return out


@lru_cache(maxsize=1)
def _bbox_template_tensor() -> tuple[np.ndarray, np.ndarray, dict[bytes, int]]:
    """Templates cropped to their ink bounding box (rows AND cols) on a
    common zero-padded canvas + an exact-bitmap lookup. All 46 bbox
    bitmaps are pairwise distinct (verified), so position-free matching is
    unambiguous for clean shapes."""
    boxes = []
    for g in glyph_atlas():
        up = np.kron(g, np.ones((SCALE, SCALE), dtype=np.uint8))
        rs = np.nonzero(up.sum(axis=1))[0]
        cs = np.nonzero(up.sum(axis=0))[0]
        boxes.append(up[rs[0] : rs[-1] + 1, cs[0] : cs[-1] + 1])
    hmax = max(b.shape[0] for b in boxes)
    wmax = max(b.shape[1] for b in boxes)
    t = np.zeros((len(boxes), hmax, wmax), dtype=np.int8)
    exact: dict[bytes, int] = {}
    dims = np.zeros((len(boxes), 2), dtype=np.int64)
    for i, b in enumerate(boxes):
        t[i, : b.shape[0], : b.shape[1]] = b
        dims[i] = b.shape
        exact[b.tobytes() + _shape_key(b.shape)] = i
    return t, dims, exact



def _classify_bbox(cell: np.ndarray) -> tuple[str, float]:
    """Position-free classification by ink bounding box — used when the
    line band is shorter than the glyph cell (a line of only short glyphs
    like '.', '-', '='), where the glyph's vertical position inside its
    cell is unrecoverable from the band crop."""
    rs = np.nonzero(cell.sum(axis=1))[0]
    cs = np.nonzero(cell.sum(axis=0))[0]
    bb = cell[rs[0] : rs[-1] + 1, cs[0] : cs[-1] + 1].astype(np.uint8)
    t, dims, exact = _bbox_template_tensor()
    hit = exact.get(bb.tobytes() + _shape_key(bb.shape))
    if hit is not None:
        return GLYPHS[hit], 1.0
    ch = max(bb.shape[0], t.shape[1])
    cw = max(bb.shape[1], t.shape[2])
    canvas = np.zeros((ch, cw), dtype=np.int8)
    canvas[: bb.shape[0], : bb.shape[1]] = bb
    # score each template at BOTH top- and bottom-aligned placements and
    # keep the better: glyphs that hang below the baseline (',') only
    # match their tail when bottom-aligned, while top-alignment would
    # let a smaller dense glyph ('.') absorb the body and win
    tt_top = np.zeros((t.shape[0], ch, cw), dtype=np.int8)
    tt_top[:, : t.shape[1], : t.shape[2]] = t
    tt_bot = np.zeros((t.shape[0], ch, cw), dtype=np.int8)
    for i in range(t.shape[0]):
        h_i = int(dims[i, 0])
        tt_bot[i, ch - h_i : ch, : t.shape[2]] = t[i, :h_i, :]
    agree = np.maximum(
        (tt_top == canvas[None, :, :]).mean(axis=(1, 2)),
        (tt_bot == canvas[None, :, :]).mean(axis=(1, 2)),
    )
    # Near-ties (blur drift on small glyphs makes pixel agreement alone
    # ambiguous: a blurred ',' scores identically to '.') break by ink
    # bounding-box dimension closeness — the blurred ',' is still 9px tall
    # vs the 6px '.', so the shape prior resolves what agreement cannot.
    best_score = float(agree.max())
    cand = np.nonzero(agree >= best_score - 0.003)[0]
    if len(cand) > 1:
        mism = np.abs(dims[cand, 0] - bb.shape[0]) + np.abs(dims[cand, 1] - bb.shape[1])
        order = sorted(
            range(len(cand)), key=lambda j: (int(mism[j]), -float(agree[cand[j]]), int(cand[j]))
        )
        best = int(cand[order[0]])
    else:
        best = int(cand[0])
    return GLYPHS[best], float(agree[best])


# Per-process classification memo: blur+binarize shifts glyph bitmaps off
# the clean-template exact lookup, but the SAME blurred bitmap recurs
# thousands of times across a corpus rendered from one font — scoring it
# once and caching by bitmap turns the hot path into a dict hit. Bounded:
# distinct observed bitmaps are O(glyphs x blur/shear variants), far below
# the cap; on overflow new entries are simply not cached (deterministic
# results either way).
_CLASSIFY_MEMO: dict[bytes, tuple[str, float]] = {}
_CLASSIFY_MEMO_CAP = 200_000


def _shape_key(shape: tuple[int, int]) -> bytes:
    """Shape tag for bitmap dict keys. NOT bytes(shape): that treats the
    dims as a byte SEQUENCE and raises ValueError for any dimension >=
    256 (a tall scan band or a wide merged-glyph run)."""
    return shape[0].to_bytes(4, "little") + shape[1].to_bytes(4, "little")


def classify_glyph(cell: np.ndarray) -> tuple[str, float]:
    """One glyph segment (line-band height x run width, binary) ->
    (char, confidence). Returns ('', 0.0) for empty segments."""
    if not cell.any():
        return "", 0.0
    key = cell.astype(np.uint8).tobytes() + _shape_key(cell.shape)
    memo = _CLASSIFY_MEMO.get(key)
    if memo is not None:
        return memo
    res = _classify_uncached(cell)
    if len(_CLASSIFY_MEMO) < _CLASSIFY_MEMO_CAP:
        _CLASSIFY_MEMO[key] = res
    return res


def _classify_uncached(cell: np.ndarray) -> tuple[str, float]:
    templates, widths, wmax, labels = _template_tensor()
    h, w = cell.shape
    if h < RGLYPH_H:
        return _classify_bbox(cell)
    elif h > RGLYPH_H:
        cell = cell[:RGLYPH_H]
    hit = _exact_lookup().get(cell.astype(np.uint8).tobytes())
    if hit is not None:
        return GLYPHS[hit], 1.0
    # Logits: agreement with every template in one vectorized comparison on
    # a common canvas of width max(w, wmax); both sides zero-padded, so
    # extra ink on either side counts against the score symmetrically.
    # (A BLAS matvec form of this was tried and reverted: tiny-matrix
    # matmul is pathological on this box — per-call thread spin-up costs
    # ~25x the broadcast compare. The memo above makes cold-path cost
    # mostly irrelevant anyway.)
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
    return GLYPHS[int(labels[best])], float(agree[best])


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
