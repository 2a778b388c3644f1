"""Deterministic synthetic image renderer.

Mirrors the reference's test-image builder
(/root/reference/tests/test_enhanced_table_ocr.py:33-64): white canvas,
black ink, ruled table grids drawn with straight lines, text from the fixed
glyph atlas. Variants per FIXTURES.md §2: (a) plain text lines,
(b) ruled grade table, (c) skewed copy, (d) blank/noise image.

Glyphs render at SCALE=3 (each font pixel -> 3x3 block) so strokes survive
the preprocessing chain's 5x5 Gaussian + Otsu binarization, like real
print-size text survives the reference's blur+threshold
(/root/reference/src/services/table_ocr_service.py:53-58).

Skew is modeled as an integer horizontal shear (pixel row y shifts right by
round(y * slope)) — a deterministic, exactly-invertible analog of the
reference's small-angle ``warpAffine`` deskew target
(/root/reference/src/services/table_ocr_service.py:73-110).
"""

from __future__ import annotations

import numpy as np

from ocr_text_recognition_spark.kernel.font import (
    GLYPH_H,
    GLYPH_SPACING,
    GLYPH_W,
    SPACE_WIDTH,
    glyph_atlas,
    glyph_index,
    renderable,
)

INK = 0  # black
BG = 255  # white

SCALE = 3
RGLYPH_W = GLYPH_W * SCALE  # 15 px
RGLYPH_H = GLYPH_H * SCALE  # 21 px
RSPACING = GLYPH_SPACING * SCALE  # 3 px between glyphs
RSPACE = SPACE_WIDTH * SCALE  # 18 px for a space
LINE_GAP = 8  # blank rows between text lines
MARGIN = 9

# Skew slopes the corpus generator may apply, in thousandths (must be a
# subset of imageops.DESKEW_SEARCH_SLOPES so estimation recovers exactly).
SKEW_SLOPES_MILLI = (-60, -30, 30, 60)


def text_width(text: str) -> int:
    """Rendered pixel width of normalized text."""
    if not text:
        return 0
    w = 0
    for ch in text:
        w += RSPACE if ch == " " else RGLYPH_W + RSPACING
    return w - (0 if text.endswith(" ") else RSPACING)


def draw_text(canvas: np.ndarray, text: str, top: int, left: int) -> None:
    """Stamp normalized ``text`` onto the canvas at 2x scale."""
    atlas, gidx = glyph_atlas(), glyph_index()
    x = left
    for ch in text:
        if ch == " ":
            x += RSPACE
            continue
        g = np.kron(atlas[gidx[ch]], np.ones((SCALE, SCALE), dtype=np.uint8))
        canvas[top : top + RGLYPH_H, x : x + RGLYPH_W][g == 1] = INK
        x += RGLYPH_W + RSPACING


def render_text_image(lines: list[str]) -> np.ndarray:
    """Variant (a): plain left-aligned text lines."""
    norm = [renderable(ln) for ln in lines]
    width = max([text_width(ln) for ln in norm] + [1]) + 2 * MARGIN
    height = (
        len(norm) * (RGLYPH_H + LINE_GAP) - LINE_GAP + 2 * MARGIN if norm else 2 * MARGIN
    )
    canvas = np.full((height, width), BG, dtype=np.uint8)
    y = MARGIN
    for ln in norm:
        draw_text(canvas, ln, y, MARGIN)
        y += RGLYPH_H + LINE_GAP
    return canvas


# Ruled-table geometry (reference draws 2px grid lines, cells ~100x50 px,
# /root/reference/tests/test_enhanced_table_ocr.py:38-48).
CELL_H = RGLYPH_H + 16
LINE_THICKNESS = 3
CELL_PAD = 7


def render_table_image(rows: list[list[str]]) -> np.ndarray:
    """Variant (b): ruled grid with one text value per cell."""
    norm = [[renderable(c) for c in row] for row in rows]
    ncols = max(len(r) for r in norm)
    norm = [r + [""] * (ncols - len(r)) for r in norm]
    col_w = [
        max(max(text_width(r[j]) for r in norm), RGLYPH_W) + 2 * CELL_PAD + LINE_THICKNESS
        for j in range(ncols)
    ]
    width = sum(col_w) + LINE_THICKNESS + 2 * MARGIN
    height = len(norm) * CELL_H + LINE_THICKNESS + 2 * MARGIN
    canvas = np.full((height, width), BG, dtype=np.uint8)

    xs = [MARGIN]
    for w in col_w:
        xs.append(xs[-1] + w)
    ys = [MARGIN + i * CELL_H for i in range(len(norm) + 1)]
    for y in ys:  # horizontal rules
        canvas[y : y + LINE_THICKNESS, xs[0] : xs[-1] + LINE_THICKNESS] = INK
    for x in xs:  # vertical rules
        canvas[ys[0] : ys[-1] + LINE_THICKNESS, x : x + LINE_THICKNESS] = INK

    for i, row in enumerate(norm):
        for j, val in enumerate(row):
            if not val:
                continue
            draw_text(
                canvas,
                val,
                ys[i] + LINE_THICKNESS + (CELL_H - LINE_THICKNESS - RGLYPH_H) // 2,
                xs[j] + LINE_THICKNESS + CELL_PAD,
            )
    return canvas


def shear_image(img: np.ndarray, slope_milli: int) -> np.ndarray:
    """Variant (c): integer horizontal shear by slope_milli/1000 px per row."""
    h, w = img.shape
    shifts = np.round(np.arange(h) * (slope_milli / 1000.0)).astype(np.int64)
    lo = int(min(shifts.min(), 0))
    extra = int(shifts.max() - lo)
    out = np.full((h, w + extra), BG, dtype=np.uint8)
    for y in range(h):
        s = -lo + int(shifts[y])
        out[y, s : s + w] = img[y]
    return out


def render_noise_image(rng: np.random.Generator, height: int = 64, width: int = 128) -> np.ndarray:
    """Variant (d): sparse salt-noise dots; recognizer must return ''."""
    canvas = np.full((height, width), BG, dtype=np.uint8)
    n = int(height * width * 0.01)
    ys = rng.integers(0, height, n)
    xs = rng.integers(0, width, n)
    canvas[ys, xs] = INK
    return canvas
