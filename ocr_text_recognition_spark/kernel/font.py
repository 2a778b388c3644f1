"""Fixed 5x7 bitmap glyph atlas.

Plays the role of the reference's recognizer vocabulary: the reference uses
EasyOCR's CRAFT+CNN+CTC model over an en/vi charset
(/root/reference/src/model/ocr_model.py:26-31) and a Tesseract whitelist of
digits, A-Z, a-z and punctuation for per-cell OCR
(/root/reference/src/services/enhanced_table_ocr_service.py:249-252).

We keep the charset ASCII-upper + digits + the punctuation the reference's
numeric/grade parsing cares about (``. , - ( ) % : / + =``) so that the
``_is_numeric`` / grade-cast semantics (SURVEY.md §2.8) are exercised
end-to-end. Rendering uppercases input text; the recognizer therefore
round-trips ``text.upper()`` exactly — that normalization is part of the
engine contract and is applied to golden fixtures too.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

GLYPH_H = 7
GLYPH_W = 5
# Horizontal pixels between glyphs; >= 1 blank column separates segments.
GLYPH_SPACING = 1
# A space character renders as this many blank columns (strictly more than
# GLYPH_SPACING so word gaps are distinguishable from glyph gaps).
# 6 font px -> 18 rendered px: word gaps then measure ~20 px vs <=13 px
# intra-word gaps, an unambiguous margin even under +/-2 px shear drift
# (at 4 the narrowest word gap was 14 px — one deskew-rounding away from
# an intra-word gap)
SPACE_WIDTH = 6

_FONT: dict[str, tuple[str, ...]] = {
    "0": ("01110", "10001", "10011", "10101", "11001", "10001", "01110"),
    "1": ("00100", "01100", "00100", "00100", "00100", "00100", "01110"),
    "2": ("01110", "10001", "00001", "00010", "00100", "01000", "11111"),
    "3": ("11111", "00010", "00100", "00010", "00001", "10001", "01110"),
    "4": ("00010", "00110", "01010", "10010", "11111", "00010", "00010"),
    "5": ("11111", "10000", "11110", "00001", "00001", "10001", "01110"),
    "6": ("00110", "01000", "10000", "11110", "10001", "10001", "01110"),
    "7": ("11111", "00001", "00010", "00100", "01000", "01000", "01000"),
    "8": ("01110", "10001", "10001", "01110", "10001", "10001", "01110"),
    "9": ("01110", "10001", "10001", "01111", "00001", "00010", "01100"),
    "A": ("01110", "10001", "10001", "11111", "10001", "10001", "10001"),
    "B": ("11110", "10001", "10001", "11110", "10001", "10001", "11110"),
    "C": ("01110", "10001", "10000", "10000", "10000", "10001", "01110"),
    "D": ("11100", "10010", "10001", "10001", "10001", "10010", "11100"),
    "E": ("11111", "10000", "10000", "11110", "10000", "10000", "11111"),
    "F": ("11111", "10000", "10000", "11110", "10000", "10000", "10000"),
    "G": ("01110", "10001", "10000", "10111", "10001", "10001", "01111"),
    "H": ("10001", "10001", "10001", "11111", "10001", "10001", "10001"),
    "I": ("01110", "00100", "00100", "00100", "00100", "00100", "01110"),
    "J": ("00111", "00010", "00010", "00010", "00010", "10010", "01100"),
    "K": ("10001", "10010", "10100", "11000", "10100", "10010", "10001"),
    "L": ("10000", "10000", "10000", "10000", "10000", "10000", "11111"),
    "M": ("10001", "11011", "10101", "10101", "10001", "10001", "10001"),
    "N": ("10001", "10001", "11001", "10101", "10011", "10001", "10001"),
    "O": ("01110", "10001", "10001", "10001", "10001", "10001", "01110"),
    "P": ("11110", "10001", "10001", "11110", "10000", "10000", "10000"),
    "Q": ("01110", "10001", "10001", "10001", "10101", "10010", "01101"),
    "R": ("11110", "10001", "10001", "11110", "10100", "10010", "10001"),
    "S": ("01111", "10000", "10000", "01110", "00001", "00001", "11110"),
    "T": ("11111", "00100", "00100", "00100", "00100", "00100", "00100"),
    "U": ("10001", "10001", "10001", "10001", "10001", "10001", "01110"),
    "V": ("10001", "10001", "10001", "10001", "10001", "01010", "00100"),
    "W": ("10001", "10001", "10001", "10101", "10101", "10101", "01010"),
    "X": ("10001", "10001", "01010", "00100", "01010", "10001", "10001"),
    "Y": ("10001", "10001", "10001", "01010", "00100", "00100", "00100"),
    "Z": ("11111", "00001", "00010", "00100", "01000", "10000", "11111"),
    ".": ("00000", "00000", "00000", "00000", "00000", "01100", "01100"),
    ",": ("00000", "00000", "00000", "00000", "01100", "00100", "01000"),
    "-": ("00000", "00000", "00000", "11111", "00000", "00000", "00000"),
    "(": ("00010", "00100", "01000", "01000", "01000", "00100", "00010"),
    ")": ("01000", "00100", "00010", "00010", "00010", "00100", "01000"),
    "%": ("11000", "11001", "00010", "00100", "01000", "10011", "00011"),
    ":": ("00000", "01100", "01100", "00000", "01100", "01100", "00000"),
    "/": ("00001", "00001", "00010", "00100", "01000", "10000", "10000"),
    "+": ("00000", "00100", "00100", "11111", "00100", "00100", "00000"),
    "=": ("00000", "00000", "11111", "00000", "11111", "00000", "00000"),
}

GLYPHS: str = "".join(_FONT.keys())


@lru_cache(maxsize=1)
def glyph_atlas() -> np.ndarray:
    """(n_glyphs, 7, 5) uint8 array of ink masks (1 = ink)."""
    mats = [
        np.array([[int(b) for b in row] for row in rows], dtype=np.uint8)
        for rows in _FONT.values()
    ]
    return np.stack(mats)


@lru_cache(maxsize=1)
def glyph_index() -> dict[str, int]:
    return {ch: i for i, ch in enumerate(GLYPHS)}


def renderable(text: str) -> str:
    """Normalize text to the charset the renderer/recognizer supports.

    Uppercases and replaces unsupported characters with spaces (the
    reference's whitelist behavior: Tesseract silently drops glyphs outside
    ``tessedit_char_whitelist``). Collapses runs of spaces.
    """
    up = text.upper()
    out = [ch if (ch in _FONT or ch == " ") else " " for ch in up]
    return " ".join("".join(out).split())
