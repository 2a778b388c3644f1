"""Line / glyph / component segmentation (pure numpy).

Re-expresses the reference's segmentation stack:
- projection-profile line detection (/root/reference/src/services/table_ocr_service.py:150-188)
- connected-component finding <- cv2.findContours
  (/root/reference/src/services/table_ocr_service.py:84) — the north star's
  "connected-component line/word segmentation"
- 1-D gap clustering / scanline merge (/root/reference/src/services/table_ocr_service.py:176-188)
"""

from __future__ import annotations

import numpy as np

# Drop components smaller than this many pixels (speck filter; analog of the
# reference's <=10px cell-size predicate, enhanced_table_ocr_service.py:208).
# The smallest real glyph component at render SCALE=3 is '.' = 36 px; noise
# clusters that survive the median filter stay well under 20.
MIN_COMPONENT_AREA = 20
# Column gap >= this many px separates words. Measured at render SCALE=3:
# word gaps run 14-15 px and shrink to ~13 under shear drift, intra-word
# gaps run <= 12 px — EXCEPT after a narrow glyph (',' '.' ':' — ink <=
# NARROW_GLYPH_PX wide), whose mostly-empty cell inflates the following
# gap to ~13; a real space there measures ~21 px, so those gaps use the
# larger threshold.
WORD_GAP_PX = 13
NARROW_GLYPH_PX = 8
WORD_GAP_AFTER_NARROW_PX = 18


def connected_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """Union-find labeling over row-runs, 8-connectivity, fully vectorized.

    Returns (labels HxW int32 with 0 = background, n_labels), labels
    numbered in raster order of each component's first run. All per-pixel
    work is numpy: every row-run in the image is labeled with one global
    cumsum, cross-row adjacency edges come from three shifted comparisons,
    and the only Python loop is union-find over the (few) UNIQUE edges —
    the per-run python loop + np.unique sort this replaces was ~70% of
    kernel CPU on the fixture corpus.
    """
    h, w = mask.shape
    m = mask.astype(bool, copy=False)
    if not m.any():
        return np.zeros((h, w), dtype=np.int32), 0
    # global run labeling: a padding column breaks runs at row boundaries
    padded = np.zeros((h, w + 1), dtype=bool)
    padded[:, :w] = m
    flat = padded.ravel()
    is_start = flat & ~np.concatenate(([False], flat[:-1]))
    run_id = np.cumsum(is_start, dtype=np.int32)  # 1-based on ink pixels
    run_id[~flat] = 0
    run_img = run_id.reshape(h, w + 1)[:, :w]
    n_runs = int(is_start.sum())

    # adjacency edges between consecutive rows (8-connectivity = dx in
    # {-1,0,1}); encode (above_run, below_run) pairs as single ints so
    # dedup is one 1-D unique
    below = run_img[1:, :]
    above = run_img[:-1, :]
    stride = np.int64(n_runs + 1)
    keys = []
    for dx in (-1, 0, 1):
        if dx == 0:
            av, bv = above, below
        elif dx == 1:
            av, bv = above[:, :-1], below[:, 1:]
        else:
            av, bv = above[:, 1:], below[:, :-1]
        both = (av > 0) & (bv > 0)
        if both.any():
            keys.append(av[both].astype(np.int64) * stride + bv[both])
    # merge: vectorized min-label propagation over the unique edge list with
    # pointer jumping (no per-edge python union-find) — converges in a few
    # rounds since labels only ever decrease toward each component's min run
    lab = np.arange(n_runs + 1, dtype=np.int64)
    if keys:
        edges = np.unique(np.concatenate(keys))
        ea, eb = edges // stride, edges % stride
        while True:
            before = lab.copy()
            edge_min = np.minimum(lab[ea], lab[eb])
            np.minimum.at(lab, ea, edge_min)
            np.minimum.at(lab, eb, edge_min)
            while True:
                nxt = lab[lab]
                if np.array_equal(nxt, lab):
                    break
                lab = nxt
            if np.array_equal(lab, before):
                break
    roots = lab.astype(np.int32)
    uniq = np.unique(roots[1:])
    # explicit dtype: np.concatenate(([0], ...)) would promote to int64
    # and break the documented int32 label-image contract
    remap = np.empty(n_runs + 1, dtype=np.int32)
    remap[0] = 0
    remap[1:] = np.searchsorted(uniq, roots[1:]) + 1
    return remap[run_img], len(uniq)


def remove_specks(mask: np.ndarray, min_area: int = MIN_COMPONENT_AREA) -> np.ndarray:
    """Drop connected components with area < min_area."""
    if not mask.any():
        return mask
    labels, n = connected_components(mask)
    if n == 0:
        return np.zeros_like(mask)
    areas = np.bincount(labels.ravel(), minlength=n + 1)
    keep = areas >= min_area
    keep[0] = False
    return keep[labels].astype(np.uint8)


def _runs(active: np.ndarray, min_gap: int = 1) -> list[tuple[int, int]]:
    """Contiguous [start, end) runs of True, merging gaps < min_gap."""
    idx = np.nonzero(active)[0]
    if len(idx) == 0:
        return []
    breaks = np.nonzero(np.diff(idx) > min_gap)[0]
    starts = np.concatenate(([idx[0]], idx[breaks + 1]))
    ends = np.concatenate((idx[breaks] + 1, [idx[-1] + 1]))
    return list(zip(starts.tolist(), ends.tolist()))


def segment_lines(mask: np.ndarray) -> list[tuple[int, int]]:
    """Text-line bands [(top, bottom)) from the row projection profile.

    min_gap=4: multi-part glyphs whose parts stack vertically ('=', ':')
    have <= 3 blank rows between parts at render SCALE=3 and must stay one
    band; real line spacing is >= 9 blank rows."""
    return _runs(mask.sum(axis=1) > 0, min_gap=4)


def segment_glyph_boxes(line_mask: np.ndarray) -> list[tuple[int, int, bool]]:
    """Per-glyph column runs within one line band.

    Returns [(left, right, space_before)] — ``space_before`` marks a word
    gap (>= WORD_GAP_PX blank columns) before this glyph.
    """
    cols = line_mask.sum(axis=0) > 0
    runs = _runs(cols, min_gap=1)
    out: list[tuple[int, int, bool]] = []
    prev_end: int | None = None
    prev_width = 0
    for s, e in runs:
        gap_needed = (
            WORD_GAP_AFTER_NARROW_PX if prev_width <= NARROW_GLYPH_PX else WORD_GAP_PX
        )
        space = prev_end is not None and (s - prev_end) >= gap_needed
        out.append((s, e, space))
        prev_end, prev_width = e, e - s
    return out


def merge_1d(coords: np.ndarray, gap: int) -> list[int]:
    """Scanline merge: cluster sorted 1-D coords closer than ``gap``, emit
    rounded cluster means (reference table_ocr_service.py:176-188). This is
    the same gap-sessionization the Spark layer does with lag+sum windows.
    """
    if len(coords) == 0:
        return []
    coords = np.sort(np.asarray(coords))
    breaks = np.nonzero(np.diff(coords) > gap)[0]
    starts = np.concatenate(([0], breaks + 1))
    ends = np.concatenate((breaks + 1, [len(coords)]))
    return [int(round(float(coords[s:e].mean()))) for s, e in zip(starts, ends)]
