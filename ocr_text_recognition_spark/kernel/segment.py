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
# Column gap >= this many px separates words. At render SCALE=3 the widest
# intra-word gap (narrow punctuation neighbors) is 12 px and the narrowest
# word gap is 15 px; 13 splits them with margin on both sides, and the 5x5
# sigma=1 Gaussian provably preserves these gaps at this scale.
WORD_GAP_PX = 13


def connected_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """Two-pass union-find labeling, 8-connectivity.

    Returns (labels HxW int32 with 0 = background, n_labels). Row-vectorized
    union-find: per-row runs are computed with numpy; merges happen per run,
    not per pixel.
    """
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent: list[int] = [0]

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    next_label = 1
    prev_row = np.zeros(w, dtype=np.int32)
    for y in range(h):
        row = mask[y]
        if not row.any():
            prev_row = labels[y]
            continue
        # runs of consecutive ink in this row
        diff = np.diff(np.concatenate(([0], row.view(np.uint8), [0])))
        starts = np.nonzero(diff == 1)[0]
        ends = np.nonzero(diff == -1)[0]
        for s, e in zip(starts, ends):
            lo, hi = max(s - 1, 0), min(e + 1, w)  # 8-connectivity overlap
            above = prev_row[lo:hi]
            neigh = np.unique(above[above > 0])
            if len(neigh) == 0:
                lbl = next_label
                parent.append(lbl)
                next_label += 1
            else:
                lbl = int(neigh[0])
                for other in neigh[1:]:
                    union(lbl, int(other))
            labels[y, s:e] = lbl
        prev_row = labels[y]

    # resolve + compact
    roots = np.array([find(i) for i in range(next_label)], dtype=np.int32)
    remap = np.zeros(next_label, dtype=np.int32)
    uniq = np.unique(roots[1:]) if next_label > 1 else np.array([], dtype=np.int32)
    for i, r in enumerate(uniq, start=1):
        remap[roots == r] = i
    remap[0] = 0
    return remap[labels], len(uniq)


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
    """Text-line bands [(top, bottom)) from the row projection profile."""
    return _runs(mask.sum(axis=1) > 0, min_gap=2)


def segment_glyph_boxes(line_mask: np.ndarray) -> list[tuple[int, int, bool]]:
    """Per-glyph column runs within one line band.

    Returns [(left, right, space_before)] — ``space_before`` marks a word
    gap (>= WORD_GAP_PX blank columns) before this glyph.
    """
    cols = line_mask.sum(axis=0) > 0
    runs = _runs(cols, min_gap=1)
    out: list[tuple[int, int, bool]] = []
    prev_end: int | None = None
    for s, e in runs:
        space = prev_end is not None and (s - prev_end) >= WORD_GAP_PX
        out.append((s, e, space))
        prev_end = e
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
