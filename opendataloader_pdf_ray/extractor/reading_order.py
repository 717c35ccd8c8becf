"""Reading-order sort for absolutely-positioned content.

XY-Cut++-style recursive projection segmentation
(``core/processors/readingorder/XYCutPlusPlusSorter.java:82-651``,
arXiv:2504.10258), re-expressed for HTML blocks that carry a pixel bbox:

1. pre-mask cross-layout elements (width ≥ β·max_width overlapping ≥2 others),
2. recursive largest-projection-gap split (gap ≥ MIN_GAP, horizontal first),
3. fallback sort by (top, left),
4. merge masked cross-layout elements back by vertical position.

This is an **intra-row** sort (one document at a time) — never a Dataset-level
sort (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from .blocks import Block

MIN_GAP = 5.0
CROSS_LAYOUT_BETA = 0.9


def _gaps(intervals: List[Tuple[float, float]]) -> List[Tuple[float, float]]:
    """Maximal gaps in the union of 1-D intervals."""
    intervals = sorted(intervals)
    gaps = []
    cur_end = intervals[0][1]
    for start, end in intervals[1:]:
        if start > cur_end:
            gaps.append((cur_end, start))
        cur_end = max(cur_end, end)
    return gaps


def _best_gap(items: List[Block], axis: int) -> float:
    """Size of the largest projection gap along axis (0=x, 1=y); 0 if none."""
    if axis == 0:
        intervals = [(b.bbox[0], b.bbox[2]) for b in items]
    else:
        intervals = [(b.bbox[1], b.bbox[3]) for b in items]
    gaps = [g[1] - g[0] for g in _gaps(intervals) if g[1] - g[0] >= MIN_GAP]
    return max(gaps) if gaps else 0.0


def _split(items: List[Block], axis: int) -> List[List[Block]]:
    """Split on the largest projection gap along axis (0=x, 1=y); empty if none."""
    if axis == 0:
        intervals = [(b.bbox[0], b.bbox[2]) for b in items]
    else:
        intervals = [(b.bbox[1], b.bbox[3]) for b in items]
    gaps = [g for g in _gaps(intervals) if g[1] - g[0] >= MIN_GAP]
    if not gaps:
        return []
    cut = max(gaps, key=lambda g: g[1] - g[0])
    mid = (cut[0] + cut[1]) / 2.0
    lo = [b for b in items if (b.bbox[0] if axis == 0 else b.bbox[1]) < mid]
    hi = [b for b in items if (b.bbox[0] if axis == 0 else b.bbox[1]) >= mid]
    if not lo or not hi:
        return []
    return [lo, hi]


def _recurse(items: List[Block], out: List[Block]) -> None:
    if len(items) <= 1:
        out.extend(items)
        return
    # largest projection gap wins the axis choice (XYCutPlusPlusSorter's
    # gap-priority segmentation); ties prefer the horizontal cut (y axis)
    gap_y = _best_gap(items, axis=1)
    gap_x = _best_gap(items, axis=0)
    axis = 1 if gap_y >= gap_x and gap_y > 0 else (0 if gap_x > 0 else -1)
    if axis >= 0:
        parts = _split(items, axis=axis)
        if parts:
            key_dim = 1 if axis == 1 else 0
            for part in sorted(parts, key=lambda p: min(b.bbox[key_dim] for b in p)):
                _recurse(part, out)
            return
    # fallback geometric sort (XYCutPlusPlusSorter fallback: (−topY, leftX))
    out.extend(sorted(items, key=lambda b: (b.bbox[1], b.bbox[0])))


def xy_cut_sort(blocks: Sequence[Block]) -> List[Block]:
    """Sort positioned blocks into reading order. Deterministic; stable for ties."""
    items = [b for b in blocks if b.bbox is not None]
    if len(items) <= 1:
        return list(items)
    max_width = max(b.bbox[2] - b.bbox[0] for b in items)
    cross: List[Block] = []
    body: List[Block] = []
    for b in items:
        width = b.bbox[2] - b.bbox[0]
        overlaps = sum(
            1 for o in items
            if o is not b and not (o.bbox[2] <= b.bbox[0] or o.bbox[0] >= b.bbox[2])
        )
        if width >= CROSS_LAYOUT_BETA * max_width and overlaps >= 2:
            cross.append(b)
        else:
            body.append(b)
    out: List[Block] = []
    _recurse(body, out)
    # Y-merge cross-layout elements back by top coordinate
    for c in sorted(cross, key=lambda b: (b.bbox[1], b.bbox[0])):
        idx = len(out)
        for i, b in enumerate(out):
            if b.bbox[1] > c.bbox[1]:
                idx = i
                break
        out.insert(idx, c)
    return out


def order_page(blocks: List[Block]) -> List[Block]:
    """Apply reading order to one page: flow blocks (no bbox) keep DOM order;
    the positioned group is XY-cut-sorted and spliced in at the position of its
    first member."""
    positioned = [b for b in blocks if b.bbox is not None]
    if len(positioned) <= 1:
        return blocks
    ordered = xy_cut_sort(positioned)
    out: List[Block] = []
    inserted = False
    for b in blocks:
        if b.bbox is None:
            out.append(b)
        elif not inserted:
            out.extend(ordered)
            inserted = True
    return out
