"""Multi-predicate index lookup: AND-compose secondary indexes into one
serving read.

``index_lookup(lake, eq=..., ranges=...)`` answers
``WHERE colA IN (...) AND colB BETWEEN lo AND hi [AND ...]`` by
intersecting each predicate's FOLLOWER keyspace — the column index
(colindex.py) for equality terms, the range index (rangeindex.py) for
range terms — and hash-routing only the surviving keys to the lake for
payload rows. No lake partition is folded; the read cost is

    sum_over_predicates(O(matching postings))  +  O(|surviving keys|)

i.e. bounded by the most selective term's posting volume once the
intersection is applied, never by lake size. This is the degenerate-but-
load-bearing form of an index-intersection query planner (bitmap-AND in a
classical RDBMS): predicates evaluate independently against slim
keyspaces and only their conjunction touches wide rows.

Missing indexes fail loudly (building one is a one-command follower
refresh) — silently falling back to a full scan would hide a 10^5× cost
cliff at 100 TB.

Scale note: this is the SERVING path (in-process index reads, like
``search_local``); the posting lists of each predicate DO land in this
process. Batch analytics with low-selectivity predicates should instead
filter ``lake.read_dataset()`` — full-fold cost, but streaming and
distributed.

Reference parity: no counterpart (single-corpus converter); the analog is
multi-index AND planning re-expressed over the follower-keyspace design.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa

from .colindex import ColumnIndex, col_index_root
from .lake import Lake
from .rangeindex import RangeIndex, range_index_root


def index_lookup(lake: Lake,
                 eq: Optional[Dict[str, Sequence]] = None,
                 ranges: Optional[Dict[str, Tuple]] = None,
                 as_of: Optional[int] = None,
                 rows: bool = True):
    """Keys (and, with ``rows=True``, payload rows) satisfying EVERY
    predicate: ``eq={col: [v, ...]}`` (value IN list, via the column
    index), ``ranges={col: (lo, hi)}`` (inclusive BETWEEN, via the range
    index). Returns ``(keys, table_or_None)``; at least one predicate is
    required. ``as_of`` time-travels both the indexes and the payload
    lookup to the same epoch."""
    if not eq and not ranges:
        raise ValueError("index_lookup needs at least one predicate")
    surviving: Optional[set] = None

    def _and(keys: set) -> None:
        nonlocal surviving
        surviving = keys if surviving is None else (surviving & keys)

    for col, values in (eq or {}).items():
        root = col_index_root(lake.root, col)
        if not lake.fs.exists(root):
            raise ValueError(
                f"no column index on {col!r} (expected {root}); build one "
                f"with `col-index {lake.root} {col}`")
        hits = ColumnIndex(root).scan_local(
            [str(v) for v in values], as_of=as_of)
        _and(set(hits["key"].to_pylist()))
        if not surviving:
            break
    if surviving or surviving is None:
        for col, (lo, hi) in (ranges or {}).items():
            root = range_index_root(lake.root, col)
            if not lake.fs.exists(root):
                raise ValueError(
                    f"no range index on {col!r} (expected {root}); build "
                    f"one with `range-index {lake.root} {col}`")
            hits = RangeIndex(root).scan_range_local(lo, hi, as_of=as_of)
            _and(set(hits["key"].to_pylist()))
            if not surviving:
                break
    keys: List[str] = sorted(surviving or set())
    if not rows:
        return keys, None
    table = lake.lookup(keys, as_of=as_of) if keys else None
    if table is not None:
        table = table.sort_by([("url", "ascending")])
    return keys, table
