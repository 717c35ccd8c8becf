"""Lake-to-lake diff: distributed equivalence check between two lakes.

The ops verifier for every lake-shape-changing operation this engine ships
— ``rescale`` (P → k·P must preserve state), ``export``/re-``seed`` round
trips, independent replays of the same binlog (determinism audit), primary
vs replica drift. ``fsck`` audits ONE lake's internal consistency; this
audits TWO lakes' LIVE STATE equality.

Scale shape: both sides stream through ``Lake.read_dataset`` (one
merge-on-read task per partition, column-projected to url + version keys +
the compared columns), rows are slimmed to (url, warc_ts, seq, vhash) —
vhash a deterministic 64-bit ``hash_pandas_object`` digest of the compared
value columns, so wide text never crosses the shuffle — then ONE url-hash
bucketed co-partition compares the sides vectorized. Output is the
DIFFERENCE only (empty ⇔ equivalent): a 100-TB pair with small drift
produces small output. Partition counts of the two lakes may differ (the
rescale use case) because bucketing is by url hash, not by either lake's
layout.

Statuses: ``only_a`` / ``only_b`` (url live on one side only), ``differ``
(live on both, version key or compared values differ).

Determinism: hash_pandas_object uses a fixed key (the same property
``ingest.url_partition`` relies on); bucket assignment is modular on that
hash. Null values hash as nulls — two nulls compare equal.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from .lake import Lake

_EMPTY = pa.table({
    "url": pa.array([], pa.string()),
    "status": pa.array([], pa.string()),
    "a_warc_ts": pa.array([], pa.int64()),
    "b_warc_ts": pa.array([], pa.int64()),
    "a_seq": pa.array([], pa.int64()),
    "b_seq": pa.array([], pa.int64()),
})


def _slim(side: int, columns: List[str], num_buckets: int):
    def fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({"url": pa.array([], pa.string()),
                             "warc_ts": pa.array([], pa.int64()),
                             "seq": pa.array([], pa.int64()),
                             "vhash": pa.array([], pa.uint64()),
                             "side": pa.array([], pa.int8()),
                             "bucket": pa.array([], pa.int32())})
        urls = t["url"].to_numpy(zero_copy_only=False)
        present = [c for c in columns if c in t.column_names]
        if present:
            df = t.select(present).to_pandas()
            vhash = pd.util.hash_pandas_object(df, index=False).to_numpy()
        else:
            vhash = np.zeros(len(urls), np.uint64)
        uh = pd.util.hash_pandas_object(pd.Series(urls),
                                        index=False).to_numpy()
        return pa.table({
            "url": t["url"],
            "warc_ts": t["warc_ts"].cast(pa.int64()),
            "seq": t["seq"].cast(pa.int64()),
            "vhash": pa.array(vhash, pa.uint64()),
            "side": pa.array(np.full(len(urls), side, np.int8)),
            "bucket": pa.array((uh % num_buckets).astype(np.int32)),
        })
    return fn


def _compare(group: pa.Table) -> pa.Table:
    if group.num_columns == 0 or group.num_rows == 0:
        return _EMPTY
    df = group.to_pandas()
    # Nullable dtypes BEFORE reindex: plain int64/uint64 columns coerce to
    # float64 when reindex introduces missing rows, and float64 cannot
    # represent all uint64 hashes (two distinct vhashes above 2^53 would
    # falsely compare equal — a silently missed drift).
    df = df.astype({"warc_ts": "Int64", "seq": "Int64", "vhash": "UInt64"})
    a = df[df["side"] == 0].set_index("url")
    b = df[df["side"] == 1].set_index("url")
    urls = a.index.union(b.index)
    ai = a.reindex(urls)
    bi = b.reindex(urls)
    in_a = ai["side"].notna().to_numpy()
    in_b = bi["side"].notna().to_numpy()

    def neq(name: str) -> np.ndarray:
        # index-aligned exact nullable comparison (never .to_numpy() a
        # nullable side first — NA forces a float64 round trip); NA rows
        # resolve False (guarded by in_a & in_b anyway)
        return (~ai[name].eq(bi[name])).fillna(False).to_numpy(bool)

    differ = in_a & in_b & (neq("warc_ts") | neq("seq") | neq("vhash"))
    status = np.where(differ, "differ",
                      np.where(in_a & ~in_b, "only_a",
                               np.where(in_b & ~in_a, "only_b", "")))
    keep = status != ""
    if not keep.any():
        return _EMPTY

    def col(side_df, name):
        v = side_df[name].to_numpy()[keep]
        return pa.array([None if pd.isna(x) else int(x) for x in v],
                        pa.int64())

    return pa.table({
        "url": pa.array(np.asarray(urls)[keep], pa.string()),
        "status": pa.array(status[keep], pa.string()),
        "a_warc_ts": col(ai, "warc_ts"),
        "b_warc_ts": col(bi, "warc_ts"),
        "a_seq": col(ai, "seq"),
        "b_seq": col(bi, "seq"),
    })


def lake_diff(a: Lake, b: Lake, columns: Optional[List[str]] = None,
              as_of_a: Optional[int] = None, as_of_b: Optional[int] = None,
              num_buckets: int = 0):
    """Streaming Dataset of live-state differences between two lakes
    (module docstring). ``columns`` are the value columns hashed into the
    comparison (default: text if present). Empty result ⇔ the lakes hold
    identical live state for the compared columns."""
    from ..pipelines.common import n_buckets as _n_buckets

    if columns is None:
        columns = ["text"]
    buckets = num_buckets or _n_buckets()
    proj = ["url", "warc_ts", "seq"] + [c for c in columns
                                        if c not in ("url", "warc_ts", "seq")]

    def side(lake: Lake, tag: int, as_of):
        return lake.read_dataset(as_of=as_of, columns=proj).map_batches(
            _slim(tag, columns, buckets), batch_format="pyarrow")

    return (side(a, 0, as_of_a).union(side(b, 1, as_of_b))
            .groupby("bucket").map_groups(_compare, batch_format="pyarrow"))
