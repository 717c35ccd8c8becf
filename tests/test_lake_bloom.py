"""Commit-record url Bloom filter: delta-file pruning for point lookups.

The Bloom rides in each DELTA commit record; merge-on-read with a
``url_filter`` skips delta files whose epoch definitely doesn't touch any
requested url. Bloom has no false negatives, so pruning can never drop a
row or a tombstone from the fold — these tests pin correctness (lookup
results identical to the unpruned fold), the pruning effect (file reads
counted), and backward compatibility with bloom-less commit records.
"""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc.lake import Lake, Lineage, _bloom_of_urls, _bloom_maybe_any


def _winners(urls, epoch, deleted=None):
    n = len(urls)
    del_by_url = dict(zip(urls, deleted or [False] * n))
    ordered = sorted(urls)
    return pa.table({
        "url": pa.array(ordered),
        "warc_ts": pa.array([1000 + epoch] * n, pa.int64()),
        "seq": pa.array([epoch * 100 + i for i in range(n)], pa.int64()),
        "text": pa.array([f"t{epoch}-{u}" for u in ordered]),
        "deleted": pa.array([del_by_url[u] for u in ordered]),
    })


def _lin(part, epoch):
    return Lineage(part=part, epoch=epoch, events_consumed=1,
                   rows_upserted=1, rows_deleted=0, seq_min=0, seq_max=0)


def _build(tmp_path, n_epochs=6):
    """Single-partition delta lake; epoch e touches only url-e (plus a
    shared url in epoch 0 that epoch 4 tombstones)."""
    lake = Lake(str(tmp_path / "lake"), 1)
    for e in range(n_epochs):
        urls = [f"url-{e}"]
        deleted = [False]
        if e == 0:
            urls.append("shared")
            deleted.append(False)
        if e == 4:
            urls.append("shared")
            deleted.append(True)  # tombstone in a later epoch
        lake.commit_delta(0, e, _winners(urls, e, deleted), _lin(0, e))
    return lake


class _ReadCounter:
    """Counts delta-file parquet reads through the lake module."""

    def __init__(self, monkeypatch):
        import opendataloader_pdf_ray.cdc.lake as lake_mod
        self.delta_reads = 0
        real = pq.read_table

        def counting(path, *a, **kw):
            if isinstance(path, str) and "delta=" in path:
                self.delta_reads += 1
            return real(path, *a, **kw)

        monkeypatch.setattr(lake_mod.pq, "read_table", counting)


class TestBloomHelpers:
    def test_membership_no_false_negatives(self):
        urls = [f"u{i}" for i in range(500)]
        bloom = _bloom_of_urls(urls)
        for probe in ("u0", "u250", "u499"):
            assert _bloom_maybe_any(bloom, [probe])
        # json round-trip (what the commit record does)
        bloom2 = json.loads(json.dumps(bloom))
        assert _bloom_maybe_any(bloom2, ["u42"])

    def test_absent_keys_mostly_pruned(self):
        bloom = _bloom_of_urls([f"u{i}" for i in range(100)])
        misses = sum(_bloom_maybe_any(bloom, [f"absent-{i}"])
                     for i in range(200))
        assert misses <= 6  # ~1% expected FP at 10 bits/key


class TestBloomPruning:
    def test_lookup_exact_and_pruned(self, tmp_path, monkeypatch):
        lake = _build(tmp_path)
        counter = _ReadCounter(monkeypatch)
        got = lake.lookup(["url-3"])
        assert got.num_rows == 1 and got["text"][0].as_py() == "t3-url-3"
        # 6 epochs committed; only epoch 3 can contain url-3 (± Bloom FPs)
        assert counter.delta_reads <= 2

    def test_tombstone_fold_survives_pruning(self, tmp_path):
        lake = _build(tmp_path)
        # "shared": inserted epoch 0, tombstoned epoch 4 — the pruned fold
        # must still see BOTH commits
        assert lake.lookup(["shared"]) is None
        got = lake.lookup(["shared"], include_tombstones=True)
        assert got.num_rows == 1 and got["deleted"][0].as_py() is True
        # as-of before the tombstone: live
        got = lake.lookup(["shared"], as_of=3)
        assert got.num_rows == 1 and got["text"][0].as_py() == "t0-shared"

    def test_pruned_equals_unpruned_fold(self, tmp_path):
        lake = _build(tmp_path)
        full = lake.read_partition(0)  # no filter → no pruning
        for url in [f"url-{e}" for e in range(6)] + ["shared", "nope"]:
            sub = full.filter(pa.compute.equal(full["url"], url))
            got = lake.lookup([url], include_tombstones=True)
            if sub.num_rows == 0:
                assert got is None
            else:
                assert got.num_rows == sub.num_rows
                assert got["text"].to_pylist() == sub["text"].to_pylist()
                assert got["seq"].to_pylist() == sub["seq"].to_pylist()

    def test_bloomless_commit_records_still_read(self, tmp_path, monkeypatch):
        """Records written by older code (no url_bloom) are never pruned."""
        lake = _build(tmp_path, n_epochs=3)
        # strip the bloom from epoch 1's commit record in place
        path = lake._commit_path(0, 1)
        with lake.fs.open(path, "rb") as f:
            rec = json.loads(f.read().decode())
        assert "url_bloom" in rec
        rec.pop("url_bloom")
        lake._write_small_atomic(path, json.dumps(rec).encode())
        counter = _ReadCounter(monkeypatch)
        got = lake.lookup(["url-2"])
        assert got.num_rows == 1
        # epoch 1 (bloom-less) must be read; epoch 0 pruned; epoch 2 hit
        assert counter.delta_reads == 2

    def test_lineage_roundtrip_ignores_bloom_key(self, tmp_path):
        lake = _build(tmp_path, n_epochs=2)
        lin = lake.read_lineage(0, 1)
        assert lin.part == 0 and lin.epoch == 1 and lin.kind == "delta"
