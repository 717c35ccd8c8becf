"""Backfill / reprocess tests (cdc/backfill.py): exactly-once epoch over
every live partition — correctness vs direct recomputation, crash/resume,
time travel across the rewrite, transform-contract enforcement."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from opendataloader_pdf_ray.cdc import Lake, backfill, url_partition
from opendataloader_pdf_ray.cdc.backfill import (_BackfillPartition,
                                                 resolve_backfill_epoch)
from opendataloader_pdf_ray.cdc.lake import Lineage
from opendataloader_pdf_ray.functions.text_stats import token_stats

P = 4


def seed_lake(root, n: int = 40, with_tombstone: bool = True) -> Lake:
    """Direct-commit seed: one epoch-0 snapshot per url-hash partition."""
    lake = Lake(str(root), P)
    urls = [f"u{i:03d}" for i in range(n)]
    t = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([1_000_000 + i for i in range(n)], pa.int64()),
        "seq": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(
            [None if (with_tombstone and i == 0)
             else f"some body text for document {i} with words"
             for i in range(n)], pa.string()),
        "deleted": pa.array([with_tombstone and i == 0 for i in range(n)]),
    })
    parts = url_partition(urls, P)
    for part in range(P):
        sub = t.filter(pa.array(parts == part)).sort_by(
            [("url", "ascending")])
        if not sub.num_rows:
            continue
        seqs = sub["seq"].to_pylist()
        lake.commit_partition(part, 0, sub, Lineage(
            part=part, epoch=0, events_consumed=sub.num_rows,
            rows_upserted=sub.num_rows, rows_deleted=0,
            seq_min=min(seqs), seq_max=max(seqs)))
    return lake


@pytest.mark.usefixtures("ray_session")
class TestBackfill:
    def test_adds_columns_exactly_once(self, tmp_path):
        lake = seed_lake(tmp_path / "lake")
        lineage = backfill(lake, token_stats, name="token-stats")
        assert all(not l["skipped"] for l in lineage)
        assert all(l["epoch"] == 1 for l in lineage)
        state = lake.read_state(include_tombstones=True)
        assert "n_tokens" in state.column_names
        assert state.num_rows == 40
        # derived values match direct recomputation on the same rows
        want = token_stats(state.drop_columns(
            ["n_chars_c", "n_tokens", "n_punct", "n_bpe_tokens"]))
        assert state["n_tokens"].equals(want["n_tokens"])
        # tombstone rows pass through (null text -> null counts), and the
        # live view still filters them
        assert lake.read_state().num_rows == 39

    def test_time_travel_across_backfill(self, tmp_path):
        lake = seed_lake(tmp_path / "lake", with_tombstone=False)
        before = lake.read_state()
        backfill(lake, token_stats, name="token-stats")
        # pre-backfill epoch is unchanged, byte-for-byte
        assert lake.read_state(as_of=0).equals(before)
        assert "n_tokens" not in lake.read_state(as_of=0).column_names
        assert "n_tokens" in lake.read_state(as_of=1).column_names

    def test_crash_resume(self, tmp_path):
        """Simulate a crash: only partition 0 committed for the backfill
        epoch — re-running resumes (skips it) and the final state equals a
        clean uncrashed run byte-for-byte."""
        lake = seed_lake(tmp_path / "lake")
        epoch = resolve_backfill_epoch(lake, "token-stats")
        # partial run: just partition 0, through the real task
        task = _BackfillPartition(lake.root, P, epoch, token_stats, "url")
        task(pa.table({"part": pa.array([0], pa.int32())}))
        assert lake.is_committed(0, epoch)
        # resume
        lineage = backfill(lake, token_stats, name="token-stats")
        by_part = {l["part"]: l for l in lineage}
        assert by_part[0]["skipped"]
        assert all(not l["skipped"] for p, l in by_part.items() if p != 0)
        clean = seed_lake(tmp_path / "clean")
        backfill(clean, token_stats, name="token-stats")
        assert lake.read_state(include_tombstones=True).equals(
            clean.read_state(include_tombstones=True))

    def test_unfinished_marker_name_mismatch_raises(self, tmp_path):
        lake = seed_lake(tmp_path / "lake")
        epoch = resolve_backfill_epoch(lake, "token-stats")
        task = _BackfillPartition(lake.root, P, epoch, token_stats, "url")
        task(pa.table({"part": pa.array([0], pa.int32())}))
        with pytest.raises(ValueError, match="unfinished backfill"):
            backfill(lake, token_stats, name="other-transform")

    def test_scoped_marker_rescopes_when_affected_set_shrinks(self,
                                                              tmp_path):
        """ADVICE r3: a crashed scoped op (e.g. dlq-retry over parts [a, b],
        only a committed) re-run after the affected set SHRANK must rescope
        the marker — not leave ghost uncommitted partitions that wedge
        every later differently-named maintenance op forever."""
        lake = seed_lake(tmp_path / "lake")
        parts_with_data = [p for p in range(P) if lake.committed_epochs(p)]
        a, b = parts_with_data[0], parts_with_data[1]
        epoch = resolve_backfill_epoch(lake, "dlq-retry", parts=[a, b])
        task = _BackfillPartition(lake.root, P, epoch, token_stats, "url")
        task(pa.table({"part": pa.array([a], pa.int32())}))  # crash after a
        # any OTHER maintenance op is (correctly) wedged right now
        with pytest.raises(ValueError, match="unfinished backfill"):
            resolve_backfill_epoch(lake, "retention:99")
        # resume with the shrunk affected set {a}: marker rescoped to its
        # committed parts ∪ new scope = {a} → finished
        assert resolve_backfill_epoch(lake, "dlq-retry", parts=[a]) == epoch
        lake.mark_epoch_maint(epoch)
        # the wedge is gone: a different op now claims a FRESH epoch
        assert resolve_backfill_epoch(lake, "retention:99") == epoch + 1

    def test_reconcile_scoped_marker_on_empty_affected_set(self, tmp_path):
        """The resumed run's affected set is EMPTY (extractor changed so
        nothing heals): reconcile_scoped_marker closes the crashed marker
        — rescoped to what actually committed, watermark published."""
        from opendataloader_pdf_ray.cdc.backfill import (
            reconcile_scoped_marker)

        lake = seed_lake(tmp_path / "lake")
        parts_with_data = [p for p in range(P) if lake.committed_epochs(p)]
        a, b = parts_with_data[0], parts_with_data[1]
        epoch = resolve_backfill_epoch(lake, "dlq-retry", parts=[a, b])
        task = _BackfillPartition(lake.root, P, epoch, token_stats, "url")
        task(pa.table({"part": pa.array([a], pa.int32())}))
        assert reconcile_scoped_marker(lake, "dlq-retry") == epoch
        assert lake.is_epoch_complete(epoch)
        # idempotent: nothing left to reconcile
        assert reconcile_scoped_marker(lake, "dlq-retry") is None
        assert resolve_backfill_epoch(lake, "retention:99") == epoch + 1

    def test_second_backfill_gets_new_epoch(self, tmp_path):
        lake = seed_lake(tmp_path / "lake", with_tombstone=False)
        l1 = backfill(lake, token_stats, name="token-stats")

        def bump(t: pa.Table) -> pa.Table:
            return t.set_column(t.column_names.index("n_tokens"), "n_tokens",
                                pc.add(t["n_tokens"], 1))

        l2 = backfill(lake, bump, name="bump")
        assert {l["epoch"] for l in l1} == {1}
        assert {l["epoch"] for l in l2} == {2}
        s1 = lake.read_state(as_of=1)
        s2 = lake.read_state(as_of=2)
        assert pc.all(pc.equal(pc.add(s1["n_tokens"], 1),
                               s2["n_tokens"])).as_py()
        assert lake.verify(deep=True)["ok"]

    def test_cdc_collision_with_backfill_raises(self, tmp_path):
        """A backfill claims epoch max+1 — exactly the next binlog epoch on
        a live tail. Ingesting into it must FAIL LOUDLY (silently skipping
        would drop those events)."""
        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.cdc import replay
        from opendataloader_pdf_ray.config import CDCConfig
        from opendataloader_pdf_ray.fixtures.gen import gen_events

        events = gen_events(120, 30, seed=42)
        first = events.filter(pc.less(events["seq"], 60))
        p1 = str(tmp_path / "e1.parquet")
        pq.write_table(first, p1)
        cfg = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                        extract_batch_size=16, extract_concurrency=2)
        lake_root = str(tmp_path / "lake")
        replay(p1, lake_root, cfg, mode="epoch")  # epoch 0 committed

        lake = Lake(lake_root, cfg.num_partitions)
        lineage = backfill(lake, token_stats, name="token-stats")
        assert {l["epoch"] for l in lineage} == {1}

        p2 = str(tmp_path / "e2.parquet")
        pq.write_table(events, p2)  # seqs 60..119 -> CDC epoch 1: collision
        with pytest.raises(Exception, match="backfill"):
            replay(p2, lake_root, cfg, mode="epoch")

    def test_transform_contract_enforced(self, tmp_path):
        lake = seed_lake(tmp_path / "lake", with_tombstone=False)
        with pytest.raises(Exception, match="row count"):
            backfill(lake, lambda t: t.slice(0, 1), name="bad-rows")
        # the failed attempt left an unfinished marker for "bad-rows"; a
        # different transform must refuse to adopt it
        with pytest.raises(ValueError, match="unfinished backfill"):
            backfill(
                lake,
                lambda t: t.set_column(
                    t.column_names.index("url"), "url",
                    pa.array(["x"] * t.num_rows, pa.string())),
                name="bad-keys")
        # same-name resume hits the key-column check
        with pytest.raises(Exception, match="key column"):
            backfill(
                lake,
                lambda t: t.set_column(
                    t.column_names.index("url"), "url",
                    pa.array(["x"] * t.num_rows, pa.string())),
                name="bad-rows")
