"""MaterializedView (cdc/views.py): incrementally-maintained aggregates
over the lake's commit log — telescoping equivalence to the batch
aggregate, exactly-once refresh, crash resume, snapshot/delta parity."""

import dataclasses
import json
import posixpath

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc import Lake, MaterializedView
from opendataloader_pdf_ray.cdc.ingest import ingest_epoch
from opendataloader_pdf_ray.config import CDCConfig
from opendataloader_pdf_ray.fixtures.gen import gen_events

SNAP_CFG = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                     extract_batch_size=16, extract_concurrency=2)
DELTA_CFG = dataclasses.replace(SNAP_CFG, epoch_commits="delta")
N_EPOCHS = 3  # 180 events / 60


@pytest.fixture(scope="module")
def events_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("views") / "events.parquet")
    pq.write_table(gen_events(180, 40, seed=42), path)
    return path


def batch_view(lake: Lake, as_of=None) -> dict:
    """Ground truth: the batch aggregate over the live state (as-of)."""
    live = lake.read_state(as_of=as_of)
    if live.num_rows == 0:
        return {}
    langs = live["lang"].to_numpy(zero_copy_only=False)
    tl = pc.utf8_length(live["text"]).to_numpy(zero_copy_only=False)
    out: dict = {}
    for g, v in zip(langs, tl):
        cur = out.setdefault(str(g), [0, 0])
        cur[0] += 1
        cur[1] += int(v)
    return out


def view_dict(view: MaterializedView) -> dict:
    t = view.read()
    return {r["grp"]: [r["n_live"], r["sum_value"]] for r in t.to_pylist()}


@pytest.mark.usefixtures("ray_session")
class TestMaterializedView:
    @pytest.mark.parametrize("cfg", [SNAP_CFG, DELTA_CFG],
                             ids=["snapshot", "delta"])
    def test_matches_batch_aggregate(self, events_path, tmp_path, cfg):
        lake = Lake(str(tmp_path / "lake"), cfg.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, lake, e, cfg)
        view = MaterializedView(lake, "lang_stats")
        folds = view.refresh()
        assert folds == sum(len(lake.committed_epochs(p))
                            for p in range(cfg.num_partitions))
        assert view_dict(view) == batch_view(lake)

    def test_incremental_refresh_folds_only_new_epochs(self, events_path,
                                                       tmp_path):
        lake = Lake(str(tmp_path / "lake"), DELTA_CFG.num_partitions)
        ingest_epoch(events_path, lake, 0, DELTA_CFG)
        view = MaterializedView(lake, "lang_stats")
        first = view.refresh()
        assert first > 0
        mid = view_dict(view)
        assert mid == batch_view(lake)
        for e in range(1, N_EPOCHS):
            ingest_epoch(events_path, lake, e, DELTA_CFG)
        second = view.refresh()
        assert second > 0
        assert view_dict(view) == batch_view(lake)
        # idempotent: nothing new → zero folds, result unchanged
        assert view.refresh() == 0
        assert view_dict(view) == batch_view(lake)

    def test_crash_resume_no_double_count(self, events_path, tmp_path):
        """Crash between the view-delta write and its commit record: the
        refold rewrites the same file; read() counts committed only."""
        lake = Lake(str(tmp_path / "lake"), DELTA_CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, lake, e, DELTA_CFG)
        view = MaterializedView(lake, "lang_stats")
        view.refresh()
        want = view_dict(view)
        # simulate the crash for one (part, epoch): drop the commit record,
        # keep the delta parquet
        victims = [p for p in sorted(lake.fs.ls(view.dir))
                   if posixpath.basename(p).startswith("commit-")][:2]
        for v in victims:
            lake.fs.rm(v)
        assert view_dict(view) != want or len(victims) == 0  # partial view
        assert view.refresh() == len(victims)
        assert view_dict(view) == batch_view(lake) == want

    def test_refresh_after_compaction_and_vacuum(self, events_path, tmp_path):
        """A view created AFTER compact()+vacuum() reclaimed early
        snapshots still folds (read_partition fallback path)."""
        lake = Lake(str(tmp_path / "lake"), DELTA_CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, lake, e, DELTA_CFG)
        lake.compact()
        lake.vacuum()
        view = MaterializedView(lake, "lang_stats")
        view.refresh()
        assert view_dict(view) == batch_view(lake)

    def test_as_of_time_travel(self, events_path, tmp_path):
        """read(as_of=e) == batch aggregate over lake state as of e — the
        per-epoch deltas telescope at every prefix (per-epoch freshness: a
        streaming deployment refreshing after each epoch serves exactly
        this at every checkpoint)."""
        lake = Lake(str(tmp_path / "lake"), DELTA_CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, lake, e, DELTA_CFG)
        view = MaterializedView(lake, "lang_stats")
        view.refresh()
        for e in range(N_EPOCHS):
            got = {r["grp"]: [r["n_live"], r["sum_value"]]
                   for r in view.read(as_of=e).to_pylist()}
            assert got == batch_view(lake, as_of=e), f"epoch {e}"

    def test_custom_group_and_value_callables(self, events_path, tmp_path):
        """The view is generic over (group_of, value_of): group by url host
        prefix, value = seq — verified against the equivalent batch fold."""
        import numpy as np
        import pyarrow as pa

        def by_prefix(t: pa.Table) -> np.ndarray:
            urls = t["url"].to_pylist()
            return np.array([u.split("/")[2][:9] for u in urls], dtype=object)

        def seq_of(t: pa.Table) -> np.ndarray:
            return t["seq"].to_numpy(zero_copy_only=False).astype(np.int64)

        lake = Lake(str(tmp_path / "lake"), DELTA_CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, lake, e, DELTA_CFG)
        view = MaterializedView(lake, "prefix_seq", group_of=by_prefix,
                                value_of=seq_of)
        view.refresh()
        live = lake.read_state()
        want: dict = {}
        for g, v in zip(by_prefix(live), seq_of(live)):
            cur = want.setdefault(str(g), [0, 0])
            cur[0] += 1
            cur[1] += int(v)
        assert view_dict(view) == want

    def test_retention_epoch_retracts(self, events_path, tmp_path):
        """A retention epoch flips ``deleted`` WITHOUT changing seq — the
        seq-diff fold must treat the flip as a change (regression: a
        seq-only diff saw nothing and the view kept counting expired
        rows). Snapshot commits force the seq-diff path."""
        from opendataloader_pdf_ray.cdc.retention import apply_retention

        lake = Lake(str(tmp_path / "lake"), SNAP_CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, lake, e, SNAP_CFG)
        view = MaterializedView(lake, "lang_stats")
        view.refresh()
        before = view_dict(view)
        assert before == batch_view(lake)
        ts = sorted(lake.read_state()["warc_ts"].cast(pa.int64()).to_pylist())
        cutoff = ts[len(ts) // 2] + 1  # expire roughly half the live rows
        lins = apply_retention(lake, cutoff)
        assert sum(l["rows_deleted"] for l in lins) > 0
        assert view.refresh() > 0
        after = view_dict(view)
        assert after == batch_view(lake)
        assert after != before
        # a fresh view folding the whole log agrees (cold replay parity)
        v2 = MaterializedView(lake, "lang_stats_cold")
        v2.refresh()
        assert view_dict(v2) == after

    def test_sequential_equals_parallel(self, events_path, tmp_path):
        lake = Lake(str(tmp_path / "lake"), DELTA_CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, lake, e, DELTA_CFG)
        v_seq = MaterializedView(lake, "seq_view")
        v_par = MaterializedView(lake, "par_view")
        v_seq.refresh(parallel=False)
        v_par.refresh(parallel=True)
        assert view_dict(v_seq) == view_dict(v_par) == batch_view(lake)

    def test_ingest_view_follower_cli(self, tmp_path, capsys):
        """`ingest --view NAME` keeps the aggregate view fresh at the
        follower cadence: after the CLI ingest the view is already folded
        (a subsequent refresh applies nothing) and equals the batch
        aggregate; follow mode tails it the same way."""
        from opendataloader_pdf_ray.__main__ import main
        from opendataloader_pdf_ray.fixtures.gen import write_fixture_dir

        events = tmp_path / "events"
        write_fixture_dir(str(events), 120, 30, seed=17, shard_size=60)
        (events / ".end").touch()
        lake_dir = str(tmp_path / "lake")
        rc = main(["ingest", str(events), lake_dir, "--epoch-size", "60",
                   "--partitions", "4", "--mode", "follow",
                   "--view", "lang_stats"])
        assert rc == 0
        capsys.readouterr()
        lake = Lake(lake_dir, 4)
        view = MaterializedView(lake, "lang_stats")
        assert view.refresh() == 0  # tail already folded every epoch
        assert view_dict(view) == batch_view(lake)
        # the `view` CLI reads it without new folds
        assert main(["view", lake_dir, "--name", "lang_stats"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["folds_applied"] == 0 and rep["groups"]
