"""Partial-update (patch, op='P') CDC semantics — column-wise LWW.

A patch carries only its changed columns (null = unchanged); full events
(I/U/D) define every column. The engine folds patches with
merge.fold_events (latest full image + newer patch rows per url) and
resolves column-wise at apply (merge.merge_base_with_updates_patch); the
naive oracle (cdc/oracle.py) applies events in ascending (warc_ts, seq)
order, overlaying patches. These tests pin: algebra (associativity, plain
fast-path equality), end-to-end replay vs oracle, chunking/batch-size/salt
invariance, resurrect-by-patch, out-of-order patches, lineage accounting,
and the delta-commit refusal."""

import random

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc import Lake, oracle_final_state, replay
from opendataloader_pdf_ray.cdc.merge import (
    ensure_deleted_col,
    fold_events,
    latest_per_key,
    merge_base_with_updates_patch,
    merge_states,
    strip_internal,
)
from opendataloader_pdf_ray.config import CDCConfig
from opendataloader_pdf_ray.fixtures.gen import gen_events

CFG = CDCConfig(num_partitions=8, num_salts=4, epoch_size=60,
                extract_batch_size=16, extract_concurrency=2,
                patch_ops=True)


def _ev(seq, url, ts, op, text, lang):
    return dict(seq=seq, url=url, warc_ts=ts, op=op, text=text, lang=lang)


def _table(rows):
    return ensure_deleted_col(
        pa.table({k: [r[k] for r in rows] for k in rows[0]}))


GAUNTLET = _table([
    _ev(0, "a", 100, "I", "t0", "en"),   # insert
    _ev(1, "a", 200, "P", None, "fr"),   # lang-only patch
    _ev(2, "a", 300, "P", "t2", None),   # text-only patch
    _ev(3, "b", 100, "I", "tb", "en"),
    _ev(4, "b", 200, "D", None, None),   # delete (defines all cols as null)
    _ev(5, "b", 300, "P", None, "de"),   # resurrect-by-patch
    _ev(6, "c", 500, "P", None, "zz"),   # patch with no base: partial insert
    _ev(7, "a", 150, "P", None, "old"),  # out-of-order patch: loses to P@200
])


class TestPatchAlgebra:
    def test_column_wise_lww_semantics(self):
        merged = merge_base_with_updates_patch(None, fold_events(GAUNTLET))
        got = {r["url"]: r for r in strip_internal(merged).to_pylist()}
        assert got["a"] == {"seq": 2, "url": "a", "warc_ts": 300,
                            "text": "t2", "lang": "fr", "deleted": False}
        # resurrect: D nulled text/lang, patch set lang only
        assert got["b"] == {"seq": 5, "url": "b", "warc_ts": 300,
                            "text": None, "lang": "de", "deleted": False}
        assert got["c"] == {"seq": 6, "url": "c", "warc_ts": 500,
                            "text": None, "lang": "zz", "deleted": False}
        # per-column definer versions ride the materialized image so later
        # folds stay exact (the column's ORIGINAL definer, not the row max)
        vv = {r["url"]: r for r in merged.to_pylist()}
        assert (vv["a"]["_cvt_text"], vv["a"]["_cvs_text"]) == (300, 2)
        assert (vv["a"]["_cvt_lang"], vv["a"]["_cvs_lang"]) == (200, 1)
        assert (vv["b"]["_cvt_text"], vv["b"]["_cvs_text"]) == (200, 4)
        assert (vv["b"]["_cvt_lang"], vv["b"]["_cvs_lang"]) == (300, 5)

    def test_cross_epoch_out_of_order_full_after_patch(self):
        """Hypothesis-found regression: a payload-less (or off-column)
        patch bumps the ROW version; a full image arriving in a LATER
        epoch with a version between the old full and the patch must still
        define the columns the patch never touched. Requires the per-column
        version metadata — the row-version-only image loses this fold."""
        e1 = _table([_ev(6, "k", 9, "I", "v5", "en"),
                     _ev(7, "k", 23, "P", None, None)])   # no-column patch
        base = merge_base_with_updates_patch(None, fold_events(e1))
        e2 = _table([_ev(9, "k", 15, "I", "v0", "en")])   # out-of-order full
        got = merge_base_with_updates_patch(base, fold_events(e2))
        row = strip_internal(got).to_pylist()[0]
        assert row["text"] == "v0"            # defined by the (15,9) full
        assert (row["warc_ts"], row["seq"]) == (23, 7)  # row version = max
        # and the one-shot fold agrees (chunking invariance)
        oneshot = merge_base_with_updates_patch(
            None, fold_events(pa.concat_tables([e1, e2])))
        assert got.equals(oneshot)

    def test_merge_states_patch_aware(self):
        """Two materialized images merge column-wise by stored versions
        (the backlog hole/resume path)."""
        a = merge_base_with_updates_patch(None, fold_events(_table([
            _ev(0, "k", 10, "I", "t0", "en"),
            _ev(1, "k", 40, "P", None, "fr")])))   # lang@40, text@10
        b = merge_base_with_updates_patch(None, fold_events(_table([
            _ev(2, "k", 20, "I", "t2", "de")])))   # all@20
        m = strip_internal(merge_states(a, b)).to_pylist()[0]
        assert m["text"] == "t2" and m["lang"] == "fr"
        assert (m["warc_ts"], m["seq"]) == (40, 1)
        # symmetric
        m2 = strip_internal(merge_states(b, a)).to_pylist()[0]
        assert m == m2

    def test_fold_associative_under_random_regrouping(self):
        want = merge_base_with_updates_patch(None, fold_events(GAUNTLET))
        rng = random.Random(0)
        n = GAUNTLET.num_rows
        for _ in range(50):
            idx = list(range(n))
            rng.shuffle(idx)
            cut = rng.randint(0, n)
            t1 = GAUNTLET.take(pa.array(sorted(idx[:cut]), pa.int64()))
            t2 = GAUNTLET.take(pa.array(sorted(idx[cut:]), pa.int64()))
            refolded = fold_events(pa.concat_tables(
                [fold_events(t1), fold_events(t2)]).combine_chunks())
            assert merge_base_with_updates_patch(None, refolded).equals(want)

    def test_incremental_equals_oneshot(self):
        """Applying a prefix as the base image then the suffix as updates
        gives the same state as one apply over everything."""
        want = merge_base_with_updates_patch(None, fold_events(GAUNTLET))
        for cut in range(1, GAUNTLET.num_rows):
            base = merge_base_with_updates_patch(
                None, fold_events(GAUNTLET.slice(0, cut)))
            got = merge_base_with_updates_patch(
                base, fold_events(GAUNTLET.slice(cut)))
            assert got.equals(want), cut

    def test_fast_path_matches_latest_per_key(self):
        """No 'P' rows → fold_events is byte-identical to latest_per_key."""
        full = GAUNTLET.filter(pc.invert(pc.equal(GAUNTLET["op"], "P")))
        assert fold_events(full).equals(latest_per_key(full))
        no_op = full.drop_columns(["op"])
        assert fold_events(no_op).equals(latest_per_key(no_op))

    def test_lineage_counters_survive_chained_folds(self):
        t = GAUNTLET.append_column(
            "n_events", pa.array([1] * GAUNTLET.num_rows, pa.int64()))
        rng = random.Random(1)
        for _ in range(20):
            idx = list(range(t.num_rows))
            rng.shuffle(idx)
            cut = rng.randint(0, t.num_rows)
            f = fold_events(pa.concat_tables([
                fold_events(t.take(pa.array(sorted(idx[:cut]), pa.int64())),
                            aggs={"n_events": "sum"}),
                fold_events(t.take(pa.array(sorted(idx[cut:]), pa.int64())),
                            aggs={"n_events": "sum"}),
            ]).combine_chunks(), aggs={"n_events": "sum"})
            assert pc.sum(f["n_events"]).as_py() == t.num_rows


@pytest.mark.usefixtures("ray_session")
class TestPatchReplay:
    @pytest.fixture(scope="class")
    def patch_events(self, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("patch") / "events.parquet")
        pq.write_table(gen_events(180, 40, seed=11, patch_frac=0.35), path)
        return path

    def _assert_matches_oracle(self, lake, events):
        oracle = oracle_final_state(events)
        got = {r["url"]: r
               for r in lake.read_state(include_tombstones=True).to_pylist()}
        assert set(got) == set(oracle)
        for url, want in oracle.items():
            row = got[url]
            assert row["deleted"] == want["deleted"], url
            assert row["seq"] == want["seq"], url
            assert row["text"] == want["text"], url
            assert row["lang"] == want["lang"], url

    def test_replay_matches_patch_oracle(self, patch_events, tmp_path):
        lake = Lake(str(tmp_path / "lake"), CFG.num_partitions)
        lineage = replay(patch_events, lake.root, CFG)
        events = pq.read_table(patch_events)
        assert pc.sum(pc.equal(events["op"], "P")).as_py() > 20  # real gauntlet
        self._assert_matches_oracle(lake, events)
        assert sum(l["events_consumed"] for l in lineage) == events.num_rows

    def test_epoch_mode_and_salted_equal_backlog(self, patch_events, tmp_path):
        """Epoch chunking / salt topology must not change a single byte."""
        import dataclasses

        a = Lake(str(tmp_path / "a"), CFG.num_partitions)
        replay(patch_events, a.root, CFG)  # backlog, unsalted
        b = Lake(str(tmp_path / "b"), CFG.num_partitions)
        replay(patch_events, b.root,
               dataclasses.replace(CFG, salted_merge=True), mode="epoch")
        c = Lake(str(tmp_path / "c"), CFG.num_partitions)
        replay(patch_events, c.root,
               dataclasses.replace(CFG, epoch_size=45, extract_batch_size=7))
        sa = a.read_state(include_tombstones=True).to_pylist()
        assert sa == b.read_state(include_tombstones=True).to_pylist()
        assert sa == c.read_state(include_tombstones=True).to_pylist()

    def test_crash_resume_idempotent(self, patch_events, tmp_path):
        lake = Lake(str(tmp_path / "resume"), CFG.num_partitions)
        replay(patch_events, lake.root, CFG, max_epoch=0)
        replay(patch_events, lake.root, CFG)
        # full re-run: everything already committed → all skipped
        again = replay(patch_events, lake.root, CFG)
        assert again == []
        self._assert_matches_oracle(lake, pq.read_table(patch_events))

    def test_delta_commits_refused(self, patch_events, tmp_path):
        import dataclasses

        cfg = dataclasses.replace(CFG, epoch_commits="delta")
        with pytest.raises(ValueError, match="patch_ops"):
            replay(patch_events, str(tmp_path / "d"), cfg, mode="epoch")

    def test_final_mode_equals_every_epoch(self, patch_events, tmp_path):
        import dataclasses

        a = Lake(str(tmp_path / "fa"), CFG.num_partitions)
        replay(patch_events, a.root, CFG)
        b = Lake(str(tmp_path / "fb"), CFG.num_partitions)
        replay(patch_events, b.root,
               dataclasses.replace(CFG, backlog_snapshots="final"))
        assert a.read_state(include_tombstones=True).to_pylist() == \
            b.read_state(include_tombstones=True).to_pylist()


@pytest.mark.usefixtures("ray_session")
class TestPatchFuzz:
    """North-star invariant with PATCHES, fuzzed: arbitrary I/U/D/P logs
    (random out-of-order versions, content patches, metadata patches,
    payload-less patches, patches onto tombstones and unknown keys)
    replayed through the real engine at arbitrary epoch chunking equal the
    single-threaded column-wise-LWW oracle byte-for-byte."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    events_strategy = st.lists(
        st.tuples(st.integers(0, 4),                  # url
                  st.sampled_from("IUDPP"),           # op (patches common)
                  st.integers(0, 30),                 # warc_ts (collisions ok)
                  st.integers(0, 9),                  # html revision
                  st.sampled_from(["html", "lang", "none"])),  # patch kind
        min_size=3, max_size=18)

    @given(events_strategy, st.sampled_from([3, 7, 10_000]))
    @settings(max_examples=8, deadline=None)
    def test_patch_replay_matches_oracle(self, tmp_path_factory, raw,
                                         epoch_size):
        import dataclasses

        from opendataloader_pdf_ray.fixtures.gen import render_html

        root = tmp_path_factory.mktemp("pfz")
        htmls, langs = [], []
        for u, op, _, rev, kind in raw:
            url = f"https://fz.example/{u}"
            if op == "D":
                htmls.append(None)
                langs.append("en")
            elif op == "P":
                htmls.append(render_html(url, rev) if kind == "html"
                             else None)
                langs.append(f"pl{rev}" if kind == "lang" else None)
            else:
                htmls.append(render_html(url, rev))
                langs.append("en")
        events = pa.table({
            "seq": pa.array(range(len(raw)), pa.int64()),
            "op": pa.array([op for _, op, *_ in raw], pa.string()),
            "url": pa.array([f"https://fz.example/{u}" for u, *_ in raw],
                            pa.string()),
            "warc_ts": pa.array([ts for _, _, ts, _, _ in raw],
                                pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "lang": pa.array(langs, pa.string()),
        })
        path = str(root / "events.parquet")
        pq.write_table(events, path)
        cfg = dataclasses.replace(CFG, num_partitions=4, num_salts=2,
                                  epoch_size=epoch_size,
                                  extract_batch_size=8)
        lake = Lake(str(root / "lake"), cfg.num_partitions)
        replay(path, lake.root, cfg)
        from opendataloader_pdf_ray.cdc import oracle_final_state

        oracle = oracle_final_state(events)
        got = {r["url"]: r for r in
               lake.read_state(include_tombstones=True).to_pylist()}
        assert set(got) == set(oracle)
        for url, want in oracle.items():
            assert got[url]["deleted"] == want["deleted"], url
            assert got[url]["seq"] == want["seq"], url
            assert got[url]["text"] == want["text"], url
            assert got[url]["lang"] == want["lang"], url
