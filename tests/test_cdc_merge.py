"""Pure merge-semantics tests (no Ray): LWW fold, tombstones, schema
unification — property-tested against the naive oracle (SURVEY.md §7.4)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opendataloader_pdf_ray.cdc.merge import (
    ensure_deleted_col,
    latest_per_key,
    live_view,
    merge_base_with_updates,
    unified_schema,
    unify_to_schema,
)


def ev_table(rows):
    """rows: list of (seq, op, url, ts_us[, extra])"""
    return pa.table({
        "seq": pa.array([r[0] for r in rows], pa.int64()),
        "op": pa.array([r[1] for r in rows], pa.string()),
        "url": pa.array([r[2] for r in rows], pa.string()),
        "warc_ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        "payload": pa.array([f"p{r[0]}" for r in rows], pa.string()),
    })


class TestLatestPerKey:
    def test_picks_max_ts(self):
        t = ev_table([(0, "I", "a", 100), (1, "U", "a", 300), (2, "U", "a", 200)])
        w = latest_per_key(t)
        assert w.num_rows == 1 and w["seq"][0].as_py() == 1

    def test_seq_breaks_ts_ties(self):
        t = ev_table([(0, "I", "a", 100), (1, "U", "a", 100)])
        assert latest_per_key(t)["seq"][0].as_py() == 1

    def test_out_of_order_update_loses(self):
        # FIXTURES.md §2: older warc_ts arriving later must lose
        t = ev_table([(0, "I", "a", 500), (1, "U", "a", 100)])
        assert latest_per_key(t)["seq"][0].as_py() == 0

    def test_multi_key(self):
        t = ev_table([(0, "I", "a", 1), (1, "I", "b", 1), (2, "U", "a", 2)])
        w = latest_per_key(t)
        assert sorted(w["url"].to_pylist()) == ["a", "b"]
        assert w.num_rows == 2

    def test_aggs_carry_counters(self):
        t = ev_table([(5, "I", "a", 1), (9, "U", "a", 2), (7, "I", "b", 1)])
        t = t.append_column("n_events", pa.array([1, 1, 1], pa.int64()))
        t = t.append_column("seq_lo", t["seq"])
        t = t.append_column("seq_hi", t["seq"])
        w = latest_per_key(t, aggs={"n_events": "sum", "seq_lo": "min", "seq_hi": "max"})
        row_a = {r["url"]: r for r in w.to_pylist()}["a"]
        assert row_a["n_events"] == 2 and row_a["seq_lo"] == 5 and row_a["seq_hi"] == 9


class TestTombstones:
    def test_delete_then_older_update_stays_deleted(self):
        ev1 = ensure_deleted_col(ev_table([(0, "I", "a", 100), (1, "D", "a", 500)]))
        state = merge_base_with_updates(None, ev1)
        assert live_view(state).num_rows == 0
        # cross-epoch: older U arrives later, must NOT resurrect
        ev2 = ensure_deleted_col(ev_table([(2, "U", "a", 300)]))
        state2 = merge_base_with_updates(state, ev2)
        assert live_view(state2).num_rows == 0

    def test_newer_update_resurrects(self):
        ev1 = ensure_deleted_col(ev_table([(0, "I", "a", 100), (1, "D", "a", 200)]))
        state = merge_base_with_updates(None, ev1)
        ev2 = ensure_deleted_col(ev_table([(2, "U", "a", 900)]))
        state2 = merge_base_with_updates(state, ev2)
        live = live_view(state2)
        assert live.num_rows == 1 and live["seq"][0].as_py() == 2


class TestSchemaEvolution:
    def test_additive_null_backfill(self):
        base = ensure_deleted_col(ev_table([(0, "I", "a", 100)]))
        evolved = ensure_deleted_col(ev_table([(1, "I", "b", 100)])).append_column(
            "content_type", pa.array(["text/html"], pa.string()))
        merged = merge_base_with_updates(base, evolved)
        assert "content_type" in merged.column_names
        by_url = {r["url"]: r for r in merged.to_pylist()}
        assert by_url["a"]["content_type"] is None
        assert by_url["b"]["content_type"] == "text/html"

    def test_unified_schema_order_stable(self):
        a = pa.schema([("x", pa.int64()), ("y", pa.string())])
        b = pa.schema([("y", pa.string()), ("z", pa.float64())])
        assert [f.name for f in unified_schema(a, b)] == ["x", "y", "z"]

    def test_unify_casts(self):
        t = pa.table({"x": pa.array([1], pa.int32())})
        out = unify_to_schema(t, pa.schema([("x", pa.int64()), ("y", pa.string())]))
        assert out["x"].type == pa.int64() and out["y"][0].as_py() is None


@st.composite
def event_logs(draw):
    n = draw(st.integers(1, 60))
    urls = ["u%d" % i for i in range(draw(st.integers(1, 5)))]
    rows = []
    for seq in range(n):
        rows.append((
            seq,
            draw(st.sampled_from(["I", "U", "D"])),
            draw(st.sampled_from(urls)),
            draw(st.integers(0, 20)),  # small ts range → many collisions/out-of-order
        ))
    return rows


class TestAgainstNaiveFold:
    @given(event_logs(), st.integers(1, 4))
    @settings(max_examples=60, deadline=None)
    def test_split_merge_equals_global_fold(self, rows, n_chunks):
        """Associativity/commutativity property: merging the log in arbitrary
        epoch chunks equals the single global fold."""
        table = ensure_deleted_col(ev_table(rows))
        global_w = merge_base_with_updates(None, table)

        state = None
        chunk = max(1, len(rows) // n_chunks)
        for i in range(0, len(rows), chunk):
            part = ensure_deleted_col(ev_table(rows[i:i + chunk]))
            state = merge_base_with_updates(state, part)
        assert state.to_pylist() == global_w.to_pylist()

    @given(event_logs())
    @settings(max_examples=40, deadline=None)
    def test_matches_python_dict_fold(self, rows):
        table = ensure_deleted_col(ev_table(rows))
        got = {r["url"]: (r["seq"], r["deleted"])
               for r in merge_base_with_updates(None, table).to_pylist()}
        # naive dict fold in seq order
        ref = {}
        for seq, op, url, ts in rows:
            cur = ref.get(url)
            if cur is None or (ts, seq) > (cur[0], cur[1]):
                ref[url] = (ts, seq, op == "D")
        want = {u: (s, d) for u, (t, s, d) in ref.items()}
        assert got == want


class TestTypeWidening:
    """Schema evolution beyond additive: a later epoch WIDENS a column's
    type (int32→int64, float32→float64, int→float, timestamp unit). The
    unified type is the Arrow permissive promotion, commutative in merge
    order, and unpromotable changes (string↔int) fail loudly."""

    def test_unified_schema_promotes(self):
        a = pa.schema([("x", pa.int32()), ("y", pa.float32())])
        b = pa.schema([("x", pa.int64()), ("y", pa.float64()), ("z", pa.string())])
        u = unified_schema(a, b)
        assert u.field("x").type == pa.int64()
        assert u.field("y").type == pa.float64()
        assert [f.name for f in u] == ["x", "y", "z"]

    def test_promotion_commutative(self):
        combos = [(pa.int32(), pa.int64()), (pa.float32(), pa.float64()),
                  (pa.int64(), pa.float64()),
                  (pa.timestamp("us"), pa.timestamp("ns"))]
        for ta, tb in combos:
            ab = unified_schema(pa.schema([("x", ta)]), pa.schema([("x", tb)]))
            ba = unified_schema(pa.schema([("x", tb)]), pa.schema([("x", ta)]))
            assert ab.field("x").type == ba.field("x").type

    def test_unpromotable_raises(self):
        from opendataloader_pdf_ray.cdc.merge import SchemaEvolutionError
        with pytest.raises(SchemaEvolutionError, match="x"):
            unified_schema(pa.schema([("x", pa.string())]),
                           pa.schema([("x", pa.int64())]))

    def test_merge_widens_beyond_int32(self):
        big = 2**40  # does not fit int32 — a downcast would raise/truncate
        base = ensure_deleted_col(ev_table([(0, "I", "a", 100)])).append_column(
            "size", pa.array([7], pa.int32()))
        upd = ensure_deleted_col(ev_table([(1, "I", "b", 100)])).append_column(
            "size", pa.array([big], pa.int64()))
        merged = merge_base_with_updates(base, upd)
        assert merged["size"].type == pa.int64()
        by_url = {r["url"]: r["size"] for r in merged.to_pylist()}
        assert by_url == {"a": 7, "b": big}

    def test_lake_fold_across_widened_epoch(self, tmp_path):
        from opendataloader_pdf_ray.cdc.lake import Lake, Lineage
        lk = Lake(str(tmp_path / "lake"), 1)
        t0 = pa.table({"url": ["a"], "warc_ts": pa.array([1], pa.int64()),
                       "seq": pa.array([0], pa.int64()), "deleted": [False],
                       "size": pa.array([7], pa.int32())})
        t1 = pa.table({"url": ["b"], "warc_ts": pa.array([2], pa.int64()),
                       "seq": pa.array([1], pa.int64()), "deleted": [False],
                       "size": pa.array([2**40], pa.int64())})
        lin = lambda e: Lineage(part=0, epoch=e, events_consumed=1,
                                rows_upserted=1, rows_deleted=0,
                                seq_min=0, seq_max=0)
        lk.commit_delta(0, 0, t0, lin(0))
        lk.commit_delta(0, 1, t1, lin(1))
        out = lk.read_partition(0)
        assert out["size"].type == pa.int64()
        by_url = {r["url"]: r["size"] for r in out.to_pylist()}
        assert by_url == {"a": 7, "b": 2**40}
        # time travel BEFORE the widening keeps the original narrow type
        old = lk.read_partition(0, as_of=0)
        assert old["size"].type == pa.int32()
