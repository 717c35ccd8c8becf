"""Derived lakes (cdc/derive.py): filtered/transformed replication.

Pins: dst live == transform(src live); an update that leaves the
predicate becomes a downstream DELETE; incremental catch-up == one-shot;
exactly-once re-runs; key-contract validation; config guards; follow
mode."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc import FilteredTransform, Lake, derive, replay
from opendataloader_pdf_ray.cdc.derive import follow_derive
from opendataloader_pdf_ray.config import CDCConfig
from opendataloader_pdf_ray.fixtures.gen import gen_events
from opendataloader_pdf_ray.functions import text_stats

CFG = CDCConfig(num_partitions=8, num_salts=2, epoch_size=60,
                extract_batch_size=16, extract_concurrency=2)


@pytest.fixture(scope="module")
def src_lake(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("derive_src")
    events = str(tmp / "events.parquet")
    pq.write_table(gen_events(180, 40, seed=21), events)
    lake = Lake(str(tmp / "lake"), CFG.num_partitions)
    replay(events, lake.root, CFG, mode="epoch")
    return lake


def _langs_of(lake):
    t = lake.read_state()
    return sorted(set(t["lang"].to_pylist()))


@pytest.mark.usefixtures("ray_session")
class TestDerive:
    def test_dst_live_equals_transformed_src_live(self, src_lake, tmp_path):
        langs = _langs_of(src_lake)[:2]  # keep two languages
        tf = FilteredTransform(eq={"lang": langs},
                               transform=text_stats.token_stats)
        out = derive(src_lake, str(tmp_path / "dst"), tf, transform_id="t1")
        assert out["commits_applied"] > 0
        dst = Lake(str(tmp_path / "dst"))
        want = tf(src_lake.read_state().drop_columns(["deleted"])
                  if "deleted" in src_lake.read_state().column_names
                  else src_lake.read_state())
        got = dst.read_state()
        w = {r["url"]: r for r in want.to_pylist()}
        g = {r["url"]: r for r in got.to_pylist()}
        assert set(w) == set(g)
        for url, wr in w.items():
            for col in ("lang", "text", "n_tokens", "seq"):
                assert g[url][col] == wr[col], (url, col)
        # exactly-once: a second run applies nothing
        again = derive(src_lake, str(tmp_path / "dst"), tf, transform_id="t1")
        assert again["commits_applied"] == 0

    def test_incremental_equals_oneshot(self, src_lake, tmp_path):
        tf = FilteredTransform(eq={"lang": _langs_of(src_lake)[:1]})
        inc_root = str(tmp_path / "inc")
        max_e = max(src_lake.committed_epochs(0) or [0])
        for e in range(max_e + 1):  # catch up epoch by epoch
            derive(src_lake, inc_root, tf, transform_id="t", until=e)
        one_root = str(tmp_path / "one")
        derive(src_lake, one_root, tf, transform_id="t")
        a = Lake(inc_root).read_state(include_tombstones=True).to_pylist()
        b = Lake(one_root).read_state(include_tombstones=True).to_pylist()
        assert a == b

    def test_config_guard(self, src_lake, tmp_path):
        tf = FilteredTransform()
        root = str(tmp_path / "guard")
        derive(src_lake, root, tf, transform_id="projection-a")
        with pytest.raises(ValueError, match="refusing to resume"):
            derive(src_lake, root, tf, transform_id="projection-b")

    def test_key_contract_validation(self, src_lake, tmp_path):
        def bad_seq(t: pa.Table) -> pa.Table:
            idx = t.column_names.index("seq")
            return t.set_column(idx, "seq", pc.add(t["seq"], 1))

        with pytest.raises(ValueError, match="version columns"):
            derive(src_lake, str(tmp_path / "v1"), bad_seq, transform_id="x")

        def invented(t: pa.Table) -> pa.Table:
            first = t.slice(0, 1)
            idx = first.column_names.index("url")
            fake = first.set_column(idx, "url",
                                    pa.array(["zzz://nope"], pa.string()))
            return pa.concat_tables([t, fake])

        with pytest.raises(ValueError, match="invented"):
            derive(src_lake, str(tmp_path / "v2"), invented,
                   transform_id="y")

        def dup(t: pa.Table) -> pa.Table:
            return pa.concat_tables([t, t.slice(0, 1)])

        with pytest.raises(ValueError, match="more than once"):
            derive(src_lake, str(tmp_path / "v3"), dup, transform_id="z")

    def test_follow_derive_converges(self, src_lake, tmp_path):
        tf = FilteredTransform(eq={"lang": _langs_of(src_lake)[:1]})
        root = str(tmp_path / "follow")
        wins = list(follow_derive(src_lake, root, tf, transform_id="f",
                                  poll_interval=0.05, max_idle_polls=2))
        assert wins and wins[-1]["hi_epoch"] >= 0
        ref = str(tmp_path / "ref")
        derive(src_lake, ref, tf, transform_id="f")
        assert Lake(root).read_state(include_tombstones=True).to_pylist() \
            == Lake(ref).read_state(include_tombstones=True).to_pylist()


@pytest.mark.usefixtures("ray_session")
class TestPredicateExit:
    def test_update_leaving_predicate_deletes_downstream(self, tmp_path):
        """epoch 0: six 'en' urls. epoch 1: u0 flips to 'de' (leaves the
        predicate), u1 is deleted, u2 updates in place. The derived lake
        must tombstone u0 AND u1 and keep u2-u5 live."""
        def ev(seq, url, op, lang, rev=0):
            html = None if op == "D" else f"<p>{url} r{rev}</p>".encode()
            return {"seq": seq, "op": op, "url": url,
                    "warc_ts": 1_000_000 + seq, "html": html, "lang": lang}

        rows = [ev(i, f"u{i}", "I", "en") for i in range(6)]
        rows += [ev(6, "u0", "U", "de", rev=1),
                 ev(7, "u1", "D", "en"),
                 ev(8, "u2", "U", "en", rev=1)]
        t = pa.table({k: [r[k] for r in rows] for r in rows[:1]
                      for k in rows[0]})
        t = t.set_column(t.column_names.index("warc_ts"),
                         "warc_ts",
                         t["warc_ts"].cast(pa.int64()).cast(pa.timestamp("us")))
        events = str(tmp_path / "events.parquet")
        pq.write_table(t, events)
        cfg = CDCConfig(num_partitions=4, num_salts=2, epoch_size=6,
                        extract_batch_size=8, extract_concurrency=2)
        src = Lake(str(tmp_path / "src"), 4)
        replay(events, src.root, cfg, mode="epoch")

        tf = FilteredTransform(eq={"lang": ["en"]})
        derive(src, str(tmp_path / "dst"), tf, transform_id="en-only")
        dst = Lake(str(tmp_path / "dst"))
        live = {r["url"] for r in dst.read_state().to_pylist()}
        assert live == {"u2", "u3", "u4", "u5"}
        tomb = {r["url"]: r for r in
                dst.read_state(include_tombstones=True).to_pylist()
                if r["deleted"]}
        assert set(tomb) == {"u0", "u1"}
        # the predicate-exit tombstone carries the exiting row's version
        assert tomb["u0"]["seq"] == 6
        # u2's downstream row is the epoch-1 update, not the insert
        u2 = [r for r in dst.read_state().to_pylist() if r["url"] == "u2"][0]
        assert u2["seq"] == 8 and "r1" in u2["text"]
