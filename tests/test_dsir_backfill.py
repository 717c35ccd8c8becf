"""DSIR scoring on the CDC plane (functions/dsir.py + `backfill
--transform dsir-score`): the lake-wide importance-scoring rewrite as one
exactly-once epoch — values match an offline recompute, tombstones stay
null, and the rewrite rides the standard backfill machinery."""

import json
import os

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc import Lake
from opendataloader_pdf_ray.cdc.ingest import CDCConfig, ingest_epoch
from opendataloader_pdf_ray.fixtures.gen import gen_events
from opendataloader_pdf_ray.functions.dsir import (
    lake_histograms,
    log_ratio,
    make_lake_scorer,
    text_bucket_vector,
)

CFG = CDCConfig(num_partitions=4, num_salts=2, epoch_size=120,
                extract_batch_size=16, extract_concurrency=2)


def _seed(tmp_path):
    events = gen_events(120, 40, seed=81)
    seg = str(tmp_path / "seg.parquet")
    pq.write_table(events, seg)
    lake = Lake(str(tmp_path / "lake"), CFG.num_partitions)
    ingest_epoch([seg], lake, 0, CFG)
    return lake


@pytest.mark.usefixtures("ray_session")
class TestDsirBackfill:
    def test_scores_match_offline_recompute(self, tmp_path):
        from opendataloader_pdf_ray.cdc import backfill

        lake = _seed(tmp_path)
        fn = make_lake_scorer(lake, target_lang="en")
        lineage = backfill(lake, fn, name="dsir-score")
        assert lineage and all(not l["skipped"] for l in lineage)

        state = lake.read_state(include_tombstones=True)
        assert "dsir_logw" in state.column_names
        # offline recompute from the PRE-backfill live text (epoch 0)
        pre = lake.read_state(as_of=0, include_tombstones=True)
        th, rh = lake_histograms(lake, "en", as_of=0)
        lr = log_ratio(th, rh)
        want = {}
        for url, text in zip(pre["url"].to_pylist(),
                             pre["text"].to_pylist()):
            if not isinstance(text, str) or not text:
                want[url] = None
            else:
                want[url] = round(float(
                    text_bucket_vector(text, 1024) @ lr), 6)
        got = dict(zip(state["url"].to_pylist(),
                       state["dsir_logw"].to_pylist()))
        assert set(got) == set(want)
        for u in want:
            if want[u] is None:
                assert got[u] is None
            else:
                assert got[u] == pytest.approx(want[u], abs=1e-6)
        # target-likeness sanity: en rows score higher on average
        langs = dict(zip(state["url"].to_pylist(),
                         state["lang"].to_pylist()))
        en = [got[u] for u in got if langs[u] == "en"
              and got[u] is not None]
        other = [got[u] for u in got if langs[u] != "en"
                 and got[u] is not None]
        if en and other:
            assert np.mean(en) > np.mean(other)
        # time travel across the rewrite preserved
        assert "dsir_logw" not in lake.read_state(as_of=0).column_names
        # the scaled sibling makes the scored lake SLICEABLE: zone-map
        # pruned range read returns exactly the rows in the score band
        scaled = {u: (None if v is None else int(round(v * 1_000_000)))
                  for u, v in got.items()}
        vals = sorted(v for v in scaled.values() if v is not None)
        lo, hi = vals[len(vals) // 4], vals[3 * len(vals) // 4]
        ranged = lake.read_range("dsir_logw_scaled", lo, hi).to_pandas()
        want_urls = {u for u, v in scaled.items()
                     if v is not None and lo <= v <= hi}
        live = lake.read_state()
        live_urls = set(live["url"].to_pylist())
        assert set(ranged["url"]) == want_urls & live_urls

    def test_cli(self, tmp_path, capsys):
        from opendataloader_pdf_ray.__main__ import main

        lake = _seed(tmp_path)
        assert main(["backfill", lake.root,
                     "--transform", "dsir-score"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["transform"] == "dsir-score"
        assert rep["rows_rewritten"] > 0
        assert "dsir_logw" in lake.read_state().column_names

    def test_missing_lang_refused(self, tmp_path):
        from test_backfill import seed_lake

        lake = seed_lake(tmp_path / "plain")
        with pytest.raises(Exception, match="lang"):
            make_lake_scorer(lake)


@pytest.mark.usefixtures("ray_session")
class TestCurationLoop:
    def test_score_slice_pack(self, tmp_path, capsys):
        """The full curation loop: ingest → dsir-score backfill → pack
        only the target-like score band into training shards. The band
        predicate is stamped, so re-packing under a different band
        rewrites instead of mixing."""
        from opendataloader_pdf_ray.__main__ import main
        from opendataloader_pdf_ray.cdc import backfill
        from opendataloader_pdf_ray.functions.dsir import make_lake_scorer

        lake = _seed(tmp_path)
        backfill(lake, make_lake_scorer(lake), name="dsir-score")
        state = lake.read_state()
        scaled = [v for v in state["dsir_logw_scaled"].to_pylist()
                  if v is not None]
        cut = sorted(scaled)[len(scaled) // 2]  # top half = target-like
        hi = max(scaled)

        out = str(tmp_path / "shards")
        assert main(["pack", lake.root, out, "--budget", "32",
                     "--range", f"dsir_logw_scaled:{cut}:{hi}"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["partitions_written"] > 0 and rep["tokens"] > 0

        import pyarrow.dataset as pads

        manifest = pads.dataset(out, format="parquet").to_table()
        in_band = {u for u, v in zip(state["url"].to_pylist(),
                                     state["dsir_logw_scaled"].to_pylist())
                   if v is not None and cut <= v <= hi}
        packed_urls = set(manifest["url"].to_pylist())
        assert packed_urls and packed_urls <= in_band
        # every in-band doc with text lands in a shard
        texted = {u for u, t in zip(state["url"].to_pylist(),
                                    state["text"].to_pylist())
                  if isinstance(t, str) and t.split()}
        assert packed_urls == in_band & texted

        # same band again → all skipped; different band → full rewrite
        assert main(["pack", lake.root, out, "--budget", "32",
                     "--range", f"dsir_logw_scaled:{cut}:{hi}"]) == 0
        rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep2["partitions_written"] == 0
        assert main(["pack", lake.root, out, "--budget", "32",
                     "--range", f"dsir_logw_scaled:{min(scaled)}:{hi}"]) == 0
        rep3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep3["partitions_written"] > 0
        manifest3 = pads.dataset(out, format="parquet").to_table()
        assert set(manifest3["url"].to_pylist()) >= packed_urls


    def test_follow_pack_with_range(self, tmp_path):
        """follow_pack honors the band filter (stamped, incremental)."""
        from opendataloader_pdf_ray.cdc import backfill
        from opendataloader_pdf_ray.cdc.pack import follow_pack
        from opendataloader_pdf_ray.functions.dsir import make_lake_scorer

        lake = _seed(tmp_path)
        lake.mark_epoch_done(0)  # follow_pack pins to the feed head
        backfill(lake, make_lake_scorer(lake), name="dsir-score")
        state = lake.read_state()
        scaled = [v for v in state["dsir_logw_scaled"].to_pylist()
                  if v is not None]
        cut, hi = sorted(scaled)[len(scaled) // 2], max(scaled)
        out = str(tmp_path / "shards")
        written = follow_pack(lake, out, budget=32, poll_interval=0.05,
                              max_idle_polls=2,
                              range_filter=("dsir_logw_scaled", cut, hi))
        assert written

        import pyarrow.dataset as pads

        manifest = pads.dataset(out, format="parquet").to_table()
        in_band = {u for u, v in zip(state["url"].to_pylist(),
                                     state["dsir_logw_scaled"].to_pylist())
                   if v is not None and cut <= v <= hi}
        assert set(manifest["url"].to_pylist()) <= in_band
