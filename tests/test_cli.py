"""CLI surface tests (reference CLIMain analog)."""

import json

from opendataloader_pdf_ray.__main__ import main
from opendataloader_pdf_ray.fixtures.gen import render_html


class TestConvertCLI:
    def test_directory_walk_and_outputs(self, tmp_path, capsys):
        src = tmp_path / "in"
        src.mkdir()
        for i in range(2):
            (src / f"d{i}.html").write_bytes(
                render_html(f"https://site00{i}.example/page0000{i}", 0))
        out = tmp_path / "out"
        rc = main(["convert", str(src), "--format", "text", "json",
                   "--output-dir", str(out)])
        assert rc == 0
        assert sorted(p.name for p in out.iterdir()) == [
            "d0.json", "d0.txt", "d1.json", "d1.txt"]
        doc = json.loads((out / "d0.json").read_text())
        assert doc["kids"] and doc["file name"] == "d0.html"

    def test_stdout_mode(self, tmp_path, capsys):
        f = tmp_path / "x.html"
        f.write_bytes(b"<h1>Hello</h1><p>world</p>")
        rc = main(["convert", str(f)])
        assert rc == 0
        assert capsys.readouterr().out.strip() == "Hello\nworld"

    def test_missing_file_warns_but_continues(self, tmp_path, capsys):
        f = tmp_path / "ok.html"
        f.write_bytes(b"<p>fine</p>")
        rc = main(["convert", str(tmp_path / "nope.html"), str(f)])
        assert rc == 0
        assert "not found" in capsys.readouterr().err


class TestDeltaIngestCLI:
    def test_epoch_delta_ingest_then_compact(self, tmp_path, capsys,
                                             ray_session):
        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.fixtures.gen import gen_events

        events = tmp_path / "events.parquet"
        pq.write_table(gen_events(120, 30, seed=42), str(events))
        lake_dir = tmp_path / "lake"
        rc = main(["ingest", str(events), str(lake_dir), "--epoch-size", "60",
                   "--partitions", "4", "--mode", "epoch",
                   "--commit-mode", "delta"])
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["events_consumed"] == 120
        assert stats["live_rows"] > 0

        rc = main(["compact", str(lake_dir), "--partitions", "4"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["partitions_compacted"] > 0
        assert out["files_reclaimed"] > 0

        from opendataloader_pdf_ray.cdc import Lake

        lake = Lake(str(lake_dir), 4)
        assert len(lake.partition_files()) > 0  # snapshot reads legal again
        assert lake.read_state().num_rows == stats["live_rows"]


class TestViewFsckCLI:
    def test_view_and_fsck(self, tmp_path, capsys, ray_session):
        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.fixtures.gen import gen_events

        events = tmp_path / "events.parquet"
        pq.write_table(gen_events(120, 30, seed=42), str(events))
        lake_dir = tmp_path / "lake"
        assert main(["ingest", str(events), str(lake_dir), "--epoch-size",
                     "60", "--partitions", "4", "--mode", "epoch",
                     "--commit-mode", "delta"]) == 0
        capsys.readouterr()

        assert main(["view", str(lake_dir), "--partitions", "4"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["folds_applied"] > 0
        assert sum(g["n_live"] for g in out["groups"]) > 0
        # second refresh is a no-op (exactly-once)
        assert main(["view", str(lake_dir), "--partitions", "4"]) == 0
        out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out2["folds_applied"] == 0
        assert out2["groups"] == out["groups"]

        assert main(["fsck", str(lake_dir), "--partitions", "4",
                     "--deep"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["ok"] and rep["commits"] > 0


class TestExportCLI:
    def test_export_delta_lake_without_compact(self, tmp_path, capsys,
                                               ray_session):
        """export streams a DELTA-mode (un-compacted) lake via the
        distributed merge-on-read reader and writes partitioned parquet
        equal to read_state's live view."""
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.cdc import Lake
        from opendataloader_pdf_ray.fixtures.gen import gen_events

        events = tmp_path / "events.parquet"
        pq.write_table(gen_events(120, 30, seed=42), str(events))
        lake_dir = tmp_path / "lake"
        assert main(["ingest", str(events), str(lake_dir), "--epoch-size",
                     "60", "--partitions", "4", "--mode", "epoch",
                     "--commit-mode", "delta"]) == 0
        capsys.readouterr()

        out_dir = tmp_path / "export"
        assert main(["export", str(lake_dir), str(out_dir)]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

        lake = Lake(str(lake_dir))
        want = lake.read_state()  # live view
        got = pads.dataset(str(out_dir), format="parquet").to_table()
        assert rep["rows"] == want.num_rows == got.num_rows
        assert sorted(got.column_names) == sorted(want.column_names)
        assert sorted(got["url"].to_pylist()) == sorted(want["url"].to_pylist())

        # resumable: delete one output file (simulated crash) — the re-run
        # rewrites ONLY it, skips the rest, and restores identical content
        import os

        files = sorted(f for f in os.listdir(out_dir)
                       if f.endswith(".parquet"))
        assert rep["files_written"] == len(files)
        victim = out_dir / files[0]
        victim_rows = pq.read_metadata(str(victim)).num_rows
        victim.unlink()
        assert main(["export", str(lake_dir), str(out_dir)]) == 0
        rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep2["files_written"] == 1
        assert rep2["files_skipped"] == len(files) - 1
        assert rep2["rows"] == want.num_rows
        assert pq.read_metadata(str(victim)).num_rows == victim_rows
        got2 = pads.dataset(str(out_dir), format="parquet").to_table()
        assert sorted(got2["url"].to_pylist()) == \
            sorted(want["url"].to_pylist())

        # --stream keeps the one-shot streaming writer
        out_s = tmp_path / "export_stream"
        assert main(["export", str(lake_dir), str(out_s), "--stream"]) == 0
        rep3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep3["rows"] == want.num_rows

    def test_export_partition_by_hive_layout(self, tmp_path, capsys,
                                              ray_session):
        """export --partition-by lang: Hive-layout slices, union == live
        view, re-run skips, a rewrite drops stale value slices."""
        import os

        import pyarrow as pa
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.cdc import Lake, Lineage

        def commit(lake, part, epoch, rows):
            t = pa.table({
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], pa.int64()),
                "seq": pa.array([r[1] for r in rows], pa.int64()),
                "text": pa.array([r[2] for r in rows], pa.string()),
                "lang": pa.array([r[3] for r in rows], pa.string()),
                "deleted": pa.array([False] * len(rows), pa.bool_()),
            })
            lake.commit_delta(part, epoch, t, Lineage(
                part=part, epoch=epoch, events_consumed=len(rows),
                rows_upserted=len(rows), rows_deleted=0,
                seq_min=min(r[1] for r in rows),
                seq_max=max(r[1] for r in rows)))

        lake_dir, out = str(tmp_path / "lake"), str(tmp_path / "hive")
        lake = Lake(lake_dir, 2)
        commit(lake, 0, 0, [("a", 1, "hello", "en"), ("b", 2, "salut", "fr")])
        commit(lake, 1, 0, [("c", 3, "welt", "de")])
        assert main(["export", lake_dir, out, "--partition-by",
                     "lang"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rows"] == 3 and rep["files_written"] == 2
        assert sorted(d for d in os.listdir(out)
                      if not d.startswith("_")) == [
            "lang=de", "lang=en", "lang=fr"]
        got = pads.dataset(out, format="parquet",
                           partitioning="hive",
                           ignore_prefixes=["_"]).to_table()
        assert sorted(got["url"].to_pylist()) == ["a", "b", "c"]
        # re-run: manifests skip every partition
        assert main(["export", lake_dir, out, "--partition-by",
                     "lang"]) == 0
        rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep2["files_skipped"] == 2 and rep2["files_written"] == 0
        # b's lang flips fr→en: the rewrite must DROP the stale fr slice
        commit(lake, 0, 1, [("b", 4, "hello again", "en")])
        assert main(["export", lake_dir, out, "--partition-by",
                     "lang"]) == 0
        rep3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep3["files_written"] == 1 and rep3["files_skipped"] == 1
        assert not os.path.exists(
            os.path.join(out, "lang=fr", "part=0000.parquet"))
        got2 = pads.dataset(out, format="parquet", partitioning="hive",
                            ignore_prefixes=["_"]).to_table()
        assert sorted(zip(got2["url"].to_pylist(),
                          (str(x) for x in got2["lang"].to_pylist()))) == [
            ("a", "en"), ("b", "en"), ("c", "de")]
        # crash resume: delete one value file — its manifest still claims
        # the tip, so force by deleting the manifest too
        os.remove(os.path.join(out, "lang=de", "part=0001.parquet"))
        os.remove(os.path.join(out, "_parts", "part=0001.json"))
        assert main(["export", lake_dir, out, "--partition-by",
                     "lang"]) == 0
        rep4 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep4["files_written"] == 1
        assert pq.read_metadata(
            os.path.join(out, "lang=de", "part=0001.parquet")).num_rows == 1
        # guard: --partition-by composes only with the resumable export
        assert main(["export", lake_dir, str(tmp_path / "x"),
                     "--partition-by", "lang", "--stream"]) == 2
        # guard: unknown column fails loudly
        import pytest as _pytest
        with _pytest.raises(ValueError, match="not in"):
            lake.export_resumable(str(tmp_path / "y"), partition_by="nope")

    def test_stats_metadata_only(self, tmp_path, capsys, ray_session):
        """stats reports partition sizes / delta chains from footers only."""
        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.fixtures.gen import gen_events

        events = tmp_path / "events.parquet"
        pq.write_table(gen_events(120, 30, seed=42), str(events))
        lake_dir = tmp_path / "lake"
        assert main(["ingest", str(events), str(lake_dir), "--epoch-size",
                     "60", "--partitions", "4", "--mode", "epoch",
                     "--commit-mode", "delta"]) == 0
        capsys.readouterr()
        assert main(["stats", str(lake_dir)]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["partitions"] == 4
        assert rep["total_bytes"] > 0
        assert rep["max_delta_chain"] >= 1  # delta mode, no compaction yet
        assert rep["skew_ratio"] >= 1.0
        assert len(rep["hottest"]) <= 5

    def test_export_incremental_refresh(self, tmp_path, capsys, ray_session):
        """Exported files carry the tip epoch they cover: after new epochs
        commit, a re-export rewrites ONLY the partitions whose tip advanced
        and the copy converges to the new lake state."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.cdc import Lake
        from opendataloader_pdf_ray.fixtures.gen import gen_events

        events = gen_events(120, 30, seed=42)
        half = tmp_path / "half.parquet"
        pq.write_table(events.filter(pc.less(events["seq"], 60)), str(half))
        full = tmp_path / "full.parquet"
        pq.write_table(events, str(full))
        lake_dir = tmp_path / "lake"
        assert main(["ingest", str(half), str(lake_dir), "--epoch-size",
                     "60", "--partitions", "4", "--mode", "epoch",
                     "--commit-mode", "delta"]) == 0
        out_dir = tmp_path / "export"
        assert main(["export", str(lake_dir), str(out_dir)]) == 0
        capsys.readouterr()
        # epoch 1 lands; some partitions advance
        assert main(["ingest", str(full), str(lake_dir), "--epoch-size",
                     "60", "--partitions", "4", "--mode", "epoch",
                     "--commit-mode", "delta"]) == 0
        capsys.readouterr()
        assert main(["export", str(lake_dir), str(out_dir)]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        lake = Lake(str(lake_dir))
        advanced = sum(1 for p in range(4) if lake.latest_epoch(p) == 1)
        assert rep["files_written"] == advanced  # only churned partitions
        want = lake.read_state()
        got = pads.dataset(str(out_dir), format="parquet").to_table()
        assert sorted(got["url"].to_pylist()) == \
            sorted(want["url"].to_pylist())
        # third run: nothing advanced → everything skipped
        assert main(["export", str(lake_dir), str(out_dir)]) == 0
        rep3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep3["files_written"] == 0


class TestKitchenSink:
    def test_every_flag_composes(self, tmp_path, capsys, ray_session):
        """All ingest-time features on ONE lake — delta commits, both
        indexes (delta mode), quarantine, auto-compaction — then the whole
        ops surface over it. Pins flag interactions (all four keyspaces
        fork the same materialized stream)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.fixtures.gen import gen_events

        t = gen_events(120, 30, seed=9)
        html = t["html"].to_pylist()
        poison = (("<div>" * 4000) + "p" + ("</div>" * 4000)).encode()
        for i, s in enumerate(t["seq"].to_pylist()):
            if s in (11, 73):
                html[i] = poison
        t = t.set_column(t.column_names.index("html"), "html",
                         pa.array(html, pa.binary()))
        ev = str(tmp_path / "events.parquet")
        pq.write_table(t, ev)
        lake = str(tmp_path / "lake")
        assert main(["ingest", ev, lake, "--epoch-size", "60",
                     "--partitions", "4", "--mode", "epoch",
                     "--commit-mode", "delta", "--dup-index",
                     "--dup-index-commits", "delta", "--near-index",
                     "--quarantine", "--auto-compact-chain", "1"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["events_consumed"] == 118  # 120 − 2 quarantined
        assert main(["fsck", lake, "--deep"]) == 0
        fs = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert fs["ok"] and fs["fpindex"]["ok"] and fs["nearidx"]["ok"] \
            and fs["quarantine"]["ok"]
        assert main(["stats", lake]) == 0
        st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert st["max_delta_chain"] <= 1  # auto-compaction held the bound
        assert main(["quarantine", lake]) == 0
        q = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert q["quarantined"] == 2
        assert main(["changes", lake]) == 0
        cf = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert sum(c["rows"] for c in cf["counts"]) > 0


class TestSeedCLI:
    def test_seed_then_wet_export(self, tmp_path, capsys, ray_session):
        """CLI crawl loop: seed WARC → lake → export --wet."""
        from opendataloader_pdf_ray.sources.warc import write_warc

        seg = str(tmp_path / "seg.warc")
        write_warc(seg, [
            (f"https://cli.example/p{i}", f"2026-04-01T00:00:0{i}Z",
             f"<html><body><p>cli seed {i}</p></body></html>".encode())
            for i in range(5)])
        lake_dir = str(tmp_path / "lake")
        assert main(["seed", seg, lake_dir, "--partitions", "4",
                     "--text-index"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rows"] == 5 and rep["records_consumed"] == 5
        assert rep["text_index_watermark"] == 0
        assert main(["search", lake_dir, "cli", "zzznever"]) == 0
        lines = capsys.readouterr().out.strip().splitlines()
        hits = [json.loads(l) for l in lines[-2:]]
        assert hits[0]["n_urls"] == 5 and hits[1]["n_urls"] == 0
        out = str(tmp_path / "wet")
        assert main(["export", lake_dir, out, "--wet"]) == 0
        rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep2["rows"] == 5 and rep2["format"] == "wet"
        assert main(["fsck", lake_dir]) == 0


class TestDupsCLI:
    def test_ingest_dup_index_then_dups(self, tmp_path, capsys, ray_session):
        """ingest --dup-index builds <lake>/fpindex; dups attributes the
        live state against it (summary mode and --out parquet mode)."""
        import pyarrow as pa
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        html_a = b"<html><body><p>same body everywhere</p></body></html>"
        n = 12
        events = pa.table({
            "seq": pa.array(list(range(n)), pa.int64()),
            "op": pa.array(["I"] * n, pa.string()),
            "url": pa.array([f"https://d.x/{i}" for i in range(n)],
                            pa.string()),
            "warc_ts": pa.array([1_700_000_000_000_000 + i * 1_000_000
                                 for i in range(n)], pa.timestamp("us")),
            "html": pa.array([html_a if i % 4 == 0 else
                              b"<p>only %d</p>" % i for i in range(n)],
                             pa.binary()),
            "lang": pa.array(["en"] * n, pa.string()),
        })
        events_path = tmp_path / "events.parquet"
        pq.write_table(events, str(events_path))
        lake_dir = tmp_path / "lake"
        assert main(["ingest", str(events_path), str(lake_dir),
                     "--epoch-size", "6", "--partitions", "4", "--mode",
                     "epoch", "--dup-index"]) == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # 12 events, 3 share one fingerprint → 10 distinct
        assert stats["distinct_fingerprints"] == 10

        assert main(["dups", str(lake_dir)]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep == {"live_rows": 12, "dup_rows": 2,
                       "distinct_fingerprints": 10}

        out_dir = tmp_path / "attributed"
        assert main(["dups", str(lake_dir), "--out", str(out_dir)]) == 0
        rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep2["live_rows"] == 12 and rep2["dup_rows"] == 2
        got = pads.dataset(str(out_dir), format="parquet").to_table()
        dups = {r["url"]: r["dup_of"] for r in got.to_pylist() if r["is_dup"]}
        assert dups == {"https://d.x/4": "https://d.x/0",
                        "https://d.x/8": "https://d.x/0"}


class TestRestoreCLI:
    def test_restore_then_roll_forward(self, tmp_path, capsys, ray_session):
        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.cdc import Lake
        from opendataloader_pdf_ray.fixtures.gen import gen_events

        events = tmp_path / "events.parquet"
        pq.write_table(gen_events(120, 30, seed=5), str(events))
        lake_dir = str(tmp_path / "lake")
        assert main(["ingest", str(events), lake_dir, "--epoch-size", "60",
                     "--partitions", "4", "--mode", "epoch"]) == 0
        capsys.readouterr()
        lake = Lake(lake_dir, 4)
        want = lake.read_state(as_of=0).sort_by("url")

        assert main(["restore", lake_dir, "0"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["target"] == 0 and rep["epoch"] == 2
        assert lake.read_state().sort_by("url").equals(want)


class TestImportJsonlCLI:
    def test_import_then_ingest(self, tmp_path, capsys, ray_session):
        import os

        from opendataloader_pdf_ray.fixtures.gen import gen_events
        from opendataloader_pdf_ray.sources.jsonl_binlog import \
            to_jsonl_segment

        events = gen_events(60, 20, seed=6)
        src = tmp_path / "jsonl"
        src.mkdir()
        (src / "seg-000000.jsonl").write_bytes(to_jsonl_segment(events))
        out = str(tmp_path / "pq")
        assert main(["import-jsonl", str(src), out]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["segments_imported"] == 1
        assert os.listdir(out) == ["seg-000000.parquet"]

        lake_dir = str(tmp_path / "lake")
        assert main(["ingest", out, lake_dir, "--epoch-size", "60",
                     "--partitions", "4", "--mode", "epoch"]) == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["events_consumed"] == 60
