"""CLI — the reference's ``opendataloader-pdf convert`` surface
(``cli/CLIMain.java:57-204``) re-targeted to HTML inputs.

    python -m opendataloader_pdf_ray convert PATH [PATH ...] \
        --format text markdown json html --output-dir OUT [--sanitize] \
        [--include-header-footer]
    python -m opendataloader_pdf_ray ingest EVENTS_PATH LAKE_DIR \
        [--epoch-size N] [--partitions P] [--mode backlog|epoch]

``convert`` walks files/directories (recursive, like the reference CLI
walker), processes every ``.html``/``.htm`` file, writes one output file per
requested format next to --output-dir, and prints a summary. Single files
with no --output-dir print to stdout (the reference's stdout sink).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path


def _iter_html_files(paths):
    for p in paths:
        path = Path(p)
        if path.is_dir():
            yield from sorted(path.rglob("*.html"))
            yield from sorted(path.rglob("*.htm"))
        elif path.exists():
            yield path
        else:
            print(f"warning: {p} not found, skipping", file=sys.stderr)


def _config_from_args(args):
    from .config import ExtractorConfig

    cfg = ExtractorConfig(
        sanitize=args.sanitize,
        include_header_footer=args.include_header_footer,
        pages=args.pages,
        table_method=args.table_method,
        trust_semantic_tags=args.use_semantic_tags,
        password=args.password,
        keep_line_breaks=not args.collapse_line_breaks,
        detect_strikethrough=args.detect_strikethrough,
        markdown_with_html=args.markdown_with_html,
        markdown_with_images=args.markdown_with_images,
        text_page_separator=args.text_page_separator,
        markdown_page_separator=args.markdown_page_separator,
        html_page_separator=args.html_page_separator,
        reading_order=args.reading_order != "off",
    )
    if args.content_safety_off:
        cfg = cfg.with_safety_off(args.content_safety_off)
    if args.replace_invalid_chars is not None:
        cfg = cfg.with_(replacement_text=args.replace_invalid_chars)
    return cfg


def _write_image_assets(html: bytes, cfg, path: Path, args) -> int:
    """--image-output external: decode embedded images to files (ImagesUtils
    external-file mode); embedded mode keeps them in the html/json payload."""
    from .extractor.assets import extract_image_assets

    assets = [a for a in extract_image_assets(html, cfg) if a["data"] is not None]
    if not assets:
        return 0
    img_dir = Path(args.image_dir or args.output_dir or ".") / f"{path.stem}_images"
    os.makedirs(img_dir, exist_ok=True)
    for a in assets:
        suffix = {"image/png": ".png", "image/jpeg": ".jpg"}.get(a["mime"], ".bin")
        (img_dir / f"asset-{a['asset_idx']:03d}{suffix}").write_bytes(a["data"])
    return len(assets)


def cmd_convert(args) -> int:
    from .api import convert

    cfg = _config_from_args(args)
    ext = {"text": ".txt", "markdown": ".md", "json": ".json", "html": ".out.html"}
    n_ok = n_fail = n_images = 0
    files = list(_iter_html_files(args.paths))
    for path in files:
        try:
            payload_bytes = path.read_bytes()
            out = convert(payload_bytes, cfg, output_formats=args.format,
                          file_name=path.name)
            if args.image_output == "external":
                n_images += _write_image_assets(payload_bytes, cfg, path, args)
                if cfg.markdown_with_images and "markdown" in out:
                    # markdown-with-images + external files: rewrite each
                    # data: URI link target to its written asset file
                    # (ImagesUtils external-file markdown mode)
                    from .extractor.assets import extract_image_assets

                    md = out["markdown"]
                    for a in extract_image_assets(payload_bytes, cfg):
                        if a["data"] is None:
                            continue
                        suffix = {"image/png": ".png",
                                  "image/jpeg": ".jpg"}.get(a["mime"], ".bin")
                        name = (f"{path.stem}_images/"
                                f"asset-{a['asset_idx']:03d}{suffix}")
                        # replace the first link still carrying a data URI
                        # (assets and markdown images share DOM order)
                        i = md.find("](data:")
                        if i >= 0:
                            j = md.find(")", i)
                            md = md[:i + 2] + name + md[j:]
                    out["markdown"] = md
        except Exception as exc:  # skip-and-continue (CLIMain.java:221-253)
            print(f"error: {path}: {exc}", file=sys.stderr)
            n_fail += 1
            continue
        n_ok += 1
        if args.output_dir:
            os.makedirs(args.output_dir, exist_ok=True)
            for fmt in args.format:
                dest = Path(args.output_dir) / (path.stem + ext[fmt])
                payload = out[fmt]
                if fmt == "json":
                    payload = json.dumps(payload, ensure_ascii=False, indent=1)
                dest.write_text(payload, encoding="utf-8")
        else:
            for fmt in args.format:
                payload = out[fmt]
                if fmt == "json":
                    payload = json.dumps(payload, ensure_ascii=False, indent=1)
                print(payload)
    if not args.quiet:
        summary = f"processed {n_ok} file(s), {n_fail} failed"
        if args.image_output == "external":
            summary += f", {n_images} image asset(s) extracted"
        print(summary, file=sys.stderr)
    return 0 if n_fail == 0 else 1


def cmd_ingest(args) -> int:
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .cdc import Lake, replay
    from .config import CDCConfig

    # size the extractor pool to the session: the default pool of 8×0.8-CPU
    # actors deadlocks a smaller cluster (all CPUs reserved, none left for
    # the read/shuffle stages)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    derive = None
    if args.embed:
        from .functions.text_stats import embed_text

        derive = embed_text  # picklable module-level callable
    cfg = CDCConfig(num_partitions=args.partitions, epoch_size=args.epoch_size,
                    epoch_commits=args.commit_mode,
                    maintain_dup_index=args.dup_index,
                    dup_index_commits=args.dup_index_commits,
                    maintain_near_index=args.near_index,
                    near_index_commits=args.near_index_commits,
                    quarantine_errors=args.quarantine,
                    auto_compact_chain=args.auto_compact_chain,
                    derive=derive,
                    patch_ops=args.patch_ops,
                    extract_mode=args.extract_mode,
                    pack_blocks=args.pack_blocks,
                    extract_concurrency=max(1, min(8, cpus - 1)))
    followers = []
    if args.text_index:
        from .cdc import TextIndex, text_index_root

        t_root = text_index_root(args.lake)
        n_idx = None
        if not os.path.exists(os.path.join(t_root, "_commits", "lake.json")):
            n_idx = 32  # fresh index with no persisted metadata
        followers.append(TextIndex(t_root, num_partitions=n_idx))
    if args.vec_index:
        from .cdc import VectorIndex, vec_index_root

        v_root = vec_index_root(args.lake)
        n_idx = None
        if not os.path.exists(os.path.join(v_root, "_commits", "lake.json")):
            n_idx = 32
        followers.append(VectorIndex(v_root, num_partitions=n_idx, dim=32))
    if args.substr_index:
        from .cdc import SubstringIndex, substr_index_root

        g_root = substr_index_root(args.lake)
        n_idx = None
        if not os.path.exists(os.path.join(g_root, "_commits", "lake.json")):
            n_idx = 32
        followers.append(SubstringIndex(g_root, num_partitions=n_idx))
    for col in (args.col_index or ()):
        from .cdc import ColumnIndex, col_index_root

        c_root = col_index_root(args.lake, col)
        n_idx = None
        if not os.path.exists(os.path.join(c_root, "_commits", "lake.json")):
            n_idx = 32
        followers.append(ColumnIndex(c_root, num_partitions=n_idx, col=col))
    for spec in (args.range_index or ()):
        from .cdc import RangeIndex, range_index_root

        col, _, width = spec.partition(":")
        r_root = range_index_root(args.lake, col)
        n_idx = None
        if not os.path.exists(os.path.join(r_root, "_commits", "lake.json")):
            n_idx = 32
        followers.append(RangeIndex(
            r_root, num_partitions=n_idx, col=col,
            width=int(width) if width else None))
    for vname in (args.view or ()):
        from .cdc import MaterializedView

        class _ViewFollower:
            """Adapt MaterializedView (lake bound at init, folds every
            pending (part, epoch) idempotently) to the follower-refresh
            protocol — the tail keeps the aggregate view fresh after each
            committed epoch, and the crash-heal catch-up path covers a
            crash between commit and view fold."""

            def __init__(self, v):
                self.v = v

            def refresh(self, lake, up_to=None):
                self.v.refresh()

        followers.append(_ViewFollower(
            MaterializedView(Lake(args.lake, args.partitions), vname)))
    if args.mode == "follow":
        if "," in args.events:
            # fan-in: K comma-separated segment dirs merged into one lake
            # (aligned per-source seq bands, min-watermark; cdc/ingest.py
            # follow_fanin)
            from .cdc.ingest import follow_fanin

            lineage = follow_fanin(args.events.split(","), args.lake, cfg,
                                   poll_interval=args.poll_interval,
                                   followers=followers)
        else:
            from .cdc.ingest import follow

            lineage = follow(args.events, args.lake, cfg,
                             poll_interval=args.poll_interval,
                             followers=followers)
    else:
        if "," in args.events:
            raise SystemExit(
                "fan-in (comma-separated EVENTS) requires --mode follow")
        lineage = replay(args.events, args.lake, cfg, mode=args.mode)
    lake = Lake(args.lake, cfg.num_partitions)
    for f in followers:  # batch modes: one refresh after the replay;
        f.refresh(lake)  # follow mode: a no-op catch-up (watermark current)
    state = lake.read_state()
    summary = {
        "partitions_committed": len(lineage),
        "events_consumed": sum(l["events_consumed"] for l in lineage),
        "rows_upserted": sum(l["rows_upserted"] for l in lineage),
        "rows_deleted": sum(l["rows_deleted"] for l in lineage),
        "live_rows": state.num_rows,
    }
    if args.dup_index:
        from .cdc import DupIndex, dup_index_root

        summary["distinct_fingerprints"] = DupIndex(
            dup_index_root(args.lake)).count_fingerprints()
    if args.near_index:
        from .cdc.ingest import near_index_root
        from .cdc.neardup import NearDupIndex

        summary["near_index_band_entries"] = NearDupIndex(
            near_index_root(args.lake)).count_fingerprints()
    for f in followers:
        if type(f).__name__ == "_ViewFollower":  # view: folds, no watermark
            summary[f"view_{f.v.name}_groups"] = f.v.read().num_rows
            continue
        kind = {"TextIndex": "text_index", "VectorIndex": "vec_index",
                "RangeIndex": None}.get(type(f).__name__, None)
        if kind is None:
            prefix = ("range_index" if type(f).__name__ == "RangeIndex"
                      else "col_index")
            kind = f"{prefix}_{f.col}"
        summary[f"{kind}_watermark"] = f.watermark()
    print(json.dumps(summary))
    if started_ray:  # leave an externally owned session (e.g. pytest) alone
        ray.shutdown()
    return 0


def cmd_compact(args) -> int:
    import ray

    from .cdc import DupIndex, Lake, dup_index_root

    # partition folds run as Ray tasks — the driver never folds data
    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    lake = Lake(args.lake, args.partitions)
    compacted = lake.compact_distributed()
    removed = lake.vacuum(keep_snapshots=args.keep_snapshots)
    report = {"partitions_compacted": compacted, "files_reclaimed": removed}
    idx_root = dup_index_root(args.lake)
    if lake.fs.exists(idx_root):  # fold the fingerprint keyspace too
        index = DupIndex(idx_root)
        report["fpindex_compacted"] = index.compact_distributed()
        report["fpindex_reclaimed"] = index.lake.vacuum(
            keep_snapshots=args.keep_snapshots)
    from .cdc.ingest import near_index_root
    from .cdc.neardup import NearDupIndex

    near_root = near_index_root(args.lake)
    if lake.fs.exists(near_root):  # and the SimHash band keyspace
        nindex = NearDupIndex(near_root)
        report["nearidx_compacted"] = nindex.compact_distributed()
        report["nearidx_reclaimed"] = nindex.lake.vacuum(
            keep_snapshots=args.keep_snapshots)
    from .cdc import (TextIndex, VectorIndex, text_index_root,
                      vec_index_root)

    t_root = text_index_root(args.lake)
    if lake.fs.exists(t_root):  # and the inverted token keyspace
        tindex = TextIndex(t_root)
        report["textidx_compacted"] = tindex.compact_distributed()
        report["textidx_reclaimed"] = tindex.lake.vacuum(
            keep_snapshots=args.keep_snapshots)
    v_root = vec_index_root(args.lake)
    if lake.fs.exists(v_root):  # and the ANN bucket keyspace
        vindex = VectorIndex(v_root)
        report["vecidx_compacted"] = vindex.compact_distributed()
        report["vecidx_reclaimed"] = vindex.lake.vacuum(
            keep_snapshots=args.keep_snapshots)
    from .cdc import SubstringIndex, substr_index_root

    g_root = substr_index_root(args.lake)
    if lake.fs.exists(g_root):  # and the trigram keyspace
        gindex = SubstringIndex(g_root)
        report["trgmidx_compacted"] = gindex.compact_distributed()
        report["trgmidx_reclaimed"] = gindex.lake.vacuum(
            keep_snapshots=args.keep_snapshots)
    from .cdc import (ColumnIndex, RangeIndex, list_col_indexes,
                      list_range_indexes)

    for c_root in list_col_indexes(args.lake):  # and column keyspaces
        cidx = ColumnIndex(c_root)
        name = os.path.basename(c_root)
        report[f"{name}_compacted"] = cidx.compact_distributed()
        report[f"{name}_reclaimed"] = cidx.lake.vacuum(
            keep_snapshots=args.keep_snapshots)
    for r_root in list_range_indexes(args.lake):  # and range keyspaces
        ridx = RangeIndex(r_root)
        name = os.path.basename(r_root)
        report[f"{name}_compacted"] = ridx.compact_distributed()
        report[f"{name}_reclaimed"] = ridx.lake.vacuum(
            keep_snapshots=args.keep_snapshots)
    print(json.dumps(report))
    return 0


def cmd_fsck(args) -> int:
    from .cdc import DupIndex, Lake, dup_index_root

    lake = Lake(args.lake, args.partitions)
    report = lake.verify(deep=args.deep)
    idx_root = dup_index_root(args.lake)
    if lake.fs.exists(idx_root):  # audit the fingerprint keyspace too
        report["fpindex"] = DupIndex(idx_root).verify(deep=args.deep)
    from .cdc.ingest import near_index_root
    from .cdc.neardup import NearDupIndex

    near_root = near_index_root(args.lake)
    if lake.fs.exists(near_root):  # and the SimHash band keyspace
        report["nearidx"] = NearDupIndex(near_root).verify(deep=args.deep)
    from .cdc.quarantine import quarantine_root

    q_root = quarantine_root(args.lake)
    if lake.fs.exists(q_root):
        # DLQ: shallow only — it is an append-only event log (sorted by
        # seq, no tombstone column), so deep's snapshot invariants
        # (url-sorted, unique, deleted col) do not apply
        report["quarantine"] = Lake(q_root).verify(deep=False)
    from .cdc import (TextIndex, VectorIndex, text_index_root,
                      vec_index_root)

    t_root = text_index_root(args.lake)
    if lake.fs.exists(t_root):  # and the inverted token keyspace
        report["textidx"] = TextIndex(t_root).verify(deep=args.deep)
    v_root = vec_index_root(args.lake)
    if lake.fs.exists(v_root):  # and the ANN bucket keyspace
        report["vecidx"] = VectorIndex(v_root).verify(deep=args.deep)
    from .cdc import SubstringIndex, substr_index_root

    g_root = substr_index_root(args.lake)
    if lake.fs.exists(g_root):  # and the trigram keyspace
        report["trgmidx"] = SubstringIndex(g_root).verify(deep=args.deep)
    from .cdc import (ColumnIndex, RangeIndex, list_col_indexes,
                      list_range_indexes)

    col_reports = []
    for c_root in list_col_indexes(args.lake):  # and column keyspaces
        name = os.path.basename(c_root)
        report[name] = ColumnIndex(c_root).verify(deep=args.deep)
        col_reports.append(report[name])
    for r_root in list_range_indexes(args.lake):  # and range keyspaces
        name = os.path.basename(r_root)
        report[name] = RangeIndex(r_root).verify(deep=args.deep)
        col_reports.append(report[name])
    print(json.dumps(report))
    ok = (report["ok"] and report.get("fpindex", {"ok": True})["ok"]
          and report.get("nearidx", {"ok": True})["ok"]
          and report.get("quarantine", {"ok": True})["ok"]
          and report.get("textidx", {"ok": True})["ok"]
          and report.get("vecidx", {"ok": True})["ok"]
          and report.get("trgmidx", {"ok": True})["ok"]
          and all(r["ok"] for r in col_reports))
    return 0 if ok else 1


def cmd_seed(args) -> int:
    """Seed epoch 0 from WARC segments (cdc/seed.py)."""
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .cdc import seed_from_warc
    from .config import CDCConfig

    cpus = int(ray.cluster_resources().get("CPU", 8))
    cfg = CDCConfig(num_partitions=args.partitions,
                    quarantine_errors=args.quarantine,
                    maintain_dup_index=args.dup_index,
                    maintain_near_index=args.near_index,
                    extract_concurrency=max(1, min(8, cpus - 1)))
    lineage = seed_from_warc(args.warc, args.lake, cfg)
    summary = {
        "partitions_committed": sum(1 for l in lineage if not l["skipped"]),
        "records_consumed": int(sum(l["events_consumed"] for l in lineage)),
        "rows": int(sum(l["rows_upserted"] for l in lineage)),
    }
    if args.text_index:  # bootstrap the full-text follower at epoch 0 too
        from .cdc import Lake, TextIndex, text_index_root

        t_root = text_index_root(args.lake)
        n_idx = None
        if not os.path.exists(os.path.join(t_root, "_commits", "lake.json")):
            n_idx = 32
        idx = TextIndex(t_root, num_partitions=n_idx)
        idx.refresh(Lake(args.lake, cfg.num_partitions))
        summary["text_index_watermark"] = idx.watermark()
    print(json.dumps(summary))
    if started_ray:
        ray.shutdown()
    return 0


def cmd_stats(args) -> int:
    """Metadata-only lake diagnostics (no Ray session needed); follower
    keyspaces (fpindex/nearidx/textidx/vecidx) report theirs alongside."""
    from .cdc.changefeed import list_consumers
    from .cdc.ingest import dup_index_root, near_index_root
    from .cdc.lake import Lake
    from .cdc.textindex import text_index_root
    from .cdc.trigramindex import substr_index_root as _substr_root
    from .cdc.vecindex import vec_index_root

    lake = Lake(args.lake, args.partitions)
    report = lake.stats()
    consumers = list_consumers(lake)
    if consumers:
        report["consumers"] = consumers
    for name, root in (("fpindex", dup_index_root(args.lake)),
                       ("nearidx", near_index_root(args.lake)),
                       ("textidx", text_index_root(args.lake)),
                       ("vecidx", vec_index_root(args.lake)),
                       ("trgmidx", _substr_root(args.lake))):
        if lake.fs.exists(root):
            report[name] = Lake(root).stats()
    from .cdc import list_col_indexes, list_range_indexes

    for c_root in list_col_indexes(args.lake):
        report[os.path.basename(c_root)] = Lake(c_root).stats()
    for r_root in list_range_indexes(args.lake):
        report[os.path.basename(r_root)] = Lake(r_root).stats()
    print(json.dumps(report))
    return 0


def cmd_branch(args) -> int:
    """Zero-copy branch: O(1) metadata writes, no data copied (no Ray
    session needed). The branch reads parent history ≤ fork by delegation
    and diverges after it; the parent's vacuum pins the files every
    registered fork needs. Merge back fast-forward with ``replicate BRANCH
    PARENT`` (guard: parent tip must still be ≤ fork), or verify divergence
    with ``diff``."""
    from .cdc.lake import Lake

    src = Lake(args.src)
    at = None if args.at is None else src.resolve_epoch_ref(args.at)
    br = src.branch(args.dest, at=at, name=args.name)
    print(json.dumps({"branch": br.root, "parent": src.root,
                      "fork_epoch": br.fork_epoch,
                      "name": (br._read_meta() or {}).get("branch_name")}))
    return 0


def cmd_detach(args) -> int:
    """Promote a branch to a standalone lake: compact at the tip
    (distributed when a Ray session exists), copy the parent chain's
    commit metadata ≤ fork, drop the parent link and unregister — the
    parent may then be vacuumed aggressively or deleted."""
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .cdc.lake import Lake

    try:
        print(json.dumps(Lake(args.lake).detach()))
    finally:
        if started_ray:
            ray.shutdown()
    return 0


def cmd_rescale(args) -> int:
    """Shuffle-free P → k·P / P/k re-partition into a new lake root."""
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .cdc import Lake, rescale

    src = Lake(args.src)
    summary = rescale(src, args.dest, args.new_partitions, as_of=args.as_of)
    print(json.dumps({
        "src_partitions": src.num_partitions,
        "dest_partitions": args.new_partitions,
        "dest_parts_written": sum(1 for r in summary if not r["skipped"]),
        "dest_parts_skipped": sum(1 for r in summary if r["skipped"]),
        "rows": int(sum(r["rows"] for r in summary)),
    }))
    if started_ray:
        ray.shutdown()
    return 0


def cmd_quarantine(args) -> int:
    """Print the DLQ: per-(part, epoch) counts + every poison record's
    (url, seq, error) as one JSON line. Driver-side read — the DLQ is
    metadata-sized next to the corpus; no Ray session needed.
    ``--retry EVENTS`` closes the loop: re-drive the quarantined events
    through the CURRENT extractor and fold successes back into the lake as
    one exactly-once maintenance epoch (cdc/quarantine.retry_quarantine)."""
    from .cdc.lake import Lake
    from .cdc.quarantine import QuarantineStore, quarantine_root

    lake = Lake(args.lake, args.partitions)
    if args.retry:
        import ray

        started_ray = not ray.is_initialized()
        if started_ray:
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        from .cdc.quarantine import retry_quarantine
        from .config import CDCConfig

        cpus = int(ray.cluster_resources().get("CPU", 8))
        cfg = CDCConfig(num_partitions=lake.num_partitions,
                        extract_concurrency=max(1, min(8, cpus - 1)))
        summary = retry_quarantine(lake, args.retry, cfg)
        print(json.dumps(summary))
        if started_ray:
            ray.shutdown()
        return 0
    store = QuarantineStore(quarantine_root(args.lake), lake.num_partitions)
    t = store.read(epoch=args.epoch)
    rows = [] if t is None else [
        {"epoch": r["epoch"], "seq": r["seq"], "url": r["url"],
         "error": r["extract_error"]} for r in t.to_pylist()]
    print(json.dumps({"quarantined": len(rows), "rows": rows}))
    return 0


def cmd_changes(args) -> int:
    """Stream the lake's row-level change feed: to parquet with ``--out``,
    else print per-(epoch, op) counts as one JSON line. Both paths stream —
    counts come from a Dataset groupby, never a driver materialization."""
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .cdc import Lake

    lake = Lake(args.lake, args.partitions)
    if args.follow:
        # tail mode: one parquet file per completed epoch window under
        # --out; restart resumes from the highest hi-epoch already written
        import os as _os
        import re as _re

        from .cdc.changefeed import follow_changes

        if not args.out:
            print(json.dumps({"error": "--follow requires --out"}))
            return 2
        _os.makedirs(args.out, exist_ok=True)
        watermark = args.since
        if args.consumer is None:
            # no consumer group: resume from the output file names
            pat = _re.compile(r"feed-(-?\d+)-(\d+)\.parquet$")
            for name in _os.listdir(args.out):
                m = pat.match(name)
                if m:
                    watermark = max(watermark, int(m.group(2)))
        import pyarrow.parquet as _pq

        windows = 0
        for lo, hi, table in follow_changes(
                lake, since=watermark,
                poll_interval=args.poll_interval,
                max_idle_polls=args.idle_stop,
                consumer=args.consumer):
            path = _os.path.join(args.out, f"feed-{lo + 1}-{hi}.parquet")
            tmp = path + ".tmp"
            _pq.write_table(table, tmp, compression="zstd")
            _os.rename(tmp, path)
            windows += 1
        print(json.dumps({"windows_written": windows, "out": args.out,
                          "resumed_from": args.since}))
        if started_ray:
            ray.shutdown()
        return 0
    feed = lake.changes(since=args.since, until=args.until,
                        before=args.before or None,
                        min_ts=args.min_ts, max_ts=args.max_ts)
    if args.out:
        feed.write_parquet(args.out)
        import pyarrow.dataset as pads

        n = pads.dataset(args.out, format="parquet").count_rows()
        print(json.dumps({"rows": n, "out": args.out, "since": args.since}))
    else:
        counts = feed.groupby(["epoch", "op"]).count().sort(["epoch", "op"])
        rows = counts.take_all()  # ≤ epochs × 3 rows
        print(json.dumps({"since": args.since, "counts": [
            {"epoch": int(r["epoch"]), "op": r["op"],
             "rows": int(r["count()"])} for r in rows]}))
    if started_ray:
        ray.shutdown()
    return 0


def cmd_export(args) -> int:
    """Stream lake state (distributed merge-on-read, works on delta-mode
    lakes) to a parquet directory. The write STREAMS — nothing lake-sized
    is pinned; the reported row count comes from the written files' footers
    (metadata only, no second read)."""
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .cdc import Lake

    lake = Lake(args.lake, args.partitions)
    if args.partition_by and (args.stream or args.wet):
        print("error: --partition-by requires the default resumable "
              "export (not --stream/--wet)", file=sys.stderr)
        return 2
    where_eq = None
    if args.eq:
        if args.stream or args.wet:
            print("error: --eq requires the default resumable export "
                  "(not --stream/--wet)", file=sys.stderr)
            return 2
        where_eq = {}
        for spec in args.eq:
            col, _, vals = spec.partition("=")
            if not vals:
                print(f"error: bad --eq {spec!r}: COL=V[,V...]",
                      file=sys.stderr)
                return 2
            where_eq.setdefault(col, []).extend(vals.split(","))
    where_range = None
    if args.range:
        if args.stream or args.wet:
            print("error: --range requires the default resumable export "
                  "(not --stream/--wet)", file=sys.stderr)
            return 2
        where_range = {}
        for spec in args.range:
            parts = spec.split(":")
            if len(parts) != 3:
                print(f"error: bad --range {spec!r}: COL:LO:HI",
                      file=sys.stderr)
                return 2
            where_range[parts[0]] = (int(parts[1]), int(parts[2]))
    if args.wet:
        from .sources.warc import export_wet

        summary = export_wet(args.lake, args.out,
                             num_partitions=args.partitions,
                             as_of=args.as_of)
        print(json.dumps({
            "out": args.out, "format": "wet",
            "segments_written": sum(1 for s in summary if not s["skipped"]),
            "segments_skipped": sum(1 for s in summary if s["skipped"]),
            "rows": int(sum(s["rows"] for s in summary
                            if not s["skipped"])),
        }))
        if started_ray:
            ray.shutdown()
        return 0
    if args.stream:
        ds = lake.read_dataset(as_of=args.as_of,
                               include_tombstones=args.tombstones)
        ds.write_parquet(args.out)
        import pyarrow.dataset as pads

        n = pads.dataset(args.out, format="parquet").count_rows()
        print(json.dumps({"rows": n, "out": args.out,
                          "partitions": lake.num_partitions}))
    else:
        # default: resumable per-partition export — a re-run after a crash
        # skips every part=NNNN.parquet that already exists (atomic writes
        # make existence mean complete)
        summary = lake.export_resumable(args.out, as_of=args.as_of,
                                        include_tombstones=args.tombstones,
                                        partition_by=args.partition_by,
                                        where_eq=where_eq,
                                        where_range=where_range)
        print(json.dumps({
            "rows": sum(s["rows"] for s in summary),
            "out": args.out,
            "partitions": lake.num_partitions,
            "files_written": sum(1 for s in summary if not s["skipped"]),
            "files_skipped": sum(1 for s in summary if s["skipped"]),
        }))
    if started_ray:
        ray.shutdown()
    return 0


def cmd_get(args) -> int:
    """Point lookup: hash-route the urls to their partitions and read only
    those (no Ray session needed — O(|urls|) partition reads)."""
    from .cdc import Lake

    lake = Lake(args.lake, args.partitions)
    as_of = None if args.as_of is None else lake.resolve_epoch_ref(args.as_of)
    t = lake.lookup(args.urls, as_of=as_of,
                    include_tombstones=args.tombstones)
    rows = [] if t is None else t.to_pylist()
    for r in rows:  # timestamps → ISO strings for JSON
        for k, v in r.items():
            if hasattr(v, "isoformat"):
                r[k] = v.isoformat()
    print(json.dumps({"found": len(rows), "rows": rows}, default=str))
    return 0


def cmd_purge(args) -> int:
    """Right-to-be-forgotten: physically remove urls from every data file of
    their partitions (all epochs); audit records store url hashes only. When
    the lake carries a fingerprint index (ingest --dup-index) its owner
    records are scrubbed too — the index stores urls."""
    from .cdc import DupIndex, Lake, dup_index_root

    lake = Lake(args.lake, args.partitions)
    report = lake.purge(args.urls)
    idx_root = dup_index_root(args.lake)
    if lake.fs.exists(idx_root):
        report["fpindex"] = DupIndex(idx_root).purge_keys(args.urls)
    from .cdc.ingest import near_index_root
    from .cdc.neardup import NearDupIndex

    near_root = near_index_root(args.lake)
    if lake.fs.exists(near_root):  # band index stores owner urls too
        report["nearidx"] = NearDupIndex(near_root).purge_keys(args.urls)
    from .cdc.quarantine import QuarantineStore, quarantine_root

    q_root = quarantine_root(args.lake)
    if lake.fs.exists(q_root):  # the DLQ stores urls — scrub it too
        report["quarantine"] = QuarantineStore(
            q_root, Lake(q_root).num_partitions).purge_urls(args.urls)
    from .cdc.textindex import TextIndex, text_index_root

    t_root = text_index_root(args.lake)
    if lake.fs.exists(t_root):  # posting rows carry urls — scrub them too
        report["textidx"] = TextIndex(t_root).purge_keys(args.urls)
    from .cdc import VectorIndex, vec_index_root

    v_root = vec_index_root(args.lake)
    if lake.fs.exists(v_root):  # vector postings carry urls too
        report["vecidx"] = VectorIndex(v_root).purge_keys(args.urls)
    from .cdc import SubstringIndex, substr_index_root

    g_root = substr_index_root(args.lake)
    if lake.fs.exists(g_root):  # trigram postings carry urls too
        report["trgmidx"] = SubstringIndex(g_root).purge_keys(args.urls)
    from .cdc import (ColumnIndex, RangeIndex, list_col_indexes,
                      list_range_indexes)

    for c_root in list_col_indexes(args.lake):  # value postings carry urls
        report[os.path.basename(c_root)] = \
            ColumnIndex(c_root).purge_keys(args.urls)
    for r_root in list_range_indexes(args.lake):  # range postings too
        report[os.path.basename(r_root)] = \
            RangeIndex(r_root).purge_keys(args.urls)
    print(json.dumps(report))
    return 0


def cmd_dups(args) -> int:
    """Read-time duplicate attribution: annotate the live lake state with
    dup_of/is_dup via the co-partitioned <lake>/fpindex lookup (built by
    ``ingest --dup-index``). Streams — with ``--out`` the attributed rows go
    to partitioned parquet; the summary never pulls lake-sized data to the
    driver."""
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa

    from .cdc import DupIndex, Lake, dup_index_root
    from .cdc.ingest import near_index_root
    from .cdc.neardup import NearDupIndex

    lake = Lake(args.lake, args.partitions)
    if args.near:
        index = NearDupIndex(near_index_root(args.lake))
        flag_col = "is_near_dup"
    else:
        index = DupIndex(dup_index_root(args.lake))
        flag_col = "is_dup"
    ds = index.attribute(lake.read_dataset(), keep_cols=["url"])
    if args.out:
        ds.write_parquet(args.out)
        import pyarrow.dataset as pads

        written = pads.dataset(args.out, format="parquet")
        live = written.count_rows()
        # columnar scan of the one bool column — never the payload
        dups = int(pa.Table.from_batches(
            written.scanner(columns=[flag_col]).to_batches()
        )[flag_col].cast(pa.int64()).combine_chunks().to_pandas().sum()) \
            if live else 0
    else:
        from ray.data.aggregate import Count, Sum

        def pre(t: pa.Table) -> pa.Table:
            return pa.table({flag_col: t[flag_col].cast(pa.int64())})

        agg = ds.map_batches(pre, batch_format="pyarrow").aggregate(
            Count(alias_name="live"), Sum(flag_col, alias_name="dups"))
        live, dups = int(agg["live"]), int(agg["dups"] or 0)
    print(json.dumps({
        "live_rows": live,
        ("near_dup_rows" if args.near else "dup_rows"): dups,
        "distinct_fingerprints": index.count_fingerprints(),
        **({"out": args.out} if args.out else {}),
    }))
    if started_ray:
        ray.shutdown()
    return 0


def cmd_semdups(args) -> int:
    """Semantic duplicate attribution over the LIVE lake (cdc/semdedup.py —
    SemDeDup on the vec column): k-means the embedding space, prune within
    clusters by cosine, annotate (cluster_id, is_sem_dup, sem_dup_of).
    Needs embeddings: ingest with --embed or `backfill --transform embed`."""
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .cdc import Lake
    from .cdc.semdedup import attribute_semantic, semantic_summary

    lake = Lake(args.lake, args.partitions)
    ds = attribute_semantic(lake, k=args.clusters, iters=args.iters,
                            threshold=args.threshold, as_of=args.as_of)
    if args.out:
        ds = ds.materialize()
        ds.write_parquet(args.out)
    summary = semantic_summary(ds)
    print(json.dumps({**summary, "clusters_k": args.clusters,
                      "threshold": args.threshold,
                      **({"out": args.out} if args.out else {})}))
    if started_ray:
        ray.shutdown()
    return 0


def cmd_backfill(args) -> int:
    """Recompute / add derived columns across every live lake row as one
    exactly-once epoch (cdc/backfill.py): resumable per partition, time
    travel across the rewrite preserved. Transforms are the named built-ins
    below (library users pass any callable to ``cdc.backfill``)."""
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .cdc import Lake, backfill
    from .functions import text_stats

    transforms = {
        "token-stats": text_stats.token_stats,     # n_tokens / n_bpe_tokens…
        "quality-score": text_stats.quality_score,  # punct/stopword ratios…
        "embed": text_stats.embed_text,  # hashed-token vec → vec-index
    }
    lake = Lake(args.lake, args.partitions)
    if args.transform == "dsir-score":
        # corpus-global transform: the two-histogram pre-pass streams the
        # live lake once, then the scorer is a broadcast dot product
        from .functions.dsir import make_lake_scorer

        fn = make_lake_scorer(lake, target_lang=args.dsir_target_lang)
    else:
        fn = transforms[args.transform]
    lineage = backfill(lake, fn, name=args.transform)
    print(json.dumps({
        "transform": args.transform,
        "epoch": lineage[0]["epoch"] if lineage else None,
        "partitions_committed": sum(1 for l in lineage if not l["skipped"]),
        "partitions_skipped": sum(1 for l in lineage if l["skipped"]),
        "rows_rewritten": sum(l["rows_upserted"] for l in lineage
                              if not l["skipped"]),
    }))
    if started_ray:
        ray.shutdown()
    return 0


def cmd_retention(args) -> int:
    """Expire live rows older than a cutoff as one exactly-once tombstone
    epoch (cdc/retention.py): resumable per partition, time travel across
    the expiry preserved, physical reclaim at the next compact/vacuum."""
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .cdc import Lake
    from .cdc.retention import apply_retention

    lake = Lake(args.lake, args.partitions)
    lineage = apply_retention(lake, args.cutoff_ts_us, ts_col=args.ts_col,
                              cooperative=args.cooperative,
                              lease_timeout=args.lease_timeout)
    print(json.dumps({
        "cutoff_ts_us": args.cutoff_ts_us,
        "epoch": lineage[0]["epoch"] if lineage else None,
        "partitions_committed": sum(1 for l in lineage if not l["skipped"]),
        "partitions_skipped": sum(1 for l in lineage if l["skipped"]),
        "rows_expired": sum(l["rows_deleted"] for l in lineage
                            if not l["skipped"]),
    }))
    if started_ray:
        ray.shutdown()
    return 0


def cmd_restore(args) -> int:
    """Roll the lake's LIVE state back to a past epoch as one exactly-once
    maintenance epoch (cdc/restore.py): post-target inserts tombstoned,
    deletes resurrected, updates reverted; time travel across the rollback
    preserved (a second restore can roll forward again)."""
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .cdc import Lake
    from .cdc.restore import apply_restore

    lake = Lake(args.lake, args.partitions)
    target = lake.resolve_epoch_ref(args.target)
    lineage = apply_restore(lake, target)
    print(json.dumps({
        "target": target,
        "epoch": lineage[0]["epoch"] if lineage else None,
        "partitions_committed": sum(1 for l in lineage if not l["skipped"]),
        "partitions_skipped": sum(1 for l in lineage if l["skipped"]),
        "rows_tombstoned": sum(l["rows_deleted"] for l in lineage
                               if not l["skipped"]),
    }))
    if started_ray:
        ray.shutdown()
    return 0


def cmd_import_jsonl(args) -> int:
    """Normalize Debezium-style JSONL change-event segments into the
    engine's parquet segment layout (sources/jsonl_binlog.py): one Ray task
    per segment, resumable, atomic per-segment writes. The output dir is a
    normal binlog for ``ingest`` (all seq/row-group pruning applies)."""
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .sources.jsonl_binlog import follow_import, import_jsonl

    if args.follow:
        total = polls = 0
        for n in follow_import(args.src, args.out,
                               poll_interval=args.poll_interval,
                               max_idle_polls=args.idle_stop):
            total += n
            polls += 1
            print(json.dumps({"segments_imported": n}), flush=True)
        print(json.dumps({"segments_imported_total": total,
                          "productive_polls": polls, "out": args.out}))
    else:
        n = import_jsonl(args.src, args.out)
        print(json.dumps({"segments_imported": n, "out": args.out}))
    if started_ray:
        ray.shutdown()
    return 0


def cmd_export_jsonl(args) -> int:
    """The inverse of import-jsonl (sources/jsonl_binlog.export_jsonl):
    parquet binlog segments → Debezium-style JSONL segments, so the
    engine's binlog is consumable by JSONL/Kafka tooling. Round trip
    (export-jsonl → import-jsonl → ingest) reproduces the same lake."""
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .sources.jsonl_binlog import export_jsonl

    n = export_jsonl(args.src, args.out, gzip_out=not args.no_gzip)
    print(json.dumps({"segments_exported": n, "out": args.out}))
    if started_ray:
        ray.shutdown()
    return 0


def cmd_pack(args) -> int:
    """Pack live lake text into fixed-token-budget training-sequence
    manifests (cdc/pack.py): one shard per partition, atomic + tip-epoch
    stamped — re-runs skip unchanged partitions, rewrite churned ones."""
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .cdc import Lake
    from .cdc.pack import pack_lake

    lake = Lake(args.lake, args.partitions)
    rng = None
    if args.pack_range:
        col, lo, hi = args.pack_range.rsplit(":", 2)
        rng = (col, int(lo), int(hi))
    if args.follow:
        from .cdc.pack import follow_pack

        written = follow_pack(lake, args.out, budget=args.budget,
                              text_col=args.text_col,
                              poll_interval=args.poll_interval,
                              max_idle_polls=args.idle_stop,
                              tokenizer=args.tokenizer,
                              range_filter=rng)
        print(json.dumps({
            "out": args.out, "budget": args.budget, "follow": True,
            "partitions_refreshed": len(written),
            "sequences": int(sum(s["sequences"] for s in written)),
            "tokens": int(sum(s["tokens"] for s in written)),
        }))
        if started_ray:
            ray.shutdown()
        return 0
    summary = pack_lake(lake, args.out, budget=args.budget,
                        text_col=args.text_col, as_of=args.as_of,
                        tokenizer=args.tokenizer, range_filter=rng)
    written = [s for s in summary if not s["skipped"]]
    print(json.dumps({
        "out": args.out, "budget": args.budget,
        "partitions_written": len(written),
        "partitions_skipped": len(summary) - len(written),
        "sequences": int(sum(s["sequences"] for s in written)),
        "tokens": int(sum(s["tokens"] for s in written)),
    }))
    if started_ray:
        ray.shutdown()
    return 0


def cmd_temporal_join(args) -> int:
    """Event-time temporal join (cdc/temporal.py): SRC's change feed
    enriched with DIM's as-of state. Streams to parquet with --out; else
    prints the row count and a 5-row sample."""
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .cdc import Lake
    from .cdc.temporal import follow_temporal_join, temporal_join

    cols = [c for c in args.cols.split(",") if c]
    if args.follow:
        # tail mode: one parquet per completed src window; the dim epoch
        # each window joined against is recorded in the file name, so any
        # emitted window replays byte-identically via --since/--until/
        # --dim-until. Restart resumes from the highest hi already written.
        import os as _os
        import re as _re

        import pyarrow.parquet as _pq

        if not args.out:
            print(json.dumps({"error": "--follow requires --out"}))
            return 2
        _os.makedirs(args.out, exist_ok=True)
        watermark = args.since
        if args.consumer is None:
            # no consumer group: resume from the output file names
            pat = _re.compile(r"tj-(-?\d+)-(\d+)-d(-?\d+)\.parquet$")
            for name in _os.listdir(args.out):
                m = pat.match(name)
                if m:
                    watermark = max(watermark, int(m.group(2)))
        windows = 0
        for lo, hi, dim_until, table in follow_temporal_join(
                Lake(args.src), Lake(args.dim), cols=cols, since=watermark,
                poll_interval=args.poll_interval,
                max_idle_polls=args.idle_stop, align=args.align,
                consumer=args.consumer):
            path = _os.path.join(args.out,
                                 f"tj-{lo + 1}-{hi}-d{dim_until}.parquet")
            # Consumer-mode redelivery (crash between write and offset
            # store) re-joins the window against the CURRENT dim head, so a
            # stale tj-LO-HI-dN.parquet from the crashed attempt may sit
            # next to the new dim epoch's file — drop any prior emission of
            # this src window first so directory readers never see the same
            # window twice with conflicting enrichment.
            stale_pat = _re.compile(
                rf"tj-{lo + 1}-{hi}-d-?\d+\.parquet$")
            for name in _os.listdir(args.out):
                full = _os.path.join(args.out, name)
                if stale_pat.match(name) and full != path:
                    _os.remove(full)
            tmp = path + ".tmp"
            _pq.write_table(table, tmp, compression="zstd")
            _os.rename(tmp, path)
            windows += 1
        print(json.dumps({"windows_written": windows, "out": args.out,
                          "resumed_from": args.since, "align": args.align}))
        if started_ray:
            ray.shutdown()
        return 0
    ds = temporal_join(Lake(args.src), Lake(args.dim), cols=cols,
                       since=args.since, until=args.until,
                       dim_until=args.dim_until)
    if args.out:
        ds.write_parquet(args.out)
        print(json.dumps({"out": args.out, "cols": cols}))
    else:
        n = 0
        sample = []
        for b in ds.iter_batches(batch_format="pyarrow"):
            n += b.num_rows
            if len(sample) < 5 and b.num_rows:
                sample.extend(b.slice(0, 5 - len(sample)).to_pylist())
        print(json.dumps({"rows": n, "sample": sample}, default=str))
    if started_ray:
        ray.shutdown()
    return 0


def cmd_diff(args) -> int:
    """Distributed live-state equivalence check between two lakes
    (cdc/lakediff.py): the verifier for rescale / export round trips /
    replica drift. Prints per-status counts; exit 1 on any difference."""
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .cdc import Lake
    from .cdc.lakediff import lake_diff

    diff = lake_diff(Lake(args.lake_a), Lake(args.lake_b),
                     columns=args.columns)
    if args.out:
        diff = diff.materialize()
        diff.write_parquet(args.out)
    counts = {"only_a": 0, "only_b": 0, "differ": 0}
    for row in diff.groupby("status").count().take_all():
        counts[row["status"]] = int(row["count()"])
    total = sum(counts.values())
    print(json.dumps({"equivalent": total == 0, **counts}))
    if started_ray:
        ray.shutdown()
    return 0 if total == 0 else 1


def cmd_replicate(args) -> int:
    """Apply the source lake's committed change log into a replica lake
    (cdc/replicate.py): exactly-once, epoch-aligned, resumable; re-run
    after the primary advances to catch up (a cron loop is follow mode)."""
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .cdc import Lake
    from .cdc.replicate import follow_replicate, replicate

    if args.follow:
        for win in follow_replicate(Lake(args.src), args.dst,
                                    poll_interval=args.poll,
                                    max_idle_polls=args.idle_stop):
            print(json.dumps(win), flush=True)
    else:
        out = replicate(Lake(args.src), args.dst, until=args.until)
        print(json.dumps(out))
    if started_ray:
        ray.shutdown()
    return 0


def cmd_derive(args) -> int:
    """Maintain a derived lake: a filtered / transformed projection of the
    source's change log (cdc/derive.py). An update that makes a row leave
    the predicate DELETES it downstream; exactly-once, resumable; re-run
    (or --follow) to catch up as the primary advances."""
    import ray

    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .cdc import FilteredTransform, Lake
    from .cdc.derive import derive, follow_derive
    from .functions import text_stats

    eq = None
    if args.eq:
        eq = {}
        for term in args.eq:
            col, _, vals = term.partition("=")
            if not vals:
                print(f"bad --eq term {term!r} (want COL=V[,V...])",
                      file=sys.stderr)
                return 2
            eq[col] = vals.split(",")
    named = {"token-stats": text_stats.token_stats,
             "quality-score": text_stats.quality_score,
             "embed": text_stats.embed_text}
    transform = FilteredTransform(
        eq=eq, transform=named[args.transform] if args.transform else None)
    tid = json.dumps({"eq": eq, "transform": args.transform}, sort_keys=True)
    if args.follow:
        for win in follow_derive(Lake(args.src), args.dst, transform,
                                 transform_id=tid, poll_interval=args.poll,
                                 max_idle_polls=args.idle_stop):
            print(json.dumps(win), flush=True)
    else:
        out = derive(Lake(args.src), args.dst, transform,
                     transform_id=tid, until=args.until)
        print(json.dumps(out))
    if started_ray:
        ray.shutdown()
    return 0


def cmd_view(args) -> int:
    from .cdc import Lake, MaterializedView

    lake = Lake(args.lake, args.partitions)
    view = MaterializedView(lake, args.name)
    folds = view.refresh()
    rows = view.read().to_pylist()
    print(json.dumps({"view": args.name, "folds_applied": folds,
                      "groups": rows}))
    return 0


def cmd_text_index(args) -> int:
    from .cdc import Lake, TextIndex, text_index_root

    lake = Lake(args.lake, args.partitions)
    root = text_index_root(args.lake)
    n_idx = args.idx_partitions
    if n_idx is None and not os.path.exists(
            os.path.join(root, "_commits", "lake.json")):
        n_idx = 32  # fresh index with no persisted metadata
    idx = TextIndex(root, num_partitions=n_idx,
                    positional=(True if args.positional else None))
    lineage = idx.refresh(lake, up_to=args.up_to)
    committed = sum(1 for r in lineage if not r["skipped"])
    print(json.dumps({"lake": args.lake, "watermark": idx.watermark(),
                      "commits": committed,
                      "skipped": len(lineage) - committed}))
    return 0


def cmd_substr_index(args) -> int:
    from .cdc import Lake, SubstringIndex, substr_index_root

    lake = Lake(args.lake, args.partitions)
    root = substr_index_root(args.lake)
    n_idx = args.idx_partitions
    if n_idx is None and not os.path.exists(
            os.path.join(root, "_commits", "lake.json")):
        n_idx = 32  # fresh index with no persisted metadata
    idx = SubstringIndex(root, num_partitions=n_idx)
    lineage = idx.refresh(lake, up_to=args.up_to)
    committed = sum(1 for r in lineage if not r["skipped"])
    print(json.dumps({"lake": args.lake, "watermark": idx.watermark(),
                      "commits": committed,
                      "skipped": len(lineage) - committed}))
    return 0


def cmd_contains(args) -> int:
    """Verified substring lookup over LIVE text via the trigram keyspace
    (cdc/trigramindex.py): O(|query grams|) index-partition reads, AND
    intersection, hash-routed lake verify. In-process serving read."""
    from .cdc import Lake, SubstringIndex, substr_index_root

    lake = Lake(args.lake, args.partitions)
    idx = SubstringIndex(substr_index_root(args.lake))
    if args.rows:
        t = idx.contains_local(lake, args.needle, as_of=args.as_of,
                               rows=True)
        rows = [] if t is None else [
            {"url": r["url"], "text": (r.get("text") or "")[:160]}
            for r in t.to_pylist()]
        print(json.dumps({"needle": args.needle, "matches": rows}))
    else:
        keys = idx.contains_local(lake, args.needle, as_of=args.as_of)
        print(json.dumps({"needle": args.needle, "urls": keys}))
    return 0


def cmd_col_index(args) -> int:
    from .cdc import ColumnIndex, Lake, col_index_root

    lake = Lake(args.lake, args.partitions)
    root = col_index_root(args.lake, args.column)
    n_idx = args.idx_partitions
    if n_idx is None and not os.path.exists(
            os.path.join(root, "_commits", "lake.json")):
        n_idx = 32  # fresh index with no persisted metadata
    idx = ColumnIndex(root, num_partitions=n_idx, col=args.column)
    lineage = idx.refresh(lake, up_to=args.up_to)
    committed = sum(1 for r in lineage if not r["skipped"])
    print(json.dumps({"lake": args.lake, "column": args.column,
                      "watermark": idx.watermark(),
                      "commits": committed,
                      "skipped": len(lineage) - committed}))
    return 0


def cmd_range_index(args) -> int:
    from .cdc import Lake, RangeIndex, range_index_root

    lake = Lake(args.lake, args.partitions)
    root = range_index_root(args.lake, args.column)
    n_idx = args.idx_partitions
    if n_idx is None and not os.path.exists(
            os.path.join(root, "_commits", "lake.json")):
        n_idx = 32  # fresh index with no persisted metadata
    idx = RangeIndex(root, num_partitions=n_idx, col=args.column,
                     width=args.width)
    lineage = idx.refresh(lake, up_to=args.up_to)
    committed = sum(1 for r in lineage if not r["skipped"])
    print(json.dumps({"lake": args.lake, "column": args.column,
                      "width": idx.width,
                      "watermark": idx.watermark(),
                      "commits": committed,
                      "skipped": len(lineage) - committed}))
    return 0


def cmd_range_scan(args) -> int:
    """Range-predicate scan through the bucketed range index: O(range /
    bucket width) index partition reads for the matching (key, val) pairs,
    then (with ``--rows``) hash-routed lake point lookups for the payload —
    never a full-lake fold."""
    from .cdc import Lake, RangeIndex, range_index_root

    idx = RangeIndex(range_index_root(args.lake, args.column))
    hits = idx.scan_range_local(args.lo, args.hi, as_of=args.as_of)
    keys = []
    for r in hits.to_pylist()[:args.show]:
        print(json.dumps({"key": r["key"], "val": r["val"]}))
    keys = sorted(set(hits["key"].to_pylist()))
    if args.rows:
        lake = Lake(args.lake)
        t = lake.lookup(keys, as_of=args.as_of)
        print(json.dumps({"rows": 0 if t is None else t.num_rows}))
        if t is not None and args.out:
            import pyarrow.parquet as _pq

            _pq.write_table(t, args.out)
    return 0


def cmd_drop_column(args) -> int:
    """Subtractive schema evolution (Lake.drop_column): physically remove
    a payload column from every data file, all epochs — additive
    unification would otherwise resurrect it as nulls forever. No Ray
    session needed."""
    from .cdc import Lake

    try:
        audit = Lake(args.lake, args.partitions).drop_column(args.column)
    except ValueError as exc:
        print(json.dumps({"error": str(exc)}))
        return 2
    print(json.dumps(audit))
    return 0


def cmd_rename_column(args) -> int:
    """Metadata-level column rename (Lake.rename_column): no file
    rewrite — a persisted historical→current name map consulted at every
    read, with lagging-producer events converged at apply time. No Ray
    session needed."""
    from .cdc import Lake

    try:
        rec = Lake(args.lake, args.partitions).rename_column(args.old,
                                                             args.new)
    except ValueError as exc:
        print(json.dumps({"error": str(exc)}))
        return 2
    print(json.dumps({"op": "rename_column", **rec}))
    return 0


def cmd_tag(args) -> int:
    """Named savepoint (Lake.set_tag): a human name for an epoch, pinned
    from vacuum like a branch fork point. No Ray session needed."""
    from .cdc import Lake
    from .cdc.changefeed import feed_head

    lake = Lake(args.lake)
    if args.delete:
        lake.delete_tag(args.name)
        print(json.dumps({"deleted": args.name}))
        return 0
    epoch = feed_head(lake) if args.at is None \
        else lake.resolve_epoch_ref(args.at)
    lake.set_tag(args.name, epoch)
    print(json.dumps({"tag": args.name, "epoch": epoch}))
    return 0


def cmd_tags(args) -> int:
    from .cdc import Lake

    print(json.dumps({"tags": Lake(args.lake).list_tags()}))
    return 0


def cmd_lookup_where(args) -> int:
    """Multi-predicate serving lookup (cdc/planner.py): AND-intersect the
    column/range indexes named by ``--eq COL=V[,V...]`` / ``--range
    COL:LO:HI`` terms, then hash-route only the surviving keys to the lake
    — never a full fold. Missing indexes fail loudly."""
    from .cdc import Lake
    from .cdc.planner import index_lookup

    eq = {}
    for spec in (args.eq or ()):
        col, _, vals = spec.partition("=")
        if not vals:
            print(json.dumps({"error": f"bad --eq {spec!r}: COL=V[,V...]"}))
            return 2
        eq.setdefault(col, []).extend(vals.split(","))
    ranges = {}
    for spec in (args.range or ()):
        parts = spec.split(":")
        if len(parts) != 3:
            print(json.dumps({"error": f"bad --range {spec!r}: COL:LO:HI"}))
            return 2
        ranges[parts[0]] = (int(parts[1]), int(parts[2]))
    lake = Lake(args.lake)
    keys, table = index_lookup(lake, eq=eq or None, ranges=ranges or None,
                               as_of=args.as_of, rows=args.rows)
    print(json.dumps({"n_urls": len(keys), "urls": keys[:args.show],
                      "rows": None if table is None and not args.rows
                      else (0 if table is None else table.num_rows)}))
    if table is not None and args.out:
        import pyarrow.parquet as _pq

        _pq.write_table(table, args.out)
    return 0


def cmd_scan(args) -> int:
    """Equality-predicate scan through the secondary index: O(|values|)
    index partition reads for the matching keys, then (with ``--rows``)
    hash-routed lake point lookups for the payload — never a full-lake
    scan."""
    from .cdc import ColumnIndex, Lake, col_index_root

    idx = ColumnIndex(col_index_root(args.lake, args.column))
    hits = idx.scan_local(args.value, as_of=args.as_of)
    by_val = {}
    for r in hits.to_pylist():
        by_val.setdefault(r["val"], []).append(r["key"])
    for v in args.value:
        keys = sorted(by_val.get(v, []))
        rec = {"value": v, "n_urls": len(keys), "urls": keys[:args.show]}
        print(json.dumps(rec))
    if args.rows:
        lake = Lake(args.lake)
        all_keys = sorted({k for ks in by_val.values() for k in ks})
        t = lake.lookup(all_keys, as_of=args.as_of)
        print(json.dumps({"rows": 0 if t is None else t.num_rows}))
        if t is not None and args.out:
            import pyarrow.parquet as _pq

            _pq.write_table(t, args.out)
    return 0


def cmd_search(args) -> int:
    from .cdc import TextIndex, text_index_root

    idx = TextIndex(text_index_root(args.lake))
    if args.phrase:
        hits = idx.phrase_search(args.token, as_of=args.as_of).take_all()
        keys = sorted(r["key"] for r in hits)
        print(json.dumps({"phrase": " ".join(args.token),
                          "n_urls": len(keys), "urls": keys[:args.show]}))
        return 0
    if args.ranked:
        top = idx.ranked_search(args.token, k=args.topk,
                                as_of=args.as_of).take_all()
        for r in top:
            print(json.dumps({"url": r["key"], "score": r["score"]}))
        return 0
    rows = idx.search(args.token, as_of=args.as_of).take_all()
    by_tok = {}
    for r in rows:
        by_tok.setdefault(r["token"], []).append(r["key"])
    for tok in args.token:
        keys = sorted(by_tok.get(tok, []))
        print(json.dumps({"token": tok, "n_urls": len(keys),
                          "urls": keys[:args.show]}))
    return 0


def cmd_vec_index(args) -> int:
    from .cdc import Lake, VectorIndex, vec_index_root

    lake = Lake(args.lake, args.partitions)
    root = vec_index_root(args.lake)
    n_idx = args.idx_partitions
    if n_idx is None and not os.path.exists(
            os.path.join(root, "_commits", "lake.json")):
        n_idx = 32  # fresh index with no persisted metadata
    idx = VectorIndex(root, num_partitions=n_idx, key_col=args.key_col,
                      vec_col=args.vec_col, nbits=args.nbits,
                      seed=args.seed, dim=args.dim)
    lineage = idx.refresh(lake, up_to=args.up_to)
    committed = sum(1 for r in lineage if not r["skipped"])
    print(json.dumps({"lake": args.lake, "watermark": idx.watermark(),
                      "commits": committed,
                      "skipped": len(lineage) - committed}))
    return 0


def cmd_vec_search(args) -> int:
    """ANN lookup: by live url (fetch its vector from the lake) or by free
    text (``--text`` — embed the query with the same hashed-token
    featurizer the lake's vec column was derived with, giving semantic
    search over the lake with no external model). Multi-probes the
    bucketed index; a url query ranks itself first at 1.0 when live."""
    import numpy as np

    from .cdc import Lake, VectorIndex, vec_index_root
    from .cdc.vecindex import unpack_matrix

    lake = Lake(args.lake, args.partitions)
    idx = VectorIndex(vec_index_root(args.lake))
    if args.text:
        import pyarrow as pa

        from .functions.text_stats import embed_text

        one = pa.table({"text": pa.array([args.url], pa.string())})
        blob = embed_text(one, dim=idx.dim)["vec"][0].as_py()
        label = f"text:{args.url}"
    else:
        t = lake.lookup([args.url])
        blob = None
        if t is not None and t.num_rows:
            row = t.to_pylist()[0]
            if not row.get("deleted"):
                blob = row.get(idx.vec_col)
        label = args.url
    if blob is None:
        print(json.dumps({"key": label, "hits": [],
                          "err": "url not live or has no vector"}))
        return 1
    q = unpack_matrix([blob], idx.dim)[0]
    hits = idx.search(np.asarray(q), k=args.topk,
                      probe_hamming=args.probe, as_of=args.as_of)
    print(json.dumps({"key": label, "hits": [
        {"key": k, "cosine": c}
        for k, c in zip(hits["key"].to_pylist(),
                        hits["cosine"].to_pylist())]}))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="opendataloader_pdf_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    conv = sub.add_parser("convert", help="extract structure/text from HTML files")
    conv.add_argument("paths", nargs="+")
    conv.add_argument("--format", nargs="+", default=["text"],
                      choices=["text", "markdown", "json", "html"])
    conv.add_argument("--output-dir", default=None)
    conv.add_argument("--sanitize", action="store_true")
    conv.add_argument("--include-header-footer", action="store_true")
    # option-breadth parity with the reference options.json (round-2)
    conv.add_argument("--pages", default=None,
                      help='page selection, e.g. "1,3,5-7" (default: all)')
    conv.add_argument("--password", default=None,
                      help="password for ODLSEAL1-sealed input payloads "
                           "(reference --password analog); wrong/missing "
                           "password fails that file, not the run")
    conv.add_argument("--content-safety-off", default=None, metavar="WHICH",
                      help="disable safety filters: all | hidden-text | "
                           "out-of-page | tiny-text (comma-separated)")
    conv.add_argument("--replace-invalid-chars", default=None, metavar="STR",
                      help="replacement for invalid/control characters")
    conv.add_argument("--table-method", default="default",
                      choices=["default", "cluster", "off"])
    conv.add_argument("--reading-order", default="xycut",
                      choices=["xycut", "off"])
    conv.add_argument("--use-semantic-tags", action="store_true",
                      help="trust author markup; skip heuristic refinements "
                           "(--use-struct-tree analog)")
    conv.add_argument("--collapse-line-breaks", action="store_true",
                      help="treat source newlines as plain whitespace")
    conv.add_argument("--detect-strikethrough", action="store_true",
                      help="wrap struck text with ~~ in Markdown")
    conv.add_argument("--markdown-with-html", action="store_true",
                      help="emit HTML tables in Markdown when spans require it")
    conv.add_argument("--markdown-with-images", action="store_true",
                      help="image links keep their source (data: URI or URL); "
                           "with --image-output external, data: URIs are "
                           "rewritten to the written asset files")
    conv.add_argument("--text-page-separator", default=None, metavar="SEP",
                      help="separator between pages in text output "
                           "(%%page-number%% expands)")
    conv.add_argument("--markdown-page-separator", default=None, metavar="SEP")
    conv.add_argument("--html-page-separator", default=None, metavar="SEP")
    conv.add_argument("--image-output", default="off",
                      choices=["off", "embedded", "external"],
                      help="external writes embedded images as files")
    conv.add_argument("--image-dir", default=None)
    conv.add_argument("--quiet", action="store_true")
    conv.set_defaults(fn=cmd_convert)

    ing = sub.add_parser("ingest", help="replay a change-event log into a lake")
    ing.add_argument("events")
    ing.add_argument("lake")
    ing.add_argument("--epoch-size", type=int, default=10_000)
    ing.add_argument("--partitions", type=int, default=32)
    ing.add_argument("--mode", default="backlog",
                     choices=["backlog", "epoch", "follow"],
                     help="backlog: all pending epochs in one pipeline; "
                          "epoch: one pipeline per epoch; follow: TAIL the "
                          "segment dir, ingesting epochs as they complete "
                          "(stops when <events>/.end appears)")
    ing.add_argument("--poll-interval", type=float, default=0.5,
                     dest="poll_interval")
    ing.add_argument("--extract-mode", default="actors",
                     choices=["actors", "tasks", "pool"],
                     dest="extract_mode",
                     help="extractor scheduling: per-pipeline actor pool "
                          "(default), stateless tasks (micro-epoch tails, "
                          "no pool spin-up), or the PERSISTENT named-actor "
                          "pool shared across polls (model-backed tails; "
                          "stages/extract_pool.py)")
    ing.add_argument("--pack-blocks", action="store_true",
                     dest="pack_blocks",
                     help="narrow transit rows: carry the blocks struct "
                          "through combine+shuffles as per-row zstd'd IPC "
                          "cells, unpacked before the lake write (lake "
                          "bytes identical; ~+6%% ev/s measured)")
    ing.add_argument("--commit-mode", default="snapshot",
                     choices=["snapshot", "delta"],
                     help="epoch-mode commits: full CoW snapshots or "
                          "winner-set deltas (merge-on-read; run 'compact' "
                          "to re-materialize snapshots)")
    ing.add_argument("--dup-index", action="store_true", dest="dup_index",
                     help="maintain the first-writer-wins content-"
                          "fingerprint index at <lake>/fpindex (dedup-at-"
                          "ingest; query it with the dups command)")
    ing.add_argument("--dup-index-commits", default="snapshot",
                     choices=("snapshot", "delta"), dest="dup_index_commits",
                     help="index commit mode: CoW snapshot per epoch, or "
                          "winners-only deltas folded merge-on-read "
                          "(compact folds them)")
    ing.add_argument("--near-index", action="store_true", dest="near_index",
                     help="maintain the SimHash band index at <lake>/nearidx"
                          " (near-dup-at-ingest; query it with dups --near)")
    ing.add_argument("--near-index-commits", default="snapshot",
                     choices=("snapshot", "delta"), dest="near_index_commits",
                     help="near-index commit mode (see --dup-index-commits)")
    ing.add_argument("--text-index", action="store_true", dest="text_index",
                     help="keep the inverted full-text index at "
                          "<lake>/textidx fresh: refreshed after every "
                          "committed epoch in follow mode, once after a "
                          "batch replay (query with the search command)")
    ing.add_argument("--embed", action="store_true",
                     help="derive a hashed-token embedding column (vec) at "
                          "extract time — the stand-in embedding model; "
                          "pair with --vec-index for streaming ANN")
    ing.add_argument("--vec-index", action="store_true", dest="vec_index",
                     help="keep the ANN vector index at <lake>/vecidx "
                          "fresh over the vec column (same follower "
                          "cadence as --text-index; query with vec-search)")
    ing.add_argument("--col-index", nargs="+", default=None,
                     dest="col_index", metavar="COL",
                     help="keep a secondary value→urls index at "
                          "<lake>/colidx_<COL> fresh for each named payload "
                          "column (same follower cadence as --text-index; "
                          "query with scan)")
    ing.add_argument("--range-index", nargs="+", default=None,
                     dest="range_index", metavar="COL[:WIDTH]",
                     help="keep a bucketed numeric range index at "
                          "<lake>/rangeidx_<COL> fresh for each named "
                          "int/timestamp payload column (same follower "
                          "cadence as --text-index; query with range-scan)")
    ing.add_argument("--view", nargs="+", default=None, metavar="NAME",
                     help="keep the named incrementally-maintained "
                          "aggregate view(s) (<lake>/_views/NAME, the "
                          "`view` command's per-lang count+sum) fresh at "
                          "the same follower cadence as --text-index")
    ing.add_argument("--substr-index", action="store_true",
                     dest="substr_index",
                     help="keep <lake>/trgmidx (trigram substring index) "
                          "fresh while tailing")
    ing.add_argument("--patch-ops", action="store_true", dest="patch_ops",
                     help="accept op='P' partial-update events (null column "
                          "= unchanged; column-wise LWW merge; requires "
                          "snapshot commit mode)")
    ing.add_argument("--quarantine", action="store_true",
                     help="dead-letter mode: extraction failures divert the "
                          "record to <lake>/quarantine instead of killing "
                          "the epoch (inspect with the quarantine command)")
    ing.add_argument("--auto-compact-chain", type=int, default=None,
                     dest="auto_compact_chain", metavar="K",
                     help="epoch/follow modes: re-materialize any partition "
                          "whose delta chain exceeds K after each epoch "
                          "(bounds merge-on-read amplification on long "
                          "tails)")
    ing.set_defaults(fn=cmd_ingest)

    sd = sub.add_parser("seed",
                        help="bootstrap a lake (epoch 0) from a crawl "
                             "snapshot: WARC segment file(s)/dir in, "
                             "binlog tail resumes at epoch 1")
    sd.add_argument("warc")
    sd.add_argument("lake")
    sd.add_argument("--partitions", type=int, default=32)
    sd.add_argument("--quarantine", action="store_true")
    sd.add_argument("--dup-index", action="store_true", dest="dup_index")
    sd.add_argument("--near-index", action="store_true", dest="near_index")
    sd.add_argument("--text-index", action="store_true", dest="text_index",
                    help="bootstrap the full-text index over the seeded "
                         "epoch 0 (the crawl-loop tail keeps it fresh with "
                         "ingest --text-index)")
    sd.set_defaults(fn=cmd_seed)

    st = sub.add_parser("stats",
                        help="partition skew / size diagnostics from "
                             "metadata only (when to rescale / compact / "
                             "vacuum)")
    st.add_argument("lake")
    st.add_argument("--partitions", type=int, default=None,
                    help="override only for pre-metadata lakes")
    st.set_defaults(fn=cmd_stats)

    tg = sub.add_parser("tag",
                        help="named savepoint: tag an epoch (pins its "
                             "reconstruction files from vacuum; restore/"
                             "branch/get accept tag names as epoch refs)")
    tg.add_argument("lake")
    tg.add_argument("name")
    tg.add_argument("--at", default=None,
                    help="epoch to tag (default: current feed head)")
    tg.add_argument("--delete", action="store_true",
                    help="delete the tag instead")
    tg.set_defaults(fn=cmd_tag)

    tgs = sub.add_parser("tags", help="list a lake's tags")
    tgs.add_argument("lake")
    tgs.set_defaults(fn=cmd_tags)

    dc = sub.add_parser("drop-column",
                        help="physically remove a payload column from "
                             "every data file, all epochs (subtractive "
                             "schema evolution / column-level "
                             "right-to-be-forgotten; atomic per file, "
                             "idempotent)")
    dc.add_argument("lake")
    dc.add_argument("column")
    dc.add_argument("--partitions", type=int, default=None,
                    help="override only for pre-metadata lakes")
    dc.set_defaults(fn=cmd_drop_column)

    rc = sub.add_parser("rename-column",
                        help="metadata-level column rename (Iceberg-style "
                             "schema evolution by name map; no file "
                             "rewrite; reads at any as_of present the "
                             "current name; old-name events from lagging "
                             "producers converge at apply time)")
    rc.add_argument("lake")
    rc.add_argument("old")
    rc.add_argument("new")
    rc.add_argument("--partitions", type=int, default=None,
                    help="override only for pre-metadata lakes")
    rc.set_defaults(fn=cmd_rename_column)

    bh = sub.add_parser("branch",
                        help="zero-copy branch of a lake at an epoch "
                             "(metadata-only; parent vacuum pins the "
                             "fork's files)")
    bh.add_argument("src", help="parent lake root")
    bh.add_argument("dest", help="branch lake root (must not exist)")
    bh.add_argument("--at", default=None,
                    help="fork epoch number or tag name "
                         "(default: parent tip)")
    bh.add_argument("--name", default=None,
                    help="branch name registered in the parent "
                         "(default: random id)")
    bh.set_defaults(fn=cmd_branch)

    dt = sub.add_parser("detach",
                        help="promote a branch to a standalone lake "
                             "(compact at tip, copy commit metadata, "
                             "unregister from the parent)")
    dt.add_argument("lake", help="branch lake root")
    dt.set_defaults(fn=cmd_detach)

    rs = sub.add_parser("rescale",
                        help="re-partition the lake's state into a NEW lake "
                             "with k·P (split) or P/k (merge) partitions — "
                             "shuffle-free consistent-hash scaling")
    rs.add_argument("src")
    rs.add_argument("dest")
    rs.add_argument("new_partitions", type=int)
    rs.add_argument("--as-of", type=int, default=None, dest="as_of")
    rs.set_defaults(fn=cmd_rescale)

    qr = sub.add_parser("quarantine",
                        help="inspect the dead-letter queue: poison records "
                             "diverted by ingest --quarantine")
    qr.add_argument("lake")
    qr.add_argument("--epoch", type=int, default=None)
    qr.add_argument("--partitions", type=int, default=None,
                    help="override only for pre-metadata lakes")
    qr.add_argument("--retry", default=None, metavar="EVENTS",
                    help="re-drive the quarantined events from this binlog "
                         "dir through the current extractor; successes "
                         "fold back into the lake as one exactly-once "
                         "maintenance epoch and leave the DLQ")
    qr.set_defaults(fn=cmd_quarantine)

    cpt = sub.add_parser("compact",
                         help="fold delta commits into snapshot files and "
                              "vacuum superseded data files")
    cpt.add_argument("lake")
    cpt.add_argument("--partitions", type=int, default=None,
                     help="override; the lake's persisted metadata wins")
    cpt.add_argument("--keep-snapshots", type=int, default=1)
    cpt.set_defaults(fn=cmd_compact)

    fs = sub.add_parser("fsck",
                        help="audit commit-log / data-file consistency "
                             "(exit 1 on violations)")
    fs.add_argument("lake")
    fs.add_argument("--partitions", type=int, default=None,
                    help="override; the lake's persisted metadata wins")
    fs.add_argument("--deep", action="store_true")
    fs.set_defaults(fn=cmd_fsck)

    ex = sub.add_parser("export",
                        help="stream lake state to partitioned parquet "
                             "(distributed merge-on-read; no compact needed)")
    ex.add_argument("lake")
    ex.add_argument("out")
    ex.add_argument("--partitions", type=int, default=None,
                    help="override; the lake's persisted metadata wins")
    ex.add_argument("--as-of", type=int, default=None, dest="as_of")
    ex.add_argument("--tombstones", action="store_true")
    ex.add_argument("--stream", action="store_true",
                    help="one streaming write_parquet instead of the "
                         "default resumable per-partition files (a crashed "
                         "default export re-run skips finished partitions)")
    ex.add_argument("--partition-by", default=None, metavar="COL",
                    help="Hive-layout export: out/COL=value/part=NNNN."
                         "parquet per lake partition (resumable +"
                         " incremental via per-partition manifests; stale"
                         " value slices removed on rewrite)")
    ex.add_argument("--eq", nargs="+", default=None, metavar="COL=V[,V...]",
                    help="export only rows matching every term (corpus "
                         "slicing, string-canonical like the column "
                         "index); with a col-index on a term, partitions "
                         "holding no match are pruned up front; re-runs "
                         "with a different predicate rewrite (stamped)")
    ex.add_argument("--range", nargs="+", default=None,
                    metavar="COL:LO:HI",
                    help="export only rows with LO <= COL <= HI "
                         "(inclusive; int/timestamp columns) — lake "
                         "partitions provably out of range are pruned "
                         "from per-commit zone maps before any data file "
                         "is opened; ANDs with --eq; stamped like --eq")
    ex.add_argument("--wet", action="store_true",
                    help="write WET-style WARC conversion records (the "
                         "Common-Crawl extracted-text format) instead of "
                         "parquet — one segment per partition, resumable")
    ex.set_defaults(fn=cmd_export)

    cf = sub.add_parser("changes",
                        help="row-level change feed (insert/update/delete "
                             "per url per epoch) for epochs in (since, "
                             "until] — the lake as a binlog for consumers")
    cf.add_argument("lake")
    cf.add_argument("--since", type=int, default=-1,
                    help="feed epochs AFTER this one (default: from start)")
    cf.add_argument("--until", type=int, default=None)
    cf.add_argument("--out", default=None,
                    help="write the feed to parquet instead of printing "
                         "per-op counts")
    cf.add_argument("--follow", action="store_true",
                    help="TAIL the feed: poll the commit log, write one "
                         "parquet per completed epoch window to --out; a "
                         "restart resumes from the files already written")
    cf.add_argument("--poll-interval", type=float, default=0.5,
                    dest="poll_interval")
    cf.add_argument("--idle-stop", type=int, default=None, dest="idle_stop",
                    help="stop after N polls with no new epochs (default: "
                         "poll forever)")
    cf.add_argument("--before", nargs="+", default=None, metavar="COL",
                    help="attach the pre-image LIVE value of these payload "
                         "columns as before_<col> (Debezium-style before "
                         "image; null on inserts)")
    cf.add_argument("--min-ts", type=int, default=None, dest="min_ts",
                    help="event-time window lower bound (int64 µs, "
                         "inclusive): only changes with warc_ts >= this; "
                         "pruned via commit-record ts_range zone maps "
                         "before any data file is opened")
    cf.add_argument("--max-ts", type=int, default=None, dest="max_ts",
                    help="event-time window upper bound (inclusive)")
    cf.add_argument("--consumer", default=None,
                    help="follow mode: named consumer group — the offset "
                         "persists in the lake (_commits/consumers/) and is "
                         "authoritative over the output file names; a crash "
                         "mid-window redelivers that window (at-least-once)")
    cf.add_argument("--partitions", type=int, default=None,
                    help="override only for pre-metadata lakes")
    cf.set_defaults(fn=cmd_changes)

    gt = sub.add_parser("get", help="point-lookup urls in the lake "
                                    "(partition-pruned, no Ray session)")
    gt.add_argument("lake")
    gt.add_argument("urls", nargs="+")
    gt.add_argument("--partitions", type=int, default=None,
                    help="override only for pre-metadata lakes")
    gt.add_argument("--as-of", default=None, dest="as_of",
                    help="epoch number or tag name")
    gt.add_argument("--tombstones", action="store_true")
    gt.set_defaults(fn=cmd_get)

    pg = sub.add_parser("purge", help="physically remove urls from all "
                                      "epochs (right-to-be-forgotten)")
    pg.add_argument("lake")
    pg.add_argument("urls", nargs="+")
    pg.add_argument("--partitions", type=int, default=None,
                    help="override only for pre-metadata lakes")
    pg.set_defaults(fn=cmd_purge)

    dp = sub.add_parser("dups",
                        help="attribute live lake rows against the "
                             "fingerprint index (dup_of/is_dup)")
    dp.add_argument("lake")
    dp.add_argument("--partitions", type=int, default=None,
                    help="override only for pre-metadata lakes")
    dp.add_argument("--out", default=None,
                    help="write attributed rows to this parquet dir")
    dp.add_argument("--near", action="store_true",
                    help="attribute against the SimHash band index at "
                         "<lake>/nearidx (near_dup_of/is_near_dup, "
                         "Hamming <= 3) instead of the exact fp index")
    dp.set_defaults(fn=cmd_dups)

    sd = sub.add_parser("semdups",
                        help="semantic dup attribution over the live "
                             "lake's vec column (SemDeDup: k-means + "
                             "within-cluster cosine prune; needs --embed "
                             "ingest or an embed backfill)")
    sd.add_argument("lake")
    sd.add_argument("--partitions", type=int, default=None,
                    help="override only for pre-metadata lakes")
    sd.add_argument("--clusters", type=int, default=8)
    sd.add_argument("--iters", type=int, default=3)
    sd.add_argument("--threshold", type=float, default=0.95)
    sd.add_argument("--as-of", type=int, default=None)
    sd.add_argument("--out", default=None,
                    help="write the attributed rows to partitioned parquet")
    sd.set_defaults(fn=cmd_semdups)
    bf = sub.add_parser("backfill",
                        help="recompute/add derived columns across every "
                             "live lake row as one exactly-once epoch "
                             "(resumable; time travel preserved)")
    bf.add_argument("lake")
    bf.add_argument("--partitions", type=int, default=None,
                    help="override only for pre-metadata lakes")
    bf.add_argument("--transform", default="token-stats",
                    choices=("token-stats", "quality-score", "embed",
                             "dsir-score"))
    bf.add_argument("--dsir-target-lang", default="en",
                    dest="dsir_target_lang",
                    help="dsir-score: the lang value defining the TARGET "
                         "domain (rows to look like); histograms stream "
                         "the live lake once before the rewrite")
    bf.set_defaults(fn=cmd_backfill)

    rt = sub.add_parser("retention",
                        help="expire live rows older than a warc_ts cutoff "
                             "as one exactly-once tombstone epoch "
                             "(resumable; time travel preserved; reclaim "
                             "at next compact)")
    rt.add_argument("lake")
    rt.add_argument("cutoff_ts_us", type=int,
                    help="rows with ts_col < this (int64 microseconds) "
                         "are tombstoned")
    rt.add_argument("--ts-col", default="warc_ts")
    rt.add_argument("--partitions", type=int, default=None,
                    help="override only for pre-metadata lakes")
    rt.add_argument("--cooperative", action="store_true",
                    help="run UNDER a live follow tail via the maintenance "
                         "lease (cdc/lease.py) instead of fencing it; "
                         "requires the tail to grant within --lease-timeout")
    rt.add_argument("--lease-timeout", type=float, default=60.0)
    rt.set_defaults(fn=cmd_retention)

    rst = sub.add_parser("restore",
                         help="roll the lake's live state back to a past "
                              "epoch as one exactly-once maintenance epoch "
                              "(resumable; time travel across the rollback "
                              "preserved; re-restore to roll forward)")
    rst.add_argument("lake")
    rst.add_argument("target",
                     help="epoch number OR tag name whose live state to "
                          "restore")
    rst.add_argument("--partitions", type=int, default=None,
                     help="override only for pre-metadata lakes")
    rst.set_defaults(fn=cmd_restore)

    ij = sub.add_parser("import-jsonl",
                        help="normalize Debezium-style JSONL change-event "
                             "segments (optionally gzipped) into parquet "
                             "binlog segments ingest can tail (distributed, "
                             "resumable, atomic per segment)")
    ij.add_argument("src", help="directory of .jsonl/.jsonl.gz/.ndjson files")
    ij.add_argument("out", help="parquet segment output directory")
    ij.add_argument("--follow", action="store_true",
                    help="TAIL a growing src dir, importing new segments "
                         "as they land; stops on src/.end (after a final "
                         "drain) — compose with `ingest OUT --mode follow`")
    ij.add_argument("--poll-interval", type=float, default=0.5,
                    dest="poll_interval")
    ij.add_argument("--idle-stop", type=int, default=None, dest="idle_stop",
                    help="stop after N polls with no new segments")
    ij.set_defaults(fn=cmd_import_jsonl)

    ej = sub.add_parser("export-jsonl",
                        help="inverse of import-jsonl: parquet binlog "
                             "segments out as Debezium-style JSONL "
                             "(distributed, resumable, atomic, "
                             "byte-deterministic gzip)")
    ej.add_argument("src", help="parquet segment directory")
    ej.add_argument("out", help="JSONL output directory")
    ej.add_argument("--no-gzip", action="store_true", dest="no_gzip",
                    help="write plain .jsonl instead of .jsonl.gz")
    ej.set_defaults(fn=cmd_export_jsonl)

    df = sub.add_parser("diff",
                        help="distributed live-state equivalence check "
                             "between two lakes (rescale/export verifier); "
                             "exit 1 on any difference")
    df.add_argument("lake_a")
    df.add_argument("lake_b")
    df.add_argument("--columns", nargs="*", default=["text"],
                    help="value columns hashed into the comparison")
    df.add_argument("--out", default=None,
                    help="also write the difference rows as parquet")
    df.set_defaults(fn=cmd_diff)

    tj = sub.add_parser("temporal-join",
                        help="enrich SRC's change feed with DIM's state AS "
                             "OF each change's event time (Flink temporal-"
                             "table join; co-partitioned lakes, one shuffle-"
                             "free task per partition)")
    tj.add_argument("src")
    tj.add_argument("dim")
    tj.add_argument("--cols", required=True,
                    help="comma-separated dim payload columns to attach "
                         "(as dim_<col>)")
    tj.add_argument("--since", type=int, default=-1,
                    help="feed epochs > this (default: from the beginning)")
    tj.add_argument("--until", type=int, default=None,
                    help="feed epochs <= this")
    tj.add_argument("--dim-until", type=int, default=None,
                    help="cap the dim version timeline at this epoch "
                         "(time-travel the dimension)")
    tj.add_argument("--out", default=None,
                    help="write joined rows as parquet (default: print "
                         "count + a sample)")
    tj.add_argument("--follow", action="store_true",
                    help="TAIL the join: one parquet per completed src "
                         "epoch window, enriched with dim state as of the "
                         "dim epoch recorded in the file name (requires "
                         "--out; restart resumes from files already "
                         "written)")
    tj.add_argument("--align", action="store_true",
                    help="follow mode: event-time contract for epoch-"
                         "aligned lakes — window (lo,hi] waits for dim "
                         "epoch hi to complete and joins with dim_until=hi")
    tj.add_argument("--poll-interval", type=float, default=0.5)
    tj.add_argument("--idle-stop", type=int, default=None,
                    help="follow mode: stop after N idle polls")
    tj.add_argument("--consumer", default=None,
                    help="follow mode: durable consumer group — offset "
                         "lives in the SRC lake's _commits/consumers/ "
                         "(same namespace as changes consumers), advanced "
                         "only after a window is processed "
                         "(at-least-once)")
    tj.set_defaults(fn=cmd_temporal_join)

    rp = sub.add_parser("replicate",
                        help="apply the source lake's change log into a "
                             "replica lake (exactly-once, epoch-aligned, "
                             "resumable; re-run to catch up)")
    rp.add_argument("src")
    rp.add_argument("dst")
    rp.add_argument("--until", type=int, default=None,
                    help="replicate only epochs <= this")
    rp.add_argument("--follow", action="store_true",
                    help="tail the primary's epoch-done markers and keep "
                         "the replica at bounded lag")
    rp.add_argument("--poll", type=float, default=0.5,
                    help="follow-mode poll interval seconds")
    rp.add_argument("--idle-stop", type=int, default=None,
                    help="follow mode: stop after N idle polls")
    rp.set_defaults(fn=cmd_replicate)

    dv = sub.add_parser("derive",
                        help="maintain a downstream lake as a FILTERED/"
                             "TRANSFORMED projection of the source's change "
                             "log (medallion bronze->silver): updates that "
                             "leave the predicate become downstream deletes; "
                             "exactly-once, resumable, re-run to catch up")
    dv.add_argument("src")
    dv.add_argument("dst")
    dv.add_argument("--eq", nargs="+", default=None, metavar="COL=V[,V...]",
                    help="keep only rows matching every equality term "
                         "(string-canonical)")
    dv.add_argument("--transform", default=None,
                    choices=("token-stats", "quality-score", "embed"),
                    help="optional derived-column transform applied to kept "
                         "rows")
    dv.add_argument("--until", type=int, default=None,
                    help="derive only epochs <= this")
    dv.add_argument("--follow", action="store_true",
                    help="tail the primary's epoch-done markers and keep "
                         "the derived lake at bounded lag")
    dv.add_argument("--poll", type=float, default=0.5)
    dv.add_argument("--idle-stop", type=int, default=None)
    dv.set_defaults(fn=cmd_derive)

    pk = sub.add_parser("pack",
                        help="pack live lake text into fixed-token-budget "
                             "training-sequence manifest shards (one per "
                             "partition; resumable + incremental like "
                             "export)")
    pk.add_argument("lake")
    pk.add_argument("out")
    pk.add_argument("--budget", type=int, default=2048,
                    help="tokens per sequence")
    pk.add_argument("--text-col", default="text")
    pk.add_argument("--range", default=None, metavar="COL:LO:HI",
                    dest="pack_range",
                    help="pack only live rows whose int column sits in "
                         "the inclusive band (corpus slicing at the "
                         "shard boundary, e.g. dsir_logw_scaled bands; "
                         "the predicate is stamped per shard, so "
                         "re-running under a different band rewrites)")
    pk.add_argument("--tokenizer", default="whitespace",
                    choices=["whitespace", "bpe"],
                    help="sequence-budget token counter: whitespace "
                         "(default) or the deterministic vendored "
                         "byte-level BPE (functions/bpe.py); the choice "
                         "is stamped into each shard, so refreshing "
                         "under a different tokenizer rewrites")
    pk.add_argument("--as-of", type=int, default=None)
    pk.add_argument("--partitions", type=int, default=None,
                    help="override only for pre-metadata lakes")
    pk.add_argument("--follow", action="store_true",
                    help="TAIL the lake's epoch watermark: keep the shards "
                         "fresh as a tail ingests (incremental per the "
                         "tip-epoch stamps; stops after --idle-stop idle "
                         "polls)")
    pk.add_argument("--poll-interval", type=float, default=0.5,
                    dest="poll_interval")
    pk.add_argument("--idle-stop", type=int, default=None, dest="idle_stop")
    pk.set_defaults(fn=cmd_pack)

    vw = sub.add_parser("view",
                        help="refresh + print an incrementally-maintained "
                             "per-lang aggregate view over a lake")
    vw.add_argument("lake")
    vw.add_argument("--partitions", type=int, default=None,
                    help="override; the lake's persisted metadata wins")
    vw.add_argument("--name", default="lang_stats")
    vw.set_defaults(fn=cmd_view)

    gi = sub.add_parser("substr-index",
                        help="refresh the lake's trigram substring index "
                             "(<lake>/trgmidx): retract/apply gram-set "
                             "diffs per changed url — 'grep the lake' "
                             "serving reads via the contains command")
    gi.add_argument("lake")
    gi.add_argument("--partitions", type=int, default=None)
    gi.add_argument("--idx-partitions", type=int, default=None,
                    help="index partitions (first build only; default 32)")
    gi.add_argument("--up-to", type=int, default=None)
    gi.set_defaults(fn=cmd_substr_index)

    ct = sub.add_parser("contains",
                        help="verified substring lookup over LIVE text via "
                             "the trigram index (>= 3 chars, case-"
                             "insensitive)")
    ct.add_argument("lake")
    ct.add_argument("needle")
    ct.add_argument("--as-of", type=int, default=None)
    ct.add_argument("--rows", action="store_true",
                    help="print matching rows (url + text preview) instead "
                         "of urls only")
    ct.add_argument("--partitions", type=int, default=None)
    ct.set_defaults(fn=cmd_contains)

    ti = sub.add_parser("text-index",
                        help="refresh the lake's inverted full-text index "
                             "(<lake>/textidx): retract/apply token-set "
                             "diffs per changed url, exactly-once per "
                             "(token-partition, epoch)")
    ti.add_argument("lake")
    ti.add_argument("--partitions", type=int, default=None,
                    help="lake partitions override; persisted metadata wins")
    ti.add_argument("--positional", action="store_true",
                    help="store token positions in postings (4B/occurrence"
                         " — enables `search --phrase`); index-persistent,"
                         " a mismatched reopen fails loudly")
    ti.add_argument("--idx-partitions", type=int, default=None,
                    help="index partitions at creation (default 32; "
                         "existing index metadata wins)")
    ti.add_argument("--up-to", type=int, default=None,
                    help="fold lake epochs only up to this one")
    ti.set_defaults(fn=cmd_text_index)

    ci = sub.add_parser("col-index",
                        help="refresh a secondary value→urls index on one "
                             "payload column (<lake>/colidx_<COL>): "
                             "retract/apply value diffs per changed url, "
                             "exactly-once per (value-partition, epoch)")
    ci.add_argument("lake")
    ci.add_argument("column", help="payload column to index (one index "
                                   "per column; index-persistent)")
    ci.add_argument("--partitions", type=int, default=None,
                    help="lake partitions override; persisted metadata wins")
    ci.add_argument("--idx-partitions", type=int, default=None,
                    help="index partitions at creation (default 32; "
                         "existing index metadata wins)")
    ci.add_argument("--up-to", type=int, default=None,
                    help="fold lake epochs only up to this one")
    ci.set_defaults(fn=cmd_col_index)

    sc = sub.add_parser("scan",
                        help="equality-predicate point scan via the "
                             "column index: urls whose LIVE column equals "
                             "each value (O(|values|) index-partition "
                             "reads + hash-routed payload lookups)")
    sc.add_argument("lake")
    sc.add_argument("column")
    sc.add_argument("value", nargs="+")
    sc.add_argument("--as-of", type=int, default=None, dest="as_of")
    sc.add_argument("--show", type=int, default=10,
                    help="max urls printed per value")
    sc.add_argument("--rows", action="store_true",
                    help="also point-look-up the payload rows")
    sc.add_argument("--out", default=None,
                    help="with --rows: write the payload rows here")
    sc.set_defaults(fn=cmd_scan)

    ri = sub.add_parser("range-index",
                        help="refresh a bucketed numeric range index on one "
                             "payload column (<lake>/rangeidx_<COL>): "
                             "(bucket, val, url) postings, bucket = val // "
                             "width; range predicates then read only the "
                             "overlapping buckets' partitions")
    ri.add_argument("lake")
    ri.add_argument("column", help="int/timestamp payload column (one "
                                   "index per column; index-persistent)")
    ri.add_argument("--width", type=int, default=None,
                    help="bucket width at creation (default 1e6; "
                         "existing index config wins; mismatch fails)")
    ri.add_argument("--partitions", type=int, default=None,
                    help="lake partitions override; persisted metadata wins")
    ri.add_argument("--idx-partitions", type=int, default=None,
                    help="index partitions at creation (default 32; "
                         "existing index metadata wins)")
    ri.add_argument("--up-to", type=int, default=None,
                    help="fold lake epochs only up to this one")
    ri.set_defaults(fn=cmd_range_index)

    rsc = sub.add_parser("range-scan",
                         help="range-predicate scan via the range index: "
                              "urls whose LIVE column is in [lo, hi] "
                              "(O(range/width) index-partition reads + "
                              "hash-routed payload lookups)")
    rsc.add_argument("lake")
    rsc.add_argument("column")
    rsc.add_argument("lo", type=int)
    rsc.add_argument("hi", type=int)
    rsc.add_argument("--as-of", type=int, default=None, dest="as_of")
    rsc.add_argument("--show", type=int, default=10,
                     help="max (key, val) rows printed")
    rsc.add_argument("--rows", action="store_true",
                     help="also point-look-up the payload rows")
    rsc.add_argument("--out", default=None,
                     help="with --rows: write the payload rows here")
    rsc.set_defaults(fn=cmd_range_scan)

    lw = sub.add_parser("lookup-where",
                        help="multi-predicate serving lookup: AND-intersect "
                             "column/range indexes, then hash-routed payload "
                             "reads for only the surviving urls")
    lw.add_argument("lake")
    lw.add_argument("--eq", nargs="+", default=None, metavar="COL=V[,V...]",
                    help="equality terms via the column index (IN-list "
                         "with commas)")
    lw.add_argument("--range", nargs="+", default=None, metavar="COL:LO:HI",
                    help="inclusive range terms via the range index")
    lw.add_argument("--as-of", type=int, default=None, dest="as_of")
    lw.add_argument("--show", type=int, default=10)
    lw.add_argument("--rows", action="store_true",
                    help="also point-look-up the payload rows")
    lw.add_argument("--out", default=None,
                    help="with --rows: write the payload rows here")
    lw.set_defaults(fn=cmd_lookup_where)

    se = sub.add_parser("search",
                        help="full-text point lookup: urls whose LIVE text "
                             "contains each token (O(|tokens|) index-"
                             "partition reads)")
    se.add_argument("lake")
    se.add_argument("token", nargs="+")
    se.add_argument("--as-of", type=int, default=None,
                    help="time-travel: search the index as of this epoch")
    se.add_argument("--show", type=int, default=10,
                    help="max urls printed per token")
    se.add_argument("--ranked", action="store_true",
                    help="rank urls by exact-integer tf-idf (tf from the "
                         "index postings, idf from per-token posting "
                         "counts) instead of boolean membership")
    se.add_argument("--topk", type=int, default=10,
                    help="ranked mode: rows returned")
    se.add_argument("--phrase", action="store_true",
                    help="treat the tokens as an exact consecutive phrase "
                         "(requires a positional index: text-index "
                         "--positional)")
    se.set_defaults(fn=cmd_search)

    vi = sub.add_parser("vec-index",
                        help="refresh the lake's bucketed ANN vector index "
                             "(<lake>/vecidx): hyperplane-bucket posting "
                             "diffs per changed url, exactly-once per "
                             "(bucket-partition, epoch)")
    vi.add_argument("lake")
    vi.add_argument("--partitions", type=int, default=None,
                    help="lake partitions override; persisted metadata wins")
    vi.add_argument("--idx-partitions", type=int, default=None,
                    help="index partitions at creation (default 32; "
                         "existing index metadata wins)")
    vi.add_argument("--key-col", default="url")
    vi.add_argument("--vec-col", default="vec")
    vi.add_argument("--nbits", type=int, default=5,
                    help="hyperplane sign-bits (persisted geometry wins)")
    vi.add_argument("--seed", type=int, default=42)
    vi.add_argument("--dim", type=int, default=None,
                    help="vector dim (default: sniffed from the lake)")
    vi.add_argument("--up-to", type=int, default=None,
                    help="fold lake epochs only up to this one")
    vi.set_defaults(fn=cmd_vec_index)

    vs = sub.add_parser("vec-search",
                        help="ANN point lookup: top-k cosine neighbors of a "
                             "live url's vector (multi-probe bucketed "
                             "index; O(|probed buckets|) partition reads)")
    vs.add_argument("lake")
    vs.add_argument("url", help="live url to query by — or, with --text, "
                                "a free-text query string")
    vs.add_argument("--text", action="store_true",
                    help="treat the positional argument as free text: "
                         "embed it with the lake's hashed-token featurizer "
                         "(semantic search, no external model)")
    vs.add_argument("--partitions", type=int, default=None)
    vs.add_argument("--topk", type=int, default=10)
    vs.add_argument("--probe", type=int, default=1,
                    help="Hamming multi-probe radius over bucket bits")
    vs.add_argument("--as-of", type=int, default=None,
                    help="time-travel: search the index as of this epoch")
    vs.set_defaults(fn=cmd_vec_search)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
