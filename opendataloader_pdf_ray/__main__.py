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


def cmd_convert(args) -> int:
    from .api import convert
    from .config import ExtractorConfig

    cfg = ExtractorConfig(sanitize=args.sanitize,
                          include_header_footer=args.include_header_footer)
    ext = {"text": ".txt", "markdown": ".md", "json": ".json", "html": ".out.html"}
    n_ok = n_fail = 0
    files = list(_iter_html_files(args.paths))
    for path in files:
        try:
            out = convert(path.read_bytes(), cfg, output_formats=args.format,
                          file_name=path.name)
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
    print(f"processed {n_ok} file(s), {n_fail} failed", file=sys.stderr)
    return 0 if n_fail == 0 else 1


def cmd_ingest(args) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .cdc import Lake, replay
    from .config import CDCConfig

    cfg = CDCConfig(num_partitions=args.partitions, epoch_size=args.epoch_size)
    lineage = replay(args.events, args.lake, cfg, mode=args.mode)
    lake = Lake(args.lake, cfg.num_partitions)
    state = lake.read_state()
    print(json.dumps({
        "partitions_committed": len(lineage),
        "events_consumed": sum(l["events_consumed"] for l in lineage),
        "rows_upserted": sum(l["rows_upserted"] for l in lineage),
        "rows_deleted": sum(l["rows_deleted"] for l in lineage),
        "live_rows": state.num_rows,
    }))
    ray.shutdown()
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
    conv.set_defaults(fn=cmd_convert)

    ing = sub.add_parser("ingest", help="replay a change-event log into a lake")
    ing.add_argument("events")
    ing.add_argument("lake")
    ing.add_argument("--epoch-size", type=int, default=10_000)
    ing.add_argument("--partitions", type=int, default=32)
    ing.add_argument("--mode", default="backlog", choices=["backlog", "epoch"])
    ing.set_defaults(fn=cmd_ingest)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
