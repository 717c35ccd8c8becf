"""Copy-on-write Parquet lake with an idempotent per-partition commit log.

Layout (resumable-output rule: one directory per partition, never one giant
file):

    <root>/part=<k>/epoch=<e>.parquet      full partition state after epoch e
    <root>/part=<k>/delta=<e>.parquet      epoch e's winner set only (delta mode)
    <root>/_commits/part-<k>-epoch-<e>.json   commit record + lineage
    <root>/_commits/epoch-<e>.done            whole-epoch completion marker

Delta commits (round-2, the write-amplification fix for streaming tails):
``commit_delta`` writes only the epoch's LWW winner set — no read-modify-
write of the partition. Reads reconstruct state merge-on-read style: newest
epoch whose SNAPSHOT file exists is the base, later committed delta files
fold on top in epoch order (the LWW fold is associative, so this equals the
eager CoW result — property-tested). ``compact()`` materializes the folded
state as a snapshot file at the newest committed epoch — no new commit
record needed, because a snapshot file is just a cached view of the already-
committed history; ``vacuum`` then reclaims superseded deltas/snapshots.

Storage is abstracted over **fsspec** (round-2): ``root`` may be a plain
POSIX path, ``file:///…`` or ``memory://…`` (object-store-shaped). The commit
protocol is rename-free by design — atomic rename does not exist on object
stores — so the COMMIT POINT is "the commit record exists", checked before
write and trusted by every reader:

- the data file is written under its final deterministic name; a retried task
  rewrites byte-identical content (extraction/merge are deterministic), so a
  concurrent double-PUT is harmless,
- the tiny commit record is then written in one call (single PUT — atomic on
  object stores); on local filesystems it is staged + renamed for the same
  no-partial-read guarantee,
- a retried task first checks the commit record and becomes a no-op
  (SURVEY.md §2.9/§7.4). The commit record doubles as the lineage record.
"""

from __future__ import annotations

import base64
import json
import posixpath
import re
import sys
import uuid
from dataclasses import asdict, dataclass, fields
from typing import Dict, List, Optional

import fsspec
import pyarrow as pa
import pyarrow.parquet as pq

from .merge import (
    is_internal_col,
    live_view,
    merge_base_with_updates,
    strip_internal,
    unified_schema,
    unify_to_schema,
)

# --------------------------------------------------------------- commit bloom
# Per-DELTA-commit url Bloom filter: lets merge-on-read point lookups skip
# delta FILES whose epoch definitely does not touch the requested keys —
# O(matching epochs) parquet reads per lookup instead of O(epochs). Snapshots
# don't carry one (the fold must read the base snapshot regardless). Sizing:
# ~10 bits/key (≈1% false-positive tail — an FP only costs one extra pruned
# parquet read, never a wrong result: Bloom has no false negatives, so a
# "definitely absent" skip can never drop a row or a tombstone from the fold.
# Capped at 64 KiB per commit record so the commit log stays metadata-sized.
_BLOOM_K = 7
_BLOOM_MAX_BITS = 64 * 1024 * 8


def _bloom_m_bits(n_keys: int) -> int:
    m = max(256, 10 * n_keys)
    return min(_BLOOM_MAX_BITS, (m + 63) // 64 * 64)


def _zone_maps_of(table) -> Dict[str, List[int]]:
    """{col: [min, max]} over the table's LIVE (non-tombstone) rows'
    INT/TIMESTAMP payload columns — the Iceberg/Delta file-statistics
    analog, ridden by every commit record so predicate scans can prune
    whole partitions from METADATA before any data file is opened. Scope
    mirrors the range index (ints/timestamps only — float NaN poisons
    min/max comparisons, and string bounds need Iceberg-style truncation
    to stay small); version-key/meta columns are excluded (``warc_ts``
    already rides as ``ts_range``, ``seq`` as lineage seq_min/max, Bloom
    covers ``url``). Tombstones contribute no values (a delete never
    creates a live match), so the dict may be EMPTY — and the empty dict
    is written anyway: "post-feature commit, contributes nothing" must
    stay distinguishable from a pre-feature record (absent key), which
    readers must treat as "may overlap anything"."""
    import pyarrow.compute as _pc

    if "deleted" in table.column_names:
        table = table.filter(
            _pc.invert(_pc.fill_null(table["deleted"], False)))
    out: Dict[str, List[int]] = {}
    if table.num_rows == 0:
        return out
    for field in table.schema:
        if field.name in ("url", "warc_ts", "seq", "deleted") \
                or is_internal_col(field.name):
            continue
        col = table[field.name]
        if pa.types.is_timestamp(field.type):
            col = col.cast(pa.int64())
        elif not (pa.types.is_integer(field.type)):
            continue
        mm = _pc.min_max(col)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if lo is None:
            continue  # all-null column: contributes nothing
        out[field.name] = [int(lo), int(hi)]
    return out


def _ts_range_of(table) -> Optional[List[int]]:
    """[min, max] of ``warc_ts`` as int64 µs — the event-time zone map a
    commit record carries so change-feed time-window reads can prune whole
    epochs/partitions without opening data files. None when the column is
    absent (follower posting commits) or all-null."""
    if "warc_ts" not in table.column_names or table.num_rows == 0:
        return None
    import pyarrow.compute as _pc

    col = table["warc_ts"]
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.int64())
    mm = _pc.min_max(col)
    lo, hi = mm["min"].as_py(), mm["max"].as_py()
    if lo is None:
        return None
    return [int(lo), int(hi)]


def _bloom_of_urls(urls) -> Dict:
    """JSON-embeddable Bloom filter of a url column (base64 bitmap)."""
    from ..functions.bloom import partial_bitmap
    from ..functions.sampling import _hash64

    keys = _hash64([u for u in urls])
    m = _bloom_m_bits(len(keys))
    return {"m": m, "k": _BLOOM_K,
            "bits": base64.b64encode(
                partial_bitmap(keys, m, _BLOOM_K)).decode()}


def _bloom_maybe_any(bloom: Dict, urls: List[str]) -> bool:
    """False only when EVERY url is definitely absent from the commit."""
    from ..functions.bloom import maybe_contains
    from ..functions.sampling import _hash64

    bits = base64.b64decode(bloom["bits"])
    return bool(maybe_contains(bits, _hash64(urls), int(bloom["m"]),
                               int(bloom["k"])).any())


class WriterFencedError(RuntimeError):
    """A newer writer acquired the lake's fencing token; this writer must
    stop (its commit-log progress is safe — the new writer resumes it)."""


@dataclass
class Lineage:
    part: int
    epoch: int
    events_consumed: int
    rows_upserted: int
    rows_deleted: int
    seq_min: int
    seq_max: int
    skipped: bool = False  # True when the commit already existed (idempotent replay)
    kind: str = "snapshot"  # "snapshot" (full partition state) | "delta" (winner set)


class Lake:
    def __init__(self, root: str, num_partitions: Optional[int] = None):
        """``num_partitions`` is persisted in lake metadata at creation and
        is AUTHORITATIVE afterwards (ADVICE r2: a CLI default of 32 on a
        64-partition lake silently audited/compacted only half of it). Open
        an existing lake with ``num_partitions=None`` to use the persisted
        value; a mismatching explicit value is ignored with a warning.
        Pre-metadata lakes fall back to globbing ``part=*`` dirs.

        BRANCH lakes (created by :meth:`branch`) additionally carry
        ``parent_root`` + ``fork_epoch`` in their metadata: commit records
        and data files for epochs ≤ fork resolve against the parent
        (zero-copy, Git-like), everything after the fork lives locally."""
        self.root = root
        self.fs, self._base = fsspec.core.url_to_fs(root)
        self._is_local = "file" in (self.fs.protocol if isinstance(self.fs.protocol, (list, tuple))
                                    else (self.fs.protocol,))
        self.fs.makedirs(self._commits_dir(), exist_ok=True)
        meta = self._read_meta()
        self.parent_root: Optional[str] = (meta or {}).get("parent_root")
        self.fork_epoch: Optional[int] = (meta or {}).get("fork_epoch")
        self._parent_lake: Optional["Lake"] = None
        persisted = (meta or {}).get("num_partitions")
        if persisted is not None:
            persisted = int(persisted)
            if num_partitions is not None and num_partitions != persisted:
                print(f"[lake] ignoring num_partitions={num_partitions}: "
                      f"lake metadata says {persisted}", file=sys.stderr)
            self.num_partitions = persisted
        elif num_partitions is not None:
            self.num_partitions = num_partitions
            self._write_small_atomic(
                self._meta_path(),
                json.dumps({"num_partitions": num_partitions,
                            "format_version": 1}).encode())
        else:
            derived = self._derive_partitions()
            if derived is None:
                raise ValueError(
                    f"lake at {root} has no metadata, no part=* dirs and no "
                    f"explicit num_partitions")
            self.num_partitions = derived

    def _meta_path(self) -> str:
        return posixpath.join(self._commits_dir(), "lake.json")

    def _read_meta(self) -> Optional[Dict]:
        try:
            with self.fs.open(self._meta_path(), "rb") as f:
                return json.loads(f.read().decode())
        except (FileNotFoundError, OSError, ValueError):
            return None

    # ---------------------------------------------------------------- branches
    def _parent(self) -> Optional["Lake"]:
        """Lazily-opened parent lake (branch lakes only)."""
        if self.parent_root is None:
            return None
        if self._parent_lake is None:
            self._parent_lake = Lake(self.parent_root)
        return self._parent_lake

    def resolve_data(self, part: int, epoch: int, kind: str = "snap"):
        """(filesystem, path) of the data/delta file for (part, epoch), or
        None — local file first, then the parent chain for epochs ≤ the fork
        (a branch shadows a parent file by writing the same name locally,
        which is how ``purge`` on a branch erases without touching the
        parent). Every reader goes through this, so branch-of-branch chains
        resolve recursively."""
        path = self._data_path(part, epoch) if kind == "snap" \
            else self._delta_path(part, epoch)
        if self.fs.exists(path):
            return self.fs, path
        parent = self._parent()
        if parent is not None and epoch <= self.fork_epoch:
            return parent.resolve_data(part, epoch, kind)
        return None

    def branch(self, dest_root: str, at: Optional[int] = None,
               name: Optional[str] = None) -> "Lake":
        """Create a ZERO-COPY branch of this lake at epoch ``at`` (default:
        the current tip). O(1) metadata writes — no data files, no commit
        records are copied: the branch's reads delegate to the parent for
        epochs ≤ fork and diverge after it (new epochs commit locally;
        epochs ≤ fork are immutable on the branch). The branch is REGISTERED
        in the parent's commit log (``_commits/branches/<name>.json``) so
        the parent's ``vacuum`` pins the snapshot/delta files every fork
        still needs — a branch can never be orphaned by parent maintenance.
        Dev/experiment workflow: branch → reprocess/backfill on the branch →
        ``diff`` vs parent → fast-forward merge back via ``replicate`` (or
        discard). Analog of Iceberg/LakeFS refs for this commit-log design."""
        tip = None
        for p in range(self.num_partitions):
            e = self.latest_epoch(p)
            if e is not None:
                tip = e if tip is None else max(tip, e)
        if tip is None:
            raise ValueError(f"cannot branch empty lake {self.root}")
        fork = int(at) if at is not None else tip
        if fork > tip:
            raise ValueError(f"branch point {fork} is past the tip {tip}")
        dfs, dbase = fsspec.core.url_to_fs(dest_root)
        dmeta = posixpath.join(dbase, "_commits", "lake.json")
        if dfs.exists(dmeta):
            raise ValueError(f"destination {dest_root} is already a lake")
        bid = name if name is not None else uuid.uuid4().hex[:8]
        bdir = posixpath.join(self._commits_dir(), "branches")
        bpath = posixpath.join(bdir, f"{bid}.json")
        if self.fs.exists(bpath):
            raise ValueError(f"branch name {bid!r} already registered")
        # register in the parent FIRST: vacuum protection must exist before
        # the branch does (a crash between the two leaves a harmless record)
        self.fs.makedirs(bdir, exist_ok=True)
        self._write_small_atomic(bpath, json.dumps(
            {"name": bid, "fork_epoch": fork, "root": dest_root}).encode())
        dfs.makedirs(posixpath.dirname(dmeta), exist_ok=True)
        payload = json.dumps({
            "num_partitions": self.num_partitions, "format_version": 1,
            "parent_root": self.root, "fork_epoch": fork,
            "branch_name": bid}).encode()
        tmp = dmeta + f".tmp-{uuid.uuid4().hex}"
        try:
            with dfs.open(tmp, "wb") as f:
                f.write(payload)
            dfs.mv(tmp, dmeta)
        except (OSError, NotImplementedError):
            dfs.pipe_file(dmeta, payload)
        return Lake(dest_root)

    def detach(self) -> Dict:
        """Promote this BRANCH to a standalone lake (the inverse of
        :meth:`branch` — LakeFS "export", Iceberg "register table"):

        1. compact every partition at its tip — the current state
           LOCALIZES (one snapshot per partition; distributed when a Ray
           session exists, in-process otherwise);
        2. copy the parent chain's commit records and epoch-complete
           markers ≤ fork (metadata-sized — the lineage stays auditable
           and ``committed_epochs``/watermark walks keep working);
        3. drop ``parent_root``/``fork_epoch`` from the lake metadata and
           UNREGISTER from the parent — whose next ``vacuum`` may then
           reclaim the previously fork-pinned files.

        After detach the lake depends on nothing: the parent can be
        vacuumed aggressively or deleted. Pre-fork TIME TRAVEL degrades to
        what is held locally (normally just the tip snapshot) — the same
        bounded-history degradation ``vacuum`` itself imposes; branch with
        an earlier ``at`` and detach that if older states must survive.
        Idempotent-ish: a crash mid-detach leaves a branch that is still
        fully readable via the parent (metadata copies are additive;
        the final meta rewrite is the switch point) — re-run to finish."""
        if self.parent_root is None:
            raise ValueError(f"{self.root} is not a branch — nothing to "
                             f"detach")
        import ray as _ray

        if _ray.is_initialized():
            self.compact_distributed()
        else:
            self.compact()
        # metadata copies: commit records + epoch markers ≤ fork
        records = markers = 0
        for part in range(self.num_partitions):
            for e in self.committed_epochs(part):
                if e > self.fork_epoch:
                    continue
                cpath = self._commit_path(part, e)
                if not self.fs.exists(cpath):
                    self._write_small_atomic(
                        cpath, json.dumps(self._read_commit(part, e)).encode())
                    records += 1
        parent = self._parent()
        for e in range(self.fork_epoch + 1):
            # kind-preserving (is_epoch_done / is_epoch_complete delegate
            # through the whole parent chain, so grandparents are covered)
            if not self.fs.exists(self.epoch_done_path(e)) \
                    and parent.is_epoch_done(e):
                self._write_small_atomic(self.epoch_done_path(e), b"done")
                markers += 1
            elif not self.fs.exists(self.epoch_maint_path(e)) \
                    and not parent.is_epoch_done(e) \
                    and parent.is_epoch_complete(e):
                self._write_small_atomic(self.epoch_maint_path(e), b"maint")
                markers += 1
        meta = self._read_meta() or {}
        name = meta.pop("branch_name", None)
        old_parent, old_fork = self.parent_root, self.fork_epoch
        meta.pop("parent_root", None)
        meta.pop("fork_epoch", None)
        self._write_small_atomic(self._meta_path(), json.dumps(meta).encode())
        self.parent_root = self.fork_epoch = None
        self._parent_lake = None
        # unregister (by name, else by recorded root)
        unregistered = False
        bdir = posixpath.join(parent._commits_dir(), "branches")
        for rec in parent.branches():
            if (name is not None and rec.get("name") == name) or \
                    (name is None and rec.get("root") == self.root):
                try:
                    parent.fs.rm_file(
                        posixpath.join(bdir, f"{rec['name']}.json"))
                    unregistered = True
                except OSError:
                    pass
        return {"detached": self.root, "parent": old_parent,
                "fork_epoch": old_fork, "commit_records_copied": records,
                "markers_copied": markers, "unregistered": unregistered}

    def branches(self) -> List[Dict]:
        """Branch registrations recorded in THIS lake's commit log (children
        forked from this lake) — the vacuum-protection list."""
        bdir = posixpath.join(self._commits_dir(), "branches")
        try:
            names = sorted(self.fs.ls(bdir, detail=False))
        except FileNotFoundError:
            return []
        out = []
        for full in names:
            if not full.endswith(".json"):
                continue
            with self.fs.open(full, "rb") as f:
                out.append(json.loads(f.read().decode()))
        return out

    def _derive_partitions(self) -> Optional[int]:
        """Pre-metadata lakes: highest part=NNNN dir + 1."""
        try:
            names = self.fs.ls(self._base, detail=False)
        except FileNotFoundError:
            return None
        parts = [int(posixpath.basename(n).split("=", 1)[1])
                 for n in names
                 if posixpath.basename(n).startswith("part=")]
        return max(parts) + 1 if parts else None

    # ------------------------------------------------------------------- paths
    def _part_dir(self, part: int) -> str:
        return posixpath.join(self._base, f"part={part:04d}")

    def _commits_dir(self) -> str:
        return posixpath.join(self._base, "_commits")

    def _commit_path(self, part: int, epoch: int) -> str:
        return posixpath.join(self._commits_dir(), f"part-{part:04d}-epoch-{epoch:06d}.json")

    def _data_path(self, part: int, epoch: int) -> str:
        return posixpath.join(self._part_dir(part), f"epoch={epoch:06d}.parquet")

    def _delta_path(self, part: int, epoch: int) -> str:
        return posixpath.join(self._part_dir(part), f"delta={epoch:06d}.parquet")

    def epoch_done_path(self, epoch: int) -> str:
        return posixpath.join(self._commits_dir(), f"epoch-{epoch:06d}.done")

    def epoch_maint_path(self, epoch: int) -> str:
        return posixpath.join(self._commits_dir(), f"epoch-{epoch:06d}.maint")

    # ------------------------------------------------------------- atomic write
    def _write_table_atomic(self, table: pa.Table, path: str) -> None:
        """Parquet write that never exposes a partial file at its final
        path (ADVICE r2: compact's snapshot has no commit record gating
        visibility — the file's existence IS the publish signal, so a crash
        mid-write must not leave a truncated file readers would select).
        Local fs: staged + POSIX-atomic rename; object stores: PUTs are
        already all-or-nothing."""
        if self._is_local:
            tmp = path + f".tmp-{uuid.uuid4().hex}"
            pq.write_table(table, tmp, compression="zstd", filesystem=self.fs)
            try:
                self.fs.mv(tmp, path)
            except OSError:
                # lost a publish race to a concurrent compactor writing the
                # same deterministic bytes — their file is as good as ours
                if not self.fs.exists(path):
                    raise
                try:
                    self.fs.rm_file(tmp)
                except OSError:
                    pass
        else:
            pq.write_table(table, path, compression="zstd",
                           filesystem=self.fs)

    def _write_small_atomic(self, path: str, data: bytes) -> None:
        """Single-call write for tiny records: one PUT on object stores; on
        local filesystems staged + renamed so readers never see partial
        content."""
        if self._is_local:
            tmp = path + f".tmp-{uuid.uuid4().hex}"
            with self.fs.open(tmp, "wb") as f:
                f.write(data)
            self.fs.mv(tmp, path)
        else:
            self.fs.pipe_file(path, data)

    # ------------------------------------------------------------------ status
    def is_committed(self, part: int, epoch: int) -> bool:
        if self.fs.exists(self._commit_path(part, epoch)):
            return True
        parent = self._parent()
        return (parent is not None and epoch <= self.fork_epoch
                and parent.is_committed(part, epoch))

    def is_epoch_done(self, epoch: int) -> bool:
        if self.fs.exists(self.epoch_done_path(epoch)):
            return True
        parent = self._parent()
        return (parent is not None and epoch <= self.fork_epoch
                and parent.is_epoch_done(epoch))

    def mark_epoch_done(self, epoch: int) -> None:
        self._write_small_atomic(self.epoch_done_path(epoch), b"done")

    def mark_epoch_maint(self, epoch: int) -> None:
        """Maintenance-epoch watermark (retention/backfill): a SEPARATE
        marker from ``epoch_done`` on purpose — ``replay`` skips binlog
        epochs on the done marker, and a maintenance epoch wearing it
        would make a resumed tail silently drop the colliding binlog
        epoch's events (the `_guard_cdc_epoch` loud-fail must still
        fire). Watermark consumers advance on EITHER marker via
        ``is_epoch_complete``."""
        self._write_small_atomic(self.epoch_maint_path(epoch), b"maint")

    def is_epoch_complete(self, epoch: int) -> bool:
        """True when the epoch is a completed binlog epoch (done marker)
        OR a completed maintenance epoch (maint marker) — the watermark
        walk for change-feed / replication tails."""
        if (self.fs.exists(self.epoch_done_path(epoch))
                or self.fs.exists(self.epoch_maint_path(epoch))):
            return True
        parent = self._parent()
        return (parent is not None and epoch <= self.fork_epoch
                and parent.is_epoch_complete(epoch))

    # --------------------------------------------------------- writer fence
    def writer_path(self) -> str:
        return posixpath.join(self._commits_dir(), "writer.json")

    def writer_token(self) -> Optional[dict]:
        if not self.fs.exists(self.writer_path()):
            return None
        with self.fs.open(self.writer_path(), "rb") as f:
            return json.loads(f.read().decode())

    def acquire_writer(self, owner: str) -> dict:
        """Take writership by bumping the generation — the lease-less
        fencing token (Kleppmann-style). The NEW writer always wins: any
        holder of an older token sees the bump at its next
        ``check_writer`` and dies loudly instead of double-writing. On
        stores without compare-and-swap two simultaneous acquires can both
        think they won for one check interval; the guarantee is
        check-before-publish, so at most one of them advances past the
        next epoch boundary (the commit protocol keeps even that window
        idempotent for identical sources). The token is ops-plane
        metadata — it never influences data bytes, so determinism of
        lake content is untouched."""
        cur = self.writer_token()
        tok = {"gen": (int(cur["gen"]) if cur else 0) + 1, "owner": owner}
        self._write_small_atomic(self.writer_path(),
                                 json.dumps(tok).encode())
        return tok

    def check_writer(self, token: dict) -> None:
        """Raise :class:`WriterFencedError` unless ``token`` is still the
        current writer — called by tails before each poll/publish."""
        cur = self.writer_token()
        if cur != token:
            raise WriterFencedError(
                f"writer fenced: lake {self.root} is now owned by "
                f"{cur} (this writer held {token}) — a newer tail or "
                f"maintenance op took over; stop this process and let "
                f"the new writer resume from the commit log")

    # ---------------------------------------------------------------- tags
    # Named savepoints: a tag is a human name for an epoch, stored as one
    # small json under _commits/tags/ (ops-plane metadata, never data
    # bytes). Tagged epochs PIN their reconstruction files from vacuum
    # exactly like branch fork points do, so `restore LAKE <tag>` keeps
    # working after compaction. Reference parity: none (no lake in the
    # reference); the analog is Iceberg/Delta named snapshots ("tags").

    _TAG_RE = re.compile(r"^[A-Za-z][A-Za-z0-9._-]*$")

    def _tag_path(self, name: str) -> str:
        return posixpath.join(self._commits_dir(), "tags", name + ".json")

    def set_tag(self, name: str, epoch: int) -> None:
        """Create tag ``name`` → ``epoch``. The name must start with a
        letter (never int-like — epoch refs stay unambiguous), the epoch
        must be COMPLETE (done/maint marker — tagging a half-committed
        epoch would save a state no reader can reconstruct), and the tag
        must not already exist (retagging is delete + set, an explicit
        two-step so a tag can't be silently moved)."""
        if not self._TAG_RE.match(name):
            raise ValueError(
                f"bad tag name {name!r}: must start with a letter and use "
                f"only [A-Za-z0-9._-] (keeps tag refs distinguishable "
                f"from integer epoch refs)")
        if not self.is_epoch_complete(epoch):
            raise ValueError(
                f"cannot tag epoch {epoch}: it has no done/maint marker — "
                f"tagging a half-committed epoch would name a state no "
                f"reader can reconstruct")
        if self.fs.exists(self._tag_path(name)):
            raise ValueError(f"tag {name!r} already exists "
                             f"(at epoch {self.get_tag(name)}) — delete it "
                             f"first to retag")
        gaps = self.reconstruction_gaps(epoch)
        if gaps:
            raise ValueError(
                f"cannot tag epoch {epoch}: a pre-tag vacuum already "
                f"reclaimed files the reconstruction needs — restore/"
                f"branch by this tag would fail later ({'; '.join(gaps)})")
        self.fs.makedirs(posixpath.join(self._commits_dir(), "tags"),
                         exist_ok=True)
        self._write_small_atomic(self._tag_path(name),
                                 json.dumps({"epoch": int(epoch)}).encode())

    def delete_tag(self, name: str) -> None:
        if not self.fs.exists(self._tag_path(name)):
            raise ValueError(f"tag {name!r} does not exist")
        self.fs.rm_file(self._tag_path(name))

    def get_tag(self, name: str) -> Optional[int]:
        if not self.fs.exists(self._tag_path(name)):
            return None
        with self.fs.open(self._tag_path(name), "rb") as f:
            return int(json.loads(f.read().decode())["epoch"])

    def list_tags(self) -> Dict[str, int]:
        tags_dir = posixpath.join(self._commits_dir(), "tags")
        try:
            names = self.fs.ls(tags_dir, detail=False)
        except FileNotFoundError:
            return {}
        out = {}
        for full in names:
            name = posixpath.basename(full)
            if name.endswith(".json"):
                out[name[:-5]] = self.get_tag(name[:-5])
        return out

    def resolve_epoch_ref(self, ref) -> int:
        """An epoch reference is an int (or int-like string) epoch number,
        or a tag name. Unknown tags fail loudly with the available names."""
        if isinstance(ref, int):
            return ref
        s = str(ref)
        try:
            return int(s)
        except ValueError:
            pass
        epoch = self.get_tag(s)
        if epoch is None:
            raise ValueError(f"unknown tag {s!r} on lake {self.root} "
                             f"(tags: {sorted(self.list_tags()) or 'none'})")
        return epoch

    def committed_epochs(self, part: int) -> List[int]:
        prefix = f"part-{part:04d}-epoch-"
        out = set()
        try:
            names = self.fs.ls(self._commits_dir(), detail=False)
        except FileNotFoundError:
            names = []
        for full in names:
            name = posixpath.basename(full)
            if name.startswith(prefix) and name.endswith(".json"):
                out.add(int(name[len(prefix):-5]))
        parent = self._parent()
        if parent is not None:
            out |= {e for e in parent.committed_epochs(part)
                    if e <= self.fork_epoch}
        return sorted(out)

    def latest_epoch(self, part: int, as_of: Optional[int] = None) -> Optional[int]:
        epochs = self.committed_epochs(part)
        if as_of is not None:
            epochs = [e for e in epochs if e <= as_of]
        return epochs[-1] if epochs else None

    # ------------------------------------------------- column renames
    # Metadata-level rename (Iceberg renames by column id; this engine is
    # name-addressed, so the equivalent is a persisted historical→current
    # name map consulted at every file read). No data file is rewritten:
    # files keep the name current when they were written, and translation
    # happens per file BEFORE the merge-on-read fold — so pre-rename
    # snapshots and post-rename deltas fold into ONE column instead of
    # forking into null-backfilled twins. Incoming binlog events still
    # carrying the old name are translated at apply time (ingest
    # ApplyPartition*), so lagging producers converge instead of forking.
    # Reads at ANY as_of present the CURRENT name (Iceberg semantics:
    # schema evolution is not versioned per snapshot here — documented).

    def _renames_path(self) -> str:
        return posixpath.join(self._commits_dir(), "renames.json")

    def list_renames(self) -> List[Dict]:
        try:
            with self.fs.open(self._renames_path(), "rb") as f:
                return json.loads(f.read().decode())["renames"]
        except FileNotFoundError:
            return []

    def rename_map(self) -> Dict[str, str]:
        """historical name → CURRENT name, chains resolved (a→b then b→c
        yields {a: c, b: c}); identity cycles (a→b→a) drop out."""
        cur: Dict[str, str] = {}
        for r in self.list_renames():
            frm, to = r["from"], r["to"]
            for k, v in list(cur.items()):
                if v == frm:
                    cur[k] = to
            cur[frm] = to
        return {k: v for k, v in cur.items() if k != v}

    def apply_renames(self, table: Optional[pa.Table],
                      rmap: Optional[Dict[str, str]] = None
                      ) -> Optional[pa.Table]:
        """Translate historical column names to current ones on a table
        read from (or bound for) this lake's files. Raises on a
        translation collision (a file holding BOTH the old and new name
        — only metadata damage can produce that)."""
        if table is None:
            return None
        rmap = self.rename_map() if rmap is None else rmap
        if not rmap:
            return table
        names = table.column_names
        new = [rmap.get(n, n) for n in names]
        if new == names:
            return table
        if len(set(new)) != len(new):
            dup = sorted({n for n in new if new.count(n) > 1})
            raise ValueError(
                f"rename translation collision on columns {dup}: a file "
                f"holds both a historical and the current name — fsck the "
                f"rename map")
        return table.rename_columns(new)

    def _aliases(self, col: str,
                 rmap: Optional[Dict[str, str]] = None) -> List[str]:
        """All names (current + historical) that resolve to ``col``."""
        rmap = self.rename_map() if rmap is None else rmap
        return [col] + sorted(h for h, v in rmap.items() if v == col)

    def rename_column(self, old: str, new: str) -> Dict:
        """Rename a payload column — metadata only, no file rewrite
        (module comment above). Guards mirror drop_column: version-key /
        meta columns refused; a follower index over the column refused
        (its keyspace is name-addressed); the target name must be free.
        Renaming a previously-renamed column chains. An audit record
        lands in the rename log; fsck validates the map."""
        if old in self._MERGE_COLS or is_internal_col(old) or old == "op":
            raise ValueError(f"rename_column: {old!r} is a version-key/"
                             f"meta column")
        if new in self._MERGE_COLS or is_internal_col(new) or new == "op":
            raise ValueError(f"rename_column: target {new!r} is a "
                             f"version-key/meta column")
        if not new.isidentifier():
            raise ValueError(f"rename_column: target {new!r} is not a "
                             f"valid column name")
        rmap = self.rename_map()
        current = self._current_columns()
        if old not in current:
            raise ValueError(f"rename_column: {old!r} is not a current "
                             f"column (have {sorted(current)})")
        if new in current or new in rmap:
            raise ValueError(f"rename_column: target {new!r} already "
                             f"names a column (current or historical)")
        self._guard_indexed_column(old, op="rename_column")
        renames = self.list_renames()
        newest = max((e for p in range(self.num_partitions)
                      for e in self.committed_epochs(p)), default=-1)
        renames.append({"from": old, "to": new, "at_epoch": newest})
        self._write_small_atomic(
            self._renames_path(),
            json.dumps({"renames": renames}).encode())
        return renames[-1]

    def _current_columns(self) -> List[str]:
        """Current user-facing column names: footer schemas across live
        partitions, unified, translated through the rename map."""
        _, target = self._unified_live()
        if target is None:
            return []
        rmap = self.rename_map()
        return [rmap.get(f.name, f.name) for f in target]

    def _guard_indexed_column(self, col: str, op: str) -> None:
        """Refuse ops on columns covered by a name-addressed follower
        index (shared by drop_column and rename_column)."""
        from .colindex import col_index_root
        from .rangeindex import range_index_root
        from .textindex import text_index_root
        from .trigramindex import substr_index_root
        from .vecindex import vec_index_root

        for idx_root in (col_index_root(self.root, col),
                         range_index_root(self.root, col)):
            if self.fs.exists(idx_root):
                raise ValueError(
                    f"{op}: {col!r} has a follower index at {idx_root} — "
                    f"delete the index first (it would silently go stale)")
        for idx_root, covered in ((text_index_root(self.root), "text"),
                                  (substr_index_root(self.root), "text")):
            if col == covered and self.fs.exists(idx_root):
                raise ValueError(
                    f"{op}: {col!r} is covered by the follower index at "
                    f"{idx_root} — delete the index first (it would "
                    f"silently go stale)")
        vroot = vec_index_root(self.root)
        if self.fs.exists(vroot):
            vcol = "vec"
            try:
                with self.fs.open(posixpath.join(vroot, "_vecconf.json"),
                                  "rb") as f:
                    vcol = json.loads(f.read().decode()).get("vec_col",
                                                             "vec")
            except FileNotFoundError:
                pass
            if col == vcol:
                raise ValueError(
                    f"{op}: {col!r} is the vector index's embedding "
                    f"column ({vroot}) — delete the index first (it "
                    f"would silently go stale)")

    # -------------------------------------------------------------------- read
    _MERGE_COLS = ("url", "warc_ts", "seq", "deleted")

    def _projection(self, columns: Optional[List[str]],
                    schema_names) -> Optional[List[str]]:
        """Requested columns + the LWW merge keys (the fold needs them),
        intersected with what this file actually has (schema evolution:
        older files may predate a column — the fold null-backfills)."""
        if columns is None:
            return None
        want = list(dict.fromkeys(list(columns) + list(self._MERGE_COLS)))
        return [c for c in want if c in set(schema_names)]

    def read_partition(self, part: int, as_of: Optional[int] = None,
                       url_filter: Optional[List[str]] = None,
                       columns: Optional[List[str]] = None,
                       internal: bool = False) -> Optional[pa.Table]:
        """Merge-on-read: newest epoch ≤ as_of whose SNAPSHOT file exists is
        the base; committed delta files after it fold on top in epoch order
        (associative LWW, so this equals the eager CoW state).

        ``url_filter`` pushes a url value-set predicate into every parquet
        read — snapshots and winner deltas are written url-sorted, so
        row-group min/max stats prune the scan to the groups containing the
        requested keys (point lookups decode O(matching row groups), not the
        partition). Delta files are additionally pruned by the url Bloom in
        their COMMIT RECORD: an epoch that definitely doesn't touch any
        requested url is skipped without opening its parquet at all — point
        lookups read O(matching epochs) files, not O(epochs). Both prunings
        are safe before the fold: the LWW merge is per-url (dropping OTHER
        urls can't change the selected urls' fold) and Bloom has no false
        negatives (a skipped epoch contains neither a row nor a tombstone
        for any requested url).

        ``columns`` projects the read to the requested columns plus the
        merge keys (url/warc_ts/seq/deleted — the fold needs them): parquet
        is columnar, so a 2-column consumer never decodes the wide
        text/blocks columns. Safe before the fold for the same reason the
        url pushdown is: LWW winner selection touches only the merge keys.

        ``internal=True`` keeps the per-column version metadata columns
        (``_cvt_*``/``_cvs_*``, patch_ops lakes) that the ingest and
        maintenance fold paths need; user-facing reads (the default)
        strip them."""
        filters = None
        if url_filter is not None:
            filters = [("url", "in", list(url_filter))]
        rmap = self.rename_map()

        def _read(fs, path: str) -> pa.Table:
            cols = None
            if columns is not None:
                names = pq.read_schema(path, filesystem=fs).names
                want = columns
                if rmap:
                    # a pre-rename file holds the HISTORICAL name — read
                    # whichever alias this file actually has
                    want = [next((a for a in self._aliases(c, rmap)
                                  if a in names), c) for c in columns]
                cols = self._projection(want, names)
            t = pq.read_table(path, filesystem=fs, filters=filters,
                              columns=cols)
            # translate BEFORE the fold: a pre-rename snapshot and a
            # post-rename delta must merge into one column, not fork into
            # null-backfilled twins
            return self.apply_renames(t, rmap)

        epochs = self.committed_epochs(part)
        if as_of is not None:
            epochs = [e for e in epochs if e <= as_of]
        base: Optional[pa.Table] = None
        base_idx = -1
        # newest committed epoch whose snapshot still exists (vacuum may have
        # reclaimed older ones; commit records are kept for lineage); branch
        # lakes resolve parent files for epochs ≤ fork
        for i in range(len(epochs) - 1, -1, -1):
            res = self.resolve_data(part, epochs[i], "snap")
            if res is not None:
                base = _read(*res)
                base_idx = i
                break
        url_list = list(url_filter) if url_filter is not None else None
        for epoch in epochs[base_idx + 1:]:
            res = self.resolve_data(part, epoch, "delta")
            if res is not None:
                if url_list is not None:
                    bloom = self._read_commit(part, epoch).get("url_bloom")
                    if bloom is not None and not _bloom_maybe_any(
                            bloom, url_list):
                        continue  # epoch definitely touches none of the urls
                base = merge_base_with_updates(base, _read(*res))
        return base if internal else strip_internal(base)

    def _unified_live(self, as_of: Optional[int] = None):
        """Driver-side metadata pass shared by :meth:`read_dataset` and
        :meth:`export_resumable`: live partition ids + the schema unified
        across every partition's parquet FOOTERS (bytes, not data)."""
        target: Optional[pa.Schema] = None
        live_parts: List[int] = []
        rmap = self.rename_map()
        for part in range(self.num_partitions):
            epochs = self.committed_epochs(part)
            if as_of is not None:
                epochs = [e for e in epochs if e <= as_of]
            has_any = False
            for e in epochs:
                for kind in ("snap", "delta"):
                    res = self.resolve_data(part, e, kind)
                    if res is not None:
                        has_any = True
                        rfs, rpath = res
                        sch = pq.read_schema(rpath, filesystem=rfs)
                        if rmap:  # footer names → current names
                            sch = pa.schema(
                                [f.with_name(rmap.get(f.name, f.name))
                                 for f in sch])
                        target = sch if target is None \
                            else unified_schema(target, sch)
            if has_any:
                live_parts.append(part)
        if target is not None and any(is_internal_col(f.name)
                                      for f in target):
            # per-column version metadata (patch_ops lakes) never reaches
            # user-facing Dataset schemas
            target = pa.schema([f for f in target
                                if not is_internal_col(f.name)])
        return live_parts, target

    def read_dataset(self, as_of: Optional[int] = None,
                     include_tombstones: bool = False,
                     columns: Optional[List[str]] = None) -> "object":
        """Whole-lake state as a STREAMING ``ray.data.Dataset`` — the
        100-TB read path, and unlike :meth:`partition_files` it works on
        delta-mode (un-compacted) lakes: one task per partition performs the
        merge-on-read fold for ITS partition (memory bounded by partition
        size, the lake's unit of parallelism), so nothing lake-sized ever
        touches the driver. Schema evolution is handled scale-right: the
        driver unifies only parquet FOOTER schemas across partitions (bytes,
        not data) and every task null-backfills to that target schema, so
        the Dataset has one consistent schema. ``columns`` pushes a
        projection into every parquet read (plus the merge keys): a
        2-column consumer never decodes the wide text/blocks columns."""
        import ray.data as _rd

        live_parts, target = self._unified_live(as_of)
        if target is None:
            return _rd.from_items([])
        if columns is not None:
            keep = self._projection(columns, target.names)
            target = pa.schema([target.field(c) for c in keep])
        root, n_parts = self.root, self.num_partitions

        def load(batch: pa.Table) -> pa.Table:
            out = []
            for part in batch["part"].to_pylist():
                t = Lake(root, n_parts).read_partition(int(part), as_of,
                                                       columns=columns)
                if t is None or t.num_rows == 0:
                    continue
                t = unify_to_schema(t, target)
                out.append(t if include_tombstones else live_view(t))
            if not out:
                return target.empty_table()
            return pa.concat_tables(out)

        parts_ds = _rd.from_items([{"part": p} for p in live_parts])
        # batch_size=1 → one merge-on-read task per partition
        return parts_ds.map_batches(load, batch_format="pyarrow",
                                    batch_size=1)

    def changes(self, since: int = -1, until: Optional[int] = None,
                columns: Optional[List[str]] = None,
                before: Optional[List[str]] = None,
                min_ts: Optional[int] = None, max_ts: Optional[int] = None):
        """Row-level change feed (insert/update/delete per url per epoch)
        for epochs in ``(since, until]`` as a streaming Dataset — the lake
        as a binlog for downstream consumers. ``before`` attaches pre-image
        values as ``before_<col>``; ``min_ts``/``max_ts`` restrict to an
        event-time window, pruned by the commits' ts_range zone maps
        before any data file is opened. See ``cdc/changefeed.py``."""
        from .changefeed import changes as _changes

        return _changes(self, since=since, until=until, columns=columns,
                        before=before, min_ts=min_ts, max_ts=max_ts)

    def parts_overlapping_range(self, col: str, lo: int, hi: int,
                                as_of: Optional[int] = None) -> List[int]:
        """Lake partitions that MAY hold a live row with ``lo <= col <=
        hi``, from the per-commit zone maps alone (METADATA only — no data
        file opened). Soundness: every live value took effect via SOME
        commit whose zone map covered it (snapshot commits bound the whole
        folded state, delta commits bound their winner set), so a partition
        none of whose commits overlap the range cannot hold a matching
        live row. Pre-feature commit records (no ``zone_maps`` key at all)
        conservatively count as overlapping; a POST-feature record whose
        dict lacks ``col`` contributed no live value for it (all
        tombstones, all-null, or the column didn't exist yet — unified
        reads null-backfill those rows, and NULL never matches a range),
        so it prunes. O(P·epochs) small-json reads on the driver — the
        same cost the windowed change feed accepts."""
        out: List[int] = []
        # commit records keyed zone_maps by the name current at WRITE time
        # — consult every alias of a renamed column
        aliases = self._aliases(col)
        for part in range(self.num_partitions):
            epochs = self.committed_epochs(part)
            if as_of is not None:
                epochs = [e for e in epochs if e <= as_of]
            for e in epochs:
                maps = self._read_commit(part, e).get("zone_maps")
                if maps is None:  # pre-feature record: may hold anything
                    out.append(part)
                    break
                zm = next((maps[a] for a in aliases if a in maps), None)
                if zm is not None and zm[0] <= hi and zm[1] >= lo:
                    out.append(part)
                    break
        return out

    def read_range(self, col: str, lo: int, hi: int,
                   as_of: Optional[int] = None,
                   columns: Optional[List[str]] = None) -> "object":
        """Range-predicate scan of live state as a streaming Dataset —
        :meth:`read_dataset` with zone-map partition pruning up front and
        the exact inclusive filter inside each task. The index-free range
        path: the range index (rangeindex.py) answers from a follower
        keyspace in O(range/width) partition reads; this answers from
        commit metadata with no index maintenance at all — the
        Iceberg/Delta data-skipping model. Ints/timestamps only (the
        zone-map scope)."""
        import ray.data as _rd

        keep_parts = set(self.parts_overlapping_range(col, lo, hi, as_of))
        live_parts, target = self._unified_live(as_of)
        live_parts = [p for p in live_parts if p in keep_parts]
        if target is None or col not in target.names or not live_parts:
            return _rd.from_items([])
        if not (pa.types.is_integer(target.field(col).type)
                or pa.types.is_timestamp(target.field(col).type)):
            raise ValueError(
                f"read_range: column {col!r} is {target.field(col).type} — "
                f"zone maps cover int/timestamp columns only")
        if columns is not None:
            keep = self._projection(list(dict.fromkeys([*columns, col])),
                                    target.names)
            target = pa.schema([target.field(c) for c in keep])
        root, n_parts = self.root, self.num_partitions
        proj = None if columns is None else target.names

        def load(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            out = []
            for part in batch["part"].to_pylist():
                t = Lake(root, n_parts).read_partition(int(part), as_of,
                                                       columns=proj)
                if t is None or t.num_rows == 0:
                    continue
                t = live_view(unify_to_schema(t, target))
                c = t[col]
                if pa.types.is_timestamp(c.type):
                    c = c.cast(pa.int64())
                mask = _pc.and_kleene(_pc.greater_equal(c, lo),
                                      _pc.less_equal(c, hi))
                t = t.filter(_pc.fill_null(mask, False))
                if t.num_rows:
                    out.append(t)
            if not out:
                return target.empty_table()
            return pa.concat_tables(out)

        parts_ds = _rd.from_items([{"part": p} for p in live_parts])
        return parts_ds.map_batches(load, batch_format="pyarrow",
                                    batch_size=1)

    def _parts_matching_eq(self, col: str, values,
                           as_of: Optional[int]) -> Optional[set]:
        """Lake partitions that can hold a row matching ``col IN values``,
        from the column index (colindex.py) — None when no index exists
        (caller must process every partition; the inline filter stays
        exact either way). Distributed: index-partition reads map keys to
        lake partitions inside tasks; the driver sees ≤P tiny part ids."""
        from .colindex import ColumnIndex, col_index_root

        root = col_index_root(self.root, col)
        if not self.fs.exists(root):
            return None
        from .ingest import url_partition
        import numpy as np

        n = self.num_partitions

        def to_parts(t: pa.Table) -> pa.Table:
            keys = t["key"].to_pylist()
            if not keys:
                return pa.table({"part": pa.array([], pa.int32())})
            return pa.table({"part": pa.array(
                np.unique(url_partition(keys, n)).astype(np.int32))})

        hits = ColumnIndex(root).scan([str(v) for v in values], as_of=as_of)
        rows = hits.map_batches(to_parts,
                                batch_format="pyarrow").take_all()  # ≤ P·b
        return {int(r["part"]) for r in rows}

    def export_resumable(self, out: str, as_of: Optional[int] = None,
                         include_tombstones: bool = False,
                         partition_by: Optional[str] = None,
                         where_eq: Optional[Dict[str, List[str]]] = None,
                         where_range: Optional[Dict[str, tuple]] = None
                         ) -> List[Dict]:
        """RESUMABLE + INCREMENTAL partitioned export (the brief's
        resumable-output rule): one task per live partition writes
        ``out/part=NNNN.parquet`` atomically (temp+rename on local
        filesystems, single all-or-nothing PUT on object stores) — file
        existence therefore means COMPLETE — and STAMPS the file's parquet
        footer with the tip epoch it covers. A re-run therefore

        - skips partitions whose stamped epoch still equals the lake tip
          (crash resume AND cheap periodic refresh in one mechanism),
        - rewrites only partitions whose tip ADVANCED since the last export
          (incremental refresh: cost scales with churn, not lake size),
        - rewrites unstamped files (pre-stamp exports: can't prove currency).

        ``partition_by``: Hive-layout export — each lake partition's live
        rows split by the column's values into
        ``out/<col>=<val>/part=NNNN.parquet`` (the layout downstream
        training jobs read one language/domain slice of, with parquet
        dataset value pruning). Resume/refresh bookkeeping moves to a tiny
        per-lake-partition manifest (``out/_parts/part=NNNN.json``: tip
        epoch + file list) because the VALUE SET can churn between epochs:
        a rewrite deletes the manifest's now-stale value files, so a lang
        that vanished from a partition cannot leave a stale slice behind.
        Crash anywhere → next run sees a missing/old-tip manifest and
        rewrites that partition's value files (atomic each) before
        re-manifesting: convergent.

        ``where_eq`` ({col: [value, ...]}, string-canonical like the column
        index): export only rows matching EVERY term — the corpus-slicing
        op ("export the Korean docs"). Rows filter INSIDE each partition
        task (always exact); when a column index exists on a term, whole
        lake partitions holding no match are PRUNED up front (the first
        indexed term prunes; the filter keeps the rest exact). Resume
        stamps carry the predicate, so a re-run with a DIFFERENT predicate
        rewrites rather than wrongly skipping (and an unfiltered export
        never reuses a filtered file).

        ``where_range`` ({col: (lo, hi)}, inclusive, int/timestamp columns):
        range slicing — partitions whose commit ZONE MAPS provably hold no
        value in range are pruned up front (:meth:`parts_overlapping_range`,
        metadata only), the inclusive filter inside each task stays exact.
        ANDs with ``where_eq``; shares its predicate-stamped resume.

        Schema-unified like :meth:`read_dataset`; the driver handles
        partition ids and ≤P summary rows only."""
        import ray.data as _rd

        live_parts, target = self._unified_live(as_of)
        if target is None:
            return []
        if partition_by is not None and partition_by not in target.names:
            raise ValueError(f"partition_by column {partition_by!r} not in "
                             f"lake schema {target.names}")
        pred_tag = "" if not (where_eq or where_range) else json.dumps(
            {"eq": {c: sorted(str(v) for v in vs)
                    for c, vs in (where_eq or {}).items()},
             "range": {c: [int(r[0]), int(r[1])]
                       for c, r in (where_range or {}).items()}},
            sort_keys=True)
        # Pruned partitions are still VISITED (their result is provably
        # empty, so the task skips the data read entirely and writes the
        # empty slice): a predicate CHANGE must rewrite every partition's
        # file/manifest, else a partition pruned by the new predicate
        # would leave the OLD predicate's rows on disk.
        pruned_out: set = set()
        if where_eq:
            for col, vals in where_eq.items():
                pruned = self._parts_matching_eq(col, vals, as_of)
                if pruned is not None:
                    pruned_out |= {p for p in live_parts if p not in pruned}
                    break  # one index prunes; the inline filter stays exact
        if where_range:
            for col, (rlo, rhi) in where_range.items():
                keep = set(self.parts_overlapping_range(
                    col, int(rlo), int(rhi), as_of))
                pruned_out |= {p for p in live_parts if p not in keep}
        pruned_out = frozenset(pruned_out)
        root, n_parts = self.root, self.num_partitions
        _STAMP = b"odl_export_epoch"
        _PRED = b"odl_export_pred"

        def _apply_pred(t: pa.Table) -> pa.Table:
            if not (where_eq or where_range):
                return t
            for col, vals in (where_eq or {}).items():
                if col not in t.column_names:
                    return t.slice(0, 0)  # evolution: column absent = no match
                want = {str(v) for v in vals}
                svals = [None if x is None else str(x)
                         for x in t[col].to_pylist()]
                t = t.filter(pa.array([x in want for x in svals]))
            for col, (rlo, rhi) in (where_range or {}).items():
                if col not in t.column_names:
                    return t.slice(0, 0)
                import pyarrow.compute as _pc

                c = t[col]
                if pa.types.is_timestamp(c.type):
                    c = c.cast(pa.int64())
                mask = _pc.and_kleene(_pc.greater_equal(c, int(rlo)),
                                      _pc.less_equal(c, int(rhi)))
                t = t.filter(_pc.fill_null(mask, False))
            return t

        def _atomic_write(ofs, is_local: bool, t: pa.Table,
                          path: str) -> None:
            ofs.makedirs(posixpath.dirname(path), exist_ok=True)
            if is_local:
                tmp = path + f".tmp-{uuid.uuid4().hex}"
                pq.write_table(t, tmp, compression="zstd", filesystem=ofs)
                ofs.mv(tmp, path)
            else:
                pq.write_table(t, path, compression="zstd", filesystem=ofs)

        def hive_task(batch: pa.Table) -> pa.Table:
            from urllib.parse import quote

            ofs, _ = fsspec.core.url_to_fs(out)
            is_local = "file" in (ofs.protocol if isinstance(
                ofs.protocol, (list, tuple)) else (ofs.protocol,))
            lake = Lake(root, n_parts)
            parts, rows, tips, skipped = [], [], [], []
            for part in batch["part"].to_pylist():
                part = int(part)
                tip = lake.latest_epoch(part, as_of)
                mpath = posixpath.join(out, "_parts",
                                       f"part={part:04d}.json")
                old = None
                if ofs.exists(mpath):
                    with ofs.open(mpath, "rb") as f:
                        old = json.loads(f.read().decode())
                if old is not None and tip is not None \
                        and old.get("tip") == tip \
                        and old.get("pred", "") == pred_tag:
                    parts.append(part); rows.append(int(old["rows"]))
                    tips.append(tip); skipped.append(True)
                    continue
                if part in pruned_out:  # provably empty: no data read
                    t = target.empty_table()
                else:
                    t = lake.read_partition(part, as_of)
                    if t is None:
                        continue
                    t = unify_to_schema(t, target)
                    if not include_tombstones:
                        t = live_view(t)
                    t = _apply_pred(t)
                vals = [str(x) if x is not None else None
                        for x in t[partition_by].to_pylist()]
                written: List[str] = []
                for v in sorted(set(vals), key=lambda x: (x is None, x)):
                    mask = pa.array([x == v for x in vals])
                    sub = t.filter(mask)
                    leaf = ("__HIVE_DEFAULT_PARTITION__" if v is None
                            else quote(v, safe=""))
                    rel = posixpath.join(f"{partition_by}={leaf}",
                                         f"part={part:04d}.parquet")
                    _atomic_write(ofs, is_local, sub,
                                  posixpath.join(out, rel))
                    written.append(rel)
                for rel in (old or {}).get("files", []):
                    if rel not in written:  # value vanished: drop the slice
                        stale = posixpath.join(out, rel)
                        if ofs.exists(stale):
                            ofs.rm_file(stale)
                ofs.makedirs(posixpath.join(out, "_parts"), exist_ok=True)
                manifest = json.dumps({"tip": tip, "rows": t.num_rows,
                                       "pred": pred_tag,
                                       "files": written}).encode()
                if is_local:
                    tmpm = mpath + f".tmp-{uuid.uuid4().hex}"
                    with ofs.open(tmpm, "wb") as f:
                        f.write(manifest)
                    ofs.mv(tmpm, mpath)
                else:
                    with ofs.open(mpath, "wb") as f:
                        f.write(manifest)
                parts.append(part); rows.append(t.num_rows)
                tips.append(tip); skipped.append(False)
            return pa.table({"part": pa.array(parts, pa.int32()),
                             "rows": pa.array(rows, pa.int64()),
                             "tip_epoch": pa.array(tips, pa.int64()),
                             "skipped": pa.array(skipped, pa.bool_())})

        def task(batch: pa.Table) -> pa.Table:
            ofs, _ = fsspec.core.url_to_fs(out)
            is_local = "file" in (ofs.protocol if isinstance(
                ofs.protocol, (list, tuple)) else (ofs.protocol,))
            lake = Lake(root, n_parts)
            parts, rows, tips, skipped = [], [], [], []
            for part in batch["part"].to_pylist():
                part = int(part)
                tip = lake.latest_epoch(part, as_of)
                path = posixpath.join(out, f"part={part:04d}.parquet")
                if ofs.exists(path):
                    meta = pq.read_metadata(path, filesystem=ofs)
                    kv = meta.metadata or {}
                    stamped = kv.get(_STAMP)
                    if stamped is not None and tip is not None \
                            and int(stamped) == tip \
                            and kv.get(_PRED, b"").decode() == pred_tag:
                        parts.append(part)
                        rows.append(meta.num_rows)
                        tips.append(tip)
                        skipped.append(True)
                        continue
                if part in pruned_out:  # provably empty: no data read
                    t = target.empty_table()
                else:
                    t = lake.read_partition(part, as_of)
                    if t is None:
                        continue
                    t = unify_to_schema(t, target)
                    if not include_tombstones:
                        t = live_view(t)
                    t = _apply_pred(t)
                t = t.replace_schema_metadata(
                    {**(t.schema.metadata or {}),
                     _STAMP: str(tip).encode(),
                     _PRED: pred_tag.encode()})
                ofs.makedirs(out, exist_ok=True)
                if is_local:
                    tmp = path + f".tmp-{uuid.uuid4().hex}"
                    pq.write_table(t, tmp, compression="zstd",
                                   filesystem=ofs)
                    ofs.mv(tmp, path)
                else:
                    pq.write_table(t, path, compression="zstd",
                                   filesystem=ofs)
                parts.append(part)
                rows.append(t.num_rows)
                tips.append(tip)
                skipped.append(False)
            return pa.table({"part": pa.array(parts, pa.int32()),
                             "rows": pa.array(rows, pa.int64()),
                             "tip_epoch": pa.array(tips, pa.int64()),
                             "skipped": pa.array(skipped, pa.bool_())})

        parts_ds = _rd.from_items([{"part": p} for p in live_parts])
        return parts_ds.map_batches(
            hive_task if partition_by is not None else task,
            batch_format="pyarrow", batch_size=1).take_all()  # ≤ P rows

    def partition_files(self, as_of: Optional[int] = None) -> List[str]:
        """Latest committed (and still-present) snapshot file per partition —
        the input list for a ``ray.data.read_parquet`` over current state
        (pass ``filesystem=lake.fs`` for non-local roots). Raises if a
        partition's current state lives in un-compacted deltas: a silent
        stale read is worse than an explicit "compact() first". For
        delta-mode lakes use :meth:`read_dataset` (distributed
        merge-on-read, no compact required)."""
        files = []
        for part in range(self.num_partitions):
            epochs = self.committed_epochs(part)
            if as_of is not None:
                epochs = [e for e in epochs if e <= as_of]
            chosen = None
            for i in range(len(epochs) - 1, -1, -1):
                res = self.resolve_data(part, epochs[i], "snap")
                if res is not None:
                    chosen = i
                    chosen_path = res[1]
                    break
            if chosen is None:
                if any(self.resolve_data(part, e, "delta") is not None
                       for e in epochs):
                    raise ValueError(
                        f"partition {part}: state is delta-only — run "
                        f"Lake.compact() before snapshot-file reads")
                continue
            if any(self.resolve_data(part, e, "delta") is not None
                   for e in epochs[chosen + 1:]):
                raise ValueError(
                    f"partition {part}: deltas newer than snapshot "
                    f"epoch={epochs[chosen]} — run Lake.compact() before "
                    f"snapshot-file reads")
            files.append(chosen_path)
        return files

    def lookup(self, urls: List[str], as_of: Optional[int] = None,
               include_tombstones: bool = False) -> Optional[pa.Table]:
        """Point reads: hash-route each url to its partition and perform the
        merge-on-read fold for ONLY those partitions — O(|urls|) partition
        reads regardless of lake size (the url-hash partitioning IS the
        index). Returns the current (or ``as_of``) row per found url; urls
        never ingested (or tombstoned, unless ``include_tombstones``) are
        simply absent. None when nothing matches."""
        import numpy as np
        import pyarrow.compute as pc

        from .ingest import url_partition  # runtime import: ingest ← lake

        parts = url_partition(np.array(urls, dtype=object),
                              self.num_partitions)
        by_part: Dict[int, List[str]] = {}
        for url, part in zip(urls, parts):
            by_part.setdefault(int(part), []).append(url)
        out = []
        for part in sorted(by_part):
            # url pushdown: row-group-pruned scan of the target partition
            # (is_in re-filter kept: pushdown is row-group-granular)
            t = self.read_partition(part, as_of, url_filter=by_part[part])
            if t is None or t.num_rows == 0:
                continue
            sub = t.filter(pc.is_in(t["url"],
                                    value_set=pa.array(by_part[part])))
            if not include_tombstones:
                sub = live_view(sub)
            if sub.num_rows:
                out.append(sub)
        if not out:
            return None
        return pa.concat_tables(out).sort_by([("url", "ascending")])

    def purge(self, urls: List[str]) -> Dict:
        """Right-to-be-forgotten: physically remove the given urls from
        EVERY data file (snapshots and deltas, all epochs) of their
        partitions, so no read at ANY ``as_of`` returns them again. A
        content-rewriting maintenance op like compact/vacuum: idempotent
        (re-purging removed urls rewrites nothing) and crash-safe (each file
        is replaced via the atomic-write path — readers see old-complete or
        new-complete bytes, never partial). Commit records are NOT touched:
        lineage counters describe the historical ingest, which did happen.
        An audit record holding url HASHES only (never the urls — that would
        defeat the purpose) is written to the commit log.

        Scope: committed state only. Events still pending in the source log
        (or ingested into a DIFFERENT keyspace, e.g. the fpindex) are the
        caller's to handle; a NEW event for a purged url re-inserts it —
        purge erases history, it does not ban the key."""
        import hashlib

        import numpy as np
        import pyarrow.compute as pc

        from .ingest import url_partition  # runtime import: ingest ← lake

        parts = url_partition(np.array(urls, dtype=object),
                              self.num_partitions)
        by_part: Dict[int, List[str]] = {}
        for url, part in zip(urls, parts):
            by_part.setdefault(int(part), []).append(url)
        files_rewritten = rows_removed = 0
        for part, part_urls in sorted(by_part.items()):
            value_set = pa.array(part_urls)
            try:
                names = sorted(self.fs.ls(self._part_dir(part), detail=False))
            except FileNotFoundError:
                names = []
            for full in names:
                name = posixpath.basename(full)
                if not (name.startswith(("epoch=", "delta="))
                        and name.endswith(".parquet")):
                    continue
                t = pq.read_table(full, filesystem=self.fs)
                mask = pc.is_in(t["url"], value_set=value_set)
                hits = int(pc.sum(mask.cast(pa.int64())).as_py() or 0)
                if not hits:
                    continue  # idempotence: untouched files stay byte-stable
                self._write_table_atomic(t.filter(pc.invert(mask)), full)
                files_rewritten += 1
                rows_removed += hits
            if self.parent_root is None:
                continue
            # branch lakes: SHADOW parent-held history instead of rewriting
            # it (the parent and sibling branches still own those bytes —
            # purging a branch must not purge them). A local file with the
            # same (part, epoch, kind) name wins resolution, so writing the
            # filtered copy locally erases the urls from every read of THIS
            # lake at any as_of while leaving the parent untouched.
            for epoch in self.committed_epochs(part):
                if epoch > self.fork_epoch:
                    continue  # local history: handled by the loop above
                for kind, local in (("snap", self._data_path(part, epoch)),
                                    ("delta", self._delta_path(part, epoch))):
                    if self.fs.exists(local):
                        continue  # already shadowed → scrubbed above
                    res = self.resolve_data(part, epoch, kind)
                    if res is None:
                        continue
                    rfs, rpath = res
                    t = pq.read_table(rpath, filesystem=rfs)
                    mask = pc.is_in(t["url"], value_set=value_set)
                    hits = int(pc.sum(mask.cast(pa.int64())).as_py() or 0)
                    if not hits:
                        continue  # no shadow needed: resolution stays shared
                    self.fs.makedirs(self._part_dir(part), exist_ok=True)
                    self._write_table_atomic(t.filter(pc.invert(mask)), local)
                    files_rewritten += 1
                    rows_removed += hits
        audit = {
            "op": "purge",
            "url_hashes": sorted(hashlib.sha256(u.encode()).hexdigest()
                                 for u in urls),
            "files_rewritten": files_rewritten,
            "rows_removed": rows_removed,
        }
        batch_id = hashlib.sha256(
            "".join(audit["url_hashes"]).encode()).hexdigest()[:16]
        self._write_small_atomic(
            posixpath.join(self._commits_dir(), f"purge-{batch_id}.json"),
            json.dumps(audit).encode())
        return audit

    def drop_column(self, col: str) -> Dict:
        """Subtractive schema evolution: physically remove a payload column
        from EVERY data file (snapshots and deltas, all epochs) — the
        column-level right-to-be-forgotten, and the inverse of the additive
        null-backfill rule (a column mistakenly ingested corpus-wide cannot
        be removed by any forward epoch: schema unification would resurrect
        it as nulls forever). A content-rewriting maintenance op like
        ``purge``: idempotent (files without the column stay byte-stable),
        crash-safe (atomic per-file replace), commit records keep their
        lineage but their ``zone_maps`` entry for the column is scrubbed
        (stale pruning metadata must not name a ghost column). Branch lakes
        SHADOW parent-held files with the projected copy (the parent and
        sibling branches keep the column); dropping on a PARENT drops it
        for delegating branches too — the purge convention.

        Guards: version-key/meta columns are refused; a column/range index
        on the column is refused (delete the index first — its keyspace
        would silently go stale). An audit record lands in the commit
        log."""
        import hashlib

        if col in self._MERGE_COLS or is_internal_col(col):
            raise ValueError(f"drop_column: {col!r} is a version-key/meta "
                             f"column — the merge cannot run without it")
        # index guards incl. text/trigram/vector coverage (ADVICE r3) —
        # shared with rename_column
        self._guard_indexed_column(col, op="drop_column")
        # dropping a RENAMED column must also drop its historical names
        # (files keep the name current at write time) and retire the
        # rename-log entries that resolve to it
        rmap = self.rename_map()
        aliases = set(self._aliases(col, rmap))
        orig_renames = self.list_renames()
        kept = [r for r in orig_renames
                if rmap.get(r["from"], r["from"]) != col]
        # NOTE: the pruned renames.json is written AFTER the rewrite loops
        # below (ADVICE r4): scrubbing the translation map first would, on a
        # crash mid-rewrite, leave surviving files holding a historical name
        # the resumed run can no longer alias — the old name would resurrect
        # as a null-backfilled twin column forever. The rewrite is idempotent
        # (files without the column stay byte-stable), so resuming with the
        # intact map is always safe.
        files_rewritten = 0
        for part in range(self.num_partitions):
            try:
                names = sorted(self.fs.ls(self._part_dir(part),
                                          detail=False))
            except FileNotFoundError:
                names = []
            for full in names:
                name = posixpath.basename(full)
                if not (name.startswith(("epoch=", "delta="))
                        and name.endswith(".parquet")):
                    continue
                fnames = pq.read_schema(full, filesystem=self.fs).names
                hit = [a for a in aliases if a in fnames]
                if not hit:
                    continue  # idempotence: untouched files stay stable
                t = pq.read_table(full, filesystem=self.fs)
                self._write_table_atomic(t.drop_columns(hit), full)
                files_rewritten += 1
            if self.parent_root is not None:
                # shadow parent history (purge convention): a local file
                # with the same name wins resolution for THIS lake only
                for epoch in self.committed_epochs(part):
                    if epoch > self.fork_epoch:
                        continue
                    for kind, local in (
                            ("snap", self._data_path(part, epoch)),
                            ("delta", self._delta_path(part, epoch))):
                        if self.fs.exists(local):
                            continue
                        res = self.resolve_data(part, epoch, kind)
                        if res is None:
                            continue
                        rfs, rpath = res
                        rnames = pq.read_schema(rpath,
                                                filesystem=rfs).names
                        rhit = [a for a in aliases if a in rnames]
                        if not rhit:
                            continue
                        t = pq.read_table(rpath, filesystem=rfs)
                        self.fs.makedirs(self._part_dir(part),
                                         exist_ok=True)
                        self._write_table_atomic(t.drop_columns(rhit),
                                                 local)
                        files_rewritten += 1
            # scrub stale zone-map entries naming the dropped column
            for epoch in self.committed_epochs(part):
                cpath = self._commit_path(part, epoch)
                if not self.fs.exists(cpath):
                    continue  # delegated (branch) commit record
                rec = self._read_commit(part, epoch)
                zm = rec.get("zone_maps")
                if zm and any(a in zm for a in aliases):
                    for a in aliases:
                        zm.pop(a, None)
                    self._write_small_atomic(cpath,
                                             json.dumps(rec).encode())
        # all alias-aware rewrites + zone-map scrubs done: NOW retire the
        # rename-log entries that resolved to the dropped column
        if len(kept) != len(orig_renames):
            self._write_small_atomic(
                self._renames_path(),
                json.dumps({"renames": kept}).encode())
        audit = {"op": "drop_column", "column": col,
                 "files_rewritten": files_rewritten}
        batch_id = hashlib.sha256(col.encode()).hexdigest()[:16]
        self._write_small_atomic(
            posixpath.join(self._commits_dir(),
                           f"dropcol-{batch_id}.json"),
            json.dumps(audit).encode())
        return audit

    def read_state(self, as_of: Optional[int] = None, include_tombstones: bool = False) -> pa.Table:
        """Whole-lake state as ONE pyarrow table (tests / small lakes only —
        big lakes should use partition_files() + ray.data.read_parquet).
        Unifies evolved schemas across partitions with null backfill."""
        tables = []
        for part in range(self.num_partitions):
            t = self.read_partition(part, as_of)
            if t is not None and t.num_rows:
                tables.append(t)
        if not tables:
            return pa.table({})
        schema = tables[0].schema
        for t in tables[1:]:
            schema = unified_schema(schema, t.schema)
        merged = pa.concat_tables([unify_to_schema(t, schema) for t in tables])
        merged = merged.sort_by([("url", "ascending")])
        return merged if include_tombstones else live_view(merged)

    # ------------------------------------------------------------------ commit
    def _guard_fork_epoch(self, epoch: int) -> None:
        """Branch lakes: epochs ≤ fork are the PARENT's history — immutable
        here (a write would shadow shared files with divergent content and
        silently corrupt time travel). New work on a branch starts at
        fork + 1."""
        if self.parent_root is not None and epoch <= self.fork_epoch:
            raise ValueError(
                f"epoch {epoch} ≤ branch fork {self.fork_epoch}: pre-fork "
                f"history is immutable on a branch (of {self.parent_root}) "
                f"— commit epochs > {self.fork_epoch}")

    def commit_partition(self, part: int, epoch: int, table: pa.Table,
                         lineage: Lineage) -> Lineage:
        """Write data, then publish the commit record; no-op if (part, epoch)
        already committed. The commit-record existence check is the commit
        point (object-store safe; no rename required)."""
        self._guard_fork_epoch(epoch)
        if self.is_committed(part, epoch):
            prior = self.read_lineage(part, epoch)
            prior.skipped = True
            return prior
        self.fs.makedirs(self._part_dir(part), exist_ok=True)
        # zstd: ~3× smaller snapshots; the (de)compression cpu is spent inside
        # the parallel partition tasks, where it scales with the cluster,
        # unlike raw disk bandwidth. Deterministic content → concurrent
        # retried writers produce byte-identical files.
        pq.write_table(table, self._data_path(part, epoch), compression="zstd",
                       filesystem=self.fs)
        if self.is_committed(part, epoch):  # lost the publish race to a retry
            prior = self.read_lineage(part, epoch)
            prior.skipped = True
            return prior
        record = asdict(lineage)
        rng = _ts_range_of(table)
        if rng is not None:  # event-time zone map (changefeed pruning)
            record["ts_range"] = rng
        # per-column zone maps (predicate-scan pruning) — written even when
        # empty: key presence means "post-feature, contributes nothing"
        record["zone_maps"] = _zone_maps_of(table)
        self._write_small_atomic(self._commit_path(part, epoch),
                                 json.dumps(record).encode())
        return lineage

    def commit_delta(self, part: int, epoch: int, winners: pa.Table,
                     lineage: Lineage) -> Lineage:
        """Delta commit: write ONLY this epoch's LWW winner set (tombstones
        included) — no base read, no partition rewrite. Same commit protocol
        as commit_partition; readers fold deltas onto the newest snapshot."""
        self._guard_fork_epoch(epoch)
        lineage.kind = "delta"
        if self.is_committed(part, epoch):
            prior = self.read_lineage(part, epoch)
            prior.skipped = True
            return prior
        self.fs.makedirs(self._part_dir(part), exist_ok=True)
        pq.write_table(winners, self._delta_path(part, epoch),
                       compression="zstd", filesystem=self.fs)
        if self.is_committed(part, epoch):  # lost the publish race to a retry
            prior = self.read_lineage(part, epoch)
            prior.skipped = True
            return prior
        record = asdict(lineage)
        # url Bloom rides in the commit record (not the Lineage dataclass):
        # point lookups prune delta files by it; absent on non-url keyspaces
        # (e.g. the fp index) and on records written by older code
        if "url" in winners.column_names:
            record["url_bloom"] = _bloom_of_urls(winners["url"].to_pylist())
        rng = _ts_range_of(winners)
        if rng is not None:  # event-time zone map (changefeed pruning)
            record["ts_range"] = rng
        # per-column zone maps (predicate-scan pruning) — written even when
        # empty: key presence means "post-feature, contributes nothing"
        record["zone_maps"] = _zone_maps_of(winners)
        self._write_small_atomic(self._commit_path(part, epoch),
                                 json.dumps(record).encode())
        return lineage

    def compact(self, parts: Optional[List[int]] = None) -> int:
        """Materialize merge-on-read state as a snapshot file at each
        partition's newest committed epoch. No new commit record: a snapshot
        file is a cached view of already-committed history, so compaction is
        idempotent, crash-safe and safe to run concurrently with readers
        (deterministic content → any concurrent writer produces identical
        bytes). Returns the number of partitions compacted."""
        done = 0
        for part in (parts if parts is not None else range(self.num_partitions)):
            epochs = self.committed_epochs(part)
            if not epochs:
                continue
            newest = epochs[-1]
            if self.resolve_data(part, newest, "snap") is not None:
                continue  # already a snapshot at the tip (possibly parent's)
            state = self.read_partition(part, internal=True)
            if state is None:
                continue
            self.fs.makedirs(self._part_dir(part), exist_ok=True)
            self._write_table_atomic(state, self._data_path(part, newest))
            done += 1
        return done

    def delta_chains(self) -> Dict[int, int]:
        """Per-partition merge-on-read chain length (committed deltas newer
        than the newest snapshot) — metadata-only (listings + exists), the
        auto-compaction trigger signal."""
        out: Dict[int, int] = {}
        for part in range(self.num_partitions):
            epochs = self.committed_epochs(part)
            if not epochs:
                continue
            newest_snap = -1
            for e in epochs:
                if self.resolve_data(part, e, "snap") is not None:
                    newest_snap = e
            out[part] = sum(
                1 for e in epochs if e > newest_snap
                and self.resolve_data(part, e, "delta") is not None)
        return out

    def compact_distributed(self, parts: Optional[List[int]] = None) -> int:
        """Distributed :meth:`compact`: one Ray task per partition performs
        ITS merge-on-read fold + snapshot write — at 100 TB the driver must
        never fold partitions itself (the driver-side ``compact`` stays for
        libraries/tests and as the per-partition worker here). Same
        idempotence/crash-safety: snapshot content is deterministic and the
        atomic write publishes complete bytes or nothing."""
        import ray.data as _rd

        root, n = self.root, self.num_partitions
        todo = list(parts) if parts is not None else list(range(n))
        if not todo:
            return 0

        def task(batch: pa.Table) -> pa.Table:
            lake = Lake(root, n)
            done = sum(lake.compact([int(p)])
                       for p in batch["part"].to_pylist())
            return pa.table({"done": pa.array([done], pa.int64())})

        out = _rd.from_items([{"part": p} for p in todo]).map_batches(
            task, batch_format="pyarrow", batch_size=1).take_all()  # ≤ P
        return int(sum(r["done"] for r in out))

    def _sweep_tmp(self, part: int) -> None:
        """Reclaim staging files a crashed atomic write left behind (they
        are invisible to readers — only ``epoch=*.parquet`` names are).
        Called from vacuum (a maintenance op), NOT compact, so a sweep never
        races a concurrent compactor's in-flight staging file."""
        try:
            names = self.fs.ls(self._part_dir(part), detail=False)
        except FileNotFoundError:
            return
        for full in names:
            if ".tmp-" in posixpath.basename(full):
                try:
                    self.fs.rm_file(full)
                except OSError:
                    pass

    def _read_commit(self, part: int, epoch: int) -> Dict:
        try:
            with self.fs.open(self._commit_path(part, epoch), "rb") as f:
                return json.loads(f.read().decode())
        except FileNotFoundError:
            parent = self._parent()
            if parent is not None and epoch <= self.fork_epoch:
                return parent._read_commit(part, epoch)
            raise

    _LINEAGE_FIELDS = None  # lazily-built field-name set

    def read_lineage(self, part: int, epoch: int) -> Lineage:
        if Lake._LINEAGE_FIELDS is None:
            Lake._LINEAGE_FIELDS = {f.name for f in fields(Lineage)}
        rec = self._read_commit(part, epoch)
        return Lineage(**{k: v for k, v in rec.items()
                          if k in Lake._LINEAGE_FIELDS})

    def vacuum(self, keep_snapshots: int = 1) -> int:
        """Remove superseded data files, keeping the latest ``keep_snapshots``
        SNAPSHOT files per partition plus every delta newer than the newest
        kept snapshot (those deltas ARE the current state — merge-on-read
        needs them). Deltas at or below the newest snapshot epoch are folded
        into it and reclaimed. Commit records (lineage) are always kept —
        history stays auditable, only data-file storage is reclaimed.

        Registered BRANCHES and TAGS pin files: for every fork epoch F
        (and every tagged epoch T) the newest local snapshot ≤ F plus the
        deltas in (that snapshot, F] are kept, whatever ``keep_snapshots``
        says — a branch forked at F (a ``restore`` / as-of read at T)
        reconstructs its state from exactly those files, so maintenance can
        never orphan it. Only LOCAL files are ever deleted: a branch's own
        vacuum cannot touch the parent's storage by construction.

        Safe anytime. Returns number of files removed."""
        removed = 0
        forks = sorted({int(b["fork_epoch"]) for b in self.branches()}
                       | set(self.list_tags().values()))
        for part in range(self.num_partitions):
            self._sweep_tmp(part)
            epochs = self.committed_epochs(part)
            snap_epochs = [e for e in epochs
                           if self.fs.exists(self._data_path(part, e))]
            keep = set(snap_epochs[-keep_snapshots:]) if keep_snapshots \
                else set()
            prot_deltas = set()
            for fork in forks:
                base = max((e for e in snap_epochs if e <= fork),
                           default=None)
                if base is not None:
                    keep.add(base)
                lo = base if base is not None else -1
                prot_deltas.update(e for e in epochs if lo < e <= fork)
            for epoch in snap_epochs:
                if epoch not in keep:
                    self.fs.rm_file(self._data_path(part, epoch))
                    removed += 1
            if keep:
                newest_snap = max(keep)
                for epoch in epochs:
                    dpath = self._delta_path(part, epoch)
                    if epoch <= newest_snap and epoch not in prot_deltas \
                            and self.fs.exists(dpath):
                        self.fs.rm_file(dpath)
                        removed += 1
        return removed

    def reconstruction_gaps(self, as_of: int) -> List[str]:
        """Metadata-only check that ``read_partition(part, as_of)`` can
        actually rebuild epoch ``as_of`` in every partition: the newest
        surviving snapshot ≤ as_of is the base, and every committed epoch
        after it (≤ as_of) must still have its delta file. Returns the
        missing pieces (empty = reconstructable). Used by :meth:`set_tag`
        (refuse naming a state no reader can rebuild — ADVICE r3) and
        ``verify(deep=True)`` (flag tags orphaned by a later vacuum)."""
        gaps: List[str] = []
        for part in range(self.num_partitions):
            epochs = [e for e in self.committed_epochs(part) if e <= as_of]
            if not epochs:
                continue
            snaps = [e for e in epochs
                     if self.resolve_data(part, e, "snap") is not None]
            base = max(snaps) if snaps else -1
            for e in epochs:
                if e > base and self.resolve_data(part, e, "delta") is None:
                    gaps.append(f"part {part} epoch {e}: no surviving "
                                f"snapshot covers it and its delta file "
                                f"is gone")
        return gaps

    def verify(self, deep: bool = False) -> Dict:
        """fsck for the lake: audit commit-log ↔ data-file consistency.

        Invariants checked per partition (all derivable from the commit
        protocol — a healthy lake can NEVER violate them, whatever mix of
        crashes, retries, delta commits, compaction and vacuum produced it):

        - every commit record parses and matches its filename's (part, epoch);
        - the partition's current state is READABLE: some snapshot exists,
          and every committed epoch newer than the newest snapshot has its
          delta file (vacuum only reclaims folded/superseded files);
        - ``deep``: the newest snapshot parquet opens, urls are sorted and
          unique, and the tombstone column is present.

        Data/delta files with no commit record are reported as benign
        ``orphans`` (crash leftovers before the commit point — invisible to
        readers, reclaimable). Returns ``{"ok", "issues", "orphans",
        "partitions", "commits"}``; ``ok`` ignores orphans."""
        issues: List[str] = []
        orphans: List[str] = []
        n_commits = 0
        for name, epoch in sorted(self.list_tags().items()):
            if not self.is_epoch_complete(epoch):
                issues.append(f"tag {name!r}: epoch {epoch} has no "
                              f"done/maint marker — dangling savepoint")
            elif deep:
                for gap in self.reconstruction_gaps(epoch):
                    issues.append(f"tag {name!r}: epoch {epoch} not "
                                  f"reconstructable — {gap}")
        for part in range(self.num_partitions):
            epochs = []
            for epoch in self.committed_epochs(part):
                n_commits += 1
                try:
                    lin = self.read_lineage(part, epoch)
                    if lin.part != part or lin.epoch != epoch:
                        issues.append(
                            f"part {part} epoch {epoch}: lineage names "
                            f"(part={lin.part}, epoch={lin.epoch})")
                except Exception as exc:  # unparseable record
                    issues.append(f"part {part} epoch {epoch}: bad commit "
                                  f"record ({exc})")
                epochs.append(epoch)
            if not epochs:
                continue
            snaps = [e for e in epochs
                     if self.resolve_data(part, e, "snap") is not None]
            # readability: merge-on-read folds deltas onto the newest
            # snapshot ≤ each epoch (or onto the empty base when none) —
            # every committed epoch AFTER the newest snapshot must still
            # have its delta file; vacuum never reclaims those. Branch
            # lakes resolve parent files for epochs ≤ fork.
            newest_snap = max(snaps) if snaps else -1
            missing = [e for e in epochs if e > newest_snap
                       and self.resolve_data(part, e, "delta") is None]
            if not snaps and len(missing) == len(epochs):
                issues.append(f"part {part}: committed epochs {epochs} "
                              f"but no data files at all")
                continue
            for e in missing:
                issues.append(f"part {part} epoch {e}: committed after "
                              f"snapshot {newest_snap} but delta file "
                              f"missing — state unreadable")
            if deep and snaps:
                try:
                    sfs, spath = self.resolve_data(part, newest_snap, "snap")
                    snames = pq.read_schema(spath, filesystem=sfs).names
                    rmap = self.rename_map()
                    translated = [rmap.get(n, n) for n in snames]
                    if len(set(translated)) != len(translated):
                        issues.append(
                            f"part {part}: rename-map collision — snapshot "
                            f"holds both a historical and the current name")
                    t = pq.read_table(spath, filesystem=sfs)
                    urls = t["url"].to_pylist()
                    if urls != sorted(urls):
                        issues.append(f"part {part}: snapshot not "
                                      f"url-sorted")
                    if len(set(urls)) != len(urls):
                        issues.append(f"part {part}: duplicate urls in "
                                      f"snapshot")
                    if "deleted" not in t.column_names:
                        issues.append(f"part {part}: tombstone column "
                                      f"missing")
                except Exception as exc:
                    issues.append(f"part {part}: snapshot unreadable "
                                  f"({exc})")
            # orphan scan: data files without commit records
            try:
                for full in self.fs.ls(self._part_dir(part), detail=False):
                    name = posixpath.basename(full)
                    for prefix in ("epoch=", "delta="):
                        if name.startswith(prefix) and name.endswith(".parquet"):
                            e = int(name[len(prefix):-len(".parquet")])
                            if not self.is_committed(part, e):
                                orphans.append(f"part {part}: {name}")
            except FileNotFoundError:
                pass
        return {"ok": not issues, "issues": issues, "orphans": orphans,
                "partitions": self.num_partitions, "commits": n_commits}

    def stats(self) -> Dict:
        """Partition skew / size diagnostics from METADATA only (file sizes
        via fs listing, row counts via parquet footers — no data read): the
        ops signal for when to ``rescale`` (hot partitions), ``compact``
        (long delta chains) or ``vacuum`` (superseded bytes). O(P·files)
        driver work, independent of data size."""
        per_part = []
        commits_total = commits_with_ts = commits_with_zm = 0
        zm_cols: set = set()
        for part in range(self.num_partitions):
            epochs = self.committed_epochs(part)
            for e in epochs:
                commits_total += 1
                rec = self._read_commit(part, e)
                if rec.get("ts_range") is not None:
                    commits_with_ts += 1
                zm = rec.get("zone_maps")
                if zm is not None:
                    commits_with_zm += 1
                    zm_cols.update(zm)
            snaps = deltas = data_bytes = 0
            tip_rows = 0
            chain = 0  # deltas newer than the newest snapshot
            newest_snap = -1
            for e in epochs:
                if self.resolve_data(part, e, "snap") is not None:
                    newest_snap = e
            for e in epochs:
                for kind in ("snap", "delta"):
                    res = self.resolve_data(part, e, kind)
                    if res is None:
                        continue
                    rfs, path = res
                    info = rfs.info(path)
                    data_bytes += int(info.get("size", 0))
                    meta = pq.read_metadata(path, filesystem=rfs)
                    if kind == "snap":
                        snaps += 1
                        if e == newest_snap:
                            tip_rows = meta.num_rows
                    else:
                        deltas += 1
                        if e > newest_snap:
                            chain += 1
                            tip_rows += meta.num_rows  # upper bound (LWW fold dedups)
            per_part.append({"part": part, "epochs": len(epochs),
                             "snapshots": snaps, "deltas": deltas,
                             "delta_chain": chain, "bytes": data_bytes,
                             "rows_upper_bound": tip_rows})
        sizes = [p["bytes"] for p in per_part if p["epochs"]]
        mean = (sum(sizes) / len(sizes)) if sizes else 0.0
        extra = {}
        if self.parent_root is not None:
            extra["parent"] = self.parent_root
            extra["fork_epoch"] = self.fork_epoch
        br = self.branches()
        if br:
            extra["branches"] = br
        tags = self.list_tags()
        if tags:
            extra["tags"] = tags
        renames = self.list_renames()
        if renames:
            extra["renames"] = renames
        return {
            **extra,
            "partitions": self.num_partitions,
            "live_partitions": len(sizes),
            "total_bytes": sum(sizes),
            "mean_partition_bytes": mean,
            "max_partition_bytes": max(sizes) if sizes else 0,
            "skew_ratio": (max(sizes) / mean) if mean else 0.0,
            "max_delta_chain": max((p["delta_chain"] for p in per_part),
                                   default=0),
            # fraction of commits carrying the event-time zone map — 1.0
            # means every windowed changefeed read can prune; < 1.0 means
            # pre-feature commits are conservatively processed
            "ts_range_coverage": (commits_with_ts / commits_total)
            if commits_total else 0.0,
            # per-column zone maps (predicate-scan pruning): fraction of
            # commits carrying one, and which columns are covered
            "zone_map_coverage": (commits_with_zm / commits_total)
            if commits_total else 0.0,
            "zone_map_cols": sorted(zm_cols),
            "hottest": sorted(per_part, key=lambda p: -p["bytes"])[:5],
        }

    def all_lineage(self) -> List[Dict]:
        out = []
        try:
            names = sorted(self.fs.ls(self._commits_dir(), detail=False))
        except FileNotFoundError:
            return []
        for full in names:
            name = posixpath.basename(full)
            if name.startswith("part-") and name.endswith(".json"):
                with self.fs.open(full, "rb") as f:
                    out.append(json.loads(f.read().decode()))
        return out
