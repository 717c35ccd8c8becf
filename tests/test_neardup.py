"""Near-dup-at-ingest tests (cdc/neardup.py): SimHash band index —
attribution vs an exhaustive sequential reference, epoch-chunking
invariance, exactly-once replay, and CDC-ingest integration."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc import NearDupIndex, near_index_root, replay
from opendataloader_pdf_ray.config import CDCConfig
from opendataloader_pdf_ray.functions.dedup import SimHasher

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron",
         "pi", "rho", "sigma", "tau", "upsilon"]


def corpus_table(n: int = 50) -> pa.Table:
    """n base rows + exact mirrors (every 7th) + near mirrors (every 5th,
    two words appended → small Hamming perturbation)."""
    rng = np.random.RandomState(11)
    rows = []
    base = []
    for i in range(n):
        t = " ".join(rng.choice(WORDS, size=30))
        base.append(t)
        rows.append((f"u{i:03d}", 1_000_000 + len(rows), len(rows), t))
    for i in range(0, n, 7):
        rows.append((f"m{i:03d}", 1_000_000 + len(rows), len(rows), base[i]))
    for i in range(0, n, 5):
        rows.append((f"n{i:03d}", 1_000_000 + len(rows), len(rows),
                     base[i] + " tail marker"))
    return pa.table({
        "key": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "seq": pa.array([r[2] for r in rows], pa.int64()),
        "text": pa.array([r[3] for r in rows], pa.string()),
    })


def sequential_owner(table: pa.Table, max_hamming: int = 3) -> dict:
    """Exhaustive reference: per row, earliest (ts, seq, key) among ALL rows
    within Hamming ≤ h of its signature (self included → None)."""
    h = SimHasher(ngram=2)
    rows = [r for r in table.to_pylist() if r["text"] is not None]
    sigs = [h.sig(r["text"]) for r in rows]
    out = {}
    for i, r in enumerate(rows):
        neigh = [(rows[j]["ts"], rows[j]["seq"], rows[j]["key"])
                 for j in range(len(rows))
                 if bin(sigs[i] ^ sigs[j]).count("1") <= max_hamming]
        own = min(neigh)[2]
        out[r["key"]] = own if own != r["key"] else None
    return out


def ds_of(table: pa.Table, blocks: int = 4):
    import ray.data

    return ray.data.from_arrow(table).repartition(blocks)


def new_index(root, **kw) -> NearDupIndex:
    return NearDupIndex(str(root), num_partitions=4, key_col="key",
                        ts_col="ts", seq_col="seq", text_col="text", **kw)


@pytest.mark.usefixtures("ray_session")
class TestNearDupIndex:
    def test_attribute_matches_exhaustive_reference(self, tmp_path):
        t = corpus_table()
        idx = new_index(tmp_path / "idx")
        lineage = idx.update(ds_of(t), epoch=0)
        # n_events weighting: lineage counts true events, not nbands× them
        assert sum(r["events_consumed"] for r in lineage) == t.num_rows
        out = idx.attribute(ds_of(t), keep_cols=["key"]).take_all()
        want = sequential_owner(t)
        assert len(out) == t.num_rows
        got = {r["key"]: r["near_dup_of"] for r in out}
        assert got == want
        # at least the exact mirrors must be attributed (hamming 0)
        assert all(v is not None for k, v in got.items()
                   if k.startswith("m"))
        flags = {r["key"]: r["is_near_dup"] for r in out}
        assert all(flags[k] == (v is not None) for k, v in got.items())

    def test_epoch_chunking_and_blocks_invariance(self, tmp_path):
        t = corpus_table()
        states = []
        for chunks, blocks in ((1, 2), (3, 5), (5, 1)):
            idx = new_index(tmp_path / f"idx{chunks}")
            per = (t.num_rows + chunks - 1) // chunks
            for e in range(chunks):
                sub = t.slice(e * per, per)
                if sub.num_rows:
                    idx.update(ds_of(sub, blocks=blocks), epoch=e)
            states.append(idx.read_state())
        assert states[0].equals(states[1])
        assert states[0].equals(states[2])
        # canonical form: fp-sorted, fp-unique, 17-byte fps
        fps = states[0]["fp"].to_pylist()
        assert fps == sorted(fps) and len(set(fps)) == len(fps)
        assert all(len(f) == 17 for f in fps)

    def test_exactly_once_replay_and_fsck(self, tmp_path):
        t = corpus_table(30)
        idx = new_index(tmp_path / "idx")
        idx.update(ds_of(t), epoch=0)
        before = idx.read_state()
        again = idx.update(ds_of(t), epoch=0)
        assert all(r["skipped"] for r in again)
        assert idx.read_state().equals(before)
        assert idx.verify(deep=True)["ok"]

    def test_attribute_unknown_and_tombstones(self, tmp_path):
        t = corpus_table(20)
        idx = new_index(tmp_path / "idx")
        idx.update(ds_of(t, blocks=2), epoch=0)
        probe = pa.table({
            "key": pa.array(["new", "gone"], pa.string()),
            "ts": pa.array([1, 2], pa.int64()),
            "seq": pa.array([900, 901], pa.int64()),
            "text": pa.array(["zzz qqq completely novel words xyzzy " * 3,
                              None], pa.string()),
        })
        out = idx.attribute(ds_of(probe, blocks=1)).take_all()
        assert [r["key"] for r in out] == ["new"]
        assert out[0]["near_dup_of"] is None and not out[0]["is_near_dup"]

    def test_purge_keys_scrubs_owner_rows(self, tmp_path):
        t = corpus_table(20)
        idx = new_index(tmp_path / "idx")
        idx.update(ds_of(t), epoch=0)
        victim = "u000"
        report = idx.purge_keys([victim])
        assert report["rows_removed"] > 0
        assert victim not in set(idx.read_state()["key"].to_pylist())


@pytest.mark.usefixtures("ray_session")
class TestIngestIntegration:
    def test_maintain_near_index_through_replay(self, tmp_path):
        """cfg.maintain_near_index=True folds every content-bearing event's
        SimHash bands into <lake>/nearidx during replay; near-identical
        content across urls attributes to its first writer."""
        base = b"<html><body><p>shared body text about %d topics</p>" \
               b"<p>with a second paragraph of filler words</p></body></html>"
        n = 18
        events = pa.table({
            "seq": pa.array(list(range(n)), pa.int64()),
            "op": pa.array(["I"] * n, pa.string()),
            "url": pa.array([f"https://e.x/{i}" for i in range(n)],
                            pa.string()),
            "warc_ts": pa.array([1_700_000_000_000_000 + i * 1_000_000
                                 for i in range(n)], pa.timestamp("us")),
            # every third url repeats url 0's exact content
            "html": pa.array([base % 7 if i % 3 == 0 else base % (100 + i)
                              for i in range(n)], pa.binary()),
            "lang": pa.array(["en"] * n, pa.string()),
        })
        path = str(tmp_path / "events.parquet")
        pq.write_table(events, path)
        cfg = CDCConfig(num_partitions=4, num_salts=2, epoch_size=9,
                        extract_batch_size=8, extract_concurrency=2,
                        maintain_near_index=True, near_index_partitions=4)
        lake_root = str(tmp_path / "lake")
        replay(path, lake_root, cfg, mode="epoch")

        idx = NearDupIndex(near_index_root(lake_root))
        state = idx.read_state()
        assert state.num_rows > 0
        # exact repeats collapse: every third url shares ALL band fps with
        # url 0, so only the first writer owns them
        owners = set(state["url"].to_pylist())
        assert "https://e.x/0" in owners
        for i in range(3, n, 3):
            assert f"https://e.x/{i}" not in owners
        # attribution over the live lake: the repeats point at url 0
        from opendataloader_pdf_ray.cdc import Lake

        lake = Lake(lake_root, cfg.num_partitions)
        out = {r["url"]: r["near_dup_of"]
               for r in idx.attribute(lake.read_dataset(),
                                      keep_cols=["url"]).take_all()}
        assert out["https://e.x/0"] is None
        for i in range(3, n, 3):
            assert out[f"https://e.x/{i}"] == "https://e.x/0"
