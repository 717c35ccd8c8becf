"""Multimodal pipeline queries: embedded-image asset extraction feeding the
decode / featurize actor stages (SURVEY.md §2.1 image sink, made first-class
per round-1 verdict item #10).

Pages derive deterministically from the driver ``documents`` table: every
4th doc embeds 1-3 base64 ``data:`` images whose byte length and mime are
pure functions of (doc_id, asset_idx) — so the whole plumbing pipeline has an
exact SQL oracle even though the codec itself is a disclosed stub."""

from __future__ import annotations

import base64
import hashlib

import pyarrow as pa

import ray.data

from ..functions.multimodal import ImageAssetExtractor, ImageDecoder, ImageFeaturizer
from .common import read_table, stage_concurrency


def _payload(doc_id: int, k: int, size: int) -> bytes:
    seed = hashlib.blake2b(f"{doc_id}:{k}".encode(), digest_size=32).digest()
    return (seed * (size // 32 + 1))[:size]


def _image_pages(sf_dir: str) -> "ray.data.Dataset":
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def build(batch: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for did in batch["doc_id"].to_pylist():
            if did % 4 != 0:
                continue
            imgs = []
            for k in range(1 + did % 3):
                size = 64 + (did % 10) * 16 + k * 8
                mime = "image/png" if (did + k) % 2 == 0 else "image/jpeg"
                b64 = base64.b64encode(_payload(did, k, size)).decode()
                imgs.append(f'<img alt="asset {k}" src="data:{mime};base64,{b64}"/>')
            urls.append(f"https://docs.example/{did:06d}")
            htmls.append((f'<html><body><div class="page"><p>doc {did}</p>'
                          f'{"".join(imgs)}</div></body></html>').encode())
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    return docs.map_batches(build, batch_format="pyarrow")


def image_asset_stats(sf_dir: str):
    """Extract embedded images → decode (stub codec, real plumbing) →
    featurize (actor-held projection) → per-asset stats. Exact SQL oracle:
    asset count / mime / byte length are doc_id arithmetic."""
    pages = _image_pages(sf_dir)
    assets = pages.map_batches(
        ImageAssetExtractor, batch_format="pyarrow", batch_size=32,
        concurrency=stage_concurrency(), num_cpus=0.5)
    decoded = assets.map_batches(ImageDecoder,
                                 fn_constructor_kwargs={"mode": "fake"},
                                 batch_format="pyarrow", batch_size=32,
                                 concurrency=stage_concurrency(), num_cpus=0.5)
    feats = decoded.map_batches(
        ImageFeaturizer, batch_format="pyarrow", batch_size=32,
        concurrency=stage_concurrency(), num_cpus=0.5)

    def finalize(t: pa.Table) -> pa.Table:
        dims = [len(e) if e is not None else 0
                for e in t["embedding"].to_pylist()]
        return pa.table({"url": t["url"],
                         "asset_idx": t["asset_idx"].cast(pa.int64()),
                         "mime": t["mime"],
                         "n_bytes": t["n_bytes"],
                         "emb_dim": pa.array(dims, pa.int64())})

    return feats.map_batches(finalize, batch_format="pyarrow")


IMAGE_ASSET_STATS_SQL = """
SELECT 'https://docs.example/' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS url,
       CAST(gs AS BIGINT) AS asset_idx,
       CASE WHEN (doc_id + gs) % 2 = 0 THEN 'image/png'
            ELSE 'image/jpeg' END AS mime,
       CAST(64 + (doc_id % 10) * 16 + gs * 8 AS BIGINT) AS n_bytes,
       CAST(64 AS BIGINT) AS emb_dim
FROM documents, unnest(range(0, 1 + doc_id % 3)) AS t(gs)
WHERE doc_id % 4 = 0
"""


def audio_frame_stats(sf_dir: str):
    """REAL PCM16 framing over synthesized audio clips (every 3rd doc carries
    a clip whose byte length is a pure function of doc_id): per clip, sample
    count and 1024/512 frame count — both recomputable from doc_id arithmetic
    in SQL, while the Ray path does the actual frame slicing + integer energy
    (energy is asserted in pytest; it depends on the payload bytes, which SQL
    cannot rebuild)."""
    from ..functions.multimodal import PcmFramer

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def build(batch: pa.Table) -> pa.Table:
        ids, clips = [], []
        for d in batch["doc_id"].to_pylist():
            if d % 3 != 0:
                continue
            ids.append(d)
            clips.append(_payload(d, 0, 4000 + (d % 7) * 1024))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "audio": pa.array(clips, pa.binary())})

    clips = docs.map_batches(build, batch_format="pyarrow")
    framed = clips.map_batches(PcmFramer, batch_format="pyarrow",
                               concurrency=stage_concurrency())
    return framed.select_columns(["doc_id", "n_samples", "n_frames"])


# byte length 4000 + (doc_id%7)*1024 → samples = len//2,
# frames = (samples - 1024)//512 + 1 (samples ≥ 1024 always holds here)
AUDIO_FRAME_STATS_SQL = """
SELECT doc_id,
       CAST((4000 + (doc_id % 7) * 1024) // 2 AS BIGINT) AS n_samples,
       CAST(((4000 + (doc_id % 7) * 1024) // 2 - 1024) // 512 + 1 AS BIGINT)
           AS n_frames
FROM documents WHERE doc_id % 3 = 0
"""


MM_QUERIES = {
    "image_asset_stats": image_asset_stats,
    "audio_frame_stats": audio_frame_stats,
}

MM_ORACLE_SQL = {
    "image_asset_stats": IMAGE_ASSET_STATS_SQL,
    "audio_frame_stats": AUDIO_FRAME_STATS_SQL,
}
