"""Multimodal (image/audio/video) pipeline plumbing.

Media travel as opaque ``binary`` columns with typed metadata columns
next to them; decode / resize / feature-extract / frame-sample stages are
actor-pool ``map_batches`` classes whose Ray-side plumbing (schema, batch
sizing, actor signature, output layout) is real and tested, while the
codec itself is stubbed: the image/audio libraries are not in this
container, so each stage takes a ``decoder`` callable and ships with a
deterministic fake (``fake_image_decoder``) used by the tests, plus a
``NotImplementedError`` default that names the real library to plug in
(PIL / torchaudio / pyav).

Batch sizing note (large binary payloads): callers should pass a small
``batch_size`` (e.g. 32-128) so batch x concurrency fits worker heaps;
blocks of wide binary rows should be read with a larger
``target_max_block_size`` so they are not split absurdly small.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def fake_image_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for PIL.Image.open: bytes -> (h, w, 3) u8.

    Derived purely from the payload hash so tests are reproducible."""
    h = hashlib.blake2b(payload, digest_size=16).digest()
    hh = 8 + h[0] % 8
    ww = 8 + h[1] % 8
    rng = np.random.default_rng(list(h))
    return rng.integers(0, 256, size=(hh, ww, 3), dtype=np.uint8)


def _require_decoder(kind: str):
    def _missing(payload: bytes):
        raise NotImplementedError(
            f"no {kind} decoder in this environment — plug in a real one "
            f"(images: PIL.Image.open; audio: torchaudio.load; video: av.open)"
        )

    return _missing


class ImageDecode:
    """binary -> decoded dims + channel-mean features.

    ``ds.map_batches(ImageDecode, fn_constructor_kwargs={"decoder": ...},
    batch_format="pyarrow", batch_size=64, concurrency=N)`` — the decoder
    (the expensive model/codec state) is constructed once per actor."""

    def __init__(self, decoder=None, data_col: str = "data"):
        self.decoder = decoder or _require_decoder("image")
        self.data_col = data_col

    def __call__(self, t: pa.Table) -> pa.Table:
        heights, widths, means = [], [], []
        for payload in t[self.data_col].to_pylist():
            img = self.decoder(payload)
            heights.append(img.shape[0])
            widths.append(img.shape[1])
            means.append(img.reshape(-1, img.shape[2]).mean(axis=0))
        mean_arr = np.stack(means).astype(np.float32)
        t = t.drop_columns([self.data_col])  # decoded stages drop the payload
        t = t.append_column("height", pa.array(heights, pa.int32()))
        t = t.append_column("width", pa.array(widths, pa.int32()))
        t = t.append_column(
            "channel_mean",
            pa.FixedSizeListArray.from_arrays(
                pa.array(mean_arr.reshape(-1)), mean_arr.shape[1]
            ),
        )
        return t


class ImageResize:
    """Nearest-neighbor resize to (size x size); pure numpy, no codec."""

    def __init__(self, size: int = 8, decoder=None, data_col: str = "data"):
        self.size = size
        self.decoder = decoder or _require_decoder("image")
        self.data_col = data_col

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        s = self.size
        for payload in t[self.data_col].to_pylist():
            img = self.decoder(payload)
            yi = (np.arange(s) * img.shape[0] // s).astype(np.int64)
            xi = (np.arange(s) * img.shape[1] // s).astype(np.int64)
            out.append(img[yi][:, xi].astype(np.uint8).reshape(-1))
        arr = np.stack(out)
        return t.append_column(
            "thumb",
            pa.FixedSizeListArray.from_arrays(
                pa.array(arr.reshape(-1)), arr.shape[1]
            ),
        )


class FrameSample:
    """Video stub: deterministically pick ``n_frames`` frame offsets from a
    duration metadata column (the real stage would call the demuxer)."""

    def __init__(self, n_frames: int = 4, duration_col: str = "duration_s"):
        self.n_frames = n_frames
        self.duration_col = duration_col

    def __call__(self, t: pa.Table) -> pa.Table:
        dur = np.asarray(t[self.duration_col].to_numpy(zero_copy_only=False), np.float64)
        # evenly spaced sample points, deterministic
        offs = (
            dur[:, None] * (np.arange(self.n_frames) + 0.5) / self.n_frames
        ).astype(np.float64)
        return t.append_column(
            "frame_offsets",
            pa.FixedSizeListArray.from_arrays(pa.array(offs.reshape(-1)), self.n_frames),
        )


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table (media_id, data: binary, duration_s)."""
    rng = np.random.default_rng([seed, 99])
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "data": pa.array(payloads, pa.binary()),
            "duration_s": pa.array(rng.uniform(1.0, 120.0, n)),
        }
    )
