"""Multimodal (image/audio/video) pipeline plumbing.

Media travel as opaque ``binary`` columns with typed metadata columns
next to them; decode / resize / feature-extract / frame-sample stages are
actor-pool ``map_batches`` classes whose Ray-side plumbing (schema, batch
sizing, actor signature, output layout) is real and tested.

Decoding: UNCOMPRESSED raster formats are decoded for real, in pure
numpy — binary PPM/PGM (P6/P5) and uncompressed 24/32-bit BMP
(``decode_image``, format-sniffed by magic bytes) — so the pipeline is
end-to-end functional with zero native codecs. COMPRESSED codecs
(JPEG/PNG/audio/video) are import-gated: ``decode_image`` falls back to
``PIL.Image.open`` when Pillow is importable and otherwise raises a
``NotImplementedError`` naming the library to plug in (PIL / torchaudio /
pyav); each stage also accepts an explicit ``decoder`` callable, and a
deterministic fake (``fake_image_decoder``) ships for tests.

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


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary netpbm -> (h, w, 3) uint8: P6 (RGB) and P5 (gray, expanded
    to 3 channels), maxval <= 255. Pure numpy — no codec library."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM payload (magic {magic!r})")
    # header: magic, width, height, maxval as whitespace-separated tokens
    # (with '#' comment lines), then ONE whitespace byte, then raster
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace separating header from raster
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported (maxval > 255)")
    ch = 3 if magic == b"P6" else 1
    raster = np.frombuffer(payload, np.uint8, count=h * w * ch, offset=pos)
    img = raster.reshape(h, w, ch)
    return np.repeat(img, 3, axis=2) if ch == 1 else img.copy()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP (BITMAPINFOHEADER) -> (h, w, 3) uint8.
    Pure numpy: handles bottom-up and top-down rows, 4-byte row padding,
    BGR(A) -> RGB channel order."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, "
            f"compression={compression}); plug in PIL for the rest"
        )
    top_down = h < 0
    h = abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=h * stride, offset=off).reshape(
        h, stride
    )
    img = rows[:, : w * nb].reshape(h, w, nb)
    if not top_down:
        img = img[::-1]
    return img[:, :, 2::-1].copy()  # BGR(A) -> RGB, drop alpha


def decode_image(payload: bytes) -> np.ndarray:
    """Format-sniffing image decode: PPM/PGM and uncompressed BMP in pure
    numpy; anything else via Pillow when importable, else a
    NotImplementedError naming the plug-in."""
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    try:
        import io

        from PIL import Image  # type: ignore

        arr = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
        return arr
    except ImportError:
        raise NotImplementedError(
            "compressed image codec required (payload is not PPM/PGM/BMP) — "
            "install Pillow or pass an explicit decoder"
        ) from None


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 payload (test/fixture helper; exact
    roundtrip with decode_ppm)."""
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


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
        self.decoder = decoder or decode_image
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
        self.decoder = decoder or decode_image
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


def synth_image_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic REAL-image table (media_id, data: binary P6 PPM) —
    the fixture for driving decode/resize end-to-end with no codec libs."""
    rng = np.random.default_rng([seed, 7])
    payloads = []
    for _ in range(n):
        h = int(rng.integers(6, 24))
        w = int(rng.integers(6, 24))
        payloads.append(encode_ppm(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "data": pa.array(payloads, pa.binary()),
        }
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
