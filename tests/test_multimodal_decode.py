"""Real pure-numpy image decode (PPM/PGM/BMP) — the multimodal stage's
codec-free path. Compressed formats stay import-gated (Pillow plug-in),
tested by the stub-contract case in test_training_data_ops."""

import numpy as np
import pytest

from mercury_graph_ray.stages.multimodal import (
    ImageDecode,
    ImageResize,
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_ppm,
    synth_image_table,
)


def _img(h, w, seed=3):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _encode_bmp24(img: np.ndarray, top_down: bool = False) -> bytes:
    """Minimal uncompressed 24-bit BITMAPINFOHEADER BMP (test golden)."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), np.uint8)
    raster[:, : w * 3] = img[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    if not top_down:
        raster = raster[::-1]
    data = raster.tobytes()
    off = 14 + 40
    height_field = -h if top_down else h
    header = (
        b"BM"
        + (off + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + height_field.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + data


def test_ppm_roundtrip_exact():
    img = _img(11, 7)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # sniffing dispatcher takes the same path
    assert np.array_equal(decode_image(encode_ppm(img)), img)


def test_ppm_header_comments_and_pgm():
    img = _img(5, 4)
    payload = encode_ppm(img).replace(b"P6\n", b"P6\n# a comment line\n", 1)
    assert np.array_equal(decode_ppm(payload), img)

    gray = _img(6, 3)[:, :, 0]
    pgm = b"P5\n3 6\n255\n" + gray.tobytes()
    out = decode_ppm(pgm)
    assert out.shape == (6, 3, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)


@pytest.mark.parametrize("top_down", [False, True])
@pytest.mark.parametrize("w", [4, 5])  # w=5 exercises the 4-byte row pad
def test_bmp24_decode(top_down, w):
    img = _img(6, w, seed=9)
    payload = _encode_bmp24(img, top_down=top_down)
    assert np.array_equal(decode_bmp(payload), img)
    assert np.array_equal(decode_image(payload), img)


def test_bmp_rejects_compressed():
    payload = bytearray(_encode_bmp24(_img(4, 4)))
    payload[30] = 1  # BI_RLE8
    with pytest.raises(ValueError, match="uncompressed"):
        decode_bmp(bytes(payload))


def test_decode_image_unknown_format():
    with pytest.raises((NotImplementedError, Exception)):
        decode_image(b"\x89PNG not really a png")


def test_real_decode_pipeline(ray_session):
    """End-to-end actor-pool decode/resize over real PPM payloads with the
    DEFAULT decoder — no fake, no codec library."""
    import ray.data as rd

    tbl = synth_image_table(16, seed=42)
    want_dims = [
        decode_ppm(p.as_py()).shape[:2] for p in tbl["data"]
    ]
    dec = (
        rd.from_arrow(tbl)
        .map_batches(ImageDecode, batch_format="pyarrow", batch_size=8, concurrency=2)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert [(h, w) for h, w in zip(dec.height, dec.width)] == want_dims
    # channel_mean is the true per-channel mean of the decoded pixels
    img0 = decode_ppm(tbl["data"][0].as_py())
    got0 = np.asarray(list(dec.channel_mean.iloc[0]), np.float32)
    assert np.allclose(got0, img0.reshape(-1, 3).mean(axis=0), atol=1e-3)

    rs = (
        rd.from_arrow(tbl)
        .map_batches(
            ImageResize,
            fn_constructor_kwargs={"size": 4},
            batch_format="pyarrow",
            batch_size=8,
            concurrency=2,
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    yi = (np.arange(4) * img0.shape[0] // 4).astype(np.int64)
    xi = (np.arange(4) * img0.shape[1] // 4).astype(np.int64)
    want_thumb = img0[yi][:, xi].reshape(-1)
    assert np.array_equal(np.asarray(list(rs.thumb.iloc[0]), np.uint8), want_thumb)
