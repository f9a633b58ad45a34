"""Baseline JPEG codec (ops/jpeg.py — VERDICT r14 #4): round trips,
the constant-block exactness contract behind pixel_phash_jpeg_dedup's
oracle, container-collapse across formats, and the honest gates."""
import numpy as np
import pytest

from timeseriesfuser_spark.ops.jpeg import _ZZ, decode_jpeg, encode_jpeg
from timeseriesfuser_spark.ops.multimodal import (
    decode_image,
    encode_png,
    phash_dct_table,
    resize_nearest,
)

HEX = "0f3a9c1b2d4e5678aabbccddeeff0123"


def _raster(hx: str) -> np.ndarray:
    return np.frombuffer((hx * 2).encode(), dtype=np.uint8).reshape(8, 8)


def _blocks64(r8: np.ndarray) -> np.ndarray:
    return np.repeat(np.repeat(r8, 8, axis=0), 8, axis=1)


def test_zigzag_is_the_canonical_walk():
    # spot-pin against the published order (generated, so pin endpoints
    # and the first two diagonals)
    assert list(_ZZ[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(_ZZ[-3:]) == [55, 62, 63]
    assert sorted(_ZZ) == list(range(64))


def test_constant_block_roundtrip_is_pixel_exact():
    # the oracle contract: constant 8x8 blocks + flat quant=8 → only
    # the DC coefficient is nonzero, it quantizes without loss, and the
    # Q15 IDCT residue is far below the rounding threshold
    rng = np.random.RandomState(7)
    for _ in range(5):
        r8 = rng.choice(list(b"0123456789abcdef"), size=(8, 8)).astype(
            np.uint8
        )
        img = _blocks64(r8)
        dec = decode_jpeg(encode_jpeg(img, quant=8))
        assert dec.dtype == np.uint8
        assert np.array_equal(dec, img)


def test_gray_quant1_roundtrip_within_one_lsb():
    rng = np.random.RandomState(1)
    g = rng.randint(0, 256, size=(37, 53)).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(g, quant=1))
    assert d.shape == g.shape
    assert int(np.abs(d.astype(int) - g.astype(int)).max()) <= 1


def test_gray_annexk_tables_reasonable():
    xx, yy = np.meshgrid(np.arange(64), np.arange(64))
    smooth = (128 + 80 * np.sin(xx / 9.0) * np.cos(yy / 11.0)).astype(
        np.uint8
    )
    d = decode_jpeg(encode_jpeg(smooth))
    assert int(np.abs(d.astype(int) - smooth.astype(int)).max()) <= 16


@pytest.mark.parametrize("ss", ["444", "422", "420"])
def test_color_roundtrip_all_subsamplings(ss):
    xx, yy = np.meshgrid(np.arange(48), np.arange(33))
    smooth = (128 + 60 * np.sin(xx / 7.0) * np.cos(yy / 9.0)).astype(
        np.uint8
    )
    c = np.stack([smooth, smooth[::-1], smooth[:, ::-1]], axis=2)
    d = decode_jpeg(encode_jpeg(c, quant=2, subsampling=ss))
    assert d.shape == c.shape
    # chroma subsampling is lossy by design; luma-dominated smooth
    # content stays close
    assert float(np.abs(d.astype(int) - c.astype(int)).mean()) < 8.0


def test_restart_interval_roundtrip_and_markers_present():
    rng = np.random.RandomState(3)
    g = rng.randint(0, 256, size=(24, 40)).astype(np.uint8)  # 15 MCUs
    enc = encode_jpeg(g, quant=1, restart_interval=4)
    assert b"\xff\xdd" in enc  # DRI
    assert b"\xff\xd0" in enc  # first RST marker
    d = decode_jpeg(enc)
    assert int(np.abs(d.astype(int) - g.astype(int)).max()) <= 1


def test_odd_dimensions_pad_and_crop():
    rng = np.random.RandomState(4)
    g = rng.randint(0, 256, size=(17, 23)).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(g, quant=1))
    assert d.shape == (17, 23)
    c = rng.randint(0, 256, size=(19, 21, 3)).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(c, quant=1, subsampling="420"))
    assert d.shape == (19, 21, 3)


def test_sixteen_bit_quant_tables_roundtrip():
    q = np.full(64, 300, dtype=np.int64)  # forces Pq=1 DQT
    g = _blocks64(_raster(HEX))
    enc = encode_jpeg(g, quant=q)
    d = decode_jpeg(enc)
    assert d.shape == g.shape  # lossy, but structurally intact


def test_progressive_and_truncated_are_gated():
    enc = bytearray(encode_jpeg(_blocks64(_raster(HEX)), quant=8))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(enc))
    good = encode_jpeg(_blocks64(_raster(HEX)), quant=8)
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_decode_image_sniffs_jpeg():
    img = _blocks64(_raster(HEX))
    out = decode_image(encode_jpeg(img, quant=8))
    assert out.dtype == np.float32
    assert np.array_equal(out.astype(np.uint8), img)


def _phash_of(payload: bytes) -> int:
    arr = decode_image(payload)
    if arr.ndim == 3:
        arr = arr.sum(axis=2)
    A = phash_dct_table(32)
    px = np.rint(resize_nearest(arr, 32, 32)).astype(np.int64)
    coef = A @ px @ A.T
    low = coef[:8, :8].reshape(-1)[1:]
    med = int(np.sort(low)[31])
    bits = low > med
    return int(
        bits.astype(np.uint64) @ (np.uint64(1) << np.arange(63, dtype=np.uint64))
    )


def test_cross_format_phash_collapse_includes_jpeg():
    # the same md5 raster through FOUR containers — P5 text, real
    # zlib PNG, and a real entropy-coded JPEG — lands in ONE class:
    # the driver query's correctness hinge
    r8 = _raster(HEX)
    p5 = b"P5\n8 8\n255\n" + (HEX * 2).encode()
    h_p5 = _phash_of(p5)
    h_png = _phash_of(encode_png(r8))
    h_jpg = _phash_of(encode_jpeg(_blocks64(r8), quant=8))
    assert h_p5 == h_png == h_jpg


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4), dtype=np.uint8), quant=0)
    with pytest.raises(ValueError):
        encode_jpeg(
            np.zeros((4, 4, 3), dtype=np.uint8), subsampling="411"
        )
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4), dtype=np.uint8), restart_interval=-1)
