"""Pure-numpy PNG and BMP codecs (VERDICT r13 missing #5: the real
decode family beyond netpbm). Round-trips, spec filter vectors, palette
paths, error gates, sniffing, and the cross-format re-encode collapse
through the pixel hashes."""

import struct
import zlib

import numpy as np
import pytest

from timeseriesfuser_spark.ops.multimodal import (
    _PNG_SIG,
    decode_bmp,
    decode_image,
    decode_png,
    encode_bmp,
    encode_netpbm,
    encode_png,
)


def _chunk(ctype, payload):
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _png_from_lines(w, h, color, lines, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(
        0, 256, shape, dtype=np.uint8
    )


@pytest.mark.parametrize("shape", [(5, 7), (4, 3, 3), (3, 5, 4)])
@pytest.mark.parametrize("ft", [0, 1, 2])
def test_png_roundtrip(shape, ft):
    img = _rand(shape, seed=sum(shape) + ft)
    back = decode_png(encode_png(img, filter_type=ft))
    assert back.shape == img.shape and (back == img).all()


@pytest.mark.parametrize("f", [3, 4])
@pytest.mark.parametrize("ch", [1, 3])
def test_png_average_and_paeth_spec_vectors(f, ch):
    """Filters the decoder must invert but the writer doesn't emit:
    encode rows by the spec's forward definition in-test, decode, and
    require the original raster back."""
    h, w = 4, 5
    img = _rand((h, w) if ch == 1 else (h, w, ch), seed=f * 10 + ch)
    flat = img.reshape(h, w * ch).astype(int)
    lines = []
    prev = [0] * (w * ch)
    for y in range(h):
        row = list(flat[y])
        enc = []
        for x in range(len(row)):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc.append((row[x] - pred) % 256)
        lines.append(bytes([f]) + bytes(enc))
        prev = row
    color = 0 if ch == 1 else 2
    back = decode_png(_png_from_lines(w, h, color, lines))
    assert (back == img).all()


def test_png_palette_gray_and_color():
    h, w = 3, 4
    idx = _rand((h, w), seed=9)
    lines = [b"\x00" + idx[y].tobytes() for y in range(h)]
    gray_pal = bytes(v for i in range(256) for v in (i, i, i))
    p = _png_from_lines(w, h, 3, lines, extra=_chunk(b"PLTE", gray_pal))
    back = decode_png(p)
    assert back.shape == (h, w) and (back == idx).all()  # achromatic → gray
    color_pal = bytes(
        v for i in range(256) for v in (i, (i * 7) % 256, 255 - i)
    )
    p2 = _png_from_lines(w, h, 3, lines, extra=_chunk(b"PLTE", color_pal))
    back2 = decode_png(p2)
    assert back2.shape == (h, w, 3)
    assert (back2[0, 0] == [idx[0, 0], (idx[0, 0] * 7) % 256,
                            255 - idx[0, 0]]).all()


def test_png_error_gates():
    img = _rand((3, 3), seed=1)
    good = encode_png(img)
    # corrupt one IDAT payload byte → CRC failure
    i = good.index(b"IDAT") + 6
    bad = good[:i] + bytes([good[i] ^ 0xFF]) + good[i + 1 :]
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bad)
    # 16-bit depth / Adam7 are honest NotImplementedError, not garbage
    ihdr16 = struct.pack(">IIBBBBB", 3, 3, 16, 0, 0, 0, 0)
    p16 = _PNG_SIG + _chunk(b"IHDR", ihdr16) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(p16)
    ihdr_i = struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 1)
    pi = _PNG_SIG + _chunk(b"IHDR", ihdr_i) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(pi)


def test_bmp_roundtrip_gray_and_rgb():
    g = _rand((5, 7), seed=2)  # width 7 exercises row padding
    assert (decode_bmp(encode_bmp(g)) == g).all()
    c = _rand((4, 5, 3), seed=3)
    assert (decode_bmp(encode_bmp(c)) == c).all()


def test_bmp_top_down_and_32bpp():
    c = _rand((3, 2, 3), seed=4)
    # hand-build: top-down (negative height), 32bpp BGRX
    h, w = c.shape[:2]
    body = b""
    for y in range(h):  # top-down: natural order
        for x in range(w):
            r, g, b = (int(v) for v in c[y, x])
            body += bytes([b, g, r, 0])
    off = 14 + 40
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(body), 0, 0, 0, 0
    )
    data = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off) + info + body
    assert (decode_bmp(data) == c).all()


def test_bmp_error_gates():
    with pytest.raises(ValueError, match="signature"):
        decode_bmp(b"XX" + b"\x00" * 60)
    # RLE8 compression flag
    g = encode_bmp(_rand((3, 3), seed=5))
    bad = g[:30] + struct.pack("<I", 1) + g[34:]
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp(bad)


def test_decode_image_sniffs_all_formats():
    img = _rand((6, 6), seed=6)
    for payload in (
        encode_netpbm(img),
        encode_png(img, filter_type=2),
        encode_bmp(img),
    ):
        out = decode_image(payload)
        assert out.shape == (6, 6) and (out == img).all()
    # JPEG now dispatches to the REAL baseline decoder (ops/jpeg.py);
    # a JPEG-magic payload with garbage inside is malformed, not gated
    from timeseriesfuser_spark.ops.jpeg import encode_jpeg

    out = decode_image(encode_jpeg(img, quant=1))
    assert out.shape == (6, 6)
    assert np.abs(out - img.astype(np.float32)).max() <= 1.0
    with pytest.raises(ValueError, match="marker|JPEG"):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(b"RIFF....WEBP not a known magic")


def test_cross_format_reencode_collapses_pixel_hashes(spark):
    """The point of the real codec family: the SAME image re-encoded as
    P5, P6, PNG (each writer filter), gray BMP, RGB BMP and opaque RGBA
    PNG lands in ONE aHash and ONE pHash class — format-level re-encodes
    are not duplicates the perceptual layer should ever split on."""
    from timeseriesfuser_spark.ops.multimodal import pixel_ahash, pixel_phash

    img = _rand((16, 16), seed=7)
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    rgba = np.dstack([rgb, np.full((16, 16), 255, dtype=np.uint8)])
    payloads = [
        encode_netpbm(img),
        encode_netpbm(rgb),
        encode_png(img, filter_type=0),
        encode_png(img, filter_type=1),
        encode_png(rgb, filter_type=2),
        encode_png(rgba, filter_type=1),
        encode_bmp(img),
        encode_bmp(rgb),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "media_id long, content binary",
    )
    assert len({r["ahash"] for r in pixel_ahash(df).collect()}) == 1
    assert len({r["phash"] for r in pixel_phash(df).collect()}) == 1


# ------------------------------------------------------- WAV (audio)


def test_wav_roundtrip_mono8_and_stereo16():
    from timeseriesfuser_spark.ops.multimodal import decode_wav, encode_wav

    m = _rand((50,), seed=20)
    s, rate = decode_wav(encode_wav(m, 8000))
    assert rate == 8000 and s.dtype == np.uint8 and (s == m).all()

    st = (
        np.random.default_rng(21).integers(-30000, 30000, (40, 2))
    ).astype(np.int16)
    s2, rate2 = decode_wav(encode_wav(st, 44100))
    assert rate2 == 44100 and s2.dtype == np.int16
    assert s2.shape == (40, 2) and (s2 == st).all()


def test_wav_error_gates():
    from timeseriesfuser_spark.ops.multimodal import decode_wav, encode_wav
    import struct

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    good = encode_wav(_rand((8,), seed=22), 8000)
    i = good.index(b"fmt ") + 8
    bad = good[:i] + struct.pack("<H", 3) + good[i + 2 :]  # float fmt
    with pytest.raises(NotImplementedError, match="PCM"):
        decode_wav(bad)


def test_audio_features_exact_and_zero_convention(spark):
    """Zero samples inherit the previous sign (no phantom crossings),
    and every feature is the exact integer the docstring promises."""
    from timeseriesfuser_spark.ops.multimodal import audio_features, encode_wav

    s = np.array([10, -5, 0, 0, 3, -3], dtype=np.int16)
    # signs: + - (- -) + -  → crossings at 1, 4, 5 → 3
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(s, 16000))), (2, None)],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in audio_features(df).collect()}
    r = rows[1]
    assert r["n_samples"] == 6 and r["sample_rate"] == 16000
    assert r["n_channels"] == 1
    assert r["sum_sq_centered"] == 100 + 25 + 9 + 9
    assert r["peak_abs"] == 10
    assert r["zero_crossings"] == 3
    assert rows[2]["n_samples"] is None


def test_audio_features_multichannel_zc(spark):
    """Stereo crossings count per channel — interleaving must not
    manufacture crossings across channels."""
    from timeseriesfuser_spark.ops.multimodal import audio_features, encode_wav

    left = np.array([5, -5, 5], dtype=np.int16)     # 2 crossings
    right = np.array([7, 7, 7], dtype=np.int16)     # 0 crossings
    st = np.stack([left, right], axis=1)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(st, 8000)))],
        "media_id long, content binary",
    )
    r = audio_features(df).collect()[0]
    assert r["n_channels"] == 2 and r["zero_crossings"] == 2


def test_audio_features_zero_at_channel_boundary(spark):
    """A channel whose FIRST sample is zero must not inherit the
    previous channel's trailing sign: L=[5,-5,-5] has 1 crossing,
    R=[0,7,7] has 0 (leading zero carries no sign) — total 1, not the
    2 a concatenated-run inheritance would manufacture."""
    from timeseriesfuser_spark.ops.multimodal import audio_features, encode_wav

    left = np.array([5, -5, -5], dtype=np.int16)
    right = np.array([0, 7, 7], dtype=np.int16)
    st = np.stack([left, right], axis=1)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(st, 8000)))],
        "media_id long, content binary",
    )
    r = audio_features(df).collect()[0]
    assert r["n_channels"] == 2 and r["zero_crossings"] == 1
    # and mid-channel zeros still inherit within the channel:
    # L=[3,0,-3] → 1 crossing; R=[-2,0,2] → 1 crossing
    df2 = spark.createDataFrame(
        [(1, bytearray(encode_wav(np.array(
            [[3, -2], [0, 0], [-3, 2]], dtype=np.int16), 8000)))],
        "media_id long, content binary",
    )
    r2 = audio_features(df2).collect()[0]
    assert r2["zero_crossings"] == 2


# ----------------------------------------------------- AVI (video)


def test_avi_roundtrip_and_frame_sampling(spark):
    """Uncompressed-AVI demux composes with sample_frames and the BMP
    decoder: every_n=2 keeps frames 0 and 2, each decoding to the
    original RGB pixels."""
    from timeseriesfuser_spark.ops.multimodal import (
        decode_bmp,
        encode_avi,
        sample_frames,
        split_avi,
    )

    frames = [_rand((6, 5, 3), seed=30 + i) for i in range(4)]
    avi = encode_avi(frames, fps=10)
    got = list(split_avi(avi))
    assert [g[0] for g in got] == [0, 1, 2, 3]
    for (idx, bmp, w, h), orig in zip(got, frames):
        assert (w, h) == (5, 6) and (decode_bmp(bmp) == orig).all()

    df = spark.createDataFrame(
        [(1, bytearray(avi), "video", None)],
        "media_id long, content binary, media_type string, "
        "meta map<string,string>",
    )
    rows = sample_frames(df, 2, split_fn=split_avi).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 2]
    for r in rows:
        assert (decode_bmp(bytes(r["content"]))
                == frames[r["frame_idx"]]).all()


def test_avi_error_gates():
    import struct

    from timeseriesfuser_spark.ops.multimodal import encode_avi, split_avi

    with pytest.raises(ValueError, match="signature"):
        list(split_avi(b"RIFF\x00\x00\x00\x00WAVE"))
    avi = encode_avi([_rand((3, 3, 3), seed=40)])
    i = avi.index(b"strf") + 8 + 16  # biCompression field
    bad = avi[:i] + struct.pack("<I", 1) + avi[i + 4 :]
    with pytest.raises(NotImplementedError, match="biCompression"):
        list(split_avi(bad))
