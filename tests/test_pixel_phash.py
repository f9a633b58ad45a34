"""pixel_phash (VERDICT r13 #5): integer DCT perceptual hash on the real
netpbm decode path — invariance and discrimination pins.

Reference intent: the perceptual-dedup family extends the reference's
exact-duplicate handling (reference core.py drops byte-identical rows);
pHash catches re-encodes that survive aHash's pixel-mean threshold."""

import numpy as np
import pytest

from timeseriesfuser_spark.ops.multimodal import (
    PHASH_DCT_SCALE,
    phash_dct_table,
    pixel_ahash,
    pixel_phash,
    resize_nearest,
)


def _idct2(spec):
    n = spec.shape[0]
    u = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    C = np.cos((2 * x + 1) * u * np.pi / (2 * n)) * np.where(
        u == 0, np.sqrt(1 / n), np.sqrt(2 / n)
    )
    return C.T @ spec @ C


def _structured_image():
    """Deterministic 32×32 gray image with a RICH low band (random
    amplitudes on every non-DC low-frequency basis vector): all 63
    hashed coefficients are large and well-separated from the median —
    the spectral shape of a natural image, where pHash's stability
    claim lives (a spectrally-degenerate gradient would park half the
    coefficients at the noise floor)."""
    rng = np.random.default_rng(11)
    u = np.arange(32)[:, None]
    v = np.arange(32)[None, :]
    spec = np.zeros((32, 32))
    m = (u < 8) & (v < 8)
    spec[m.nonzero()] = rng.normal(0, 1, int(m.sum()))
    spec[0, 0] = 0
    return np.rint(128 + _idct2(spec * 70)).astype(np.int64)


def _p5(arr):
    a = arr.astype(np.uint8)
    return (
        f"P5\n{a.shape[1]} {a.shape[0]}\n255\n".encode() + a.tobytes()
    )


def _p6(arr):
    a = arr.astype(np.uint8)
    rgb = np.repeat(a[:, :, None], 3, axis=2)
    return (
        f"P6\n{a.shape[1]} {a.shape[0]}\n255\n".encode() + rgb.tobytes()
    )


def _hashes(spark, payloads):
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "media_id long, content binary",
    )
    rows = pixel_phash(df).collect()
    return {r["media_id"]: (r["phash"], r["n_bits"]) for r in rows}


def test_brightness_contrast_and_reencode_invariance(spark):
    """The exact invariances: +b brightness, ×a integer contrast, and a
    P6 re-encode of the same gray content (channel sum = 3× scale) all
    collapse to ONE hash class. aHash shares the affine ones here (the
    payloads are exact); what it cannot share is the noise stability
    below."""
    base = _structured_image()
    contrast = base * 2 - 2 * int(base.min())  # a=2 affine, stays in uint8
    assert 0 <= contrast.min() and contrast.max() <= 255
    h = _hashes(
        spark,
        [_p5(base), _p5(base + 10), _p5(contrast), _p6(base)],
    )
    assert len({v[0] for v in h.values()}) == 1
    assert all(v[0] is not None and v[0] >= 0 for v in h.values())


def test_phash_stable_where_ahash_flips(spark):
    """The discriminating cell: a single mean-crossing pixel spike —
    pure high-frequency content, the shape of re-encode artifacts —
    flips an aHash bit (the pixel sat next to the sampled mean) but
    leaves every low-band DCT sign, hence the pHash, unchanged (the
    spike moves each hashed coefficient by ≤ d·A², ~30× below the
    measured median-neighborhood gaps of the structured image)."""
    base = _structured_image()
    ys = np.minimum(((np.arange(8) + 0.5) * 4).astype(int), 31)
    samp = base[np.ix_(ys, ys)]
    mean = samp.mean()
    flat = int(np.abs(samp - mean).argmin())
    pr, pc = ys[flat // 8], ys[flat % 8]
    val = int(base[pr, pc])
    d = (
        int(np.ceil(mean - val)) + 2
        if val < mean
        else int(np.floor(mean - val)) - 2
    )
    twin = base.copy()
    twin[pr, pc] += d

    df = spark.createDataFrame(
        [(0, bytearray(_p5(base))), (1, bytearray(_p5(twin)))],
        "media_id long, content binary",
    )
    ph = {r["media_id"]: r["phash"] for r in pixel_phash(df).collect()}
    ah = {r["media_id"]: r["ahash"] for r in pixel_ahash(df).collect()}
    assert ph[0] == ph[1]  # pHash: same class
    assert ah[0] != ah[1]  # aHash: split


def test_null_content_and_validation(spark):
    df = spark.createDataFrame(
        [(0, None)], "media_id long, content binary"
    )
    row = pixel_phash(df).collect()[0]
    assert row["phash"] is None and row["n_bits"] is None
    with pytest.raises(ValueError, match="k must be"):
        pixel_phash(df, k=9)
    with pytest.raises(ValueError, match="dct_size"):
        pixel_phash(df, dct_size=4, k=8)


def test_dct_table_is_q20_orthonormal_rounding():
    """The shared table is exactly round(2²⁰·α·cos) — the single source
    of truth for engine and oracle integer arithmetic."""
    A = phash_dct_table(32)
    assert A.dtype == np.int64
    assert A[0, 0] == round(np.sqrt(1 / 32) * PHASH_DCT_SCALE)
    # non-DC row sums are the tiny rounding residue that bounds the
    # brightness sensitivity (exact cosine rows sum to 0)
    assert np.abs(A[1:].sum(axis=1)).max() < 64


def test_phash_matches_local_recompute(spark):
    """End-to-end decode path equals the in-test integer recompute —
    pins the exact pipeline (gray sum → nearest resize → Q20 DCT →
    median threshold, DC dropped, row-major bit order)."""
    base = _structured_image()
    A = phash_dct_table(32)
    px = resize_nearest(base, 32, 32).astype(np.int64)
    coef = A @ px @ A.T
    low = coef[:8, :8].reshape(-1)[1:]
    med = int(np.sort(low)[31])
    bits = low > med
    expect = int(
        bits.astype(np.uint64)
        @ (np.uint64(1) << np.arange(63, dtype=np.uint64))
    )
    got = _hashes(spark, [_p5(base)])[0]
    assert got == (expect, int(bits.sum()))
