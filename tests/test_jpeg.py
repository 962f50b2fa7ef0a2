"""Differential tests for the pure-stdlib baseline JPEG codec
(operators/jpeg.py). The oracle-checked query proves the flat-block
EXACT class end to end; these tests bound the general lossy path —
full AC Huffman coding, ZRL runs, both chroma layouts, padding, and
marker robustness — which no SQL oracle can recompute."""

from __future__ import annotations

import numpy as np
import pytest

from crypto_lakehouse_spark.operators.jpeg import (
    ZIGZAG,
    _build_huffman,
    _extend,
    _magnitude,
    dct2d,
    idct2d,
    jpeg_decode,
    jpeg_encode,
)


def _rng(seed: int) -> np.random.RandomState:
    return np.random.RandomState(seed)


# --- primitive-level properties ---------------------------------------------


def test_zigzag_is_permutation_with_known_prefix():
    assert sorted(ZIGZAG) == list(range(64))
    # the canonical start of the T.81 zigzag (flat = 8*i + j)
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]


def test_dct_orthonormal_roundtrip():
    x = _rng(0).randn(8, 8) * 100
    assert np.allclose(idct2d(dct2d(x)), x, atol=1e-9)
    # Parseval: orthonormal transform preserves energy
    assert np.isclose((dct2d(x) ** 2).sum(), (x**2).sum())


def test_magnitude_extend_inverse():
    for v in list(range(-300, 300)) + [1023, -1023, 2047, -2047]:
        cat, bits = _magnitude(v)
        assert _extend(bits, cat) == v


def test_huffman_tables_prefix_free():
    enc, dec = _build_huffman(
        [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
        list(range(162)),
    )
    codes = sorted(
        (length, code) for code, length in enc.values()
    )
    # no code is a prefix of another (canonical assignment guarantees
    # it, but the decoder's correctness rests on this exact property)
    as_bits = [format(c, f"0{l}b") for l, c in codes]
    for i, a in enumerate(as_bits):
        for b in as_bits[i + 1 :]:
            assert not b.startswith(a)
    assert len(dec) == 162


# --- roundtrip bounds (the general lossy path) ------------------------------


def test_flat_blocks_bit_exact():
    vals = _rng(1).randint(0, 256, size=(4, 5))
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(
        np.uint8
    )
    qt = np.full((8, 8), 8)
    assert np.array_equal(jpeg_decode(jpeg_encode(img, qtable=qt)), img)


def test_flat_blocks_odd_crop_bit_exact():
    vals = _rng(2).randint(0, 256, size=(3, 6))
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(
        np.uint8
    )[:19, :43]
    qt = np.full((8, 8), 8)
    dec = jpeg_decode(jpeg_encode(img, qtable=qt))
    assert dec.shape == (19, 43)
    assert np.array_equal(dec, img)


@pytest.mark.parametrize("shape", [(8, 8), (24, 33), (17, 40), (64, 48)])
def test_random_grey_unit_quant_error_bound(shape):
    # all-ones quant: the only loss is round(DCT) — reconstruction
    # error is bounded by the rounding energy, empirically <= 2 grey
    # levels. This drives the FULL AC Huffman path: random pixels
    # produce dense AC coefficients across run lengths and size
    # categories (including ZRL for sparse tails).
    img = _rng(3).randint(0, 256, size=shape).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(img, qtable=np.ones((8, 8))))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_rgb_444_unit_quant_error_bound():
    img = _rng(4).randint(0, 256, size=(17, 19, 3)).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(img, qtable=np.ones((8, 8))))
    assert dec.shape == img.shape
    # YCbCr forward/inverse adds its own rounding on top of the DCT's
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4


def test_rgb_420_smooth_gradient():
    yy, xx = np.mgrid[0:32, 0:40]
    img = np.stack(
        [(yy * 3 + xx) % 256, (xx * 2) % 256, (yy * 5) % 256], axis=-1
    ).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=95, subsample=True))
    assert dec.shape == img.shape
    # 2x2 chroma averaging + quality-95 quant: smooth content stays
    # close on average (sharp chroma edges would not — that is the
    # subsampling tradeoff, not a codec bug)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 4


def test_quality_monotonic_error():
    img = _rng(5).randint(0, 256, size=(24, 24)).astype(np.uint8)

    def err(q):
        dec = jpeg_decode(jpeg_encode(img, quality=q))
        return np.abs(dec.astype(int) - img.astype(int)).mean()

    assert err(95) < err(50) < err(10)


def test_deterministic_bytes():
    img = _rng(6).randint(0, 256, size=(16, 16)).astype(np.uint8)
    assert jpeg_encode(img, quality=80) == jpeg_encode(img, quality=80)


# --- decoder robustness ------------------------------------------------------


def test_rejects_non_jpeg():
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_decode(b"\x89PNG\r\n\x1a\nrest")


def test_rejects_progressive():
    blob = bytearray(jpeg_encode(np.zeros((8, 8), dtype=np.uint8)))
    idx = bytes(blob).find(b"\xff\xc0")
    blob[idx + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive"):
        jpeg_decode(bytes(blob))


def test_rejects_truncated_stream():
    blob = jpeg_encode(
        _rng(7).randint(0, 256, size=(16, 16)).astype(np.uint8)
    )
    with pytest.raises(ValueError):
        jpeg_decode(blob[: len(blob) // 2])


def test_decode_image_routes_jpeg():
    from crypto_lakehouse_spark.operators.multimodal import decode_image

    vals = _rng(8).randint(0, 256, size=(2, 2))
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(
        np.uint8
    )
    dec = decode_image(jpeg_encode(img, qtable=np.full((8, 8), 8)))
    assert np.array_equal(dec, img)
