"""Baseline JPEG pixel codec (functions/jpeg.py, round 5): huffman +
IDCT decode against the from-scratch encoder, exactness on DC-only
streams, both huffman decode paths, malformed-stream rejection, and the
registry wiring (image/jpeg builtin = pixel decoder, image/jpeg+meta =
structural parser, resize default = decode->box-average->re-encode).

Parity anchor: the decoder implements the public interchange format of
ITU T.81 (reference repo has no media code — this surface is an
LLM-pipeline addition, not a reference port)."""

import numpy as np
import pytest

from batch_jaro_winkler_spark.functions.jpeg import (
    _DCT_A,
    _BitReader,
    _HuffDecoder,
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg_baseline,
    encode_jpeg_gray,
    jpeg_features,
    jpeg_pixel_features,
    resize_jpeg,
)


def test_dct_basis_matches_definition():
    """_DCT_A encodes the orthonormal DCT-II: A @ A.T == I, and
    f = A.T F A reproduces the direct T.81 double-sum IDCT."""
    assert np.allclose(_DCT_A @ _DCT_A.T, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(7)
    F = rng.normal(scale=100, size=(8, 8))
    got = _DCT_A.T @ F @ _DCT_A
    want = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.5) if u == 0 else 1.0
                    cv = np.sqrt(0.5) if v == 0 else 1.0
                    s += (
                        cu * cv / 4.0 * F[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            want[x, y] = s
    assert np.allclose(got, want, atol=1e-9)


def test_zigzag_is_a_permutation():
    assert sorted(_ZIGZAG.tolist()) == list(range(64))
    # spot-check the spec corners
    assert _ZIGZAG[0] == 0 and _ZIGZAG[1] == 1 and _ZIGZAG[2] == 8
    assert _ZIGZAG[63] == 63


def test_huffman_decode_both_paths():
    """Short codes resolve via the 8-bit lookahead LUT, long (>8 bit)
    codes via the mincode/maxcode walk — one stream exercising both."""
    # canonical table: 'A' -> 0 (1 bit), 'B' -> 10 (2 bits),
    # 'C' -> 110000000 (9 bits), 'D' -> 110000001 (9 bits)
    counts = [1, 1, 0, 0, 0, 0, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0]
    table = _HuffDecoder(counts, b"ABCD")
    bits = "0" "10" "110000000" "110000001" "0"
    padded = bits + "1" * ((8 - len(bits) % 8) % 8)
    data = bytes(int(padded[i : i + 8], 2) for i in range(0, len(padded), 8))
    r = _BitReader([data])
    assert bytes(r.decode(table) for _ in range(5)) == b"ABCDA"


def test_bitreader_restart_and_receive_extend():
    r = _BitReader([b"\xA5", b"\xFF"])
    assert r.read(4) == 0xA
    r.restart()
    assert r.read(8) == 0xFF
    # receive_extend: T.81 F.2.2.1 sign extension
    r = _BitReader([bytes([0b01101101])])
    assert r.receive_extend(2) == -2  # bits 01 -> 1 - 3
    assert r.receive_extend(2) == 2   # bits 10 -> 2
    assert r.receive_extend(3) == 6   # bits 110 -> 6 (positive: MSB set)
    assert r.receive_extend(0) == 0


@pytest.mark.parametrize("shape", [(8, 8), (24, 17), (1, 1), (9, 23)])
def test_roundtrip_gray(shape):
    rng = np.random.default_rng(hash(shape) % 2**31)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg_baseline(img))
    assert dec.shape == (*shape, 1)
    assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 2


def test_roundtrip_rgb_and_subsampled():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (19, 22, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg_baseline(img))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3
    # 4:2:0: constant-within-2x2 colors survive subsample+replicate
    base = rng.integers(0, 256, (10, 11, 3))
    big = np.repeat(np.repeat(base, 2, 0), 2, 1).astype(np.uint8)
    dec2 = decode_jpeg(encode_jpeg_baseline(big, subsample=True))
    assert dec2.shape == big.shape
    assert np.abs(dec2.astype(int) - big.astype(int)).max() <= 3


def test_roundtrip_restart_intervals():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 16), dtype=np.uint8)
    for ri in (1, 2, 5):
        data = encode_jpeg_baseline(img, restart_interval=ri)
        assert b"\xff\xdd" in data  # DRI present
        dec = decode_jpeg(data)
        assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 2
    # >8 restart segments wraps the RSTn modulo-8 counter (15 MCUs here)
    img2 = rng.integers(0, 256, (40, 24), dtype=np.uint8)
    data = encode_jpeg_baseline(img2, restart_interval=1)
    assert b"\xff\xd0" in data and b"\xff\xd7" in data
    dec = decode_jpeg(data)
    assert np.abs(dec[:, :, 0].astype(int) - img2.astype(int)).max() <= 2


def test_blockwise_constant_is_exact():
    """Blockwise-constant images quantize to a lone DC coefficient and
    DC-only IDCT is exact — the mm_jpeg_decode oracle's premise."""
    for seed in range(3):
        rng = np.random.default_rng(seed)
        blocks = rng.integers(0, 256, (3, 5))
        img = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg_baseline(img))
        assert (dec[:, :, 0] == img).all()


def test_quant_table_roundtrip():
    """A non-trivial qtable survives DQT zigzag storage: coarse
    quantization stays close on smooth content."""
    x = np.linspace(0, 230, 32)
    img = (x[None, :] + x[:, None] / 2).astype(np.uint8)
    q = np.full(64, 1, np.int32)
    q[1:] = 4  # coarse AC, exact DC
    dec = decode_jpeg(encode_jpeg_baseline(img, qtable=q))
    assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 6


def test_decoder_rejects():
    img = np.full((8, 8), 40, np.uint8)
    good = encode_jpeg_baseline(img)
    # progressive (SOF2) refused by the PIXEL path...
    prog = good.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)
    # ...but still parsed by the structural path
    assert jpeg_features([prog])[0][4] == 1.0
    # structure-only fixtures carry no decodable scan tables
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg_gray(8, 8))
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")


def test_pixel_features_match_decode():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    data = encode_jpeg_baseline(img)
    f = jpeg_pixel_features([data])[0]
    px = decode_jpeg(data)[:, :, 0].astype(np.float64)
    assert f[:3].tolist() == [24.0, 16.0, 1.0]
    assert abs(f[3] - px.mean() / 255.0) < 1e-6
    assert abs(f[5] - px.min() / 255.0) < 1e-6
    assert abs(f[6] - px.max() / 255.0) < 1e-6
    hist = np.histogram(px, bins=8, range=(0.0, 256.0))[0] / px.size
    assert np.allclose(f[8:16], hist, atol=1e-6)


def test_resize_jpeg_box_average():
    """decode -> exact box-average -> re-encode: halving a blockwise
    image lands on the block means (re-encode error <= 2)."""
    blocks = np.array([[0, 64], [128, 255]])
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
    out = resize_jpeg(encode_jpeg_baseline(img), width=2, height=2)
    dec = decode_jpeg(out)[:, :, 0]
    assert np.abs(dec.astype(int) - blocks).max() <= 2


def test_registry_routes_pixel_and_meta(spark):
    """image/jpeg builtin decodes pixels; batch_mime='image/jpeg+meta'
    reaches the structural parser for the SAME payload."""
    from batch_jaro_winkler_spark import multimodal as mm

    img = np.repeat(np.repeat(np.array([[10, 200]]), 8, 0), 8, 1).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, encode_jpeg_baseline(img))], "doc_id long, payload binary"
    )
    pix = mm.decode_features(df).collect()[0]
    assert pix["mime"] == "image/jpeg" and pix["decode_error"] is None
    assert pix["features"][:3] == [16.0, 8.0, 1.0]
    assert abs(pix["features"][5] - 10.0 / 255.0) < 1e-4
    assert abs(pix["features"][6] - 200.0 / 255.0) < 1e-4
    meta = mm.decode_features(df, batch_mime="image/jpeg+meta").collect()[0]
    assert meta["features"][:4] == [16.0, 8.0, 1.0, 8.0]

    thumbs = mm.resize_images(df, 1, 1).collect()[0]
    assert thumbs["resize_error"] is None
    dec = decode_jpeg(bytes(thumbs["thumb"]))
    assert dec.shape == (1, 1, 1)
    assert abs(int(dec[0, 0, 0]) - 105) <= 2  # mean of 10 and 200
