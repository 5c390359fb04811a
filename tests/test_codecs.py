"""Codec contract vectors: decoded arrays pinned against handcrafted
payloads so any future codec swap-in (PIL/opencv) can be verified
against the same expectations."""

import struct
import zlib

import numpy as np
import pytest

from shc_spark.operators import codecs


def test_png_roundtrip_rgb():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (7, 5, 3), dtype=np.uint8)
    assert (codecs.decode_png(codecs.encode_png(img)) == img).all()


def test_png_roundtrip_gray_and_alpha():
    rng = np.random.RandomState(4)
    for ch in (1, 2, 4):
        img = rng.randint(0, 256, (4, 6, ch), dtype=np.uint8)
        got = codecs.decode_png(codecs.encode_png(img))
        assert got.shape == (4, 6, ch) and (got == img).all()


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Handcraft a gray PNG using the given per-row filter types —
    the encoder only emits filter 0, so this exercises unfiltering."""
    h, w = img.shape
    out_rows = []
    prev = np.zeros(w, dtype=np.int32)
    for y, f in enumerate(filters):
        cur = img[y].astype(np.int32)
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - np.concatenate(([0], cur[:-1]))) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            left = np.concatenate(([0], cur[:-1]))
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # paeth
            left = np.concatenate(([0], cur[:-1]))
            ul = np.concatenate(([0], prev[:-1]))
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            enc = (cur - pred) & 0xFF
        out_rows.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(out_rows)))
        + chunk(b"IEND", b"")
    )


def test_png_all_filter_types():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (5, 8), dtype=np.uint8)
    payload = _png_with_filters(img, [0, 1, 2, 3, 4])
    got = codecs.decode_png(payload)
    assert (got[:, :, 0] == img).all()


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        codecs.decode_png(b"nope")


def test_jpeg_numpy_roundtrip_444_and_420():
    """Baseline JPEG decodes WITHOUT any codec library: the pure-numpy
    T.81 implementation roundtrips its own encoder's output at 4:4:4
    near-losslessly (flat quantization -> DCT rounding only) and
    within chroma-upsampling error at 4:2:0."""
    from shc_spark.operators import jpeg

    rng = np.random.RandomState(7)
    img = np.repeat(
        np.repeat(rng.randint(0, 256, (3, 4, 3), dtype=np.uint8), 16, axis=0), 16, axis=1
    )
    got = codecs.decode_image(jpeg.encode(img))
    assert got.shape == img.shape and got.dtype == np.uint8
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 3
    got420 = codecs.decode_image(jpeg.encode(img, subsample=True))
    # chroma constant within 16x16 blocks -> 4:2:0 loses nothing here
    assert np.abs(got420.astype(int) - img.astype(int)).max() <= 3
    # non-multiple-of-8 dims + gradient content
    xx, yy = np.meshgrid(np.arange(37), np.arange(29))
    img2 = np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)
    g444 = codecs.decode_image(jpeg.encode(img2))
    assert g444.shape == img2.shape
    assert np.abs(g444.astype(int) - img2.astype(int)).max() <= 3
    g420 = codecs.decode_image(jpeg.encode(img2, subsample=True))
    assert g420.shape == img2.shape
    assert np.abs(g420.astype(int) - img2.astype(int)).mean() <= 4


def test_jpeg_rejects_garbage_and_nonbaseline():
    from shc_spark.operators import jpeg

    with pytest.raises(ValueError):
        jpeg.decode(b"nope")
    # arithmetic-coded SOF9 -> ValueError from the numpy path;
    # decode_image turns it into NotImplementedError when no PIL exists
    fake_sof9 = b"\xff\xd8\xff\xc9" + bytes([0, 8, 8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    with pytest.raises(ValueError):
        jpeg.decode(fake_sof9)
    if codecs._pil_image() is None:
        with pytest.raises(NotImplementedError):
            codecs.decode_image(fake_sof9)
    # progressive with no SOS is still malformed
    fake_sof2 = b"\xff\xd8\xff\xc2" + bytes([0, 8, 8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    with pytest.raises(ValueError):
        jpeg.decode(fake_sof2)


def test_jpeg_pil_cross_check_when_available():
    """When a real codec library exists, its decode of OUR encoder's
    output must agree with the numpy decoder (cross-implementation
    contract); skipped silently when PIL is absent."""
    Image = codecs._pil_image()
    if Image is None:
        return
    import io

    from shc_spark.operators import jpeg

    rng = np.random.RandomState(11)
    img = np.repeat(
        np.repeat(rng.randint(0, 256, (2, 3, 3), dtype=np.uint8), 16, axis=0), 16, axis=1
    )
    data = jpeg.encode(img)
    theirs = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), dtype=np.uint8)
    ours = jpeg.decode(data)
    assert np.abs(theirs.astype(int) - ours.astype(int)).max() <= 2


def test_ppm_roundtrip_and_comment():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (3, 4, 3), dtype=np.uint8)
    assert (codecs.decode_ppm(codecs.encode_ppm(img)) == img).all()
    with_comment = b"P6\n# a comment\n4 3\n255\n" + img.tobytes()
    assert (codecs.decode_ppm(with_comment) == img).all()


def test_bmp_roundtrip_padding():
    rng = np.random.RandomState(7)
    # width 3 -> 9-byte rows padded to 12: exercises stride handling
    img = rng.randint(0, 256, (5, 3, 3), dtype=np.uint8)
    assert (codecs.decode_bmp(codecs.encode_bmp(img)) == img).all()


def test_wav_roundtrip():
    rng = np.random.RandomState(8)
    mono = rng.randint(-32768, 32767, 100, dtype=np.int16)
    arr, rate = codecs.decode_wav(codecs.encode_wav(mono, 8000))
    assert rate == 8000 and (arr[:, 0] == mono).all()
    stereo = rng.randint(-32768, 32767, (50, 2), dtype=np.int16)
    arr2, _ = codecs.decode_wav(codecs.encode_wav(stereo, 44100))
    assert (arr2 == stereo).all()


def test_decode_image_dispatch():
    img = np.full((2, 2, 3), 9, dtype=np.uint8)
    for enc in (codecs.encode_png, codecs.encode_ppm, codecs.encode_bmp):
        assert (codecs.decode_image(enc(img)) == img).all()


def test_known_pixel_vector():
    """Contract vector: a 4x4 gray PNG whose pixels are 0..15 decodes
    to exactly those values, mean luma = 7.5/255."""
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    dec = codecs.decode_png(codecs.encode_png(img))
    assert dec[:, :, 0].ravel().tolist() == list(range(16))
    assert abs(dec.astype(float).mean() - 7.5) < 1e-9


def test_avi_roundtrip():
    rng = np.random.RandomState(9)
    frames = rng.randint(0, 256, (5, 4, 3, 3), dtype=np.uint8)
    data = codecs.encode_avi(frames, fps=4)
    got, fps = codecs.decode_avi(data)
    assert fps == 4 and got.shape == frames.shape and (got == frames).all()


def test_avi_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.decode_avi(b"RIFFxxxxWAVE")


def test_jpeg_property_random_images_roundtrip():
    """Randomized sizes/content: 4:4:4 flat-quant roundtrip stays
    within DCT-rounding error; 4:2:0 within chroma-upsampling error;
    shapes always exact."""
    from shc_spark.operators import jpeg

    rng = np.random.RandomState(42)
    for _ in range(8):
        h = int(rng.randint(1, 40))
        w = int(rng.randint(1, 40))
        base = float(rng.randint(60, 196))
        yy = np.linspace(0, 2, h)[:, None]
        xx = np.linspace(0, 2, w)[None, :]
        g = np.clip(base + 40 * np.sin(yy) + 40 * np.cos(xx), 0, 255).astype(np.uint8)
        img = np.stack([g] * 3, axis=-1)  # grayscale -> chroma constant
        got = jpeg.decode(jpeg.encode(img))
        assert got.shape == img.shape
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 3
        # grayscale content: 4:2:0 chroma subsampling loses nothing
        got420 = jpeg.decode(jpeg.encode(img, subsample=True))
        assert got420.shape == img.shape
        assert np.abs(got420.astype(int) - img.astype(int)).max() <= 3


def test_jpeg_progressive_equals_baseline_decode():
    """With flat quantization the progressive stream transports the
    IDENTICAL coefficients as the baseline stream — so both decodes
    must match exactly, across every scan type the 6-scan script
    exercises (DC first/refine, banded AC first with EOB runs, AC
    refinement correction bits), at 4:4:4 and 4:2:0, including
    non-multiple-of-8/16 dims."""
    import numpy as np

    from shc_spark.operators import jpeg

    rng = np.random.default_rng(42)
    for h, w in [(8, 8), (17, 23), (40, 33)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (
            jpeg.decode(jpeg.encode_progressive(img))
            == jpeg.decode(jpeg.encode(img))
        ).all()
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    assert (
        jpeg.decode(jpeg.encode_progressive(img, subsample=True))
        == jpeg.decode(jpeg.encode(img, subsample=True))
    ).all()
    # smooth gradient: long EOB runs and mostly-zero high bands
    x = np.linspace(0, 255, 64)[None, :].repeat(48, 0)
    img = np.stack([x, x[::-1], np.full_like(x, 128)], axis=-1).astype(np.uint8)
    assert (
        jpeg.decode(jpeg.encode_progressive(img))
        == jpeg.decode(jpeg.encode(img))
    ).all()


def test_jpeg_progressive_decodes_via_dispatch():
    import numpy as np

    from shc_spark.operators import codecs, jpeg

    img = np.random.default_rng(0).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = codecs.decode_image(jpeg.encode_progressive(img))
    assert out.shape == (16, 16, 3)


def test_mjpeg_avi_roundtrip():
    """Motion-JPEG AVI: flat 8x8 blocks survive the baseline-JPEG
    transport EXACTLY (the same invariant the JPEG contract tests
    pin), arbitrary frames come back within DCT rounding, and the
    stream header's fps/dimensions parse like the DIB path."""
    import numpy as np

    from shc_spark.operators.codecs import decode_avi, encode_avi

    # flat-block frames: each frame one gray level per 8x8 tile
    levels = np.array([10, 200, 60, 61, 255], dtype=np.uint8)
    frames = np.stack([np.full((8, 8, 3), v, dtype=np.uint8) for v in levels])
    avi = encode_avi(frames, fps=3, codec="MJPG")
    back, fps = decode_avi(avi)
    assert fps == 3.0 and back.shape == frames.shape
    assert np.array_equal(back, frames)

    # textured frames: lossy but bounded (flat quantization => DCT
    # rounding only)
    rng = np.random.RandomState(3)
    tex = rng.randint(0, 256, size=(2, 16, 24, 3), dtype=np.uint8)
    back2, _ = decode_avi(encode_avi(tex, fps=2, codec="MJPG"))
    assert back2.shape == tex.shape
    assert np.max(np.abs(back2.astype(int) - tex.astype(int))) <= 8

    # DIB path unchanged
    back3, _ = decode_avi(encode_avi(tex, fps=2, codec="DIB"))
    assert np.array_equal(back3, tex)
