"""Pure stdlib+numpy media codecs for the multimodal operators.

No PIL/opencv exists in this environment, but several ubiquitous
formats are fully decodable with the standard library:

- PNG (RFC 2083): zlib inflate + per-scanline unfiltering (Sub/Up/
  Average/Paeth) vectorized per row in numpy. Bit depth 8, color
  types 0/2/4/6 (gray, RGB, gray+alpha, RGBA), non-interlaced.
- PPM (netpbm P6) and BMP (24-bit BI_RGB): trivial containers.
- WAV (RIFF PCM) via the stdlib ``wave`` module.
- JPEG (ITU-T T.81 baseline sequential) via the pure-numpy Huffman +
  IDCT codec in ``operators/jpeg.py`` — stream-defined tables, 4:2:0/
  4:2:2 upsampling, restart markers; non-baseline modes fall back to
  PIL when importable.

Video: uncompressed-DIB AVI decodes natively, and so does
Motion-JPEG AVI (each frame an independent baseline JPEG through the
T.81 codec) — the standard compressed transport cameras produce.
Inter-frame codecs (H.264 etc.) need a real codec library; the
dispatch keeps a clean drop-in slot for them.

Encoders exist so tests and gates can synthesize real payloads
deterministically from testdata columns.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> (H, W, C) uint8. Supports bit depth 8, color types
    0/2/4/6, non-interlaced (the overwhelming majority of PNGs)."""
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = None
    idat = []
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8 supported)")
            if color_type not in _CHANNELS:
                raise NotImplementedError(f"PNG color type {color_type}")
            if interlace:
                raise NotImplementedError("interlaced PNG")
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG payload size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        line = rows[y, 1:].astype(np.int32)
        f = filters[y]
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        cur = np.empty(stride, dtype=np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # Up — vectorizable whole-row
            cur = (line + prev) & 0xFF
        else:
            # Sub/Average/Paeth reference the left pixel -> sequential
            # over pixels, vectorized over channels
            cur[:] = 0
            for x in range(0, stride, ch):
                a = cur[x - ch : x] if x else np.zeros(ch, dtype=np.int32)
                b = prev[x : x + ch]
                if f == 1:
                    cur[x : x + ch] = (line[x : x + ch] + a) & 0xFF
                elif f == 3:
                    cur[x : x + ch] = (line[x : x + ch] + ((a + b) >> 1)) & 0xFF
                elif f == 4:
                    c = prev[x - ch : x] if x else np.zeros(ch, dtype=np.int32)
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                    )
                    cur[x : x + ch] = (line[x : x + ch] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(height, width, ch)


def encode_png(img: np.ndarray) -> bytes:
    """(H, W[, C]) uint8 -> PNG (filter 0, one IDAT)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_ppm(data: bytes) -> np.ndarray:
    """netpbm P6 -> (H, W, 3) uint8."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment line
            pos = data.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(data) and not data[end : end + 1].isspace():
            end += 1
        fields.append(int(data[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("PPM maxval != 255")
    return np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(
        h, w, 3
    )


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (H, W, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    (hsz,) = struct.unpack("<I", data[14:18])
    w, h = struct.unpack("<ii", data[18:26])
    bpp, comp = struct.unpack("<HI", data[28:34])
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only 24-bit BI_RGB BMPs")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=off).reshape(
        h, stride
    )
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flip else img


def encode_bmp(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    body = b"".join(
        img[y, :, ::-1].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF PCM WAV -> ((n_frames, channels) int16, sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV")
        frames = wf.readframes(wf.getnframes())
        arr = np.frombuffer(frames, dtype="<i2").reshape(-1, wf.getnchannels())
        return arr, wf.getframerate()


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def encode_avi(frames: np.ndarray, fps: int = 2, codec: str = "DIB") -> bytes:
    """(n, H, W, 3) uint8 RGB -> AVI (RIFF). ``codec="DIB"`` writes
    uncompressed 24-bit bottom-up BGR frames (the rawvideo format
    every AVI tool accepts); ``codec="MJPG"`` writes Motion-JPEG —
    each frame an independent baseline JPEG from the from-scratch
    T.81 encoder (operators/jpeg.py), the standard compressed-AVI
    transport cameras produce."""
    if codec not in ("DIB", "MJPG"):
        raise ValueError("codec must be DIB or MJPG")
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    frame_size = stride * h

    def chunk(cid: bytes, body: bytes) -> bytes:
        b = cid + struct.pack("<I", len(body)) + body
        return b + (b"\x00" if len(body) % 2 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # us per frame
        frame_size * fps,  # max bytes/sec
        0,
        0,  # no AVIF_HASINDEX: no idx1 chunk is written
        n,
        0,
        1,
        frame_size,
        w,
        h,
        0,
        0,
        0,
        0,
    )
    fourcc = b"DIB " if codec == "DIB" else b"MJPG"
    compression = 0 if codec == "DIB" else struct.unpack("<I", b"MJPG")[0]
    strh = b"vids" + fourcc + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0, 0)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, compression, frame_size, 2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks = []
    if codec == "MJPG":
        from shc_spark.operators import jpeg as _jpeg

        for f in range(n):
            movi_chunks.append(chunk(b"00dc", _jpeg.encode(frames[f])))
    else:
        for f in range(n):
            rows = b"".join(
                frames[f, y, :, ::-1].tobytes() + b"\x00" * pad
                for y in range(h - 1, -1, -1)
            )
            movi_chunks.append(chunk(b"00db", rows))
    movi = lst(b"movi", b"".join(movi_chunks))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(data: bytes) -> tuple[np.ndarray, float]:
    """Uncompressed-DIB AVI -> ((n, H, W, 3) uint8 RGB, fps). Walks the
    RIFF tree stream-aware: the VIDEO stream's strh gives the exact
    rational frame rate (rate/scale, kept as float — 30000/1001 stays
    29.97), its strf the dimensions, and only that stream's frame
    chunks ('NNdb'/'NNdc' for its stream index) are decoded — an AVI
    whose first stream is audio parses correctly."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    fps = w = h = None
    vid_stream = None
    stream_no = 0
    in_video_strl = False
    compression = b"\x00\x00\x00\x00"
    frames = []

    def walk(pos: int, end: int) -> None:
        nonlocal fps, w, h, vid_stream, stream_no, in_video_strl, compression
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + ln)
            elif cid == b"strh":
                in_video_strl = data[body_start : body_start + 4] == b"vids"
                if in_video_strl and vid_stream is None:
                    vid_stream = stream_no
                    scale, rate = struct.unpack(
                        "<II", data[body_start + 20 : body_start + 28]
                    )
                    if rate == 0 or scale == 0:
                        raise ValueError("AVI video stream has no frame rate")
                    fps = rate / scale
                stream_no += 1
            elif cid == b"strf" and in_video_strl and w is None:
                w_, h_, _, bpp = struct.unpack("<iiHH", data[body_start + 4 : body_start + 16])
                compression = data[body_start + 16 : body_start + 20]
                if compression not in (b"\x00\x00\x00\x00", b"MJPG") or (
                    compression == b"\x00\x00\x00\x00" and bpp != 24
                ):
                    raise NotImplementedError(
                        "only 24-bit DIB or MJPG AVI frames"
                    )
                w, h = w_, abs(h_)
            elif (
                vid_stream is not None
                and cid[:2] == b"%02d" % vid_stream
                and cid[2:] in (b"db", b"dc")
            ):
                frames.append(data[body_start : body_start + ln])
            pos = body_start + ln + (ln % 2)

    walk(12, len(data))
    if w is None or fps is None:
        raise ValueError("truncated AVI")
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    if compression == b"MJPG":
        # Motion-JPEG: every frame is an independent baseline JPEG —
        # decoded by the from-scratch T.81 decoder (operators/jpeg.py)
        for i, fb in enumerate(frames):
            img = decode_jpeg(bytes(fb))
            if img.ndim == 2:
                img = img[:, :, None]
            if img.shape[2] == 1:
                img = np.repeat(img, 3, axis=2)
            if img.shape[0] != h or img.shape[1] != w:
                raise ValueError("MJPG frame size differs from stream header")
            out[i] = img[:, :, :3]
        return out, fps
    stride = (w * 3 + 3) & ~3
    for i, fb in enumerate(frames):
        rows = np.frombuffer(fb, dtype=np.uint8, count=h * stride).reshape(h, stride)
        out[i] = rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]  # bottom-up BGR
    return out, fps


def _pil_image():
    """Runtime feature probe: PIL is not baked into every container;
    when present, JPEG decode lights up with no code change."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG -> (H, W, C) uint8. Baseline sequential (SOF0), extended
    sequential (SOF1) and progressive (SOF2) JPEGs — virtually all
    real-world files — decode through the pure-numpy T.81
    implementation in operators/jpeg.py, tables read from the stream.
    Remaining modes (12-bit, arithmetic-coded, hierarchical, lossless)
    fall back to PIL when importable, else NotImplementedError."""
    from shc_spark.operators import jpeg as _jpeg

    try:
        return _jpeg.decode(data)
    except ValueError as err:
        Image = _pil_image()
        if Image is None:
            raise NotImplementedError(
                f"unsupported JPEG variant without a codec library: {err}"
            ) from err
        import io

        with Image.open(io.BytesIO(data)) as img:
            return np.asarray(img.convert("RGB"), dtype=np.uint8)


def decode_image(data: bytes, mime: str | None = None) -> np.ndarray:
    """Magic-byte dispatch -> (H, W, C) uint8. Baseline, extended
    sequential and progressive JPEG decode natively
    (operators/jpeg.py); exotic variants (12-bit, arithmetic,
    lossless) need PIL, else NotImplementedError."""
    if data.startswith(_PNG_MAGIC):
        return decode_png(data)
    if data.startswith(b"P6"):
        return decode_ppm(data)
    if data.startswith(b"BM"):
        return decode_bmp(data)
    if data.startswith(b"\xff\xd8"):
        return decode_jpeg(data)
    raise ValueError(f"unrecognized image payload (mime={mime!r})")
