"""Pure-numpy baseline JPEG codec (ITU-T T.81, public spec).

No codec library exists in this container, so the multimodal layer
gets a from-scratch implementation of baseline sequential JPEG:

- ``decode``: SOI/APP/DQT/SOF0/DHT/DRI/SOS parsing, Huffman-decoded
  MCUs with byte-unstuffing and restart markers, dequantize + zigzag +
  8x8 IDCT, chroma upsampling for 4:2:0/4:2:2, JFIF YCbCr->RGB. The
  tables come from the STREAM, so any baseline JPEG (the overwhelming
  majority of real-world files) decodes — not just our own output.
- ``encode``: 4:4:4 (or 4:2:0 with ``subsample=True``) baseline
  writer used to produce self-contained test vectors (flat
  quantization => near-lossless roundtrip). It declares its own valid
  canonical Huffman tables (all 12 DC categories at 4 bits; the 256
  AC symbols at 9-10 bits — Kraft-satisfying, a legal if non-optimal
  code), sidestepping any dependence on the Annex-K example tables.

Python-loop Huffman decoding is fine for the Arrow-batch sizes the
multimodal operators feed it (thumbnails/sample frames); swap in a
library via codecs._pil_image() when one is available.

Progressive (SOF2) decodes natively too: per-scan spectral selection
(Ss..Se) and successive approximation (Ah/Al) accumulate into
per-component coefficient arrays across scans (DC first/refine,
AC first with EOB runs, AC refinement with correction bits — T.81
G.2), reconstructed with the same dequant/IDCT/upsample tail as
baseline. Extended sequential (SOF1, 8-bit) shares the baseline path.

Arithmetic-coded, 12-bit, hierarchical, and lossless modes raise
ValueError (dispatched to PIL when importable).
"""

from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal 8-point DCT-II matrix; IDCT(X) = T.T @ X @ T
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _T[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _idct2(block: np.ndarray) -> np.ndarray:
    return _T.T @ block @ _T


def _dct2(block: np.ndarray) -> np.ndarray:
    return _T @ block @ _T.T


class _Huff:
    """Canonical Huffman table: (BITS[1..16], HUFFVAL) -> decode map."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any marker and records it."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _load(self) -> bool:
        d = self.data
        p = self.pos
        if p >= len(d):
            return False
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos = p + 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: consumed by caller
                self.marker = nxt
                return False
            else:
                self.marker = nxt
                return False
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.n += 8
        return True

    def bits(self, k: int) -> int:
        while self.n < k:
            if not self._load():
                # pad with zeros at the tail (spec: remaining bits of
                # the last byte are padding 1s; zeros are equally safe
                # for a well-formed stream that ends at EOB)
                self.acc <<= 8
                self.n += 8
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        return v

    def huff(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def skip_restart(self) -> None:
        self.acc = 0
        self.n = 0
        self.pos += 2  # consume FF Dx
        self.marker = None

    def align_to_marker(self) -> None:
        d, p = self.data, self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and d[p + 1] != 0x00):
            p += 1
        self.pos = p


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode(data: bytes) -> np.ndarray:
    """Baseline/extended-sequential/progressive JPEG bytes ->
    (H, W, 3) or (H, W, 1) uint8."""
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}  # (class 0=DC/1=AC, id)
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    progressive = False
    n_scans = 0
    coefs: list[np.ndarray] | None = None  # per-comp (by, bx, 64) zigzag
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 15
                if pq:
                    raise ValueError("16-bit quantization tables unsupported")
                qt[tq] = np.frombuffer(seg[s + 1 : s + 65], dtype=np.uint8).astype(np.int32)
                s += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            if progressive:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                coefs = [
                    np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
                    for c in comps
                ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG mode (SOF{marker - 0xC0})")
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 15
                bits = list(seg[s + 1 : s + 17])
                nv = sum(bits)
                vals = list(seg[s + 17 : s + 17 + nv])
                huff[(tc, th)] = _Huff(bits, vals)
                s += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                ci = next(i for i, x in enumerate(comps) if x["id"] == cs)
                scan.append({**comps[ci], "dc": tt >> 4, "ac": tt & 15, "ci": ci})
            if not progressive:
                pos += seglen
                return _decode_scan(data, pos, h, w, scan, qt, huff, restart_interval)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            pos = _progressive_scan(
                data, pos + seglen, scan, comps, coefs, restart_interval,
                h, w, ss, se, ah, al, huff,
            )
            n_scans += 1
            continue
        pos += seglen
    if progressive and coefs is not None and n_scans:
        return _reconstruct(comps, coefs, qt, h, w)
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, h, w, scan, qt, huff, restart_interval) -> np.ndarray:
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64) for c in scan
    ]
    br = _BitReader(data, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_to_marker()
                if br.marker is None and br.pos + 1 < len(br.data):
                    br.marker = br.data[br.pos + 1]
                if br.marker is not None and 0xD0 <= br.marker <= 0xD7:
                    br.skip_restart()
                    pred = [0] * len(scan)
            for ci, c in enumerate(scan):
                q = qt[c["tq"]]
                dct = huff[(0, c["dc"])]
                act = huff[(1, c["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        s = br.huff(dct)
                        diff = _extend(br.bits(s), s) if s else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = br.huff(act)
                            r, size = rs >> 4, rs & 15
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = zz * q
                        px = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(scan):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    return _to_image(full)


def _to_image(full: list[np.ndarray]) -> np.ndarray:
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255)
        return y.astype(np.uint8)[..., None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    # round (as every real decoder does) — truncation would turn an
    # exactly-representable sample v arriving as v-1e-13 into v-1
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive mode (SOF2): every scan delivers a slice of the
# coefficient data — a spectral band Ss..Se at approximation bit Al —
# accumulated into per-component zigzag coefficient arrays; pixels
# exist only after the final _reconstruct.


def _comp_blocks(c: dict, h: int, w: int, hmax: int, vmax: int) -> tuple[int, int]:
    """Non-interleaved block-grid dims of a component (T.81 A.1.1):
    ceil over the DOWNSAMPLED component size, not the padded plane."""
    cw = -(-w * c["h"] // hmax)
    ch = -(-h * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _progressive_scan(
    data, pos, scan, comps, coefs, restart_interval, h, w, ss, se, ah, al, huff
) -> int:
    """Decode one progressive scan into ``coefs``; return the stream
    position aligned at the next marker."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    br = _BitReader(data, pos)
    pred = [0] * len(scan)
    state = {"eobrun": 0}

    def dc_block(c, by, bx, si):
        zz = coefs[c["ci"]][by, bx]
        if ah == 0:
            s = br.huff(huff[(0, c["dc"])])
            diff = _extend(br.bits(s), s) if s else 0
            pred[si] += diff
            zz[0] = pred[si] << al
        elif br.bits(1):
            zz[0] |= 1 << al

    def ac_first(c, by, bx):
        zz = coefs[c["ci"]][by, bx]
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        act = huff[(1, c["ac"])]
        k = ss
        while k <= se:
            rs = br.huff(act)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += br.bits(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC index overflow in progressive scan")
            zz[k] = _extend(br.bits(s), s) << al
            k += 1

    def ac_refine(c, by, bx):
        # correction-bit pass (T.81 G.2.2): every already-nonzero
        # coefficient visited consumes one bit; new coefficients are
        # +-1 at this bit position
        zz = coefs[c["ci"]][by, bx]
        act = huff[(1, c["ac"])]
        bit = 1 << al
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = br.huff(act)
                r, s = rs >> 4, rs & 15
                newval = 0
                if s == 0:
                    if r < 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += br.bits(r)
                        break
                    # r == 15: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("bad refinement magnitude in AC scan")
                    newval = bit if br.bits(1) else -bit
                while k <= se:
                    if zz[k] != 0:
                        if br.bits(1) and (zz[k] & bit) == 0:
                            zz[k] += bit if zz[k] > 0 else -bit
                    else:
                        if r == 0:
                            if newval:
                                zz[k] = newval
                            k += 1
                            break
                        r -= 1
                    k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if zz[k] != 0 and br.bits(1) and (zz[k] & bit) == 0:
                    zz[k] += bit if zz[k] > 0 else -bit
                k += 1
            state["eobrun"] -= 1

    def do_unit(c, by, bx, si):
        if ss == 0:
            dc_block(c, by, bx, si)
        elif ah == 0:
            ac_first(c, by, bx)
        else:
            ac_refine(c, by, bx)

    def maybe_restart(count):
        if restart_interval and count and count % restart_interval == 0:
            br.align_to_marker()
            if br.marker is None and br.pos + 1 < len(br.data):
                br.marker = br.data[br.pos + 1]
            if br.marker is not None and 0xD0 <= br.marker <= 0xD7:
                br.skip_restart()
                pred[:] = [0] * len(scan)
                state["eobrun"] = 0

    if len(scan) == 1:
        c = scan[0]
        nby, nbx = _comp_blocks(c, h, w, hmax, vmax)
        n = 0
        for by in range(nby):
            for bx in range(nbx):
                maybe_restart(n)
                do_unit(c, by, bx, 0)
                n += 1
    else:
        if ss != 0:
            raise ValueError("interleaved progressive scan must be DC-only")
        n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart(n)
                for si, c in enumerate(scan):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            do_unit(c, my * c["v"] + by, mx * c["h"] + bx, si)
                n += 1
    br.align_to_marker()
    return br.pos


def _reconstruct(comps, coefs, qt, h, w) -> np.ndarray:
    """Dequantize + IDCT the accumulated progressive coefficients —
    the same tail as the baseline path, just fed from arrays."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        arr = coefs[ci]
        nby, nbx = arr.shape[:2]
        plane = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
        deq = (arr * q).astype(np.float64)  # vectorized dequant
        for by in range(nby):
            for bx in range(nbx):
                block = np.zeros(64, dtype=np.float64)
                block[_ZIGZAG] = deq[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _idct2(block.reshape(8, 8)) + 128.0
                )
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        full.append(plane[:h, :w])
    return _to_image(full)


# ---------------------------------------------------------------------------
# encoder (4:4:4 baseline, flat quantization, self-declared tables)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, k: int) -> None:
        self.acc = (self.acc << k) | (value & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.n:
            self.write(0xFF, 8 - self.n)  # pad with 1s per spec


_DC_BITS = [0, 0, 0, 12] + [0] * 12          # all 12 categories at 4 bits
_DC_VALS = list(range(12))
# all 256 AC symbols; DHT BITS entries are single bytes (<= 255), so
# 254 symbols take 9 bits and the last 2 take 10 (canonical, Kraft-ok)
_AC_BITS = [0] * 8 + [254, 2] + [0] * 6
_AC_VALS = list(range(256))


def _enc_codes(bits, vals):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_ENC = _enc_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _enc_codes(_AC_BITS, _AC_VALS)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode(img: np.ndarray, subsample: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JPEG bytes with flat (all-ones)
    quantization: the roundtrip error is DCT rounding only (~±1/level
    at 4:4:4), which makes deterministic contract vectors possible.
    ``subsample=True`` writes 4:2:0 (2x2-mean chroma), exercising the
    decoder's MCU/upsampling path the way real camera output does."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode expects (H, W, 3) uint8 RGB")
    h, w = img.shape[:2]
    rgb = img.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
    sampling = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    hmax = max(sh for sh, _ in sampling)
    vmax = max(sv for _, sv in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def edge_pad(p, th, tw):
        q = np.empty((th, tw))
        ph, pw = p.shape
        q[:ph, :pw] = p
        q[ph:, :pw] = p[ph - 1 : ph, :]
        q[:, pw:] = q[:, pw - 1 : pw]
        return q

    planes = []
    for (sh, sv), p in zip(sampling, (y, cb, cr)):
        if (sh, sv) != (hmax, vmax):
            fy, fx = vmax // sv, hmax // sh
            full = edge_pad(p, -(-h // fy) * fy, -(-w // fx) * fx)
            p = full.reshape(full.shape[0] // fy, fy, full.shape[1] // fx, fx).mean(axis=(1, 3))
        planes.append(edge_pad(p, mcuy * 8 * sv, mcux * 8 * sh))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    qtab = bytes([1] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qtab  # DQT id 0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, (sh, sv) in zip((1, 2, 3), sampling):
        out += bytes([cid, (sh << 4) | sv, 0])  # qtable 0
    for tc_th, bits, vals in ((0x00, _DC_BITS, _DC_VALS), (0x10, _AC_BITS, _AC_VALS)):
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals)) + bytes([tc_th])
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid in (1, 2, 3):
        out += bytes([cid, 0x00])  # DC table 0, AC table 0
    out += b"\x00\x3f\x00"  # Ss, Se, Ah/Al

    bw = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(sampling):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                        _emit_block(bw, block, pred, ci)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _emit_block(bw: _BitWriter, block: np.ndarray, pred: list[int], ci: int) -> None:
    coef = np.round(_dct2(block - 128.0)).astype(np.int32)
    zz = coef.reshape(64)[_ZIGZAG]
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    s = _category(diff)
    ln, code = _DC_ENC[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = max(np.nonzero(zz)[0]) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            ln, code = _AC_ENC[0x00]  # EOB
            bw.write(code, ln)
            break
        if v == 0:
            run += 1
            if run == 16:
                ln, code = _AC_ENC[0xF0]  # ZRL
                bw.write(code, ln)
                run = 0
            continue
        s = _category(v)
        ln, code = _AC_ENC[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0


# ---------------------------------------------------------------------------
# progressive encoder: used to produce self-contained progressive test
# vectors (no codec library in the container). Writes a 6-scan script
# that exercises every decoder path — interleaved DC first + DC
# refinement, per-component AC first scans with spectral bands and EOB
# runs, and AC refinement scans with correction bits. With the same
# flat quantization as `encode`, the coefficients transported are
# IDENTICAL to the baseline stream's, so progressive decode must equal
# baseline decode exactly — that equality is the contract test.


def _coef_arrays(img: np.ndarray, subsample: bool):
    """Shared front half of `encode`: color convert, subsample, pad,
    DCT -> per-component zigzag coefficient arrays (flat quant)."""
    h, w = img.shape[:2]
    rgb = img.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
    sampling = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    hmax = max(sh for sh, _ in sampling)
    vmax = max(sv for _, sv in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def edge_pad(p, th, tw):
        q = np.empty((th, tw))
        ph, pw = p.shape
        q[:ph, :pw] = p
        q[ph:, :pw] = p[ph - 1 : ph, :]
        q[:, pw:] = q[:, pw - 1 : pw]
        return q

    coefs = []
    for (sh, sv), p in zip(sampling, (y, cb, cr)):
        if (sh, sv) != (hmax, vmax):
            fy, fx = vmax // sv, hmax // sh
            full = edge_pad(p, -(-h // fy) * fy, -(-w // fx) * fx)
            p = full.reshape(full.shape[0] // fy, fy, full.shape[1] // fx, fx).mean(axis=(1, 3))
        plane = edge_pad(p, mcuy * 8 * sv, mcux * 8 * sh)
        nby, nbx = mcuy * sv, mcux * sh
        arr = np.zeros((nby, nbx, 64), dtype=np.int32)
        for by in range(nby):
            for bx in range(nbx):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                arr[by, bx] = np.round(_dct2(block - 128.0)).astype(np.int32).reshape(64)[_ZIGZAG]
        coefs.append(arr)
    return coefs, sampling, hmax, vmax, mcux, mcuy


def _pt_ac(v: int, al: int) -> int:
    """AC point transform (T.81 A.4.1): sign(v) * floor(|v| / 2^al)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


class _EobRun:
    """Pending EOB run + the correction bits buffered behind it."""

    def __init__(self, bw: _BitWriter):
        self.bw = bw
        self.n = 0
        self.corr: list[int] = []

    def flush(self) -> None:
        if not self.n:
            return
        r = self.n.bit_length() - 1
        ln, code = _AC_ENC[r << 4]
        self.bw.write(code, ln)
        if r:
            self.bw.write(self.n - (1 << r), r)
        for b in self.corr:
            self.bw.write(b, 1)
        self.n = 0
        self.corr = []


def _enc_ac_first(bw, eob, zz, ss, se, al):
    vals = [_pt_ac(int(zz[k]), al) for k in range(ss, se + 1)]
    nz = [i for i, v in enumerate(vals) if v]
    if not nz:
        eob.n += 1
        if eob.n == 0x7FFF:
            eob.flush()
        return
    eob.flush()
    run = 0
    last = nz[-1]
    for i, v in enumerate(vals):
        if i > last:
            break
        if v == 0:
            run += 1
            if run == 16:
                ln, code = _AC_ENC[0xF0]
                bw.write(code, ln)
                run = 0
            continue
        s = _category(v)
        ln, code = _AC_ENC[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < len(vals) - 1:
        eob.n += 1


def _enc_ac_refine(bw, eob, zz, ss, se, al):
    hist = [_pt_ac(int(zz[k]), al + 1) for k in range(ss, se + 1)]
    cur = [_pt_ac(int(zz[k]), al) for k in range(ss, se + 1)]
    corr = [abs(c) & 1 for c in cur]
    news = [i for i in range(len(cur)) if hist[i] == 0 and cur[i] != 0]
    if not news:
        # whole block rides the EOB run; its nonzero-history coefs
        # still consume correction bits (buffered behind the EOBn)
        eob.n += 1
        eob.corr.extend(corr[i] for i in range(len(cur)) if hist[i] != 0)
        if eob.n == 0x7FFF:
            eob.flush()
        return
    eob.flush()
    i = 0
    for kn in news:
        # count zero-history positions to skip; emit ZRL every 16,
        # interleaving the nonzero-history correction bits exactly the
        # way the decoder's skip loop consumes them
        seg = list(range(i, kn))
        zeros = [j for j in seg if hist[j] == 0]
        r = len(zeros)
        j0 = i
        while r >= 16:
            ln, code = _AC_ENC[0xF0]
            bw.write(code, ln)
            skipped = 0
            while skipped < 16:
                if hist[j0] == 0:
                    skipped += 1
                else:
                    bw.write(corr[j0], 1)
                j0 += 1
            r -= 16
        ln, code = _AC_ENC[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if cur[kn] > 0 else 0, 1)
        for j in range(j0, kn):
            if hist[j] != 0:
                bw.write(corr[j], 1)
        i = kn + 1
    if i < len(cur):
        eob.n += 1
        eob.corr.extend(corr[j] for j in range(i, len(cur)) if hist[j] != 0)


def encode_progressive(img: np.ndarray, subsample: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB -> progressive (SOF2) JPEG, flat quant."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_progressive expects (H, W, 3) uint8 RGB")
    h, w = img.shape[:2]
    coefs, sampling, hmax, vmax, mcux, mcuy = _coef_arrays(img, subsample)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, (sh, sv) in zip((1, 2, 3), sampling):
        out += bytes([cid, (sh << 4) | sv, 0])
    for tc_th, bits, vals in ((0x00, _DC_BITS, _DC_VALS), (0x10, _AC_BITS, _AC_VALS)):
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals)) + bytes([tc_th])
        out += bytes(bits) + bytes(vals)

    def sos(scan_comps, ss, se, ah, al, payload):
        o = bytearray(b"\xff\xda")
        o += struct.pack(">HB", 6 + 2 * len(scan_comps), len(scan_comps))
        for cid in scan_comps:
            o += bytes([cid, 0x00])
        o += bytes([ss, se, (ah << 4) | al])
        return bytes(o) + payload

    def dc_scan(ah, al):
        bw = _BitWriter()
        pred = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (sh, sv) in enumerate(sampling):
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(coefs[ci][my * sv + by, mx * sh + bx, 0])
                            if ah == 0:
                                vv = v >> al
                                diff = vv - pred[ci]
                                pred[ci] = vv
                                s = _category(diff)
                                ln, code = _DC_ENC[s]
                                bw.write(code, ln)
                                if s:
                                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                            else:
                                bw.write((v >> al) & 1, 1)
        bw.flush()
        return bytes(bw.out)

    def ac_scan(ci, ss, se, ah, al):
        bw = _BitWriter()
        eob = _EobRun(bw)
        sh, sv = sampling[ci]
        cw = -(-w * sh // hmax)
        ch = -(-h * sv // vmax)
        nby, nbx = -(-ch // 8), -(-cw // 8)
        for by in range(nby):
            for bx in range(nbx):
                zz = coefs[ci][by, bx]
                if ah == 0:
                    _enc_ac_first(bw, eob, zz, ss, se, al)
                else:
                    _enc_ac_refine(bw, eob, zz, ss, se, al)
        eob.flush()
        bw.flush()
        return bytes(bw.out)

    out += sos((1, 2, 3), 0, 0, 0, 1, dc_scan(0, 1))
    for ci, cid in enumerate((1, 2, 3)):
        out += sos((cid,), 1, 5, 0, 1, ac_scan(ci, 1, 5, 0, 1))
        out += sos((cid,), 6, 63, 0, 1, ac_scan(ci, 6, 63, 0, 1))
    out += sos((1, 2, 3), 0, 0, 1, 0, dc_scan(1, 0))
    for ci, cid in enumerate((1, 2, 3)):
        out += sos((cid,), 1, 5, 1, 0, ac_scan(ci, 1, 5, 1, 0))
        out += sos((cid,), 6, 63, 1, 0, ac_scan(ci, 6, 63, 1, 0))
    out += b"\xff\xd9"
    return bytes(out)
