"""Baseline JPEG (ITU-T T.81 sequential DCT, SOF0) codec in pure numpy.

Closes the last stubbed *image* format in the media-tape decode path
(``multimodal._decode_media``): this container ships no codec
libraries, so — like the PNG path (stdlib zlib + numpy defilter) — the
hot loop is numpy and the only per-item work is entropy decoding.

Decoder generality: tables come from the STREAM, not from assumptions —
arbitrary DQT (8- and 16-bit precision), arbitrary DHT (canonical
Huffman rebuilt from BITS/HUFFVAL), interleaved single-scan frames with
sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), restart intervals
(DRI + RSTn resync), fill bytes, 0xFF00 byte-stuffing.  Progressive
(SOF2), arithmetic coding (SOF9+), hierarchical and 12-bit frames raise
NotImplementedError explicitly.

The encoder exists to generate fixtures (like ``encode_png`` /
``encode_bmp``): fixed simple Huffman tables (every symbol legal, so
any coefficient stream encodes), standard Annex-K quantization tables
scaled by the libjpeg quality formula, or near-lossless all-ones tables
for tight round-trip gates.

Reference parity: the reference treats media as opaque bytes + typed
metadata and never decodes in the pipeline tier (SURVEY §2 multimodal
rows); decode fidelity here is a rebuild-side extension for the
feature-extraction path, gated by its own round-trip tests.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

def _zigzag() -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    for s in range(15):
        rows = range(max(0, s - 7), min(s, 7) + 1)
        if s % 2:  # odd anti-diagonals run top-right -> bottom-left
            out += [(r, s - r) for r in rows]
        else:
            out += [(r, s - r) for r in reversed(rows)]
    return out


_ZZ = _zigzag()
# natural (row-major) flat index of the k-th coefficient in scan order
_ZZ_NAT = np.array([r * 8 + c for r, c in _ZZ], dtype=np.int64)

_K = np.arange(8)
_DCT = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) / 2.0
_DCT[0, :] /= np.sqrt(2.0)  # orthonormal DCT-II basis, rows = frequencies

# ITU-T T.81 Annex K.1 example quantization tables (natural order)
_STD_Q_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64
).reshape(8, 8)
_STD_Q_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64
).reshape(8, 8)

# Encoder Huffman spec: deliberately simple FLAT canonical tables (the
# decoder reads whatever DHT declares, so simplicity costs only bytes,
# never correctness): 12 DC categories at 4 bits, all 162 AC symbols at
# 8 bits.  Both satisfy Kraft with headroom and never produce the
# all-ones code.
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162] + [0] * 8
_ENC_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]


def _canonical(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code length, code) for a JPEG canonical Huffman spec."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


_ENC_DC_CODE = _canonical(_ENC_DC_BITS, _ENC_DC_VALS)
_ENC_AC_CODE = _canonical(_ENC_AC_BITS, _ENC_AC_VALS)


def _quant_tables(quality: int | None) -> tuple[np.ndarray, np.ndarray]:
    if quality is None:  # near-lossless: IDCT rounding is the only loss
        one = np.ones((8, 8))
        return one, one
    q = int(min(max(quality, 1), 100))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    def sc(t: np.ndarray) -> np.ndarray:
        return np.clip(np.floor((t * scale + 50) / 100), 1, 255)
    return sc(_STD_Q_LUMA), sc(_STD_Q_CHROMA)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def align(self) -> None:
        if self._n:
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)  # 1-fill

    def raw(self, data: bytes) -> None:  # markers bypass stuffing
        assert self._n == 0
        self.out += data


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG category coding: (size, appended bits) for a signed value."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _pad_to(plane: np.ndarray, rows: int, cols: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, rows - h), (0, cols - w)), mode="edge")


def _box_down(plane: np.ndarray, fx: int, fy: int) -> np.ndarray:
    if fx == 1 and fy == 1:
        return plane
    h, w = plane.shape
    p = _pad_to(plane, -(-h // fy) * fy, -(-w // fx) * fx)
    return p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean(
        axis=(1, 3)
    )


def _fdct_blocks(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """plane (rows%8==0, cols%8==0) -> quantized coeffs (by, bx, 64) zigzag."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ij,byjk,lk->byil", _DCT, blocks, _DCT)
    q = np.rint(coef / qtbl).astype(np.int32)
    # natural-flat gathered AT zigzag positions = scan order
    return q.reshape(h // 8, w // 8, 64)[:, :, _ZZ_NAT]


def encode_jpeg(
    img: np.ndarray,
    quality: int | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) grayscale uint8 to baseline JPEG.

    ``quality=None`` writes all-ones quantization tables — the
    round-trip is then exact up to DCT/IDCT float rounding, which is
    what the codec gates assert.  ``subsampling``: '444', '422', '420'
    (ignored for grayscale).
    """
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("jpeg: encoder expects uint8")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("jpeg: empty image")
    q_luma, q_chroma = _quant_tables(quality)

    if gray:
        comps = [(img.astype(np.float64), 1, 1, 0)]
        tables = [q_luma]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        sx, sy = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
        comps = [
            (y, sx, sy, 0),
            (_box_down(cb, sx, sy), 1, 1, 1),
            (_box_down(cr, sx, sy), 1, 1, 1),
        ]
        tables = [q_luma, q_chroma]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    coeffs = []
    for plane, ch_, cv_, tq in comps:
        padded = _pad_to(plane, mcuy * cv_ * 8, mcux * ch_ * 8)
        coeffs.append(_fdct_blocks(padded, tables[tq]))

    # ---- headers -------------------------------------------------------
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") \
            + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, tbl in enumerate(tables):
        zz = tbl.reshape(64)[_ZZ_NAT].astype(np.uint8)
        out += seg(0xDB, bytes([tq]) + zz.tobytes())
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([len(comps)])
    for i, (_, ch_, cv_, tq) in enumerate(comps):
        sof += bytes([i + 1, (ch_ << 4) | cv_, tq])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_ENC_DC_BITS)
               + bytes(_ENC_DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_ENC_AC_BITS)
               + bytes(_ENC_AC_VALS))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for i in range(len(comps)):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    # ---- entropy-coded scan ---------------------------------------------
    bw = _BitWriter()
    pred = [0] * len(comps)
    rst = 0
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.align()
                bw.raw(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                pred = [0] * len(comps)
            for ci, (_, ch_, cv_, _tq) in enumerate(comps):
                for v in range(cv_):
                    for u in range(ch_):
                        blk = coeffs[ci][my * cv_ + v, mx * ch_ + u]
                        diff = int(blk[0]) - pred[ci]
                        pred[ci] = int(blk[0])
                        size, extra = _magnitude(diff)
                        ln, code = _ENC_DC_CODE[size]
                        bw.put(code, ln)
                        bw.put(extra, size)
                        run = 0
                        nz = np.nonzero(blk[1:])[0]
                        last = nz[-1] + 1 if len(nz) else 0
                        for k in range(1, last + 1):
                            val = int(blk[k])
                            if val == 0:
                                run += 1
                                continue
                            while run >= 16:
                                ln, code = _ENC_AC_CODE[0xF0]
                                bw.put(code, ln)
                                run -= 16
                            size, extra = _magnitude(val)
                            ln, code = _ENC_AC_CODE[(run << 4) | size]
                            bw.put(code, ln)
                            bw.put(extra, size)
                            run = 0
                        if last < 63:
                            ln, code = _ENC_AC_CODE[0x00]  # EOB
                            bw.put(code, ln)
            n_mcu += 1
    bw.align()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.d):
                raise ValueError("jpeg: truncated entropy stream")
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.d):
                    raise ValueError("jpeg: truncated after 0xFF")
                nxt = self.d[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise ValueError(
                        f"jpeg: unexpected marker 0xFF{nxt:02X} in scan"
                    )
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        self._n = 0  # discard partial byte
        d, p = self.d, self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1  # fill bytes
        if p + 1 >= len(d) or d[p] != 0xFF or not (
            0xD0 <= d[p + 1] <= 0xD7
        ):
            raise ValueError("jpeg: expected RST marker")
        self.pos = p + 2


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    length, code = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _parse_dht(body: bytes, tables: dict) -> None:
    pos = 0
    while pos < len(body):
        tc_th = body[pos]
        bits = list(body[pos + 1:pos + 17])
        n = sum(bits)
        vals = list(body[pos + 17:pos + 17 + n])
        inv: dict[tuple[int, int], int] = {}
        for sym, (ln, code) in _canonical(bits, vals).items():
            inv[(ln, code)] = sym
        tables[(tc_th >> 4, tc_th & 0x0F)] = inv
        pos += 17 + n


def _parse_dqt(body: bytes, tables: dict) -> None:
    pos = 0
    while pos < len(body):
        pq, tq = body[pos] >> 4, body[pos] & 0x0F
        pos += 1
        if pq:
            raw = np.frombuffer(body, ">u2", count=64, offset=pos)
            pos += 128
        else:
            raw = np.frombuffer(body, np.uint8, count=64, offset=pos)
            pos += 64
        nat = np.zeros(64)
        nat[_ZZ_NAT] = raw.astype(np.float64)  # stored zigzag -> natural
        tables[tq] = nat.reshape(8, 8)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline JPEG to (h, w, 3) uint8 RGB, or (h, w) grayscale."""
    return _decode(payload, luma_only=False)


def decode_jpeg_luma(payload: bytes) -> np.ndarray:
    """Decode only the luminance plane, as floats in [0, 1].

    The interleaved scan still entropy-decodes every component (the
    stream forces it) but skips chroma IDCT/upsample/color-convert —
    the media feature path needs only this plane."""
    return _decode(payload, luma_only=True)


_SOF_UNSUPPORTED = {
    0xC2: "progressive", 0xC3: "lossless", 0xC5: "differential sequential",
    0xC6: "differential progressive", 0xC7: "differential lossless",
    0xC9: "arithmetic sequential", 0xCA: "arithmetic progressive",
    0xCB: "arithmetic lossless", 0xCD: "differential arithmetic",
    0xCE: "differential arithmetic progressive",
    0xCF: "differential arithmetic lossless",
}


def _decode(payload: bytes, luma_only: bool) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, [(id, H, V, Tq)])
    ri = 0
    while True:
        if pos + 1 >= len(payload):
            raise ValueError("jpeg: truncated before EOI")
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        while payload[pos + 1] == 0xFF:  # fill bytes
            pos += 1
        m = payload[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            raise ValueError("jpeg: EOI before SOS")
        if m in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"jpeg: {_SOF_UNSUPPORTED[m]} frames unsupported "
                "(baseline sequential only)"
            )
        ln = int.from_bytes(payload[pos:pos + 2], "big")
        body = payload[pos + 2:pos + ln]
        if len(body) != ln - 2:
            raise ValueError("jpeg: truncated segment")
        pos += ln
        if m == 0xDB:
            _parse_dqt(body, qt)
        elif m == 0xC4:
            _parse_dht(body, huff)
        elif m in (0xC0, 0xC1):
            if body[0] != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            fh = int.from_bytes(body[1:3], "big")
            fw = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif m == 0xDD:
            ri = int.from_bytes(body[:2], "big")
        elif m == 0xDA:
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            return _decode_scan(
                payload, pos, body, frame, qt, huff, ri, luma_only
            )
        # else: APPn / COM — skip


def _decode_scan(
    payload: bytes,
    pos: int,
    sos: bytes,
    frame: tuple,
    qt: dict,
    huff: dict,
    ri: int,
    luma_only: bool,
) -> np.ndarray:
    h, w, comps = frame
    ns = sos[0]
    if ns != len(comps):
        raise NotImplementedError("jpeg: non-interleaved scans unsupported")
    sel = {}  # component id -> (dc table, ac table)
    for i in range(ns):
        cid, tda = sos[1 + 2 * i], sos[2 + 2 * i]
        sel[cid] = (tda >> 4, tda & 0x0F)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    coeffs = [
        np.zeros((mcuy * cv_, mcux * ch_, 64), dtype=np.float64)
        for (_cid, ch_, cv_, _tq) in comps
    ]
    br = _BitReader(payload, pos)
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and n_mcu and n_mcu % ri == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            for ci, (cid, ch_, cv_, _tq) in enumerate(comps):
                td, ta = sel[cid]
                dc_tbl = huff[(0, td)]
                ac_tbl = huff[(1, ta)]
                for v in range(cv_):
                    for u in range(ch_):
                        blk = coeffs[ci][my * cv_ + v, mx * ch_ + u]
                        size = _huff_decode(br, dc_tbl)
                        pred[ci] += _extend(br.bits(size), size)
                        blk[0] = pred[ci]
                        k = 1
                        while k <= 63:
                            rs = _huff_decode(br, ac_tbl)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            size = rs & 0x0F
                            blk[k] = _extend(br.bits(size), size)
                            k += 1
            n_mcu += 1

    planes = []
    for ci, (_cid, ch_, cv_, tq) in enumerate(comps):
        if luma_only and ci > 0:
            continue
        zz = coeffs[ci]
        by, bx = zz.shape[:2]
        nat = np.zeros_like(zz)
        nat[:, :, _ZZ_NAT] = zz  # zigzag scan order -> natural flat
        blocks = nat.reshape(by, bx, 8, 8) * qt[tq]
        pix = np.einsum("ji,byjk,kl->byil", _DCT, blocks, _DCT) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        cw = -(-w * ch_ // hmax)
        ch_rows = -(-h * cv_ // vmax)
        plane = plane[:ch_rows, :cw]
        plane = np.repeat(plane, vmax // cv_, axis=0)
        plane = np.repeat(plane, hmax // ch_, axis=1)[:h, :w]
        planes.append(plane)

    if luma_only:
        return np.clip(planes[0], 0, 255) / 255.0
    if len(comps) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    if len(comps) != 3:
        raise NotImplementedError("jpeg: only 1- or 3-component frames")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
