"""GIF (87a/89a) codec in pure Python + numpy.

Closes the animated-image format in the media-tape decode path and makes
the *video* frame-sample stage real: an animated GIF is the one
multi-frame format expressible in this container without codec
libraries (LZW is ~40 lines of integer bit-twiddling), so
``decode_gif_luma`` returns a frame-SAMPLED luminance plane — up to
``multimodal.GRID`` frames picked evenly across the animation, stacked
side by side — and the shared pool-to-grid feature path then captures
temporal structure the same way it captures spatial structure.

Decoder generality: global and local color tables, interlaced images
(4-pass row scatter), transparency (GCE transparent index leaves the
canvas through), disposal methods 0/1 (leave), 2 (restore to
background) and 3 (restore to previous), sub-block reassembly, and
full-range LZW (dynamic code widths to 12 bits, CLEAR resets anywhere).
Plain-text/application/comment extensions are skipped structurally.

The encoder exists to generate fixtures (like ``encode_png`` /
``encode_jpeg``): indexed frames + explicit palette for exact
round-trip gates (GIF is palette-based, so palette-faithful encode →
decode is bit-exact), or RGB frames with <=256 distinct colors.

Reference parity: the reference treats media as opaque bytes + typed
metadata and never decodes in the pipeline tier (SURVEY §2 multimodal
rows); this is a rebuild-side extension for the feature path, gated by
its own round-trip tests.
"""

from __future__ import annotations

import numpy as np

_MAX_CODE = 1 << 12  # GIF LZW caps code width at 12 bits


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    acc = 0
    nbits = 0
    pos = 0
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    next_code = end + 1
    prev: int | None = None
    while n_out < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: truncated LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            next_code = end + 1
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: bad first LZW code")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:  # KwKwK
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError("gif: LZW code out of range")
        take = min(len(entry), n_pixels - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        if prev is not None and next_code < _MAX_CODE:
            table.append(table[prev] + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out != n_pixels:
        raise ValueError("gif: LZW stream ended early")
    return out


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset() -> tuple[dict, int, int]:
        return {(i,): i for i in range(clear)}, end + 1, min_code + 1

    table, next_code, width = reset()
    emit(clear)
    buf: tuple[int, ...] = ()
    for pix in indices.astype(np.int64).tolist():
        cand = buf + (pix,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = next_code
        next_code += 1
        # the decoder's table lags the encoder's by one entry; it bumps
        # width when ITS next_code (= ours - 1) hits 1 << width
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= _MAX_CODE - 2:  # reset well clear of the cap
            emit(clear)
            table, next_code, width = reset()
        buf = (pix,)
    if buf:
        emit(table[buf])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _interlace_order(h: int) -> list[int]:
    return (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )


def encode_gif(
    frames_rgb: list[np.ndarray] | np.ndarray | None = None,
    *,
    indexed: list[np.ndarray] | None = None,
    palette: np.ndarray | None = None,
    interlace: bool = False,
    disposals: list[int] | None = None,
    transparent_index: int | None = None,
    delay_cs: int = 4,
) -> bytes:
    """Encode one or more frames to GIF89a.

    Either *frames_rgb* ((h, w, 3) uint8 arrays; the union of distinct
    colors must fit a 256-entry palette) or *indexed* ((h, w) uint8
    index arrays) + *palette* ((n, 3) uint8).  All frames are written
    full-canvas.  *disposals* (per frame) and *transparent_index* apply
    to every frame's graphic control block."""
    if indexed is None:
        if frames_rgb is None:
            raise ValueError("gif: pass frames_rgb or indexed+palette")
        if isinstance(frames_rgb, np.ndarray):
            frames_rgb = [frames_rgb]
        flat = np.concatenate([f.reshape(-1, 3) for f in frames_rgb])
        palette = np.unique(flat, axis=0)
        if len(palette) > 256:
            raise ValueError("gif: more than 256 distinct colors")
        lut = {tuple(c): i for i, c in enumerate(palette)}
        indexed = [
            np.array(
                [lut[tuple(px)] for px in f.reshape(-1, 3)], dtype=np.uint8
            ).reshape(f.shape[:2])
            for f in frames_rgb
        ]
    if palette is None:
        raise ValueError("gif: indexed frames need a palette")
    palette = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    h, w = indexed[0].shape
    if any(f.shape != (h, w) for f in indexed):
        raise ValueError("gif: all frames must share the canvas size")
    # color table size: power of two >= len(palette), minimum 2
    ct_bits = max(1, int(len(palette) - 1).bit_length())
    ct = np.zeros((1 << ct_bits, 3), dtype=np.uint8)
    ct[: len(palette)] = palette

    out = bytearray(b"GIF89a")
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out += bytes([0x80 | ((ct_bits - 1) & 7), 0, 0])  # GCT flag + size
    out += ct.tobytes()
    for fi, idx in enumerate(indexed):
        disposal = (disposals[fi] if disposals else 0) & 7
        packed = (disposal << 2) | (
            1 if transparent_index is not None else 0
        )
        out += bytes([0x21, 0xF9, 4, packed])
        out += int(delay_cs).to_bytes(2, "little")
        out += bytes([transparent_index or 0, 0])
        out += b"\x2c" + bytes(4)  # left=top=0
        out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
        out += bytes([0x40 if interlace else 0])
        rows = idx[_interlace_order(h)] if interlace else idx
        min_code = max(2, ct_bits)
        out += bytes([min_code])
        data = _lzw_encode(rows.reshape(-1), min_code)
        for off in range(0, len(data), 255):
            chunk = data[off:off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _read_sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(payload):
            raise ValueError("gif: truncated sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        parts.append(payload[pos:pos + n])
        if len(parts[-1]) != n:
            raise ValueError("gif: truncated sub-block")
        pos += n


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """Decode every frame, composited, to (h, w, 3) uint8 RGB arrays."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    if len(payload) < 13:
        raise ValueError("gif: truncated header")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    packed, bg_index = payload[10], payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(
            payload, np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n
    bg_rgb = (
        gct[bg_index].astype(np.float64)
        if gct is not None and bg_index < len(gct)
        else np.zeros(3)
    )
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while True:
        if pos >= len(payload):
            raise ValueError("gif: truncated before trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            body, pos = _read_sub_blocks(payload, pos)
            if label == 0xF9 and len(body) >= 4:
                disposal = (body[0] >> 2) & 7
                transparent = body[3] if body[0] & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02X}")
        if pos + 9 > len(payload):
            raise ValueError("gif: truncated image descriptor")
        left = int.from_bytes(payload[pos:pos + 2], "little")
        top = int.from_bytes(payload[pos + 2:pos + 4], "little")
        fw = int.from_bytes(payload[pos + 4:pos + 6], "little")
        fh = int.from_bytes(payload[pos + 6:pos + 8], "little")
        fpacked = payload[pos + 8]
        pos += 9
        ct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 7)
            ct = np.frombuffer(
                payload, np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("gif: no color table for image")
        min_code = payload[pos]
        pos += 1
        data, pos = _read_sub_blocks(payload, pos)
        idx = _lzw_decode(data, min_code, fw * fh).reshape(fh, fw)
        if fpacked & 0x40:  # interlaced: scatter rows back
            nat = np.empty_like(idx)
            nat[_interlace_order(fh)] = idx
            idx = nat
        if idx.max(initial=0) >= len(ct):
            raise ValueError("gif: pixel index outside color table")
        before = canvas[top:top + fh, left:left + fw].copy()
        rgb = ct[idx].astype(np.float64)
        if transparent is not None:
            mask = idx == transparent
            rgb[mask] = canvas[top:top + fh, left:left + fw][mask]
        canvas[top:top + fh, left:left + fw] = rgb
        frames.append(np.clip(np.rint(canvas), 0, 255).astype(np.uint8))
        if disposal == 2:  # restore rect to background
            canvas[top:top + fh, left:left + fw] = bg_rgb
        elif disposal == 3:  # restore to previous content
            canvas[top:top + fh, left:left + fw] = before
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("gif: no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first frame to (h, w, 3) uint8 RGB."""
    return decode_gif_frames(payload)[0]


def decode_gif_luma(payload: bytes, max_frames: int = 8) -> np.ndarray:
    """Frame-sample the animation to a single luminance plane in [0, 1].

    Up to *max_frames* frames picked at evenly spaced positions (first
    and last always included) are laid side by side; the shared
    pool-to-grid stage then sees temporal structure along the x-axis,
    the same way the WAV path frames its sample stream."""
    frames = decode_gif_frames(payload)
    k = min(max_frames, len(frames))
    picks = np.unique(
        np.linspace(0, len(frames) - 1, num=k).round().astype(int)
    )
    lumas = []
    for i in picks:
        f = frames[i].astype(np.float64) / 255.0
        lumas.append(
            0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        )
    return np.concatenate(lumas, axis=1)
