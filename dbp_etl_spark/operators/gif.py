"""Pure-python GIF codec (87a/89a): real LZW decode, palettes,
interlace, animation compositing.

The web's third image format joins the PPM/PNG/JPEG family
(operators/multimodal.py, operators/jpeg.py) so the multimodal
pipeline decodes real pixels for the formats Common-Crawl-style pages
actually embed. Like the siblings, everything is numpy/stdlib — no
external codec — and malformed payloads raise ``ValueError`` so they
route to the dead-letter path instead of producing plausible pixels.

Scope: global/local color tables, interlaced images, variable-width
LZW with dictionary reset, GIF89a graphic-control extensions
(per-frame delay, transparency, disposal none/keep and
restore-to-background). Disposal mode 3 (restore-to-previous) raises
``NotImplementedError`` loudly — it is vanishingly rare and needs a
frame-history buffer.

Reference analog: the reference delegates media decode to external
transcoders (/root/reference/load/AWSTranscoder.py:48-127); here the
common formats decode in-engine and only exotic ones delegate.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


# ------------------------------------------------------------------- LZW


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> list[int]:
    """GIF variable-width LZW -> palette indices. LSB-first bit order,
    clear/end codes, dict growth to 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    dictionary: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dictionary = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(dictionary) and code != clear and code != end:
            entry = dictionary[code]
        elif code == len(dictionary) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW code")
        out.extend(entry)
        if len(out) > max_pixels:
            raise ValueError("GIF LZW output exceeds image size")
        if prev is not None and len(dictionary) < 4096:
            dictionary.append(prev + entry[:1])
            if len(dictionary) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Encoder for the test/synthesis path: emits clear up front and on
    dictionary overflow, end code at the close."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def table() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    dictionary = table()
    next_code = end + 1
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    cur = b""
    for idx in indices:
        nxt = cur + bytes([idx])
        if nxt in dictionary:
            cur = nxt
            continue
        emit(dictionary[cur])
        if next_code < 4096:
            dictionary[nxt] = next_code
            # the decoder makes this same assignment one code LATER
            # (it needs the next code to infer the entry), so its width
            # bump lands one read later too: bump here exactly when the
            # ASSIGNED code hits 2^width, keeping every later emit
            # aligned with the decoder's read width
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear)
            dictionary = table()
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([idx])
    if cur:
        emit(dictionary[cur])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- containers


def _read_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(buf):
            raise ValueError("truncated GIF sub-blocks")
        n = buf[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(buf):
            raise ValueError("truncated GIF sub-block")
        chunks.append(buf[pos : pos + n])
        pos += n


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def decode_gif(content: bytes) -> tuple[np.ndarray, int]:
    """GIF bytes -> ((n_frames, h, w, 3) uint8 RGB, fps).

    Frames composite onto the logical screen per the 89a disposal
    rules (none/keep; restore-to-background); transparent pixels keep
    the underlying canvas. fps derives from the median frame delay
    (GIF default 10 fps when no/zero delay)."""
    if content[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    if len(content) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, bg_idx, _ = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:, :] = gct[bg_idx]
    bg = canvas[0, 0].copy() if h and w else np.zeros(3, np.uint8)

    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay = 0
    while pos < len(content):
        marker = content[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            if pos >= len(content):
                raise ValueError("truncated GIF extension")
            label = content[pos]
            pos += 1
            body, pos = _read_subblocks(content, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                flags = body[0]
                delay = struct.unpack("<H", body[1:3])[0]
                transparent = body[3] if flags & 0x01 else None
                disposal = (flags >> 2) & 0x07
                if disposal == 3:
                    raise NotImplementedError(
                        "GIF disposal 3 (restore-to-previous) unsupported"
                    )
            continue
        if marker != 0x2C:  # image descriptor
            raise ValueError(f"unexpected GIF block 0x{marker:02x}")
        if pos + 9 > len(content):
            raise ValueError("truncated GIF image descriptor")
        ix, iy, iw, ih, ipk = struct.unpack("<HHHHB", content[pos : pos + 9])
        pos += 9
        if ix + iw > w or iy + ih > h:
            raise ValueError("GIF frame exceeds logical screen")
        pal = gct
        if ipk & 0x80:
            n = 2 << (ipk & 0x07)
            pal = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF image without any color table")
        if pos >= len(content):
            raise ValueError("truncated GIF image data")
        min_code = content[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError("bad GIF LZW min code size")
        data, pos = _read_subblocks(content, pos)
        idx = _lzw_decode(data, min_code, iw * ih)
        if len(idx) < iw * ih:
            raise ValueError("GIF frame pixel data short")
        arr = np.array(idx[: iw * ih], np.uint16).reshape(ih, iw)
        if ipk & 0x40:
            arr = _deinterlace(arr)
        if int(arr.max(initial=0)) >= len(pal):
            raise ValueError("GIF palette index out of range")
        rgb = pal[arr]
        region = canvas[iy : iy + ih, ix : ix + iw]
        if transparent is not None:
            mask = arr != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:  # restore to background
            canvas[iy : iy + ih, ix : ix + iw] = bg
        # GIF89a: a graphic-control extension applies only to the single
        # rendering block that follows it — reset so stale transparency /
        # disposal never leaks into GCE-less frames.
        transparent = None
        disposal = 0
        delay = 0
    if not frames:
        raise ValueError("GIF has no image frames")
    med = sorted(delays)[len(delays) // 2]
    fps = max(1, int(round(100 / med))) if med else 10
    return np.stack(frames), fps


def decode_gif_first_frame(content: bytes) -> np.ndarray:
    frames, _ = decode_gif(content)
    return frames[0]


# ----------------------------------------------------------------- encode


def encode_gif(
    frames: np.ndarray,
    delay_cs: int = 10,
    interlace: bool = False,
    transparent_index: int | None = None,
) -> bytes:
    """(n, h, w, 3) uint8 -> animated GIF89a. Test/synthesis helper
    (like encode_ppm / encode_png / encode_y4m): builds a global
    palette from the distinct colors (<= 256 required) and LZW-encodes
    each full-canvas frame."""
    frames = np.asarray(frames, np.uint8)
    if frames.ndim == 3:
        frames = frames[None]
    n, h, w, _ = frames.shape
    colors = np.unique(frames.reshape(-1, 3), axis=0)
    if len(colors) > 256:
        raise ValueError("encode_gif supports <= 256 distinct colors")
    size = 2
    while size < max(len(colors), 4):
        size *= 2
    pal = np.zeros((size, 3), np.uint8)
    pal[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}
    min_code = max(2, (size - 1).bit_length())

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (min_code - 1), 0, 0)
    out += pal.tobytes()
    for f in range(n):
        out += b"\x21\xf9\x04"  # graphic control: disposal none
        flags = 0x01 if transparent_index is not None else 0x00
        out += struct.pack("<BHB", flags, delay_cs, transparent_index or 0)
        out += b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        rows = frames[f]
        if interlace:
            order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
            rows = rows[order]
        idx = [lut[tuple(px)] for px in rows.reshape(-1, 3)]
        out.append(min_code)
        data = _lzw_encode(idx, min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
