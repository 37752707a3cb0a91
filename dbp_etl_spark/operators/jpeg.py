"""Pure-python/numpy baseline JPEG codec (no PIL/libjpeg).

Closes the last stubbed mainstream image format in the multimodal
layer: ``decode_jpeg`` is a real ITU T.81 baseline-sequential decoder —
marker walk, DQT/DHT/SOF0/SOS parsing, entropy-coded segment with
0xFF00 unstuffing and RST skip, per-MCU huffman DC/AC decode,
dequantize, de-zigzag, 8x8 IDCT, chroma upsampling (4:4:4 / 4:2:0 /
4:2:2), YCbCr->RGB. Grayscale and 3-component YCbCr; progressive /
arithmetic / 12-bit raise ``NotImplementedError`` loudly.

``encode_jpeg`` is the test/synthesis sibling (the sandbox has no other
way to produce JPEG bytes): forward DCT, quantization, canonical
huffman tables built per-image and EMITTED IN THE STREAM (DHT), so the
decoder exercises its general table machinery rather than hard-wired
constants. ``quant=1`` gives a near-lossless round trip (|err| <= ~3
from DCT rounding), which is what the tests pin.

Throughput note: this is a correctness/coverage codec — python-level
bit IO decodes small images fine but is no libjpeg. At 100 TB image
scale the decode stage would bind to a native codec behind the same
``mapInPandas`` plumbing (operators/multimodal.py), which is exactly
how the reference binds external transcoders
(/root/reference/load/AWSTranscoder.py:48-127).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i holds the (row, col) position of the i-th
# coefficient in scan order
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)


def _dct_matrix() -> np.ndarray:
    T = np.zeros((8, 8))
    for i in range(8):
        c = np.sqrt(0.5) if i == 0 else 1.0
        for j in range(8):
            T[i, j] = 0.5 * c * np.cos((2 * j + 1) * i * np.pi / 16.0)
    return T


_T = _dct_matrix()


def _ycbcr_from_rgb(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0].astype(np.float64), px[..., 1].astype(np.float64), px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _rgb_from_ycbcr(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# ----------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _canonical_table(symbols: list[int]) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
    """Uniform-length canonical huffman table over ``symbols``: BITS
    spec array, VALS, and symbol -> (code, length). A uniform length L
    with 2^L > len(symbols) is always a valid JPEG table and never
    assigns the all-ones code (len < 2^L - ... last code < all-ones)."""
    n = len(symbols)
    length = max(n.bit_length(), 2)
    if (1 << length) - 1 <= n:  # keep all-ones unused
        length += 1
    bits = [0] * 17
    bits[length] = n
    code_of = {s: (i, length) for i, s in enumerate(symbols)}
    return bits[1:], list(symbols), code_of


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + appended-bits value for a coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bitsval = v if v >= 0 else v + (1 << size) - 1
    return size, bitsval


def _encode_blocks(planes: list[np.ndarray], quants: list[np.ndarray]) -> list[list[tuple]]:
    """Per-plane (already 8-multiple padded) block scan: returns per-
    plane row-major lists of (dc_raw, [(runsize_sym, size, ac_bits)...]).
    DC differencing happens LATER, in MCU emission order — the order
    the decoder predicts in (matters for 4:2:0, where a plane's
    row-major order differs from MCU order)."""
    out = []
    for plane, q in zip(planes, quants):
        h, w = plane.shape
        rows = []
        for by in range(h // 8):
            for bx in range(w // 8):
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = _T @ blk @ _T.T
                qd = np.round(coef / q).astype(np.int64)
                zz = qd.flatten()[_ZZ]
                acs = []
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        acs.append((0xF0, 0, 0))  # ZRL
                        run -= 16
                    size, bitsval = _magnitude(v)
                    acs.append(((run << 4) | size, size, bitsval))
                    run = 0
                if run:
                    acs.append((0x00, 0, 0))  # EOB
                rows.append((int(zz[0]), acs))
        out.append(rows)
    return out


def encode_jpeg(
    pixels: np.ndarray,
    quant: int = 1,
    subsample: bool = False,
    restart_interval: int | None = None,
) -> bytes:
    """(h, w[, 3]) uint8 -> baseline JFIF bytes.

    ``quant`` scales a flat quantization table (1 = near-lossless);
    ``subsample=True`` emits 4:2:0 chroma (2x2 box average) to exercise
    the decoder's upsampling path; ``restart_interval=N`` emits DRI +
    RSTm markers every N MCUs (with the spec's DC-prediction reset) to
    exercise the decoder's restart path. Huffman tables are built per
    image (canonical, uniform length) and written in DHT segments."""
    px = np.atleast_3d(pixels).astype(np.float64)
    h, w, ch = px.shape
    if ch not in (1, 3):
        raise ValueError("encode_jpeg supports grayscale or RGB")
    q = np.full((8, 8), float(quant))

    if ch == 3:
        ycc = _ycbcr_from_rgb(px)
        comps = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        comps = [px[..., 0]]
    sampling = [(2, 2), (1, 1), (1, 1)] if (subsample and ch == 3) else [(1, 1)] * ch

    if subsample and ch == 3:
        for i in (1, 2):
            c = comps[i]
            ph = (c.shape[0] + 1) // 2 * 2
            pw = (c.shape[1] + 1) // 2 * 2
            cpad = np.pad(c, ((0, ph - c.shape[0]), (0, pw - c.shape[1])), mode="edge")
            comps[i] = (cpad[0::2, 0::2] + cpad[1::2, 0::2] + cpad[0::2, 1::2] + cpad[1::2, 1::2]) / 4.0

    # pad each plane to its MCU-aligned size: the image is mcus_y x
    # mcus_x MCUs; component i contributes (v, h) 8x8 blocks per MCU
    hmax = max(s[0] for s in sampling[:ch])
    vmax = max(s[1] for s in sampling[:ch])
    mcus_y = -(-h // (8 * vmax))
    mcus_x = -(-w // (8 * hmax))
    planes = []
    for i in range(ch):
        sh, sv = sampling[i]
        ph = mcus_y * 8 * sv
        pw = mcus_x * 8 * sh
        c = comps[i]
        planes.append(np.pad(c, ((0, ph - c.shape[0]), (0, pw - c.shape[1])), mode="edge"))

    scans = _encode_blocks(planes, [q] * ch)

    # walk blocks in MCU emission order, differencing DC along the way
    # (the order the decoder predicts in)
    ordered: list[tuple[int, int, int, list]] = []  # (ci, dc_size, dc_bits, acs)
    prev_dc = [0] * ch
    if ch == 3 and subsample:
        yw = planes[0].shape[1] // 8
        cw = planes[1].shape[1] // 8
        mcu_rows = planes[0].shape[0] // 16
        mcu_cols = planes[0].shape[1] // 16
        mcu_iter = []
        for my in range(mcu_rows):
            for mx in range(mcu_cols):
                for dy in range(2):
                    for dx in range(2):
                        mcu_iter.append((0, (my * 2 + dy) * yw + mx * 2 + dx))
                mcu_iter.append((1, my * cw + mx))
                mcu_iter.append((2, my * cw + mx))
    else:
        bw_ = planes[0].shape[1] // 8
        mcu_rows = planes[0].shape[0] // 8
        mcu_cols = bw_
        mcu_iter = [
            (ci, my * bw_ + mx)
            for my in range(mcu_rows)
            for mx in range(mcu_cols)
            for ci in range(ch)
        ]
    blocks_per_mcu = 6 if (ch == 3 and subsample) else ch
    for blk_i, (ci, idx) in enumerate(mcu_iter):
        if (
            restart_interval
            and blk_i
            and blk_i % (blocks_per_mcu * restart_interval) == 0
        ):
            # restart boundary: marker sentinel + DC prediction reset
            ordered.append(("RST", (blk_i // (blocks_per_mcu * restart_interval) - 1) % 8, 0, []))
            prev_dc = [0] * ch
        dc_raw, acs = scans[ci][idx]
        dc_size, dc_bits = _magnitude(dc_raw - prev_dc[ci])
        prev_dc[ci] = dc_raw
        ordered.append((ci, dc_size, dc_bits, acs))

    # two table slots (0 = luma, 1 = chroma), like every real encoder
    dc_syms: list[list[int]] = [[] for _ in range(ch)]
    ac_syms: list[list[int]] = [[] for _ in range(ch)]
    for ci, dc_size, _b, acs in ordered:
        if ci == "RST":
            continue
        dc_syms[ci].append(dc_size)
        ac_syms[ci] += [s for s, _sz, _bv in acs]
    dc_tables = [sorted(set(dc_syms[0]))] + ([sorted(set(dc_syms[1] + dc_syms[2]))] if ch == 3 else [])
    ac_tables = [sorted(set(ac_syms[0]))] + ([sorted(set(ac_syms[1] + ac_syms[2]))] if ch == 3 else [])
    dc_specs = [_canonical_table(s) for s in dc_tables]
    ac_specs = [_canonical_table(s) for s in ac_tables]

    bw = _BitWriter()
    for ci, dc_size, dc_bits, acs in ordered:
        if ci == "RST":
            bw.flush()  # byte-align (1-padded) before the marker
            bw.out += bytes([0xFF, 0xD0 + dc_size])
            continue
        tbl = 0 if ci == 0 else min(1, len(dc_specs) - 1)
        code, ln = dc_specs[tbl][2][dc_size]
        bw.write(code, ln)
        if dc_size:
            bw.write(dc_bits, dc_size)
        for sym, sz, bv in acs:
            code, ln = ac_specs[tbl][2][sym]
            bw.write(code, ln)
            if sz:
                bw.write(bv, sz)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qzz = np.zeros(64, dtype=np.uint8)
    qzz[np.arange(64)] = q.flatten()[_ZZ].astype(np.uint8)
    out += seg(0xFFDB, bytes([0x00]) + qzz.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, ch)
    for i in range(ch):
        sh, sv = sampling[i]
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += seg(0xFFC0, sof)
    for cls, specs in ((0, dc_specs), (1, ac_specs)):
        for tid, (bits, vals, _) in enumerate(specs):
            out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ch])
    for i in range(ch):
        tbl = 0 if i == 0 else min(1, len(dc_specs) - 1)
        sos += bytes([i + 1, (tbl << 4) | tbl])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------------- decoder


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # ANY real marker (RST / EOI / next segment) is a
                    # barrier: never buffer past it — restart_sync()
                    # consumes RSTs explicitly at interval boundaries
                    break
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def restart_sync(self) -> None:
        """At a restart-interval boundary: discard the sub-byte 1-pad
        (everything buffered belongs to the alignment padding — _fill
        never crosses a marker) and consume the RSTm marker."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                # a compliant stream carries its own byte-alignment
                # 1-padding IN the data; needing bits past end-of-stream
                # means the entropy segment was truncated. Fail loudly so
                # corrupt payloads route to the dead-letter path instead
                # of decoding into fabricated coefficients.
                raise ValueError("truncated entropy stream")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical per the spec."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 1|3) uint8."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], dict] = {}
    frame = None
    data_start = None
    scan_comps = None
    dri = 0  # restart interval in MCUs (0 = none)
    while pos < len(content):
        if content[pos] != 0xFF:
            pos += 1
            continue
        if pos + 1 >= len(content):
            raise ValueError("truncated JPEG (lone 0xFF at end of payload)")
        marker = content[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        if pos + 2 > len(content):
            raise ValueError("truncated JPEG (no room for segment length)")
        (seglen,) = struct.unpack(">H", content[pos : pos + 2])
        if seglen < 2 or pos + seglen > len(content):
            raise ValueError("truncated JPEG (segment length past end of payload)")
        body = content[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body[i : i + 64], np.uint8).astype(np.float64)
                    i += 64
                else:
                    tbl = np.frombuffer(body[i : i + 128], ">u2").astype(np.float64)
                    i += 128
                dez = np.zeros(64)
                dez[_ZZ] = tbl
                quants[tq] = dez.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huffs[(cls, tid)] = _build_decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + c * 3 : 9 + c * 3]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline SOF marker 0xFF{marker:02X} unsupported")
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tabs = body[1 + c * 2 : 3 + c * 2]
                scan_comps.append({"id": cid, "dc": tabs >> 4, "ac": tabs & 0xF})
            data_start = pos
            break
    if frame is None or data_start is None:
        raise ValueError("JPEG missing SOF0/SOS")

    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    by_id = {sc["id"]: sc for sc in scan_comps}
    planes = []
    for c in comps:
        pw = mcus_x * 8 * c["h"]
        ph = mcus_y * 8 * c["v"]
        planes.append(np.zeros((ph, pw)))

    br = _BitReader(content[data_start:])
    pred = [0] * len(comps)
    mcu_no = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_no and mcu_no % dri == 0:
                # restart boundary (T.81 E.2.4): byte-align past the
                # RSTm marker and reset every DC predictor
                br.restart_sync()
                pred = [0] * len(comps)
            mcu_no += 1
            for ci, c in enumerate(comps):
                sc = by_id[c["id"]]
                dc_tab = huffs[(0, sc["dc"])]
                ac_tab = huffs[(1, sc["ac"])]
                q = quants[c["tq"]]
                for dy in range(c["v"]):
                    for dx in range(c["h"]):
                        size = _huff_decode(br, dc_tab)
                        diff = _extend(br.read_bits(size), size)
                        pred[ci] += diff
                        zz = np.zeros(64)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(br, ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, sz = sym >> 4, sym & 0xF
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.read_bits(sz), sz)
                            k += 1
                        blk = np.zeros(64)
                        blk[_ZZ] = zz
                        coef = blk.reshape(8, 8) * q
                        spatial = _T.T @ coef @ _T + 128.0
                        y0 = (my * c["v"] + dy) * 8
                        x0 = (mx * c["h"] + dx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial

    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        return np.clip(full[0].round(), 0, 255).astype(np.uint8)[..., None]
    return _rgb_from_ycbcr(full[0], full[1], full[2])
