"""Pure-python/numpy baseline JPEG codec (no PIL/libjpeg).

Closes the last stubbed mainstream image format in the multimodal
layer: ``decode_jpeg`` is a real ITU T.81 decoder — marker walk,
DQT/DHT/SOF/SOS parsing, entropy-coded segment with 0xFF00 unstuffing
and RST skip, per-MCU huffman DC/AC decode, dequantize, de-zigzag, 8x8
IDCT, chroma upsampling (4:4:4 / 4:2:0 / 4:2:2), YCbCr->RGB. Both
baseline-sequential (SOF0) and PROGRESSIVE (SOF2) frames are supported:
multi-scan spectral selection + successive approximation with EOB-run
coding and buffered correction bits (T.81 annex G, the libjpeg
decode_mcu_{DC,AC}_{first,refine} algorithms). Grayscale and
3-component YCbCr; arithmetic coding / 12-bit / hierarchical raise
``NotImplementedError`` loudly.

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
    progressive: bool = False,
) -> bytes:
    """(h, w[, 3]) uint8 -> baseline (SOF0) or progressive (SOF2) JFIF.

    ``quant`` scales a flat quantization table (1 = near-lossless);
    ``subsample=True`` emits 4:2:0 chroma (2x2 box average) to exercise
    the decoder's upsampling path; ``restart_interval=N`` emits DRI +
    RSTm markers every N MCUs (with the spec's DC-prediction reset) to
    exercise the decoder's restart path. Huffman tables are built per
    image (canonical, uniform length) and written in DHT segments.

    ``progressive=True`` emits the T.81 annex-G multi-scan form: an
    interleaved DC-first scan at Al=1, a DC refinement scan, and per
    component spectral-selection AC scans (1-5, 6-63) at Al=1 followed
    by a full-band AC refinement — i.e. both successive approximation
    and spectral selection are exercised, with EOB-run coding and
    buffered correction bits exactly as real encoders emit them. The
    quantized coefficients are identical to the baseline form, so
    decoding either form yields byte-identical pixels."""
    if progressive and restart_interval:
        raise NotImplementedError("restart intervals unsupported in progressive mode")
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

    if progressive:
        return _encode_progressive(planes, sampling[:ch], q, h, w, ch)

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


def _encode_progressive(planes, sampling, q, h, w, ch) -> bytes:
    """SOF2 multi-scan assembly (T.81 annex G). Scan script:

    1. DC first, interleaved, Al=1   5. comp scans repeat per component
    2. DC refine, Ah=1 Al=0 (raw bits, no tables)
    3. per comp: AC first Ss=1..5,  Al=1   (spectral selection, EOB runs)
    4. per comp: AC first Ss=6..63, Al=1
    5. per comp: AC refine Ss=1..63, Ah=1 Al=0 (buffered correction bits)

    Emission order of correction bits follows libjpeg's
    encode_mcu_AC_refine exactly (ZRL/“newly significant”/EOB-run
    buffering), which is what the refine decoder consumes."""
    # quantized zigzag coefficients, padded-grid raster order per comp
    zz_blocks = []
    for plane in planes:
        ph, pw = plane.shape
        bh, bwd = ph // 8, pw // 8
        arr = np.zeros((bh, bwd, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bwd):
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = _T @ blk @ _T.T
                arr[by, bx] = np.round(coef / q).astype(np.int64).flatten()[_ZZ]
        zz_blocks.append(arr)

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_y = planes[0].shape[0] // (8 * sampling[0][1])
    mcus_x = planes[0].shape[1] // (8 * sampling[0][0])
    mcu_order = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ch):
                sh, sv = sampling[ci]
                for dy in range(sv):
                    for dx in range(sh):
                        mcu_order.append((ci, my * sv + dy, mx * sh + dx))

    def ni_dims(ci):
        # non-interleaved scan grid (T.81 A.2.2): the COMPONENT's own
        # block dims, which can be smaller than the MCU-padded grid
        sh, sv = sampling[ci]
        cw = -(-(w * sh) // hmax)
        chh = -(-(h * sv) // vmax)
        return -(-chh // 8), -(-cw // 8)

    def write_events(events, specs):
        """events: ('sym', tbl, sym) | ('bits', value, n) -> bytes."""
        bw = _BitWriter()
        for ev in events:
            if ev[0] == "sym":
                code, ln = specs[ev[1]][2][ev[2]]
                bw.write(code, ln)
            else:
                bw.write(ev[1], ev[2])
        bw.flush()
        return bytes(bw.out)

    def dc_first(al):
        syms = [set(), set()]
        events = []
        pred = [0] * ch
        for ci, by, bx in mcu_order:
            v = int(zz_blocks[ci][by, bx, 0]) >> al  # arithmetic point transform
            size, bits = _magnitude(v - pred[ci])
            pred[ci] = v
            tbl = 0 if ci == 0 else 1
            syms[tbl].add(size)
            events.append(("sym", tbl, size))
            if size:
                events.append(("bits", bits, size))
        n_tbl = 1 if ch == 1 else 2
        specs = [_canonical_table(sorted(syms[t])) for t in range(n_tbl)]
        return events, specs

    def dc_refine(al):
        bw = _BitWriter()
        for ci, by, bx in mcu_order:
            bw.write((int(zz_blocks[ci][by, bx, 0]) >> al) & 1, 1)
        bw.flush()
        return bytes(bw.out)

    def _eob_events(eobrun, pending_bits, events):
        r = eobrun.bit_length() - 1
        events.append(("sym", 0, r << 4))
        if r:
            events.append(("bits", eobrun - (1 << r), r))
        events.extend(("bits", b, 1) for b in pending_bits)

    def ac_first(ci, ss, se, al):
        events = []
        syms = set()
        eobrun = 0
        bh, bwd = ni_dims(ci)
        for by in range(bh):
            for bx in range(bwd):
                band = zz_blocks[ci][by, bx, ss : se + 1]
                t = [
                    (1 if int(v) > 0 else -1) * (abs(int(v)) >> al) for v in band
                ]
                if not any(t):
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        _eob_events(eobrun, [], events)
                        syms.add((eobrun.bit_length() - 1) << 4)
                        eobrun = 0
                    continue
                if eobrun:
                    syms.add((eobrun.bit_length() - 1) << 4)
                    _eob_events(eobrun, [], events)
                    eobrun = 0
                run = 0
                last_nz = max(i for i, v in enumerate(t) if v)
                for i, v in enumerate(t[: last_nz + 1]):
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        syms.add(0xF0)
                        events.append(("sym", 0, 0xF0))
                        run -= 16
                    size, bits = _magnitude(v)
                    sym = (run << 4) | size
                    syms.add(sym)
                    events.append(("sym", 0, sym))
                    events.append(("bits", bits, size))
                    run = 0
                if last_nz + 1 < len(t):
                    eobrun = 1  # trailing zeros: this block starts an EOB run
        if eobrun:
            syms.add((eobrun.bit_length() - 1) << 4)
            _eob_events(eobrun, [], events)
        return events, [_canonical_table(sorted(syms))]

    def ac_refine(ci, ss, se, al):
        # libjpeg encode_mcu_AC_refine: ZRLs only inside the
        # newly-significant span, correction bits buffered and emitted
        # after the next symbol (or after the EOB-run code)
        events = []
        syms = set()
        eobrun = 0
        pending = []  # correction bits riding the current EOB run

        def flush_eob():
            nonlocal eobrun, pending
            if eobrun:
                syms.add((eobrun.bit_length() - 1) << 4)
                _eob_events(eobrun, pending, events)
                eobrun = 0
                pending = []

        bh, bwd = ni_dims(ci)
        for by in range(bh):
            for bx in range(bwd):
                band = [int(v) for v in zz_blocks[ci][by, bx, ss : se + 1]]
                absv = [abs(v) >> al for v in band]
                eob = -1
                for i, a in enumerate(absv):
                    if a == 1:
                        eob = i
                r = 0
                br: list[int] = []
                for i, a in enumerate(absv):
                    if a == 0:
                        r += 1
                        continue
                    while r > 15 and i <= eob:
                        flush_eob()
                        syms.add(0xF0)
                        events.append(("sym", 0, 0xF0))
                        r -= 16
                        events.extend(("bits", b, 1) for b in br)
                        br = []
                    if a > 1:
                        br.append(a & 1)
                        continue
                    flush_eob()
                    sym = (r << 4) | 1
                    syms.add(sym)
                    events.append(("sym", 0, sym))
                    events.append(("bits", 1 if band[i] > 0 else 0, 1))
                    events.extend(("bits", b, 1) for b in br)
                    br = []
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    pending.extend(br)
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        return events, [_canonical_table(sorted(syms))]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(cls, tid, spec):
        bits, vals, _ = spec
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    def sos(comps_tabs, ss, se, ah, al):
        body = bytes([len(comps_tabs)])
        for cid, dc_t, ac_t in comps_tabs:
            body += bytes([cid, (dc_t << 4) | ac_t])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qzz = np.zeros(64, dtype=np.uint8)
    qzz[np.arange(64)] = q.flatten()[_ZZ].astype(np.uint8)
    out += seg(0xFFDB, bytes([0x00]) + qzz.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, ch)
    for i in range(ch):
        sh, sv = sampling[i]
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += seg(0xFFC2, sof)  # SOF2: progressive DCT, huffman

    # scan 1: DC first (interleaved), Al=1
    events, specs = dc_first(1)
    for tid, spec in enumerate(specs):
        out += dht(0, tid, spec)
    all_tabs = [(i + 1, 0 if i == 0 else min(1, len(specs) - 1), 0) for i in range(ch)]
    out += sos(all_tabs, 0, 0, 0, 1)
    out += write_events(events, specs)
    # scan 2: DC refine to Al=0 (raw bits, no entropy tables)
    out += sos([(i + 1, 0, 0) for i in range(ch)], 0, 0, 1, 0)
    out += dc_refine(0)
    # per component: spectral-selection AC firsts at Al=1, then refine
    for ci in range(ch):
        tid = 0 if ci == 0 else 1
        for ss, se, ah, al, builder in (
            (1, 5, 0, 1, ac_first),
            (6, 63, 0, 1, ac_first),
            (1, 63, 1, 0, ac_refine),
        ):
            events, especs = builder(ci, ss, se, al)
            out += dht(1, tid, especs[0])
            out += sos([(ci + 1, 0, tid)], ss, se, ah, al)
            out += write_events(events, especs)
    out += b"\xff\xd9"
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
    prog_scans: list[dict] = []
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + c * 3 : 9 + c * 3]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline SOF marker 0xFF{marker:02X} unsupported")
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tabs = body[1 + c * 2 : 3 + c * 2]
                scan_comps.append({"id": cid, "dc": tabs >> 4, "ac": tabs & 0xF})
            if frame is not None and frame.get("progressive"):
                if dri:
                    raise NotImplementedError(
                        "restart intervals unsupported in progressive mode"
                    )
                ss, se, ahal = body[1 + ns * 2 : 4 + ns * 2]
                end = _entropy_end(content, pos)
                prog_scans.append(
                    {
                        "comps": scan_comps,
                        "ss": ss,
                        "se": se,
                        "ah": ahal >> 4,
                        "al": ahal & 0xF,
                        "data": content[pos:end],
                        # tables snapshot: DHT may redefine ids between scans
                        "huffs": dict(huffs),
                    }
                )
                pos = end
                continue
            data_start = pos
            break
    if frame is not None and frame.get("progressive"):
        if not prog_scans:
            raise ValueError("progressive JPEG with no scans")
        return _decode_progressive(frame, prog_scans, quants)
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


def _entropy_end(content: bytes, start: int) -> int:
    """First real marker (not a stuffed 0x00, not RSTm) after ``start``
    — the end of an entropy-coded segment."""
    i = start
    n = len(content)
    while i + 1 < n:
        if content[i] != 0xFF:
            i += 1
            continue
        nxt = content[i + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            i += 2
            continue
        return i
    return n


def _decode_progressive(frame: dict, scans: list[dict], quants: dict) -> np.ndarray:
    """SOF2 reconstruction: accumulate coefficients across scans
    (DC/AC, first/refinement per T.81 annex G — the libjpeg
    decode_mcu_{DC,AC}_{first,refine} algorithms), then dequantize +
    IDCT once. Successive-approximation correction bits use signed
    two's-complement bit tests, matching the encoder exactly."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    idx_of = {c["id"]: i for i, c in enumerate(comps)}
    # coefficient store: MCU-padded block grid per component, zigzag order
    coeffs = [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int64) for c in comps
    ]

    def ni_dims(ci):
        c = comps[ci]
        cw = -(-(w * c["h"]) // hmax)
        chh = -(-(h * c["v"]) // vmax)
        return -(-chh // 8), -(-cw // 8)

    for scan in scans:
        br = _BitReader(scan["data"])
        ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
        huffs = scan["huffs"]
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            sc_list = scan["comps"]
            pred = [0] * len(sc_list)
            if len(sc_list) > 1 or len(comps) == 1:
                # interleaved MCU order (or the trivial 1-comp frame)
                order = []
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        for si, sc in enumerate(sc_list):
                            c = comps[idx_of[sc["id"]]]
                            for dy in range(c["v"]):
                                for dx in range(c["h"]):
                                    order.append(
                                        (si, my * c["v"] + dy, mx * c["h"] + dx)
                                    )
            else:
                ci = idx_of[sc_list[0]["id"]]
                bh, bwd = ni_dims(ci)
                order = [(0, by, bx) for by in range(bh) for bx in range(bwd)]
            for si, by, bx in order:
                sc = sc_list[si]
                block = coeffs[idx_of[sc["id"]]][by, bx]
                if ah == 0:  # DC first
                    size = _huff_decode(br, huffs[(0, sc["dc"])])
                    pred[si] += _extend(br.read_bits(size), size)
                    block[0] = pred[si] << al
                else:  # DC refinement: one raw bit per block
                    if br.read_bit():
                        block[0] |= 1 << al
            continue
        # AC scan: exactly one component, non-interleaved
        if len(scan["comps"]) != 1:
            raise ValueError("progressive AC scan must be single-component")
        sc = scan["comps"][0]
        ci = idx_of[sc["id"]]
        ac_tab = huffs[(1, sc["ac"])]
        bh, bwd = ni_dims(ci)
        eobrun = 0
        p1 = 1 << al
        m1 = -1 << al
        for by in range(bh):
            for bx in range(bwd):
                block = coeffs[ci][by, bx]
                if ah == 0:  # AC first (with EOB runs)
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        sym = _huff_decode(br, ac_tab)
                        r, s = sym >> 4, sym & 0xF
                        if s:
                            k += r
                            if k > se:
                                raise ValueError("AC run past band end")
                            block[k] = _extend(br.read_bits(s), s) << al
                            k += 1
                        elif r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.read_bits(r)
                            break
                        else:
                            k += 16  # ZRL
                    continue
                # AC refinement (libjpeg decode_mcu_AC_refine)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = _huff_decode(br, ac_tab)
                        r, s = sym >> 4, sym & 0xF
                        newval = 0
                        if s:
                            if s != 1:
                                raise ValueError("invalid refinement magnitude")
                            newval = p1 if br.read_bit() else m1
                        elif r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.read_bits(r)
                            break
                        # advance past r zero-history coefficients,
                        # correcting nonzero-history ones along the way
                        while k <= se:
                            if block[k] != 0:
                                if br.read_bit() and (block[k] & p1) == 0:
                                    block[k] += p1 if block[k] >= 0 else m1
                            else:
                                if r == 0:
                                    if newval:
                                        block[k] = newval
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if eobrun > 0:
                    while k <= se:  # correction bits for the rest of the block
                        if block[k] != 0:
                            if br.read_bit() and (block[k] & p1) == 0:
                                block[k] += p1 if block[k] >= 0 else m1
                        k += 1
                    eobrun -= 1

    # dequantize + IDCT + upsample + crop (same tail as baseline)
    planes = []
    for ci, c in enumerate(comps):
        q = quants[c["tq"]]
        bh, bwd = coeffs[ci].shape[:2]
        plane = np.zeros((bh * 8, bwd * 8))
        for by in range(bh):
            for bx in range(bwd):
                blk = np.zeros(64)
                blk[_ZZ] = coeffs[ci][by, bx]
                coef = blk.reshape(8, 8) * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _T.T @ coef @ _T + 128.0
                )
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        planes.append(plane[:h, :w])
    if len(comps) == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)[..., None]
    return _rgb_from_ycbcr(planes[0], planes[1], planes[2])
