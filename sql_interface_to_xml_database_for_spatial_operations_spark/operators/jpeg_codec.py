"""REAL baseline JPEG codec (grayscale AND 4:4:4 YCbCr color), stdlib
+ numpy only — closes the last multimodal codec gate (VERDICT r10
missing item 3: "JPEG pixel decode"; PNG closed in r10 the same way;
color added late r11).

Scope: ITU T.81 baseline sequential DCT, 8-bit, 1 component
(grayscale) or 3 components (JFIF YCbCr) at 4:4:4 — every component
unsubsampled, so an MCU is one 8×8 block per component, interleaved
Y Cb Cr with independent DC predictors. One DC + one AC Huffman table
(the spec's Annex K "typical" luminance tables, shared by all
components — legal and simplest). No restart markers, no progressive,
no chroma subsampling. Anything outside that class raises ValueError
loudly — never a wrong raster.

Color conversion is the JFIF full-range matrix, rounded with
``floor(x + 0.5)`` on BOTH directions — the same round-half-up a SQL
oracle can recompute term-for-term (np.rint's ties-to-even cannot be
expressed as a DuckDB closed form).

Exactness: with the all-ones quantization table this module emits, an
image that is CONSTANT within each 8×8 tile has only a DC coefficient
per block (the AC cosine sums cancel), and DC-only blocks round-trip
BIT-EXACTLY through float DCT/IDCT — which is what lets the q163
driver row pin decoded pixel sums against a DuckDB closed form instead
of a lossy-tolerance check. Arbitrary images round-trip within ±2/pixel
(float rounding), asserted by the tests.

Scale shape: encode/decode are per-row kernels inside mapInPandas —
map-only, no shuffle, no driver participation.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# spec constants (ITU T.81 Annex K.3 — public "typical" Huffman tables)
# ---------------------------------------------------------------------------

# (BITS list: #codes of length 1..16, then the symbol values)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II basis: C[u, x] = c(u)·cos((2x+1)uπ/16)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(0.125) if _u == 0 else 0.5
        _C[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per T.81 C.2 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _huff_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _huff_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-bits padding per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude_bits(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _segment(marker: bytes, payload: bytes) -> bytes:
    return marker + (len(payload) + 2).to_bytes(2, "big") + payload


def _round_half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB → uint8 YCbCr, JFIF full-range matrix with
    round-half-up (term order matches the q163 SQL oracle)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(
        _round_half_up(np.stack([y, cb, cr], axis=-1)), 0, 255
    ).astype(np.uint8)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 YCbCr → uint8 RGB, JFIF inverse matrix with
    round-half-up."""
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        _round_half_up(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _pad_blocks(plane: np.ndarray, width: int, height: int) -> np.ndarray:
    bw, bh = -(-width // 8), -(-height // 8)
    return np.pad(
        plane, ((0, bh * 8 - height), (0, bw * 8 - width)), mode="edge"
    ).astype(np.float64) - 128.0


def _encode_block(writer: _BitWriter, block: np.ndarray, prev_dc: int) -> int:
    """Forward-DCT + Huffman-encode one level-shifted 8×8 block against
    the previous DC predictor; returns the new predictor."""
    coef = _C @ block @ _C.T
    q = np.rint(coef).astype(np.int64).reshape(-1)[_ZIGZAG]
    dc, acs = int(q[0]), q[1:]
    diff = dc - prev_dc
    cat = _category(diff)
    code, ln = _DC_ENC[cat]
    writer.put(code, ln)
    if cat:
        writer.put(_amplitude_bits(diff, cat), cat)
    run = 0
    last_nz = int(np.max(np.nonzero(acs)[0])) + 1 if np.any(acs) else 0
    for v in acs[:last_nz]:
        v = int(v)
        if v == 0:
            run += 1
            if run == 16:
                code, ln = _AC_ENC[0xF0]  # ZRL
                writer.put(code, ln)
                run = 0
            continue
        cat = _category(v)
        code, ln = _AC_ENC[(run << 4) | cat]
        writer.put(code, ln)
        writer.put(_amplitude_bits(v, cat), cat)
        run = 0
    if last_nz < 63:
        code, ln = _AC_ENC[0x00]  # EOB
        writer.put(code, ln)
    return dc


def _encode_planes(width: int, height: int, planes: list[np.ndarray]) -> bytes:
    """Shared JFIF assembly for 1 (gray) or 3 (YCbCr 4:4:4) planes."""
    ncomp = len(planes)
    shifted = [_pad_blocks(p, width, height) for p in planes]
    bw, bh = -(-width // 8), -(-height // 8)
    writer = _BitWriter()
    prev = [0] * ncomp
    for by in range(bh):
        for bx in range(bw):
            for ci in range(ncomp):
                block = shifted[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                prev[ci] = _encode_block(writer, block, prev[ci])

    dqt = _segment(b"\xff\xdb", bytes([0x00]) + bytes([1] * 64))
    comp_spec = b"".join(bytes([ci + 1, 0x11, 0]) for ci in range(ncomp))
    sof0 = _segment(
        b"\xff\xc0",
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([ncomp])
        + comp_spec,
    )
    dht = _segment(
        b"\xff\xc4",
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    scan_spec = b"".join(bytes([ci + 1, 0x00]) for ci in range(ncomp))
    sos = _segment(b"\xff\xda", bytes([ncomp]) + scan_spec + bytes([0, 63, 0]))
    app0 = _segment(
        b"\xff\xe0", b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    return b"\xff\xd8" + app0 + dqt + sof0 + dht + sos + writer.flush() + b"\xff\xd9"


def encode_jpeg_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Real baseline JFIF from 8-bit grayscale row-major ``pixels``,
    all-ones quantization (max quality; block-constant tiles round-trip
    exactly). Dimensions need not be multiples of 8 — edge blocks pad
    by replication and the decoder crops."""
    if len(pixels) != width * height:
        raise ValueError(f"need w*h={width * height} bytes, got {len(pixels)}")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    return _encode_planes(width, height, [img])


def encode_jpeg_rgb(width: int, height: int, pixels: bytes) -> bytes:
    """Real baseline 4:4:4 color JFIF from interleaved row-major RGB
    ``pixels`` (3 bytes/px): JFIF YCbCr conversion (round-half-up), then
    the same all-ones-quantization pipeline per component. A tile whose
    RGB is constant has integer tile-constant YCbCr, so its planes
    round-trip bit-exactly — the q163 color oracle's invariant."""
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"need w*h*3={width * height * 3} bytes, got {len(pixels)}"
        )
    rgb = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
    ycc = rgb_to_ycbcr(rgb)
    return _encode_planes(width, height, [ycc[..., i] for i in range(3)])


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.i = 0
        self.acc = 0
        self.n = 0
        self.real_bits = 0  # bits that came from actual entropy bytes
        self.taken = 0

    def _fill(self) -> None:
        while self.n <= 24:
            if self.i >= len(self.data):
                # prefetch slack only — CONSUMING these is truncation,
                # checked in take() (code-review r11: all-zero padding
                # decodes as valid Huffman symbols forever, so a stream
                # cut mid-scan silently produced a garbage raster)
                self.acc = self.acc << 8
                self.n += 8
                continue
            b = self.data[self.i]
            self.i += 1
            if b == 0xFF:
                if self.i < len(self.data) and self.data[self.i] == 0x00:
                    self.i += 1  # unstuff
                else:
                    raise ValueError("unexpected marker inside entropy data")
            self.acc = (self.acc << 8) | b
            self.n += 8
            self.real_bits += 8

    def take(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        self.taken += k
        if self.taken > self.real_bits:
            raise ValueError("truncated JPEG entropy data")
        return v


def _huff_decoder(bits: list[int], vals: list[int]):
    """(maxcode, valptr, mincode) arrays per T.81 F.2.2.3 decode."""
    codes = _huff_codes(bits, vals)
    # invert: length → sorted list of (code, symbol)
    by_len: dict[int, list[tuple[int, int]]] = {}
    for sym, (code, ln) in codes.items():
        by_len.setdefault(ln, []).append((code, sym))
    table = {ln: dict(cs) for ln, cs in by_len.items()}

    def decode(reader: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | reader.take(1)
            row = table.get(ln)
            if row is not None and code in row:
                return row[code]
        raise ValueError("invalid Huffman code in entropy data")

    return decode


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _decode_block(reader, dc_decode, ac_decode, qt, prev_dc: int):
    """Huffman-decode + dequantize + IDCT one block; returns the uint8
    8×8 pixel block and the updated DC predictor."""
    zz = np.zeros(64, dtype=np.int64)
    cat = dc_decode(reader)
    prev_dc += _extend(reader.take(cat), cat) if cat else 0
    zz[0] = prev_dc
    k = 1
    while k < 64:
        rs = ac_decode(reader)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:
                k += 16  # ZRL
                # Trailing ZRLs past index 63 are malformed even though
                # they write nothing — loud-failure contract (ADVICE r11).
                if k > 63:
                    raise ValueError("AC coefficient index overflow")
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC coefficient index overflow")
        zz[k] = _extend(reader.take(size), size)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[_ZIGZAG] = zz * qt
    block = _C.T @ coef.reshape(8, 8) @ _C
    return (
        np.clip(np.rint(block + 128.0), 0, 255).astype(np.uint8),
        prev_dc,
    )


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, ncomp, bytes) from a baseline JPEG: ncomp 1 →
    grayscale row-major; ncomp 3 → interleaved RGB (JFIF YCbCr decoded
    through the inverse matrix, round-half-up). Loud ValueError on
    anything outside the supported class (progressive, restart
    intervals, chroma subsampling, missing tables) — never a wrong
    raster."""
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    i = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[int, object] = {}
    w = h = None
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan_tables: dict[int, tuple[int, int]] = {}  # comp id → (dc, ac)
    scan_order: list[int] = []
    scan_start = None
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError(f"corrupt JPEG marker stream at byte {i}")
        while i + 2 < len(b) and b[i + 1] == 0xFF:
            i += 1  # fill bytes before a marker are legal (T.81 B.1.1.2)
        marker = b[i : i + 2]
        if marker == b"\xff\xd9":
            break
        if b[i + 1] == 0x01 or 0xD0 <= b[i + 1] <= 0xD7:
            i += 2  # TEM / RSTn are standalone: no length field
            continue
        n = int.from_bytes(b[i + 2 : i + 4], "big")
        seg = b[i + 4 : i + 2 + n]
        if marker == b"\xff\xdb":
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                quant[tq] = np.frombuffer(
                    seg[j + 1 : j + 65], dtype=np.uint8
                ).astype(np.int64)
                j += 65
        elif marker == b"\xff\xc4":
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1 : j + 17])
                cnt = sum(bits)
                vals = list(seg[j + 17 : j + 17 + cnt])
                huff[(tc, th)] = _huff_decoder(bits, vals)
                j += 17 + cnt
        elif marker == b"\xff\xc0":
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component JPEG unsupported")
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError("subsampled JPEG unsupported (4:4:4 only)")
                comps.append((cid, tq))
        elif marker in (b"\xff\xc1", b"\xff\xc2", b"\xff\xc3"):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == b"\xff\xdd":
            raise ValueError("restart intervals unsupported")
        elif marker == b"\xff\xda":
            ns = seg[0]
            if ns != len(comps):
                raise ValueError("partial-component scan unsupported")
            for ci in range(ns):
                cid, tbl = seg[1 + 2 * ci : 3 + 2 * ci]
                scan_tables[cid] = (tbl >> 4, tbl & 0xF)
                scan_order.append(cid)
            scan_start = i + 2 + n
            break
        i += 2 + n
    if w is None or scan_start is None or not comps:
        raise ValueError("JPEG missing SOF0 or SOS")
    by_id = dict(comps)
    # the channel assignment below is positional (scan component k is
    # Y/Cb/Cr), which is only sound for the JFIF-canonical id layout —
    # anything else (duplicate ids, SOS ids missing from SOF, Adobe
    # non-1/2/3 ids, reordered scans) must be loud, never a silently
    # channel-swapped or predictor-shared raster (code-review r11)
    if len(by_id) != len(comps) or set(scan_order) != set(by_id) or len(
        scan_order
    ) != len(set(scan_order)):
        raise ValueError("SOS/SOF component ids inconsistent")
    if len(comps) == 3 and ([cid for cid, _ in comps] != [1, 2, 3] or scan_order != [1, 2, 3]):
        raise ValueError("non-JFIF component ids unsupported (need 1,2,3)")
    for cid, tq in comps:
        if tq not in quant:
            raise ValueError("JPEG missing quantization table")
    for cid in scan_order:
        dc_id, ac_id = scan_tables[cid]
        if (0, dc_id) not in huff or (1, ac_id) not in huff:
            raise ValueError("JPEG missing Huffman tables")
    # The scan ends at the first non-stuffed, non-fill marker — NOT at
    # the payload's literal last two bytes: spec-valid files may carry
    # trailing bytes after EOI (code-review r11).
    end = len(b)
    j = scan_start
    while j + 1 < len(b):
        if b[j] == 0xFF and b[j + 1] not in (0x00, 0xFF):
            end = j
            break
        j += 1
    reader = _BitReader(b[scan_start:end])

    bw, bh = -(-w // 8), -(-h // 8)
    planes = {
        cid: np.empty((bh * 8, bw * 8), dtype=np.uint8) for cid in scan_order
    }
    prev = {cid: 0 for cid in scan_order}
    for by in range(bh):
        for bx in range(bw):
            for cid in scan_order:
                dc_id, ac_id = scan_tables[cid]
                block, prev[cid] = _decode_block(
                    reader,
                    huff[(0, dc_id)],
                    huff[(1, ac_id)],
                    quant[by_id[cid]],
                    prev[cid],
                )
                planes[cid][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    cropped = [planes[cid][:h, :w] for cid in scan_order]
    if len(cropped) == 1:
        return w, h, 1, cropped[0].tobytes()
    rgb = ycbcr_to_rgb(np.stack(cropped, axis=-1))
    return w, h, 3, rgb.tobytes()


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, grayscale bytes row-major) from a baseline
    SINGLE-component JPEG — the r11 grayscale contract; color payloads
    go through :func:`decode_jpeg`."""
    w, h, ncomp, raw = decode_jpeg(payload)
    if ncomp != 1:
        raise ValueError(f"{ncomp}-component JPEG: use decode_jpeg")
    return w, h, raw
