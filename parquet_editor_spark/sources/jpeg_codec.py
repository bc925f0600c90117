"""Baseline JPEG pixel codec — dependency-free, numpy-accelerated
(r8 verdict item 8: turn the SOF header walk of ``sources/jpeg.py``
into a real decode path for the most common crawl image format,
without libjpeg).

Scope (public ITU-T T.81 spec only):

- DECODE: baseline sequential DCT (SOF0/1) and PROGRESSIVE (SOF2 —
  spectral selection, successive approximation with DC/AC refinement
  passes and EOB-run bookkeeping; r9), 8-bit, grayscale or
  3-component YCbCr, sampling factors up to 2x2 (4:4:4, 4:2:2,
  4:2:0), Huffman entropy coding with tables read from the stream's
  DHT segments, restart markers (DRI/RSTn), 0xFF00 byte stuffing.
  ``decode_jpeg`` handles both frame types;
  ``decode_jpeg_baseline`` stays the SOF0-only fast path.
  Arithmetic coding, 12-bit and hierarchical modes stay honest
  ``NotImplementedError``s.
- ENCODE: baseline SOF0 and progressive SOF2 fixtures (the classic
  DC-Al=1 → AC bands → refinement scan script) — grayscale or
  RGB→YCbCr 4:4:4 / 4:2:0, any quant tables (Annex-K defaults
  scaled by the public libjpeg quality curve).  Both encoders write
  IDENTICAL quantized coefficients, so progressive and baseline
  decodes of the same source are bit-identical — the tests'
  cross-validation of the two independent entropy stacks.  The
  embedded Huffman tables are self-built canonical codes (DC: 12
  symbols @ 4 bits, AC: 255 @ 9 + 1 @ 10 bits — valid prefix codes
  with the all-ones codeword unused, as T.81 requires); a decoder
  must read tables from DHT anyway, so interop needs only validity,
  not the Annex-K constants.

Determinism: both directions are pure integer/float64 numpy with
fixed rounding, so identical bytes decode to identical pixels on any
platform — the property the driver oracle leans on.  A constant-
gray image with a DC quant step of 8 round-trips EXACTLY: the DC
coefficient of a flat block is 8·(v−128), quantizing by 8 is
lossless, and every AC coefficient is zero.

Hot-path shape: the per-symbol Huffman loop is Python (fine for the
crawl-thumbnail sizes this targets); dequantize → IDCT runs as one
``einsum`` over all blocks of a component, and color transform /
upsampling are whole-plane numpy ops.  The Spark side (Arrow
batches, ``mapInPandas``) lives in ``operators/multimodal.py``.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------


def _zigzag() -> list[int]:
    """The T.81 zigzag scan as flat raster indices, generated from the
    anti-diagonal walk (no hand-typed constant to get wrong)."""
    order = []
    for d in range(15):
        rng = range(d + 1)
        for i in rng if d % 2 else reversed(rng):
            y, x = i, d - i
            if y < 8 and x < 8:
                order.append(y * 8 + x)
    return order


_ZIGZAG = np.asarray(_zigzag(), dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.1/K.2 base quantization tables (raster order)
_Q_LUMA = np.asarray(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.asarray(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """(luma, chroma) quant tables for a 1-100 quality via the public
    libjpeg scaling curve."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1-100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int64))
    return out[0], out[1]


def _dct_matrix() -> np.ndarray:
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    c = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    c[0, :] = np.sqrt(1 / 8)
    return c


_C = _dct_matrix()


# ---------------------------------------------------------------------------
# Huffman tables (canonical, from (bits, values) as DHT stores them)
# ---------------------------------------------------------------------------


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for a canonical T.81 table."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_map(
    bits: list[int], values: list[int]
) -> dict[tuple[int, int], int]:
    """(length, code) → symbol — the decoder-side inverse."""
    return {
        (ln, code): sym for sym, (code, ln) in _build_codes(bits, values).items()
    }


# encoder-side self-built tables: every DC size 0-11 at 4 bits (12 of
# 16 slots, all-ones unused); AC symbols 0-254 at 9 bits plus symbol
# 255 at 10 bits (a DHT count byte caps at 255 per length) — the
# all-ones codeword stays unused at both lengths, as T.81 requires
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = list(range(256))


# ---------------------------------------------------------------------------
# bit I/O with 0xFF00 stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            self.write(0x7F, 8 - self._n)  # 1-pad to a byte boundary


class _BitReader:
    def __init__(self, data: bytes, pos: int, origin: str) -> None:
        self.data = data
        self.pos = pos
        self.origin = origin
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError(f"{self.origin!r}: entropy data exhausted")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError(
                    f"{self.origin!r}: dangling 0xFF in entropy data"
                )
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed
            else:
                raise ValueError(
                    f"{self.origin!r}: unexpected marker 0xFF{nxt:02X} "
                    "inside entropy data"
                )
        self._acc = (self._acc << 8) | byte
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError(f"{self.origin!r}: invalid Huffman code")

    def restart(self, expect: int) -> None:
        """Byte-align and consume the next RSTn marker."""
        self._acc = 0
        self._n = 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + expect
        ):
            got = self.data[self.pos : self.pos + 2].hex()
            raise ValueError(
                f"{self.origin!r}: expected RST{expect} marker, got "
                f"0x{got}"
            )
        self.pos += 2


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if v < (1 << (size - 1)) else v


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _plane_blocks(plane: np.ndarray, bw: int, bh: int) -> np.ndarray:
    """Edge-replicate pad a (h, w) plane to (bh*8, bw*8) and return
    [bh*bw, 8, 8] float64 blocks in raster-of-blocks order."""
    h, w = plane.shape
    padded = np.pad(
        plane.astype(np.float64),
        ((0, bh * 8 - h), (0, bw * 8 - w)),
        mode="edge",
    )
    return (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _fdct_quant(blocks: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """FDCT every block and quantize; returns int32 [n, 64] zigzagged."""
    coef = np.einsum("ij,njk,lk->nil", _C, blocks - 128.0, _C)
    q = np.round(coef.reshape(-1, 64) / qtab.reshape(1, 64))
    return q.astype(np.int32)[:, _ZIGZAG]


def _prepare_components(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int,
    subsampling: str,
    quant_tables,
):
    """Shared encoder front half: pixels → per-component quantized
    zigzag blocks.  Returns (comp_blocks, samp, qsel, qluma, qchroma,
    mcux, mcuy) where comp_blocks[ci] is int32 [bh, bw, 64]."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if width < 1 or height < 1:
        raise ValueError("empty image")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer {len(pixels)} B != {width}x{height}x{channels}"
        )
    if quant_tables is None:
        qluma, qchroma = quality_tables(quality)
    else:
        qluma = np.asarray(quant_tables[0], dtype=np.int64).reshape(64)
        qchroma = np.asarray(quant_tables[1], dtype=np.int64).reshape(64)

    px = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels
    )
    if channels == 1:
        planes = [px[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = np.round(0.299 * r + 0.587 * g + 0.114 * b)
        cb = np.round(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
        cr = np.round(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)
        cb = np.clip(cb, 0, 255)
        cr = np.clip(cr, 0, 255)
        if subsampling == "420":
            # pad to even dims (edge) then 2x2 box-average the chroma
            ph = height + (height & 1)
            pw = width + (width & 1)
            cbp = np.pad(cb, ((0, ph - height), (0, pw - width)), mode="edge")
            crp = np.pad(cr, ((0, ph - height), (0, pw - width)), mode="edge")
            cb = np.round(
                cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            )
            cr = np.round(
                crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            )
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    # quantized zigzag blocks per component, in block-raster order
    comp_blocks = []
    for plane, (hs, vs), qs in zip(planes, samp, qsel):
        bw, bh = mcux * hs, mcuy * vs
        blocks = _plane_blocks(plane, bw, bh)
        comp_blocks.append(
            _fdct_quant(blocks, qluma if qs == 0 else qchroma).reshape(
                bh, bw, 64
            )
        )
    return comp_blocks, samp, qsel, qluma, qchroma, mcux, mcuy


def _headers(width, height, channels, samp, qsel, qluma, qchroma, sof_marker):
    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(
            2, "big"
        ) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(
        0xE0,
        b"JFIF\x00" + bytes([1, 1, 0]) + (1).to_bytes(2, "big") * 2 + b"\x00\x00",
    )
    out += seg(0xDB, bytes([0]) + bytes(qluma[_ZIGZAG].astype(np.uint8)))
    if channels == 3:
        out += seg(
            0xDB, bytes([1]) + bytes(qchroma[_ZIGZAG].astype(np.uint8))
        )
    sof = bytearray([8]) + height.to_bytes(2, "big") + width.to_bytes(
        2, "big"
    ) + bytes([channels])
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, qsel[ci]])
    out += seg(sof_marker, bytes(sof))
    out += seg(
        0xC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
    )
    out += seg(
        0xC4, bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS)
    )
    return out, seg


def encode_jpeg_baseline(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
    quant_tables: tuple[np.ndarray, np.ndarray] | None = None,
) -> bytes:
    """Serialize 8-bit pixels (interleaved rows, gray or RGB) as a
    baseline JFIF stream.  ``subsampling`` is ``"444"`` or ``"420"``
    (3-channel only).  ``quant_tables`` overrides the quality-scaled
    Annex-K tables with explicit (luma, chroma) raster-order arrays —
    the driver oracle uses a DC step of 8 for exact flat-field
    round-trips."""
    comp_blocks, samp, qsel, qluma, qchroma, mcux, mcuy = (
        _prepare_components(
            width, height, channels, pixels, quality, subsampling,
            quant_tables,
        )
    )
    dc_codes = _build_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _build_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    w = _BitWriter()
    pred = [0] * len(samp)
    rst = 0
    mcu_since_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_since_rst == restart_interval:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * len(samp)
                mcu_since_rst = 0
            for ci, (hs, vs) in enumerate(samp):
                for by in range(vs):
                    for bx in range(hs):
                        zz = comp_blocks[ci][my * vs + by, mx * hs + bx]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        size = _category(diff)
                        code, ln = dc_codes[size]
                        w.write(code, ln)
                        if size:
                            w.write(
                                diff if diff >= 0 else diff + (1 << size) - 1,
                                size,
                            )
                        run = 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_codes[0xF0]
                                w.write(code, ln)
                                run -= 16
                            size = _category(v)
                            code, ln = ac_codes[(run << 4) | size]
                            w.write(code, ln)
                            w.write(
                                v if v >= 0 else v + (1 << size) - 1, size
                            )
                            run = 0
                        if run:
                            code, ln = ac_codes[0x00]  # EOB
                            w.write(code, ln)
            mcu_since_rst += 1
    w.flush()

    out, seg = _headers(
        width, height, channels, samp, qsel, qluma, qchroma, 0xC0
    )
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([channels])
    for ci in range(channels):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0 for all
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos))
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg_baseline(
    data: bytes, origin: str = "<bytes>"
) -> tuple[int, int, int, bytes]:
    """Decode a baseline-sequential JPEG to ``(width, height,
    channels, pixels)`` — 8-bit interleaved rows, gray or RGB.
    Huffman/quant tables come from the stream; sampling factors up to
    2x2; DRI/RSTn honored.  Progressive and arithmetic streams raise
    NotImplementedError, malformed ones ValueError."""
    n = len(data)
    if n < 4 or data[:2] != b"\xff\xd8":
        raise ValueError(f"{origin!r} is not a JPEG stream (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    dri = 0
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"{origin!r}: expected marker at {pos}")
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            raise ValueError(f"{origin!r}: EOI before scan data")
        seg_len = int.from_bytes(data[pos : pos + 2], "big")
        if seg_len < 2 or pos + seg_len > n:
            raise ValueError(f"{origin!r}: bad segment length at {pos}")
        body = data[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT — possibly several tables per segment
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 15
                if prec != 0:
                    raise NotImplementedError(
                        "16-bit quantization tables (12-bit JPEG)"
                    )
                zz = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                ).astype(np.int64)
                if len(zz) != 64:
                    raise ValueError(f"{origin!r}: truncated DQT")
                tab = np.empty(64, dtype=np.int64)
                tab[_ZIGZAG] = zz
                qtabs[tid] = tab
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 15
                bits = list(body[b + 1 : b + 17])
                cnt = sum(bits)
                vals = list(body[b + 17 : b + 17 + cnt])
                if len(bits) != 16 or len(vals) != cnt:
                    raise ValueError(f"{origin!r}: truncated DHT")
                htabs[(cls, tid)] = _build_decode_map(bits, vals)
                b += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 15, tq))
            sof = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG frame type SOF{marker - 0xC0} (progressive/"
                "arithmetic/lossless) — baseline sequential only"
            )
        elif marker == 0xDD:
            dri = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            if sof is None:
                raise ValueError(f"{origin!r}: SOS before SOF")
            return _decode_scan(
                data, pos, body, sof, qtabs, htabs, dri, origin
            )
        # APPn/COM/others skipped
    raise ValueError(f"{origin!r}: no SOS marker found")


def _decode_scan(data, pos, sos, sof, qtabs, htabs, dri, origin):
    w, h, comps = sof
    ns = sos[0]
    if ns != len(comps):
        raise NotImplementedError("multi-scan (non-interleaved) JPEG")
    tsel = {}
    for i in range(ns):
        cs, tt = sos[1 + 2 * i], sos[2 + 2 * i]
        tsel[cs] = (tt >> 4, tt & 15)
    if w < 1 or h < 1 or not comps:
        raise ValueError(f"{origin!r}: empty frame")
    for _cid, hs, vs, _tq in comps:
        if not (1 <= hs <= 2 and 1 <= vs <= 2):
            raise NotImplementedError(
                f"sampling factors {hs}x{vs} (1x1..2x2 only)"
            )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    reader = _BitReader(data, pos, origin)
    coeffs = [
        np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
        for _cid, hs, vs, _tq in comps
    ]
    pred = [0] * len(comps)
    rst = 0
    mcu_since = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_since == dri:
                reader.restart(rst)
                rst = (rst + 1) % 8
                pred = [0] * len(comps)
                mcu_since = 0
            for ci, (cid, hs, vs, _tq) in enumerate(comps):
                dc_t, ac_t = tsel[cid]
                dct = htabs.get((0, dc_t))
                act = htabs.get((1, ac_t))
                if dct is None or act is None:
                    raise ValueError(
                        f"{origin!r}: missing Huffman table for "
                        f"component {cid}"
                    )
                for by in range(vs):
                    for bx in range(hs):
                        blk = coeffs[ci][my * vs + by, mx * hs + bx]
                        size = reader.huff(dct)
                        if size > 11:
                            raise ValueError(
                                f"{origin!r}: DC size {size} > 11"
                            )
                        diff = (
                            _extend(reader.receive(size), size)
                            if size
                            else 0
                        )
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.huff(act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if rs == 0xF0:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    f"{origin!r}: AC run overflows block"
                                )
                            blk[k] = _extend(reader.receive(s), s)
                            k += 1
            mcu_since += 1

    return _reconstruct(coeffs, comps, qtabs, w, h, origin)


def _reconstruct(coeffs, comps, qtabs, w, h, origin):
    """Shared tail of baseline and progressive decode: dequantize,
    IDCT (one einsum per component), upsample, color transform."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        qt = qtabs.get(tq)
        if qt is None:
            raise ValueError(f"{origin!r}: missing quant table {tq}")
        bh, bw = coeffs[ci].shape[:2]
        zz = coeffs[ci].reshape(-1, 64).astype(np.float64)
        raster = np.zeros_like(zz)
        raster[:, _ZIGZAG] = zz  # un-zigzag FIRST, dequantize in raster
        raster *= qt
        blocks = raster.reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", _C, blocks, _C) + 128.0
        plane = (
            pix.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution and crop
        plane = np.repeat(
            np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
        )[:h, :w]
        planes.append(plane)

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    if len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
        out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        return w, h, 3, out.tobytes()
    raise NotImplementedError(f"{len(planes)}-component JPEG")


# ---------------------------------------------------------------------------
# progressive (SOF2) — spectral selection + successive approximation
# ---------------------------------------------------------------------------


def decode_jpeg(
    data: bytes, origin: str = "<bytes>"
) -> tuple[int, int, int, bytes]:
    """General JPEG decode: baseline (SOF0/1) delegates to the
    single-scan fast path; progressive (SOF2) accumulates DCT
    coefficients across every scan — spectral selection, successive
    approximation (DC and AC refinement with EOB-run bookkeeping),
    restart markers — and reconstructs once at EOI.  Arithmetic
    coding, lossless and hierarchical modes still raise."""
    n = len(data)
    if n < 4 or data[:2] != b"\xff\xd8":
        raise ValueError(f"{origin!r} is not a JPEG stream (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    progressive = False
    dri = 0
    state = None  # (coeffs, mcux, mcuy) once the first SOS arrives
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"{origin!r}: expected marker at {pos}")
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            if progressive and state is not None:
                w, h, comps = sof
                return _reconstruct(state, comps, qtabs, w, h, origin)
            raise ValueError(f"{origin!r}: EOI before scan data")
        if pos + 2 > n:
            break
        seg_len = int.from_bytes(data[pos : pos + 2], "big")
        if seg_len < 2 or pos + seg_len > n:
            raise ValueError(f"{origin!r}: bad segment length at {pos}")
        body = data[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 15
                if prec != 0:
                    raise NotImplementedError("16-bit quantization tables")
                zz = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                ).astype(np.int64)
                if len(zz) != 64:
                    raise ValueError(f"{origin!r}: truncated DQT")
                tab = np.empty(64, dtype=np.int64)
                tab[_ZIGZAG] = zz
                qtabs[tid] = tab
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 15
                bits = list(body[b + 1 : b + 17])
                cnt = sum(bits)
                vals = list(body[b + 17 : b + 17 + cnt])
                if len(bits) != 16 or len(vals) != cnt:
                    raise ValueError(f"{origin!r}: truncated DHT")
                htabs[(cls, tid)] = _build_decode_map(bits, vals)
                b += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):
            if body[0] != 8:
                raise NotImplementedError(f"{body[0]}-bit precision")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            comps = []
            for ci in range(body[5]):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 15, tq))
            sof = (w, h, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG frame type SOF{marker - 0xC0} (arithmetic/"
                "lossless/hierarchical)"
            )
        elif marker == 0xDD:
            dri = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            if sof is None:
                raise ValueError(f"{origin!r}: SOS before SOF")
            if not progressive:
                return _decode_scan(
                    data, pos, body, sof, qtabs, htabs, dri, origin
                )
            w, h, comps = sof
            for _cid, hs, vs, _tq in comps:
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise NotImplementedError(
                        f"sampling factors {hs}x{vs} (1x1..2x2 only)"
                    )
            if state is None:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                state = [
                    np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
                    for _cid, hs, vs, _tq in comps
                ]
            pos = _progressive_scan(
                data, pos, body, sof, state, htabs, dri, origin
            )
    raise ValueError(f"{origin!r}: no EOI in progressive stream")


def _next_marker(data: bytes, pos: int) -> int:
    """Skip to the next real marker after entropy data (stuffed 0xFF00
    and RSTn are part of the scan)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF and data[pos + 1] != 0x00 and not (
            0xD0 <= data[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return n


def _progressive_scan(data, pos, sos, sof, state, htabs, dri, origin):
    """One SOS of a progressive stream; mutates ``state`` coefficient
    arrays (zigzag order, scaled by 2^Al) and returns the position of
    the next marker."""
    w, h, comps = sof
    ns = sos[0]
    scan_comps = []  # (ci, dc_table, ac_table)
    for i in range(ns):
        cs, tt = sos[1 + 2 * i], sos[2 + 2 * i]
        ci = next(
            (k for k, c in enumerate(comps) if c[0] == cs), None
        )
        if ci is None:
            raise ValueError(f"{origin!r}: scan references component {cs}")
        scan_comps.append((ci, tt >> 4, tt & 15))
    ss, se = sos[1 + 2 * ns], sos[2 + 2 * ns]
    ahal = sos[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 15
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    reader = _BitReader(data, pos, origin)

    if ss == 0:  # DC scan (interleaved over the scan's components)
        if se != 0:
            raise ValueError(f"{origin!r}: DC scan with Se={se}")
        pred = [0] * len(scan_comps)
        rst = 0
        since = 0
        if ns == 1:
            ci = scan_comps[0][0]
            _cid, hs, vs, _tq = comps[ci]
            bw = -(-(-(-w * hs // hmax)) // 8)
            bh = -(-(-(-h * vs // vmax)) // 8)
            units = [(0, bx, by) for by in range(bh) for bx in range(bw)]
        else:
            units = None
        if units is None:
            for my in range(mcuy):
                for mx in range(mcux):
                    if dri and since == dri:
                        reader.restart(rst)
                        rst = (rst + 1) % 8
                        pred = [0] * len(scan_comps)
                        since = 0
                    for si, (ci, dc_t, _ac_t) in enumerate(scan_comps):
                        _cid, hs, vs, _tq = comps[ci]
                        for by in range(vs):
                            for bx in range(hs):
                                blk = state[ci][my * vs + by, mx * hs + bx]
                                pred[si] = _dc_pass(
                                    reader, htabs, dc_t, blk, ah, al,
                                    pred[si], origin,
                                )
                    since += 1
        else:
            for _si, bx, by in units:
                if dri and since == dri:
                    reader.restart(rst)
                    rst = (rst + 1) % 8
                    pred = [0]
                    since = 0
                blk = state[scan_comps[0][0]][by, bx]
                pred[0] = _dc_pass(
                    reader, htabs, scan_comps[0][1], blk, ah, al,
                    pred[0], origin,
                )
                since += 1
        return _next_marker(data, reader.pos)

    # AC scan: exactly one component, non-interleaved
    if ns != 1:
        raise ValueError(f"{origin!r}: interleaved AC progressive scan")
    ci, _dc_t, ac_t = scan_comps[0]
    _cid, hs, vs, _tq = comps[ci]
    act = htabs.get((1, ac_t))
    if act is None:
        raise ValueError(f"{origin!r}: missing AC table {ac_t}")
    comp_w = -(-w * hs // hmax)
    comp_h = -(-h * vs // vmax)
    bw, bh = -(-comp_w // 8), -(-comp_h // 8)
    eobrun = 0
    rst = 0
    since = 0
    for by in range(bh):
        for bx in range(bw):
            if dri and since == dri:
                reader.restart(rst)
                rst = (rst + 1) % 8
                eobrun = 0
                since = 0
            blk = state[ci][by, bx]
            if ah == 0:
                eobrun = _ac_first(
                    reader, act, blk, ss, se, al, eobrun, origin
                )
            else:
                eobrun = _ac_refine(
                    reader, act, blk, ss, se, al, eobrun, origin
                )
            since += 1
    return _next_marker(data, reader.pos)


def _dc_pass(reader, htabs, dc_t, blk, ah, al, pred, origin):
    if ah == 0:  # first pass
        dct = htabs.get((0, dc_t))
        if dct is None:
            raise ValueError(f"{origin!r}: missing DC table {dc_t}")
        size = reader.huff(dct)
        if size > 11:
            raise ValueError(f"{origin!r}: DC size {size} > 11")
        diff = _extend(reader.receive(size), size) if size else 0
        pred += diff
        blk[0] = pred << al
        return pred
    if reader.read_bit():  # refinement: one correction bit
        blk[0] = int(blk[0]) | (1 << al)
    return pred


def _ac_first(reader, act, blk, ss, se, al, eobrun, origin):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.huff(act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError(f"{origin!r}: AC run overflows band")
        blk[k] = _extend(reader.receive(s), s) << al
        k += 1
    return 0


def _ac_refine(reader, act, blk, ss, se, al, eobrun, origin):
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.huff(act)
            r, s = rs >> 4, rs & 15
            val = 0
            if s:
                if s != 1:
                    raise ValueError(
                        f"{origin!r}: refinement size {s} != 1"
                    )
                val = p1 if reader.read_bit() else m1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break  # EOB section below finishes the band
                # r == 15: ZRL — skip 16 zero-history slots
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0:
                if reader.read_bit() and (c & p1) == 0:
                    blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


class _ProgWriter:
    """Scan-level writer for progressive encoding: EOB-run and
    buffered-correction-bit bookkeeping on top of _BitWriter."""

    def __init__(self, ac_codes) -> None:
        self.w = _BitWriter()
        self.ac = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits owed after EOB

    def sym(self, s: int) -> None:
        code, ln = self.ac[s]
        self.w.write(code, ln)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.w.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.pending:
            self.w.write(b, 1)
        self.pending = []

    def end_scan(self) -> bytes:
        self.flush_eobrun()
        self.w.flush()
        return bytes(self.w.out)


def encode_jpeg_progressive(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int = 85,
    subsampling: str = "444",
    quant_tables: tuple[np.ndarray, np.ndarray] | None = None,
    split_at: int = 6,
) -> bytes:
    """Serialize pixels as a PROGRESSIVE (SOF2) stream with the
    classic scan script: DC first at Al=1 (all components,
    interleaved), AC spectral bands [1, split_at-1] and
    [split_at, 63] per component at Al=1, then one successive-
    approximation refinement of each (Ah=1 → Al=0).  Coefficients are
    identical to what ``encode_jpeg_baseline`` writes for the same
    inputs, so progressive and baseline decodes of the same source
    must produce bit-identical pixels — the cross-validation the
    tests pin."""
    comp_blocks, samp, qsel, qluma, qchroma, mcux, mcuy = (
        _prepare_components(
            width, height, channels, pixels, quality, subsampling,
            quant_tables,
        )
    )
    dc_codes = _build_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _build_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    out, seg = _headers(
        width, height, channels, samp, qsel, qluma, qchroma, 0xC2
    )

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        body = bytearray([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, bytes(body))

    # ---- scan 1: DC first pass, Al=1, all components interleaved ----
    w = _BitWriter()
    pred = [0] * len(samp)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hs, vs) in enumerate(samp):
                for by in range(vs):
                    for bx in range(hs):
                        v = int(comp_blocks[ci][my * vs + by, mx * hs + bx][0]) >> 1
                        diff = v - pred[ci]
                        pred[ci] = v
                        size = _category(diff)
                        code, ln = dc_codes[size]
                        w.write(code, ln)
                        if size:
                            w.write(
                                diff if diff >= 0 else diff + (1 << size) - 1,
                                size,
                            )
    w.flush()
    out += sos_header(list(range(1, channels + 1)), 0, 0, 0, 1)
    out += w.out

    def comp_grid(ci):
        hs, vs = samp[ci]
        hmax = max(s[0] for s in samp)
        vmax = max(s[1] for s in samp)
        cw = -(-width * hs // hmax)
        chh = -(-height * vs // vmax)
        return -(-cw // 8), -(-chh // 8)

    # ---- AC first passes, Al=1, spectral split per component ----
    bands = [(1, split_at - 1), (split_at, 63)]
    for ci in range(channels):
        bw, bh = comp_grid(ci)
        for ss, se in bands:
            pw = _ProgWriter(ac_codes)
            for by in range(bh):
                for bx in range(bw):
                    zz = comp_blocks[ci][by, bx]
                    run = 0
                    wrote = False
                    for k in range(ss, se + 1):
                        c = int(zz[k])
                        v = (abs(c) >> 1) * (1 if c >= 0 else -1)
                        if v == 0:
                            run += 1
                            continue
                        pw.flush_eobrun()
                        while run > 15:
                            pw.sym(0xF0)
                            run -= 16
                        size = _category(v)
                        pw.sym((run << 4) | size)
                        pw.w.write(
                            v if v >= 0 else v + (1 << size) - 1, size
                        )
                        run = 0
                        wrote = True
                    if run or not wrote:
                        pw.eobrun += 1
                        if pw.eobrun == 0x7FFF:
                            pw.flush_eobrun()
            out += sos_header([ci + 1], ss, se, 0, 1)
            out += pw.end_scan()

    # ---- DC refinement: Ah=1 -> Al=0, one raw bit per block ----
    w = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hs, vs) in enumerate(samp):
                for by in range(vs):
                    for bx in range(hs):
                        w.write(
                            int(comp_blocks[ci][my * vs + by, mx * hs + bx][0]) & 1,
                            1,
                        )
    w.flush()
    out += sos_header(list(range(1, channels + 1)), 0, 0, 1, 0)
    out += w.out

    # ---- AC refinements: Ah=1 -> Al=0 per band per component ----
    for ci in range(channels):
        bw, bh = comp_grid(ci)
        for ss, se in bands:
            pw = _ProgWriter(ac_codes)
            for by in range(bh):
                for bx in range(bw):
                    zz = comp_blocks[ci][by, bx]
                    absv = [abs(int(zz[k])) for k in range(ss, se + 1)]
                    eob = -1  # index of last NEWLY significant coef
                    for i, t in enumerate(absv):
                        if t == 1:
                            eob = i
                    run = 0
                    br: list[int] = []
                    for i, t in enumerate(absv):
                        if t == 0:
                            run += 1
                            continue
                        # ZRLs not foldable into the EOB run must be
                        # emitted for EVERY nonzero coefficient — also
                        # when it is history-significant — or the
                        # buffered correction bit lands after a ZRL the
                        # decoder's skip walk never revisits (libjpeg
                        # encode_mcu_AC_refine emits before the
                        # temp > 1 test).
                        while run > 15 and i <= eob:
                            pw.flush_eobrun()
                            pw.sym(0xF0)
                            run -= 16
                            for b in br:
                                pw.w.write(b, 1)
                            br = []
                        if t > 1:
                            # history-significant: owe a correction bit
                            br.append(t & 1)
                            continue
                        # newly significant (t == 1)
                        pw.flush_eobrun()
                        pw.sym((run << 4) | 1)
                        pw.w.write(
                            1 if int(zz[ss + i]) >= 0 else 0, 1
                        )
                        for b in br:
                            pw.w.write(b, 1)
                        br = []
                        run = 0
                    if run > 0 or br:
                        pw.eobrun += 1
                        pw.pending.extend(br)
                        if pw.eobrun == 0x7FFF:
                            pw.flush_eobrun()
            out += sos_header([ci + 1], ss, se, 1, 0)
            out += pw.end_scan()

    out += b"\xff\xd9"
    return bytes(out)
