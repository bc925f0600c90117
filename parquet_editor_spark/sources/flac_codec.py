"""Pure-numpy FLAC codec — full sample decode, fixed-predictor encode.

Dependency-free implementation of the public FLAC format spec
(RFC 9639 / xiph.org format.html); closes the "FLAC audio decode
needs libFLAC" gate in ``operators/multimodal`` the way r9's WAV
tier closed the compressed-WAV gates.  The reference app
(main.py:1-221) has no media code at all — this is EXT-mandate
multimodal depth.

Decode handles the complete frame bitstream: CONSTANT / VERBATIM /
FIXED(0-4) / LPC(1-32) subframes, partitioned Rice residuals (both
the 4-bit and 5-bit parameter methods, escape-to-raw partitions),
wasted bits, left/side / right/side / mid/side stereo decorrelation,
UTF-8-coded frame numbers, and CRC-8 (header) + CRC-16 (frame)
verification.  Rice decoding walks a precomputed ``flatnonzero``
index of set bits (amortized O(total set bits)) and gathers all
k-bit remainders in one vectorized pass per partition; fixed
predictors reconstruct by repeated ``cumsum`` (order-o prediction is
exactly o-fold integration); only LPC reconstruction is a sequential
per-sample recurrence (data dependence through the shifted dot —
inherent to the format).

Encode produces fixed-blocking streams with CONSTANT, VERBATIM and
FIXED(0-4) subframes, a cost-chosen Rice parameter per partition,
independent or mid/side stereo, correct CRCs and the STREAMINFO MD5
signature.  Because FLAC is lossless, ``decode(encode(x)) == x``
bit-exactly for any int signal in range — the differential oracle
for the driver query is therefore closed-form on the synthesized
signal, while the Spark side runs the whole real bitstream.

Scale shape: one clip is one row; all work happens executor-side
inside Arrow ``mapInPandas`` batches, O(clip bits) per row, no
shuffle, no driver involvement.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MAGIC = b"fLaC"

# ---------------------------------------------------------------- CRCs


def _make_crc8_table() -> list[int]:
    tbl = []
    for b in range(256):
        r = b
        for _ in range(8):
            r = ((r << 1) ^ 0x07) & 0xFF if r & 0x80 else (r << 1) & 0xFF
        tbl.append(r)
    return tbl


def _make_crc16_table() -> list[int]:
    tbl = []
    for b in range(256):
        r = b << 8
        for _ in range(8):
            r = (
                ((r << 1) ^ 0x8005) & 0xFFFF
                if r & 0x8000
                else (r << 1) & 0xFFFF
            )
        tbl.append(r)
    return tbl


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _CRC16[(r >> 8) ^ b]
    return r


# ----------------------------------------------------- UTF-8-ish numbers


def _utf8_encode_number(val: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame/sample index, ≤36 bits).

    An (n_extra+1)-byte form carries 6·n_extra bits in continuation
    bytes plus (6−n_extra) bits in the lead byte (0 for the 7-byte
    0xFE form)."""
    if val < 0x80:
        return bytes([val])
    for n_extra, lead in ((1, 0xC0), (2, 0xE0), (3, 0xF0), (4, 0xF8),
                          (5, 0xFC), (6, 0xFE)):
        lead_bits = 6 - n_extra
        if val < (1 << (6 * n_extra + lead_bits)):
            out = [lead | (val >> (6 * n_extra))]
            for i in range(n_extra - 1, -1, -1):
                out.append(0x80 | ((val >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError(f"frame number {val} out of UTF-8 range")


def _utf8_decode_number(data: bytes, pos: int, origin: str) -> tuple[int, int]:
    b0 = data[pos]
    if b0 < 0x80:
        return b0, pos + 1
    n_extra = 0
    for mask, lead, n in ((0xE0, 0xC0, 1), (0xF0, 0xE0, 2), (0xF8, 0xF0, 3),
                          (0xFC, 0xF8, 4), (0xFE, 0xFC, 5), (0xFF, 0xFE, 6)):
        if b0 & mask == lead:
            n_extra = n
            val = b0 & (~mask & 0xFF)
            break
    else:
        raise ValueError(f"{origin}: bad UTF-8 lead byte 0x{b0:02x}")
    for i in range(1, n_extra + 1):
        c = data[pos + i]
        if c & 0xC0 != 0x80:
            raise ValueError(f"{origin}: bad UTF-8 continuation")
        val = (val << 6) | (c & 0x3F)
    return val, pos + 1 + n_extra


# ------------------------------------------------------------- bit reads

_POW2 = [1 << i for i in range(40)]


def _read_uint(bits: np.ndarray, pos: int, n: int) -> int:
    if n == 0:
        return 0
    seg = bits[pos : pos + n]
    if len(seg) < n:
        raise ValueError("truncated FLAC bitstream")
    v = 0
    for b in seg:
        v = (v << 1) | int(b)
    return v


def _read_sint(bits: np.ndarray, pos: int, n: int) -> int:
    v = _read_uint(bits, pos, n)
    return v - (1 << n) if v >= (1 << (n - 1)) else v


def _read_signed_block(
    bits: np.ndarray, pos: int, n_vals: int, width: int
) -> np.ndarray:
    """n_vals signed width-bit integers, vectorized gather."""
    if n_vals == 0:
        return np.zeros(0, np.int64)
    if width == 0:
        return np.zeros(n_vals, np.int64)
    end = pos + n_vals * width
    if end > len(bits):
        raise ValueError("truncated FLAC bitstream")
    mat = bits[pos:end].reshape(n_vals, width).astype(np.int64)
    w = (1 << np.arange(width - 1, -1, -1, dtype=np.int64))
    vals = mat @ w
    sign = 1 << (width - 1)
    return np.where(vals >= sign, vals - (1 << width), vals)


# ----------------------------------------------------------- rice codes


def _rice_decode(
    bits: np.ndarray,
    ones: np.ndarray,
    pos: int,
    n: int,
    k: int,
    origin: str,
) -> tuple[np.ndarray, int]:
    """Decode ``n`` Rice(k) codes starting at bit ``pos``.

    ``ones`` is ``np.flatnonzero(bits)`` for the whole frame region,
    computed once per stream; the unary terminator of each code is
    found by an amortized forward walk (each set bit is visited at
    most once), and the k-bit remainders are gathered in a single
    vectorized pass."""
    if n == 0:
        return np.zeros(0, np.int64), pos
    qs = np.empty(n, np.int64)
    starts = np.empty(n, np.int64)
    j = int(np.searchsorted(ones, pos))
    n_ones = len(ones)
    for i in range(n):
        while j < n_ones and ones[j] < pos:
            j += 1
        if j >= n_ones:
            raise ValueError(f"{origin}: truncated Rice partition")
        t = int(ones[j])
        qs[i] = t - pos
        starts[i] = t + 1
        pos = t + 1 + k
        j += 1
    if pos > len(bits):
        raise ValueError(f"{origin}: truncated Rice partition")
    if k:
        idx = starts[:, None] + np.arange(k)
        rem = bits[idx].astype(np.int64) @ (
            1 << np.arange(k - 1, -1, -1, dtype=np.int64)
        )
        u = (qs << k) | rem
    else:
        u = qs
    return (u >> 1) ^ -(u & 1), pos


def _decode_residual(
    bits: np.ndarray,
    ones: np.ndarray,
    pos: int,
    block_size: int,
    pred_order: int,
    origin: str,
) -> tuple[np.ndarray, int]:
    method = _read_uint(bits, pos, 2)
    pos += 2
    if method > 1:
        raise ValueError(f"{origin}: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = _read_uint(bits, pos, 4)
    pos += 4
    n_parts = 1 << part_order
    if block_size % n_parts or (block_size >> part_order) <= pred_order:
        raise ValueError(f"{origin}: bad partition order {part_order}")
    out = []
    for p in range(n_parts):
        n_vals = (block_size >> part_order) - (pred_order if p == 0 else 0)
        param = _read_uint(bits, pos, pbits)
        pos += pbits
        if param == escape:
            raw = _read_uint(bits, pos, 5)
            pos += 5
            vals = _read_signed_block(bits, pos, n_vals, raw)
            pos += n_vals * raw
            out.append(vals)
        else:
            vals, pos = _rice_decode(bits, ones, pos, n_vals, param, origin)
            out.append(vals)
    return np.concatenate(out) if out else np.zeros(0, np.int64), pos


# ------------------------------------------------------------ predictors


def _restore_fixed(warmup: np.ndarray, resid: np.ndarray, order: int
                   ) -> np.ndarray:
    """Order-o fixed prediction is o-fold differencing; invert by
    o-fold cumsum seeded with the warmup's finite differences."""
    if order == 0:
        return resid.copy()
    diffs = [warmup.astype(np.int64)]
    for _ in range(order):
        diffs.append(np.diff(diffs[-1]))
    x = resid.astype(np.int64)
    for j in range(order, 0, -1):
        x = int(diffs[j - 1][-1]) + np.cumsum(x)
    return np.concatenate([warmup, x])


def _restore_lpc(
    warmup: np.ndarray,
    resid: np.ndarray,
    coefs: list[int],
    shift: int,
) -> np.ndarray:
    """s[i] = e[i] + (Σ c_j·s[i-1-j]) >> shift — an inherently
    sequential integer recurrence (the shift truncates, so no linear
    closed form); plain-Python ints keep it exact."""
    order = len(coefs)
    s = [int(v) for v in warmup]
    for e in resid:
        acc = 0
        for j in range(order):
            acc += coefs[j] * s[-1 - j]
        s.append(int(e) + (acc >> shift))
    return np.array(s, np.int64)


# ---------------------------------------------------------------- decode

_BLOCKSIZE_TBL = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATE_TBL = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_TBL = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _skip_metadata(data: bytes, origin: str) -> int:
    """Byte offset of the first audio frame (after all metadata)."""
    if len(data) < 8 or data[:4] != _MAGIC:
        raise ValueError(f"{origin!r} is not a FLAC stream (no fLaC)")
    pos = 4
    while True:
        if pos + 4 > len(data):
            raise ValueError(f"{origin!r}: truncated metadata block header")
        last = bool(data[pos] & 0x80)
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        pos += 4 + length
        if pos > len(data):
            raise ValueError(f"{origin!r}: truncated metadata block")
        if last:
            return pos


def _decode_subframe(
    bits: np.ndarray,
    ones: np.ndarray,
    pos: int,
    block_size: int,
    bps: int,
    origin: str,
) -> tuple[np.ndarray, int]:
    if _read_uint(bits, pos, 1):
        raise ValueError(f"{origin}: subframe padding bit set")
    pos += 1
    sf_type = _read_uint(bits, pos, 6)
    pos += 6
    wasted = 0
    if _read_uint(bits, pos, 1):
        pos += 1
        while not _read_uint(bits, pos, 1):
            wasted += 1
            pos += 1
        pos += 1
        wasted += 1
    else:
        pos += 1
    eff = bps - wasted
    if sf_type == 0:  # CONSTANT
        v = _read_sint(bits, pos, eff)
        pos += eff
        out = np.full(block_size, v, np.int64)
    elif sf_type == 1:  # VERBATIM
        out = _read_signed_block(bits, pos, block_size, eff)
        pos += block_size * eff
    elif 8 <= sf_type <= 12:  # FIXED
        order = sf_type - 8
        warmup = _read_signed_block(bits, pos, order, eff)
        pos += order * eff
        resid, pos = _decode_residual(
            bits, ones, pos, block_size, order, origin
        )
        out = _restore_fixed(warmup, resid, order)
    elif sf_type >= 32:  # LPC
        order = (sf_type & 0x1F) + 1
        warmup = _read_signed_block(bits, pos, order, eff)
        pos += order * eff
        prec = _read_uint(bits, pos, 4) + 1
        pos += 4
        if prec == 16:
            raise ValueError(f"{origin}: invalid LPC precision escape")
        shift = _read_sint(bits, pos, 5)
        pos += 5
        if shift < 0:
            raise ValueError(f"{origin}: negative LPC shift")
        coefs = []
        for _ in range(order):
            coefs.append(_read_sint(bits, pos, prec))
            pos += prec
        resid, pos = _decode_residual(
            bits, ones, pos, block_size, order, origin
        )
        out = _restore_lpc(warmup, resid, coefs, shift)
    else:
        raise ValueError(f"{origin}: reserved subframe type {sf_type}")
    if wasted:
        out = out << wasted
    return out, pos


def decode_flac(
    data: bytes, origin: str = "<bytes>", verify_md5: bool = True
) -> tuple[int, int, int, int, np.ndarray]:
    """Decode a FLAC stream → (sample_rate, channels, bits_per_sample,
    n_frames, samples) with ``samples`` an int64 array of shape
    (n_frames, channels).  Malformed streams raise ValueError (with
    CRC mismatches called out); reserved/invalid codes raise too —
    failing loudly, never fabricating audio."""
    from parquet_editor_spark.sources.flac import flac_stream_info

    si_rate, si_ch, si_bps, si_total = flac_stream_info(data, origin)
    md5_sig = data[8 + 18 : 8 + 34]
    frame_start = _skip_metadata(data, origin)
    body = data[frame_start:]
    if not body:
        if si_total:
            raise ValueError(
                f"{origin!r}: STREAMINFO claims {si_total} samples but "
                "stream has no audio frames"
            )
        return si_rate, si_ch, si_bps, 0, np.zeros((0, si_ch), np.int64)

    bits = np.unpackbits(np.frombuffer(body, np.uint8))
    ones = np.flatnonzero(bits)
    byte_pos = 0
    chans: list[list[np.ndarray]] = [[] for _ in range(si_ch)]
    got = 0
    while byte_pos < len(body):
        if byte_pos + 5 > len(body):
            raise ValueError(f"{origin!r}: truncated frame header")
        if body[byte_pos] != 0xFF or (body[byte_pos + 1] & 0xFE) != 0xF8:
            raise ValueError(
                f"{origin!r}: lost frame sync at byte {frame_start + byte_pos}"
            )
        b2, b3 = body[byte_pos + 2], body[byte_pos + 3]
        bs_code, rate_code = b2 >> 4, b2 & 0xF
        ch_assign, bps_code = b3 >> 4, (b3 >> 1) & 0x7
        p = byte_pos + 4
        _frame_no, p = _utf8_decode_number(body, p, origin)
        if bs_code == 0:
            raise ValueError(f"{origin!r}: reserved block size code 0")
        elif bs_code == 6:
            block_size = body[p] + 1
            p += 1
        elif bs_code == 7:
            block_size = int.from_bytes(body[p : p + 2], "big") + 1
            p += 2
        else:
            block_size = _BLOCKSIZE_TBL[bs_code]
        if rate_code == 0:
            rate = si_rate
        elif rate_code == 12:
            rate = body[p] * 1000
            p += 1
        elif rate_code == 13:
            rate = int.from_bytes(body[p : p + 2], "big")
            p += 2
        elif rate_code == 14:
            rate = int.from_bytes(body[p : p + 2], "big") * 10
            p += 2
        elif rate_code == 15:
            raise ValueError(f"{origin!r}: invalid sample rate code")
        else:
            rate = _RATE_TBL[rate_code]
        if rate != si_rate:
            raise ValueError(
                f"{origin!r}: frame rate {rate} != STREAMINFO {si_rate}"
            )
        if bps_code == 0:
            bps = si_bps
        elif bps_code in _BPS_TBL:
            bps = _BPS_TBL[bps_code]
        else:
            raise ValueError(f"{origin!r}: reserved sample size code")
        if bps != si_bps:
            raise ValueError(
                f"{origin!r}: frame bps {bps} != STREAMINFO {si_bps}"
            )
        if ch_assign < 8:
            n_ch = ch_assign + 1
        elif ch_assign in (8, 9, 10):
            n_ch = 2
        else:
            raise ValueError(
                f"{origin!r}: reserved channel assignment {ch_assign}"
            )
        if n_ch != si_ch:
            raise ValueError(
                f"{origin!r}: frame channels {n_ch} != STREAMINFO {si_ch}"
            )
        hdr_crc = body[p]
        if crc8(body[byte_pos : p]) != hdr_crc:
            raise ValueError(f"{origin!r}: frame header CRC-8 mismatch")
        p += 1

        pos = p * 8
        subs = []
        for c in range(n_ch):
            sub_bps = bps
            if (ch_assign == 8 and c == 1) or (ch_assign == 9 and c == 0) \
                    or (ch_assign == 10 and c == 1):
                sub_bps += 1  # the side channel carries one extra bit
            sub, pos = _decode_subframe(
                bits, ones, pos, block_size, sub_bps, origin
            )
            subs.append(sub)
        if ch_assign == 8:  # left/side
            left = subs[0]
            subs = [left, left - subs[1]]
        elif ch_assign == 9:  # right/side
            right = subs[1]
            subs = [subs[0] + right, right]
        elif ch_assign == 10:  # mid/side
            mid2 = (subs[0] << 1) | (subs[1] & 1)
            subs = [(mid2 + subs[1]) >> 1, (mid2 - subs[1]) >> 1]

        pos = (pos + 7) & ~7  # zero-padding to byte alignment
        end_byte = pos // 8
        if end_byte + 2 > len(body):
            raise ValueError(f"{origin!r}: truncated frame footer")
        want = int.from_bytes(body[end_byte : end_byte + 2], "big")
        if crc16(body[byte_pos:end_byte]) != want:
            raise ValueError(f"{origin!r}: frame CRC-16 mismatch")
        byte_pos = end_byte + 2

        for c in range(si_ch):
            chans[c].append(subs[c])
        got += block_size
        if si_total and got >= si_total:
            break

    if si_total and got != si_total:
        raise ValueError(
            f"{origin!r}: decoded {got} samples, STREAMINFO says {si_total}"
        )
    samples = np.stack(
        [np.concatenate(c) for c in chans], axis=1
    ) if got else np.zeros((0, si_ch), np.int64)

    if verify_md5 and md5_sig != b"\x00" * 16 and si_bps % 8 == 0:
        raw = _pack_le(samples, si_bps // 8)
        if hashlib.md5(raw).digest() != md5_sig:
            raise ValueError(f"{origin!r}: STREAMINFO MD5 mismatch")
    return si_rate, si_ch, si_bps, got, samples


def _pack_le(samples: np.ndarray, width: int) -> bytes:
    """Interleaved little-endian signed packing (MD5 input layout)."""
    flat = samples.reshape(-1).astype(np.int64)
    u = flat & ((1 << (8 * width)) - 1)
    out = np.empty((len(flat), width), np.uint8)
    for i in range(width):
        out[:, i] = (u >> (8 * i)) & 0xFF
    return out.tobytes()


# ---------------------------------------------------------------- encode


class _BitSink:
    """Accumulates MSB-first bit arrays; packs to bytes at the end."""

    def __init__(self) -> None:
        self._chunks: list[np.ndarray] = []

    def write_uint(self, val: int, n: int) -> None:
        if n == 0:
            return
        arr = (
            (val >> np.arange(n - 1, -1, -1, dtype=np.int64)) & 1
        ).astype(np.uint8)
        self._chunks.append(arr)

    def write_sint(self, val: int, n: int) -> None:
        self.write_uint(val & ((1 << n) - 1), n)

    def write_bits(self, arr: np.ndarray) -> None:
        self._chunks.append(arr)

    def to_bytes(self) -> bytes:
        if not self._chunks:
            return b""
        bits = np.concatenate(self._chunks)
        pad = (-len(bits)) % 8
        if pad:
            bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
        return np.packbits(bits).tobytes()


def _rice_encode_bits(e: np.ndarray, k: int) -> np.ndarray:
    """Vectorized Rice(k) bit array for a residual partition."""
    u = ((e.astype(np.int64) << 1) ^ (e.astype(np.int64) >> 63)).astype(
        np.int64
    )
    q = u >> k
    lens = q + 1 + k
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    total = int(lens.sum())
    bits = np.zeros(total, np.uint8)
    bits[starts + q] = 1
    if k:
        idx = (starts + q + 1)[:, None] + np.arange(k)
        vals = (
            (u[:, None] >> np.arange(k - 1, -1, -1, dtype=np.int64)) & 1
        ).astype(np.uint8)
        bits[idx] = vals
    return bits


def _best_rice_k(e: np.ndarray, max_k: int = 30) -> tuple[int, int]:
    """(k, total bits) minimizing the Rice cost for residuals ``e``."""
    u = (e.astype(np.int64) << 1) ^ (e.astype(np.int64) >> 63)
    best_k, best_cost = 0, None
    for k in range(max_k + 1):
        cost = int((u >> k).sum()) + len(u) * (1 + k)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
        elif cost > best_cost * 2:
            break
    return best_k, best_cost


def _fixed_residuals(sig: np.ndarray, order: int) -> np.ndarray:
    r = sig.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _encode_subframe(
    sink: _BitSink, sig: np.ndarray, bps: int
) -> None:
    n = len(sig)
    if n and int(sig.min()) == int(sig.max()):
        sink.write_uint(0, 1)          # pad
        sink.write_uint(0, 6)          # CONSTANT
        sink.write_uint(0, 1)          # no wasted bits
        sink.write_sint(int(sig[0]), bps)
        return
    # pick the fixed order (0-4) with the cheapest Rice body
    best = None
    for order in range(0, min(5, n)):
        resid = _fixed_residuals(sig, order)
        if len(resid) == 0:
            continue
        if int(np.abs(resid).max(initial=0)) >= (1 << 40):
            continue
        k, cost = _best_rice_k(resid)
        total = order * bps + 6 + cost
        if best is None or total < best[0]:
            best = (total, order, resid, k)
    verbatim_cost = n * bps
    if best is None or best[0] >= verbatim_cost:
        sink.write_uint(0, 1)
        sink.write_uint(1, 6)          # VERBATIM
        sink.write_uint(0, 1)
        for v in sig:
            sink.write_sint(int(v), bps)
        return
    _, order, resid, k = best
    sink.write_uint(0, 1)
    sink.write_uint(8 + order, 6)      # FIXED(order)
    sink.write_uint(0, 1)
    for v in sig[:order]:
        sink.write_sint(int(v), bps)
    method = 0 if k <= 14 else 1
    pbits = 4 if method == 0 else 5
    sink.write_uint(method, 2)
    sink.write_uint(0, 4)              # partition order 0
    sink.write_uint(k, pbits)
    sink.write_bits(_rice_encode_bits(resid, k))


def encode_flac(
    sample_rate: int,
    channels: int,
    bits_per_sample: int,
    samples: np.ndarray,
    block_size: int = 4096,
    stereo: str = "independent",
) -> bytes:
    """Encode int samples (shape (n, channels) or flat interleaved)
    into a spec-valid FLAC stream.  ``stereo="mid-side"`` uses
    mid/side decorrelation on 2-channel input (exercising the
    decoder's reconstruction path); anything else encodes channels
    independently.  Lossless by construction."""
    if channels < 1 or channels > 8:
        raise ValueError(f"channels must be 1-8, got {channels}")
    if bits_per_sample not in (8, 12, 16, 20, 24, 32):
        raise ValueError(f"unsupported bits_per_sample {bits_per_sample}")
    if not (0 < sample_rate < (1 << 20)):
        raise ValueError(f"sample_rate out of range: {sample_rate}")
    if (
        sample_rate not in _RATE_TBL.values()
        and not (sample_rate % 1000 == 0 and sample_rate // 1000 < 256)
        and sample_rate >= 65536
        and (sample_rate % 10 or sample_rate // 10 >= 65536)
    ):
        # the only remaining frame-header encoding is code 14 (rate/10
        # in 16 bits); a rate it can't represent exactly would disagree
        # with STREAMINFO and be rejected by decode_flac
        raise ValueError(
            f"sample_rate {sample_rate} >= 65536 must be divisible by 10 "
            "and < 655360 (FLAC frame-header code-14 stores rate/10)"
        )
    s = np.asarray(samples, np.int64)
    if s.ndim == 1:
        if len(s) % channels:
            raise ValueError("flat sample count not divisible by channels")
        s = s.reshape(-1, channels)
    if s.ndim != 2 or s.shape[1] != channels:
        raise ValueError(f"samples shape {s.shape} != (n, {channels})")
    lo, hi = -(1 << (bits_per_sample - 1)), (1 << (bits_per_sample - 1)) - 1
    if len(s) and (int(s.min()) < lo or int(s.max()) > hi):
        raise ValueError(
            f"samples exceed {bits_per_sample}-bit range "
            f"[{lo}, {hi}]"
        )
    n_total = len(s)

    # ---- STREAMINFO
    si = bytearray()
    si += block_size.to_bytes(2, "big") * 2      # min/max blocksize
    si += (0).to_bytes(3, "big") * 2             # min/max framesize unknown
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | (n_total & ((1 << 36) - 1))
    )
    si += packed.to_bytes(8, "big")
    if bits_per_sample % 8 == 0 and n_total:
        si += hashlib.md5(_pack_le(s, bits_per_sample // 8)).digest()
    else:
        si += b"\x00" * 16

    out = bytearray(_MAGIC)
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    rate_code_rev = {v: c for c, v in _RATE_TBL.items()}
    bps_code_rev = {v: c for c, v in _BPS_TBL.items()}
    use_ms = stereo == "mid-side" and channels == 2

    frame_no = 0
    off = 0
    while off < n_total:
        block = s[off : off + block_size]
        bs = len(block)
        hdr = bytearray(b"\xff\xf8")
        if bs <= 256:
            bs_code, bs_extra = 6, bytes([bs - 1])
        else:
            bs_code, bs_extra = 7, (bs - 1).to_bytes(2, "big")
        if sample_rate in rate_code_rev:
            rate_code, rate_extra = rate_code_rev[sample_rate], b""
        elif sample_rate % 1000 == 0 and sample_rate // 1000 < 256:
            rate_code, rate_extra = 12, bytes([sample_rate // 1000])
        elif sample_rate < 65536:
            rate_code, rate_extra = 13, sample_rate.to_bytes(2, "big")
        else:
            rate_code, rate_extra = 14, (sample_rate // 10).to_bytes(2, "big")
        ch_assign = 10 if use_ms else channels - 1
        hdr.append((bs_code << 4) | rate_code)
        hdr.append((ch_assign << 4) | (bps_code_rev[bits_per_sample] << 1))
        hdr += _utf8_encode_number(frame_no)
        hdr += bs_extra + rate_extra
        hdr.append(crc8(bytes(hdr)))

        sink = _BitSink()
        if use_ms:
            left, right = block[:, 0], block[:, 1]
            mid = (left + right) >> 1
            side = left - right
            _encode_subframe(sink, mid, bits_per_sample)
            _encode_subframe(sink, side, bits_per_sample + 1)
        else:
            for c in range(channels):
                _encode_subframe(sink, block[:, c], bits_per_sample)
        frame = bytes(hdr) + sink.to_bytes()
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
        off += bs
        frame_no += 1

    return bytes(out)
