"""FLAC codec unit tests — sources/flac_codec.py.

Two layers, per the r9 lesson (codecs must be tested with noise and
with decoder paths the encoder never emits, not just round-trip
fixtures):

* encoder→decoder round-trips over noise at every bit depth /
  channel layout / stereo mode (lossless ⇒ exact equality);
* hand-assembled bitstreams for the decoder-only paths — LPC
  subframes, partition order > 0, escape partitions, wasted bits,
  left/side and right/side decorrelation — each checked against an
  independent scalar reference computed in the test.
"""

from __future__ import annotations

import numpy as np
import pytest

from parquet_editor_spark.sources.flac import make_flac_header
from parquet_editor_spark.sources.flac_codec import (
    _BitSink,
    _rice_encode_bits,
    _utf8_decode_number,
    _utf8_encode_number,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def _noise(n, ch, bps, seed):
    rng = np.random.RandomState(seed)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    t = np.arange(n * ch)
    sig = (np.sin(t / 37.0) * (hi // 3)).astype(np.int64)
    sig += rng.randint(-(hi // 7) - 1, hi // 7 + 1, n * ch)
    return np.clip(sig, lo, hi).reshape(n, ch)


@pytest.mark.parametrize(
    "ch,bps,n,stereo",
    [
        (1, 8, 700, "independent"),
        (1, 12, 257, "independent"),
        (1, 16, 4096, "independent"),
        (2, 16, 5000, "independent"),
        (2, 16, 5000, "mid-side"),
        (2, 20, 1111, "mid-side"),
        (2, 24, 4100, "mid-side"),
        (2, 32, 333, "mid-side"),
        (3, 16, 999, "independent"),
        (1, 16, 1, "independent"),
    ],
)
def test_roundtrip_noise(ch, bps, n, stereo):
    sig = _noise(n, ch, bps, seed=bps * 100 + ch)
    data = encode_flac(44100, ch, bps, sig, block_size=1024, stereo=stereo)
    r, c, b, m, out = decode_flac(data)
    assert (r, c, b, m) == (44100, ch, bps, n)
    assert np.array_equal(out, sig)


def test_roundtrip_extreme_values():
    """Full-scale alternation — worst case for predictors, must still
    be lossless (falls back to VERBATIM when Rice would be bigger)."""
    lo, hi = -(1 << 15), (1 << 15) - 1
    sig = np.tile([lo, hi], 600).reshape(-1, 1)
    data = encode_flac(8000, 1, 16, sig)
    assert np.array_equal(decode_flac(data)[4], sig)


def test_constant_block_uses_constant_subframe():
    sig = np.full((4096, 1), -12345, np.int64)
    data = encode_flac(16000, 1, 16, sig)
    # magic+streaminfo = 4+4+34 = 42; one CONSTANT frame is tiny
    assert len(data) < 70
    assert np.array_equal(decode_flac(data)[4], sig)


def test_compresses_smooth_signal():
    n = 8192
    sig = (np.sin(np.arange(n) / 40.0) * 9000).astype(np.int64).reshape(-1, 1)
    data = encode_flac(44100, 1, 16, sig)
    assert len(data) < n * 2 * 0.7  # beats raw PCM by >30%
    assert np.array_equal(decode_flac(data)[4], sig)


def test_multiframe_and_wide_frame_numbers():
    # 300 frames of 64 samples forces multi-byte UTF-8 frame numbers
    sig = _noise(300 * 64, 1, 16, seed=3)
    data = encode_flac(22050, 1, 16, sig, block_size=64)
    assert np.array_equal(decode_flac(data)[4], sig)


@pytest.mark.parametrize("rate", [44100, 11025, 192000, 256000, 8000])
def test_sample_rate_codes(rate):
    sig = _noise(500, 1, 16, seed=rate % 97)
    out = decode_flac(encode_flac(rate, 1, 16, sig))
    assert out[0] == rate and np.array_equal(out[4], sig)


def test_utf8_number_roundtrip():
    for v in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
              0x1FFFFF, 0x200000, 0x3FFFFFF, 0x4000000, 0x7FFFFFFF,
              (1 << 36) - 1]:
        enc = _utf8_encode_number(v)
        got, pos = _utf8_decode_number(enc, 0, "t")
        assert got == v and pos == len(enc)


def test_rejects_non_flac_and_truncated():
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFFxxxxWAVE")
    good = encode_flac(8000, 1, 16, _noise(100, 1, 16, 1))
    with pytest.raises(ValueError):
        decode_flac(good[:-3])


def test_header_crc8_detects_corruption():
    sig = _noise(100, 1, 16, seed=2)
    data = bytearray(encode_flac(8000, 1, 16, sig))
    # frame starts right after magic(4)+block header(4)+streaminfo(34)
    start = 42
    # corrupt the blocksize/rate byte (keeps sync intact)
    data[start + 2] ^= 0x10
    with pytest.raises(ValueError, match="CRC-8|reserved|rate"):
        decode_flac(bytes(data))


def test_frame_crc16_detects_corruption():
    sig = _noise(400, 1, 16, seed=4)
    data = bytearray(encode_flac(8000, 1, 16, sig))
    data[-1] ^= 0x01  # last byte is half of the final frame's CRC-16
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(data))


def test_streaminfo_md5_detects_mismatch():
    sig = _noise(100, 1, 16, seed=5)
    data = bytearray(encode_flac(8000, 1, 16, sig))
    data[8 + 18] ^= 0xFF  # first MD5 byte inside STREAMINFO
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(data))
    # and verify_md5=False skips the check
    decode_flac(bytes(data), verify_md5=False)


def test_encode_rejects_out_of_range():
    with pytest.raises(ValueError, match="range"):
        encode_flac(8000, 1, 8, np.array([[200]]))
    with pytest.raises(ValueError, match="bits_per_sample"):
        encode_flac(8000, 1, 13, np.zeros((4, 1), np.int64))


# ------------------------------------------------------------------
# hand-assembled bitstreams for decoder-only paths
# ------------------------------------------------------------------


def _assemble(rate, ch, bps, n, ch_assign, subframe_writer):
    """Build magic+STREAMINFO+one frame; subframe_writer(sink) emits
    all subframe bits."""
    hdr = bytearray(b"\xff\xf8")
    bs_code, bs_extra = (6, bytes([n - 1])) if n <= 256 else (
        7, (n - 1).to_bytes(2, "big"))
    hdr.append((bs_code << 4) | 13)  # 16-bit explicit rate
    bpc = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
    hdr.append((ch_assign << 4) | (bpc << 1))
    hdr += _utf8_encode_number(0)
    hdr += bs_extra + rate.to_bytes(2, "big")
    hdr.append(crc8(bytes(hdr)))
    sink = _BitSink()
    subframe_writer(sink)
    frame = bytes(hdr) + sink.to_bytes()
    frame += crc16(frame).to_bytes(2, "big")
    return make_flac_header(rate, ch, bps, n) + frame


def _ref_lpc(warmup, resid, coefs, shift):
    s = [int(v) for v in warmup]
    for e in resid:
        acc = sum(c * s[-1 - j] for j, c in enumerate(coefs))
        s.append(int(e) + (acc >> shift))
    return s


def test_lpc_subframe_decodes():
    """Order-3 LPC with non-trivial shift, checked against the scalar
    recurrence — the encoder never emits LPC, so this is the only
    coverage of that path."""
    n, bps = 64, 16
    warmup = [100, -200, 300]
    coefs = [1536, -1024, 512]  # 12-bit precision
    shift = 10
    rng = np.random.RandomState(9)
    resid = rng.randint(-50, 50, n - 3).tolist()
    expect = _ref_lpc(warmup, resid, coefs, shift)

    def write(sink):
        sink.write_uint(0, 1)
        sink.write_uint(32 + 2, 6)  # LPC order 3
        sink.write_uint(0, 1)       # no wasted bits
        for w in warmup:
            sink.write_sint(w, bps)
        sink.write_uint(12 - 1, 4)  # precision-1
        sink.write_sint(shift, 5)
        for c in coefs:
            sink.write_sint(c, 12)
        sink.write_uint(0, 2)       # rice method 0
        sink.write_uint(0, 4)       # partition order 0
        sink.write_uint(4, 4)       # param k=4
        sink.write_bits(_rice_encode_bits(np.array(resid, np.int64), 4))

    data = _assemble(8000, 1, bps, n, 0, write)
    r, c, b, m, out = decode_flac(data)
    assert m == n
    assert out[:, 0].tolist() == expect


def test_partitioned_residual_with_escape():
    """FIXED order 1, partition order 2 (4 partitions), one partition
    escaped to raw 7-bit storage — against the diff/cumsum identity."""
    n, bps = 64, 16
    first = 1000
    rng = np.random.RandomState(11)
    resid = rng.randint(-40, 40, n - 1)
    expect = np.concatenate(([first], first + np.cumsum(resid)))
    parts = [resid[: n // 4 - 1], resid[n // 4 - 1 : 2 * (n // 4) - 1],
             resid[2 * (n // 4) - 1 : 3 * (n // 4) - 1],
             resid[3 * (n // 4) - 1 :]]

    def write(sink):
        sink.write_uint(0, 1)
        sink.write_uint(8 + 1, 6)   # FIXED order 1
        sink.write_uint(0, 1)
        sink.write_sint(first, bps)
        sink.write_uint(0, 2)       # rice method 0
        sink.write_uint(2, 4)       # partition order 2
        for i, pvals in enumerate(parts):
            if i == 2:              # escape this one
                sink.write_uint(0xF, 4)
                sink.write_uint(7, 5)
                for v in pvals:
                    sink.write_sint(int(v), 7)
            else:
                sink.write_uint(5, 4)
                sink.write_bits(
                    _rice_encode_bits(np.asarray(pvals, np.int64), 5)
                )

    data = _assemble(8000, 1, bps, n, 0, write)
    out = decode_flac(data)[4]
    assert np.array_equal(out[:, 0], expect)


def test_wasted_bits_shift_back():
    n, bps, wasted = 32, 16, 3
    vals = np.arange(-16, 16, dtype=np.int64) * (1 << wasted)

    def write(sink):
        sink.write_uint(0, 1)
        sink.write_uint(1, 6)       # VERBATIM
        sink.write_uint(1, 1)       # wasted flag
        sink.write_uint(1, wasted)  # unary: (wasted-1) zeros then 1
        for v in vals >> wasted:
            sink.write_sint(int(v), bps - wasted)

    data = _assemble(8000, 1, bps, n, 0, write)
    assert np.array_equal(decode_flac(data)[4][:, 0], vals)


@pytest.mark.parametrize("assign", [8, 9])
def test_left_side_and_right_side(assign):
    n, bps = 48, 16
    rng = np.random.RandomState(assign)
    left = rng.randint(-9000, 9000, n).astype(np.int64)
    right = rng.randint(-9000, 9000, n).astype(np.int64)
    side = left - right

    def write(sink):
        chans = ([left, side] if assign == 8 else [side, right])
        widths = [bps, bps + 1] if assign == 8 else [bps + 1, bps]
        for sig, w in zip(chans, widths):
            sink.write_uint(0, 1)
            sink.write_uint(1, 6)   # VERBATIM
            sink.write_uint(0, 1)
            for v in sig:
                sink.write_sint(int(v), w)

    data = _assemble(8000, 2, bps, n, assign, write)
    out = decode_flac(data)[4]
    assert np.array_equal(out[:, 0], left)
    assert np.array_equal(out[:, 1], right)


def test_mid_side_negative_odd_sums():
    """Mid/side with odd l+r and negative values — the (m<<1)|(s&1)
    reconstruction is the subtle part."""
    pairs = np.array(
        [[-3, 2], [5, -8], [-1, -1], [32767, -32768], [0, 1]], np.int64
    )
    data = encode_flac(8000, 2, 16, pairs, stereo="mid-side")
    assert np.array_equal(decode_flac(data)[4], pairs)


# ------------------------------------------------------------------
# Spark integration: the resample_audio FLAC path
# ------------------------------------------------------------------


def test_resample_audio_flac_path(spark):
    """FLAC rows in resample_audio decode through the real codec and
    re-encode as FLAC at the target rate; sample values follow the
    nearest-frame mapping exactly (losslessness makes this checkable
    bit-for-bit)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from parquet_editor_spark.operators.multimodal import resample_audio

    clips = []
    for i in range(3):
        ch = 1 + i % 2
        n = 400 + 100 * i
        sig = _noise(n, ch, 16, seed=20 + i)
        clips.append((i, 8000 * (i + 1), n, ch, sig,
                      encode_flac(8000 * (i + 1), ch, 16, sig)))
    pdf = pd.DataFrame(
        {"clip_id": [c[0] for c in clips],
         "payload": [c[5] for c in clips]}
    )
    df = spark.createDataFrame(pdf).withColumn(
        "meta",
        F.struct(
            F.lit("audio").alias("media_type"),
            F.lit("flac").alias("codec"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("checksum"),
        ),
    )
    rows = {
        r["clip_id"]: bytes(r["payload"])
        for r in resample_audio(df, target_rate=4000).collect()
    }
    for i, rate, n, ch, sig, _raw in clips:
        r2, c2, b2, m2, out = decode_flac(rows[i])
        tgt_n = max(1, n * 4000 // rate)
        assert (r2, c2, b2, m2) == (4000, ch, 16, tgt_n)
        idx = (np.arange(tgt_n, dtype=np.int64) * n) // tgt_n
        assert np.array_equal(out, sig[idx])


def test_code14_rates_unrepresentable_raise_representable_roundtrip():
    """Regression (r10): rates >= 65536 on the code-14 fallback store
    rate//10 in 16 bits; 96001 would make the frame header disagree
    with STREAMINFO and decode_flac reject the encoder's own output,
    so encode_flac must refuse it (same for rates >= 655360)."""
    sig = _noise(100, 1, 16, seed=3)
    for rate in (96001, 65537, 655367, 655360):
        with pytest.raises(ValueError, match="code-14"):
            encode_flac(rate, 1, 16, sig)
    out = decode_flac(encode_flac(96010, 1, 16, sig))
    assert out[0] == 96010 and np.array_equal(out[4], sig)
