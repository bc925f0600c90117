"""Dependency-free WAV codec (sources/wav.py) and the audio_meta /
resample_audio multimodal operators — the audio sibling of the PNG
path: one real format end-to-end without an audio library."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_editor_spark.sources import wav as W


def _frames(n, ch, bits):
    block = ch * bits // 8
    return bytes((i * 37 + 11) % 256 for i in range(n * block))


@pytest.mark.parametrize("ch,bits", [(1, 8), (2, 8), (1, 16), (2, 16)])
def test_roundtrip(ch, bits):
    pcm = _frames(7, ch, bits)
    rate, c, b, n, out = W.decode_wav(W.encode_wav(16000, ch, bits, pcm))
    assert (rate, c, b, n, out) == (16000, ch, bits, 7, pcm)


def test_known_header_layout():
    data = W.encode_wav(8000, 1, 8, bytes([1, 2, 3]))
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    # fmt chunk: PCM tag, 1 channel, 8000 Hz
    assert struct.unpack_from("<HHI", data, 20) == (1, 1, 8000)
    assert W.decode_wav(data)[4] == bytes([1, 2, 3])


def test_skips_list_chunk_and_pad_byte():
    base = W.encode_wav(8000, 1, 8, bytes([5, 6, 7]))  # odd-size data
    # splice an odd-sized LIST chunk (pad byte after) before fmt
    spliced = (
        base[:12]
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        + base[12:]
    )
    assert W.decode_wav(spliced)[4] == bytes([5, 6, 7])


def test_unsupported_formats_raise():
    base = bytearray(W.encode_wav(8000, 1, 16, _frames(2, 1, 16)))
    bad = bytearray(base)
    struct.pack_into("<H", bad, 20, 3)  # float tag on 16-bit samples
    with pytest.raises(NotImplementedError, match="float"):
        W.decode_wav(bytes(bad))
    bad = bytearray(base)
    struct.pack_into("<H", bad, 20, 2)  # MS-ADPCM is REAL since r9 —
    # but a 16-bit-sample fmt claiming tag 2 is malformed, not missing
    with pytest.raises(ValueError, match="must be 4"):
        W.decode_wav(bytes(bad))
    bad = bytearray(base)
    struct.pack_into("<H", bad, 20, 0xFFFE)  # extensible w/o extension
    with pytest.raises(ValueError, match="40 bytes"):
        W.decode_wav(bytes(bad))
    bad = bytearray(base)
    struct.pack_into("<H", bad, 20, 0x0055)  # MPEG-layer-3-in-WAV: gated
    with pytest.raises(NotImplementedError, match="format 85"):
        W.decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="RIFF"):
        W.decode_wav(b"OggS" + bytes(40))
    with pytest.raises(ValueError, match="multiple"):
        W.encode_wav(8000, 2, 16, bytes(6))  # 6 not divisible by 4


def test_resample_nearest():
    pcm = _frames(4, 1, 8)  # 4 mono 8-bit frames
    # upsample 4 -> 8 duplicates each frame
    up = W.resample_nearest(pcm, 1, 8, 4, 8)
    assert up == bytes(b for b in pcm for _ in (0, 1))
    # downsample 4 -> 2 picks frames 1 and 3
    down = W.resample_nearest(pcm, 1, 8, 4, 2)
    assert down == bytes([pcm[1], pcm[3]])
    # stereo 16-bit keeps frames intact
    st16 = _frames(2, 2, 16)
    assert W.resample_nearest(st16, 2, 16, 2, 1) == st16[4:8]


@settings(max_examples=25, deadline=None)
@given(
    rate=st.integers(1, 96000),
    ch=st.integers(1, 4),
    bits=st.sampled_from([8, 16]),
    n=st.integers(0, 32),
)
def test_roundtrip_property(rate, ch, bits, n):
    pcm = _frames(n, ch, bits)
    assert W.decode_wav(W.encode_wav(rate, ch, bits, pcm)) == (
        rate, ch, bits, n, pcm
    )


# ---------------------------------------------------------------------------
# Spark wiring
# ---------------------------------------------------------------------------

def _wav_frame(spark):
    from parquet_editor_spark.operators.multimodal import attach_payload

    rows = [
        (i, W.encode_wav(8000 * (1 + i), 1 + i % 2, 16,
                         _frames(100 * (i + 1), 1 + i % 2, 16)))
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "clip_id long, raw binary")
    return attach_payload(df, "raw", media_type="audio", codec="wav").drop("raw")


def test_audio_meta_real_wav(spark):
    from parquet_editor_spark.operators.multimodal import audio_meta

    out = {
        r["clip_id"]: (
            r["sample_rate"], r["channels"], r["n_frames"], r["duration_ms"]
        )
        for r in audio_meta(_wav_frame(spark)).collect()
    }
    assert out == {
        i: (
            8000 * (1 + i),
            1 + i % 2,
            100 * (i + 1),
            100 * (i + 1) * 1000 // (8000 * (1 + i)),
        )
        for i in range(4)
    }


def test_resample_audio_emits_valid_wav(spark):
    from parquet_editor_spark.operators.multimodal import (
        audio_meta,
        resample_audio,
    )

    out = resample_audio(_wav_frame(spark), target_rate=4000)
    rows = audio_meta(out.drop("sample_rate")).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["sample_rate"] == 4000
        # duration preserved to frame-floor precision
        i = r["clip_id"]
        src_n, src_rate = 100 * (i + 1), 8000 * (1 + i)
        assert r["n_frames"] == max(1, src_n * 4000 // src_rate)


def test_audio_fake_path_unchanged(spark):
    from parquet_editor_spark.operators.multimodal import (
        attach_payload,
        audio_meta,
    )

    df = spark.createDataFrame([(1, "blob")], "id long, s string")
    out = audio_meta(attach_payload(df, "s", codec="fake")).collect()[0]
    assert out["sample_rate"] in range(8000, 48001, 8000)
    assert out["duration_ms"] == out["n_frames"] * 1000 // out["sample_rate"]


@pytest.mark.parametrize("bits", [24, 32])
def test_wide_pcm_roundtrip_and_resample(bits):
    """24/32-bit PCM: frames move as opaque blocks; round-trip and
    frame-exact resample both hold."""
    pcm = _frames(5, 2, bits)
    rate, ch, b, n, out = W.decode_wav(W.encode_wav(44100, 2, bits, pcm))
    assert (rate, ch, b, n, out) == (44100, 2, bits, 5, pcm)
    block = 2 * bits // 8
    down = W.resample_nearest(pcm, 2, bits, 5, 2)
    assert down == pcm[1 * block : 2 * block] + pcm[3 * block : 4 * block]


@pytest.mark.parametrize("bits", [32, 64])
def test_float_roundtrip(bits):
    """r5 verdict item 4: IEEE-float WAVs (tag 3) round-trip with the
    fact chunk the spec requires for non-PCM, and decode_wav_ex
    preserves the format tag."""
    vals = [0.5, -0.25, 1.0, -1.0, 0.125, 0.0]
    frames = struct.pack(f"<{len(vals)}{'f' if bits == 32 else 'd'}", *vals)
    data = W.encode_wav(16000, 1, bits, frames, fmt_tag=W.IEEE_FLOAT)
    rate, ch, got_bits, n, got, tag = W.decode_wav_ex(data)
    assert (rate, ch, got_bits, n, tag) == (16000, 1, bits, len(vals), 3)
    assert got == frames
    # fact chunk present with the frame count
    assert b"fact" in data
    i = data.index(b"fact")
    assert struct.unpack_from("<II", data, i + 4) == (4, len(vals))


def test_float_encode_validates_bits():
    with pytest.raises(ValueError, match="float"):
        W.encode_wav(8000, 1, 16, bytes(4), fmt_tag=W.IEEE_FLOAT)
    with pytest.raises(ValueError, match="format tag"):
        W.encode_wav(8000, 1, 16, bytes(4), fmt_tag=2)


def test_float_resample_preserves_format_tag(spark):
    """resample_audio must re-encode a float WAV as float — a frame
    block is opaque either way, but the container tag must survive."""
    from parquet_editor_spark.operators import multimodal as MM
    from pyspark.sql import functions as F

    frames = struct.pack("<8f", *[0.1 * k for k in range(8)])
    payload = W.encode_wav(8000, 1, 32, frames, fmt_tag=W.IEEE_FLOAT)
    df = spark.createDataFrame([(1, bytearray(payload))], "id long, payload binary")
    df = df.withColumn(
        "meta",
        F.struct(
            F.lit("audio").alias("media_type"),
            F.lit("wav").alias("codec"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("checksum"),
        ),
    )
    out = MM.resample_audio(df, target_rate=4000).collect()[0]
    rate, ch, bits, n, got, tag = W.decode_wav_ex(bytes(out["payload"]))
    assert (rate, ch, bits, n, tag) == (4000, 1, 32, 4, W.IEEE_FLOAT)


# ---------------------------------------------------------------------------
# IMA-ADPCM (r9 verdict item 7)
# ---------------------------------------------------------------------------

def _adpcm_decode_scalar(wav: bytes):
    """Independent pure-scalar IMA decoder — pins the production
    numpy cross-block vectorization bit-for-bit."""
    import struct

    from parquet_editor_spark.sources.wav import (
        _IMA_INDEX_ADJ,
        _IMA_STEPS,
    )

    pos, fmt, data, fact = 12, None, None, None
    while pos + 8 <= len(wav):
        tag = wav[pos : pos + 4]
        (size,) = struct.unpack_from("<I", wav, pos + 4)
        body = wav[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        elif tag == b"fact":
            fact = struct.unpack_from("<I", body)[0]
        pos += 8 + size + (size & 1)
    _tag, ch, rate, _br, block, _bits = struct.unpack_from("<HHIIHH", fmt)
    spb = (block - 4 * ch) * 2 // ch + 1
    out = []
    for b0 in range(0, len(data), block):
        chans = []
        for c in range(ch):
            h = b0 + 4 * c
            pred = struct.unpack_from("<h", data, h)[0]
            idx = data[h + 2]
            samples = [pred]
            nibs = []
            p = b0 + 4 * ch
            g = 0
            while len(nibs) < spb - 1:
                at = p + (g // 1) * 4 * ch + c * 4
                chunk = data[at : at + 4]
                for byte in chunk:
                    nibs.append(byte & 0x0F)
                    nibs.append(byte >> 4)
                g += 1
            for nib in nibs[: spb - 1]:
                step = _IMA_STEPS[idx]
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                pred = max(-32768, min(32767, pred - diff if nib & 8 else pred + diff))
                idx = max(0, min(88, idx + _IMA_INDEX_ADJ[nib & 7]))
                samples.append(pred)
            chans.append(samples)
        for k in range(spb):
            for c in range(ch):
                out.append(chans[c][k])
    if fact is not None:
        out = out[: fact * ch]
    return rate, ch, out


def test_adpcm_roundtrip_meta_and_fidelity():
    import numpy as np

    from parquet_editor_spark.sources.wav import (
        IMA_ADPCM,
        decode_wav_ex,
        encode_wav_adpcm,
    )

    rng = np.random.RandomState(11)
    for ch in (1, 2):
        for n in (9, 504, 505, 506, 2000):
            t = np.arange(n)
            chans = [
                3000 * np.sin(t / 9.0 + c) + rng.randint(-150, 150, n)
                for c in range(ch)
            ]
            pcm = np.stack(chans, axis=1).reshape(-1).astype("<i2")
            wav = encode_wav_adpcm(22050, ch, pcm.tobytes())
            rate, c2, bits, nf, frames, tag = decode_wav_ex(wav)
            assert (rate, c2, bits, nf, tag) == (22050, ch, 16, n, IMA_ADPCM)
            dec = np.frombuffer(frames, dtype="<i2").astype(np.float64)
            err = dec - pcm.astype(np.float64)
            snr = 10 * np.log10(
                (pcm.astype(np.float64) ** 2).mean() / max((err ** 2).mean(), 1e-9)
            )
            # clips shorter than the step-table adaptation ramp have
            # no meaningful SNR — meta exactness above is the check
            if n >= 100:
                assert snr > 25, (ch, n, snr)


def test_adpcm_numpy_matches_scalar_reference():
    import numpy as np

    from parquet_editor_spark.sources.wav import (
        decode_wav_ex,
        encode_wav_adpcm,
    )

    rng = np.random.RandomState(3)
    for ch in (1, 2):
        pcm = rng.randint(-32768, 32768, 1111 * ch).astype("<i2")
        wav = encode_wav_adpcm(8000, ch, pcm.tobytes())
        _r, _c, _b, nf, frames, _t = decode_wav_ex(wav)
        got = np.frombuffer(frames, dtype="<i2").tolist()
        rate, c2, want = _adpcm_decode_scalar(wav)
        assert (rate, c2) == (8000, ch)
        assert got == want


def test_adpcm_constant_signal_is_lossless():
    """nibble 0 at step-index 0 adds 7>>3 == 0, so a constant clip
    round-trips EXACTLY — the property the driver oracle leans on."""
    import numpy as np

    from parquet_editor_spark.sources.wav import (
        decode_wav_ex,
        encode_wav_adpcm,
    )

    for v in (-15000, -1, 0, 1, 123, 32767):
        pcm = np.full(700, v, dtype="<i2")
        wav = encode_wav_adpcm(16000, 1, pcm.tobytes())
        _r, _c, _b, nf, frames, _t = decode_wav_ex(wav)
        assert nf == 700
        assert np.frombuffer(frames, dtype="<i2").tolist() == [v] * 700


def test_adpcm_error_paths():
    import numpy as np
    import pytest as _pt

    from parquet_editor_spark.sources.wav import (
        decode_wav,
        encode_wav_adpcm,
    )

    pcm = np.zeros(100, dtype="<i2").tobytes()
    with _pt.raises(ValueError, match="multiple of 8"):
        encode_wav_adpcm(8000, 1, pcm, samples_per_block=10)
    with _pt.raises(ValueError, match="empty"):
        encode_wav_adpcm(8000, 1, b"")
    wav = bytearray(encode_wav_adpcm(8000, 1, pcm))
    # corrupt the declared samplesPerBlock in the fmt extension
    import struct as _s

    at = wav.index(b"fmt ") + 8 + 18
    wav[at : at + 2] = _s.pack("<H", 999)
    with _pt.raises(ValueError, match="samplesPerBlock"):
        decode_wav(bytes(wav))


def test_adpcm_flows_through_audio_meta_wav_codec(spark):
    """codec='wav' rows that carry ADPCM payloads decode through the
    same audio_meta stage — the fact chunk gives the exact count."""
    import numpy as np
    from pyspark.sql import functions as F

    from parquet_editor_spark.operators import multimodal as MM
    from parquet_editor_spark.sources.wav import encode_wav_adpcm

    pcm = np.full(1234, 42, dtype="<i2").tobytes()
    rows = [(1, encode_wav_adpcm(22050, 1, pcm))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").withColumn(
        "meta",
        F.struct(
            F.lit("audio").alias("media_type"),
            F.lit("wav").alias("codec"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("checksum"),
        ),
    )
    (row,) = MM.audio_meta(df).collect()
    assert row["sample_rate"] == 22050 and row["channels"] == 1
    assert row["n_frames"] == 1234
    assert row["duration_ms"] == 1234 * 1000 // 22050


# ---------------------------------------------------------------------------
# G.711 A-law / mu-law (r9)
# ---------------------------------------------------------------------------

def test_g711_code_points_roundtrip_exactly():
    import numpy as np

    from parquet_editor_spark.sources.wav import (
        ALAW,
        MULAW,
        _ALAW_TABLE,
        _MULAW_TABLE,
        decode_wav_ex,
        encode_wav_g711,
    )

    for law, table, tag in [("mu", _MULAW_TABLE, MULAW), ("a", _ALAW_TABLE, ALAW)]:
        vals = np.asarray(table, dtype="<i2")
        wav = encode_wav_g711(8000, 1, vals.tobytes(), law=law)
        r, c, b, n, frames, t = decode_wav_ex(wav)
        assert (r, c, b, n, t) == (8000, 1, 16, 256, tag)
        assert (np.frombuffer(frames, dtype="<i2") == vals).all()


def test_g711_known_reference_values():
    """Spot values every G.711 implementation agrees on."""
    from parquet_editor_spark.sources.wav import _ALAW_TABLE, _MULAW_TABLE

    assert _MULAW_TABLE[0xFF] == 0  # mu-law silence
    assert _MULAW_TABLE[0x7F] == 0  # negative zero
    assert max(_MULAW_TABLE) == 32124 and min(_MULAW_TABLE) == -32124
    assert _ALAW_TABLE[0xD5] == 8  # A-law "zero" code
    assert max(_ALAW_TABLE) == 32256 and min(_ALAW_TABLE) == -32256
    assert len(set(_MULAW_TABLE)) == 255  # +0/-0 collide, rest distinct


def test_g711_snr_on_speechlike_signal():
    import numpy as np

    from parquet_editor_spark.sources.wav import (
        decode_wav_ex,
        encode_wav_g711,
    )

    rng = np.random.RandomState(2)
    t = np.arange(4000)
    pcm = (
        9000 * np.sin(t / 7.0) + 2500 * np.sin(t / 1.7) + rng.randint(-300, 300, 4000)
    ).astype("<i2")
    for law in ("mu", "a"):
        wav = encode_wav_g711(8000, 1, pcm.tobytes(), law=law)
        _r, _c, _b, _n, frames, _t = decode_wav_ex(wav)
        back = np.frombuffer(frames, dtype="<i2").astype(float)
        err = back - pcm.astype(float)
        snr = 10 * np.log10((pcm.astype(float) ** 2).mean() / (err ** 2).mean())
        assert snr > 30, (law, snr)  # G.711 is ~35-38 dB on speech


def test_g711_flows_through_audio_meta(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from parquet_editor_spark.operators import multimodal as MM
    from parquet_editor_spark.sources.wav import encode_wav_g711

    pcm = np.full(800, 64, dtype="<i2").tobytes()  # 64 = exact mu code
    rows = [(1, encode_wav_g711(16000, 2, pcm, law="mu"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").withColumn(
        "meta",
        F.struct(
            F.lit("audio").alias("media_type"),
            F.lit("wav").alias("codec"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("checksum"),
        ),
    )
    (row,) = MM.audio_meta(df).collect()
    assert (row["sample_rate"], row["channels"], row["n_frames"]) == (16000, 2, 400)


def test_g711_error_paths():
    import pytest as _pt

    from parquet_editor_spark.sources.wav import decode_wav, encode_wav_g711

    with _pt.raises(ValueError, match="law"):
        encode_wav_g711(8000, 1, bytes(4), law="g726")
    wav = bytearray(encode_wav_g711(8000, 1, bytes(8), law="mu"))
    at = wav.index(b"fmt ") + 8 + 14
    wav[at] = 16  # claim 16-bit G.711
    with _pt.raises(ValueError, match="must be 8"):
        decode_wav(bytes(wav))


# ---------------------------------------------------------------------------
# MS-ADPCM (r9)
# ---------------------------------------------------------------------------

def _ms_scalar_decode(wav: bytes):
    """Independent scalar MS-ADPCM decoder pinning the numpy kernel."""
    import struct

    from parquet_editor_spark.sources.wav import _MS_ADAPT, _MS_COEFS

    pos, fmt, data, fact = 12, None, None, None
    while pos + 8 <= len(wav):
        tag = wav[pos : pos + 4]
        (size,) = struct.unpack_from("<I", wav, pos + 4)
        body = wav[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        elif tag == b"fact":
            fact = struct.unpack_from("<I", body)[0]
        pos += 8 + size + (size & 1)
    _t, ch, rate, _br, block, _bits = struct.unpack_from("<HHIIHH", fmt)
    spb = (block - 7 * ch) * 2 // ch + 2
    out = []
    for b0 in range(0, len(data), block):
        pid = [data[b0 + c] for c in range(ch)]
        dl = [
            struct.unpack_from("<h", data, b0 + ch + 2 * c)[0]
            for c in range(ch)
        ]
        s1 = [
            struct.unpack_from("<h", data, b0 + 3 * ch + 2 * c)[0]
            for c in range(ch)
        ]
        s2 = [
            struct.unpack_from("<h", data, b0 + 5 * ch + 2 * c)[0]
            for c in range(ch)
        ]
        for c in range(ch):
            dl[c] = max(16, dl[c])
        nibs = []
        for byte in data[b0 + 7 * ch : b0 + block]:
            nibs += [byte >> 4, byte & 15]
        for c in range(ch):
            out.append(s2[c])
        for c in range(ch):
            out.append(s1[c])
        for k in range(spb - 2):
            for c in range(ch):
                nib = nibs[k * ch + c]
                signed = nib - 16 if nib >= 8 else nib
                c1, c2 = _MS_COEFS[pid[c]]
                pred = (s1[c] * c1 + s2[c] * c2) >> 8
                s = max(-32768, min(32767, pred + dl[c] * signed))
                s2[c], s1[c] = s1[c], s
                dl[c] = max(16, (_MS_ADAPT[nib] * dl[c]) >> 8)
                out.append(s)
    if fact is not None:
        out = out[: fact * ch]
    return rate, ch, out


def test_ms_adpcm_constant_is_lossless():
    """Predictor 0 makes pred == sample1, so a constant clip encodes
    to all-zero nibbles and round-trips EXACTLY — the driver-oracle
    property."""
    import numpy as np

    from parquet_editor_spark.sources.wav import (
        MS_ADPCM,
        decode_wav_ex,
        encode_wav_ms_adpcm,
    )

    for v in (-15000, -1, 0, 123, 32767):
        pcm = np.full(1100, v, dtype="<i2")
        wav = encode_wav_ms_adpcm(22050, 1, pcm.tobytes())
        _r, _c, _b, n, frames, tag = decode_wav_ex(wav)
        assert (n, tag) == (1100, MS_ADPCM)
        assert np.frombuffer(frames, dtype="<i2").tolist() == [v] * 1100


def test_ms_adpcm_fidelity_and_meta():
    import numpy as np

    from parquet_editor_spark.sources.wav import (
        MS_ADPCM,
        decode_wav_ex,
        encode_wav_ms_adpcm,
    )

    rng = np.random.RandomState(4)
    for ch in (1, 2):
        for n in (3, 498, 500, 503, 2000):
            t = np.arange(n)
            sig = [
                3000 * np.sin(t / 9.0 + c) + rng.randint(-100, 100, n)
                for c in range(ch)
            ]
            pcm = np.stack(sig, axis=1).reshape(-1).astype("<i2")
            wav = encode_wav_ms_adpcm(22050, ch, pcm.tobytes())
            r, c2, b, nf, frames, tag = decode_wav_ex(wav)
            assert (r, c2, b, nf, tag) == (22050, ch, 16, n, MS_ADPCM)
            if n >= 100:
                dec = np.frombuffer(frames, dtype="<i2").astype(float)
                err = dec - pcm.astype(float)
                snr = 10 * np.log10(
                    (pcm.astype(float) ** 2).mean() / max((err ** 2).mean(), 1e-9)
                )
                assert snr > 25, (ch, n, snr)


def test_ms_adpcm_numpy_matches_scalar_reference():
    import numpy as np

    from parquet_editor_spark.sources.wav import (
        decode_wav_ex,
        encode_wav_ms_adpcm,
    )

    rng = np.random.RandomState(8)
    for ch in (1, 2):
        pcm = rng.randint(-32768, 32768, 1111 * ch).astype("<i2")
        wav = encode_wav_ms_adpcm(8000, ch, pcm.tobytes())
        _r, _c, _b, _n, frames, _t = decode_wav_ex(wav)
        got = np.frombuffer(frames, dtype="<i2").tolist()
        rate, c2, want = _ms_scalar_decode(wav)
        assert (rate, c2) == (8000, ch) and got == want


def test_ms_adpcm_error_paths():
    import numpy as np
    import pytest as _pt

    from parquet_editor_spark.sources.wav import (
        decode_wav,
        encode_wav_ms_adpcm,
    )

    with _pt.raises(ValueError, match="nibble"):
        encode_wav_ms_adpcm(8000, 1, bytes(8), samples_per_block=2)
    with _pt.raises(ValueError, match="nibble"):
        encode_wav_ms_adpcm(8000, 1, bytes(8), samples_per_block=5)
    wav = bytearray(
        encode_wav_ms_adpcm(8000, 1, np.zeros(100, dtype="<i2").tobytes())
    )
    at = wav.index(b"data") + 8
    wav[at] = 9  # predictor index > 6
    with _pt.raises(ValueError, match="predictor"):
        decode_wav(bytes(wav))


# ---------------------------------------------------------------------------
# WAVE_FORMAT_EXTENSIBLE (r9)
# ---------------------------------------------------------------------------

def _make_extensible(inner_wav: bytes, channel_mask: int = 0) -> bytes:
    """Rewrap a canonical WAV's fmt chunk as WAVE_FORMAT_EXTENSIBLE
    (tag 0xFFFE + 22-byte extension with the true tag in the GUID)."""
    import struct

    at = inner_wav.index(b"fmt ")
    (size,) = struct.unpack_from("<I", inner_wav, at + 4)
    fmt = bytearray(inner_wav[at + 8 : at + 8 + size])
    (true_tag,) = struct.unpack_from("<H", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    struct.pack_into("<H", fmt, 0, 0xFFFE)
    ext = struct.pack("<HHI", 22, bits, channel_mask) + struct.pack(
        "<H", true_tag
    ) + bytes.fromhex("000000001000800000aa00389b71")
    new_fmt = bytes(fmt[:16]) + ext
    return (
        inner_wav[:at]
        + b"fmt "
        + struct.pack("<I", len(new_fmt))
        + new_fmt
        + inner_wav[at + 8 + size :]
    )


def test_extensible_unwraps_pcm_float_and_g711():
    import struct

    import numpy as np

    # PCM 24-bit 3-channel — the shape extensible exists for
    pcm = bytes((i * 7 + 3) % 256 for i in range(9 * 3 * 3))
    base = W.encode_wav(48000, 3, 24, pcm)
    got = W.decode_wav(_make_extensible(base, channel_mask=0b111))
    assert got == (48000, 3, 24, 9, pcm)

    # float 32
    frames = struct.pack("<6f", *[0.5, -0.25, 1.0, -1.0, 0.125, 0.0])
    base = W.encode_wav(16000, 1, 32, frames, fmt_tag=W.IEEE_FLOAT)
    rate, ch, bits, n, out, tag = W.decode_wav_ex(_make_extensible(base))
    assert (rate, ch, bits, n, out, tag) == (16000, 1, 32, 6, frames, 3)

    # mu-law (already non-trivial inner decode)
    vals = np.asarray([0, 8, -8, 64, -64, 120], dtype="<i2")
    base = W.encode_wav_g711(8000, 1, vals.tobytes(), law="mu")
    rate, ch, bits, n, out, tag = W.decode_wav_ex(_make_extensible(base))
    assert (rate, ch, bits, n, tag) == (8000, 1, 16, 6, W.MULAW)
    assert (np.frombuffer(out, dtype="<i2") == vals).all()


def test_extensible_rejects_unknown_guid_and_nesting():
    import struct

    base = W.encode_wav(8000, 1, 16, bytes(4))
    wrapped = bytearray(_make_extensible(base))
    at = wrapped.index(b"fmt ") + 8 + 16 + 8 + 2  # GUID suffix start
    wrapped[at] ^= 0xFF
    with pytest.raises(NotImplementedError, match="GUID"):
        W.decode_wav(bytes(wrapped))
    wrapped = bytearray(_make_extensible(base))
    struct.pack_into("<H", wrapped, wrapped.index(b"fmt ") + 8 + 16 + 8, 0xFFFE)
    with pytest.raises(ValueError, match="nests"):
        W.decode_wav(bytes(wrapped))


def test_resample_audio_preserves_compressed_formats(spark):
    """resample_audio re-encodes each decodable WAV variant in its
    OWN format (r9: ADPCM/G.711 inputs previously had no encoder and
    would have crashed at the PCM re-encode)."""
    import numpy as np
    from pyspark.sql import functions as F

    from parquet_editor_spark.operators import multimodal as MM

    pcm = np.full(800, 64, dtype="<i2").tobytes()  # 64: exact mu code
    rows = [
        (1, W.encode_wav_adpcm(16000, 1, pcm), W.IMA_ADPCM),
        (2, W.encode_wav_ms_adpcm(16000, 1, pcm), W.MS_ADPCM),
        (3, W.encode_wav_g711(16000, 1, pcm, law="mu"), W.MULAW),
        (4, W.encode_wav_g711(16000, 1, pcm, law="a"), W.ALAW),
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p, _t in rows], "clip_id long, payload binary"
    ).withColumn(
        "meta",
        F.struct(
            F.lit("audio").alias("media_type"),
            F.lit("wav").alias("codec"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("checksum"),
        ),
    )
    out = {
        r["clip_id"]: r
        for r in MM.resample_audio(df, target_rate=8000).collect()
    }
    want_tags = {i: t for i, _p, t in rows}
    for cid, row in out.items():
        rate, ch, _b, n, _f, tag = W.decode_wav_ex(bytes(row["payload"]))
        assert (rate, ch, tag) == (8000, 1, want_tags[cid]), cid
        assert n == 400
