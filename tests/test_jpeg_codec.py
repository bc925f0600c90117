"""sources/jpeg_codec.py — baseline JPEG pixel codec (r9, r8 verdict
item 8).  Honest scope: baseline sequential Huffman only; progressive
and arithmetic streams raise."""

import numpy as np
import pytest

from parquet_editor_spark.sources.jpeg_codec import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    quality_tables,
)

_QT_DC8 = (np.full(64, 8, dtype=np.int64), np.full(64, 8, dtype=np.int64))
_QT_ONES = (np.ones(64, dtype=np.int64), np.ones(64, dtype=np.int64))


def test_constant_gray_roundtrips_exactly():
    """A flat block's only coefficient is DC = 8*(v-128); a DC quant
    step of 8 is lossless — the property the driver oracle uses."""
    for v in (0, 7, 128, 200, 255):
        for w, h in [(8, 8), (5, 3), (17, 9), (64, 48)]:
            data = encode_jpeg_baseline(
                w, h, 1, bytes([v]) * (w * h), quant_tables=_QT_DC8
            )
            W, H, C, px = decode_jpeg_baseline(data)
            assert (W, H, C) == (w, h, 1)
            assert px == bytes([v]) * (w * h)


def test_gray_noise_near_lossless_at_unit_quant_vs_png_reference():
    """Pixel-level round-trip vs the PNG reference path: the same
    pixels encoded both ways decode to (near-)identical arrays —
    JPEG at unit quant differs only by DCT float rounding (<=2)."""
    from parquet_editor_spark.sources.png import decode_png, encode_png

    rng = np.random.RandomState(5)
    for w, h in [(16, 16), (23, 11), (8, 40)]:
        pix = rng.randint(0, 256, h * w).astype(np.uint8).tobytes()
        via_png = decode_png(encode_png(w, h, 1, pix))[3]
        assert via_png == pix  # PNG is lossless: the reference
        data = encode_jpeg_baseline(w, h, 1, pix, quant_tables=_QT_ONES)
        W, H, C, via_jpeg = decode_jpeg_baseline(data)
        assert (W, H, C) == (w, h, 1)
        a = np.frombuffer(via_jpeg, dtype=np.uint8).astype(int)
        b = np.frombuffer(via_png, dtype=np.uint8).astype(int)
        assert np.abs(a - b).max() <= 2


def test_rgb_444_and_420_decode_and_fidelity():
    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[0:24, 0:32]
    smooth = np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)
    for sub, tol in [("444", 4), ("420", 16)]:
        data = encode_jpeg_baseline(
            32, 24, 3, smooth.tobytes(), quality=95, subsampling=sub
        )
        W, H, C, px = decode_jpeg_baseline(data)
        assert (W, H, C) == (32, 24, 3)
        arr = np.frombuffer(px, dtype=np.uint8).reshape(24, 32, 3).astype(int)
        assert np.abs(arr - smooth.astype(int)).mean() < tol
    # 420 subsampled stream is materially smaller on noise
    noise = rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
    d444 = encode_jpeg_baseline(32, 24, 3, noise.tobytes(), subsampling="444")
    d420 = encode_jpeg_baseline(32, 24, 3, noise.tobytes(), subsampling="420")
    assert len(d420) < len(d444)


def test_quality_curve_monotone_sizes():
    rng = np.random.RandomState(9)
    pix = rng.randint(0, 256, (32, 32)).astype(np.uint8).tobytes()
    sizes = [
        len(encode_jpeg_baseline(32, 32, 1, pix, quality=q))
        for q in (10, 50, 95)
    ]
    assert sizes[0] < sizes[1] < sizes[2]


def test_restart_markers_roundtrip():
    rng = np.random.RandomState(3)
    pix = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    plain = encode_jpeg_baseline(40, 24, 1, pix.tobytes(), quant_tables=_QT_ONES)
    rsted = encode_jpeg_baseline(
        40, 24, 1, pix.tobytes(), quant_tables=_QT_ONES, restart_interval=3
    )
    assert b"\xff\xd0" in rsted or b"\xff\xd1" in rsted
    assert decode_jpeg_baseline(plain)[3] == decode_jpeg_baseline(rsted)[3]


def test_progressive_raises_not_implemented():
    data = bytearray(
        encode_jpeg_baseline(8, 8, 1, bytes(64), quant_tables=_QT_DC8)
    )
    at = data.index(b"\xff\xc0")
    data[at + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg_baseline(bytes(data))


def test_malformed_streams_raise_valueerror():
    with pytest.raises(ValueError, match="no SOI"):
        decode_jpeg_baseline(b"not a jpeg")
    good = encode_jpeg_baseline(16, 16, 1, bytes(256), quant_tables=_QT_DC8)
    with pytest.raises(ValueError):
        decode_jpeg_baseline(good[: len(good) // 2])


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="channels"):
        encode_jpeg_baseline(4, 4, 2, bytes(32))
    with pytest.raises(ValueError, match="pixel buffer"):
        encode_jpeg_baseline(4, 4, 1, bytes(15))
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg_baseline(4, 4, 3, bytes(48), subsampling="422x")
    with pytest.raises(ValueError, match="quality"):
        quality_tables(0)


def test_resize_images_jpeg_path(spark):
    """resize_images decodes/re-encodes JPEG for real since r9."""
    from parquet_editor_spark.operators.multimodal import (
        attach_payload,
        resize_images,
    )

    pix = bytes(range(16))  # 4x4 gray, value == index
    jpg = encode_jpeg_baseline(4, 4, 1, pix, quant_tables=_QT_ONES)
    df = spark.createDataFrame([(1, jpg)], "img_id long, raw binary")
    df = attach_payload(df, "raw", codec="jpeg").drop("raw")
    (row,) = resize_images(df, target_w=2, target_h=2).collect()
    W, H, C, out = decode_jpeg_baseline(bytes(row["payload"]))
    assert (W, H, C, row["width"], row["height"]) == (2, 2, 1, 2, 2)
    want = bytes([pix[4 * 1 + 1], pix[4 * 1 + 3], pix[4 * 3 + 1], pix[4 * 3 + 3]])
    got = np.frombuffer(out, dtype=np.uint8).astype(int)
    assert np.abs(got - np.frombuffer(want, dtype=np.uint8).astype(int)).max() <= 2


def test_image_pixel_stats_stage(spark):
    """image_pixel_stats: real decode for png AND jpeg in one batch,
    integer-exact sums."""
    from parquet_editor_spark.operators.multimodal import image_pixel_stats
    from parquet_editor_spark.sources.png import encode_png
    from pyspark.sql import functions as F

    jpg = encode_jpeg_baseline(6, 4, 1, bytes([9]) * 24, quant_tables=_QT_DC8)
    png = encode_png(3, 2, 1, bytes([1, 2, 3, 4, 5, 6]))
    rows = [(1, jpg, "jpeg"), (2, png, "png")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary, c string")
    df = df.withColumn(
        "meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.col("c").alias("codec"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("checksum"),
        ),
    )
    out = {r["doc_id"]: r for r in image_pixel_stats(df).collect()}
    assert (out[1]["px_min"], out[1]["px_max"], out[1]["px_sum"], out[1]["n_px"]) == (9, 9, 9 * 24, 24)
    assert (out[2]["width"], out[2]["height"], out[2]["px_sum"]) == (3, 2, 21)


# ---------------------------------------------------------------------------
# progressive (SOF2) — r9
# ---------------------------------------------------------------------------

def test_progressive_pixels_equal_baseline_pixels():
    """Both encoders write identical quantized coefficients through
    completely different entropy stacks (sequential Huffman vs
    spectral-selection + successive-approximation scans), so decoded
    pixels must be BIT-IDENTICAL — one mismatch anywhere in the
    EOB-run / refinement machinery breaks this."""
    from parquet_editor_spark.sources.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(9)
    for w, h, ch, sub in [
        (8, 8, 1, "444"), (23, 11, 1, "444"),
        (32, 24, 3, "444"), (32, 24, 3, "420"), (17, 9, 3, "420"),
    ]:
        pix = bytes(rng.randint(0, 256, w * h * ch).astype(np.uint8))
        for q in (30, 85, 95):
            base = encode_jpeg_baseline(
                w, h, ch, pix, quality=q, subsampling=sub
            )
            prog = encode_jpeg_progressive(
                w, h, ch, pix, quality=q, subsampling=sub
            )
            assert decode_jpeg(prog) == decode_jpeg(base), (w, h, ch, sub, q)


def test_progressive_stream_is_really_sof2_multiscan():
    from parquet_editor_spark.sources.jpeg_codec import (
        encode_jpeg_progressive,
    )

    prog = encode_jpeg_progressive(16, 16, 3, bytes(16 * 16 * 3))
    assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog
    assert prog.count(b"\xff\xda") == 1 + 2 * 3 + 1 + 2 * 3  # 14 scans


def test_progressive_band_split_parameter():
    from parquet_editor_spark.sources.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(2)
    pix = bytes(rng.randint(0, 256, 24 * 16).astype(np.uint8))
    outs = {
        decode_jpeg(
            encode_jpeg_progressive(24, 16, 1, pix, split_at=s)
        )
        for s in (2, 6, 33, 63)
    }
    assert len(outs) == 1  # split point changes scans, not pixels


def test_decode_jpeg_delegates_baseline_and_gates_arithmetic():
    from parquet_editor_spark.sources.jpeg_codec import decode_jpeg

    base = encode_jpeg_baseline(8, 8, 1, bytes(64), quant_tables=_QT_DC8)
    assert decode_jpeg(base) == decode_jpeg_baseline(base)
    arith = bytearray(base)
    arith[arith.index(b"\xff\xc0") + 1] = 0xC9  # SOF9: arithmetic
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_jpeg(bytes(arith))


def test_progressive_truncated_stream_raises():
    from parquet_editor_spark.sources.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    prog = encode_jpeg_progressive(16, 16, 1, bytes(256))
    with pytest.raises(ValueError):
        decode_jpeg(prog[: len(prog) - 30])  # EOI + last scan cut off


def test_progressive_refine_zrl_before_history_significant_coef():
    """Regression (r10): AC refinement must emit pending ZRLs for EVERY
    nonzero coefficient — including history-significant ones — before
    buffering their correction bit (libjpeg encode_mcu_AC_refine emits
    the ZRL loop ahead of the temp > 1 test).  With >=16 zero-history
    slots, then |coef| == 2, then |coef| == 1 inside one spectral band,
    an encoder that only emits ZRL on the newly-significant branch
    attaches the +2 correction bit to the ZRL, where the decoder's
    16-slot skip walk never reads it, desyncing the scan."""
    from parquet_editor_spark.sources.jpeg_codec import (
        _C,
        _ZIGZAG,
        _fdct_quant,
        decode_jpeg,
        encode_jpeg_progressive,
    )

    qstep = 16
    target = np.zeros(64, dtype=np.int64)  # zigzag order
    target[22] = 2  # band [6,63]: zz 6..21 zero (run 16), then |2|
    target[23] = 1  # then newly-significant |1| -> eob past the ZRL
    raster = np.zeros(64, dtype=np.float64)
    raster[_ZIGZAG] = target * qstep
    block = _C.T @ raster.reshape(8, 8) @ _C + 128.0
    pix = np.clip(np.round(block), 0, 255).astype(np.uint8)

    qt = (np.full(64, qstep, dtype=np.int64),) * 2
    # self-check: the synthesized pixels really quantize to the repro
    # pattern (16 zeros, +2, +1) after the encoder's own FDCT
    got = _fdct_quant(pix.reshape(1, 8, 8).astype(np.float64), qt[0])
    assert list(got[0]) == list(target), "fixture drifted off-pattern"

    base = encode_jpeg_baseline(8, 8, 1, bytes(pix.reshape(-1)), quant_tables=qt)
    prog = encode_jpeg_progressive(8, 8, 1, bytes(pix.reshape(-1)), quant_tables=qt)
    assert decode_jpeg(prog) == decode_jpeg(base)
