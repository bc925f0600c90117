"""Hand-rolled ustar walk (sources/tararc.py) and the tar_members
stage — cross-validated against stdlib tarfile in both directions."""

import io
import tarfile

import pytest

from parquet_editor_spark.operators import multimodal as MM
from parquet_editor_spark.sources.tararc import make_tar, parse_tar

MEMBERS = [
    ("a.txt", "hello tar"),
    ("dir/b.bin", b"\x00\x01\x02" * 200),
    ("dir/deep/c.txt", ""),
]


def test_roundtrip_plain_and_gzip():
    for gz in (False, True):
        got = parse_tar(make_tar(MEMBERS, mtime=123, gzip_compress=gz))
        assert [(m["name"], m["data"]) for m in got] == [
            (n, c if isinstance(c, bytes) else c.encode())
            for n, c in MEMBERS
        ]
        assert all(m["mtime"] == 123 for m in got)
        assert [m["size"] for m in got] == [9, 600, 0]


def test_stdlib_tarfile_reads_our_output():
    with tarfile.open(fileobj=io.BytesIO(make_tar(MEMBERS))) as tf:
        names = tf.getnames()
        assert names == [n for n, _ in MEMBERS]
        assert tf.extractfile("a.txt").read() == b"hello tar"
        assert tf.extractfile("dir/b.bin").read() == b"\x00\x01\x02" * 200


def test_we_read_stdlib_tarfile_output():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, content in MEMBERS:
            data = content if isinstance(content, bytes) else content.encode()
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 456
            tf.addfile(ti, io.BytesIO(data))
        # directories must be skipped by our walk
        tf.addfile(tarfile.TarInfo("dir/"))
    got = parse_tar(buf.getvalue())
    assert [(m["name"], m["data"]) for m in got] == [
        (n, c if isinstance(c, bytes) else c.encode()) for n, c in MEMBERS
    ]


def test_long_name_uses_prefix_field():
    name = "x" * 80 + "/" + "y" * 60 + ".txt"
    blob = make_tar([(name, "deep")])
    assert parse_tar(blob)[0]["name"] == name
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        assert tf.getnames() == [name]


def test_zstd_roundtrip_and_cli_cross_check(tmp_path):
    blob = make_tar(MEMBERS, mtime=7, compression="zstd")
    assert blob[:4] == b"\x28\xb5\x2f\xfd"
    got = parse_tar(blob)
    assert [(m["name"], m["data"]) for m in got] == [
        (n, c if isinstance(c, bytes) else c.encode()) for n, c in MEMBERS
    ]
    # independent decoder: the system zstd binary, when present
    import shutil
    import subprocess

    if shutil.which("zstd"):
        p = tmp_path / "a.tar.zst"
        p.write_bytes(blob)
        subprocess.run(["zstd", "-d", "-q", str(p)], check=True)
        raw = (tmp_path / "a.tar").read_bytes()
        with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
            assert tf.getnames() == [n for n, _ in MEMBERS]
        # and our parser reads what the CLI compresses
        subprocess.run(
            ["zstd", "-q", "-f", "-o", str(tmp_path / "b.tar.zst"),
             str(tmp_path / "a.tar")],
            check=True,
        )
        got2 = parse_tar((tmp_path / "b.tar.zst").read_bytes())
        assert [m["name"] for m in got2] == [n for n, _ in MEMBERS]


def test_make_tar_rejects_unknown_compression():
    with pytest.raises(ValueError, match="compression"):
        make_tar(MEMBERS, compression="lz4wrong")


def test_corrupt_raises():
    with pytest.raises(ValueError, match="TAR"):
        parse_tar(b"definitely not a tar archive" + b"\x00" * 600)
    with pytest.raises(ValueError, match="not a TAR"):
        parse_tar(b"")
    good = bytearray(make_tar(MEMBERS))
    good[20] ^= 0xFF  # flip a header byte -> checksum mismatch
    with pytest.raises(ValueError, match="checksum"):
        parse_tar(bytes(good))
    with pytest.raises(ValueError, match="truncated"):
        parse_tar(make_tar(MEMBERS)[:600])
    with pytest.raises(ValueError, match="truncated gzip"):
        parse_tar(make_tar(MEMBERS, gzip_compress=True)[:40])


def test_tar_members_stage(spark):
    rows = [
        (1, make_tar([("a.txt", "alpha"), ("b.txt", "beta")], mtime=9)),
        (2, make_tar([("c.txt", "gamma")], gzip_compress=True)),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = MM.tar_members(df).orderBy("id", "member_idx").collect()
    assert [(r["id"], r["name"], r["size_bytes"], r["content"]) for r in got] == [
        (1, "a.txt", 5, "alpha"),
        (1, "b.txt", 4, "beta"),
        (2, "c.txt", 5, "gamma"),
        (3, None, None, None),
    ]
    assert got[0]["mtime"] == 9


def test_wds_samples_groups_by_first_dot_stem(spark):
    # WebDataset layout: stem-before-FIRST-dot groups, so 0001.seg.png
    # belongs to sample 0001; directories prefix the key; members of a
    # sample are contiguous.
    tar = make_tar(
        [
            ("sh/0001.txt", "first doc"),
            ("sh/0001.cls", "3"),
            ("sh/0001.seg.png", b"\x89fakepng"),
            ("sh/0002.txt", "second"),
            ("noext", b"orphan"),
        ]
    )
    df = spark.createDataFrame([(1, tar), (2, None)], "id long, payload binary")
    got = MM.wds_samples(df).orderBy("id", "sample_idx").collect()
    assert [
        (r["id"], r["sample_key"], r["n_components"], r["exts"], r["total_bytes"])
        for r in got
    ] == [
        (1, "sh/0001", 3, "cls;seg.png;txt", 9 + 1 + 8),
        (1, "sh/0002", 1, "txt", 6),
        (1, "noext", 1, "", 6),
        (2, None, None, None, None),
    ]
    assert got[0]["components"]["txt"] == "first doc"
    assert got[0]["components"]["cls"] == "3"


def test_shard_webdataset_packs_sorted_and_roundtrips(spark):
    rows = [
        (0, "b", "beta text", "1"),
        (0, "a", "alpha text", "0"),
        (1, "c", "gamma", "2"),
    ]
    df = spark.createDataFrame(
        rows, "shard_id long, skey string, txt string, cls string"
    )
    shards = MM.shard_webdataset(
        df, "shard_id", "skey", {"txt": "txt", "cls": "cls"}
    ).orderBy("shard_id")
    got = shards.collect()
    assert [(r["shard_id"], r["n_samples"]) for r in got] == [(0, 2), (1, 1)]
    assert all(r["shard_bytes"] == len(r["payload"]) for r in got)
    # members sorted by key inside the shard, one .txt + .cls each
    members = parse_tar(bytes(got[0]["payload"]))
    assert [m["name"] for m in members] == [
        "a.txt", "a.cls", "b.txt", "b.cls"
    ]
    assert members[0]["data"] == b"alpha text"
    # and the read half regroups them into the original samples
    back = (
        MM.wds_samples(shards.select("shard_id", "payload"))
        .orderBy("shard_id", "sample_idx")
        .collect()
    )
    assert [
        (r["shard_id"], r["sample_key"], r["components"]["txt"],
         r["components"]["cls"])
        for r in back
    ] == [
        (0, "a", "alpha text", "0"),
        (0, "b", "beta text", "1"),
        (1, "c", "gamma", "2"),
    ]


def test_wds_samples_binary_mode(spark):
    tar = make_tar([("k.bin", b"\x00\xff\x10")])
    df = spark.createDataFrame([(1, tar)], "id long, payload binary")
    r = MM.wds_samples(df, text=False).collect()[0]
    assert bytes(r["components"]["bin"]) == b"\x00\xff\x10"


# ---------------------------------------------------------------------------
# property tests: arbitrary member names/contents round-trip bit-exactly
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_name = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="/\x00", min_codepoint=33
    ),
    min_size=1,
    max_size=20,  # ≤80 UTF-8 bytes: stays inside the 100-byte name field
)


@settings(
    max_examples=30, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    members=st.lists(
        st.tuples(_name, st.binary(max_size=2000)),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    compression=st.sampled_from([None, "gzip", "zstd"]),
    mtime=st.integers(0, 2**32 - 1),
)
def test_property_tar_roundtrip(members, compression, mtime):
    got = parse_tar(make_tar(members, mtime=mtime, compression=compression))
    assert [(m["name"], m["data"], m["mtime"]) for m in got] == [
        (n, c, mtime) for n, c in members
    ]


@settings(
    max_examples=30, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    members=st.lists(
        st.tuples(_name, st.binary(max_size=2000)),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_property_tar_stdlib_agrees(members):
    blob = make_tar(members)
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        assert [(ti.name, tf.extractfile(ti).read()) for ti in tf] == list(
            members
        )


def test_long_name_without_slash_raises_cleanly():
    with pytest.raises(ValueError, match="too long"):
        make_tar([("x" * 150, b"d")])
