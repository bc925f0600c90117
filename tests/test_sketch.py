"""Count-min sketch: guarantee properties against a python reference."""

import hashlib

import pytest
from pyspark.sql import functions as F

from parquet_editor_spark.operators import sketch as SK


def _py_cms(texts, depth=4, width=256, k=20):
    from collections import Counter

    exact = Counter(w for t in texts for w in t.split())

    def bucket(w, j):
        h = hashlib.md5(f"{j}|{w}".encode()).hexdigest()[:8]
        return int(h, 16) % width

    cells = [[0] * width for _ in range(depth)]
    for w, c in exact.items():
        for j in range(depth):
            cells[j][bucket(w, j)] += c
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {
        w: (c, min(cells[j][bucket(w, j)] for j in range(depth)))
        for w, c in top
    }


def test_cms_matches_python_reference(spark):
    texts = [
        "alpha beta gamma alpha alpha",
        "beta beta gamma delta",
        "alpha epsilon zeta eta theta iota",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["w"]: (r["exact"], r["estimate"])
        for r in SK.cms_topk_bound(df, "text", k=10).collect()
    }
    assert got == _py_cms(texts, k=10)


def test_cms_never_underestimates(spark):
    texts = [" ".join(f"w{i % 97}" for i in range(500))]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = SK.cms_topk_bound(df, "text", k=20).collect()
    assert rows and all(r["estimate"] >= r["exact"] for r in rows)
    assert all(r["within_bound"] for r in rows)
