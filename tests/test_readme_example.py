"""The README's "Using the engine" block must actually run (r4 verdict
item 8) — extracted verbatim and executed against the sf0.001 fixtures,
so the docs cannot rot."""

import re

import pytest


def _readme_block() -> str:
    src = open("README.md").read()
    m = re.search(
        r"## Using the engine.*?```python\n(.*?)```", src, re.S
    )
    assert m, "README 'Using the engine' python block missing"
    return m.group(1)


def test_readme_example_runs(spark, tmp_path):
    code = _readme_block()
    # EditorSession() would build its own SparkSession; reuse the test
    # fixture's by exec-ing with a pre-bound constructor shim
    from parquet_editor_spark.session import EditorSession

    env = {
        "DATA": "/root/testdata/sf0.001",
        "OUT": str(tmp_path),
        "EditorSession": lambda: EditorSession(spark),
    }
    code = code.replace(
        "from parquet_editor_spark.session import EditorSession", ""
    )
    exec(compile(code, "README.md", "exec"), env)
    # the pipeline tail really ran: docs rebound to the filtered frame
    sess = env["sess"]
    assert set(sess.get("docs").columns) == {
        "doc_id", "text", "lang", "quality"
    }
    assert (
        spark.read.parquet(str(tmp_path / "lineitem_edited.parquet")).count()
        > 0
    )
