"""Static contract checks on __spark_entry__.py — the driver consumes
``queries()``/``oracle_sql()`` as dict literals, and a duplicated key
silently shadows an earlier entry (a real round-1 defect: two
``q3_shipping_priority`` literals hid one query slot AND two different
oracle texts)."""

import ast
from pathlib import Path

ENTRY = Path(__file__).resolve().parent.parent / "__spark_entry__.py"


def _literal_keys(fn_name: str) -> list[str]:
    tree = ast.parse(ENTRY.read_text())
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == fn_name:
            keys: list[str] = []
            for sub in ast.walk(node):
                if isinstance(sub, ast.Dict):
                    keys.extend(
                        k.value for k in sub.keys
                        if isinstance(k, ast.Constant) and isinstance(k.value, str)
                    )
            return keys
    raise AssertionError(f"no function {fn_name} in {ENTRY}")


def test_queries_keys_unique():
    keys = _literal_keys("queries")
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert not dupes, f"duplicate queries() keys: {dupes}"


def test_oracle_keys_unique():
    keys = _literal_keys("oracle_sql")
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert not dupes, f"duplicate oracle_sql() keys: {dupes}"


def test_top_level_functions_unique():
    tree = ast.parse(ENTRY.read_text())
    names = [n.name for n in tree.body if isinstance(n, ast.FunctionDef)]
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert not dupes, f"shadowed function definitions: {dupes}"


def test_every_query_has_oracle_or_is_known_rows_only():
    import sys

    sys.path.insert(0, str(ENTRY.parent))
    import __spark_entry__ as M

    qs, osql = set(M.queries()), set(M.oracle_sql())
    assert not osql - qs, f"oracle entries without a query: {osql - qs}"
    # rows-only queries are an explicit, documented exception list
    assert qs - osql == {
        "stratified_sample",
        "approx_stats",
        "embedding_ivf_topk",
    }, f"unexpected rows-only queries: {qs - osql}"
