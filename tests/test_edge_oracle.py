"""Edge-value differential for the JSON-extraction trio: the fixture's
props are all plain small ints, so the sf0.01 gate can never exercise
the from_json / variant_get / map<string,int> cast edges (floats,
strings, booleans, overflow, nulls, broken JSON).  This fixture can —
each query runs against its own DuckDB oracle on adversarial props
(the r3 probe lesson, turned into a standing test)."""

import datetime
import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EDGE_PROPS = [
    '{"k": 5}', '{"k": -5}', '{"k": 1.5}', '{"k": -1.9}', '{"k": 1e2}',
    '{"k": "7"}', '{"k": "x"}', '{"k": true}', '{"k": 2147483648}',
    '{"k": null}', '{}', None, '{"k": 2.5}', '{"m": 3, "k": 4}',
    '{"m": 1.5, "k": 4}', "not json",
]


@pytest.fixture(scope="module")
def edge_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("edge_sf"))
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings".split()
    ):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{d}/{t}.parquet")
    n = len(EDGE_PROPS)
    base = datetime.datetime(2024, 1, 1)
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [base + datetime.timedelta(minutes=i) for i in range(n)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
            "event_type": pa.array(["a" if i % 2 else "b" for i in range(n)]),
            "value": pa.array(
                [round(1.0 + i * 0.25, 2) for i in range(n)], pa.float64()
            ),
            "props": pa.array(EDGE_PROPS),
        }
    )
    pq.write_table(t, f"{d}/events.parquet")
    return d


@pytest.mark.parametrize(
    "name",
    ["json_extract_events", "map_props_explode", "variant_extract_events"],
)
def test_json_queries_match_oracle_on_edge_values(spark, edge_sf, name):
    import duckdb

    import __spark_entry__ as M
    from tools.check_oracle import compare

    got = M.queries()[name](spark, edge_sf).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{edge_sf}/events.parquet')"
    )
    want = con.execute(M.oracle_sql()[name]).fetchdf()
    errs = compare(name, got, want)
    assert not errs, errs
