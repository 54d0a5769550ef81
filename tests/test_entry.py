"""Driver-contract tests: entry() smoke + a fast sample of queries()
checked against their DuckDB oracles exactly the way the driver does.
(The full 22-query sweep lives in tools/check_oracles.py.)"""

import hashlib

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _hash(rows, cols):
    cols = sorted(cols)
    lines = sorted("|".join(repr(r[c]) for c in cols) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 500
    assert df.columns == ["clip_id", "keep", "drop_reason", "lang",
                          "lang_conf", "ppl", "scrubbed", "mapping"]
    assert any(r["keep"] for r in rows)
    assert any(not r["keep"] for r in rows)


def test_queries_and_oracles_aligned():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 20
    missing = set(oracles) - set(qs)
    assert not missing
    # every query now carries an oracle (the ANN queries gate recall@k
    # + self-hit invariants against a constant table)
    assert set(qs) - set(oracles) == set()


@pytest.mark.parametrize("name", [
    "q03_scrub_substitution", "q07_keep_drop", "q09_token_counts",
    "q17_tpch_pricing_summary", "q19_window_latest_event",
])
def test_query_matches_oracle(spark, con, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    sdf = fn(spark, SF)
    srows = [r.asDict() for r in sdf.collect()]
    odf = con.sql(sql)
    ocols = [d[0] for d in odf.description]
    orows = [dict(zip(ocols, row)) for row in odf.fetchall()]
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(ocols)
    assert _hash(srows, sdf.columns) == _hash(orows, ocols)
