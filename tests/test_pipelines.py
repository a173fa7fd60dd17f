"""The driver's correctness gate, embedded: every queries() entry runs at
smoke scale, and every SQL-checked entry is compared against its DuckDB
oracle (row count + sorted-value equality), inside the repo's own pytest
suite."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__

    return __ray_entry__


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def _to_pandas(res):
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_entry_smoke(entrymod):
    df = _to_pandas(entrymod.entry())
    assert len(df) >= 0
    assert list(df.columns) == ["query_id", "rank", "doc_id", "score"]


def test_all_queries_run(entrymod):
    qs = entrymod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        df = _to_pandas(fn(SF))
        assert isinstance(df, pd.DataFrame), name
        assert len(df.columns) > 0, name


def test_sql_checked_queries_match_oracle(entrymod, ducks):
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert len(osql) >= 12
    for name, sql in osql.items():
        ray_df = _normalize(_to_pandas(qs[name](SF)))
        sql_df = _normalize(ducks.execute(sql).fetchdf())
        assert len(ray_df) == len(sql_df), name
        assert list(ray_df.columns) == list(sql_df.columns), name
        pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False,
                                      obj=name)
