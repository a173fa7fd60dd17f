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


def test_embedding_neardup_lsh_anchor(entrymod):
    """The subquadratic LSH path is anchored to its exact sibling: every
    reported pair is a true ≥tau pair (the in-bucket verify is exact), and
    recall ≥ 0.8 at smoke scale (expected ≈0.95 by construction)."""
    from open_source_search_engine_ray.pipelines import similarity

    ex = similarity.embedding_neardup_pairs(SF).to_pandas()
    lsh = similarity.embedding_neardup_lsh(SF).to_pandas()
    ek = set(zip(ex["vec_a"].astype(int), ex["vec_b"].astype(int)))
    lk = set(zip(lsh["vec_a"].astype(int), lsh["vec_b"].astype(int)))
    assert lk <= ek                       # precision 1 (exact verify)
    assert len(lk & ek) >= 0.8 * len(ek)  # recall gate
    # sims agree with the exact values for common pairs
    exm = {(int(a), int(b)): s for a, b, s in
           zip(ex["vec_a"], ex["vec_b"], ex["sim"])}
    for a, b, s in zip(lsh["vec_a"], lsh["vec_b"], lsh["sim"]):
        assert abs(exm[(int(a), int(b))] - s) < 1e-9


def test_jaccard_hot_shingle_corpus(ray_session, tmp_path):
    """Exactness under an injected hot shingle: hundreds of docs share a
    boilerplate prefix (a pathological skew key for the round-1
    shared-shingle pair join); the prefix-filtered algorithm must still
    produce exactly the DuckDB answer."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from open_source_search_engine_ray.pipelines import dedup

    boiler = "all rights reserved contact the administrator for details"
    rows = []
    for i in range(300):   # hot shingles: df=300 for every boiler shingle
        rows.append((i, f"{boiler} unique tail {i} zz{i:04d} qq{i:04d}"))
    # two true near-dup pairs sharing long bodies
    rows.append((1000, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((1001, "alpha beta gamma delta epsilon zeta eta iota"))
    rows.append((1002, boiler + " shared tail marker one two"))
    rows.append((1003, boiler + " shared tail marker one three"))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    p = tmp_path / "documents.parquet"
    pq.write_table(tbl, p)

    res = dedup.ngram_jaccard_pairs(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    ora = con.execute(dedup.ngram_jaccard_pairs_sql()).fetchdf()
    res = res.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    ora = ora.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(res) == len(ora) and len(res) >= 2
    assert res["doc_a"].tolist() == ora["doc_a"].astype(int).tolist()
    assert res["doc_b"].tolist() == ora["doc_b"].astype(int).tolist()
    assert np.allclose(res["jaccard"], ora["jaccard"])
    # the dupe-cluster labeling over the same corpus, distributed
    labels = dedup.label_propagation_components(
        dedup.ngram_jaccard_pairs(str(tmp_path))).to_pandas()
    lab = dict(zip(labels["doc_id"].astype(int),
                   labels["cluster_id"].astype(int)))
    assert lab[1001] == 1000 and lab[1003] == 1002
