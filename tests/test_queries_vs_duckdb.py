"""Driver-contract gate: every queries() entry runs at sf0.01; entries with a
DuckDB oracle must match on row count + schema + order-insensitive values
(mimicking the driver's compare, which sorts columns by name then hashes)."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def registry():
    from resume_ocr_ray.pipelines import registry as reg

    return reg


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _value_hash(df: pd.DataFrame) -> int:
    """Dtype-sensitive canonical hash mirroring the driver's compare:
    columns sorted by name, rows sorted, then hash over values. int64 vs
    float64 and pd.NA vs NaN hash DIFFERENTLY here — exactly the drift
    class (HUGEINT→float64, pandas extension dtypes) that cost 4 driver
    lanes in round 4 while the old ``check_dtype=False`` gate stayed
    green."""
    return int(pd.util.hash_pandas_object(df, index=False).sum())


def test_all_queries_run(ray_session, registry):
    for name, fn in registry.queries().items():
        res = _to_pandas(fn(SF_DIR))
        assert len(res) >= 0, name
        assert len(res.columns) > 0, name


def _oracle_names():
    """Parametrize over the LIVE oracle set: a static list here silently
    skips any newly registered oracle-backed query. oracle_sql() is a dict
    of SQL strings — importable at collection time, no Ray needed."""
    from resume_ocr_ray.pipelines import registry as reg

    return sorted(reg.oracle_sql())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(ray_session, registry, duck, name):
    ray_df = _normalize(_to_pandas(registry.queries()[name](SF_DIR)))
    sql_df = _normalize(duck.sql(registry.oracle_sql()[name]).fetchdf())
    assert list(ray_df.columns) == list(sql_df.columns), (
        name, list(ray_df.columns), list(sql_df.columns)
    )
    assert len(ray_df) == len(sql_df), name
    # value equality first (better failure messages than a hash diff) ...
    pd.testing.assert_frame_equal(
        ray_df, sql_df, check_dtype=False, check_exact=False, rtol=0, atol=0
    )
    # ... then the driver-strength dtype-sensitive hash
    assert _value_hash(ray_df) == _value_hash(sql_df), (
        name,
        dict(ray_df.dtypes.astype(str)),
        dict(sql_df.dtypes.astype(str)),
    )


def test_oracle_keys_subset_of_queries(registry):
    assert set(registry.oracle_sql()) <= set(registry.queries())


def test_extension_registry_round_trip(ray_session):
    """User-registered pipelines plug into queries()/oracle_sql() and run
    through the same machinery as built-ins."""
    from resume_ocr_ray.pipelines import registry as REG

    def my_regions(sf_dir):
        import ray.data as rd

        return rd.read_parquet(f"{sf_dir}/region.parquet")

    try:
        REG.register("ext_regions", my_regions, sql="SELECT * FROM region")
        assert "ext_regions" in REG.queries()
        assert REG.oracle_sql()["ext_regions"] == "SELECT * FROM region"
        out = REG.queries()["ext_regions"]("/root/testdata/sf0.001")
        assert out.count() > 0
        with pytest.raises(ValueError):
            REG.register("lineitem_agg", my_regions)  # built-ins reserved
    finally:
        REG.unregister("ext_regions")
    assert "ext_regions" not in REG.queries()


def test_gate_catches_dtype_drift():
    """Negative control for the gate itself: an int64 column vs the same
    values as float64 (the exact HUGEINT→float64 drift that cost 4 driver
    lanes in round 4), and pd.NA vs NaN (extension-dtype drift), must
    hash DIFFERENTLY — check_dtype=False-style equality is not enough."""
    base = pd.DataFrame({"k": ["a", "b"], "v": [1, 2]})
    drifted = base.assign(v=base["v"].astype("float64"))
    assert _value_hash(_normalize(base)) != _value_hash(_normalize(drifted))

    ext = pd.DataFrame({"v": pd.array([1, None], dtype="Int64")})
    npnan = pd.DataFrame({"v": [1.0, float("nan")]})
    assert _value_hash(ext) != _value_hash(npnan)
