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


def test_all_queries_run(ray_session, registry):
    for name, fn in registry.queries().items():
        res = _to_pandas(fn(SF_DIR))
        assert len(res) >= 0, name
        assert len(res.columns) > 0, name


@pytest.mark.parametrize(
    "name",
    [
        "doc_stats", "quality_score", "dedup_exact", "dedup_prefix", "top_docs",
        "short_docs_by_lang", "lineitem_agg", "orders_by_segment",
        "events_hourly", "ann_cosine", "stratified_sample", "distinct_langs",
        "point_lookup", "lang_id", "bpe_tokens", "fingerprint_md5",
        "sessionize", "grouped_topk", "ann_multi", "dedup_components",
        "events_sliding", "asof_join", "anti_join", "semi_join",
        "group_median", "rollup_agg", "top_terms", "ngram_jaccard",
        "shuffle_join", "range_join", "window_lag", "cosine_pairs",
        "exact_quantile", "distinct_users", "heavy_hitters",
        "bloom_semi_join", "pivot_events", "length_gate", "stopword_filter",
        "train_split", "mixture_sample", "pack_sequences", "label_centroids",
        "hash_sample", "group_split", "redact_pii", "dup_phrases",
        "decontaminate", "cust_except", "html_main", "mode_lang",
        "section_flags", "user_intersect", "boilerplate_gate",
        "ivf_full_probe", "neardup_pairs", "grouped_p95",
        "domain_cap", "word_rep", "moving_max", "winsorize",
        "prefix_contained", "tfidf_topk", "left_join",
        "trailing_count", "dedup_keep_best", "percent_rank",
        "ntile", "running_sum", "fuzzy_pairs", "cume_dist", "cube_agg",
        "substring_dups", "dedup_normalized", "json_props", "funnel", "retention", "region_rollup",
        "postings", "bigram_counts", "cooccur", "interval_overlap",
        "full_outer_join", "group_corr", "event_gini", "event_paths",
        "argmax_event", "event_transitions", "above_avg_orders",
        "pareto_skyline", "length_outliers", "nation_revenue",
        "emb_argmax", "grouped_sample", "cust_union", "first_last",
        "value_histogram", "cross_source", "dense_rank", "mad_lang",
        "token_explode",
    ],
)
def test_query_matches_oracle(ray_session, registry, duck, name):
    ray_df = _normalize(_to_pandas(registry.queries()[name](SF_DIR)))
    sql_df = _normalize(duck.sql(registry.oracle_sql()[name]).fetchdf())
    assert list(ray_df.columns) == list(sql_df.columns), (
        name, list(ray_df.columns), list(sql_df.columns)
    )
    assert len(ray_df) == len(sql_df), name
    pd.testing.assert_frame_equal(
        ray_df, sql_df, check_dtype=False, check_exact=False, rtol=0, atol=0
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
