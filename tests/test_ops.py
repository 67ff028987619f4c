"""Unit/behavioral tests for the training-data ops (dedup, similarity,
multimodal plumbing, job-config validation)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from resume_ocr_ray.core import corpus
from resume_ocr_ray.ops import dedup as D
from resume_ocr_ray.ops import multimodal as MM
from resume_ocr_ray.ops import similarity as SIM


def _docs_with_dups():
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away into "
        "the green forest while the sun sets slowly behind tall mountains "
    ) * 4
    rows = []
    for i in range(20):
        rows.append({"doc_id": i, "text": f"unique document number {i} " + f"filler {i} " * 30})
    # near-dup pair: tiny edit
    rows.append({"doc_id": 100, "text": base})
    rows.append({"doc_id": 101, "text": base.replace("lazy", "sleepy")})
    # exact dup pair
    rows.append({"doc_id": 200, "text": base})
    return pa.table(
        {"doc_id": [r["doc_id"] for r in rows], "text": [r["text"] for r in rows]}
    )


def test_minhash_finds_near_dups(ray_session):
    import ray.data as rd

    tbl = _docs_with_dups()
    pairs = D.minhash_candidates(rd.from_arrow(tbl)).to_pandas()
    found = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert (100, 200) in found  # exact dup always collides
    assert any(a == 100 or b == 101 for a, b in found if {a, b} & {101}), found
    # verify stage: true Jaccard of the near-dup pair is high
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    assert D.jaccard(texts[100], texts[101]) > 0.5
    assert D.jaccard(texts[100], texts[0]) < 0.1


def test_simhash_finds_near_dups(ray_session):
    import ray.data as rd

    pairs = D.simhash_candidates(rd.from_arrow(_docs_with_dups())).to_pandas()
    found = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert (100, 200) in found
    ham = dict(zip(map(tuple, pairs[["a", "b"]].to_numpy()), pairs["hamming"]))
    assert ham[(100, 200)] == 0


def test_embedding_near_dups(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(0)
    base = rng.standard_normal(64).astype(np.float32)
    vecs = [base, base + 0.01 * rng.standard_normal(64).astype(np.float32)]
    vecs += [rng.standard_normal(64).astype(np.float32) for _ in range(30)]
    tbl = pa.table(
        {"vec_id": list(range(len(vecs))), "embedding": [v.tolist() for v in vecs]}
    )
    pairs = D.embedding_near_dups(rd.from_arrow(tbl), threshold=0.95).to_pandas()
    assert (0, 1) in set(map(tuple, pairs[["a", "b"]].to_numpy()))


def test_minhash_verified_empty_candidates(ray_session):
    """All-unique docs → zero LSH candidates: the verify pipeline must return
    an empty result, not crash (round-1 ADVICE: empty value_set ArrowTypeError)."""
    import ray.data as rd

    uniq = pa.table(
        {
            "doc_id": list(range(10)),
            "text": [
                f"totally distinct words {i} alpha beta {i * 7} gamma delta {i * 13}"
                for i in range(10)
            ],
        }
    )
    out = D.minhash_verified(rd.from_arrow(uniq), threshold=0.5).to_pandas()
    assert len(out) == 0


def test_embedding_dups_skew_cap(ray_session):
    """Adversarial single-bucket input (many identical vectors): the
    max_bucket star fallback must bound pair output to O(k) anchored at the
    min vec_id instead of O(k²)."""
    import ray.data as rd

    rng = np.random.default_rng(1)
    base = rng.standard_normal(64).astype(np.float32)
    k = 50
    tbl = pa.table(
        {"vec_id": list(range(k)), "embedding": [base.tolist()] * k}
    )
    pairs = D.embedding_near_dups(
        rd.from_arrow(tbl), threshold=0.95, max_bucket=10
    ).to_pandas()
    assert len(pairs) == k - 1  # star: every vec paired with the min id
    assert (pairs["a"] == 0).all()
    assert (pairs["cosine"] >= 0.95).all()


def test_connected_components_transitive_chain(ray_session):
    """A exact-dups B; B prefix-matches C (different tail): the component
    must merge all three transitively even though A and C share no key."""
    import ray.data as rd

    prefix = "x" * 24
    tbl = pa.table(
        {
            "doc_id": [1, 2, 3, 9],
            "text": [
                prefix + " tail one",
                prefix + " tail one",      # exact dup of 1
                prefix + " другой tail",   # prefix-match only
                "completely unrelated document",
            ],
        }
    )
    out = D.connected_components_labels(rd.from_arrow(tbl)).to_pandas()
    comp = dict(zip(out["doc_id"], out["component"]))
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[9] == 9


def test_connected_components_pointer_jumping_long_chain(ray_session):
    """A 50-link key chain (doc i shares key i with doc i-1 and key i+1
    with doc i+1 — diameter 50) converges in O(log d) iterations thanks to
    label doubling; one-hop-per-pass propagation would need ~50 passes and
    trip the max_iters=8 loud-failure guard."""
    import ray.data as rd

    n = 51  # docs 0..50, chain diameter 50

    def chain_state(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keys, doc_ids = [], []
        for d in ids:
            keys.append(f"c:{d}")
            doc_ids.append(int(d))
            keys.append(f"c:{d + 1}")
            doc_ids.append(int(d))
        return pa.table(
            {
                "key": pa.array(keys, type=pa.string()),
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "label": pa.array(doc_ids, type=pa.int64()),
            }
        )

    stats: dict = {}
    out = D.connected_components_labels(
        rd.range(n).map_batches(
            lambda t: t.rename_columns(["doc_id"]), batch_format="pyarrow"
        ),
        max_iters=8,
        to_state_fn=chain_state,
        stats=stats,
        driver_budget_rows=0,  # force the distributed rounds under test
    ).to_pandas()
    assert (out["component"] == 0).all()
    assert stats["iters"] <= 6  # log-diameter, not one hop per pass

    # driver-fold fast path (the size-gated default on small state) must
    # produce IDENTICAL labels and the same log-diameter convergence
    stats_local: dict = {}
    out_local = D.connected_components_labels(
        rd.range(n).map_batches(
            lambda t: t.rename_columns(["doc_id"]), batch_format="pyarrow"
        ),
        max_iters=8,
        to_state_fn=chain_state,
        stats=stats_local,
    ).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out_local.sort_values("doc_id").reset_index(drop=True),
    )
    assert stats_local["iters"] <= 6


def test_brute_force_vs_ivf_overlap(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((300, 64)).astype(np.float32)
    tbl = pa.table(
        {"vec_id": list(range(300)), "embedding": [v.tolist() for v in vecs]}
    )
    q = SIM.query_vector(64, seed=7)
    exact = SIM.brute_force_topk(rd.from_arrow(tbl), q, k=10).to_pandas()
    approx = SIM.ivf_topk(rd.from_arrow(tbl), q, k=10, n_cells=8, nprobe=4).to_pandas()
    assert len(exact) == 10
    # IVF with half the cells probed should still recover most of the top-10
    overlap = len(set(exact["vec_id"]) & set(approx["vec_id"]))
    assert overlap >= 5, overlap
    # exact list is sorted desc
    assert list(exact["cosine"]) == sorted(exact["cosine"], reverse=True)


def test_multimodal_probe_and_decode(ray_session):
    import ray.data as rd

    _, media = corpus.generate_corpus(18, seed=5)
    media_ds = rd.from_arrow(media)
    probe = MM.probe_media(media_ds).to_pandas()
    assert set(probe.columns) == {"media_ref", "media_kind", "n_pages", "payload_bytes"}
    assert (probe["payload_bytes"] > 0).all()
    feats = MM.decode_features(media_ds).to_pandas()
    assert (feats["text_len"] > 0).all()  # synthetic pages all decode
    assert feats["byte_entropy"].between(0, 8).all()
    # frame sampling halves pages (ceil)
    sampled = MM.frame_sample(media_ds, every_k=2).to_pandas()
    probe2 = MM.probe_media(rd.from_pandas(sampled)).to_pandas()
    merged = probe.merge(probe2, on="media_ref", suffixes=("", "_s"))
    assert (merged["n_pages_s"] == (merged["n_pages"] + 1) // 2).all()


def test_real_image_decode_is_gated_stub():
    if MM.HAVE_PIL:
        pytest.skip("PIL present; stub not applicable")
    with pytest.raises(NotImplementedError):
        MM.ImageDecodeStage(real_images=True)


def test_job_config_validation():
    from resume_ocr_ray.engine import job

    class A:
        request_id = "not-a-uuid"
        user_id = ""
        query = "x" * 3000

    errs = job.validate_job_config(A)
    assert len(errs) == 3
    import uuid

    class B:
        request_id = str(uuid.uuid4())
        user_id = "alice"
        query = None

    assert job.validate_job_config(B) == []


def test_job_max_docs_cap(tmp_path, capsys):
    """M2 parity knob (reference MAX_FILES, constants.py:4): a corpus larger
    than --max-docs refuses to start, counted from parquet footers only."""
    import pyarrow.parquet as pq

    from resume_ocr_ray.engine import job

    docs_dir = tmp_path / "corpus" / "documents"
    docs_dir.mkdir(parents=True)
    t = pa.table({"doc_id": [str(i) for i in range(25)],
                  "spans": [[] for _ in range(25)]})
    pq.write_table(t, docs_dir / "shard-0000.parquet")
    rc = job.main([
        "--input", str(tmp_path / "corpus"), "--out", str(tmp_path / "out"),
        "--max-docs", "20",
    ])
    assert rc == 2
    out = capsys.readouterr().out
    assert "limite" in out and '"invalid"' in out


def test_asof_join_drops_events_before_first_order(ray_session):
    import pandas as pd
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [7, 7, 9],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-06-01", "2024-06-01"]
            ).astype("datetime64[us]"),
        }
    )
    od = pd.DataFrame(
        {
            "o_custkey": [7, 7, 9],
            "o_orderdate": pd.to_datetime(
                ["2024-03-01", "2024-05-01", "2024-07-01"]
            ).astype("datetime64[us]"),
            "o_orderkey": [100, 200, 300],
            "o_totalprice": [1.0, 2.0, 3.0],
        }
    )
    # broadcast form and shuffled form must agree
    out = R.asof_join_events_orders(
        rd.from_pandas(ev), od
    ).to_pandas().sort_values("event_id")
    out2 = R.asof_join_shuffled(
        rd.from_pandas(ev), rd.from_pandas(od)
    ).to_pandas().sort_values("event_id")
    # event 1 precedes user 7's first order; event 3 precedes user 9's only
    # order — both dropped (inner as-of). Event 2 matches the May order.
    for o in (out, out2):
        assert o["event_id"].tolist() == [2]
        assert o["o_orderkey"].tolist() == [200]


def test_asof_join_tie_break_max_orderkey(ray_session):
    import pandas as pd
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    ev = pd.DataFrame(
        {
            "event_id": [1],
            "user_id": [7],
            "ts": pd.to_datetime(["2024-06-01"]).astype("datetime64[us]"),
        }
    )
    od = pd.DataFrame(
        {
            "o_custkey": [7, 7],
            "o_orderdate": pd.to_datetime(
                ["2024-03-01", "2024-03-01"]
            ).astype("datetime64[us]"),
            "o_orderkey": [100, 150],
            "o_totalprice": [1.0, 9.0],
        }
    )
    out = R.asof_join_events_orders(rd.from_pandas(ev), od).to_pandas()
    out2 = R.asof_join_shuffled(
        rd.from_pandas(ev), rd.from_pandas(od)
    ).to_pandas()
    for o in (out, out2):
        assert o["o_orderkey"].tolist() == [150]
        assert o["o_totalprice"].tolist() == [9.0]


def test_group_median_interpolates_even_count(ray_session):
    import pandas as pd
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    df = pd.DataFrame({"g": ["a", "a", "a", "a", "b"], "v": [1.0, 2.0, 10.0, 11.0, 5.0]})
    out = (
        R.group_median(rd.from_pandas(df), group_col="g", val_col="v")
        .to_pandas()
        .sort_values("g")
    )
    assert out["median_qty"].tolist() == [6.0, 5.0]
    assert out["n_rows"].tolist() == [4, 1]


def test_ngram_jaccard_blocks_and_threshold(ray_session):
    import pandas as pd
    import ray.data as rd

    from resume_ocr_ray.ops import dedup as D

    base = "the quick brown fox jumps over the lazy dog " * 4
    near = base[:-8] + "sleeping"   # same prefix, tiny tail edit
    other = "z" * 200               # different prefix block entirely
    df = pd.DataFrame(
        {"doc_id": [3, 1, 2], "text": [other, base, near]}
    )
    out = D.ngram_jaccard_pairs(rd.from_pandas(df)).to_pandas()
    assert out[["doc_a", "doc_b"]].values.tolist() == [[1, 2]]
    assert (out["jaccard3"] >= 0.8).all()


def test_ngram_jaccard_hot_prefix_star_cap(ray_session):
    """Adversarial templated corpus: one hot 32-char prefix shared by every
    doc. Above ``max_block`` the block must fall back to STAR pairs against
    the min doc (O(k) comparisons, bounded time) instead of O(k²)."""
    import pandas as pd
    import ray.data as rd

    from resume_ocr_ray.ops import dedup as D

    k = 40
    tmpl = "TEMPLATE HEADER shared by every doc "  # > 32 chars
    df = pd.DataFrame(
        {
            "doc_id": np.arange(k, dtype=np.int64),
            # identical template + tiny per-doc tail → all near-dups
            "text": [tmpl * 8 + f"tail {i % 2}" for i in range(k)],
        }
    )
    out = D.ngram_jaccard_pairs(
        rd.from_pandas(df), threshold=0.5, max_block=8
    ).to_pandas()
    # star cap: every emitted pair is anchored at the block min (doc 0),
    # giving exactly k-1 comparisons — not C(k,2)
    assert (out["doc_a"] == 0).all()
    assert len(out) == k - 1
    # below the cap the same corpus yields the full all-pairs set
    full = D.ngram_jaccard_pairs(
        rd.from_pandas(df), threshold=0.5, max_block=1000
    ).to_pandas()
    assert len(full) == k * (k - 1) // 2


def test_hll_accuracy_and_merge_determinism(ray_session):
    import pandas as pd
    import ray.data as rd

    from resume_ocr_ray.ops import sketch as SK

    rng = np.random.default_rng(3)
    n = 20_000
    df = pd.DataFrame(
        {
            "g": np.where(rng.random(n) < 0.5, "a", "b"),
            "v": rng.integers(0, 5_000, size=n),
        }
    )
    exact = df.groupby("g")["v"].nunique()
    for blocks in (1, 7):  # merge path must not depend on partitioning
        out = (
            SK.approx_distinct_hll(
                rd.from_pandas(df).repartition(blocks), "g", "v"
            )
            .to_pandas()
            .set_index("g")["approx_distinct"]
        )
        for g in ("a", "b"):
            assert abs(out[g] - exact[g]) / exact[g] < 0.05, (g, out[g], exact[g])
        if blocks == 1:
            first = out
        else:  # max-merge of registers is order/partition independent
            assert (out.sort_index() == first.sort_index()).all()


def test_cosine_pairs_exact_finds_planted_pair(ray_session):
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((50, 16)).astype(np.float32)
    mat[7] = mat[3] + rng.standard_normal(16).astype(np.float32) * 0.01
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(50, dtype=np.int64)),
            "embedding": pa.array(
                [r.tolist() for r in mat], type=pa.list_(pa.float32())
            ),
        }
    )
    out = SIM.cosine_pairs_exact(rd.from_arrow(t), threshold=0.99).to_pandas()
    assert [3, 7] in out[["a", "b"]].values.tolist()
    assert (out["a"] < out["b"]).all()


def test_window_lag_single_order_customers_excluded(ray_session):
    import pandas as pd
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    ts = pd.to_datetime(
        ["2024-01-01", "2024-01-05", "2024-01-05", "2024-02-01"]
    )
    df = pd.DataFrame(
        {
            "o_orderkey": [10, 11, 12, 20],
            "o_custkey": [1, 1, 1, 2],
            "o_orderdate": ts,
        }
    )
    out = (
        R.window_lag_gaps(rd.from_pandas(df), parts=4)
        .to_pandas()
        .sort_values("o_orderkey")
    )
    # customer 2 has one order -> no row; ties break by orderkey
    assert out["o_orderkey"].tolist() == [11, 12]
    assert out["gap_us"].tolist() == [4 * 86_400_000_000, 0]


def test_heavy_hitters_undersized_capacity_stays_exact(ray_session):
    import pandas as pd
    import ray.data as rd

    from resume_ocr_ray.ops import sketch as SK

    # vocabulary far above capacity=2 forces the Misra-Gries prune; the
    # Σ-error guard must fall back so the result stays exact
    docs = ["alpha beta " * 30 + f"rare{i} " for i in range(40)]
    ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(4)
    out = (
        SK.heavy_hitters(ds, ppm=200_000, capacity=2)
        .to_pandas()
        .sort_values("word")
    )
    # alpha/beta are 1200/2440 ≈ 49% each; every rare{i} is 1/2440
    assert out["word"].tolist() == ["alpha", "beta"]
    assert out["n"].tolist() == [1200, 1200]


def test_exact_quantile_duplicate_heavy_bin(ray_session):
    import pandas as pd
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    # 90% of mass is one duplicated value inside a single histogram bin
    vals = np.concatenate([np.full(900, 5.0), np.linspace(0, 100, 100)])
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(3)
    out = R.exact_quantile(ds, "v", ps=(0.5, 0.99), bins=16)
    s = np.sort(vals)
    assert out.set_index("p")["value"].to_dict() == {
        0.5: s[int(np.ceil(0.5 * len(s))) - 1],
        0.99: s[int(np.ceil(0.99 * len(s))) - 1],
    }


def test_bloom_semi_join_exact_under_heavy_false_positives(ray_session):
    import pandas as pd
    import ray.data as rd

    from resume_ocr_ray.ops import sketch as SK

    # m_bits=64 with 10 keys x 4 probes saturates the bitmap: nearly every
    # probe is a false positive — the cogroup verify must still be exact
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(100, dtype=np.int64),
            "o_orderpriority": ["1-URGENT" if k % 10 == 0 else "3-MEDIUM"
                                 for k in range(100)],
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": np.repeat(np.arange(100, dtype=np.int64), 2),
            "l_returnflag": ["A", "R"] * 100,
            "l_extendedprice": np.full(200, 10.0),
            "l_discount": np.zeros(200),
        }
    )
    out = (
        SK.bloom_semi_join_revenue(
            rd.from_pandas(li), rd.from_pandas(orders), m_bits=64, parts=4
        )
        .to_pandas()
        .sort_values("l_returnflag")
    )
    # 10 urgent orders x 1 lineitem per flag -> 10 items, 100.0 per flag
    assert out["l_returnflag"].tolist() == ["A", "R"]
    assert out["n_items"].tolist() == [10, 10]
    assert out["revenue"].tolist() == [100.0, 100.0]


def test_bloom_filter_no_false_negatives():
    from resume_ocr_ray.ops import sketch as SK

    keys = np.arange(0, 100_000, 7, dtype=np.int64)
    words = SK.bloom_bits(keys, 1 << 20)
    assert SK.bloom_maybe(keys, words, 1 << 20).all()
    probe = np.arange(1, 100_000, 13, dtype=np.int64)
    fp = SK.bloom_maybe(probe, words, 1 << 20) & ~np.isin(probe, keys)
    assert fp.mean() < 0.02  # ~1% FP at these parameters


def test_set_ops_intersect_except(ray_session):
    import ray.data as rd
    from resume_ocr_ray.ops import relational as R

    events = pa.table(
        {
            "user_id": [1, 1, 2, 2, 3, 3, 4, 5, 5],
            "event_type": ["purchase", "signup", "purchase", "error",
                           "signup", "view", "purchase", "purchase",
                           "signup"],
        }
    )
    inter = R.user_set_op(rd.from_arrow(events), "purchase", "signup",
                          op="intersect").to_pandas()
    assert sorted(inter["user_id"]) == [1, 5]
    exc = R.user_set_op(rd.from_arrow(events), "purchase", "signup",
                        op="except").to_pandas()
    assert sorted(exc["user_id"]) == [2, 4]
    # two-source form: keys only on side A survive except
    a = rd.from_arrow(pa.table({"k": [1, 2, 3, 4, 4]}))
    b = rd.from_arrow(pa.table({"k": [2, 4, 9]}))
    two = R.set_op_two(a, b, key="k", op="except").to_pandas()
    assert sorted(two["k"]) == [1, 3]
    both = R.set_op_two(
        rd.from_arrow(pa.table({"k": [1, 2, 3, 4, 4]})),
        rd.from_arrow(pa.table({"k": [2, 4, 9]})),
        key="k", op="intersect",
    ).to_pandas()
    assert sorted(both["k"]) == [2, 4]


def test_grouped_mode_tie_breaks_to_smallest(ray_session):
    import ray.data as rd
    from resume_ocr_ray.ops import relational as R

    t = pa.table(
        {
            "g": ["x", "x", "x", "x", "y", "y"],
            "v": ["b", "b", "a", "a", "q", "p"],  # x: tie b/a → a; y: tie → p
        }
    )
    out = (
        R.grouped_mode(rd.from_arrow(t), "g", "v")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert list(out["g"]) == ["x", "y"]
    assert list(out["mode_value"]) == ["a", "p"]
    assert list(out["n_occurrences"]) == [2, 1]


def test_kmeans_partitions_and_converges(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    # three well-separated blobs, ids dense from 0 (init contract)
    centers = np.array([[5.0] * 64, [-5.0] * 64, [0.0] * 64])
    vecs = np.concatenate(
        [c + 0.1 * rng.standard_normal((30, 64)) for c in centers]
    ).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )

    def factory():
        import ray.data as rd

        return rd.from_arrow(tbl)

    out = SIM.kmeans_clusters(factory, k=3, iters=4)
    assert list(out["cluster"]) == [0, 1, 2]
    assert int(out["n"].sum()) == len(vecs)
    path = out.attrs["inertia_path"]
    assert all(b <= a + 1e-9 for a, b in zip(path, path[1:])), path
    # deterministic re-run
    out2 = SIM.kmeans_clusters(factory, k=3, iters=4)
    assert out.equals(out2)


def test_html_extract_round_trip_and_heuristics(ray_session):
    import ray.data as rd
    from resume_ocr_ray.core import html as H
    from resume_ocr_ray.ops import text as T

    cases = ["hello world", "", "a <b> & c &amp; raw", "p1\n\np2\n\np3",
             "  leading and trailing  ", "multi\nline\ntext"]
    for i, t in enumerate(cases):
        assert H.extract_main(H.wrap_page(i, t)) == t, repr(t)
    # boilerplate never leaks into the extraction
    main = H.extract_main(H.wrap_page(7, "real article body"))
    assert main == "real article body"
    page = H.wrap_page(7, "real article body")
    assert "cookie" in page.lower() and "Sponsored" in page  # wrapper is real
    # unmarked link-heavy block rejected by link density, not by class name
    page2 = ("<html><body><div><a href='/a'>aaa bbb ccc</a> "
             "<a href='/b'>ddd eee</a></div>"
             "<div><p>actual article text with plenty of words here"
             "</p></div></body></html>")
    assert H.extract_main(page2).startswith("actual article")
    # Ray op end-to-end: exact recovery per row
    tbl = pa.table({"doc_id": list(range(len(cases))), "text": cases})
    out = (
        T.html_main(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["main_text"]) == cases


def test_ddsketch_quantile_error_bound_and_determinism(ray_session):
    import math

    import ray.data as rd
    from resume_ocr_ray.ops import sketch as SK

    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.lognormal(3, 1, 5000),  # heavy continuous tail
        np.zeros(25),               # zero bin
    ])
    t = pa.table({"v": vals})
    out = SK.ddsketch_quantiles(rd.from_arrow(t), "v", ps=(0.5, 0.9, 0.99),
                                rel_err=0.01)
    srt = np.sort(vals)
    for _, r in out.iterrows():
        exact = srt[max(1, math.ceil(r.p * len(srt))) - 1]
        assert abs(r.value - exact) <= 0.0101 * exact + 1e-9, (r.p, r.value, exact)
    # merge-order independence: different partitioning, identical estimate
    out2 = SK.ddsketch_quantiles(rd.from_arrow(t).repartition(13), "v",
                                 ps=(0.5, 0.9, 0.99), rel_err=0.01)
    assert out.equals(out2)


def test_redact_pii_scrubs_planted_contacts(ray_session):
    import ray.data as rd
    from resume_ocr_ray.ops import text as T

    tbl = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "text": [
                "cv of jo: jo.smith+hr@corp.example.io call +55 (11) 9124-7777 now",
                "no contact info here",
                "two mails x@y.co and z@w.org, phone +1 415 555 0000",
            ],
        }
    )
    out = (
        T.redact_pii(rd.from_arrow(tbl))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc["a", "n_emails"] == 1 and out.loc["a", "n_phones"] == 1
    assert "<EMAIL>" in out.loc["a", "clean_text"]
    assert "<PHONE>" in out.loc["a", "clean_text"]
    assert "jo.smith" not in out.loc["a", "clean_text"]
    assert "9124" not in out.loc["a", "clean_text"]
    assert out.loc["b", "n_emails"] == 0 and out.loc["b", "n_phones"] == 0
    assert out.loc["b", "clean_text"] == "no contact info here"
    assert out.loc["c", "n_emails"] == 2 and out.loc["c", "n_phones"] == 1


def test_dup_phrases_finds_planted_boilerplate(ray_session):
    import ray.data as rd
    from resume_ocr_ray.ops import text as T

    boiler = "click here to subscribe"
    docs = [f"doc {i} unique words {i * 7} then {boiler} end" for i in range(5)]
    docs += ["totally unrelated text one", "totally unrelated text two"]
    tbl = pa.table({"text": docs})
    out = T.dup_phrases(rd.from_arrow(tbl), n=4, min_docs=4, top=10).to_pandas()
    assert boiler in set(out["gram"])
    row = out[out["gram"] == boiler].iloc[0]
    assert row["n_docs"] == 5
    # within-doc dedup: a gram repeated inside ONE doc counts once
    rep = pa.table({"text": ["spam spam spam spam spam spam spam spam"]})
    out2 = T.dup_phrases(rd.from_arrow(rep), n=2, min_docs=1, top=5).to_pandas()
    assert (out2["n_docs"] == 1).all()


def test_decontaminate_flags_benchmark_overlap(ray_session):
    import ray.data as rd
    from resume_ocr_ray.ops import text as T

    bench = pa.table(
        {"doc_id": [100], "text": ["the quick brown fox jumps over the lazy dog"]}
    )
    train = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "intro words then the quick brown fox jumps right here",  # overlaps
                "completely different content with no shared shingles at all",
                "tiny",  # < n tokens -> excluded
            ],
        }
    )
    out = (
        T.decontaminate(rd.from_arrow(train), rd.from_arrow(bench), n=5)
        .to_pandas()
        .set_index("doc_id")
    )
    assert set(out.index) == {1, 2}
    assert bool(out.loc[1, "contaminated"]) is True
    assert bool(out.loc[2, "contaminated"]) is False


def test_boilerplate_gate_occurrence_counts(ray_session):
    import ray.data as rd
    from resume_ocr_ray.ops import text as T

    boiler = "copyright acme corp"
    docs = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                f"{boiler} page one content here",
                f"{boiler} other page body text",
                f"{boiler} {boiler} {boiler}",  # boiler-dominated
                "entirely original writing with no repeats",
            ],
        }
    )
    out = (
        T.boilerplate_gate(
            lambda: rd.from_arrow(docs), n=3, min_docs=3,
            max_frac_num=1, max_frac_den=3,
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(out) == 4
    # doc 3: 3 boiler occurrences of 7 grams (3/7 > 1/3) -> gated out
    assert not bool(out.loc[3, "keep"])
    assert bool(out.loc[4, "keep"]) and out.loc[4, "n_boiler"] == 0
    # occurrence counting: doc 3 counts the boiler gram every time it occurs
    assert out.loc[3, "n_boiler"] > 1


def test_gram_broadcast_guards_trip_to_semi_join(ray_session):
    """Adversarially oversized gram sets (broadcast_max=0 forces the scale
    path): decontaminate and boilerplate_gate must produce row-identical
    results through the hash-keyed semi join, with no driver gram object."""
    import random

    import ray.data as rd
    from resume_ocr_ray.ops import text as T

    rng = random.Random(5)
    words = [f"w{i}" for i in range(40)]
    planted = "alpha beta gamma delta epsilon zeta"
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(0, 30)))
        for _ in range(80)
    ]
    for i in range(0, 80, 9):  # guarantee bench overlap in some docs
        texts[i] = texts[i] + " " + planted
    train = pa.table(
        {
            "doc_id": pa.array(range(80), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    bench = pa.table(
        {
            "doc_id": pa.array(range(10), type=pa.int64()),
            "text": pa.array(
                [
                    " ".join(rng.choice(words) for _ in range(20))
                    + " " + planted
                    for _ in range(10)
                ],
                type=pa.string(),
            ),
        }
    )

    fast = (
        T.decontaminate(rd.from_arrow(train), rd.from_arrow(bench), n=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    semi = (
        T.decontaminate(rd.from_arrow(train), rd.from_arrow(bench), n=5,
                        broadcast_max=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, semi, check_dtype=False)
    assert fast["contaminated"].any()  # the fixture does overlap

    fast_b = (
        T.boilerplate_gate(lambda: rd.from_arrow(train), n=3, min_docs=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    semi_b = (
        T.boilerplate_gate(lambda: rd.from_arrow(train), n=3, min_docs=3,
                           broadcast_max=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast_b, semi_b, check_dtype=False)
    assert (fast_b["n_boiler"] > 0).any()  # repeated grams exist


def test_derive_pair_lanes_scales_with_candidate_volume():
    assert D._derive_pair_lanes(0) == 8          # floor
    assert D._derive_pair_lanes(7_182) == 8      # sf0.1's measured volume
    assert D._derive_pair_lanes(40_000) == 40    # fans past the old const 8
    assert D._derive_pair_lanes(10**9) == D.PAIR_SALT  # capped at the salt


def test_minhash_verified_fans_out_on_candidate_heavy_corpus(ray_session):
    """A near-dup-heavy corpus (every doc in a large similar cluster)
    produces enough LSH candidates that the derived verify parallelism
    exceeds the old constant 8 — and the verified pairs are identical to a
    run pinned at 8 lanes."""
    import ray.data as rd

    base = ("data pipeline dedup shuffle arrow ray batch block " * 6).split()
    texts, ids = [], []
    k = 220
    for i in range(k):
        toks = list(base)
        toks[i % len(toks)] = f"tok{i % 7}"  # 7 rotating variants → clusters
        texts.append(" ".join(toks))
        ids.append(i)
    tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                    "text": pa.array(texts, type=pa.string())})
    stats: dict = {}
    out = (
        D.minhash_verified(rd.from_arrow(tbl), threshold=0.5, stats=stats)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert stats["pair_lanes"] > 8
    pinned = (
        D.minhash_verified(rd.from_arrow(tbl), threshold=0.5, pair_lanes=8)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, pinned)


def test_minhash_verified_reports_within_cluster_pairs(ray_session):
    """A near-identical triple must surface all three pairs, not just the
    two star edges anchored at the min doc_id (round-2 regression)."""
    import ray.data as rd

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    tbl = pa.table(
        {
            "doc_id": [1, 2, 3, 50],
            "text": [base, base + " extra", base + " other", 
                     "completely different words entirely unrelated content "
                     "spanning several tokens for shingling purposes here"],
        }
    )
    out = D.minhash_verified(rd.from_arrow(tbl), threshold=0.5).to_pandas()
    got = {tuple(sorted(p)) for p in zip(out["a"], out["b"])}
    assert {(1, 2), (1, 3), (2, 3)} <= got


def test_heavy_hitters_coarse_sketch_falls_back_to_exact(ray_session):
    """When the requested ppm threshold is below the sketch's summed error
    bound, a true heavy hitter can be absent from EVERY batch summary —
    the op must fall back to an exact full-vocabulary recount."""
    import ray.data as rd
    from resume_ocr_ray.ops import sketch as SK

    # per batch (force 1 row per block): a,b dominate, w is 3rd everywhere
    # -> capacity-2 summaries never contain w though it's a global HH
    rows = [" ".join(["aa"] * 100 + ["bb"] * 100 + ["ww"] * 99) for _ in range(10)]
    ds = rd.from_arrow(pa.table({"text": rows})).repartition(10)
    out = SK.heavy_hitters(ds, ppm=300_000, capacity=2).to_pandas()
    got = dict(zip(out["word"], out["n"]))
    assert got.get("ww") == 990, got  # 990/2990 = 331k ppm >= 300k


def test_bloom_semi_join_empty_priority(ray_session):
    import ray.data as rd
    from resume_ocr_ray.ops import sketch as SK

    li = pa.table(
        {
            "l_orderkey": [1, 2],
            "l_extendedprice": [10.0, 20.0],
            "l_discount": [0.0, 0.1],
            "l_returnflag": ["A", "R"],
        }
    )
    orders = pa.table(
        {"o_orderkey": [1, 2], "o_orderpriority": ["1-URGENT", "1-URGENT"]}
    )
    out = SK.bloom_semi_join_revenue(
        rd.from_arrow(li), rd.from_arrow(orders), priority="5-LOW"
    ).to_pandas()
    assert len(out) == 0


def test_heavy_hitters_uniform_batches_keep_totals(ray_session):
    """A batch whose MG summary clips to EMPTY (uniform counts) must still
    contribute its token total/error to the threshold arithmetic."""
    import ray.data as rd
    from resume_ocr_ray.ops import sketch as SK

    # each row = a batch of all-distinct words -> summary clips empty at
    # capacity 2; 'hh' dominates only ACROSS rows
    rows = [
        f"{c}one {c}two {c}three {c}four hh"
        for c in "abcdefghijklmnopqrst"
    ]
    ds = rd.from_arrow(pa.table({"text": rows})).repartition(20)
    out = SK.heavy_hitters(ds, ppm=150_000, capacity=2).to_pandas()
    got = dict(zip(out["word"], out["n"]))
    assert got.get("hh") == 20, got  # 20/100 tokens = 200k ppm >= 150k


def test_ann_int8_recall(ray_session):
    """int8-quantized brute-force ANN must keep recall@10 >= 0.8 vs the
    exact f64 baseline on the sf0.01 embeddings (symmetric per-row
    quantization loses <1% cosine precision at dim=64; rank inversions
    happen only between near-tied neighbors)."""
    import ray.data as rd

    from resume_ocr_ray.ops import similarity as SIM

    ds = lambda: rd.read_parquet(
        "/root/testdata/sf0.01/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    qv = SIM.query_vector(64, seed=7)
    exact = set(
        SIM.brute_force_topk(ds(), qv, k=10).to_pandas()["vec_id"]
    )
    quant = set(
        SIM.brute_force_topk_int8(ds(), qv, k=10).to_pandas()["vec_id"]
    )
    assert len(exact) == len(quant) == 10
    assert len(exact & quant) >= 8


def test_prefix_contained_run_spanning_blocks(ray_session, tmp_path):
    """Boundary-exchange correctness when one text's duplicate RUN spans
    many sort blocks: 600 copies of a short text plus one extension of it,
    scattered among 1400 unique docs — every copy must be flagged exactly
    once (the spanning run exercises the driver's second-distinct walk and
    the both-paths-flag dedup)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from resume_ocr_ray.ops import dedup as D

    n = 2000
    texts, ids = [], []
    for i in range(n):
        ids.append(i)
        if i % 10 < 3:  # 600 copies of the same short text
            texts.append("common prefix run")
        else:
            texts.append(f"unique text number {i:05d} tail")
    texts[7] = "common prefix run extended beyond the duplicates"
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)

    got = sorted(
        D.prefix_contained(
            rd.read_parquet(p, override_num_blocks=16)
        ).to_pandas()["doc_id"]
    )
    want = sorted(
        r[0]
        for r in duckdb.connect().execute(
            f"SELECT DISTINCT a.doc_id FROM read_parquet('{p}') a "
            f"JOIN read_parquet('{p}') b ON starts_with(b.text, a.text) "
            "AND length(b.text) > length(a.text)"
        ).fetchall()
    )
    assert got == want
    assert len(got) == 600  # every copy of the contained text, exactly once


def test_percent_rank_prefix_related_langs(ray_session, tmp_path):
    """Adversarial block-ordering case from the round-3 review: langs where
    one is a proper PREFIX of another ('en' vs 'en_us'). The block metas
    must be ordered by the raw (lang, n_chars, doc_id) key columns — a
    '|'-joined string key sorts 'en|…' AFTER 'en_us|…' ('_' 0x5F < '|'
    0x7C) and permutes the per-lang rank offsets."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    rng = np.random.default_rng(11)
    n = 4000
    langs = rng.choice(["en", "en_us", "e", "en_usx"], size=n).tolist()
    t = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "lang": pa.array(langs, type=pa.string()),
            "n_chars": pa.array(
                rng.integers(0, 50, size=n), type=pa.int64()
            ),
        }
    )
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)

    got = (
        R.percent_rank_by_lang(rd.read_parquet(p, override_num_blocks=16))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(
            "SELECT doc_id, lang, percent_rank() OVER ("
            f"PARTITION BY lang ORDER BY n_chars, doc_id) AS pr "
            f"FROM read_parquet('{p}') ORDER BY doc_id"
        )
        .fetchdf()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dedup_keep_best_rejects_unpackable_ids(ray_session):
    """The int64 (n_chars, doc_id) argmax pack is only faithful below
    doc_id 2³² / n_chars 2³¹ — out of range must fail LOUDLY, never
    silently corrupt the winner."""
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 1 << 32], type=pa.int64()),
                "text": pa.array(["same", "same"], type=pa.string()),
                "n_chars": pa.array([4, 4], type=pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="int64-packable"):
        R.dedup_keep_best(ds).to_pandas()


def test_reap_stale_staging(tmp_path):
    """Dead-pid staging dirs are reclaimed; the caller's own and live
    foreign pids' dirs are left alone."""
    import subprocess

    from resume_ocr_ray.common import reap_stale_staging

    proc = subprocess.Popen(["sleep", "0"])
    proc.wait()  # guaranteed-dead pid
    prefix = str(tmp_path / "part=3")
    dead = f"{prefix}.__tmp__{proc.pid}"
    own = f"{prefix}.__tmp__{os.getpid()}"
    live = f"{prefix}.__tmp__1"  # pid 1 is always alive
    junk = f"{prefix}.__tmp__notapid"
    for d in (dead, own, live, junk):
        os.makedirs(d)
    reap_stale_staging(prefix)
    assert not os.path.isdir(dead)
    assert os.path.isdir(own) and os.path.isdir(live) and os.path.isdir(junk)


def test_grouped_quantiles_multi_p_matches_single(ray_session):
    """One multi-p pass (winsorize's shape) must emit exactly what two
    single-p passes do."""
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    def docs():
        return rd.read_parquet(
            "/root/testdata/sf0.01/documents.parquet",
            columns=["lang", "n_chars"],
        )

    multi = (
        R.grouped_quantiles(
            docs(), "lang", "n_chars", [(0.05, "lo"), (0.95, "hi")]
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    for p_, col in ((0.05, "lo"), (0.95, "hi")):
        single = (
            R.grouped_quantile(docs(), "lang", "n_chars", p=p_, out_col=col)
            .to_pandas()
            .sort_values("lang")
            .reset_index(drop=True)
        )
        assert (multi[col] == single[col]).all()
        assert (multi["n_rows"] == single["n_rows"]).all()


def test_fuzzy_pairs_nonzero_distances(ray_session, tmp_path):
    """fuzzy_pairs must agree with DuckDB levenshtein on pairs that differ
    (the sf corpora only exercise dist=0 exact-dup pairs)."""
    import duckdb
    import pyarrow.parquet as pq
    import ray.data as rd

    texts = [
        "prefix00 the quick brown fox jumps over the lazy dog",
        "prefix00 the quick brown fax jumps over the lazy dog",   # 1 edit
        "prefix00 the quick brown fox jumped over a lazy dog!!",  # few edits
        "prefix00 " + "z" * 60,                                   # far
        "prefix11 completely different block of text here",
        "prefix11 completely different block of text here",       # exact dup
        "loner000 nothing shares this prefix at all",
        "prefixé0 café au lait — das größte Straßencafé überhaupt",
        "prefixé0 cafe au lait — das grosste Strassencafe uberhaupt",
        None,                                                     # dropped
        None,                                                     # dropped
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)

    got = (
        D.fuzzy_pairs(rd.read_parquet(p, override_num_blocks=4))
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(
            "SELECT a.doc_id AS a, b.doc_id AS b, "
            "levenshtein(substr(a.text,1,40), substr(b.text,1,40)) AS dist "
            f"FROM read_parquet('{p}') a JOIN read_parquet('{p}') b "
            "ON substr(a.text,1,8) = substr(b.text,1,8) "
            "AND a.doc_id < b.doc_id "
            "WHERE levenshtein(substr(a.text,1,40), substr(b.text,1,40)) "
            "<= 8 ORDER BY a, b"
        )
        .fetchdf()
    )
    assert len(want) >= 3 and (want["dist"] > 0).any()  # test has teeth
    # the é pair differs by multi-byte chars: byte distance ≠ codepoint
    # distance, so this pins DuckDB's byte semantics; the NULL rows pin
    # the substr(NULL) join-drop
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ntile_groups_smaller_than_k(ray_session, tmp_path):
    """NTILE edge: a lang with fewer rows than k puts every row in its own
    bucket (n//k == 0 path — guarded against a divide-by-zero)."""
    import duckdb
    import pyarrow.parquet as pq
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    t = pa.table(
        {
            "doc_id": pa.array(range(10), type=pa.int64()),
            "lang": pa.array(
                ["aa"] * 2 + ["bb"] * 3 + ["cc"] * 5, type=pa.string()
            ),
            "n_chars": pa.array(range(10, 0, -1), type=pa.int64()),
        }
    )
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)

    got = (
        R.ntile_by_lang(rd.read_parquet(p, override_num_blocks=3), k=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(
            "SELECT doc_id, lang, ntile(4) OVER (PARTITION BY lang "
            f"ORDER BY n_chars, doc_id) AS tile FROM read_parquet('{p}') "
            "ORDER BY doc_id"
        )
        .fetchdf()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lev_pairs_vectorized_matches_scalar():
    """The pair-vectorized DP (fuzzy_pairs' verify kernel) is bit-identical
    to the scalar reference on random strings, including unicode and
    empty/max-length edges."""
    import random

    rng = random.Random(7)
    alpha = "abcdeé 日x"
    A = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
         for _ in range(400)]
    B = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
         for _ in range(400)]
    A[:3] = ["", "", "a" * 40]
    B[:3] = ["", "abc", ""]
    got = D._lev_pairs(A, B)
    want = np.array([D.levenshtein(a, b) for a, b in zip(A, B)])
    assert (got == want).all()


def test_substring_dups_offset_windows(ray_session, tmp_path):
    """Exact-substring dedup must catch a shared 64-char window at
    DIFFERENT offsets in each doc (not prefix-aligned), skip docs shorter
    than the window, and drop NULL text like the oracle."""
    import duckdb
    import pyarrow.parquet as pq
    import ray.data as rd

    shared = "S" * 10 + "the exact shared boilerplate window content here!" + "E" * 5
    assert len(shared) == 64
    texts = [
        "lead-in text then " + shared + " and a tail",
        shared + " right at the start of this one",
        "completely unrelated document body with no shared window at all"
        + " padding " * 10,
        "short doc",  # < 64 chars: excluded by the length guard
        None,         # dropped
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)

    got = sorted(
        D.substring_dup_docs(
            lambda: rd.read_parquet(p, override_num_blocks=3)
        ).to_pandas()["doc_id"]
    )
    want = sorted(
        r[0]
        for r in duckdb.connect().execute(
            "WITH mx AS (SELECT CAST(max(length(text)) AS BIGINT) AS m "
            f"FROM read_parquet('{p}')), "
            "gs AS (SELECT CAST(unnest(range(1, (SELECT m FROM mx) - 62)) "
            "AS INT) AS g), "
            "wd AS (SELECT DISTINCT d.doc_id, substr(d.text, gs.g, 64) AS "
            f"win FROM read_parquet('{p}') d "
            "JOIN gs ON gs.g <= length(d.text) - 63), "
            "dw AS (SELECT win FROM wd GROUP BY win "
            "HAVING count(DISTINCT doc_id) >= 2) "
            "SELECT DISTINCT doc_id FROM wd JOIN dw USING (win)"
        ).fetchall()
    )
    assert got == want == [0, 1]

    # scale path (broadcast_max=0 forces the hash-keyed semi join): same
    # rows, no driver collect anywhere
    got_semi = sorted(
        D.substring_dup_docs(
            lambda: rd.read_parquet(p, override_num_blocks=3),
            broadcast_max=0,
        ).to_pandas()["doc_id"]
    )
    assert got_semi == want


def test_substring_dups_semi_join_adversarial_all_docs_share(
    ray_session, tmp_path
):
    """Adversarial for the old driver funnel: EVERY doc shares one window
    (templated boilerplate corpus), so the dup-hash set is maximal relative
    to the corpus. Forced onto the semi-join scale path, the op must flag
    every doc without collecting hashes on the driver, and agree with the
    broadcast fast path row-for-row."""
    import random

    import pyarrow.parquet as pq
    import ray.data as rd

    rng = random.Random(11)
    shared = ("COMMON-BOILERPLATE-" * 4)[:64]
    alpha = "abcdefgh ijklmnop"
    texts = []
    n = 60
    for i in range(n):
        pre = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 90)))
        post = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 90)))
        texts.append(pre + shared + post)
    # plus two cross-doc dups NOT via the shared window (their own window)
    texts.append("Z" * 80 + "unique tail one")
    texts.append("Z" * 80 + "different tail!")
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)

    factory = lambda: rd.read_parquet(p, override_num_blocks=4)
    semi = sorted(
        D.substring_dup_docs(factory, broadcast_max=0).to_pandas()["doc_id"]
    )
    bcast = sorted(
        D.substring_dup_docs(factory).to_pandas()["doc_id"]
    )
    assert semi == bcast == list(range(n + 2))


def test_dedup_normalized_collapses_case_and_accents(ray_session, tmp_path):
    """Accent-/case-mangled re-crawls collapse to one canonical winner;
    genuinely different docs survive."""
    import duckdb
    import pyarrow.parquet as pq
    import ray.data as rd

    texts = [
        "Résumé of José — Señor Développeur",
        "resume of jose — senor developpeur",   # same after normalization
        "RÉSUMÉ OF JOSÉ — SEÑOR DÉVELOPPEUR",   # same again
        "a different document entirely",
        None,
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)

    got = (
        D.dedup_exact(
            rd.read_parquet(p, override_num_blocks=2),
            key_fn=D.add_norm_md5, key_col="norm_md5",
        )
        .to_pandas()
        .sort_values("norm_md5")
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(
            "SELECT md5(coalesce(lower(strip_accents(text)), '')) AS "
            "norm_md5, min(doc_id) AS keep_doc_id "
            f"FROM read_parquet('{p}') GROUP BY 1 ORDER BY 1"
        )
        .fetchdf()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) == 3  # mangled trio collapsed; distinct + null survive


def test_cogroup_agg_matches_pandas_groupby(ray_session):
    """cogroup_agg is exactly a distributed pandas groupby-agg, including
    null keys (dropna=False) and multi-column keys."""
    import ray.data as rd

    from resume_ocr_ray.common import cogroup_agg

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame(
        {
            "k": [None if i % 97 == 0 else f"key{i % 311}"
                  for i in range(n)],
            "k2": rng.integers(0, 3, n),
            "v": rng.integers(-1000, 1000, n),
        }
    )
    ds = rd.from_pandas(df).repartition(7)

    got = (
        cogroup_agg(ds, ["k", "k2"],
                    {"mn": ("v", "min"), "sm": ("v", "sum")})
        .to_pandas()
        .sort_values(["k", "k2"], na_position="last")
        .reset_index(drop=True)
    )
    want = (
        df.groupby(["k", "k2"], dropna=False)
        .agg(mn=("v", "min"), sm=("v", "sum"))
        .reset_index()
        .sort_values(["k", "k2"], na_position="last")
        .reset_index(drop=True)
    )
    # unify null-likes (one side carries None, the other NaN) — pandas
    # equality-testing is deprecating None==NaN, so normalize explicitly
    for frame in (got, want):
        frame["k"] = frame["k"].map(lambda x: None if pd.isna(x) else x)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_funnel_strict_order_and_ties(ray_session, tmp_path):
    """Funnel membership requires STRICTLY increasing step times: reversed
    orders and equal-timestamp steps must not qualify; a later re-view
    must not rescue a user whose only click precedes every view... unless
    a later click exists (greedy earliest-completion semantics)."""
    import duckdb
    import pyarrow.parquet as pq
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    T = lambda m: np.datetime64(f"2026-01-01T00:{m:02d}:00", "us")
    rows = [
        # user 1: clean v->c->p  (qualifies)
        (1, T(1), "view"), (1, T(2), "click"), (1, T(3), "purchase"),
        # user 2: reversed  (no)
        (2, T(3), "view"), (2, T(2), "click"), (2, T(1), "purchase"),
        # user 3: tie between view and click  (no — strict >)
        (3, T(1), "view"), (3, T(1), "click"), (3, T(2), "purchase"),
        # user 4: click before first view, second click after  (qualifies)
        (4, T(1), "click"), (4, T(2), "view"), (4, T(3), "click"),
        (4, T(4), "purchase"),
        # user 5: no purchase  (no)
        (5, T(1), "view"), (5, T(2), "click"),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           type=pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows],
                                   type=pa.string()),
        }
    )
    p = str(tmp_path / "events.parquet")
    pq.write_table(t, p)

    got = sorted(
        R.funnel_users(rd.read_parquet(p, override_num_blocks=3))
        .to_pandas()["user_id"]
    )
    want = sorted(
        r[0]
        for r in duckdb.connect().execute(
            "WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM "
            f"read_parquet('{p}') WHERE event_type='view' GROUP BY 1), "
            "s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM "
            f"read_parquet('{p}') e JOIN s1 USING (user_id) "
            "WHERE e.event_type='click' AND e.ts > s1.t1 GROUP BY 1), "
            "s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM "
            f"read_parquet('{p}') e JOIN s2 USING (user_id) "
            "WHERE e.event_type='purchase' AND e.ts > s2.t2 GROUP BY 1) "
            "SELECT user_id FROM s3"
        ).fetchall()
    )
    assert got == want == [1, 4]


def test_fuzzy_pairs_hot_prefix_star_cap(ray_session, tmp_path):
    """A prefix block past max_block falls back to STAR comparison
    against the block's min doc_id — bounding the quadratic blowup: the
    output must be exactly the (anchor, other) pairs, not all pairs."""
    import pyarrow.parquet as pq
    import ray.data as rd

    n = 40
    texts = [f"hotpfx00 shared head {i:04d}" for i in range(n)]
    t = pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)

    got = (
        D.fuzzy_pairs(rd.read_parquet(p, override_num_blocks=4),
                      max_dist=40, max_block=10)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # star fallback: every pair anchors at the min doc_id of the block
    assert (got["a"] == 0).all()
    assert sorted(got["b"]) == list(range(1, n))


def test_topk_exact_equals_sort_limit(ray_session):
    """topk_exact returns exactly sort().limit(k) rows for a tie-free
    order, across block layouts."""
    import ray.data as rd

    from resume_ocr_ray.common import topk_exact

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "v": rng.integers(0, 100, 3000),
            "id": np.arange(3000, dtype=np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(11)
    got = (
        topk_exact(ds, [("v", "descending"), ("id", "ascending")], 25)
        .to_pandas()
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["v", "id"], ascending=[False, True])
        .head(25)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_resize_images_bounds_page_bytes(ray_session):
    """Resize plumbing: page count and order preserved, every output page
    within the byte budget, output re-decodes as the same media kind, and
    the transform is deterministic."""
    import ray.data as rd

    from resume_ocr_ray.core import media as M2

    docs, media = corpus.generate_corpus(30, seed=21)
    ds = rd.from_arrow(media)
    out = (
        MM.resize_images(ds, max_bytes_per_page=64)
        .to_pandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    src = {
        r: p
        for r, p in zip(
            media.column("media_ref").to_pylist(),
            media.column("payload").to_pylist(),
        )
    }
    assert len(out) > 0
    for _, row in out.iterrows():
        before = M2.decode_media(src[row["media_ref"]])
        after = M2.decode_media(row["payload"])
        assert after.media_kind == before.media_kind
        assert len(after.pages) == len(before.pages) == row["n_pages"]
        assert all(len(p) <= 64 for p in after.pages)
        assert row["bytes_out"] <= row["bytes_in"]
    out2 = (
        MM.resize_images(rd.from_arrow(media), max_bytes_per_page=64)
        .to_pandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    assert (out2["payload"] == out["payload"]).all()


def test_build_postings_sorted_lists_and_df_bounds(ray_session):
    """Posting lists are ascending, df is the distinct-doc count (repeats
    within a doc count once), and both df bounds prune."""
    import ray.data as rd
    from resume_ocr_ray.ops import text as T

    docs = pa.table(
        {
            "doc_id": pa.array([3, 1, 2, 4], type=pa.int64()),
            "text": [
                "alpha beta alpha",   # alpha repeats within doc 3
                "alpha gamma",
                "alpha beta",
                None,                 # NULL contributes nothing
            ],
        }
    )
    out = (
        T.build_postings(rd.from_arrow(docs), min_df=2)
        .to_pandas().set_index("term").sort_index()
    )
    assert list(out.index) == ["alpha", "beta"]  # gamma df=1 pruned
    assert out.loc["alpha", "df"] == 3
    assert out.loc["alpha", "postings"] == "1,2,3"  # ascending, distinct
    assert out.loc["beta", "postings"] == "2,3"
    capped = (
        T.build_postings(rd.from_arrow(docs), min_df=2, max_df=2)
        .to_pandas()
    )
    assert list(capped["term"]) == ["beta"]  # alpha df=3 > max_df


def test_event_cooccurrence_counts_users_once(ray_session):
    import ray.data as rd
    from resume_ocr_ray.ops import relational as R

    ev = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
            "event_type": ["view", "click", "view", "view", "click", "view"],
        }
    )
    out = (
        R.event_type_cooccurrence(rd.from_arrow(ev))
        .to_pandas().sort_values(["type_a", "type_b"]).reset_index(drop=True)
    )
    # users 1 and 2 did both view+click; user 3 only view
    assert len(out) == 1
    assert tuple(out.loc[0, ["type_a", "type_b"]]) == ("click", "view")
    assert out.loc[0, "n_users"] == 2


def test_tfidf_topk_joined_path_matches_broadcast(ray_session):
    """broadcast_max=0 forces the term-keyed cogroup scale path: identical
    rows to the broadcast fast path (and hence to the DuckDB oracle)."""
    import ray.data as rd
    from resume_ocr_ray.ops import text as T

    import pyarrow.parquet as pq
    t = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                      columns=["doc_id", "text"])
    factory = lambda: rd.from_arrow(t)
    fast = (
        T.tfidf_topk(factory, k=3).to_pandas()
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    joined = (
        T.tfidf_topk(factory, k=3, broadcast_max=0).to_pandas()
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        fast, joined[fast.columns], check_dtype=False
    )


def test_interval_overlap_first_bucket_dedup(ray_session):
    """Intervals spanning SEVERAL time buckets must count each overlapping
    pair exactly once (first-bucket ownership), including pairs whose
    overlap region spans bucket boundaries."""
    import ray.data as rd
    from resume_ocr_ray.ops import relational as R

    H = 3_600_000_000  # 1h in us
    # user 1: 00:00–23:00 (spans all four 6h buckets)
    # user 2: 05:00–07:00 (buckets 0-1; overlaps 1)
    # user 3: 22:00–23:30 (bucket 3; overlaps 1)
    # user 4: next day 01:00–02:00 (no same-day overlap)
    rows = [
        (1, 0), (1, 23 * H),
        (2, 5 * H), (2, 7 * H),
        (3, 22 * H), (3, 23 * H + H // 2),
        (4, 25 * H), (4, 26 * H),
    ]
    ev = pa.table(
        {
            "user_id": pa.array([u for u, _ in rows], type=pa.int64()),
            "ts": pa.array([t for _, t in rows], type=pa.timestamp("us")),
        }
    )
    out = (
        R.interval_overlap_counts(rd.from_arrow(ev))
        .to_pandas().set_index("user_id").sort_index()
    )
    assert out.loc[1, "n_overlap"] == 2  # users 2 and 3, each ONCE
    assert out.loc[2, "n_overlap"] == 1
    assert out.loc[3, "n_overlap"] == 1
    assert 4 not in out.index  # zero-overlap intervals are not emitted


def test_group_corr_bigint_split_survives_int64_overflow(ray_session):
    """group_corr ships Σy² as (hi, lo) int64 pairs because the plain sum
    outgrows int64 at scale. Feed a corpus whose TOTAL Σy² ≈ 2.6e19 > 2^63
    (per-batch partials stay legal via CORR_BATCH) and check the
    reassembled correlation against numpy-on-bigints computed directly."""
    import math

    import ray.data as rd

    from resume_ocr_ray.ops.relational import group_corr

    rng = np.random.default_rng(11)
    n = 220_000
    x = rng.integers(1, 51, n)
    # y in cents near the real price ceiling (~1.1e7): y² ≈ 1.2e14 each,
    # 2.2e5 rows → Σy² ≈ 2.6e19, past int64
    y_cents = rng.integers(10_800_000, 11_000_000, n)
    df = pd.DataFrame(
        {
            "l_returnflag": np.where(x % 2 == 0, "A", "R"),
            "l_quantity": x.astype(np.float64),
            "l_extendedprice": y_cents.astype(np.float64) / 100.0,
        }
    )
    got = (
        group_corr(rd.from_pandas(df).repartition(9))
        .to_pandas()
        .set_index("l_returnflag")
        .sort_index()
    )

    for flag in ("A", "R"):
        m = df["l_returnflag"] == flag
        xs = [int(v) for v in x[m.to_numpy()]]
        ys = [int(v) for v in y_cents[m.to_numpy()]]
        nn = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sx2 = sum(a * a for a in xs)
        sy2 = sum(b * b for b in ys)
        assert nn * sy2 - sy * sy > 2**63  # the overflow regime is real
        want = float(nn * sxy - sx * sy) / (
            math.sqrt(float(nn * sx2 - sx * sx))
            * math.sqrt(float(nn * sy2 - sy * sy))
        )
        assert got.loc[flag, "corr_qty_price"] == want  # bit-for-bit
        assert got.loc[flag, "n_rows"] == nn


def test_full_outer_join_null_sides_are_arrow_nulls(ray_session):
    """Both exclusive regions must surface as Arrow NULLs (SQL semantics),
    never NaN — the driver hash-compares against DuckDB's FULL JOIN."""
    import pyarrow as pa
    import ray.data as rd

    from resume_ocr_ray.ops.relational import full_outer_join_customers_orders

    cust = pd.DataFrame(
        {"c_custkey": [1, 2, 3], "c_acctbal": [9000.0, 100.0, 7000.0]}
    )
    orders = pd.DataFrame(
        {
            "o_custkey": [2, 2, 4],
            "o_orderstatus": ["F", "F", "F"],
        }
    )
    out = full_outer_join_customers_orders(
        rd.from_pandas(cust), rd.from_pandas(orders)
    )
    tbl = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")],
        promote_options="default",
    )
    d = {r["custkey"]: r for r in tbl.to_pylist()}
    # cust 2 filtered out by acctbal (100 < 5000) but has F orders →
    # right-only; cust 1/3 pass the filter but have no F orders → left-only
    assert d[1]["n_orders"] is None and d[1]["acctbal"] == 9000.0
    assert d[3]["n_orders"] is None
    assert d[2]["acctbal"] is None and d[2]["n_orders"] == 2
    assert d[4]["acctbal"] is None and d[4]["n_orders"] == 1
    # arrow-level: the null count is real (not NaN smuggled as a double)
    assert tbl.column("acctbal").null_count == 2
    assert tbl.column("n_orders").null_count == 2


def test_pareto_skyline_matches_bruteforce_and_diagonal(ray_session):
    """Frontier-of-frontiers must be lossless under ANY partitioning:
    compare against O(n²) brute-force domination on a seeded corpus split
    into many tiny blocks, plus the adversarial all-diagonal input where
    EVERY point is on the frontier (nothing may be pruned)."""
    import ray.data as rd

    from resume_ocr_ray.ops.relational import pareto_lineitems

    rng = np.random.default_rng(7)
    n = 500
    q = rng.integers(1, 40, n).astype(float)
    cents = rng.integers(100, 5_000_00, n)
    # inject identical duplicate points: neither dominates the other
    q[10], cents[10] = q[11], cents[11]
    df = pd.DataFrame(
        {
            "l_orderkey": np.arange(n, dtype=np.int64),
            "l_linenumber": np.ones(n, dtype=np.int32),
            "l_quantity": q,
            "l_extendedprice": cents / 100.0,
        }
    )
    x = np.rint(q).astype(np.int64)
    y = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    dominated = np.zeros(n, dtype=bool)
    for i in range(n):
        dominated[i] = bool(
            np.any(
                (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
            )
        )
    expect = set(df.loc[~dominated, "l_orderkey"])

    out = pareto_lineitems(rd.from_pandas(df).repartition(37)).to_pandas()
    assert set(out["l_orderkey"]) == expect
    assert len(out) == len(expect)  # duplicate frontier points both kept

    # all-diagonal adversarial input: x + y constant → empty domination
    m = 64
    diag = pd.DataFrame(
        {
            "l_orderkey": np.arange(m, dtype=np.int64),
            "l_linenumber": np.ones(m, dtype=np.int32),
            "l_quantity": np.arange(1, m + 1, dtype=float),
            "l_extendedprice": np.arange(m, 0, -1, dtype=float),
        }
    )
    out2 = pareto_lineitems(rd.from_pandas(diag).repartition(9)).to_pandas()
    assert len(out2) == m


def test_length_outliers_integer_boundary_exact(ray_session):
    """The integer threshold form must equal the quadratic test exactly,
    including at the boundary: a value at EXACTLY kσ is NOT an outlier
    (strict >), one char past it is. Corpus: 8 docs at 100, so σ of the
    9-doc group is determined by the planted 9th doc alone."""
    import ray.data as rd

    from resume_ocr_ray.ops.relational import length_outliers

    # group "a": lengths {100 ×8, 1000} — mean/var known; the planted
    # 1000 is far above 1σ, every 100 is below it
    df = pd.DataFrame(
        {
            "doc_id": np.arange(9, dtype=np.int64),
            "lang": ["a"] * 9,
            "n_chars": np.array([100] * 8 + [1000], dtype=np.int64),
        }
    )
    out = length_outliers(
        lambda: rd.from_pandas(df).repartition(3), sigmas=1
    ).to_pandas()
    n, sx = 9, 8 * 100 + 1000
    sx2 = 8 * 100 * 100 + 1000 * 1000
    expect = {
        int(d) for d, x in zip(df["doc_id"], df["n_chars"])
        if (n * int(x) - sx) ** 2 > (n * sx2 - sx * sx)
    }
    assert set(out["doc_id"]) == expect and len(expect) > 0

    # boundary: symmetric ±d around the mean → σ² = d², so EVERY value
    # sits at exactly 1σ → strict > keeps nothing
    df2 = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "lang": ["b"] * 4,
            "n_chars": np.array([90, 110, 90, 110], dtype=np.int64),
        }
    )
    out2 = length_outliers(
        lambda: rd.from_pandas(df2).repartition(2), sigmas=1
    ).to_pandas()
    assert len(out2) == 0


def test_nation_revenue_inner_join_drops_dangling(ray_session):
    """Dangling keys at EVERY hop must drop (inner semantics): a lineitem
    with no order, an order with no customer, a customer with an unknown
    nation would KeyError loudly rather than mislabel. Exact integer
    revenue: rev_e4 = cents × percent."""
    import ray.data as rd

    from resume_ocr_ray.ops.relational import nation_revenue

    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 99],  # 99 dangles (no order)
            "l_extendedprice": [100.00, 200.00, 50.00, 7.00],
            "l_discount": [0.10, 0.00, 0.04, 0.00],
        }
    )
    orders = pd.DataFrame(
        {"o_orderkey": [1, 2, 3], "o_custkey": [10, 20, 77]}
    )  # order 3 has no lineitems; cust 77 doesn't exist
    cust = pd.DataFrame(
        {"c_custkey": [10, 20, 30], "c_nationkey": [0, 1, 1]}
    )  # cust 30 has no orders
    nation = pd.DataFrame(
        {"n_nationkey": [0, 1], "n_name": ["ALPHA", "BETA"]}
    )
    out = nation_revenue(
        rd.from_pandas(li).repartition(2),
        rd.from_pandas(orders),
        rd.from_pandas(cust),
        rd.from_pandas(nation),
        parts=4,
    ).to_pandas().set_index("nation")
    # order 1 → cust 10 → ALPHA: 10000*90 + 20000*100 = 2_900_000
    # order 2 → cust 20 → BETA:  5000*96 = 480_000
    assert out.loc["ALPHA", "revenue_e4"] == 2_900_000
    assert out.loc["ALPHA", "n_items"] == 2
    assert out.loc["BETA", "revenue_e4"] == 480_000
    assert out.loc["BETA", "n_items"] == 1
    assert len(out) == 2

    # the size-gated zero-cogroup broadcast plan (order_map + cust_map)
    # must emit EXACTLY the cogroup chain's rows, dangling keys included
    fast = nation_revenue(
        rd.from_pandas(li).repartition(2),
        rd.from_pandas(orders),
        rd.from_pandas(cust),
        rd.from_pandas(nation),
        parts=4,
        order_map=orders,
        cust_map=cust,
    ).to_pandas().set_index("nation")
    pd.testing.assert_frame_equal(
        out.sort_index(), fast.sort_index()
    )


def test_event_ops_partitioning_invariant(ray_session):
    """The distributive event ops must be invariant to block boundaries:
    random events, three different repartitions, identical results — the
    property that makes per-batch candidate pruning lossless."""
    import ray.data as rd

    from resume_ocr_ray.ops.relational import (
        argmax_event, event_transitions, first_last_value,
    )

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 25, n),
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": rng.uniform(0, 100, n).round(2),
        }
    )
    # unique (user, ts): permute a range so order is scrambled but unique
    df["ts"] = rng.permutation(n).astype(np.int64)
    # duplicate max values inside one user to exercise the id tiebreak
    df.loc[df.index[:2], ["user_id", "value"]] = [[7, 99.5], [7, 99.5]]

    def run(op, cols, parts):
        ds = rd.from_pandas(df[cols]).repartition(parts)
        out = op(ds).to_pandas()
        return out.sort_values(list(out.columns)).reset_index(drop=True)

    for op, cols in (
        (argmax_event, ["user_id", "event_id", "value"]),
        (event_transitions, ["user_id", "ts", "event_type"]),
        (first_last_value, ["user_id", "ts", "value"]),
    ):
        a = run(op, cols, 1)
        b = run(op, cols, 7)
        c = run(op, cols, 31)
        pd.testing.assert_frame_equal(a, b)
        pd.testing.assert_frame_equal(a, c)


def _li_tbl(rows):
    """lineitem-shaped table: (orderkey, suppkey) pairs, one shipdate."""
    import datetime as dt

    ok, sk = zip(*rows)
    return pa.table(
        {
            "l_orderkey": pa.array(ok, pa.int64()),
            "l_suppkey": pa.array(sk, pa.int64()),
            "l_shipdate": pa.array(
                [dt.datetime(1995, 2, 1)] * len(ok), pa.timestamp("us")
            ),
        }
    )


def test_triangle_counts_clique_and_hub(ray_session):
    """A 4-clique (order 1 ships suppliers 1-4) has C(3,2)=3 triangles per
    node; a star hub (order 2: supplier 10 with 20,21 — no 20-21 edge
    elsewhere... but one order makes a clique, so use PAIRWISE orders) has
    none. Edges are built per-order, so the hub is built from 2-supplier
    orders sharing supplier 10 only."""
    import datetime as dt

    from resume_ocr_ray.ops import graph as G

    rows = [(1, 1), (1, 2), (1, 3), (1, 4)]          # 4-clique
    rows += [(2, 10), (2, 20), (3, 10), (3, 21)]      # star: 10-20, 10-21
    rows += [(1, 2), (2, 10)]                          # duplicate lineitems
    import ray.data as rd

    ds = rd.from_arrow(_li_tbl(rows))
    lo, hi = dt.datetime(1995, 1, 1), dt.datetime(1995, 7, 1)

    tri = G.triangle_counts(ds, lo, hi).to_pandas()
    assert dict(zip(tri["node"], tri["n_triangles"])) == {
        1: 3, 2: 3, 3: 3, 4: 3
    }

    deg = G.cosupply_degrees(ds, lo, hi).to_pandas()
    assert dict(zip(deg["node"], deg["degree"])) == {
        1: 3, 2: 3, 3: 3, 4: 3, 10: 2, 20: 1, 21: 1
    }


def test_triangle_counts_window_excludes_out_of_range(ray_session):
    """Lineitems outside [lo, hi) must not create edges: the same clique
    shipped in 1996 contributes nothing."""
    import datetime as dt

    from resume_ocr_ray.ops import graph as G

    tbl = _li_tbl([(1, 1), (1, 2), (1, 3)])
    late = tbl.set_column(
        2,
        "l_shipdate",
        pa.array([dt.datetime(1996, 2, 1)] * 3, pa.timestamp("us")),
    )
    import ray.data as rd

    ds = rd.from_arrow(pa.concat_tables([tbl, late]))
    lo, hi = dt.datetime(1995, 1, 1), dt.datetime(1995, 7, 1)
    tri = G.triangle_counts(ds, lo, hi).to_pandas()
    # one in-window triangle among 1,2,3 — the 1996 copy adds no edges
    assert dict(zip(tri["node"], tri["n_triangles"])) == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_match_adjacency_cube(ray_session):
    """Property: per-node triangle counts == diag(A^3)/2 on a seeded
    random graph with a deliberate hub (degree-skew exercises the
    orientation bound). Each order ships exactly 2 suppliers → the edge
    set IS the drawn graph."""
    import datetime as dt

    import ray.data as rd

    from resume_ocr_ray.ops import graph as G

    rng = np.random.default_rng(7)
    n = 30
    a = np.zeros((n, n), dtype=np.int64)
    edges = []
    for i in range(n):
        for j in range(i + 1, n):
            # hub: node 0 connects to everything; others sparse
            if i == 0 or rng.random() < 0.18:
                a[i, j] = a[j, i] = 1
                edges.append((i + 1, j + 1))  # suppkeys are 1-based
    rows = []
    for k, (s1, s2) in enumerate(edges):
        rows += [(k, s1), (k, s2)]
    ds = rd.from_arrow(_li_tbl(rows))
    tri = G.triangle_counts(
        ds, dt.datetime(1995, 1, 1), dt.datetime(1995, 7, 1)
    ).to_pandas()
    got = dict(zip(tri["node"], tri["n_triangles"]))
    expect = np.diag(np.linalg.matrix_power(a, 3)) // 2
    want = {i + 1: int(c) for i, c in enumerate(expect) if c}
    assert got == want


def _events_tbl(rows):
    """events-shaped table from (event_id, user_id, ts_us, value)."""
    eid, uid, ts, val = zip(*rows)
    return pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(list(ts), pa.timestamp("us")),
            "value": pa.array(val, pa.float64()),
        }
    )


def test_gap_fill_daily_zero_fills_interior_gaps(ray_session):
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    DAY = 86_400_000_000
    # user 1 active day 0 (twice) and day 3 → days 1,2 zero-filled;
    # user 2 active one day only → a single row, no padding
    rows = [
        (1, 1, 0, 0.0), (2, 1, 100, 0.0), (3, 1, 3 * DAY, 0.0),
        (4, 2, 5 * DAY, 0.0),
    ]
    out = (
        R.gap_fill_daily(rd.from_arrow(_events_tbl(rows)))
        .to_pandas()
        .sort_values(["user_id", "day"])
    )
    got = list(map(tuple, out.to_numpy()))
    assert got == [(1, 0, 2), (1, 1, 0), (1, 2, 0), (1, 3, 1), (2, 5, 1)]


def test_kendall_concordance_ties_count_neither(ray_session):
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    # user 1 values over time: 1.0, 3.0, 2.0, 2.0
    # pairs: (1,3)C (1,2)C (1,2)C (3,2)D (3,2)D (2,2)tie → C=3 D=2
    rows = [
        (1, 1, 0, 1.0), (2, 1, 10, 3.0), (3, 1, 20, 2.0), (4, 1, 30, 2.0),
        (5, 9, 0, 7.0),  # single event → no pair row for user 9
    ]
    out = R.kendall_concordance(
        rd.from_arrow(_events_tbl(rows))
    ).to_pandas()
    assert dict(
        zip(out["user_id"], zip(out["n_conc"], out["n_disc"]))
    ) == {1: (3, 2)}


def test_common_neighbor_pairs_anti_joins_existing_edges(ray_session):
    """On the clique+star fixture: every clique pair is adjacent (→
    excluded despite 2 common neighbors); the star leaves 20, 21 share
    hub 10 and are NOT adjacent → the only emitted pair."""
    import datetime as dt

    import ray.data as rd

    from resume_ocr_ray.ops import graph as G

    rows = [(1, 1), (1, 2), (1, 3), (1, 4),
            (2, 10), (2, 20), (3, 10), (3, 21)]
    out = G.common_neighbor_pairs(
        rd.from_arrow(_li_tbl(rows)),
        dt.datetime(1995, 1, 1), dt.datetime(1995, 7, 1),
    ).to_pandas()
    got = {(r.a, r.b): r.n_common for r in out.itertuples()}
    assert got == {(20, 21): 1}


def test_profile_columns_nulls_and_distinct_exact(ray_session):
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    tbl = pa.table(
        {
            "k": pa.array([1, 2, 2, None, None, 3], pa.int64()),
            "s": pa.array(["a", "a", "", None, "b", "b"], pa.string()),
        }
    )
    out = R.profile_columns(rd.from_arrow(tbl), cols=["k", "s"]).to_pandas()
    got = {
        r.col: (r.n_nulls, r.n_distinct) for r in out.itertuples()
    }
    # "" is a VALUE, not a null; distinct ignores nulls (SQL semantics)
    assert got == {"k": (2, 3), "s": (1, 3)}


def test_triangle_counts_hot_order_clique(ray_session):
    """Adversarial skew: ONE order shipping 100 suppliers lands a complete
    100-clique's pair generation in a single order-hash cogroup partition
    (the documented bounded-fanout assumption inverted). The op must stay
    correct: every node sits in C(99,2) triangles."""
    import datetime as dt

    import ray.data as rd

    from resume_ocr_ray.ops import graph as G

    rows = [(1, s) for s in range(1, 101)]
    tri = G.triangle_counts(
        rd.from_arrow(_li_tbl(rows)),
        dt.datetime(1995, 1, 1), dt.datetime(1995, 7, 1),
    ).to_pandas()
    assert len(tri) == 100
    assert (tri["n_triangles"] == 99 * 98 // 2).all()


def test_neardup_families_transitive_chain_keep_longest(ray_session):
    """A≈B and B≈C but A̸≈C (Jaccard is not transitive): all three must
    still land in ONE family via the component closure, keeping the
    longest text. Construction: B is a 100-char base; A and C append
    distinct tails (single-tail Jaccard ≈ 0.85 ≥ 0.8, tail-vs-tail
    ≈ 0.74 < 0.8). doc 9 is unrelated → no family row."""
    import random

    import ray.data as rd

    from resume_ocr_ray.ops import dedup as D

    rng = random.Random(3)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    base = "".join(rng.choice(alpha) for _ in range(100))
    t1 = "".join(rng.choice(alpha) for _ in range(16))
    t2 = "".join(rng.choice(alpha) for _ in range(15))
    tbl = pa.table(
        {
            "doc_id": pa.array([5, 2, 7, 9], pa.int64()),
            "text": pa.array(
                [base + t1, base, base + t2, "zz" + base[2:]],
                pa.string(),
            ),
        }
    )
    out = D.neardup_families(lambda: rd.from_arrow(tbl)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["family"], r["keep_doc_id"], r["n_docs"]) == (2, 5, 3)

    # broadcast_budget_rows=0 forces the distributed tagged-union cogroup
    # path; it must emit EXACTLY the broadcast fast path's rows
    slow = D.neardup_families(
        lambda: rd.from_arrow(tbl), broadcast_budget_rows=0
    ).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("family").reset_index(drop=True),
        slow.sort_values("family").reset_index(drop=True),
    )


def test_pagerank_star_deterministic_and_mass_bounded(ray_session):
    """Star graph (hub 10 pairwise with 8 leaves): the hub must outrank
    every leaf; two runs are BIT-identical (integer fixed-point — the
    property float PageRank can't give); total mass stays within floor
    loss of 1.0."""
    import datetime as dt

    import ray.data as rd

    from resume_ocr_ray.ops import graph as G

    rows = []
    for i, leaf in enumerate(range(20, 28)):
        rows += [(i, 10), (i, leaf)]
    lo, hi = dt.datetime(1995, 1, 1), dt.datetime(1995, 7, 1)
    a = G.pagerank(rd.from_arrow(_li_tbl(rows)), lo, hi).to_pandas()
    b = G.pagerank(rd.from_arrow(_li_tbl(rows)), lo, hi).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    ranks = dict(zip(a["node"], a["rank_e12"]))
    assert all(ranks[10] > ranks[leaf] for leaf in range(20, 28))
    total = int(a["rank_e12"].sum())
    assert 0.99 * 10**12 < total <= 10**12


def test_kmv_overlap_bounds_vs_exact(ray_session):
    """Planted cohorts: A = users 0..4999, B = users 3000..8999 →
    |A∩B|=2000, |A∪B|=9000. KMV estimates at k=1024 must land within
    ±15% on the set sizes and union, ±25% on the (smaller, doubly-
    sampled) intersection."""
    import ray.data as rd

    from resume_ocr_ray.ops import sketch as SK

    uid = np.concatenate([np.arange(5000), np.arange(3000, 9000)])
    et = np.array(["purchase"] * 5000 + ["signup"] * 6000, dtype=object)
    tbl = pa.table(
        {
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et, pa.string()),
        }
    )
    out = SK.kmv_overlap(
        rd.from_arrow(tbl), "purchase", "signup", k=1024
    ).to_pandas().iloc[0]
    assert abs(out["est_a"] - 5000) <= 750
    assert abs(out["est_b"] - 6000) <= 900
    assert abs(out["est_union"] - 9000) <= 1350
    assert abs(out["est_intersect"] - 2000) <= 500


def test_kmv_overlap_exact_below_k(ray_session):
    """Sketches that never fill ARE the exact distinct sets — estimates
    must be exact for tiny cohorts."""
    import ray.data as rd

    from resume_ocr_ray.ops import sketch as SK

    tbl = pa.table(
        {
            "user_id": pa.array([1, 2, 3, 2, 3, 4], pa.int64()),
            "event_type": pa.array(
                ["purchase"] * 3 + ["signup"] * 3, pa.string()
            ),
        }
    )
    out = SK.kmv_overlap(
        rd.from_arrow(tbl), "purchase", "signup", k=1024
    ).to_pandas().iloc[0]
    assert (out["est_a"], out["est_b"], out["est_union"],
            out["est_intersect"]) == (3, 3, 4, 2)


def test_gap_fill_and_kendall_match_bruteforce_random(ray_session):
    """Seeded random corpora: gap_fill == pandas densify brute force;
    kendall == O(n²) pair loop — over 3 seeds with ties, duplicates and
    single-event users present."""
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    DAY = 86_400_000_000
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = 200
        uid = rng.integers(1, 12, n)
        ts = rng.integers(0, 20 * DAY, n)
        ts[rng.random(n) < 0.2] = 5 * DAY  # planted ts ties
        val = np.round(rng.normal(size=n), 1)  # planted value ties
        tbl = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "value": pa.array(val, pa.float64()),
            }
        )
        df = tbl.to_pandas()
        df["tsus"] = df["ts"].astype("int64")

        got = (
            R.gap_fill_daily(rd.from_arrow(tbl)).to_pandas()
            .sort_values(["user_id", "day"]).reset_index(drop=True)
        )
        rows = []
        for u, sub in df.groupby("user_id"):
            days = sub["tsus"] // DAY
            cnt = days.value_counts()
            for d in range(int(days.min()), int(days.max()) + 1):
                rows.append((u, d, int(cnt.get(d, 0))))
        want = pd.DataFrame(rows, columns=["user_id", "day", "n_events"])
        pd.testing.assert_frame_equal(
            got, want.sort_values(["user_id", "day"]).reset_index(drop=True)
        )

        got_k = (
            R.kendall_concordance(rd.from_arrow(tbl)).to_pandas()
            .sort_values("user_id").reset_index(drop=True)
        )
        krows = []
        for u, sub in df.groupby("user_id"):
            s = sub.sort_values(["tsus", "event_id"]).reset_index(drop=True)
            c = d_ = 0
            for i in range(len(s)):
                for j in range(i + 1, len(s)):
                    if s["value"][j] > s["value"][i]:
                        c += 1
                    elif s["value"][j] < s["value"][i]:
                        d_ += 1
            if len(s) > 1:
                krows.append((u, c, d_))
        want_k = pd.DataFrame(
            krows, columns=["user_id", "n_conc", "n_disc"]
        )
        pd.testing.assert_frame_equal(got_k, want_k)


def test_kendall_heavy_user_chunked_path_matches_bruteforce(ray_session):
    """A 3,000-event power user crosses the heavy_n=512 threshold into
    the chunked incremental path; a 50-event user stays on the
    self-merge. Both must match the O(n²) numpy triangle brute force
    (value ties planted via rounding)."""
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    rng = np.random.default_rng(11)
    sizes = {1: 3000, 2: 50}
    eid, uid, ts, val = [], [], [], []
    base = 0
    for u, n in sizes.items():
        eid += list(range(base, base + n))
        uid += [u] * n
        ts += list(rng.permutation(n) * 1000)
        val += list(np.round(rng.normal(size=n), 1))
        base += n
    tbl = pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(np.array(ts, np.int64), pa.timestamp("us")),
            "value": pa.array(val, pa.float64()),
        }
    )
    got = R.kendall_concordance(rd.from_arrow(tbl)).to_pandas()
    got = dict(zip(got["user_id"], zip(got["n_conc"], got["n_disc"])))
    df = tbl.to_pandas()
    df["tsus"] = df["ts"].astype("int64")
    for u, n in sizes.items():
        s = df[df["user_id"] == u].sort_values(["tsus", "event_id"])
        v = s["value"].to_numpy()
        later = np.triu(np.ones((n, n), dtype=bool), k=1)
        c = int(np.count_nonzero((v[None, :] > v[:, None]) & later))
        d = int(np.count_nonzero((v[None, :] < v[:, None]) & later))
        assert got[u] == (c, d), u


def test_graph_ops_empty_window_typed_zero_rows(ray_session):
    """An out-of-window corpus yields an EMPTY graph: every graph op must
    return 0 rows WITH its declared Dataset schema (Ray's schema-less-
    empty pitfall), not crash on the missing 'node' column. (to_pandas()
    on ANY 0-row Dataset drops columns — Ray behavior, so the assertion
    reads ds.schema(), the surface downstream Ray stages consume.)"""
    import datetime as dt

    import ray.data as rd

    from resume_ocr_ray.ops import graph as G

    tbl = _li_tbl([(1, 1), (1, 2)]).set_column(
        2, "l_shipdate",
        pa.array([dt.datetime(1999, 1, 1)] * 2, pa.timestamp("us")),
    )
    lo, hi = dt.datetime(1995, 1, 1), dt.datetime(1995, 7, 1)
    expect = {
        G.triangle_counts: ["node", "n_triangles"],
        G.cosupply_degrees: ["node", "degree"],
        G.common_neighbor_pairs: ["a", "b", "n_common"],
        G.pagerank: ["node", "rank_e12"],
    }
    for fn, cols in expect.items():
        ds = fn(rd.from_arrow(tbl), lo, hi)
        assert ds.count() == 0, fn.__name__
        assert ds.schema().names == cols, fn.__name__


def test_neardup_families_no_dups_typed_empty(ray_session):
    import ray.data as rd

    from resume_ocr_ray.ops import dedup as D

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["aaa bbb ccc", "xx21 yy zz9", "q8w e7r t65"], pa.string()
            ),
        }
    )
    ds = D.neardup_families(lambda: rd.from_arrow(tbl))
    assert ds.count() == 0
    assert ds.schema().names == ["family", "keep_doc_id", "n_docs"]


def test_kendall_heavy_path_null_values_match_light_path(ray_session):
    """NULL values in a >heavy_n user must count as NEITHER concordant
    nor discordant (SQL comparison semantics) — the chunked path drops
    NaNs where searchsorted would otherwise rank them above everything."""
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    rng = np.random.default_rng(5)
    n = 800  # > heavy_n=512
    val = np.round(rng.normal(size=n), 1)
    null_at = rng.random(n) < 0.1
    arr = pa.array(
        [None if m else float(x) for m, x in zip(null_at, val)],
        pa.float64(),
    )
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(np.ones(n, np.int64), pa.int64()),
            "ts": pa.array(np.arange(n) * 1000, pa.timestamp("us")),
            "value": arr,
        }
    )
    got = R.kendall_concordance(rd.from_arrow(tbl)).to_pandas().iloc[0]
    v = np.where(null_at, np.nan, val)
    later = np.triu(np.ones((n, n), dtype=bool), k=1)
    with np.errstate(invalid="ignore"):
        c = int(np.count_nonzero((v[None, :] > v[:, None]) & later))
        d = int(np.count_nonzero((v[None, :] < v[:, None]) & later))
    assert (got["n_conc"], got["n_disc"]) == (c, d)


def test_activity_streaks_islands(ray_session):
    """user 1: days 0,1,2 then 5,6 → two islands; user 2: single day."""
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    DAY = 86_400_000_000
    rows = [(i, 1, d * DAY, 0.0) for i, d in enumerate([0, 1, 2, 5, 6, 1])]
    rows += [(9, 2, 3 * DAY + 7, 0.0)]
    out = (
        R.activity_streaks(rd.from_arrow(_events_tbl(rows)))
        .to_pandas().sort_values(["user_id", "start_day"])
    )
    got = list(map(tuple, out[
        ["user_id", "start_day", "end_day", "n_days"]].to_numpy()))
    assert got == [(1, 0, 2, 3), (1, 5, 6, 2), (2, 3, 3, 1)]


def test_debounce_keeps_first_per_user_type_day(ray_session):
    """Duplicates within a (user, type, day) window collapse to the
    earliest (ts, event_id); distinct days/types/users survive."""
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    DAY = 86_400_000_000
    rows = [
        (3, 1, 100, 0.0), (1, 1, 100, 0.0),       # ts tie → min event_id
        (2, 1, 500, 0.0),                          # same window dup
        (4, 1, DAY + 5, 0.0),                      # next day survives
        (5, 2, 100, 0.0),                          # other user survives
    ]
    tbl = _events_tbl(rows).append_column(
        "event_type", pa.array(["click"] * 5, pa.string())
    )
    out = (
        R.debounce_events(rd.from_arrow(tbl)).to_pandas()
        .sort_values("event_id")
    )
    assert list(out["event_id"]) == [1, 4, 5]


def test_grouped_ddsketch_bound(ray_session):
    """Per-group DDSketch p50/p95 within ±1% RELATIVE error of the exact
    per-group quantile over the sf0.01 documents table."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from resume_ocr_ray.ops import sketch as SK

    tbl = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["lang", "n_chars"]
    )
    out = SK.ddsketch_quantiles_grouped(
        rd.from_arrow(tbl), group_col="lang", value_col="n_chars"
    ).to_pandas()
    df = tbl.to_pandas()
    assert set(out["lang"]) == set(df["lang"])
    for r in out.itertuples():
        grp = df.loc[df["lang"] == r.lang, "n_chars"].to_numpy()
        # DDSketch rank contract: the estimate is within rel_err of the
        # value at rank ceil(p*n) (the "lower" empirical quantile)
        exact = float(np.sort(grp)[max(0, int(np.ceil(r.p * len(grp))) - 1)])
        assert abs(r.value - exact) <= 0.0101 * exact + 1e-9, (
            r.lang, r.p, r.value, exact
        )


def test_grouped_ddsketch_rejects_negative_values(ray_session):
    """The log-bin sketch has no mirrored store for negatives — a
    negative value must raise ValueError loudly, not be silently folded
    into the zero bin (which would yield a wrong quantile with no error
    bound)."""
    import ray.data as rd

    from resume_ocr_ray.ops import sketch as SK

    tbl = pa.table({"g": ["a", "a", "b"], "v": [1.0, -2.5, 3.0]})
    with pytest.raises(Exception) as ei:
        SK.ddsketch_quantiles_grouped(
            rd.from_arrow(tbl), group_col="g", value_col="v"
        ).to_pandas()
    assert "negative value" in str(ei.value)
    # zeros are fine: dedicated zero bin, reported as 0.0
    tbl0 = pa.table({"g": ["a", "a"], "v": [0.0, 0.0]})
    out = SK.ddsketch_quantiles_grouped(
        rd.from_arrow(tbl0), group_col="g", value_col="v"
    ).to_pandas()
    assert (out["value"] == 0.0).all()


def test_orders_by_segment_shuffled_matches_broadcast(ray_session):
    """The size-gated scale sibling must agree with the broadcast form on
    real tables (inner-join semantics, per-segment sums, rounding)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    sf = "/root/testdata/sf0.001"
    cust_df = pq.read_table(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    orders = rd.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    cust = rd.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    a = (
        R.orders_by_segment(orders, cust_df).to_pandas()
        .sort_values("c_mktsegment").reset_index(drop=True)
    )
    b = (
        R.orders_by_segment_shuffled(orders, cust).to_pandas()
        .sort_values("c_mktsegment").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_exact=False, rtol=1e-9)


def test_size_gate_selects_shuffled_paths(ray_session, monkeypatch):
    """With the broadcast budget forced to 0, the enrolled asof_join and
    orders_by_segment queries take the shuffled plan and still produce the
    broadcast plan's results."""
    import pandas as pd

    from resume_ocr_ray import config as cfg
    from resume_ocr_ray.pipelines import registry as reg

    sf = "/root/testdata/sf0.001"
    qs = reg.queries()
    base_seg = (
        qs["orders_by_segment"](sf).to_pandas()
        .sort_values("c_mktsegment").reset_index(drop=True)
    )
    base_asof = (
        qs["asof_join"](sf).to_pandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    monkeypatch.setattr(cfg, "BROADCAST_BUDGET_ROWS", 0)
    gated_seg = (
        qs["orders_by_segment"](sf).to_pandas()
        .sort_values("c_mktsegment").reset_index(drop=True)
    )
    gated_asof = (
        qs["asof_join"](sf).to_pandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base_seg, gated_seg,
                                  check_exact=False, rtol=1e-9)
    pd.testing.assert_frame_equal(base_asof, gated_asof,
                                  check_exact=False, rtol=1e-9)


def test_pagerank_join_path_bit_identical(ray_session):
    """node_budget=0 forces the join-based successor (two node-hash
    cogroups per iteration, nothing node-cardinality on the driver); its
    output must be BIT-identical to the broadcast path on the star graph
    AND on the real sf0.001 co-supply graph."""
    import datetime as dt

    import ray.data as rd

    from resume_ocr_ray.ops import graph as G

    rows = []
    for i, leaf in enumerate(range(20, 28)):
        rows += [(i, 10), (i, leaf)]
    lo, hi = dt.datetime(1995, 1, 1), dt.datetime(1995, 7, 1)
    a = G.pagerank(rd.from_arrow(_li_tbl(rows)), lo, hi).to_pandas()
    b = G.pagerank(
        rd.from_arrow(_li_tbl(rows)), lo, hi, node_budget=0
    ).to_pandas()
    pd.testing.assert_frame_equal(a, b)

    li = rd.read_parquet(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    a2 = G.pagerank(li, lo, hi, iters=5, parts=8).to_pandas()
    b2 = G.pagerank(li, lo, hi, iters=5, parts=8,
                    node_budget=0).to_pandas()
    pd.testing.assert_frame_equal(a2, b2)

    # middle path (per-iteration broadcast map): node_budget between the
    # node count and the edge count skips BOTH the driver edge loop
    # (edges > budget) and the join successor (nodes <= budget)
    from resume_ocr_ray.ops.graph import cosupply_edges

    n_nodes = len(a2)
    n_edges = cosupply_edges(li, lo, hi, parts=8).count()
    assert n_nodes < n_edges  # construction sanity for the gate below
    c2 = G.pagerank(li, lo, hi, iters=5, parts=8,
                    node_budget=n_nodes).to_pandas()
    pd.testing.assert_frame_equal(a2, c2)


def test_fingerprint_rolling_hash_exact(ray_session):
    """Pin the rows-only winnowing fingerprint against a hand-rolled
    pure-Python modular-arithmetic oracle (explicit ints mod 2^64 — no
    numpy, so the op's uint64 wraparound semantics are independently
    restated), plus the edge cases: empty/None text → 0, docs shorter
    than the window clamp to their length, and the result is invariant
    to batch splits / parallelism."""
    import zlib

    import ray.data as rd

    from resume_ocr_ray.ops import text as T

    BASE, MOD, WINDOW = 1099511628211, 2**64, 8

    def oracle(t):
        toks = (t or "").split()
        if not toks:
            return 0
        crcs = [zlib.crc32(w.encode()) for w in toks]
        w = min(WINDOW, len(crcs))
        best = None
        for i in range(len(crcs) - w + 1):
            h = 0
            for c in crcs[i:i + w]:
                h = (h * BASE + c) % MOD
            best = h if best is None else min(best, h)
        # the op views uint64 as int64 for Arrow
        return best - MOD if best >= 2**63 else best

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "short doc",          # shorter than the window → clamped
        "",                   # empty → 0
        None,                 # null → 0
        "one two three four five six seven eight nine ten",
        "the quick brown fox jumps over the lazy dog again and again",  # dup
    ]
    tbl = pa.table({"doc_id": list(range(len(texts))),
                    "text": pa.array(texts, pa.string())})
    out = (
        rd.from_arrow(tbl).repartition(3)
        .map_batches(T.fingerprint, batch_format="pyarrow",
                     zero_copy_batch=True)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    expected = [oracle(t) for t in texts]
    assert list(out["fingerprint"]) == expected
    assert expected[0] == expected[5]      # identical text → identical key
    assert expected[2] == expected[3] == 0
    # split-invariance at a different parallelism
    out1 = (
        rd.from_arrow(tbl)
        .map_batches(T.fingerprint, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out1["fingerprint"]) == expected


def test_weighted_sample_k_exact_and_weighted(ray_session):
    """Sequential Poisson sample: (1) equals the brute-force numpy
    bottom-k at any parallelism, (2) excludes nonpositive weights,
    (3) actually respects weights — a huge-weight doc is always
    selected, and heavy docs are overrepresented vs uniform."""
    import hashlib

    import ray.data as rd

    from resume_ocr_ray.ops import sampling as S

    rng = np.random.default_rng(11)
    n = 4000
    w = rng.integers(1, 100, n).astype(np.int64)
    w[7] = 10**9        # whale: q ~ u/1e9 → effectively always sampled
    w[13] = 0           # must be excluded outright
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"doc_id": ids, "n_chars": w})

    def brute(k):
        u = np.fromiter(
            (int(hashlib.md5(f"sps:{i}".encode()).hexdigest()[:16], 16)
             for i in ids), dtype=np.uint64, count=n)
        pos = w > 0
        q = u[pos].astype(np.float64) / w[pos].astype(np.float64)
        order = np.lexsort((ids[pos], q))[:k]
        return sorted(ids[pos][order])

    for parts in (1, 7):
        got = (
            S.weighted_sample_k(rd.from_arrow(tbl).repartition(parts), k=300)
            .to_pandas()
        )
        assert list(got["doc_id"]) == brute(300)
        assert 13 not in set(got["doc_id"])
        assert 7 in set(got["doc_id"])        # the whale is in
    # weighted, not uniform: mean weight of the sample must exceed the
    # population mean (heavier docs have smaller q)
    sel = got[got["doc_id"] != 7]["weight"].to_numpy()
    assert sel.mean() > w[(w > 0) & (ids != 7)].mean()


def test_token_rarity_exact_and_join_path(ray_session):
    """token_rarity == a from-scratch integer oracle on a planted
    corpus (common word everywhere, rare word once), zero-token docs
    excluded, and the broadcast_max=0 join path is IDENTICAL to the
    broadcast path."""
    import ray.data as rd

    from resume_ocr_ray.ops import text as T

    texts = ["the the rare", "the the the", "", None, "the unique the"]
    tbl = pa.table({"doc_id": list(range(5)),
                    "text": pa.array(texts, pa.string())})
    factory = lambda: rd.from_arrow(tbl).repartition(2)

    # hand oracle: counts {the: 7, rare: 1, unique: 1}, total 9
    def occ(c): return 9 * 1_000_000 // c
    exp = {
        0: (3, (2 * occ(7) + occ(1)) // 3),
        1: (3, occ(7)),
        4: (3, (2 * occ(7) + occ(1)) // 3),
    }
    got = T.token_rarity(factory).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert set(got["doc_id"]) == set(exp)
    for r in got.itertuples():
        assert (r.n_tokens, r.rarity_e6) == exp[r.doc_id], r
    # rare-vocab doc scores above the all-stopword doc
    by = dict(zip(got["doc_id"], got["rarity_e6"]))
    assert by[0] > by[1]

    joined = T.token_rarity(factory, broadcast_max=0).to_pandas(
    ).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, joined)


def test_source_overlap_planted(ray_session):
    """Planted cross-source duplication: sources A/B share exactly the
    grams of one duplicated sentence; C shares nothing; within-source
    duplication must NOT count (distinct grams per source)."""
    import ray.data as rd

    from resume_ocr_ray.ops import text as T

    dup = "alpha beta gamma delta"          # 2 trigram windows
    rows = [
        ("A", dup), ("A", dup),             # within-source dup: no effect
        ("A", "only in a one two"),
        ("B", dup + " epsilon"),            # adds 1 extra gram beyond dup's
        ("B", "b unique text here"),
        ("C", "totally different words entirely"),
        ("C", None), ("A", "x y"),          # null text + <3 tokens: no-ops
    ]
    tbl = pa.table({"source": [r[0] for r in rows],
                    "text": pa.array([r[1] for r in rows], pa.string())})
    out = (
        T.source_overlap(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
    )
    got = {(r.source_a, r.source_b): r.n_shared_grams
           for r in out.itertuples()}
    # shared grams A∩B = {"alpha beta gamma", "beta gamma delta"}
    assert got == {("A", "B"): 2}


def test_weighted_sample_grouped_per_group_k(ray_session):
    """Per-group sequential Poisson: exactly min(k, group size) rows per
    group, each group's selection equal to running the ungrouped sampler
    on that group alone (the partial is group-local)."""
    import ray.data as rd

    from resume_ocr_ray.ops import sampling as S

    rng = np.random.default_rng(5)
    n = 900
    tbl = pa.table({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": [f"l{i % 3}" for i in range(n)],
        "n_chars": rng.integers(1, 50, n).astype(np.int64),
    })
    got = S.weighted_sample_k_grouped(
        rd.from_arrow(tbl).repartition(5), k=7
    ).to_pandas()
    assert got.groupby("lang").size().to_dict() == {
        "l0": 7, "l1": 7, "l2": 7}
    for lang in ("l0", "l1", "l2"):
        sub = tbl.to_pandas().query("lang == @lang")
        solo = S.weighted_sample_k(
            rd.from_arrow(pa.Table.from_pandas(sub, preserve_index=False)),
            k=7,
        ).to_pandas()
        assert list(got[got["lang"] == lang]["doc_id"]) == list(
            solo["doc_id"])


def test_unshipped_orders_boundary_semantics(ray_session):
    """Q3-style composite on a planted micro-warehouse: wrong-segment
    customers, orders ON/after the cutoff, and lineitems shipped ON/
    before the cutoff must all be excluded; revenue is the integer
    cents*pct product."""
    import datetime as dt

    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    C = dt.datetime(1995, 3, 15)
    day = dt.timedelta(days=1)
    cust = pa.table({"c_custkey": [1, 2], 
                     "c_mktsegment": ["BUILDING", "AUTOMOBILE"]})
    orders = pa.table({
        "o_orderkey": [10, 11, 12, 13],
        "o_custkey": [1, 1, 1, 2],
        "o_orderdate": pa.array(
            [C - day, C, C - day, C - day], pa.timestamp("us")),
        "o_orderpriority": ["1-URGENT"] * 4,
    })
    li = pa.table({
        "l_orderkey": [10, 10, 10, 11, 12, 13],
        "l_extendedprice": [100.0, 200.0, 50.0, 10.0, 10.0, 10.0],
        "l_discount": [0.10, 0.00, 0.05, 0.0, 0.0, 0.0],
        "l_shipdate": pa.array(
            [C + day, C + day, C,          # order 10: 2 qualify, 1 on-cutoff
             C + day,                       # order 11: order ON cutoff — out
             C - day,                       # order 12: shipped before — out
             C + day],                      # order 13: wrong segment — out
            pa.timestamp("us")),
    })
    out = R.unshipped_orders_topk(
        rd.from_arrow(li), rd.from_arrow(orders), rd.from_arrow(cust),
        cutoff=C, k=10, parts=8,
    ).to_pandas()
    assert list(out["o_orderkey"]) == [10]
    # 100.00*0.90 → 10000*90; 200.00*1.00 → 20000*100
    assert int(out["rev_e4"][0]) == 10000 * 90 + 20000 * 100

    # the size-gated order_map+cust_map broadcast plan must emit EXACTLY
    # the cogroup chain's rows (segment/date/ship boundaries included)
    fast = R.unshipped_orders_topk(
        rd.from_arrow(li), rd.from_arrow(orders), rd.from_arrow(cust),
        cutoff=C, k=10, parts=8,
        order_map=orders.to_pandas(), cust_map=cust.to_pandas(),
    ).to_pandas()
    pd.testing.assert_frame_equal(out, fast)


def test_big_orders_broadcast_path_bit_identical(ray_session):
    """Q18's size-gated attach fast path (order+customer maps) must emit
    EXACTLY the cogroup chain's rows — HAVING boundary, inner-join drops
    and the 3-key total order included."""
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3, 4], pa.int64()),
        "l_quantity": pa.array([150.0, 100.0, 90.0, 120.0, 300.0, 500.0],
                               pa.float64()),
    })  # orders 1 (250), 2 (210), 3 (300) qualify at >200; 4 dangles
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 20, 10], pa.int64()),
        "o_orderdate": pa.array(
            pd.Series(["1996-01-01", "1996-02-01", "1996-03-01"]).astype(
                "datetime64[us]"), pa.timestamp("us")),
        "o_totalprice": pa.array([100.5, 100.5, 50.0], pa.float64()),
    })
    cust = pa.table({
        "c_custkey": pa.array([10, 20], pa.int64()),
        "c_name": pa.array(["alice", "bob"], pa.string()),
    })
    slow = R.big_orders_topk(
        rd.from_arrow(li).repartition(2), rd.from_arrow(orders),
        rd.from_arrow(cust), min_qty=200, k=10, parts=8,
    ).to_pandas()
    fast = R.big_orders_topk(
        rd.from_arrow(li).repartition(2), rd.from_arrow(orders),
        rd.from_arrow(cust), min_qty=200, k=10, parts=8,
        order_map=orders.to_pandas(), cust_map=cust.to_pandas(),
    ).to_pandas()
    pd.testing.assert_frame_equal(slow, fast)
    # orders 1 & 2 tie on price_cents=10050 → date tiebreak puts 1 first
    assert list(slow["o_orderkey"]) == [1, 2, 3]


def test_weighted_sample_grouped_all_filtered_batch(ray_session):
    """A batch whose every row has weight <= 0 must emit a TYPED empty
    block (string group col), not a null-typed one that poisons the
    union schema."""
    import ray.data as rd

    from resume_ocr_ray.ops import sampling as S

    good = pa.table({"doc_id": [1, 2], "lang": ["en", "en"],
                     "n_chars": [5, 9]})
    allzero = pa.table({"doc_id": [3, 4], "lang": ["de", "de"],
                        "n_chars": [0, 0]})
    ds = rd.from_arrow(good).union(rd.from_arrow(allzero))
    out = S.weighted_sample_k_grouped(ds, k=5).to_pandas()
    assert set(out["lang"]) == {"en"}
    assert set(out["doc_id"]) == {1, 2}


def test_split_leakage_query_semantics(ray_session, tmp_path):
    """split_leakage = source_overlap over the train_split assignment:
    plant two docs whose md5-prefix split assignments DIFFER but whose
    texts share a trigram — the query must surface that pair with the
    right count."""
    import hashlib

    import ray.data as rd

    from resume_ocr_ray.ops import sampling as S
    from resume_ocr_ray.pipelines import registry as REG

    # find one train and one test doc_id under the real hash thresholds
    train_id = test_id = None
    for i in range(10_000):
        h = hashlib.md5(str(i).encode()).hexdigest()[:8]
        if h < S.SPLIT_T_TRAIN:
            train_id = train_id if train_id is not None else i
        elif h >= S.SPLIT_T_VAL:
            test_id = test_id if test_id is not None else i
        if train_id is not None and test_id is not None:
            break
    shared = "alpha beta gamma"
    docs = pa.table({
        "doc_id": pa.array([train_id, test_id], pa.int64()),
        "text": [shared + " one", shared + " two"],
    })
    d = tmp_path / "sf"
    d.mkdir()
    import pyarrow.parquet as pq

    pq.write_table(docs, str(d / "documents.parquet"))
    out = REG.queries()["split_leakage"](str(d)).to_pandas()
    got = {(r.source_a, r.source_b): r.n_shared_grams
           for r in out.itertuples()}
    # shared trigrams across the boundary: "alpha beta gamma",
    # "beta gamma one/two" differ → only the one fully-shared gram counts
    assert got == {("test", "train"): 1}


def test_spearman_matches_bruteforce_random(ray_session):
    """Seeded random corpora: spearman_rank_distance == per-user O(n log n)
    brute force with the same (key, event_id) row-number tie-break —
    ties, NaNs and single-event users present."""
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    DAY = 86_400_000_000
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = 200
        uid = rng.integers(1, 12, n)
        ts = rng.integers(0, 20 * DAY, n)
        ts[rng.random(n) < 0.2] = 5 * DAY          # planted ts ties
        val = np.round(rng.normal(size=n), 1)      # planted value ties
        val[rng.random(n) < 0.05] = np.nan         # planted NaNs
        tbl = pa.table({
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array(val, pa.float64()),
        })
        got = (
            R.spearman_rank_distance(rd.from_arrow(tbl).repartition(4))
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
        df = tbl.to_pandas()
        df["tsus"] = df["ts"].astype("int64")
        rows = []
        for u, sub in df.groupby("user_id"):
            st = sub.sort_values(["tsus", "event_id"], kind="mergesort")
            rt = {e: i + 1 for i, e in enumerate(st["event_id"])}
            # NaN last: match pandas/DuckDB float total order
            sv = sub.assign(k=sub["value"].fillna(np.inf)).sort_values(
                ["k", "event_id"], kind="mergesort")
            rv = {e: i + 1 for i, e in enumerate(sv["event_id"])}
            d2 = sum((rt[e] - rv[e]) ** 2 for e in sub["event_id"])
            rows.append({"user_id": u, "n": len(sub), "sum_d2": d2})
        want = pd.DataFrame(rows).sort_values("user_id").reset_index(
            drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"n": np.int64, "sum_d2": np.int64}), want.astype(
                {"user_id": np.int64, "n": np.int64, "sum_d2": np.int64}))


def test_rolling_distinct_users_gaps_and_window(ray_session):
    """Unobserved days emit NO row even when a window covers them; a
    user active once stays counted for the full trailing window."""
    import ray.data as rd

    from resume_ocr_ray.ops import relational as R

    DAY = 86_400_000_000
    # user 1 active day 0; user 2 active day 0 and day 3; day 1-2 silent
    rows = [(0, 1, 0), (1, 2, 0), (2, 2, 3 * DAY), (3, 1, 0)]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[2] for r in rows], np.int64)).cast(
            pa.timestamp("us")),
    })
    out = R.rolling_distinct_users(
        rd.from_arrow(tbl).repartition(2), window_days=7).to_pandas()
    got = {int(d.value // 1000) // DAY: int(n)
           for d, n in zip(out["day"], out["n_users"])}
    # only observed days 0 and 3 appear; both users in day 3's window
    assert got == {0: 2, 3: 2}


def test_cache_if_small_paths_agree(ray_session, monkeypatch):
    """cache_if_small gates a multi-pass factory on the broadcast budget:
    below it the source materializes once, above it (budget forced to 0)
    the original factory re-reads. Both paths must produce identical
    results for a two-pass op (token_rarity) and the cached path must
    serve a MaterializedDataset."""
    import ray.data as rd

    from resume_ocr_ray import config as C
    from resume_ocr_ray.common import cache_if_small
    from resume_ocr_ray.ops import text as T

    tbl = pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "text": pa.array(
            [f"alpha beta gamma token{i} beta" for i in range(8)],
            pa.string()),
    })

    fac = lambda: rd.from_arrow(tbl)  # noqa: E731
    cached_fac = cache_if_small(fac)
    from ray.data.dataset import MaterializedDataset

    assert isinstance(cached_fac(), MaterializedDataset)
    assert cached_fac() is cached_fac()  # one materialization, reused
    assert cache_if_small(fac, budget_rows=0) is fac  # above-budget: as-is

    a = T.token_rarity(fac).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    monkeypatch.setattr(C, "BROADCAST_BUDGET_ROWS", 0)
    b = T.token_rarity(fac).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
