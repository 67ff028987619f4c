"""Deterministic corpus-sampling operators for training-data pipelines.

The reference has no sampling at all (SURVEY §2.5 "Absent in the
reference"); a 100-TB training-data engine needs these three constantly:

- ``train_split``   — stable train/val/test assignment by content hash:
                      re-running the job, adding shards, or changing
                      parallelism never moves a document between splits.
- ``mixture_sample`` — per-group weighted downsampling (data mixing, e.g.
                      upweight English, downweight crawl): same stable
                      hash-threshold trick, one streamed pass, no shuffle,
                      no RNG state to coordinate across workers.
- ``pack_sequences`` — greedy fixed-budget sequence packing (LLM sample
                      packing) made scale-parallel by restarting the
                      greedy scan at fixed doc_id-range boundaries, so
                      ranges pack independently and the result is still
                      deterministic.

All three are exactly DuckDB-oracle-expressible: the hash is md5 of a
salted decimal doc_id compared as an 8-hex-char string prefix (identical
semantics in hashlib and DuckDB ``md5``), and packing is a per-range
recursive scan.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

#: default split fractions → half-open hex-prefix intervals. 0.9*16^8 and
#: 0.95*16^8 floored, rendered as lowercase hex — string comparison on the
#: md5 prefix is then identical in Python and SQL.
SPLIT_T_TRAIN = "e6666666"  # frac < 0.90
SPLIT_T_VAL = "f3333333"    # frac < 0.95

#: language mixing weights (upweight en, downweight the tail) → keep-rate
#: hex thresholds; weight 1.0 keeps everything (no hash compare).
MIX_WEIGHTS = {
    "en": ("ffffffff~", 1.0),   # sentinel above any hex prefix
    "de": ("80000000", 0.5),
    "es": ("80000000", 0.5),
    "fr": ("40000000", 0.25),
    "zh": ("40000000", 0.25),
}

PACK_RANGE = 256     # docs per independent packing range
PACK_BUDGET = 4096   # chars per pack


def _hash_prefix(ids: np.ndarray, salt: str) -> np.ndarray:
    """8-hex-char md5 prefix of ``salt + str(id)`` per id (vector out)."""
    return np.array(
        [hashlib.md5((salt + str(i)).encode()).hexdigest()[:8] for i in ids],
        dtype=object,
    )


def train_split(docs_ds):
    """Stable 90/5/5 split keyed on md5(doc_id) — a pure streamed
    ``map_batches``; no shuffle, no sort, no randomness to seed. At 100 TB
    the split column is computed on the fly wherever it's needed instead
    of being stored, because the hash makes it reproducible for free."""

    def _assign(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        h = _hash_prefix(ids, "")
        split = np.where(
            h < SPLIT_T_TRAIN, "train",
            np.where(h < SPLIT_T_VAL, "val", "test"),
        )
        return pa.table(
            {"doc_id": b.column("doc_id"),
             "split": pa.array(split, type=pa.string())}
        )

    return docs_ds.map_batches(
        _assign, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )


def mixture_sample(docs_ds, weights=MIX_WEIGHTS, default_keep: float = 0.0):
    """Weighted per-language downsampling with a salted stable hash
    (salt 'mix:' decorrelates it from the split hash). One streamed
    filter pass; the weights table is a handful of bytes shipped by
    closure capture — the degenerate broadcast join.

    Languages ABSENT from ``weights`` keep ``default_keep`` of their docs
    (default 0.0 = dropped entirely — the data-mixing convention where the
    weights table IS the mixture spec; pass default_keep=1.0 to pass
    unknown languages through)."""
    default_thr = f"{int(default_keep * 0xFFFFFFFF):08x}"
    thresholds = {k: t for k, (t, _w) in weights.items()}

    def _keep(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        langs = b.column("lang").to_numpy(zero_copy_only=False)
        h = _hash_prefix(ids, "mix:")
        thr = np.array([thresholds.get(l, default_thr) for l in langs],
                       dtype=object)
        return b.filter(pa.array(h < thr))

    return docs_ds.map_batches(
        _keep, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )


def pack_sequences(docs_ds, budget: int = PACK_BUDGET,
                   rng: int = PACK_RANGE):
    """Greedy sequence packing: walk docs in doc_id order accumulating
    ``n_chars``; when adding a doc would exceed ``budget``, start a new
    pack. Global greedy is inherently sequential, so the scan restarts at
    every ``rng``-doc doc_id boundary — ranges pack independently and in
    parallel (the documented partitioning assumption), and pack identity
    is the deterministic pair (pack_range, pack_id).

    Shape: ONE groupby(doc_id // rng) shuffle, then a tiny sorted scan
    per range (``rng`` rows each). The per-range state never leaves the
    worker; output is just the doc→pack assignment."""

    def _tag(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "pack_range", pa.array((ids // rng).astype(np.int64))
        )

    def _pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        packs = np.zeros(len(g), dtype=np.int64)
        acc, pack = 0, 0
        for i, n in enumerate(g["n_chars"].to_numpy()):
            if i > 0 and acc + n > budget:
                pack += 1
                acc = 0
            acc += n
            packs[i] = pack
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64"),
                "pack_range": g["pack_range"].astype("int64"),
                "pack_id": packs,
            }
        )

    return (
        docs_ds.map_batches(
            _tag, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )
        .groupby("pack_range")
        .map_groups(_pack, batch_format="pandas")
    )


def hash_sample(docs_ds, k: int = 50):
    """Consistent bottom-k sample: the k docs with the smallest salted
    hash — a uniform sample that is stable across runs, shards and
    cluster sizes, and composable (the bottom-k of a union is the
    bottom-k of the parts' bottom-ks, so samples of shards merge into a
    sample of the corpus without resampling).

    Distributed as partial bottom-k per batch (≤ k rows leave each
    batch), one tree-reduce level (repartition the k-per-block partials
    to a handful of blocks and take bottom-k again — the partial is
    idempotent because the hash is recomputable from doc_id), then a
    ≤ 8k-row driver merge — the global 'ORDER BY hash LIMIT k' without
    ever sorting the input or funnelling one row per block per million
    blocks through the driver."""

    def _partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        h = _hash_prefix(ids, "sample:")
        keep = np.lexsort((ids, h))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep].astype(np.int64)),
                "h": pa.array(h[keep].astype(str)),
            }
        )

    parts = (
        docs_ds.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )
        .repartition(8)
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    out = parts.sort_values(["h", "doc_id"]).head(k)
    return out[["doc_id"]].reset_index(drop=True)


def group_split(docs_ds):
    """Leakage-safe 90/5/5 split keyed on the *source* hash instead of
    the doc hash: every document from one source lands in the same
    split, so near-duplicates and templated families inside a source
    can never straddle train/test. Same streamed no-shuffle shape as
    ``train_split``; the hash input is the source string itself."""

    def _assign(b: pa.Table) -> pa.Table:
        src = b.column("source").to_numpy(zero_copy_only=False)
        h = np.array(
            [hashlib.md5(("grp:" + s).encode()).hexdigest()[:8]
             for s in src],
            dtype=object,
        )
        split = np.where(
            h < SPLIT_T_TRAIN, "train",
            np.where(h < SPLIT_T_VAL, "val", "test"),
        )
        return pa.table(
            {"doc_id": b.column("doc_id"),
             "source": b.column("source"),
             "split": pa.array(split, type=pa.string())}
        )

    return docs_ds.map_batches(
        _assign, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )


def grouped_sample(docs_ds, k: int = 10):
    """Per-GROUP consistent bottom-k sample: for each lang, the k docs
    with the smallest salted md5 prefix — the stratified-eval-set
    primitive (a stable per-language holdout that never resamples when
    the corpus grows, because membership is a pure function of doc_id).

    Same distributive selection as hash_sample, grouped: each batch keeps
    ≤ k rows PER LANG (vectorized groupby head on the hash sort), one
    tree-reduce level re-applies the same partial, and the final fold is
    one tiny per-lang head — ≤ k·n_langs·n_blocks rows ever move, the
    corpus never sorts. The partial is idempotent (hash recomputable from
    doc_id), so re-execution and shard merges are safe."""

    def _partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        langs = b.column("lang").to_numpy(zero_copy_only=False)
        h = _hash_prefix(ids, "gsample:")
        df = pd.DataFrame({"lang": langs, "doc_id": ids, "h": h})
        df = df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        df = df.groupby("lang", sort=False).head(k)
        return pa.table(
            {
                "lang": pa.array(df["lang"].to_numpy(), type=pa.string()),
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                "h": pa.array(df["h"].to_numpy(), type=pa.string()),
            }
        )

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        out = df.groupby("lang", sort=False).head(k)
        return out[["lang", "doc_id"]]

    return (
        docs_ds.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )
        .repartition(8)
        .map_batches(_partial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(1)
        .map_batches(_final, batch_format="pandas", batch_size=None)
    )


def weighted_sample_k(docs_ds, k: int = 200, weight_col: str = "n_chars"):
    """Weighted WITHOUT-replacement sample of k docs by sequential
    Poisson sampling (Ohlsson 1998; the order-sampling cousin of
    Efraimidis–Spirakis A-ES): keep the bottom-k docs by
    ``q = u / w`` where ``u = uint64(md5('sps:' + doc_id)[:16])`` and
    ``w`` is the weight column — inclusion probability ≈ proportional
    to weight, deterministic across runs/shards/parallelism because u
    is content-derived, not RNG state.

    EXACTLY SQL-expressible, unlike A-ES: A-ES ranks by u^(1/w) or
    -ln(u)/w, whose libm calls differ by ULPs across engines; a single
    IEEE division (uint64→double cast is correctly rounded in both
    numpy and DuckDB, as is the divide) is bit-identical, so the
    bottom-k set matches the oracle exactly. (doc_id tiebreak for
    belt-and-braces determinism.) Rows with w <= 0 are excluded —
    zero-weight items have q = inf in any order-sampling scheme.

    Scale shape = hash_sample's: partial bottom-k per batch (≤ k rows
    leave each batch; the partial is idempotent because q is
    recomputable from (doc_id, w)), one tree-reduce level over 8
    coarse blocks, then a ≤ 8k-row single-block merge. Output
    (doc_id, weight) sorted by doc_id."""

    def _partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        w = b.column(weight_col).to_numpy(zero_copy_only=False)
        pos = w > 0
        ids, w = ids[pos], w[pos]
        u = np.fromiter(
            (int(hashlib.md5(f"sps:{i}".encode()).hexdigest()[:16], 16)
             for i in ids),
            dtype=np.uint64, count=len(ids),
        )
        q = u.astype(np.float64) / w.astype(np.float64)
        keep = np.lexsort((ids, q))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep].astype(np.int64)),
                weight_col: pa.array(w[keep].astype(np.int64)),
                "q": pa.array(q[keep]),
            }
        )

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(["q", "doc_id"], kind="mergesort").head(k)
        return (
            out[["doc_id", weight_col]]
            .rename(columns={weight_col: "weight"})
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def _repartial(b: pa.Table) -> pa.Table:
        # tree level: same bottom-k, q already attached
        df = b.to_pandas().sort_values(["q", "doc_id"],
                                       kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        docs_ds.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )
        .repartition(8)
        .map_batches(_repartial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(1)
        .map_batches(_merge, batch_format="pandas", batch_size=None)
    )


def weighted_sample_k_grouped(docs_ds, k: int = 20,
                              group_col: str = "lang",
                              weight_col: str = "n_chars"):
    """Per-GROUP sequential Poisson sample: bottom-k by q = u/w within
    each group (the stratified form of ``weighted_sample_k`` — per-lang
    weighted eval-set carving). Same bit-exact-vs-SQL argument (one IEEE
    divide), same partial bottom-k shape per batch, with the group key in
    the lexsort; the tree level and merge keep k per group. Output
    (group, doc_id, weight) sorted by (group, doc_id)."""

    def _partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        w = b.column(weight_col).to_numpy(zero_copy_only=False)
        grp = b.column(group_col).to_numpy(zero_copy_only=False)
        pos = w > 0
        ids, w, grp = ids[pos], w[pos], grp[pos]
        u = np.fromiter(
            (int(hashlib.md5(f"sps:{i}".encode()).hexdigest()[:16], 16)
             for i in ids),
            dtype=np.uint64, count=len(ids),
        )
        q = u.astype(np.float64) / w.astype(np.float64)
        df = pd.DataFrame({group_col: grp, "doc_id": ids.astype(np.int64),
                           weight_col: w.astype(np.int64), "q": q})
        df = df.sort_values([group_col, "q", "doc_id"], kind="mergesort")
        df = df.groupby(group_col, sort=False).head(k)
        return _typed_tbl(df)

    def _typed_tbl(df: pd.DataFrame) -> pa.Table:
        # explicit types: an ALL-FILTERED batch must not emit a null-typed
        # group column (from_pandas on an empty object column does), which
        # would make downstream blocks schema-heterogeneous
        return pa.table(
            {
                group_col: pa.array(df[group_col], type=pa.string()),
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                weight_col: pa.array(df[weight_col].to_numpy(np.int64)),
                "q": pa.array(df["q"].to_numpy(np.float64)),
            }
        )

    def _retree(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values([group_col, "q", "doc_id"],
                                       kind="mergesort")
        return _typed_tbl(df.groupby(group_col, sort=False).head(k))

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, "q", "doc_id"], kind="mergesort")
        out = df.groupby(group_col, sort=False).head(k)
        return (
            out[[group_col, "doc_id", weight_col]]
            .rename(columns={weight_col: "weight"})
            .sort_values([group_col, "doc_id"])
            .reset_index(drop=True)
        )

    return (
        docs_ds.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )
        .repartition(8)
        .map_batches(_retree, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .repartition(1)
        .map_batches(_merge, batch_format="pandas", batch_size=None)
    )
