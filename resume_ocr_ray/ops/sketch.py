"""Sketch aggregates — approximate answers with bounded state, the shape
every 100-TB cardinality question needs (exact distinct = a full shuffle of
every key; an HLL register array is 4 KB regardless of input size).

- ``approx_distinct_hll`` — HyperLogLog distinct count per group. Per-batch
  partial register arrays (numpy-vectorized hash + scatter-max) are the
  combiner: only ``|groups| × m`` bytes cross the shuffle. Register merge is
  element-wise max — associative and commutative, so the estimate is
  deterministic at ANY parallelism. Hashing is splitmix64 (public-domain
  mixer), not Python ``hash`` (seed-randomized) nor md5 (per-row loop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..common import from_pandas_clean as _fpc

#: register-count exponent: m = 2^P registers = 4096 → ~1.6% typical error,
#: linear-counting correction below ~2.5m distincts
HLL_P = 12
_M = 1 << HLL_P
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)  # standard bias constant for m >= 128


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit avalanche mix (splitmix64 finalizer)."""
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _registers(values: np.ndarray) -> np.ndarray:
    """HLL register array (uint8[m]) for a batch of int64 values."""
    h = _splitmix64(values)
    idx = (h & np.uint64(_M - 1)).astype(np.int64)
    rest = h >> np.uint64(HLL_P)
    # rank = leading-zero count of the remaining (64-P) bits, + 1
    width = 64 - HLL_P
    nz = rest != 0
    # bit_length via log2 is unsafe at 2^53; use a loop over 64-P bits'
    # top-down probe — vectorized: position of highest set bit
    bl = np.zeros(values.shape[0], dtype=np.int64)
    r = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = r >= (np.uint64(1) << np.uint64(shift))
        bl[m] += shift
        r[m] >>= np.uint64(shift)
    bl[nz] += 1  # bit_length of a nonzero value
    rank = np.where(nz, width - bl + 1, width + 1).astype(np.uint8)
    regs = np.zeros(_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray) -> int:
    est = _ALPHA * _M * _M / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * _M and zeros:  # small-range (linear counting) correction
        est = _M * np.log(_M / zeros)
    return int(round(est))


def approx_distinct_hll(ds, group_col: str, value_col: str):
    """Approximate COUNT(DISTINCT value_col) per group_col via HLL.

    Two-stage: per-batch partial registers per group (rows → at most one
    4 KB register row per group per batch), then ``groupby(group_col)``
    merges registers with element-wise max and finalizes the estimate.
    """

    def _partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                group_col: b.column(group_col).to_numpy(zero_copy_only=False),
                value_col: b.column(value_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        keys, regs_rows = [], []
        for key, sub in df.groupby(group_col, sort=False):
            keys.append(key)
            regs_rows.append(_registers(sub[value_col].to_numpy(np.uint64)))
        return pa.table(
            {
                group_col: pa.array(keys),
                "regs": pa.array(
                    [r.tolist() for r in regs_rows],
                    type=pa.list_(pa.uint8(), _M),
                ),
            }
        )

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.maximum.reduce(
            [np.asarray(r, dtype=np.uint8) for r in g["regs"]]
        )
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "approx_distinct": pd.Series([_estimate(regs)], dtype="int64"),
            }
        )

    partials = ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )
    return partials.groupby(group_col).map_groups(_merge, batch_format="pandas")


def heavy_hitters(docs_ds, ppm: int = 2000, capacity: int = 4096):
    """Words occurring at least ``ppm`` parts-per-million of all tokens —
    sketch-candidates + exact-verify, the pattern that makes heavy-hitter
    queries exact WITHOUT shuffling the full vocabulary.

    Stage 1 streams one Misra-Gries summary per batch (≤ ``capacity``
    (word, residual_count) rows + the batch's token total + its MG error
    bound). Misra-Gries guarantees every word with batch count > error
    survives, so the union of batch summaries is a candidate SUPERSET of
    every word with global count > Σ errors. Stage 2 merges summaries IN
    THE CLUSTER: token/error totals come from one scalar aggregate, the
    residual union from one ``groupby(word)`` Sum whose threshold filter
    runs distributed — only the filtered CANDIDATE rows (true heavy
    hitters + MG slack) ever reach the driver, never the batches×capacity
    summary union (round-2 verdict #5). Exactness guard: if the threshold
    did not clear Σ errors it falls back to the full vocabulary (only
    possible when capacity is undersized for the corpus). Stage 3
    re-counts ONLY candidates exactly (broadcast membership filter inside
    the count combiner) and keeps those ≥ threshold. Tokenization matches
    ``top_terms``/``lang_id``: lowercase ``[a-z]+``."""
    import re

    from ray.data.aggregate import Sum

    pat = re.compile(r"[a-z]+")

    def _summaries(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        words = pd.Series(
            [w for t in texts for w in pat.findall((t or "").lower())],
            dtype="object",
        )
        total = int(len(words))
        vc = words.value_counts()
        if len(vc) > capacity:
            # batch-level Misra-Gries: keep top-`capacity`, subtract the
            # (capacity+1)-th count — residuals underestimate by ≤ err
            err = int(vc.iloc[capacity])
            vc = (vc.iloc[:capacity] - err).clip(lower=0)
            vc = vc[vc > 0]
        else:
            err = 0
        # batch totals ride on the first summary row (0 elsewhere) so the
        # driver recovers Σ tokens / Σ err with one column sum. A summary
        # can clip to EMPTY (uniform batch: every residual hits 0) — emit a
        # sentinel row ('' can never be an [a-z]+ token) so the batch's
        # token total and error bound are never silently dropped from the
        # threshold/guard arithmetic.
        words_out = vc.index.to_list()
        residuals = vc.to_numpy(np.int64).tolist()
        if not words_out:
            words_out, residuals = [""], [0]
        lead = [total] + [0] * (len(words_out) - 1)
        lead_err = [err] + [0] * (len(words_out) - 1)
        return pa.table(
            {
                "word": pa.array(words_out, type=pa.string()),
                "residual": pa.array(residuals, type=pa.int64()),
                "batch_tokens": pa.array(lead, type=pa.int64()),
                "err": pa.array(lead_err, type=pa.int64()),
            }
        )

    summ = docs_ds.map_batches(
        _summaries, batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()  # consumed twice below (scalar totals + word union)
    totals = summ.aggregate(
        Sum("batch_tokens", alias_name="t"), Sum("err", alias_name="e")
    )
    total_tokens = int(totals["t"] or 0)
    sum_err = int(totals["e"] or 0)
    threshold = max(1, int(np.ceil(total_tokens * ppm / 1_000_000)))

    if threshold > sum_err:
        # residual union + threshold filter run IN the cluster; the driver
        # sees only the candidate rows (superset of all true heavy hitters
        # by the MG guarantee), never the full summary union
        min_resid = threshold - sum_err

        def _cand_filter(t: pa.Table) -> pa.Table:
            return t.filter(
                pa.compute.greater_equal(t["residual"], min_resid)
            )

        from ..common import cogroup_agg

        # summary words are vocabulary-cardinality keys: cogroup sum, not
        # the per-key engine Aggregate (see common.cogroup_agg)
        # coalesce=4: the per-batch summaries hold few distinct words at
        # small scale, and sort ranges beyond the occupied part values
        # come out empty/schema-less (executor warnings); 4 lanes are
        # plenty for the tiny candidate merge
        cand = (
            cogroup_agg(
                summ.select_columns(["word", "residual"]),
                "word", {"residual": ("residual", "sum")},
                coalesce=4,
            )
            .map_batches(_cand_filter, batch_format="pyarrow",
                         zero_copy_batch=True)
            .to_pandas()
        )
        candidates = set(cand["word"]) if len(cand) else set()
    else:
        # sketch too coarse for this ppm: a true heavy hitter may be absent
        # from EVERY batch summary, so the summary words are NOT a superset —
        # fall back to an exact full-vocabulary recount (candidates=None)
        candidates = None

    import ray

    from ..common import cached_broadcast

    cand_ref = ray.put(candidates)

    def _exact_partial(b: pa.Table) -> pa.Table:
        keep = cached_broadcast(cand_ref)
        texts = b.column("text").to_pylist()
        counts: dict = {}
        for t in texts:
            for w in pat.findall((t or "").lower()):
                if keep is None or w in keep:
                    counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {
                "word": pa.array(list(counts.keys()), type=pa.string()),
                "n": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n"] >= threshold].copy()
        df["n"] = df["n"].astype("int64")
        return df

    # candidate-filtered recounts are ≤ |candidates| rows per block —
    # coalesce so the sort-groupby's ranges all land on occupied words
    # (schema-less-empty-partition warning sweep, see grouped_quantile)
    return (
        docs_ds.map_batches(
            _exact_partial, batch_format="pyarrow", zero_copy_batch=True,
        )
        .repartition(8)
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(_final, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Bloom filter — shuffle pruning for selective joins
# ---------------------------------------------------------------------------

BLOOM_SEEDS = (0x1234_5678, 0x9ABC_DEF0, 0x0F0F_0F0F, 0x5A5A_5A5A)


def bloom_bits(keys: np.ndarray, m_bits: int) -> np.ndarray:
    """Packed-uint64 bloom bitmap for a batch of int64 keys (k=4 probes of
    splitmix64 under distinct seed offsets)."""
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    for seed in BLOOM_SEEDS:
        h = _splitmix64(keys.astype(np.uint64) + np.uint64(seed))
        pos = (h % np.uint64(m_bits)).astype(np.int64)
        np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
    return words


def bloom_maybe(keys: np.ndarray, words: np.ndarray, m_bits: int) -> np.ndarray:
    """Membership mask (with false positives, never false negatives)."""
    mask = np.ones(keys.shape[0], dtype=bool)
    for seed in BLOOM_SEEDS:
        h = _splitmix64(keys.astype(np.uint64) + np.uint64(seed))
        pos = (h % np.uint64(m_bits)).astype(np.int64)
        bit = (words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
        mask &= bit.astype(bool)
    return mask


def bloom_semi_join_revenue(lineitem_ds, orders_ds,
                            priority: str = "1-URGENT",
                            m_bits: int = 1 << 20, parts: int = 64):
    """Revenue per returnflag over lineitems whose order has the given
    priority — a selective semi join where the BLOOM PRUNE is the point:
    the big fact side is filtered by a broadcast bitmap BEFORE the join
    shuffle, so only ~matching rows (plus ~1% false positives at these
    parameters) pay shuffle cost. Exactness does not depend on the filter:
    survivors still go through a cogroup join against the real key set,
    which kills false positives.

    Stage 1: filtered orders → per-batch packed bitmaps (16 KB each here),
    OR-merged through one ``repartition(8)`` tree level in the cluster so
    the driver receives ≤ 8 bitmaps regardless of input block count
    (round-2 verdict #5), final OR + ``ray.put`` once.
    Stage 2: lineitem probes the bitmap per batch and pre-aggregates
    survivors by orderkey. Stage 3: one coarse ``groupby(key % parts)``
    cogroup joins survivors to true keys and partials per returnflag;
    final tiny sum. Bloom has no false negatives by construction, so no
    matching row is ever lost."""
    import ray

    from ..common import cached_broadcast

    def _match_keys(b: pa.Table) -> np.ndarray:
        sel = pa.compute.equal(b.column("o_orderpriority"), priority)
        return (
            b.column("o_orderkey").filter(sel).to_numpy(zero_copy_only=False)
        )

    def _key_bits(b: pa.Table) -> pa.Table:
        # priority filter FUSED into the bitmap build: a standalone
        # filter() emits schema-less empty blocks that map_batches passes
        # through untouched (executor warning spam + the column-less-frame
        # guard below); filtering here means every orders block yields
        # exactly one bitmap row — a zero bitmap (the OR identity) when
        # nothing matches
        keys = _match_keys(b)
        w = bloom_bits(keys.astype(np.int64), m_bits)
        return pa.table({"words": pa.array([w.tolist()],
                                           type=pa.list_(pa.uint64()))})
    def _or_block(b: pa.Table) -> pa.Table:
        # OR all bitmaps in one batch down to a single row (idempotent —
        # safe as a tree-reduce level and as the final driver merge)
        if b.num_rows <= 1:
            return b
        w = np.bitwise_or.reduce(
            [np.asarray(r, dtype=np.uint64) for r in b.column("words").to_pylist()]
        )
        return pa.table({"words": pa.array([w.tolist()],
                                           type=pa.list_(pa.uint64()))})

    # tree-reduce via batch bundling, NOT repartition: map_batches bundles
    # whole one-row blocks up to batch_size, so each level cuts the bitmap
    # count 512× with no shuffle and — unlike repartition(k) over < k rows —
    # never manufactures schema-less empty partitions. Two levels bound the
    # driver fetch at n_blocks/512² rows (≤ a few, at any input size).
    bitmap_rows = (
        orders_ds.map_batches(
            _key_bits, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )
        .map_batches(_or_block, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=512)
        .map_batches(_or_block, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=512)
        .to_pandas()
    )
    # zero matching orders -> zero blocks -> a column-less empty frame
    # (Ray drops the schema with the blocks), hence the guard on the column
    if len(bitmap_rows) and "words" in bitmap_rows:
        words = np.bitwise_or.reduce(
            [np.asarray(r, dtype=np.uint64) for r in bitmap_rows["words"]]
        )
    else:  # no orders match the priority: empty bloom filter prunes all
        words = np.zeros(m_bits // 64, dtype=np.uint64)
    bloom_ref = ray.put(words)

    def _li_probe(b: pa.Table) -> pa.Table:
        w = cached_broadcast(bloom_ref)
        keys = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        keep = bloom_maybe(keys.astype(np.int64), w, m_bits)
        rev = (
            b.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - b.column("l_discount").to_numpy(zero_copy_only=False))
        )
        df = pd.DataFrame(
            {
                "key": keys[keep],
                "flag": np.asarray(
                    b.column("l_returnflag").to_numpy(zero_copy_only=False)
                )[keep],
                "rev": rev[keep],
            }
        )
        g = df.groupby(["key", "flag"], as_index=False).agg(
            rev=("rev", "sum"), n=("rev", "size")
        )
        g["part"] = (g["key"] % parts).astype("int32")
        g["is_key"] = np.int8(0)
        g["n"] = g["n"].astype("int64")
        return _fpc(
            g[["part", "key", "flag", "rev", "n", "is_key"]],
            preserve_index=False,
        )

    def _ord_keys(b: pa.Table) -> pa.Table:
        keys = np.unique(_match_keys(b))  # filter fused (see _key_bits)
        n = keys.shape[0]
        return pa.table(
            {
                "part": pa.array((keys % parts).astype(np.int32)),
                "key": pa.array(keys),
                "flag": pa.array([""] * n, type=pa.string()),
                "rev": pa.array(np.zeros(n)),
                "n": pa.array(np.zeros(n, dtype=np.int64)),
                "is_key": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["is_key"] == 0]
        true_keys = g.loc[g["is_key"] == 1, "key"]
        li = li[li["key"].isin(set(true_keys))]  # false positives die here
        if li.empty:
            return pd.DataFrame(
                {
                    "l_returnflag": pd.Series(dtype="object"),
                    "n_items": pd.Series(dtype="int64"),
                    "revenue": pd.Series(dtype="float64"),
                }
            )
        out = li.groupby("flag", as_index=False).agg(
            n_items=("n", "sum"), revenue=("rev", "sum")
        )
        out = out.rename(columns={"flag": "l_returnflag"})
        out["n_items"] = out["n_items"].astype("int64")
        return out

    from ray.data.aggregate import Sum

    def _round(df: pd.DataFrame) -> pd.DataFrame:
        df["n_items"] = df["n_items"].astype("int64")
        df["revenue"] = df["revenue"].round(2)
        return df

    li = lineitem_ds.map_batches(
        _li_probe, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )
    ok = orders_ds.map_batches(
        _ord_keys, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )
    return (
        li.union(ok)
        .groupby("part")
        .map_groups(_merge, batch_format="pandas")
        .repartition(2)  # ≤3 rows per cogroup (warning-sweep coalesce)
        .groupby("l_returnflag")
        .aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("revenue", alias_name="revenue"),
        )
        .map_batches(_round, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# DDSketch-style approximate quantiles (log-bin histogram)
# ---------------------------------------------------------------------------

def ddsketch_quantiles(ds, value_col: str, ps=(0.5, 0.95, 0.99),
                       rel_err: float = 0.01):
    """Relative-error quantile sketch (DDSketch scheme: fixed log-γ bins,
    γ = (1+α)/(1−α)): the mergeable-continuous-domain companion to
    ``relational.exact_quantile`` (whose histogram-prune needs a second
    input pass; this is ONE pass and ~KB of state at any input size).

    Per-batch partials are (bin, n) counts from a vectorized
    ``ceil(log(x)/log γ)`` — bin index is a pure function of the value, so
    merge (Sum per bin) is associative/commutative and the estimate is
    DETERMINISTIC at any parallelism, unlike centroid sketches (t-digest)
    whose result depends on merge order. Zero/negative values collapse into
    a dedicated bin 0 at their exact value only when 0 (negatives are out
    of contract for the length/price domains this serves).

    Returns one row per p: (p, value) where value is the γ-midpoint of the
    bin holding rank ceil(p·n) — guaranteed within ±rel_err relative error
    of the true quantile."""
    import math

    from ray.data.aggregate import Sum

    gamma = (1.0 + rel_err) / (1.0 - rel_err)
    log_g = math.log(gamma)

    def _partial(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        pos = v[v > 0]
        bins = np.ceil(np.log(pos) / log_g).astype(np.int64)
        n_zero = int((v <= 0).sum())
        idx, cnt = np.unique(bins, return_counts=True)
        out_bin = list(idx)
        out_n = list(cnt.astype(np.int64))
        if n_zero:
            out_bin.append(np.iinfo(np.int64).min)  # dedicated zero bin
            out_n.append(n_zero)
        return pa.table({"bin": pa.array(out_bin, pa.int64()),
                         "n": pa.array(out_n, pa.int64())})

    merged = (
        ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=65536)
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # tiny: one row per log-bin (~1k rows at α=1%)
        .sort_values("bin")
    )
    bins = merged["bin"].to_numpy()
    counts = merged["n"].to_numpy()
    cum = np.cumsum(counts)
    total = int(cum[-1]) if len(cum) else 0
    out_p, out_v = [], []
    for p in ps:
        out_p.append(float(p))
        if total == 0:
            out_v.append(float("nan"))
            continue
        rank = max(1, math.ceil(p * total))
        b = int(bins[np.searchsorted(cum, rank)])
        if b == np.iinfo(np.int64).min:
            out_v.append(0.0)
        else:
            # γ-midpoint of bin b: 2·γ^b/(γ+1) — within ±rel_err of any x
            # mapped into the bin
            out_v.append(round(2.0 * gamma ** b / (gamma + 1.0), 6))
    return pd.DataFrame({"p": out_p, "value": out_v})


def kmv_overlap(events_ds, type_a: str, type_b: str, k: int = 1024):
    """KMV (bottom-k / theta-style) sketch SET-OVERLAP estimates between
    two event cohorts: ``(est_a, est_b, est_union, est_intersect)`` —
    distinct-user audience overlap without shuffling user ids (the
    theta-sketch INTERSECTION workload HLL cannot express).

    Shape mirrors ``hash_sample``'s composable bottom-k: each batch emits
    its ≤k smallest DISTINCT user hashes per side (idempotent partial —
    the hash is recomputable), one tree-reduce level merges block
    partials, and a ≤2k-row driver finalize computes the standard KMV
    estimators: |S| ≈ (k−1)·2⁶⁴/h₍ₖ₎; for the overlap, the UNION sketch's
    k smallest hashes form a uniform sample of A∪B, so
    |A∩B| ≈ (matches-in-sample/k)·|A∪B| and |A∪B| from the union sketch
    directly. Estimates are int64; error ~1/√k (pytest pins a planted
    ±15% bound at k=1024). The driver merge is k-bounded, never
    corpus-bounded."""

    sides = {"a": type_a, "b": type_b}

    def _partial(b: pa.Table) -> pa.Table:
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        uid = b.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        frames = []
        for tag, tname in sides.items():
            h = np.unique(_splitmix64(uid[et == tname]))[:k]
            frames.append(
                pd.DataFrame({"side": tag, "h": h.astype(np.uint64)})
            )
        out = pd.concat(frames, ignore_index=True)
        from ..common import from_pandas_clean

        return from_pandas_clean(out)

    def _merge_block(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        keep = []
        for tag in sides:
            h = np.unique(df.loc[df["side"] == tag, "h"].to_numpy(
                np.uint64
            ))[:k]
            keep.append(pd.DataFrame({"side": tag, "h": h}))
        from ..common import from_pandas_clean

        return from_pandas_clean(pd.concat(keep, ignore_index=True))

    parts = (
        events_ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=65536)
        .repartition(8)
        .map_batches(_merge_block, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .to_pandas()
    )

    def _bottom(tag: str) -> np.ndarray:
        return np.unique(
            parts.loc[parts["side"] == tag, "h"].to_numpy(np.uint64)
        )[:k]

    ha, hb = _bottom("a"), _bottom("b")

    def _kmv_est(h: np.ndarray) -> int:
        if len(h) < k:  # sketch never filled: it IS the exact distinct set
            return len(h)
        return int(round((k - 1) * (2.0**64) / float(h[-1])))

    union = np.unique(np.concatenate([ha, hb]))[:k]
    est_u = _kmv_est(union)
    both = np.intersect1d(union, ha, assume_unique=True)
    both = np.intersect1d(both, hb, assume_unique=True)
    est_i = int(round(len(both) / max(1, len(union)) * est_u))
    out = pa.table(
        {
            "est_a": pa.array([_kmv_est(ha)], pa.int64()),
            "est_b": pa.array([_kmv_est(hb)], pa.int64()),
            "est_union": pa.array([est_u], pa.int64()),
            "est_intersect": pa.array([est_i], pa.int64()),
        }
    )
    import ray.data as rd

    return rd.from_arrow(out)


def ddsketch_quantiles_grouped(ds, group_col: str, value_col: str,
                               ps=(0.5, 0.95), rel_err: float = 0.01):
    """GROUPED DDSketch quantiles: ``(group, p, value)`` within ±rel_err
    RELATIVE error per group — the scale path for per-group quantiles
    (the exact form shuffles per-group value-count histograms; this
    shuffles ≤ ~1k log-bins per group regardless of row count, and the
    estimate is deterministic at any parallelism, same argument as the
    global ``ddsketch_quantiles``).

    Per-batch partials are (group, bin, n) counts; one engine aggregate
    sums them (group × bin cardinality is tiny); the finalize is a
    vectorized per-group cumsum + rank probe on the driver — bounded by
    groups × bins, never rows.

    Values must be >= 0: the log-bin mapping has no mirrored sketch for
    negatives (upstream DDSketch keeps a second store), so a negative
    value raises ValueError from the offending batch rather than being
    silently folded into the zero bin. Exact zeros are fine (dedicated
    zero bin, reported as 0.0)."""
    import math

    from ray.data.aggregate import Sum

    from ..common import from_pandas_clean

    gamma = (1.0 + rel_err) / (1.0 - rel_err)
    log_g = math.log(gamma)
    ZERO_BIN = np.iinfo(np.int64).min

    def _partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": b.column(group_col).to_pylist(),
                "v": b.column(value_col).to_numpy(
                    zero_copy_only=False
                ).astype(np.float64),
            }
        ).dropna()
        vals = df["v"].to_numpy()
        if len(vals) and float(vals.min()) < 0.0:
            raise ValueError(
                f"ddsketch_quantiles_grouped: negative value "
                f"{float(vals.min())!r} in {value_col!r} — the log-bin "
                "sketch has no mirrored store for negatives"
            )
        with np.errstate(divide="ignore", invalid="ignore"):
            bins = np.where(
                df["v"].to_numpy() > 0,
                np.ceil(
                    np.log(np.maximum(df["v"].to_numpy(), 1e-300)) / log_g
                ).astype(np.int64),
                ZERO_BIN,
            )
        out = (
            df.assign(bin=bins).groupby(["g", "bin"], sort=False)
            .size().reset_index(name="n")
        )
        out["n"] = out["n"].astype(np.int64)
        return from_pandas_clean(out)

    merged = (
        ds.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=65536)
        # 2 lanes, not 4: the sort-groupby makes one range per input
        # block, and group cardinality here is the lang dimension (~10
        # keys) — 4 ranges leave <4 keys per range, where boundary
        # sampling manufactures schema-less empty ranges (warning spam;
        # the repo's ≥4-keys-per-range spacing rule)
        .repartition(2)
        .groupby("g")
        .map_groups(
            lambda d: from_pandas_clean(
                d.groupby(["g", "bin"], sort=False, as_index=False)["n"]
                .sum()
            ),
            batch_format="pandas",
        )
        .to_pandas()  # groups × log-bins — sketch-sized, never rows
    )
    rows = []
    for g, sub in merged.groupby("g", sort=True):
        sub = sub.sort_values("bin")
        bins = sub["bin"].to_numpy()
        cum = np.cumsum(sub["n"].to_numpy())
        total = int(cum[-1])
        for p in ps:
            rank = max(1, math.ceil(p * total))
            b = int(bins[np.searchsorted(cum, rank)])
            v = 0.0 if b == ZERO_BIN else round(
                2.0 * gamma ** b / (gamma + 1.0), 6
            )
            rows.append((g, float(p), v))
    out = pd.DataFrame(rows, columns=[group_col, "p", "value"])
    import ray.data as rd

    return rd.from_arrow(from_pandas_clean(out))
