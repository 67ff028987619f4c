"""Deduplication operators over a documents table — the core training-data
cleaning suite, each built shuffle-consciously:

- exact dedup        — content hash in map_batches → ONE groupby on the hash
                       (hash-partition + per-group first); keep min(doc_id)
- prefix dedup       — same, keyed on a normalized prefix (demonstrates
                       near-dup groups on the synthetic corpus)
- MinHash + LSH      — shingle→minhash per batch (vectorized numpy), explode
                       to (band, band_hash) rows, groupby bands → candidate
                       pairs → Jaccard verify. Only band keys shuffle; full
                       signatures/text never do.
- SimHash            — 64-bit simhash per batch; bucket by rotated prefixes
                       (block permutation trick) → candidates within hamming
                       distance k
- embedding near-dup — cosine over an embedding column against per-batch
                       normalized matrices; bucketed by coarse LSH signs

Connected components / cluster-rep selection is per-group min-label — the
candidate graph at 100 TB stays sharded by band key; nothing funnels through
the driver.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..common import per_worker_stage
from ..common import from_pandas_clean as _fpc

import logging

_LOG = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# exact / prefix dedup
# ---------------------------------------------------------------------------

def md5_hex(texts) -> list:
    """Canonical per-row content hash: hashlib.md5 of the utf-8 text, with
    None → '' — bit-identical to DuckDB ``md5(coalesce(text, ''))``, so it
    is oracle-checkable. Every op that hashes document text (dedup_exact,
    connected components, relational.dedup_keep_best) MUST route through
    this one function so the null convention and encoding cannot drift."""
    import hashlib

    return [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]


def add_md5(batch: pa.Table, col: str = "text", out: str = "text_md5") -> pa.Table:
    """Content hash per row (see :func:`md5_hex` for the contract)."""
    texts = batch.column(col).to_pylist()
    return batch.append_column(out, pa.array(md5_hex(texts), type=pa.string()))


def dedup_exact(docs_ds, key_fn=add_md5, key_col: str = "text_md5"):
    """Exact dedup: hash in map_batches, then one groupby(hash) keeping the
    min doc_id per group (deterministic winner).

    The hash pass is fused with a PER-BATCH partial (pyarrow group_by →
    min doc_id), so at most one row per distinct hash per batch crosses the
    groupby shuffle — on a duplicate-heavy corpus the shuffle carries the
    distinct-hash count, not the row count."""
    from ..common import cogroup_agg

    def partial(batch: pa.Table) -> pa.Table:
        t = key_fn(batch).select([key_col, "doc_id"])
        g = t.group_by(key_col).aggregate([("doc_id", "min")])
        return g.select([key_col, "doc_id_min"]).rename_columns(
            [key_col, "doc_id"]
        )

    hashed = docs_ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )
    # hash keys number ~one per distinct doc — the engine Aggregate pays
    # per-KEY cost at that cardinality; the coarse cogroup merge is exact
    # (each key lands wholly in one partition) and the per-batch partial
    # above keeps hot keys at one row per block across the shuffle
    return cogroup_agg(hashed, key_col, {"keep_doc_id": ("doc_id", "min")})


def add_norm_md5(batch: pa.Table, col: str = "text",
                 out: str = "norm_md5") -> pa.Table:
    """Canonicalized content hash: md5 of lower(strip-accents(text)) —
    the normalization-dedup key (re-encoded / re-cased / accent-mangled
    re-crawls collapse to one canonical form). Accent stripping is NFD
    decomposition minus combining marks (category Mn), re-COMPOSED to NFC
    after the strip (DuckDB returns composed forms — without the NFC pass
    Hangul decomposes to Jamo and diverges), verified char-for-char
    against DuckDB ``strip_accents`` on the corpus and the tricky cases
    (ß/ø/æ pass through, double-combining 'café́' → 'cafe', dotted İ
    lowercases with the combining dot stripped, 한글 stays composed)."""
    import unicodedata

    def _norm(t):
        return unicodedata.normalize(
            "NFC",
            "".join(
                c
                for c in unicodedata.normalize("NFD", t)
                if unicodedata.category(c) != "Mn"
            ),
        ).lower()

    texts = batch.column(col).to_pylist()
    return batch.append_column(
        out,
        pa.array(md5_hex([_norm(t) if t is not None else None
                          for t in texts]), type=pa.string()),
    )


def add_prefix_key(batch: pa.Table, n: int = 24) -> pa.Table:
    key = pc.utf8_slice_codeunits(batch.column("text"), 0, n)
    return batch.append_column("prefix_key", key)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHashStage:
    """Per-batch shingle→MinHash signatures (stateful: permutation tables
    built once per actor). Emits one row per (doc, band): the ONLY data that
    crosses the LSH shuffle."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle: int = 5,
                 seed: int = 1234):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle = shingle
        self.token = re.compile(r"\w+")

    #: polynomial base for the vectorized shingle hash (any odd 64-bit const)
    _SH_BASE = np.uint64(1099511628211)

    def signature(self, text: str) -> np.ndarray:
        """Vectorized: crc32 per TOKEN (the only Python loop), then the
        shingle hash is a numpy Horner scheme over the token-crc array —
        ``shingle`` vector passes instead of one string join + crc32 per
        shingle (~5× fewer Python-level hash calls on real text)."""
        from ..common import horner_shingles

        toks = self.token.findall((text or "").lower())
        if not toks:
            hv = np.zeros(1, dtype=np.uint64)
        else:
            crcs = np.fromiter(
                (zlib.crc32(t.encode()) for t in toks), dtype=np.uint64,
                count=len(toks),
            )
            h = horner_shingles(crcs, self.shingle, self._SH_BASE)
            hv = np.unique(h)  # distinct shingles, like the set() before
        # (a*x + b) mod p for all perms × shingles, take min per perm
        vals = (self.a[:, None] * hv[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_band, out_hash = [], [], []
        for d, t in zip(doc_ids, texts):
            sig = self.signature(t)
            for b in range(self.bands):
                band = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                out_doc.append(d)
                out_band.append(b)
                out_hash.append(zlib.crc32(band.tobytes()))
        return pa.table(
            {
                "doc_id": pa.array(out_doc),
                "band": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.int64()),
            }
        )


#: partition count for the manual salted-cogroup text join (see
#: minhash_verified) — at scale, size so one partition of texts fits a worker
COGROUP_PARTS = 64


def _cg_part(key: pd.Series, parts: int = COGROUP_PARTS) -> pd.Series:
    """Deterministic type-agnostic hash partition of a key column
    (same function on both cogroup sides ⇒ co-partitioning)."""
    return (pd.util.hash_pandas_object(key, index=False) % parts).astype("int64")


#: buckets up to this size emit ALL within-bucket pairs (standard LSH
#: candidate semantics); bigger buckets (skewed keys) fall back to star
#: pairs with the bucket min — bounds the quadratic blowup while keeping
#: min-label connected components correct.
MAX_ALLPAIRS_BUCKET = 64


def _pairs_from_salt_group(g: pd.DataFrame, explode_sides: bool = False) -> pd.DataFrame:
    """Pair emission for ALL buckets in one salted group: all C(k,2) pairs
    per (band, band_hash) bucket up to ``MAX_ALLPAIRS_BUCKET`` docs, star
    pairs with the bucket min beyond that. Star-only emission (round-2
    change) under-reported verified near-dup PAIRS: a triple a~b~c in one
    bucket surfaced only as (a,b),(a,c), silently dropping (b,c). The
    Python loop below runs only over buckets with >= 2 members (rare —
    near-dup collisions), with numpy pair enumeration inside.

    With ``explode_sides`` each pair row is emitted twice — keyed once by
    each side (``key=a`` / ``key=b``) — in the full cogroup edge schema
    (a, b, key, text, is_text, part), so even empty output blocks carry the
    columns the downstream partition-groupby needs."""
    # vectorized prefilter: the Python loop only ever sees multi-member
    # buckets (collisions are rare — almost all buckets are singletons)
    multi = g[g.duplicated(["band", "band_hash"], keep=False)]
    doc_ids = multi["doc_id"].to_numpy()
    a_parts, b_parts = [], []
    for idx in multi.groupby(["band", "band_hash"]).indices.values():
        ids = np.unique(doc_ids[idx])
        k = len(ids)
        if k < 2:
            continue
        if k <= MAX_ALLPAIRS_BUCKET:
            iu, ju = np.triu_indices(k, 1)
            a_parts.append(ids[iu])
            b_parts.append(ids[ju])
        else:  # skew cap: star with the bucket min
            a_parts.append(np.full(k - 1, ids[0], dtype=ids.dtype))
            b_parts.append(ids[1:])
    if a_parts:
        pairs = pd.DataFrame(
            {"a": np.concatenate(a_parts), "b": np.concatenate(b_parts)}
        )
    else:
        pairs = pd.DataFrame(
            {
                "a": pd.Series([], dtype=doc_ids.dtype),
                "b": pd.Series([], dtype=doc_ids.dtype),
            }
        )
    if not explode_sides:
        return pairs
    both = pd.concat(
        [pairs.assign(key=pairs["a"]), pairs.assign(key=pairs["b"])],
        ignore_index=True,
    )
    both["text"] = pd.Series([""] * len(both), dtype="string")
    both["is_text"] = False
    both["part"] = _cg_part(both["key"])
    return both[["a", "b", "key", "text", "is_text", "part"]]


#: Salt fan-out for bucket groupbys: bounds group size at scale (a group is
#: ~n_rows/SALT rows) while keeping the per-group Python call count tiny.
PAIR_SALT = 64


def _raw_band_pairs(docs_ds, *, num_perm=64, bands=16, shingle=5,
                    concurrency=None, explode_sides=False):
    """Pre-aggregate LSH pair rows: one (a, b) row per band collision —
    the shared front half of minhash_candidates / minhash_verified."""
    kw = {"num_perm": num_perm, "bands": bands, "shingle": shingle}
    if concurrency is None:  # elastic tasks, per-worker cached stage
        banded = docs_ds.map_batches(
            per_worker_stage(MinHashStage, **kw),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    else:
        banded = docs_ds.map_batches(
            MinHashStage, fn_constructor_kwargs=kw,
            batch_format="pyarrow", zero_copy_batch=True,
            concurrency=concurrency,
        )
    # group by salt ALONE: a bucket (band, band_hash) maps wholly to one
    # salt value (salt = band_hash & mask), and _pairs_from_salt_group
    # re-groups by (band, band_hash) internally — so salt-only grouping is
    # output-identical (verified pair-set equality at sf0.1) with a
    # 1-column sort key. The mask is 16× FINER than PAIR_SALT so the
    # per-group row bound (~n_band_rows / groups) matches the old
    # (band, salt) grouping — salt-only at PAIR_SALT alone would make
    # each group 16× larger and cap stage parallelism at 64.
    _mask = PAIR_SALT * 16 - 1
    salted = banded.map_batches(
        lambda t: t.append_column(
            "salt", pc.cast(pc.bit_wise_and(t["band_hash"], _mask), pa.int32())
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return salted.groupby("salt").map_groups(
        lambda g: _pairs_from_salt_group(g, explode_sides),
        batch_format="pandas",
    )


def minhash_candidates(docs_ds, *, num_perm=64, bands=16, shingle=5,
                       concurrency=None):
    """LSH candidate pairs via SALTED bucket groupby: the shuffle key is
    (band, band_hash % SALT) so there are O(bands×SALT) groups — each
    map_groups call handles many buckets with vectorized pandas, instead of
    one Python call per tiny bucket. Bucket membership itself still uses the
    exact band_hash, so candidates are identical."""
    from ray.data.aggregate import Count

    pairs = _raw_band_pairs(docs_ds, num_perm=num_perm, bands=bands,
                            shingle=shingle, concurrency=concurrency)
    # distinct pairs (a<b by construction); n_bands = LSH vote count.
    # LSH candidate pairs are a vanishing fraction of the corpus (sparse
    # key space), so the engine Aggregate's per-block combine wins here —
    # the cogroup_agg form A/B'd SLOWER (3.7-5.1 s vs 2.6-2.9 s at sf0.1);
    # see common.cogroup_agg for the cardinality rule.
    return pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n_bands"))


#: verify-lane sizing: ~this many candidate edge rows per verify partition.
#: 8 lanes was the measured A/B optimum at sf0.1's ~7.2k edge rows (≈900
#: rows/lane); deriving lanes from the measured count keeps that density on
#: candidate-heavy corpora instead of serializing the verify stage at 8.
_EDGE_ROWS_PER_LANE = 1000


def _derive_pair_lanes(n_edge_rows: int, floor: int = 8,
                       cap: int = PAIR_SALT) -> int:
    """Verify-stage parallelism from candidate volume: edge rows /
    _EDGE_ROWS_PER_LANE, floored at the small-corpus optimum (8 — fewer
    lanes than that re-creates the empty-schema-less-range warning spam)
    and capped at PAIR_SALT (the ppart modulus: more lanes than salt values
    produce guaranteed-empty ranges; at true scale raise PAIR_SALT and the
    cap together)."""
    return int(min(cap, max(floor, n_edge_rows // _EDGE_ROWS_PER_LANE)))


def minhash_verified(docs_ds, *, threshold: float = 0.5, num_perm=64, bands=16,
                     shingle=5, concurrency=None, pair_lanes: int | None = None,
                     stats: dict | None = None):
    """Candidate pairs verified with TRUE n-gram Jaccard — fully distributed.

    The candidate texts are fetched with a keyed hash join of pair-edge rows
    (each pair emitted once per side, keyed by that side's doc_id) against
    the docs dataset; pairs and texts shuffle by key, nothing funnels
    through the driver (no ``materialize()``, no driver dict — round-1
    verdict #4). The join is a manual SALTED COGROUP — union of the two
    sides hash-partitioned on the key, one vectorized pandas merge per
    partition — because ``Dataset.join`` (2.49) breaks on the schema-less
    empty blocks that sparse grouped ops emit. Verification runs per SALTED
    pair partition (hash(a)⊕hash(b) % PAIR_SALT): one vectorized Python call
    per partition — never one per candidate pair.
    """
    edges = _raw_band_pairs(docs_ds, num_perm=num_perm, bands=bands,
                            shingle=shingle, concurrency=concurrency,
                            explode_sides=True)
    n_edge_rows = None
    if pair_lanes is None:
        # size the verify stage from the MEASURED candidate volume (LSH
        # candidates are a vanishing fraction of the corpus, so holding
        # them in the object store is cheap; the union consumer reuses the
        # materialized blocks, so the band pipeline still runs once)
        edges = edges.materialize()
        n_edge_rows = edges.count()
        pair_lanes = _derive_pair_lanes(n_edge_rows)
    if stats is not None:
        stats["pair_lanes"] = pair_lanes

    def text_side(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["doc_id", "text"]).to_pandas()
        out = pd.DataFrame(
            {
                # a/b are never read off text rows — doc_id fills them so the
                # union schema (and dtypes) match the edge side exactly
                "a": df["doc_id"],
                "b": df["doc_id"],
                "key": df["doc_id"],
                "text": df["text"].astype("string"),
                "is_text": True,
            }
        )
        out["part"] = _cg_part(out["key"])
        return out

    # Semi-join gate on the text side: the cogroup below co-locates pair
    # edges with their texts, but only CANDIDATE docs' texts are ever read
    # off the merge — shuffling the whole corpus's text column to feed it
    # is wasted exchange volume. When the measured edge count fits the
    # broadcast budget, ship the candidate doc-id set once (ids only —
    # texts never touch the driver) and pre-filter the corpus stream, so
    # the text shuffle moves candidate texts only. Above the budget (or
    # when the caller pinned pair_lanes and no count exists) the unfiltered
    # two-sided shuffle remains the scale path.
    text_src = docs_ds
    if n_edge_rows is not None:
        from .. import config as _cfg

        # 0 edges short-circuits to the unfiltered path: a zero-candidate
        # edge set yields schema-less empty blocks whose a/b columns can't
        # be selected (the downstream machinery already handles empties)
        if 0 < n_edge_rows <= _cfg.BROADCAST_BUDGET_ROWS:
            import ray as _ray

            ed = edges.select_columns(["a", "b"]).to_pandas()
            cand_ids = np.unique(
                np.concatenate(
                    [ed["a"].to_numpy(np.int64), ed["b"].to_numpy(np.int64)]
                )
            )
            ids_ref = _ray.put(cand_ids)

            def _cand_filter(b: pa.Table) -> pa.Table:
                # plain ray.get, NOT cached_broadcast: fresh ref per query
                # (the per-worker cache would pin one id set per
                # invocation forever); numpy plasma get is zero-copy
                ids = _ray.get(ids_ref)
                d = b.column("doc_id").to_numpy(zero_copy_only=False)
                return b.filter(pa.array(np.isin(d, ids)))

            text_src = docs_ds.map_batches(
                _cand_filter, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=65536,
            )

    texts = text_src.map_batches(text_side, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        t = g.loc[g["is_text"], ["key", "text"]]
        e = g.loc[~g["is_text"], ["a", "b", "key"]]
        if e.empty or t.empty:
            return pd.DataFrame(
                {"a": e["a"].iloc[:0], "b": e["b"].iloc[:0],
                 "key": e["key"].iloc[:0],
                 "text": pd.Series([], dtype="string")}
            )
        return e.merge(t, on="key", how="inner")

    # Coalesce the union before the cogroup sort: the sort-groupby makes
    # one output RANGE per input block, and ranges that outnumber the
    # occupied key values come out EMPTY and schema-less (executor warning
    # spam). COGROUP_PARTS/4 blocks make every range span ≥4 of the 64
    # part values (always occupied; /2 still produced occasional empty
    # ranges from boundary sampling), while keeping the merge at a quarter
    # of its designed salt parallelism — the partition count is the op's
    # scale knob, not the upstream block count.
    joined = (
        texts.union(edges)
        .repartition(COGROUP_PARTS // 4)
        .groupby("part")
        .map_groups(merge_part, batch_format="pandas")
    )

    def verify_part(g: pd.DataFrame) -> pd.DataFrame:
        # one salted PARTITION of candidate pairs per Python call (round-2
        # verdict #7: groupby(["a","b"]) paid one map_groups call per pair).
        # Rows: one per (band collision × side), text joined per side.
        empty = pd.DataFrame(
            {"a": g["a"].iloc[:0], "b": g["b"].iloc[:0],
             "n_bands": pd.Series([], dtype="int64"),
             "n_inter": pd.Series([], dtype="int64"),
             "n_union": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
        if g.empty:
            return empty
        sides = g.drop_duplicates(["a", "b", "key"])
        ta = sides.loc[sides["key"] == sides["a"], ["a", "b", "text"]]
        tb = sides.loc[sides["key"] == sides["b"], ["a", "b", "text"]]
        # a pair missing either side's text (doc absent from the corpus
        # side) drops at this inner merge — same contract as before
        m = ta.merge(tb, on=["a", "b"], suffixes=("_a", "_b"))
        if m.empty:
            return empty
        nrows = g.groupby(["a", "b"]).size().rename("nrows")
        m = m.merge(nrows, left_on=["a", "b"], right_index=True)
        out_rows = []
        for a, b, t_a, t_b, nr in m[
            ["a", "b", "text_a", "text_b", "nrows"]
        ].itertuples(index=False):
            i, u = jaccard_counts(str(t_a or ""), str(t_b or ""), shingle)
            j = round(i / max(1, u), 6)
            if j >= threshold:
                out_rows.append((a, b, int(nr) // 2, i, u, j))
        if not out_rows:
            return empty
        return pd.DataFrame(
            out_rows,
            columns=["a", "b", "n_bands", "n_inter", "n_union", "jaccard"],
        )

    def add_ppart(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["ppart"] = (
            (pd.util.hash_pandas_object(df["a"], index=False)
             ^ pd.util.hash_pandas_object(df["b"], index=False))
            % PAIR_SALT
        ).astype("int32")
        return df

    # joined holds ONLY candidate-pair edge rows with their joined texts
    # (LSH candidates — a vanishing fraction of the corpus), so the
    # coalesce is cheap at any scale. The sort-groupby emits ONE output
    # range per INPUT block, so the repartition count IS the verify
    # stage's parallelism ceiling. pair_lanes is DERIVED from the measured
    # edge-row count (see _derive_pair_lanes): 8 was the A/B optimum at
    # sf0.1's ~7.2k edge rows (8→4.0–4.8 s, 16→4.7–5.4 s, 64→slower plus
    # schema-less empty ranges once lanes outnumber occupied ppart values),
    # so the derivation keeps that ~1k-rows/lane density and fans the
    # verify stage out on candidate-heavy corpora instead of serializing
    # at a constant 8. Callers can still pin an explicit pair_lanes.
    return (
        joined.map_batches(add_ppart, batch_format="pandas")
        .repartition(pair_lanes)
        .groupby("ppart")
        .map_groups(verify_part, batch_format="pandas")
    )


def jaccard_counts(text_a: str, text_b: str, shingle: int = 5) -> tuple:
    """(|A ∩ B|, |A ∪ B|) over word-shingle sets — the integer-exact core
    of :func:`jaccard`, exposed so oracle-checked callers can compare raw
    counts instead of rounded float ratios (words = ``\\w+`` of the
    lowercased text == DuckDB ``regexp_extract_all(lower(text),
    '[0-9a-z_]+')``)."""
    tok = re.compile(r"\w+")
    ta, tb = tok.findall(text_a.lower()), tok.findall(text_b.lower())

    def sh(toks):
        if len(toks) < shingle:
            return {" ".join(toks)} if toks else {""}
        return {" ".join(toks[i : i + shingle]) for i in range(len(toks) - shingle + 1)}

    sa, sb = sh(ta), sh(tb)
    inter = len(sa & sb)
    return inter, len(sa) + len(sb) - inter


def jaccard(text_a: str, text_b: str, shingle: int = 5) -> float:
    i, u = jaccard_counts(text_a, text_b, shingle)
    return i / max(1, u)


# ---------------------------------------------------------------------------
# connected components (dedup cluster labels)
# ---------------------------------------------------------------------------

#: hash-partition fan-out for the connected-components cogroups — each
#: map_groups call handles ~1/CC_PARTS of all keys/docs vectorized, never one
#: Python call per key (round-2 verdict #2; sized like relational.SESSION_PARTS)
CC_PARTS = 64


def connected_components_labels(docs_ds, max_iters: int = 10,
                                to_state_fn=None, stats: dict | None = None,
                                driver_budget_rows: int | None = None):
    """Dedup-cluster labels via distributed min-label propagation with
    POINTER JUMPING (label doubling): each iteration does one key-hop min
    propagation, then follows ``label <- label[label]``, so convergence is
    O(log component-diameter) instead of one hop per pass (a 50-link key
    chain converges in ~5 iterations, not 50).

    ``to_state_fn``: optional replacement for the md5+prefix key builder —
    a map_batches fn producing (key, doc_id, label) rows; the built-in keys
    form equivalence cliques (diameter 1), so chain-shaped graphs only
    arise with custom keys. ``stats``: when given, ``stats["iters"]``
    records the iteration count (convergence evidence for tests).

    Graph: docs are connected when they share ANY dedup key (exact md5 OR
    24-char prefix — both SQL-expressible, so the DuckDB oracle can recompute
    the exact components with a recursive CTE). Components = transitive
    closure; label = min doc_id in the component.

    Dataflow per iteration (alternating min propagation, all COARSE):
      1. key-min:  ``groupby(key).aggregate(Min)`` — Ray's aggregate combines
         PER BLOCK before the shuffle, so a hot key (one text duplicated
         millions of times) contributes one partial row per block, never its
         full row set, to the shuffle — the two-level partial-min.
      2. write-back: state rows ∪ key-min rows hash-cogrouped on
         ``hash(key) % CC_PARTS`` and merged with ONE vectorized pandas merge
         per partition (a hot key's state rows do co-locate here — ~tens of
         bytes/row, linear merge; the min itself was already two-level).
      3. doc-min: cogroup on ``hash(doc_id) % CC_PARTS`` + per-partition
         ``groupby(doc_id).transform("min")`` — doc groups are exactly
         2 rows (md5 + prefix key), so no skew exists on this side.
    Labels only decrease, so Sum(label) is a monotone fixpoint detector —
    the driver loop stops when it stops changing (a tiny scalar aggregate
    per round; state is materialized per iteration like any iterative
    algorithm).
    """
    from ray.data.aggregate import Sum

    def to_state(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        keys, doc_ids = [], []
        for d, t, h in zip(ids, texts, md5_hex(texts)):
            keys.append("m:" + h)
            doc_ids.append(d)
            keys.append("p:" + (t or "")[:24])
            doc_ids.append(d)
        return pa.table(
            {
                "key": pa.array(keys, type=pa.string()),
                "doc_id": pa.array(doc_ids),
                "label": pa.array(doc_ids),
            }
        )

    def tag_state(df: pd.DataFrame) -> pa.Table:
        # arrow out on every stage feeding a shuffle: pandas blocks would be
        # converted by Ray with the unhashable b'pandas' schema metadata
        df = df[["key", "doc_id", "label"]].copy()
        df["is_min"] = np.int8(0)
        df["part"] = _cg_part(df["key"], CC_PARTS)
        return _fpc(df)

    def tag_kmin(df: pd.DataFrame) -> pa.Table:
        # doc_id is never read off min rows — label (itself a doc id) fills
        # it so the union schema and dtypes match the state side exactly
        df = df.rename(columns={"kmin": "label"})
        df = df.assign(doc_id=df["label"], is_min=np.int8(1))
        df["part"] = _cg_part(df["key"], CC_PARTS)
        return _fpc(df[["key", "doc_id", "label", "is_min", "part"]])

    def merge_kmin(g: pd.DataFrame) -> pd.DataFrame:
        mins = g.loc[g["is_min"] == 1, ["key", "label"]].rename(
            columns={"label": "kmin"}
        )
        rows = g.loc[g["is_min"] == 0, ["key", "doc_id", "label"]]
        if rows.empty or mins.empty:
            # co-hashing makes a min-less partition impossible unless the
            # partition has no state rows at all — never drop state rows
            return rows
        m = rows.merge(mins, on="key")  # every state key has its min row
        m["label"] = m["kmin"]
        return m[["key", "doc_id", "label"]]

    def doc_min_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["key", "doc_id", "label"]].copy()
        g["label"] = g.groupby("doc_id")["label"].transform("min")
        return g

    # --- pointer-jumping (label doubling): label <- label[label] ----------
    # Min propagation alone moves ONE key-hop per iteration, so a chain of
    # linked dup keys needs diameter-many passes. Following the label's own
    # label each round halves the remaining distance (O(log diameter)
    # convergence — Shiloach-Vishkin style), at the cost of one extra keyed
    # cogroup per iteration. label(d) <= d always holds (labels start at
    # doc_id and only decrease), so jumped labels stay within the component
    # and monotone — the Sum fixpoint detector is unaffected.

    def tag_jump(df: pd.DataFrame) -> pa.Table:
        # ONE pass emits both sides of the jump cogroup: state rows keyed
        # by their LABEL, plus doc->label map rows keyed by the doc's own
        # id. Per-batch map duplicates (a doc's md5+prefix rows, or a doc
        # split across batches) are harmless: every copy carries the SAME
        # post-doc-min label, and the merge partition dedups on jkey.
        s = df[["key", "doc_id", "label"]].copy()
        s["jkey"] = s["label"]
        s["is_map"] = np.int8(0)
        m = df[["doc_id", "label"]].drop_duplicates("doc_id").copy()
        m = m.rename(columns={"doc_id": "jkey"})
        m["key"] = ""
        m["doc_id"] = m["jkey"]
        m["is_map"] = np.int8(1)
        both = pd.concat(
            [s, m[["key", "doc_id", "label", "jkey", "is_map"]]],
            ignore_index=True,
        )
        both["jpart"] = _cg_part(both["jkey"], CC_PARTS)
        return _fpc(both)

    def merge_jump(g: pd.DataFrame) -> pa.Table:
        m = g.loc[g["is_map"] == 1, ["jkey", "label"]].drop_duplicates(
            "jkey"
        ).rename(columns={"label": "jlabel"})
        rows = g.loc[g["is_map"] == 0, ["key", "doc_id", "label", "jkey"]]
        if rows.empty:
            return _fpc(rows[["key", "doc_id", "label"]])
        out = rows.merge(m, on="jkey", how="left")
        # every label IS a doc_id, so its map row co-hashes here; the
        # fillna is belt-and-braces for an empty map partition
        out["label"] = out["jlabel"].fillna(out["label"]).astype(np.int64)
        return _fpc(out[["key", "doc_id", "label"]])

    state = docs_ds.map_batches(
        to_state_fn or to_state, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # --- driver fold fast path (size-gated) --------------------------------
    # Each distributed iteration is ~4 shuffle exchanges; on a small state
    # table that is pure fixed overhead (measured: 1.9 s for 256 edges).
    # Below the budget the SAME min-propagation + pointer-jump loop runs as
    # vectorized pandas on the driver — identical labels (min doc_id per
    # component), identical loud-failure guard, stats["iters"] comparable.
    # Pass driver_budget_rows=0 to force the distributed rounds (tests do).
    if driver_budget_rows is None:
        from .. import config as _cfg

        driver_budget_rows = _cfg.CC_DRIVER_FOLD_ROWS
    if state.count() <= driver_budget_rows:
        import ray.data as _rd

        df = state.to_pandas()
        if df.empty:
            from ..common import typed_empty

            if stats is not None:  # parity with the distributed path,
                stats["iters"] = 0  # which always records a count
            return typed_empty(doc_id=pa.int64(), component=pa.int64())
        prev_sig = None
        n_it = 0
        converged_local = False
        for _ in range(max_iters):
            n_it += 1
            df["label"] = df.groupby("key")["label"].transform("min")
            df["label"] = df.groupby("doc_id")["label"].transform("min")
            # pointer jump: label <- label(label). Every label IS a doc_id
            # present in the table, so the reindex always hits.
            doc_lab = df.groupby("doc_id")["label"].min()
            lab = df["label"].to_numpy()
            jumped = doc_lab.reindex(lab).to_numpy()
            # belt-and-braces like merge_jump's fillna: labels are always
            # doc_ids present in the table, so jumped should never be NaN
            df["label"] = np.where(
                np.isnan(jumped), lab, jumped
            ).astype(np.int64)
            sig = int(df["label"].sum())
            if sig == prev_sig:
                converged_local = True
                break
            prev_sig = sig
        if stats is not None:
            stats["iters"] = n_it
        if not converged_local:
            raise RuntimeError(
                f"connected_components_labels did not converge in "
                f"{max_iters} iterations; raise max_iters (component "
                f"key-chain diameter exceeds ~2^{max_iters})"
            )
        out = (
            df.groupby("doc_id", as_index=False)["label"]
            .min()
            .rename(columns={"label": "component"})
        )
        out["doc_id"] = out["doc_id"].astype(np.int64)
        out["component"] = out["component"].astype(np.int64)
        return _rd.from_arrow(
            pa.Table.from_pandas(
                out[["doc_id", "component"]], preserve_index=False
            )
        )

    prev = None
    from ..common import cogroup_agg

    def _kmin_partial(b: pa.Table) -> pa.Table:
        # per-block combine keeps a hot key at one partial row per block
        # (the two-level partial-min), with the merge done by cogroup —
        # keys number 2× docs, past the per-key-Aggregate cliff
        g = b.select(["key", "label"]).group_by("key").aggregate(
            [("label", "min")]
        )
        # select by NAME before renaming: pyarrow versions differ on
        # whether aggregate columns precede or follow the group keys
        return g.select(["key", "label_min"]).rename_columns(
            ["key", "label"]
        )

    converged = False
    n_iters = 0
    for _ in range(max_iters):
        n_iters += 1
        key_min = cogroup_agg(
            state.map_batches(_kmin_partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=65536),
            "key", {"kmin": ("label", "min")},
        )
        # coalesce both cogroup inputs: the sort-groupby makes one output
        # range per input block, and ranges beyond the occupied part
        # values come out empty and schema-less (executor warning spam —
        # the minhash join's 16-over-64 spacing rule)
        tagged = (
            state.map_batches(tag_state, batch_format="pandas")
            .union(key_min.map_batches(tag_kmin, batch_format="pandas"))
            .repartition(16)
        )
        after_key = tagged.groupby("part").map_groups(
            merge_kmin, batch_format="pandas"
        )
        after_doc = (
            after_key.map_batches(
                lambda df: _fpc(
                    df.assign(dpart=_cg_part(df["doc_id"], CC_PARTS))
                ),
                batch_format="pandas",
            )
            .repartition(16)
            .groupby("dpart")
            .map_groups(doc_min_part, batch_format="pandas")
        )
        state = (
            after_doc.map_batches(tag_jump, batch_format="pandas")
            .repartition(16)
            .groupby("jpart")
            .map_groups(merge_jump, batch_format="pandas")
        ).materialize()
        sig = state.aggregate(Sum("label", alias_name="s"))["s"]
        if sig == prev:
            converged = True
            break
        prev = sig
    if stats is not None:
        stats["iters"] = n_iters
    if not converged:
        # with pointer jumping, reach grows ~2^iters, so non-convergence in
        # max_iters means a component diameter past ~2^max_iters — still
        # fail loudly rather than return silently WRONG intermediate labels
        # (diverging from the exact recursive-CTE oracle)
        raise RuntimeError(
            f"connected_components_labels did not converge in {max_iters} "
            "iterations; raise max_iters (component key-chain diameter "
            f"exceeds ~2^{max_iters})"
        )
    # doc_id keys are corpus-cardinality: coarse cogroup, not per-key agg
    return cogroup_agg(state, "doc_id", {"component": ("label", "min")})


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHashStage:
    """64-bit SimHash per doc + 4 rotated 16-bit prefix buckets (so any pair
    within hamming distance 3 shares ≥1 bucket by pigeonhole on 4 blocks)."""

    def __init__(self):
        self.token = re.compile(r"\w+")

    def simhash(self, text: str) -> int:
        toks = self.token.findall((text or "").lower())
        if not toks:
            return 0
        hv = np.fromiter((zlib.crc32(t.encode()) ^ (zlib.crc32(t[::-1].encode()) << 32)
                          for t in toks), dtype=np.uint64, count=len(toks))
        bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        vote = (2 * bits - 1).sum(axis=0)
        return int(((vote > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_block, out_key, out_hash = [], [], [], []
        for d, t in zip(doc_ids, texts):
            h = self.simhash(t)
            for blk in range(4):
                out_doc.append(d)
                out_block.append(blk)
                out_key.append((h >> (16 * blk)) & 0xFFFF)
                out_hash.append(np.uint64(h).astype(np.int64).item())
        return pa.table(
            {
                "doc_id": pa.array(out_doc),
                "block": pa.array(out_block, type=pa.int32()),
                "block_key": pa.array(out_key, type=pa.int64()),
                "simhash": pa.array(out_hash, type=pa.int64()),
            }
        )


def _popcount64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    c = np.zeros(x.shape, dtype=np.int64)
    for shift in range(0, 64, 8):
        c += _POP8[(x >> np.uint64(shift)).astype(np.uint64) & np.uint64(0xFF)]
    return c


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def _simhash_salt_pairs(g: pd.DataFrame, max_hamming: int,
                        max_bucket: int = 1000) -> pd.DataFrame:
    """All buckets of one salted group: full pairwise hamming check within
    each exact block_key bucket (vectorized popcount on the xor matrix).
    A pathological bucket larger than ``max_bucket`` falls back to star
    comparison against its min doc (documented skew cap — k² would blow up)."""
    g = g.drop_duplicates(["doc_id", "block"]).sort_values(["block_key", "doc_id"])
    out_a, out_b, out_h = [], [], []
    for _, b in g.groupby("block_key", sort=False):
        if len(b) < 2:
            continue
        ids = b["doc_id"].to_numpy()
        hs = b["simhash"].to_numpy().astype(np.uint64)
        if len(b) > max_bucket:
            ham = _popcount64(hs[1:] ^ hs[0])
            keep = ham <= max_hamming
            out_a.extend([ids[0]] * int(keep.sum()))
            out_b.extend(ids[1:][keep])
            out_h.extend(ham[keep])
            continue
        iu = np.triu_indices(len(ids), k=1)
        ham = _popcount64(hs[iu[0]] ^ hs[iu[1]])
        keep = ham <= max_hamming
        out_a.extend(ids[iu[0][keep]])
        out_b.extend(ids[iu[1][keep]])
        out_h.extend(ham[keep])
    return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h})


def simhash_candidates(docs_ds, max_hamming: int = 3, concurrency=None):
    """SimHash near-dup candidates via salted block-key groupby (same salting
    rationale as minhash_candidates: bounded groups, vectorized inner work)."""
    from ray.data.aggregate import Min

    if concurrency is None:
        hashed = docs_ds.map_batches(
            per_worker_stage(SimHashStage),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    else:
        hashed = docs_ds.map_batches(
            SimHashStage, batch_format="pyarrow", zero_copy_batch=True,
            concurrency=concurrency,
        )
    salted = hashed.map_batches(
        lambda t: t.append_column(
            "salt", pc.cast(pc.bit_wise_and(t["block_key"], PAIR_SALT - 1), pa.int32())
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = salted.groupby(["block", "salt"]).map_groups(
        lambda g: _simhash_salt_pairs(g, max_hamming), batch_format="pandas"
    )
    # sparse candidate-pair keys: engine Aggregate (see minhash_pairs)
    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------

class EmbeddingDupStage:
    """Coarse sign-LSH bucket key over the embedding column: sign bits of
    8 fixed random projections → bucket id; exact cosine verify runs per
    bucket after the groupby."""

    def __init__(self, dim: int = 64, n_planes: int = 8, seed: int = 99):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float32)
        if emb.size == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "bucket": pa.array([], type=pa.int64()),
                             "embedding": batch.column("embedding")})
        signs = (emb @ self.planes) > 0
        bucket = (signs.astype(np.int64) << np.arange(signs.shape[1])).sum(axis=1)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "bucket": pa.array(bucket),
                "embedding": batch.column("embedding"),
            }
        )


def _cosine_bucket_pairs(g: pd.DataFrame, threshold: float,
                         max_bucket: int = 1000) -> pd.DataFrame:
    """Exact cosine verify within one sign-LSH bucket. A pathological bucket
    larger than ``max_bucket`` falls back to star comparison against its min
    vec (same documented skew cap as `_simhash_salt_pairs` — the k² matmul
    would be quadratic in the bucket)."""
    g = g.sort_values("vec_id")
    ids = g["vec_id"].to_numpy()
    mat = np.asarray(g["embedding"].tolist(), dtype=np.float32)
    if len(ids) < 2:
        # typed empty frame: untyped [] columns default a/b to float64 and
        # clash with the int64 ids of non-empty buckets at schema unification
        return pd.DataFrame(
            {
                "a": pd.Series([], dtype=ids.dtype),
                "b": pd.Series([], dtype=ids.dtype),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.maximum(norms, 1e-9)
    if len(ids) > max_bucket:
        sims = mat[1:] @ mat[0]
        sel = sims >= threshold
        return pd.DataFrame(
            {
                "a": np.full(int(sel.sum()), ids[0]),
                "b": ids[1:][sel],
                "cosine": np.round(sims[sel].astype(float), 6),
            }
        )
    sims = mat @ mat.T
    iu = np.triu_indices(len(ids), k=1)
    sel = sims[iu] >= threshold
    return pd.DataFrame(
        {
            "a": ids[iu[0][sel]],
            "b": ids[iu[1][sel]],
            "cosine": np.round(sims[iu][sel].astype(float), 6),
        }
    )


def embedding_near_dups(emb_ds, threshold: float = 0.95, concurrency=None,
                        n_planes: int = 8, max_bucket: int = 1000):
    """Embedding near-dup pairs via sign-LSH buckets + exact cosine verify.

    Bucket count is 2^n_planes — callers scale ``n_planes`` with corpus size
    (≈ log2(n / target_bucket_size)) so expected bucket size stays bounded;
    ``max_bucket`` is the hard skew cap (star fallback) for adversarial
    inputs where many vectors share one bucket regardless of planes."""
    from ray.data.aggregate import Max

    if concurrency is None:
        bucketed = emb_ds.map_batches(
            per_worker_stage(EmbeddingDupStage, n_planes=n_planes),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    else:
        bucketed = emb_ds.map_batches(
            EmbeddingDupStage, batch_format="pyarrow", zero_copy_batch=True,
            fn_constructor_kwargs={"n_planes": n_planes},
            concurrency=concurrency,
        )
    pairs = bucketed.groupby("bucket").map_groups(
        lambda g: _cosine_bucket_pairs(g, threshold, max_bucket),
        batch_format="pandas",
    )
    # sparse candidate-pair keys: engine Aggregate (see minhash_pairs)
    return pairs.groupby(["a", "b"]).aggregate(Max("cosine", alias_name="cosine"))


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup verification (exact, oracle-checkable)
# ---------------------------------------------------------------------------

def _empty_jaccard_frame() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_a": pd.Series(dtype="int64"),
            "doc_b": pd.Series(dtype="int64"),
            "jaccard3": pd.Series(dtype="float64"),
        }
    )


def ngram_jaccard_pairs(docs_ds, prefix_n: int = 32, gram: int = 3,
                        threshold: float = 0.8, max_block: int = 1000):
    """Near-dup pairs with EXACT character-n-gram Jaccard similarity:
    candidate generation by prefix blocking (docs sharing their first
    ``prefix_n`` characters), verification by trigram-set Jaccard ≥
    ``threshold``. Unlike MinHash/SimHash this is deterministic and
    SQL-expressible, so it is the oracle-checked member of the near-dup
    family (the sketch-based members trade exactness for candidate recall
    at lower cost).

    Shape: the shuffle key is hash(prefix) % PAIR_SALT — each map_groups
    call handles MANY prefix blocks with one vectorized prefilter (only
    multi-member prefixes enter the pair loop), never one Python call per
    prefix. A prefix block larger than ``max_block`` (a templated corpus's
    hot prefix) falls back to STAR comparison against the block's min
    doc_id — the same skew cap as `_pairs_from_salt_group`/
    `_simhash_salt_pairs` — bounding the otherwise-quadratic block at O(k)
    comparisons (only reachable on blocks exact dedup should have collapsed
    first; below the cap, output equals the exact all-pairs oracle).
    Python's ``t[i:i+3]`` slices characters, matching SQL
    ``substr(text, g, 3)`` semantics."""

    def _add_pfx(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        pfx = [(t or "")[:prefix_n] for t in texts]
        part = np.fromiter(
            (zlib.crc32(p.encode("utf-8")) % PAIR_SALT for p in pfx),
            dtype=np.int32, count=len(pfx),
        )
        return b.append_column(
            "pfx", pa.array(pfx, type=pa.string())
        ).append_column("part", pa.array(part))

    def _block_rows(ids, texts):
        sets = [
            {t[i:i + gram] for i in range(len(t) - gram + 1)}
            for t in ((s or "") for s in texts)
        ]
        rows = []
        if len(ids) > max_block:  # skew cap: star vs the min-doc anchor
            # no silent caps: this diverges from the exact all-pairs oracle
            # on a hot-prefix corpus — say so in the worker log
            _LOG.warning(
                "ngram_jaccard_pairs: prefix block of %d docs exceeds "
                "max_block=%d — star fallback (output is a subset of the "
                "exact all-pairs oracle for this block)",
                len(ids), max_block,
            )
            s0 = sets[0]
            for j in range(1, len(ids)):
                inter = len(s0 & sets[j])
                union = len(s0) + len(sets[j]) - inter
                if union and inter / union >= threshold:
                    rows.append((int(ids[0]), int(ids[j]), inter / union))
            return rows
        for i in range(len(ids)):
            si = sets[i]
            for j in range(i + 1, len(ids)):
                inter = len(si & sets[j])
                union = len(si) + len(sets[j]) - inter
                if union and inter / union >= threshold:
                    rows.append((int(ids[i]), int(ids[j]), inter / union))
        return rows

    def _part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        multi = g[g.duplicated("pfx", keep=False)]
        if multi.empty:
            return _empty_jaccard_frame()
        multi = multi.sort_values(["pfx", "doc_id"], kind="mergesort")
        rows = []
        for _, blk in multi.groupby("pfx", sort=False):
            rows.extend(
                _block_rows(blk["doc_id"].to_numpy(), blk["text"].tolist())
            )
        if not rows:
            return _empty_jaccard_frame()
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard3"])

    keyed = docs_ds.map_batches(
        _add_pfx, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )
    return keyed.groupby("part").map_groups(_part_pairs, batch_format="pandas")


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance over UTF-8 BYTES, two-row DP — DuckDB's
    ``levenshtein()`` is byte-based ('café' vs 'cafe' = 2, not 1; verified
    live), so byte semantics are what keep fuzzy_pairs oracle-checkable on
    non-ASCII text. O(len·len) per call over TRUNCATED strings only."""
    if a == b:
        return 0
    ab, bb = a.encode("utf-8"), b.encode("utf-8")
    prev = list(range(len(bb) + 1))
    for i, ca in enumerate(ab, 1):
        cur = [i]
        for j, cb in enumerate(bb, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _byte_matrix(texts):
    """(n, width) int16 UTF-8 byte matrix (zero-padded to the longest row)
    + per-row BYTE lengths — DuckDB levenshtein counts bytes, so the DP
    must too. int16 (not uint8) so the zero pad can never collide with a
    real byte after the per-pair (len_a, len_b) cell read."""
    enc = [t.encode("utf-8") for t in texts]
    ln = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
    width = int(ln.max()) if len(enc) else 0
    M = np.zeros((len(enc), max(width, 1)), dtype=np.int16)
    for i, e in enumerate(enc):
        if e:
            M[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
    return M, ln


def _lev_pairs(a_list, b_list) -> np.ndarray:
    """Levenshtein distance for MANY string pairs at once: the classic
    two-row DP with the pair axis vectorized in numpy — width² scalar
    steps of P-vector kernels instead of P·width² Python steps (≈100×
    on the fuzzy_pairs verify). Strings are UTF-8 byte arrays padded to
    the longest row; each pair's answer is read at its own (len_a, len_b)
    cell, so padding never affects the result. Bit-identical to
    :func:`levenshtein` (property-tested)."""
    P = len(a_list)
    if P == 0:
        return np.empty(0, dtype=np.int64)
    A, la = _byte_matrix(a_list)
    B, lb = _byte_matrix(b_list)
    width = max(A.shape[1], B.shape[1])
    if A.shape[1] < width:
        A = np.pad(A, ((0, 0), (0, width - A.shape[1])))
    if B.shape[1] < width:
        B = np.pad(B, ((0, 0), (0, width - B.shape[1])))
    return _lev_core(A, la, B, lb, width)


#: pairs per vectorized-DP chunk: bounds the DP working set (~8 arrays of
#: chunk×(width+1) int16/int32 ≈ tens of MB at width 160) — a partition of
#: several near-cap prefix blocks would otherwise build one multi-GB DP
_LEV_CHUNK = 65536


def _lev_pairs_idx(rows: np.ndarray, lens: np.ndarray,
                   ai: np.ndarray, bi: np.ndarray) -> np.ndarray:
    """Pairwise Levenshtein over (ai, bi) index pairs into a shared
    byte-row matrix — rows are decoded ONCE per partition, never per pair;
    the DP runs in fixed-size pair chunks so peak memory is bounded
    regardless of how many hot prefix blocks land in one partition."""
    if len(ai) == 0:
        return np.empty(0, dtype=np.int64)
    out = np.empty(len(ai), dtype=np.int64)
    for lo in range(0, len(ai), _LEV_CHUNK):
        sl = slice(lo, lo + _LEV_CHUNK)
        out[sl] = _lev_core(rows[ai[sl]], lens[ai[sl]],
                            rows[bi[sl]], lens[bi[sl]], rows.shape[1])
    return out


def _lev_core(A, la, B, lb, width: int) -> np.ndarray:
    P = A.shape[0]
    ans = np.empty(P, dtype=np.int64)
    ans[la == 0] = lb[la == 0]  # row 0 of the DP
    prev = np.broadcast_to(
        np.arange(width + 1, dtype=np.int32), (P, width + 1)
    ).copy()
    cur = np.empty_like(prev)
    max_i = int(la.max()) if P else 0
    for i in range(1, max_i + 1):
        cur[:, 0] = i
        ai = A[:, i - 1][:, None]  # (P, 1)
        sub = prev[:, :-1] + (ai != B).astype(np.int32)  # substitution
        dele = prev[:, 1:] + 1  # deletion
        best = np.minimum(sub, dele)
        for j in range(1, width + 1):  # insertion: depends on cur[:, j-1]
            cur[:, j] = np.minimum(best[:, j - 1], cur[:, j - 1] + 1)
        done = la == i
        if done.any():
            ans[done] = cur[done, lb[done]]
        prev, cur = cur, prev
    return ans


def fuzzy_pairs(docs_ds, pfx_n: int = 8, trunc: int = 40,
                max_dist: int = 8, max_block: int = 1000):
    """Edit-distance near-dup pairs: docs sharing their first ``pfx_n``
    characters whose ``trunc``-char prefixes are within ``max_dist``
    Levenshtein edits — the fuzzy-match arm of the dedup family (OCR'd /
    re-keyed corpora where near-dups differ by character noise rather than
    word substitutions; the shingle ops miss sub-word edits). Deterministic
    and SQL-expressible (DuckDB ``levenshtein``), so it joins ngram_jaccard
    as an oracle-checked near-dup member.

    Shape: identical to :func:`ngram_jaccard_pairs` — shuffle key
    ``hash(prefix) % PAIR_SALT``, one vectorized multi-member prefilter per
    partition, quadratic work confined to same-prefix blocks with the
    ``max_block`` star-fallback skew cap (below the cap, output equals the
    exact all-pairs oracle; the DP runs on ``trunc``-char strings, so a
    verify costs O(trunc²) regardless of document length)."""

    def _add_pfx(b: pa.Table) -> pa.Table:
        # NULL text is DROPPED, matching the oracle: SQL's
        # substr(NULL,1,8)=substr(NULL,1,8) join predicate is NULL → no
        # row (a ''-coercion here would emit dist-0 pairs the oracle
        # never produces). Empty-string text stays: ''='' joins in SQL.
        b = b.filter(pc.is_valid(b.column("text")))
        texts = b.column("text").to_pylist()
        pfx = [t[:pfx_n] for t in texts]
        part = np.fromiter(
            (zlib.crc32(p.encode("utf-8")) % PAIR_SALT for p in pfx),
            dtype=np.int32, count=len(pfx),
        )
        heads = pa.array([t[:trunc] for t in texts], type=pa.string())
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "head": heads,
                "pfx": pa.array(pfx, type=pa.string()),
                "part": pa.array(part),
            }
        )

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "dist": pd.Series(dtype="int64"),
            }
        )

    def _block_pairs(lo: int, k: int):
        # candidate (i, j) index pairs for one prefix block of k rows
        # starting at partition offset lo
        if k > max_block:  # skew cap: star vs the min-doc anchor
            # no silent caps: diverges from the exact all-pairs oracle on a
            # hot-prefix corpus — say so in the worker log
            _LOG.warning(
                "fuzzy_pairs: prefix block of %d docs exceeds max_block=%d "
                "— star fallback (output is a subset of the exact "
                "all-pairs oracle for this block)", k, max_block,
            )
            return (
                np.full(k - 1, lo, dtype=np.int64),
                np.arange(lo + 1, lo + k, dtype=np.int64),
            )
        iu = np.triu_indices(k, 1)
        return iu[0] + lo, iu[1] + lo

    def _part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        multi = g[g.duplicated("pfx", keep=False)]
        if multi.empty:
            return _empty()
        multi = multi.sort_values(["pfx", "doc_id"], kind="mergesort")
        # gather every candidate index pair across the partition's prefix
        # blocks, then run ONE pair-vectorized DP over all of them — the
        # scalar-python DP measured 11.9 s at sf0.1 vs ~0.6 s vectorized
        sizes = multi.groupby("pfx", sort=False).size().to_numpy()
        offs = np.r_[0, np.cumsum(sizes)[:-1]]
        ai, bi = [], []
        for lo, k in zip(offs, sizes):
            pi, pj = _block_pairs(int(lo), int(k))
            ai.append(pi)
            bi.append(pj)
        ai, bi = np.concatenate(ai), np.concatenate(bi)
        H, hl = _byte_matrix(multi["head"].tolist())
        dist = _lev_pairs_idx(H, hl, ai, bi)
        keep = dist <= max_dist
        if not keep.any():
            return _empty()
        ids = multi["doc_id"].to_numpy()
        return pd.DataFrame(
            {
                "a": ids[ai[keep]].astype(np.int64),
                "b": ids[bi[keep]].astype(np.int64),
                "dist": dist[keep].astype(np.int64),
            }
        )

    keyed = docs_ds.map_batches(
        _add_pfx, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )
    return keyed.groupby("part").map_groups(_part_pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# prefix-containment dedup (range-sort + boundary exchange)
# ---------------------------------------------------------------------------

def prefix_contained(docs_ds):
    """Docs whose text is a PROPER prefix of another doc's text — the
    containment arm of dedup (truncated re-crawls, partial uploads).

    Shape: a text T is a proper prefix of some other text iff T's immediate
    DISTINCT lexicographic successor starts with T (any string between T
    and an extension of T must itself extend T). So one global range sort
    by text makes the check local: each sorted block resolves every
    distinct text against its in-block successor with one vectorized
    ``np.char.startswith``; only each block's LAST distinct text needs its
    successor from the next block. That boundary is fixed up with a tiny
    exchange — 3 strings per block (first / second-distinct / last) ride to
    the driver, which resolves the ≤ n_blocks boundary texts and broadcasts
    the flagged ones for a second streaming pass. Nothing but doc_id flags
    and the 3-strings-per-block metas ever leave the cluster; the sort is
    the one all-to-all, as for any order-based dedup."""
    import ray

    from ..common import cached_broadcast

    s = docs_ds.select_columns(["doc_id", "text"]).sort("text")

    OUT_SCHEMA = pa.schema(
        [("kind", pa.string()), ("doc_id", pa.int64()),
         ("first", pa.string()), ("second", pa.string()),
         ("last", pa.string())]
    )

    def _block(b: pa.Table) -> pa.Table:
        # NULL text can never be (or have) a prefix; factorize would map it
        # to code -1, which then indexes flag[-1] (the LAST distinct's flag)
        # and mis-flags the null rows — drop them first (fuzzy_pairs' guard)
        b = b.filter(pc.is_valid(b.column("text")))
        if b.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        df = b.to_pandas()  # sorted by text within the block (range sort)
        codes, uniq = pd.factorize(df["text"])  # codes nondecreasing
        uniq = uniq.to_numpy(dtype=object)
        nu = len(uniq)
        flag = np.zeros(nu, dtype=bool)
        if nu > 1:
            # distinct != successor + startswith ⇒ strictly longer ⇒ proper
            flag[:-1] = np.char.startswith(
                uniq[1:].astype(str), uniq[:-1].astype(str)
            )
        keep = flag[codes]
        ids = df.loc[keep, "doc_id"].to_numpy(np.int64)
        n = len(ids)
        return pa.table(
            {
                "kind": pa.array(["f"] * n + ["b"], type=pa.string()),
                "doc_id": pa.array(np.append(ids, -1), type=pa.int64()),
                "first": pa.array([None] * n + [uniq[0]], type=pa.string()),
                "second": pa.array(
                    [None] * n + [uniq[1] if nu > 1 else None],
                    type=pa.string(),
                ),
                "last": pa.array([None] * n + [uniq[-1]], type=pa.string()),
            }
        )

    flagged = s.map_batches(
        _block, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,  # one call per sorted range block
    ).materialize()  # consumed twice: doc flags (bounded by dup count) + metas

    def _only(kind: str):
        # filter AND project in one map: a filter-only pass leaves empty
        # blocks carrying the full 5-column schema, which then skip the
        # select_columns map and mix schemas downstream (executor warning)
        def _f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["kind"], kind))
            return t if kind == "b" else t.select(["doc_id"])

        return _f

    # boundary resolution: O(n_blocks) rows, pure driver logic
    metas = (
        flagged.map_batches(
            _only("b"), batch_format="pyarrow", zero_copy_batch=True
        )
        .to_pandas()
        .sort_values(["first", "last"])  # recovers block range order
        .reset_index(drop=True)
    )
    boundary_flagged = []
    firsts = metas["first"].tolist()
    seconds = metas["second"].tolist()
    lasts = metas["last"].tolist()
    for i, t in enumerate(lasts):
        for j in range(i + 1, len(lasts)):
            # blocks are ranges: first[j] >= last[i]; == means the run of t
            # continues into block j, whose second-distinct (if any) is then
            # the true successor; a block entirely equal to t has none
            if firsts[j] > t:
                if firsts[j].startswith(t):
                    boundary_flagged.append(t)
                break
            if seconds[j] is not None:
                if seconds[j].startswith(t):
                    boundary_flagged.append(t)
                break
    bset_ref = ray.put(set(boundary_flagged))

    def _boundary_rows(b: pa.Table) -> pa.Table:
        bset = cached_broadcast(bset_ref)
        if not bset:
            return pa.table({"doc_id": pa.array([], type=pa.int64())})
        keep = pc.is_in(
            b.column("text"), value_set=pa.array(sorted(bset), type=pa.string())
        )
        return pa.table({"doc_id": pc.filter(b.column("doc_id"), keep)})

    in_block = flagged.map_batches(
        _only("f"), batch_format="pyarrow", zero_copy_batch=True
    )
    at_boundary = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        _boundary_rows, batch_format="pyarrow", zero_copy_batch=True,
    )
    # a run spanning blocks is flagged by BOTH paths — distinct on doc_id.
    # Both sides are flag rows (bounded by the contained-dup count), so a
    # 4-block coalesce keeps the distinct groupby from fanning one sort
    # range per upstream block (empty-partition overhead at small scale).
    return (
        in_block.union(at_boundary)
        .repartition(4)
        .groupby("doc_id")
        .count()
        .select_columns(["doc_id"])
    )


def substring_dup_docs(docs_ds_factory, w: int = 64,
                       broadcast_max: int = 4_000_000):
    """Docs sharing any EXACT ``w``-char substring window with another doc
    — the exact-substring dedup primitive (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): boilerplate headers,
    templated passages and verbatim re-crawls that word-shingle ops
    (dup_phrases) see only after tokenization. Deterministic and
    SQL-expressible, so oracle-checked.

    Shape — HASH candidates, EXACT verify (three fully-vectorized stages;
    the first string-keyed version paid ~1 Python dict op per corpus char
    and shuffled 72-byte window strings):
      1. per-batch: u64 rolling hashes of every window via ONE UTF-32
         codepoint array per batch (w shifted multiply-adds, boundary
         windows masked) and a sort+reduceat per-hash (min_doc, max_doc)
         combine — 8-byte keys cross the cogroup merge, never strings.
         min ≠ max flags CROSS-DOC hashes (a window in ≥2 docs must
         separate its global min and max doc ids).
      2. candidate extraction, TWO physical forms behind an explicit count
         threshold (``broadcast_max`` dup hashes, default 4M = one 32 MB
         int64 array):
         - fast path (dup set ≤ threshold): the dup-hash set broadcasts as
           one sorted int64 array; a second pass extracts the ACTUAL window
           strings only at hash-hit positions (searchsorted membership —
           Python slicing only on candidates). Zero extra shuffle.
         - scale path (dup set > threshold — boilerplate-heavy crawls where
           cross-doc duplicated content explodes): NOTHING is collected on
           the driver. Window rows (h, doc_id, start) — 8-byte ints, one
           per window, deduped per (h, doc, window-content) within batch —
           semi-join the dup-hash DATASET on ``h % parts`` cogroups (the
           decontaminate-successor shape); surviving (doc_id, start) hits
           then cogroup with the docs text on ``doc_id % parts`` to slice
           the actual window strings. Two extra linear all-to-alls (window
           keys, then one pass of the corpus text) buy bounded memory
           everywhere.
      3. exact confirm: candidate (win, doc) rows cogroup on the window
         STRING and keep docs of windows with ≥2 distinct docs — hash
         collisions die here (either path), so the result is exactly the
         oracle's."""
    from ..common import cache_if_small

    # multi-pass source: one shared materialization below the budget
    docs_ds_factory = cache_if_small(docs_ds_factory)
    import ray

    from ..common import cached_broadcast, cogroup_agg

    def _keep(b: pa.Table):
        mask = pc.and_(
            pc.is_valid(b.column("text")),
            pc.greater_equal(
                pc.utf8_length(
                    pc.fill_null(b.column("text"), "")
                ),
                w,
            ),
        )
        t = b.filter(mask)  # oracle: length(text) >= w guard, NULL dropped
        return (
            t.column("doc_id").to_numpy(zero_copy_only=False).astype(
                np.int64
            ),
            t.column("text").to_pylist(),
        )

    _B = np.uint64(1099511628211)

    def _win_hashes(texts):
        """(hash u64[n], doc_row int64[n], start int64[n]) for every
        w-CHAR window of every text — one codepoint array per batch."""
        enc = [t.encode("utf-32-le") for t in texts]
        lens = np.fromiter(
            (len(e) >> 2 for e in enc), dtype=np.int64, count=len(enc)
        )
        big = np.frombuffer(b"".join(enc), dtype=np.uint32).astype(
            np.uint64
        )
        n = big.size - w + 1
        if n <= 0:
            z = np.empty(0, dtype=np.int64)
            return np.empty(0, dtype=np.uint64), z, z
        h = np.zeros(n, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(w):
                h = h * _B + big[j : j + n]
        starts = np.r_[0, np.cumsum(lens)[:-1]]
        doc_idx = np.repeat(np.arange(len(enc)), lens)[:n]
        pos = np.arange(n)
        valid = pos + w <= (starts + lens)[doc_idx]
        return h[valid], doc_idx[valid], (pos - starts[doc_idx])[valid]

    def _partial(b: pa.Table) -> pa.Table:
        ids, texts = _keep(b)
        h, didx, _ = _win_hashes(texts)
        if h.size == 0:
            return pa.table(
                {"h": pa.array([], type=pa.int64()),
                 "dmin": pa.array([], type=pa.int64()),
                 "dmax": pa.array([], type=pa.int64())}
            )
        d = ids[didx]
        order = np.argsort(h, kind="stable")
        sh, sd = h[order], d[order]
        bnd = np.r_[0, np.flatnonzero(sh[1:] != sh[:-1]) + 1]
        return pa.table(
            {
                "h": pa.array(sh[bnd].view(np.int64)),
                "dmin": pa.array(np.minimum.reduceat(sd, bnd)),
                "dmax": pa.array(np.maximum.reduceat(sd, bnd)),
            }
        )

    dup_ds = cogroup_agg(
        docs_ds_factory().map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        ),
        "h", {"dmin": ("dmin", "min"), "dmax": ("dmax", "max")},
    ).map_batches(
        lambda t: t.filter(pc.not_equal(t["dmin"], t["dmax"])).select(["h"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # The dup-hash dataset is consumed either way (count + one read), and
    # it is bounded by cross-doc duplicated content — materializing it in
    # the OBJECT STORE is strictly smaller than the old unconditional
    # driver collect.
    dup_ds = dup_ds.materialize()
    n_dup = dup_ds.count()

    def _cand_broadcast():
        """Fast path: dup-hash set fits one broadcast array — extract hit
        windows with zero additional shuffle."""
        chunks = [
            bt.column("h").to_numpy(zero_copy_only=False)
            for bt in dup_ds.iter_batches(batch_format="pyarrow")
        ]
        dup_h = np.sort(np.concatenate(chunks)) if chunks else np.empty(
            0, dtype=np.int64
        )
        ref = ray.put(dup_h)

        def _cand(b: pa.Table) -> pa.Table:
            dup = cached_broadcast(ref)
            ids, texts = _keep(b)
            h, didx, st = _win_hashes(texts)
            empty = pa.table(
                {"win": pa.array([], type=pa.string()),
                 "doc_id": pa.array([], type=pa.int64())}
            )
            if h.size == 0 or dup.size == 0:
                return empty
            i = np.searchsorted(dup, h.view(np.int64))
            hit = (i < dup.size) & (dup[np.minimum(i, dup.size - 1)]
                                    == h.view(np.int64))
            if not hit.any():
                return empty
            rows = pd.DataFrame(
                {
                    "win": [
                        texts[di][s0 : s0 + w]
                        for di, s0 in zip(didx[hit], st[hit])
                    ],
                    "doc_id": ids[didx[hit]],
                }
            ).drop_duplicates()
            return _fpc(rows, preserve_index=False)

        return docs_ds_factory().map_batches(
            _cand, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )

    SEMI_PARTS = COGROUP_PARTS
    SEMI_COALESCE = COGROUP_PARTS // 4  # occupied-range rule (minhash join)

    def _cand_semi_join():
        """Scale path: candidate windows semi-join the dup-hash DATASET on
        ``h % parts`` cogroups; hits join the docs text on ``doc_id %
        parts`` to slice the window strings. No driver state at any size."""

        def _win_rows(b: pa.Table) -> pa.Table:
            # (h, doc_id, start) per window, deduped to one position per
            # (h, doc, DISTINCT window content): same-doc repeats of the
            # same string collapse (boilerplate within a doc), while the
            # astronomically-rare same-doc same-hash DIFFERENT-string
            # collision keeps both positions — exactness is preserved, the
            # strings are compared locally only inside multi-position
            # groups.
            ids, texts = _keep(b)
            h, didx, st = _win_hashes(texts)
            if h.size == 0:
                return pa.table(
                    {"h": pa.array([], type=pa.int64()),
                     "doc_id": pa.array([], type=pa.int64()),
                     "start": pa.array([], type=pa.int64()),
                     "is_dup": pa.array([], type=pa.int8()),
                     "part": pa.array([], type=pa.int32())}
                )
            d = ids[didx]
            order = np.lexsort((st, d, h))
            hs, ds_, ss = h[order], d[order], st[order]
            di = didx[order]
            new = np.r_[True, (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])]
            bnd = np.flatnonzero(new)
            sizes = np.diff(np.r_[bnd, hs.size])
            keep = [bnd[sizes == 1]]
            extra = []
            for k, sz in zip(bnd[sizes > 1], sizes[sizes > 1]):
                seen = set()
                for j in range(k, k + int(sz)):
                    wstr = texts[di[j]][ss[j] : ss[j] + w]
                    if wstr not in seen:
                        seen.add(wstr)
                        extra.append(j)
            kee = np.sort(np.concatenate(
                [keep[0], np.asarray(extra, dtype=np.int64)]
            )) if extra else keep[0]
            return pa.table(
                {
                    "h": pa.array(hs[kee].view(np.int64)),
                    "doc_id": pa.array(ds_[kee]),
                    "start": pa.array(ss[kee].astype(np.int64)),
                    "is_dup": pa.array(np.zeros(kee.size, dtype=np.int8)),
                    "part": pa.array(
                        (hs[kee] % np.uint64(SEMI_PARTS)).astype(np.int32)
                    ),
                }
            )

        def _dup_side(t: pa.Table) -> pa.Table:
            hv = t.column("h").to_numpy(zero_copy_only=False)
            n = hv.size
            return pa.table(
                {
                    "h": t.column("h"),
                    "doc_id": pa.array(np.full(n, -1, dtype=np.int64)),
                    "start": pa.array(np.full(n, -1, dtype=np.int64)),
                    "is_dup": pa.array(np.ones(n, dtype=np.int8)),
                    "part": pa.array(
                        (hv.view(np.uint64) % np.uint64(SEMI_PARTS)).astype(
                            np.int32
                        )
                    ),
                }
            )

        def _semi(g: pd.DataFrame) -> pa.Table:
            dup = g.loc[g["is_dup"] == 1, "h"].unique()
            rows = g.loc[g["is_dup"] == 0, ["h", "doc_id", "start"]]
            hit = rows[rows["h"].isin(dup)] if dup.size else rows.iloc[:0]
            out = hit[["doc_id", "start"]].copy()
            out["dpart"] = (
                out["doc_id"].to_numpy(np.int64) % SEMI_PARTS
            ).astype(np.int32)
            out["text"] = ""
            out["is_text"] = np.int8(0)
            return _fpc(out[["doc_id", "start", "text", "is_text", "dpart"]])

        def _text_side(b: pa.Table) -> pa.Table:
            ids, texts = _keep(b)
            n = ids.size
            return pa.table(
                {
                    "doc_id": pa.array(ids),
                    "start": pa.array(np.full(n, -1, dtype=np.int64)),
                    "text": pa.array(texts, type=pa.string()),
                    "is_text": pa.array(np.ones(n, dtype=np.int8)),
                    "dpart": pa.array(
                        (ids % SEMI_PARTS).astype(np.int32)
                    ),
                }
            )

        def _extract(g: pd.DataFrame) -> pa.Table:
            t = g.loc[g["is_text"] == 1, ["doc_id", "text"]]
            r = g.loc[g["is_text"] == 0, ["doc_id", "start"]]
            if r.empty or t.empty:
                return pa.table(
                    {"win": pa.array([], type=pa.string()),
                     "doc_id": pa.array([], type=pa.int64())}
                )
            m = r.merge(t, on="doc_id")
            win = [
                tx[int(s) : int(s) + w]
                for tx, s in zip(m["text"], m["start"])
            ]
            return _fpc(
                pd.DataFrame({"win": win, "doc_id": m["doc_id"]})
                .drop_duplicates()
            )

        hits = (
            docs_ds_factory()
            .map_batches(_win_rows, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=65536)
            .union(dup_ds.map_batches(_dup_side, batch_format="pyarrow",
                                      zero_copy_batch=True))
            .repartition(SEMI_COALESCE)
            .groupby("part")
            .map_groups(_semi, batch_format="pandas")
        )
        return (
            hits.union(
                docs_ds_factory().map_batches(
                    _text_side, batch_format="pyarrow",
                    zero_copy_batch=True, batch_size=65536,
                )
            )
            .repartition(SEMI_COALESCE)
            .groupby("dpart")
            .map_groups(_extract, batch_format="pandas")
        )

    cand = _cand_broadcast() if n_dup <= broadcast_max else _cand_semi_join()

    def _confirm(g: pd.DataFrame) -> pd.DataFrame:
        dd = g.drop_duplicates(["win", "doc_id"])
        nun = dd.groupby("win", sort=False)["doc_id"].transform("nunique")
        out = dd.loc[nun >= 2, "doc_id"].unique()
        return pd.DataFrame({"doc_id": np.sort(out).astype(np.int64)})

    def _tag(df: pd.DataFrame) -> pa.Table:
        # arrow out: pandas blocks entering the repartition shuffle would be
        # converted by Ray with the unhashable b'pandas' schema metadata
        df = df.copy()
        df["part"] = _cg_part(df["win"])
        return _fpc(df)

    confirmed = (
        cand
        .map_batches(_tag, batch_format="pandas")
        .repartition(8)  # candidate rows only — coalesce (warning rule)
        .groupby("part")
        .map_groups(_confirm, batch_format="pandas")
    )
    # a doc can qualify via windows hashed to several partitions — one
    # tiny distinct pass (doc-cardinality keys: cogroup form)
    return cogroup_agg(
        confirmed, "doc_id", {"n": ("doc_id", "size")}, coalesce=4,
    ).map_batches(
        lambda t: t.select(["doc_id"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def cross_source_pairs(docs_ds, prefix_n: int = 32, gram: int = 3,
                       threshold: float = 0.8, max_block: int = 1000):
    """CROSS-SOURCE record linkage: near-dup pairs whose SOURCES differ —
    the contamination/syndication detector (the same document syndicated
    under two crawls, benchmark text leaking into a second source).
    Same exact trigram-Jaccard + prefix blocking as ngram_jaccard_pairs,
    but same-source pairs are excluded at emission, so the output is the
    fuzzy JOIN between source cohorts rather than a self-dedup.

    Shape is identical to ngram_jaccard_pairs (hash(prefix) cogroups, one
    vectorized multi-member prefilter, ``max_block`` star cap with the
    same no-silent-caps warning); the source column rides the shuffle
    only to gate emission — pair generation cost is unchanged."""

    def _add_pfx(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        pfx = [(t or "")[:prefix_n] for t in texts]
        part = np.fromiter(
            (zlib.crc32(p.encode("utf-8")) % PAIR_SALT for p in pfx),
            dtype=np.int32, count=len(pfx),
        )
        return b.append_column(
            "pfx", pa.array(pfx, type=pa.string())
        ).append_column("part", pa.array(part))

    def _block_rows(ids, texts, sources):
        sets = [
            {t[i:i + gram] for i in range(len(t) - gram + 1)}
            for t in ((s or "") for s in texts)
        ]

        def _emit(rows, i, j):
            if sources[i] == sources[j]:
                return
            inter = len(sets[i] & sets[j])
            union = len(sets[i]) + len(sets[j]) - inter
            if union and inter / union >= threshold:
                rows.append((int(ids[i]), int(ids[j]), inter / union))

        rows = []
        if len(ids) > max_block:  # skew cap: star vs the min-doc anchor
            _LOG.warning(
                "cross_source_pairs: prefix block of %d docs exceeds "
                "max_block=%d — star fallback (output is a subset of the "
                "exact all-pairs oracle for this block)",
                len(ids), max_block,
            )
            for j in range(1, len(ids)):
                _emit(rows, 0, j)
            return rows
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                _emit(rows, i, j)
        return rows

    def _part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        multi = g[g.duplicated("pfx", keep=False)]
        if multi.empty:
            return _empty_jaccard_frame()
        multi = multi.sort_values(["pfx", "doc_id"], kind="mergesort")
        rows = []
        for _, blk in multi.groupby("pfx", sort=False):
            rows.extend(
                _block_rows(blk["doc_id"].to_numpy(),
                            blk["text"].tolist(),
                            blk["source"].tolist())
            )
        if not rows:
            return _empty_jaccard_frame()
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard3"])

    keyed = docs_ds.map_batches(
        _add_pfx, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )
    return keyed.groupby("part").map_groups(_part_pairs, batch_format="pandas")


def neardup_families(docs_ds_factory, prefix_n: int = 32, gram: int = 3,
                     threshold: float = 0.8, parts: int = 64,
                     coalesce: int = 8, max_block: int = 1000,
                     broadcast_budget_rows: int | None = None):
    """END-TO-END near-dup family selection — the full production dedup
    workflow (SlimPajama / RefinedWeb shape) as ONE composed pipeline:

      exact n-gram-Jaccard pair edges  (``ngram_jaccard_pairs``)
      → connected components over those edges
        (``connected_components_labels`` with an EDGE-state builder —
        each pair is a 2-member key, pointer jumping handles chains)
      → keep-best representative per family (longest text, min-doc_id
        tiebreak) + family size.

    Returns ``(family, keep_doc_id, n_docs)``, one row per near-dup
    family (size ≥ 2 by construction — every labeled doc sits in ≥ 1
    pair). Everything reuses the scale shapes of its parts: salted pair
    blocking, coarse CC cogroups, and two tagged-union cogroups here
    (label ⋈ doc metadata on doc-hash, then family fold on
    component-hash). Deterministic end to end, so the whole composition
    carries an exact recursive-CTE + window-function DuckDB oracle —
    WITH ONE CAVEAT inherited from ``ngram_jaccard_pairs``: a prefix
    block larger than ``max_block`` docs (a templated corpus's hot
    prefix) falls back to STAR comparison against the block's min
    doc_id, so the pair set is a SUBSET of all-pairs and family
    composition can diverge from the all-pairs recursive-CTE oracle on
    such corpora. Below the cap (every block <= max_block members, the
    normal case after exact dedup) oracle parity is exact; raise
    ``max_block`` to restore parity on a known-hot-prefix corpus at the
    cost of the quadratic block."""
    from ..common import cache_if_small

    # multi-pass source: one shared materialization below the budget
    docs_ds_factory = cache_if_small(docs_ds_factory)

    pairs = ngram_jaccard_pairs(
        docs_ds_factory(), prefix_n=prefix_n, gram=gram,
        threshold=threshold, max_block=max_block,
    ).materialize()  # CC reads it again via to_state; pair-cardinality
    n_pairs = pairs.count()
    if n_pairs == 0:  # no near-dups: typed empty, not a schema-less
        from ..common import typed_empty

        return typed_empty(family=pa.int64(), keep_doc_id=pa.int64(),
                           n_docs=pa.int64())

    def _edge_state(b: pa.Table) -> pa.Table:
        a = b.column("doc_a").to_numpy(zero_copy_only=False)
        c = b.column("doc_b").to_numpy(zero_copy_only=False)
        key = pd.Series(a).astype(str) + ":" + pd.Series(c).astype(str)
        keys = np.repeat(key.to_numpy(dtype=object), 2)
        docs = np.empty(2 * len(a), dtype=np.int64)
        docs[0::2], docs[1::2] = a, c
        return pa.table(
            {
                "key": pa.array(keys, type=pa.string()),
                "doc_id": pa.array(docs),
                "label": pa.array(docs),
            }
        )

    labels = connected_components_labels(pairs, to_state_fn=_edge_state)

    # --- broadcast fast path (size-gated) -----------------------------------
    # Label cardinality is bounded by 2×n_pairs (only paired docs are
    # labeled). When that fits the broadcast budget, ship the doc→component
    # map to every worker once and stream the corpus through ONE filtering
    # map_batches — no doc-side shuffle at all — then fold the
    # pair-cardinality survivor set on the driver (the same bounded
    # materialization this composition already performs on `pairs`).
    # Above the budget, the tagged-union cogroups below co-locate labels
    # and doc metadata without any driver-side or broadcast state.
    from .. import config as _cfg

    if broadcast_budget_rows is None:
        broadcast_budget_rows = _cfg.BROADCAST_BUDGET_ROWS
    # broadcast_budget_rows=0 forces the distributed cogroup path (tests)
    if 2 * n_pairs <= broadcast_budget_rows:
        import ray as _ray

        lab_df = labels.to_pandas().sort_values("doc_id")  # ≤ 2×n_pairs
        comp_ref = _ray.put((
            lab_df["doc_id"].to_numpy(np.int64),
            lab_df["component"].to_numpy(np.int64),
        ))

        def _attach(b: pa.Table) -> pa.Table:
            # plain ray.get, NOT cached_broadcast: the ref is fresh per
            # query, so the per-worker cache would pin one label map per
            # invocation forever; plasma get of numpy arrays is zero-copy
            ids, comp = _ray.get(comp_ref)
            d = b.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            idx = np.minimum(np.searchsorted(ids, d), len(ids) - 1)
            m = ids[idx] == d
            if not m.any():
                return pa.table(
                    {"component": pa.array([], pa.int64()),
                     "doc_id": pa.array([], pa.int64()),
                     "n_chars": pa.array([], pa.int64())}
                )
            n = pc.utf8_length(
                pc.coalesce(b.column("text"), pa.scalar(""))
            ).cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "component": pa.array(comp[idx][m]),
                    "doc_id": pa.array(d[m]),
                    "n_chars": pa.array(n[m].astype(np.int64)),
                }
            )

        g = docs_ds_factory().map_batches(
            _attach, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        ).to_pandas()  # label-cardinality ≤ 2×n_pairs
        cnt = g.groupby("component", as_index=False).size().rename(
            columns={"size": "n_docs"}
        )
        best = g.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).drop_duplicates("component")[["component", "doc_id"]]
        out = best.merge(cnt, on="component").rename(
            columns={"component": "family", "doc_id": "keep_doc_id"}
        )
        out["n_docs"] = out["n_docs"].astype(np.int64)
        import ray.data as _rd

        return _rd.from_arrow(
            _fpc(out[["family", "keep_doc_id", "n_docs"]])
        )

    def _lab_side(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": d,
                "component": b.column("component"),
                "n_chars": np.zeros(len(d), np.int64),
                "role": pa.array(np.zeros(len(d), np.int8), pa.int8()),
                "part": pa.array((d % parts).astype(np.int32)),
            }
        )

    def _doc_side(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        n = pc.utf8_length(
            pc.coalesce(b.column("text"), pa.scalar(""))
        ).cast(pa.int64())
        return pa.table(
            {
                "doc_id": d,
                "component": np.full(len(d), -1, np.int64),
                "n_chars": n,
                "role": pa.array(np.ones(len(d), np.int8), pa.int8()),
                "part": pa.array((d % parts).astype(np.int32)),
            }
        )

    def _join(g: pd.DataFrame) -> pa.Table:
        lab = g[g["role"] == 0][["doc_id", "component"]]
        doc = g[g["role"] == 1][["doc_id", "n_chars"]]
        if lab.empty or doc.empty:
            return pa.table(
                {"component": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.int64()),
                 "n_chars": pa.array([], pa.int64()),
                 "fpart": pa.array([], pa.int32())}
            )
        m = lab.merge(doc, on="doc_id", how="inner")
        return _fpc(
            m.assign(fpart=(m["component"] % parts).astype(np.int32))
            [["component", "doc_id", "n_chars", "fpart"]]
        )

    def _fold(g: pd.DataFrame) -> pa.Table:
        cnt = g.groupby("component", as_index=False).size().rename(
            columns={"size": "n_docs"}
        )
        best = g.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).drop_duplicates("component")[["component", "doc_id"]]
        out = best.merge(cnt, on="component").rename(
            columns={"component": "family", "doc_id": "keep_doc_id"}
        )
        out["n_docs"] = out["n_docs"].astype(np.int64)
        return _fpc(out[["family", "keep_doc_id", "n_docs"]])

    tagged = (
        labels.map_batches(_lab_side, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=65536)
        .union(
            docs_ds_factory().map_batches(
                _doc_side, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=65536,
            )
        )
        .repartition(coalesce)
        .groupby("part")
        .map_groups(_join, batch_format="pandas")
    )
    return (
        tagged.repartition(coalesce)
        .groupby("fpart")
        .map_groups(_fold, batch_format="pandas")
    )
