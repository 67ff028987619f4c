"""Shared broadcast helper.

``cached_broadcast`` fetches a ``ray.put`` object once per WORKER PROCESS
(module-level cache keyed by object-ref hex) — the broadcast-join pattern:
ship once, look up everywhere, never re-ship per batch.

Stages whose only state is a broadcast lookup should be STATELESS tasks using
this helper rather than actor pools: tasks are elastic and reserve no CPUs,
so small sessions can't deadlock on oversubscribed pools. Reserve actor pools
(`map_batches(Cls, concurrency=N)`) for stages with real init cost (engines,
models, compiled tables).
"""

from __future__ import annotations

_CACHE: dict = {}


_STAGE_CACHE: dict = {}


def per_worker_stage(cls, **kwargs):
    """Wrap a callable-class batch stage as a STATELESS task fn with a
    per-worker-process cached instance.

    For stages whose init is cheap (compiled regex, small permutation
    tables — MinHash/SimHash/sign-LSH), an actor pool is the wrong physical
    form: a fixed pool caps the stage at N cores on any cluster, and an
    autoscaling pool pays actor-start ramp every query (measured +1.3 s on
    the sf0.1 minhash bench vs tasks). Plain tasks are elastic, reserve no
    CPUs, and Ray reuses worker processes, so the instance is constructed
    once per worker — the same amortization an actor gives, without the
    scheduling rigidity. Reserve actor pools for REAL init cost (engines,
    models, shard registries)."""
    key = (cls.__module__, cls.__qualname__, tuple(sorted(kwargs.items())))

    def fn(batch):
        st = _STAGE_CACHE.get(key)
        if st is None:
            st = _STAGE_CACHE.setdefault(key, cls(**kwargs))
        return st(batch)

    return fn


def cached_broadcast(obj_ref):
    import ray

    # key includes the session's node id: ray.put object ids are counter-
    # based and REPEAT across sessions, so a driver that restarts Ray
    # in-process would otherwise hit a stale same-id entry
    try:
        node = ray.get_runtime_context().get_node_id()
    except Exception:
        node = None
    key = (obj_ref.hex(), node)
    if key not in _CACHE:
        _CACHE[key] = ray.get(obj_ref)
    return _CACHE[key]


#: Byte cap for cache_if_small: the ROW budget is calibrated for narrow
#: dimension frames, but wrapped sources may carry a text column — 4M docs
#: at ~2.5 KB each would pin ~10 GB of plasma per wrapped op. 2 GB keeps a
#: handful of concurrently-cached sources well inside one node's store.
CACHE_IF_SMALL_MAX_BYTES = 2 << 30


def uncached_get(ref):
    """``ray.get`` for PER-QUERY-FRESH broadcast refs. cached_broadcast's
    per-worker cache never evicts — fine for session-stable or
    dimension-tiny refs (25-row nation names), but a fresh multi-MB key
    map per query invocation would accumulate in every worker forever.
    Plasma get of numpy / Arrow payloads is zero-copy, so per-batch gets
    stay cheap; keep string payloads as pyarrow arrays (not object
    ndarrays) to preserve that."""
    import ray

    return ray.get(ref)


def cache_if_small(factory, budget_rows: int | None = None):
    """Wrap a multi-pass dataset factory: when the source's row count fits
    the broadcast budget AND its estimated in-memory size fits
    ``CACHE_IF_SMALL_MAX_BYTES``, materialize ONCE and serve the cached
    MaterializedDataset on every call — each pass stays a distributed
    operation, only the repeated source read is elided. Above either
    budget, delegate to the original factory (the memory-light re-read
    shape for unbounded inputs, where pinning the whole source in the
    object store is the wrong trade). ``count()`` / ``size_bytes()`` on a
    parquet read are metadata probes, not data passes."""
    if budget_rows is None:
        from . import config as _cfg

        budget_rows = _cfg.BROADCAST_BUDGET_ROWS
    ds = factory()
    if ds.count() <= budget_rows:
        try:
            nbytes = ds.size_bytes()
        except Exception:
            nbytes = None
        if nbytes is None or nbytes <= CACHE_IF_SMALL_MAX_BYTES:
            cached = ds.materialize()
            return lambda: cached
    return factory


def horner_shingles(crcs, window: int, base) -> "np.ndarray":
    """Rolling word-shingle hashes: a numpy Horner scheme over a token-crc
    array — ``window`` vectorized passes instead of one string join + hash
    per shingle. Shared by the winnowing fingerprint (ops/text.py) and the
    MinHash signature (ops/dedup.py) so the kernel and its overflow
    semantics (uint64 wraparound) cannot drift apart. ``crcs`` must be a
    non-empty uint64 array."""
    import numpy as np

    w = min(window, len(crcs))
    n_win = len(crcs) - w + 1
    h = np.zeros(n_win, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(w):
            h = h * base + crcs[j : j + n_win]
    return h


def reap_stale_staging(prefix: str) -> None:
    """Remove orphaned per-process staging dirs (``{prefix}.__tmp__<pid>``)
    left behind by CRASHED runs — retries run under a new pid, so the old
    fixed-name cleanup (`isdir(own tmp)`) never matches them and a full
    partition/corpus copy would otherwise accumulate per crash. Only dirs
    whose owning pid is dead are removed; a live concurrent writer's
    staging (the reason the name carries a pid at all) is never touched.
    Single-node liveness check (os.kill(pid, 0)) — matches the sandbox and
    the one-writer-host-per-out_dir deployment assumption."""
    import glob
    import os
    import shutil

    for d in glob.glob(glob.escape(prefix) + ".__tmp__*"):
        suffix = d.rsplit(".__tmp__", 1)[1]
        if not suffix.isdigit() or int(suffix) == os.getpid():
            continue
        try:
            os.kill(int(suffix), 0)
        except ProcessLookupError:
            shutil.rmtree(d, ignore_errors=True)
        except PermissionError:
            pass  # alive under another uid — leave it


def strip_schema_metadata(t):
    """Zero-copy drop of a table's schema-level metadata. pyarrow's
    ``Schema.__hash__`` raises ``unhashable type: 'dict'`` on ANY schema
    carrying metadata (the ``b'pandas'`` blob ``Table.from_pandas`` and
    pandas-written parquet attach), which makes Ray's schema dedup at every
    shuffle reduce log a warning per block set. Strip it at the boundaries
    we control (reads, pandas→arrow conversions)."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def from_pandas_clean(df, preserve_index: bool = False, **kwargs):
    """``pa.Table.from_pandas`` without the ``b'pandas'`` schema metadata
    (see strip_schema_metadata — the blob makes schemas unhashable and
    spams shuffle-reduce warnings). Defaults ``preserve_index=False``."""
    import pyarrow as pa

    return pa.Table.from_pandas(
        df, preserve_index=preserve_index, **kwargs
    ).replace_schema_metadata(None)


def topk_exact(ds, sort_keys, k: int):
    """Exact distributed top-k: per-block partial top-k, then one
    ≤ k×n_blocks-row merge block — the SAME rows as ``sort(...).limit(k)``
    whenever ``sort_keys`` is a total order (tie-free), with no all-to-all
    range sort (which boundary-samples and shuffles every input row for a
    k-row result). ``sort_keys``: pyarrow [(col, "ascending"/"descending")].
    Output rows are sorted by ``sort_keys``."""
    import pyarrow.compute as _pc

    def _blk(t):
        return t.take(_pc.sort_indices(t, sort_keys=sort_keys)[:k])

    # batch_size=None: the merge stage is only exact if ONE call sees the
    # whole repartition(1) block (k rows per BATCH otherwise) — pin the
    # whole-block batching rather than rely on the engine default
    return (
        ds.map_batches(_blk, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .repartition(1)
        .map_batches(_blk, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
    )


def cogroup_agg(ds, key, aggs: dict, parts: int = 64, coalesce: int = 8):
    """HIGH-CARDINALITY keyed aggregate (distinct keys ~ row count: content
    hashes, windows, grams, candidate pairs). The engine's
    ``groupby().aggregate()`` pays per-KEY cost — measured >2 min vs 6.4 s
    at 1.1M distinct string keys (substring_dup_docs) — so this form tags
    a coarse hash partition, coalesces the blocks, and runs ONE vectorized
    pandas groupby-agg per partition. Exact for distributive aggs (each
    key lands wholly in one partition). Callers should still collapse
    per-batch duplicates in a map_batches partial FIRST so a hot key
    crosses the shuffle once per block, not once per row.

    ``key``: column name or list of names. ``aggs``: {out_col: (src_col,
    fn)} with pandas agg fns ("min"/"max"/"sum"/"count"). Low-cardinality
    groupbys (few group labels) should keep the engine Aggregate — its
    per-block combine is the right form there."""
    import pandas as pd
    import pyarrow as pa

    keys = [key] if isinstance(key, str) else list(key)

    def _tag(b: pa.Table) -> pa.Table:
        # strip metadata before the shuffle: when the upstream stage emits
        # pandas blocks, Ray's arrow conversion attaches the b'pandas'
        # schema blob, which is unhashable and makes every reduce task log
        # a schema-dedup warning (see strip_schema_metadata)
        b = strip_schema_metadata(b)
        kdf = b.select(keys).to_pandas()
        part = (
            pd.util.hash_pandas_object(
                kdf if len(keys) > 1 else kdf[keys[0]], index=False
            )
            % parts
        ).astype("int32")
        return b.append_column("part", pa.array(part.to_numpy()))

    def _agg(g: pd.DataFrame) -> pa.Table:
        # dropna=False: the engine Aggregate this replaces keeps null keys
        # as a group (so does SQL GROUP BY); pandas' default would silently
        # drop them for any future nullable-key caller
        m = g.groupby(keys, sort=False, dropna=False).agg(
            **{o: (c, f) for o, (c, f) in aggs.items()}
        )
        # arrow out, metadata-free: pandas output blocks would be converted
        # downstream with the unhashable b'pandas' schema blob
        return from_pandas_clean(m.reset_index())

    return (
        ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=65536)
        .repartition(coalesce)
        .groupby("part")
        .map_groups(_agg, batch_format="pandas")
    )


def typed_empty(**cols):
    """Typed 0-row Dataset. Ops whose result can be legitimately empty
    (empty graph window, no dup pairs) short-circuit with this: the lazy
    plan would otherwise yield SCHEMA-LESS empty blocks (map_batches skips
    empties; a groupby of nothing has no schema) that break column-aware
    consumers. ``cols``: column name → pyarrow type."""
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(
        pa.table({c: pa.array([], t) for c, t in cols.items()})
    )
