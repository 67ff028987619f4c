"""Distributed graph analytics over a co-occurrence graph, Ray-Data-first.

Nodes are suppliers; an undirected edge {s1, s2} links two suppliers that
ship lineitems inside the SAME order within a shipdate window (the
market-basket / co-authorship graph shape — the same machinery applies to
doc-similarity edges from the dedup family). Everything is built from
coarse hash cogroups; no stage materializes the graph on the driver:

- ``cosupply_edges``    — per-order pair generation inside ONE order-hash
                          cogroup (orders have ≤7 lineitems → bounded
                          per-key fanout, no skew), then a pair-hash
                          cogroup dedup so each undirected edge survives
                          exactly once.
- ``cosupply_degrees``  — per-batch partial endpoint counts + one tiny
                          engine aggregate (node cardinality = supplier
                          dimension).
- ``triangle_counts``   — node-iterator triangle counting (Schank &
                          Wagner): each edge is ORIENTED from its
                          (degree, id)-smaller endpoint to the larger,
                          bounding oriented out-degree at O(sqrt(m));
                          wedges are generated per source inside a
                          source-hash cogroup, and a wedge⋈edge hash
                          cogroup closes them into triangles. Each
                          triangle materializes exactly once (its two
                          lower-ordered nodes generate the wedge; the
                          oriented closing edge exists under the SAME
                          global order), so no dedup pass is needed.

Scale notes: the degree map is broadcast via ``ray.put`` — bounded by the
node-dimension cardinality (suppliers), the same justification as the
other dimension broadcasts in this repo. On a web-scale node set the
successor is two node-hash cogroup joins (edges ⋈ degrees on each
endpoint) — the shapes already exist in ``shuffle_join_revenue``. The
shipdate window filter runs in the first vectorized pass; at 100 TB it
belongs in the parquet read predicate (row-group pruning on a
shipdate-sorted layout).
"""

from __future__ import annotations

import datetime as _dt
import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..common import cached_broadcast, from_pandas_clean as _fpc
from ..common import typed_empty as _typed_empty

_LOG = logging.getLogger(__name__)

#: multiplier for the pair-hash partitioner (Knuth's 2^32 golden ratio);
#: any odd constant works — partitioning only needs determinism + spread.
_MIX = 2654435761


def _pair_part(a: np.ndarray, b: np.ndarray, parts: int) -> np.ndarray:
    """Deterministic partition id for an int64 pair (order-sensitive)."""
    with np.errstate(over="ignore"):
        h = a.astype(np.uint64) * np.uint64(_MIX) + b.astype(np.uint64)
    return (h % np.uint64(parts)).astype(np.int32)


def cosupply_edges(
    lineitem_ds,
    lo: _dt.datetime,
    hi: _dt.datetime,
    parts: int = 64,
    coalesce: int = 8,
):
    """Distinct undirected co-supply edges ``(s1, s2)`` with ``s1 < s2``.

    Stage 1 drops everything outside the window and collapses duplicate
    (order, supplier) rows per batch, so the order-hash shuffle carries at
    most one row per order-supplier per block. Stage 2 is one coarse
    cogroup per ``l_orderkey % parts``: a single vectorized self-merge per
    partition generates each order's supplier pairs (≤ C(7,2) per order),
    with a per-partition ``drop_duplicates`` partial. Stage 3 dedups
    globally on a pair-hash cogroup — each edge lands wholly in one
    partition, so ``drop_duplicates`` there is exact."""

    lo_us = pa.scalar(lo, type=pa.timestamp("us"))
    hi_us = pa.scalar(hi, type=pa.timestamp("us"))

    def _window(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(b.column("l_shipdate"), lo_us),
            pc.less(b.column("l_shipdate"), hi_us),
        )
        t = b.filter(m)
        df = pd.DataFrame(
            {
                "o": t.column("l_orderkey").to_numpy(zero_copy_only=False),
                "s": t.column("l_suppkey").to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        df["part"] = (df["o"] % parts).astype(np.int32)
        return _fpc(df)

    def _pairs(g: pd.DataFrame) -> pa.Table:
        d = g[["o", "s"]].drop_duplicates()
        m = d.merge(d, on="o")
        m = m[m["s_x"] < m["s_y"]]
        e = m[["s_x", "s_y"]].drop_duplicates()
        e = e.rename(columns={"s_x": "s1", "s_y": "s2"})
        e["part"] = _pair_part(
            e["s1"].to_numpy(), e["s2"].to_numpy(), parts
        )
        return _fpc(e[["part", "s1", "s2"]])

    def _dedup(g: pd.DataFrame) -> pa.Table:
        return _fpc(g[["s1", "s2"]].drop_duplicates())

    return (
        lineitem_ds.map_batches(
            _window, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )
        .repartition(coalesce)
        .groupby("part")
        .map_groups(_pairs, batch_format="pandas")
        .repartition(coalesce)
        .groupby("part")
        .map_groups(_dedup, batch_format="pandas")
    )


def _endpoint_partials(b: pa.Table) -> pa.Table:
    """Per-batch partial endpoint counts over an edge block."""
    nodes = np.concatenate(
        [
            b.column("s1").to_numpy(zero_copy_only=False),
            b.column("s2").to_numpy(zero_copy_only=False),
        ]
    )
    u, c = np.unique(nodes, return_counts=True)
    return pa.table({"node": u, "partial": c.astype(np.int64)})


def _degree_tab(edges, alias: str):
    """Shared (node, <alias>) endpoint-count pipeline over an edge set —
    the one keyed aggregate every graph op needs (degrees, orientation,
    PageRank out-shares). 4-lane coalesce keeps the tiny-key sort ranges
    non-empty (the heavy_hitters residual-merge rule)."""
    from ray.data.aggregate import Sum

    return (
        edges.map_batches(
            _endpoint_partials, batch_format="pyarrow",
            zero_copy_batch=True, batch_size=65536,
        )
        .repartition(4)
        .groupby("node")
        .aggregate(Sum("partial", alias_name=alias))
    )


def cosupply_degrees(lineitem_ds, lo, hi, parts: int = 64):
    """(node, degree) over the distinct co-supply edge set. Node
    cardinality is the supplier dimension → the engine Aggregate's
    per-block combine is the right final form (common.cogroup_agg rule);
    4-lane coalesce keeps the tiny-key sort ranges non-empty."""
    edges = cosupply_edges(lineitem_ds, lo, hi, parts=parts).materialize()
    if edges.count() == 0:
        return _typed_empty(node=pa.int64(), degree=pa.int64())
    return _degree_tab(edges, "degree").sort("node")


def triangle_counts(lineitem_ds, lo, hi, parts: int = 64,
                    coalesce: int = 8):
    """Per-node triangle participation counts ``(node, n_triangles)`` on
    the co-supply graph — every node appearing in ≥1 triangle, sorted.

    Orientation order is ``(degree, node_id)`` ascending: each undirected
    edge is stored once, from its smaller endpoint under that order to the
    larger. A wedge (v, w) generated at source u (both v, w oriented
    neighbors of u, v before w under the SAME order) closes into a
    triangle iff oriented edge (v → w) exists — checked by ONE pair-hash
    cogroup of wedges against edges. Degree-ordering bounds the per-source
    neighbor list at O(sqrt(m)) regardless of raw-degree skew (the classic
    node-iterator guarantee), so wedge partitions stay balanced even with
    hub nodes."""
    import ray
    from ray.data.aggregate import Sum

    # Three consumers read the edge set (degree pass, orientation, tagged
    # edge side) — materialize it once into the object store (distinct
    # pairs, spillable) instead of re-running the two cogroup shuffles
    # per consumer.
    edges = cosupply_edges(lineitem_ds, lo, hi, parts=parts).materialize()

    # Degree map broadcast: bounded by the supplier-dimension cardinality
    # (see module docstring for the web-scale cogroup-join successor).
    deg_tab = _degree_tab(edges, "degree")
    if edges.count() == 0:
        return _typed_empty(node=pa.int64(), n_triangles=pa.int64())
    deg_df = deg_tab.to_pandas().sort_values("node")  # searchsorted order
    if len(deg_df) and (
        int(deg_df["node"].iloc[-1]) >= 2**31
        or int(deg_df["degree"].max()) >= 2**31
    ):
        raise ValueError(
            "triangle_counts packs (degree, id) into one int64 rank; "
            "node ids / degrees >= 2^31 need a two-column sort key"
        )
    deg_ref = ray.put(
        {
            "node": deg_df["node"].to_numpy(np.int64),
            "degree": deg_df["degree"].to_numpy(np.int64),
        }
    )

    def _rank_of(nodes: np.ndarray, deg) -> np.ndarray:
        """Total-order key (degree, id) packed into one int64: degrees and
        ids are both bounded far below 2^31 here (edge count caps degree),
        so the pack is collision-free."""
        idx = np.searchsorted(deg["node"], nodes)
        return (deg["degree"][idx] << np.int64(32)) | nodes

    def _orient(b: pa.Table) -> pa.Table:
        deg = cached_broadcast(deg_ref)
        s1 = b.column("s1").to_numpy(zero_copy_only=False)
        s2 = b.column("s2").to_numpy(zero_copy_only=False)
        r1, r2 = _rank_of(s1, deg), _rank_of(s2, deg)
        swap = r1 > r2
        u = np.where(swap, s2, s1)
        v = np.where(swap, s1, s2)
        ru = np.where(swap, r2, r1)
        rv = np.where(swap, r1, r2)
        return pa.table(
            {
                "u": u, "v": v, "ru": ru, "rv": rv,
                "part": pa.array((u % parts).astype(np.int32)),
            }
        )

    def _wedges(g: pd.DataFrame) -> pa.Table:
        d = g[["u", "v", "rv"]]
        m = d.merge(d, on="u")
        m = m[m["rv_x"] < m["rv_y"]]
        if m.empty:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "u": pa.array([], pa.int64()),
                    "role": pa.array([], pa.int8()),
                    "part": pa.array([], pa.int32()),
                }
            )
        a = m["v_x"].to_numpy(np.int64)
        b = m["v_y"].to_numpy(np.int64)
        return pa.table(
            {
                "a": a,
                "b": b,
                "u": m["u"].to_numpy(np.int64),
                "role": pa.array(
                    np.zeros(len(a), dtype=np.int8), pa.int8()
                ),
                "part": pa.array(_pair_part(a, b, parts)),
            }
        )

    def _edge_side(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        n = len(u)
        return pa.table(
            {
                "a": u,
                "b": v,
                "u": np.full(n, -1, dtype=np.int64),
                "role": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
                "part": pa.array(_pair_part(u, v, parts)),
            }
        )

    oriented = edges.map_batches(
        _orient, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )

    wedges = (
        oriented.repartition(coalesce)
        .groupby("part")
        .map_groups(_wedges, batch_format="pandas")
    )
    edge_tagged = oriented.map_batches(
        _edge_side, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )

    def _close(g: pd.DataFrame) -> pa.Table:
        w = g[g["role"] == 0]
        e = g[g["role"] == 1]
        if w.empty or e.empty:
            return pa.table({"node": pa.array([], pa.int64()),
                             "partial": pa.array([], pa.int64())})
        t = w.merge(e[["a", "b"]], on=["a", "b"], how="inner")
        nodes = np.concatenate(
            [
                t["u"].to_numpy(np.int64),
                t["a"].to_numpy(np.int64),
                t["b"].to_numpy(np.int64),
            ]
        )
        u_, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": u_, "partial": c.astype(np.int64)})

    return (
        wedges.union(edge_tagged)
        .repartition(coalesce)
        .groupby("part")
        .map_groups(_close, batch_format="pandas")
        .repartition(4)
        .groupby("node")
        .aggregate(Sum("partial", alias_name="n_triangles"))
        .sort("node")
    )


def common_neighbor_pairs(lineitem_ds, lo, hi, parts: int = 64,
                          coalesce: int = 8):
    """LINK PREDICTION: for every NON-adjacent node pair with ≥1 common
    neighbor, the common-neighbor count ``(a, b, n_common)`` — the
    classic similarity score that ranks missing edges (recommendation,
    entity-graph completion).

    Unlike triangle counting, common-neighbor counting needs FULL wedge
    explosion (every center contributes C(d,2) neighbor pairs — that is
    the output's own size driver, not an implementation choice), so the
    shape is: adjacency rows (both directions) cogroup on the CENTER
    hash, one vectorized self-merge per partition emits per-partition
    partial pair counts, and a pair-hash cogroup both sums the partials
    and ANTI-joins the existing edge set (tagged union — the pair lands
    with its edge row, if any, in the same partition). A hub node with
    degree d contributes C(d,2) wedge pairs to ONE partition; a
    power-law corpus needs the salted two-level count (split each
    center's neighbor list, sum per (a,b) across salt) before this op is
    run unguarded — documented, not silently capped."""

    edges = cosupply_edges(lineitem_ds, lo, hi, parts=parts).materialize()
    if edges.count() == 0:
        return _typed_empty(a=pa.int64(), b=pa.int64(),
                            n_common=pa.int64())

    def _adj(b: pa.Table) -> pa.Table:
        s1 = b.column("s1").to_numpy(zero_copy_only=False)
        s2 = b.column("s2").to_numpy(zero_copy_only=False)
        c = np.concatenate([s1, s2])
        n = np.concatenate([s2, s1])
        return pa.table(
            {"c": c, "n": n,
             "part": pa.array((c % parts).astype(np.int32))}
        )

    def _wedge_partials(g: pd.DataFrame) -> pa.Table:
        d = g[["c", "n"]]
        deg = d.groupby("c")["n"].size()
        hub = int(deg.max()) if len(deg) else 0
        if hub > 10_000:  # C(d,2) pairs land in THIS partition — loud,
            # per the repo's no-silent-explosions rule; the salted
            # two-level successor is documented in the docstring
            _LOG.warning(
                "common_neighbor_pairs: hub center with degree %d "
                "generates %d wedge pairs in one partition", hub,
                hub * (hub - 1) // 2,
            )
        m = d.merge(d, on="c")
        m = m[m["n_x"] < m["n_y"]]
        if m.empty:
            return pa.table(
                {"a": pa.array([], pa.int64()),
                 "b": pa.array([], pa.int64()),
                 "partial": pa.array([], pa.int64()),
                 "role": pa.array([], pa.int8()),
                 "part": pa.array([], pa.int32())}
            )
        cnt = (
            m.groupby(["n_x", "n_y"], sort=False).size()
            .reset_index(name="partial")
        )
        a = cnt["n_x"].to_numpy(np.int64)
        b = cnt["n_y"].to_numpy(np.int64)
        return pa.table(
            {"a": a, "b": b,
             "partial": cnt["partial"].to_numpy(np.int64),
             "role": pa.array(np.zeros(len(a), np.int8), pa.int8()),
             "part": pa.array(_pair_part(a, b, parts))}
        )

    def _edge_tag(b: pa.Table) -> pa.Table:
        s1 = b.column("s1").to_numpy(zero_copy_only=False)
        s2 = b.column("s2").to_numpy(zero_copy_only=False)
        n = len(s1)
        return pa.table(
            {"a": s1, "b": s2,
             "partial": np.zeros(n, dtype=np.int64),
             "role": pa.array(np.ones(n, np.int8), pa.int8()),
             "part": pa.array(_pair_part(s1, s2, parts))}
        )

    def _sum_anti(g: pd.DataFrame) -> pa.Table:
        w = g[g["role"] == 0]
        if w.empty:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "n_common": pa.array([], pa.int64())})
        cnt = w.groupby(["a", "b"], as_index=False)["partial"].sum()
        e = g[g["role"] == 1]
        if not e.empty:
            cnt = cnt.merge(
                e[["a", "b"]], on=["a", "b"], how="left", indicator=True
            )
            cnt = cnt[cnt["_merge"] == "left_only"]
        out = cnt.rename(columns={"partial": "n_common"})
        return _fpc(out[["a", "b", "n_common"]])

    wedges = (
        edges.map_batches(_adj, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=65536)
        .repartition(coalesce)
        .groupby("part")
        .map_groups(_wedge_partials, batch_format="pandas")
    )
    tagged = edges.map_batches(_edge_tag, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=65536)
    return (
        wedges.union(tagged)
        .repartition(coalesce)
        .groupby("part")
        .map_groups(_sum_anti, batch_format="pandas")
    )


def _pagerank_join(edges, deg_ds, n: int, damping_ppm: int, iters: int,
                   parts: int):
    """Join-based PageRank successor for node sets past the broadcast
    budget: NOTHING node-cardinality ever touches the driver. State
    ``(node, degree, rank)`` lives as a materialized Dataset; each
    iteration is two node-hash cogroups — (1) edges ⋈ state on src emits
    per-dst integer contribution partials, (2) partials ⋈ state on node
    computes the new rank — plus a scalar ``sum(changed)`` for the same
    exact early-exit the broadcast path has. All arithmetic is the
    IDENTICAL int64 fixed-point (share = rank // degree, order-independent
    integer sums), so output is bit-identical to the broadcast path
    (pinned by pytest)."""
    SCALE = 10**12
    base = (SCALE * (10**6 - damping_ppm) // 10**6) // n
    init = SCALE // n

    def _dir_edges(b: pa.Table) -> pa.Table:
        s1 = b.column("s1").to_numpy(zero_copy_only=False)
        s2 = b.column("s2").to_numpy(zero_copy_only=False)
        src = np.concatenate([s1, s2])
        dst = np.concatenate([s2, s1])
        m = len(src)
        return pa.table(
            {
                "part": pa.array((src % parts).astype(np.int32)),
                "a": pa.array(src),
                "b": pa.array(dst),
                "degree": np.zeros(m, dtype=np.int64),
                "rank": np.zeros(m, dtype=np.int64),
                "role": pa.array(np.zeros(m, np.int8), pa.int8()),
            }
        )

    edges_dir = edges.map_batches(
        _dir_edges, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    ).materialize()

    def _init_state(b: pa.Table) -> pa.Table:
        node = b.column("node").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((node % parts).astype(np.int32)),
                "node": pa.array(node),
                "degree": b.column("degree"),
                "rank": np.full(len(node), init, dtype=np.int64),
                "changed": np.zeros(len(node), dtype=np.int64),
            }
        )

    state = deg_ds.map_batches(
        _init_state, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    ).materialize()

    def _as_state_rows(b: pa.Table) -> pa.Table:
        m = b.num_rows
        return pa.table(
            {
                "part": b.column("part"),
                "a": b.column("node"),
                "b": np.zeros(m, dtype=np.int64),
                "degree": b.column("degree"),
                "rank": b.column("rank"),
                "role": pa.array(np.ones(m, np.int8), pa.int8()),
            }
        )

    def _contrib_group(g: pd.DataFrame) -> pa.Table:
        st = g[g["role"] == 1].sort_values("a")
        ed = g[g["role"] == 0]
        if ed.empty or st.empty:
            return pa.table({"part": pa.array([], pa.int32()),
                             "node": pa.array([], pa.int64()),
                             "partial": pa.array([], pa.int64())})
        nodes = st["a"].to_numpy(np.int64)
        share = (st["rank"].to_numpy(np.int64)
                 // st["degree"].to_numpy(np.int64))
        src = ed["a"].to_numpy(np.int64)
        dst = ed["b"].to_numpy(np.int64)
        c = share[np.searchsorted(nodes, src)]
        u = np.unique(dst)
        sums = np.zeros(len(u), dtype=np.int64)
        np.add.at(sums, np.searchsorted(u, dst), c)
        return pa.table(
            {
                "part": pa.array((u % parts).astype(np.int32)),
                "node": pa.array(u),
                "partial": pa.array(sums),
            }
        )

    def _update_group(g: pd.DataFrame) -> pa.Table:
        st = g[g["role"] == 1].sort_values("node")
        if st.empty:
            return pa.table({"part": pa.array([], pa.int32()),
                             "node": pa.array([], pa.int64()),
                             "degree": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64()),
                             "changed": pa.array([], pa.int64())})
        nodes = st["node"].to_numpy(np.int64)
        old = st["rank"].to_numpy(np.int64)
        contrib = np.zeros(len(nodes), dtype=np.int64)
        co = g[g["role"] == 0]
        if not co.empty:
            np.add.at(
                contrib,
                np.searchsorted(nodes, co["node"].to_numpy(np.int64)),
                co["partial"].to_numpy(np.int64),
            )
        new = base + (damping_ppm * contrib) // 10**6
        return pa.table(
            {
                "part": pa.array((nodes % parts).astype(np.int32)),
                "node": pa.array(nodes),
                "degree": pa.array(st["degree"].to_numpy(np.int64)),
                "rank": pa.array(new),
                "changed": pa.array((new != old).astype(np.int64)),
            }
        )

    for _ in range(iters):
        state_rows = state.map_batches(
            _as_state_rows, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )
        contrib = edges_dir.union(state_rows).groupby("part").map_groups(
            _contrib_group, batch_format="pandas"
        )

        def _as_contrib_rows(b: pa.Table) -> pa.Table:
            m = b.num_rows
            return pa.table(
                {
                    "part": b.column("part"),
                    "node": b.column("node"),
                    "partial": b.column("partial"),
                    "degree": np.zeros(m, dtype=np.int64),
                    "rank": np.zeros(m, dtype=np.int64),
                    "role": pa.array(np.zeros(m, np.int8), pa.int8()),
                }
            )

        def _state_for_update(b: pa.Table) -> pa.Table:
            m = b.num_rows
            return pa.table(
                {
                    "part": b.column("part"),
                    "node": b.column("node"),
                    "partial": np.zeros(m, dtype=np.int64),
                    "degree": b.column("degree"),
                    "rank": b.column("rank"),
                    "role": pa.array(np.ones(m, np.int8), pa.int8()),
                }
            )

        new_state = (
            contrib.map_batches(
                _as_contrib_rows, batch_format="pyarrow",
                zero_copy_batch=True, batch_size=65536,
            )
            .union(state.map_batches(
                _state_for_update, batch_format="pyarrow",
                zero_copy_batch=True, batch_size=65536,
            ))
            .groupby("part")
            .map_groups(_update_group, batch_format="pandas")
            .materialize()
        )
        state = new_state
        # scalar reduce on the materialized state — the ONLY driver-side
        # value per iteration is this single int
        if state.sum("changed") == 0:
            break

    return state.select_columns(["node", "rank"]).map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "rank_e12": b.column("rank")}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).sort("node")


def pagerank(lineitem_ds, lo, hi, damping_ppm: int = 850_000,
             iters: int = 20, parts: int = 64,
             node_budget: int | None = None):
    """PageRank over the undirected co-supply graph, INTEGER-DETERMINISTIC:
    ranks are fixed-point int64 (scaled by 1e12) and every cross-partition
    reduction is an integer Sum, so the result is bit-identical at any
    parallelism / partitioning — the determinism float PageRank cannot
    give (float partial-sum order varies run to run).

    Per iteration: each edge batch emits integer contributions
    ``r[src] // deg[src]`` to both endpoints (floor division — the lost
    remainder mass stays small and is NOT redistributed, so ranks
    slightly undershoot 1.0; documented, deterministic), summed per node
    by a partial-combine + tiny engine aggregate (node cardinality =
    dimension table). The rank vector itself rides a per-iteration
    ``ray.put`` broadcast — bounded by node cardinality like the degree
    map. Past ``node_budget`` nodes (default config.BROADCAST_BUDGET_ROWS)
    the op switches to ``_pagerank_join``: two node-hash cogroups per
    iteration, nothing node-cardinality on the driver, bit-identical
    output (pytest-pinned). Returns ``(node, rank_e12)`` sorted by node,
    rank_e12 = int64 fixed-point."""
    import ray

    SCALE = 10**12
    edges = cosupply_edges(lineitem_ds, lo, hi, parts=parts).materialize()
    if edges.count() == 0:
        return _typed_empty(node=pa.int64(), rank_e12=pa.int64())

    deg_ds = _degree_tab(edges, "degree").materialize()
    if node_budget is None:
        from .. import config as _cfg

        node_budget = _cfg.BROADCAST_BUDGET_ROWS
    n_nodes = deg_ds.count()
    if n_nodes > node_budget:
        # web-scale node set: rank vector must not live on the driver —
        # switch to the two-cogroup join successor (bit-identical output)
        return _pagerank_join(edges, deg_ds, n_nodes, damping_ppm, iters,
                              parts)

    deg_tab = deg_ds.to_pandas().sort_values("node")
    nodes = deg_tab["node"].to_numpy(np.int64)
    deg = deg_tab["degree"].to_numpy(np.int64)
    n = len(nodes)  # > 0: the empty-edge guard above returned already
    rank = np.full(n, SCALE // n, dtype=np.int64)
    base = (SCALE * (10**6 - damping_ppm) // 10**6) // n

    # Edge-budget driver loop: when the (already materialized, already
    # counted) edge list itself fits the broadcast budget, run the SAME
    # integer iteration in pure numpy on the driver — every operation is
    # int64 (floor-div shares, add.at sums, ppm damping), so the result is
    # bit-identical to the distributed rounds by associativity of integer
    # addition, with zero per-iteration Ray rounds (20 map+fold rounds are
    # pure fixed cost on a dimension-sized graph). Larger edge sets fall
    # through to the per-iteration broadcast map below; node sets past
    # node_budget already took the join successor above.
    if edges.count() <= node_budget:
        ed = edges.to_pandas()
        s1 = ed["s1"].to_numpy(np.int64)
        s2 = ed["s2"].to_numpy(np.int64)
        src_idx = np.searchsorted(nodes, np.concatenate([s1, s2]))
        dst_idx = np.searchsorted(nodes, np.concatenate([s2, s1]))
        for _ in range(iters):
            contrib = np.zeros(n, dtype=np.int64)
            np.add.at(contrib, dst_idx, (rank // deg)[src_idx])
            new_rank = base + (damping_ppm * contrib) // 10**6
            if np.array_equal(new_rank, rank):
                break
            rank = new_rank
        return ray.data.from_arrow(
            pa.table({"node": pa.array(nodes), "rank_e12": pa.array(rank)})
        ).sort("node")

    for _ in range(iters):
        ref = ray.put({"node": nodes, "share": rank // deg})

        def _contrib(b: pa.Table, _ref=ref) -> pa.Table:
            # plain ray.get, NOT cached_broadcast: the ref is fresh each
            # iteration, so the per-worker cache would pin one
            # node-cardinality dict per iteration forever; plasma get of
            # numpy arrays is zero-copy and the pool touches each ref a
            # handful of times
            import ray as _ray

            st = _ray.get(_ref)
            s1 = b.column("s1").to_numpy(zero_copy_only=False)
            s2 = b.column("s2").to_numpy(zero_copy_only=False)
            dst = np.concatenate([s2, s1])
            src = np.concatenate([s1, s2])
            c = st["share"][np.searchsorted(st["node"], src)]
            u = np.unique(dst)
            sums = np.zeros(len(u), dtype=np.int64)
            np.add.at(sums, np.searchsorted(u, dst), c)
            return pa.table({"node": u, "partial": sums})

        # per-block partials are ≤ n-node rows each; folding ≤ blocks×n
        # integer rows on the driver is bounded by the SAME node-dimension
        # cardinality as the rank broadcast itself — one map round per
        # iteration instead of a shuffle + aggregate round (measured 4.7 s
        # → 2.5 s for 20 iterations at sf0.1)
        got = edges.map_batches(
            _contrib, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        ).to_pandas()
        contrib = np.zeros(n, dtype=np.int64)
        np.add.at(
            contrib,
            np.searchsorted(nodes, got["node"].to_numpy(np.int64)),
            got["partial"].to_numpy(np.int64),
        )
        new_rank = base + (damping_ppm * contrib) // 10**6
        # integer fixed point converges EXACTLY — once the vector stops
        # changing, every further iteration reproduces it bit-for-bit, so
        # early exit cannot change the output, only the cost
        if np.array_equal(new_rank, rank):
            break
        rank = new_rank

    return ray.data.from_arrow(
        pa.table(
            {"node": pa.array(nodes), "rank_e12": pa.array(rank)}
        )
    ).sort("node")
