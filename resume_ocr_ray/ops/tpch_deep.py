"""Deep multi-join TPC-H-shaped pipelines (Q7/Q10/Q14/Q19 forms) —
the round-5 breadth set, all built on the repo's tagged-union coarse-hash
cogroup discipline (see ops/relational.py::nation_revenue for the pattern
proof): facts shuffle pre-aggregated and at most once per key domain, dim
filters are pushed below the first shuffle, and revenue is the EXACT
integer ``rev_e4 = round(price·100) · round((1−discount)·100)`` so every
pipeline carries a bit-exact DuckDB oracle (no float-sum order
dependence).

(Reference analog: these are the audit/rollup views the reference's Mongo
log could serve — "largest uploads", "revenue by segment" — generalized
to the multi-table corpus; app/routers/analysis.py keeps only counters.)

Overflow discipline: per-ORDER and per-CUSTOMER revenue sums stay far
inside int64 (≤ ~2^36 at any scale — an order has bounded lines). The
small-cardinality GLOBAL/group totals in Q7/Q14/Q19 can outgrow int64 at
100 TB (Σrev_e4 ≈ 10^9 per item × 10^10 items), so they cross the final
engine aggregate as (hi, lo) int64 pairs and are reassembled in Python
bigints — the group_corr/nation_revenue overflow discipline."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..common import topk_exact, uncached_get

_SHIFT = 31
_MASK = (1 << _SHIFT) - 1


def _empty(**cols) -> pa.Table:
    """Typed 0-row Arrow table for map_groups arms (the in-group twin of
    common.typed_empty, which wraps a Dataset): a group where one side is
    missing must still emit the output schema or the schema dedup sees a
    schema-less block."""
    return pa.table({c: pa.array([], t) for c, t in cols.items()})


def _rev_e4(b: pa.Table) -> np.ndarray:
    """Exact integer revenue: cents × (100 − discount%)."""
    cents = np.rint(
        b.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0
    ).astype(np.int64)
    pct = np.rint(
        (1.0 - b.column("l_discount").to_numpy(zero_copy_only=False))
        * 100.0
    ).astype(np.int64)
    return cents * pct


def _mod_part(keys: np.ndarray, parts: int) -> pa.Array:
    return pa.array((keys % parts).astype(np.int32))


def _cogroup(fact_ds, dim_ds, fn, coalesce: int):
    """ONE coarse-hash cogroup: tagged union of two same-schema sides,
    coalesced, then a per-partition vectorized pandas join/aggregate.
    Exact for any per-key computation (each key lands wholly in one
    partition)."""
    return (
        fact_ds.union(dim_ds)
        .repartition(coalesce)
        .groupby("part")
        .map_groups(fn, batch_format="pandas")
    )


def returned_item_revenue(lineitem_ds, orders_ds, customer_ds, nation_ds,
                          date_lo: str = "1996-01-01",
                          date_hi: str = "1996-04-01", k: int = 20,
                          parts: int = 64, coalesce: int = 8,
                          order_map=None, cust_map=None):
    """TPC-H Q10-style returned-item loss report: top-``k`` customers by
    exact integer revenue of their RETURNED lineitems (``l_returnflag =
    'R'``) on orders placed in ``[date_lo, date_hi)``, with customer
    attributes and nation name.

    Shape — returnflag filter below the first shuffle, date filter at the
    orders read; orderkey → custkey cogroup chain with per-key
    pre-aggregation; the 25-row nation dim is ONE driver fetch +
    ``ray.put`` broadcast (dim-cardinality bound); ``topk_exact`` on
    (rev desc, c_custkey) — a total order.

    ``order_map``/``cust_map`` (size-gated FAST PATH, both required —
    q_orders_by_segment selector discipline): driver-read (o_orderkey,
    o_custkey, o_orderdate) and (c_custkey, c_name, c_acctbal,
    c_nationkey) DataFrames passed only when BOTH fit the broadcast
    budget. The date filter and both key hops then happen inside the
    lineitem map_batches; one coarse custkey cogroup_agg replaces the
    two tagged-union cogroups, and customer attributes attach AFTER the
    top-k from the broadcast map (<= k rows). Integer sums + the total
    order make the paths bit-identical (pytest-pinned).

    Output: (c_custkey, c_name, nation, c_acctbal, revenue_e4)."""
    import ray

    from ..common import cached_broadcast

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def _li(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("l_returnflag"), pa.scalar("R")))
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"o_orderkey": ok, "rev": _rev_e4(b)}).groupby(
            "o_orderkey", as_index=False)["rev"].sum()
        okg = g["o_orderkey"].to_numpy(np.int64)
        return pa.table({
            "part": _mod_part(okg, parts),
            "o_orderkey": pa.array(okg),
            "rev": pa.array(g["rev"].to_numpy(np.int64)),
            "o_custkey": pa.array(np.full(len(okg), -1, np.int64)),
        })

    def _ord(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate")
        b = b.filter(pc.and_(
            pc.greater_equal(d, pa.scalar(lo, pa.timestamp("us"))),
            pc.less(d, pa.scalar(hi, pa.timestamp("us"))),
        ))
        ok = b.column("o_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        return pa.table({
            "part": _mod_part(ok, parts),
            "o_orderkey": pa.array(ok),
            "rev": pa.array(np.zeros(len(ok), np.int64)),
            "o_custkey": pc.cast(b.column("o_custkey"), pa.int64()),
        })

    def _join_ok(g: pd.DataFrame) -> pa.Table:
        li = g[g["o_custkey"] == -1]
        od = g[g["o_custkey"] != -1]
        m = li.merge(od[["o_orderkey", "o_custkey"]], on="o_orderkey",
                     how="inner", suffixes=("", "_o"))
        out = m.groupby("o_custkey_o", as_index=False)["rev"].sum()
        ck = out["o_custkey_o"].to_numpy(np.int64)
        n = len(ck)
        return pa.table({
            "part": _mod_part(ck, parts),
            "c_custkey": pa.array(ck),
            "rev": pa.array(out["rev"].to_numpy(np.int64)),
            "c_name": pa.array([""] * n, pa.string()),
            "c_acctbal": pa.array(np.zeros(n, np.float64)),
            "c_nationkey": pa.array(np.full(n, -1, np.int64)),
            "is_dim": pa.array(np.zeros(n, np.int8), pa.int8()),
        })

    def _cust(b: pa.Table) -> pa.Table:
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(ck)
        return pa.table({
            "part": _mod_part(ck, parts),
            "c_custkey": pa.array(ck),
            "rev": pa.array(np.zeros(n, np.int64)),
            "c_name": b.column("c_name"),
            "c_acctbal": pc.cast(b.column("c_acctbal"), pa.float64()),
            "c_nationkey": pc.cast(b.column("c_nationkey"), pa.int64()),
            "is_dim": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    def _join_ck(g: pd.DataFrame) -> pa.Table:
        fact = g[g["is_dim"] == 0]
        dim = g[g["is_dim"] == 1].drop_duplicates("c_custkey")
        agg = fact.groupby("c_custkey", as_index=False)["rev"].sum()
        m = agg.merge(
            dim[["c_custkey", "c_name", "c_acctbal", "c_nationkey"]],
            on="c_custkey", how="inner")
        if m.empty:
            return _empty(
                c_custkey=pa.int64(), c_name=pa.string(),
                c_acctbal=pa.float64(), c_nationkey=pa.int64(),
                revenue_e4=pa.int64())
        return pa.table({
            "c_custkey": pa.array(m["c_custkey"].to_numpy(np.int64)),
            "c_name": pa.array(m["c_name"].astype(str).tolist(),
                               pa.string()),
            "c_acctbal": pa.array(m["c_acctbal"].to_numpy(np.float64)),
            "c_nationkey": pa.array(
                m["c_nationkey"].to_numpy(np.int64)),
            "revenue_e4": pa.array(m["rev"].to_numpy(np.int64)),
        })

    if order_map is not None and cust_map is not None:
        from ..common import cogroup_agg

        od = order_map
        win = od[(od["o_orderdate"].to_numpy("datetime64[us]") >= lo)
                 & (od["o_orderdate"].to_numpy("datetime64[us]") < hi)]
        win = win.sort_values("o_orderkey")
        cd = cust_map.sort_values("c_custkey")
        maps_ref = ray.put((
            win["o_orderkey"].to_numpy(np.int64),
            win["o_custkey"].to_numpy(np.int64),
            cd["c_custkey"].to_numpy(np.int64),
        ))

        def _li_bcast(b: pa.Table) -> pa.Table:
            ok, oc, ck = uncached_get(maps_ref)
            empty = pa.table({"c_custkey": pa.array([], pa.int64()),
                              "rev": pa.array([], pa.int64())})
            if len(ok) == 0 or len(ck) == 0:
                return empty
            b = b.filter(pc.equal(b.column("l_returnflag"),
                                  pa.scalar("R")))
            lk = b.column("l_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            rev = _rev_e4(b)
            oidx = np.minimum(np.searchsorted(ok, lk), len(ok) - 1)
            keep = ok[oidx] == lk  # window + inner semantics, like _ord
            cust = oc[oidx][keep]
            rev = rev[keep]
            cidx = np.minimum(np.searchsorted(ck, cust), len(ck) - 1)
            keep2 = ck[cidx] == cust  # inner vs customer, like _join_ck
            if not keep2.any():
                return empty
            g = pd.DataFrame(
                {"c_custkey": cust[keep2], "rev": rev[keep2]}
            ).groupby("c_custkey", as_index=False)["rev"].sum()
            return pa.table({
                "c_custkey": pa.array(g["c_custkey"].to_numpy(np.int64)),
                "rev": pa.array(g["rev"].to_numpy(np.int64)),
            })

        per_cust_rev = cogroup_agg(
            lineitem_ds.map_batches(
                _li_bcast, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=65536),
            "c_custkey", {"revenue_e4": ("rev", "sum")},
        )
        # vectorized attribute columns (numpy + Arrow string array —
        # zero-copy through plasma; no per-row Python, no dict build)
        attrs_ref = ray.put((
            cd["c_custkey"].to_numpy(np.int64),
            pa.array(cd["c_name"].astype(str), pa.string()),
            cd["c_acctbal"].to_numpy(np.float64),
            cd["c_nationkey"].to_numpy(np.int64),
        ))

        def _attach(b: pa.Table) -> pa.Table:
            # runs on <= k rows (after topk_exact); fresh-ref uncached_get
            cks, names, bal, nat = uncached_get(attrs_ref)
            q = b.column("c_custkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            idx = np.searchsorted(cks, q)  # every key present (semi-join)
            return pa.table({
                "c_custkey": b.column("c_custkey"),
                "c_name": names.take(pa.array(idx, pa.int64())),
                "c_acctbal": pa.array(bal[idx]),
                "c_nationkey": pa.array(nat[idx]),
                "revenue_e4": b.column("revenue_e4"),
            })

        per_cust = topk_exact(
            per_cust_rev,
            [("revenue_e4", "descending"), ("c_custkey", "ascending")],
            k,
        ).map_batches(_attach, batch_format="pyarrow",
                      zero_copy_batch=True, batch_size=None)
        # _attach already emits the cogroup path's column layout, so the
        # shared tail (re-topk + nation name) consumes it directly
    else:
        li_side = lineitem_ds.map_batches(
            _li, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        ord_side = orders_ds.map_batches(
            _ord, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        keyed_ck = _cogroup(li_side, ord_side, _join_ok, coalesce)
        cust_side = customer_ds.map_batches(
            _cust, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        per_cust = _cogroup(keyed_ck, cust_side, _join_ck, coalesce)

    # 25 rows — dim-cardinality bound justifying the driver fetch
    ndf = nation_ds.select_columns(["n_nationkey", "n_name"]).to_pandas()
    names_ref = ray.put({
        int(k_): str(v) for k_, v in zip(ndf["n_nationkey"],
                                         ndf["n_name"])
    })

    def _name(b: pa.Table) -> pa.Table:
        # runs on ≤ k rows (AFTER topk_exact): the name attach must not
        # map over customer cardinality when only the top-k survive
        nm = cached_broadcast(names_ref)
        nk = b.column("c_nationkey").to_pylist()
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "c_name": b.column("c_name"),
            "nation": pa.array([nm[int(x)] for x in nk], pa.string()),
            "c_acctbal": b.column("c_acctbal"),
            "revenue_e4": b.column("revenue_e4"),
        })

    top = topk_exact(
        per_cust,
        [("revenue_e4", "descending"), ("c_custkey", "ascending")],
        k,
    )
    return top.map_batches(_name, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)


def volume_shipping(lineitem_ds, orders_ds, customer_ds, supplier_ds,
                    nation_ds, nation_a: str = "NATION_1",
                    nation_b: str = "NATION_2",
                    parts: int = 64, coalesce: int = 8,
                    supp_map=None, order_map=None, cust_map=None):
    """TPC-H Q7-style volume shipping: exact integer revenue between two
    nations per (supplier nation, customer nation, ship year) —
    cross-border trade in BOTH directions.

    Shape — the nation-pair filter is pushed to BOTH dim reads (the
    25-row nation dim resolves names → keys in one driver fetch, then
    supplier and customer sides filter to the two keys before their
    shuffles); three key domains chain (suppkey → orderkey → custkey),
    each a tagged-union cogroup with (orderkey, year) pre-aggregation;
    final group cardinality is 2 directions × years, so per-group sums
    cross the engine aggregate as (hi, lo) int64 pairs (Σrev_e4 outgrows
    int64 past ~10^9 lineitems — nation_revenue discipline).

    ``supp_map`` (size-gated FAST PATH, same selector discipline as
    q_orders_by_segment): a driver-read (s_suppkey, s_nationkey)
    DataFrame, passed only when the supplier table fits the broadcast
    budget. The suppkey→nation lookup then happens INSIDE the lineitem
    map_batches (sorted-array broadcast + searchsorted) and the first
    all-to-all — over order-level partials, the widest of the three —
    disappears. Above the budget callers pass None and the shuffled
    suppkey cogroup runs. Output identical on both paths (pytest-pinned).

    ``order_map``/``cust_map``: when BOTH are also given (all three sides
    fit the broadcast budget), every key hop happens inside the lineitem
    map_batches and the query becomes a ZERO-COGROUP plan (map →
    directions×years engine aggregate), still bit-identical.

    Output: (supp_nation, cust_nation, l_year, revenue_e4) sorted by the
    three keys."""
    import ray

    from ..common import cached_broadcast

    ndf = nation_ds.select_columns(["n_nationkey", "n_name"]).to_pandas()
    key_of = {str(v): int(k_) for k_, v in zip(ndf["n_nationkey"],
                                               ndf["n_name"])}
    name_of = {v: k_ for k_, v in key_of.items()}
    ka, kb = key_of[nation_a], key_of[nation_b]
    pair_keys = np.array([ka, kb], dtype=np.int64)
    names_ref = ray.put(name_of)

    def _li(b: pa.Table) -> pa.Table:
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        year = b.column("l_shipdate").to_numpy(
            zero_copy_only=False).astype("datetime64[Y]").astype(
            np.int64) + 1970
        g = pd.DataFrame({
            "l_suppkey": sk,
            "o_orderkey": b.column("l_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "l_year": year,
            "rev": _rev_e4(b),
        }).groupby(["l_suppkey", "o_orderkey", "l_year"],
                   as_index=False)["rev"].sum()
        skg = g["l_suppkey"].to_numpy(np.int64)
        return pa.table({
            "part": _mod_part(skg, parts),
            "l_suppkey": pa.array(skg),
            "o_orderkey": pa.array(g["o_orderkey"].to_numpy(np.int64)),
            "l_year": pa.array(g["l_year"].to_numpy(np.int64)),
            "rev": pa.array(g["rev"].to_numpy(np.int64)),
            "s_nat": pa.array(np.full(len(skg), -1, np.int64)),
        })

    def _supp(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("s_nationkey"),
                              value_set=pa.array(pair_keys)))
        sk = b.column("s_suppkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(sk)
        return pa.table({
            "part": _mod_part(sk, parts),
            "l_suppkey": pa.array(sk),
            "o_orderkey": pa.array(np.zeros(n, np.int64)),
            "l_year": pa.array(np.zeros(n, np.int64)),
            "rev": pa.array(np.zeros(n, np.int64)),
            "s_nat": pc.cast(b.column("s_nationkey"), pa.int64()),
        })

    def _join_sk(g: pd.DataFrame) -> pa.Table:
        fact = g[g["s_nat"] == -1]
        dim = g[g["s_nat"] != -1].drop_duplicates("l_suppkey")
        m = fact.merge(dim[["l_suppkey", "s_nat"]], on="l_suppkey",
                       how="inner", suffixes=("", "_d"))
        out = m.groupby(["o_orderkey", "l_year", "s_nat_d"],
                        as_index=False)["rev"].sum()
        ok = out["o_orderkey"].to_numpy(np.int64)
        n = len(ok)
        return pa.table({
            "part": _mod_part(ok, parts),
            "o_orderkey": pa.array(ok),
            "l_year": pa.array(out["l_year"].to_numpy(np.int64)),
            "s_nat": pa.array(out["s_nat_d"].to_numpy(np.int64)),
            "rev": pa.array(out["rev"].to_numpy(np.int64)),
            "o_custkey": pa.array(np.full(n, -1, np.int64)),
        })

    def _ord(b: pa.Table) -> pa.Table:
        ok = b.column("o_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(ok)
        return pa.table({
            "part": _mod_part(ok, parts),
            "o_orderkey": pa.array(ok),
            "l_year": pa.array(np.zeros(n, np.int64)),
            "s_nat": pa.array(np.zeros(n, np.int64)),
            "rev": pa.array(np.zeros(n, np.int64)),
            "o_custkey": pc.cast(b.column("o_custkey"), pa.int64()),
        })

    def _join_ok(g: pd.DataFrame) -> pa.Table:
        fact = g[g["o_custkey"] == -1]
        od = g[g["o_custkey"] != -1].drop_duplicates("o_orderkey")
        m = fact.merge(od[["o_orderkey", "o_custkey"]], on="o_orderkey",
                       how="inner", suffixes=("", "_o"))
        out = m.groupby(["o_custkey_o", "l_year", "s_nat"],
                        as_index=False)["rev"].sum()
        ck = out["o_custkey_o"].to_numpy(np.int64)
        n = len(ck)
        return pa.table({
            "part": _mod_part(ck, parts),
            "c_custkey": pa.array(ck),
            "l_year": pa.array(out["l_year"].to_numpy(np.int64)),
            "s_nat": pa.array(out["s_nat"].to_numpy(np.int64)),
            "rev": pa.array(out["rev"].to_numpy(np.int64)),
            "c_nat": pa.array(np.full(n, -1, np.int64)),
        })

    def _cust(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("c_nationkey"),
                              value_set=pa.array(pair_keys)))
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(ck)
        return pa.table({
            "part": _mod_part(ck, parts),
            "c_custkey": pa.array(ck),
            "l_year": pa.array(np.zeros(n, np.int64)),
            "s_nat": pa.array(np.zeros(n, np.int64)),
            "rev": pa.array(np.zeros(n, np.int64)),
            "c_nat": pc.cast(b.column("c_nationkey"), pa.int64()),
        })

    def _join_ck(g: pd.DataFrame) -> pa.Table:
        fact = g[g["c_nat"] == -1]
        dim = g[g["c_nat"] != -1].drop_duplicates("c_custkey")
        m = fact.merge(dim[["c_custkey", "c_nat"]], on="c_custkey",
                       how="inner", suffixes=("", "_d"))
        # cross-border only: (a→b) or (b→a), never domestic
        m = m[m["s_nat"] != m["c_nat_d"]]
        out = m.groupby(["s_nat", "c_nat_d", "l_year"],
                        as_index=False)["rev"].sum()
        if out.empty:
            return _empty(s_nat=pa.int64(), c_nat=pa.int64(),
                          l_year=pa.int64(), rev_hi=pa.int64(),
                          rev_lo=pa.int64())
        rev = out["rev"].to_numpy(np.int64)
        return pa.table({
            "s_nat": pa.array(out["s_nat"].to_numpy(np.int64)),
            "c_nat": pa.array(out["c_nat_d"].to_numpy(np.int64)),
            "l_year": pa.array(out["l_year"].to_numpy(np.int64)),
            "rev_hi": pa.array(rev >> _SHIFT),
            "rev_lo": pa.array(rev & _MASK),
        })

    if (supp_map is not None and order_map is not None
            and cust_map is not None):
        sdf = supp_map.sort_values("s_suppkey")
        odf = order_map.sort_values("o_orderkey")
        cdf = cust_map.sort_values("c_custkey")
        all_ref = ray.put((
            sdf["s_suppkey"].to_numpy(np.int64),
            sdf["s_nationkey"].to_numpy(np.int64),
            odf["o_orderkey"].to_numpy(np.int64),
            odf["o_custkey"].to_numpy(np.int64),
            cdf["c_custkey"].to_numpy(np.int64),
            cdf["c_nationkey"].to_numpy(np.int64),
        ))

        def _li_full(b: pa.Table) -> pa.Table:
            sks, snat, oks, ocs, cks, cnat = uncached_get(all_ref)
            empty = _empty(s_nat=pa.int64(), c_nat=pa.int64(),
                           l_year=pa.int64(), rev_hi=pa.int64(),
                           rev_lo=pa.int64())
            if len(sks) == 0 or len(oks) == 0 or len(cks) == 0:
                return empty
            sk = b.column("l_suppkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            sidx = np.minimum(np.searchsorted(sks, sk), len(sks) - 1)
            s_nat = np.where(sks[sidx] == sk, snat[sidx], -1)
            keep = np.isin(s_nat, pair_keys)
            lk = b.column("l_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            oidx = np.minimum(np.searchsorted(oks, lk), len(oks) - 1)
            cust = np.where(oks[oidx] == lk, ocs[oidx], np.int64(-1))
            keep &= cust >= 0
            cidx = np.minimum(np.searchsorted(cks, cust), len(cks) - 1)
            c_nat = np.where(cks[cidx] == cust, cnat[cidx], np.int64(-1))
            keep &= np.isin(c_nat, pair_keys)
            keep &= s_nat != c_nat  # cross-border only, like _join_ck
            if not keep.any():
                return empty
            year = b.column("l_shipdate").to_numpy(
                zero_copy_only=False).astype("datetime64[Y]").astype(
                np.int64) + 1970
            g = pd.DataFrame({
                "s_nat": s_nat[keep],
                "c_nat": c_nat[keep],
                "l_year": year[keep],
                "rev": _rev_e4(b)[keep],
            }).groupby(["s_nat", "c_nat", "l_year"],
                       as_index=False)["rev"].sum()
            rev = g["rev"].to_numpy(np.int64)
            return pa.table({
                "s_nat": pa.array(g["s_nat"].to_numpy(np.int64)),
                "c_nat": pa.array(g["c_nat"].to_numpy(np.int64)),
                "l_year": pa.array(g["l_year"].to_numpy(np.int64)),
                "rev_hi": pa.array(rev >> _SHIFT),
                "rev_lo": pa.array(rev & _MASK),
            })

        pairs = lineitem_ds.map_batches(
            _li_full, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536).materialize()
        # fall through to the shared typed-empty guard + finish below
        keyed_full = pairs
    else:
        keyed_full = None
    if keyed_full is None:
        # the cogroup chains below are only BUILT when the full
        # three-map plan was not taken (no wasted ray.put / plan
        # construction on the fast path)
        if supp_map is not None:
            sdf = supp_map.sort_values("s_suppkey")
            smap_ref = ray.put((
                sdf["s_suppkey"].to_numpy(np.int64),
                sdf["s_nationkey"].to_numpy(np.int64),
            ))

            def _li_bcast(b: pa.Table) -> pa.Table:
                sk_sorted, nat = uncached_get(smap_ref)
                sk = b.column("l_suppkey").to_numpy(
                    zero_copy_only=False).astype(np.int64)
                if len(sk_sorted) == 0:  # empty dim: inner join drops all
                    return _empty(part=pa.int32(), o_orderkey=pa.int64(),
                                  l_year=pa.int64(), s_nat=pa.int64(),
                                  rev=pa.int64(), o_custkey=pa.int64())
                idx = np.searchsorted(sk_sorted, sk)
                idx = np.minimum(idx, len(sk_sorted) - 1)
                s_nat = np.where(sk_sorted[idx] == sk, nat[idx], -1)
                keep = np.isin(s_nat, pair_keys)
                year = b.column("l_shipdate").to_numpy(
                    zero_copy_only=False).astype("datetime64[Y]").astype(
                    np.int64) + 1970
                g = pd.DataFrame({
                    "o_orderkey": b.column("l_orderkey").to_numpy(
                        zero_copy_only=False).astype(np.int64)[keep],
                    "l_year": year[keep],
                    "s_nat": s_nat[keep],
                    "rev": _rev_e4(b)[keep],
                }).groupby(["o_orderkey", "l_year", "s_nat"],
                           as_index=False)["rev"].sum()
                ok = g["o_orderkey"].to_numpy(np.int64)
                return pa.table({
                    "part": _mod_part(ok, parts),
                    "o_orderkey": pa.array(ok),
                    "l_year": pa.array(g["l_year"].to_numpy(np.int64)),
                    "s_nat": pa.array(g["s_nat"].to_numpy(np.int64)),
                    "rev": pa.array(g["rev"].to_numpy(np.int64)),
                    "o_custkey": pa.array(np.full(len(ok), -1, np.int64)),
                })

            keyed_ok = lineitem_ds.map_batches(
                _li_bcast, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=65536)
        else:
            li_side = lineitem_ds.map_batches(
                _li, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=65536)
            supp_side = supplier_ds.map_batches(
                _supp, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=65536)
            keyed_ok = _cogroup(li_side, supp_side, _join_sk, coalesce)
        ord_side = orders_ds.map_batches(
            _ord, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        keyed_ck = _cogroup(keyed_ok, ord_side, _join_ok, coalesce)
        cust_side = customer_ds.map_batches(
            _cust, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        # materialize is directions × years × partitions rows — sketch-sized;
        # the count guard keeps a no-cross-border corpus TYPED (an engine
        # aggregate over zero rows loses the schema)
        keyed_full = _cogroup(
            keyed_ck, cust_side, _join_ck, coalesce).materialize()
    pairs = keyed_full
    if pairs.count() == 0:
        from ..common import typed_empty

        return typed_empty(supp_nation=pa.string(),
                           cust_nation=pa.string(),
                           l_year=pa.int64(), revenue_e4=pa.int64())

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        nm = cached_broadcast(names_ref)
        rev = [(int(h) << _SHIFT) + int(lo)
               for h, lo in zip(df["rev_hi"], df["rev_lo"])]
        out = pd.DataFrame({
            "supp_nation": [nm[int(x)] for x in df["s_nat"]],
            "cust_nation": [nm[int(x)] for x in df["c_nat"]],
            "l_year": df["l_year"].to_numpy(np.int64),
            "revenue_e4": np.array(rev, dtype=np.int64),
        })
        return out.sort_values(
            ["supp_nation", "cust_nation", "l_year"]).reset_index(
            drop=True)

    from ray.data.aggregate import Sum

    return (
        # 2 directions × ~7 years of group keys — coalesce to 2 lanes so
        # boundary sampling never manufactures schema-less empty ranges
        pairs.repartition(2)
        .groupby(["s_nat", "c_nat", "l_year"])
        .aggregate(Sum("rev_hi", alias_name="rev_hi"),
                   Sum("rev_lo", alias_name="rev_lo"))
        .map_batches(_finish, batch_format="pandas", batch_size=None)
    )


def promo_revenue(lineitem_ds, part_ds, date_lo: str = "1996-09-01",
                  date_hi: str = "1996-10-01",
                  parts: int = 64, coalesce: int = 8,
                  part_map=None):
    """TPC-H Q14-style promotion effect: one row — the month's PROMO-part
    revenue, total revenue, and promo share percent.

    Shape — month filter at the lineitem read side, per-(partkey)
    pre-aggregation before the ONE partkey-hash cogroup against the part
    dim (scale-safe: part is NOT broadcast), per-group (hi, lo) partial
    sums, and a single-row driver fold (two Python bigints → int64 +
    one double division, the same IEEE shape the oracle evaluates).

    ``part_map`` (size-gated FAST PATH): a driver-read (p_partkey,
    p_type) DataFrame passed only when part fits the broadcast budget —
    the promo flag is then probed INSIDE the lineitem map_batches
    (sorted-array broadcast + searchsorted) and the query becomes a
    ZERO-SHUFFLE plan: one map over lineitem emitting one (hi, lo)
    partial row per batch + the same bounded driver fold. Above the
    budget callers pass None and the partkey cogroup runs. Output
    identical on both paths (pytest-pinned).

    Output: (promo_rev_e4, total_rev_e4, promo_pct)."""
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def _li(b: pa.Table) -> pa.Table:
        d = b.column("l_shipdate")
        b = b.filter(pc.and_(
            pc.greater_equal(d, pa.scalar(lo, pa.timestamp("us"))),
            pc.less(d, pa.scalar(hi, pa.timestamp("us"))),
        ))
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        g = pd.DataFrame({"p_partkey": pk, "rev": _rev_e4(b)}).groupby(
            "p_partkey", as_index=False)["rev"].sum()
        pkg = g["p_partkey"].to_numpy(np.int64)
        return pa.table({
            "part": _mod_part(pkg, parts),
            "p_partkey": pa.array(pkg),
            "rev": pa.array(g["rev"].to_numpy(np.int64)),
            "is_promo": pa.array(np.full(len(pkg), -1, np.int8),
                                 pa.int8()),
        })

    def _dim(b: pa.Table) -> pa.Table:
        pk = b.column("p_partkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        promo = pc.equal(b.column("p_type"), pa.scalar("PROMO"))
        return pa.table({
            "part": _mod_part(pk, parts),
            "p_partkey": pa.array(pk),
            "rev": pa.array(np.zeros(len(pk), np.int64)),
            "is_promo": pc.cast(promo, pa.int8()),
        })

    def _grp(g: pd.DataFrame) -> pa.Table:
        fact = g[g["is_promo"] == -1]
        dim = g[g["is_promo"] != -1].drop_duplicates("p_partkey")
        m = fact.merge(dim[["p_partkey", "is_promo"]], on="p_partkey",
                       how="inner", suffixes=("", "_d"))
        rev = m["rev"].to_numpy(np.int64)
        promo = rev[(m["is_promo_d"] == 1).to_numpy()]
        p, t = int(promo.sum()), int(rev.sum())
        return pa.table({
            "p_hi": pa.array([p >> _SHIFT], pa.int64()),
            "p_lo": pa.array([p & _MASK], pa.int64()),
            "t_hi": pa.array([t >> _SHIFT], pa.int64()),
            "t_lo": pa.array([t & _MASK], pa.int64()),
        })

    if part_map is not None:
        import ray

        from ..common import cached_broadcast

        pdf = part_map.sort_values("p_partkey")
        pmap_ref = ray.put((
            pdf["p_partkey"].to_numpy(np.int64),
            (pdf["p_type"] == "PROMO").to_numpy().astype(np.int8),
        ))

        def _li_bcast(b: pa.Table) -> pa.Table:
            pk_sorted, promo = uncached_get(pmap_ref)
            if len(pk_sorted) == 0:  # empty dim: zero partial, no probe
                z = pa.array([0], pa.int64())
                return pa.table({"p_hi": z, "p_lo": z, "t_hi": z,
                                 "t_lo": z})
            d = b.column("l_shipdate")
            b = b.filter(pc.and_(
                pc.greater_equal(d, pa.scalar(lo, pa.timestamp("us"))),
                pc.less(d, pa.scalar(hi, pa.timestamp("us"))),
            ))
            pk = b.column("l_partkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            idx = np.searchsorted(pk_sorted, pk)
            idx = np.minimum(idx, max(0, len(pk_sorted) - 1))
            found = pk_sorted[idx] == pk
            rev = _rev_e4(b)[found]
            is_p = promo[idx][found] == 1
            p, t = int(rev[is_p].sum()), int(rev.sum())
            return pa.table({
                "p_hi": pa.array([p >> _SHIFT], pa.int64()),
                "p_lo": pa.array([p & _MASK], pa.int64()),
                "t_hi": pa.array([t >> _SHIFT], pa.int64()),
                "t_lo": pa.array([t & _MASK], pa.int64()),
            })

        partials = lineitem_ds.map_batches(
            _li_bcast, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536).to_pandas()  # one row per input batch
    else:
        li_side = lineitem_ds.map_batches(
            _li, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        dim_side = part_ds.map_batches(
            _dim, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        partials = _cogroup(li_side, dim_side, _grp,
                            coalesce).to_pandas()
    # ≤ one row per cogroup partition / input batch — sketch-sized
    p = (int(partials["p_hi"].sum()) << _SHIFT) + int(
        partials["p_lo"].sum())
    t = (int(partials["t_hi"].sum()) << _SHIFT) + int(
        partials["t_lo"].sum())
    pct = 100.0 * float(p) / float(t) if t else 0.0
    out = pa.table({
        "promo_rev_e4": pa.array([p], pa.int64()),
        "total_rev_e4": pa.array([t], pa.int64()),
        "promo_pct": pa.array([pct], pa.float64()),
    })
    import ray.data as rd

    return rd.from_arrow(out)


def disjunctive_revenue(lineitem_ds, part_ds,
                        parts: int = 64, coalesce: int = 8,
                        part_map=None):
    """TPC-H Q19-style disjunctive-predicate revenue: one row — exact
    integer revenue + item count over an OR of three (brand, size-range,
    quantity-range) conjunctions (the classic "predicate needs BOTH
    tables" join no filter can fully push down).

    Branches (adapted to this corpus's dims):
      Brand#12, 1 ≤ p_size ≤  5,  1 ≤ l_quantity ≤ 11
      Brand#23, 1 ≤ p_size ≤ 10, 10 ≤ l_quantity ≤ 20
      Brand#3,  1 ≤ p_size ≤ 15, 20 ≤ l_quantity ≤ 30

    Shape — quantity is pre-filtered to the UNION of branch ranges below
    the shuffle and collapsed to (partkey, qty) partials (quantities are
    integral 1..50, so duplicates fold); ONE partkey-hash cogroup joins
    the part dim, evaluates the disjunction vectorized, and emits (hi,
    lo) partials; single-row driver fold. Output: (revenue_e4,
    n_items).

    ``part_map`` (size-gated FAST PATH): a driver-read (p_partkey,
    p_brand, p_size) DataFrame passed only when part fits the broadcast
    budget. Each branch's brand+size conjunction is resolved PER PARTKEY
    on the driver into one (qty_lo, qty_hi) interval (brands are
    disjoint, so a part matches at most one branch), broadcast as three
    sorted arrays; the lineitem map then probes + range-checks in place
    and the query becomes a ZERO-SHUFFLE plan. Output identical on both
    paths (pytest-pinned)."""
    BR = [("Brand#12", 1, 5, 1, 11),
          ("Brand#23", 1, 10, 10, 20),
          ("Brand#3", 1, 15, 20, 30)]
    qty_lo = min(b[3] for b in BR)
    qty_hi = max(b[4] for b in BR)

    def _li(b: pa.Table) -> pa.Table:
        qty = np.rint(
            b.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        keep = (qty >= qty_lo) & (qty <= qty_hi)
        pk = b.column("l_partkey").to_numpy(
            zero_copy_only=False).astype(np.int64)[keep]
        g = pd.DataFrame({
            "p_partkey": pk, "qty": qty[keep],
            "rev": _rev_e4(b)[keep],
            "cnt": np.ones(len(pk), np.int64),
        }).groupby(["p_partkey", "qty"], as_index=False).agg(
            rev=("rev", "sum"), cnt=("cnt", "sum"))
        pkg = g["p_partkey"].to_numpy(np.int64)
        n = len(pkg)
        return pa.table({
            "part": _mod_part(pkg, parts),
            "p_partkey": pa.array(pkg),
            "qty": pa.array(g["qty"].to_numpy(np.int64)),
            "rev": pa.array(g["rev"].to_numpy(np.int64)),
            "cnt": pa.array(g["cnt"].to_numpy(np.int64)),
            "p_brand": pa.array([""] * n, pa.string()),
            "p_size": pa.array(np.full(n, -1, np.int64)),
        })

    def _dim(b: pa.Table) -> pa.Table:
        pk = b.column("p_partkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(pk)
        return pa.table({
            "part": _mod_part(pk, parts),
            "p_partkey": pa.array(pk),
            "qty": pa.array(np.zeros(n, np.int64)),
            "rev": pa.array(np.zeros(n, np.int64)),
            "cnt": pa.array(np.zeros(n, np.int64)),
            "p_brand": b.column("p_brand"),
            "p_size": pc.cast(b.column("p_size"), pa.int64()),
        })

    def _grp(g: pd.DataFrame) -> pa.Table:
        fact = g[g["p_size"] == -1]
        dim = g[g["p_size"] != -1].drop_duplicates("p_partkey")
        m = fact.merge(dim[["p_partkey", "p_brand", "p_size"]],
                       on="p_partkey", how="inner", suffixes=("", "_d"))
        qty = m["qty"].to_numpy(np.int64)
        size = m["p_size_d"].to_numpy(np.int64)
        brand = m["p_brand_d"].to_numpy(object)
        keep = np.zeros(len(m), dtype=bool)
        for br, s_lo, s_hi, q_lo, q_hi in BR:
            keep |= ((brand == br) & (size >= s_lo) & (size <= s_hi)
                     & (qty >= q_lo) & (qty <= q_hi))
        rev = int(m["rev"].to_numpy(np.int64)[keep].sum())
        cnt = int(m["cnt"].to_numpy(np.int64)[keep].sum())
        return pa.table({
            "r_hi": pa.array([rev >> _SHIFT], pa.int64()),
            "r_lo": pa.array([rev & _MASK], pa.int64()),
            "cnt": pa.array([cnt], pa.int64()),
        })

    if part_map is not None:
        import ray

        from ..common import cached_broadcast

        pdf = part_map.sort_values("p_partkey")
        pk_arr = pdf["p_partkey"].to_numpy(np.int64)
        qlo = np.full(len(pdf), 1, np.int64)   # empty interval default
        qhi = np.zeros(len(pdf), np.int64)
        brand = pdf["p_brand"].to_numpy(object)
        size = pdf["p_size"].to_numpy(np.int64)
        for br, s_lo, s_hi, q_lo, q_hi in BR:
            hit = (brand == br) & (size >= s_lo) & (size <= s_hi)
            qlo[hit], qhi[hit] = q_lo, q_hi
        pmap_ref = ray.put((pk_arr, qlo, qhi))

        def _li_bcast(b: pa.Table) -> pa.Table:
            pks, lo_a, hi_a = uncached_get(pmap_ref)
            if len(pks) == 0:  # empty dim: zero partial, no probe
                z = pa.array([0], pa.int64())
                return pa.table({"r_hi": z, "r_lo": z, "cnt": z})
            qty = np.rint(
                b.column("l_quantity").to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            pk = b.column("l_partkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            idx = np.searchsorted(pks, pk)
            idx = np.minimum(idx, max(0, len(pks) - 1))
            found = pks[idx] == pk
            keep = found & (qty >= lo_a[idx]) & (qty <= hi_a[idx])
            rev = int(_rev_e4(b)[keep].sum())
            return pa.table({
                "r_hi": pa.array([rev >> _SHIFT], pa.int64()),
                "r_lo": pa.array([rev & _MASK], pa.int64()),
                "cnt": pa.array([int(keep.sum())], pa.int64()),
            })

        partials = lineitem_ds.map_batches(
            _li_bcast, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536).to_pandas()  # one row per input batch
    else:
        li_side = lineitem_ds.map_batches(
            _li, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        dim_side = part_ds.map_batches(
            _dim, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        partials = _cogroup(li_side, dim_side, _grp,
                            coalesce).to_pandas()
    rev = (int(partials["r_hi"].sum()) << _SHIFT) + int(
        partials["r_lo"].sum())
    out = pa.table({
        "revenue_e4": pa.array([rev], pa.int64()),
        "n_items": pa.array([int(partials["cnt"].sum())], pa.int64()),
    })
    import ray.data as rd

    return rd.from_arrow(out)


def product_line_profit(lineitem_ds, part_ds, supplier_ds, nation_ds,
                        name_frag: str = "red",
                        parts: int = 64, coalesce: int = 8,
                        part_map=None, supp_map=None):
    """TPC-H Q9-style product-line profit: exact integer revenue of
    lineitems whose part name contains ``name_frag``, per (supplier
    nation, ship year). (The corpus has no partsupp/supplycost, so
    "profit" is the revenue side of Q9's expression — the join/group
    shape is the point.)

    Shape — the name filter is pushed to the part read side so only
    matching partkeys cross the first cogroup; partkey → suppkey key
    domains chain with per-(suppkey, year) pre-aggregation between them;
    the 25-row nation dim maps names in the finish; per-(nation, year)
    sums cross as (hi, lo) pairs.

    ``part_map``/``supp_map`` (size-gated FAST PATH, both required):
    driver-read (p_partkey, p_name) and (s_suppkey, s_nationkey)
    DataFrames passed only when BOTH dims fit the broadcast budget —
    the name filter and the nation lookup then both happen INSIDE the
    lineitem map_batches and the query becomes a ZERO-COGROUP plan
    (map → dimension-bounded engine aggregate). If either is None the
    fully shuffled cogroup chain runs. Output identical (pytest-pinned).

    Output: (nation, o_year, revenue_e4) sorted by (nation, o_year)."""
    import ray
    from ray.data.aggregate import Sum

    from ..common import cached_broadcast

    def _li(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        year = b.column("l_shipdate").to_numpy(
            zero_copy_only=False).astype("datetime64[Y]").astype(
            np.int64) + 1970
        g = pd.DataFrame({
            "p_partkey": pk,
            "l_suppkey": b.column("l_suppkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "o_year": year,
            "rev": _rev_e4(b),
        }).groupby(["p_partkey", "l_suppkey", "o_year"],
                   as_index=False)["rev"].sum()
        pkg = g["p_partkey"].to_numpy(np.int64)
        return pa.table({
            "part": _mod_part(pkg, parts),
            "p_partkey": pa.array(pkg),
            "l_suppkey": pa.array(g["l_suppkey"].to_numpy(np.int64)),
            "o_year": pa.array(g["o_year"].to_numpy(np.int64)),
            "rev": pa.array(g["rev"].to_numpy(np.int64)),
            "is_dim": pa.array(np.zeros(len(pkg), np.int8), pa.int8()),
        })

    def _part_dim(b: pa.Table) -> pa.Table:
        b = b.filter(pc.match_substring(b.column("p_name"),
                                        name_frag))
        pk = b.column("p_partkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(pk)
        return pa.table({
            "part": _mod_part(pk, parts),
            "p_partkey": pa.array(pk),
            "l_suppkey": pa.array(np.zeros(n, np.int64)),
            "o_year": pa.array(np.zeros(n, np.int64)),
            "rev": pa.array(np.zeros(n, np.int64)),
            "is_dim": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    def _join_pk(g: pd.DataFrame) -> pa.Table:
        fact = g[g["is_dim"] == 0]
        keep = g.loc[g["is_dim"] == 1, "p_partkey"].unique()
        m = fact[fact["p_partkey"].isin(keep)]
        out = m.groupby(["l_suppkey", "o_year"], as_index=False)[
            "rev"].sum()
        sk = out["l_suppkey"].to_numpy(np.int64)
        return pa.table({
            "part": _mod_part(sk, parts),
            "l_suppkey": pa.array(sk),
            "o_year": pa.array(out["o_year"].to_numpy(np.int64)),
            "rev": pa.array(out["rev"].to_numpy(np.int64)),
            "s_nat": pa.array(np.full(len(sk), -1, np.int64)),
        })

    def _supp(b: pa.Table) -> pa.Table:
        sk = b.column("s_suppkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(sk)
        return pa.table({
            "part": _mod_part(sk, parts),
            "l_suppkey": pa.array(sk),
            "o_year": pa.array(np.zeros(n, np.int64)),
            "rev": pa.array(np.zeros(n, np.int64)),
            "s_nat": pc.cast(b.column("s_nationkey"), pa.int64()),
        })

    def _join_sk(g: pd.DataFrame) -> pa.Table:
        fact = g[g["s_nat"] == -1]
        dim = g[g["s_nat"] != -1].drop_duplicates("l_suppkey")
        m = fact.merge(dim[["l_suppkey", "s_nat"]], on="l_suppkey",
                       how="inner", suffixes=("", "_d"))
        out = m.groupby(["s_nat_d", "o_year"], as_index=False)[
            "rev"].sum()
        if out.empty:
            return _empty(s_nat=pa.int64(), o_year=pa.int64(),
                          rev_hi=pa.int64(), rev_lo=pa.int64())
        rev = out["rev"].to_numpy(np.int64)
        return pa.table({
            "s_nat": pa.array(out["s_nat_d"].to_numpy(np.int64)),
            "o_year": pa.array(out["o_year"].to_numpy(np.int64)),
            "rev_hi": pa.array(rev >> _SHIFT),
            "rev_lo": pa.array(rev & _MASK),
        })

    ndf = nation_ds.select_columns(["n_nationkey", "n_name"]).to_pandas()
    names_ref = ray.put({
        int(k_): str(v) for k_, v in zip(ndf["n_nationkey"],
                                         ndf["n_name"])
    })

    if part_map is not None and supp_map is not None:
        pdf = part_map
        keep_pk = np.sort(pdf.loc[
            pdf["p_name"].astype(str).str.contains(name_frag,
                                                   regex=False),
            "p_partkey"].to_numpy(np.int64))
        sdf = supp_map.sort_values("s_suppkey")
        maps_ref = ray.put((
            keep_pk,
            sdf["s_suppkey"].to_numpy(np.int64),
            sdf["s_nationkey"].to_numpy(np.int64),
        ))

        def _li_bcast(b: pa.Table) -> pa.Table:
            pks, sks, nat = uncached_get(maps_ref)
            if len(pks) == 0 or len(sks) == 0:  # no matching dim rows
                return _empty(s_nat=pa.int64(), o_year=pa.int64(),
                              rev_hi=pa.int64(), rev_lo=pa.int64())
            pk = b.column("l_partkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            sk = b.column("l_suppkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            pidx = np.searchsorted(pks, pk)
            pidx = np.minimum(pidx, max(0, len(pks) - 1))
            keep = pks[pidx] == pk
            sidx = np.searchsorted(sks, sk)
            sidx = np.minimum(sidx, max(0, len(sks) - 1))
            keep &= sks[sidx] == sk
            year = b.column("l_shipdate").to_numpy(
                zero_copy_only=False).astype("datetime64[Y]").astype(
                np.int64) + 1970
            g = pd.DataFrame({
                "s_nat": nat[sidx][keep],
                "o_year": year[keep],
                "rev": _rev_e4(b)[keep],
            }).groupby(["s_nat", "o_year"], as_index=False)["rev"].sum()
            rev = g["rev"].to_numpy(np.int64)
            return pa.table({
                "s_nat": pa.array(g["s_nat"].to_numpy(np.int64)),
                "o_year": pa.array(g["o_year"].to_numpy(np.int64)),
                "rev_hi": pa.array(rev >> _SHIFT),
                "rev_lo": pa.array(rev & _MASK),
            })

        grouped = lineitem_ds.map_batches(
            _li_bcast, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536).materialize()
    else:
        li_side = lineitem_ds.map_batches(
            _li, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        part_side = part_ds.map_batches(
            _part_dim, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        keyed_sk = _cogroup(li_side, part_side, _join_pk, coalesce)
        supp_side = supplier_ds.map_batches(
            _supp, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        grouped = _cogroup(keyed_sk, supp_side, _join_sk,
                           coalesce).materialize()
    if grouped.count() == 0:
        from ..common import typed_empty

        return typed_empty(nation=pa.string(), o_year=pa.int64(),
                           revenue_e4=pa.int64())

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        nm = cached_broadcast(names_ref)
        rev = [(int(h) << _SHIFT) + int(lo)
               for h, lo in zip(df["rev_hi"], df["rev_lo"])]
        return pd.DataFrame({
            "nation": [nm[int(x)] for x in df["s_nat"]],
            "o_year": df["o_year"].to_numpy(np.int64),
            "revenue_e4": np.array(rev, dtype=np.int64),
        }).sort_values(["nation", "o_year"]).reset_index(drop=True)

    return (
        # nations × years of group keys — 2 lanes, same spacing rule as
        # the other dimension-bounded sort-groupbys
        grouped.repartition(2)
        .groupby(["s_nat", "o_year"])
        .aggregate(Sum("rev_hi", alias_name="rev_hi"),
                   Sum("rev_lo", alias_name="rev_lo"))
        .map_batches(_finish, batch_format="pandas", batch_size=None)
    )


def market_share(lineitem_ds, orders_ds, customer_ds, supplier_ds,
                 nation_ds, region_name: str = "ASIA",
                 share_nation: str = "NATION_12",
                 parts: int = 64, coalesce: int = 8,
                 supp_map=None, order_map=None, cust_map=None):
    """TPC-H Q8-style market share: per ORDER year, the fraction of
    ``region_name``-customer revenue supplied by ``share_nation`` —
    a conditional aggregate over a four-table join.

    Shape — suppkey → orderkey → custkey cogroup chain; the customer
    side is pre-filtered to the region's 5 nationkeys via ONE 25-row
    nation driver fetch (nothing region-external crosses the last
    shuffle); per-year (total, share-nation) sums cross as two (hi, lo)
    pairs; the share division is a single IEEE double op in the finish,
    the same shape the oracle evaluates.

    ``supp_map`` (size-gated FAST PATH, q_orders_by_segment selector
    discipline): a driver-read (s_suppkey, s_nationkey) DataFrame passed
    only when supplier fits the broadcast budget — the is_share tag is
    then computed INSIDE the lineitem map_batches and the first
    all-to-all (order-level partials, the widest) disappears. Output
    identical on both paths (pytest-pinned).

    ``order_map``/``cust_map``: when BOTH are also given (all three
    sides fit the broadcast budget), every hop — share tag, order year,
    region-customer semi-join — happens inside the lineitem map_batches
    and the query becomes a ZERO-COGROUP plan, still bit-identical.

    Output: (o_year, share_rev_e4, total_rev_e4, mkt_share)."""
    import ray
    from ray.data.aggregate import Sum

    from ..common import cached_broadcast

    ndf = nation_ds.select_columns(
        ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    # region key from the name via the 5-row region table would add a
    # read; nation carries n_regionkey, and region names are fixed TPC-H
    # (AFRICA..MIDDLE EAST = 0..4) — resolve via the nation table alone
    _REGIONS = {"AFRICA": 0, "AMERICA": 1, "ASIA": 2, "EUROPE": 3,
                "MIDDLE EAST": 4}
    rk = _REGIONS[region_name]
    region_nats = ndf.loc[ndf["n_regionkey"] == rk,
                          "n_nationkey"].astype(int).to_numpy(np.int64)
    share_key = int(ndf.loc[ndf["n_name"] == share_nation,
                            "n_nationkey"].iloc[0])

    def _li(b: pa.Table) -> pa.Table:
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        g = pd.DataFrame({
            "l_suppkey": sk,
            "o_orderkey": b.column("l_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "rev": _rev_e4(b),
        }).groupby(["l_suppkey", "o_orderkey"], as_index=False)[
            "rev"].sum()
        skg = g["l_suppkey"].to_numpy(np.int64)
        return pa.table({
            "part": _mod_part(skg, parts),
            "l_suppkey": pa.array(skg),
            "o_orderkey": pa.array(g["o_orderkey"].to_numpy(np.int64)),
            "rev": pa.array(g["rev"].to_numpy(np.int64)),
            "s_nat": pa.array(np.full(len(skg), -1, np.int64)),
        })

    def _supp(b: pa.Table) -> pa.Table:
        sk = b.column("s_suppkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(sk)
        return pa.table({
            "part": _mod_part(sk, parts),
            "l_suppkey": pa.array(sk),
            "o_orderkey": pa.array(np.zeros(n, np.int64)),
            "rev": pa.array(np.zeros(n, np.int64)),
            "s_nat": pc.cast(b.column("s_nationkey"), pa.int64()),
        })

    def _join_sk(g: pd.DataFrame) -> pa.Table:
        fact = g[g["s_nat"] == -1]
        dim = g[g["s_nat"] != -1].drop_duplicates("l_suppkey")
        m = fact.merge(dim[["l_suppkey", "s_nat"]], on="l_suppkey",
                       how="inner", suffixes=("", "_d"))
        m["is_share"] = (m["s_nat_d"] == share_key).astype(np.int64)
        out = m.groupby(["o_orderkey", "is_share"], as_index=False)[
            "rev"].sum()
        ok = out["o_orderkey"].to_numpy(np.int64)
        n = len(ok)
        return pa.table({
            "part": _mod_part(ok, parts),
            "o_orderkey": pa.array(ok),
            "is_share": pa.array(out["is_share"].to_numpy(np.int64)),
            "rev": pa.array(out["rev"].to_numpy(np.int64)),
            "o_custkey": pa.array(np.full(n, -1, np.int64)),
            "o_year": pa.array(np.zeros(n, np.int64)),
        })

    def _ord(b: pa.Table) -> pa.Table:
        ok = b.column("o_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        year = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[Y]").astype(
            np.int64) + 1970
        n = len(ok)
        return pa.table({
            "part": _mod_part(ok, parts),
            "o_orderkey": pa.array(ok),
            "is_share": pa.array(np.zeros(n, np.int64)),
            "rev": pa.array(np.zeros(n, np.int64)),
            "o_custkey": pc.cast(b.column("o_custkey"), pa.int64()),
            "o_year": pa.array(year),
        })

    def _join_ok(g: pd.DataFrame) -> pa.Table:
        fact = g[g["o_custkey"] == -1]
        od = g[g["o_custkey"] != -1].drop_duplicates("o_orderkey")
        m = fact.merge(od[["o_orderkey", "o_custkey", "o_year"]],
                       on="o_orderkey", how="inner", suffixes=("", "_o"))
        out = m.groupby(["o_custkey_o", "o_year_o", "is_share"],
                        as_index=False)["rev"].sum()
        ck = out["o_custkey_o"].to_numpy(np.int64)
        n = len(ck)
        return pa.table({
            "part": _mod_part(ck, parts),
            "c_custkey": pa.array(ck),
            "o_year": pa.array(out["o_year_o"].to_numpy(np.int64)),
            "is_share": pa.array(out["is_share"].to_numpy(np.int64)),
            "rev": pa.array(out["rev"].to_numpy(np.int64)),
            "c_keep": pa.array(np.full(n, -1, np.int64)),
        })

    def _cust(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("c_nationkey"),
                              value_set=pa.array(region_nats)))
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(ck)
        return pa.table({
            "part": _mod_part(ck, parts),
            "c_custkey": pa.array(ck),
            "o_year": pa.array(np.zeros(n, np.int64)),
            "is_share": pa.array(np.zeros(n, np.int64)),
            "rev": pa.array(np.zeros(n, np.int64)),
            "c_keep": pa.array(np.ones(n, np.int64)),
        })

    def _join_ck(g: pd.DataFrame) -> pa.Table:
        fact = g[g["c_keep"] == -1]
        keep = g.loc[g["c_keep"] == 1, "c_custkey"].unique()
        m = fact[fact["c_custkey"].isin(keep)]
        if m.empty:
            return _empty(o_year=pa.int64(), s_hi=pa.int64(),
                          s_lo=pa.int64(), t_hi=pa.int64(),
                          t_lo=pa.int64())
        rows = []
        for year, sub in m.groupby("o_year"):
            rev = sub["rev"].to_numpy(np.int64)
            share = int(rev[(sub["is_share"] == 1).to_numpy()].sum())
            total = int(rev.sum())
            rows.append((int(year), share >> _SHIFT, share & _MASK,
                         total >> _SHIFT, total & _MASK))
        yr, sh, sl, th, tl = (np.array(c, dtype=np.int64)
                              for c in zip(*rows))
        return pa.table({
            "o_year": pa.array(yr), "s_hi": pa.array(sh),
            "s_lo": pa.array(sl), "t_hi": pa.array(th),
            "t_lo": pa.array(tl),
        })

    if (supp_map is not None and order_map is not None
            and cust_map is not None):
        sdf = supp_map.sort_values("s_suppkey")
        odf = order_map.sort_values("o_orderkey")
        region_ck = np.sort(cust_map.loc[
            cust_map["c_nationkey"].astype(np.int64).isin(region_nats),
            "c_custkey"].to_numpy(np.int64))
        oy = odf["o_orderdate"].to_numpy(
            "datetime64[us]").astype("datetime64[Y]").astype(
            np.int64) + 1970
        all_ref = ray.put((
            sdf["s_suppkey"].to_numpy(np.int64),
            sdf["s_nationkey"].to_numpy(np.int64),
            odf["o_orderkey"].to_numpy(np.int64),
            odf["o_custkey"].to_numpy(np.int64),
            oy,
            region_ck,
        ))

        def _li_full(b: pa.Table) -> pa.Table:
            sks, snat, oks, ocs, oys, rck = uncached_get(all_ref)
            empty = _empty(o_year=pa.int64(), s_hi=pa.int64(),
                           s_lo=pa.int64(), t_hi=pa.int64(),
                           t_lo=pa.int64())
            if len(sks) == 0 or len(oks) == 0 or len(rck) == 0:
                return empty
            sk = b.column("l_suppkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            sidx = np.minimum(np.searchsorted(sks, sk), len(sks) - 1)
            keep = sks[sidx] == sk  # inner: unknown suppkeys drop
            is_share = snat[sidx] == share_key
            lk = b.column("l_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            oidx = np.minimum(np.searchsorted(oks, lk), len(oks) - 1)
            keep &= oks[oidx] == lk  # inner vs orders
            cust = ocs[oidx]
            cidx = np.minimum(np.searchsorted(rck, cust), len(rck) - 1)
            keep &= rck[cidx] == cust  # region-customer semi-join
            if not keep.any():
                return empty
            g = pd.DataFrame({
                "o_year": oys[oidx][keep],
                "is_share": is_share[keep].astype(np.int64),
                "rev": _rev_e4(b)[keep],
            }).groupby(["o_year", "is_share"], as_index=False)[
                "rev"].sum()
            rows = []
            for year, sub in g.groupby("o_year"):
                rev = sub["rev"].to_numpy(np.int64)
                share = int(rev[(sub["is_share"] == 1).to_numpy()].sum())
                total = int(rev.sum())
                rows.append((int(year), share >> _SHIFT, share & _MASK,
                             total >> _SHIFT, total & _MASK))
            yr, sh, sl, th, tl = (np.array(c, dtype=np.int64)
                                  for c in zip(*rows))
            return pa.table({
                "o_year": pa.array(yr), "s_hi": pa.array(sh),
                "s_lo": pa.array(sl), "t_hi": pa.array(th),
                "t_lo": pa.array(tl),
            })

        keyed_year_full = lineitem_ds.map_batches(
            _li_full, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536).materialize()
    else:
        keyed_year_full = None

    if keyed_year_full is None:
        # the cogroup chains below are only BUILT when the full
        # three-map plan was not taken (no wasted ray.put / plan
        # construction on the fast path)
        if supp_map is not None:
            sdf = supp_map.sort_values("s_suppkey")
            smap_ref = ray.put((
                sdf["s_suppkey"].to_numpy(np.int64),
                sdf["s_nationkey"].to_numpy(np.int64),
            ))

            def _li_bcast(b: pa.Table) -> pa.Table:
                sk_sorted, nat = uncached_get(smap_ref)
                sk = b.column("l_suppkey").to_numpy(
                    zero_copy_only=False).astype(np.int64)
                if len(sk_sorted) == 0:  # empty dim: inner join drops all
                    return _empty(part=pa.int32(), o_orderkey=pa.int64(),
                                  is_share=pa.int64(), rev=pa.int64(),
                                  o_custkey=pa.int64(), o_year=pa.int64())
                idx = np.searchsorted(sk_sorted, sk)
                idx = np.minimum(idx, len(sk_sorted) - 1)
                found = sk_sorted[idx] == sk  # inner-join: unknown keys drop
                s_nat = nat[idx]
                g = pd.DataFrame({
                    "o_orderkey": b.column("l_orderkey").to_numpy(
                        zero_copy_only=False).astype(np.int64)[found],
                    "is_share": (s_nat[found] == share_key).astype(np.int64),
                    "rev": _rev_e4(b)[found],
                }).groupby(["o_orderkey", "is_share"], as_index=False)[
                    "rev"].sum()
                ok = g["o_orderkey"].to_numpy(np.int64)
                n = len(ok)
                return pa.table({
                    "part": _mod_part(ok, parts),
                    "o_orderkey": pa.array(ok),
                    "is_share": pa.array(g["is_share"].to_numpy(np.int64)),
                    "rev": pa.array(g["rev"].to_numpy(np.int64)),
                    "o_custkey": pa.array(np.full(n, -1, np.int64)),
                    "o_year": pa.array(np.zeros(n, np.int64)),
                })

            keyed_ok = lineitem_ds.map_batches(
                _li_bcast, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=65536)
        else:
            li_side = lineitem_ds.map_batches(
                _li, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=65536)
            supp_side = supplier_ds.map_batches(
                _supp, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=65536)
            keyed_ok = _cogroup(li_side, supp_side, _join_sk, coalesce)
        ord_side = orders_ds.map_batches(
            _ord, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        keyed_ck = _cogroup(keyed_ok, ord_side, _join_ok, coalesce)
        cust_side = customer_ds.map_batches(
            _cust, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        keyed_year_full = _cogroup(keyed_ck, cust_side, _join_ck,
                                   coalesce).materialize()
    per_year = keyed_year_full
    if per_year.count() == 0:
        from ..common import typed_empty

        return typed_empty(o_year=pa.int64(), share_rev_e4=pa.int64(),
                           total_rev_e4=pa.int64(),
                           mkt_share=pa.float64())

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        s = [(int(h) << _SHIFT) + int(lo)
             for h, lo in zip(df["s_hi"], df["s_lo"])]
        t = [(int(h) << _SHIFT) + int(lo)
             for h, lo in zip(df["t_hi"], df["t_lo"])]
        return pd.DataFrame({
            "o_year": df["o_year"].to_numpy(np.int64),
            "share_rev_e4": np.array(s, dtype=np.int64),
            "total_rev_e4": np.array(t, dtype=np.int64),
            "mkt_share": np.array(
                [float(a) / float(b) if b else 0.0
                 for a, b in zip(s, t)], dtype=np.float64),
        }).sort_values("o_year").reset_index(drop=True)

    return (
        per_year.repartition(2)
        .groupby("o_year")
        .aggregate(Sum("s_hi", alias_name="s_hi"),
                   Sum("s_lo", alias_name="s_lo"),
                   Sum("t_hi", alias_name="t_hi"),
                   Sum("t_lo", alias_name="t_lo"))
        .map_batches(_finish, batch_format="pandas", batch_size=None)
    )


def forecast_revenue(lineitem_ds, date_lo: str = "1996-01-01",
                     date_hi: str = "1997-01-01",
                     disc_lo: int = 5, disc_hi: int = 7,
                     max_qty: int = 24):
    """TPC-H Q6-style revenue-change forecast: one row — the exact
    integer sum of ``price·discount`` over a ship-year window for
    lineitems with discount in ``[disc_lo, disc_hi]`` percent and
    quantity under ``max_qty``.

    Shape — the simplest plan in the family and deliberately so: a pure
    ZERO-SHUFFLE scan (filters vectorized per batch, one (hi, lo)
    partial row per batch, bounded driver fold). Discounts compare as
    ``round(disc·100)`` integers, so the boundary rows agree with the
    SQL oracle exactly (a float BETWEEN would be ULP-fragile).

    Output: (revenue_e4, n_items) — revenue_e4 = Σ cents·disc_pct."""
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def _scan(b: pa.Table) -> pa.Table:
        d = b.column("l_shipdate")
        b = b.filter(pc.and_(
            pc.greater_equal(d, pa.scalar(lo, pa.timestamp("us"))),
            pc.less(d, pa.scalar(hi, pa.timestamp("us"))),
        ))
        disc = np.rint(
            b.column("l_discount").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        qty = np.rint(
            b.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        keep = (disc >= disc_lo) & (disc <= disc_hi) & (qty < max_qty)
        cents = np.rint(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        rev = int((cents[keep] * disc[keep]).sum())
        return pa.table({
            "r_hi": pa.array([rev >> _SHIFT], pa.int64()),
            "r_lo": pa.array([rev & _MASK], pa.int64()),
            "cnt": pa.array([int(keep.sum())], pa.int64()),
        })

    partials = lineitem_ds.map_batches(
        _scan, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536).to_pandas()  # one row per input batch
    rev = (int(partials["r_hi"].sum()) << _SHIFT) + int(
        partials["r_lo"].sum())
    out = pa.table({
        "revenue_e4": pa.array([rev], pa.int64()),
        "n_items": pa.array([int(partials["cnt"].sum())], pa.int64()),
    })
    import ray.data as rd

    return rd.from_arrow(out)


def top_supplier(lineitem_ds, supplier_ds,
                 date_lo: str = "1996-01-01", date_hi: str = "1996-04-01",
                 parts: int = 64, coalesce: int = 8, supp_map=None):
    """TPC-H Q15-style top supplier: the supplier(s) with MAX exact
    integer revenue over a ship-date window — ties all kept (the Q15
    view + equality semantics).

    Shape — per-batch (suppkey, rev) partials collapse lineitem to
    supplier cardinality before ONE suppkey-hash cogroup attaches the
    name; the global max is an ENGINE ``Max`` aggregate and only the
    tied winners are filtered out to the driver (supplier cardinality
    grows with SF, so no per-supplier driver fold).
    Per-supplier Σrev_e4 stays in int64 (per-supplier lineitem count is
    corpus-bounded ~600× regardless of SF — headroom ~10^9 items per
    supplier).

    ``supp_map`` (size-gated FAST PATH): driver-read (s_suppkey,
    s_name); the name attach then happens in the partial map and the
    plan needs only the tiny engine aggregate. Identical output
    (pytest-pinned).

    Output: (s_suppkey, s_name, total_rev_e4), one row per tied winner,
    sorted by s_suppkey."""
    import ray
    from ray.data.aggregate import Sum

    from ..common import cached_broadcast

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def _rev_partial(b: pa.Table) -> pd.DataFrame:
        d = b.column("l_shipdate")
        b = b.filter(pc.and_(
            pc.greater_equal(d, pa.scalar(lo, pa.timestamp("us"))),
            pc.less(d, pa.scalar(hi, pa.timestamp("us"))),
        ))
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        return pd.DataFrame({"s_suppkey": sk, "rev": _rev_e4(b)}).groupby(
            "s_suppkey", as_index=False)["rev"].sum()

    if supp_map is not None:
        sdf = supp_map.sort_values("s_suppkey")
        smap_ref = ray.put((
            sdf["s_suppkey"].to_numpy(np.int64),
            pa.array(sdf["s_name"].astype(str), pa.string()),
        ))

        def _li_bcast(b: pa.Table) -> pa.Table:
            # fresh-ref uncached_get; the name column rides as an Arrow
            # string array so the plasma get stays zero-copy per batch
            sk_sorted, names = uncached_get(smap_ref)
            g = _rev_partial(b)
            sk = g["s_suppkey"].to_numpy(np.int64)
            if len(sk_sorted) == 0:
                return _empty(s_suppkey=pa.int64(), s_name=pa.string(),
                              total_rev_e4=pa.int64())
            idx = np.searchsorted(sk_sorted, sk)
            idx = np.minimum(idx, len(sk_sorted) - 1)
            found = sk_sorted[idx] == sk
            return pa.table({
                "s_suppkey": pa.array(sk[found]),
                "s_name": names.take(pa.array(idx[found], pa.int64())),
                "total_rev_e4": pa.array(
                    g["rev"].to_numpy(np.int64)[found]),
            })

        per_supp = (
            lineitem_ds.map_batches(
                _li_bcast, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=65536)
            # supplier-cardinality partials → 2 lanes (dim spacing rule)
            .repartition(2)
            .groupby(["s_suppkey", "s_name"])
            .aggregate(Sum("total_rev_e4", alias_name="total_rev_e4"))
        )
    else:
        def _li(b: pa.Table) -> pa.Table:
            g = _rev_partial(b)
            sk = g["s_suppkey"].to_numpy(np.int64)
            return pa.table({
                "part": _mod_part(sk, parts),
                "s_suppkey": pa.array(sk),
                "rev": pa.array(g["rev"].to_numpy(np.int64)),
                "s_name": pa.array([""] * len(sk), pa.string()),
                "is_dim": pa.array(np.zeros(len(sk), np.int8), pa.int8()),
            })

        def _dim(b: pa.Table) -> pa.Table:
            sk = b.column("s_suppkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            n = len(sk)
            return pa.table({
                "part": _mod_part(sk, parts),
                "s_suppkey": pa.array(sk),
                "rev": pa.array(np.zeros(n, np.int64)),
                "s_name": b.column("s_name"),
                "is_dim": pa.array(np.ones(n, np.int8), pa.int8()),
            })

        def _grp(g: pd.DataFrame) -> pa.Table:
            fact = g[g["is_dim"] == 0]
            dim = g[g["is_dim"] == 1].drop_duplicates("s_suppkey")
            agg = fact.groupby("s_suppkey", as_index=False)["rev"].sum()
            m = agg.merge(dim[["s_suppkey", "s_name"]], on="s_suppkey",
                          how="inner")
            if m.empty:
                return _empty(s_suppkey=pa.int64(), s_name=pa.string(),
                              total_rev_e4=pa.int64())
            return pa.table({
                "s_suppkey": pa.array(m["s_suppkey"].to_numpy(np.int64)),
                "s_name": pa.array(m["s_name"].astype(str).tolist(),
                                   pa.string()),
                "total_rev_e4": pa.array(m["rev"].to_numpy(np.int64)),
            })

        li_side = lineitem_ds.map_batches(
            _li, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        dim_side = supplier_ds.map_batches(
            _dim, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        per_supp = _cogroup(li_side, dim_side, _grp, coalesce)

    # The max is an ENGINE aggregate and only the tied winners reach the
    # driver: supplier cardinality grows with SF (10k/SF in TPC-H
    # shape), so a full per-supplier driver fold would NOT be bounded —
    # this is the distributed argmax shape (same as topk_exact's merge,
    # k = tie count). materialize: per_supp is consumed twice (max probe
    # + winner filter) and is already reduced to supplier cardinality.
    from ray.data.aggregate import Max

    per_supp = per_supp.materialize()
    agg = per_supp.aggregate(Max("total_rev_e4"))
    best = agg.get("max(total_rev_e4)") if agg else None
    if best is None:
        from ..common import typed_empty

        return typed_empty(s_suppkey=pa.int64(), s_name=pa.string(),
                           total_rev_e4=pa.int64())
    best = int(best)

    def _winners(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("total_rev_e4"),
                              pa.scalar(best, pa.int64())))
        return b.select(["s_suppkey", "s_name", "total_rev_e4"])

    w = (
        per_supp.map_batches(_winners, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)
        .to_pandas()  # tie-count rows only
        .sort_values("s_suppkey").reset_index(drop=True)
    )
    out = pa.table({
        "s_suppkey": pa.array(w["s_suppkey"].to_numpy(np.int64)),
        "s_name": pa.array(w["s_name"].astype(str).tolist(), pa.string()),
        "total_rev_e4": pa.array(w["total_rev_e4"].to_numpy(np.int64)),
    })
    import ray.data as rd

    return rd.from_arrow(out)


def order_priority(orders_ds, lineitem_ds,
                   date_lo: str = "1996-01-01",
                   date_hi: str = "1997-01-01",
                   late_days: int = 1200,
                   parts: int = 64, coalesce: int = 8):
    """TPC-H Q4-style order-priority check: count orders per
    ``o_orderpriority`` whose order date falls in ``[date_lo, date_hi)``
    and for which AT LEAST ONE lineitem shipped later than
    ``o_orderdate + late_days`` (the synthetic lineitem carries only
    ``l_shipdate``, so the Q4 commit-vs-receipt lateness predicate is
    recast as ship-vs-order lateness; ~30% of window orders qualify at
    the 1200-day default on the TPC-H-shaped corpus).

    Shape — EXISTS(l_shipdate > o_orderdate + D) ⟺
    max(l_shipdate) > o_orderdate + D, so the fact side collapses to ONE
    (orderkey, max_ship) row per key per batch BEFORE the single
    orderkey-hash cogroup; the orders window filter is pushed below the
    shuffle; each cogroup partition emits ≤5 per-priority partial counts
    and the final engine Sum runs over priority cardinality (5 rows).
    No driver-side fold beyond the 5-row result.

    (Reference analog: the per-request failure/success counters grouped
    by a request attribute — app/routers/analysis.py's counter rollup —
    generalized to a semi-join qualifier.)

    Output: (o_orderpriority, order_count), sorted by priority."""
    from ray.data.aggregate import Sum

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    late_us = np.int64(late_days) * 86_400_000_000

    def _fact(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        ship = b.column("l_shipdate").to_numpy(
            zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        g = pd.DataFrame({"k": ok, "s": ship}).groupby(
            "k", as_index=False)["s"].max()
        k = g["k"].to_numpy(np.int64)
        return pa.table({
            "part": _mod_part(k, parts),
            "o_orderkey": pa.array(k),
            "ts_us": pa.array(g["s"].to_numpy(np.int64)),
            "o_orderpriority": pa.array([""] * len(k), pa.string()),
            "is_dim": pa.array(np.zeros(len(k), np.int8), pa.int8()),
        })

    def _dim(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate")
        b = b.filter(pc.and_(
            pc.greater_equal(d, pa.scalar(lo, pa.timestamp("us"))),
            pc.less(d, pa.scalar(hi, pa.timestamp("us"))),
        ))
        k = b.column("o_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        od = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        return pa.table({
            "part": _mod_part(k, parts),
            "o_orderkey": pa.array(k),
            "ts_us": pa.array(od),
            "o_orderpriority": b.column("o_orderpriority"),
            "is_dim": pa.array(np.ones(len(k), np.int8), pa.int8()),
        })

    def _grp(g: pd.DataFrame) -> pa.Table:
        dim = g[g["is_dim"] == 1]
        if dim.empty:
            return _empty(o_orderpriority=pa.string(),
                          order_count=pa.int64())
        fact = g[g["is_dim"] == 0]
        # per-key max over the per-batch partial maxima
        ms = fact.groupby("o_orderkey", as_index=False)["ts_us"].max()
        m = dim.merge(ms, on="o_orderkey", how="inner",
                      suffixes=("_o", "_s"))
        late = m[m["ts_us_s"].to_numpy(np.int64)
                 > m["ts_us_o"].to_numpy(np.int64) + late_us]
        if late.empty:
            return _empty(o_orderpriority=pa.string(),
                          order_count=pa.int64())
        cnt = late.groupby("o_orderpriority", as_index=False).size()
        return pa.table({
            "o_orderpriority": pa.array(
                cnt["o_orderpriority"].astype(str).tolist(), pa.string()),
            "order_count": pa.array(cnt["size"].to_numpy(np.int64)),
        })

    fact_side = lineitem_ds.map_batches(
        _fact, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536)
    dim_side = orders_ds.map_batches(
        _dim, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536)
    return (
        # ≤5 priority keys — 2 lanes so the sort-groupby's boundary
        # sampling never manufactures schema-less empty ranges (the
        # dimension-bounded spacing rule used across this module)
        _cogroup(fact_side, dim_side, _grp, coalesce)
        .repartition(2)
        .groupby("o_orderpriority")
        .aggregate(Sum("order_count", alias_name="order_count"))
        .sort("o_orderpriority")
    )


def customer_distribution(orders_ds, customer_ds,
                          exclude_priority: str = "1-URGENT",
                          parts: int = 64, coalesce: int = 8):
    """TPC-H Q13-style customer order-count distribution: for every
    customer, the number of their orders OUTSIDE ``exclude_priority``
    (the synthetic orders table has no ``o_comment``, so Q13's
    ``not like '%special%requests%'`` anti-predicate is recast onto
    ``o_orderpriority``), then the histogram of customers per order
    count — INCLUDING the zero-order customers the left join keeps.

    Shape — per-batch (custkey, n) partials collapse orders to customer
    cardinality before ONE custkey-hash cogroup; the left-join-with-zero
    happens per partition (dim custkeys absent from the fact side emit
    c_count=0); each partition then folds to ≤ max-orders-per-customer
    histogram partials, so the engine Sum and the final sort run over
    c_count cardinality (≲40 rows), never customer cardinality.

    (Reference analog: the per-user upload-count rollup the Mongo audit
    log supports — app/routers/analysis.py counters — extended with the
    zero-activity users.)

    Output: (c_count, custdist) sorted custdist DESC, c_count DESC
    (total order: c_count is unique)."""
    from ray.data.aggregate import Sum

    def _fact(b: pa.Table) -> pa.Table:
        b = b.filter(pc.not_equal(b.column("o_orderpriority"),
                                  pa.scalar(exclude_priority)))
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        g = pd.DataFrame({"k": ck}).groupby("k", as_index=False).size()
        k = g["k"].to_numpy(np.int64)
        return pa.table({
            "part": _mod_part(k, parts),
            "c_custkey": pa.array(k),
            "n": pa.array(g["size"].to_numpy(np.int64)),
            "is_dim": pa.array(np.zeros(len(k), np.int8), pa.int8()),
        })

    def _dim(b: pa.Table) -> pa.Table:
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(ck)
        return pa.table({
            "part": _mod_part(ck, parts),
            "c_custkey": pa.array(ck),
            "n": pa.array(np.zeros(n, np.int64)),
            "is_dim": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    def _grp(g: pd.DataFrame) -> pa.Table:
        dim = g[g["is_dim"] == 1]
        if dim.empty:
            return _empty(c_count=pa.int64(), custdist=pa.int64())
        fact = g[g["is_dim"] == 0]
        per_cust = fact.groupby("c_custkey", as_index=False)["n"].sum()
        m = dim[["c_custkey"]].drop_duplicates().merge(
            per_cust, on="c_custkey", how="left")
        counts = m["n"].fillna(0).to_numpy(np.int64)
        hist = pd.DataFrame({"c": counts}).groupby(
            "c", as_index=False).size()
        return pa.table({
            "c_count": pa.array(hist["c"].to_numpy(np.int64)),
            "custdist": pa.array(hist["size"].to_numpy(np.int64)),
        })

    fact_side = orders_ds.map_batches(
        _fact, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536)
    dim_side = customer_ds.map_batches(
        _dim, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536)
    return (
        # ≲40 c_count keys — 2 lanes (the dimension-bounded spacing rule)
        _cogroup(fact_side, dim_side, _grp, coalesce)
        .repartition(2)
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
        .sort(["custdist", "c_count"], descending=[True, True])
    )


def priority_class_lines(lineitem_ds, orders_ds,
                         date_lo: str = "1996-01-01",
                         date_hi: str = "1997-01-01",
                         parts: int = 64, coalesce: int = 8):
    """TPC-H Q12-style line counts by class: per ``l_returnflag``
    (standing in for Q12's absent ``l_shipmode``), how many
    window-shipped lineitems belong to high-priority orders
    ('1-URGENT'/'2-HIGH') vs the rest.

    Shape — per-batch (orderkey, flag, cnt) partials collapse the
    window-filtered lineitem before ONE orderkey-hash cogroup attaches
    ``o_orderpriority``; each partition folds to ≤3 per-flag
    (high, low) partials and the engine Sum runs over returnflag
    cardinality. No driver fold beyond the ≤3-row result.

    (Reference analog: the success/failure counter split per request
    attribute — app/routers/analysis.py — as a two-way CASE aggregate.)

    Output: (l_returnflag, high_line_count, low_line_count) sorted by
    flag."""
    from ray.data.aggregate import Sum

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def _fact(b: pa.Table) -> pa.Table:
        d = b.column("l_shipdate")
        b = b.filter(pc.and_(
            pc.greater_equal(d, pa.scalar(lo, pa.timestamp("us"))),
            pc.less(d, pa.scalar(hi, pa.timestamp("us"))),
        ))
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        fl = b.column("l_returnflag").to_pandas()
        g = pd.DataFrame({"k": ok, "f": fl}).groupby(
            ["k", "f"], as_index=False).size()
        k = g["k"].to_numpy(np.int64)
        return pa.table({
            "part": _mod_part(k, parts),
            "o_orderkey": pa.array(k),
            "flag": pa.array(g["f"].astype(str).tolist(), pa.string()),
            "cnt": pa.array(g["size"].to_numpy(np.int64)),
            "prio": pa.array([""] * len(k), pa.string()),
            "is_dim": pa.array(np.zeros(len(k), np.int8), pa.int8()),
        })

    def _dim(b: pa.Table) -> pa.Table:
        k = b.column("o_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(k)
        return pa.table({
            "part": _mod_part(k, parts),
            "o_orderkey": pa.array(k),
            "flag": pa.array([""] * n, pa.string()),
            "cnt": pa.array(np.zeros(n, np.int64)),
            "prio": b.column("o_orderpriority"),
            "is_dim": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    def _grp(g: pd.DataFrame) -> pa.Table:
        fact = g[g["is_dim"] == 0]
        if fact.empty:
            return _empty(l_returnflag=pa.string(),
                          high_line_count=pa.int64(),
                          low_line_count=pa.int64())
        dim = g[g["is_dim"] == 1].drop_duplicates("o_orderkey")
        m = fact.merge(dim[["o_orderkey", "prio"]], on="o_orderkey",
                       how="inner", suffixes=("_f", "_d"))
        if m.empty:
            return _empty(l_returnflag=pa.string(),
                          high_line_count=pa.int64(),
                          low_line_count=pa.int64())
        high = m["prio_d"].isin(["1-URGENT", "2-HIGH"]).to_numpy()
        cnt = m["cnt"].to_numpy(np.int64)
        agg = pd.DataFrame({
            "flag": m["flag"].to_numpy(object),
            "h": np.where(high, cnt, 0),
            "l": np.where(high, 0, cnt),
        }).groupby("flag", as_index=False).sum()
        return pa.table({
            "l_returnflag": pa.array(
                agg["flag"].astype(str).tolist(), pa.string()),
            "high_line_count": pa.array(agg["h"].to_numpy(np.int64)),
            "low_line_count": pa.array(agg["l"].to_numpy(np.int64)),
        })

    fact_side = lineitem_ds.map_batches(
        _fact, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536)
    dim_side = orders_ds.map_batches(
        _dim, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536)
    return (
        # ≤3 returnflag keys — 2 lanes (dimension-bounded spacing rule)
        _cogroup(fact_side, dim_side, _grp, coalesce)
        .repartition(2)
        .groupby("l_returnflag")
        .aggregate(Sum("high_line_count", alias_name="high_line_count"),
                   Sum("low_line_count", alias_name="low_line_count"))
        .sort("l_returnflag")
    )


def important_parts(lineitem_ds, parts: int = 64):
    """TPC-H Q11-style important stock: parts whose total shipped value
    (Σ ``round(l_extendedprice·100)`` cents — the synthetic corpus has
    no partsupp, so Q11's ``ps_supplycost·ps_availqty`` is recast onto
    lineitem value) exceeds the ALL-PARTS AVERAGE, i.e.
    ``value_cents · n_parts > total_value`` — the same
    fraction-of-global-sum shape as Q11's ``> sum(...)·fraction``.

    Shape — per-batch (partkey, cents) partials collapse lineitem to
    part cardinality before ONE coarse-hash ``cogroup_agg`` keyed sum
    (the engine groupby pays per-KEY cost at part cardinality — measured
    5.9 s vs 1.3 s at sf0.1's 20k parts); the per-part table is
    materialized ONCE (part cardinality, grows with SF but it is the
    query's own output dimension) and re-consumed for (a) the 2-scalar
    engine Sum/Count global probe and (b) the threshold filter — the
    driver sees exactly 2 scalars, and the integer threshold
    ``value > total // n`` is bit-equivalent to ``value·n > total``
    (strict ``>`` with integer value), so no int64 overflow at any SF.

    (Reference analog: 'which uploads dominate total bytes' over the
    audit counters — app/routers/analysis.py — as a global-share
    qualifier.)

    Output: (l_partkey, value_cents) sorted value DESC, partkey ASC."""
    from ray.data.aggregate import Count, Sum

    from ..common import cogroup_agg

    def _partial(b: pa.Table) -> pa.Table:
        k = b.column("l_partkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        cents = np.rint(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0).astype(np.int64)
        g = pd.DataFrame({"k": k, "v": cents}).groupby(
            "k", as_index=False)["v"].sum()
        return pa.table({
            "l_partkey": pa.array(g["k"].to_numpy(np.int64)),
            "value_cents": pa.array(g["v"].to_numpy(np.int64)),
        })

    per_part = cogroup_agg(
        lineitem_ds.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536),
        "l_partkey", {"value_cents": ("value_cents", "sum")},
        parts=parts,
    ).materialize()  # part cardinality; consumed twice (probe+filter)
    agg = per_part.aggregate(Sum("value_cents"), Count())
    if not agg or not agg.get("count()"):
        from ..common import typed_empty

        return typed_empty(l_partkey=pa.int64(), value_cents=pa.int64())
    thr = int(agg["sum(value_cents)"]) // int(agg["count()"])

    def _keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b.column("value_cents"),
                                   pa.scalar(thr, pa.int64())))

    return (
        per_part.map_batches(_keep, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)
        .sort(["value_cents", "l_partkey"], descending=[True, False])
    )


def min_cost_supplier(lineitem_ds, part_ds, supplier_ds,
                      size: int = 5, k: int = 100,
                      parts: int = 64, coalesce: int = 8):
    """TPC-H Q2-style min-cost supplier: for every part of ``p_size ==
    size``, the supplier offering the MINIMUM observed price
    (``round(l_extendedprice·100)`` cents — the synthetic corpus has no
    partsupp, so Q2's ``ps_supplycost`` argmin is recast onto lineitem
    price), smallest ``l_suppkey`` breaking price ties; top-``k``
    cheapest parts returned (Q2's LIMIT 100).

    Shape — per-batch per-part argmin partials (ONE row per part per
    batch: lexicographic (cents, suppkey) min is associative, so
    partial argmins compose exactly) collapse lineitem before ONE
    partkey-hash cogroup against the size-filtered part dim (filter
    pushed below the shuffle); ``topk_exact`` picks the ``k`` cheapest
    on the (price, partkey) total order with NO all-to-all range sort;
    supplier names attach AFTER the top-k, touching only the ≤k winning
    suppkeys (the Q10 name-attach-after-top-k shape).

    (Reference analog: 'cheapest source per item' over the audit
    counters — a per-key argmin with dim attach, app/routers/analysis.py
    rollup family.)

    Output: (p_partkey, p_name, s_suppkey, s_name, min_price_cents)
    sorted price ASC, partkey ASC, ≤k rows."""
    import ray.data as rd

    from ..common import topk_exact, uncached_get, typed_empty

    def _argmin(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["k", "c", "s"]).drop_duplicates("k")

    def _fact(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        cents = np.rint(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0).astype(np.int64)
        g = _argmin(pd.DataFrame({"k": pk, "c": cents, "s": sk}))
        kk = g["k"].to_numpy(np.int64)
        return pa.table({
            "part": _mod_part(kk, parts),
            "p_partkey": pa.array(kk),
            "cents": pa.array(g["c"].to_numpy(np.int64)),
            "s_suppkey": pa.array(g["s"].to_numpy(np.int64)),
            "p_name": pa.array([""] * len(kk), pa.string()),
            "is_dim": pa.array(np.zeros(len(kk), np.int8), pa.int8()),
        })

    def _dim(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("p_size"),
                              pa.scalar(size, b.schema.field("p_size").type)))
        kk = b.column("p_partkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(kk)
        return pa.table({
            "part": _mod_part(kk, parts),
            "p_partkey": pa.array(kk),
            "cents": pa.array(np.zeros(n, np.int64)),
            "s_suppkey": pa.array(np.zeros(n, np.int64)),
            "p_name": b.column("p_name"),
            "is_dim": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    def _grp(g: pd.DataFrame) -> pa.Table:
        dim = g[g["is_dim"] == 1]
        fact = g[g["is_dim"] == 0]
        if dim.empty or fact.empty:
            return _empty(p_partkey=pa.int64(), p_name=pa.string(),
                          s_suppkey=pa.int64(), min_price_cents=pa.int64())
        best = _argmin(fact.rename(columns={
            "p_partkey": "k", "cents": "c", "s_suppkey": "s"})
            [["k", "c", "s"]])
        m = best.merge(
            dim[["p_partkey", "p_name"]].drop_duplicates("p_partkey"),
            left_on="k", right_on="p_partkey", how="inner")
        if m.empty:
            return _empty(p_partkey=pa.int64(), p_name=pa.string(),
                          s_suppkey=pa.int64(), min_price_cents=pa.int64())
        return pa.table({
            "p_partkey": pa.array(m["k"].to_numpy(np.int64)),
            "p_name": pa.array(m["p_name"].astype(str).tolist(),
                               pa.string()),
            "s_suppkey": pa.array(m["s"].to_numpy(np.int64)),
            "min_price_cents": pa.array(m["c"].to_numpy(np.int64)),
        })

    fact_side = lineitem_ds.map_batches(
        _fact, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536)
    dim_side = part_ds.map_batches(
        _dim, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536)
    winners = topk_exact(
        _cogroup(fact_side, dim_side, _grp, coalesce),
        [("min_price_cents", "ascending"), ("p_partkey", "ascending")],
        k,
    ).to_pandas()  # ≤k rows
    if winners.empty:
        return typed_empty(p_partkey=pa.int64(), p_name=pa.string(),
                           s_suppkey=pa.int64(), s_name=pa.string(),
                           min_price_cents=pa.int64())

    # name attach AFTER the top-k: only the ≤k winning suppkeys leave
    # the supplier scan (k-bounded closure set, no broadcast machinery)
    need = pa.array(sorted(set(winners["s_suppkey"].tolist())), pa.int64())

    def _names(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(
            pc.cast(b.column("s_suppkey"), pa.int64()), value_set=need))
        return pa.table({
            "s_suppkey": pc.cast(b.column("s_suppkey"), pa.int64()),
            "s_name": b.column("s_name"),
        })

    names = supplier_ds.map_batches(
        _names, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536).to_pandas()  # ≤k rows
    out = winners.merge(names, on="s_suppkey", how="left").sort_values(
        ["min_price_cents", "p_partkey"])
    return rd.from_arrow(pa.table({
        "p_partkey": pa.array(out["p_partkey"].to_numpy(np.int64)),
        "p_name": pa.array(out["p_name"].astype(str).tolist(),
                           pa.string()),
        "s_suppkey": pa.array(out["s_suppkey"].to_numpy(np.int64)),
        "s_name": pa.array(out["s_name"].astype(str).tolist(),
                           pa.string()),
        "min_price_cents": pa.array(
            out["min_price_cents"].to_numpy(np.int64)),
    }))


def excess_shipment_suppliers(lineitem_ds, part_ds, supplier_ds,
                              name_like: str = "blue",
                              date_lo: str = "1996-01-01",
                              date_hi: str = "1997-01-01",
                              min_qty: int = 250,
                              parts: int = 64, coalesce: int = 8):
    """TPC-H Q20-style excess-shipment suppliers: suppliers whose total
    shipped quantity of ``%name_like%``-named parts inside the ship-date
    window exceeds ``min_qty`` (the synthetic corpus has no partsupp, so
    Q20's half-of-availqty predicate is recast as a fixed quantity
    threshold over shipped volume), with names attached.

    Shape — two chained cogroups, every filter below its shuffle:
    (1) partkey cogroup semi-joins the window-filtered per-batch
    (partkey, suppkey, qty) partials against the name-filtered part dim
    and emits per-partition (suppkey, qty) partials; (2) suppkey cogroup
    owns each supplier whole, so the global sum, the ``> min_qty``
    HAVING and the name attach all happen inside the one partition —
    no engine groupby, no driver fold beyond the qualifying rows.

    (Reference analog: 'which sources exceeded their upload budget' —
    the audit-counter threshold view, app/routers/analysis.py.)

    Output: (s_suppkey, s_name, total_qty) sorted by s_suppkey."""
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def _fact(b: pa.Table) -> pa.Table:
        d = b.column("l_shipdate")
        b = b.filter(pc.and_(
            pc.greater_equal(d, pa.scalar(lo, pa.timestamp("us"))),
            pc.less(d, pa.scalar(hi, pa.timestamp("us"))),
        ))
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        q = np.rint(b.column("l_quantity").to_numpy(
            zero_copy_only=False)).astype(np.int64)
        g = pd.DataFrame({"p": pk, "s": sk, "q": q}).groupby(
            ["p", "s"], as_index=False)["q"].sum()
        kk = g["p"].to_numpy(np.int64)
        return pa.table({
            "part": _mod_part(kk, parts),
            "key": pa.array(kk),
            "s_suppkey": pa.array(g["s"].to_numpy(np.int64)),
            "qty": pa.array(g["q"].to_numpy(np.int64)),
            "is_dim": pa.array(np.zeros(len(kk), np.int8), pa.int8()),
        })

    def _pdim(b: pa.Table) -> pa.Table:
        b = b.filter(pc.match_substring(b.column("p_name"), name_like))
        kk = b.column("p_partkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(kk)
        return pa.table({
            "part": _mod_part(kk, parts),
            "key": pa.array(kk),
            "s_suppkey": pa.array(np.zeros(n, np.int64)),
            "qty": pa.array(np.zeros(n, np.int64)),
            "is_dim": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    def _semi(g: pd.DataFrame) -> pa.Table:
        dim = g[g["is_dim"] == 1]
        fact = g[g["is_dim"] == 0]
        if dim.empty or fact.empty:
            return _empty(part=pa.int32(), key=pa.int64(),
                          s_name=pa.string(), qty=pa.int64(),
                          is_dim=pa.int8())
        kept = fact[fact["key"].isin(set(dim["key"]))]
        agg = kept.groupby("s_suppkey", as_index=False)["qty"].sum()
        sk = agg["s_suppkey"].to_numpy(np.int64)
        return pa.table({
            "part": _mod_part(sk, parts),
            "key": pa.array(sk),
            "s_name": pa.array([""] * len(sk), pa.string()),
            "qty": pa.array(agg["qty"].to_numpy(np.int64)),
            "is_dim": pa.array(np.zeros(len(sk), np.int8), pa.int8()),
        })

    def _sdim(b: pa.Table) -> pa.Table:
        sk = b.column("s_suppkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(sk)
        return pa.table({
            "part": _mod_part(sk, parts),
            "key": pa.array(sk),
            "s_name": b.column("s_name"),
            "qty": pa.array(np.zeros(n, np.int64)),
            "is_dim": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    def _having(g: pd.DataFrame) -> pa.Table:
        dim = g[g["is_dim"] == 1].drop_duplicates("key")
        fact = g[g["is_dim"] == 0]
        if dim.empty or fact.empty:
            return _empty(s_suppkey=pa.int64(), s_name=pa.string(),
                          total_qty=pa.int64())
        agg = fact.groupby("key", as_index=False)["qty"].sum()
        agg = agg[agg["qty"].to_numpy(np.int64) > min_qty]
        m = agg.merge(dim[["key", "s_name"]], on="key", how="inner")
        if m.empty:
            return _empty(s_suppkey=pa.int64(), s_name=pa.string(),
                          total_qty=pa.int64())
        return pa.table({
            "s_suppkey": pa.array(m["key"].to_numpy(np.int64)),
            "s_name": pa.array(m["s_name"].astype(str).tolist(),
                               pa.string()),
            "total_qty": pa.array(m["qty"].to_numpy(np.int64)),
        })

    fact_side = lineitem_ds.map_batches(
        _fact, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536)
    pdim_side = part_ds.map_batches(
        _pdim, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536)
    stage1 = _cogroup(fact_side, pdim_side, _semi, coalesce)
    sdim_side = supplier_ds.map_batches(
        _sdim, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536)
    return _cogroup(stage1, sdim_side, _having, coalesce).sort("s_suppkey")


def sole_late_supplier(lineitem_ds, orders_ds, supplier_ds,
                       late_days: int = 900, k: int = 100,
                       parts: int = 64, coalesce: int = 8,
                       order_map=None):
    """TPC-H Q21-style suppliers who kept orders waiting: for finished
    ('F') multi-supplier orders where EXACTLY ONE supplier's latest
    lineitem shipped more than ``late_days`` after the order date (the
    synthetic lineitem has no commit/receipt dates, so Q21's
    receipt-vs-commit lateness is recast as ship-vs-order lateness),
    count the orders each sole-blame supplier stalled; top-``k`` by
    count.

    Shape — per-batch (orderkey, suppkey, max_ship) partials collapse
    lineitem before ONE orderkey-hash cogroup against the
    status-filtered orders dim; each order is whole inside its
    partition, so the EXISTS/NOT-EXISTS pair is just a per-order
    late-count == 1 ∧ supplier-count ≥ 2 test there, and the partition
    emits per-suppkey partial counts. The final keyed sum runs as a
    coarse-hash ``cogroup_agg`` (supplier cardinality grows with SF —
    the engine groupby's per-key cost is the important_parts lesson),
    ``topk_exact`` avoids the all-to-all sort, and names attach AFTER
    the top-k (k-bounded supplier scan).

    (Reference analog: 'which worker alone stalled a batch' — the
    per-request failure attribution in app/routers/analysis.py's
    counters, as an exactly-one qualifier.)

    Output: (s_suppkey, s_name, numwait) sorted numwait DESC, suppkey
    ASC, ≤k rows."""
    import ray.data as rd

    from ..common import cogroup_agg, topk_exact, typed_empty

    late_us = np.int64(late_days) * 86_400_000_000

    def _fact(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        ship = b.column("l_shipdate").to_numpy(
            zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        g = pd.DataFrame({"k": ok, "s": sk, "t": ship}).groupby(
            ["k", "s"], as_index=False)["t"].max()
        kk = g["k"].to_numpy(np.int64)
        return pa.table({
            "part": _mod_part(kk, parts),
            "o_orderkey": pa.array(kk),
            "s_suppkey": pa.array(g["s"].to_numpy(np.int64)),
            "ts_us": pa.array(g["t"].to_numpy(np.int64)),
            "is_dim": pa.array(np.zeros(len(kk), np.int8), pa.int8()),
        })

    def _dim(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("o_orderstatus"), pa.scalar("F")))
        kk = b.column("o_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        od = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        n = len(kk)
        return pa.table({
            "part": _mod_part(kk, parts),
            "o_orderkey": pa.array(kk),
            "s_suppkey": pa.array(np.zeros(n, np.int64)),
            "ts_us": pa.array(od),
            "is_dim": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    def _grp(g: pd.DataFrame) -> pa.Table:
        dim = g[g["is_dim"] == 1].drop_duplicates("o_orderkey")
        fact = g[g["is_dim"] == 0]
        if dim.empty or fact.empty:
            return _empty(s_suppkey=pa.int64(), numwait=pa.int64())
        # fold per-batch partial maxima to one row per (order, supplier)
        ms = fact.groupby(["o_orderkey", "s_suppkey"],
                          as_index=False)["ts_us"].max()
        m = ms.merge(dim[["o_orderkey", "ts_us"]], on="o_orderkey",
                     how="inner", suffixes=("_s", "_o"))
        if m.empty:
            return _empty(s_suppkey=pa.int64(), numwait=pa.int64())
        late = (m["ts_us_s"].to_numpy(np.int64)
                > m["ts_us_o"].to_numpy(np.int64) + late_us)
        per = pd.DataFrame({
            "k": m["o_orderkey"].to_numpy(np.int64),
            "s": m["s_suppkey"].to_numpy(np.int64),
            "late": late.astype(np.int64),
            "late_sk": np.where(late, m["s_suppkey"].to_numpy(np.int64),
                                np.int64(-1)),
        }).groupby("k").agg(
            nsupp=("s", "size"), nlate=("late", "sum"),
            sk=("late_sk", "max"))
        hit = per[(per["nsupp"] >= 2) & (per["nlate"] == 1)]
        if hit.empty:
            return _empty(s_suppkey=pa.int64(), numwait=pa.int64())
        cnt = hit.groupby("sk", as_index=False).size()
        return pa.table({
            "s_suppkey": pa.array(cnt["sk"].to_numpy(np.int64)),
            "numwait": pa.array(cnt["size"].to_numpy(np.int64)),
        })

    if order_map is not None:
        # size-gated FAST PATH (q_orders_by_segment selector discipline):
        # the orderkey cogroup is irreducible (the exactly-one-late test
        # needs every supplier of an order together), but the orders dim
        # folds to a broadcast (orderkey, orderdate) lookup AND the fact
        # partials semi-join it at the map stage — only 'F'-order
        # lineitem partials cross the one shuffle. Bit-identical
        # (pytest-pinned).
        import ray

        from ..common import cached_broadcast

        f = order_map[order_map["o_orderstatus"].astype(str) == "F"]
        f = f.sort_values("o_orderkey")
        dim_ref = ray.put((
            f["o_orderkey"].to_numpy(np.int64),
            f["o_orderdate"].to_numpy("datetime64[us]").view(np.int64),
        ))

        def _fact_bcast(b: pa.Table) -> pa.Table:
            oks, _ = uncached_get(dim_ref)
            ok = b.column("l_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            sk = b.column("l_suppkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            ship = b.column("l_shipdate").to_numpy(
                zero_copy_only=False).astype(
                "datetime64[us]").view(np.int64)
            if len(oks) == 0:
                return pa.table({
                    "part": pa.array([], pa.int32()),
                    "o_orderkey": pa.array([], pa.int64()),
                    "s_suppkey": pa.array([], pa.int64()),
                    "ts_us": pa.array([], pa.int64()),
                })
            oidx = np.minimum(np.searchsorted(oks, ok), len(oks) - 1)
            keep = oks[oidx] == ok  # 'F'-status semi-join
            g = pd.DataFrame({"k": ok[keep], "s": sk[keep],
                              "t": ship[keep]}).groupby(
                ["k", "s"], as_index=False)["t"].max()
            kk = g["k"].to_numpy(np.int64)
            return pa.table({
                "part": _mod_part(kk, parts),
                "o_orderkey": pa.array(kk),
                "s_suppkey": pa.array(g["s"].to_numpy(np.int64)),
                "ts_us": pa.array(g["t"].to_numpy(np.int64)),
            })

        def _grp_bcast(g: pd.DataFrame) -> pa.Table:
            oks, ods = uncached_get(dim_ref)
            if g.empty:
                return _empty(s_suppkey=pa.int64(), numwait=pa.int64())
            ms = g.groupby(["o_orderkey", "s_suppkey"],
                           as_index=False)["ts_us"].max()
            kk = ms["o_orderkey"].to_numpy(np.int64)
            odate = ods[np.searchsorted(oks, kk)]  # all present (semi)
            late = ms["ts_us"].to_numpy(np.int64) > odate + late_us
            per = pd.DataFrame({
                "k": kk,
                "s": ms["s_suppkey"].to_numpy(np.int64),
                "late": late.astype(np.int64),
                "late_sk": np.where(
                    late, ms["s_suppkey"].to_numpy(np.int64),
                    np.int64(-1)),
            }).groupby("k").agg(
                nsupp=("s", "size"), nlate=("late", "sum"),
                sk=("late_sk", "max"))
            hit = per[(per["nsupp"] >= 2) & (per["nlate"] == 1)]
            if hit.empty:
                return _empty(s_suppkey=pa.int64(), numwait=pa.int64())
            cnt = hit.groupby("sk", as_index=False).size()
            return pa.table({
                "s_suppkey": pa.array(cnt["sk"].to_numpy(np.int64)),
                "numwait": pa.array(cnt["size"].to_numpy(np.int64)),
            })

        per_supp = cogroup_agg(
            lineitem_ds.map_batches(
                _fact_bcast, batch_format="pyarrow",
                zero_copy_batch=True, batch_size=65536)
            .repartition(coalesce)
            .groupby("part")
            .map_groups(_grp_bcast, batch_format="pandas"),
            "s_suppkey", {"numwait": ("numwait", "sum")}, parts=parts,
        )
    else:
        fact_side = lineitem_ds.map_batches(
            _fact, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        dim_side = orders_ds.map_batches(
            _dim, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536)
        per_supp = cogroup_agg(
            _cogroup(fact_side, dim_side, _grp, coalesce),
            "s_suppkey", {"numwait": ("numwait", "sum")}, parts=parts,
        )
    winners = topk_exact(
        per_supp,
        [("numwait", "descending"), ("s_suppkey", "ascending")], k,
    ).to_pandas()  # ≤k rows
    if winners.empty:
        return typed_empty(s_suppkey=pa.int64(), s_name=pa.string(),
                           numwait=pa.int64())

    need = pa.array(sorted(set(winners["s_suppkey"].tolist())), pa.int64())

    def _names(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(
            pc.cast(b.column("s_suppkey"), pa.int64()), value_set=need))
        return pa.table({
            "s_suppkey": pc.cast(b.column("s_suppkey"), pa.int64()),
            "s_name": b.column("s_name"),
        })

    names = supplier_ds.map_batches(
        _names, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536).to_pandas()  # ≤k rows
    out = winners.merge(names, on="s_suppkey", how="left").sort_values(
        ["numwait", "s_suppkey"], ascending=[False, True])
    return rd.from_arrow(pa.table({
        "s_suppkey": pa.array(out["s_suppkey"].to_numpy(np.int64)),
        "s_name": pa.array(out["s_name"].astype(str).tolist(),
                           pa.string()),
        "numwait": pa.array(out["numwait"].to_numpy(np.int64)),
    }))
