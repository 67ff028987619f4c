"""Unit tests for ops/tpch_deep.py (Q7/Q10/Q14/Q19 forms): edge semantics
the parametrized DuckDB gate (tests/test_queries_vs_duckdb.py) can't pin —
hand-built inputs with known answers, empty-side groups, determinism across
repartitionings, and the (hi, lo) overflow reassembly."""

import numpy as np
import pandas as pd
import pyarrow as pa

import resume_ocr_ray.ops.tpch_deep as TD


def _rd(tbl: pa.Table, blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(tbl)
    return ds.repartition(blocks) if blocks > 1 else ds


def _li_tbl(rows):
    df = pd.DataFrame(rows)
    return pa.table({
        "l_orderkey": pa.array(df["ok"].to_numpy(np.int64)),
        "l_suppkey": pa.array(df.get(
            "sk", pd.Series(np.zeros(len(df)))).to_numpy(np.int64)),
        "l_partkey": pa.array(df.get(
            "pk", pd.Series(np.zeros(len(df)))).to_numpy(np.int64)),
        "l_quantity": pa.array(df.get(
            "qty", pd.Series(np.ones(len(df)))).to_numpy(np.float64)),
        "l_extendedprice": pa.array(df["price"].to_numpy(np.float64)),
        "l_discount": pa.array(df.get(
            "disc", pd.Series(np.zeros(len(df)))).to_numpy(np.float64)),
        "l_returnflag": pa.array(df.get(
            "flag", pd.Series(["N"] * len(df))).tolist(), pa.string()),
        "l_shipdate": pa.array(
            df.get("ship", pd.Series(["1996-06-15"] * len(df)))
            .astype("datetime64[us]"), pa.timestamp("us")),
    })


def test_returned_revenue_hand_answer(ray_session):
    # two customers; cust 1 returns 2 items (100.00 and 50.00 at 10% off),
    # cust 2 returns nothing in-window → only cust 1 appears
    li = _li_tbl([
        {"ok": 1, "price": 100.0, "disc": 0.10, "flag": "R"},
        {"ok": 1, "price": 50.0, "disc": 0.10, "flag": "R"},
        {"ok": 1, "price": 999.0, "disc": 0.00, "flag": "N"},  # not returned
        {"ok": 2, "price": 77.0, "disc": 0.00, "flag": "R"},   # out-of-window
    ])
    orders = pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 20], pa.int64()),
        "o_orderdate": pa.array(
            pd.Series(["1996-02-01", "1995-02-01"]).astype(
                "datetime64[us]"), pa.timestamp("us")),
    })
    cust = pa.table({
        "c_custkey": pa.array([10, 20], pa.int64()),
        "c_name": pa.array(["alice", "bob"], pa.string()),
        "c_acctbal": pa.array([12.5, -1.0], pa.float64()),
        "c_nationkey": pa.array([0, 1], pa.int64()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["N0", "N1"], pa.string()),
    })
    out = TD.returned_item_revenue(
        _rd(li, 3), _rd(orders), _rd(cust), _rd(nation)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # rev_e4 = 10000*90 + 5000*90
    assert int(r["revenue_e4"]) == 10000 * 90 + 5000 * 90
    assert r["c_name"] == "alice" and r["nation"] == "N0"
    assert r["c_acctbal"] == 12.5

    # the size-gated order_map+cust_map broadcast plan must emit EXACTLY
    # the cogroup chain's rows (window filter + inner semantics included)
    fast = TD.returned_item_revenue(
        _rd(li, 3), _rd(orders), _rd(cust), _rd(nation),
        order_map=orders.to_pandas(), cust_map=cust.to_pandas(),
    ).to_pandas()
    pd.testing.assert_frame_equal(out, fast)


def test_volume_shipping_directions_and_empty(ray_session):
    # supplier in N1 ships to customer in N2 and vice versa; domestic
    # (N1→N1) is excluded; a third nation never appears
    li = _li_tbl([
        {"ok": 1, "sk": 100, "price": 10.0, "ship": "1996-03-01"},
        {"ok": 2, "sk": 200, "price": 20.0, "ship": "1997-03-01"},
        {"ok": 3, "sk": 100, "price": 40.0, "ship": "1996-05-01"},  # domestic
    ])
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([11, 22, 33], pa.int64()),
    })
    cust = pa.table({
        "c_custkey": pa.array([11, 22, 33], pa.int64()),
        "c_nationkey": pa.array([2, 1, 1], pa.int64()),
    })
    supp = pa.table({
        "s_suppkey": pa.array([100, 200], pa.int64()),
        "s_nationkey": pa.array([1, 2], pa.int64()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([1, 2, 3], pa.int64()),
        "n_name": pa.array(["NATION_1", "NATION_2", "NATION_3"],
                           pa.string()),
    })
    out = TD.volume_shipping(
        _rd(li, 2), _rd(orders), _rd(cust), _rd(supp), _rd(nation)
    ).to_pandas()
    assert len(out) == 2
    got = {(r.supp_nation, r.cust_nation, int(r.l_year)):
           int(r.revenue_e4) for r in out.itertuples()}
    assert got[("NATION_1", "NATION_2", 1996)] == 1000 * 100
    assert got[("NATION_2", "NATION_1", 1997)] == 2000 * 100

    # nation pair with no cross-border rows → typed empty, not a crash.
    # Schema is asserted at the DATASET level: Ray's to_pandas() of a
    # 0-row dataset drops columns, but dataset composition (union, joins)
    # sees the typed schema, which is what downstream consumers use.
    empty = TD.volume_shipping(
        _rd(li, 2), _rd(orders), _rd(cust), _rd(supp), _rd(nation),
        nation_a="NATION_1", nation_b="NATION_3")
    assert empty.schema().names == ["supp_nation", "cust_nation",
                                    "l_year", "revenue_e4"]
    assert empty.count() == 0


def test_promo_revenue_hilo_reassembly(ray_session):
    # large prices push per-partition partials through the (hi, lo)
    # split; answer still exact
    rows = [{"ok": i, "pk": i % 3, "price": 9.9e5, "disc": 0.0,
             "ship": "1996-09-15"} for i in range(300)]
    rows.append({"ok": 999, "pk": 0, "price": 100.0, "disc": 0.0,
                 "ship": "1996-10-15"})  # out of window
    li = _li_tbl(rows)
    part = pa.table({
        "p_partkey": pa.array([0, 1, 2], pa.int64()),
        "p_type": pa.array(["PROMO", "ECONOMY", "PROMO"], pa.string()),
    })
    out = TD.promo_revenue(_rd(li, 4), _rd(part)).to_pandas()
    per_item = 99000000 * 100  # round(9.9e5*100) * 100
    assert int(out["total_rev_e4"].iloc[0]) == 300 * per_item
    assert int(out["promo_rev_e4"].iloc[0]) == 200 * per_item
    assert out["promo_pct"].iloc[0] == 100.0 * (200 * per_item) / (
        300 * per_item)


def test_disjunctive_revenue_branches(ray_session):
    li = _li_tbl([
        {"ok": 1, "pk": 1, "qty": 5, "price": 10.0},    # Brand#12 size 3 ✓
        {"ok": 1, "pk": 1, "qty": 12, "price": 10.0},   # qty out for br1
        {"ok": 2, "pk": 2, "qty": 15, "price": 20.0},   # Brand#23 size 9 ✓
        {"ok": 3, "pk": 3, "qty": 25, "price": 40.0},   # Brand#3 size 15 ✓
        {"ok": 3, "pk": 4, "qty": 25, "price": 80.0},   # Brand#9 — no branch
    ])
    part = pa.table({
        "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "p_brand": pa.array(["Brand#12", "Brand#23", "Brand#3",
                             "Brand#9"], pa.string()),
        "p_size": pa.array([3, 9, 15, 1], pa.int64()),
    })
    out = TD.disjunctive_revenue(_rd(li, 2), _rd(part)).to_pandas()
    assert int(out["n_items"].iloc[0]) == 3
    assert int(out["revenue_e4"].iloc[0]) == (1000 + 2000 + 4000) * 100


def test_product_line_profit_name_filter_and_chain(ray_session):
    li = _li_tbl([
        {"ok": 1, "pk": 1, "sk": 100, "price": 10.0, "ship": "1996-03-01"},
        {"ok": 2, "pk": 2, "sk": 100, "price": 20.0, "ship": "1997-03-01"},
        {"ok": 3, "pk": 1, "sk": 200, "price": 40.0, "ship": "1996-08-01"},
    ])
    part = pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["red widget", "blue bolt"], pa.string()),
    })
    supp = pa.table({
        "s_suppkey": pa.array([100, 200], pa.int64()),
        "s_nationkey": pa.array([0, 1], pa.int64()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["N0", "N1"], pa.string()),
    })
    out = TD.product_line_profit(
        _rd(li, 2), _rd(part), _rd(supp), _rd(nation)).to_pandas()
    # only partkey 1 matches '%red%': rows 1 (N0, 1996) and 3 (N1, 1996)
    got = {(r.nation, int(r.o_year)): int(r.revenue_e4)
           for r in out.itertuples()}
    assert got == {("N0", 1996): 1000 * 100, ("N1", 1996): 4000 * 100}

    # no part matches → typed empty with the output schema
    empty = TD.product_line_profit(
        _rd(li, 2), _rd(part), _rd(supp), _rd(nation),
        name_frag="nonexistent")
    assert empty.schema().names == ["nation", "o_year", "revenue_e4"]
    assert empty.count() == 0


def test_market_share_conditional_fraction(ray_session):
    # ASIA = region 2; nations 2 (ASIA) and 12 (ASIA, the share nation)
    li = _li_tbl([
        {"ok": 1, "sk": 100, "price": 10.0},   # share supplier
        {"ok": 2, "sk": 200, "price": 30.0},   # other supplier
        {"ok": 3, "sk": 100, "price": 99.0},   # non-ASIA customer
    ])
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([11, 22, 33], pa.int64()),
        "o_orderdate": pa.array(
            pd.Series(["1996-02-01", "1996-07-01", "1996-09-01"]).astype(
                "datetime64[us]"), pa.timestamp("us")),
    })
    cust = pa.table({
        "c_custkey": pa.array([11, 22, 33], pa.int64()),
        "c_nationkey": pa.array([2, 7, 0], pa.int64()),  # 0 = AFRICA
    })
    supp = pa.table({
        "s_suppkey": pa.array([100, 200], pa.int64()),
        "s_nationkey": pa.array([12, 0], pa.int64()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([0, 2, 7, 12], pa.int64()),
        "n_name": pa.array(["NATION_0", "NATION_2", "NATION_7",
                            "NATION_12"], pa.string()),
        "n_regionkey": pa.array([0, 2, 2, 2], pa.int64()),
    })
    out = TD.market_share(
        _rd(li, 2), _rd(orders), _rd(cust), _rd(supp), _rd(nation)
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r["o_year"]) == 1996
    assert int(r["share_rev_e4"]) == 1000 * 100
    assert int(r["total_rev_e4"]) == (1000 + 3000) * 100
    assert r["mkt_share"] == float(1000 * 100) / float(4000 * 100)


def test_supplier_broadcast_paths_bit_identical(ray_session):
    """The size-gated supp_map fast path must emit EXACTLY the shuffled
    cogroup's rows for both volume_shipping and market_share."""
    li = _li_tbl([
        {"ok": 1, "sk": 100, "price": 10.0, "ship": "1996-03-01"},
        {"ok": 2, "sk": 200, "price": 20.0, "ship": "1997-03-01"},
        {"ok": 2, "sk": 100, "price": 5.0, "ship": "1997-04-01"},
        {"ok": 3, "sk": 100, "price": 40.0, "ship": "1996-05-01"},
    ])
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([11, 22, 33], pa.int64()),
        "o_orderdate": pa.array(
            pd.Series(["1996-02-01", "1997-01-01", "1996-04-01"]).astype(
                "datetime64[us]"), pa.timestamp("us")),
    })
    cust = pa.table({
        "c_custkey": pa.array([11, 22, 33], pa.int64()),
        "c_nationkey": pa.array([2, 1, 1], pa.int64()),
    })
    supp_tbl = pa.table({
        "s_suppkey": pa.array([100, 200], pa.int64()),
        "s_nationkey": pa.array([1, 2], pa.int64()),
    })
    smap = supp_tbl.to_pandas()

    a = TD.volume_shipping(
        _rd(li, 2), _rd(orders), _rd(cust), _rd(supp_tbl),
        _rd(pa.table({
            "n_nationkey": pa.array([1, 2], pa.int64()),
            "n_name": pa.array(["NATION_1", "NATION_2"], pa.string()),
        }))).to_pandas()
    b = TD.volume_shipping(
        _rd(li, 2), _rd(orders), _rd(cust), _rd(supp_tbl),
        _rd(pa.table({
            "n_nationkey": pa.array([1, 2], pa.int64()),
            "n_name": pa.array(["NATION_1", "NATION_2"], pa.string()),
        })), supp_map=smap).to_pandas()
    pd.testing.assert_frame_equal(a, b)

    # full three-map zero-cogroup plan must also be bit-identical
    b3 = TD.volume_shipping(
        _rd(li, 2), _rd(orders), _rd(cust), _rd(supp_tbl),
        _rd(pa.table({
            "n_nationkey": pa.array([1, 2], pa.int64()),
            "n_name": pa.array(["NATION_1", "NATION_2"], pa.string()),
        })), supp_map=smap, order_map=orders.to_pandas(),
        cust_map=cust.to_pandas()).to_pandas()
    pd.testing.assert_frame_equal(a, b3)

    nation = pa.table({
        "n_nationkey": pa.array([1, 2, 12], pa.int64()),
        "n_name": pa.array(["NATION_1", "NATION_2", "NATION_12"],
                           pa.string()),
        "n_regionkey": pa.array([2, 2, 2], pa.int64()),
    })
    c = TD.market_share(
        _rd(li, 2), _rd(orders), _rd(cust), _rd(supp_tbl),
        _rd(nation), share_nation="NATION_1").to_pandas()
    d = TD.market_share(
        _rd(li, 2), _rd(orders), _rd(cust), _rd(supp_tbl),
        _rd(nation), share_nation="NATION_1",
        supp_map=smap).to_pandas()
    pd.testing.assert_frame_equal(c, d)
    assert len(c) == 2  # 1996 and 1997 market years

    # full three-map zero-cogroup plan must also be bit-identical
    e = TD.market_share(
        _rd(li, 2), _rd(orders), _rd(cust), _rd(supp_tbl),
        _rd(nation), share_nation="NATION_1",
        supp_map=smap, order_map=orders.to_pandas(),
        cust_map=cust.to_pandas()).to_pandas()
    pd.testing.assert_frame_equal(c, e)


def test_part_broadcast_paths_bit_identical(ray_session):
    """The part_map (and part+supp for Q9) fast paths must emit EXACTLY
    the shuffled cogroup's rows."""
    li = _li_tbl([
        {"ok": 1, "pk": 1, "sk": 100, "qty": 5, "price": 10.0,
         "ship": "1996-09-15"},
        {"ok": 2, "pk": 2, "sk": 200, "qty": 15, "price": 20.0,
         "ship": "1996-09-20"},
        {"ok": 3, "pk": 3, "sk": 100, "qty": 25, "price": 40.0,
         "ship": "1996-10-02"},  # out of promo window, in disjunct
    ])
    part = pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_type": pa.array(["PROMO", "ECONOMY", "PROMO"], pa.string()),
        "p_brand": pa.array(["Brand#12", "Brand#23", "Brand#3"],
                            pa.string()),
        "p_size": pa.array([3, 9, 15], pa.int64()),
        "p_name": pa.array(["red widget", "blue bolt", "red gear"],
                           pa.string()),
    })
    pdf = part.to_pandas()
    supp = pa.table({
        "s_suppkey": pa.array([100, 200], pa.int64()),
        "s_nationkey": pa.array([0, 1], pa.int64()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["N0", "N1"], pa.string()),
    })

    a = TD.promo_revenue(_rd(li, 2), _rd(part)).to_pandas()
    b = TD.promo_revenue(_rd(li, 2), _rd(part),
                         part_map=pdf).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert int(a["promo_rev_e4"].iloc[0]) == 1000 * 100

    c = TD.disjunctive_revenue(_rd(li, 2), _rd(part)).to_pandas()
    d = TD.disjunctive_revenue(_rd(li, 2), _rd(part),
                               part_map=pdf).to_pandas()
    pd.testing.assert_frame_equal(c, d)
    assert int(c["n_items"].iloc[0]) == 3

    e = TD.product_line_profit(
        _rd(li, 2), _rd(part), _rd(supp), _rd(nation)).to_pandas()
    f = TD.product_line_profit(
        _rd(li, 2), _rd(part), _rd(supp), _rd(nation),
        part_map=pdf, supp_map=supp.to_pandas()).to_pandas()
    pd.testing.assert_frame_equal(e, f)
    # pk1 (1000·100) and pk3 (4000·100) both land in (N0, 1996)
    assert len(e) == 1
    assert int(e["revenue_e4"].iloc[0]) == 5000 * 100


def test_forecast_revenue_boundaries(ray_session):
    li = _li_tbl([
        {"ok": 1, "qty": 10, "price": 100.0, "disc": 0.05,
         "ship": "1996-06-01"},   # in: disc 5, qty<24
        {"ok": 2, "qty": 10, "price": 100.0, "disc": 0.07,
         "ship": "1996-06-01"},   # in: boundary disc 7
        {"ok": 3, "qty": 10, "price": 100.0, "disc": 0.08,
         "ship": "1996-06-01"},   # out: disc 8
        {"ok": 4, "qty": 24, "price": 100.0, "disc": 0.06,
         "ship": "1996-06-01"},   # out: qty == 24
        {"ok": 5, "qty": 10, "price": 100.0, "disc": 0.06,
         "ship": "1997-01-01"},   # out: window end exclusive
    ])
    out = TD.forecast_revenue(_rd(li, 2)).to_pandas()
    assert int(out["n_items"].iloc[0]) == 2
    assert int(out["revenue_e4"].iloc[0]) == 10000 * 5 + 10000 * 7


def test_top_supplier_ties_and_paths(ray_session):
    li = _li_tbl([
        {"ok": 1, "sk": 1, "price": 100.0, "ship": "1996-02-01"},
        {"ok": 2, "sk": 2, "price": 60.0, "ship": "1996-02-01"},
        {"ok": 3, "sk": 2, "price": 40.0, "ship": "1996-02-02"},  # tie: 100
        {"ok": 4, "sk": 3, "price": 10.0, "ship": "1996-02-03"},
        {"ok": 5, "sk": 1, "price": 999.0, "ship": "1996-05-01"},  # out
    ])
    supp = pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["sa", "sb", "sc"], pa.string()),
    })
    a = TD.top_supplier(_rd(li, 2), _rd(supp)).to_pandas()
    b = TD.top_supplier(_rd(li, 2), _rd(supp),
                        supp_map=supp.to_pandas()).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert list(a["s_suppkey"]) == [1, 2]  # both at 100.00 revenue
    assert set(a["s_name"]) == {"sa", "sb"}
    assert (a["total_rev_e4"] == 10000 * 100).all()


def _orders_tbl(rows):
    # per-row defaults (a plain df.get leaves NaN on rows that omit a
    # key another row supplies)
    rows = [{"ck": 0, "odate": "1996-01-15", "prio": "3-MEDIUM",
             "status": "F", **r} for r in rows]
    df = pd.DataFrame(rows)
    return pa.table({
        "o_orderkey": pa.array(df["ok"].to_numpy(np.int64)),
        "o_custkey": pa.array(df["ck"].to_numpy(np.int64)),
        "o_orderdate": pa.array(
            df["odate"].astype("datetime64[us]"), pa.timestamp("us")),
        "o_orderpriority": pa.array(df["prio"].tolist(), pa.string()),
        "o_orderstatus": pa.array(df["status"].tolist(), pa.string()),
    })


def test_customer_distribution_keeps_zero_order_customers(ray_session):
    # customers 1 (2 non-urgent orders), 2 (only an URGENT order → 0),
    # 3 (no orders at all → 0)
    orders = _orders_tbl([
        {"ok": 10, "ck": 1}, {"ok": 11, "ck": 1},
        {"ok": 12, "ck": 2, "prio": "1-URGENT"},
    ])
    cust = pa.table({"c_custkey": pa.array([1, 2, 3], pa.int64())})
    out = TD.customer_distribution(
        _rd(orders, 2), _rd(cust, 2)).to_pandas()
    got = dict(zip(out["c_count"], out["custdist"]))
    assert got == {0: 2, 2: 1}
    # sorted custdist DESC then c_count DESC
    assert out["custdist"].tolist() == sorted(
        out["custdist"].tolist(), reverse=True)


def test_priority_class_lines_splits_by_priority(ray_session):
    orders = _orders_tbl([
        {"ok": 1, "prio": "1-URGENT"}, {"ok": 2, "prio": "5-LOW"},
    ])
    li = _li_tbl([
        {"ok": 1, "price": 1.0, "flag": "A", "ship": "1996-06-15"},
        {"ok": 1, "price": 1.0, "flag": "A", "ship": "1996-06-15"},
        {"ok": 2, "price": 1.0, "flag": "A", "ship": "1996-06-15"},
        {"ok": 2, "price": 1.0, "flag": "R", "ship": "1996-06-15"},
        # outside the ship window: must not count
        {"ok": 1, "price": 1.0, "flag": "A", "ship": "1995-01-01"},
    ])
    out = TD.priority_class_lines(_rd(li, 3), _rd(orders, 2)).to_pandas()
    a = out[out["l_returnflag"] == "A"].iloc[0]
    r = out[out["l_returnflag"] == "R"].iloc[0]
    assert (a["high_line_count"], a["low_line_count"]) == (2, 1)
    assert (r["high_line_count"], r["low_line_count"]) == (0, 1)


def test_important_parts_threshold_is_strict_above_average(ray_session):
    # parts 1,2,3 with values 100, 200, 300 cents; average 200 —
    # strict > keeps ONLY part 3 (200 is not above average)
    li = _li_tbl([
        {"ok": 1, "pk": 1, "price": 1.0},
        {"ok": 1, "pk": 2, "price": 2.0},
        {"ok": 1, "pk": 3, "price": 3.0},
    ])
    out = TD.important_parts(_rd(li, 2)).to_pandas()
    assert out["l_partkey"].tolist() == [3]
    assert out["value_cents"].tolist() == [300]


def test_min_cost_supplier_ties_break_to_smallest_suppkey(ray_session):
    # part 1: suppliers 7 and 3 both offer 100 cents → supplier 3 wins
    li = _li_tbl([
        {"ok": 1, "pk": 1, "sk": 7, "price": 1.0},
        {"ok": 2, "pk": 1, "sk": 3, "price": 1.0},
        {"ok": 3, "pk": 1, "sk": 2, "price": 9.0},
        {"ok": 4, "pk": 2, "sk": 5, "price": 4.0},  # size-filtered out
    ])
    part = pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["blue rod", "red bolt"], pa.string()),
        "p_size": pa.array([5, 9], pa.int32()),
    })
    supp = pa.table({
        "s_suppkey": pa.array([2, 3, 5, 7], pa.int64()),
        "s_name": pa.array([f"S{k}" for k in (2, 3, 5, 7)], pa.string()),
    })
    out = TD.min_cost_supplier(
        _rd(li, 3), _rd(part), _rd(supp), size=5).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["p_partkey"], row["s_suppkey"], row["s_name"],
            row["min_price_cents"]) == (1, 3, "S3", 100)


def test_sole_late_supplier_requires_exactly_one_late(ray_session):
    # order 1: suppliers 1 (late) + 2 (on time) → supplier 1 blamed
    # order 2: suppliers 1 + 2 both late → nobody blamed
    # order 3: single supplier 1 late → not multi-supplier, skipped
    # order 4 ('O' status): excluded by the status filter
    li = _li_tbl([
        {"ok": 1, "sk": 1, "price": 1.0, "ship": "1999-06-01"},
        {"ok": 1, "sk": 2, "price": 1.0, "ship": "1996-02-01"},
        {"ok": 2, "sk": 1, "price": 1.0, "ship": "1999-06-01"},
        {"ok": 2, "sk": 2, "price": 1.0, "ship": "1999-06-01"},
        {"ok": 3, "sk": 1, "price": 1.0, "ship": "1999-06-01"},
        {"ok": 4, "sk": 1, "price": 1.0, "ship": "1999-06-01"},
        {"ok": 4, "sk": 2, "price": 1.0, "ship": "1996-02-01"},
    ])
    orders = _orders_tbl([
        {"ok": 1}, {"ok": 2}, {"ok": 3},
        {"ok": 4, "status": "O"},
    ])
    supp = pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": pa.array(["S1", "S2"], pa.string()),
    })
    out = TD.sole_late_supplier(
        _rd(li, 3), _rd(orders, 2), _rd(supp), late_days=900).to_pandas()
    assert out[["s_suppkey", "numwait"]].values.tolist() == [[1, 1]]
    assert out["s_name"].tolist() == ["S1"]

    # the size-gated order_map broadcast plan (status semi-join at the
    # map stage, fact-only cogroup) must emit EXACTLY the same rows
    fast = TD.sole_late_supplier(
        _rd(li, 3), _rd(orders, 2), _rd(supp), late_days=900,
        order_map=orders.to_pandas()).to_pandas()
    pd.testing.assert_frame_equal(out, fast)


def test_excess_suppliers_having_and_name_filter(ray_session):
    # supplier 1 ships 30 blue units, supplier 2 ships 10 blue + 100
    # red (red must not count) — threshold 20 keeps only supplier 1
    li = _li_tbl([
        {"ok": 1, "pk": 1, "sk": 1, "qty": 30.0, "price": 1.0},
        {"ok": 2, "pk": 1, "sk": 2, "qty": 10.0, "price": 1.0},
        {"ok": 3, "pk": 2, "sk": 2, "qty": 100.0, "price": 1.0},
    ])
    part = pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["blue rod", "red bolt"], pa.string()),
    })
    supp = pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": pa.array(["S1", "S2"], pa.string()),
    })
    out = TD.excess_shipment_suppliers(
        _rd(li, 2), _rd(part), _rd(supp), min_qty=20).to_pandas()
    assert out[["s_suppkey", "total_qty"]].values.tolist() == [[1, 30]]
