"""Hand-case tests for the final TPC-H wave (Q2/Q11/Q20 new; Q4/Q22 existing)
— completes the 22-query decision-support suite. Each case engineers the
predicate boundary the query exists for: Q2 cost ties, Q4 once-per-order
EXISTS, Q11's mean-multiple HAVING, Q20's strict half-share, Q22's
positive-balance average and lapsed anti join."""

import datetime as dt

from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES


def _write(sf, **tables):
    for name, df in tables.items():
        df.coalesce(1).write.parquet(str(sf / f"{name}.parquet"))
    return str(sf)


def _geo(spark, region_name="EUROPE"):
    nation = spark.createDataFrame(
        [(0, "N0", 0), (1, "N1", 0), (2, "N2", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    region = spark.createDataFrame(
        [(0, region_name), (1, "OTHER")], "r_regionkey long, r_name string"
    )
    return nation, region


def test_min_cost_supplier_ties_and_min_line(spark, tmp_path):
    """Q2: cost = MIN line cents per (part, supplier); two EU suppliers
    tied at the part minimum both return; the non-EU supplier with a
    cheaper line never competes."""
    t = dt.datetime(1996, 1, 1)
    li = spark.createDataFrame(
        [
            (1, 1, 50.0, t), (1, 1, 70.0, t),   # s1 cost -> 50.00
            (1, 2, 50.0, t),                     # s2 tied at 50.00
            (1, 3, 10.0, t),                     # s3 cheaper but non-EU
        ],
        "l_partkey long, l_suppkey long, l_extendedprice double, l_shipdate timestamp",
    )
    supp = spark.createDataFrame(
        [(1, "S1", 11.5, 0), (2, "S2", 22.5, 1), (3, "S3", 33.5, 2)],
        "s_suppkey long, s_name string, s_acctbal double, s_nationkey long",
    )
    part = spark.createDataFrame(
        [(1, "tiny bolt", "SMALL"), (2, "huge bolt", "LARGE")],
        "p_partkey long, p_name string, p_type string",
    )
    nation, region = _geo(spark)
    sf = _write(tmp_path / "q2", lineitem=li, supplier=supp, part=part,
                nation=nation, region=region)
    out = {r.s_name: r for r in QUERIES["min_cost_supplier"](spark, sf).collect()}
    assert set(out) == {"S1", "S2"}
    assert out["S1"].supply_cost == 50.0 and out["S2"].supply_cost == 50.0
    assert out["S1"].s_acctbal == 11.5 and out["S1"].n_name == "N0"


def test_late_shipment_orders_counts_orders_once(spark, tmp_path):
    """Q4 (late_shipment_orders): an order with TWO late lines (>60
    days) counts once; an order with only on-time lines counts zero."""
    d0 = dt.datetime(1996, 2, 1)
    orders = spark.createDataFrame(
        [
            (1, d0, "1-URGENT"),   # two late lines -> 1
            (2, d0, "1-URGENT"),   # on-time -> 0
            (3, d0, "5-LOW"),      # late -> 1
        ],
        "o_orderkey long, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (1, d0 + dt.timedelta(days=70)),
            (1, d0 + dt.timedelta(days=80)),
            (2, d0 + dt.timedelta(days=10)),
            (3, d0 + dt.timedelta(days=61)),
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    sf = _write(tmp_path / "q4", orders=orders, lineitem=li)
    out = {r.o_orderpriority: r.order_count
           for r in QUERIES["late_shipment_orders"](spark, sf).collect()}
    assert out == {"1-URGENT": 1, "5-LOW": 1}


def test_important_stock_mean_multiple_threshold(spark, tmp_path):
    """Q11: values [100, 100, 400] -> mean 200, threshold 1.5x = 300
    (strict 2*v*n > 3*tot): only the 400-part qualifies."""
    t = dt.datetime(1996, 1, 1)
    li = spark.createDataFrame(
        [(1, 1, 100.0, t), (2, 1, 100.0, t), (3, 1, 400.0, t)],
        "l_partkey long, l_suppkey long, l_extendedprice double, l_shipdate timestamp",
    )
    supp = spark.createDataFrame(
        [(1, "S1", 0.0, 0)],
        "s_suppkey long, s_name string, s_acctbal double, s_nationkey long",
    )
    nation, region = _geo(spark)
    sf = _write(tmp_path / "q11", lineitem=li, supplier=supp,
                nation=nation, region=region)
    rows = QUERIES["important_stock"](spark, sf).collect()
    assert [(r.p_partkey, r.value) for r in rows] == [(3, 400.0)]


def test_potential_promotion_strict_half_share(spark, tmp_path):
    """Q20: exactly-half share does NOT qualify (strict 2q > Q);
    majority supplier qualifies; a non-red part never counts."""
    t = dt.datetime(1996, 6, 1)
    li = spark.createDataFrame(
        [
            (1, 1, 5.0, t), (1, 2, 5.0, t),   # red part 1: 50/50 -> neither
            (2, 1, 6.0, t), (2, 2, 4.0, t),   # red part 2: s1 majority
            (3, 1, 99.0, t),                  # non-red part: ignored
        ],
        "l_partkey long, l_suppkey long, l_quantity double, l_shipdate timestamp",
    )
    part = spark.createDataFrame(
        [(1, "red widget"), (2, "red bolt"), (3, "blue bolt")],
        "p_partkey long, p_name string",
    )
    supp = spark.createDataFrame(
        [(1, "S1", 0.0, 0), (2, "S2", 0.0, 1)],
        "s_suppkey long, s_name string, s_acctbal double, s_nationkey long",
    )
    nation, region = _geo(spark, region_name="ASIA")
    sf = _write(tmp_path / "q20", lineitem=li, part=part, supplier=supp,
                nation=nation, region=region)
    out = {r.s_name: r.n_qualifying_parts
           for r in QUERIES["potential_promotion"](spark, sf).collect()}
    assert out == {"S1": 1}


def test_sales_opportunity_avg_and_lapsed(spark, tmp_path):
    """Q22 (sales_opportunity): the average is over POSITIVE balances
    only (strict bal*N > S, integer cents); an above-average customer
    with a post-2000 order is excluded; one with only older orders
    counts as lapsed."""
    cust = spark.createDataFrame(
        [
            (1, 0, 10.0),    # above avg, lapsed -> counts
            (2, 0, 2.0),     # below avg
            (3, 0, -5.0),    # negative: excluded from avg AND below it
            (4, 0, 10.0),    # above avg but has a 2000 order
        ],
        "c_custkey long, c_nationkey long, c_acctbal double",
    )
    orders = spark.createDataFrame(
        [
            (100, 1, dt.datetime(1997, 1, 1)),   # pre-cutoff: cust 1 lapsed
            (101, 4, dt.datetime(2000, 6, 1)),   # recent: cust 4 active
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    sf = _write(tmp_path / "q22", customer=cust, orders=orders)
    rows = QUERIES["sales_opportunity"](spark, sf).collect()
    # avg over positive balances (10, 2, 10) = 22/3; cust 1 and 4 are
    # above; only cust 1 is lapsed
    assert [(r.c_nationkey, r.numcust, r.totacctbal_c)
            for r in rows] == [(0, 1, 1000)]
