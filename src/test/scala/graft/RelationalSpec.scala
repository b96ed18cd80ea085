package graft

import graft.ops.Relational

/** Semantics checks the DuckDB oracle can't see: join activity split and
  * rollup subtotal structure on constructed inputs.
  */
class RelationalSpec extends SparkSpec {

  private lazy val sfDir: String = {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "customer", Seq(
      (1L, "c1", 0, 10.0, "BUILDING"),
      (2L, "c2", 0, 20.0, "AUTO"),
      (3L, "c3", 1, 30.0, "BUILDING")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    writeTable(dir, "orders", Seq(
      (100L, 1L, "O", 50.0, new java.sql.Timestamp(0L), "1-URGENT"),
      (101L, 1L, "O", 70.0, new java.sql.Timestamp(0L), "1-URGENT")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"))
    writeTable(dir, "lineitem", Seq(
      (100L, 1L, 1L, 1, 2.0, 100.0, 0.1, 0.0, "N", "O",
        new java.sql.Timestamp(0L)),
      (100L, 1L, 1L, 2, 3.0, 200.0, 0.0, 0.0, "R", "F",
        new java.sql.Timestamp(0L))
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"))
    dir
  }

  test("semi/anti activity split: counts of customers with and without orders") {
    val rows = Relational.customerOrderActivity(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows === Map("active" -> 1L, "inactive" -> 2L))
  }

  test("rollup: per-group rows plus subtotal and grand-total rows") {
    val rows = Relational.salesRollup(spark, sfDir).collect()
    // 2 leaf groups + 2 flag subtotals + 1 grand total
    assert(rows.length === 5)
    val grand = rows.head // NULLS FIRST puts the grand total first
    assert(grand.isNullAt(0) && grand.isNullAt(1))
    assert(grand.getDouble(2) === 300.0 && grand.getLong(3) === 2L)
  }

  test("revenue math is exact decimal: 100*0.9 + 200*1.0 = 290.00") {
    val rev = Relational.topRevenueOrders(spark, sfDir, "BUILDING").collect()
    assert(rev.length === 1)
    assert(rev.head.getLong(0) === 100L)
    assert(rev.head.getDouble(3) === 290.0)
  }

  test("order gaps: day deltas per customer, same-date tie by orderkey, singles excluded") {
    import spark.implicits._
    val dir = tempSfDir()
    def day(d: Long) = new java.sql.Timestamp(d * 86400000L)
    writeTable(dir, "orders", Seq(
      // customer 1: days 0, 3, 10 -> gaps 3 and 7
      (1L, 1L, "O", 1.0, day(0), "p"),
      (2L, 1L, "O", 1.0, day(3), "p"),
      (3L, 1L, "O", 1.0, day(10), "p"),
      // customer 2: two orders on the SAME day -> one gap of 0
      (4L, 2L, "O", 1.0, day(5), "p"),
      (5L, 2L, "O", 1.0, day(5), "p"),
      // customer 3: single order -> excluded
      (6L, 3L, "O", 1.0, day(9), "p")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"))
    val rows = Relational.customerOrderGaps(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(rows === Seq(
      (1L, 2L, 10L, 7L, 5000L), // (3+7) days, max 7, avg 5000 milli
      (2L, 1L, 0L, 0L, 0L)))
  }

  test("mv merge: partials spanning the split combine to the direct aggregate") {
    import spark.implicits._
    val dir = tempSfDir()
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    writeTable(dir, "orders", Seq(
      // June 1998 group SPANS the 1998-06-15 split: one order per side,
      // so the merge must genuinely combine same-key partials
      (1L, 1L, "O", 10.25, ts("1998-06-10"), "1-URGENT"),
      (2L, 1L, "O", 20.50, ts("1998-06-20"), "1-URGENT"),
      // a group entirely in the delta
      (3L, 2L, "O", 5.00, ts("1998-07-01"), "2-HIGH")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"))
    val rows = Relational.incrementalMvMerge(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(rows === Seq(
      ("1-URGENT", 199806L, 2L, 3075L, 1025L, 2050L, 1537L),
      ("2-HIGH", 199807L, 1L, 500L, 500L, 500L, 500L)))
  }

  test("dq audit: constructed violations land on the right rules") {
    import spark.implicits._
    val dir = tempSfDir()
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    writeTable(dir, "customer", Seq((1L, "c1", 0, 1.0, "AUTO"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    writeTable(dir, "orders", Seq(
      (100L, 1L, "O", 50.0, ts("1995-01-01"), "p"),       // clean
      (100L, 1L, "O", 200000.0, ts("1995-01-02"), "p"),   // dup key + >100k
      (101L, 9L, "O", -5.0, ts("1995-01-03"), "p")        // orphan FK + nonpositive
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"))
    writeTable(dir, "lineitem", Seq(
      (100L, 1L, 1L, 1, 2.0, 10.0, 0.06, 0.0, "N", "O", ts("1995-01-01")), // discount
      (100L, 1L, 1L, 2, 99.0, 10.0, 0.01, 0.0, "N", "O", ts("1995-01-01")) // quantity
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"))
    val rows = Relational.dqAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(rows === Seq(
      ("lineitem.discount_le_5pct", 2L, 1L, false),
      ("lineitem.quantity_in_1_50", 2L, 1L, false),
      ("orders.custkey_in_customer", 3L, 1L, false),
      ("orders.orderkey_unique", 3L, 1L, false),
      ("orders.totalprice_le_100k", 3L, 1L, false),
      ("orders.totalprice_positive", 3L, 1L, false)))
  }

  test("churn set ops: except/intersect membership per segment") {
    import spark.implicits._
    val dir = tempSfDir()
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    writeTable(dir, "orders", Seq(
      (1L, 1L, "O", 1.0, ts("1995-03-01"), "p"), // cust 1: 1995 only -> churned
      (2L, 2L, "O", 1.0, ts("1995-05-01"), "p"), // cust 2: both -> retained
      (3L, 2L, "O", 1.0, ts("1996-02-01"), "p"),
      (4L, 2L, "O", 1.0, ts("1996-03-01"), "p"), // duplicate-year activity collapses
      (5L, 3L, "O", 1.0, ts("1996-07-01"), "p")  // cust 3: 1996 only -> new
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"))
    val rows = Relational.customerChurnSetOps(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("churned", 1L), ("new", 3L), ("retained", 2L)))
  }

  test("fk audit: both / order-only / lineitem-only reconciliation counts") {
    // fixture: orders 100 and 101 exist; only 100 has lineitems; no
    // orphan lineitems -> lineitem_only absent from the output
    val rows = Relational.fkAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows === Map("both" -> 1L, "order_only" -> 1L))
  }

  test("scd2: consecutive equal states collapse; intervals chain to the sentinel") {
    import spark.implicits._
    val dir = tempSfDir()
    def day(d: Long) = new java.sql.Timestamp(d * 86400000L)
    val us = 86400000000L // one day in epoch micros
    writeTable(dir, "orders", Seq(
      // customer 1: O@d0, O@d1, F@d2, O@d3 -> three versions
      (1L, 1L, "O", 1.0, day(0), "p"),
      (2L, 1L, "O", 1.0, day(1), "p"),
      (3L, 1L, "F", 1.0, day(2), "p"),
      (4L, 1L, "O", 1.0, day(3), "p"),
      // customer 2: one state forever -> a single open version
      (5L, 2L, "P", 1.0, day(5), "p")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"))
    val sentinel = 253402214400000000L
    val rows = Relational.scd2StatusDim(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(rows === Seq(
      (1L, 1L, "O", 0L, 2L * us, 2L),
      (1L, 2L, "F", 2L * us, 3L * us, 1L),
      (1L, 3L, "O", 3L * us, sentinel, 1L),
      (2L, 1L, "P", 5L * us, sentinel, 1L)))
    // point-in-time lookup against the same dim: status just BEFORE
    // each order — first orders see NONE, a change-day order sees the
    // version that was closing (t-1us lands in the previous interval)
    val asof = Relational.scd2AsOfLookup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(asof === Seq(
      (1L, "NONE"), (2L, "O"), (3L, "O"), (4L, "F"), (5L, "NONE")))
  }

  test("scd2 incremental merge equals the full rebuild") {
    import spark.implicits._
    val dir = tempSfDir()
    def day(d: Long) = new java.sql.Timestamp(d * 86400000L)
    writeTable(dir, "orders", Seq(
      (1L, 1L, "O", 1.0, day(0), "p"),
      (2L, 1L, "F", 1.0, day(2), "p"),
      // day 10000 = 1997: lands past the 1996 cutoff -> the delta
      // touches customer 1 only; customer 2 must keep stored rows
      (3L, 1L, "O", 1.0, day(10000), "p"),
      (4L, 2L, "P", 1.0, day(5), "p")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val full = rows(Relational.scd2StatusDim(spark, dir))
    assert(rows(Relational.scd2IncrementalMerge(spark, dir)) === full)
    // degenerate cutoffs: everything-delta and everything-kept both
    // reduce to the same relation
    assert(rows(Relational.scd2IncrementalMerge(spark, dir, cutoffYear = 1970)) === full)
    assert(rows(Relational.scd2IncrementalMerge(spark, dir, cutoffYear = 2999)) === full)
  }

  test("skew audit: exact log2 bands, row conservation per relation") {
    import spark.implicits._
    val dir = tempSfDir()
    val ts = new java.sql.Timestamp(0L)
    writeTable(dir, "lineitem", Seq(
      // orderkey 100 x3 -> band 1; orderkey 101 x1 -> band 0
      (100L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts),
      (100L, 1L, 1L, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", ts),
      (100L, 1L, 1L, 3, 1.0, 1.0, 0.0, 0.0, "N", "O", ts),
      (101L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts)
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"))
    writeTable(dir, "orders", Seq(
      // custkey 1 x2 -> band 1; custkeys 2, 3 x1 -> band 0 (2 keys)
      (100L, 1L, "O", 1.0, ts, "p"), (101L, 1L, "O", 1.0, ts, "p"),
      (102L, 2L, "O", 1.0, ts, "p"), (103L, 3L, "O", 1.0, ts, "p")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"))
    writeTable(dir, "events", Seq(
      // user 7 x4 -> band 2
      (1L, ts, 7L, "click", 1.0, "{}"), (2L, ts, 7L, "click", 1.0, "{}"),
      (3L, ts, 7L, "click", 1.0, "{}"), (4L, ts, 7L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = Relational.skewAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(rows === Seq(
      ("events.user_id", 2L, 1L, 4L, 4L),
      ("lineitem.l_orderkey", 0L, 1L, 1L, 1L),
      ("lineitem.l_orderkey", 1L, 1L, 3L, 3L),
      ("orders.o_custkey", 0L, 2L, 2L, 1L),
      ("orders.o_custkey", 1L, 1L, 2L, 2L)))
  }

  test("waiting suppliers: sole-late blame with semi and anti probes") {
    import spark.implicits._
    val dir = tempSfDir()
    def day(d: Long) = new java.sql.Timestamp(d * 86400000L)
    writeTable(dir, "orders", Seq(
      (1L, day(0)), (2L, day(0)), (3L, day(0))
    ).toDF("o_orderkey", "o_orderdate"))
    writeTable(dir, "lineitem", Seq(
      // order 1: supplier 10 ships day 90 (late), 20 ships day 5 -> blame 10
      (1L, 10L, day(90)), (1L, 20L, day(5)),
      // order 2: both late -> nobody blamed (anti probe)
      (2L, 10L, day(90)), (2L, 20L, day(91)),
      // order 3: 10 late but SOLE participant -> no blame (semi probe)
      (3L, 10L, day(90))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate"))
    writeTable(dir, "supplier", Seq(
      (10L, "SupA", 1L, 0.0), (20L, "SupB", 1L, 0.0)
    ).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"))
    val rows = Relational.waitingSuppliers(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("SupA", 1L)))
  }

  test("small-qty revenue: cross-multiplied 0.2x-avg threshold, brand scoped") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "part", Seq(
      (1L, "p1", "Brand#1", "t", 1, 1.0),
      (2L, "p2", "Brand#2", "t", 1, 1.0) // other brand: excluded
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"))
    writeTable(dir, "lineitem", Seq(
      // part 1: qty 1, 10, 10 -> sum 21, n 3; small iff qty*15 < 21
      (1L, 1.0, 5.25), (1L, 10.0, 99.0), (1L, 10.0, 99.0),
      // part 2 would qualify (qty*3 < 4) but its brand is filtered out
      (2L, 1.0, 77.0), (2L, 3.0, 1.0)
    ).map { case (p, q, e) => (1L, p, 1L, 1, q, e, 0.0, 0.0, "N", "O",
      new java.sql.Timestamp(0L)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"))
    val rows = Relational.smallQuantityRevenue(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows === Seq((1L, 1L, 5.25)))
  }
}
