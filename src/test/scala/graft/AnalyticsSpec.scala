package graft

import graft.queries.Analytics

class AnalyticsSpec extends SparkSpec {

  test("x1 rollup: grand total row equals sum of leaf rows") {
    val rows = Analytics.x1Rollup(spark, sfDir).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val leaves = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(grand.head.getAs[Long]("n") == leaves.map(_.getAs[Long]("n")).sum)
    // per-priority subtotals equal their leaves too
    val subtotals = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    subtotals.foreach { st =>
      val p = st.getString(0)
      val leafSum = leaves.filter(_.getString(0) == p).map(_.getAs[Long]("n")).sum
      assert(st.getAs[Long]("n") == leafSum, s"priority $p subtotal mismatch")
    }
  }

  test("x2 set ops: inclusion–exclusion holds") {
    val m = Analytics.x2SetOps(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(m.keySet ==
      Set("both_years", "only_1995", "only_1996", "either_year"))
    assert(m("either_year") ==
      m("both_years") + m("only_1995") + m("only_1996"))
    assert(m("either_year") > 0)
  }

  test("x8 grouping sets: exactly the three requested levels, each " +
       "consistent with the leaves, and NO grand total") {
    val rows = Analytics.x8GroupingSets(spark, sfDir).collect()
    val leaves = rows.filter(r => r.getAs[Byte]("g_pri") == 0 &&
      r.getAs[Byte]("g_stat") == 0)
    val byPri = rows.filter(r => r.getAs[Byte]("g_pri") == 0 &&
      r.getAs[Byte]("g_stat") == 1)
    val byStat = rows.filter(r => r.getAs[Byte]("g_pri") == 1 &&
      r.getAs[Byte]("g_stat") == 0)
    // the set list is cube minus the grand total: (1,1) must not appear
    assert(rows.length == leaves.length + byPri.length + byStat.length)
    assert(leaves.nonEmpty && byPri.nonEmpty && byStat.nonEmpty)
    byPri.foreach { st =>
      val p = st.getString(0)
      assert(st.isNullAt(1), "subtotal must null the aggregated-away key")
      assert(st.getAs[Long]("n") ==
        leaves.filter(_.getString(0) == p).map(_.getAs[Long]("n")).sum,
        s"priority $p subtotal mismatch")
    }
    byStat.foreach { st =>
      val stat = st.getString(1)
      assert(st.isNullAt(0))
      assert(st.getAs[Long]("n") ==
        leaves.filter(_.getString(1) == stat).map(_.getAs[Long]("n")).sum,
        s"status $stat subtotal mismatch")
    }
  }

  test("x4 salted agg: two-stage result identical to direct aggregation") {
    import org.apache.spark.sql.functions._
    val salted = Analytics.x4SaltedAgg(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Double]("value_sum")))
    val direct = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("value") * 100).cast("long")).cast("double") / 100.0, 2)
          .as("value_sum"))
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Double]("value_sum")))
    assert(salted.toSeq == direct.toSeq)
  }

  test("x3 approx distinct: HLL estimate within the configured 2% rsd band") {
    val rows = Analytics.x3ApproxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // 0.02 rsd; allow 5 sigma — deterministic for a fixed dataset anyway
      assert(r.getAs[Double]("rel_err") <= 0.10,
        s"approx_count_distinct off by ${r.getAs[Double]("rel_err")} for $r")
    }
  }

  test("x10 window gallery: contiguous per-customer sequence, balanced " +
       "quartiles, rank metrics bounded and monotone in price order") {
    val rows = Analytics.x10WindowGallery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // order_idx is 1..n within each customer
    rows.groupBy(_.getAs[Long]("o_custkey")).values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("order_idx")).sorted.toSeq ==
        (1 to rs.length))
    }
    rows.foreach { r =>
      val q = r.getAs[Int]("quartile")
      assert(q >= 1 && q <= 4)
      val pr = r.getAs[Double]("pct_rank")
      val cd = r.getAs[Double]("cume")
      assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0)
      // with no ties cume_dist sits above percent_rank; 4-decimal
      // rounding can collapse them to equality near the top of a group
      assert(cd >= pr)
    }
  }

  test("x9 heavy hitters: under-capacity frequent-items sketch is exact " +
       "for every top-20 token; counts strictly ranked") {
    val rows = Analytics.x9HeavyHitters(spark, sfDir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("sketch_exact"),
        s"sketch missed or misestimated: $r")
    }
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "not ranked")
  }
}
