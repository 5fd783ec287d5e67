package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** A third front-end for the relational surface: typed `Dataset[T]` with
  * case-class Encoders — the compile-time-checked dialect (the reference's
  * dialect count is the point: every query through multiple independent
  * paths, SURVEY.md §5). TypedParitySpec asserts this path's results equal
  * the DataFrame DSL's.
  *
  * Honest tradeoff, documented because it matters at 100 TB: lambda
  * filters/maps (`_.l_quantity > 30`) are opaque to Catalyst — no
  * predicate pushdown, no codegen through the lambda — so the typed path
  * trades scan efficiency for compile-time field safety. Where both
  * matter, filter with Columns BEFORE going typed (done below for the
  * scan-reducing predicates, keeping the typed layer for the join+shape
  * logic).
  */
object TypedRelational {

  case class OrderRow(o_orderkey: Long, o_totalprice: Double)
  case class BigCount(l_orderkey: Long, big_item_cnt: Long)

  case class MaxPrice(m_orderkey: Long, max_price: Double)
  case class FirstPrice(f_orderkey: Long, first_price: Double)
  case class Q4Row(o_orderkey: Long, max_price: Double,
      first_price: Double, price_gap: Double)

  case class CustYearCnt(o_custkey: Long, o_year: String, order_cnt: Long)
  case class CustYearSpend(s_custkey: Long, s_year: String, year_spend_raw: Double)
  case class Cust(c_custkey: Long, c_name: String)

  /** q3 through the typed API: same semantics as
    * [[RelationalQueries.q3JoinGroupCount]] (and its DuckDB oracle). */
  def q3Typed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Column-filter FIRST (pushdown preserved), then go typed
    val big = Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 30)
      .select(col("l_orderkey"))
      .as[Long]
      .groupByKey(identity)
      .count()
      .map { case (k, n) => BigCount(k, n) }
    val orders = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_totalprice"))
      .as[OrderRow]
    orders
      .joinWith(big, orders("o_orderkey") === big("l_orderkey"), "inner")
      .map { case (o, b) => (o.o_orderkey, o.o_totalprice, b.big_item_cnt) }
      .toDF("o_orderkey", "o_totalprice", "big_item_cnt")
      .orderBy(col("big_item_cnt").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** q4 through the typed API — the §2.4 trap typed joins solve
    * structurally: three roles of `lineitem`/`orders` in one query, with
    * provenance carried by the case-class types instead of `.as()`
    * string aliases, so a cross-role column mixup is a compile error.
    * Same semantics as [[RelationalQueries.q4DerivedDiffFilter]].
    *
    * The grouped max is a typed `reduceGroups(math.max)` — safe for
    * cross-dialect bit-parity because max (unlike a float SUM) is
    * order-independent. The gap filter runs on raw doubles and rounding
    * happens in the same final projection as the DSL, so every IEEE
    * operation sequence matches. */
  def q4Typed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val maxPrice = li
      .select(col("l_orderkey"), col("l_extendedprice"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .reduceGroups((a, b) => math.max(a, b))
      .map { case (k, v) => MaxPrice(k, v) }
    // Column-filter FIRST (pushdown preserved), then go typed
    val firstLine = li.filter(col("l_linenumber") === 1)
      .select(col("l_orderkey").as("f_orderkey"),
        col("l_extendedprice").as("first_price"))
      .as[FirstPrice]
    val orders = Tables.orders(s, dir).select(col("o_orderkey")).as[Long]
    orders
      .joinWith(maxPrice, orders("o_orderkey") === maxPrice("m_orderkey"), "inner")
      // the primitive left side of the first joinWith is the flat `_1`
      .joinWith(firstLine, col("_1") === firstLine("f_orderkey"), "inner")
      .map { case ((o, m), f) =>
        Q4Row(o, m.max_price, f.first_price, m.max_price - f.first_price)
      }
      .filter(_.price_gap > 50000)
      .select(
        col("o_orderkey"),
        round(col("max_price"), 2).as("max_price"),
        round(col("first_price"), 2).as("first_price"),
        round(col("price_gap"), 2).as("price_gap"))
      .orderBy(col("price_gap").desc, col("o_orderkey").asc)
  }

  /** q5 through the typed API: the composite (custkey, year) key lives in
    * the `joinWith` condition over typed rows, so each side's key
    * provenance is explicit. Same semantics as
    * [[RelationalQueries.q5CompositeKeyJoin]].
    *
    * The two aggregates stay as Column aggregations before going typed —
    * deliberately: a typed `reduceGroups(_ + _)` float SUM accumulates in
    * a different order than `HashAggregateExec`, and the repo's
    * determinism contract keeps float math in identical operation order
    * across dialects (see q5's round-before-rank note). Typed earns its
    * keep on the join+shape, not the arithmetic. */
  def q5Typed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
      .select(col("o_custkey"), date_format(col("o_orderdate"), "yyyy").as("o_year"),
        col("o_totalprice"))
    val cnt = orders.groupBy(col("o_custkey"), col("o_year"))
      .agg(count(lit(1)).as("order_cnt"))
      .as[CustYearCnt]
    val spend = orders
      .groupBy(col("o_custkey").as("s_custkey"), col("o_year").as("s_year"))
      .agg(sum(col("o_totalprice")).as("year_spend_raw"))
      .as[CustYearSpend]
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name")).as[Cust]
    cnt
      .joinWith(spend,
        cnt("o_custkey") === spend("s_custkey") && cnt("o_year") === spend("s_year"),
        "inner")
      .joinWith(cust, col("_1.o_custkey") === cust("c_custkey"), "inner")
      .map { case ((c, sp), cu) =>
        (cu.c_name, c.o_year, c.order_cnt, sp.year_spend_raw)
      }
      .toDF("c_name", "o_year", "order_cnt", "year_spend_raw")
      .orderBy(round(col("year_spend_raw"), 2).desc, col("c_name").asc, col("o_year").asc)
      .limit(10)
      .select(col("c_name"), col("o_year"), col("order_cnt"),
        round(col("year_spend_raw"), 2).as("year_spend"))
  }
}
