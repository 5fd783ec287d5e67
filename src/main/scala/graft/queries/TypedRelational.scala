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
}
