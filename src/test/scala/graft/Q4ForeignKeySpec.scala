package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Named assertion for the referential-integrity rewrite behind q4
  * (RelationalQueries.q4DerivedDiffFilter): the orders join is eliminated
  * on the grounds that every lineitem.l_orderkey references an existing
  * orders.o_orderkey and o_orderkey is unique. If the harness data ever
  * broke that FK, q4 would surface rows the (unchanged, join-keeping)
  * oracle excludes — and the failure would show up as an opaque oracle
  * hash diff. This spec makes it a named assertion instead (ADVICE r13).
  * sf0.001 here; the 0-dangling-keys claim was hand-verified at all three
  * SFs when the rewrite landed (r13). */
class Q4ForeignKeySpec extends SparkSpec {

  test("lineitem.l_orderkey -> orders.o_orderkey FK holds (join elimination " +
       "precondition): no dangling keys, o_orderkey unique") {
    val orders = Tables.orders(spark, sfDir).select(col("o_orderkey"))
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"))
    val dangling = li.join(orders, li("l_orderkey") === orders("o_orderkey"),
      "left_anti").count()
    assert(dangling == 0L,
      s"$dangling lineitem rows reference no order — q4's RI join " +
        "elimination is unsound for this data")
    val dupPk = orders.groupBy("o_orderkey").count()
      .filter(col("count") > 1).count()
    assert(dupPk == 0L,
      s"$dupPk duplicate o_orderkey values — the eliminated join would " +
        "have fanned out")
  }
}
