package graft

import graft.queries.RelationalQueries
import graft.sources.Tables
import graft.testing.Comparator

/** The reference's ≥2-independent-paths methodology applied to the
  * driver-gate queries: every q1–q6 runs through the DataFrame DSL AND a
  * Spark-SQL text over temp views, and the two plans must return
  * identical ordered rows. (The third path, the external DuckDB oracle,
  * is the driver's t2 gate / tools/selfcheck.py.) */
class SqlParitySpec extends SparkSpec {

  test("q1–q6: spark.sql front-end returns identical rows to the DSL") {
    Tables.registerAll(spark, sfDir)
    RelationalQueries.sparkSql.keys.toSeq.sorted.foreach { name =>
      val viaSql = spark.sql(RelationalQueries.sparkSql(name))
      val viaDsl = RelationalQueries.queries(name)(spark, sfDir)
      assert(viaSql.columns.sameElements(viaDsl.columns),
        s"$name columns: ${viaSql.columns.mkString(",")} vs ${viaDsl.columns.mkString(",")}")
      assert(Comparator.equalOrdered(viaSql, viaDsl), s"$name rows differ")
    }
  }

  test("sparkSql and oracleSql cover exactly the same queries") {
    assert(RelationalQueries.sparkSql.keySet == RelationalQueries.oracleSql.keySet)
  }
}
