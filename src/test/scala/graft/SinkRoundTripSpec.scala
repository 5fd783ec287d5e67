package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import graft.queries.RelationalQueries

/** Sources/sinks coverage (SURVEY §2.1): query results written to each
  * supported sink format and read back must round-trip losslessly —
  * parquet exactly; csv/json through explicit schema re-application
  * (text formats erase types, the reader contract restores them). */
class SinkRoundTripSpec extends SparkSpec {

  test("q1 result round-trips through parquet, csv, json and orc sinks") {
    val dir = Files.createTempDirectory("graft-sinks")
    try {
      val q1 = RelationalQueries.q1ArgmaxPerYear(spark, sfDir)
        .orderBy(col("o_year"))
      val expected = q1.collect().toSeq
      val schema = q1.schema

      q1.coalesce(1).write.mode("overwrite").parquet(s"$dir/p")
      q1.coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(s"$dir/c")
      q1.coalesce(1).write.mode("overwrite").json(s"$dir/j")
      q1.coalesce(1).write.mode("overwrite").orc(s"$dir/o")

      val fromParquet = spark.read.parquet(s"$dir/p")
        .orderBy(col("o_year")).collect().toSeq
      val fromCsv = spark.read.schema(schema)
        .option("header", "true").csv(s"$dir/c")
        .orderBy(col("o_year")).collect().toSeq
      val fromJson = spark.read.schema(schema).json(s"$dir/j")
        .orderBy(col("o_year")).collect().toSeq
      val fromOrc = spark.read.orc(s"$dir/o")
        .orderBy(col("o_year")).collect().toSeq

      assert(fromParquet == expected)
      assert(fromCsv == expected)
      assert(fromJson == expected)
      assert(fromOrc == expected)
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }
}
