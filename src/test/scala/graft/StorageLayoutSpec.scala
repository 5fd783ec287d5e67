package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Storage-layout scale techniques (SURVEY §4 / the 100 TB posture):
  * bucketing for shuffle-free co-located joins, and date-partitioned
  * layout for partition pruning. Both are plan-shape facts — correctness
  * tests can't see them, these specs pin them. */
class StorageLayoutSpec extends SparkSpec {

  test("bucketed tables join WITHOUT a shuffle exchange") {
    // (warehouse dir is a temp dir, set statically in SparkSpec)
    // bucket both sides by the join key into the same bucket count:
    // at scale this is the one-time layout cost that removes the shuffle
    // from every subsequent join on that key
    graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bkt")
    graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bkt")
    try {
      val joined = spark.table("orders_bkt")
        .join(spark.table("lineitem_bkt"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
      // disable AQE for a stable plan string, and broadcast so the test
      // exercises the sort-merge path bucketing exists for
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
        // the join itself must need NO exchange: buckets align
        val beforeAgg = plan.split("HashAggregate").last // join subtree
        assert(!beforeAgg.contains("Exchange"),
          s"bucketed join should not shuffle:\n$plan")
        assert(joined.count() > 0)
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }

  test("date-partitioned layout prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    graft.sources.Tables.orders(spark, sfDir)
      .withColumn("o_year", date_format(col("o_orderdate"), "yyyy"))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("o_year") === "1995")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_year"), s"no partition filter in:\n$plan")
    // only the 1995 directory is read (partition-col type inference reads
    // the year back as an int)
    val scanned = pruned.select(col("o_year")).distinct().collect()
    assert(scanned.map(_.get(0).toString).toSeq == Seq("1995"))
    val years = spark.read.parquet(dir)
      .select(col("o_year")).distinct().count()
    assert(years > 1) // the layout actually has multiple partitions
  }
}
