package graft

import org.apache.spark.sql.functions._
import graft.queries.Dedup
import graft.sources.Tables

object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = BenchSupport.session("32")
    // warm up
    Dedup.d3MinhashLsh(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    var t0 = System.nanoTime()
    val pairs = Dedup.d3MinhashLsh(spark, dir).select(col("doc_a").as("u"), col("doc_b").as("v"))
    pairs.write.format("noop").mode("overwrite").save()
    println(f"[probe] d3 alone: ${(System.nanoTime()-t0)/1e9}%.3f s, pairs=${pairs.count()}")
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    t0 = System.nanoTime()
    val cc = Dedup.connectedComponents(pairs)
    cc.write.format("noop").mode("overwrite").save()
    println(f"[probe] cc after warm d3: ${(System.nanoTime()-t0)/1e9}%.3f s, stars=${cc.count()}")
    spark.stop()
  }
}
