package graft

import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** Cost-split probe for the dedup ladder's tail: how much of d6 is d3
  * (signatures/banding/verify) and how much is the connected-components
  * loop. `runMain graft.CcProbe [sfDir]`.
  *
  * Measures three things the full bench can't separate:
  *   1. d3 cold (fresh caches — what d6's first run pays),
  *   2. d3 warm (page-cache + JIT steady state),
  *   3. CC alone, run while d3's Materialize cache is still LIVE — the
  *      cost the CC loop itself adds on top of a computed pair set.
  *      (Clearing the cache first would silently re-charge the whole d3
  *      pipeline to the first CC signature job and overstate CC ~4x —
  *      the flaw in this probe's first version.)
  * Cleanup between phases mirrors [[BenchSupport.once]] (blocking). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = BenchSupport.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // warmup at the smallest SF (JVM/codegen), then a cold d3
    Dedup.d3MinhashLsh(spark, BenchSupport.warmupDir(dir))
      .write.format("noop").mode("overwrite").save()
    cleanup()
    timed("d3 cold")(Dedup.d3MinhashLsh(spark, dir)
      .write.format("noop").mode("overwrite").save())
    cleanup()
    timed("d3 warm")(Dedup.d3MinhashLsh(spark, dir)
      .write.format("noop").mode("overwrite").save())
    cleanup()
    // CC marginal: build the pairs (d3 caches stay live), then time the
    // loop + its consumption alone
    val pairs = Dedup.d3MinhashLsh(spark, dir)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    pairs.write.format("noop").mode("overwrite").save()
    timed("cc marginal (warm pairs)") {
      val cc = Dedup.connectedComponents(pairs)
      cc.write.format("noop").mode("overwrite").save()
    }
    cleanup()
    spark.stop()
  }
}
