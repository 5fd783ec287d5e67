package graft

import org.apache.spark.sql.SparkSession

/** Shared plumbing for the two benchmark mains (Bench, MicroBench) so the
  * session config and the timing kernel cannot drift apart. */
object BenchSupport {

  def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet is TIMESTAMP(NANOS); read the raw nanos as Long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One timed noop-sink run (noop computes every output column; count()
    * would let Catalyst prune the compute away). Returns -1 on failure —
    * a failing query must not kill the whole run. Caches are cleared
    * AFTER the timed region: queries that cache multi-branch
    * intermediates (d3/d4) pay that cost inside their own measurement,
    * and nothing they materialized survives to pressure — or subsidize —
    * any later run (the r4 bench's ±6x per-query noise on unchanged code
    * traced in part to caches accumulating across the run). */
  def once(spark: SparkSession, name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    val elapsed =
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }
    spark.catalog.clearCache()
    // clearCache only drops CacheManager entries; blocks persisted by
    // localCheckpoint (SPARK_GRAFT_MATERIALIZE=localCheckpoint) live in
    // the block manager until the plan is GC'd — release them too, or the
    // cross-run memory isolation this cleanup exists for silently breaks
    // under that mode
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    elapsed
  }

  /** Smallest-SF sibling of the target dir for the warmup pass, so JVM/
    * codegen/catalog startup isn't charged to the first timed query. Falls
    * back to the target dir itself when the sibling doesn't exist (warmup
    * at full SF is just a slightly costlier warmup). */
  def warmupDir(sfDir: String): String = {
    val sibling = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
    if (sibling.isDirectory) sibling.getPath else sfDir
  }
}
