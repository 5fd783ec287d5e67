package graft

import org.apache.spark.sql.SparkSession

/** Shared plumbing for the two benchmark mains (Bench, MicroBench) so the
  * session config and the timing kernel cannot drift apart. */
object BenchSupport {

  /** Shuffle partition count: defaults to the core count (the committed
    * local-mode convention every BENCH_r* was captured under), overridable
    * via SPARK_GRAFT_SHUFFLE_PARTITIONS so a CORE-scaling probe can hold
    * per-task work constant while varying cores (VERDICT r21 #2: with
    * partitions == cpus, lowering cores also lowers partition count and
    * the 8-vs-32-core ratio measures scheduling, not compute scaling —
    * the probe was confounded by design). */
  def shufflePartitions(cpus: String): String =
    sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)

  def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions(cpus))
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
    // localCheckpoint (connectedComponents' per-round truncation, or
    // SPARK_GRAFT_MATERIALIZE=localCheckpoint) live in the block manager
    // until the plan is GC'd — release them too, or the cross-run memory
    // isolation this cleanup exists for silently breaks. BLOCKING
    // unpersist: the r8/r9 per-query drift on unchanged code implicated
    // non-blocking release racing the next timed region (block-manager
    // removal still in flight while the next query is being measured).
    // [[SharedStage]]-pinned artifacts are the one deliberate exception:
    // they are cross-query pipeline-stage intermediates (see there).
    val pinned = SharedStage.pinnedIds
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!pinned.contains(id)) rdd.unpersist(blocking = true)
    }
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
