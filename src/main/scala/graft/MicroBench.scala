package graft

import org.apache.spark.sql.SparkSession

/** Reference-format microbenchmark: the `microbenchmark(times=5)` tables
  * of the reference (RDataFramesSQL.Rmd:139-152 and the knitted outputs
  * cited in BASELINE.md) report min/lq/mean/median/uq/max per
  * implementation; this main reproduces that reporting shape for every
  * catalog query.
  *
  * Usage: sbt "runMain graft.MicroBench [sfDir] [times]"
  * (defaults: /root/testdata/sf0.01, 5 — the reference's times=5).
  * Prints one aligned table plus one JSON line per query.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val times = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // quartile by linear interpolation (type-7, R's default — what
    // microbenchmark's summary prints)
    def quantile(sorted: Array[Double], q: Double): Double = {
      val h = (sorted.length - 1) * q
      val lo = h.toInt
      val hi = math.min(lo + 1, sorted.length - 1)
      sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo))
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(once) // warmup pass, as the JVM analogue of R's JIT warmup
    println(f"${"query"}%-28s ${"min"}%8s ${"lq"}%8s ${"mean"}%8s ${"median"}%8s ${"uq"}%8s ${"max"}%8s  (sec, times=$times)")
    names.foreach { name =>
      val ts = (1 to times).map(_ => once(name)).toArray.sorted
      val mean = ts.sum / ts.length
      val (mn, lq, med, uq, mx) = (ts.head, quantile(ts, 0.25),
        quantile(ts, 0.5), quantile(ts, 0.75), ts.last)
      println(f"$name%-28s $mn%8.3f $lq%8.3f $mean%8.3f $med%8.3f $uq%8.3f $mx%8.3f")
      println(s"""{"query":"$name","min":$mn,"lq":$lq,"mean":$mean,"median":$med,"uq":$uq,"max":$mx,"times":$times,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
