package graft

/** Benchmark main (driver contract): one JSON line with per-query seconds.
  *
  * Methodology (mirrors the reference's microbenchmark warmup+repeat
  * scheme, RDataFramesSQL.Rmd:139-152 — times=5 there too): one warmup
  * pass over every query at the smallest available SF, then N timed runs
  * (default 5, env SPARK_GRAFT_BENCH_RUNS) at the target SF, reporting
  * the per-query MINIMUM (steady-state cost). Caches are cleared after
  * every run ([[BenchSupport.once]]) so no query's materialized state
  * pressures a later query's measurement — min-of-2 with leaked caches
  * swung ±6x run-over-run on unchanged code (r3→r4). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val spark = BenchSupport.session(cpus)

    val names = SparkEntry.queries.keys.toSeq
      .filterNot(SparkEntry.benchExclude).sorted
    val wDir = BenchSupport.warmupDir(sfDir)
    names.foreach(BenchSupport.once(spark, _, wDir))
    val timed = names.map { n =>
      val ts = (1 to runs).map(_ => BenchSupport.once(spark, n, sfDir))
      n -> (if (ts.contains(-1.0)) -1.0 else ts.min)
    }
    val qs = timed.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = timed.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs}""")
    spark.stop()
  }
}
