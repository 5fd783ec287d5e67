package graft

/** Materialization-mode benchmark backing MATBENCH.md: times the queries
  * that materialize a multi-branch intermediate through the
  * [[Materialize]] knob (d3 minhash: shingled corpus feeding three
  * branches; d4 simhash: collapsed fingerprints feeding candidates +
  * group expansion) under each `graft.materialize` mode, so the knob's
  * cost claims are reproducible instead of prose.
  *
  * Usage: sbt "runMain graft.MatBench [sfDir] [runs]"
  * (defaults: /root/testdata/sf0.1, 5). Prints one JSON line per
  * (query, mode) with the min-of-runs seconds — the same steady-state
  * metric as [[Bench]]; [[BenchSupport.once]] drops CacheManager entries
  * AND block-manager blocks between runs, so no mode inherits the
  * previous mode's materialized state.
  */
object MatBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = BenchSupport.session(cpus)
    val queries = Seq("d3_minhash_lsh", "d4_simhash", "p2_funnel_neardup",
      "t12_surprisal", "p3_curation_v2")
    queries.foreach(BenchSupport.once(spark, _, BenchSupport.warmupDir(sfDir)))
    for (mode <- Seq("cache", "localCheckpoint", "none"); q <- queries) {
      sys.props(Materialize.Prop) = mode
      try {
        val ts = (1 to runs).map(_ => BenchSupport.once(spark, q, sfDir))
        val v = if (ts.contains(-1.0)) -1.0 else ts.min
        println(s"""{"query":"$q","mode":"$mode","sec":$v,"runs":$runs,"sf":"$sfDir"}""")
      } finally sys.props.remove(Materialize.Prop)
    }
    spark.stop()
  }
}
