package graft

import org.apache.spark.sql.DataFrame

import graft.queries.StackExchangeQueries
import graft.sources.{StackExchange, SyntheticStackExchange}
import graft.testing.Comparator

/** The reference's OWN benchmark, reproduced end-to-end: times Ex1–Ex6
  * (the queries BASELINE.md's published numbers measure) in the
  * reference's `microbenchmark(times=5)` format — min/lq/mean/median/
  * uq/max per exercise per dialect — followed by the reference's
  * equality checks (SQL front-end vs DSL front-end, the sqldf-vs-dplyr
  * analogue).
  *
  * Data: [[SyntheticStackExchange]] parquet at the approximate magnitude
  * of the travel.stackexchange.com dump (the reference never records its
  * size, so BASELINE.md's absolute numbers are shape, not target — the
  * 2x gate runs on the harness tables in Bench). Both dialects hit the
  * same Catalyst plans modulo front-end; `noop` sink like Bench.
  *
  * Usage: sbt "runMain graft.ExerciseBench [scale] [times]"
  * (scale multiplies the default sizes; defaults 1.0 and the
  * reference's times=5).
  */
object ExerciseBench {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toDouble).getOrElse(1.0)
    val times = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = BenchSupport.session(cpus)

    val dir = java.nio.file.Files.createTempDirectory("graft-exbench").toString
    val sizes = SyntheticStackExchange.Sizes().scaled(scale)
    println(s"generating synthetic stack-exchange parquet at $dir " +
      s"(posts=${sizes.posts}, votes=${sizes.votes}, users=${sizes.users}, " +
      s"comments=${sizes.comments}, badges=${sizes.badges})")
    val data = SyntheticStackExchange.writeAndLoad(spark, dir, sizes)
    data.register()

    /** Baseline medians (seconds) from RDataFramesSQL.html (see
      * BASELINE.md for the per-table line cites). */
    val baseline: Map[String, (Double, Double, Double)] = Map( // sqldf, dplyr, data.table
      "ex1" -> (1.331, 1.892, 1.802),
      "ex2" -> (0.3159, 0.1317, 2.347),
      "ex3" -> (0.2106, 0.04586, 0.01671),
      "ex4" -> (0.2968, 0.1008, 0.0548),
      "ex5" -> (0.5342, 0.2933, Double.NaN), // DT timing invalid (Rmd:580)
      "ex6" -> (0.2531, 0.02637, 0.01681))

    def run(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    def quantile(sorted: Array[Double], q: Double): Double = {
      val hpos = (sorted.length - 1) * q
      val lo = hpos.toInt
      val hi = math.min(lo + 1, sorted.length - 1)
      sorted(lo) + (hpos - lo) * (sorted(hi) - sorted(lo))
    }

    val names = Seq("ex1", "ex2", "ex3", "ex4", "ex5", "ex6")
    def front(name: String, dialect: String): DataFrame = dialect match {
      case "sql" => StackExchangeQueries.sql(spark, name)
      case _ => StackExchangeQueries.dsl(name)(data)
    }

    // warmup (codegen + page cache), then timed runs
    for (name <- names; dialect <- Seq("sql", "dsl")) run(front(name, dialect))

    println(f"${"exercise"}%-10s ${"min"}%7s ${"lq"}%7s ${"mean"}%7s ${"median"}%7s ${"uq"}%7s ${"max"}%7s   ${"ref sqldf"}%9s ${"ref dplyr"}%9s ${"ref DT"}%8s  (sec, times=$times)")
    for (name <- names; dialect <- Seq("sql", "dsl")) {
      val ts = (1 to times).map(_ => run(front(name, dialect))).toArray.sorted
      val mean = ts.sum / ts.length
      val (b1, b2, b3) = baseline(name)
      val refCols = if (dialect == "sql") f"$b1%9.3f $b2%9.3f $b3%8.3f" else " " * 28
      println(f"$name/$dialect%-5s ${ts.head}%7.3f ${quantile(ts, 0.25)}%7.3f $mean%7.3f " +
        f"${quantile(ts, 0.5)}%7.3f ${quantile(ts, 0.75)}%7.3f ${ts.last}%7.3f   $refCols")
      println(s"""{"exercise":"$name","dialect":"$dialect","min":${ts.head},"median":${quantile(ts, 0.5)},"mean":$mean,"max":${ts.last},"times":$times,"scale":$scale}""")
    }

    // the reference's equality checks (all_equal analogue): SQL vs DSL,
    // order-insensitive for ex1/ex6 like the reference's toggle
    for (name <- names) {
      val eq =
        if (StackExchangeQueries.orderInsensitive(name))
          Comparator.equalUnordered(front(name, "sql"), front(name, "dsl"))
        else Comparator.equalOrdered(front(name, "sql"), front(name, "dsl"))
      println(s"check $name: sql == dsl -> $eq")
    }
    spark.stop()
  }
}
