package graft

/** Calibration-kernel level probe (r20, VERDICT r19 #1): times
  * [[Bench.calibrate]] (the CPU kernel) and [[Bench.xCalibrate]] (the
  * exchange kernel) N times back-to-back and prints every sample — the
  * instrument that PINS the exchange kernel's steady reference level
  * (and re-verifies the CPU kernel's 0.060 s pin) on the harness box.
  * `runMain graft.XCalProbe [reps=8] [cpus=32]`. The pinned levels land
  * in [[Bench]]'s gate constants with the measured spread quoted in
  * SCALING.md. */
object XCalProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(8)
    val cpus = args.lift(1).getOrElse("32")
    val spark = BenchSupport.session(cpus)
    // one throwaway of each: JIT + shuffle-service warmup, same as the
    // bench's own first gatedCalibrate in a warmed JVM
    Bench.calibrate(spark); Bench.xCalibrate(spark)
    val samples = (1 to reps).map { _ =>
      (Bench.calibrate(spark), Bench.xCalibrate(spark))
    }
    def f(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"xcal_probe","cpus":$cpus,"reps":$reps,""" +
      s""""cpu":[${samples.map(s => f(s._1)).mkString(",")}],""" +
      s""""x":[${samples.map(s => f(s._2)).mkString(",")}],""" +
      s""""cpu_min":${f(samples.map(_._1).min)},"cpu_max":${f(samples.map(_._1).max)},""" +
      s""""x_min":${f(samples.map(_._2).min)},"x_max":${f(samples.map(_._2).max)}}""")
    spark.stop()
  }
}
