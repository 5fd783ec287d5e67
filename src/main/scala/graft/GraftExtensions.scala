package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSim, RollingHash}

/** Session-extension wiring (SURVEY.md §7 custom-op ladder, step (c)):
  * registers graft's native expressions with the SQL function registry so
  * the SQL front-end can call them like built-ins:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   spark.sql("SELECT cosine_sim(a.embedding, b.embedding) FROM ...")
  *
  * Also registrable post-hoc on an existing session via [[GraftExtensions
  * .register]] (used by the test harness, whose session is shared).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cosineSimDescriptor)
    e.injectFunction(GraftExtensions.rollingHashDescriptor)
  }
}

object GraftExtensions {

  private def buildCosineSim(children: Seq[Expression]): Expression = {
    require(children.length == 2, "cosine_sim expects exactly 2 arguments")
    CosineSim(children.head, children(1))
  }

  /** SQL form: rolling_hash(str, k) where k must be an integer literal
    * (the window size is part of the expression, not a runtime value). */
  private def buildRollingHash(children: Seq[Expression]): Expression = {
    require(children.length == 2, "rolling_hash expects exactly 2 arguments")
    val k = children(1) match {
      case e if e.foldable => e.eval() match {
        case i: Int => i
        case l: Long if l >= 1 && l <= Int.MaxValue => l.toInt
        case other => throw new IllegalArgumentException(
          s"rolling_hash window must be a positive int literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "rolling_hash window must be a literal")
    }
    RollingHash(children.head, k)
  }

  private val cosineSimDescriptor = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSim].getCanonicalName, "cosine_sim"),
    buildCosineSim _)

  private val rollingHashDescriptor = (
    FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getCanonicalName, "rolling_hash"),
    buildRollingHash _)

  /** Register on an already-built session (temp-function registry). */
  def register(s: org.apache.spark.sql.SparkSession): Unit = {
    val reg = s.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", buildCosineSim, "scala_udf")
    reg.createOrReplaceTempFunction("rolling_hash", buildRollingHash, "scala_udf")
  }
}
