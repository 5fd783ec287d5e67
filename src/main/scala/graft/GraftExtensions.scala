package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSim

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
  }
}

object GraftExtensions {
  private val cosineSimDescriptor = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSim].getCanonicalName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "cosine_sim expects exactly 2 arguments")
      CosineSim(children.head, children(1))
    })

  /** Register on an already-built session (temp-function registry). */
  def register(s: org.apache.spark.sql.SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => {
        require(exprs.length == 2, "cosine_sim expects exactly 2 arguments")
        CosineSim(exprs.head, exprs(1))
      },
      "scala_udf")
}
