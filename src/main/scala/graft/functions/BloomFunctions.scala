package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Count of a long-array's elements that MIGHT be in a Bloom filter, as
  * a native codegen expression — the probe side of the ingest-time
  * contamination screen ([[graft.streaming.StreamingOps
  * .contaminationScreen]]).
  *
  * The filter travels as its serialized bytes in a CONSTRUCTOR parameter
  * (not a child literal: a ~1 MB binary literal renders as megabytes of
  * hex in every explain/plan-diff) and is deserialized lazily once per
  * JVM-side instance — generated code receives the deserialized
  * [[BloomFilter]] through the codegen reference array, exactly how
  * Spark's own injected runtime-filter probes carry theirs. Spark's
  * `might_contain` expression covers the one-probe case but no Spark
  * built-in counts hits over an array without an interpreted
  * higher-order-function fallback (`aggregate`/`filter` lambdas are
  * CodegenFallback); this kernel keeps the whole probe loop inside
  * whole-stage codegen — the same argument as [[MinHashSig]], at the
  * same place in the plan (the scan projection).
  */
case class BloomHitCount(bloomBytes: Array[Byte], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_hit_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_hit_count requires array<bigint>, got ${other.sql}")
  }

  /** Deserialized once per instance per JVM; the expression ships the
    * compact bytes, executors pay one readFrom. */
  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(input: Any): Any =
    BloomHitCount.count(filter, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      val helper = BloomHitCount.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.count($ref, $c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomHitCount {
  /** Probe loop shared by interpreted eval and generated code. Null array
    * elements count as misses (the screen's shingle arrays are built
    * containsNull=false; the guard is for generic reuse). */
  def count(f: BloomFilter, arr: ArrayData): Long = {
    var c = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && f.mightContainLong(arr.getLong(i))) c += 1
      i += 1
    }
    c
  }
}

object BloomFunctions {
  /** Column-API entry point: `bloom_hit_count(bytes, $"shingles")`. */
  def bloom_hit_count(bloomBytes: Array[Byte], arr: Column): Column =
    ColumnBridge.column(BloomHitCount(bloomBytes, ColumnBridge.expression(arr)))
}
