package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two float vectors as a native Catalyst expression.
  *
  * Preference order for custom ops (SURVEY.md §7): built-ins first, then a
  * native `Expression`. The built-in composition for cosine is three
  * higher-order `aggregate(zip_with(...))` passes over the arrays; this
  * expression fuses dot product and both norms into ONE loop inside
  * whole-stage codegen — the hot inner kernel of the embedding dedup and
  * ANN queries, where it runs O(candidates) times over 64-float arrays.
  *
  * Determinism contract (for the DuckDB differential oracle): elements are
  * widened float→double (exact), each accumulator is summed left-to-right,
  * and the result is `dot / (sqrt(na) * sqrt(nb))` — the same IEEE
  * operation sequence the oracle SQL spells out with `list_sum` +
  * `list_transform`, so both engines produce bitwise-identical doubles.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def elementNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  /** Always nullable: besides null inputs and null ELEMENTS, a LENGTH
    * MISMATCH between the two arrays poisons the result to NULL at
    * runtime (a truncated embedding must not yield a plausible-but-wrong
    * similarity), and lengths are unknowable statically. Nullability must
    * stay in sync with every codegen path that assigns `ev.isNull` —
    * declaring non-nullable would generate uncompilable code (that branch
    * never declares the variable) and the interpreter fallback's null
    * would be silently coerced to 0.0 by a non-nullable UnsafeProjection. */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires array<float> inputs, got " +
          s"${left.dataType.sql} / ${right.dataType.sql}")
    }

  /** Null ELEMENTS and length-mismatched inputs poison the result to
    * NULL (a silently-zeroed slot or a truncated-prefix similarity would
    * be plausible-but-wrong with no error; DuckDB's list_transform
    * likewise propagates element NULLs). */
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: a bare `i`/`n` can collide with the enclosing
      // projection's variables inside whole-stage codegen
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val d = ctx.freshName("d")
      // the element check is dead code unless the array type admits null
      // elements (ev.isNull always exists — the expression is nullable)
      val elementCheck =
        if (elementNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val compute =
        s"""
           |double $d = Math.sqrt($na) * Math.sqrt($nb);
           |${ev.value} = ($d == 0.0) ? 0.0 : $dot / $d;
         """.stripMargin
      val guardedCompute =
        if (elementNullable) s"if (!${ev.isNull}) { $compute }" else compute
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elementCheck
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  $guardedCompute
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Raw dot product of two float vectors — the [[CosineSim]] kernel minus
  * the norms. Needed where the SCALE of the vectors matters (product-
  * quantization distances, reconstruction norms) and cosine's
  * normalization would destroy it. Same determinism contract: float
  * elements widened to double exactly, one left-to-right accumulation —
  * bit-compatible with the oracle's `list_sum(list_transform(...))` —
  * and the same null semantics (null input/element or length mismatch
  * poisons to NULL). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def elementNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  /** Always nullable — see [[CosineSim.nullable]]: every codegen path
    * that can assign `ev.isNull` (length mismatch, null element) must be
    * matched by `nullable = true` or Janino fails and the interpreter
    * fallback's null is coerced to 0.0. */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<float> inputs, got " +
          s"${left.dataType.sql} / ${right.dataType.sql}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val elementCheck =
        if (elementNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val assign = s"${ev.value} = $dot;"
      val guardedAssign =
        if (elementNullable) s"if (!${ev.isNull}) { $assign }" else assign
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elementCheck
         |    $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  $guardedAssign
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-API entry point: `cosine_sim($"a", $"b")`. Inputs must be
    * `array<float>` (the harness embedding type); enforced at analysis
    * time by the expression's child dataType check below. */
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-API entry point: `dot_product($"a", $"b")`. */
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
