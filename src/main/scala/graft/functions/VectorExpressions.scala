package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd kernels over `array<float>` embedding columns.
  *
  * The higher-order-function formulation (zip_with + aggregate) is
  * semantically right but pays per-element boxing through the lambda
  * interpreter — ~70 µs per 64-dim pair measured at sf0.01, which is the
  * whole budget of an all-pairs near-dup join. These expressions generate
  * a tight primitive loop inside whole-stage codegen instead.
  *
  * Numeric parity: accumulation is double, left-to-right, exactly like the
  * HOF form and the DuckDB oracle's list_transform/list_sum — results are
  * bit-identical, so oracle queries keep passing after the swap
  * (asserted in VectorExpressionsSpec).
  */
abstract class FloatVectorBinary extends BinaryExpression {
  // ExpectsInputTypes/AbstractDataType are private[sql]; enforce the
  // array<float> contract manually instead.
  override def checkInputDataTypes(): TypeCheckResult =
    if (
      left.dataType == ArrayType(FloatType) ||
      left.dataType == ArrayType(FloatType, containsNull = false)
    )
      if (
        right.dataType == ArrayType(FloatType) ||
        right.dataType == ArrayType(FloatType, containsNull = false)
      ) TypeCheckResult.TypeCheckSuccess
      else
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${right.dataType.sql}"
        )
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${left.dataType.sql}"
      )
  override def nullable: Boolean = true
}

/** Σ aᵢ·bᵢ in double; null on length mismatch or null element (matching
  * the null semantics of the zip_with/aggregate composition).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends FloatVectorBinary {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
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
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val bad = ctx.freshName("bad")
        s"""
        |int $n = $a.numElements();
        |boolean $bad = ($n != $b.numElements());
        |double $dot = 0.0;
        |for (int $i = 0; !$bad && $i < $n; $i++) {
        |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
        |  $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
        |}
        |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $dot; }
        """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "float_vector_dot"
}

/** cos(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²) in one pass; null on length
  * mismatch, null element, or zero norm (no ANSI division-by-zero).
  */
case class FloatVectorCosine(left: Expression, right: Expression)
    extends FloatVectorBinary {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        val bad = ctx.freshName("bad")
        val denom = ctx.freshName("denom")
        s"""
        |int $n = $a.numElements();
        |boolean $bad = ($n != $b.numElements());
        |double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |for (int $i = 0; !$bad && $i < $n; $i++) {
        |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
        |  double $x = (double) $a.getFloat($i);
        |  double $y = (double) $b.getFloat($i);
        |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        |}
        |double $denom = Math.sqrt($na) * Math.sqrt($nb);
        |if ($bad || $denom == 0.0) { ${ev.isNull} = true; }
        |else { ${ev.value} = $dot / $denom; }
        """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "float_vector_cosine"
}

/** a / ‖a‖ (unit-length projection); null on zero norm or null element —
  * the same null surface as the binary kernels, so composing them never
  * changes where nulls appear. Division is double-precision per element,
  * narrowed back to float.
  *
  * Under [[graft.plans.SimplifyNormalizedCosine]] a cosine over
  * normalized inputs folds to the cosine of the raw inputs (cosine is
  * scale-invariant), skipping this computation entirely.
  */
case class FloatVectorNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (
      child.dataType == ArrayType(FloatType) ||
      child.dataType == ArrayType(FloatType, containsNull = false)
    ) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${child.dataType.sql}"
      )

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      ss += x * x
      i += 1
    }
    val norm = math.sqrt(ss)
    if (norm == 0.0) return null
    val out = new Array[Float](n)
    i = 0
    while (i < n) {
      out(i) = (a.getFloat(i).toDouble / norm).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val ss = ctx.freshName("ss")
        val norm = ctx.freshName("norm")
        val out = ctx.freshName("out")
        val bad = ctx.freshName("bad")
        val x = ctx.freshName("x")
        s"""
        |int $n = $a.numElements();
        |boolean $bad = false;
        |double $ss = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($a.isNullAt($i)) { $bad = true; break; }
        |  double $x = (double) $a.getFloat($i);
        |  $ss += $x * $x;
        |}
        |double $norm = Math.sqrt($ss);
        |if ($bad || $norm == 0.0) { ${ev.isNull} = true; }
        |else {
        |  float[] $out = new float[$n];
        |  for (int $i = 0; $i < $n; $i++) {
        |    $out[$i] = (float) (((double) $a.getFloat($i)) / $norm);
        |  }
        |  ${ev.value} = ${classOf[UnsafeArrayData].getName}.fromPrimitiveArray($out);
        |}
        """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "float_vector_normalize"
}
