package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: single-pass fused cosine similarity over
  * two float-array columns.
  *
  * The composed form (Vectors.cosine) traverses each array three times
  * (dot + two norms) through generic higher-order-function machinery;
  * this kernel does one traversal with three accumulators and
  * whole-stage-codegens to a tight scalar loop. Accumulation order per
  * accumulator is identical to the composed form's left fold from 0.0,
  * so results are BIT-IDENTICAL to Vectors.cosine and to the DuckDB
  * oracle mirror (Vectors.sqlCosine) — asserted by ExpressionSpec.
  *
  * This is the one place the built-ins genuinely couldn't express the
  * operator efficiently (SURVEY.md §4.3 anticipated zero custom
  * expressions; the fused traversal is the exception that measured
  * worth it).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> args, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // Returns null for non-null inputs (ragged pair / null element), so
  // nullability must not derive from the children — without this the
  // analyzed schema claims non-nullable and a null result reads back
  // as 0.0 through the external row converter.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // Ragged pair or null element → NULL, matching the composed
    // zip_with/aggregate form and the DuckDB mirror (out-of-range list
    // index → NULL) — keeps the BIT-IDENTICAL contract on all inputs.
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n")
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val i = ctx.freshName("i")
    val xi = ctx.freshName("xi")
    val yi = ctx.freshName("yi")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int $n = $a.numElements();
      if ($n != $b.numElements()) { ${ev.isNull} = true; }
      else {
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
          double $xi = (double) $a.getFloat($i);
          double $yi = (double) $b.getFloat($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        if (!${ev.isNull}) { ${ev.value} = $dot / Math.sqrt($na * $nb); }
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val name = "cosine_sim"

  val info = new ExpressionInfo(classOf[CosineSimilarity].getName, name)

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => CosineSimilarity(a, b)
    case other => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${other.size}")
  }

  /** Idempotent per-session registration (also injected app-wide by
    * GraftExtensions for sessions built with the extension). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)

  /** Column-API entry: registers on the bound session lazily via SQL
    * function dispatch. */
  def apply(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(name, a, b)
  }
}
