package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native asymmetric-distance-computation (ADC) score for product
  * quantization (Jégou et al., PAMI'11 §V): given a corpus row's code
  * array (M sub-quantizer indices) and a probe's flattened lookup table
  * (M·K doubles, table[m·K + c] = the probe↔centroid partial score for
  * code c of subspace m), returns the summed table lookups — the PQ
  * approximation of the probe·vector inner product.
  *
  * This replaces a D-multiply dot product with M array reads per
  * corpus row, which is the entire point of PQ at 100 TB: the scan
  * touches 4-byte codes instead of 256-byte vectors and does 8 lookups
  * instead of 64 multiplies. Loop-shaped per-row work → native codegen
  * kernel per the SCALE.md cliff-5 rule (HOF folds are interpreted
  * CodegenFallback).
  *
  * K is derived as table.length / codes.length; a code outside [0, K)
  * or a ragged/null input yields NULL, never a wrong lookup.
  */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<int> codes, array<double> table), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = AdcScore.name
  // NULL for non-null inputs (ragged table / out-of-range code), so
  // nullability must not derive from the children.
  override def nullable: Boolean = true

  override def nullSafeEval(codes: Any, table: Any): Any = {
    val c = codes.asInstanceOf[ArrayData]
    val t = table.asInstanceOf[ArrayData]
    val m = c.numElements()
    if (m == 0 || t.numElements() % m != 0) return null
    val k = t.numElements() / m
    var acc = 0.0
    var i = 0
    while (i < m) {
      if (c.isNullAt(i)) return null
      val code = c.getInt(i)
      if (code < 0 || code >= k) return null
      if (t.isNullAt(i * k + code)) return null
      acc += t.getDouble(i * k + code)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.freshName("m")
    val k = ctx.freshName("k")
    val acc = ctx.freshName("acc")
    val i = ctx.freshName("i")
    val code = ctx.freshName("code")
    nullSafeCodeGen(ctx, ev, (c, t) => s"""
      int $m = $c.numElements();
      if ($m == 0 || $t.numElements() % $m != 0) { ${ev.isNull} = true; }
      else {
        int $k = $t.numElements() / $m;
        double $acc = 0.0;
        for (int $i = 0; $i < $m; $i++) {
          if ($c.isNullAt($i)) { ${ev.isNull} = true; break; }
          int $code = $c.getInt($i);
          if ($code < 0 || $code >= $k || $t.isNullAt($i * $k + $code)) {
            ${ev.isNull} = true; break;
          }
          $acc += $t.getDouble($i * $k + $code);
        }
        if (!${ev.isNull}) { ${ev.value} = $acc; }
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

object AdcScore {
  val name = "adc_score"

  val info = new ExpressionInfo(classOf[AdcScore].getName, name)

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => AdcScore(a, b)
    case other => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${other.size}")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)

  def apply(spark: SparkSession, codes: Column, table: Column): Column = {
    register(spark)
    call_function(name, codes, table)
  }
}
