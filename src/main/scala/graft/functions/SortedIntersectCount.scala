package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** |A ∩ B| for two SORTED, DISTINCT long arrays via a linear merge —
  * no per-pair hash set like `array_intersect`, no allocation. The
  * inner loop of set-similarity (n-gram Jaccard) dedup over hashed
  * shingles; measured against `size(array_intersect(...))` in the
  * q_dedup_ngram_jaccard pipeline. Inputs that are unsorted or carry
  * duplicates produce undefined counts — the caller owns
  * `array_sort(array_distinct(...))` (TextHash.shingles already
  * distincts; hashing preserves distinctness modulo 64-bit collisions).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<bigint> args, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val c = ctx.freshName("c")
    val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int $nx = $a.numElements(); int $ny = $b.numElements();
      int $i = 0; int $j = 0; long $c = 0L;
      while ($i < $nx && $j < $ny) {
        long $xi = $a.getLong($i); long $yj = $b.getLong($j);
        if ($xi == $yj) { $c++; $i++; $j++; }
        else if ($xi < $yj) { $i++; } else { $j++; }
      }
      ${ev.value} = $c;""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  val name = "sorted_intersect_count"
  val info = new ExpressionInfo(classOf[SortedIntersectCount].getName, name)
  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => SortedIntersectCount(a, b)
    case other => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${other.size}")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)

  def apply(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(name, a, b)
  }
}
