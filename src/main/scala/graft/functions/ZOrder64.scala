package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Z-order (Morton) key: interleaves the low 32 bits of two
  * non-negative longs so that sorting by the result clusters rows that
  * are close in BOTH dimensions.
  *
  * Why: a snapshot sorted by one column prunes row groups only on that
  * column — every file spans the full range of the other. Sorting by
  * the Morton key gives every file a bounded min/max box in both
  * dimensions, so parquet min/max pruning works for 2-D predicates
  * (point lookups, range boxes) — the lakehouse Z-ORDER technique
  * (public: Morton 1966; Delta/Iceberg OPTIMIZE ZORDER). Skewed or
  * non-integer domains should be rank/percentile-normalized into
  * [0, 2³²) first; the key ignores bits above 32.
  */
case class ZOrder64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = ZOrder64.name

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder64.kernel(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder64.kernel($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZOrder64 = copy(left = l, right = r)
}

object ZOrder64 {
  val name = "zorder64"

  /** Spread the low 32 bits of v into the even bit positions of a long
    * (the classic parallel-prefix Morton spread). */
  private def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** a's bits at even positions, b's at odd. */
  def kernel(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  val info = new ExpressionInfo(classOf[ZOrder64].getName, name)
  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => ZOrder64(a, b)
    case other => throw new IllegalArgumentException(
      s"$name expects (a, b), got ${other.size} args")
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
  def apply(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(name, a, b)
  }
}
