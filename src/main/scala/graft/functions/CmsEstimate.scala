package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point lookup into a serialized Count-Min sketch (the binary the
  * built-in `count_min_sketch` aggregate produces): estimated frequency
  * of `item`, never an underestimate (Cormode & Muthukrishnan 2005).
  *
  * This closes the loop on the frequency-sketch family the way
  * `q_agg_hll_sketch` does for cardinality: CMS states are fixed-size
  * (depth × width longs) and merge by elementwise ADDITION, so the
  * sketch of a 100 TB corpus is a map-side-combined aggregate whose
  * result is bit-identical under ANY partitioning — unlike
  * SpaceSaving-style heavy-hitter summaries, whose merges are
  * tie-order-dependent and were deliberately not used.
  *
  * Deliberately CodegenFallback: lookups run on a handful of candidate
  * rows against a broadcast sketch (never on the corpus side), so
  * interpreted eval costs nothing — the hot path is the sketch BUILD,
  * which is Spark's own codegen'd aggregate. The last decoded sketch is
  * cached by reference, so the per-row cost is d hash probes, not a
  * (depth × width)-long deserialization.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary sketch, string item), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = CmsEstimate.name

  // Per-task decode cache: the sketch operand is one broadcast value
  // repeated across rows. Reference equality is the cheap first probe,
  // but it can MISS every row — UnsafeRow.getBinary allocates a fresh
  // array per access (e.g. when the sketch column flows through a
  // broadcast join rather than a literal), which in r5 meant a full
  // (depth × width)-long deserialization per row. Content equality is
  // the fallback: one memcmp of the ~KB sketch bytes vs a rebuild.
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  override def nullSafeEval(sk: Any, item: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if (!(bytes eq cachedBytes) &&
        !java.util.Arrays.equals(bytes, cachedBytes)) {
      cachedSketch = CountMinSketch.readFrom(bytes)
      cachedBytes = bytes
    }
    // The built-in agg adds StringType values as their UTF-8 bytes
    // (addBinary(utf8.getBytes)); estimateCount(String) hashes the same
    // UTF-8 byte form, so build and probe agree byte-for-byte.
    cachedSketch.estimateCount(item.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  val name = "cms_estimate"
  val info = new ExpressionInfo(classOf[CmsEstimate].getName, name)
  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => CmsEstimate(a, b)
    case other => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${other.size}")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)

  def apply(spark: SparkSession, sketch: Column, item: Column): Column = {
    register(spark)
    call_function(name, sketch, item)
  }
}
