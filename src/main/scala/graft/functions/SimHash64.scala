package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass SimHash: text → 64-bit tf-weighted bit-majority
  * fingerprint (Charikar, STOC'02 similarity estimation).
  *
  * Replaces the composed form of q_dedup_simhash — explode(tokens) →
  * groupBy(doc, token) for tf → 64 conditional-sum aggregate columns →
  * groupBy(doc) — which shuffles the corpus at TOKEN granularity twice.
  * This kernel computes the identical value (same tokenization as
  * GramSketch.tokenHashes, same xxhash64(seed 42) per token, same
  * +tf/−tf per bit, same sum>0 majority rule) in one pass per row, so
  * the query becomes a narrow scan-speed projection: the only work that
  * moves is one long per document. Distinct tokens that collide in
  * xxhash64 merge their tf — the bit contribution is linear in tf, so
  * this is arithmetically identical to the grouped form too.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = SimHash64.name

  def kernel(t: UTF8String): Long = {
    val th = GramSketch.tokenHashes(t)
    if (th.isEmpty) return 0L
    // tf per distinct token hash via sorted-run counting (no hashmap
    // allocation churn; docs are short, sort dominates nothing)
    java.util.Arrays.sort(th)
    val sums = new Array[Long](64)
    var i = 0
    while (i < th.length) {
      val h = th(i)
      var j = i
      while (j < th.length && th(j) == h) j += 1
      val tf = (j - i).toLong
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += tf else sums(b) -= tf
        b += 1
      }
      i = j
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0L) out |= (1L << b)
      b += 1
    }
    out
  }

  override def nullSafeEval(t: Any): Any = kernel(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("simHash64", this)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $obj.kernel($t);")
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

object SimHash64 {
  val name = "simhash64"
  val info = new ExpressionInfo(classOf[SimHash64].getName, name)
  val builder: Seq[Expression] => Expression = {
    case Seq(t) => SimHash64(t)
    case other => throw new IllegalArgumentException(
      s"$name expects (text), got ${other.size} args")
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
  def apply(spark: SparkSession, text: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(name, text)
  }
}
