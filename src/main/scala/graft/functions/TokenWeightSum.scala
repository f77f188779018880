package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `token_weight_sum(lowered_text)` →
  * `struct<n_tokens: bigint, wsum: double>` — the hashed-feature
  * linear-scorer kernel (CCNet/fastText-style) in one pass: tokenize
  * on single spaces, and for each non-empty token accumulate the
  * bucketed rolling-hash weight
  * `((rolling_hash(tok) % 65536 · 2654435761) % 1000003) / 1000003 − 0.5`
  * left-to-right into `wsum`, counting tokens into `n_tokens`.
  *
  * Why native and not the composed HOF
  * (`aggregate(transform(filter(split(text,' '), …), …), 0.0, +)`):
  * higher-order functions evaluate their lambda INTERPRETED — per
  * token that is a chain of `Expression.eval` virtual calls, a boxed
  * `java.lang.Double` per arithmetic step, and (inside the custom
  * hash) a full `String` decode — plus the materialized token and
  * weight ARRAYS per document that the one-pass form never allocates.
  * BenchOne at sf20 (r18): 8.5 s steady-state for the HOF form vs
  * ~1 s for this kernel; inside the full 185-query bench schedule the
  * HOF form degraded a further 3.7× (32 s — allocation-rate-driven,
  * see SCALE.md r18) while the kernel is immune. At 100 TB the scorer
  * runs over every crawled document — it must ride the scan, not an
  * interpreter.
  *
  * Parity contract (pinned in CurationSpec): bit-identical to the
  * composed HOF form — same token boundaries (single-space split,
  * empties dropped, so Spark `split`'s trailing-empty and
  * consecutive-delimiter quirks are neutralized by the filter), same
  * per-token fold ([[RollingHash.kernel]]: code-point polynomial mod
  * 1e9+7), same exact integer steps (max 65535 · 2654435761 ≈ 1.7e14,
  * inside the 2^53 double-exact range the DuckDB oracle shares), and
  * the same left-to-right IEEE summation order as the HOF
  * `aggregate`'s fold. Takes ALREADY-LOWERED text so `lower()`
  * semantics stay Spark's own (one codegen'd `lower`, not a kernel
  * re-implementation that could drift on Unicode).
  */
case class TokenWeightSum(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = TokenWeightSum.schema
  override def prettyName: String = TokenWeightSum.name

  def kernel(t: UTF8String): InternalRow = {
    // One decode per document: RollingHash.kernel addresses CODE
    // POINTS (substr/ascii parity), so the per-token hash walks the
    // decoded chars; doing the decode once here beats the HOF form's
    // per-token toString.
    val s = t.toString
    val len = s.length
    var i = 0
    var n = 0L
    var wsum = 0.0
    while (i <= len) {
      var j = s.indexOf(' ', i)
      if (j < 0) j = len
      if (j > i) { // non-empty token s[i, j)
        var h = 0L
        var k = i
        while (k < j) {
          val cp = s.codePointAt(k)
          h = (h * 31L + cp) % 1000000007L
          k += Character.charCount(cp)
        }
        n += 1L
        wsum += (h % 65536L * 2654435761L % 1000003L).toDouble /
          1000003.0d - 0.5d
      }
      i = j + 1
    }
    val out = new GenericInternalRow(2)
    out.setLong(0, n)
    out.setDouble(1, wsum)
    out
  }

  override def nullSafeEval(t: Any): Any = kernel(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The loop body stays a JIT-compiled Scala method; codegen pays
    // one monomorphic call per ROW (vs the HOF's per-token interpreted
    // eval chain).
    val obj = ctx.addReferenceObj("tokenWeightSum", this)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $obj.kernel($t);")
  }
  override protected def withNewChildInternal(c: Expression): TokenWeightSum =
    copy(child = c)
}

object TokenWeightSum {
  val name = "token_weight_sum"
  // The scorer's constants, canonical here (the kernel loop above
  // hardcodes them for codegen simplicity; CurationOps interpolates
  // THESE into the DuckDB oracle so the two can never drift apart —
  // CurationSpec's HOF-parity case would catch a kernel/constant skew).
  val FeatBuckets = 65536L
  val WeightPrime = 1000003L
  val WeightMix = 2654435761L // Knuth multiplicative constant
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("wsum", DoubleType, nullable = false)))
  val info = new ExpressionInfo(classOf[TokenWeightSum].getName, name)
  val builder: Seq[Expression] => Expression = {
    case Seq(t) => TokenWeightSum(t)
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
