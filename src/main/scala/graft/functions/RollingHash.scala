package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_hash(text)` → polynomial rolling hash over the document's
  * Unicode code points: `h ← (h·31 + cp) mod 1e9+7`, seeded 0 — the
  * content-fingerprint shard key (Karp-Rabin form).
  *
  * Why native and not the composed HOF
  * (`aggregate(transform(sequence(1, length(text)), i ->
  * ascii(substr(text, i, 1))), 0L, ...)`): beyond the interpreted
  * CodegenFallback overhead, `substr(text, i, 1)` re-scans the string
  * from the front to find code point i — O(i) per character, O(n²) per
  * document. A 100 kB document costs ~10ⁱ⁰ byte touches; at 100 TB of
  * documents the composed form is a scale-killer (VERDICT r3). This
  * kernel is one forward pass over the UTF-8 bytes.
  *
  * Parity: Spark's `ascii`/`substr` and DuckDB's `text[i]`/`ascii` both
  * address code points, so the fold sequence is identical; all values
  * stay < 31·(1e9+7)+0x10FFFF, well inside checked Long range. Empty
  * text → 0 on both engines (Spark's `sequence(1,0)` quirk included —
  * see TextOpsSpec).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = RollingHash.name

  private val Mod = 1000000007L

  def kernel(t: UTF8String): Long = {
    // Iterate code points via the decoded String: matches substr/ascii
    // (code-point addressed) exactly, including astral-plane chars.
    val s = t.toString
    val n = s.length
    var h = 0L
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  override def nullSafeEval(t: Any): Any = kernel(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("rollingHash", this)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $obj.kernel($t);")
  }
  override protected def withNewChildInternal(c: Expression): RollingHash =
    copy(child = c)
}

object RollingHash {
  val name = "rolling_hash"
  val info = new ExpressionInfo(classOf[RollingHash].getName, name)
  val builder: Seq[Expression] => Expression = {
    case Seq(t) => RollingHash(t)
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
