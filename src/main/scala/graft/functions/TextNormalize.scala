package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for corpus cleaning — the first pass of
  * every LLM data pipeline (mismatched encodings of the SAME text are
  * the classic silent dedup-killer: "café" composed vs decomposed are
  * different byte strings until NFC-normalized). Spark ships no
  * normalizer built-in; these two kernels are named and specified to
  * match DuckDB's `nfc_normalize` / `strip_accents`, so the oracle can
  * check them cross-engine rather than against themselves.
  *
  * ASCII fast path: `Normalizer.isNormalized` on ASCII input is a cheap
  * scan and skips allocation entirely — at 100 TB most text is ASCII
  * and pays ~zero.
  */
abstract class TextNormalizeBase extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
}

/** NFC (canonical composition) normalization. */
case class NfcNormalize(child: Expression) extends TextNormalizeBase {
  override def prettyName: String = NfcNormalize.name
  override def nullSafeEval(s: Any): Any =
    NfcNormalize.kernel(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.kernel($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

object NfcNormalize {
  val name = "nfc_normalize"
  def kernel(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
  val info = new ExpressionInfo(classOf[NfcNormalize].getName, name)
  val builder: Seq[Expression] => Expression = {
    case Seq(c) => NfcNormalize(c)
    case other => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${other.size}")
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
  def apply(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function(name, c)
  }
}

/** Diacritic removal: NFD-decompose, drop combining marks, re-compose.
  * Characters with no canonical decomposition (ø, ł, đ) pass through
  * unchanged — same contract as DuckDB/utf8proc `strip_accents`. */
case class StripAccents(child: Expression) extends TextNormalizeBase {
  override def prettyName: String = StripAccents.name
  override def nullSafeEval(s: Any): Any =
    StripAccents.kernel(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StripAccents.kernel($c)")
  override protected def withNewChildInternal(c: Expression): StripAccents =
    copy(child = c)
}

object StripAccents {
  val name = "strip_accents"
  private val Marks = "\\p{Mn}+".r
  def kernel(s: UTF8String): UTF8String = {
    // Short-circuit ONLY for pure ASCII (one byte scan, no allocation):
    // ASCII is trivially NFD-with-no-marks AND trivially NFC, so both
    // paths agree it is a fixed point. Any wider fast path (e.g.
    // "isNormalized(NFD) && no BMP Mn chars") diverges from the slow
    // path on decomposed Hangul jamo, astral-plane Mn marks (whose
    // chars report type SURROGATE, not NON_SPACING_MARK), and Mc
    // sequences — inputs the slow path would strip or NFC-compose.
    val n = s.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) return s
    val stripped = Marks.replaceAllIn(
      Normalizer.normalize(s.toString, Normalizer.Form.NFD), "")
    UTF8String.fromString(
      Normalizer.normalize(stripped, Normalizer.Form.NFC))
  }
  val info = new ExpressionInfo(classOf[StripAccents].getName, name)
  val builder: Seq[Expression] => Expression = {
    case Seq(c) => StripAccents(c)
    case other => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${other.size}")
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
  def apply(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function(name, c)
  }
}
