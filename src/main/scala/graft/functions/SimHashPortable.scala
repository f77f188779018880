package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass SimHash: text → tf-weighted bit-majority fingerprint
  * (Charikar, STOC'02 similarity estimation) under the dialect-portable
  * hash family (GramSketch.simhashPortable) — so the fingerprints are
  * bit-identical in DuckDB and `q_dedup_simhash` is oracle-checked, the
  * same flip `minhash_portable` made for `q_dedup_minhash`.
  *
  * Why native and not the composed form — explode(tokens) →
  * groupBy(doc, token) for tf → per-bit conditional-sum aggregates →
  * groupBy(doc) — which shuffles the corpus at TOKEN granularity twice:
  * at 100 TB that moves ~100× the corpus through two shuffles to
  * produce one long per doc. The kernel computes the identical value
  * (DedupSpec proves it against the composed portable form) in one
  * tight loop per row, so the query is a narrow scan-speed projection.
  * Distinct tokens that collide in the portable hash merge their tf —
  * bit votes are linear in tf, so that is arithmetically identical to
  * the grouped form too.
  */
case class SimHashPortable(child: Expression, bits: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && bits >= 1 && bits <= 62)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, 1<=bits<=62), got " +
        s"${child.dataType.simpleString}, bits=$bits")
  override def dataType: DataType = LongType
  override def prettyName: String = SimHashPortable.name

  // per-bit affine-permutation constants, built once per plan instance
  // (not per row — the kernel loop only reads them)
  private lazy val as = Array.tabulate(bits)(GramSketch.portableA)
  private lazy val bs = Array.tabulate(bits)(GramSketch.portableB)

  def kernel(t: UTF8String): Long =
    GramSketch.simhashPortable(t, bits, as, bs)

  override def nullSafeEval(t: Any): Any = kernel(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("simHashPortable", this)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $obj.kernel($t);")
  }
  override protected def withNewChildInternal(c: Expression): SimHashPortable =
    copy(child = c)
}

object SimHashPortable {
  val name = "simhash_portable"
  val info = new ExpressionInfo(classOf[SimHashPortable].getName, name)
  val builder: Seq[Expression] => Expression = {
    case Seq(t, Literal(b: Int, IntegerType)) => SimHashPortable(t, b)
    case other => throw new IllegalArgumentException(
      s"$name expects (text, bits literal int), got ${other.size} args")
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
  def apply(spark: SparkSession, text: Column, bits: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(name, text,
      org.apache.spark.sql.functions.lit(bits))
  }
}
