package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass text → k-gram sketch kernels.
  *
  * Why native expressions and not the composed higher-order-function
  * forms (TextHash.scala): HOFs are CodegenFallback — interpreted — and
  * interpreted eval has NO common-subexpression caching. Any reference
  * to an expensive array alias from inside a lambda (e.g.
  * `element_at(tokenHashes, i)` per shingle) re-evaluates the whole
  * token pipeline per element, and optimizer inlining (filter pushdown
  * through projects, ScanOperation/Generate collapse) can silently
  * create exactly that shape from innocent-looking query code —
  * measured 0.2 s → 6 s (filter pushdown), → 200 s (under a Generate)
  * at sf0.1. A native kernel is immune by construction: tokenization,
  * gram hashing and the sketch run in one tight JVM loop per row, and
  * the worst case any inlining can cause is one extra linear pass.
  *
  * Tokenization parity with TextHash.tokens: lowercase, split on a
  * single space, drop empty tokens. Gram hashes chain XXH64 over the
  * k token hashes; the MinHash permutation family is the affine
  * h·A(s)+B(s) over Z/2^64 (A odd → bijection; wraparound is fine in
  * the JVM, unlike ANSI-mode Catalyst arithmetic).
  */
object GramSketch {
  private val Seed = 42L
  private val Space = UTF8String.fromString(" ")

  /** xxhash64 of each non-empty lowercased whitespace token. */
  def tokenHashes(text: UTF8String): Array[Long] = {
    val parts = text.toLowerCase.split(Space, -1)
    val out = new Array[Long](parts.length)
    var n = 0
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.numBytes > 0) {
        out(n) = XXH64.hashUnsafeBytes(
          p.getBaseObject, p.getBaseOffset, p.numBytes, Seed)
        n += 1
      }
      i += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Chained XXH64 over `th(i until i+k)`. */
  private def gramHash(th: Array[Long], i: Int, k: Int): Long = {
    var h = Seed
    var j = 0
    while (j < k) { h = XXH64.hashLong(th(i + j), h); j += 1 }
    h
  }

  /** All k-gram hashes of a document, in positional order (multiset —
    * NOT distinct). Empty when the document has fewer than k tokens. */
  def gramHashesRaw(text: UTF8String, k: Int): Array[Long] = {
    val th = tokenHashes(text)
    val n = th.length - k + 1
    if (n <= 0) return Array.emptyLongArray
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = gramHash(th, i, k); i += 1 }
    out
  }

  /** Sorted DISTINCT k-gram hashes (the set-similarity input shape —
    * feeds SortedIntersectCount directly). */
  def gramHashesSortedDistinct(text: UTF8String, k: Int): Array[Long] = {
    val g = gramHashesRaw(text, k)
    if (g.length <= 1) return g
    java.util.Arrays.sort(g)
    var n = 1
    var i = 1
    while (i < g.length) {
      if (g(i) != g(n - 1)) { g(n) = g(i); n += 1 }
      i += 1
    }
    if (n == g.length) g else java.util.Arrays.copyOf(g, n)
  }

  // Affine permutation constants (splitmix64 odd multipliers).
  private[functions] def permA(s: Int): Long =
    0x9E3779B97F4A7C15L * (2L * s + 1)
  private[functions] def permB(s: Int): Long =
    0xBF58476D1CE4E5B9L * s

  /** MinHash signature: min over the gram multiset of h·A(s)+B(s) per
    * permutation s (min over multiset == min over set, so no distinct
    * pass is needed). Documents with fewer than k tokens yield the
    * all-Long.MaxValue seed signature — dedup callers must drop them
    * before banding (they cannot be near-dups by this measure). */
  def minhashSig(text: UTF8String, k: Int, perms: Int): Array[Long] = {
    val sig = new Array[Long](perms)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val th = tokenHashes(text)
    val n = th.length - k + 1
    var i = 0
    while (i < n) {
      val g = gramHash(th, i, k)
      var s = 0
      while (s < perms) {
        val v = g * permA(s) + permB(s)
        if (v < sig(s)) sig(s) = v
        s += 1
      }
      i += 1
    }
    sig
  }

  // --- Dialect-portable minhash family (q_dedup_minhash's declared
  // oracle path — wired in queries/DedupOps.dedupMinhashSig): gram
  // hash g = the polynomial (h·31 + codepoint) mod P over the gram's
  // lowercased text (k tokens joined by one space), P = 1e9+7;
  // permutation s maps g → (A(s)·g + B(s)) mod P. CODE POINTS, not
  // UTF-8 bytes: DuckDB's ord(substr(gram, i, 1)) is a code point, so
  // hashing the same unit makes every step exact BIGINT arithmetic in
  // both engines (h < 2^30, h·31 + cp < 2^35; A·g < 2^60) and the
  // signatures bit-identical cross-engine BY CONSTRUCTION — including
  // the family's ~2^-30 per-pair gram collisions, which both engines
  // then share. The production banding family above keeps the 64-bit
  // XXH64 chain (stronger, not SQL-expressible); DedupSpec's
  // recall/precision floors validate that one empirically instead.
  val PortableP = 1000000007L
  def portableA(s: Int): Long = (2654435769L * (2L * s + 1)) % PortableP
  def portableB(s: Int): Long = (2246822507L * (s + 1L)) % PortableP

  /** Unicode code points of a token, decoded once per doc so the
    * per-gram loop rolls over int arrays, never re-decodes UTF-8. */
  private def codePoints(t: UTF8String): Array[Int] = {
    val s = t.toString
    val out = new Array[Int](s.codePointCount(0, s.length))
    var ci = 0
    var si = 0
    while (si < s.length) {
      val cp = s.codePointAt(si)
      out(ci) = cp
      ci += 1
      si += Character.charCount(cp)
    }
    out
  }

  /** Portable polynomial hash of each non-empty lowercased token —
    * the single-token analog of the gram hash above: g = fold of
    * (h·31 + codepoint) mod P, seed 0. Feeds [[simhashPortable]]. */
  def portableTokenHashes(text: UTF8String): Array[Long] = {
    val parts = text.toLowerCase.split(Space, -1)
    val out = new Array[Long](parts.length)
    var n = 0
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.numBytes > 0) {
        val cps = codePoints(p)
        var h = 0L
        var m = 0
        while (m < cps.length) { h = (h * 31 + cps(m)) % PortableP; m += 1 }
        out(n) = h
        n += 1
      }
      i += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Dialect-portable SimHash (Charikar random-hyperplane fingerprint):
    * bit b of the result is the tf-weighted majority vote of the
    * per-token pseudo-random sign `((g·A(b) + B(b)) mod P)·2 ≥ P`
    * — each bit its own affine permutation of the portable token hash,
    * so the hyperplane family is exact BIGINT arithmetic that DuckDB
    * reproduces bit-identically (g, A, B < 2³⁰ → products < 2⁶⁰; the
    * bit rule is `vote > 0`, ties → 0, same in both engines). `bits`
    * must stay ≤ 62 so the assembled fingerprint never touches the
    * sign bit — signed-overflow semantics are where engines diverge.
    * Zero-token docs → 0 (callers filter them, as with [[minhashSig]]).
    * Votes are linear in tf, so summing per token INSTANCE (what the
    * SQL oracle does) equals the tf-merged loop here. */
  def simhashPortable(
      text: UTF8String, bits: Int, as: Array[Long], bs: Array[Long]): Long = {
    val hs = portableTokenHashes(text)
    if (hs.isEmpty) return 0L
    java.util.Arrays.sort(hs)
    val sums = new Array[Long](bits)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = i
      while (j < hs.length && hs(j) == h) j += 1
      val tf = (j - i).toLong
      var b = 0
      while (b < bits) {
        if (((h * as(b) + bs(b)) % PortableP) * 2 >= PortableP) sums(b) += tf
        else sums(b) -= tf
        b += 1
      }
      i = j
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (sums(b) > 0L) out |= (1L << b)
      b += 1
    }
    out
  }

  /** → [n_distinct_grams, sig_0 .. sig_{perms-1}]; a doc with fewer
    * than k tokens yields [0, MaxValue...] (same convention as
    * [[minhashSig]]). One pass, exact long arithmetic throughout. */
  def minhashPortable(text: UTF8String, k: Int, perms: Int): Array[Long] = {
    val parts = text.toLowerCase.split(Space, -1)
    val toks = new Array[Array[Int]](parts.length)
    var nt = 0
    var pi = 0
    while (pi < parts.length) {
      if (parts(pi).numBytes > 0) { toks(nt) = codePoints(parts(pi)); nt += 1 }
      pi += 1
    }
    val out = new Array[Long](perms + 1)
    java.util.Arrays.fill(out, Long.MaxValue)
    out(0) = 0L
    val n = nt - k + 1
    if (n <= 0) return out
    val as = Array.tabulate(perms)(portableA)
    val bs = Array.tabulate(perms)(portableB)
    val gs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0L
      var j = 0
      while (j < k) {
        if (j > 0) h = (h * 31 + 32) % PortableP // the joining space
        val t = toks(i + j)
        var m = 0
        while (m < t.length) {
          h = (h * 31 + t(m)) % PortableP
          m += 1
        }
        j += 1
      }
      gs(i) = h
      var s = 0
      while (s < perms) {
        val v = (h * as(s) + bs(s)) % PortableP
        if (v < out(s + 1)) out(s + 1) = v
        s += 1
      }
      i += 1
    }
    java.util.Arrays.sort(gs)
    var d = 1
    var qi = 1
    while (qi < n) { if (gs(qi) != gs(qi - 1)) d += 1; qi += 1 }
    out(0) = d.toLong
    out
  }
}

/** `gram_hashes(text, k)` → sorted distinct 64-bit k-gram hashes. */
case class GramHashes(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, k>=1), got ${child.dataType.simpleString}, k=$k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = GramHashes.name

  def kernel(t: UTF8String): ArrayData =
    new GenericArrayData(GramSketch.gramHashesSortedDistinct(t, k))

  override def nullSafeEval(t: Any): Any = kernel(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("gramHashes", this)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $obj.kernel($t);")
  }
  override protected def withNewChildInternal(c: Expression): GramHashes =
    copy(child = c)
}

object GramHashes {
  val name = "gram_hashes"
  val info = new ExpressionInfo(classOf[GramHashes].getName, name)
  val builder: Seq[Expression] => Expression = {
    case Seq(t, Literal(k: Int, IntegerType)) => GramHashes(t, k)
    case other => throw new IllegalArgumentException(
      s"$name expects (text, k literal int), got ${other.size} args")
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
  def apply(spark: SparkSession, text: Column, k: Int): Column = {
    register(spark)
    call_function(name, text, org.apache.spark.sql.functions.lit(k))
  }
}

/** `minhash_sig(text, k, perms)` → MinHash signature (array<bigint> of
  * length perms) over the document's k-gram set. */
case class MinHashSig(child: Expression, k: Int, perms: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1 && perms >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, k>=1, perms>=1), got " +
        s"${child.dataType.simpleString}, k=$k, perms=$perms")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = MinHashSig.name

  def kernel(t: UTF8String): ArrayData =
    new GenericArrayData(GramSketch.minhashSig(t, k, perms))

  override def nullSafeEval(t: Any): Any = kernel(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("minhashSig", this)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $obj.kernel($t);")
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

object MinHashSig {
  val name = "minhash_sig"
  val info = new ExpressionInfo(classOf[MinHashSig].getName, name)
  val builder: Seq[Expression] => Expression = {
    case Seq(t, Literal(k: Int, IntegerType), Literal(p: Int, IntegerType)) =>
      MinHashSig(t, k, p)
    case other => throw new IllegalArgumentException(
      s"$name expects (text, k literal int, perms literal int), got ${other.size} args")
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
  def apply(spark: SparkSession, text: Column, k: Int, perms: Int): Column = {
    register(spark)
    call_function(name, text, org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(perms))
  }
}

/** `minhash_portable(text, k, perms)` → array<bigint> of length
  * perms+1: [n_distinct_grams, sig_0 .. sig_{perms-1}] under the
  * dialect-portable family (GramSketch.minhashPortable) — the
  * oracle-checkable minhash surface. */
case class MinHashPortable(child: Expression, k: Int, perms: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1 && perms >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, k>=1, perms>=1), got " +
        s"${child.dataType.simpleString}, k=$k, perms=$perms")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = MinHashPortable.name

  def kernel(t: UTF8String): ArrayData =
    new GenericArrayData(GramSketch.minhashPortable(t, k, perms))

  override def nullSafeEval(t: Any): Any = kernel(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("minhashPortable", this)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $obj.kernel($t);")
  }
  override protected def withNewChildInternal(c: Expression): MinHashPortable =
    copy(child = c)
}

object MinHashPortable {
  val name = "minhash_portable"
  val info = new ExpressionInfo(classOf[MinHashPortable].getName, name)
  val builder: Seq[Expression] => Expression = {
    case Seq(t, Literal(k: Int, IntegerType), Literal(p: Int, IntegerType)) =>
      MinHashPortable(t, k, p)
    case other => throw new IllegalArgumentException(
      s"$name expects (text, k literal int, perms literal int), got ${other.size} args")
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
  def apply(spark: SparkSession, text: Column, k: Int, perms: Int): Column = {
    register(spark)
    call_function(name, text, org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(perms))
  }
}
