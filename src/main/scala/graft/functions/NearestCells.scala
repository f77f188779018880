package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** `nearest_cells(vec, centroids, n)` → the indices of the `n` nearest
  * centroids to a float-vector, ascending by (squared L2 distance,
  * index) — the IVF coarse-quantizer assignment kernel.
  *
  * Why native and not the composed form (an array of per-centroid
  * `aggregate` folds + `array_min`/`array_sort` over structs): the
  * higher-order functions are CodegenFallback, and optimizer inlining
  * under a Generate re-evaluates the whole K-fold pipeline per exploded
  * element — the same cliff GramSketch documents (measured here:
  * q_sim_ivf_topk 34 s → sub-second at sf0.1). The kernel runs all K
  * distances in one tight JVM loop per row and returns the already-
  * selected top-n, so the worst case any re-evaluation can cause is one
  * extra linear pass.
  *
  * Ties are impossible to order wrongly: selection compares (d, idx)
  * strictly, so equal distances fall to the lower index —
  * deterministic under any partitioning.
  */
case class NearestCells(child: Expression, centroids: Seq[Seq[Double]],
    n: Int) extends UnaryExpression {

  // Seq, not Array, in the constructor: case-class equality over an
  // Array is reference equality, which breaks semanticEquals /
  // canonicalization / CSE for structurally identical expressions. The
  // kernel loops over a private array conversion instead.
  private val k = centroids.length
  private val dim = if (k == 0) 0 else centroids.head.length
  @transient private lazy val cmat: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _)
        if k > 0 && n >= 1 && n <= k && centroids.forall(_.length == dim) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, K>=n>=1 equal-dim centroids)" +
          s", got ${other.simpleString}, k=$k, n=$n")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = NearestCells.name
  // Dimension mismatch / null element → NULL for a non-null input, so
  // nullability must not derive from the child (see CosineSimilarity).
  override def nullable: Boolean = true

  def kernel(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      x(i) = v.getFloat(i).toDouble
      i += 1
    }
    val d = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cmat(c)
      var acc = 0.0
      var j = 0
      while (j < dim) {
        val diff = x(j) - cent(j)
        acc += diff * diff
        j += 1
      }
      d(c) = acc
      c += 1
    }
    // partial selection sort for the n smallest (n<=k, both tiny)
    val idx = Array.tabulate(k)(identity)
    val out = new Array[Int](n)
    var s = 0
    while (s < n) {
      var best = s
      var t = s + 1
      while (t < k) {
        val a1 = idx(t); val b1 = idx(best)
        if (d(a1) < d(b1) || (d(a1) == d(b1) && a1 < b1)) best = t
        t += 1
      }
      val tmp = idx(s); idx(s) = idx(best); idx(best) = tmp
      out(s) = idx(s)
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = kernel(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("nearestCells", this)
    nullSafeCodeGen(ctx, ev, v => s"""
      Object r = $obj.kernel($v);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }""")
  }

  override protected def withNewChildInternal(c: Expression): NearestCells =
    copy(child = c)
}

object NearestCells {
  val name = "nearest_cells"
  val info = new ExpressionInfo(classOf[NearestCells].getName, name)

  /** SQL shape: nearest_cells(vec, array(array(...), ...), n) with the
    * centroid matrix and n as foldable literals (the builder bakes the
    * MODEL into the expression — it is a constant of the plan, exactly
    * like a broadcast k-means model). */
  val builder: Seq[Expression] => Expression = {
    case Seq(v, c, Literal(n: Int, IntegerType)) if c.foldable &&
        c.dataType.isInstanceOf[ArrayType] =>
      val cents = c.eval().asInstanceOf[ArrayData].toObjectArray(
        c.dataType.asInstanceOf[ArrayType].elementType)
        .map(_.asInstanceOf[ArrayData].toDoubleArray().toIndexedSeq)
        .toIndexedSeq
      NearestCells(v, cents, n)
    case other => throw new IllegalArgumentException(
      s"$name expects (vec, centroid matrix literal, n literal int), " +
        s"got ${other.size} args")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)

  def apply(spark: SparkSession, v: Column, cents: Seq[Seq[Double]], n: Int)
      : Column = {
    register(spark)
    call_function(name, v, typedlit(cents),
      org.apache.spark.sql.functions.lit(n))
  }
}
