package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** `nearest_cell_2l(vec, coarse, fine, groups, nprobe)` → the index of
  * the (approximately) nearest FINE centroid, found coarse-then-fine:
  * scan the K₁ coarse centroids, take the `nprobe` nearest, then scan
  * only the fine centroids assigned to those coarse cells (`groups`,
  * the inverted index coarse→fine built at fit time). Per-row cost is
  * O((K₁ + nprobe·K/K₁)·dim) instead of the flat scan's O(K·dim) — the
  * standard IVF two-level quantizer (Jégou et al., PAMI'11 §IV), and
  * the assignment path `q_dedup_semantic` needs once its K grows with
  * the corpus: at K = 4096 the flat scan is 40× this kernel's work.
  *
  * Approximate by construction: the true nearest fine centroid can sit
  * in an unprobed coarse cell. For cell ASSIGNMENT (SemDeDup's use) any
  * consistent quantizer is valid — the within-cell dedup semantics are
  * defined over whatever cells come out — and determinism holds: both
  * levels break distance ties on the lower index, so every run yields
  * the same cell for the same vector.
  *
  * Same native-kernel rationale as NearestCells (the composed HOF form
  * hits the Generate-inlining re-evaluation cliff).
  */
case class NearestCellTwoLevel(child: Expression,
    coarse: Seq[Seq[Double]], fine: Seq[Seq[Double]],
    groups: Seq[Seq[Int]], nprobe: Int) extends UnaryExpression {

  private val k1 = coarse.length
  private val dim = if (k1 == 0) 0 else coarse.head.length
  @transient private lazy val cmat: Array[Array[Double]] =
    coarse.map(_.toArray).toArray
  @transient private lazy val fmat: Array[Array[Double]] =
    fine.map(_.toArray).toArray
  @transient private lazy val gidx: Array[Array[Int]] =
    groups.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _)
        if k1 > 0 && fine.nonEmpty && groups.length == k1
          && nprobe >= 1 && nprobe <= k1
          && coarse.forall(_.length == dim) && fine.forall(_.length == dim)
          && groups.flatten.forall(i => i >= 0 && i < fine.length)
          && groups.flatten.distinct.length == fine.length =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, coarse, fine, a partition " +
          s"of fine indices into |coarse| groups, 1<=nprobe<=|coarse|), " +
          s"got ${other.simpleString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = NearestCellTwoLevel.name
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
    // level 1: nprobe nearest coarse cells (partial selection sort,
    // (distance, index) compare — same tie rule as NearestCells)
    val d1 = new Array[Double](k1)
    var c = 0
    while (c < k1) {
      val cent = cmat(c)
      var acc = 0.0
      var j = 0
      while (j < dim) { val t = x(j) - cent(j); acc += t * t; j += 1 }
      d1(c) = acc
      c += 1
    }
    val idx = Array.tabulate(k1)(identity)
    var s = 0
    while (s < nprobe) {
      var best = s
      var t = s + 1
      while (t < k1) {
        val a1 = idx(t); val b1 = idx(best)
        if (d1(a1) < d1(b1) || (d1(a1) == d1(b1) && a1 < b1)) best = t
        t += 1
      }
      val tmp = idx(s); idx(s) = idx(best); idx(best) = tmp
      s += 1
    }
    // level 2: best fine centroid among the probed cells' members
    var bestFine = -1
    var bestD = Double.MaxValue
    var p = 0
    while (p < nprobe) {
      val members = gidx(idx(p))
      var m = 0
      while (m < members.length) {
        val fi = members(m)
        val cent = fmat(fi)
        var acc = 0.0
        var j = 0
        while (j < dim && acc < bestD) {
          val t = x(j) - cent(j); acc += t * t; j += 1
        }
        if (j == dim && (acc < bestD || (acc == bestD && fi < bestFine))) {
          bestD = acc; bestFine = fi
        }
        m += 1
      }
      p += 1
    }
    // groups partition the fine set and nprobe>=1, so bestFine >= 0
    // unless every probed group is empty — fall back to a flat scan of
    // group 0's... impossible: a partition of a nonempty fine set has
    // at least one nonempty group, but it may be unprobed. Guard:
    if (bestFine < 0) {
      var fi = 0
      while (fi < fmat.length) {
        val cent = fmat(fi)
        var acc = 0.0
        var j = 0
        while (j < dim) { val t = x(j) - cent(j); acc += t * t; j += 1 }
        if (acc < bestD) { bestD = acc; bestFine = fi }
        fi += 1
      }
    }
    bestFine
  }

  override def nullSafeEval(a: Any): Any = kernel(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("nearest2l", this)
    nullSafeCodeGen(ctx, ev, v => s"""
      Object r = $obj.kernel($v);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Integer) r).intValue(); }""")
  }

  override protected def withNewChildInternal(c: Expression): NearestCellTwoLevel =
    copy(child = c)
}

object NearestCellTwoLevel {
  val name = "nearest_cell_2l"
  val info = new ExpressionInfo(classOf[NearestCellTwoLevel].getName, name)

  val builder: Seq[Expression] => Expression = {
    case Seq(v, c, f, g, Literal(np: Int, IntegerType))
        if c.foldable && f.foldable && g.foldable =>
      def mat(e: Expression): IndexedSeq[IndexedSeq[Double]] =
        e.eval().asInstanceOf[ArrayData].toObjectArray(
          e.dataType.asInstanceOf[ArrayType].elementType)
          .map(_.asInstanceOf[ArrayData].toDoubleArray().toIndexedSeq)
          .toIndexedSeq
      val gs = g.eval().asInstanceOf[ArrayData].toObjectArray(
        g.dataType.asInstanceOf[ArrayType].elementType)
        .map(_.asInstanceOf[ArrayData].toIntArray().toIndexedSeq)
        .toIndexedSeq
      NearestCellTwoLevel(v, mat(c), mat(f), gs, np)
    case other => throw new IllegalArgumentException(
      s"$name expects (vec, coarse literal, fine literal, groups " +
        s"literal, nprobe literal int), got ${other.size} args")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)

  def apply(spark: SparkSession, v: Column, coarse: Seq[Seq[Double]],
      fine: Seq[Seq[Double]], groups: Seq[Seq[Int]], nprobe: Int): Column = {
    register(spark)
    call_function(name, v, typedlit(coarse), typedlit(fine),
      typedlit(groups), org.apache.spark.sql.functions.lit(nprobe))
  }
}
