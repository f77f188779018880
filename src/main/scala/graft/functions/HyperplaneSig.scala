package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** `hyperplane_sig(vec, planes)` → int bitmask: bit i is set iff
  * `dot(vec, planes(i)) > 0` — the random-hyperplane (SimHash-for-
  * vectors) signature kernel behind LSH ANN (Charikar, STOC'02).
  *
  * Why native and not 16× `Vectors.dot` (`aggregate(zip_with(...))`):
  * the HOFs are CodegenFallback — interpreted, one closure call per
  * element — and each of the 16 planes re-traverses the vector with its
  * own zip_with allocation, so a 64-dim embedding costs 16 allocations
  * + 1024 interpreted lambda invocations per row. This kernel runs all
  * planes over one read of the vector in a tight JVM loop (the same
  * cliff and the same fix as [[NearestCells]], which took IVF assignment
  * 34 s → sub-second at sf0.1).
  *
  * Bit-parity with the composed form it replaces: the accumulation is a
  * sequential left fold in double precision with the vector element cast
  * float→double before the multiply — exactly [[Vectors.dot]]'s IEEE
  * operation sequence — so every signature bit is bit-identical to the
  * 16-dot original (DedupSpec asserts this on the fixture).
  */
case class HyperplaneSig(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  // Seq, not Array: case-class equality over an Array is reference
  // equality, which breaks canonicalization / CSE (see NearestCells).
  private val nPlanes = planes.length
  private val dim = if (nPlanes == 0) 0 else planes.head.length
  @transient private lazy val pmat: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _)
        if nPlanes >= 1 && nPlanes <= 32 && planes.forall(_.length == dim) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, 1..32 equal-dim planes), " +
          s"got ${other.simpleString}, planes=$nPlanes")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = HyperplaneSig.name
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
    var sig = 0
    var p = 0
    while (p < nPlanes) {
      val plane = pmat(p)
      var acc = 0.0
      var j = 0
      while (j < dim) {
        acc += x(j) * plane(j)
        j += 1
      }
      if (acc > 0) sig |= (1 << p)
      p += 1
    }
    Integer.valueOf(sig)
  }

  override def nullSafeEval(a: Any): Any = kernel(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("hyperplaneSig", this)
    nullSafeCodeGen(ctx, ev, v => s"""
      Object r = $obj.kernel($v);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Integer) r).intValue(); }""")
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneSig =
    copy(child = c)
}

object HyperplaneSig {
  val name = "hyperplane_sig"
  val info = new ExpressionInfo(classOf[HyperplaneSig].getName, name)

  /** SQL shape: hyperplane_sig(vec, array(array(...), ...)) with the
    * plane matrix a foldable literal — a constant of the plan, like
    * NearestCells' centroid model. */
  val builder: Seq[Expression] => Expression = {
    case Seq(v, p) if p.foldable && p.dataType.isInstanceOf[ArrayType] =>
      val planes = p.eval().asInstanceOf[ArrayData].toObjectArray(
        p.dataType.asInstanceOf[ArrayType].elementType)
        .map(_.asInstanceOf[ArrayData].toDoubleArray().toIndexedSeq)
        .toIndexedSeq
      HyperplaneSig(v, planes)
    case other => throw new IllegalArgumentException(
      s"$name expects (vec, plane matrix literal), got ${other.size} args")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)

  def apply(spark: SparkSession, v: Column, planes: Seq[Seq[Double]])
      : Column = {
    register(spark)
    call_function(name, v, typedlit(planes))
  }
}
