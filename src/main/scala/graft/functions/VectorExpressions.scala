package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Primitive float-vector kernels. Public static-style methods so generated
  * code can call them directly (the StaticInvoke pattern): the whole
  * similarity expression stays inside whole-stage codegen with one tight
  * primitive loop per row — no boxed lambdas, no per-element virtual
  * dispatch like the equivalent zip_with/aggregate higher-order chain.
  */
object VecOps {

  /** Single-pass dot + norms → cosine; 0.0 when either norm is 0. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** splitmix64 — deterministic pseudo-random hyperplane components. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Hyperplane component for (dim, plane, table) in [-1, 1). */
  def planeComponent(dim: Int, plane: Int, table: Int): Double =
    mix64(dim.toLong * 1000003L + plane.toLong * 10007L + table.toLong)
      .toDouble / Long.MaxValue.toDouble

  /** Plane-matrix cache: components depend only on (i, plane, table) —
    * fixed at plan time — but the splitmix chain used to be recomputed
    * PER ROW, roughly doubling the per-row cost of the LSH bucketing
    * hot path (dim × nPlanes × nTables mixes next to the same number of
    * multiply-adds that are the actual work). Volatile immutable
    * snapshot keyed by (nPlanes, nTables), rows grown to the largest
    * dim seen; concurrent tasks race only into a redundant recompute of
    * the same deterministic values.
    */
  @volatile private var planeCache: Map[(Int, Int), Array[Array[Double]]] =
    Map.empty

  private def planesFor(nPlanes: Int, nTables: Int,
                        dim: Int): Array[Array[Double]] = {
    if (nPlanes == 0) return Array.empty // exhaustive degenerate
    val key = (nPlanes, nTables)
    planeCache.get(key) match {
      case Some(m) if m(0).length >= dim => m
      case _ =>
        val width = math.max(dim, 64)
        val grown = Array.tabulate(nTables * nPlanes) { tp =>
          val t = tp / nPlanes; val p = tp % nPlanes
          Array.tabulate(width)(i => planeComponent(i, p, t))
        }
        planeCache = planeCache.updated(key, grown)
        grown
    }
  }

  /** All nTables bucket ids for one vector: sign bits of nPlanes
    * hyperplane dot products per table, table id folded into bits 32+.
    * One pass over the vector per (table, plane), against the cached
    * plane matrix.
    */
  def hyperplaneBuckets(v: ArrayData, nPlanes: Int, nTables: Int): ArrayData = {
    val dim = v.numElements()
    val planes = planesFor(nPlanes, nTables, dim)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val row = planes(t * nPlanes + p)
        var d = 0.0
        var i = 0
        while (i < dim) {
          d += v.getFloat(i).toDouble * row(i)
          i += 1
        }
        if (d > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket | (t.toLong << 32)
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** cosine(array<float>, array<float>) → double, codegen'd. */
case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs: array<float>, array<float> (enforced by the vectors.* wrappers)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecCosine =
    copy(left = newLeft, right = newRight)
}

/** dot(array<float>, array<float>) → double, codegen'd. */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs: array<float>, array<float> (enforced by the vectors.* wrappers)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** lsh_buckets(array<float>) → array<long>: the nTables multi-table
  * hyperplane bucket ids (deterministic; see VecOps.planeComponent).
  */
case class HyperplaneBuckets(child: Expression, nPlanes: Int, nTables: Int)
    extends UnaryExpression {
  // plane bits live below bit 32 and the table id above: a 33rd plane
  // would silently flip apparent table ids and merge candidate sets
  // across tables. nPlanes = 0 is the legitimate exhaustive degenerate
  // (every vector lands in table-id-only buckets — lshTopK's
  // brute-force mode).
  require(nPlanes >= 0 && nPlanes <= 32,
    s"nPlanes must be in [0, 32], got $nPlanes")
  require(nTables >= 1, s"nTables must be positive, got $nTables")
  // input: array<float>
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.hyperplaneBuckets(v.asInstanceOf[ArrayData], nPlanes, nTables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.VecOps.hyperplaneBuckets($v, $nPlanes, $nTables)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

/** Column-level API for the vector kernels (graft's `functions._`). */
object vectors {
  private def ex(c: Column) = Bridge.expression(c)
  def vec_cosine(a: Column, b: Column): Column =
    Bridge.column(FloatVecCosine(ex(a), ex(b)))
  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(FloatVecDot(ex(a), ex(b)))
  def lsh_buckets(v: Column, nPlanes: Int, nTables: Int): Column =
    Bridge.column(HyperplaneBuckets(ex(v), nPlanes, nTables))
}
