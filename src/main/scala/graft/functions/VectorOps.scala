package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.core.Ids

/** Native vector expressions for the similarity operators.
  *
  * Why custom Expressions (builder-guide preference (b)): Catalyst
  * higher-order functions evaluate their lambda once per array element
  * through the interpreted evaluator — a 64-dim cosine via
  * `aggregate(zip_with(...))` costs ~3 orders of magnitude more than a
  * compiled loop, and it sits in the hot path of the brute-force rerank
  * (q42/q43) and the LSH bucketing (q49), the declared scale path for
  * ANN. Both expressions reproduce the HOF formulas with identical
  * floating-point operation order, so results are bit-equal (OpsSpec
  * parity tests) and the DuckDB oracles keep hash-matching at 6dp
  * rounding.
  */
object VectorOps {

  /** cosine(a, b) = dot / (||a|| * ||b||), left-to-right accumulation —
    * the same operation order as the HOF form
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_) / (sqrt(...)*sqrt(...))`.
    * Sole deliberate divergence from the HOF form: a zero-norm operand
    * yields 0.0 instead of NaN (NaN sorts first under desc order and
    * would displace real neighbors in rank windows).
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      CosineSim(org.apache.spark.sql.GraftExpressionBridge.expression(a),
        org.apache.spark.sql.GraftExpressionBridge.expression(b)))

  /** All `tables` LSH bucket ids of v in one pass: element t = the
    * `planes` Rademacher projection sign bits of hash table t packed
    * into a long. Signs are pure in (table, plane, dim-index) via
    * splitmix64 — identical to Ann's per-plane constant-array form.
    */
  def lshBuckets(v: Column, tables: Int, planes: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      LshBuckets(org.apache.spark.sql.GraftExpressionBridge.expression(v),
        tables, planes))

  /** Centroid ids (0-based row indices of `centroids`) ordered by
    * descending cosine(v, centroid), ties to the smaller cid. The
    * centroid matrix rides inside the expression node, so nearest-
    * centroid assignment (element 1) and nprobe selection (slice) are
    * narrow per-row computations with no join.
    */
  def centroidRanks(v: Column, centroids: Array[Array[Double]]): Column =
    centroidRanks(v, InlineCentroids(centroids))

  /** As above with an explicit matrix source — pass
    * [[BroadcastCentroids]] when c is large (the inline matrix is
    * serialized into EVERY task binary; a broadcast ships once per
    * executor over torrent and the task closure carries only the
    * handle). [[graft.similarity.Ann]] picks automatically by c.
    */
  def centroidRanks(v: Column, centroids: CentroidSource): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      CentroidRanks(org.apache.spark.sql.GraftExpressionBridge.expression(v),
        centroids))
}

/** Where [[CentroidRanks]] gets its matrix: inline in the expression
  * tree (small c) or via a Spark broadcast handle (large c). Both yield
  * bit-identical results (AnnSpec c=1024 parity) — the choice only
  * moves serialization cost: inline pays c x dim x 8 bytes per TASK
  * binary; broadcast pays it once per executor.
  */
sealed trait CentroidSource extends Serializable {
  def matrix: Array[Array[Double]]
}
final case class InlineCentroids(m: Array[Array[Double]]) extends CentroidSource {
  override def matrix: Array[Array[Double]] = m
}
final case class BroadcastCentroids(
    bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]])
    extends CentroidSource {
  override def matrix: Array[Array[Double]] = bc.value
}

/** See [[VectorOps.centroidRanks]]. The cosine uses the same operation
  * order as [[CosineSim]]. The matrix is resolved from the
  * [[CentroidSource]] once per (deserialized) expression instance —
  * for [[BroadcastCentroids]] that is one `bc.value` per task, never
  * per row — and centroid norms are precomputed at the same point.
  */
case class CentroidRanks(child: Expression, centroids: CentroidSource)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "centroid_ranks"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"centroid_ranks expects array<double>, got $other")
    }

  @transient private lazy val mat: Array[Array[Double]] = centroids.matrix

  @transient private lazy val cNorms: Array[Double] =
    mat.map { cv =>
      var s = 0.0; var i = 0
      while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
      math.sqrt(s)
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val va = new Array[Double](dim)
    var i = 0
    while (i < dim) { va(i) = v.getDouble(i); i += 1 }
    var vn = 0.0
    i = 0
    while (i < dim) { vn += va(i) * va(i); i += 1 }
    vn = math.sqrt(vn)
    val cos = new Array[Double](mat.length)
    var c = 0
    while (c < mat.length) {
      val cv = mat(c)
      val n = math.min(dim, cv.length)
      var dot = 0.0
      i = 0
      while (i < n) { dot += va(i) * cv(i); i += 1 }
      // zero-norm guard (see CosineSim): 0.0 instead of NaN so a
      // degenerate vector/centroid ranks last, not first
      cos(c) = if (vn == 0.0 || cNorms(c) == 0.0) 0.0 else dot / (vn * cNorms(c))
      c += 1
    }
    // ranked cids: cos desc, cid asc (stable sortBy on ascending key)
    val ranked = cos.indices.sortBy(c => (-cos(c), c)).map(Integer.valueOf)
    new GenericArrayData(ranked.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidRanks =
    copy(child = newChild)
}

case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim expects (array<double>, array<double>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    var na = 0.0
    i = 0
    while (i < x.numElements()) { val v = x.getDouble(i); na += v * v; i += 1 }
    var nb = 0.0
    i = 0
    while (i < y.numElements()) { val v = y.getDouble(i); nb += v * v; i += 1 }
    // zero-norm guard: NaN sorts FIRST under desc in Spark, so an
    // unguarded 0/0 would displace real neighbors in top-k windows
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

case class LshBuckets(child: Expression, tables: Int, planes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_buckets expects array<double>, got $other")
    }

  // per-(table, plane) seed; sign(t, p, d) = mix64(seed ^ d) bit 0
  @transient private lazy val seeds: Array[Array[Long]] =
    Array.tabulate(tables, planes)((t, p) => Ids.mix64(t * 131L + p))

  // sign table cached on first eval once dim is known: the signs are
  // constants pure in (t, p, d) — rederiving them per row cost
  // tables x planes x dim mix64 calls per vector. Benign race: any
  // thread rebuilds the identical table. Flattened (t, p) x d layout.
  @transient @volatile private var signCache: Array[Array[Double]] = _

  private def signs(dim: Int): Array[Array[Double]] = {
    val cur = signCache
    if (cur != null && cur(0).length == dim) return cur
    val tbl = new Array[Array[Double]](tables * planes)
    var t = 0
    while (t < tables) {
      var p = 0
      while (p < planes) {
        val seed = seeds(t)(p)
        val row = new Array[Double](dim)
        var d = 0
        while (d < dim) {
          row(d) = if ((Ids.mix64(seed ^ d) & 1L) == 0L) 1.0 else -1.0
          d += 1
        }
        tbl(t * planes + p) = row
        p += 1
      }
      t += 1
    }
    signCache = tbl
    tbl
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val sg = signs(dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val row = sg(t * planes + p)
        var proj = 0.0
        var d = 0
        while (d < dim) {
          proj += v.getDouble(d) * row(d)
          d += 1
        }
        if (proj > 0) bucket += 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}
