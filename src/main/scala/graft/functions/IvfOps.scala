package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Runtime kernel for [[NearestCentroids]] — the coarse-quantizer
  * assignment step of every sampled-IVF operator, as one virtual call
  * per row with primitive loops inside (the [[PqKernels]] shape; the
  * reference's vectorized per-row assignment discipline is
  * /root/reference/packages/pycypher/src/pycypher/analytics/
  * graph_index.py:379-561 — compute per row, never expand).
  */
object IvfKernels {

  /** Ordinals (0-based positions into `cents`) of the `n` nearest
    * centroids by (squared L2 ascending, ordinal ascending). Callers
    * order `cents` ascending by centroid id, so ordinal order IS the
    * relational tie rule `orderBy(dist, cid)`. The distance loop
    * accumulates `diff*diff` left-to-right from dimension 0 exactly
    * like the unrolled relational `sqDist`, so results are
    * bit-identical to the window-ranked plan this replaces.
    *
    * A malformed vector — null, wrong length, or containing a null
    * element — matches the relational rule's behavior for a null
    * distance (every centroid ties at null, nulls-first ascending →
    * ties resolve to the lowest centroid ids): the first `n` ordinals.
    * NaN distances order after every real number (Double.compare),
    * matching Spark's double ordering.
    */
  def nearest(vec: ArrayData, cents: Array[Array[Double]], n: Int): ArrayData = {
    val k = cents.length
    val m = math.min(math.max(n, 0), k)
    val out = new Array[Int](m)
    var malformed = vec == null ||
      (k > 0 && vec.numElements() != cents(0).length)
    if (!malformed) {
      var i = 0
      val d = vec.numElements()
      while (i < d && !malformed) {
        if (vec.isNullAt(i)) malformed = true
        i += 1
      }
    }
    if (malformed) {
      var i = 0
      while (i < m) { out(i) = i; i += 1 }
      return new GenericArrayData(out)
    }
    val dist = new Array[Double](k)
    var j = 0
    while (j < k) {
      val c = cents(j)
      var s = 0.0
      var t = 0
      while (t < c.length) {
        val diff = vec.getDouble(t) - c(t)
        s += diff * diff
        t += 1
      }
      dist(j) = s
      j += 1
    }
    // partial selection of the m smallest by (dist, ordinal): m passes
    // over k entries — k is nlist (tens to a few hundred), m is nprobe
    // (1 to ~16), so this is noise next to the distance loop
    val used = new Array[Boolean](k)
    var r = 0
    while (r < m) {
      var best = -1
      var bestD = 0.0
      var j2 = 0
      while (j2 < k) {
        if (!used(j2) &&
            (best < 0 || java.lang.Double.compare(dist(j2), bestD) < 0)) {
          best = j2
          bestD = dist(j2)
        }
        j2 += 1
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** `nearest_centroids(array<double>) -> array<int>` against a
  * plan-constant centroid table — the MAP-SIDE coarse assignment that
  * replaces the `crossJoin(broadcast(cent))` + per-id `row_number`
  * window every sampled-IVF path used to run. The window was the 100 TB
  * liability: the broadcast cross join is map-side, but ranking forces
  * an Exchange of the EXPANDED set — nlist rows per vector, each
  * carrying the full vector payload, i.e. shuffle volume ≈ nlist× the
  * corpus on the semantic-dedup/vector-index path. Here the centroid
  * matrix rides into generated code as a reference object (the
  * [[PqEncode]]/[[BpeApply]] discipline) and assignment stays inside
  * the scan's codegen stage: no join, no window, no shuffle.
  *
  * Returns ORDINALS into the caller's ascending-centroid-id matrix, not
  * ids — mapping ordinal→id is a `get` against a small literal array,
  * which keeps this expression type-agnostic over the caller's id
  * column (long, int, string — [[graft.operators.Similarity]] owns the
  * ordering and the mapping).
  *
  * Never null: a malformed input degrades to the first-n ordinals, the
  * exact behavior of the relational null-distance rule it replaces (see
  * [[IvfKernels.nearest]]).
  */
case class NearestCentroids(child: Expression,
                            centroids: Array[Array[Double]], n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids expects array<double>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    IvfKernels.nearest(
      if (v == null) null else v.asInstanceOf[ArrayData], centroids, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      |${childGen.code}
      |$javaType ${ev.value} = graft.functions.IvfKernels$$.MODULE$$.nearest(
      |  ${childGen.isNull} ? null : ${childGen.value}, $cRef, $n);
      """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)

  // keep the centroid matrix out of plan strings (the BpeApply rule)
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"[${centroids.length} centroids]", n)

  override def prettyName: String = "nearest_centroids"
}
