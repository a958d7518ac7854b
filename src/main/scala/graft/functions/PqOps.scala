package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Runtime kernels for the product-quantization expressions — one
  * virtual call per row with primitive loops inside (the
  * [[VectorKernels]] rationale: fast even when the hosting operator
  * can't join a whole-stage-codegen region).
  */
object PqKernels {
  /** Encode a d-dim vector into `m` sub-codes: for each subspace, the
    * index of the nearest sub-centroid by squared L2, first-wins on
    * ties (codebook rows are in ascending centroid-id order, so this
    * is the oracle's `(distance, cid)` tie rule). Returns null for
    * vectors of the wrong length or with null elements.
    */
  def encode(vec: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
    val m = cb.length
    val sd = if (m == 0) 0 else cb(0)(0).length
    if (vec.numElements() != m * sd) return null
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val cents = cb(mi)
      val off = mi * sd
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cents.length) {
        val c = cents(j)
        var d = 0.0
        var t = 0
        while (t < sd) {
          if (vec.isNullAt(off + t)) return null
          val diff = vec.getDouble(off + t) - c(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  /** Asymmetric-distance lookup: sum over subspaces of the query's
    * precomputed distance to the centroid each code names.
    */
  def adc(codes: ArrayData, lut: Array[Array[Double]]): Any = {
    if (codes.numElements() != lut.length) return null
    var s = 0.0
    var mi = 0
    while (mi < lut.length) {
      if (codes.isNullAt(mi)) return null
      s += lut(mi)(codes.getInt(mi))
      mi += 1
    }
    s
  }
}

/** `pq_encode(array<double>) -> array<int>` against a plan-constant
  * codebook `[subspace][centroid][subdim]` — the map-only encode step
  * of product quantization (Jégou et al., "Product quantization for
  * nearest neighbor search", TPAMI 2011). The codebook rides into
  * generated code as a reference object, so encoding stays inside the
  * scan's codegen stage: no join, no shuffle, no per-element HOF
  * dispatch.
  */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.PqKernels.encode($c, $cb);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

/** `pq_adc(array<int>) -> double` against a plan-constant lookup table
  * `[subspace][centroid]` of the query's per-subspace squared
  * distances — the asymmetric distance computation of PQ search. A
  * pure table-lookup sum: scoring cost is independent of the vector
  * dimensionality, which is the whole point of PQ at corpus scale.
  */
case class PqAdc(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression {

  // containsNull is accepted either way: a parquet round-trip widens
  // the writer's containsNull=false to true; the kernel null-checks
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects array<int> codes, got ${t.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(codes: Any): Any =
    PqKernels.adc(codes.asInstanceOf[ArrayData], lut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("pqLut", lut, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("adcRes")
      s"""
         |Object $r = graft.functions.PqKernels.adc($c, $l);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)

  override def prettyName: String = "pq_adc"
}
