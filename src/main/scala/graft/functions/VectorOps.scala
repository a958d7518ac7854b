package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Runtime kernel for [[DotProduct]] — one virtual call per ROW with a
  * primitive accumulation loop inside, so the expression stays fast
  * even when its operator can't join a whole-stage-codegen region.
  */
object VectorKernels {
  /** Left-to-right fold in doubles — bit-identical to the unrolled
    * `element_at(a,1)*element_at(b,1) + ...` chain it replaces (and to
    * a SQL oracle's ordered SUM over positions). A null element
    * nullifies the whole dot, matching `element_at` null propagation;
    * the boxed return (null vs Double) is the price of that contract.
    */
  def dot(a: ArrayData, b: ArrayData): Any = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** `sqrt(Σ v_i²)` as ONE native expression — the L2 norm with the same
  * left-to-right double fold as the unrolled
  * `element_at(v,1)*element_at(v,1) + ...` chain (bit-identical). A
  * null element nullifies the norm, matching element_at propagation.
  *
  * Why it exists: the norm feeds BOTH a zero-norm filter and a
  * per-element divide, and CollapseProject inlines a column-expression
  * norm into every consumer — 64 copies of a 64-term chain blew the
  * normalization projection past codegen limits into interpreted
  * per-row evaluation (measured ~3 s per 2k-vector corpus load; one
  * native eval per consumer is ~130 primitive ops).
  */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"l2norm expects array<double>, got ${t.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getDouble(i)
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double __x = $a.getDouble($i);
         |  $acc += __x * __x;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): VectorNorm =
    copy(child = c)
  override def prettyName: String = "l2norm"
}

/** `array(v_1/d, ..., v_n/d)` as ONE native expression — per-element
  * divide by a scalar, same IEEE division as the unrolled
  * `element_at(v,i) / d` array constructor it replaces (bit-identical).
  * Null elements stay null; a null array or divisor yields null.
  */
case class VectorDivScalar(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vecdiv expects (array<double>, double), got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val d = r.asInstanceOf[Double]
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) out(i) = a.getDouble(i) / d
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDivScalar =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vecdiv"
}

/** Int8 max-abs quantization codes as ONE native expression:
  * `round(v_i * 127 / nullif(max|v|, 0)) :: tinyint` per element, the
  * fused form of [[graft.operators.Similarity.quantize]]'s
  * `__m = greatest(|v_1|..|v_n|)` + n `round(element_at(v,i)*127/__m)`
  * slots. Why fused: `__m` had n consumer slots and CollapseProject
  * inlines the n-term max into every one of them — ~n² expression
  * nodes per row, past codegen limits into interpreted eval (the
  * VectorNorm disease with a smaller exponent). One kernel eval per
  * row replaces both the max and the code array.
  *
  * Bit-identical semantics to the expression forms (spec-gated):
  *  - max|v| skips null elements (greatest/array_max contract); an
  *    all-null or empty array has no max → every code is null;
  *  - a zero max (the zero vector) nullifies like nullif(m, 0.0) —
  *    every code null, array length preserved;
  *  - per element: null stays null, else the double fold
  *    `(v_i * 127.0) / m` rounded HALF_UP at scale 0 exactly as
  *    Spark's `round` on doubles (BigDecimal.valueOf round-trip; NaN
  *    and infinities pass through round unrounded), then narrowed to
  *    byte exactly as `cast(.. as tinyint)` does for the in-range
  *    values this construction guarantees (|code| <= 127).
  */
case class VectorQuantize(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.ByteType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vecquantize expects array<double>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(ByteType, containsNull = true)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    // max |v_i| skipping nulls; NaN ranks greatest (Spark ordering)
    var m = 0.0
    var seen = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = math.abs(a.getDouble(i))
        if (!seen || x > m || x.isNaN) { m = x; seen = true }
      }
      i += 1
    }
    val out = new Array[Any](n)
    if (seen && m != 0.0) {
      i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          val d = a.getDouble(i) * 127.0 / m
          val r =
            if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
            else java.math.BigDecimal.valueOf(d)
              .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
          out(i) = r.toByte
        }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): VectorQuantize =
    copy(child = c)
  override def prettyName: String = "vecquantize"
}

/** `dot(array<double>, array<double>)` as ONE native expression.
  *
  * The unrolled alternative — a 2·d-deep chain of `element_at` and
  * `Add`/`Multiply` nodes — is fine inside whole-stage codegen but
  * catastrophic when the hosting operator is interpreted: each node is
  * a virtual `eval` with boxed doubles, ~130 allocations per pair. The
  * kNN vote pipeline hits exactly that case (its dot is evaluated
  * under an `ObjectHashAggregate`-terminated stage over a broadcast
  * nested-loop join — neither operator joins a codegen region), where
  * this expression measured ~7× faster end-to-end at 4M pairs.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot expects two array<double> arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType
  // a null ELEMENT yields null even for non-null arrays
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot"
}
