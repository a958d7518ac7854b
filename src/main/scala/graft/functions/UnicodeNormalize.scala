package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[UnicodeNormalize]] — JVM `java.text.Normalizer`
  * over UTF8String, no Python/UDF boundary.
  */
object NormalizerOps {
  val ValidForms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD", "NFKCCaseFold")

  def norm(s: UTF8String, form: String): UTF8String =
    if (s == null) null
    else {
      val str = s.toString
      val out = form match {
        // closest JVM analog of Python's str.casefold(); full Unicode
        // case folding (e.g. ß→ss) is locale-independent lowercase here
        case "NFKCCaseFold" =>
          Normalizer.normalize(str, Normalizer.Form.NFKC)
            .toLowerCase(java.util.Locale.ROOT)
        case f => Normalizer.normalize(str, Normalizer.Form.valueOf(f))
      }
      UTF8String.fromString(out)
    }
}

/** `normalize(str [, normalForm])` — Unicode normalization as a native
  * Catalyst expression with codegen (the one registry entry Spark lacks
  * a built-in for; reference:
  * packages/pycypher/src/pycypher/scalar_functions/
  * extended_string_functions.py:747-830). normalForm ∈
  * {NFC (default), NFD, NFKC, NFKD, NFKCCaseFold}; the form is a
  * compile-time constant, so the generated code is a direct static call
  * inside whole-stage codegen — no UDF serialization boundary.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(NormalizerOps.ValidForms(form),
    s"normalize: unsupported normalForm '$form' " +
      s"(expected one of ${NormalizerOps.ValidForms.mkString(", ")})")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize expects a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NormalizerOps.norm(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "graft.functions.NormalizerOps$.MODULE$.norm(" + c + ", \"" + form + "\")")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String = "normalize"
}
