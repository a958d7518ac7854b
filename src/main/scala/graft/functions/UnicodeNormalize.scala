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

  /** Full Unicode case folding exceptions — the places where
    * `Character.toLowerCase` diverges from UCD CaseFolding.txt's C+F
    * mappings (public Unicode Character Database data). Keys are the
    * codepoints REACHED AFTER per-codepoint lowercasing (so uppercase
    * forms chain through their lowercase, e.g. ẞ→ß→"ss"), plus the
    * few that must be caught before lowercasing (İ, handled below).
    * Three families: (1) F multi-char expansions (ß→ss, ŉ, ΐ, the
    * polytonic-Greek iota-subscript block, Latin h/t/w/y+diacritic,
    * Armenian և); (2) C single-char divergences (ς→σ, combining
    * ypogegrammeni→ι); (3) compatibility ligatures (ﬀ…ﬗ) folded by the
    * NFKC pass that always precedes this table. ~100 codepoints total.
    */
  private val FullFold: Map[Int, String] = {
    val m = Map.newBuilder[Int, String]
    def p(cp: Int, out: Int*): Unit = m += cp -> out.map(Character.toChars(_)).flatten.mkString
    p(0x00DF, 0x73, 0x73)               // ß → ss
    p(0x0130, 0x69, 0x0307)             // İ → i + combining dot above
    p(0x0149, 0x02BC, 0x6E)             // ŉ → ʼn
    p(0x01F0, 0x6A, 0x030C)             // ǰ → j + caron
    p(0x0345, 0x03B9)                   // combining ypogegrammeni → ι
    p(0x0390, 0x03B9, 0x0308, 0x0301)   // ΐ → ι + diaeresis + tonos
    p(0x03B0, 0x03C5, 0x0308, 0x0301)   // ΰ → υ + diaeresis + tonos
    p(0x03C2, 0x03C3)                   // final sigma ς → σ
    p(0x0587, 0x0565, 0x0582)           // և → եւ
    p(0x1E96, 0x68, 0x0331); p(0x1E97, 0x74, 0x0308)
    p(0x1E98, 0x77, 0x030A); p(0x1E99, 0x79, 0x030A)
    p(0x1E9A, 0x61, 0x02BE)
    p(0x1E9E, 0x73, 0x73)               // ẞ → ss (also chains via ß)
    p(0x1F50, 0x03C5, 0x0313)
    p(0x1F52, 0x03C5, 0x0313, 0x0300)
    p(0x1F54, 0x03C5, 0x0313, 0x0301)
    p(0x1F56, 0x03C5, 0x0313, 0x0342)
    // polytonic Greek with iota subscript: ᾀ-ᾇ → ἀ-ἇ + ι (and the
    // uppercase ᾈ-ᾏ rows chain through these after lowercasing);
    // likewise the η (1F90) and ω (1FA0) blocks
    (0 until 8).foreach { i =>
      p(0x1F80 + i, 0x1F00 + i, 0x03B9)
      p(0x1F90 + i, 0x1F20 + i, 0x03B9)
      p(0x1FA0 + i, 0x1F60 + i, 0x03B9)
    }
    p(0x1FB2, 0x1F70, 0x03B9); p(0x1FB3, 0x03B1, 0x03B9)
    p(0x1FB4, 0x03AC, 0x03B9); p(0x1FB6, 0x03B1, 0x0342)
    p(0x1FB7, 0x03B1, 0x0342, 0x03B9)
    p(0x1FC2, 0x1F74, 0x03B9); p(0x1FC3, 0x03B7, 0x03B9)
    p(0x1FC4, 0x03AE, 0x03B9); p(0x1FC6, 0x03B7, 0x0342)
    p(0x1FC7, 0x03B7, 0x0342, 0x03B9)
    p(0x1FD2, 0x03B9, 0x0308, 0x0300); p(0x1FD3, 0x03B9, 0x0308, 0x0301)
    p(0x1FD6, 0x03B9, 0x0342); p(0x1FD7, 0x03B9, 0x0308, 0x0342)
    p(0x1FE2, 0x03C5, 0x0308, 0x0300); p(0x1FE3, 0x03C5, 0x0308, 0x0301)
    p(0x1FE4, 0x03C1, 0x0313); p(0x1FE6, 0x03C5, 0x0342)
    p(0x1FE7, 0x03C5, 0x0308, 0x0342)
    p(0x1FF2, 0x1F7C, 0x03B9); p(0x1FF3, 0x03C9, 0x03B9)
    p(0x1FF4, 0x03CE, 0x03B9); p(0x1FF6, 0x03C9, 0x0342)
    p(0x1FF7, 0x03C9, 0x0342, 0x03B9)
    // Latin/Armenian compatibility ligatures (NFKC folds these first;
    // kept for inputs that bypass the NFKC pass)
    p(0xFB00, 0x66, 0x66); p(0xFB01, 0x66, 0x69); p(0xFB02, 0x66, 0x6C)
    p(0xFB03, 0x66, 0x66, 0x69); p(0xFB04, 0x66, 0x66, 0x6C)
    p(0xFB05, 0x73, 0x74); p(0xFB06, 0x73, 0x74)
    p(0xFB13, 0x0574, 0x0576); p(0xFB14, 0x0574, 0x0565)
    p(0xFB15, 0x0574, 0x056B); p(0xFB16, 0x057E, 0x0576)
    p(0xFB17, 0x0574, 0x056D)
    m.result()
  }

  /** Per-codepoint full case fold (UCD C+F). Cherokee is the one script
    * that folds to UPPERCASE: the uppercase block (13A0-13F5) is a
    * fold fixed point and the lowercase letters (AB70-ABBF, 13F8-13FD)
    * fold up — the opposite of `toLowerCase`.
    */
  private def foldInto(sb: java.lang.StringBuilder, cp: Int): Unit =
    FullFold.get(cp) match {
      case Some(s) => sb.append(s)
      case None =>
        if (cp >= 0x13A0 && cp <= 0x13F5) sb.appendCodePoint(cp)
        else if (cp >= 0xAB70 && cp <= 0xABBF) sb.appendCodePoint(cp - 0xAB70 + 0x13A0)
        else if (cp >= 0x13F8 && cp <= 0x13FD) sb.appendCodePoint(cp - 8)
        else {
          val low = Character.toLowerCase(cp)
          FullFold.get(low) match { // uppercase chains through lowercase
            case Some(s) => sb.append(s)
            case None    => sb.appendCodePoint(low)
          }
        }
    }

  /** Python str.casefold() parity: NFKC, then full Unicode case folding
    * per UCD CaseFolding.txt (simple folds via toLowerCase; the ~100
    * full-fold/divergent codepoints via the embedded table).
    */
  private def caseFold(str: String): String = {
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      foldInto(sb, cp)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  def norm(s: UTF8String, form: String): UTF8String =
    if (s == null) null
    else {
      val str = s.toString
      val out = form match {
        case "NFKCCaseFold" =>
          caseFold(Normalizer.normalize(str, Normalizer.Form.NFKC))
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
