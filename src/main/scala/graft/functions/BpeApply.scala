package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[BpeApply]]: the learned merge vocabulary as ONE
  * rank-lookup hash table, applied per word with the standard greedy
  * min-rank loop (Sennrich et al. 2016's apply-BPE). Constructed once
  * per plan and shipped as a codegen reference object, so plan size,
  * analysis cost, and generated-code size are all O(1) in the
  * vocabulary — a 32k-merge vocab costs exactly the same plan as a
  * 30-merge one (the per-merge nested-`replace` chain this replaces
  * grew the expression tree per merge and fell out of codegen past
  * Janino's 64KB method limit).
  *
  * Equivalence with the rank-order replace chain (Bpe.encodeWord's
  * literal fold, which the bpe02 oracle replays): a merge's pair
  * (a, b) can never REAPPEAR once its pass completed — every merge
  * output is a strictly newer symbol, and new adjacencies always
  * involve that newer symbol — so "apply merges rank-by-rank, one
  * left-to-right non-overlapping pass each" and "repeatedly merge the
  * lowest-ranked pair present" produce identical symbol sequences.
  * BpeApplySpec differential-tests this against the sequential chain
  * on randomized words over a ≥10k-merge vocabulary.
  */
final class BpeMergeTable(pairs: Array[String]) extends Serializable {
  // key = left + '\u0000' + right (NUL never occurs inside a symbol:
  // symbols come from whitespace tokenization of text)
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pairs.length * 2)
    var i = 0
    while (i < pairs.length) { m.putIfAbsent(pairs(i), Integer.valueOf(i)); i += 1 }
    m
  }

  def size: Int = pairs.length

  def rankOf(a: String, b: String): Integer = ranks.get(a + "\u0000" + b)
}

object BpeOps {

  /** Symbols of `word` after applying the merge table: strip the
    * `\u001F` framing char, split into code points, greedily merge the
    * lowest-ranked adjacent pair (all occurrences, left-to-right,
    * non-overlapping) until no pair is in the vocabulary. The empty
    * word yields [""] — the same single empty symbol the wrapped-string
    * form produces (Bpe.symbolsOf of an empty frame).
    */
  def encode(word: UTF8String, table: BpeMergeTable): ArrayData = {
    val str = word.toString.replace("\u001F", "")
    if (str.isEmpty) return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    var syms = new java.util.ArrayList[String](str.length)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(str.substring(i, i + n))
      i += n
    }
    var done = syms.size < 2 || table.size == 0
    while (!done) {
      // find the lowest-ranked adjacent pair present
      var best = Int.MaxValue
      var bi = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = table.rankOf(syms.get(j), syms.get(j + 1))
        if (r != null && r.intValue() < best) { best = r.intValue(); bi = j }
        j += 1
      }
      if (bi < 0) done = true
      else {
        // one left-to-right non-overlapping pass merging that exact pair
        val a = syms.get(bi)
        val b = syms.get(bi + 1)
        val out = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == a && syms.get(k + 1) == b) {
            out.add(a + b); k += 2
          } else { out.add(syms.get(k)); k += 1 }
        }
        syms = out
        if (syms.size < 2) done = true
      }
    }
    val arr = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) { arr(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    new GenericArrayData(arr)
  }
}

/** `BpeApply(word, merges)` — BPE-encode one whitespace token under a
  * learned merge vocabulary, as a native codegen'd expression. The
  * vocabulary rides as a single reference object (task-broadcast with
  * the serialized plan), NOT as per-merge expression nodes, so this is
  * the production encode path for real (32k+) vocabularies;
  * Bpe.encodeWord routes to it above a small-vocab threshold.
  */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val table: BpeMergeTable =
    new BpeMergeTable(merges.map { case (a, b) => a + "\u0000" + b }.toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_apply expects a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    BpeOps.encode(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table, classOf[BpeMergeTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeOps$$.MODULE$$.encode($c, $tableRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)

  // keep the vocabulary out of plan strings — a 32k-merge table would
  // otherwise dominate every explain/treeString
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"[${merges.size} merges]")

  override def prettyName: String = "bpe_apply"
}
