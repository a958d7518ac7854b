package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

import graft.functions.BpeApply
import graft.operators.Bpe

/** [[graft.functions.BpeApply]] — the O(1)-plan BPE encode for real
  * (32k-scale) vocabularies — differential-tested against the
  * sequential rank-order replace chain it replaces (the semantics the
  * bpe02 DuckDB oracle replays), plus codegen/plan-shape assertions.
  */
class BpeApplySpec extends SparkSpec {
  import spark.implicits._

  private val S = "\u001F"

  /** Reference: the literal sequential chain — wrap, then one Java
    * `String.replace` (left-to-right, non-overlapping) per merge in
    * rank order — exactly what Bpe.encodeWord's small-vocab Catalyst
    * fold and the DuckDB oracle compute.
    */
  private def chainEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val chars = {
      val s = word.replace(S, "")
      val b = Seq.newBuilder[String]
      var i = 0
      while (i < s.length) {
        val n = Character.charCount(s.codePointAt(i))
        b += s.substring(i, i + n); i += n
      }
      b.result()
    }
    val wrapped = S + chars.mkString(S + S) + S
    val merged = merges.foldLeft(wrapped) { case (w, (a, b)) =>
      w.replace(S + a + S + S + b + S, S + a + b + S)
    }
    merged.substring(1, merged.length - 1).split(S + S, -1).toSeq
  }

  /** A VALID 10k+-merge vocabulary (every merge's operands exist when
    * its rank arrives — the invariant real BPE training guarantees and
    * the chain↔greedy equivalence rests on): 2,500 disjoint families of
    * 5 unique CJK base chars, each contributing a 4-merge build chain
    * c0c1 → c0c1c2 → c0c1c2c3 → c0c1c2c3c4, plus a per-family
    * LOWER-priority competitor (c1,c2) that exercises rank priority on
    * words where both pairs are present.
    */
  private lazy val bigVocab: Seq[(String, String)] = {
    val fams = 2500
    val chains = for {
      f <- 0 until fams
      c = (0 until 5).map(i => new String(Character.toChars(0x4E00 + f * 5 + i)))
      m <- Seq((c(0), c(1)), (c(0) + c(1), c(2)),
        (c(0) + c(1) + c(2), c(3)), (c(0) + c(1) + c(2) + c(3), c(4)))
    } yield m
    val competitors = for {
      f <- 0 until fams
      c = (0 until 5).map(i => new String(Character.toChars(0x4E00 + f * 5 + i)))
    } yield (c(1), c(2))
    chains ++ competitors // 10,000 chain merges, then 2,500 competitors
  }

  private def famChars(f: Int): IndexedSeq[String] =
    (0 until 5).map(i => new String(Character.toChars(0x4E00 + f * 5 + i)))

  test("BpeApply == sequential replace chain on a 12,500-merge vocabulary") {
    val rnd = new scala.util.Random(42)
    val words = (0 until 400).map { _ =>
      val f = rnd.nextInt(20)
      val c = famChars(f)
      val len = 1 + rnd.nextInt(10)
      (0 until len).map { _ =>
        if (rnd.nextBoolean()) c(rnd.nextInt(5))
        else famChars(rnd.nextInt(20))(rnd.nextInt(5))
      }.mkString
    } ++ Seq("", famChars(0).mkString, famChars(1).take(3).mkString,
      famChars(2).drop(1).take(2).mkString) // full build, prefix, competitor pair
    val got = words.toDF("w")
      .select(col("w"), ColumnBridge.column(
        BpeApply(ColumnBridge.expression(col("w")), bigVocab)).as("syms"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      assert(got(w) == chainEncode(w, bigVocab), s"word '$w'")
    }
  }

  test("BpeApply stays inside whole-stage codegen with a flat plan") {
    val df = spark.range(4)
      .select(concat(lit("abc"), col("id").cast("string")).as("w"))
      .select(ColumnBridge.column(
        BpeApply(ColumnBridge.expression(col("w")), bigVocab)).as("syms"))
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark whole-stage-codegen'd operators
    assert(plan.contains("*(1) Project"), plan)
    // the 12,500-merge vocab must NOT appear in the plan as per-merge
    // nodes — the whole executed plan stays a few hundred chars
    assert(plan.length < 2000, s"plan grew with the vocabulary: ${plan.length} chars")
    df.collect() // and the generated code actually compiles + runs
  }

  test("encodeStats routes large vocabularies through BpeApply, same results") {
    // 78 merges (> ChainMaxMerges=64): 13 adjacent-letter pairs, their
    // doublings, and 52 base-char fillers — all operands are base chars
    // or prior outputs, so the vocabulary is valid and the chain
    // reference applies
    val charVocab: Seq[(String, String)] =
      (0 until 13).map { f =>
        (('a' + f * 2).toChar.toString, ('a' + f * 2 + 1).toChar.toString)
      } ++ (0 until 13).map { f =>
        val ab = ('a' + f * 2).toChar.toString + ('a' + f * 2 + 1).toChar.toString
        (ab, ab)
      } ++ (0 until 26).map(i =>
        (('a' + i).toChar.toString, ('a' + (i + 1) % 26).toChar.toString)) ++
        (0 until 26).map(i =>
          (('a' + i).toChar.toString, ('a' + (i + 2) % 26).toChar.toString))
    assert(charVocab.size > Bpe.ChainMaxMerges)
    val merges = charVocab.zipWithIndex.map { case ((a, b), i) =>
      Bpe.Merge(i + 1, a, b, 1L)
    }
    val docs = Seq((1L, "abab cdcd abcdef"), (2L, "zzz aceg xy")).toDF("doc_id", "text")
    val got = Bpe.encodeStats(docs, merges).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bpe_tokens")).toMap
    val expected = Map(
      1L -> Seq("abab", "cdcd", "abcdef"),
      2L -> Seq("zzz", "aceg", "xy")
    ).map { case (id, ws) =>
      id -> ws.map(w => chainEncode(w, charVocab).size.toLong).sum
    }
    assert(got == expected)
  }
}
