package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.model.GraphCatalog

/** Property-based semantic invariants, mirroring the reference's
  * Hypothesis suite (/root/reference/tests/property_based/
  * test_query_properties.py): idempotency, predicate commutativity,
  * query-equivalence across formulations, null propagation, aggregation
  * invariants — over generated graphs.
  */
class PropertySpec extends AnyFunSuite {

  /** Minimal deterministic forAll over ScalaCheck generators (the
    * scalatest-scalacheck bridge isn't in the offline dependency set).
    */
  private def forAll[A](g: Gen[A], trials: Int = 8)(body: A => Unit): Unit =
    (0 until trials).foreach { i =>
      body(g.apply(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(sys.error("gen failure")))
    }
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(for { a <- ga; b <- gb } yield (a, b))(t => body(t._1, t._2))

  private lazy val spark = SparkSpec.session

  private def engineFor(rows: Seq[(Long, String, Long, Double)]): CypherEngine = {
    import spark.implicits._
    val df = rows.toDF("__ID__", "name", "age", "score")
    new CypherEngine(spark, new GraphCatalog().addEntity("P", df))
  }

  private val rowGen: Gen[(Long, String, Long, Double)] = for {
    name <- Gen.alphaStr.map(_.take(8))
    age <- Gen.chooseNum(-5L, 120L)
    score <- Gen.chooseNum(-10.0, 10.0)
  } yield (0L, name, age, score)

  private val tableGen: Gen[Seq[(Long, String, Long, Double)]] =
    Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, rowGen))
      .map(_.zipWithIndex.map { case ((_, n2, a, s), i) => (i.toLong, n2, a, s) })

  private def rowsOf(e: CypherEngine, q: String): Set[String] =
    e.query(q).collect().map(_.mkString("|")).toSet

  test("idempotency: same query, same result") {
    forAll(tableGen) { rows =>
      val e = engineFor(rows)
      val q = "MATCH (p:P) WHERE p.age > 30 RETURN p.name AS n, p.age AS a"
      assert(rowsOf(e, q) == rowsOf(e, q))
    }
  }

  test("AND commutativity") {
    forAll2(tableGen, Gen.chooseNum(0L, 100L)) { (rows, k) =>
      val e = engineFor(rows)
      val ab = rowsOf(e, s"MATCH (p:P) WHERE p.age > $k AND p.score > 0 RETURN p.name AS n")
      val ba = rowsOf(e, s"MATCH (p:P) WHERE p.score > 0 AND p.age > $k RETURN p.name AS n")
      assert(ab == ba)
    }
  }

  test("query equivalence: WHERE conjunction == chained WITH filters") {
    forAll(tableGen) { rows =>
      val e = engineFor(rows)
      val once = rowsOf(e,
        "MATCH (p:P) WHERE p.age > 10 AND p.score > 0 RETURN p.name AS n")
      val chained = rowsOf(e,
        """MATCH (p:P) WITH p WHERE p.age > 10 WITH p WHERE p.score > 0
           RETURN p.name AS n""")
      assert(once == chained)
    }
  }

  test("null propagation: comparison with missing property filters everything") {
    forAll(tableGen) { rows =>
      val e = engineFor(rows)
      assert(e.query("MATCH (p:P) WHERE p.nope > 0 RETURN p.name AS n").count() == 0)
      // ... but IS NULL keeps everything
      assert(e.query("MATCH (p:P) WHERE p.nope IS NULL RETURN p.name AS n").count()
        == rows.size)
    }
  }

  test("aggregation invariants: count == size, sum splits by filter") {
    forAll(tableGen) { rows =>
      val e = engineFor(rows)
      val n = e.query("MATCH (p:P) RETURN count(*) AS n").collect().head.getLong(0)
      assert(n == rows.size)
      def s(q: String): Long =
        e.query(q).collect().head.getLong(0)
      val total = s("MATCH (p:P) RETURN coalesce(sum(p.age), 0) AS s")
      val lo = s("MATCH (p:P) WHERE p.age <= 50 RETURN coalesce(sum(p.age), 0) AS s")
      val hi = s("MATCH (p:P) WHERE p.age > 50 RETURN coalesce(sum(p.age), 0) AS s")
      assert(total == lo + hi)
    }
  }

  test("DISTINCT is idempotent and LIMIT bounds cardinality") {
    forAll2(tableGen, Gen.chooseNum(1, 10)) { (rows, k) =>
      val e = engineFor(rows)
      val d1 = rowsOf(e, "MATCH (p:P) RETURN DISTINCT p.age AS a")
      assert(d1.size <= rows.map(_._3).distinct.size + 0)
      assert(e.query(s"MATCH (p:P) RETURN p.name AS n LIMIT $k").count() <= k)
    }
  }

  test("hash sampling is invariant under repartitioning and row order") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    forAll2(Gen.chooseNum(20, 200), Gen.chooseNum(1, 15)) { (n, sixteenths) =>
      val base = spark.range(0, n.toLong).toDF("doc_id")
      def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
        graft.operators.Sampling.hashSample(df, "doc_id", sixteenths)
          .select("doc_id").collect().map(_.getLong(0)).toSet
      // same membership no matter how the data is laid out — the
      // distributed-correctness property rand() sampling cannot give
      assert(ids(base) == ids(base.repartition(7, col("doc_id"))))
      assert(ids(base) == ids(base.orderBy(col("doc_id").desc)))
    }
  }

  test("UNION is set-commutative") {
    forAll(tableGen) { rows =>
      val e = engineFor(rows)
      val a = rowsOf(e,
        "MATCH (p:P) WHERE p.age > 20 RETURN p.age AS a UNION MATCH (p:P) WHERE p.score > 0 RETURN p.age AS a")
      val b = rowsOf(e,
        "MATCH (p:P) WHERE p.score > 0 RETURN p.age AS a UNION MATCH (p:P) WHERE p.age > 20 RETURN p.age AS a")
      assert(a == b)
    }
  }
}
