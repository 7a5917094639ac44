package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.ml.{FamObs, FamilyCountAggregator}

/** Property-based invariants (SURVEY.md §5.2): L1-normalization,
  * aggregator semantics under arbitrary groupings, cosine bounds,
  * dedup idempotence. Uses raw scalacheck generators with explicit
  * seeds (the scalatest-scalacheck bridge isn't in the offline cache),
  * so every run draws the same cases. */
class PropertySpec extends AnyFunSuite with SparkTestBase {

  private def forAllSeeded[T](g: Gen[T], n: Int)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  val vocab = Seq("f1", "f2", "f3", "f4", "f5")

  test("FamilyCountAggregator: output L1-normalizes unless all-unknown/zero") {
    import spark.implicits._
    val obsGen = Gen.listOfN(30, for {
      fam <- Gen.oneOf(vocab ++ Seq("unknownA", "unknownB"))
      tot <- Gen.choose(0.0, 9.0)
    } yield FamObs(fam, tot))
    forAllSeeded(obsGen, 10) { obs =>
      val out = obs.toDS()
        .groupByKey(_ => 0)
        .agg(new FamilyCountAggregator(vocab).toColumn.name("v"))
        .head()._2
      val s = out.sum
      assert(out.length === vocab.size)
      assert(s == 0.0 || math.abs(s - 1.0) < 1e-9)
      assert(out.forall(_ >= 0.0))
    }
  }

  test("cosine_sim is bounded in [-1, 1] and symmetric") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val vecGen = Gen.listOfN(16, Gen.choose(-5.0, 5.0))
    val pairGen = for { a <- vecGen; b <- vecGen } yield (a, b)
    forAllSeeded(pairGen, 20) { case (a, b) =>
      val row = Seq((a, b)).toDF("a", "b").select(
        VectorFunctions.cosineSim(col("a"), col("b")).as("ab"),
        VectorFunctions.cosineSim(col("b"), col("a")).as("ba")).head()
      val (ab, ba) = (row.getDouble(0), row.getDouble(1))
      assert(ab >= -1.0 - 1e-12 && ab <= 1.0 + 1e-12)
      assert(ab === ba)
    }
  }

  test("exact dedup is idempotent: dedup(dedup(X)) == dedup(X)") {
    import spark.implicits._
    val docsGen = Gen.listOfN(40, Gen.oneOf(
      "alpha beta", "alpha beta", "gamma", "delta epsilon", "gamma"))
    forAllSeeded(docsGen, 10) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = df.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep"))
      val twice = once.groupBy(col("h")).agg(min(col("keep")).as("keep"))
      assert(once.count() === twice.count())
      assert(once.collect().map(_.toString).sorted
        .sameElements(twice.collect().map(_.toString).sorted))
    }
  }

  test("simhash48 signatures are invariant to partitioning (1 vs 32)") {
    import spark.implicits._
    // same docs, radically different physical layouts: the aggregate's
    // partial-merge (vector addition of vote buffers) must commute, and
    // the per-task MessageDigest must never cross-contaminate under 32
    // concurrent tasks
    val docGen = Gen.listOfN(60, for {
      id <- Gen.choose(0L, 11L)
      tok <- Gen.oneOf("alpha", "beta", "gamma", "δelta", "ε", "zw1", "")
    } yield (id, tok))
    forAllSeeded(docGen, 8) { rows =>
      val df = rows.toDF("doc_id", "tok")
      def sigs(parts: Int): Map[Long, Long] =
        df.repartition(parts).groupBy(col("doc_id"))
          .agg(graft.functions.SimHash48Agg.simhash48(col("tok")).as("sig"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val one = sigs(1)
      val many = sigs(32)
      assert(one === many)
      // 48-bit contract: no signature ever sets bits 48..63
      assert(one.values.forall(s => (s >>> 48) == 0L))
    }
  }

  test("salted join row count is invariant to salt fan-out") {
    import spark.implicits._
    val n = 200
    val fact = (0 until n).map(i => (i.toLong % 7, i.toLong)).toDF("k", "fid")
    val dim = (0L until 7L).map(k => (k, s"dim$k")).toDF("k", "name")
    for (salts <- Seq(1, 4, 16)) {
      val j = graft.operators.SaltedJoin.saltedJoin(fact, dim, "k",
        Seq("fid"), nSalts = salts)
      assert(j.count() === n.toLong, s"salts=$salts")
    }
  }
}
