package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Contracts for the sampling/curation family (SamplingOps + d38).
  * The oracle gate proves cross-engine equality; these pin the
  * SEMANTICS the equality is supposed to mean. */
class SamplingSpec extends AnyFunSuite with SparkTestBase {

  test("q70: exactly min(20, |stratum|) docs per source, ranks contiguous from 1") {
    import spark.implicits._
    val out = SparkEntry.queries("q70_stratified_sample")(spark, sf0001)
      .groupBy($"source")
      .agg(count(lit(1)).as("n"), min($"rnk").as("lo"), max($"rnk").as("hi"))
      .collect()
    val sizes = spark.read.parquet(s"$sf0001/documents.parquet")
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (src, n) = (r.getString(0), r.getLong(1))
      assert(n == math.min(20L, sizes(src)), s"$src quota")
      assert(r.getInt(2) == 1 && r.getInt(3) == n, s"$src ranks not 1..$n")
    }
  }

  test("q70: sample is deterministic — a pure function of doc_id, not partitioning") {
    val a = SparkEntry.queries("q70_stratified_sample")(spark, sf0001)
      .collect().map(_.toString).sorted
    val b = SparkEntry.queries("q70_stratified_sample")(spark, sf0001)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("q71: under-quota sources keep everything; over-quota sources are downsampled") {
    import spark.implicits._
    val rows = SparkEntry.queries("q71_mixture_weights")(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nSrc, quota, nKept, _) =>
      assert(nKept <= nSrc, s"$src kept more than it has")
      if (nSrc <= quota) assert(nKept == nSrc,
        s"$src is under quota ($nSrc <= $quota) and must keep all")
    }
    // the per-source targets actually bite in both directions on this
    // corpus: some sources are under quota (keep all, asserted above)
    // and at least one over-quota source sheds rows
    assert(rows.exists { case (_, nSrc, quota, _, _) => quota >= nSrc },
      "no source under quota — the keep-all leg is untested")
    assert(rows.exists { case (_, nSrc, _, nKept, _) => nKept < nSrc },
      "no source was downsampled — reweighting did nothing")
  }

  test("q92: exactly min(10, |stratum|) docs per source, ranks contiguous from 1") {
    import spark.implicits._
    val out = SparkEntry.queries("q92_weighted_sample")(spark, sf0001)
      .groupBy($"source")
      .agg(count(lit(1)).as("n"), min($"rnk").as("lo"), max($"rnk").as("hi"))
      .collect()
    val sizes = spark.read.parquet(s"$sf0001/documents.parquet")
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(out.nonEmpty && out.length == sizes.size)
    out.foreach { r =>
      val (src, n) = (r.getString(0), r.getLong(1))
      assert(n == math.min(10L, sizes(src)), s"$src reservoir size")
      assert(r.getInt(2) == 1 && r.getInt(3) == n, s"$src ranks not 1..$n")
    }
  }

  test("q92: sampling is weight-biased — sampled docs are longer than the corpus average") {
    import spark.implicits._
    // A-ES with w = n_chars gives inclusion probability proportional to
    // doc length, so the sample's mean length must sit clearly above
    // the corpus mean (deterministic on the fixed corpus — this is the
    // statistical contract the cross-engine hash can't express). The
    // size of the lift is bounded by the weight distribution itself:
    // for proportional-to-weight draws E[w_sampled]/E[w] = 1 + CV²(w),
    // ≈ 1.14 on this corpus's n_chars — so assert a 5% floor, well
    // inside the theoretical lift but far outside unweighted noise.
    val sampled = SparkEntry.queries("q92_weighted_sample")(spark, sf0001)
      .agg(avg($"w")).as[Double].head()
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      .agg(avg(greatest($"n_chars", lit(1L)))).as[Double].head()
    assert(sampled > 1.05 * corpus,
      s"sample mean w $sampled not above corpus mean $corpus — not weight-biased")
  }

  test("q93: every source flattens toward T/sqrt(n) and none is emptied") {
    import spark.implicits._
    val rows = SparkEntry.queries("q93_temperature_sample")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nSrc, nKept, _) =>
      assert(nKept <= nSrc, s"$src kept more than it has")
      assert(nKept > 0, s"$src emptied — T too aggressive for this corpus")
      val p = math.min(1.0, 3.0 / math.sqrt(nSrc.toDouble))
      assert(math.abs(nKept.toDouble / nSrc - p) < 0.25,
        s"$src kept ${nKept}/$nSrc, expected ~$p")
    }
  }

  test("q95: keep tier passes whole, hard drops sample nothing, mid tiers near their rate") {
    import spark.implicits._
    val rows = SparkEntry.queries("q95_quality_weighted_mix")(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
      .map { case (reason, pct, n, ns, _) => reason -> ((pct, n, ns)) }.toMap
    val (kp, kn, ks) = rows("keep")
    assert(kp == 100L && ks == kn, "keep tier must pass whole")
    rows.foreach { case (reason, (pct, n, ns)) =>
      if (pct == 0L) assert(ns == 0L, s"$reason is a hard drop but sampled $ns")
      else if (pct < 100L && n >= 20)
        assert(math.abs(ns.toDouble / n - pct / 100.0) < 0.2,
          s"$reason sampled $ns/$n vs rate $pct%")
    }
  }

  test("q96: manifest doc totals equal the d44 keep count; all three splits present") {
    import spark.implicits._
    val m = SparkEntry.queries("q96_training_manifest")(spark, sf0001)
      .select($"split", $"n_docs").as[(String, Long)].collect()
    val kept = SparkEntry.queries("d44_clean_corpus")(spark, sf0001)
      .filter($"keep").count()
    assert(m.map(_._2).sum == kept,
      "every kept doc must land in exactly one manifest row")
    assert(m.map(_._1).toSet == Set("train", "valid", "test"))
    SparkEntry.release(spark)
  }

  test("d38: only train docs flagged, every flag has >=1 gram hit; golden sf0.001 totals") {
    import spark.implicits._
    val rows = SparkEntry.queries("d38_decontamination")(spark, sf0001)
      .as[(Long, Long)].collect()
    assert(rows.forall(_._1 % 7 != 0), "benchmark docs must never be flagged")
    assert(rows.forall(_._2 >= 1))
    // independently computed in DuckDB over the fixed corpus
    assert(rows.length == 11, s"expected 11 contaminated docs, got ${rows.length}")
    assert(rows.map(_._2).sum == 365L, "total matched 5-grams")
  }

  test("q72: grouping_id semantics — gid=3 grand total equals the sum of gid=0 leaves") {
    import spark.implicits._
    val out = SparkEntry.queries("q72_grouping_id")(spark, sf0001)
      .select($"gid", $"n_items", $"sum_qty")
      .as[(Int, Long, Long)].collect()
    val leaves = out.filter(_._1 == 0)
    val Array(total) = out.filter(_._1 == 3).map(t => (t._2, t._3))
    assert(leaves.map(_._2).sum == total._1)
    assert(leaves.map(_._3).sum == total._2)
    // rolled-up levels present: nation subtotals (gid=1) and one grand total
    assert(out.count(_._1 == 1) > 1)
    assert(out.count(_._1 == 3) == 1)
  }
}
