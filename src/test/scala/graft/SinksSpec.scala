package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sink-side scale behaviors: partitioned layout → partition pruning at
  * read; bucketed layout → shuffle-free co-located joins. These are the
  * write-path halves of the 100 TB posture (SURVEY.md §8.5). */
class SinksSpec extends AnyFunSuite with SparkTestBase {

  test("partitionBy write → reads prune partitions (PartitionFilters, not data filters)") {
    val out = Files.createTempDirectory("graft-part").toString + "/orders"
    val orders = Tables.t(spark, sf0001, "orders")
      .withColumn("yr", year(col("o_orderdate")))
    orders.write.partitionBy("yr").mode("overwrite").parquet(out)

    val pruned = spark.read.parquet(out).filter(col("yr") === 1997)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("1997"),
      s"expected partition pruning in:\n$plan")
    assert(pruned.count() ===
      orders.filter(col("yr") === 1997).count())
  }

  test("bucketed table self-join plans without a shuffle exchange") {
    val orders = Tables.t(spark, sf0001, "orders")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_bucketed")
    val b = spark.table("orders_bucketed")
    val joined = b.as("a").join(b.as("b"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    val plain = orders.as("a").join(orders.as("b"), "o_custkey")
    assert(joined.count() === plain.count())
  }

  test("Verify-style coalesced parquet round-trip preserves values") {
    val out = Files.createTempDirectory("graft-rt").toString + "/q01"
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf0001)
    df.coalesce(1).write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.collect().map(_.toString).sorted
      .sameElements(df.collect().map(_.toString).sorted))
  }
}
