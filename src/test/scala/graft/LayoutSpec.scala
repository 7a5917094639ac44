package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Extended

/** Z-order layout evidence (q73): the Morton key clusters BOTH
  * dimensions into every bucket/file, so a 2-D box predicate prunes to
  * a handful of files where a single-column sort layout only prunes one
  * dimension. Deterministic by construction: an exact 256x256 grid and
  * power-of-two bucket widths, no sampling-based range partitioner.
  */
class LayoutSpec extends AnyFunSuite with SparkTestBase {

  // 256x256 grid, one row per (x, y) cell
  private def grid = spark.range(256L * 256)
    .select((col("id") % 256).as("x"), expr("id div 256").as("y"))
    .withColumn("zkey", Extended.morton16(col("x"), col("y")))

  test("an aligned 32x32 box touches 1 z-bucket but 8 single-dim buckets") {
    // 64 buckets each way: z-bucket = zkey >> 10 (a 32x32 Morton tile),
    // x-bucket = x >> 2 (a 4-wide column stripe spanning all of y)
    val stats = grid
      .withColumn("zb", shiftright(col("zkey"), 10))
      .withColumn("xb", shiftright(col("x"), 2))
    // per-bucket min/max are what parquet footers would carry per file
    def touched(bucket: String): Long = stats
      .groupBy(col(bucket))
      .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
        min(col("y")).as("y0"), max(col("y")).as("y1"))
      // the 2-D box predicate x,y in [64, 95] against file-level stats
      .filter(col("x1") >= 64 && col("x0") <= 95 &&
        col("y1") >= 64 && col("y0") <= 95)
      .count()
    assert(touched("zb") === 1L,
      "an aligned box must land entirely inside one Morton tile")
    assert(touched("xb") === 8L,
      "a single-dim layout must scan every stripe overlapping x in [64,95]")
  }

  test("round-trip: a z-bucket-partitioned write prunes a 2-D box read to one directory") {
    val out = Files.createTempDirectory("graft-zorder").toString + "/grid"
    grid.withColumn("zb", shiftright(col("zkey"), 10))
      .write.partitionBy("zb").parquet(out)
    val back = spark.read.parquet(out)
      // the tile holding [64,95]^2 is tile (x=2, y=2) of the 8x8 tile
      // grid → zb = morton(2, 2) = 0b1100 = 12
      .filter(col("zb") === 12)
    val p = back.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters"), s"partition pruning missing in:\n$p")
    // the one surviving tile contains exactly the box
    val r = back.agg(min(col("x")), max(col("x")), min(col("y")), max(col("y")))
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((64L, 95L, 64L, 95L)))
    assert(back.count() === 1024L)
  }
}
