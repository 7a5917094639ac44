package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Ingest-shape contract for the driver-owned events corpus (VERDICT r9
  * item 1): the testdata regeneration flipped `ts` from raw-nanos INT64
  * (parquet TIMESTAMP(NANOS) under the legacy nanosAsLong conf) to
  * TIMESTAMP(MICROS, NTZ) between rounds and broke every events query at
  * ANALYSIS time. `Tables.t("events")` now branches on the footer schema;
  * this spec writes the SAME instants in all three parquet renderings and
  * asserts every shape analyzes and yields identical micros timestamps —
  * so neither direction of a future driver-side regeneration can break
  * ingest silently again. */
class TablesIngestSpec extends AnyFunSuite with SparkTestBase {

  // whole-micro instants incl. pre-epoch and the epoch itself
  private val micros = Seq(-1234567L, 0L, 1L, 1699999999123456L)

  private def writeShape(shape: String): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft-ingest-$shape").toString
    val base = micros.toDF("us")
    val df = shape match {
      // plain INT64 nanos — how a TIMESTAMP(NANOS) file surfaces under
      // spark.sql.legacy.parquet.nanosAsLong=true
      case "nanos" => base.select((col("us") * 1000L).as("ts"))
      case "ntz" => base.select(
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      case "tz" => base.select(timestamp_micros(col("us")).as("ts"))
    }
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events ts ingest: all three parquet shapes analyze to identical micros TimestampType") {
    for (shape <- Seq("nanos", "ntz", "tz")) {
      val dir = writeShape(shape)
      val ev = Tables.t(spark, dir, "events")
      assert(ev.schema("ts").dataType === TimestampType,
        s"shape=$shape must resolve ts to TimestampType")
      val got = ev.select(unix_micros(col("ts"))).collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got === micros.sorted,
        s"shape=$shape micros mismatch: got ${got.mkString(",")}")
    }
  }

  test("events ts ingest: real driver corpus analyzes and reads") {
    val ev = Tables.t(spark, sf0001, "events")
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.limit(1).count() === 1L)
  }
}
