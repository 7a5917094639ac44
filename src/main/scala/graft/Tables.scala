package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * All queries receive a scale-factor directory and read parquet through
  * here — schema comes from the parquet footer, so Catalyst gets exact
  * column types and can push filters/projections into the scan.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
      // rejects (PARQUET_TYPE_ILLEGAL). Read it as raw nanos via the
      // legacy conf and truncate to Spark's micros TimestampType with
      // exact integral division (`div`, not FP `/` — nanos ~1.7e18
      // exceed double's 2^53 integer range, FP division would corrupt
      // the low microseconds). DuckDB's CAST(ts_ns AS TIMESTAMP)
      // truncates identically, so oracle comparisons line up.
      case "events" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$dir/events.parquet")
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        spark.read.parquet(s"$dir/$name.parquet")
    }
}
