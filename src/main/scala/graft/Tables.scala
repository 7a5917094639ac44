package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * All queries receive a scale-factor directory and read parquet through
  * here — schema comes from the parquet footer, so Catalyst gets exact
  * column types and can push filters/projections into the scan.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
