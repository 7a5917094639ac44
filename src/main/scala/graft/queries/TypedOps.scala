package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Typed Dataset[T] rendering of a corpus query — compile-time field
  * checks end-to-end: case-class row, lambda filter, groupByKey, and a
  * typed Aggregator, all under the same DuckDB oracle as the untyped
  * queries. Typed lambdas don't codegen like Column expressions do
  * (SURVEY.md guide note), so this exists as API-surface parity, not
  * the perf path — the hot queries stay expression-based.
  */
object TypedOps {

  case class Li(l_returnflag: String, l_quantity: Double,
      l_extendedprice: Double, l_discount: Double, l_shipdate: Timestamp)

  /** Typed revenue aggregator: sum of extendedprice*(1-discount). */
  class RevenueAgg extends Aggregator[Li, Double, Double] {
    override def zero: Double = 0.0
    override def reduce(acc: Double, li: Li): Double =
      acc + li.l_extendedprice * (1.0 - li.l_discount)
    override def merge(a: Double, b: Double): Double = a + b
    override def finish(acc: Double): Double = acc
    override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q64_typed_dataset" -> { (s, d) =>
      import s.implicits._
      val ds = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_shipdate"))
        .as[Li]
      ds.filter(_.l_quantity > 20)
        .groupByKey(_.l_returnflag)
        .agg(new RevenueAgg().toColumn.name("revenue"),
          count(lit(1)).as("n").as[Long])
        .toDF("l_returnflag", "revenue", "n")
        .select(col("l_returnflag"), round(col("revenue"), 2).as("revenue"),
          col("n"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q64_typed_dataset" ->
      """SELECT l_returnflag,
        | round(sum(l_extendedprice * (1.0 - l_discount)),2) AS revenue,
        | count(*) AS n
        |FROM lineitem WHERE l_quantity > 20
        |GROUP BY l_returnflag""".stripMargin
  )
}
