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

  case class Ev(user_id: Long, event_type: String, value: Double)

  case class Profile(n_events: Long, n_purchases: Long, max_value: Double,
      sum_value: Double)

  /** Typed per-user profile aggregator — a MERGEABLE Aggregator (not
    * mapGroups): reduce/merge are associative-commutative on the
    * integer fields and max, so it partial-aggregates map-side exactly
    * like a built-in; only the double sum carries FP order, handled by
    * the registry's round-2 discipline at finish. */
  class ProfileAgg extends Aggregator[Ev, Profile, Profile] {
    override def zero: Profile = Profile(0L, 0L, Double.MinValue, 0.0)
    override def reduce(p: Profile, e: Ev): Profile = Profile(
      p.n_events + 1,
      p.n_purchases + (if (e.event_type == "purchase") 1L else 0L),
      math.max(p.max_value, e.value),
      p.sum_value + e.value)
    override def merge(a: Profile, b: Profile): Profile = Profile(
      a.n_events + b.n_events, a.n_purchases + b.n_purchases,
      math.max(a.max_value, b.max_value), a.sum_value + b.sum_value)
    override def finish(p: Profile): Profile = p
    override def bufferEncoder: Encoder[Profile] = Encoders.product[Profile]
    override def outputEncoder: Encoder[Profile] = Encoders.product[Profile]
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Typed per-user behavior profile: case-class rows in, a custom
    // mergeable Aggregator over them, case-class buffer out — the
    // "type safety helps" surface (compile-time field checks on the
    // reduce path) exercised end to end, under the same oracle gate
    // as everything else.
    "q130_typed_profile" -> { (s, d) =>
      import s.implicits._
      val ds = t(s, d, "events")
        .select(col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      ds.groupByKey(_.user_id)
        .agg(new ProfileAgg().toColumn.name("p"))
        .toDF("user_id", "p")
        .select(col("user_id"), col("p.n_events").as("n_events"),
          col("p.n_purchases").as("n_purchases"),
          round(col("p.max_value"), 2).as("max_value"),
          round(col("p.sum_value"), 2).as("sum_value"))
    },

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

  lazy val oracle: Map[String, String] = Map(
    "q130_typed_profile" ->
      """SELECT user_id, count(*) AS n_events,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_purchases,
        | round(max(value), 2) AS max_value,
        | round(sum(value), 2) AS sum_value
        |FROM events GROUP BY user_id""".stripMargin,
    "q64_typed_dataset" ->
      """SELECT l_returnflag,
        | round(sum(l_extendedprice * (1.0 - l_discount)),2) AS revenue,
        | count(*) AS n
        |FROM lineitem WHERE l_quantity > 20
        |GROUP BY l_returnflag""".stripMargin
  )
}
