package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Core relational operators over the TPC-H-ish corpus: scan+filter+project
  * with pushdown, hash aggregation with partial (map-side) combine, joins
  * (broadcast + shuffle, semi/anti), top-k, set ops, distinct counts.
  *
  * Scale notes (100 TB posture):
  *  - every aggregate here is a partial-aggregation `HashAggregateExec`
  *    pair — no groupByKey-style full value shuffles (SURVEY.md §2.4 A1);
  *  - dimension tables (region/nation) are explicitly `broadcast()`;
  *    fact⋈fact joins are left to Catalyst/AQE (sort-merge with
  *    skew-split at scale);
  *  - filters/projections are plain Catalyst expressions so they reach the
  *    parquet scan (PushedFilters / ReadSchema);
  *  - double aggregates are rounded in BOTH the Spark query and the DuckDB
  *    oracle: double addition is order-dependent, exact bit equality across
  *    engines is not a meaningful target.
  *
  * Reference mapping: SURVEY.md §2.2 (P4 projection), §2.4 (A1/A3/A4/A5),
  * §2.3 (joins enter via the driver corpus), §2.6 (L1/L2), §2.7 (set ops).
  */
object Relational {

  private def tsLit(s: String) = lit(s).cast("timestamp")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: partial agg + 4-group fanout.
    "q01_pricing_summary" -> { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= tsLit("2001-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // Filter + narrow projection — exists to prove scan pushdown: the
    // physical plan must show PushedFilters on l_quantity/l_discount and a
    // 4-column ReadSchema.
    "q02_filter_pushdown" -> { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
    },

    // orders ⋈ customer revenue per market segment.
    "q03_join_agg" -> { (s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
    },

    // TPC-H Q5-style 5-way join; nation/region broadcast by hint.
    "q04_region_revenue" -> { (s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= tsLit("1996-01-01") &&
          col("o_orderdate") < tsLit("1999-01-01"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_lineitems"))
    },

    // Semi join (EXISTS): customers that have at least one order.
    "q05_semi_join" -> { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"),
          "left_semi")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
    },

    // Anti join (NOT EXISTS): customers with no order since 2001-01-01.
    // (Unrestricted "no orders at all" is empty on this corpus — every
    // customer has orders — which would verify nothing.)
    "q06_anti_join" -> { (s, d) =>
      t(s, d, "customer")
        .join(
          t(s, d, "orders").filter(col("o_orderdate") >= tsLit("2001-01-01")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    },

    // Left outer join with null-aware aggregation: every customer keeps
    // a row, zero-order customers count 0.
    "q53_left_outer" -> { (s, d) =>
      val recent = t(s, d, "orders")
        .filter(col("o_orderdate") >= tsLit("2001-01-01"))
      t(s, d, "customer")
        .join(recent, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_recent_orders"),
          round(sum(coalesce(col("o_totalprice"), lit(0.0))), 2)
            .as("recent_spend"))
    },

    // Full outer join: suppliers-per-nation vs high-balance
    // customers-per-nation — nations may exist on either side only.
    "q54_full_outer" -> { (s, d) =>
      val sup = t(s, d, "supplier").groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_suppliers"))
      val cust = t(s, d, "customer").filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_rich_customers"))
      sup.join(cust, Seq("nationkey"), "full_outer")
        .select(col("nationkey"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
          coalesce(col("n_rich_customers"), lit(0L)).as("n_rich_customers"))
    },

    // Top-k with a deterministic tie-break (TakeOrderedAndProject — no
    // full sort materialization at scale).
    "q07_topk_orders" -> { (s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(10)
    },

    // One-pass multi-column distinct counts (SURVEY.md A4: the reference
    // ran 4 separate jobs, each re-reading the CSV; this is a single scan
    // with expand + partial aggregation).
    "q08_distinct_counts" -> { (s, d) =>
      t(s, d, "lineitem").agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_returnflag")).as("n_flags"),
        count(lit(1)).as("n_rows"))
    },

    // TABLE PROFILE — the per-column data-quality card a warehouse
    // publishes (q09's describe generalized across columns): null and
    // distinct counts for every profiled column plus the row total, as
    // one long-format table. ONE aggregation pass over the scan
    // computes all measures (11 aggregates fused in a single partial-
    // agg); stack() reshapes the 1-row wide result map-side — the
    // corpus is never re-scanned per column, which is the difference
    // between 1× and 5× the 100 TB scan bill.
    "q91_table_profile" -> { (s, d) =>
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_returnflag")
      val measures = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c")))
      val stackArgs = cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
      t(s, d, "lineitem")
        .agg(measures.head, measures.tail: _*)
        .select(
          expr(s"stack(${cols.size}, $stackArgs) " +
            "as (column_name, n_nulls, n_distinct)"),
          col("n_rows"))
    },

    // describe()-equivalent summary statistics (SURVEY.md A5) as a real
    // aggregate with typed output (describe() returns strings).
    "q09_summary_stats" -> { (s, d) =>
      t(s, d, "customer").agg(
        count(lit(1)).as("n"),
        round(avg(col("c_acctbal")), 4).as("mean_acctbal"),
        round(stddev_samp(col("c_acctbal")), 4).as("stddev_acctbal"),
        round(min(col("c_acctbal")), 2).as("min_acctbal"),
        round(max(col("c_acctbal")), 2).as("max_acctbal"))
    },

    // Set operations: distinct union / intersect / except, tagged into one
    // result so all three run as one query.
    "q10_set_ops" -> { (s, d) =>
      val custNations = t(s, d, "customer")
        .select(col("c_nationkey").as("nationkey"))
      val suppNations = t(s, d, "supplier")
        .select(col("s_nationkey").as("nationkey"))
      val u = custNations.union(suppNations).distinct()
        .withColumn("op", lit("union"))
      val i = custNations.intersect(suppNations)
        .withColumn("op", lit("intersect"))
      val e = custNations.except(suppNations)
        .withColumn("op", lit("except"))
      u.union(i).union(e)
    },

    // Grouping sets via rollup: per (returnflag, linestatus), per
    // returnflag, and grand total in one pass.
    "q11_rollup" -> { (s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n"))
    },

    // Grouping sets via cube: all 4 grouping combinations in one pass.
    "q48_cube" -> { (s, d) =>
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"),
          count(lit(1)).as("n"))
    },

    // Explicit GROUPING SETS (Spark 4 Dataset API) — only the two
    // named groupings, not the rollup/cube closure.
    "q56_grouping_sets" -> { (s, d) =>
      t(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
    },

    // Multiset semantics: INTERSECT ALL / EXCEPT ALL keep duplicate
    // cardinality (vs q10's set semantics).
    "q57_setops_all" -> { (s, d) =>
      val li = t(s, d, "lineitem").select(col("l_suppkey").as("k"))
      val recent = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= tsLit("2000-01-01"))
        .select(col("l_suppkey").as("k"))
      val ia = li.intersectAll(recent).groupBy(col("k"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      val ea = li.exceptAll(recent).groupBy(col("k"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
      ia.union(ea)
    },

    // Schema-aligned union (by NAME, not position) across entity tables
    // with a missing column filled as null.
    "q62_union_by_name" -> { (s, d) =>
      val cust = t(s, d, "customer").select(col("c_name").as("name"),
        col("c_nationkey").as("nationkey"), col("c_acctbal").as("acctbal"))
        .withColumn("kind", lit("customer"))
      cust.unionByName(
          t(s, d, "supplier").select(col("s_name").as("name"),
            col("s_nationkey").as("nationkey"),
            col("s_acctbal").as("acctbal"))
            .withColumn("kind", lit("supplier")),
          allowMissingColumns = true)
        .groupBy(col("kind"), col("nationkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("acctbal")), 2).as("bal"))
    },

    // Inline literal table (LocalRelation) joined against the corpus.
    "q63_values_join" -> { (s, d) =>
      import s.implicits._
      val tiers = Seq(("AUTOMOBILE", 1), ("BUILDING", 2), ("FURNITURE", 2),
        ("MACHINERY", 3), ("HOUSEHOLD", 3)).toDF("c_mktsegment", "tier")
      t(s, d, "customer")
        .join(broadcast(tiers), "c_mktsegment")
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n_customers"),
          round(avg(col("c_acctbal")), 4).as("avg_bal"))
    },

    // Pivot = A1 count-vectorization shape on the corpus (SURVEY.md §2.4):
    // explicit value list, like pivot("Family", familias) in the reef
    // pipeline — conditional aggregation, one pass, no value shuffle.
    // TPC-H Q17 SHAPE — small-quantity-order revenue per brand: lines
    // whose quantity sits below 20% of their PART's average, the
    // "smaller container" probe. The 20%-of-avg gate runs as the EXACT
    // integer inequality 5·qty·cnt < sumq (quantities are integral, so
    // the per-part average never materializes as a float), revenue in
    // row-rounded integer cents (q152 discipline). Plan: ONE lineitem
    // partial agg per part, joined back to the fact on l_partkey (both
    // shuffles partkey-keyed; the aggregate side is |parts|-sized),
    // part dim broadcast.
    "q156_small_qty_revenue" -> { (s, d) =>
      val li = t(s, d, "lineitem")
      val perPart = li.groupBy(col("l_partkey").as("pk"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("long")).as("sumq"))
      li.join(perPart, col("l_partkey") === col("pk"))
        .filter(col("l_quantity").cast("long") * 5 * col("cnt")
          < col("sumq"))
        .join(broadcast(t(s, d, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_small_lines"),
          sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .as("revenue_cents"))
    },

    // TPC-H Q18 SHAPE — large-volume orders: orders whose total line
    // quantity exceeds 250 (the top ~1.5% of this corpus), with their
    // customer. The HAVING gate runs on the orderkey partial agg
    // BEFORE any join, so both dimension joins see only qualifying
    // orders; quantities are integral so the gate is exact. The
    // customer join stays un-broadcast deliberately — at 100 TB the
    // customer table is itself fact-sized and AQE picks the join.
    "q157_large_orders" -> { (s, d) =>
      val big = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .filter(col("sum_qty") > 250)
      t(s, d, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)")
            .as("total_cents"),
          col("sum_qty"))
    },

    // TPC-H Q21 SHAPE — suppliers who were the SOLE late shipper in a
    // multi-supplier order (late = shipped > 365 days after the order
    // date — this corpus's ship lag is synthetic-wide, q145 audits
    // it). The classic correlated EXISTS/NOT-EXISTS pair collapses
    // into aggregates: the fact collapses FIRST to one row per
    // (order, supplier) — so all later logic runs on a frame bounded
    // by order fan-out, not lines — then a per-order profile (distinct
    // suppliers, distinct late suppliers) gates the qualifying rows.
    // Both shuffles orderkey-keyed; the (order, supplier) frame
    // persists at its documented two-consumer reuse point; supplier
    // dim broadcast.
    "q158_sole_late_supplier" -> { (s, d) =>
      val g = t(s, d, "lineitem")
        .join(t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(sum(when(datediff(col("l_shipdate"), col("o_orderdate"))
          > 365, 1L).otherwise(0L)).as("n_late_lines"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val prof = g.groupBy(col("l_orderkey").as("ok"))
        .agg(count(lit(1)).as("n_supp"),
          sum(when(col("n_late_lines") > 0, 1L).otherwise(0L))
            .as("n_late_supp"))
      g.filter(col("n_late_lines") > 0)
        .join(prof, col("l_orderkey") === col("ok"))
        .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
        .join(broadcast(t(s, d, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(sum(col("n_late_lines")).as("n_late_lines"),
          count(lit(1)).as("n_orders"))
    },

    "q12_pivot_flag_status" -> { (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_quantity")), 2))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    },

    // TPC-H Q20 SHAPE — suppliers with excess stock of a screened
    // part: the classic correlated scalar subquery (availqty > 0.5 ×
    // the (part, supplier)'s yearly shipped quantity) decorrelated
    // over its TWO correlation keys into ONE per-(part, supplier)
    // aggregate with two conditional sums — this corpus has no
    // partsupp, so "stock" is the quantity the supplier shipped of
    // that part OUTSIDE the demand year (1997), the proxy that keeps
    // both sides of Q20's inequality on the same fact scan. The 'red%'
    // part screen broadcasts INTO the scan side so only screened parts
    // reach the shuffle; the inequality runs as exact integers
    // (2·avail > demand — no 0.5 double); the Q20 EXISTS collapses to
    // a supplier-keyed count over qualifying (part, supplier) rows;
    // supplier dim broadcast. One fact shuffle, keyed (part, supplier).
    "q159_excess_stock" -> { (s, d) =>
      val y0 = lit("1997-01-01").cast("timestamp")
      val y1 = lit("1998-01-01").cast("timestamp")
      val in97 = col("l_shipdate") >= y0 && col("l_shipdate") < y1
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")
          .filter(col("p_name").like("red%"))
          .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .agg(sum(when(in97, col("l_quantity").cast("long"))
            .otherwise(0L)).as("demand97"),
          sum(when(!in97, col("l_quantity").cast("long"))
            .otherwise(0L)).as("avail_other"))
        .filter(col("demand97") > 0
          && col("avail_other") * 2 > col("demand97"))
        .join(broadcast(t(s, d, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("sk") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("n_excess_parts"),
          sum(col("avail_other")).as("stock_qty"))
    },

    // TPC-H Q15 SHAPE — top supplier(s) by quarterly revenue: the
    // revenue-view-then-max pattern (CREATE VIEW + WHERE total =
    // (SELECT max FROM view)). The view is one suppkey partial agg
    // over the quarter's fact slice (predicate pushed to the scan);
    // the scalar max rides back as a broadcast 1-row cross join and
    // the equality keeps TIES (the shape's point vs a LIMIT 1).
    // Revenue in per-row-rounded cents so max and equality are exact
    // integers — no float revenue comparison anywhere.
    "q160_top_quarter_supplier" -> { (s, d) =>
      val rev = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(expr(
          "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          .as("total_rev_cents"))
      val mx = rev.agg(max(col("total_rev_cents")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_rev_cents") === col("mx"))
        .join(broadcast(t(s, d, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev_cents"))
    },

    // TPC-H Q22 SHAPE — churned high-balance customers: positive-
    // balance customers above the positive-balance AVERAGE with no
    // order since 1999 (the classic has "no orders ever", which this
    // corpus's synthetic coverage makes vacuous — probed, every
    // positive-balance customer orders; the windowed variant is the
    // production churn question anyway). The average gate runs as the
    // exact integer inequality bal_cents·n > Σcents (never a double
    // avg — the d35 discipline), the NOT EXISTS is one LEFT ANTI join
    // keyed o_custkey (the single fact shuffle), and the nation
    // rollup is a broadcast dim join on the tiny survivor set.
    "q161_churned_customers" -> { (s, d) =>
      val pos = t(s, d, "customer").filter(col("c_acctbal") > 0)
        .withColumn("bal_cents",
          expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
      val g = pos.agg(sum(col("bal_cents")).as("sum_cents"),
        count(lit(1)).as("n_pos"))
      val rich = pos.crossJoin(broadcast(g))
        .filter(col("bal_cents") * col("n_pos") > col("sum_cents"))
      val active = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      rich.join(active, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(t(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_custs"),
          sum(col("bal_cents")).as("total_bal_cents"))
    },

    // TPC-H Q11 SHAPE — important parts at one nation's suppliers:
    // per-part value restricted to the nation's suppliers, gated
    // HAVING value > a fraction of the group's TOTAL value — the
    // scalar-subquery-in-HAVING pattern, decorrelated into one
    // partial agg plus a broadcast 1-row total. The classic fixed
    // fraction (0.0001/SF in TPC-H) is corpus-size-dependent — a
    // fixed 1/1000 gate probed EMPTY at sf0.1 (the q139 degeneracy
    // lesson) — so the gate is self-scaling: value > 2× the MEAN
    // part value, as the exact integer inequality value·n_parts >
    // 2·total (15/126/1235 rows at the three SFs). The nation's
    // supplier list broadcasts into the fact scan (one nation ≈
    // 1/|nations| of suppliers — the Q11 posture; at 100 TB AQE can
    // demote it to a shuffled join without changing the shape).
    "q162_important_parts" -> { (s, d) =>
      val natSupp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")
          .filter(col("n_name") === "NATION_3")
          .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val v = t(s, d, "lineitem")
        .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(expr(
          "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          .as("value_cents"))
      val tot = v.agg(sum(col("value_cents")).as("tc"),
        count(lit(1)).as("np"))
      v.crossJoin(broadcast(tot))
        .filter(col("value_cents") * col("np") > col("tc") * 2)
        .select(col("l_partkey").as("p_partkey"), col("value_cents"))
    },

    // TPC-H Q4 SHAPE — late-order counts by priority: orders placed in
    // a quarter with AT LEAST ONE line shipped > 90 days after the
    // order date, counted per priority. The correlated EXISTS (the
    // subquery references the outer o_orderdate) decorrelates into ONE
    // left-semi join whose condition carries both the orderkey equi
    // part and the non-equi date residual — Spark plans the equi key
    // and evaluates the residual inside the join, so the quarter
    // filter still prunes the probe side at the scan and no
    // lineitem ever materializes per-order. Completes the classic
    // correlated-subquery family (Q17/Q18/Q21/Q20/Q15/Q22/Q11/Q4).
    "q164_priority_late_orders" -> { (s, d) =>
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      val late = t(s, d, "lineitem")
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
      o.join(late, col("o_orderkey") === col("l_orderkey")
          && col("sd") > date_add(to_date(col("o_orderdate")), 90),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_late_orders"))
    },

    // TPC-H Q19 SHAPE — disjunctive band pricing: revenue over an
    // OR-of-ANDs of (brand, size, quantity) bands. The operator point
    // is that the whole disjunction evaluates INSIDE the one
    // broadcast-join scan pass — no union of three scans, no re-read
    // per band — and the per-band split is conditional aggregation
    // unpivoted by stack(), still the same single pass. A line
    // matching several bands counts in each (bands here are disjoint
    // by brand/type, but the contract is per-band attribution, not
    // partitioning). Revenue in per-row-rounded cents (q160
    // discipline) so band totals are exact integers.
    "q165_disjunctive_bands" -> { (s, d) =>
      val cents =
        expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
      val band1 = col("p_brand") === "Brand#1" &&
        col("p_size").between(1, 15) && col("l_quantity") < 25
      val band2 = col("p_brand") === "Brand#2" &&
        col("p_size").between(16, 35) && col("l_quantity") >= 25
      val band3 = col("p_type") === "PROMO" &&
        col("l_quantity").between(10, 20)
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_size"),
            col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .filter(band1 || band2 || band3)
        .agg(
          sum(when(band1, cents).otherwise(0L)).as("c1"),
          count(when(band1, lit(1))).as("n1"),
          sum(when(band2, cents).otherwise(0L)).as("c2"),
          count(when(band2, lit(1))).as("n2"),
          sum(when(band3, cents).otherwise(0L)).as("c3"),
          count(when(band3, lit(1))).as("n3"))
        .select(expr(
          """stack(3,
            | 'brand1_small', c1, n1,
            | 'brand2_large', c2, n2,
            | 'promo_mid',    c3, n3) AS (band, revenue_cents, n_lines)"""
            .stripMargin))
    },

    // TPC-H Q13 SHAPE — order-count distribution with the zero bucket:
    // how many customers placed exactly k URGENT orders, INCLUDING
    // k = 0 (the bucket an inner join silently drops — the shape's
    // whole point). The fact collapses to per-customer counts FIRST
    // (one orderkey→custkey shuffle), then customer LEFT-joins the
    // counts so no-urgent-order customers surface as 0; the final
    // distribution groupBy runs on a customer-cardinality frame. At
    // 100 TB both shuffles are custkey-keyed and the widest row in
    // flight is (custkey, count).
    "q166_order_count_distribution" -> { (s, d) =>
      val perCust = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      t(s, d, "customer").select(col("c_custkey"))
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("n"), lit(0L)).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },

    // TPC-H Q7 SHAPE — trade flows between nations: revenue shipped
    // from a supplier nation to a DIFFERENT customer nation per ship
    // year, over a 5-nation focus set. Both nation filters reach the
    // dimension scans; the supplier side collapses to a broadcast
    // (suppkey → supp_nation) map that prunes lineitem to the focus
    // fifth BEFORE the orders join, so the two fact shuffles
    // (orderkey, then custkey) carry only qualifying lines. Cents
    // discipline as q160; the year key is exact integer.
    "q167_nation_trade_flows" -> { (s, d) =>
      val focus = col("n_nationkey") < 5
      val supN = broadcast(t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation").filter(focus)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
      val custN = t(s, d, "customer")
        .join(broadcast(t(s, d, "nation").filter(focus)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      t(s, d, "lineitem")
        .join(supN, col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(custN, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("ship_year"))
        .agg(
          sum(expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
            .as("revenue_cents"),
          count(lit(1)).as("n_lines"))
    },

    // TPC-H Q14 SHAPE — promo revenue share per month: the
    // conditional-numerator/total-denominator ratio computed in ONE
    // pass over the year's fact slice (predicate pushed to the scan,
    // part dim broadcast). Both legs sum exact per-row-rounded cents;
    // the share is the single double division at the very end
    // (q160/t32 discipline — no float accumulates across rows).
    "q168_promo_share" -> { (s, d) =>
      val cents =
        expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= tsLit("1997-01-01")
          && col("l_shipdate") < tsLit("1998-01-01"))
        .join(broadcast(t(s, d, "part")
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(month(col("l_shipdate")).cast("long").as("ship_month"))
        .agg(
          sum(when(col("p_type") === "PROMO", cents).otherwise(0L))
            .as("promo_cents"),
          sum(cents).as("total_cents"))
        .select(col("ship_month"), col("promo_cents"), col("total_cents"),
          round(lit(100.0) * col("promo_cents") / col("total_cents"), 4)
            .as("promo_share_pct"))
    },

    // TPC-H Q8 SHAPE — market share: NATION_3's slice of its own
    // region's revenue per order year. The "which region is that"
    // scalar subquery is a broadcast join chain (nation→region→the
    // region's nations), so the customer-side region membership and
    // the supplier-side is-target flag BOTH ride broadcast hash maps
    // into the fact scan; the share is conditional-cents / total-cents
    // per year — the q168 one-division discipline. Two fact shuffles
    // (orderkey, custkey), then a 7-row year rollup.
    "q169_market_share" -> { (s, d) =>
      val nation = t(s, d, "nation")
      // NATION_3's region key → every nation key in that region
      val regionNations = broadcast(nation
        .join(broadcast(nation.filter(col("n_name") === "NATION_3")
          .select(col("n_regionkey").as("rk"))),
          col("n_regionkey") === col("rk"))
        .select(col("n_nationkey").as("region_nk")))
      val supFlag = broadcast(t(s, d, "supplier")
        .join(broadcast(nation.select(col("n_nationkey"),
          (col("n_name") === "NATION_3").as("is_target"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("is_target")))
      val custInRegion = t(s, d, "customer")
        .join(regionNations, col("c_nationkey") === col("region_nk"))
        .select(col("c_custkey"))
      val cents =
        expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
      t(s, d, "lineitem")
        .join(supFlag, col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(custInRegion, col("o_custkey") === col("c_custkey"),
          "left_semi")
        .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
        .agg(
          sum(when(col("is_target"), cents).otherwise(0L))
            .as("target_cents"),
          sum(cents).as("total_cents"))
        .select(col("order_year"), col("target_cents"), col("total_cents"),
          round(lit(100.0) * col("target_cents") / col("total_cents"), 4)
            .as("market_share_pct"))
    },

    // TPC-H Q10 SHAPE — returned-item reporting: the top 20 customers
    // by revenue RETURNED in a half-year window, with their nation.
    // The returnflag + date predicates prune both fact scans before
    // the join; per-customer revenue is one custkey rollup in exact
    // cents, and the top-20 cut rides TakeOrderedAndProject
    // (distributed partial take, the q102 discipline) with custkey as
    // the deterministic tiebreak. The nation dim joins AFTER the cut —
    // 20 rows, broadcast.
    "q170_returned_top_customers" -> { (s, d) =>
      val rev = t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R")
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= tsLit("1997-01-01")
            && col("o_orderdate") < tsLit("1997-07-01"))
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(expr(
          "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          .as("returned_cents"),
          count(lit(1)).as("n_returned_lines"))
        .orderBy(col("returned_cents").desc, col("o_custkey").asc)
        .limit(20)
      rev.join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("returned_cents"), col("n_returned_lines"))
    },

    // TPC-H Q3 SHAPE — shipping priority: the 10 highest-revenue
    // UNSHIPPED orders for one market segment at a cutoff date. The
    // segment filter collapses customer to a broadcast key set (a
    // left-semi into orders — the fact never widens), both date
    // predicates push to their scans, and the per-order revenue is one
    // orderkey rollup in exact cents. The top-10 cut rides
    // TakeOrderedAndProject with orderkey as the deterministic
    // tiebreak (the q170 discipline) — at 100 TB each reducer keeps a
    // 10-row heap, never a global sort.
    "q171_shipping_priority" -> { (s, d) =>
      val cutoff = tsLit("1997-06-01")
      val buildingCust = t(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val openOrders = t(s, d, "orders")
        .filter(col("o_orderdate") < cutoff)
        .join(broadcast(buildingCust),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderdate"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") > cutoff)
        .join(openOrders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(expr(
          "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          .as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey").asc)
        .limit(10)
        .select(col("l_orderkey"), col("revenue_cents"), col("o_orderdate"))
    },

    // TPC-H Q5 SHAPE — local supplier volume: revenue per nation from
    // lines where the CUSTOMER and the SUPPLIER sit in the same nation
    // of one region, in one order year. Region membership collapses to
    // a broadcast (suppkey → nationkey, name) map that prunes lineitem
    // at the scan; the customer's nation rides the orders join
    // (custkey shuffle on the order-cardinality side, then one
    // orderkey fact shuffle), and the same-nation residual
    // (c_nationkey = s_nationkey) evaluates INSIDE the fact join —
    // never a pair blowup. Output groups to |region nations| rows.
    "q172_local_supplier_volume" -> { (s, d) =>
      val regionNations = broadcast(t(s, d, "nation")
        .join(broadcast(t(s, d, "region")
          .filter(col("r_name") === "EUROPE")
          .select(col("r_regionkey").as("rk"))),
          col("n_regionkey") === col("rk"))
        .select(col("n_nationkey"), col("n_name")))
      val supN = broadcast(t(s, d, "supplier")
        .join(regionNations, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name")))
      val ordersCust = t(s, d, "orders")
        .filter(col("o_orderdate") >= tsLit("1997-01-01")
          && col("o_orderdate") < tsLit("1998-01-01"))
        .join(t(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      t(s, d, "lineitem")
        .join(supN, col("l_suppkey") === col("s_suppkey"))
        .join(ordersCust, col("l_orderkey") === col("o_orderkey")
          && col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(expr(
          "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          .as("revenue_cents"),
          count(lit(1)).as("n_lines"))
    },

    // TPC-H Q6 SHAPE — forecasting revenue change: the would-have-been
    // revenue from dropping discounts in a band, for one ship year and
    // small quantities. THE predicate-pushdown showcase: no join, no
    // window — one scan whose three range predicates ALL reach the
    // parquet reader (row-group stats prune whole files of other
    // years), a 4-column ReadSchema, and one partial-agg collapse to a
    // single row (zero-row shuffle: partial sums merge at one
    // reducer). Revenue is row-rounded integer cents (q152
    // discipline), so the sum is exact and order-free. At 100 TB this
    // plan touches only the row groups whose [min,max] straddle the
    // band — the scan IS the query.
    "q173_forecast_revenue" -> { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= tsLit("1997-01-01")
          && col("l_shipdate") < tsLit("1998-01-01")
          && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
          && col("l_quantity") < 24)
        .agg(sum(expr(
          "CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)"))
          .as("revenue_cents"),
          count(lit(1)).as("n_lines"))
    }
  )

  lazy val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45 AND l_discount >= 0.05""".stripMargin,
    "q03_join_agg" ->
      """SELECT c_mktsegment, round(sum(o_totalprice),2) AS revenue,
        | count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q04_region_revenue" ->
      """SELECT n_name,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | count(*) AS n_lineitems
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        | AND o_orderdate >= TIMESTAMP '1996-01-01'
        | AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY n_name""".stripMargin,
    "q05_semi_join" ->
      """SELECT c_nationkey, count(*) AS n_customers,
        | round(sum(c_acctbal),2) AS sum_acctbal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '2001-01-01')""".stripMargin,
    "q53_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_recent_orders,
        | round(sum(coalesce(o_totalprice, 0.0)),2) AS recent_spend
        |FROM customer LEFT OUTER JOIN
        | (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01') o
        | ON c_custkey = o.o_custkey
        |GROUP BY c_custkey""".stripMargin,
    "q54_full_outer" ->
      """WITH sup AS (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
        |             FROM supplier GROUP BY 1),
        |cust AS (SELECT c_nationkey AS nationkey, count(*) AS n_rich_customers
        |         FROM customer WHERE c_acctbal > 9000 GROUP BY 1)
        |SELECT coalesce(sup.nationkey, cust.nationkey) AS nationkey,
        | coalesce(n_suppliers, 0) AS n_suppliers,
        | coalesce(n_rich_customers, 0) AS n_rich_customers
        |FROM sup FULL OUTER JOIN cust ON sup.nationkey = cust.nationkey""".stripMargin,
    "q07_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    // per-column unions re-derive the same measures; count(DISTINCT)
    // excludes NULLs in both engines
    "q91_table_profile" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_returnflag")
      cols.map { c =>
        s"""SELECT '$c' AS column_name,
           | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |   AS n_nulls,
           | count(DISTINCT $c) AS n_distinct,
           | count(*) AS n_rows
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")
    },
    "q08_distinct_counts" ->
      """SELECT count(DISTINCT l_orderkey) AS n_orders,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(DISTINCT l_returnflag) AS n_flags,
        | count(*) AS n_rows
        |FROM lineitem""".stripMargin,
    "q09_summary_stats" ->
      """SELECT count(*) AS n,
        | round(avg(c_acctbal),4) AS mean_acctbal,
        | round(stddev_samp(c_acctbal),4) AS stddev_acctbal,
        | round(min(c_acctbal),2) AS min_acctbal,
        | round(max(c_acctbal),2) AS max_acctbal
        |FROM customer""".stripMargin,
    "q10_set_ops" ->
      """WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
        |     s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        |SELECT nationkey, 'union' AS op FROM (SELECT nationkey FROM c UNION SELECT nationkey FROM s)
        |UNION ALL
        |SELECT nationkey, 'intersect' AS op FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
        |UNION ALL
        |SELECT nationkey, 'except' AS op FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)""".stripMargin,
    "q11_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q56_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | round(sum(o_totalprice),2) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin,
    "q57_setops_all" ->
      """WITH li AS (SELECT l_suppkey AS k FROM lineitem),
        |recent AS (SELECT l_suppkey AS k FROM lineitem
        |           WHERE l_shipdate >= TIMESTAMP '2000-01-01')
        |SELECT k, count(*) AS n, 'intersect_all' AS op
        |FROM (SELECT k FROM li INTERSECT ALL SELECT k FROM recent) GROUP BY k
        |UNION ALL
        |SELECT k, count(*) AS n, 'except_all' AS op
        |FROM (SELECT k FROM li EXCEPT ALL SELECT k FROM recent) GROUP BY k""".stripMargin,
    "q62_union_by_name" ->
      """WITH u AS (
        | SELECT c_name AS name, c_nationkey AS nationkey,
        |        c_acctbal AS acctbal, 'customer' AS kind FROM customer
        | UNION ALL BY NAME
        | SELECT s_name AS name, s_nationkey AS nationkey,
        |        s_acctbal AS acctbal, 'supplier' AS kind FROM supplier)
        |SELECT kind, nationkey, count(*) AS n, round(sum(acctbal),2) AS bal
        |FROM u GROUP BY kind, nationkey""".stripMargin,
    "q63_values_join" ->
      """WITH tiers(c_mktsegment, tier) AS (VALUES
        | ('AUTOMOBILE', 1), ('BUILDING', 2), ('FURNITURE', 2),
        | ('MACHINERY', 3), ('HOUSEHOLD', 3))
        |SELECT tier, count(*) AS n_customers,
        | round(avg(c_acctbal),4) AS avg_bal
        |FROM customer JOIN tiers USING (c_mktsegment)
        |GROUP BY tier""".stripMargin,
    "q48_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_extendedprice),2) AS sum_price, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q12_pivot_flag_status" ->
      """SELECT l_returnflag,
        | round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END),2) AS qty_f,
        | round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END),2) AS qty_o
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // the same exact 5·qty·cnt < sumq inequality; cents rounded per row
    "q156_small_qty_revenue" ->
      """WITH pp AS (
        | SELECT l_partkey AS pk, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sumq
        | FROM lineitem GROUP BY 1)
        |SELECT p_brand, count(*) AS n_small_lines,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |   AS revenue_cents
        |FROM lineitem l JOIN pp ON l.l_partkey = pp.pk
        | JOIN part ON l.l_partkey = p_partkey
        |WHERE CAST(l_quantity AS BIGINT) * 5 * cnt < sumq
        |GROUP BY 1""".stripMargin,
    "q157_large_orders" ->
      """WITH big AS (
        | SELECT l_orderkey,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        | FROM lineitem GROUP BY 1
        | HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        | CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents, sum_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q158_sole_late_supplier" ->
      """WITH g AS (
        | SELECT l_orderkey, l_suppkey,
        |  CAST(sum(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |    CAST(l_shipdate AS DATE)) > 365 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_late_lines
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | GROUP BY 1, 2),
        |prof AS (
        | SELECT l_orderkey AS ok, count(*) AS n_supp,
        |  CAST(sum(CASE WHEN n_late_lines > 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_late_supp
        | FROM g GROUP BY 1)
        |SELECT s_suppkey, s_name,
        | CAST(sum(n_late_lines) AS BIGINT) AS n_late_lines,
        | count(*) AS n_orders
        |FROM g JOIN prof ON g.l_orderkey = prof.ok
        | JOIN supplier ON l_suppkey = s_suppkey
        |WHERE n_late_lines > 0 AND n_supp > 1 AND n_late_supp = 1
        |GROUP BY 1, 2""".stripMargin,
    // the same two-key decorrelation: one (part, supplier) aggregate
    // with conditional integer sums, the exact 2·avail > demand gate
    "q159_excess_stock" ->
      """WITH q AS (
        | SELECT l_partkey AS pk, l_suppkey AS sk,
        |  CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |    THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
        |   AS demand97,
        |  CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |    THEN 0 ELSE CAST(l_quantity AS BIGINT) END) AS BIGINT)
        |   AS avail_other
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE p_name LIKE 'red%'
        | GROUP BY 1, 2)
        |SELECT s_suppkey, s_name, count(*) AS n_excess_parts,
        | CAST(sum(avail_other) AS BIGINT) AS stock_qty
        |FROM q JOIN supplier ON sk = s_suppkey
        |WHERE demand97 > 0 AND avail_other * 2 > demand97
        |GROUP BY 1, 2""".stripMargin,
    // the same revenue view + tie-preserving = max(view) equality on
    // exact per-row-rounded cents
    "q160_top_quarter_supplier" ->
      """WITH rev AS (
        | SELECT l_suppkey,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |   AS BIGINT)) AS BIGINT) AS total_rev_cents
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-04-01'
        | GROUP BY 1)
        |SELECT s_suppkey, s_name, total_rev_cents
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev_cents = (SELECT max(total_rev_cents) FROM rev)"""
        .stripMargin,
    // the same exact bal·n > Σ average gate and windowed NOT EXISTS
    "q161_churned_customers" ->
      """WITH pos AS (
        | SELECT c_custkey, c_nationkey,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        | FROM customer WHERE c_acctbal > 0),
        |g AS (
        | SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_cents,
        |  count(*) AS n_pos FROM pos),
        |rich AS (
        | SELECT pos.* FROM pos, g
        | WHERE bal_cents * n_pos > sum_cents),
        |ch AS (
        | SELECT r.* FROM rich r
        | WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_custkey = r.c_custkey
        |   AND o.o_orderdate >= TIMESTAMP '1999-01-01'))
        |SELECT n_name, count(*) AS n_custs,
        | CAST(sum(bal_cents) AS BIGINT) AS total_bal_cents
        |FROM ch JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,
    // the same one-nation value rollup with the exact self-scaling
    // value·n_parts > 2·total HAVING gate
    "q162_important_parts" ->
      """WITH nat AS (
        | SELECT s_suppkey FROM supplier JOIN nation
        |  ON s_nationkey = n_nationkey
        | WHERE n_name = 'NATION_3'),
        |v AS (
        | SELECT l_partkey AS p_partkey,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |   AS BIGINT)) AS BIGINT) AS value_cents
        | FROM lineitem JOIN nat ON l_suppkey = s_suppkey
        | GROUP BY 1)
        |SELECT p_partkey, value_cents
        |FROM v, (SELECT CAST(sum(value_cents) AS BIGINT) AS tc,
        |         count(*) AS np FROM v) t
        |WHERE value_cents * np > tc * 2""".stripMargin,
    // the same correlated EXISTS, run verbatim as DuckDB's own
    // decorrelation; ship lag measured in exact DATE arithmetic
    "q164_priority_late_orders" ->
      """SELECT o_orderpriority, count(*) AS n_late_orders
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        | AND o_orderdate < TIMESTAMP '1997-04-01'
        | AND EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |   AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 90)
        |GROUP BY 1""".stripMargin,
    // the same one-pass conditional aggregation; the band split is a
    // UNION ALL over the single aggregated row (DuckDB's stack)
    "q165_disjunctive_bands" ->
      """WITH j AS (
        | SELECT l_quantity, p_brand, p_size, p_type,
        |  CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |    AS cents,
        |  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity < 25) AS b1,
        |  (p_brand = 'Brand#2' AND p_size BETWEEN 16 AND 35
        |    AND l_quantity >= 25) AS b2,
        |  (p_type = 'PROMO' AND l_quantity BETWEEN 10 AND 20) AS b3
        | FROM lineitem JOIN part ON l_partkey = p_partkey),
        |f AS (SELECT * FROM j WHERE b1 OR b2 OR b3),
        |a AS (
        | SELECT
        |  CAST(sum(CASE WHEN b1 THEN cents ELSE 0 END) AS BIGINT) AS c1,
        |  count(CASE WHEN b1 THEN 1 END) AS n1,
        |  CAST(sum(CASE WHEN b2 THEN cents ELSE 0 END) AS BIGINT) AS c2,
        |  count(CASE WHEN b2 THEN 1 END) AS n2,
        |  CAST(sum(CASE WHEN b3 THEN cents ELSE 0 END) AS BIGINT) AS c3,
        |  count(CASE WHEN b3 THEN 1 END) AS n3
        | FROM f)
        |SELECT 'brand1_small' AS band, c1 AS revenue_cents, n1 AS n_lines
        | FROM a
        |UNION ALL
        |SELECT 'brand2_large', c2, n2 FROM a
        |UNION ALL
        |SELECT 'promo_mid', c3, n3 FROM a""".stripMargin,
    // the same collapse-first left join keeping the zero bucket
    "q166_order_count_distribution" ->
      """WITH per AS (
        | SELECT o_custkey, count(*) AS n FROM orders
        | WHERE o_orderpriority = '1-URGENT' GROUP BY 1)
        |SELECT coalesce(n, 0) AS c_count, count(*) AS custdist
        |FROM customer LEFT JOIN per ON c_custkey = o_custkey
        |GROUP BY 1""".stripMargin,
    // the same focus-set dimension filters and cross-nation gate
    "q167_nation_trade_flows" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS ship_year,
        | CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |   AS BIGINT)) AS BIGINT) AS revenue_cents,
        | count(*) AS n_lines
        |FROM lineitem
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation sn ON s_nationkey = sn.n_nationkey
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE sn.n_nationkey < 5 AND cn.n_nationkey < 5
        | AND sn.n_name <> cn.n_name
        |GROUP BY 1, 2, 3""".stripMargin,
    // the same one-pass cents legs; the share divides once, as DOUBLE
    // (a bare 100.0 literal is DECIMAL in DuckDB — cast explicitly)
    "q168_promo_share" ->
      """WITH m AS (
        | SELECT CAST(month(l_shipdate) AS BIGINT) AS ship_month,
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN
        |   CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |   ELSE 0 END) AS BIGINT) AS promo_cents,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |   AS BIGINT)) AS BIGINT) AS total_cents
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        | GROUP BY 1)
        |SELECT ship_month, promo_cents, total_cents,
        | round(CAST(100 AS DOUBLE) * promo_cents / total_cents, 4)
        |   AS promo_share_pct
        |FROM m""".stripMargin,
    // the same broadcast region-membership chain and one-division share
    "q169_market_share" ->
      """WITH rev AS (
        | SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |  CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |    AS cents,
        |  (sn.n_name = 'NATION_3') AS is_target
        | FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        | WHERE cn.n_regionkey = (
        |  SELECT n_regionkey FROM nation WHERE n_name = 'NATION_3'))
        |SELECT order_year,
        | CAST(sum(CASE WHEN is_target THEN cents ELSE 0 END) AS BIGINT)
        |   AS target_cents,
        | CAST(sum(cents) AS BIGINT) AS total_cents,
        | round(CAST(100 AS DOUBLE) *
        |   sum(CASE WHEN is_target THEN cents ELSE 0 END) / sum(cents), 4)
        |   AS market_share_pct
        |FROM rev GROUP BY 1""".stripMargin,
    // the same pruned-scan rollup and (revenue DESC, custkey) top-20
    "q170_returned_top_customers" ->
      """WITH rev AS (
        | SELECT o_custkey,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS returned_cents,
        |  count(*) AS n_returned_lines
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        | GROUP BY 1
        | ORDER BY returned_cents DESC, o_custkey ASC
        | LIMIT 20)
        |SELECT c_custkey, c_name, n_name, returned_cents, n_returned_lines
        |FROM rev
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "q171_shipping_priority" ->
      """SELECT l_orderkey,
        | CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |   AS BIGINT)) AS BIGINT) AS revenue_cents,
        | o_orderdate
        |FROM customer
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        | AND o_orderdate < TIMESTAMP '1997-06-01'
        | AND l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue_cents DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q172_local_supplier_volume" ->
      """SELECT n_name,
        | CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |   AS BIGINT)) AS BIGINT) AS revenue_cents,
        | count(*) AS n_lines
        |FROM customer
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE c_nationkey = s_nationkey
        | AND r_name = 'EUROPE'
        | AND o_orderdate >= TIMESTAMP '1997-01-01'
        | AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,
    "q173_forecast_revenue" ->
      """SELECT
        | CAST(sum(CAST(round(l_extendedprice * l_discount * 100)
        |   AS BIGINT)) AS BIGINT) AS revenue_cents,
        | count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        | AND l_shipdate < TIMESTAMP '1998-01-01'
        | AND l_discount >= 0.05 AND l_discount <= 0.07
        | AND l_quantity < 24""".stripMargin
  )
}
