package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.{AsOfJoin, AsOfJoinNativeApi, RangeJoin, SaltedJoin}

/** Extended relational surface: as-of join, skew-salted join,
  * correlated-subquery shape, HAVING, string/date scalar functions,
  * conditional aggregation, unpivot, and approximate distinct counts.
  */
object Extended {

  /** 32-bit Morton code: bit i of x lands at position 2i, bit i of y at
    * 2i+1. Bits never overlap, so the terms sum without carries — `+`
    * is `|`, and the identical arithmetic rendering runs in DuckDB.
    * Used by q73 and by LayoutSpec's clustering-bound proof. */
  private[graft] def morton16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The DuckDB rendering of [[morton16]]: same shift/mask/scale terms,
    * generated from the same loop so the two engines cannot drift. */
  private def mortonSql(x: String, y: String): String =
    (0 until 16).flatMap { i =>
      Seq(s"(($x >> $i) & 1) * ${1L << (2 * i)}",
        s"(($y >> $i) & 1) * ${1L << (2 * i + 1)}")
    }.mkString(" + ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // FUZZY ENTITY MATCH, exactness baseline — the blocked
    // edit-distance join: candidate pairs come only from equal-brand
    // BLOCKS (the join key), then codegen'd levenshtein ≤ 5 confirms.
    // SCALE NOTE: within-block cost is quadratic in block size (8M
    // pairs at sf0.1's 800-part brands — the registry's most
    // expensive row), so this is the recall ORACLE for fuzzy
    // matching, the q85 sorted-neighborhood variant is the linear
    // production path — the same split as s34 (exact) vs s35/s37
    // (banded/bucketed). Both engines implement the classic
    // Wagner–Fischer edit distance, so `dist` is exact.
    "q83_fuzzy_match" -> { (s, d) =>
      val p = t(s, d, "part")
        .select(col("p_partkey"), col("p_name"), col("p_brand"))
      val maxRows = s.conf.get("spark.graft.exact.maxRows", "1000000").toLong
      val n = p.count()
      require(n <= maxRows,
        s"q83_fuzzy_match is the blocked-quadratic exactness baseline " +
          s"(within-block all-pairs); input has $n rows > " +
          s"spark.graft.exact.maxRows=$maxRows — use " +
          "q85_fuzzy_neighborhood (sorted neighborhood, linear) at scale")
      // threshold form: banded O(len·5) edit distance with early exit
      // (-1 past the bound) instead of the full O(len²) matrix — the
      // kept rows and their distances are identical, only the >5 pairs
      // (the overwhelming majority of the block square) get cheaper.
      // LENGTH-BAND PREFILTER (r17): edit distance ≥ |len(a)−len(b)|,
      // so a pair whose lengths differ by more than the threshold can
      // never pass. MEASURED no-op on THIS corpus (part names are
      // 7–12 chars, every pair within the band) — kept as free
      // insurance for long-name corpora; the DP's early exit is what
      // bounds per-pair cost here.
      // TRIANGLE DECOMPOSITION (r17): the block square join on
      // p_brand alone has #brands join keys (25 at every SF — TPC-H
      // brands don't scale with rows), so the pair-enumeration stage
      // ran ~25-way forever regardless of cluster size. Each row salts
      // into S=8 sub-buckets by key hash; an unordered pair (x, y)
      // lands in EXACTLY ONE cell (min(gx,gy), max(gx,gy)): the A side
      // replicates x to cells (gx, j≥gx), the B side replicates y to
      // cells (i≤gy, gy), and same-cell pairs dedupe on ka < kb. Join
      // keys: #brands × S(S+1)/2 = 900 — the enumeration parallelizes
      // to any cluster width while output rows are BYTE-IDENTICAL
      // (canonicalized via least/greatest); the oracle is untouched.
      // Measured at sf0.1: 17.6 s → 2.6 s isolated (with the probe
      // spread below). S is the 100 TB knob (the phash.bandBits
      // posture): widen it when blocks outgrow task-sized cells —
      // replication cost grows only (S+1)/2 per side while cell count
      // grows S²/2. Output is S-invariant (pairs don't care which
      // cell they land in), so the knob never touches the oracle.
      val S = {
        val v = s.conf.get("spark.graft.fuzzy.buckets", "8").toInt
        require(v >= 1 && v <= 256,
          s"spark.graft.fuzzy.buckets must be in [1, 256], got $v")
        v
      }
      val withG = p.withColumn("g",
        pmod(xxhash64(col("p_partkey")), lit(S)).cast("int"))
      // part.parquet is a single split at every SF, and the planner
      // broadcasts the (smaller) B side — without an explicit spread
      // the ENTIRE pair loop runs in one task (measured: 17.6 s at
      // sf0.1, single-task; the cell keys alone fix nothing under a
      // broadcast join). Spread the probe side on the cell key so each
      // of the 900 cells' pair loops lands on its own task (the d32
      // single-file repartition discipline).
      val aSide = withG
        .withColumn("gj", explode(sequence(col("g"), lit(S - 1))))
        .select(col("p_brand"), col("g").as("gi"), col("gj"),
          col("p_partkey").as("ka"), col("p_name").as("na"))
        .repartition(s.sparkContext.defaultParallelism,
          col("p_brand"), col("gi"), col("gj"))
      val bSide = withG
        .withColumn("gi", explode(sequence(lit(0), col("g"))))
        .select(col("p_brand").as("bb"), col("gi").as("gib"),
          col("g").as("gjb"), col("p_partkey").as("kb"),
          col("p_name").as("nb"))
      aSide.join(bSide,
          col("p_brand") === col("bb") && col("gi") === col("gib") &&
            col("gj") === col("gjb") &&
            (col("gi") =!= col("gj") || col("ka") < col("kb")) &&
            abs(length(col("na")) - length(col("nb"))) <= 5)
        .withColumn("dist", levenshtein(col("na"), col("nb"), 5))
        .filter(col("dist") >= 0)
        .select(col("p_brand"),
          least(col("ka"), col("kb")).as("ia"),
          greatest(col("ka"), col("kb")).as("ib"),
          col("dist").cast("long").as("dist"))
    },

    // FUZZY MATCH, production path — SORTED NEIGHBORHOOD (Hernández &
    // Stolfo): within each block, rows sort by name and each row
    // compares only to its next w=20 neighbors, so candidate count is
    // w·N — LINEAR in block size where q83 is quadratic. The
    // neighbor band is generated by exploding each row's rank to its
    // w successor ranks and EQUI-joining on (brand, rank) — bounded
    // 20× fan-out, never a rank-range theta join that would still
    // enumerate the block square. Deterministic rank order
    // (p_name, p_partkey) → fully oracle-checked; pairs re-canonicalize
    // to ia < ib. Recall vs the q83 exact baseline is asserted in
    // scalatest — near-identical names sort adjacent, which is the
    // whole premise of the method.
    // SCALE NOTE: the rank itself is DISTRIBUTED (DistributedRank
    // .rowNumber, the t31 prefix-offset discipline) — a bare
    // `row_number() over (partition by p_brand)` would sort each
    // brand's whole block in ONE task (part has 25 brands → 25-way
    // parallelism forever); blocking on the 2-char name prefix
    // multiplies that by #prefixes, and the prefix width is the knob
    // to widen as the corpus grows. Bitwise-identical ranks (the
    // prefix is monotone in p_name), so the oracle is unchanged.
    "q85_fuzzy_neighborhood" -> { (s, d) =>
      val r = graft.operators.DistributedRank.rowNumber(
        t(s, d, "part")
          .select(col("p_partkey"), col("p_name"), col("p_brand")),
        group = Seq("p_brand"),
        order = Seq(col("p_name").asc, col("p_partkey").asc),
        blockKey = substring(col("p_name"), 1, 2),
        out = "rn")
      val probes = r
        .withColumn("nr", explode(sequence(col("rn") + 1, col("rn") + 20)))
        .select(col("p_brand"), col("p_partkey").as("ka"),
          col("p_name").as("na"), col("nr"))
      probes.join(
          r.select(col("p_brand").as("bb"), col("p_partkey").as("kb"),
            col("p_name").as("nb"), col("rn")),
          col("p_brand") === col("bb") && col("nr") === col("rn") &&
            // q83's length-band prefilter: dist ≥ |len diff|, so pairs
            // more than 5 apart in length skip the banded DP entirely
            abs(length(col("na")) - length(col("nb"))) <= 5)
        .withColumn("dist", levenshtein(col("na"), col("nb"), 5))
        .filter(col("dist") >= 0)
        .select(col("p_brand"),
          least(col("ka"), col("kb")).as("ia"),
          greatest(col("ka"), col("kb")).as("ib"),
          col("dist").cast("long").as("dist"))
    },

    // As-of join: every error event picks up the user's most recent
    // prior (or simultaneous) purchase. Custom operator — see
    // graft.operators.AsOfJoin; DuckDB's native ASOF JOIN is the oracle.
    "q37_asof_join" -> { (s, d) =>
      val ev = t(s, d, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("pts"))
        .agg(max(col("value")).as("pvalue"))
      AsOfJoin.asofJoin(errors, purchases, Seq("user_id"), "ts", "pts")
    },

    // The SAME as-of join through the native custom operator
    // (LogicalPlan + Strategy + one-pass sort-merge exec,
    // graft.plans.AsOfJoinNative) — identical oracle as q37.
    "q58_asof_native" -> { (s, d) =>
      val ev = t(s, d, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("pts"))
        .agg(max(col("value")).as("pvalue"))
      AsOfJoinNativeApi.asofJoin(errors, purchases, Seq("user_id"),
        "ts", "pts")
    },

    // Skew-salted fact⋈dim join — result identical to the plain join
    // (the oracle is the unsalted SQL), execution fans each part key
    // over 8 salt buckets. See graft.operators.SaltedJoin.
    "q38_salted_join" -> { (s, d) =>
      val li = t(s, d, "lineitem")
        .withColumnRenamed("l_partkey", "p_partkey")
      SaltedJoin.saltedJoin(li, t(s, d, "part"), "p_partkey",
          saltFrom = Seq("l_orderkey", "l_linenumber"))
        .groupBy(col("p_type"))
        .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // JOIN-KEY SKEW REPORT — the diagnostic an operator reads BEFORE
    // reaching for q38's salted join: the per-key count distribution of
    // a prospective shuffle key (events.user_id), reduced to the
    // numbers that drive the decision — total rows, distinct keys, the
    // heaviest key, the top-10 keys' share of all rows, and the exact
    // Gini coefficient of the count distribution (0 = uniform, → 1 =
    // one key owns the table). Gini uses the rank-weighted identity
    // G = 2·Σ i·c_(i) / (n·Σc) − (n+1)/n over counts sorted ascending;
    // the rank comes from DistributedRank (per-block row_number +
    // broadcast prefix offsets, block = bit-length of the count — the
    // d48 trick — so no one-task global sort), and Σ i·c is EXACT
    // 64-bit integer arithmetic, making the only FP the two final
    // divisions — identical IEEE ops in both engines. Top-10 runs
    // through TakeOrderedAndProject (bounded heap, no global sort).
    "q102_skew_report" -> { (s, d) =>
      val perKey = t(s, d, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("c"))
      val ranked = graft.operators.DistributedRank.rowNumber(
        perKey, Seq.empty, Seq(col("c").asc, col("user_id").asc),
        length(bin(col("c"))) - 1, "rnk")
      val agg1 = ranked.agg(count(lit(1)).as("n_keys"),
        sum(col("c")).as("n_rows"),
        max(col("c")).as("max_count"),
        sum(col("rnk") * col("c")).as("s_rank"))
      val top10 = perKey.orderBy(col("c").desc, col("user_id").asc)
        .limit(10).agg(sum(col("c")).as("top10"))
      agg1.crossJoin(broadcast(top10))
        .select(col("n_rows"), col("n_keys"), col("max_count"),
          round(col("top10") / col("n_rows"), 6).as("top10_share"),
          round((lit(2.0d) * col("s_rank")) /
              (col("n_keys") * col("n_rows")) -
            (col("n_keys") + lit(1.0d)) / col("n_keys"), 6).as("gini"))
    },

    // Correlated-subquery shape: customers above their nation's average
    // balance (decorrelated into an aggregate + equi-join, which is what
    // a correlated scalar subquery plans to anyway).
    "q39_above_nation_avg" -> { (s, d) =>
      val c = t(s, d, "customer")
      val nav = c.groupBy(col("c_nationkey"))
        .agg(avg(col("c_acctbal")).as("nation_avg"))
      c.join(nav, "c_nationkey")
        .filter(col("c_acctbal") > col("nation_avg"))
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          round(col("nation_avg"), 4).as("nation_avg"))
    },

    // HAVING: populous (nation, segment) customer groups only.
    "q40_having" -> { (s, d) =>
      t(s, d, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
        .filter(col("n") >= 15)
    },

    // String scalar functions with a LIKE-pushdown filter.
    "q41_string_funcs" -> { (s, d) =>
      t(s, d, "part")
        .filter(col("p_name").like("%a%") &&
          col("p_type").isin("ECONOMY", "SMALL"))
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_uc"),
          concat_ws("/", col("p_type"), col("p_brand")).as("type_brand"),
          substring(col("p_name"), 1, 5).as("name_prefix"),
          length(col("p_name")).cast("long").as("name_len"))
    },

    // Date-part extraction + aggregation.
    "q42_date_parts" -> { (s, d) =>
      t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          quarter(col("o_orderdate")).cast("long").as("qtr"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
    },

    // Conditional aggregation per user (counts/sums/max over a predicate
    // slice without a second scan).
    "q43_conditional_agg" -> { (s, d) =>
      t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          expr("count(CASE WHEN event_type = 'purchase' THEN 1 END)")
            .as("n_purchases"),
          round(sum(when(col("event_type") === "purchase", col("value"))
            .otherwise(0.0)), 2).as("purchase_value"),
          max(when(col("event_type") === "purchase", col("ts")))
            .as("last_purchase_ts"))
    },

    // Unpivot (wide metrics → long) — Spark Dataset.unpivot.
    "q44_unpivot" -> { (s, d) =>
      t(s, d, "customer")
        .groupBy(col("c_nationkey"))
        .agg(round(sum(col("c_acctbal")), 2).as("sum_acctbal"),
          count(lit(1)).cast("double").as("n_customers"))
        .unpivot(Array(col("c_nationkey")),
          Array(col("sum_acctbal"), col("n_customers")),
          "metric", "value")
    },

    // Range (point-in-interval) join: customers whose balance falls in
    // a nation's supplier min-max balance band. Custom operator — see
    // graft.operators.RangeJoin (bucketed equi-join, no cross product);
    // the oracle is the naive BETWEEN join.
    "q55_range_join" -> { (s, d) =>
      val bands = t(s, d, "supplier")
        .groupBy(col("s_nationkey").as("band_nation"))
        .agg(min(col("s_acctbal")).as("lo"), max(col("s_acctbal")).as("hi"))
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
      RangeJoin.pointInInterval(cust, bands, "c_acctbal", "lo", "hi", 500.0)
        .groupBy(col("band_nation"))
        .agg(count(lit(1)).as("n_customers_in_band"),
          round(avg(col("c_acctbal")), 4).as("avg_in_band"))
    },

    // Deterministic hash-based train/valid/test split (80/10/10) — the
    // 100 TB-safe way to split a corpus: assignment is a pure function
    // of the row key (first 24 bits of md5 mod 100), so it is stable
    // under retries, repartitioning, and incremental arrivals — no
    // randomSplit, no seed to lose. The PORTABLE hash (hex via conv /
    // strpos nibbles, the d32 discipline) keeps it oracle-checkable;
    // sum(doc_id) in the output catches any single-row reassignment.
    "q65_hash_split" -> { (s, d) =>
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 6),
        16, 10).cast("long") % 100
      t(s, d, "documents")
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "valid")
            .otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_id"))
    },

    // Correlated LATERAL subquery join (SQL API surface): top-2
    // customers by balance per nation, written the way an analyst
    // writes it. Catalyst decorrelates the per-row ORDER BY/LIMIT into
    // a ranked window join — no per-nation re-execution — so the SQL
    // convenience costs one shuffle, same as the window rendering.
    "q66_lateral_join" -> { (s, d) =>
      graft.Tables.registerViews(s, d)
      s.sql("""SELECT n.n_name, c.c_custkey, c.c_acctbal
              |FROM nation n, LATERAL (
              |  SELECT c_custkey, c_acctbal FROM customer
              |  WHERE c_nationkey = n.n_nationkey
              |  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) c
              |""".stripMargin)
    },

    // Time-grid resample + forward-fill — the feature-pipeline
    // gap-filling shape: per user, an hourly grid spanning that user's
    // activity, hours with no events carrying the last observed hourly
    // value forward. Grid generation is sequence()+explode (map-side,
    // no shuffle beyond the per-user agg); the fill is one
    // last(ignoreNulls) running window — never a self-join per gap.
    "q67_resample_ffill" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("value"))
      val grid = ev.groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("h0"),
          date_trunc("hour", max(col("ts"))).as("h1"))
        .select(col("user_id"), explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("hour"))
      val hourly = ev
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(round(sum(col("value")), 2).as("hv"),
          count(lit(1)).as("n"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "hour"), "left")
        .select(col("user_id"), col("hour"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          last(col("hv"), ignoreNulls = true).over(w).as("filled_value"))
    },

    // HLL approximate distinct counts — the 100 TB rendering of q08.
    // Sketches differ across engines → rows-only; relative-error bound
    // vs the exact counts is asserted in scalatest.
    // Z-ORDER (Morton) interleave key — the multi-dimensional data-
    // layout primitive behind Delta/Iceberg OPTIMIZE ZORDER BY: sorting
    // or range-partitioning a 100 TB table by this key clusters BOTH
    // dimensions into every file, so parquet footer min/max stats prune
    // 2-D box predicates where a single-column sort only prunes one
    // dimension (LayoutSpec proves the clustering bound: an aligned
    // 32x32 box touches 1 z-bucket vs 8 single-dim buckets). The key
    // itself is pure integer bit math — 16 bits per dimension
    // interleaved — evaluated identically in both engines (non-
    // overlapping bits, so + is |). Map-only: zero exchanges; the sort
    // that USES the key is the writer's repartitionByRange, not part of
    // key computation.
    "q73_zorder_key" -> { (s, d) =>
      val x = pmod(col("l_partkey"), lit(65536L))
      val y = pmod(col("l_suppkey"), lit(65536L))
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          x.as("x"), y.as("y"),
          morton16(x, y).as("zkey"))
    },

    "q45_approx_distinct" -> { (s, d) =>
      t(s, d, "lineitem").agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("approx_supps"))
    },

    // PORTABLE KMV DISTINCT SKETCH — q45's problem with d36's trick:
    // approx_count_distinct's HLL is engine-private (rows-only for the
    // driver), but the K-MINIMUM-VALUES estimator (Bar-Yossef et al.)
    // is pure integer arithmetic over a portable hash, so BOTH engines
    // compute the identical sketch and the estimate hash-checks
    // bit-for-bit: per group, keep the k=64 smallest distinct 48-bit
    // md5-prefix hashes; density (k-1)/frac(h_k) estimates the
    // distinct count, exact when fewer than k survive. Mergeable like
    // any KMV (union the kept sets, re-take k smallest). At 100 TB:
    // one (group, hash) distinct shuffle, then the NATIVE TopKPerKey
    // bounded heap — k rows per group cross the final exchange, never
    // the value set.
    "q90_kmv_distinct" -> { (s, d) =>
      val k = 64
      val estNum = (k - 1).toLong * (1L << 48) // (k-1) · 2^48
      val h = t(s, d, "lineitem")
        .select(col("l_returnflag"),
          conv(substring(md5(col("l_partkey").cast("string")), 1, 12), 16, 10)
            .cast("long").as("h"))
        .distinct()
      graft.operators.TopKPerKeyApi.topKPerKey(h, Seq("l_returnflag"),
          Seq(("h", true)), k)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
        .select(col("l_returnflag"), col("n_kept"),
          // greatest(hk,1): h_k = 0 with n_kept == k (astronomically
          // unlikely, but possible) would divide by zero — the guard
          // makes the estimator total, mirrored in the oracle.
          when(col("n_kept") < k, col("n_kept"))
            .otherwise(expr(s"$estNum div greatest(hk, 1)"))
            .cast("long").as("kmv_distinct"))
    },

    // ROLLUP — hierarchical subtotals (region → nation → grand total)
    // in ONE pass: Catalyst's Expand node replicates each input row per
    // grouping set BEFORE the exchange, so partial aggregation still
    // applies and the corpus shuffles once, not once per level.
    // grouping_id() disambiguates real NULL keys from rolled-up rows
    // (same bit order as DuckDB's GROUPING(): first arg = MSB).
    // Aggregates are integer-exact (count + sum of integral quantity)
    // so subtotals hash-match bitwise regardless of accumulation order.
    "q72_grouping_id" -> { (s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
    },

    // ER BLOCKING-COST SWEEP — the planning table an entity-resolution
    // run reads BEFORE materializing any candidate pair (q85's
    // sorted-neighborhood and q83's fenced exact baseline both assume
    // someone chose a blocking key; this is how). Four candidate rules
    // over customers, each scored from its BLOCK-SIZE AGGREGATE alone:
    // block count, candidate pairs Σ b(b−1)/2, the largest block (the
    // straggler), and the cost ratio vs the full cross product — all
    // integer until the one ratio division, and no pair is ever
    // materialized, which is exactly why this works at 10⁹ rows where
    // running the join to find out would not. A rule with few giant
    // blocks (segment) and a rule with tiny ones (balance bucket)
    // bracket the trade visibly.
    "q129_blocking_sweep" -> { (s, d) =>
      val c = t(s, d, "customer")
      val rules: Seq[(String, org.apache.spark.sql.Column)] = Seq(
        "nation" -> col("c_nationkey").cast("string"),
        "segment" -> col("c_mktsegment"),
        "nation_x_segment" ->
          concat_ws("|", col("c_nationkey"), col("c_mktsegment")),
        "balance_bucket" ->
          floor(col("c_acctbal") / 1000.0).cast("long").cast("string"))
      rules.map { case (name, key) =>
        c.select(key.as("blk"))
          .groupBy(col("blk")).agg(count(lit(1)).as("b"))
          .agg(count(lit(1)).as("n_blocks"), sum(col("b")).as("n_rows"),
            sum(expr("(b * (b - 1)) div 2")).as("candidate_pairs"),
            max(col("b")).as("max_block"))
          .select(lit(name).as("rule"), col("n_blocks"), col("n_rows"),
            col("candidate_pairs"), col("max_block"),
            round(col("candidate_pairs") /
              expr("(n_rows * (n_rows - 1)) div 2"), 6)
              .as("cost_ratio"))
      }.reduce(_.unionAll(_))
    }
  )

  /** q65 oracle: rebuild the 24-bit hex prefix nibble-by-nibble
    * (DuckDB has no conv()). */
  private def q65Oracle: String = {
    val nibs = (1 to 6).map(p =>
      s"(strpos('0123456789abcdef', substring(hx, $p, 1)) - 1)")
    val value = nibs.reduce((acc, n) => s"($acc * 16 + $n)")
    s"""WITH b AS (
       | SELECT doc_id, ($value) % 100 AS bucket
       | FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx
       |       FROM documents))
       |SELECT CASE WHEN bucket < 80 THEN 'train'
       |            WHEN bucket < 90 THEN 'valid'
       |            ELSE 'test' END AS split,
       | count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_id
       |FROM b GROUP BY 1""".stripMargin
  }

  /** q90 oracle: the identical KMV sketch — the 48-bit md5-prefix hash
    * rebuilt nibble-by-nibble (the d36/d32 strpos discipline ≡ Spark's
    * conv(hex,16,10)), the same k=64 smallest-per-group selection via
    * row_number, the same (k-1)·2^48 // h_k integer estimate. */
  private def q90Oracle: String = {
    val h48 = (1 to 12).map { j =>
      val w = 1L << (4 * (12 - j))
      s"(CAST(strpos('0123456789abcdef', substring(hx, $j, 1)) - 1 AS BIGINT) * $w)"
    }.mkString(" + ")
    val estNum = 63L * (1L << 48)
    s"""WITH hx AS (
       | SELECT DISTINCT l_returnflag, md5(CAST(l_partkey AS VARCHAR)) AS hx
       | FROM lineitem),
       |h AS (SELECT DISTINCT l_returnflag, ($h48) AS h FROM hx),
       |r AS (
       | SELECT l_returnflag, h,
       |  row_number() OVER (PARTITION BY l_returnflag ORDER BY h ASC) AS rn
       | FROM h)
       |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_kept,
       | CAST(CASE WHEN count(*) < 64 THEN count(*)
       |      ELSE $estNum // greatest(max(h), 1) END AS BIGINT) AS kmv_distinct
       |FROM r WHERE rn <= 64 GROUP BY 1""".stripMargin
  }

  lazy val oracle: Map[String, String] = Map(
    "q90_kmv_distinct" -> q90Oracle,
    // the same rank-weighted Gini identity over the single-window
    // row_number rendering (DistributedRank is bitwise identical to it)
    "q102_skew_report" ->
      """WITH pk AS (
        | SELECT user_id, count(*) AS c FROM events GROUP BY 1),
        |r AS (
        | SELECT user_id, c,
        |  row_number() OVER (ORDER BY c, user_id) AS rnk FROM pk),
        |a AS (
        | SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
        |  CAST(max(c) AS BIGINT) AS max_count,
        |  CAST(sum(rnk * c) AS BIGINT) AS s_rank
        | FROM r),
        |t10 AS (
        | SELECT CAST(sum(c) AS BIGINT) AS top10 FROM (
        |  SELECT c FROM pk ORDER BY c DESC, user_id ASC LIMIT 10))
        |SELECT a.n_rows, a.n_keys, a.max_count,
        | round(t10.top10 / a.n_rows, 6) AS top10_share,
        | round((2.0 * a.s_rank) / (a.n_keys * a.n_rows)
        |   - (a.n_keys + 1.0) / a.n_keys, 6) AS gini
        |FROM a, t10""".stripMargin,
    // the same equal-brand blocking and the same classic edit distance
    "q83_fuzzy_match" ->
      """SELECT a.p_brand, a.p_partkey AS ia, b.p_partkey AS ib,
        | CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 5""".stripMargin,
    // the identical deterministic (p_name, p_partkey) rank order and
    // w=20 neighbor band; the oracle states the band as a rank-range
    // join (DuckDB-side performance is irrelevant)
    "q85_fuzzy_neighborhood" ->
      """WITH r AS (
        | SELECT p_partkey, p_name, p_brand,
        |  row_number() OVER (PARTITION BY p_brand
        |    ORDER BY p_name ASC, p_partkey ASC) AS rn
        | FROM part),
        |pr AS (
        | SELECT a.p_brand, a.p_partkey AS ka, a.p_name AS na,
        |        b.p_partkey AS kb, b.p_name AS nb
        | FROM r a JOIN r b ON a.p_brand = b.p_brand
        |   AND b.rn > a.rn AND b.rn <= a.rn + 20)
        |SELECT p_brand, least(ka, kb) AS ia, greatest(ka, kb) AS ib,
        | CAST(levenshtein(na, nb) AS BIGINT) AS dist
        |FROM pr WHERE levenshtein(na, nb) <= 5""".stripMargin,
    // bit terms generated by the same Scala loop as the Spark plan
    "q73_zorder_key" ->
      s"""WITH b AS (
         | SELECT l_orderkey, l_linenumber,
         |  l_partkey % 65536 AS x, l_suppkey % 65536 AS y
         | FROM lineitem)
         |SELECT l_orderkey, l_linenumber, x, y,
         | ${mortonSql("x", "y")} AS zkey
         |FROM b""".stripMargin,
    "q65_hash_split" -> q65Oracle,
    // the SAME lateral SQL runs in DuckDB verbatim
    "q66_lateral_join" ->
      """SELECT n.n_name, c.c_custkey, c.c_acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) c""".stripMargin,
    "q67_resample_ffill" ->
      """WITH ev AS (
        | SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |b AS (
        | SELECT user_id, date_trunc('hour', min(ts)) AS h0,
        |  date_trunc('hour', max(ts)) AS h1
        | FROM ev GROUP BY 1),
        |grid AS (
        | SELECT user_id,
        |  unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        | FROM b),
        |hourly AS (
        | SELECT user_id, date_trunc('hour', ts) AS hour,
        |  round(sum(value), 2) AS hv, count(*) AS n
        | FROM ev GROUP BY 1, 2)
        |SELECT g.user_id, g.hour, coalesce(h.n, 0) AS n_events,
        | last_value(h.hv IGNORE NULLS) OVER (PARTITION BY g.user_id
        |   ORDER BY g.hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS filled_value
        |FROM grid g LEFT JOIN hourly h USING (user_id, hour)""".stripMargin,
    "q37_asof_join" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |           FROM events WHERE event_type = 'error'),
        |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, max(value) AS pvalue
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT e.user_id, e.ts, e.event_id,
        |       p.pts AS asof_pts, p.pvalue AS asof_pvalue
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts >= p.pts""".stripMargin,
    "q58_asof_native" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |           FROM events WHERE event_type = 'error'),
        |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, max(value) AS pvalue
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT e.user_id, e.ts, e.event_id,
        |       p.pts AS asof_pts, p.pvalue AS asof_pvalue
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts >= p.pts""".stripMargin,
    "q38_salted_join" ->
      """SELECT p_type, round(sum(l_extendedprice),2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type""".stripMargin,
    "q39_above_nation_avg" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        | round(nation_avg,4) AS nation_avg
        |FROM (SELECT c_custkey, c_nationkey, c_acctbal,
        |       avg(c_acctbal) OVER (PARTITION BY c_nationkey) AS nation_avg
        |      FROM customer)
        |WHERE c_acctbal > nation_avg""".stripMargin,
    "q40_having" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS n,
        | round(sum(c_acctbal),2) AS sum_acctbal
        |FROM customer GROUP BY 1, 2 HAVING count(*) >= 15""".stripMargin,
    "q41_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_uc,
        | concat_ws('/', p_type, p_brand) AS type_brand,
        | substr(p_name, 1, 5) AS name_prefix,
        | CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part
        |WHERE p_name LIKE '%a%' AND p_type IN ('ECONOMY', 'SMALL')""".stripMargin,
    "q42_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        | CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        | count(*) AS n_orders, round(sum(o_totalprice),2) AS revenue
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q43_conditional_agg" ->
      """SELECT user_id, count(*) AS n_events,
        | count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
        | round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END),2)
        |   AS purchase_value,
        | CAST(max(CASE WHEN event_type = 'purchase' THEN ts END) AS TIMESTAMP)
        |   AS last_purchase_ts
        |FROM events GROUP BY user_id""".stripMargin,
    "q55_range_join" ->
      """WITH bands AS (
        | SELECT s_nationkey AS band_nation, min(s_acctbal) AS lo,
        |  max(s_acctbal) AS hi
        | FROM supplier GROUP BY 1)
        |SELECT band_nation, count(*) AS n_customers_in_band,
        | round(avg(c_acctbal),4) AS avg_in_band
        |FROM customer JOIN bands ON c_acctbal BETWEEN lo AND hi
        |GROUP BY band_nation""".stripMargin,
    "q44_unpivot" ->
      """WITH m AS (SELECT c_nationkey,
        |  round(sum(c_acctbal),2) AS sum_acctbal,
        |  CAST(count(*) AS DOUBLE) AS n_customers
        | FROM customer GROUP BY 1)
        |SELECT c_nationkey, 'sum_acctbal' AS metric, sum_acctbal AS value FROM m
        |UNION ALL
        |SELECT c_nationkey, 'n_customers' AS metric, n_customers AS value FROM m""".stripMargin,
    "q72_grouping_id" ->
      """SELECT r_name, n_name,
        | CAST(GROUPING(r_name, n_name) AS INTEGER) AS gid,
        | count(*) AS n_items,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,
    // the same four key renderings; all pair arithmetic in integer
    // (b(b-1) div 2), one ratio division at the end
    "q129_blocking_sweep" -> {
      def arm(rule: String, key: String) =
        s"""SELECT '$rule' AS rule, count(*) AS n_blocks,
           | CAST(sum(b) AS BIGINT) AS n_rows,
           | CAST(sum((b * (b - 1)) // 2) AS BIGINT) AS candidate_pairs,
           | CAST(max(b) AS BIGINT) AS max_block,
           | round(sum((b * (b - 1)) // 2) /
           |   ((sum(b) * (sum(b) - 1)) // 2), 6) AS cost_ratio
           |FROM (SELECT $key AS blk, count(*) AS b
           |      FROM customer GROUP BY 1)""".stripMargin
      Seq(
        arm("nation", "CAST(c_nationkey AS VARCHAR)"),
        arm("segment", "c_mktsegment"),
        arm("nation_x_segment",
          "concat(CAST(c_nationkey AS VARCHAR), '|', c_mktsegment)"),
        arm("balance_bucket",
          "CAST(CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS VARCHAR)")
      ).mkString("\nUNION ALL\n")
    }
  )
}
