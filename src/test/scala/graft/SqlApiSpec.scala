package graft

import org.scalatest.funsuite.AnyFunSuite

/** The engine surface through plain SQL: registered views + the custom
  * cosine_sim function, results identical to the DataFrame API. */
class SqlApiSpec extends AnyFunSuite with SparkTestBase {

  test("spark.sql over registered views matches the DataFrame query") {
    Tables.registerViews(spark, sf0001)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(_.toString).sorted
    val viaDf = SparkEntry.queries("q01_pricing_summary")(spark, sf0001)
      .collect().map(_.toString).sorted
    assert(viaSql.sameElements(viaDf))
  }

  test("custom cosine_sim is callable from SQL") {
    Tables.registerViews(spark, sf0001)
    val self = spark.sql(
      """SELECT cosine_sim(CAST(embedding AS ARRAY<DOUBLE>),
        |                  CAST(embedding AS ARRAY<DOUBLE>)) AS c
        |FROM embeddings LIMIT 5""".stripMargin).collect()
    assert(self.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("custom gear_chunks_clamped is callable from SQL and partitions every document") {
    Tables.registerViews(spark, sf0001)
    graft.functions.VectorFunctions.register(spark)
    val rows = spark.sql(
      """SELECT doc_id,
        |  aggregate(transform(gear_chunks_clamped(encode(text, 'utf-8'),
        |                                          16, 4096),
        |                      c -> c.cbytes), 0L, (a, x) -> a + x)
        |    AS chunk_bytes,
        |  octet_length(encode(text, 'utf-8')) AS payload_bytes
        |FROM documents WHERE length(text) > 0 LIMIT 50""".stripMargin)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) === r.getInt(2).toLong,
      s"doc ${r.getLong(0)}: chunks must partition the payload"))
  }

  test("gear_chunks_clamped rejects non-literal and NULL clamps with a named AnalysisException") {
    Tables.registerViews(spark, sf0001)
    graft.functions.VectorFunctions.register(spark)
    // a column clamp (non-foldable) must fail analysis, not NPE at eval
    val nonFoldable = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT gear_chunks_clamped(encode(text, 'utf-8'),
          |                           CAST(doc_id AS INT), 4096)
          |FROM documents LIMIT 1""".stripMargin).collect()
    }
    assert(nonFoldable.getMessage.contains("gear_chunks_clamped"),
      s"error must name the function: ${nonFoldable.getMessage}")
    // a NULL literal folds but evals to null — same named failure, not
    // an opaque NullPointerException
    val nullLit = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT gear_chunks_clamped(encode(text, 'utf-8'),
          |                           CAST(NULL AS INT), 4096)
          |FROM documents LIMIT 1""".stripMargin).collect()
    }
    assert(nullLit.getMessage.contains("gear_chunks_clamped") &&
      nullLit.getMessage.contains("NULL"),
      s"error must name the function and the NULL: ${nullLit.getMessage}")
  }

  test("custom simhash48 aggregate is callable from SQL GROUP BY") {
    Tables.registerViews(spark, sf0001)
    graft.functions.VectorFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT doc_id, simhash48(tok) AS sig
        |FROM (SELECT doc_id, explode(split(trim(text), '\\s+')) AS tok
        |      FROM documents WHERE length(trim(text)) > 0)
        |GROUP BY doc_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDf = graft.Tables.t(spark, sf0001, "documents")
      .filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.trim(
          org.apache.spark.sql.functions.col("text"))) > 0)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.trim(
              org.apache.spark.sql.functions.col("text")), "\\s+")).as("tok"))
      .groupBy("doc_id")
      .agg(graft.functions.SimHash48Agg.simhash48(
        org.apache.spark.sql.functions.col("tok")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql.nonEmpty && viaSql === viaDf)
  }

  test("custom dot_product is callable from SQL and agrees with cosine on normalized inputs") {
    Tables.registerViews(spark, sf0001)
    graft.functions.VectorFunctions.register(spark)
    val rows = spark.sql(
      """SELECT dot_product(e, e) AS ip, cosine_sim(e, e) AS c
        |FROM (SELECT CAST(embedding AS ARRAY<DOUBLE>) AS e
        |      FROM embeddings LIMIT 5)""".stripMargin).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) > 0.0, "self inner product must be positive")
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    }
  }

  test("events view exposes micros timestamps through SQL (ns parquet handled)") {
    Tables.registerViews(spark, sf0001)
    val n = spark.sql(
      "SELECT count(*) FROM events WHERE ts >= TIMESTAMP '2024-01-01'")
      .head().getLong(0)
    assert(n === 1000L)
  }
}
