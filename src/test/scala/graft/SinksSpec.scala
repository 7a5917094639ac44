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

  test("JSON source round-trip preserves values and timestamp types via schema") {
    val out = Files.createTempDirectory("graft-json").toString + "/events"
    val events = Tables.t(spark, sf0001, "events")
    // default JSON timestampFormat truncates to millis — keep micros
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    events.write.option("timestampFormat", tsFmt).mode("overwrite").json(out)
    val back = spark.read.schema(events.schema)
      .option("timestampFormat", tsFmt).json(out)
    assert(back.count() === events.count())
    assert(back.schema === events.schema)
    val a = events.select(col("event_id"), col("ts"), col("value"))
      .collect().map(_.toString).sorted
    val b = back.select(col("event_id"), col("ts"), col("value"))
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("ORC source round-trip preserves values") {
    val out = Files.createTempDirectory("graft-orc").toString + "/lineitem"
    val li = Tables.t(spark, sf0001, "lineitem")
    li.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.collect().map(_.toString).sorted
      .sameElements(li.collect().map(_.toString).sorted))
  }

  test("repartitionByRange write yields non-overlapping per-file key ranges") {
    val out = Files.createTempDirectory("graft-range").toString + "/orders"
    Tables.t(spark, sf0001, "orders")
      .repartitionByRange(4, col("o_orderkey"))
      .write.mode("overwrite").parquet(out)
    val perFile = spark.read.parquet(out)
      .select(col("o_orderkey"), input_file_name().as("f"))
      .groupBy(col("f"))
      .agg(min(col("o_orderkey")).as("lo"), max(col("o_orderkey")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(perFile.length >= 2)
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, "file key ranges must not overlap (range-clustered layout)")
      case _ =>
    }
  }

  test("schema evolution: mergeSchema unions batch schemas, missing columns read as null") {
    // the lakehouse reality at 100 TB: a column added mid-ingest must
    // not force a rewrite of older shards — readers union the footers
    val out = Files.createTempDirectory("graft-evolve").toString + "/docs"
    val v1 = Tables.t(spark, sf0001, "documents")
      .select(col("doc_id"), col("source")).filter(col("doc_id") < 50)
    val v2 = Tables.t(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), col("lang"))
      .filter(col("doc_id") >= 50)
    v1.write.parquet(out + "/batch=1")
    v2.write.parquet(out + "/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.schema.fieldNames.toSet ===
      Set("doc_id", "source", "lang", "batch"))
    assert(merged.count() === v1.count() + v2.count())
    // old rows surface the new column as NULL; new rows keep values
    assert(merged.filter(col("batch") === 1 && col("lang").isNotNull)
      .count() === 0)
    assert(merged.filter(col("batch") === 2 && col("lang").isNull)
      .count() === 0)
    // pruning still reaches the scan through the merged schema
    val plan = merged.filter(col("doc_id") < 10).select(col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]"),
      s"pushdown must survive schema merge:\n$plan")
  }

  test("Verify-style coalesced parquet round-trip preserves values") {
    val out = Files.createTempDirectory("graft-rt").toString + "/q01"
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf0001)
    df.coalesce(1).write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.collect().map(_.toString).sorted
      .sameElements(df.collect().map(_.toString).sorted))
  }

  test("binaryFile source: raw image files ingest with metadata and decode end-to-end") {
    import spark.implicits._
    // the real multimodal ingest path: a directory of media files read
    // as (path, modificationTime, length, content) rows, the content
    // column flowing straight into the partition-parallel codec — no
    // staging table, no base64 detour
    def ppm(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
      val px = Array.fill(w * h)(Array(r.toByte, g.toByte, b.toByte)).flatten
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px
    }
    val dir = Files.createTempDirectory("graft-bin")
    Files.write(dir.resolve("img1.ppm"), ppm(4, 4, 255, 0, 0))
    Files.write(dir.resolve("img2.ppm"), ppm(2, 2, 0, 255, 0))
    Files.write(dir.resolve("ignore.txt"), "not an image".getBytes)
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.ppm").load(dir.toString)
    assert(files.columns.toSet ===
      Set("path", "modificationTime", "length", "content"))
    assert(files.count() === 2, "glob filter must exclude non-images")
    // length pushdown: binaryFile supports predicate pushdown on the
    // metadata columns, so a size screen never reads file contents
    val small = files.filter(col("length") < 30)
    assert(small.count() === 1)
    val decoded = queries.MultimodalOps.decodePpm(
      files.select(
          when(col("path").endsWith("img1.ppm"), 1L).otherwise(2L),
          col("content"))
        .as[(Long, Array[Byte])])
      .collect().map(r => r.img_id -> r).toMap
    assert(decoded(1L).width === 4 && decoded(1L).meanR === 255.0
      && decoded(1L).meanG === 0.0)
    assert(decoded(2L).width === 2 && decoded(2L).meanG === 255.0)
  }

  test("CSV malformed rows: PERMISSIVE quarantines into _corrupt_record, DROPMALFORMED drops") {
    val dir = Files.createTempDirectory("graft-csv")
    Files.write(dir.resolve("mixed.csv"),
      ("id,score\n1,10.5\nnot_a_number,oops,extra\n3,7.25\n")
        .getBytes("UTF-8"))
    val schema = "id BIGINT, score DOUBLE, _corrupt_record STRING"
    val perm = spark.read.option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema).csv(dir.toString).cache()
    assert(perm.count() === 3)
    val bad = perm.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length === 1 && bad.head.getString(2).startsWith("not_a_number"))
    assert(perm.filter(col("_corrupt_record").isNull)
      .agg(sum(col("score"))).head.getDouble(0) === 17.75)
    perm.unpersist()
    val dropped = spark.read.option("header", "true")
      .option("mode", "DROPMALFORMED")
      .schema("id BIGINT, score DOUBLE").csv(dir.toString)
    // count() alone would NOT drop anything: the CSV count fast path
    // reads no columns, so malformed rows are never detected — a real
    // 100 TB footgun worth pinning; materializing a column parses
    assert(dropped.count() === 3,
      "the count fast path skips parsing (documented Spark behavior)")
    assert(dropped.select(col("id")).collect().length === 2)
  }
}
