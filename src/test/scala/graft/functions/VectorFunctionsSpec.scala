package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class VectorFunctionsSpec extends AnyFunSuite with SparkTestBase {

  def cosOf(a: Seq[Double], b: Seq[Double]): Double = {
    import spark.implicits._
    VectorFunctions.register(spark)
    Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.cosineSim(col("a"), col("b")).as("c"))
      .head().getDouble(0)
  }

  test("orthogonal → 0, parallel → 1, antiparallel → -1, zero-vector guard → 0") {
    assert(cosOf(Seq(1, 0), Seq(0, 1)) === 0.0)
    assert(math.abs(cosOf(Seq(1, 2, 3), Seq(2, 4, 6)) - 1.0) < 1e-15)
    assert(math.abs(cosOf(Seq(1, 0), Seq(-3, 0)) + 1.0) < 1e-15)
    assert(cosOf(Seq(0, 0), Seq(1, 1)) === 0.0)
  }

  test("DotProduct matches the left-to-right scalar fold exactly") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val a = Seq(0.1, -2.5, 3.75, 1e-7)
    val b = Seq(4.0, 0.5, -1.25, 2e7)
    val got = Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.dotProduct(col("a"), col("b")).as("d"))
      .head().getDouble(0)
    var expect = 0.0
    a.indices.foreach(i => expect += a(i) * b(i))
    assert(got === expect, "same accumulation order → bit-identical")
  }

  test("SimHash48Agg matches the expression-composed vote rendering, any partitioning") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("the", "quick", "brown", "fox", "jumps")),
      (2L, Seq("the", "quick", "brown", "fox", "jumped")),
      (3L, Seq("completely", "different", "words", "here"))
    ).toDF("doc_id", "ws")
    def viaAgg(parts: Int): Map[Long, Long] =
      docs.select(col("doc_id"), explode(col("ws")).as("tok"))
        .repartition(parts)
        .groupBy(col("doc_id"))
        .agg(SimHash48Agg.simhash48(col("tok")).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // expression-composed reference: 12 nibbles, 48 sum(CASE) votes
    val tok = docs.select(col("doc_id"), explode(col("ws")).as("tok"))
      .withColumn("hx", md5(col("tok")))
    val nibs = (0 until 12).map { j =>
      (expr(s"instr('0123456789abcdef', substring(hx, ${j + 1}, 1))") - 1)
        .cast("long").as(s"nib$j")
    }
    val votes = (0 until 48).map { b =>
      sum(when(shiftright(col(s"nib${b / 4}"), b % 4)
        .bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"v$b")
    }
    val sig = (0 until 48).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    val ref = tok.select(col("doc_id") +: nibs: _*).groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*).select(col("doc_id"), sig.as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg(1) === ref)
    assert(viaAgg(8) === ref, "partial-merge across partitions must not change votes")
    assert(java.lang.Long.bitCount(ref(1L) ^ ref(2L)) <
      java.lang.Long.bitCount(ref(1L) ^ ref(3L)),
      "near-identical docs must be closer in Hamming space")
  }

  test("native PqAdcDistance is bitwise-equal to the HOF LUT rendering") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val pq = graft.ml.ProductQuantizer.fit(e, m = 16, k = 16)
    val codes = pq.encode(e).select(col("vec_id"), col("pq_code"), col("emb"))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("emb")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val qLut = queries.map { case (qid, v) => (qid, pq.lut(v), v.toSeq) }.toSeq
      .toDF("qid", "lut", "qemb")
    val both = codes.crossJoin(broadcast(qLut))
      .select(col("qid"), col("vec_id"),
        pq.adc(col("lut"), col("pq_code")).as("hof"),
        pq.adcNative(col("pq_code"), col("qemb")).as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)),
        s"ADC mismatch for (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("matches the higher-order-function formula on real embeddings") {
    VectorFunctions.register(spark)
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val a = e.select(col("vec_id").as("ia"), col("emb").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("emb").as("eb"))
    val hof = {
      val dot = aggregate(zip_with(col("ea"), col("eb"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)
      val na = sqrt(aggregate(zip_with(col("ea"), col("ea"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v))
      val nb = sqrt(aggregate(zip_with(col("eb"), col("eb"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v))
      dot / (na * nb)
    }
    val diff = a.join(b, col("ia") < col("ib")).limit(5000)
      .select(abs(VectorFunctions.cosineSim(col("ea"), col("eb")) - hof).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(diff < 1e-12, s"custom expression deviates from HOF formula by $diff")
  }

  test("mismatched types are rejected at analysis time") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq((Seq("x"), Seq(1.0))).toDF("a", "b")
    intercept[Exception] {
      df.select(VectorFunctions.cosineSim(col("a"), col("b"))).collect()
    }
  }

  test("NibbleHist: string and binary inputs match the 16-replace-counter rendering") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val texts = Seq("", "a", "hello world", "The 16-slot nibble test!",
      "αβγ unicode μix", "0123456789abcdefABCDEF")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .withColumn("payload", encode(col("t"), "utf-8"))
      .withColumn("hx", lower(hex(col("payload"))))
    // reference: the sixteen replace-counters this expression replaced
    val ref = df.withColumn("cnts", array(
        "0123456789abcdef".map(c => (length(col("hx")) -
          length(expr(s"replace(hx, '$c', '')"))).cast("long")): _*))
      .select(col("id"), col("cnts")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaString = df.select(col("id"),
        VectorFunctions.nibbleHist(col("hx"))).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaBinary = df.select(col("id"),
        VectorFunctions.nibbleHist(col("payload"))).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaString === ref, "string path must equal the replace counters")
    assert(viaBinary === ref, "binary path must equal the hex-rendered counts")
    // uppercase hex chars count into the same slots
    val up = df.select(VectorFunctions.nibbleHist(upper(col("hx"))).as("h"),
      col("id")).collect().map(r => r.getLong(1) -> r.getSeq[Long](0)).toMap
    assert(up === ref)
    // total mass = 2 nibbles per payload byte
    for ((id, h) <- viaBinary)
      assert(h.sum === 2L * texts(id.toInt).getBytes("UTF-8").length)
  }

  test("CdcChunks: equals the declarative explode/window/aggregate rendering on every edge shape") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    VectorFunctions.register(spark)
    val texts = Seq(
      "",                     // blank -> no chunks at all
      "   ",                  // all-space: Spark trim empties it
      "\tword",               // leading tab survives the space-only trim
      "one",
      "one two three four five six seven eight nine ten",
      ("w1 " * 200).trim,     // long repeat: many boundaries
      "trailing tab\t",       // trailing tab -> trailing empty token
      "a  b\tc\nd\fe\rf")    // every separator class, runs collapse
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // declarative reference: the exact r13 plan the expression replaced
    val tok = df
      .withColumn("w", when(length(trim(col("text"))) === 0,
        array().cast("array<string>"))
        .otherwise(split(trim(col("text")), "[ \\t\\n\\f\\r]+")))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "token")))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucket = conv(substring(md5(col("token").cast("string")), 1, 6),
      16, 10).cast("long")
    val ref = tok
      .withColumn("bnd", when(bucket % 8 === 0, 1L).otherwise(0L))
      .withColumn("ci", coalesce(sum(col("bnd")).over(wDoc), lit(0L)))
      .groupBy(col("doc_id"), col("ci"))
      .agg(count(lit(1)).as("ctokens"),
        md5(concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(pos, token))), " +
            "x -> x.token)"))).as("chunk_md5"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    val got = df
      .withColumn("chs", VectorFunctions.cdcChunks(col("text")))
      .filter(size(col("chs")) > 0)
      .select(col("doc_id"), posexplode(col("chs")).as(Seq("ci", "ch")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong) ->
        ((r.getStruct(2).getLong(0), r.getStruct(2).getString(1))))
      .toMap
    assert(got === ref,
      s"expression and declarative chunking disagree:\n got=$got\n ref=$ref")
    // blank and all-space docs must vanish entirely
    assert(!got.keys.exists(k => k._1 == 0L || k._1 == 1L))
  }

  test("CdcPayloadChunks: linear kernel equals the HOF tile-fold rendering, including non-aligned tails and raw bytes") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val rng = new scala.util.Random(13)
    val payloads: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      Array[Byte](0),
      Array.tabulate(15)(_.toByte),           // under one tile
      Array.tabulate(16)(_.toByte),           // exactly one tile
      Array.tabulate(33)(i => (i * 7).toByte),// tile + 1-byte tail
      Array.fill(1024)(rng.nextInt(256).toByte),
      "plain utf-8 text payload ".getBytes("UTF-8"),
      Array.fill(4096)(0xAB.toByte))          // constant bytes
    val df = payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "payload")
    val chunkStruct = "struct<cbytes:bigint,chunk_md5:string>"
    val ref = df.filter(length(col("payload")) > 0)
      .withColumn("h", lower(hex(col("payload"))))
      .withColumn("tiles", expr(
        """transform(
          |  sequence(0, CAST(ceil(length(h) / 32.0) AS INT) - 1),
          |  i -> substring(h, i * 32 + 1, 32))""".stripMargin))
      .withColumn("chunks", expr(
        s"""aggregate(
           |  tiles,
           |  named_struct(
           |    'done', CAST(array() AS array<$chunkStruct>),
           |    'cur', ''),
           |  (acc, tl) -> IF(
           |    conv(substring(md5(tl), 1, 6), 16, 10) % 8 = 0,
           |    named_struct(
           |      'done', array_append(acc.done, named_struct(
           |        'cbytes',
           |        CAST(length(concat(acc.cur, tl)) / 2 AS BIGINT),
           |        'chunk_md5', md5(concat(acc.cur, tl)))),
           |      'cur', ''),
           |    named_struct('done', acc.done,
           |      'cur', concat(acc.cur, tl))),
           |  acc -> IF(acc.cur = '', acc.done,
           |    array_append(acc.done, named_struct(
           |      'cbytes', CAST(length(acc.cur) / 2 AS BIGINT),
           |      'chunk_md5', md5(acc.cur)))))""".stripMargin))
      .select(col("id"), col("chunks")).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(c => (c.getLong(0), c.getString(1)))).toMap
    val got = df.filter(length(col("payload")) > 0)
      .select(col("id"),
        VectorFunctions.cdcPayloadChunks(col("payload")).as("chunks"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(c => (c.getLong(0), c.getString(1)))).toMap
    assert(got === ref, "linear kernel must equal the HOF fold")
    // chunk byte counts partition the payload
    for ((id, chs) <- got)
      assert(chs.map(_._1).sum === payloads(id.toInt).length.toLong)
    // empty payload row was filtered on both sides
    assert(!got.contains(0L))
  }

  /** Driver-side replica of the gear recurrence (GearChunks' contract):
    * h = (16h + b·2654435761) mod 2³², cut after h < 2²⁶, no reset. */
  private def gearRef(data: Array[Byte]): Seq[(Long, String)] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var h = 0L
    var start = 0
    for (i <- data.indices) {
      h = ((h << 4) + (data(i) & 0xffL) * 2654435761L) & 0xFFFFFFFFL
      if (h < 67108864L) {
        val hx = data.slice(start, i + 1).map("%02x".format(_)).mkString
        out += ((i + 1 - start).toLong -> md5hex(hx))
        start = i + 1
      }
    }
    if (start < data.length) {
      val hx = data.slice(start, data.length).map("%02x".format(_)).mkString
      out += ((data.length - start).toLong -> md5hex(hx))
    }
    out.toSeq
  }

  test("GearChunks: codegen'd kernel equals the driver gear fold on edge shapes and fuzz payloads") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val rng = new scala.util.Random(29)
    val payloads: Seq[Array[Byte]] = Seq(
      Array[Byte](0),
      Array.fill(64)(0.toByte),               // constant zero bytes
      Array.fill(64)(0xFF.toByte),            // constant high bytes
      Array.tabulate(7)(_.toByte),            // under one gear window
      Array.tabulate(8)(_.toByte),            // exactly one window
      "plain utf-8 text payload, short".getBytes("UTF-8")) ++
      (0 until 8).map(_ =>
        Array.fill(1 + rng.nextInt(4096))(rng.nextInt(256).toByte))
    val df = payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "payload")
    val got = df
      .select(col("id"), VectorFunctions.gearChunks(col("payload")).as("chs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(c => (c.getLong(0), c.getString(1)))).toMap
    for ((b, i) <- payloads.zipWithIndex) {
      assert(got(i.toLong) === gearRef(b), s"payload $i")
      // chunk byte counts partition the payload
      assert(got(i.toLong).map(_._1).sum === b.length.toLong, s"payload $i")
    }
    // mask calibration: random bytes must cut near the designed ~64-byte
    // mean (top-6-bit mask → cut probability 1/64 per byte)
    val rand = Array.fill(1 << 16)(rng.nextInt(256).toByte)
    val mean = (1 << 16).toDouble / gearRef(rand).size
    assert(mean > 40 && mean < 96, s"mean gear chunk was $mean bytes")
  }

  test("GearChunks re-anchors after an insert edit; fixed tiles do not (the property m52 buys over m51)") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val rng = new scala.util.Random(31)
    val base = Array.fill(4096)(rng.nextInt(256).toByte)
    val edited = Array.fill(7)(rng.nextInt(256).toByte) ++ base
    val df = Seq((0L, base), (1L, edited)).toDF("id", "payload")
    def sets(c: org.apache.spark.sql.Column) = df
      .select(col("id"), c.as("chs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(_.getString(1)).toSet).toMap
    val gear = sets(VectorFunctions.gearChunks(col("payload")))
    // the boundary rule sees only the trailing 8 bytes, so chunking
    // realigns at the first cut ≥ 8 bytes past the insert: all but the
    // leading chunk(s) of the original survive the 7-byte prefix
    val shared = (gear(0L) & gear(1L)).size
    assert(gear(0L).size > 40, s"4 KiB must cut many chunks, got ${gear(0L).size}")
    assert(shared >= gear(0L).size - 3,
      s"gear chunks must re-anchor: shared $shared of ${gear(0L).size}")
    // the same pair under m51's fixed 16-byte tiles: the 7-byte shift
    // moves every tile boundary — (almost) nothing survives
    val tiles = sets(VectorFunctions.cdcPayloadChunks(col("payload")))
    assert((tiles(0L) & tiles(1L)).size <= 2,
      "fixed tiles must lose the alignment a byte insert shifts")
  }

  /** Driver-side replica of the CLAMPED gear contract: same rolling h,
    * a candidate honored only at ≥ min bytes since the last cut, a cut
    * forced at max bytes, state never reset. */
  private def gearClampedRef(data: Array[Byte], min: Int,
      max: Int): Seq[(Long, String)] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var h = 0L
    var start = 0
    for (i <- data.indices) {
      h = ((h << 4) + (data(i) & 0xffL) * 2654435761L) & 0xFFFFFFFFL
      val len = i + 1 - start
      if ((h < 67108864L && len >= min) || len >= max) {
        val hx = data.slice(start, i + 1).map("%02x".format(_)).mkString
        out += (len.toLong -> md5hex(hx))
        start = i + 1
      }
    }
    if (start < data.length) {
      val hx = data.slice(start, data.length).map("%02x".format(_)).mkString
      out += ((data.length - start).toLong -> md5hex(hx))
    }
    out.toSeq
  }

  test("GearChunksClamped: kernel equals the driver ref, clamps bind, zero runs stay bounded") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val rng = new scala.util.Random(43)
    val payloads: Seq[Array[Byte]] = Seq(
      Array[Byte](0),
      Array.fill(4096)(0.toByte),             // the degenerate zero run
      Array.fill(64)(0xFF.toByte),
      Array.tabulate(8)(_.toByte),
      "plain utf-8 text payload, short".getBytes("UTF-8")) ++
      (0 until 8).map(_ =>
        Array.fill(1 + rng.nextInt(8192))(rng.nextInt(256).toByte))
    val df = payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "payload")
    for ((min, max) <- Seq((16, 4096), (4, 32))) {
      val got = df.select(col("id"),
          VectorFunctions.gearChunksClamped(col("payload"), min, max).as("chs"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(c => (c.getLong(0), c.getString(1)))).toMap
      for ((b, i) <- payloads.zipWithIndex) {
        assert(got(i.toLong) === gearClampedRef(b, min, max),
          s"payload $i clamp ($min,$max)")
        // every chunk but the last obeys [min, max]; the last obeys max
        val lens = got(i.toLong).map(_._1)
        assert(lens.sum === b.length.toLong, s"payload $i partitions")
        assert(lens.dropRight(1).forall(l => l >= min && l <= max),
          s"payload $i clamp violated: $lens")
        assert(lens.lastOption.forall(_ <= max), s"payload $i max violated")
      }
    }
    // the zero run cuts exactly every `min` bytes once the state hits 0
    val zeroChunks = gearClampedRef(Array.fill(4096)(0.toByte), 16, 4096)
    assert(zeroChunks.size === 256 && zeroChunks.forall(_._1 === 16L),
      s"zero run must cut every 16 bytes, got ${zeroChunks.size} chunks")
  }

  test("cdc_payload_chunks: a boundary-free 8 MiB payload streams into ONE chunk") {
    import spark.implicits._
    VectorFunctions.register(spark)
    // find a 16-byte tile whose md5 bucket is NON-zero (so a payload of
    // that tile repeated NEVER cuts — the adversarial single-chunk
    // class that used to accumulate 2x the payload in a buffer)
    val digest = java.security.MessageDigest.getInstance("MD5")
    def bucket(tile: Array[Byte]): Int = {
      val hx = tile.map("%02x".format(_)).mkString.getBytes("US-ASCII")
      digest.reset(); digest.digest(hx)(2) & 7
    }
    val tile = (0 until 256).map(v =>
      Array.fill(16)(v.toByte)).find(bucket(_) != 0).get
    val reps = (8 << 20) / 16
    val payload = Array.tabulate(8 << 20)(i => tile(i % 16))
    val got = Seq((0L, payload)).toDF("id", "payload")
      .select(VectorFunctions.cdcPayloadChunks(col("payload")).as("chs"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(c => (c.getLong(0), c.getString(1)))
    assert(got.size === 1, s"expected one boundary-free chunk, got ${got.size}")
    assert(got.head._1 === (8L << 20), "the chunk must span the payload")
    // digest must equal md5 over the full hex rendering, computed here
    // by streaming the same tile hex (never materializing 16 MiB)
    val ref = java.security.MessageDigest.getInstance("MD5")
    val tileHex = tile.map("%02x".format(_)).mkString.getBytes("US-ASCII")
    (0 until reps).foreach(_ => ref.update(tileHex))
    val refHex = ref.digest().map("%02x".format(_)).mkString
    assert(got.head._2 === refHex)
  }

  test("GearChunksClamped: chunks larger than one digest block stream correctly") {
    import spark.implicits._
    VectorFunctions.register(spark)
    // a min clamp past the 32 KiB digest block size forces every chunk
    // through the multi-block streaming path of the chunk emitter —
    // digests must equal the materialize-then-hash driver ref
    val rng = new scala.util.Random(47)
    val big = Array.fill(200000)(rng.nextInt(256).toByte)
    val got = Seq((0L, big)).toDF("id", "payload")
      .select(VectorFunctions
        .gearChunksClamped(col("payload"), 65536, 1 << 20).as("chs"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(c => (c.getLong(0), c.getString(1)))
    val ref = gearClampedRef(big, 65536, 1 << 20)
    assert(got === ref)
    assert(got.map(_._1).max > 65536L, "fixture must produce a >64 KiB chunk")
  }

  test("BloomProbe: the fused native probe is bit-identical to the column-function rendering at every m") {
    import spark.implicits._
    // keys: ascii words, multi-byte unicode, empties, long strings —
    // the digest must be over the same UTF-8 bytes both ways
    val rng = new scala.util.Random(202)
    val keys = (0 until 400).map { i =>
      i % 5 match {
        case 0 => s"w${rng.nextInt(5000)} tok${rng.nextInt(100)}"
        case 1 => s"émojis ☃ ${rng.nextInt(1000)} 中文"
        case 2 => ""
        case 3 => "x" * (rng.nextInt(200) + 1)
        case _ => (0 until 8).map(_ => rng.nextPrintableChar()).mkString
      }
    } :+ "planted benchmark gram one two"
    val bench = keys.take(50).toDF("g")
    for (m <- Seq(1 << 12, 1 << 18, 1 << 21, 1 << 24)) {
      val bits = graft.queries.DedupOps.bloomBitmapM(m, bench, "g")
      val bm = typedlit(bits.toSeq)
      val rows = keys.toDF("g")
        .select(col("g"),
          graft.queries.DedupOps.bloomProbe(bits)(col("g")).as("native"),
          graft.queries.DedupOps.bloomHitM(m, bm)(col("g")).as("columns"))
        .collect()
      rows.foreach(r => assert(r.getBoolean(1) === r.getBoolean(2),
        s"m=$m key='${r.getString(0)}': native=${r.getBoolean(1)} columns=${r.getBoolean(2)}"))
      // membership truth: every build key must hit (no false negatives)
      val hits = keys.take(50).toSet
      rows.filter(r => hits(r.getString(0)))
        .foreach(r => assert(r.getBoolean(1), s"m=$m missed build key"))
    }
  }

  test("BloomProbe: value equality over the bitmap — identical probes canonicalize, different bitmaps don't") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    val childE = BoundReference(0, StringType, nullable = true)
    val a = graft.functions.BloomProbe(childE, Array(1L, 2L, 3L, 4L))
    val b = graft.functions.BloomProbe(childE, Array(1L, 2L, 3L, 4L)) // distinct array, same content
    val c = graft.functions.BloomProbe(childE, Array(1L, 2L, 3L, 5L))
    assert(a == b, "equal-content bitmaps must compare equal")
    assert(a.hashCode == b.hashCode)
    assert(a.semanticEquals(b), "identical probes must canonicalize together")
    assert(a != c && !a.semanticEquals(c),
      "different bitmaps must stay distinct")
    // unchanged results: the fuzz test above pins behavior; this pins
    // that the equality override didn't break tree copying
    assert(a.withNewChildren(Seq(childE)) == a)
  }
}
