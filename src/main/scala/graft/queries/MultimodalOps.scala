package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Multimodal-column plumbing (BASELINE.json north-star family).
  *
  * The corpus has no real image/audio bytes, so `documents.text` is
  * treated as an opaque binary payload (`encode(text, 'utf-8')`) with
  * typed metadata — exactly the schema shape a 100 TB multimodal table
  * would use: (id, payload binary, meta struct). The real-world decode
  * step (image decode / resample / frame extraction) is STUBBED: this
  * container ships no media libraries, so `stubFeatures` derives a
  * deterministic fixed-width float vector from the payload digest. The
  * Spark-side plumbing — binary column, metadata struct, fixed-size
  * feature array, partition-parallel map with no shuffle — is real and
  * is what the tests exercise.
  *
  * Swap `stubFeatures` for a real decoder by replacing the md5-derived
  * vector with a `mapPartitions` over a JNI/FFI decoder; the schema and
  * the downstream consumers (similarity search over `array<float>`)
  * stay unchanged.
  */
object MultimodalOps extends Serializable {

  val featureDim = 8

  /** STUB decoder: 8 deterministic floats in [0,1) from the payload's
    * md5 — stands in for image/audio feature extraction. Pure Catalyst
    * expressions (conv on hex nibbles), so it stays codegen'd. */
  def stubFeatures(payload: Column): Column = {
    val hex = md5(payload)
    val feats = (0 until featureDim).map { i =>
      (conv(substring(hex, i * 4 + 1, 4), 16, 10).cast("double") / 65536.0)
        .cast("float")
    }
    array(feats: _*)
  }

  /** documents rendered as a multimodal table:
    * (doc_id, payload binary, meta struct). */
  def multimodalTable(s: SparkSession, d: String): DataFrame = {
    // the family's byte-distribution kernels run on the codegen'd
    // nibble_hist expression; registering here covers every consumer
    graft.functions.VectorFunctions.register(s)
    t(s, d, "documents").select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(col("source").as("source"), col("lang").as("lang"),
        col("n_chars").as("n_chars")).as("meta"))
  }

  /** The DuckDB rendering of [[graft.functions.GearChunksClamped]]'s
    * cut walk, shared by the m53 and d65 oracles: the clamp makes each
    * cut a function of the previous one, so the oracle WALKS the cuts
    * with a recursive CTE — from the stateless candidate set (the same
    * 8-term lag sum as m52), next cut = least(first candidate ≥
    * cut+16, cut+4096, end-of-doc). Every doc advances one cut per
    * iteration (~len/64 iterations, all docs in parallel); DuckDB
    * decorrelates the min-candidate probe into a per-iteration join.
    * Chunk assembly past the cut table is byte-for-byte m52's
    * prefix-sum + ordered string_agg. Ends at the `chunks` CTE:
    * (doc_id, source, chunk_idx, cbytes, chunk_md5). */
  private[graft] val gearClampedChunksCte: String = {
    val lags = (0 until 8).map(k =>
      s"(${BigInt(16).pow(k)} * coalesce(lag(gv, $k) OVER w, 0))")
      .mkString("\n       |   + ")
    s"""WITH RECURSIVE hx AS (
       | SELECT doc_id, source, lower(hex(encode(text))) AS h
       | FROM documents WHERE length(text) > 0),
       |pos AS (
       | SELECT doc_id, source, CAST(i AS BIGINT) AS i,
       |  substring(h, 2*i+1, 2) AS hp,
       |  ((strpos('0123456789abcdef',
       |      substring(h, 2*i+1, 1)) - 1) * 16 +
       |   (strpos('0123456789abcdef',
       |      substring(h, 2*i+2, 1)) - 1)) AS byte
       | FROM hx, LATERAL unnest(range(0, length(h)//2)) AS u(i)),
       |g AS (
       | SELECT doc_id, source, i, hp,
       |  (byte * 2654435761) % 4294967296 AS gv
       | FROM pos),
       |rolled AS (
       | SELECT doc_id, source, i, hp,
       |  ($lags) % 4294967296 AS hh
       | FROM g WINDOW w AS (PARTITION BY doc_id ORDER BY i ASC)),
       |cand AS (
       | SELECT doc_id, i FROM rolled WHERE hh < 67108864),
       |doclen AS (
       | SELECT doc_id, CAST(count(*) AS BIGINT) AS len
       | FROM pos GROUP BY 1),
       |cuts AS (
       | SELECT doc_id, CAST(-1 AS BIGINT) AS cut, len FROM doclen
       | UNION ALL
       | SELECT c.doc_id,
       |  least(
       |   coalesce((SELECT min(b.i) FROM cand b
       |             WHERE b.doc_id = c.doc_id AND b.i >= c.cut + 16),
       |            c.cut + 4096),
       |   c.cut + 4096, c.len - 1) AS cut,
       |  c.len
       | FROM cuts c WHERE c.cut < c.len - 1),
       |flagged AS (
       | SELECT p.doc_id, p.source, p.i, p.hp,
       |  CASE WHEN t.cut IS NOT NULL THEN 1 ELSE 0 END AS bnd
       | FROM pos p LEFT JOIN
       |  (SELECT doc_id, cut FROM cuts WHERE cut >= 0) t
       |  ON t.doc_id = p.doc_id AND t.cut = p.i),
       |assigned AS (
       | SELECT *, coalesce(sum(bnd) OVER (PARTITION BY doc_id
       |   ORDER BY i ASC
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |   AS chunk_idx
       | FROM flagged),
       |chunks AS (
       | SELECT doc_id, source, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |  CAST(count(*) AS BIGINT) AS cbytes,
       |  md5(string_agg(hp, '' ORDER BY i ASC)) AS chunk_md5
       | FROM assigned GROUP BY 1, 2, 3)""".stripMargin
  }

  /** m50's fingerprint stage, factored out so StressBench can measure
    * banding recall against ground-truth Hamming computed DIRECTLY
    * from these signatures (planted pairs joined by id — no banding in
    * the ground-truth path). Input: (doc_id, payload); output:
    * (doc_id, ph_hi, ph_lo) — the 64-bit aHash packed as two 32-bit
    * halves (sign-safe shifts). */
  private[graft] def phashSignatures(mm: DataFrame): DataFrame =
    mm.select(col("doc_id"), lower(hex(col("payload"))).as("hx"))
      .filter(length(col("hx")) >= 64)
      .withColumn("ln", length(col("hx")))
      // nibble-value mass per segment via the codegen'd nibble_hist
      // expression: ONE fused pass per segment (the replace-counter
      // form this replaces scanned each segment 15 times; the
      // original per-position lambda was 3× slower still), then
      // Σ v·h[v] over the 16-slot histogram — same exact integers.
      // Boundary products i·ln widen to BIGINT BEFORE multiplying
      // (i ≤ 64 × ln up to 2³¹ would overflow 32-bit INT for
      // payloads over ~16 MiB — ANSI Spark would throw at runtime),
      // mirroring the oracle's BIGINT range(0,64) operands.
      .withColumn("segs", expr(
        """transform(sequence(0, 63), i ->
          |  substring(hx,
          |    CAST((CAST(i AS BIGINT) * ln) div 64 + 1 AS INT),
          |    CAST((CAST(i + 1 AS BIGINT) * ln) div 64
          |         - (CAST(i AS BIGINT) * ln) div 64 AS INT)))"""
          .stripMargin))
      .withColumn("segsums", expr(
        """transform(segs, sg ->
          |  aggregate(zip_with(nibble_hist(sg), sequence(0L, 15L),
          |    (c, v) -> c * v), 0L, (a, x) -> a + x))""".stripMargin))
      .withColumn("tot", expr("aggregate(segsums, 0L, (a, x) -> a + x)"))
      .withColumn("bits", expr(
        "transform(segsums, x -> IF(x * 64 > tot, 1L, 0L))"))
      .withColumn("ph_hi", expr(
        """aggregate(zip_with(slice(bits, 1, 32), sequence(31, 0, -1),
          | (b, k) -> shiftleft(b, k)), 0L, (a, x) -> a + x)"""
          .stripMargin))
      .withColumn("ph_lo", expr(
        """aggregate(zip_with(slice(bits, 33, 32), sequence(31, 0, -1),
          | (b, k) -> shiftleft(b, k)), 0L, (a, x) -> a + x)"""
          .stripMargin))
      .select(col("doc_id"), col("ph_hi"), col("ph_lo"))

  /** m50's band-width policy ("16" | "32" | "auto", default auto). The
    * trade, spelled out because it is a RECALL contract, not a tuning
    * nit: 16-bit quarter keys collide any pair sharing ONE clean
    * quarter — every Hamming ≤ 8 pair with ≤ 3 dirty quarters is
    * guaranteed — at Θ(4·n²/2¹⁶) candidate volume (fine to ~10⁵
    * assets, 35.8 M candidates measured at 10⁶, quadratic death at
    * 10⁹). 32-bit quarter-PAIR keys (Manku multi-table) cut volume to
    * Θ(6·n²/2³²), but only Hamming ≤ 2 pairs are GUARANTEED to
    * collide: a Hamming 3–8 pair whose errors spread across ≥ 3
    * quarters is silently missed — the reduced-recall regime
    * StressBench's planted Hamming 3–8 sweep measures directly.
    * `auto` picks 16-bit below `spark.graft.phash.autoThreshold`
    * assets (recall-first while candidates are cheap) and 32-bit above
    * it (volume-first once n² bites), so the operator self-tunes as
    * the corpus grows instead of quietly exploding. The default
    * threshold (2¹⁸) keeps expected random-collision volume under
    * ~2¹⁹ pairs per band table at the switch point. */
  private[graft] def resolveBandBits(setting: String, assetCount: => Long,
      threshold: Long): Int = setting match {
    case "16" => 16
    case "32" => 32
    case "auto" => if (assetCount > threshold) 32 else 16
    case other => throw new IllegalArgumentException(
      s"spark.graft.phash.bandBits must be 16, 32 or auto, got $other")
  }

  /** m50's candidate stage over [[phashSignatures]] output: banded
    * self-join at the given width, XOR-popcount Hamming, is_dup ≤ 8.
    * When `bandBits` comes from the auto policy above, candidates at
    * Hamming 3–8 with ≥ 3 dirty quarters may be absent in the 32-bit
    * regime — documented there, measured in StressBench. */
  private[graft] def phashCandidates(sigs: DataFrame, bandBits: Int)
      : DataFrame = {
    val quarters = Seq(
      shiftright(col("ph_hi"), 16).bitwiseAND(lit(0xffffL)),
      col("ph_hi").bitwiseAND(lit(0xffffL)),
      shiftright(col("ph_lo"), 16).bitwiseAND(lit(0xffffL)),
      col("ph_lo").bitwiseAND(lit(0xffffL)))
    val bandStructs =
      if (bandBits == 16)
        quarters.zipWithIndex.map { case (q, i) =>
          struct(lit(i).as("bi"), q.as("bv")) }
      else
        Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)).zipWithIndex
          .map { case ((a, b), i) =>
            struct(lit(i).as("bi"),
              (quarters(a) * lit(65536L) + quarters(b)).as("bv")) }
    val banded = sigs.select(col("doc_id"), col("ph_hi"), col("ph_lo"),
      explode(array(bandStructs: _*)).as("b"))
    banded.select(col("doc_id").as("ia"), col("ph_hi").as("ha"),
        col("ph_lo").as("la"), col("b"))
      .join(banded.select(col("doc_id").as("ib"), col("ph_hi").as("hb"),
        col("ph_lo").as("lb"), col("b").as("bb")),
        col("b") === col("bb") && col("ia") < col("ib"))
      .select(col("ia"), col("ib"), col("ha"), col("la"), col("hb"),
        col("lb")).distinct()
      .withColumn("hamming",
        expr("bit_count(ha ^ hb) + bit_count(la ^ lb)").cast("long"))
      .select(col("ia"), col("ib"), col("hamming"),
        (col("hamming") <= 8).as("is_dup"))
  }

  case class PayloadRow(doc_id: Long, payload: Array[Byte])
  case class DecodedRow(doc_id: Long, n_bytes: Int, checksum: Long,
      features: Array[Float])

  /** STUB batch decoder — the partition-wise typed path (the Scala
    * analog of mapInPandas' batch shape) a real media codec would plug
    * into: each task walks its partition's payload batch through the
    * "codec" with no shuffle and emits fixed-width features. The codec
    * here is CRC-derived (no media libs in this container); swapping in
    * JNI/FFI image decode changes only the closure body. */
  def decodeBatches(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[DecodedRow] = {
    import s.implicits._
    multimodalTable(s, d).select(col("doc_id"), col("payload"))
      .as[PayloadRow]
      .mapPartitions { batch =>
        batch.map { p =>
          val crc = new java.util.zip.CRC32()
          crc.update(p.payload)
          DecodedRow(p.doc_id, p.payload.length, crc.getValue,
            Array.tabulate(featureDim)(i =>
              ((crc.getValue >> (i * 8)) & 0xff) / 256.0f))
        }
      }
  }

  case class PpmFeatures(img_id: Long, width: Int, height: Int,
      meanR: Double, meanG: Double, meanB: Double, features: Array[Float])

  /** Parse a P6 PPM header: returns (width, height, pixel offset). */
  private def parseP6(bytes: Array[Byte], id: Long): (Int, Int, Int) = {
    var i = 0
    def skipWs(): Unit = {
      while (i < bytes.length && bytes(i).toChar.isWhitespace) i += 1
      if (i < bytes.length && bytes(i) == '#') { // comment to end of line
        while (i < bytes.length && bytes(i) != '\n') i += 1
        skipWs()
      }
    }
    def token(): String = {
      skipWs()
      val start = i
      while (i < bytes.length && !bytes(i).toChar.isWhitespace) i += 1
      new String(bytes, start, i - start, "US-ASCII")
    }
    require(token() == "P6", s"img $id: not a P6 PPM")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    require(maxval == 255, s"img $id: unsupported maxval $maxval")
    i += 1 // single whitespace after maxval, then raw data
    require(bytes.length - i >= w * h * 3, s"img $id: truncated pixel data")
    (w, h, i)
  }

  /** REAL image resize — nearest-neighbor resample of a P6 PPM to
    * (tw × th), emitting a valid P6 payload: the north star's "resize"
    * step as partition-parallel binary→binary map, no shuffle. Swap the
    * kernel for bilinear/Lanczos without touching the plumbing. */
  def resizePpm(images: org.apache.spark.sql.Dataset[(Long, Array[Byte])],
      tw: Int, th: Int)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    import images.sparkSession.implicits._
    require(tw > 0 && th > 0)
    images.mapPartitions(_.map { case (id, bytes) =>
      val (w, h, off) = parseP6(bytes, id)
      val header = s"P6\n$tw $th\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + tw * th * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var y = 0
      while (y < th) {
        val sy = y * h / th
        var x = 0
        while (x < tw) {
          val sx = x * w / tw
          val sp = off + (sy * w + sx) * 3
          val dp = header.length + (y * tw + x) * 3
          out(dp) = bytes(sp)
          out(dp + 1) = bytes(sp + 1)
          out(dp + 2) = bytes(sp + 2)
          x += 1
        }
        y += 1
      }
      (id, out)
    })
  }

  /** REAL binary image decode — no stub: PPM (P6) is a header + raw RGB
    * bytes, parseable in pure JVM code, so this is the full multimodal
    * path with an actual codec: binary column → partition-parallel
    * decode → per-channel stats + a 2×2 block-mean feature grid
    * (12 floats). Swap the parser for JPEG/PNG via javax.imageio or FFI
    * without touching the Spark plumbing. */
  def decodePpm(images: org.apache.spark.sql.Dataset[(Long, Array[Byte])])
      : org.apache.spark.sql.Dataset[PpmFeatures] = {
    import images.sparkSession.implicits._
    images.mapPartitions(_.map { case (id, bytes) =>
      // header: "P6" <ws> width <ws> height <ws> maxval <single ws> raw RGB
      var i = 0
      def skipWs(): Unit = {
        while (i < bytes.length && bytes(i).toChar.isWhitespace) i += 1
        // '#' comments run to end of line
        if (i < bytes.length && bytes(i) == '#') {
          while (i < bytes.length && bytes(i) != '\n') i += 1
          skipWs()
        }
      }
      def token(): String = {
        skipWs()
        val start = i
        while (i < bytes.length && !bytes(i).toChar.isWhitespace) i += 1
        new String(bytes, start, i - start, "US-ASCII")
      }
      require(token() == "P6", s"img $id: not a P6 PPM")
      val w = token().toInt
      val h = token().toInt
      val maxval = token().toInt
      require(maxval == 255, s"img $id: unsupported maxval $maxval")
      i += 1 // single whitespace after maxval, then raw data
      val px = bytes.length - i
      require(px >= w * h * 3, s"img $id: truncated pixel data")
      var (sr, sg, sb) = (0.0, 0.0, 0.0)
      // 2×2 block means per channel = 12 features
      val grid = Array.fill(12)(0.0)
      val cnt = Array.fill(4)(0)
      var p = 0
      while (p < w * h) {
        val r = bytes(i + p * 3) & 0xff
        val g = bytes(i + p * 3 + 1) & 0xff
        val b = bytes(i + p * 3 + 2) & 0xff
        sr += r; sg += g; sb += b
        val block = (if ((p % w) * 2 >= w) 1 else 0) +
          (if ((p / w) * 2 >= h) 2 else 0)
        grid(block * 3) += r; grid(block * 3 + 1) += g
        grid(block * 3 + 2) += b
        cnt(block) += 1
        p += 1
      }
      val n = (w * h).toDouble
      val feats = Array.tabulate(12) { j =>
        val c = cnt(j / 3)
        if (c == 0) 0f else (grid(j) / c / 255.0).toFloat
      }
      PpmFeatures(id, w, h, sr / n, sg / n, sb / n, feats)
    })
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Payload metadata: byte length + content digest per payload, with
    // per-source rollup semantics left to the oracle-checked digest.
    "m31_payload_meta" -> { (s, d) =>
      multimodalTable(s, d).select(
        col("doc_id"),
        length(col("payload")).cast("long").as("payload_bytes"),
        md5(col("payload")).as("payload_md5"),
        col("meta.source").as("source"))
    },

    // Stubbed feature extraction: fixed-width float vector per payload,
    // exploded to (doc_id, dim, value) so the result is flat/verifiable.
    // r2: oracle-checked — the oracle reproduces hex→int nibble-by-
    // nibble (strpos on the hex alphabet), and every value is a
    // <=16-bit integer scaled by a power of two, so the float cast is
    // exact and both engines agree bitwise.
    "m32_payload_features" -> { (s, d) =>
      multimodalTable(s, d)
        .select(col("doc_id"),
          posexplode(stubFeatures(col("payload"))).as(Seq("dim", "value")))
        .select(col("doc_id"), col("dim").cast("long").as("dim"),
          round(col("value").cast("double"), 6).as("value"))
    },

    // Frame sampling — the video-pipeline shape: payload split into
    // fixed-width frames, every `stride`-th frame kept and fingerprinted,
    // capped at `maxFrames` frames per document (the bounded-sampling
    // contract a real video pipeline enforces anyway — unbounded
    // per-row explode is a skew hazard at 100 TB). The cap is an
    // explicit semantic in BOTH engines' plans, so a future corpus with
    // longer documents cannot silently diverge from the oracle (which
    // needs a constant range() bound — DuckDB range() can't take a
    // correlated upper limit). Frames are character-aligned slices so
    // both engines slice identically (the corpus payloads are
    // single-byte text; a real video codec replaces the slicer, not the
    // plumbing). Map-only: generate per-row frame indices, no shuffle.
    "m33_frame_sample" -> { (s, d) =>
      val frameChars = 32
      val stride = 4
      val maxFrames = 64L
      t(s, d, "documents")
        .withColumn("nf", least(
          floor(length(col("text")) / frameChars).cast("long"),
          lit(maxFrames)))
        .withColumn("fidx", explode(when(col("nf") > 0,
          sequence(lit(0L), col("nf") - 1))
          .otherwise(array().cast("array<long>"))))
        .filter(col("fidx") % stride === 0)
        .select(col("doc_id"), col("fidx").as("frame_idx"),
          md5(encode(expr(
            s"substring(text, CAST(fidx * $frameChars + 1 AS INT), $frameChars)"),
            "utf-8")).as("frame_md5"))
    },

    // Payload TILING — the image-tile shape: the binary payload cut
    // into fixed 256-byte tiles, each fingerprinted (dedup/indexing at
    // sub-asset granularity: shared tiles across assets dedupe even
    // when whole files differ). Byte ranges are sliced on the payload's
    // hex rendering — the portable byte-accessor both engines share
    // (DuckDB can't substring a BLOB; the m32 discipline) — and the
    // tile count caps at 64 per asset, explicit in both plans. Map-only.
    "m34_payload_tiles" -> { (s, d) =>
      val hexPerTile = 512 // 256 bytes
      val maxTiles = 64L
      multimodalTable(s, d)
        .withColumn("hx", lower(hex(col("payload"))))
        .withColumn("nt", least(
          ceil(length(col("hx")) / lit(hexPerTile.toDouble)).cast("long"),
          lit(maxTiles)))
        .filter(col("nt") > 0)
        .withColumn("tidx", explode(sequence(lit(0L), col("nt") - 1)))
        .select(col("doc_id"), col("tidx").as("tile_idx"),
          (length(expr(s"substring(hx, CAST(tidx * $hexPerTile + 1 AS INT), $hexPerTile)")) / 2)
            .cast("long").as("tile_bytes"),
          md5(expr(s"substring(hx, CAST(tidx * $hexPerTile + 1 AS INT), $hexPerTile)"))
            .as("tile_md5"))
    },

    // SHOT-BOUNDARY DETECTION — the video-curation step that runs
    // BEFORE frame dedup/sampling: consecutive frames whose cheap
    // feature vectors diverge mark scene cuts, and the per-asset scene
    // count / cut positions drive which frames a training pipeline
    // keeps (one per scene beats every-Nth within a static shot). The
    // decode stub stands in exactly as the prompt's multimodal
    // contract: "frames" are m34's 256-byte payload tiles in order and
    // the frame feature is the 16-bin nibble histogram (m40's
    // replace-counter trick, zero explode) — a real codec swaps in
    // decoded frames + real histograms, the Spark shapes stay. The
    // boundary rule is an exact integer L1 > 256 (a quarter of the
    // tile's nibble mass shifted — probed discriminative on this
    // corpus, ~half of transitions). One doc-keyed window orders each
    // asset's ≤64 frames; everything else is map-side.
    "m46_shot_boundaries" -> { (s, d) =>
      frameDeltas(s, d)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("l1") > 256L, 1L).otherwise(0L)).as("n_cuts"),
          max(coalesce(col("l1"), lit(0L))).as("max_l1"))
        .withColumn("n_scenes", col("n_cuts") + 1)
    },

    // SCENE KEYFRAME SELECTION — m46's payoff: the frame a training
    // pipeline actually KEEPS from each scene (the first frame after
    // every cut), replacing every-Nth sampling that oversamples static
    // shots and misses short ones. Scene numbers are a running count
    // of cut flags over each asset's ordered frames (the q78
    // sessionization shape at frame granularity); the keyframe is the
    // scene's min frame index. Same single doc-keyed window as m46 —
    // no new shuffle shape.
    "m47_scene_keyframes" -> { (s, d) =>
      val w = Window.partitionBy(col("doc_id")).orderBy(col("tidx"))
        .rowsBetween(Window.unboundedPreceding, 0)
      frameDeltas(s, d)
        .withColumn("cut", when(col("l1") > 256L, 1L).otherwise(0L))
        .withColumn("scene_n", sum(col("cut")).over(w))
        .groupBy(col("doc_id"), col("scene_n"))
        .agg(min(col("tidx")).as("key_frame_idx"),
          count(lit(1)).as("n_frames"))
    },

    // PER-SCENE FRAME-BUDGET ALLOCATION — the sampler a video curation
    // pipeline runs after scene detection: each asset gets a fixed
    // budget of 8 frames, apportioned across its scenes PROPORTIONALLY
    // to scene length by the largest-remainder method (floor quotas +
    // the leftover frames to the scenes with the largest integer
    // remainders, remainder DESC / scene ASC tie-break), each quota
    // capped at the scene's own frame count — so long static shots
    // can't eat the budget and short scenes still surface (what
    // every-Nth sampling gets wrong). Scenes come from the SAME delta
    // stream as m46/m47 but at a FINER 32-byte frame size with a
    // proportionally scaled cut rule (L1 > 24 — probed on this corpus:
    // delta quartiles 18/22/28, so the rule splits transitions, and
    // 64-hex frames give ~10/doc where the 256-byte tiles give 1–3,
    // which made an 8-frame budget vacuous — the q139 degeneracy
    // lesson, caught by inspecting the first cut's output).
    // All-integer arithmetic: base = (8·n) div total, remainder =
    // (8·n) mod total — no FP proportion enters either engine. The
    // budget may underfill only when scenes saturate (total < 8), the
    // standard single-pass contract. Plan: one doc-keyed frame window,
    // a doc-keyed scene aggregate, and two windows sharing the SAME
    // doc_id clustering — no new shuffle shape at any corpus size.
    "m48_frame_budget" -> { (s, d) =>
      val budget = 8L
      val wSc = Window.partitionBy(col("doc_id")).orderBy(col("tidx"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val scenes = frameDeltas(s, d, hexPerTile = 64)
        .withColumn("cut", when(col("l1") > 24L, 1L).otherwise(0L))
        .withColumn("scene_n", sum(col("cut")).over(wSc))
        .groupBy(col("doc_id"), col("scene_n"))
        .agg(min(col("tidx")).as("key_frame_idx"),
          count(lit(1)).as("n_frames"))
      val tot = scenes.groupBy(col("doc_id"))
        .agg(sum(col("n_frames")).as("total_frames"))
      val wDoc = Window.partitionBy(col("doc_id"))
      val wR = Window.partitionBy(col("doc_id"))
        .orderBy(col("rem_w").desc, col("scene_n").asc)
      scenes.join(tot, "doc_id")
        .withColumn("base", expr(s"($budget * n_frames) div total_frames"))
        .withColumn("rem_w", expr(s"($budget * n_frames) % total_frames"))
        .withColumn("rrk", row_number().over(wR))
        .withColumn("rem_total", lit(budget) - sum(col("base")).over(wDoc))
        .withColumn("quota", least(
          col("base") + when(col("rrk") <= col("rem_total"), 1L)
            .otherwise(0L),
          col("n_frames")))
        .select(col("doc_id"), col("scene_n"), col("key_frame_idx"),
          col("n_frames"), col("total_frames"), col("quota"))
    },

    // Sub-asset dedup — m34's payoff: tiles whose fingerprint recurs
    // across assets. Whole-file digests (d27/m31) miss assets that
    // share 90% of their bytes; tile-level grouping catches them, and
    // the shuffle key is the 32-char digest, never the tile bytes.
    "m35_shared_tiles" -> { (s, d) =>
      queries("m34_payload_tiles")(s, d)
        .groupBy(col("tile_md5"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_tiles"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") > 1)
    },

    // PER-ASSET TILE-DEDUP RATIO — m35 turned into the per-asset
    // storage-planning number: what fraction of THIS asset's distinct
    // tiles also occur in some other asset (the dedup factor a
    // content-addressed store would realize, and the redundancy signal
    // that flags near-copies before the pairwise m36 pass runs). The
    // shared-tile set derives from one digest-keyed groupBy; flagging
    // rides a digest equi-join back onto the distinct tile list — both
    // shuffles are keyed by the 32-char digest, never tile bytes.
    "m41_tile_dedup_ratio" -> { (s, d) =>
      val tiles = queries("m34_payload_tiles")(s, d)
        .select(col("doc_id"), col("tile_md5")).distinct()
      val shared = tiles.groupBy(col("tile_md5"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1)
        .select(col("tile_md5"), lit(1L).as("shared"))
      tiles.join(shared, Seq("tile_md5"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tiles"),
          sum(coalesce(col("shared"), lit(0L))).as("n_shared"),
          round(sum(coalesce(col("shared"), lit(0L))) / count(lit(1)), 4)
            .as("shared_frac"))
    },

    // BUCKETED BATCH PACKING — the multimodal loader shape (diffusion
    // training's aspect/size bucketing): assets group into SIZE CLASSES
    // (bit-length of the payload byte count — the d48 exact-log2
    // trick), and within each class pack into fixed-byte-budget batches
    // in doc_id order via next-fit: batch = floor(bytes-before / B).
    // A batch may overrun B by less than one asset — the standard
    // streaming-packer contract; assets are never split. The running
    // byte total uses t31's block-offset discipline — per-(class,
    // block) cumsum windows plus a tiny broadcast prefix aggregate —
    // so parallelism is #classes × #blocks, never one task per class.
    // All-integer arithmetic end to end: fill_bp renders the fill
    // fraction in basis points (bytes*10000 div budget), the q122-ppm
    // discipline — no FP division or rounding anywhere in the output,
    // and the oracle casts every windowed-sum-derived integer column
    // to BIGINT (DuckDB widens windowed sum(BIGINT) to HUGEINT, which
    // pandas renders as float64 and would flip the driver's hash).
    "m42_batch_packing" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val budget = 16384L
      val block = 65536
      val base = multimodalTable(s, d)
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("bytes"))
        .withColumn("size_class",
          (length(bin(col("bytes"))) - 1).cast("long"))
        .withColumn("blk", expr(s"doc_id div $block"))
      val wIn = Window.partitionBy(col("size_class"), col("blk"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wBlk = Window.partitionBy(col("size_class")).orderBy(col("blk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = base.groupBy(col("size_class"), col("blk"))
        .agg(sum(col("bytes")).as("bt"))
        .withColumn("off", coalesce(sum(col("bt")).over(wBlk), lit(0L)))
        .select(col("size_class"), col("blk"), col("off"))
      base.withColumn("icum", sum(col("bytes")).over(wIn))
        .join(broadcast(offsets), Seq("size_class", "blk"))
        .withColumn("batch_id", expr(s"(off + icum - bytes) div $budget"))
        .groupBy(col("size_class"), col("batch_id"))
        .agg(count(lit(1)).as("n_assets"),
          sum(col("bytes")).as("batch_bytes"),
          min(col("doc_id")).as("first_doc"))
        .withColumn("fill_bp",
          expr(s"(batch_bytes * 10000) div $budget"))
    },

    // PAYLOAD ENTROPY — the compressibility/quality signal a media
    // pipeline screens on (truncated/constant payloads score near 0,
    // encrypted/compressed ones near max): Shannon entropy over the
    // payload's hex-nibble distribution, computed on the portable hex
    // rendering (the m32/m34 byte-accessor discipline). The alphabet
    // has exactly 16 symbols, so the histogram is computed MAP-SIDE —
    // sixteen length(hx) - length(replace(hx, nib)) counters per row,
    // entropy-reduced over that array with the aggregate() HOF — and
    // the operator is ZERO-shuffle: no per-nibble explode (2 rows per
    // payload byte) and no (doc_id, nibble) exchange at all. log2 via
    // ln/ln(2) identically in both engines; 4-dp final round (the
    // t32 entropy discipline). Zero-length payloads are excluded
    // explicitly: the oracle's position generator emits no rows for
    // them, and the zero-count guard keeps 0·ln(0) NaNs out of the
    // reduce.
    "m37_payload_entropy" -> { (s, d) =>
      // r13: the 16 replace-counters became ONE codegen'd nibble_hist
      // pass over the RAW BINARY payload — identical counts, and the
      // 2× hex rendering is never materialized at all
      multimodalTable(s, d)
        .filter(length(col("payload")) > 0)
        .withColumn("cnts",
          graft.functions.VectorFunctions.nibbleHist(col("payload")))
        .withColumn("pres", filter(col("cnts"), n => n > lit(0L)))
        .withColumn("tot", length(col("payload")).cast("long") * 2)
        .select(col("doc_id"),
          size(col("pres")).cast("long").as("n_distinct_nibbles"),
          col("tot").as("n_nibbles"),
          round(-aggregate(col("pres"), lit(0.0),
            (acc, n) => acc + (n / col("tot")) * log(n / col("tot")) /
              math.log(2.0)), 4).as("entropy_bits"))
    },

    // PER-TILE ENTROPY PROFILE — m34's tiling × m37's entropy, per
    // tile: the signal that localizes WHERE an asset is corrupt or
    // padded (a zero-entropy tile inside a high-entropy payload is
    // truncation/padding; uniform max-entropy tiles are encrypted or
    // compressed regions). Whole-payload entropy (m37) averages that
    // structure away. Same map-only posture as both parents: the ≤64
    // tile rows explode map-side and each tile's 16-symbol histogram
    // is the m37 replace-counter trick on the tile's hex slice —
    // ZERO shuffles, no per-nibble rows.
    "m38_tile_entropy" -> { (s, d) =>
      val hexPerTile = 512 // 256 bytes — m34's tile geometry
      val nibbles = "0123456789abcdef"
      multimodalTable(s, d)
        .withColumn("hx", lower(hex(col("payload"))))
        .withColumn("nt", least(
          ceil(length(col("hx")) / lit(hexPerTile.toDouble)).cast("long"),
          lit(64L)))
        .filter(col("nt") > 0)
        .withColumn("tidx", explode(sequence(lit(0L), col("nt") - 1)))
        .withColumn("th",
          expr(s"substring(hx, CAST(tidx * $hexPerTile + 1 AS INT), $hexPerTile)"))
        .withColumn("tot", length(col("th")).cast("long"))
        .withColumn("cnts",
          graft.functions.VectorFunctions.nibbleHist(col("th")))
        .withColumn("pres", filter(col("cnts"), n => n > lit(0L)))
        .select(col("doc_id"), col("tidx").as("tile_idx"),
          col("tot").as("n_nibbles"),
          round(-aggregate(col("pres"), lit(0.0),
            (acc, n) => acc + (n / col("tot")) * log(n / col("tot")) /
              math.log(2.0)), 4).as("entropy_bits"))
    },

    // POSITIONAL ENTROPY PROFILE — the intro/outro structure detector
    // beside m38's per-tile table: mean frame entropy BY RELATIVE
    // POSITION DECILE across all assets. Position-correlated entropy
    // dips localize padded tails, credits, headers — structure a
    // per-asset mean (m37/m39) averages away and a per-tile table
    // (m38) leaves to the reader to correlate. On this corpus the
    // tail deciles drop 3.10 → 1.85 bits (probed first): final
    // partial frames are short and low-diversity — exactly the shape
    // the profile exists to surface. Frames at m48's 32-byte width;
    // each frame's entropy is the m38 fold (fixed left-to-right
    // aggregate(), 4-dp round), and the per-decile MEAN aggregates
    // 4-dp integer units so no FP summation order can leak. Map-only
    // until the 10-row decile aggregate.
    "m49_positional_entropy" -> { (s, d) =>
      val hexPerTile = 64
      val nibbles = "0123456789abcdef"
      multimodalTable(s, d)
        .withColumn("hx", lower(hex(col("payload"))))
        .withColumn("nt", least(
          ceil(length(col("hx")) / lit(hexPerTile.toDouble)).cast("long"),
          lit(64L)))
        .filter(col("nt") > 0)
        .withColumn("tidx", explode(sequence(lit(0L), col("nt") - 1)))
        .withColumn("th", expr(
          s"substring(hx, CAST(tidx * $hexPerTile + 1 AS INT), $hexPerTile)"))
        .withColumn("tot", length(col("th")).cast("long"))
        .withColumn("cnts",
          graft.functions.VectorFunctions.nibbleHist(col("th")))
        .withColumn("pres", filter(col("cnts"), n => n > lit(0L)))
        .withColumn("ent", round(-aggregate(col("pres"), lit(0.0),
          (acc, n) => acc + (n / col("tot")) * log(n / col("tot")) /
            math.log(2.0)), 4))
        .withColumn("e4u", expr("CAST(round(ent * 10000) AS BIGINT)"))
        .withColumn("decile", expr("(10 * tidx) div nt"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_frames"),
          sum(col("e4u")).as("se4u"),
          min(col("ent")).as("min_entropy"))
        .select(col("decile"), col("n_frames"),
          round(col("se4u") / (col("n_frames") * lit(10000L))
            .cast("double"), 4).as("mean_entropy"),
          col("min_entropy"))
    },

    // PERCEPTUAL-HASH NEAR-DUP — the content-defined binary
    // fingerprint a media store indexes FIRST (the aHash shape): the
    // payload resamples to 64 positional segments with exact integer
    // boundaries ((i·len) div 64 — no empty segment at any length),
    // each segment's nibble-value mass thresholds against the payload
    // total via the exact inequality 64·seg > tot (s66's n·v > sum
    // discipline — no FP mean in either engine), and the 64 bits pack
    // into TWO 32-bit halves (one 64-bit word would need the sign
    // bit; two halves keep every shift signed-safe — the s66/s67
    // packing). Search is d32's banded-Hamming shape: four 16-bit
    // bands generate candidates (shuffle O(assets × 4 band keys),
    // never pairs²), popcount-of-XOR scores every candidate and the
    // is_dup flag marks ≤ 8/64 bits. The FULL scored candidate set
    // ships (1058 rows at sf0.1, 14 at sf0.001 — band-collision-
    // bounded at every scale): on this text-payload corpus the
    // positional profile only collapses to Hamming ≤ 8 for near-
    // identical payloads (8 pairs at sf0.1, none smaller — probed,
    // the q139 degeneracy lesson), so the candidate table with scores
    // IS the operator and m36's exact tile Jaccard is the confirm
    // tier it feeds. The whole fingerprint is 8 bytes/asset — m36's
    // 64-digest tile footprint shrunk ~100× for the first-pass index.
    // Signature table persists at its two-consumer reuse point (both
    // sides of the band self-join).
    "m50_phash_neardup" -> { (s, d) =>
      graft.functions.VectorFunctions.register(s)
      // Signature table persists at its two-consumer reuse point (both
      // sides of the band self-join, plus the auto policy's count).
      val sigs = phashSignatures(multimodalTable(s, d))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // Band width from the auto policy (see resolveBandBits for the
      // full recall/volume contract): the count only fires when the
      // knob is "auto", and it reads the persisted signature table the
      // self-join needs materialized anyway. Both widths are spec-
      // pinned to agree on the sf0.1 is_dup set; at the test SFs auto
      // resolves to 16-bit, so the oracle-matched output is unchanged.
      val setting = s.conf.get("spark.graft.phash.bandBits", "auto")
      val threshold =
        s.conf.get("spark.graft.phash.autoThreshold", "262144").toLong
      phashCandidates(sigs,
        resolveBandBits(setting, sigs.count(), threshold))
    },

    // PAYLOAD STORAGE DEDUP — content-defined chunking of the raw
    // asset bytes (the FastCDC storage primitive, at 16-byte tile
    // granularity): fixed 32-hex tiles, a chunk boundary after any
    // tile whose md5 bucket ≡ 0 (mod 8) — t60's cut rule moved from
    // tokens to byte tiles — and per source the chunk-level dedup
    // ratio a content-addressed store would realize, plus the mean
    // chunk size. ENTIRELY MAP-SIDE until the source rollup: the tile
    // fold runs as one aggregate() HOF pass per payload (no tile
    // explode, no per-doc window, zero pre-rollup shuffle — the
    // cdc_chunks posture on binary). The honest number on this corpus
    // is small (0–5%: only exact-clone payloads share chunks, since
    // fixed tiles can't re-anchor across inserted bytes) and the spec
    // proves the signal by planting clones; on a real media lake this
    // is the dominant storage-cost estimator.
    "m51_payload_cdc" -> { (s, d) =>
      // r14 (same round): the first form folded the tiles with an
      // aggregate() HOF whose array_append copies the accumulated
      // chunk array at every boundary — O(chunks²) per document, a
      // real hazard on GiB assets. The codegen'd cdc_payload_chunks
      // kernel is the linear one-pass form; identical chunk table,
      // identical oracle (CurationSpec pins an 18 MiB payload the
      // quadratic fold could not finish).
      multimodalTable(s, d)
        .filter(length(col("payload")) > 0)
        .withColumn("src", col("meta.source"))
        .withColumn("chunks",
          graft.functions.VectorFunctions.cdcPayloadChunks(col("payload")))
        .select(col("src").as("source"), explode(col("chunks")).as("ch"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("ch.chunk_md5")).as("n_distinct_chunks"),
          sum(col("ch.cbytes")).as("bytes_total"))
        .select(col("source"), col("n_chunks"), col("n_distinct_chunks"),
          round((col("n_chunks") - col("n_distinct_chunks"))
            / col("n_chunks"), 4).as("dedup_ratio"),
          round(col("bytes_total") / col("n_chunks"), 2)
            .as("mean_chunk_bytes"))
    },

    // BYTE-ROLLING GEAR CDC — the re-anchoring storage-dedup tier
    // above m51: boundaries roll a gear hash BYTE AT A TIME
    // (h = 16h + b·2654435761 mod 2³², cut when the top 6 bits are
    // zero, ~64-byte chunks — see GearChunks for the full contract),
    // so an insert/delete realigns after 8 clean bytes and shared
    // content ACROSS edits still chunks identically — the property
    // m51's fixed tiles structurally lack (one inserted byte shifts
    // every later tile). Accounting is a GLOBAL content-addressed
    // store's: each distinct chunk is stored once at its globally
    // first occurrence (row_number over (doc_id, chunk_idx) — total
    // order, engine-exact), every other occurrence is a dedup hit;
    // per source the bytes it would actually store vs ship. ENTIRELY
    // MAP-SIDE through chunking (the codegen'd kernel explodes
    // ~bytes/64 chunk rows at the scan); the only shuffles are the
    // chunk_md5 window and the source rollup — both chunk-granular,
    // never pairs. Ratios are single divisions of exact integers.
    "m52_gear_cdc" -> { (s, d) =>
      graft.functions.VectorFunctions.register(s)
      // DEGENERACY FENCE (r17, SparkEntry.degeneracyFenced): the pure
      // stateless rule turns a run of ≥8 zero bytes into 1-byte chunks
      // forever (gear(0)=0 pins h at 0), so zero/padding-heavy corpora
      // explode to ~64× the designed row volume with an md5 per byte —
      // StressBench measures 16.78 M chunks on a 16.8 MB zero corpus.
      // Probe a bounded payload sample (64 docs, one small job at
      // build time — the q83 eager-guard posture). Deliberately EAGER
      // (r17 considered and rejected a lazy DeferredRows-style gate):
      // under AQE the chunking stage materializes bottom-up BEFORE any
      // root-level gate's doExecute fires, so a lazy fence would
      // refuse only after the explosion it exists to prevent had
      // already run — build time is the one point guaranteed-before.
      // Refuse when the
      // 1-byte-chunk fraction exceeds the bound: healthy content sits
      // near 1/64² ≈ 1.6%, a degenerate corpus near 100%, so the
      // default 0.25 separates them by an order of magnitude each way.
      // m53 (clamped) is the production tier for such corpora.
      val maxDegen =
        s.conf.get("spark.graft.cdc.maxDegenerateFrac", "0.25").toDouble
      val probe = multimodalTable(s, d)
        .filter(length(col("payload")) > 0)
        .limit(64)
        .select(explode(graft.functions.VectorFunctions
          .gearChunks(col("payload"))).as("ch"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("ch.cbytes") === 1, 1L).otherwise(0L)).as("n1"))
        .head()
      val degFrac = if (probe.getLong(0) == 0L) 0.0
        else probe.getLong(1).toDouble / probe.getLong(0)
      require(degFrac <= maxDegen,
        f"m52_gear_cdc refused: sampled 1-byte-chunk fraction $degFrac%.3f" +
          f" exceeds spark.graft.cdc.maxDegenerateFrac=$maxDegen — the" +
          " stateless gear rule degenerates on zero-run/padding-heavy" +
          " payloads (~1 chunk per zero byte); use m53_gear_cdc_clamped," +
          " whose FastCDC clamps cap rows at bytes/16")
      val chunks = multimodalTable(s, d)
        .filter(length(col("payload")) > 0)
        .select(col("doc_id"), col("meta.source").as("source"),
          posexplode(graft.functions.VectorFunctions
            .gearChunks(col("payload"))).as(Seq("chunk_idx", "ch")))
        .select(col("doc_id"), col("source"), col("chunk_idx"),
          col("ch.cbytes").as("cbytes"),
          col("ch.chunk_md5").as("chunk_md5"))
      val ranked = chunks.withColumn("rn",
        row_number().over(Window.partitionBy(col("chunk_md5"))
          .orderBy(col("doc_id").asc, col("chunk_idx").asc)))
      ranked.groupBy(col("source"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("cbytes")).as("bytes_total"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_new_chunks"),
          sum(when(col("rn") === 1, col("cbytes")).otherwise(0L))
            .as("bytes_stored"))
        .select(col("source"), col("n_chunks"), col("bytes_total"),
          col("n_new_chunks"), col("bytes_stored"),
          round(lit(1) - col("bytes_stored") / col("bytes_total"), 4)
            .as("savings_ratio"),
          round(col("bytes_total") / col("n_chunks"), 2)
            .as("mean_chunk_bytes"))
    },

    // CLAMPED GEAR CDC — the PRODUCTION tier of m52. m52's pure
    // stateless rule has a real degeneracy: gear(0) = 0, so a run of
    // ≥8 zero bytes drives h to 0 permanently and every later zero
    // byte is a boundary — zero/padding-heavy payloads (sparse files,
    // uncompressed media, disk images) explode to 1-byte chunks, ~64×
    // the designed row volume with an md5 per byte. This variant adds
    // FastCDC's clamps (no cut until ≥16 bytes since the last cut; a
    // forced cut at 4096), which caps worst-case row volume at
    // bytes/16 and single-chunk memory at 4 KiB while keeping the
    // re-anchoring property (the gear state never resets — after an
    // edit, the first honored boundary past realignment restores
    // lockstep with the unedited twin). Cuts are now a function of
    // the PREVIOUS cut, so the oracle walks them with a recursive
    // CTE (cut → least(next candidate ≥ cut+16, cut+4096, end))
    // instead of m52's stateless lag window — each doc's walk is
    // ~len/64 steps, decorrelated by DuckDB into per-iteration joins.
    // Same global content-addressed-store accounting as m52;
    // chunk-granular shuffles only (chunk_md5 window + source
    // rollup), never pairs.
    "m53_gear_cdc_clamped" -> { (s, d) =>
      graft.functions.VectorFunctions.register(s)
      val chunks = multimodalTable(s, d)
        .filter(length(col("payload")) > 0)
        .select(col("doc_id"), col("meta.source").as("source"),
          posexplode(graft.functions.VectorFunctions
            .gearChunksClamped(col("payload"), 16, 4096))
            .as(Seq("chunk_idx", "ch")))
        .select(col("doc_id"), col("source"), col("chunk_idx"),
          col("ch.cbytes").as("cbytes"),
          col("ch.chunk_md5").as("chunk_md5"))
      val ranked = chunks.withColumn("rn",
        row_number().over(Window.partitionBy(col("chunk_md5"))
          .orderBy(col("doc_id").asc, col("chunk_idx").asc)))
      ranked.groupBy(col("source"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("cbytes")).as("bytes_total"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_new_chunks"),
          sum(when(col("rn") === 1, col("cbytes")).otherwise(0L))
            .as("bytes_stored"))
        .select(col("source"), col("n_chunks"), col("bytes_total"),
          col("n_new_chunks"), col("bytes_stored"),
          round(lit(1) - col("bytes_stored") / col("bytes_total"), 4)
            .as("savings_ratio"),
          round(col("bytes_total") / col("n_chunks"), 2)
            .as("mean_chunk_bytes"))
    },

    // SOURCE FORMAT-DRIFT MONITOR — per-source byte(-nibble)
    // distribution vs the fleet-wide distribution, as an L1 distance:
    // the lakehouse check that catches a source whose payload format
    // silently changed (new codec, new compression, corruption) by its
    // byte-histogram signature BEFORE any decode runs. Entirely
    // map-side: each doc's 16 nibble counts come from the m37
    // replace-counter trick (no explode), the per-source rollup is one
    // partial-agg groupBy, and the fleet totals ride back as a
    // broadcast 1-row cross join (the q84 discipline). The L1 sum is a
    // FIXED-ORDER 16-term chain in both engines — no row-order-
    // dependent float accumulation anywhere.
    "m40_source_drift" -> { (s, d) =>
      // r13: one codegen'd nibble_hist pass over the raw binary
      // replaces the 16 replace-counters AND the 2× hex rendering;
      // tot = 2·payload bytes keeps the identical denominators
      val base = multimodalTable(s, d)
        .filter(length(col("payload")) > 0)
        .withColumn("src", col("meta.source"))
        .withColumn("hist",
          graft.functions.VectorFunctions.nibbleHist(col("payload")))
      val withCnts = (0 until 16).foldLeft(base) {
        case (df, i) => df.withColumn(s"c$i", element_at(col("hist"), i + 1))
      }.withColumn("hxlen", length(col("payload")).cast("long") * 2)
      // persisted: the #sources-row table feeds BOTH the output rows
      // and the fleet-total rollup — without the persist each branch
      // re-runs the corpus scan (2× the map work at 100 TB); with it
      // the rollup reads ~20 cached rows. Released by SparkEntry.release.
      val bySrc = withCnts.groupBy(col("src").as("source"))
        .agg(sum(col("hxlen")).as("tot"),
          (0 until 16).map(i => sum(col(s"c$i")).as(s"s$i")): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val global = bySrc.groupBy()
        .agg(sum(col("tot")).as("gtot"),
          (0 until 16).map(i => sum(col(s"s$i")).as(s"g$i")): _*)
      val l1 = (0 until 16)
        .map(i => abs(col(s"s$i") / col("tot") - col(s"g$i") / col("gtot")))
        .reduce(_ + _)
      bySrc.crossJoin(broadcast(global))
        .select(col("source"), col("tot").as("n_nibbles"),
          round(l1, 6).as("l1_drift"))
    },

    // ASSET QUALITY REPORT — m38's payoff row: per-asset tile-entropy
    // envelope + a suspect flag (any tile under 3.0 bits on this
    // corpus's ~3.2-bit hex-nibble baseline marks padding/truncation/
    // constant regions). One doc_id partial-agg over the map-only m38
    // rows; comparisons run on the already-4-dp-rounded entropies, so
    // the flag is engine-exact.
    "m39_asset_quality" -> { (s, d) =>
      queries("m38_tile_entropy")(s, d)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tiles"),
          min(col("entropy_bits")).as("min_tile_entropy"),
          max(col("entropy_bits")).as("max_tile_entropy"),
          sum(when(col("entropy_bits") < 3.0, 1L).otherwise(0L))
            .as("n_low_entropy"))
        .withColumn("suspect", col("n_low_entropy") > 0)
    },

    // ASSET-LEVEL NEAR-DUP — the multimodal counterpart of d28: pairs
    // of assets whose tile-fingerprint sets overlap at Jaccard ≥ 0.5
    // (re-encoded or truncated copies share most tiles even when the
    // whole-file digest differs). Same candidate-generation shape as
    // the text shingle join — the equi-join key is the 32-char tile
    // digest, never payload bytes, and the per-asset tile count is
    // CAPPED at 64 (m34), so a pathological asset cannot widen the
    // join the way uncapped boilerplate widens d28 (the d33 concern is
    // structurally absent here).
    "m36_asset_similarity" -> { (s, d) =>
      // distinct tile set feeds both join sides and the size lookup —
      // persist once; released by SparkEntry.release()
      val tiles = queries("m34_payload_tiles")(s, d)
        .select(col("doc_id"), col("tile_md5")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sizes = tiles.groupBy(col("doc_id")).agg(count(lit(1)).as("nt"))
      val pairs = tiles.select(col("doc_id").as("ia"), col("tile_md5"))
        .join(tiles.select(col("doc_id").as("ib"),
          col("tile_md5").as("tb")),
          col("tile_md5") === col("tb") && col("ia") < col("ib"))
        .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("inter"))
      pairs
        .join(sizes.select(col("doc_id").as("ia"), col("nt").as("na")), "ia")
        .join(sizes.select(col("doc_id").as("ib"), col("nt").as("nb")), "ib")
        .withColumn("jac",
          col("inter") / (col("na") + col("nb") - col("inter")))
        .filter(col("jac") >= 0.5)
        .select(col("ia"), col("ib"), col("inter"),
          round(col("jac"), 4).as("tile_jaccard"))
    },

    // ASSET NEAR-DUP CLUSTERS — the d41 keep-list contract applied to
    // the MULTIMODAL axis: m36's tile-Jaccard ≥ 0.5 pairs become the
    // edge list, connected components run through the scale-safe
    // large-star/small-star operator (O(log n) rounds — the same
    // DedupClustering the text path trusts), and every asset outside
    // any edge stays its own singleton via the left join. The component
    // label IS the min member id, so keep ≡ (doc_id = cluster_rep) with
    // no extra argmin pass. A re-encoded copy family collapses to one
    // canonical asset here even though every whole-file digest (d27/
    // m31) differs. Beyond m36's own candidate work, exchanges are
    // keyed by doc_id (component join) and cluster_rep (size agg).
    // CLEAN-ASSET VERDICT — the d44 analog for the multimodal table:
    // one per-asset decision composing the dup clusters (m43), the
    // entropy screen (m39), and a min-size gate off the typed metadata,
    // in fixed priority order (duplicate ≻ undecodable ≻ low_entropy ≻
    // tiny ≻ keep). "undecodable" is the asset whose payload produced
    // no tiles at all — the decode-failure branch a real media pipeline
    // must route to quarantine, not silently keep. Joins are all
    // doc_id-keyed; the decision CASE evaluates on already-aggregated
    // per-asset rows, so the verdict costs its component gates plus two
    // keyed joins — the same composition algebra d44 uses for text.
    "m44_clean_assets" -> { (s, d) =>
      val clusters = queries("m43_asset_clusters")(s, d)
        .select(col("doc_id"), col("cluster_rep"),
          col("keep").as("dup_keep"), col("cluster_size"))
      val quality = queries("m39_asset_quality")(s, d)
        .select(col("doc_id"), col("suspect"))
      val meta = multimodalTable(s, d)
        .select(col("doc_id"), col("meta.n_chars").as("n_chars"))
      val decision =
        when(!col("dup_keep"), "duplicate")
          .when(col("suspect").isNull, "undecodable")
          .when(col("suspect"), "low_entropy")
          .when(col("n_chars") < 64, "tiny")
          .otherwise("keep")
      clusters.join(quality, Seq("doc_id"), "left")
        .join(meta, "doc_id")
        .select(col("doc_id"), col("cluster_rep"), col("cluster_size"),
          decision.as("decision"), (decision === "keep").as("keep"))
    },

    "m43_asset_clusters" -> { (s, d) =>
      val edges = queries("m36_asset_similarity")(s, d)
        .select(col("ia"), col("ib"))
      val comps = graft.operators.DedupClustering
        .connectedComponentsStar(edges)
        .withColumnRenamed("cluster_id", "cid")
      // feeds the size aggregate and the final join — persist so the
      // component pass runs once; released by SparkEntry.release()
      val labeled = multimodalTable(s, d).select(col("doc_id"))
        .join(comps, Seq("doc_id"), "left")
        .withColumn("cluster_rep", coalesce(col("cid"), col("doc_id")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sizes = labeled.groupBy(col("cluster_rep"))
        .agg(count(lit(1)).as("cluster_size"))
      labeled.join(sizes, "cluster_rep")
        .select(col("doc_id"), col("cluster_rep"),
          (col("doc_id") === col("cluster_rep")).as("keep"),
          col("cluster_size"))
    },

    // CROSS-MODAL ALIGNMENT SCREEN — the CLIP-score filter shape
    // (LAION's curation step): per paired (asset, caption-embedding)
    // row, the cosine between the asset's encoder features (the m32
    // stub — a real CLIP image tower swaps in behind the same 8-dim
    // contract) and the text embedding's leading 8 dims, with the
    // bottom decile flagged for quarantine. The flag is RANK-based
    // (global row_number over the 6-dp rounded score via the
    // block-distributed rank, cut at ceil(n/10)) — never a float
    // threshold compare, so the boundary rows are integer-exact in
    // both engines. The stub features are n/65536 with n < 2^16 —
    // exactly representable in FLOAT32 — so the float cast in the
    // feature contract costs zero precision and the oracle can replay
    // in doubles. Join is doc_id = vec_id equi (the pairing contract);
    // everything else is map-side + one rank shuffle.
    "m45_crossmodal_align" -> { (s, d) =>
      graft.functions.VectorFunctions.register(s)
      val assets = multimodalTable(s, d)
        .select(col("doc_id"), col("meta.source").as("source"),
          stubFeatures(col("payload")).cast("array<double>").as("afeat"))
      val txt = t(s, d, "embeddings")
        .select(col("vec_id"),
          slice(col("embedding").cast("array<double>"), 1, featureDim)
            .as("tfeat"))
      val scoredRaw = assets.join(txt, col("doc_id") === col("vec_id"))
        .withColumn("align_cos", round(
          graft.functions.VectorFunctions
            .cosineSim(col("afeat"), col("tfeat")), 6))
        .select(col("doc_id"), col("source"), col("align_cos"))
      val ranked = graft.operators.DistributedRank.rowNumber(scoredRaw,
        Seq.empty, Seq(col("align_cos").asc, col("doc_id").asc),
        floor(col("align_cos") * 10), "align_rank")
      val n = scoredRaw.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(n))
        .select(col("doc_id"), col("source"), col("align_cos"),
          col("align_rank"),
          (col("align_rank") <= expr("(n + 9) div 10")).as("low_align"))
    }
  )

  /** m32 oracle: DuckDB has no hex→int conv(), so each 4-hex-digit
    * group is rebuilt nibble-by-nibble via strpos on the hex alphabet —
    * the same portable-hash discipline as d32. */
  private def m32Oracle: String = {
    def nib(pos: String) =
      s"(strpos('0123456789abcdef', substring(hx, $pos, 1)) - 1)"
    s"""WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents)
       |SELECT doc_id, CAST(i AS BIGINT) AS dim,
       | round((${nib("i*4 + 1")} * 4096 + ${nib("i*4 + 2")} * 256 +
       |        ${nib("i*4 + 3")} * 16 + ${nib("i*4 + 4")}) / 65536.0, 6) AS value
       |FROM h, range(0, $featureDim) r(i)""".stripMargin
  }

  /** m38 oracle: m34's tile CTEs + m37's per-position nibble counting
    * scoped to the tile substring; shared verbatim by m39's rollup. */
  /** Per-nibble counter columns (`c0..c15`, nibble order) over a hex
    * string column — the oracle-side mirror of the Spark 16-counter
    * map-side histogram. */
  private def nibbleCountCols(src: String): String =
    "0123456789abcdef".zipWithIndex.map { case (ch, i) =>
      s"CAST(length($src) - length(replace($src, '$ch', '')) AS BIGINT) AS c$i"
    }.mkString(", ")

  /** Fixed-order entropy sum over `c0..c15` / `tot` — explicit
    * left-associated 16-term addition in NIBBLE ORDER, replicating
    * Spark's ordered aggregate() fold bit-for-bit (an unordered SQL
    * SUM over nibble-group rows lets the engine pick a summation
    * order, and a 4-dp half-tie would then flake the hash gate —
    * the r11 m38/m49 advisory). Absent nibbles add an exact 0.0,
    * which is an IEEE identity on the accumulator. */
  private def entropySumSql: String =
    (0 until 16).map(i =>
      s"(CASE WHEN c$i > 0 THEN (c$i / tot) * ln(c$i / tot) / ln(2) " +
        "ELSE 0.0 END)").mkString(" + ")

  private def m38OracleSql: String =
      s"""WITH p AS (
        | SELECT doc_id, lower(hex(text)) AS hx FROM documents),
        |n AS (
        | SELECT doc_id, hx,
        |  least(CAST(ceil(length(hx) / 512.0) AS BIGINT), 64) AS nt
        | FROM p),
        |tiles AS (
        | SELECT doc_id, CAST(i AS BIGINT) AS tile_idx,
        |  substring(hx, CAST(i*512 + 1 AS BIGINT), 512) AS th
        | FROM n, range(0, 64) r(i)
        | WHERE i < nt),
        |c AS (
        | SELECT doc_id, tile_idx, CAST(length(th) AS BIGINT) AS tot,
        |  ${nibbleCountCols("th")}
        | FROM tiles)
        |SELECT doc_id, tile_idx, tot AS n_nibbles,
        | round(-($entropySumSql), 4) AS entropy_bits
        |FROM c""".stripMargin

  /** DuckDB rendering of [[frameDeltas]] — the shared m46/m47/m48 CTE
    * prefix ending in `f(doc_id, tidx, l1)` with l1 NULL on first
    * frames. Parameterized by the hex-per-frame width (512 for the
    * m46/m47 tile granularity, 64 for m48's finer frames). */
  private def frameDeltaCteFor(hexPerTile: Int): String =
    s"""p AS (
      | SELECT doc_id, lower(hex(text)) AS hx FROM documents),
      |n AS (
      | SELECT doc_id, hx,
      |  least(CAST(ceil(length(hx) / $hexPerTile.0) AS BIGINT), 64) AS nt
      | FROM p WHERE length(hx) > 0),
      |tiles AS (
      | SELECT doc_id, CAST(i AS BIGINT) AS tidx,
      |  substring(hx, CAST(i*$hexPerTile + 1 AS BIGINT), $hexPerTile)
      |   AS tile
      | FROM n, range(0, 64) r(i)
      | WHERE i < nt),
      |g AS (
      | SELECT doc_id, tidx, tile,
      |  substring('0123456789abcdef', CAST(h.i AS BIGINT), 1) AS nb
      | FROM tiles, range(1, 17) h(i)),
      |c AS (
      | SELECT doc_id, tidx, nb,
      |  length(tile) - length(replace(tile, nb, '')) AS cnt
      | FROM g),
      |l AS (
      | SELECT doc_id, tidx, nb, cnt,
      |  lag(cnt) OVER (PARTITION BY doc_id, nb ORDER BY tidx) AS pcnt
      | FROM c),
      |l1 AS (
      | SELECT doc_id, tidx, CAST(sum(abs(cnt - pcnt)) AS BIGINT) AS l1
      | FROM l WHERE pcnt IS NOT NULL GROUP BY 1, 2),
      |f AS (
      | SELECT t.doc_id, t.tidx, l1.l1
      | FROM tiles t LEFT JOIN l1 ON t.doc_id = l1.doc_id
      |  AND t.tidx = l1.tidx)""".stripMargin

  private val frameDeltaCte: String = frameDeltaCteFor(512)

  /** m46/m47's shared per-frame delta stream: m34's payload tiles as
    * ordered "frames", 16-bin nibble histograms (the m40
    * replace-counter, zero explode) lagged over ONE doc-keyed window,
    * integer L1 between consecutive frames (`l1` is NULL on each
    * asset's first frame). m48 uses the same stream at a FINER
    * 32-byte (64-hex) frame size — this corpus's short payloads give
    * only 1–3 of the 256-byte tiles, which degenerates a per-scene
    * frame budget (probed; the q139 lesson), while 64-hex frames give
    * ~10/doc. */
  private def frameDeltas(s: SparkSession, d: String,
      hexPerTile: Int = 512): DataFrame = {
    val tiles = multimodalTable(s, d)
      .withColumn("hx", lower(hex(col("payload"))))
      .withColumn("nt", least(
        ceil(length(col("hx")) / lit(hexPerTile.toDouble)).cast("long"),
        lit(64L)))
      .filter(col("nt") > 0)
      .withColumn("tidx", explode(sequence(lit(0L), col("nt") - 1)))
      .withColumn("tile", expr(
        s"substring(hx, CAST(tidx * $hexPerTile + 1 AS INT), $hexPerTile)"))
      .select(col("doc_id"), col("tidx"), col("tile"))
    // r13: one codegen'd nibble_hist pass per frame replaces the 16
    // replace-scans — identical counts
    val withHist = tiles.withColumn("hist",
      graft.functions.VectorFunctions.nibbleHist(col("tile")))
    val withCnts = (0 until 16).foldLeft(withHist) { case (df, i) =>
      df.withColumn(s"c$i", element_at(col("hist"), i + 1))
    }
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tidx"))
    val lagged = (0 until 16).foldLeft(withCnts) { case (df, i) =>
      df.withColumn(s"p$i", lag(col(s"c$i"), 1).over(w))
    }
    val l1 = (0 until 16).map(i =>
      abs(col(s"c$i") - col(s"p$i"))).reduce(_ + _)
    lagged.withColumn("l1", when(col("p0").isNotNull, l1))
      .select(col("doc_id"), col("tidx"), col("l1"))
  }

  /** hex(text) hexes the string's UTF-8 bytes in DuckDB — the same
    * bytes Spark's hex(encode(text,'utf-8')) renders; lower() pins the
    * case on both sides. range(0,64) mirrors the explicit cap. */
  private def m34OracleSql: String =
    """WITH p AS (
      | SELECT doc_id, lower(hex(text)) AS hx FROM documents),
      |n AS (
      | SELECT doc_id, hx,
      |  least(CAST(ceil(length(hx) / 512.0) AS BIGINT), 64) AS nt
      | FROM p)
      |SELECT doc_id, CAST(i AS BIGINT) AS tile_idx,
      | CAST(length(substring(hx, CAST(i*512 + 1 AS BIGINT), 512)) // 2
      |   AS BIGINT) AS tile_bytes,
      | md5(substring(hx, CAST(i*512 + 1 AS BIGINT), 512)) AS tile_md5
      |FROM n, range(0, 64) r(i)
      |WHERE i < nt""".stripMargin

  lazy val oracle: Map[String, String] = Map(
    // m34's tile CTEs + the m40 replace-counter (dense over the 16
    // nibbles by construction), per-nibble lag, integer L1 rollup
    "m46_shot_boundaries" ->
      s"""WITH $frameDeltaCte
        |SELECT doc_id, count(*) AS n_frames,
        | CAST(sum(CASE WHEN l1 > 256 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_cuts,
        | CAST(max(coalesce(l1, 0)) AS BIGINT) AS max_l1,
        | CAST(sum(CASE WHEN l1 > 256 THEN 1 ELSE 0 END) + 1 AS BIGINT)
        |   AS n_scenes
        |FROM f GROUP BY 1""".stripMargin,
    // the same delta CTEs; scene = running cut count, keyframe = min
    "m47_scene_keyframes" ->
      s"""WITH $frameDeltaCte,
        |sc AS (
        | SELECT doc_id, tidx,
        |  CAST(sum(CASE WHEN l1 > 256 THEN 1 ELSE 0 END) OVER
        |   (PARTITION BY doc_id ORDER BY tidx
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS BIGINT) AS scene_n
        | FROM f)
        |SELECT doc_id, scene_n, min(tidx) AS key_frame_idx,
        | count(*) AS n_frames
        |FROM sc GROUP BY 1, 2""".stripMargin,
    // the delta CTEs at the finer 64-hex frame width with the scaled
    // L1 > 24 cut, then the identical integer largest-remainder
    // apportionment over the scene aggregate
    "m48_frame_budget" ->
      s"""WITH ${frameDeltaCteFor(64)},
        |sc AS (
        | SELECT doc_id, tidx,
        |  CAST(sum(CASE WHEN l1 > 24 THEN 1 ELSE 0 END) OVER
        |   (PARTITION BY doc_id ORDER BY tidx
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS BIGINT) AS scene_n
        | FROM f),
        |scenes AS (
        | SELECT doc_id, scene_n, min(tidx) AS key_frame_idx,
        |  count(*) AS n_frames
        | FROM sc GROUP BY 1, 2),
        |tt AS (
        | SELECT doc_id, CAST(sum(n_frames) AS BIGINT) AS total_frames
        | FROM scenes GROUP BY 1),
        |b AS (
        | SELECT s.doc_id, s.scene_n, s.key_frame_idx, s.n_frames,
        |  tt.total_frames,
        |  (8 * s.n_frames) // tt.total_frames AS base,
        |  (8 * s.n_frames) % tt.total_frames AS rem_w
        | FROM scenes s JOIN tt USING (doc_id)),
        |r AS (
        | SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY rem_w DESC, scene_n ASC) AS rrk,
        |  8 - sum(base) OVER (PARTITION BY doc_id) AS rem_total
        | FROM b)
        |SELECT doc_id, scene_n, key_frame_idx, n_frames, total_frames,
        | CAST(least(base + CASE WHEN rrk <= rem_total THEN 1 ELSE 0 END,
        |   n_frames) AS BIGINT) AS quota
        |FROM r""".stripMargin,
    // m38's entropy CTEs at the 64-hex frame width, the same
    // (10·tidx) div nt decile key, and the integer-unit mean
    // frame entropy via the shared fixed-order 16-term sum (see
    // entropySumSql — replicates Spark's ordered fold bit-for-bit)
    "m49_positional_entropy" ->
      s"""WITH p AS (
        | SELECT doc_id, lower(hex(text)) AS hx FROM documents),
        |n AS (
        | SELECT doc_id, hx,
        |  least(CAST(ceil(length(hx) / 64.0) AS BIGINT), 64) AS nt
        | FROM p WHERE length(hx) > 0),
        |tiles AS (
        | SELECT doc_id, CAST(i AS BIGINT) AS tidx, nt,
        |  substring(hx, CAST(i*64 + 1 AS BIGINT), 64) AS th
        | FROM n, range(0, 64) r(i)
        | WHERE i < nt),
        |c AS (
        | SELECT doc_id, tidx, nt, CAST(length(th) AS BIGINT) AS tot,
        |  ${nibbleCountCols("th")}
        | FROM tiles),
        |ent AS (
        | SELECT doc_id, tidx, nt,
        |  round(-($entropySumSql), 4) AS ent
        | FROM c),
        |d AS (
        | SELECT (10 * tidx) // nt AS decile,
        |  CAST(round(ent * 10000) AS BIGINT) AS e4u, ent
        | FROM ent)
        |SELECT decile, count(*) AS n_frames,
        | round(CAST(sum(e4u) AS BIGINT)
        |  / CAST(count(*) * 10000 AS DOUBLE), 4) AS mean_entropy,
        | min(ent) AS min_entropy
        |FROM d GROUP BY 1""".stripMargin,
    // the m32 nibble arithmetic rebuilt as an inline 8-element list
    // (values n/65536 are exact in FLOAT32, so doubles replay the
    // Spark float contract bit-for-bit); rank-based decile cut
    "m45_crossmodal_align" -> {
      def nib(pos: String) =
        s"(strpos('0123456789abcdef', substring(hx, $pos, 1)) - 1)"
      val feat = (0 until featureDim).map { i =>
        s"(${nib(s"${i * 4} + 1")} * 4096 + ${nib(s"${i * 4} + 2")} * 256 + " +
          s"${nib(s"${i * 4} + 3")} * 16 + ${nib(s"${i * 4} + 4")}) / 65536.0"
      }.mkString("[", ", ", "]")
      s"""WITH a AS (
         | SELECT doc_id, source, md5(text) AS hx FROM documents),
         |af AS (
         | SELECT doc_id, source, $feat AS afeat FROM a),
         |tf AS (
         | SELECT vec_id, CAST(embedding[1:$featureDim] AS DOUBLE[]) AS tfeat
         | FROM embeddings),
         |sc AS (
         | SELECT doc_id, source,
         |  round(list_dot_product(afeat, tfeat) /
         |   (sqrt(list_dot_product(afeat, afeat)) *
         |    sqrt(list_dot_product(tfeat, tfeat))), 6) AS align_cos
         | FROM af JOIN tf ON doc_id = vec_id),
         |r AS (
         | SELECT *, row_number() OVER (ORDER BY align_cos ASC, doc_id ASC)
         |    AS align_rank,
         |  count(*) OVER () AS n FROM sc)
         |SELECT doc_id, source, align_cos, align_rank,
         | (align_rank <= (n + 9) // 10) AS low_align
         |FROM r""".stripMargin
    },
    "m34_payload_tiles" -> m34OracleSql,
    // the same exact segment boundaries ((i*ln)//64), nibble-value
    // mass via the 16-counter replace form (integer-identical to the
    // Spark per-position fold), 64·v > tot bit rule, two-half packing,
    // d32-style band join + popcount confirm
    "m50_phash_neardup" -> {
      val nibMass = "0123456789abcdef".zipWithIndex.filter(_._2 > 0)
        .map { case (ch, v) =>
          s"$v * (length(sg) - length(replace(sg, '$ch', '')))"
        }.mkString(" + ")
      s"""WITH h AS (
         | SELECT doc_id, lower(hex(text)) AS hx FROM documents
         | WHERE length(lower(hex(text))) >= 64),
         |seg AS (
         | SELECT doc_id, CAST(i AS BIGINT) AS i,
         |  substring(hx, (i * length(hx)) // 64 + 1,
         |   ((i + 1) * length(hx)) // 64 - (i * length(hx)) // 64) AS sg
         | FROM h, range(0, 64) r(i)),
         |sv AS (
         | SELECT doc_id, i, CAST($nibMass AS BIGINT) AS v FROM seg),
         |t AS (
         | SELECT doc_id, CAST(sum(v) AS BIGINT) AS tot
         | FROM sv GROUP BY 1),
         |b AS (
         | SELECT sv.doc_id, sv.i,
         |  CASE WHEN sv.v * 64 > t.tot THEN 1 ELSE 0 END AS bit
         | FROM sv JOIN t ON sv.doc_id = t.doc_id),
         |ph AS (
         | SELECT doc_id,
         |  CAST(sum(CASE WHEN i < 32
         |   THEN CAST(bit AS BIGINT) << CAST(31 - i AS INT)
         |   ELSE 0 END) AS BIGINT) AS ph_hi,
         |  CAST(sum(CASE WHEN i >= 32
         |   THEN CAST(bit AS BIGINT) << CAST(63 - i AS INT)
         |   ELSE 0 END) AS BIGINT) AS ph_lo
         | FROM b GROUP BY 1),
         |banded AS (
         | SELECT doc_id, ph_hi, ph_lo, bb.bi,
         |  CASE bb.bi WHEN 0 THEN (ph_hi >> 16) & 65535
         |             WHEN 1 THEN ph_hi & 65535
         |             WHEN 2 THEN (ph_lo >> 16) & 65535
         |             ELSE ph_lo & 65535 END AS bv
         | FROM ph, (VALUES (0),(1),(2),(3)) bb(bi)),
         |cands AS (
         | SELECT DISTINCT a.doc_id AS ia, b2.doc_id AS ib,
         |  a.ph_hi AS ha, a.ph_lo AS la, b2.ph_hi AS hb, b2.ph_lo AS lb
         | FROM banded a JOIN banded b2
         |  ON a.bi = b2.bi AND a.bv = b2.bv AND a.doc_id < b2.doc_id)
         |SELECT ia, ib,
         | CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS BIGINT)
         |   AS hamming,
         | (bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 8) AS is_dup
         |FROM cands""".stripMargin
    },
    // the same tile cut rule rendered declaratively (unnest + per-doc
    // prefix-sum window + ordered string_agg) — the HOF fold on the
    // Spark side is a pure evaluation-strategy choice
    "m51_payload_cdc" -> {
      val b = graft.queries.SamplingOps.bucketSql("tl.tile")
      s"""WITH hx AS (
         | SELECT doc_id, source, lower(hex(encode(text))) AS h
         | FROM documents WHERE length(text) > 0),
         |tiles AS (
         | SELECT doc_id, source,
         |  unnest(list_transform(
         |    range(0, CAST(ceil(length(h) / 32.0) AS INTEGER)),
         |    i -> struct_pack(tidx := i,
         |      tile := substring(h, i * 32 + 1, 32)))) AS tl
         | FROM hx),
         |flags AS (
         | SELECT doc_id, source, CAST(tl.tidx AS BIGINT) AS tidx,
         |  tl.tile AS tile,
         |  CASE WHEN ($b) % 8 = 0 THEN 1 ELSE 0 END AS bnd
         | FROM tiles),
         |assigned AS (
         | SELECT *, coalesce(sum(bnd) OVER (PARTITION BY doc_id
         |   ORDER BY tidx ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |   AS chunk_idx
         | FROM flags),
         |chunks AS (
         | SELECT doc_id, source, chunk_idx,
         |  CAST(sum(length(tile)) / 2 AS BIGINT) AS cbytes,
         |  md5(string_agg(tile, '' ORDER BY tidx ASC)) AS chunk_md5
         | FROM assigned GROUP BY 1, 2, 3)
         |SELECT source, count(*) AS n_chunks,
         | CAST(count(DISTINCT chunk_md5) AS BIGINT) AS n_distinct_chunks,
         | round((count(*) - count(DISTINCT chunk_md5)) / count(*), 4)
         |   AS dedup_ratio,
         | round(sum(cbytes) / count(*), 2) AS mean_chunk_bytes
         |FROM chunks GROUP BY 1""".stripMargin
    },
    // the gear recurrence unrolled: 16⁸ ≡ 0 (mod 2³²) bounds the
    // window to 8 trailing bytes, so h at every position is an
    // 8-term lag sum — the stateless-boundary design is exactly what
    // makes this declarative rendering possible (a reset-at-boundary
    // rule would need a recursive scan)
    "m52_gear_cdc" -> {
      val lags = (0 until 8).map(k =>
        s"(${BigInt(16).pow(k)} * coalesce(lag(gv, $k) OVER w, 0))")
        .mkString("\n         |   + ")
      s"""WITH hx AS (
         | SELECT doc_id, source, lower(hex(encode(text))) AS h
         | FROM documents WHERE length(text) > 0),
         |pos AS (
         | SELECT doc_id, source, CAST(i AS BIGINT) AS i,
         |  substring(h, 2*i+1, 2) AS hp,
         |  ((strpos('0123456789abcdef',
         |      substring(h, 2*i+1, 1)) - 1) * 16 +
         |   (strpos('0123456789abcdef',
         |      substring(h, 2*i+2, 1)) - 1)) AS byte
         | FROM hx, LATERAL unnest(range(0, length(h)//2)) AS u(i)),
         |g AS (
         | SELECT doc_id, source, i, hp,
         |  (byte * 2654435761) % 4294967296 AS gv
         | FROM pos),
         |rolled AS (
         | SELECT doc_id, source, i, hp,
         |  ($lags) % 4294967296 AS hh
         | FROM g WINDOW w AS (PARTITION BY doc_id ORDER BY i ASC)),
         |flagged AS (
         | SELECT doc_id, source, i, hp,
         |  CASE WHEN hh < 67108864 THEN 1 ELSE 0 END AS bnd
         | FROM rolled),
         |assigned AS (
         | SELECT *, coalesce(sum(bnd) OVER (PARTITION BY doc_id
         |   ORDER BY i ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |   AS chunk_idx
         | FROM flagged),
         |chunks AS (
         | SELECT doc_id, source, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |  CAST(count(*) AS BIGINT) AS cbytes,
         |  md5(string_agg(hp, '' ORDER BY i ASC)) AS chunk_md5
         | FROM assigned GROUP BY 1, 2, 3),
         |ranked AS (
         | SELECT source, cbytes,
         |  row_number() OVER (PARTITION BY chunk_md5
         |   ORDER BY doc_id ASC, chunk_idx ASC) AS rn
         | FROM chunks)
         |SELECT source, count(*) AS n_chunks,
         | CAST(sum(cbytes) AS BIGINT) AS bytes_total,
         | CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_new_chunks,
         | CAST(sum(CASE WHEN rn = 1 THEN cbytes ELSE 0 END) AS BIGINT)
         |   AS bytes_stored,
         | round(1 - sum(CASE WHEN rn = 1 THEN cbytes ELSE 0 END)
         |   / sum(cbytes), 4) AS savings_ratio,
         | round(sum(cbytes) / count(*), 2) AS mean_chunk_bytes
         |FROM ranked GROUP BY 1""".stripMargin
    },
    // the clamped cut walk lives in gearClampedChunksCte (shared with
    // the d65 oracle); from its `chunks` table the accounting is
    // byte-for-byte m52's first-occurrence window + source rollup
    "m53_gear_cdc_clamped" -> {
      s"""$gearClampedChunksCte,
         |ranked AS (
         | SELECT source, cbytes,
         |  row_number() OVER (PARTITION BY chunk_md5
         |   ORDER BY doc_id ASC, chunk_idx ASC) AS rn
         | FROM chunks)
         |SELECT source, count(*) AS n_chunks,
         | CAST(sum(cbytes) AS BIGINT) AS bytes_total,
         | CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_new_chunks,
         | CAST(sum(CASE WHEN rn = 1 THEN cbytes ELSE 0 END) AS BIGINT)
         |   AS bytes_stored,
         | round(1 - sum(CASE WHEN rn = 1 THEN cbytes ELSE 0 END)
         |   / sum(cbytes), 4) AS savings_ratio,
         | round(sum(cbytes) / count(*), 2) AS mean_chunk_bytes
         |FROM ranked GROUP BY 1""".stripMargin
    },
    // the same next-fit rule over a single-window cumsum rendering
    // (the block-offset form is bitwise identical to it)
    "m42_batch_packing" ->
      """WITH a AS (
        | SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS bytes
        | FROM documents),
        |c AS (
        | SELECT doc_id, bytes,
        |  CAST(length(bin(bytes)) - 1 AS BIGINT) AS size_class
        | FROM a),
        |k AS (
        | SELECT size_class, doc_id, bytes,
        |  sum(bytes) OVER (PARTITION BY size_class ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS icum
        | FROM c)
        |SELECT size_class,
        | CAST((icum - bytes) // 16384 AS BIGINT) AS batch_id,
        | count(*) AS n_assets, CAST(sum(bytes) AS BIGINT) AS batch_bytes,
        | CAST(min(doc_id) AS BIGINT) AS first_doc,
        | CAST((CAST(sum(bytes) AS BIGINT) * 10000) // 16384 AS BIGINT)
        |   AS fill_bp
        |FROM k GROUP BY 1, 2""".stripMargin,
    // wraps the m34 tile SQL verbatim; distinct tiles per asset, the
    // shared set via the same >1-doc digest rule as m35
    "m41_tile_dedup_ratio" ->
      s"""WITH tiles AS (
         | SELECT DISTINCT doc_id, tile_md5 FROM ($m34OracleSql) m34),
         |sh AS (
         | SELECT tile_md5 FROM tiles GROUP BY 1
         | HAVING count(DISTINCT doc_id) > 1)
         |SELECT t.doc_id, count(*) AS n_tiles,
         | CAST(sum(CASE WHEN sh.tile_md5 IS NOT NULL THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_shared,
         | round(sum(CASE WHEN sh.tile_md5 IS NOT NULL THEN 1 ELSE 0 END)
         |   / count(*), 4) AS shared_frac
         |FROM tiles t LEFT JOIN sh ON t.tile_md5 = sh.tile_md5
         |GROUP BY 1""".stripMargin,
    // m34's tile CTEs + m37's per-position nibble counting, scoped to
    // the tile substring; identical ln/ln(2) arithmetic and 4-dp round
    "m38_tile_entropy" -> m38OracleSql,
    // wraps the m38 SQL verbatim; the flag compares the 4-dp-rounded
    // entropies, identical in both engines
    "m39_asset_quality" -> m39OracleSql,
    "m35_shared_tiles" ->
      s"""SELECT tile_md5, count(DISTINCT doc_id) AS n_docs,
         | count(*) AS n_tiles, min(doc_id) AS first_doc
         |FROM ($m34OracleSql)
         |GROUP BY 1 HAVING count(DISTINCT doc_id) > 1""".stripMargin,
    // nibble positions generate from the ACTUAL hex length (unnest of
    // a per-row generate_series — no silent 8 KiB payload cap, and
    // zero-length payloads emit no rows, matching the Spark-side
    // guard) over the identical hex rendering; ln/ln(2) with the
    // division order preserved
    // the same 16 replace-counters, per-source sums, and the IDENTICAL
    // fixed-order 16-term L1 chain (left-associated + in both engines)
    "m40_source_drift" -> {
      val sums = (0 until 16).map { i =>
        val c = "0123456789abcdef" (i)
        s"sum(length(hx) - length(replace(hx, '$c', ''))) AS s$i"
      }.mkString(",\n  ")
      val gsums = (0 until 16).map(i => s"sum(s$i) AS g$i").mkString(", ")
      val l1 = (0 until 16)
        .map(i => s"abs(s.s$i / s.tot - g.g$i / g.gtot)").mkString(" + ")
      s"""WITH h AS (
         | SELECT source, lower(hex(text)) AS hx FROM documents
         | WHERE length(hex(text)) > 0),
         |s AS (
         | SELECT source, sum(length(hx)) AS tot,
         |  $sums
         | FROM h GROUP BY 1),
         |g AS (SELECT sum(tot) AS gtot, $gsums FROM s)
         |SELECT s.source, CAST(s.tot AS BIGINT) AS n_nibbles,
         | round($l1, 6) AS l1_drift
         |FROM s, g""".stripMargin
    },
    // whole-payload entropy via the shared fixed-order 16-term sum
    // (see entropySumSql — replicates Spark's ordered fold)
    "m37_payload_entropy" ->
      s"""WITH h AS (
        | SELECT doc_id, lower(hex(text)) AS hx FROM documents
        | WHERE length(lower(hex(text))) > 0),
        |c AS (
        | SELECT doc_id, CAST(length(hx) AS BIGINT) AS tot,
        |  ${nibbleCountCols("hx")}
        | FROM h)
        |SELECT doc_id,
        | CAST(${(0 until 16).map(i => s"(CASE WHEN c$i > 0 THEN 1 ELSE 0 END)").mkString(" + ")}
        |   AS BIGINT) AS n_distinct_nibbles,
        | tot AS n_nibbles,
        | round(-($entropySumSql), 4) AS entropy_bits
        |FROM c""".stripMargin,
    // wraps the m34 tile SQL verbatim; the same distinct-set Jaccard
    // algebra as d28 over exact integer counts, one 4-dp final round
    "m36_asset_similarity" ->
      s"""WITH tiles AS (
         | SELECT DISTINCT doc_id, tile_md5 FROM ($m34OracleSql)),
         |sz AS (SELECT doc_id, count(*) AS nt FROM tiles GROUP BY 1),
         |pr AS (
         | SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
         | FROM tiles a JOIN tiles b
         |   ON a.tile_md5 = b.tile_md5 AND a.doc_id < b.doc_id
         | GROUP BY 1, 2)
         |SELECT ia, ib, inter,
         | round(inter / (sa.nt + sb.nt - inter), 4) AS tile_jaccard
         |FROM pr
         | JOIN sz sa ON sa.doc_id = ia
         | JOIN sz sb ON sb.doc_id = ib
         |WHERE inter / (sa.nt + sb.nt - inter) >= 0.5""".stripMargin,
    // md5(string) in DuckDB == md5(utf-8 bytes) in Spark: same digest.
    "m31_payload_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
        | md5(text) AS payload_md5, source
        |FROM documents""".stripMargin,
    "m32_payload_features" -> m32Oracle,
    // range(0, 64) mirrors the Spark side's explicit 64-frame cap
    // (least(nf, 64)) — both engines share the bounded-sampling
    // semantic, so the compare stays exact for any document length.
    "m33_frame_sample" ->
      """WITH f AS (SELECT doc_id, text,
        |  least(CAST(floor(length(text) / 32) AS BIGINT), 64) AS nf
        | FROM documents)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        | md5(substring(text, CAST(i*32 + 1 AS BIGINT), 32)) AS frame_md5
        |FROM f, range(0, 64) r(i)
        |WHERE i < nf AND i % 4 = 0""".stripMargin,
    // m36's edge CTEs + the d31-family recursive transitive closure +
    // the d41 singleton/keep/size finishing, all integer/boolean
    "m43_asset_clusters" -> m43OracleSql,
    // wraps the m43 + m39 oracles verbatim with the identical decision
    // CASE; meta.n_chars reads straight off the documents view
    "m44_clean_assets" ->
      s"""WITH cl AS (
         | SELECT doc_id, cluster_rep, keep AS dup_keep, cluster_size
         | FROM ($m43OracleSql) m43),
         |q AS (SELECT doc_id, suspect FROM ($m39OracleSql) m39),
         |meta AS (SELECT doc_id, n_chars FROM documents)
         |SELECT cl.doc_id, cl.cluster_rep, cl.cluster_size,
         | CASE WHEN NOT cl.dup_keep THEN 'duplicate'
         |      WHEN q.suspect IS NULL THEN 'undecodable'
         |      WHEN q.suspect THEN 'low_entropy'
         |      WHEN meta.n_chars < 64 THEN 'tiny'
         |      ELSE 'keep' END AS decision,
         | (CASE WHEN NOT cl.dup_keep THEN 'duplicate'
         |      WHEN q.suspect IS NULL THEN 'undecodable'
         |      WHEN q.suspect THEN 'low_entropy'
         |      WHEN meta.n_chars < 64 THEN 'tiny'
         |      ELSE 'keep' END) = 'keep' AS keep
         |FROM cl LEFT JOIN q ON cl.doc_id = q.doc_id
         | JOIN meta ON cl.doc_id = meta.doc_id""".stripMargin)

  private def m43OracleSql: String =
      s"""WITH tiles AS (
         | SELECT DISTINCT doc_id, tile_md5 FROM ($m34OracleSql)),
         |sz AS (SELECT doc_id, count(*) AS nt FROM tiles GROUP BY 1),
         |pr AS (
         | SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
         | FROM tiles a JOIN tiles b
         |   ON a.tile_md5 = b.tile_md5 AND a.doc_id < b.doc_id
         | GROUP BY 1, 2),
         |edges0 AS (
         | SELECT ia, ib FROM pr
         |  JOIN sz sa ON sa.doc_id = ia
         |  JOIN sz sb ON sb.doc_id = ib
         | WHERE inter / (sa.nt + sb.nt - inter) >= 0.5),
         |edges AS (SELECT ia AS src, ib AS dst FROM edges0
         |          UNION SELECT ib, ia FROM edges0),
         |rec AS (
         | WITH RECURSIVE reach(src, dst) AS (
         |   SELECT src, dst FROM edges
         |   UNION
         |   SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
         | ) SELECT * FROM reach),
         |comp AS (
         | SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         | FROM rec GROUP BY src),
         |labeled AS (
         | SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_rep
         | FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
         |szc AS (
         | SELECT cluster_rep, count(*) AS cluster_size
         | FROM labeled GROUP BY 1)
         |SELECT l.doc_id, l.cluster_rep,
         | l.doc_id = l.cluster_rep AS keep, szc.cluster_size
         |FROM labeled l JOIN szc ON l.cluster_rep = szc.cluster_rep""".stripMargin

  private def m39OracleSql: String =
      s"""SELECT doc_id, count(*) AS n_tiles,
         | min(entropy_bits) AS min_tile_entropy,
         | max(entropy_bits) AS max_tile_entropy,
         | CAST(sum(CASE WHEN entropy_bits < 3.0 THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_low_entropy,
         | sum(CASE WHEN entropy_bits < 3.0 THEN 1 ELSE 0 END) > 0
         |   AS suspect
         |FROM ($m38OracleSql) m38
         |GROUP BY 1""".stripMargin
}
