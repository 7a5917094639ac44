package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
object MultimodalOps {

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
  def multimodalTable(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(col("source").as("source"), col("lang").as("lang"),
        col("n_chars").as("n_chars")).as("meta"))

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
    // Rows-only for the driver (hex→int differs across engines); exact
    // values asserted in scalatest.
    "m32_payload_features" -> { (s, d) =>
      multimodalTable(s, d)
        .select(col("doc_id"),
          posexplode(stubFeatures(col("payload"))).as(Seq("dim", "value")))
        .select(col("doc_id"), col("dim").cast("long").as("dim"),
          round(col("value").cast("double"), 6).as("value"))
    }
  )

  val oracle: Map[String, String] = Map(
    // md5(string) in DuckDB == md5(utf-8 bytes) in Spark: same digest.
    "m31_payload_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
        | md5(text) AS payload_md5, source
        |FROM documents""".stripMargin
  )
}
