package graft.ml

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One observed (Family, Total) record within a survey group. */
case class FamObs(family: String, total: Double)

/** Typed faithful port of the reference's count-vectorization closure
  * (toVector, Data_transform.py:87-95 + the groupByKey at :100) as an
  * `Aggregator` — the idiomatic replacement for groupByKey+mapValues:
  * Spark runs it with PARTIAL aggregation, so each map task pre-merges
  * its group's counts and only |vocab|-width buffers shuffle, never the
  * raw (Family, Total) pairs. Semantics preserved exactly:
  * unknown families silently dropped (:90-91), L1 normalization (:95),
  * zero-total guard returning the zero vector (:93-94).
  *
  * Output is Array[Double]; bridge to ml Vector with
  * `org.apache.spark.ml.functions.array_to_vector` when feeding MLlib.
  */
class FamilyCountAggregator(vocab: Seq[String])
    extends Aggregator[FamObs, Array[Double], Array[Double]] {

  private val index: Map[String, Int] = vocab.zipWithIndex.toMap

  override def zero: Array[Double] = new Array[Double](vocab.size)

  override def reduce(buf: Array[Double], obs: FamObs): Array[Double] = {
    index.get(obs.family) match {
      case Some(i) => buf(i) += obs.total
      case None => // outside the vocabulary: dropped (reference parity)
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Double]): Array[Double] = {
    var total = 0.0
    var i = 0
    while (i < buf.length) { total += buf(i); i += 1 }
    if (total == 0.0) buf else buf.map(_ / total)
  }

  // ExpressionEncoder keeps the buffer/output as a real array<double>
  // column (unsafe-row backed, no opaque serialization).
  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
