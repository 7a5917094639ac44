package graft.ml

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ModelsSpec extends AnyFunSuite with SparkTestBase {

  lazy val embeddings = spark.read.parquet(s"$sf0001/embeddings.parquet")
  lazy val documents = spark.read.parquet(s"$sf0001/documents.parquet")

  test("kmeans assigns every vector to one of k clusters, reproducibly") {
    val a = EmbeddingModels.kmeansAssign(embeddings, k = 10)
    assert(a.count() === embeddings.count())
    val k = a.agg(countDistinct(col("cluster"))).head().getLong(0)
    assert(k >= 2 && k <= 10)
    val b = EmbeddingModels.kmeansAssign(embeddings, k = 10)
    assert(a.collect().map(_.toString).sorted
      .sameElements(b.collect().map(_.toString).sorted))
  }

  test("BRP-LSH near pairs are true near pairs (distance bound holds)") {
    // corpus min pairwise euclidean ≈ 1.02 (near-unit vectors) — 1.2
    // captures the genuinely closest pairs
    val pairs = EmbeddingModels.brpNearPairs(embeddings, distance = 1.2)
    val bad = pairs.filter(col("euclidean") > 1.2).count()
    assert(bad === 0)
    assert(pairs.count() > 0)
  }

  test("IVF with TRAINED centroids: recall@3 vs brute force is useful") {
    import org.apache.spark.ml.functions.vector_to_array
    // train the coarse quantizer with seeded KMeans, then nprobe=1 search
    val assigned = EmbeddingModels.kmeansAssign(embeddings, k = 8)
    val e = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
      .join(assigned.select(col("vec_id"), col("cluster")), "vec_id")
    graft.functions.VectorFunctions.register(spark)
    val cosC = graft.functions.VectorFunctions.cosineSim _
    def top3(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
      df.withColumn("rnk", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rnk") <= 3).collect()
        .groupBy(_.getLong(0)).map { case (q, rows) =>
          q -> rows.map(r => r.getLong(r.fieldIndex("vec_id"))).toSet
        }
    }
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"),
        col("cluster").as("qcell"))
    val brute = top3(e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cosine", cosC(col("qemb"), col("emb"))))
    val ivf = top3(e.join(broadcast(q),
        col("cluster") === col("qcell") && col("vec_id") =!= col("qid"))
      .withColumn("cosine", cosC(col("qemb"), col("emb"))))
    val recall = brute.keys.toSeq.map { k =>
      (brute(k) & ivf.getOrElse(k, Set())).size.toDouble / brute(k).size
    }.sum / brute.size
    assert(recall >= 0.3, s"trained-IVF nprobe=1 recall@3 was $recall")
  }

  test("product quantization: ADC top-10 planted recall >= 0.8, 32x compression") {
    import spark.implicits._
    val e = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val pq = ProductQuantizer.fit(e, m = 16, k = 16)
    assert(pq.bytesPerVector === 8.0) // 16 codes x 4 bits vs 256 B raw = 32x
    val codes = pq.encode(e).select(col("vec_id"), col("pq_code"))
    // reproducible: same seed, same codebooks, same codes
    val codes2 = ProductQuantizer.fit(e, m = 16, k = 16).encode(e)
      .select(col("vec_id"), col("pq_code"))
    assert(codes.collect().map(_.toString).sorted
      .sameElements(codes2.collect().map(_.toString).sorted))

    // Planted-neighbor recall: the corpus's GENUINE near-dups (exact
    // cosine >= 0.4, s34's oracle-checked pair set) must surface in the
    // ADC top-10 of their partner's search. Random-noise neighbors are
    // not the contract — on near-orthogonal vectors no 4-byte code can
    // order noise, and no consumer needs it to.
    val planted = graft.SparkEntry.queries("s34_embedding_neardup")(spark, sf0001)
      .select(col("ia"), col("ib")).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
    assert(planted.nonEmpty)
    val qids = planted.map(_._1).distinct
    val queries = e.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id"), col("emb")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val qLut = queries.map { case (qid, v) => (qid, pq.lut(v)) }.toSeq
      .toDF("qid", "lut")
    val adcTop = graft.operators.TopKPerKeyApi.topKPerKey(
      codes.crossJoin(broadcast(qLut))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("dist", pq.adc(col("lut"), col("pq_code"))),
      Seq("qid"), Seq(("dist", true), ("vec_id", true)), 10)
      .select(col("qid"), col("vec_id")).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val recall = planted.count { case (q, nb) =>
      adcTop.getOrElse(q, Set.empty).contains(nb)
    }.toDouble / planted.length
    assert(recall >= 0.8, s"PQ ADC planted-neighbor recall@10 was $recall")
  }

  test("tfidf pipeline: stopwords removed, vocab bounded, idf formula matches") {
    val fitted = TextPipeline.tfidfPipeline().fit(documents)
    val out = fitted.transform(documents)
    val cv = fitted.stages(2)
      .asInstanceOf[org.apache.spark.ml.feature.CountVectorizerModel]
    assert(!cv.vocabulary.contains("the"), "stopword must not enter the vocabulary")
    assert(cv.vocabulary.nonEmpty)
    // Spark IDF formula: ln((m+1)/(df+1)) — verify one term by hand
    val term = cv.vocabulary.head
    val m = documents.count().toDouble
    val df = documents
      .filter(array_contains(split(trim(col("text")), "\\s+"), term)).count()
    val idfModel = fitted.stages(3)
      .asInstanceOf[org.apache.spark.ml.feature.IDFModel]
    val gotIdf = idfModel.idf(cv.vocabulary.indexOf(term))
    val expIdf = math.log((m + 1.0) / (df + 1.0))
    assert(math.abs(gotIdf - expIdf) < 1e-9,
      s"idf($term): got $gotIdf expected $expIdf")
    assert(out.head().getAs[Vector]("tfidf").size === cv.vocabulary.length)
  }

  test("ngram pipeline emits n-1 fewer grams than tokens") {
    val out = TextPipeline.ngramPipeline(3).fit(documents).transform(documents)
      .select(size(col("tokens")).as("nt"), size(col("ngrams")).as("ng"))
      .filter(col("nt") >= 3)
    assert(out.filter(col("ng") =!= col("nt") - 2).count() === 0)
  }
}
