package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{CountVectorizer, IDF, NGram, RegexTokenizer, StopWordsRemover}
import org.apache.spark.sql.DataFrame

/** ml.feature text pipeline (SURVEY.md §2.12): RegexTokenizer →
  * StopWordsRemover → CountVectorizer → IDF, with an optional NGram
  * stage. This is the estimator-based rendering of the expression-level
  * text queries in `graft.queries.TextOps` — use this when a fitted
  * vocabulary must be reused across datasets (train/serve symmetry),
  * the expression queries when everything is one batch.
  *
  * Scale: CountVectorizer's vocabulary fit is a distributed term count
  * + driver-side top-k (bounded by vocabSize); the transform side
  * broadcasts the fitted vocabulary — no shuffle per row.
  */
object TextPipeline {

  def tfidfPipeline(vocabSize: Int = 1 << 16, minDF: Double = 1.0,
      stopwords: Array[String] = StopWordsRemover.loadDefaultStopWords("english"))
      : Pipeline = {
    val tokenizer = new RegexTokenizer()
      .setInputCol("text").setOutputCol("tokens")
      .setPattern("\\s+")
    val stop = new StopWordsRemover()
      .setInputCol("tokens").setOutputCol("filtered")
      .setStopWords(stopwords)
    val cv = new CountVectorizer()
      .setInputCol("filtered").setOutputCol("tf")
      .setVocabSize(vocabSize).setMinDF(minDF)
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf")
    new Pipeline().setStages(Array(tokenizer, stop, cv, idf))
  }

  def ngramPipeline(n: Int): Pipeline = {
    val tokenizer = new RegexTokenizer()
      .setInputCol("text").setOutputCol("tokens")
      .setPattern("\\s+")
    val ngram = new NGram().setN(n)
      .setInputCol("tokens").setOutputCol("ngrams")
    new Pipeline().setStages(Array(tokenizer, ngram))
  }

  def fitTransformTfidf(docs: DataFrame): DataFrame =
    tfidfPipeline().fit(docs).transform(docs)
}
