package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sparse (lexical) retrieval over a document corpus — the BM25 side of a
  * hybrid retrieval stack ([[Similarity]] is the dense side).
  *
  * Scale shape: one explode of (id, token) pairs filtered to the query's
  * tokens *before* any shuffle (the filter is a map-side `isin` over a
  * handful of literals, so the aggregations only ever see rows for query
  * terms — at 100 TB that's the difference between shuffling the corpus
  * vocabulary and shuffling a few million hits); corpus-level constants
  * (N, avgdl) ride in as broadcast 1-row aggregates; per-term document
  * frequencies are a broadcast join (≤ |query| rows). No UDFs, no driver
  * materialization.
  */
object Retrieval {

  /** Okapi BM25 scores for one tokenized query: returns `(id, bm25)` for
    * every document sharing at least one token with the query.
    *
    * `idf = ln(1 + (N − df + 0.5)/(df + 0.5))` (the non-negative Robertson/
    * Lucene form); `tf` term uses the standard `k1`/`b` length
    * normalization. Tokenization is [[TextStats.tokens]] (whitespace) on
    * both the corpus and the caller-supplied query tokens.
    */
  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTokens: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(queryTokens.nonEmpty, "query must have at least one token")
    val q = queryTokens.distinct
    val lens = df.select(
      col(idCol).as("id"),
      size(TextStats.tokens(col(textCol))).as("dl"))
    // (id, token) instances for QUERY tokens only — the isin filter runs
    // map-side before the explode output reaches any shuffle
    val hits = df
      .select(col(idCol).as("id"), explode(TextStats.tokens(col(textCol))).as("token"))
      .filter(col("token").isin(q: _*))
    val tf = hits.groupBy(col("id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val stats = lens.agg(
      count(lit(1)).as("n"),
      avg(col("dl")).as("avgdl"))
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfTerm = (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))
    tf
      .join(broadcast(dfreq), "token")
      .join(lens, "id")
      .crossJoin(broadcast(stats))
      .withColumn("__term", idf * tfTerm)
      .groupBy(col("id"))
      .agg(sum(col("__term")).as("bm25"))
      .select(col("id").as(idCol), col("bm25"))
  }

  /** BM25 top-k: scores via [[bm25]], then `orderBy.limit` —
    * TakeOrderedAndProject (per-partition top-k + driver merge), no global
    * sort.
    */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTokens: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame =
    bm25(df, idCol, textCol, queryTokens, k1, b)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
}
