package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sparse (lexical) retrieval over a document corpus — the BM25 side of a
  * hybrid retrieval stack ([[Similarity]] is the dense side).
  *
  * Scale shape: the query's term frequencies are computed ROW-LOCALLY (one
  * small column per query token — queries are a handful of literals), so no
  * (id, token) instance ever enters a shuffle and there is no per-term
  * aggregation at all. The only shuffle in the whole query is the 1-row
  * corpus-stats aggregate (N, avgdl, and every per-term document frequency,
  * folded into the same pass), which broadcasts back; scoring is then a
  * pure map-side expression. Two scans of the text column total — against
  * the classic explode→groupBy formulation, that removes both the instance
  * shuffle and the tf aggregation, which at 100 TB are the whole cost.
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
    // per-doc length + one tf column per query token, all from ONE staged
    // token array (materialized first — higher-order functions get no CSE)
    val perDoc = df
      .select(col(idCol).as("id"), TextStats.tokens(col(textCol)).as("__toks"))
      .select(Seq(col("id"), size(col("__toks")).as("dl")) ++
        q.zipWithIndex.map { case (t, i) =>
          size(filter(col("__toks"), x => x === lit(t))).as(s"__tf_$i")
        }: _*)
    // N, avgdl, and every per-term document frequency in one aggregation
    val statAggs = Seq(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")) ++
      q.indices.map(i => sum((col(s"__tf_$i") > 0).cast("long")).as(s"__df_$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val scored = perDoc.crossJoin(broadcast(stats))
    val termScores = q.indices.map { i =>
      val tf = col(s"__tf_$i").cast(DoubleType)
      val dfq = col(s"__df_$i").cast(DoubleType)
      val idf = log(lit(1.0) + (col("n") - dfq + lit(0.5)) / (dfq + lit(0.5)))
      val tfTerm = (tf * (k1 + 1)) /
        (tf + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))
      when(col(s"__tf_$i") > 0, idf * tfTerm).otherwise(lit(0.0))
    }
    scored
      .filter(q.indices.map(i => col(s"__tf_$i") > 0).reduce(_ || _))
      .select(col("id").as(idCol), termScores.reduce(_ + _).as("bm25"))
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
