package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based language-model scoring for corpus quality filtering — the
  * CCNet-style signal: score each document's perplexity under a small LM
  * trained on a reference corpus and keep the low-perplexity (fluent) tail.
  * Here the LM is a Laplace-smoothed bigram model — deliberately the
  * textbook formulation, so the whole computation (training counts AND
  * per-document scores) replays exactly in the DuckDB oracle:
  *
  *   P(w | prev) = (c(prev, w) + 1) / (c(prev) + V)
  *
  * with `c` bigram/context counts over the training corpus and `V` its
  * distinct-token vocabulary size. A document's score is the mean log
  * probability over its interior bigrams; perplexity = exp(−mean).
  *
  * Determinism contract: each bigram's log-probability is rounded to 6
  * decimals (absorbing last-ulp libm differences across engines), summed
  * EXACTLY as decimal(38,12) — partition-order independent, the
  * [[Corpus.profile]] lesson — and only then divided and rounded. The same
  * arithmetic transcribes 1:1 into SQL.
  *
  * Scale shape (100 TB): training is one explode + two hash aggregations
  * with map-side partial counts (shuffle carries (token-pair, partial n),
  * never text — same contract as [[Corpus.tokenFrequencies]]); scoring is
  * one explode + two shuffle joins on token keys + one aggregation by doc.
  * Bigram-count tables are corpus-vocabulary-sized, not corpus-sized, so
  * the joins' build sides stay small relative to the data; nothing
  * collects to the driver.
  */
object LangModel {

  /** Interior (prev, w) bigram pairs per row — one explode of the zipped
    * token array; rows with fewer than 2 tokens contribute nothing.
    */
  def bigramPairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextStats.tokens(col(textCol))
    // materialize the token array once: HOFs get no common-subexpression
    // elimination, and slice/zip would otherwise re-tokenize per use
    df.select(col(idCol), toks.as("__ts"))
      .filter(size(col("__ts")) >= 2)
      .select(col(idCol),
        explode(arrays_zip(
          slice(col("__ts"), lit(1), size(col("__ts")) - 1).as("prev"),
          slice(col("__ts"), lit(2), size(col("__ts")) - 1).as("w"))).as("bg"))
      .select(col(idCol), col("bg.prev").as("prev"), col("bg.w").as("w"))
  }

  /** Score every document of `docs` under a Laplace bigram LM trained on
    * `train` (pass the same frame to self-score a corpus — the usual
    * quality-filtering setup scores against a clean reference like
    * Wikipedia). Returns (id, n_bigrams, avg_logp, ppl) for documents with
    * at least one bigram; avg_logp is rounded to 6 decimals, ppl to 4.
    */
  def scorePerplexity(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      train: DataFrame,
      trainTextCol: String
  ): DataFrame = {
    val spark = docs.sparkSession
    // training counts: vocabulary size, context counts, bigram counts
    val trainBigrams = bigramPairs(
      train.select(monotonically_increasing_id().as("__tid"),
        col(trainTextCol).as("__text")),
      "__tid", "__text")
    val vocab = train
      .select(explode(TextStats.tokens(col(trainTextCol))).as("t"))
      .agg(count_distinct(col("t")).as("V"))
    val ctx = trainBigrams.groupBy(col("prev")).agg(count(lit(1)).as("c_prev"))
    val big = trainBigrams.groupBy(col("prev"), col("w"))
      .agg(count(lit(1)).as("c_bg"))

    val scored = bigramPairs(docs, idCol, textCol)
      .join(big, Seq("prev", "w"), "left")
      .join(ctx, Seq("prev"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        round(
          log((coalesce(col("c_bg"), lit(0L)) + 1).cast("double") /
            (coalesce(col("c_prev"), lit(0L)) + col("V")).cast("double")),
          6).as("logp"))

    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("logp").cast("decimal(38,12)")).as("__sumll"))
      .select(col(idCol), col("n_bigrams"),
        round(col("__sumll").cast("double") / col("n_bigrams"), 6).as("avg_logp"),
        round(exp(-(col("__sumll").cast("double") / col("n_bigrams"))), 4).as("ppl"))
  }
}
