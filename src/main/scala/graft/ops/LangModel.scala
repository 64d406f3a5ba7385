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

    aggregateLogProbs(scored, idCol)
  }

  /** Score under an INTERPOLATED KNESER–NEY bigram LM (Kneser & Ney 1995;
    * Chen & Goodman 1999's interpolated variant) — the smoothing family
    * behind the KenLM models real CCNet-style quality filtering uses.
    * Absolute discount `D` off every seen bigram, mass redistributed via
    * the CONTINUATION probability (how many distinct contexts a word
    * follows, not how often it occurs — the "San Francisco" correction:
    * "Francisco" is frequent but follows only one context, so it gets
    * little backoff mass):
    *
    *   P(w | prev) = (max(c(prev,w) − D, 0)
    *                   + D · N1+(prev,·) · Pc(w)) / c(prev)   if c(prev)>0
    *   P(w | prev) = Pc(w)                                    otherwise
    *   Pc(w)       = (N1+(·,w) + 1) / (N + V)
    *
    * with N1+(prev,·) = distinct words following `prev`, N1+(·,w) =
    * distinct contexts preceding `w`, N = distinct bigrams, V = vocabulary
    * size. The continuation distribution carries a deliberate +1/V
    * Laplace floor so out-of-vocabulary words score finitely — the pure
    * formulation assigns them zero and the whole document −∞; a quality
    * filter needs a finite (bad) score instead. Same determinism contract
    * as [[scorePerplexity]]: per-bigram log-prob rounded to 6 decimals,
    * exact decimal(38,12) sum, then the final divide — the arithmetic
    * transcribes 1:1 into the DuckDB oracle.
    *
    * Scale shape: identical to [[scorePerplexity]] — the three count
    * tables (bigram, context + distinct-following, distinct-preceding)
    * are vocabulary-sized hash aggregations with map-side partial counts;
    * the two scalar aggregates (N, V) broadcast; scoring is token-keyed
    * joins plus one per-document aggregation. Nothing collects.
    */
  def scorePerplexityKneserNey(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      train: DataFrame,
      trainTextCol: String,
      discount: Double = 0.75
  ): DataFrame = {
    require(discount > 0 && discount < 1,
      s"KN discount must be in (0, 1), got $discount")
    val trainBigrams = bigramPairs(
      train.select(monotonically_increasing_id().as("__tid"),
        col(trainTextCol).as("__text")),
      "__tid", "__text")
    val vocab = train
      .select(explode(TextStats.tokens(col(trainTextCol))).as("t"))
      .agg(count_distinct(col("t")).as("V"))
    val big = trainBigrams.groupBy(col("prev"), col("w"))
      .agg(count(lit(1)).as("c_bg"))
    // context totals + distinct-following counts in ONE pass over the
    // (already vocabulary-sized) bigram table
    val ctx = big.groupBy(col("prev"))
      .agg(sum(col("c_bg")).as("c_prev"), count(lit(1)).as("n1_prev"))
    val n1w = big.groupBy(col("w")).agg(count(lit(1)).as("n1_w"))
    val nbig = big.agg(count(lit(1)).as("N"))

    val d = lit(discount)
    // continuation probability, floored: (N1+(·,w) + 1) / (N + V)
    def pc: Column =
      (coalesce(col("n1_w"), lit(0L)) + 1).cast("double") /
        (col("N") + col("V")).cast("double")
    val scored = bigramPairs(docs, idCol, textCol)
      .join(big, Seq("prev", "w"), "left")
      .join(ctx, Seq("prev"), "left")
      .join(n1w, Seq("w"), "left")
      .crossJoin(broadcast(vocab))
      .crossJoin(broadcast(nbig))
      .select(col(idCol),
        round(log(
          when(col("c_prev").isNotNull,
            (greatest(coalesce(col("c_bg"), lit(0L)).cast("double") - d,
              lit(0.0)) +
              d * col("n1_prev").cast("double") * pc) /
              col("c_prev").cast("double"))
            .otherwise(pc)), 6).as("logp"))
    aggregateLogProbs(scored, idCol)
  }

  /** (id, logp) rows → (id, n_bigrams, avg_logp, ppl) with the exact
    * decimal sum both scorers share.
    */
  private def aggregateLogProbs(scored: DataFrame, idCol: String): DataFrame =
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("logp").cast("decimal(38,12)")).as("__sumll"))
      .select(col(idCol), col("n_bigrams"),
        round(col("__sumll").cast("double") / col("n_bigrams"), 6).as("avg_logp"),
        round(exp(-(col("__sumll").cast("double") / col("n_bigrams"))), 4).as("ppl"))
}
