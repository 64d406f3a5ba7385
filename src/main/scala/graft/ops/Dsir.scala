package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
  * distribution looks like a TARGET corpus, by importance weight
  * `log w(x) = Σ_g [log p_target(bucket(g)) − log p_raw(bucket(g))]`
  * over the document's gram OCCURRENCES (a bag-of-grams model on a hashed
  * feature space), then sample without replacement ∝ softmax(log w) via
  * the Gumbel top-k trick. This is the standard pretraining-data selection
  * method when a quality/domain exemplar corpus exists (e.g. "select web
  * pages that look like Wikipedia+books"); the quota/fraction mixers in
  * [[Sampling]] weight SOURCES, DSIR weights individual DOCUMENTS by
  * content. The reference has no selection surface; beyond-reference.
  *
  * Engine-portable constructions (every step replayable in plain SQL, the
  * [[Sampling.rankHex]] convention):
  *   - tokens = non-empty pieces of `lower(text)` split on ASCII
  *     whitespace; grams = unigrams + adjacent-pair bigrams;
  *   - bucket(g) = the first `nibbles` hex chars of `md5(g)` — a STRING
  *     key, so no hex→int cast is needed anywhere and the bucket space has
  *     exactly `m = 16^nibbles` slots;
  *   - bucket models are Laplace-smoothed: `p(b) = (c(b)+1)/(C+m)`;
  *   - Gumbel noise derives from md5 too: `u = (v+0.5)/2^32` with `v` the
  *     first 8 md5 nibbles of `seed:id` — deterministic across engines,
  *     partitionings and cluster sizes.
  *
  * Scale shape (the 100 TB contract):
  *   - Both bucket-count tables are ONE `groupBy(bucket)` each with
  *     map-side partial counts; their size is capped at `m = 16^nibbles`
  *     rows BY CONSTRUCTION (nibbles ≤ 4 ⇒ ≤ 65,536 rows), so the
  *     log-ratio table is always broadcastable and is broadcast
  *     explicitly.
  *   - Per-document weights are a map-only gram explode + broadcast-hash
  *     join + per-id partial-aggregated sum: one shuffle, keyed by the
  *     document id (no hot key — every doc contributes its own group).
  *   - Top-k selection is `orderBy(score).limit(k)` — Spark plans
  *     TakeOrderedAndProject: per-partition heaps of size k merged on the
  *     driver, NO global sort, no full-corpus shuffle.
  */
object Dsir {

  /** Non-empty lowercased ASCII-whitespace tokens —
    * `list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')`
    * in DuckDB terms.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Gram multiset of a text: unigrams, plus space-joined adjacent bigrams
    * when `maxN = 2` (the DSIR paper's feature set). Order irrelevant
    * downstream (the model is a bag); duplicates DELIBERATELY kept —
    * occurrence counts are the model.
    */
  def grams(text: Column, maxN: Int = 2): Column = {
    require(maxN == 1 || maxN == 2, s"maxN must be 1 or 2, got $maxN")
    val t = tokens(text)
    if (maxN == 1) t
    else {
      val bi = when(size(t) >= 2,
        zip_with(
          slice(t, lit(1), size(t) - 1),
          slice(t, lit(2), size(t) - 1),
          (a, b) => concat(a, lit(" "), b)))
        .otherwise(array().cast("array<string>"))
      concat(t, bi)
    }
  }

  /** Hash bucket of a gram: first `nibbles` lowercase hex chars of its
    * md5 — a string key over a space of exactly `16^nibbles` buckets.
    */
  def bucket(gram: Column, nibbles: Int): Column =
    substring(md5(gram), 1, nibbles)

  /** Per-bucket gram-occurrence counts of a corpus: `(bucket, cnt)`,
    * ≤ `16^nibbles` rows by construction. One map-side-combined groupBy.
    */
  def hashedGramCounts(
      df: DataFrame,
      textCol: String,
      nibbles: Int = 3,
      maxN: Int = 2
  ): DataFrame = {
    require(nibbles >= 1 && nibbles <= 4,
      s"nibbles must be in [1,4] (bucket table must stay broadcastable), got $nibbles")
    Dedup.ensureParallelism(df)
      .select(explode(grams(col(textCol), maxN)).as("__g"))
      .select(bucket(col("__g"), nibbles).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Attach `log_weight` to every row of `df`: the summed
    * `log p_target − log p_raw` of its gram buckets under Laplace-smoothed
    * bag models built from `rawCounts`/`targetCounts`
    * (= [[hashedGramCounts]] outputs). Token-less documents get 0.0 (the
    * empty sum). `nibbles` must match the one the count tables were built
    * with (it fixes the smoothing denominator `m`).
    */
  def withLogWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      rawCounts: DataFrame,
      targetCounts: DataFrame,
      nibbles: Int = 3,
      maxN: Int = 2
  ): DataFrame = {
    require(!df.columns.contains("log_weight"),
      "withLogWeights adds log_weight; rename the existing column first")
    // must MATCH the nibbles the count tables were built with: it fixes
    // both the smoothing denominator m and the bucket keys this frame's
    // grams are hashed to — a mismatch joins nothing and every weight is
    // silently wrong. Same [1,4] domain as hashedGramCounts.
    require(nibbles >= 1 && nibbles <= 4,
      s"nibbles must be in [1,4], got $nibbles")
    val m = math.pow(16.0, nibbles.toDouble)
    // coalesce: an EMPTY count table (empty corpus) means a zero total —
    // the model degrades to uniform-over-buckets — not a null that would
    // silently zero every weight through null propagation
    val totals = rawCounts
      .agg(coalesce(sum(col("cnt")), lit(0L)).cast("double").as("__cr"))
      .crossJoin(targetCounts
        .agg(coalesce(sum(col("cnt")), lit(0L)).cast("double").as("__ct")))
    val ratios = rawCounts.withColumnRenamed("cnt", "__rc")
      .join(targetCounts.withColumnRenamed("cnt", "__tc"), Seq("bucket"), "full_outer")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log(coalesce(col("__tc"), lit(0L)) + 1) - log(col("__ct") + m)
          - log(coalesce(col("__rc"), lit(0L)) + 1) + log(col("__cr") + m))
          .as("__lr"))
    // buckets absent from BOTH count tables (possible when df is neither
    // corpus): both numerators smooth to 1, so the ratio collapses to the
    // denominators alone
    val absent = log(col("__cr") + m) - log(col("__ct") + m)
    val perDoc = Dedup.ensureParallelism(df)
      .select(col(idCol).as("__id"), explode(grams(col(textCol), maxN)).as("__g"))
      .select(col("__id"), bucket(col("__g"), nibbles).as("bucket"))
      .join(broadcast(ratios), Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .groupBy(col("__id"))
      .agg(sum(coalesce(col("__lr"), absent)).as("log_weight"))
    // the join-back hash-exchanges on id immediately — strip any inherited
    // narrow-scan repartition so the full rows move once, not twice
    org.apache.spark.sql.graft.ColumnBridge.stripTopRoundRobin(df)
      .join(perDoc.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .withColumn("log_weight", coalesce(col("log_weight"), lit(0.0)))
  }

  /** [[withLogWeights]] with both models built here: raw model from `raw`
    * itself, target model from `target`. The usual call shape.
    */
  def dsirLogWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      nibbles: Int = 3,
      maxN: Int = 2
  ): DataFrame =
    withLogWeights(raw, idCol, textCol,
      hashedGramCounts(raw, textCol, nibbles, maxN),
      hashedGramCounts(target, textCol, nibbles, maxN),
      nibbles, maxN)

  /** Standard-Gumbel noise keyed on `seed:key` — md5-derived like
    * [[Sampling.rankHex]], so the identical value replays anywhere:
    * `v` = first 8 md5 nibbles as an integer, `u = (v+0.5)/2^32` ∈ (0,1),
    * `g = −ln(−ln u)`.
    */
  def gumbelNoise(key: Column, seed: Long): Column = {
    val v = conv(substring(
      md5(concat_ws(":", lit(seed.toString), key.cast("string"))), 1, 8),
      16, 10).cast("double")
    val u = (v + lit(0.5)) / lit(4294967296.0)
    -log(-log(u))
  }

  /** DSIR selection: the `k` documents with the largest
    * `log_weight + Gumbel(seed:id)` — an exact sample WITHOUT replacement
    * from `softmax(log_weight)` (the Gumbel top-k identity), deterministic
    * given the seed. Output keeps the input columns plus `log_weight`.
    * Planned as TakeOrderedAndProject (per-partition heap, driver merge of
    * k-sized buffers) — safe at any corpus size for the k this is for
    * (per-domain exemplar budgets, ≤ 10⁷).
    */
  def dsirSample(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      nibbles: Int = 3,
      maxN: Int = 2,
      seed: Long = 42L
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val weighted = dsirLogWeights(raw, target, idCol, textCol, nibbles, maxN)
    weighted
      .withColumn("__gkey", col("log_weight") + gumbelNoise(col(idCol), seed))
      .orderBy(col("__gkey").desc, col(idCol))
      .limit(k)
      .drop("__gkey")
  }
}
