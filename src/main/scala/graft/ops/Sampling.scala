package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and corpus mixing.
  *
  * Spark's built-in `df.sample` draws per-partition from a seeded RNG, so
  * the selected ROWS change whenever the partitioning does — rerun the same
  * job on a different cluster size (or after a repartition) and you train on
  * a different sample. `sampleBy` is additionally binomial: per-stratum
  * counts drift run to run. For training-data work both properties are
  * liabilities: the sample should be a pure function of the DATA, so it is
  * reproducible across runs, engines, partitionings, and time.
  *
  * Everything here keys off a cryptographic rank: the first 13 hex digits
  * (52 bits — exactly representable in a double, and far below any
  * birthday-collision regime) of `md5(seed ":" key)`. MD5 of a UTF-8 string
  * is bit-identical in every engine, so the selection is replayable verbatim
  * in DuckDB/Trino/Polars SQL — the correctness gate compares exact row
  * sets, not statistics. Hex strings compare bytewise in both Spark and
  * DuckDB's default binary collations, so thresholds and orderings transfer.
  *
  * Scale shapes:
  *   - [[deterministicSample]] — map-only filter, zero shuffle; the row
  *     decision never looks at another row. The 100 TB default.
  *   - [[topKPerStratum]] — exact k per group via a salted two-phase
  *     window: per-(group, salt) top-k first (bounds any reducer at the
  *     stratum's share / saltBuckets), then top-k of the ≤ saltBuckets·k
  *     survivors. Exact: the global k smallest ranks are each the smallest
  *     within their own salt bucket.
  *   - [[mixCorpora]] — exact-count mixture (largest-remainder allocation
  *     of a row budget across sources) on top of the salted top-k; the
  *     fraction-mode [[mixCorporaByFraction]] is the map-only scale path.
  *
  * The reference has no sampling surface at all (its pipeline starts after
  * the corpus is fixed); this layer is beyond-reference, motivated by data
  * mixtures in LLM training (per-source weights over a shared token budget).
  */
object Sampling {

  /** Hex digits of rank: 13 nibbles = 52 bits. */
  val RankHexDigits = 13

  private val RankSpace = BigInt(16).pow(RankHexDigits)

  /** Uniform [0, 16^13) rank as a fixed-width lowercase hex STRING — kept
    * as text so the identical expression replays in any SQL engine without
    * relying on hex→int casts (which differ across dialects).
    */
  def rankHex(key: Column, seed: Long): Column =
    substring(md5(concat_ws(":", lit(seed.toString), key.cast("string"))), 1, RankHexDigits)

  /** `floor(fraction · 16^13)` as 13-digit zero-padded hex — the threshold
    * string `rankHex < threshold` selects with probability `fraction`
    * (within 2^-52, the rank granularity). BigDecimal keeps the rounding
    * deterministic; doubles would tie-break differently across platforms.
    */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1]: $fraction")
    val scaled = (BigDecimal(fraction) * BigDecimal(RankSpace)).setScale(0, BigDecimal.RoundingMode.FLOOR).toBigInt
    if (scaled >= RankSpace) "g" // sorts above every hex digit: keep all
    else {
      val hex = scaled.toString(16)
      ("0" * (RankHexDigits - hex.length)) + hex
    }
  }

  /** Content-keyed Bernoulli sample: keep a row iff its rank falls below
    * the fraction threshold. Map-only (no shuffle, no RNG state): the same
    * rows are kept on any engine, cluster size, or partitioning — and a
    * later run over a GROWN corpus keeps every previously-kept row, so
    * incremental ingestion doesn't churn the sample.
    *
    * The key should identify the row (a document id, or the text itself for
    * content-addressed sampling). Expected size is `fraction · n`; the count
    * is binomial, not exact — use [[topKPerStratum]] when the count matters.
    */
  def deterministicSample(
      df: DataFrame,
      keyCol: String,
      fraction: Double,
      seed: Long = 42L
  ): DataFrame =
    if (fraction >= 1.0) df
    else df.filter(rankHex(col(keyCol), seed) < lit(thresholdHex(fraction)))

  /** Exactly `k` rows per stratum (all rows of smaller strata), chosen as
    * the k smallest ranks — deterministic, engine-portable, and unbiased
    * (rank order is independent of any data attribute).
    *
    * Two-phase plan: rows first compete within `(stratum, salt)` where
    * `salt = xxhash64(key) mod saltBuckets`, so no single reducer ever
    * sorts more than a stratum's share ÷ saltBuckets; the final window
    * ranks only the ≤ saltBuckets·k survivors per stratum. Exactness: each
    * of the true top-k rows is in its salt bucket's top-k, so phase 1 never
    * discards a winner. `saltBuckets = 1` degrades to the plain single
    * window (useful under test to pin parity).
    */
  def topKPerStratum(
      df: DataFrame,
      strataCols: Seq[String],
      k: Int,
      keyCol: String,
      seed: Long = 42L,
      saltBuckets: Int = 32
  ): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(saltBuckets >= 1, s"saltBuckets must be >= 1: $saltBuckets")
    val rank = "__rank"
    val rn = "__rn"
    val salt = "__salt"
    val strata = strataCols.map(col)
    val ordered = df.withColumn(rank, rankHex(col(keyCol), seed))
    val phase1 =
      if (saltBuckets == 1) ordered
      else {
        val w1 = Window
          .partitionBy((strata :+ pmod(xxhash64(col(keyCol)), lit(saltBuckets)).as(salt)): _*)
          .orderBy(col(rank), col(keyCol))
        ordered
          .withColumn(rn, row_number().over(w1))
          .filter(col(rn) <= k)
          .drop(rn)
      }
    val w2 = Window.partitionBy(strata: _*).orderBy(col(rank), col(keyCol))
    phase1
      .withColumn(rn, row_number().over(w2))
      .filter(col(rn) <= k)
      .drop(rn, rank)
  }

  /** Largest-remainder (Hamilton) allocation of `total` rows across named
    * weights: every source gets `floor(total·wᵢ/Σw)`, and the leftover
    * seats go to the largest fractional parts (ties broken by name).
    * Deterministic integer arithmetic — the same constants embed in an
    * oracle replay.
    */
  def allocate(weights: Seq[(String, Double)], total: Long): Seq[(String, Long)] = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    require(total >= 0, s"total must be >= 0: $total")
    val w = BigDecimal(weights.map(_._2).sum)
    val quotas = weights.map { case (name, wi) =>
      val q = BigDecimal(total) * BigDecimal(wi) / w
      val base = q.setScale(0, BigDecimal.RoundingMode.FLOOR)
      (name, base.toLong, (q - base, name))
    }
    val leftover = (total - quotas.map(_._2).sum).toInt
    val bonus = quotas
      .sortBy { case (_, _, (frac, name)) => (-frac, name) }
      .take(leftover)
      .map(_._1)
      .toSet
    quotas.map { case (name, base, _) => name -> (base + (if (bonus(name)) 1L else 0L)) }
  }

  /** Exact-count data mixture: from each named source take its allocated
    * share of `totalRows` (largest-remainder over `weights`) as the
    * source's smallest ranks, tagging rows with `sourceCol`. Sources short
    * of their allocation contribute everything they have (the mixture then
    * undershoots — the caller's weights were infeasible for the data).
    *
    * The rank key is `source ":" key`, so identical keys in different
    * sources draw independent ranks and a shared id space can't correlate
    * the per-source samples.
    */
  def mixCorpora(
      sources: Seq[(String, DataFrame)],
      weights: Seq[(String, Double)],
      totalRows: Long,
      keyCol: String,
      seed: Long = 42L,
      sourceCol: String = "mix_source",
      saltBuckets: Int = 32
  ): DataFrame = {
    val alloc = allocate(weights, totalRows).toMap
    val parts = sources.map { case (name, sdf) =>
      val k = alloc.getOrElse(
        name,
        throw new IllegalArgumentException(s"no weight for source '$name'"))
      require(k <= Int.MaxValue, s"per-source allocation $k exceeds Int.MaxValue")
      val tagged = sdf.withColumn(sourceCol, lit(name))
      if (k == 0L) tagged.limit(0)
      else
        topKPerStratum(
          tagged.withColumn("__mixkey", concat_ws(":", lit(name), col(keyCol).cast("string"))),
          Seq(sourceCol), k.toInt, "__mixkey", seed, saltBuckets
        ).drop("__mixkey")
    }
    parts.reduce(_ unionByName _)
  }

  /** Fraction-mode mixture — the 100 TB path: a map-only deterministic
    * Bernoulli per source (no windows, no shuffle, no counts), union'd with
    * a source tag. Counts are expected-value, not exact; at corpus scale
    * the relative error is negligible and the plan is embarrassingly
    * parallel end to end.
    */
  def mixCorporaByFraction(
      sources: Seq[(String, DataFrame)],
      fractions: Seq[(String, Double)],
      keyCol: String,
      seed: Long = 42L,
      sourceCol: String = "mix_source"
  ): DataFrame = {
    val fmap = fractions.toMap
    val parts = sources.map { case (name, sdf) =>
      val f = fmap.getOrElse(
        name,
        throw new IllegalArgumentException(s"no fraction for source '$name'"))
      val tagged = sdf.withColumn(sourceCol, lit(name))
      if (f >= 1.0) tagged
      else
        tagged.filter(
          rankHex(concat_ws(":", lit(name), col(keyCol).cast("string")), seed) <
            lit(thresholdHex(f)))
    }
    parts.reduce(_ unionByName _)
  }
}
