package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag or drop training documents that share
  * word n-grams with an evaluation set, so test questions never leak into
  * the training corpus (the standard n-gram-overlap decontamination used by
  * the major LM training pipelines, typically with n between 8 and 13).
  *
  * Scale shape: the eval set is small by definition (thousands of
  * documents), so its distinct n-gram table is BROADCAST — the training
  * corpus is scanned exactly once, map-side: explode its n-grams, probe the
  * broadcast hash set, and only the matching (train id, eval id) pairs —
  * never document text — enter any shuffle. At 100 TB the plan is one pass
  * over the corpus plus a distinct over the (tiny) match table.
  *
  * N-gram semantics follow [[Dedup.shingles]]: distinct word n-grams;
  * documents with ≤ n tokens contribute their whole token sequence as one
  * gram (so a short eval prompt can still match an identical short training
  * doc — but not a containing longer one; pick n below your shortest eval
  * text when that matters).
  */
object Decontam {

  /** All (train id, eval id) pairs sharing at least one word n-gram —
    * the audit table behind [[markContaminated]]/[[removeContaminated]].
    */
  def contaminationMatches(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      eval: DataFrame,
      evalIdCol: String,
      evalTextCol: String,
      n: Int = 8,
      broadcastEval: Boolean = true
  ): DataFrame = {
    val evalGrams0 = eval
      .select(col(evalIdCol).as("eval_id"),
        explode(Dedup.shingles(col(evalTextCol), n)).as("__g"))
    val evalGrams = if (broadcastEval) broadcast(evalGrams0) else evalGrams0
    Dedup.ensureParallelism(train)
      .select(col(trainIdCol).as("train_id"),
        explode(Dedup.shingles(col(trainTextCol), n)).as("__g"))
      .join(evalGrams, "__g")
      .select(col("train_id"), col("eval_id"))
      .distinct()
  }

  /** Distinct contaminated train ids — the cheap semi-join shape behind
    * [[markContaminated]]/[[removeContaminated]]: the eval side is reduced
    * to a DISTINCT gram set before broadcast (no eval ids ride along), the
    * map-side probe keeps only matching train ids, and the one shuffle is
    * the final `distinct` over those (few) ids. Unlike
    * [[contaminationMatches]], no (train, eval) pair table is ever built —
    * use that only when the per-eval audit is actually wanted.
    */
  private def contaminatedIds(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      eval: DataFrame,
      evalTextCol: String,
      n: Int,
      broadcastEval: Boolean
  ): DataFrame = {
    val evalGrams0 = eval
      .select(explode(Dedup.shingles(col(evalTextCol), n)).as("__g"))
      .distinct()
    val evalGrams = if (broadcastEval) broadcast(evalGrams0) else evalGrams0
    Dedup.ensureParallelism(train)
      .select(col(trainIdCol).as("__hit_id"),
        explode(Dedup.shingles(col(trainTextCol), n)).as("__g"))
      .join(evalGrams, Seq("__g"), "left_semi")
      .select("__hit_id")
      .distinct()
  }

  /** Fully map-side [[markContaminated]]: the eval gram set folds into ONE
    * 1-row broadcast aggregate and the check is a per-row `arrays_overlap`
    * — zero shuffles on the corpus side, so it runs UNCHANGED under
    * Structured Streaming (stream–static join; the distinct-based shapes
    * need a streaming aggregation and do not). Same answer as
    * [[markContaminated]]; prefer this on streams, and on batch when the
    * probe-side shuffle savings beat the per-row set scan.
    *
    * SIZE BOUND: the whole distinct gram set must fit in ONE row and one
    * broadcast (~a few hundred MB of grams in practice — single-row and
    * broadcast limits both bite around there). Eval suites are small by
    * nature, but a mis-pointed `eval` frame would fail deep inside the
    * exchange with an opaque executor error, so the gram set is counted
    * first (one cheap job on the small static eval side) and oversized
    * sets fail fast with a pointer to [[markContaminated]], whose
    * distinct-join shape has no such bound. Set `maxEvalGrams <= 0` to
    * skip the pre-count (e.g. if the eval frame is expensive to scan
    * twice and known-small).
    */
  def markContaminatedMapSide(
      train: DataFrame,
      trainTextCol: String,
      eval: DataFrame,
      evalTextCol: String,
      n: Int = 8,
      maxEvalGrams: Long = 20000000L
  ): DataFrame = {
    require(!train.columns.contains("contaminated"),
      "markContaminatedMapSide adds a 'contaminated' column but train already has one")
    if (maxEvalGrams > 0) {
      val nGrams = eval
        .select(explode(Dedup.shingles(col(evalTextCol), n)).as("__g"))
        .agg(count_distinct(col("__g"))).head().getLong(0)
      require(nGrams <= maxEvalGrams,
        s"markContaminatedMapSide: eval suite has $nGrams distinct $n-grams " +
          s"(> maxEvalGrams=$maxEvalGrams); the single-row/broadcast fold would " +
          "fail inside the exchange. Use markContaminated (distinct-join shape, " +
          "no single-row bound) or raise maxEvalGrams deliberately.")
    }
    val Seq(gs) = OpsUtil.tempNames(train, "gs")
    val grams = eval
      .select(explode(Dedup.shingles(col(evalTextCol), n)).as("__g"))
      .agg(collect_set(col("__g")).as(gs))
    train.crossJoin(broadcast(grams))
      // coalesce: NULL text has no grams → arrays_overlap is NULL, but the
      // contract (matching markContaminated) is false, not NULL — a
      // !contaminated filter must keep those rows
      .withColumn("contaminated",
        coalesce(
          arrays_overlap(Dedup.shingles(col(trainTextCol), n), col(gs)),
          lit(false)))
      .drop(gs)
  }

  /** Adds a boolean `contaminated` column to the training frame: true iff
    * the document shares at least one word n-gram with any eval document.
    */
  def markContaminated(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      eval: DataFrame,
      evalTextCol: String,
      n: Int = 8,
      broadcastEval: Boolean = true
  ): DataFrame = {
    require(!train.columns.contains("contaminated"),
      "markContaminated adds a 'contaminated' column but train already has one")
    // contaminated ids are at most |train matches| — small — so the join
    // back to the corpus broadcasts and the corpus itself never shuffles
    val hits = contaminatedIds(train, trainIdCol, trainTextCol,
      eval, evalTextCol, n, broadcastEval)
    train
      .join(broadcast(hits), train(trainIdCol) === col("__hit_id"), "left")
      .withColumn("contaminated", col("__hit_id").isNotNull)
      .drop("__hit_id")
  }

  /** Per-EVAL-document contamination FRACTION: of each eval doc's distinct
    * word n-grams, the share that occurs anywhere in the training corpus —
    * the graded overlap number benchmark cards report ("x% of GSM8K
    * 8-grams appear in training"), where [[markContaminated]] gives only
    * the binary train-side mark. Output: `(eval id, n_grams,
    * n_seen, contamination)` — one row per eval doc, including zero rows
    * for docs too short to shingle (n_grams = 0 ⇒ contamination 0.0).
    *
    * Scale shape: the eval gram set (small by nature) broadcasts; the
    * train corpus is ONE map-side scan + semi-join probe — no corpus
    * shuffle. The only exchange is the distinct over MATCHED grams,
    * bounded by the eval gram count, then two broadcast joins back. The
    * train side's work is identical to [[contaminatedIds]]'s probe.
    */
  def contaminationFraction(
      eval: DataFrame,
      evalIdCol: String,
      evalTextCol: String,
      train: DataFrame,
      trainTextCol: String,
      n: Int = 8,
      maxEvalGrams: Long = 20000000L
  ): DataFrame = {
    val evalGrams = eval
      .select(col(evalIdCol).as("eval_id"),
        explode(Dedup.shingles(col(evalTextCol), n)).as("__g"))
    // Same eval-side bound as markContaminatedMapSide — but folded into
    // the gram-set build: ONE eval-side job collects the distinct gram set
    // (the `limit` bounds the driver at maxEvalGrams + 1 rows by
    // construction, so an over-cap suite can never flood it), its size IS
    // the guard count, and the broadcast ships the already-collected rows.
    // The old shape ran a separate count_distinct job and then re-scanned
    // eval inside the broadcast exchange — three eval passes for a number
    // the broadcast build already knows.
    val distinctGrams = evalGrams.select(col("__g")).distinct()
    val gramSet =
      if (maxEvalGrams > 0) {
        require(maxEvalGrams < Int.MaxValue,
          s"maxEvalGrams must fit an Int limit, got $maxEvalGrams")
        import eval.sparkSession.implicits._
        val grams = distinctGrams.limit(maxEvalGrams.toInt + 1).as[String].collect()
        require(grams.length <= maxEvalGrams,
          s"contaminationFraction: eval suite has more than " +
            s"maxEvalGrams=$maxEvalGrams distinct $n-grams; the gram-set " +
            "broadcast would fail inside the exchange. Shard the eval " +
            "suite or raise maxEvalGrams deliberately.")
        broadcast(grams.toSeq.toDF("__g"))
      } else broadcast(distinctGrams)
    // eval grams that occur anywhere in train — ≤ |eval gram set| rows
    val seen = Dedup.ensureParallelism(train)
      .select(explode(Dedup.shingles(col(trainTextCol), n)).as("__g"))
      .join(gramSet, Seq("__g"), "left_semi")
      .distinct()
      .withColumn("__seen", lit(1))
    val perDoc = evalGrams
      .join(broadcast(seen), Seq("__g"), "left")
      .groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(col("__seen")).as("n_seen"))
    eval.select(col(evalIdCol).as("eval_id"))
      .join(broadcast(perDoc), Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"),
        when(coalesce(col("n_grams"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_seen") / col("n_grams")).as("contamination"))
  }

  /** Drops contaminated training documents — one broadcast anti-join. */
  def removeContaminated(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      eval: DataFrame,
      evalTextCol: String,
      n: Int = 8,
      broadcastEval: Boolean = true
  ): DataFrame = {
    val hits = contaminatedIds(train, trainIdCol, trainTextCol,
      eval, evalTextCol, n, broadcastEval)
    train.join(broadcast(hits),
      train(trainIdCol) === col("__hit_id"), "left_anti")
  }

  // ---------------------------------------------------------------------
  // Bloom-filter cross-corpus membership — the sub-linear-memory sibling
  // of the exact broadcast semi-join above. Exact decontamination holds
  // the reference's DISTINCT grams; when the reference is another CORPUS
  // (dedup new shards against the 10-billion-document collection you
  // already trained on), that table doesn't fit anywhere. A Bloom filter
  // holds the whole reference in ~1.2 GB per 10⁹ items at 1% fpp,
  // ships once in the task binary, and probes map-side — the trade is a
  // bounded false-positive rate (items wrongly flagged "seen"; NEVER the
  // reverse), so the drop-side user over-discards ~fpp of genuinely new
  // data and the mark-side user gets an audit column to re-verify.
  // ---------------------------------------------------------------------

  /** Driver-side cap on filter size: a filter that cannot ship in the
    * task binary should be a deliberate choice, not an accident.
    */
  val MaxBloomBytes: Long = 2L * 1024 * 1024 * 1024 - 16

  /** Build a serialized Bloom filter of `col`'s values (as UTF-8 bytes)
    * over the whole frame — distributed build (one partial filter per
    * partition, OR-merged), driver holds only the final bit array.
    * `expectedItems` sizes the filter; undersizing inflates the realized
    * fpp, it never loses members.
    */
  def buildBloom(
      df: DataFrame,
      column: String,
      expectedItems: Long,
      fpp: Double = 0.01
  ): Array[Byte] = {
    // standard sizing formula (checked BEFORE any allocation — create()
    // itself would try to allocate the bit array)
    val ln2 = math.log(2.0)
    val bits = math.ceil(-(expectedItems * math.log(fpp)) / (ln2 * ln2)).toLong
    require(bits / 8 <= MaxBloomBytes,
      s"bloom of $expectedItems items at fpp=$fpp needs ${bits / 8} bytes " +
        s"(> $MaxBloomBytes); raise fpp or shard the reference")
    val bf = df.stat.bloomFilter(col(column).cast("string"), expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Membership probe column against a [[buildBloom]] filter: true ⇒
    * possibly seen (fpp chance of a false alarm), false ⇒ DEFINITELY not
    * in the reference. Codegen'd, map-only.
    */
  def bloomProbe(column: Column, bloomBytes: Array[Byte]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.ops.expr.BloomProbeExpr(
      ColumnBridge.expression(column.cast("string")), bloomBytes))
  }

  /** Mark rows whose `column` value was (possibly) seen in the reference
    * filter — the audit-friendly shape: re-verify `seen = true` rows
    * exactly (they are ~fpp wrong) before acting on them.
    */
  def markSeenBloom(
      df: DataFrame, column: String, bloomBytes: Array[Byte],
      flagCol: String = "seen"): DataFrame =
    df.withColumn(flagCol, bloomProbe(col(column), bloomBytes))

  /** Drop rows possibly seen in the reference — cross-corpus dedup's
    * scale path. Over-drops ~fpp of genuinely-new rows by construction;
    * never lets a true duplicate through.
    */
  def dropSeenBloom(
      df: DataFrame, column: String, bloomBytes: Array[Byte]): DataFrame =
    df.filter(!bloomProbe(col(column), bloomBytes))
}
