package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.execution.RDDScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Plan-shape audits for the ops layer — the 100 TB claims in the
  * scaladocs, pinned as assertions over the physical plan so a regression
  * (an operator quietly re-shuffling the payload, a window landing on data,
  * text riding an exchange) fails a test instead of an executor at scale.
  */
class PlanShapeSpec extends SparkTestBase {

  import spark.implicits._

  /** The fully-prepared physical plan: `sparkPlan` predates
    * EnsureRequirements, so requirement-induced exchanges (the ones these
    * audits exist to catch) don't appear in it; AQE is disabled during
    * materialization so `executedPlan` isn't an opaque adaptive wrapper.
    */
  private def prepared(df: DataFrame): org.apache.spark.sql.execution.SparkPlan = {
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", before)
  }

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeExec] =
    prepared(df).collect { case s: ShuffleExchangeExec => s }

  private def windows(df: DataFrame): Seq[WindowExec] =
    prepared(df).collect { case w: WindowExec => w }

  test("withGlobalIndex: index attaches map-side over the one pre-planned sort (no further shuffle/window)") {
    // the global order is materialized inside ONE physical RDD (the
    // zipWithIndex consistency idiom — see Packing's object doc); above
    // that barrier nothing may move or sort again
    val df = (1L to 100L).map(i => (i, "x" * 50)).toDF("id", "payload")
    val q = Packing.withGlobalIndex(df, Seq(col("id").asc))
    assert(q.columns.toSeq == Seq("id", "payload", "pos"))
    assert(shuffles(q).isEmpty && windows(q).isEmpty,
      "no exchange or window above the materialized order")
    assert(prepared(q).collect { case r: RDDScanExec => r }.nonEmpty)
  }

  test("packSequences: document text never reaches the exchange (narrowed below the barrier)") {
    val df = (1L to 50L).map(i => (i, Seq.fill(20)("tok").mkString(" "))).toDF("id", "text")
    val q = Packing.packSequences(df, "id",
      size(TextStats.tokens(col("text"))), 64, Seq(col("id").asc))
    assert(shuffles(q).isEmpty && windows(q).isEmpty)
    val scans = prepared(q).collect { case r: RDDScanExec => r }
    assert(scans.nonEmpty &&
      !scans.exists(_.output.exists(_.name == "text")),
      "the sorted RDD carries only (order keys, id, token count) — never text")
  }

  test("deterministicShuffle: no shuffle or window above the materialized permutation") {
    val df = (1L to 100L).map(i => (i, "y" * 50)).toDF("id", "payload")
    val q = Packing.deterministicShuffle(df, "id", seed = 1L)
    assert(q.columns.toSeq == Seq("id", "payload", "pos"))
    assert(shuffles(q).isEmpty && windows(q).isEmpty)
  }

  test("decontamination: corpus text never shuffles; the gram probe is a broadcast semi-join") {
    val train = (1L to 50L).map(i => (i, s"alpha beta gamma $i")).toDF("id", "text")
    val eval = Seq((1L, "alpha beta gamma 7")).toDF("eid", "etext")
    val q = Decontam.markContaminated(train, "id", "text", eval, "etext", n = 2)
    assert(!shuffles(q).exists(_.output.exists(a => a.name == "text" || a.name == "etext")),
      "only matched ids and eval grams may enter an exchange")
    val semi = prepared(q).collect {
      case j: BroadcastHashJoinExec if j.joinType == LeftSemi => j
    }
    assert(semi.nonEmpty, "gram probe must be a broadcast LeftSemi hash join")
  }

  test("bm25: corpus text never shuffles (stats fold into a 1-row broadcast)") {
    val df = (1L to 50L).map(i => (i, s"the data model $i")).toDF("id", "text")
    val q = Retrieval.bm25(df, "id", "text", Seq("the", "data"))
    assert(!shuffles(q).exists(_.output.exists(_.name == "text")))
  }

  test("jaccardPairs: no exchange ever carries a pair with both gram arrays") {
    // the sf1 rehearsal's 1.6 GB spill was candidate pairs riding the
    // verify-join exchanges with BOTH shingle arrays attached; the
    // verify-in-bucket shape's invariant is that any shuffled row holds at
    // most ONE gram-array payload (a per-doc array, or the bucket's struct
    // list) — pair rows with two arrays exist only transiently inside the
    // expansion stage, never in an exchange
    val docs = (1L to 80L).map(i => (i, s"alpha beta gamma delta ${i % 7} epsilon zeta"))
      .toDF("doc_id", "text")
    def arrayFields(dt: org.apache.spark.sql.types.DataType): Int = dt match {
      case org.apache.spark.sql.types.ArrayType(e, _) => 1 + arrayFields(e)
      case s: org.apache.spark.sql.types.StructType => s.fields.map(f => arrayFields(f.dataType)).sum
      case _ => 0
    }
    for (t <- Seq(0.5, 0.8)) {
      val q = Dedup.jaccardPairs(docs, "doc_id", "text", t)
      for (ex <- shuffles(q)) {
        val perRowArrays = ex.child.output.map(a => arrayFields(a.dataType)).sum
        // one exchange carries the per-doc sorted array (1), one carries the
        // bucket struct list (array<struct<..,array>> = 2 nested); a pair
        // row with sh_a AND sh_b as SEPARATE top-level array attrs is the
        // banned shape
        val topLevelArrays = ex.child.output.count(a => arrayFields(a.dataType) > 0)
        assert(topLevelArrays <= 1,
          s"t=$t: exchange carries $topLevelArrays array columns:\n${ex.child.output}")
        assert(perRowArrays <= 2, s"t=$t: unexpectedly deep array payload")
      }
    }
  }

  test("top-k operators lower to TakeOrderedAndProject, never a global sort") {
    import org.apache.spark.sql.execution.{SortExec, TakeOrderedAndProjectExec}
    val vecs = (1L to 60L)
      .map(i => (i, Array.tabulate(8)(d => ((i + d) % 5).toFloat)))
      .toDF("id", "vec")
    val docs = (1L to 60L).map(i => (i, s"the data model $i")).toDF("id", "text")
    val qv = (0 until 8).map(_.toFloat)
    val plans = Seq(
      Similarity.bruteForceTopK(vecs, "id", "vec", qv, 5),
      Retrieval.bm25TopK(docs, "id", "text", Seq("the", "data"), 5))
    for (q <- plans) {
      val p = prepared(q)
      assert(p.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
        s"expected TakeOrderedAndProject:\n$p")
      assert(p.collect { case s: SortExec if s.global => s }.isEmpty,
        "no global sort for a top-k")
    }
  }

  test("tokenSketch: no per-token hash exchange — the one shuffle carries bounded sketches to a single partition") {
    val docs = (1L to 50L).map(i => (i, s"alpha beta gamma delta tok$i")).toDF("id", "text")
    val q = Corpus.tokenSketch(docs, "text", budget = 64)
    val ex = shuffles(q)
    assert(ex.length == 1, s"exactly one exchange, got ${ex.length}")
    // the exchange is the global-agg SinglePartition gather of partial
    // sketch buffers — NOT a hashpartitioning on the token column
    assert(ex.head.outputPartitioning.numPartitions == 1,
      s"sketch gather must be single-partition: ${ex.head.outputPartitioning}")
    assert(!ex.head.child.output.exists(_.name == "token") ||
      ex.head.child.output.length <= 2,
      "only aggregate buffers ride the exchange, not raw token rows")
  }

  test("PQ encode + ADC scoring stay inside whole-stage codegen, zero shuffles") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val local = (1L to 40L)
      .map(i => (i, Array.tabulate(16)(d => ((i + d) % 7).toFloat)))
      .toDF("id", "vec")
    // a LocalRelation would be constant-folded into a LocalTableScan
    // (ConvertToLocalRelation evaluates the projection at plan time) —
    // a file source is what pins the runtime plan shape
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_plan")
    dir.toFile.deleteOnExit()
    local.write.mode("overwrite").parquet(dir.toString)
    val vecs = spark.read.parquet(dir.toString)
    val cb = Pq.train(vecs, "vec", m = 4, ksub = 8, iters = 3)
    val q = vecs.select(col("id"),
      Pq.adcCosine(Pq.encode(col("vec"), cb), cb, (0 until 16).map(_.toFloat))
        .as("adc"))
    assert(shuffles(q).isEmpty, "encode+ADC is map-only")
    assert(prepared(q).collect { case w: WholeStageCodegenExec => w }.nonEmpty,
      "pq kernels must plan inside whole-stage codegen")
  }

  test("domain quota: one hash exchange on the domain key, rank streamed in the window") {
    val docs = (1L to 60L).map(i =>
      (i, s"https://s$i.example${i % 5}.co.uk/p")).toDF("id", "url")
    val withDom = docs.withColumn("domain",
      WebText.registrableDomain(WebText.urlHost(col("url"))))
    val q = Corpus.perKeyQuota(withDom, Seq("domain"), Seq(col("id")), 2)
    val ex = shuffles(q)
    assert(ex.length == 1, s"exactly one exchange, got ${ex.length}:\n${prepared(q)}")
    assert(ex.head.outputPartitioning.toString.toLowerCase.contains("domain"),
      s"the exchange must hash on domain: ${ex.head.outputPartitioning}")
    assert(windows(q).length == 1)
  }

  test("withRepetitionSignals: map-only — zero exchanges, zero windows") {
    val docs = (1L to 40L).map(i => (i, s"line a\nline b\ntok$i x y z w v"))
      .toDF("id", "text")
    val q = Corpus.withRepetitionSignals(docs, "text")
    assert(shuffles(q).isEmpty && windows(q).isEmpty,
      "every repetition signal is a per-row projection")
  }

  test("approxDistinct: one exchange carrying KMV buffers, never the raw values") {
    val df = (1L to 200L).map(i => (s"g${i % 3}", s"value-$i")).toDF("g", "v")
    val q = Corpus.approxDistinct(df, Seq("g"), "v", k = 32)
    val ex = shuffles(q)
    assert(ex.length == 1, s"exactly one exchange, got ${ex.length}")
    assert(!ex.head.child.output.exists(_.name == "v"),
      s"only (group, sketch buffer) may ride the exchange: ${ex.head.child.output}")
  }

  test("BPE wordCounts: partial aggregation below the word exchange") {
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
    val docs = (1L to 40L).map(i => (i, s"some words here tok$i")).toDF("id", "text")
    val q = BpeTrain.wordCounts(docs, "text")
    val ex = shuffles(q)
    assert(ex.length == 1, s"exactly one exchange, got ${ex.length}")
    // map-side combine: the exchange input is already aggregated, so it
    // carries one row per distinct word per partition, not per occurrence
    val partialAggBelow = ex.head.child.collect {
      case h: HashAggregateExec => h
      case o: ObjectHashAggregateExec => o
    }
    assert(partialAggBelow.nonEmpty, "expected a partial aggregate below the exchange")
  }

  test("semanticDedup: fused pair generator, no window, anti-join prune") {
    import org.apache.spark.sql.execution.GenerateExec
    val data = (1L to 30L)
      .map(i => (i, Array.tabulate(8)(d => ((i + d) % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = Array(Array.fill(8)(0.0), Array.fill(8)(2.0))
    val q = Similarity.semanticDedup(
      data, "vec_id", "embedding", threshold = 0.9, centroids = cents)
    assert(windows(q).isEmpty, "no window anywhere in the prune")
    val gens = prepared(q).collect { case g: GenerateExec => g }
    assert(gens.exists(_.boundGenerator.isInstanceOf[graft.ops.expr.BucketCosinePairs]),
      "in-cell pairs must go through the fused survivor-only generator")
  }

  test("stripTopRoundRobin: strips a plain round-robin, bails when a " +
    "Project above it mints partition-sensitive values") {
    import org.apache.spark.sql.catalyst.plans.logical.Repartition
    import org.apache.spark.sql.graft.ColumnBridge
    def hasRR(df: DataFrame): Boolean =
      df.queryExecution.logical.collect { case r: Repartition => r }.nonEmpty

    val base = (1 to 10).toDF("v")
    // positive control: deterministic projection above the round-robin
    val plain = base.repartition(4).select((col("v") * 2).as("w"))
    assert(!hasRR(ColumnBridge.stripTopRoundRobin(plain)),
      "deterministic Project over repartition(n) must strip")
    // ids minted ABOVE the repartition depend on the exchange's row
    // placement — removing it would change their values (ADVICE r17)
    val minted = base.repartition(4)
      .select(col("v"), monotonically_increasing_id().as("id"))
    assert(hasRR(ColumnBridge.stripTopRoundRobin(minted)),
      "monotonically_increasing_id above the round-robin must block the strip")
    val sprand = base.repartition(4)
      .select(col("v"), spark_partition_id().as("p"))
    assert(hasRR(ColumnBridge.stripTopRoundRobin(sprand)),
      "spark_partition_id above the round-robin must block the strip")
    val rnd = base.repartition(4).select(col("v"), rand(7).as("r"))
    assert(hasRR(ColumnBridge.stripTopRoundRobin(rnd)),
      "rand() above the round-robin must block the strip")
  }
}
