package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution: turn a near-duplicate PAIR table (the output
  * of [[Dedup.jaccardPairs]], [[Dedup.nearDuplicatePairs]],
  * [[Dedup.simhashNearDuplicatePairs]] or
  * [[Similarity.cosineNearDuplicatePairs]]) into connected components, so a
  * whole transitive duplicate family keeps exactly ONE representative. Pair
  * lists alone over-keep: with pairs (A,B) and (B,C) the drop-id_b policy
  * keeps A and drops B and C, but with pairs (A,B),(C,D),(B,C) arriving from
  * different LSH tables a pairwise policy can disagree with the transitive
  * family — components are the principled contract (and what the standard
  * corpus-dedup pipelines compute).
  *
  * Scale design: min-label propagation **with pointer jumping** — per round
  * every node takes the min of (its label, its label's label, its neighbors'
  * labels). Plain neighbor propagation needs O(diameter) rounds (a path
  * graph of n nodes needs n rounds); the label-of-label join halves pointer
  * chains every round, giving O(log n) worst-case rounds with the same
  * per-round cost: two hash joins + one aggregation, all on (long, long)
  * pairs — no payload ever enters the shuffles. Near-dup families in real
  * corpora are near-cliques (diameter ≤ 3), so convergence is typically 2-3
  * rounds. Convergence detection is free: labels only ever decrease, so the
  * label sum is strictly decreasing until the fixpoint — one scalar action
  * per round, no change-count join.
  */
object Cluster {

  /** Connected components of the undirected graph given as a pair table.
    * Returns `(id, component)` for every id that appears in `pairs`, where
    * `component` is the smallest id reachable from it. Ids must be
    * non-null; any orderable id type works (components are mins).
    *
    * @param maxIter hard cap on pointer-jumping rounds (log₂ of the longest
    *   chain; 40 covers any graph that fits in storage)
    */
  def connectedComponents(
      pairs: DataFrame,
      idACol: String = "id_a",
      idBCol: String = "id_b",
      maxIter: Int = 40
  ): DataFrame = {
    // Symmetric edge list, deduplicated once: every later round joins it.
    // One explode, NOT union(pairs, pairs.swapped): a union makes two plan
    // branches that each recompute the whole upstream pair pipeline (LSH /
    // prefix-filter joins — plan branches share no work).
    val edges = pairs
      .select(explode(array(
        struct(col(idACol).as("u"), col(idBCol).as("v")),
        struct(col(idBCol).as("u"), col(idACol).as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Iterative plans MUST truncate lineage each round: labels feeds three
    // plan branches per iteration, so the logical plan grows 3^rounds
    // without it (persist alone caches data but keeps the logical tree —
    // measured: plan-string OOM by round ~10). Truncation here = persist +
    // materialize + rebuild a fresh frame from the cached RDD: unlike
    // localCheckpoint (whose blocks Dataset.unpersist can NOT release —
    // it never registers with the CacheManager — and whose eviction is
    // data LOSS), this keeps every superseded round explicitly freeable
    // and degrades to recompute, not failure, under memory pressure.
    // `backing` is the persisted frame behind the current `labels`.
    // No explicit materialize action here: every truncate is immediately
    // followed by the digest aggregation over `backing`, whose full scan
    // populates the cache.
    var backing: DataFrame = null
    def truncate(df: DataFrame): DataFrame = {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      backing = p
      p.sparkSession.createDataFrame(p.rdd, p.schema)
    }
    var labels = truncate(
      edges
        .select(col("u").as("id"))
        .distinct()
        .withColumn("label", col("id")))

    // Fixpoint test that works for any id type: sum of per-row label
    // digests. Labels only change by strictly decreasing, so an unchanged
    // sum means fixpoint up to digest-sum collision (p ≈ 2⁻⁶⁴ per round —
    // the same order as a memory bit flip; a plain label sum would be exact
    // but only exists for numeric ids and can overflow).
    def labelDigest(df: DataFrame): String =
      // decimal(38,0) accumulator: a Long sum would overflow under ANSI
      String.valueOf(df.agg(
        sum(xxhash64(col("id"), col("label")).cast("decimal(38,0)"))).head.get(0))

    var prevDigest = labelDigest(backing)
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      val prevBacking = backing
      // min label among my neighbors (one shuffle on v, map-side partial min)
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "v").withColumnRenamed("label", "nl"), "v")
        .groupBy(col("u").as("id"))
        .agg(min(col("nl")).as("nmin"))
      // label-of-label (pointer jump): labels is both sides of a self-join
      val ptr = labels
        .join(
          labels.select(col("id").as("label"), col("label").as("pl")),
          Seq("label"), "left")
      val next = truncate(ptr
        .join(nbrMin, Seq("id"), "left")
        .select(
          col("id"),
          least(
            col("label"),
            coalesce(col("pl"), col("label")),
            coalesce(col("nmin"), col("label"))).as("label")))
      val digest = labelDigest(backing)
      // free the superseded round NOW (next is materialized) — waiting for
      // the ContextCleaner would hold rounds × |V| cached copies at once
      prevBacking.unpersist(blocking = false)
      labels = next
      converged = digest == prevDigest
      prevDigest = digest
      round += 1
    }
    edges.unpersist(blocking = false)
    // the final round's backing frame stays cached until the caller's
    // context evicts it (LRU) — the result must stay materialized-cheap
    labels.withColumnRenamed("label", "component")
  }

  /** Attach a `cluster` column to `df`: the component representative (min
    * reachable id) for ids in a duplicate family, the row's own id for
    * singletons. One left join against the component table — `pairs` is
    * usually tiny next to the corpus, so AQE broadcasts it.
    */
  def assignClusters(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      idACol: String = "id_a",
      idBCol: String = "id_b"
  ): DataFrame = {
    // the output column is part of the contract — refuse to clobber one the
    // caller already has; internals stay under __cc_ so a caller's
    // 'component' column survives untouched
    require(!df.columns.contains("cluster"),
      "assignClusters adds a 'cluster' column but df already has one")
    val cc = connectedComponents(pairs, idACol, idBCol)
      .select(col("id").as("__cc_id"), col("component").as("__cc_comp"))
    df.join(cc, df(idCol) === col("__cc_id"), "left")
      .withColumn("cluster", coalesce(col("__cc_comp"), df(idCol)))
      .drop("__cc_id", "__cc_comp")
  }

  /** Keep exactly one row (the min-id representative) per duplicate family —
    * the end-to-end "dedup the corpus" verb: pairs → components → filter.
    */
  def keepClusterRepresentatives(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      idACol: String = "id_a",
      idBCol: String = "id_b"
  ): DataFrame = {
    // purely internal columns — unlike assignClusters, this adds nothing to
    // the output schema, so a caller-owned 'cluster' column is none of our
    // business here
    val cc = connectedComponents(pairs, idACol, idBCol)
      .select(col("id").as("__cc_id"), col("component").as("__cc_comp"))
    df.join(cc, df(idCol) === col("__cc_id"), "left")
      .filter(col("__cc_comp").isNull || df(idCol) === col("__cc_comp"))
      .drop("__cc_id", "__cc_comp")
  }
}
