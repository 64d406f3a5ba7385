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
    * Three regimes, chosen by measured graph size:
    *   - `|E| ≤ localSolveMaxEdges`: ONE driver round-trip — collect the
    *     deduplicated edge list, union-find with path compression, ship the
    *     `(id, component)` map back as a distributed frame. This is not a
    *     concession on distribution: the iterative path below must broadcast
    *     the full label table through the driver EVERY round, so for any
    *     graph small enough to broadcast, a single collect moves strictly
    *     less data through the driver than O(rounds) label broadcasts. The
    *     cap bounds driver memory exactly like the k·dim collect contract
    *     in [[Similarity.trainCentroids]].
    *   - `|V| ≤ broadcastMaxLabelRows` AND estimated label bytes ≤
    *     `broadcastMaxLabelBytes`: iterative min-label propagation with
    *     multi-hop pointer jumping; label frames ride broadcast joins, one
    *     shuffle (the neighbor-min aggregation) per round. The byte cap
    *     exists because a row count is a poor proxy for broadcast memory
    *     when ids are wide strings (250k × 4 KB ids ≈ 2 GB per round).
    *   - larger: same iteration with shuffle joins — nothing is ever
    *     collected or broadcast, the 100 TB path.
    *
    * @param maxIter hard cap on pointer-jumping rounds (log₂ of the longest
    *   chain; 40 covers any graph that fits in storage)
    */
  def connectedComponents(
      pairs: DataFrame,
      idACol: String = "id_a",
      idBCol: String = "id_b",
      maxIter: Int = 40,
      broadcastMaxLabelRows: Long = 250000L,
      localSolveMaxEdges: Long = 100000L,
      broadcastMaxLabelBytes: Long = 64L * 1024 * 1024
  ): DataFrame = {
    // Symmetric edge list, deduplicated once: every later round joins it.
    // One explode, NOT union(pairs, pairs.swapped): a union makes two plan
    // branches that each recompute the whole upstream pair pipeline (LSH /
    // prefix-filter joins — plan branches share no work).
    //
    // CACHE LAYOUT = the loop's join requirement (hash(v), sorted by v):
    // every shuffle-regime round joins `edges` on `v`, and a cached frame's
    // partitioning/ordering survive into each round's plan (exchange reuse
    // does NOT cross jobs, a cached layout does) — so the per-round
    // full-edge exchange AND the per-round SMJ sort of the edge side both
    // vanish; only the label-sized side moves per round. The layout is
    // free: dedup needs ClusteredDistribution(u,v) and hash(v) is a valid
    // clustering for it (equal (u,v) ⇒ equal v ⇒ same partition), so the
    // explicit repartition REPLACES distinct's exchange instead of adding
    // one. Partition count = the session's shuffle partitions so the
    // labels-side exchange each round matches it exactly (AQE cannot
    // coalesce a side that must co-partition with a fixed cached layout).
    val loopParts = pairs.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val edges = pairs
      .select(explode(array(
        struct(col(idACol).as("u"), col(idBCol).as("v")),
        struct(col(idBCol).as("u"), col(idACol).as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .repartition(loopParts, col("v"))
      .dropDuplicates("u", "v")
      .sortWithinPartitions("v")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // this count doubles as the cache materialization for whichever
    // regime runs next
    val nEdges = edges.count()
    if (nEdges <= localSolveMaxEdges && locallyOrderable(pairs.schema(idACol).dataType)) {
      try return localUnionFind(edges)
      finally edges.unpersist(blocking = false)
    }
    // Iterative plans MUST truncate lineage each round: labels feeds three
    // plan branches per iteration, so the logical plan grows 3^rounds
    // without it (persist alone caches data but keeps the logical tree —
    // measured: plan-string OOM by round ~10). Truncation here = persist +
    // re-root over the cached plan's InternalRow RDD
    // (ColumnBridge.truncateLineage — no row codec round-trip): unlike
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
      org.apache.spark.sql.graft.ColumnBridge.truncateLineage(p)
    }
    // Initial label = min(own id, min neighbor id): the same single shuffle
    // a plain `select(u).distinct()` would cost, but it fast-forwards one
    // whole propagation round — every diameter ≤ 2 family (near-dup
    // families are near-cliques) converges after ONE loop iteration.
    var labels = truncate(
      edges
        .groupBy(col("u"))
        .agg(min(col("v")).as("nmin"))
        .select(col("u").as("id"), least(col("u"), col("nmin")).as("label")))

    // Fixpoint test that works for any id type: sum of per-row label
    // digests. Labels only change by strictly decreasing, so an unchanged
    // sum means fixpoint up to digest-sum collision (p ≈ 2⁻⁶⁴ per round —
    // the same order as a memory bit flip; a plain label sum would be exact
    // but only exists for numeric ids and can overflow).
    // The count comes along in the same scan (it also materializes the
    // cache): the id set is round-invariant, so it's measured once.
    val init = backing.agg(
      sum(xxhash64(col("id"), col("label")).cast("decimal(38,0)")).as("digest"),
      count(lit(1)).as("n"),
      // broadcast-size estimate for the (id, label) frame: both columns are
      // id-typed, so 2 × the id's string-rep octet length plus two UnsafeRow
      // word slots per row. A row-count cap alone would let 250k × multi-KB
      // string ids silently blow the per-round broadcast.
      coalesce(sum(octet_length(col("id").cast("string")) * 2 + lit(16)), lit(0L))
        .as("bytes")).head
    def labelDigest(df: DataFrame): String =
      // decimal(38,0) accumulator: a Long sum would overflow under ANSI
      String.valueOf(df.agg(
        sum(xxhash64(col("id"), col("label")).cast("decimal(38,0)"))).head.get(0))

    // The label frames are (id, label) pairs — tiny next to the corpus the
    // pair table came from. Under the row cap, hint them broadcast: every
    // join in the round becomes map-side and the whole iteration runs ONE
    // shuffle (the neighbor-min partial aggregation). The rebuilt frames
    // carry no stats, so without the hint Spark would never choose this.
    // BOTH caps must pass: rows (driver/open-hash pressure) AND estimated
    // bytes (executor broadcast memory × rounds) — wide string ids can hit
    // the byte cap long before the row cap
    val smallGraph = init.getLong(1) <= broadcastMaxLabelRows &&
      init.getLong(2) <= broadcastMaxLabelBytes
    def bc(df: DataFrame): DataFrame = if (smallGraph) broadcast(df) else df
    // Pointer hops per round: in the broadcast regime each extra hop is one
    // more map-side hash probe against the SAME broadcast label table (no
    // extra shuffle, no extra stage), and k hops compress pointer chains
    // 2^k× per round — sparse high-diameter graphs converge in
    // log_{2^k}(diameter) rounds instead of log₂. In the shuffle regime an
    // extra hop is a full self-join shuffle, so stay at one.
    val hops = if (smallGraph) 4 else 1

    var prevDigest = String.valueOf(init.get(0))
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      val prevBacking = backing
      // min label among my neighbors (one shuffle on v, map-side partial min)
      val nbrMin = edges
        .join(bc(labels.withColumnRenamed("id", "v").withColumnRenamed("label", "nl")), "v")
        .groupBy(col("u").as("id"))
        .agg(min(col("nl")).as("nmin"))
      // pointer chase: reach = L[L[…L[label]…]] via chained left joins; every
      // label value is itself a node id (labels start as min(id, neighbor)
      // and only ever take other nodes' labels), so each hop resolves — the
      // left join + coalesce is belt-and-braces, not a semantic branch.
      // All hops probe ONE hop table with identical column names: alias
      // names survive plan canonicalization, so per-hop names (__p1…__p4)
      // would make each BroadcastExchange distinct and defeat ReuseExchange
      // — same names let all hops share a single broadcast.
      val hop = labels.select(col("id").as("__hl"), col("label").as("__hp"))
      var ptr = labels
      for (_ <- 1 to hops) {
        ptr = ptr
          .join(bc(hop), col("label") === col("__hl"), "left")
          .select(
            col("id"),
            least(col("label"), coalesce(col("__hp"), col("label"))).as("label"))
      }
      val next = truncate(ptr
        .join(bc(nbrMin), Seq("id"), "left")
        .select(
          col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label")))
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

  /** Id types the driver-side union-find can order and hash correctly: the
    * collected JVM form must have value-based equals/hashCode (HashMap keys)
    * and an ordering that agrees with Spark's `least`. Binary, array, struct
    * and float ids fail one or the other (identity-hashed arrays; JVM
    * -0.0 < 0.0 vs Spark's -0.0 == 0.0) and take the distributed path.
    */
  private def locallyOrderable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType | StringType |
          BooleanType | DateType | TimestampType | TimestampNTZType => true
      case _: DecimalType => true
      case _ => false
    }
  }

  /** Driver-side union-find over a collected symmetric edge list — the
    * small-graph fast path of [[connectedComponents]]. Representative = min
    * id per component, so links always point from the larger root to the
    * smaller; path compression keeps find amortized near-constant.
    *
    * Ordering parity with the distributed path: Spark's `least` on strings
    * compares UTF-8 bytes ([[org.apache.spark.unsafe.types.UTF8String]]
    * order), NOT JVM `String.compareTo` (UTF-16 order, which disagrees
    * above the basic multilingual plane).
    */
  private def localUnionFind(edges: DataFrame): DataFrame = {
    import org.apache.spark.unsafe.types.UTF8String
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: String, y: String) =>
        UTF8String.fromString(x).compareTo(UTF8String.fromString(y)) < 0
      case (x, y) => x.asInstanceOf[Comparable[Any]].compareTo(y) < 0
    }
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var root = x
      while (parent.getOrDefault(root, root) != root) root = parent.get(root)
      var cur = x // path compression
      while (cur != root) { val nxt = parent.get(cur); parent.put(cur, root); cur = nxt }
      root
    }
    // the edge list is symmetric, so u < v keeps each undirected edge once
    // (and still carries both endpoints) — half the driver transfer
    val rows = edges.filter(col("u") < col("v")).collect()
    val ids = new java.util.HashSet[Any]()
    rows.foreach { r =>
      val (u, v) = (r.get(0), r.get(1))
      ids.add(u); ids.add(v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) {
        if (lt(ru, rv)) parent.put(rv, ru) else parent.put(ru, rv)
      }
    }
    val spark = edges.sparkSession
    val idType = edges.schema("u").dataType
    import org.apache.spark.sql.types.{LongType, StringType}
    // encoder-specialized ship-back for the realistic id types: eager
    // tungsten encoding beats the generic Row + JavaSerializer route
    idType match {
      case LongType =>
        val out = new Array[(Long, Long)](ids.size())
        var i = 0
        ids.forEach { id =>
          out(i) = (id.asInstanceOf[Long], find(id).asInstanceOf[Long]); i += 1
        }
        import spark.implicits._
        spark.createDataset(out.toIndexedSeq).toDF("id", "component")
      case StringType =>
        val out = new Array[(String, String)](ids.size())
        var i = 0
        ids.forEach { id =>
          out(i) = (id.asInstanceOf[String], find(id).asInstanceOf[String]); i += 1
        }
        import spark.implicits._
        spark.createDataset(out.toIndexedSeq).toDF("id", "component")
      case _ =>
        val outSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType),
          org.apache.spark.sql.types.StructField("component", idType)))
        val outRows = new java.util.ArrayList[org.apache.spark.sql.Row](ids.size())
        ids.forEach { id => outRows.add(org.apache.spark.sql.Row(id, find(id))) }
        spark.createDataFrame(
          spark.sparkContext.parallelize(
            outRows.toArray(Array.empty[org.apache.spark.sql.Row]).toIndexedSeq,
            spark.sparkContext.defaultParallelism),
          outSchema)
    }
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
      idBCol: String = "id_b",
      broadcastMaxLabelRows: Long = 250000L,
      localSolveMaxEdges: Long = 100000L
  ): DataFrame = {
    // the output column is part of the contract — refuse to clobber one the
    // caller already has; internals stay under __cc_ so a caller's
    // 'component' column survives untouched
    require(!df.columns.contains("cluster"),
      "assignClusters adds a 'cluster' column but df already has one")
    val cc = connectedComponents(pairs, idACol, idBCol,
        broadcastMaxLabelRows = broadcastMaxLabelRows,
        localSolveMaxEdges = localSolveMaxEdges)
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
      idBCol: String = "id_b",
      broadcastMaxLabelRows: Long = 250000L,
      localSolveMaxEdges: Long = 100000L
  ): DataFrame = {
    // purely internal columns — unlike assignClusters, this adds nothing to
    // the output schema, so a caller-owned 'cluster' column is none of our
    // business here
    val cc = connectedComponents(pairs, idACol, idBCol,
        broadcastMaxLabelRows = broadcastMaxLabelRows,
        localSolveMaxEdges = localSolveMaxEdges)
      .select(col("id").as("__cc_id"), col("component").as("__cc_comp"))
    df.join(cc, df(idCol) === col("__cc_id"), "left")
      .filter(col("__cc_comp").isNull || df(idCol) === col("__cc_comp"))
      .drop("__cc_id", "__cc_comp")
  }
}
