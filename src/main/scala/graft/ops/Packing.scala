package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Ordering-dependent corpus operators: contiguous global row indices,
  * reproducible global shuffles, and fixed-length sequence packing — the
  * steps between curation and tokenized training batches.
  *
  * All three need a GLOBAL total order, which naively is
  * `Window.orderBy(...)` with no partition — a single-task sort that dies at
  * any real scale. The scale-safe shape used here:
  *
  *   1. range-repartition on the order key and sort within partitions (a
  *      distributed sort — exactly what `ORDER BY` lowers to), then stamp
  *      rows with `monotonically_increasing_id`, whose layout (physical
  *      partition index in the high bits, a 0-based per-partition counter in
  *      the low 33) turns the within-partition ROW NUMBER into two bit-ops —
  *      map-side, no window, no second shuffle;
  *   2. aggregate per-partition counts/sums (a handful of longs) and prefix-
  *      sum them into exclusive partition offsets — a sub-plan that runs as
  *      the broadcast side of a map-side join, never a driver action.
  *
  * `withGlobalIndex` (and so `deterministicShuffle`) pays exactly ONE
  * data-sized shuffle — the range exchange; `packSequences` adds one more
  * for its within-partition running sum, but over rows narrowed to
  * (order keys, id, token count) first — never the document text. No step
  * collects data rows to the driver.
  */
object Packing {

  /** `monotonically_increasing_id` bit layout (fixed by Spark): partition
    * index above bit 33, per-partition insertion counter below. Evaluated
    * above a partition-local sort, the counter IS the within-partition row
    * number in the total order.
    */
  private val RowBits = 33
  private val RowMask = (1L << RowBits) - 1

  private def pidOf(mid: Column): Column = shiftright(mid, RowBits)
  private def rowOf(mid: Column): Column = mid.bitwiseAND(lit(RowMask))

  /** The one data-sized shuffle: distributed sort by `orderCols`, each row
    * stamped with `monotonically_increasing_id` as `midCol`.
    */
  private def rangeSorted(
      df: DataFrame,
      orderCols: Seq[Column],
      midCol: String
  ): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    df.repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn(midCol, monotonically_increasing_id())
  }

  /** Adds `pidCol` (physical partition index) and `offCol` (exclusive sum of
    * `perRow` over all earlier partitions) to a [[rangeSorted]] frame.
    *
    * Fully lazy — the offsets sub-plan (per-partition totals → one
    * #partitions-row exclusive prefix sum; the unpartitioned window is over
    * ONE ROW PER PARTITION, never data) executes as the broadcast side of
    * the final join. The range exchange is evaluated once per side, but
    * column pruning reaches below the offsets side's exchange, so that pass
    * shuffles only the order keys + `perRow` inputs — at corpus scale that
    * beats persisting the full post-exchange rows to storage just to save a
    * narrow second pass.
    *
    * Both sides agree on every row's partition: `repartitionByRange` draws
    * its range bounds by reservoir sampling seeded per input-partition index
    * (deterministic for a fixed input), so the pruned and unpruned
    * executions compute identical bounds and identical row→partition
    * assignment — per-partition totals therefore match the data side
    * exactly. Intra-partition order of tied keys is NOT stable across
    * executions (shuffle fetch order); per-partition counts don't depend on
    * it, so only tie-breaking among equal keys varies — see the
    * [[withGlobalIndex]] contract.
    */
  private def withPartitionOffsets(
      ordered: DataFrame,
      midCol: String,
      perRow: Column,
      pidCol: String,
      offCol: String
  ): DataFrame = {
    val withPid = ordered.withColumn(pidCol, pidOf(col(midCol)))
    val offsets = withPid
      .groupBy(col(pidCol))
      .agg(coalesce(sum(perRow).cast(LongType), lit(0L)).as("__total"))
      .withColumn(offCol,
        coalesce(
          sum(col("__total")).over(
            Window.orderBy(col(pidCol))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(pidCol), col(offCol))
    // broadcast join on the partition id: map-side, no re-shuffle of data
    withPid.join(broadcast(offsets), pidCol)
  }

  /** Contiguous 0-based global row index in the total order of `orderCols`,
    * added as `indexCol`. Ties in `orderCols` get an arbitrary but
    * deterministic-per-input order — pass a unique key (or include one as
    * the last order column) for full run-to-run reproducibility.
    *
    * Shape: ONE range exchange (the distributed sort); the index is
    * `broadcast partition offset + the row counter already inside
    * monotonically_increasing_id` — both map-side. No window over data, no
    * second shuffle, no driver action.
    */
  def withGlobalIndex(
      df: DataFrame,
      orderCols: Seq[Column],
      indexCol: String = "pos"
  ): DataFrame = {
    require(!df.columns.contains(indexCol),
      s"withGlobalIndex adds '$indexCol' but df already has it")
    val Seq(mid, pid, off) = tempNames(df, "mid", "pid", "off")
    withPartitionOffsets(rangeSorted(df, orderCols, mid), mid, lit(1L), pid, off)
      .withColumn(indexCol, col(off) + rowOf(col(mid)))
      .drop(mid, pid, off)
  }

  /** Reproducible global shuffle: permutes rows into the order of
    * `xxhash64(id, seed)` (ties broken by id) and records each row's
    * shuffled position in `posCol`. Same (data, seed) → same permutation on
    * every run, any cluster size — the property training-data order needs
    * and a `rand()` sort does not have. Different seeds give independent
    * permutations (new epoch = new seed).
    *
    * `idCol` must be unique per row; the hash is the sort key, so this is
    * one range-partitioned sort of (hash, id) — no driver bottleneck.
    */
  def deterministicShuffle(
      df: DataFrame,
      idCol: String,
      seed: Long,
      posCol: String = "pos"
  ): DataFrame = {
    val Seq(hcol) = tempNames(df, "h")
    withGlobalIndex(
      df.withColumn(hcol, xxhash64(col(idCol), lit(seed))),
      Seq(col(hcol).asc, col(idCol).asc),
      posCol
    ).drop(hcol)
  }

  /** Pack documents into fixed-length training sequences by concatenation in
    * the total order of `orderCols`: conceptually the corpus token stream is
    * laid end-to-end and cut every `seqTokens` tokens; a document whose span
    * crosses a cut appears once per overlapped sequence (the standard
    * concat-and-cut pretraining packing — zero padding waste, documents may
    * straddle).
    *
    * Output: one row per (document × overlapped sequence) fragment —
    *   - `seq_id`: which fixed-length sequence the fragment lands in
    *   - `seq_offset`: the fragment's first token slot within that sequence
    *   - `doc_offset`: the fragment's first token within the document
    *   - `n_tokens`: fragment length
    * Documents with zero tokens are dropped (they occupy no slots).
    *
    * Shape: the frame is first NARROWED to (sort-key inputs, id, token
    * count) so the range exchange never carries document text; the
    * within-partition running sum is the one remaining window, and its
    * exchange moves only those narrow rows. The fragment rows come from a
    * map-side `explode` over each document's overlapped sequence range. No
    * single-partition stage, no driver action.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      nTokens: Column,
      seqTokens: Int,
      orderCols: Seq[Column]
  ): DataFrame = {
    require(seqTokens >= 1, "seqTokens must be >= 1")
    val Seq(mid, pid, off, n, cum) = tempNames(df, "mid", "pid", "off", "n", "cum")
    val withN = df
      .withColumn(n, nTokens.cast(LongType))
      .filter(col(n) > 0)
    // project BEFORE the exchange: Catalyst prunes unreferenced columns but
    // does not push the token-count COMPUTATION below a repartition, so
    // without this the text column would ride the range shuffle
    val keep = (orderCols.flatMap(c =>
      org.apache.spark.sql.graft.ColumnBridge.convertedExpression(c)
        .references.iterator.map(_.name).toSeq)
      ++ Seq(idCol, n)).distinct
    val narrow = withN.select(keep.map(col): _*)
    val staged0 = withPartitionOffsets(
      rangeSorted(narrow, orderCols, mid), mid, col(n), pid, off)
    // exclusive cumsum = this document's first token slot in the stream;
    // ordering by the id-stamp reuses the already-sorted order
    val w = Window.partitionBy(col(pid)).orderBy(col(mid))
    val staged = staged0.withColumn(cum, col(off) + sum(col(n)).over(w) - col(n))
    val L = lit(seqTokens.toLong)
    val firstSeq = floor(col(cum) / L)
    val lastSeq = floor((col(cum) + col(n) - 1) / L)
    staged
      .select(
        col(idCol), col(cum), col(n),
        explode(sequence(firstSeq, lastSeq)).as("seq_id"))
      .select(
        col(idCol),
        col("seq_id"),
        greatest(col(cum), col("seq_id") * L).minus(col("seq_id") * L)
          .cast(LongType).as("seq_offset"),
        greatest(col(cum), col("seq_id") * L).minus(col(cum))
          .cast(LongType).as("doc_offset"),
        (least(col(cum) + col(n), (col("seq_id") + 1) * L)
          - greatest(col(cum), col("seq_id") * L))
          .cast(LongType).as("n_tokens"))
  }

  /** Convenience: pack by whitespace token count of a text column, ordered
    * by the id (the deterministic default — compose with
    * [[deterministicShuffle]] first and order by `pos` to pack a shuffled
    * epoch).
    */
  def packSequencesByText(
      df: DataFrame,
      idCol: String,
      textCol: String,
      seqTokens: Int
  ): DataFrame =
    packSequences(df, idCol, size(TextStats.tokens(col(textCol))), seqTokens,
      Seq(col(idCol).asc))

  /** Collision-free temp column names (withColumn silently replaces — a
    * caller column named like an internal would be destroyed otherwise).
    */
  private def tempNames(df: DataFrame, bases: String*): Seq[String] =
    bases.map { b =>
      Iterator.from(0)
        .map(i => if (i == 0) s"__$b" else s"__$b$i")
        .find(n => !df.columns.contains(n)).get
    }
}
