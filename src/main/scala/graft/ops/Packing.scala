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
  * any real scale. The scale-safe shape used here is the classic two-phase
  * construction: range-repartition on the order key (a distributed sort,
  * exactly what `ORDER BY` lowers to), compute per-partition counts/sums (a
  * handful of longs), broadcast the exclusive per-partition offsets back,
  * and finish map-side or with a per-partition window. Nothing wider than
  * the order keys ever moves twice, and no step ever collects data rows to
  * the driver.
  */
object Packing {

  /** Per-partition (exclusive) offsets of an aggregate over range-partitioned
    * data: returns the input re-partitioned+sorted with two extra columns —
    * `pidCol` (the physical partition index) and `offCol` (the sum of
    * `perRow` over all earlier partitions).
    *
    * Fully lazy — building the frame launches no jobs; the offsets sub-plan
    * (per-partition totals → one #partitions-row exclusive prefix sum)
    * executes as the broadcast side of the final join. The range exchange is
    * evaluated once per side, but column pruning reaches below the offsets
    * side's exchange, so that pass shuffles only the order keys + `perRow` —
    * at corpus scale that beats persisting the full post-exchange rows to
    * storage just to save a narrow second pass.
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
      df: DataFrame,
      orderCols: Seq[Column],
      perRow: Column,
      pidCol: String,
      offCol: String
  ): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    val ordered = df
      .repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn(pidCol, spark_partition_id())
    val offsets = ordered
      .groupBy(col(pidCol))
      .agg(coalesce(sum(perRow).cast(LongType), lit(0L)).as("__total"))
      .withColumn(offCol,
        coalesce(
          sum(col("__total")).over(
            Window.orderBy(col(pidCol))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(pidCol), col(offCol))
    // broadcast join on the partition id: map-side, no re-shuffle of data.
    // The unpartitioned window above is safe: its input is one row per
    // partition (≤ a few thousand), never data-sized.
    ordered.join(broadcast(offsets), pidCol)
  }

  /** Contiguous 0-based global row index in the total order of `orderCols`,
    * added as `indexCol`. Ties in `orderCols` get an arbitrary but
    * deterministic-per-input order — pass a unique key (or include one as
    * the last order column) for full run-to-run reproducibility.
    *
    * Shape: range shuffle (the distributed sort) + per-partition
    * `row_number` + broadcast offsets — never a single-partition window.
    */
  def withGlobalIndex(
      df: DataFrame,
      orderCols: Seq[Column],
      indexCol: String = "pos"
  ): DataFrame = {
    require(!df.columns.contains(indexCol),
      s"withGlobalIndex adds '$indexCol' but df already has it")
    val Seq(pid, off) = tempNames(df, "pid", "off")
    val w = Window.partitionBy(col(pid)).orderBy(orderCols: _*)
    withPartitionOffsets(df, orderCols, lit(1L), pid, off)
      .withColumn(indexCol, col(off) + row_number().over(w) - 1)
      .drop(pid, off)
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
    * Shape: one range sort on `orderCols`, one per-partition window cumsum
    * with broadcast partition offsets, then a map-side `explode` over each
    * document's overlapped sequence range. No single-partition stage.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      nTokens: Column,
      seqTokens: Int,
      orderCols: Seq[Column]
  ): DataFrame = {
    require(seqTokens >= 1, "seqTokens must be >= 1")
    val Seq(pid, off, n, cum) = tempNames(df, "pid", "off", "n", "cum")
    val withN = df
      .withColumn(n, nTokens.cast(LongType))
      .filter(col(n) > 0)
    val w = Window.partitionBy(col(pid)).orderBy(orderCols: _*)
    // exclusive cumsum = this document's first token slot in the stream
    val begin = col(off) + sum(col(n)).over(w) - col(n)
    val staged = withPartitionOffsets(withN, orderCols, col(n), pid, off)
      .withColumn(cum, begin)
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
