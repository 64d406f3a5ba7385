package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Ordering-dependent corpus operators: contiguous global row indices,
  * reproducible global shuffles, and fixed-length sequence packing — the
  * steps between curation and tokenized training batches.
  *
  * All three need a GLOBAL total order, which naively is
  * `Window.orderBy(...)` with no partition — a single-task sort that dies at
  * any real scale. The scale-safe shape used here is `RDD.zipWithIndex`'s,
  * lifted to DataFrames: range-repartition + sort on the order key (the
  * distributed sort `ORDER BY` lowers to), plan that exchange ONCE via its
  * physical RDD, run one tiny job that sums each partition (#partitions
  * longs to the driver), then stream the rows once more adding the running
  * value map-side from the per-partition offsets.
  *
  * Planning the exchange once is what makes this correct at scale:
  * `RangePartitioner` seeds its bound-sampling with the RDD id, so two
  * separately-planned executions of the "same" range exchange can draw
  * DIFFERENT partition bounds once partitions outgrow the reservoir — a
  * broadcast-offsets formulation built from a second execution would then
  * count rows against partitions they don't land in. Against one physical
  * RDD the bounds are sampled once, the shuffle's map outputs are reused
  * across the two jobs, and per-partition recomputation replays the same
  * lineage.
  *
  * The cost model: ONE data-sized shuffle (the sort), one counting pass
  * over its output, no second shuffle, no window over data, and #partitions
  * longs on the driver. The result frame is rooted at that RDD (a plan
  * barrier — push filters/projections BELOW these operators; nothing can be
  * pushed through a materialized global order anyway).
  */
object Packing {

  /** Range-sort `df` by `orderCols` and append `outName`: the exclusive
    * global prefix sum of `valueAt`'s long column (1 per row when None —
    * i.e. the global row index). See the object doc for why both passes
    * must share one physical RDD. Ties in `orderCols` get an arbitrary
    * order within their run; every other property is deterministic.
    */
  private def withExclusivePrefix(
      df: DataFrame,
      orderCols: Seq[Column],
      valueAt: Option[String],
      outName: String
  ): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    val ordered = df
      .repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = ordered.schema
    val valueOrdinal = valueAt.map(schema.fieldIndex)
    val rdd = ColumnBridge.internalRowRdd(ordered)
    // job 1: per-partition totals — #partitions longs to the driver
    val totals = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        valueOrdinal match {
          case Some(o) => it.foreach(r => s += r.getLong(o))
          case None    => it.foreach(_ => s += 1L)
        }
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // offsets(i) = sum of earlier partitions
    // job 2 (lazy, shuffle map outputs reused): stream rows adding the
    // running value; GenericInternalRow + JoinedRow are the standard
    // reused-per-partition internal-row idiom (downstream scan projection
    // materializes each row before any buffering)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      it.map { row =>
        extra.update(0, acc)
        valueOrdinal match {
          case Some(o) => acc += row.getLong(o)
          case None    => acc += 1L
        }
        joined(row, extra): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    ColumnBridge.dataFrameFromInternalRows(spark, out,
      StructType(schema.fields :+ StructField(outName, LongType, nullable = false)))
  }

  /** Contiguous 0-based global row index in the total order of `orderCols`,
    * added as `indexCol`. Ties in `orderCols` get an arbitrary but
    * per-run-consistent order — pass a unique key (or include one as the
    * last order column) for full run-to-run reproducibility of WHICH row
    * gets WHICH index; the index set of each tie-group is stable always.
    *
    * Shape: one range exchange + one per-partition counting job; the index
    * itself is attached map-side. Eager (the counting job runs at call
    * time), like `RDD.zipWithIndex`.
    */
  def withGlobalIndex(
      df: DataFrame,
      orderCols: Seq[Column],
      indexCol: String = "pos"
  ): DataFrame = {
    require(!df.columns.contains(indexCol),
      s"withGlobalIndex adds '$indexCol' but df already has it")
    withExclusivePrefix(df, orderCols, None, indexCol)
  }

  /** Reproducible global shuffle: permutes rows into the order of
    * `xxhash64(id, seed)` (ties broken by id) and records each row's
    * shuffled position in `posCol`. Same (data, seed) → same permutation on
    * every run, any cluster size or input partitioning — the position is
    * the RANK of the unique key (hash, id) in its total order, and ranks
    * don't depend on where partition boundaries fall. A `rand()` sort has
    * none of these properties. Different seeds give independent
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
    val Seq(hcol) = OpsUtil.tempNames(df, "h")
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
    * count) — document text never reaches the exchange; the global token
    * cumsum is the same one-exchange prefix construction as
    * [[withGlobalIndex]]; the fragment rows come from a map-side `explode`
    * over each document's overlapped sequence range. No single-partition
    * stage, no window over data.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      nTokens: Column,
      seqTokens: Int,
      orderCols: Seq[Column]
  ): DataFrame = {
    require(seqTokens >= 1, "seqTokens must be >= 1")
    val Seq(n, cum) = OpsUtil.tempNames(df, "n", "cum")
    val withN = df
      .withColumn(n, nTokens.cast(LongType))
      .filter(col(n) > 0)
    // project BEFORE the exchange: Catalyst prunes unreferenced columns but
    // does not push the token-count COMPUTATION below a repartition, so
    // without this the text column would ride the range shuffle
    val keep = (orderCols.flatMap(c =>
      ColumnBridge.convertedExpression(c).references.iterator.map(_.name).toSeq)
      ++ Seq(idCol, n)).distinct
    // orderCols must reference TOP-LEVEL columns: a nested reference like
    // col("meta.width") would survive this select under the bare leaf name
    // ("width"), and the range sort after the exchange would then fail to
    // resolve the dotted name. Fail here with the fix, not there.
    val nested = keep.filterNot(k => df.columns.contains(k) || k == n)
    require(nested.isEmpty,
      s"packSequences orderCols must reference top-level columns; " +
        s"${nested.mkString(", ")} look(s) nested or missing — materialize with " +
        "withColumn(\"<name>\", col(\"a.b\")) first and order by the new column")
    val narrow = withN.select(keep.map(col): _*)
    val staged = withExclusivePrefix(narrow, orderCols, Some(n), cum)
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

  /** Keep whole documents in the total order of `orderCols` until
    * `budgetTokens` fills: the kept set is the longest PREFIX of the
    * ordered stream whose running token total stays within the budget —
    * the first over-budget document and everything after it drop (no
    * splitting, no greedy back-fill of later smaller docs; a strict prefix
    * is what makes the selection reproducible and order-auditable). The
    * standard "fill an N-token training mix by quality order" step. NULL
    * and negative token counts occupy zero budget (a negative count would
    * make the running total non-monotone and re-admit rows after the cut,
    * silently breaking the prefix contract).
    *
    * Same one-exchange prefix construction as [[withGlobalIndex]]; the
    * budget test is a map-side filter on the running total.
    */
  def takeTokenBudget(
      df: DataFrame,
      nTokens: Column,
      budgetTokens: Long,
      orderCols: Seq[Column]
  ): DataFrame = {
    require(budgetTokens >= 0, "budgetTokens must be >= 0")
    val Seq(n, cum) = OpsUtil.tempNames(df, "n", "cum")
    val withN = df.withColumn(n,
      greatest(coalesce(nTokens.cast(LongType), lit(0L)), lit(0L)))
    withExclusivePrefix(withN, orderCols, Some(n), cum)
      .filter(col(cum) + col(n) <= budgetTokens)
      .drop(n, cum)
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
}
