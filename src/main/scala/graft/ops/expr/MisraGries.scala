package graft.ops.expr

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a mergeable Spark aggregate.
  *
  * Aggregates a string column to `struct(n, err, items)` where `n` is the
  * exact number of non-null inputs, `items` is at most `budget`
  * (token, est) pairs, and `err` is a per-item undercount certificate:
  * for EVERY token, `est ≤ true_count ≤ est + err` (absent ⇒ est 0), so any
  * token with `true_count > err` is guaranteed present. `err ≤ n/(budget+1)`
  * by the classic analysis; the tracked value is the tighter run-specific
  * bound (decrement events actually taken, plus merge offsets).
  *
  * Why this exists at 100 TB: exact vocabulary counting shuffles one
  * (token, partialCount) row per distinct token per map partition — on raw
  * web n-grams that is billions of keys and the aggregation exchange IS the
  * job. This sketch caps per-partition aggregation state at `budget`
  * entries BY CONSTRUCTION and merges associatively (Agarwal et al.,
  * "Mergeable Summaries", PODS'12: merge = counter sum, then subtract the
  * (budget+1)-th largest count from all and drop non-positives, folding the
  * subtracted value into `err`), so a global top-k plans as one partial
  * aggregate per partition + one bounded final merge — no (token) shuffle
  * at all. Combined with a candidate re-count pass
  * ([[graft.ops.Corpus.topTokensSketch]]) the final top-k is EXACT whenever
  * the k-th candidate's recounted frequency exceeds `err` — a machine-checked
  * certificate, not a heuristic.
  *
  * Spark 4.1 ships `approx_top_k` (DataSketches frequent-items) which covers
  * the estimate-only use; it does not expose the error bound needed for the
  * exactness certificate, which is why this is a custom
  * [[TypedImperativeAggregate]] (same pattern as [[BoundedCollectList]]).
  */
case class MisraGriesSketch(
    child: Expression,
    budget: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesSketch.Buffer]
  with UnaryLike[Expression] {

  require(budget >= 1, s"misra_gries budget must be >= 1, got $budget")

  import MisraGriesSketch.Buffer

  override def createAggregationBuffer(): Buffer = new Buffer(budget)

  override def update(b: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String])
    b
  }

  override def merge(b: Buffer, o: Buffer): Buffer = { b.mergeIn(o); b }

  override def eval(b: Buffer): Any = {
    val items = b.sortedItems.map { case (tok, est) =>
      InternalRow(tok, est)
    }
    InternalRow(b.n, b.err, new GenericArrayData(items))
  }

  private lazy val itemType: StructType = new StructType()
    .add("token", StringType, nullable = false)
    .add("est", LongType, nullable = false)

  private lazy val bufferSchema: StructType = new StructType()
    .add("n", LongType, nullable = false)
    .add("err", LongType, nullable = false)
    .add("items", ArrayType(itemType, containsNull = false), nullable = false)

  private lazy val serializer = UnsafeProjection.create(bufferSchema)

  override def serialize(b: Buffer): Array[Byte] = {
    val items = b.sortedItems.map { case (tok, est) => InternalRow(tok, est) }
    serializer(InternalRow(b.n, b.err, new GenericArrayData(items))).getBytes
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val row = new UnsafeRow(3)
    row.pointTo(bytes, bytes.length)
    val b = new Buffer(budget)
    b.n = row.getLong(0)
    b.err = row.getLong(1)
    val arr = row.getArray(2)
    var i = 0
    while (i < arr.numElements()) {
      val item = arr.getStruct(i, 2)
      b.counts.update(item.getUTF8String(0).clone(), item.getLong(1))
      i += 1
    }
    b
  }

  override def dataType: DataType = bufferSchema
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesSketch =
    copy(child = newChild)
}

object MisraGriesSketch {

  /** Mutable MG state: counter map (≤ budget entries between operations),
    * exact input count `n`, undercount bound `err`.
    */
  final class Buffer(budget: Int) {
    var n: Long = 0L
    var err: Long = 0L
    val counts: mutable.HashMap[UTF8String, Long] = new mutable.HashMap

    /** Classic MG step: bump if tracked, insert if room, else decrement all
      * (the arrival itself absorbs one of the decrements — it is counted in
      * `err`, not inserted). The decrement sweep is O(budget) but each sweep
      * retires budget+1 units of count, so total sweep work is O(n) across
      * the stream.
      */
    def add(tok: UTF8String): Unit = {
      n += 1L
      counts.get(tok) match {
        case Some(c) => counts.update(tok, c + 1L)
        case None =>
          if (counts.size < budget) {
            // clone: the UTF8String points into a reused input row buffer
            counts.update(tok.clone(), 1L)
          } else {
            err += 1L
            val dead = mutable.ArrayBuffer.empty[UTF8String]
            counts.mapValuesInPlace { (k, c) =>
              if (c == 1L) dead += k
              c - 1L
            }
            dead.foreach(counts.remove)
          }
      }
    }

    /** Mergeable-summaries combine: sum counters; if over budget, subtract
      * the (budget+1)-th largest count from every counter and drop
      * non-positives — at most `budget` entries survive, and the subtracted
      * value adds to the undercount bound.
      */
    def mergeIn(o: Buffer): Unit = {
      n += o.n
      err += o.err
      o.counts.foreach { case (k, c) =>
        // keys from a deserialized buffer are already private copies
        counts.update(k, counts.getOrElse(k, 0L) + c)
      }
      if (counts.size > budget) {
        val vals = counts.values.toArray
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - budget - 1)
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        counts.mapValuesInPlace { (k, c) =>
          if (c <= cut) dead += k
          c - cut
        }
        dead.foreach(counts.remove)
        err += cut
      }
    }

    /** Items ordered (est desc, token asc) — deterministic rendering for a
      * given counter state.
      */
    def sortedItems: Array[(UTF8String, Long)] =
      counts.toArray.sortWith { case ((t1, e1), (t2, e2)) =>
        if (e1 != e2) e1 > e2 else t1.compareTo(t2) < 0
      }
  }
}
