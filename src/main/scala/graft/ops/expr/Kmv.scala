package graft.ops.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a mergeable Spark
  * aggregate (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07 for the
  * unbiased (k−1)/v_k estimator).
  *
  * Why this over HyperLogLog (`approx_count_distinct`): the KMV state is a
  * pure function of the DATA — the k smallest distinct values of a
  * cryptographic hash — so the estimate is bit-reproducible across runs,
  * partitionings, cluster sizes, AND engines. The hash is the same
  * md5-prefix rank [[graft.ops.Sampling]] uses (first 13 hex digits =
  * 52 bits of `md5(seed ":" value)`), which any SQL engine can replay
  * verbatim — the correctness gate hash-compares the estimate itself, not
  * a tolerance band. HLL estimates depend on the library's bucketing and
  * bias-correction tables and can only ever be range-checked.
  *
  * Scale shape: per-partition state is a bounded heap of ≤ k longs
  * (k = 256 → 2 KB), merge is union-keep-smallest — a global
  * distinct-count plans as one partial aggregate per partition plus one
  * tiny final merge, with NO per-distinct-value exchange (an exact
  * `count(distinct x)` shuffles every distinct value; at 100 TB the
  * exchange is the job). Below k distinct values the sketch IS exact and
  * says so (`exact = true`); above, the relative error concentrates at
  * ~1/√(k−2) (4–6% at k=256).
  *
  * The reference has no aggregate surface at all (dftly compiles row-level
  * expressions; parser.py:326-344) — this is beyond-reference, motivated
  * by corpus profiling (distinct URLs / tokens / shingles per slice)
  * where exact distinct counts are the dominant shuffle.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    seed: Long = 42L,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buffer]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_distinct k must be >= 2, got $k")

  import KmvSketch.Buffer

  // update() hashes UTF8String bytes; anything else must be cast by the
  // caller (Corpus.approxDistinct does; the SQL registration wraps in a
  // Cast) — fail at analysis, not with an executor ClassCastException.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct requires a string input (the md5-rank is over UTF-8 " +
        s"bytes); got ${other.catalogString} — cast the column to string")
  }

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(b: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) b.add(KmvSketch.rank(seed, v.asInstanceOf[UTF8String]))
    b
  }

  override def merge(b: Buffer, o: Buffer): Buffer = { b.mergeIn(o); b }

  /** `struct(estimate, exact, sketch_size)`: the distinct-count estimate
    * ((k−1)/v_k normalized, or the exact size when fewer than k distinct
    * ranks were seen), whether the exact regime applied, and the retained
    * rank count.
    */
  override def eval(b: Buffer): Any = {
    val n = b.size
    if (n < k) InternalRow(n.toDouble, true, n)
    else InternalRow((k - 1).toDouble / (b.kthSmallest.toDouble / KmvSketch.RankSpace), false, n)
  }

  private lazy val resultType: StructType = new StructType()
    .add("estimate", DoubleType, nullable = false)
    .add("exact", BooleanType, nullable = false)
    .add("sketch_size", IntegerType, nullable = false)

  private lazy val bufferSchema: StructType = new StructType()
    .add("ranks", ArrayType(LongType, containsNull = false), nullable = false)

  private lazy val serializer = UnsafeProjection.create(bufferSchema)

  override def serialize(b: Buffer): Array[Byte] =
    serializer(InternalRow(new GenericArrayData(b.sortedRanks))).getBytes

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val b = new Buffer(k)
    val arr = row.getArray(0)
    var i = 0
    while (i < arr.numElements()) { b.add(arr.getLong(i)); i += 1 }
    b
  }

  override def dataType: DataType = resultType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {

  /** 16^13 = 2^52 — the rank space ([[graft.ops.Sampling.RankHexDigits]]). */
  val RankSpace: Double = 4503599627370496.0

  /** 52-bit rank: the first 13 hex digits of `md5(seed ":" value)` as a
    * long. Identical to parsing `substring(md5(...), 1, 13)` base-16 —
    * the form every SQL engine can replay.
    */
  def rank(seed: Long, value: UTF8String): Long = {
    val md = MessageDigest.getInstance("MD5")
    md.update(String.valueOf(seed).getBytes("UTF-8"))
    md.update(':'.toByte)
    md.update(value.getBytes)
    val d = md.digest()
    // first 13 nibbles big-endian: 6 full bytes + the high nibble of byte 6
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(6) & 0xf0L) >> 4)
  }

  /** Bounded max-heap of the k smallest DISTINCT ranks. */
  final class Buffer(k: Int) {
    private val heap = new java.util.PriorityQueue[java.lang.Long](
      k, java.util.Collections.reverseOrder[java.lang.Long]())
    private val seen = new java.util.HashSet[java.lang.Long]()

    def add(r: Long): Unit = {
      val boxed = java.lang.Long.valueOf(r)
      if (!seen.contains(boxed)) {
        if (heap.size < k) { heap.add(boxed); seen.add(boxed) }
        else if (r < heap.peek()) {
          seen.remove(heap.poll())
          heap.add(boxed); seen.add(boxed)
        }
      }
    }

    def mergeIn(o: Buffer): Unit = {
      val it = o.heap.iterator()
      while (it.hasNext) add(it.next())
    }

    def size: Int = heap.size
    /** Largest retained rank — the k-th smallest overall once full. */
    def kthSmallest: Long = heap.peek()
    def sortedRanks: Array[Long] = {
      val a = new Array[Long](heap.size)
      val it = heap.iterator()
      var i = 0
      while (it.hasNext) { a(i) = it.next(); i += 1 }
      java.util.Arrays.sort(a)
      a
    }
  }
}
