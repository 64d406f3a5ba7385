package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.expr.PqExprs

/** Product quantization for embedding columns — the vector-compression leg
  * of the ANN family (Jégou et al., TPAMI 2011; the layout FAISS calls
  * IVFADC). [[Similarity]] owns the IVF cell structure; this module owns
  * the in-cell representation: a d-dim float vector becomes `m` one-byte
  * sub-centroid codes (32× smaller at d=64, m=8), queries scan codes with
  * per-subspace lookup tables (ADC — no per-row distance arithmetic at
  * all), and the small survivor set is re-scored EXACTLY from the float
  * column, so approximation affects candidate selection only, never
  * reported scores.
  *
  * Why this matters at 100 TB: the search-side cost of IVF rides on the
  * bytes scanned per probed cell. Full float vectors make that 4·d
  * bytes/row; PQ codes make it m bytes/row — the difference between an
  * exchange/scan bound by the embedding table and one bound by ~3% of it.
  * Training reads a bounded deterministic sample (distribution, not size,
  * determines codebook quality — same argument as
  * [[Similarity.trainCentroidsSampled]]).
  */
object Pq {

  /** Flattened codebook: `m` subspaces × `ksub` centroids × `subDim` dims,
    * `flat[(j*ksub + c)*subDim + d]`.
    */
  final case class Codebook(m: Int, ksub: Int, subDim: Int, flat: Array[Double]) {
    require(flat.length == m * ksub * subDim, "codebook shape mismatch")
    def dim: Int = m * subDim
  }

  /** Train per-subspace codebooks by local k-means (k-means++ init + Lloyd)
    * over a deterministic sample: the `sampleTarget` rows with the smallest
    * `xxhash64(vec, seed)` — stable across runs AND partitionings, so the
    * codebook (and everything downstream) is a pure function of the data.
    * One corpus scan for the sample; training is driver-local on
    * `sampleTarget × dim` doubles (bounded, ~10 MB at 20k × 64).
    */
  def train(
      df: DataFrame,
      vecCol: String,
      m: Int,
      ksub: Int = 256,
      iters: Int = 10,
      sampleTarget: Int = 20000,
      seed: Long = 42L): Codebook = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample = df
      .select(col(vecCol).as("v"))
      .where(col("v").isNotNull)
      .withColumn("__h", xxhash64(col("v"), lit(seed)))
      .orderBy("__h")
      .limit(sampleTarget)
      .select("v").as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    require(sample.nonEmpty, "pq train: no vectors")
    val dim = sample.head.length
    require(dim % m == 0, s"pq train: dim $dim not divisible by m=$m")
    val subDim = dim / m
    // per-subspace k: never more centroids than distinct-possible sample rows
    val k = math.min(ksub, sample.length)
    val flat = new Array[Double](m * ksub * subDim)
    var j = 0
    while (j < m) {
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))
      val cents = localKmeans(sub, k, iters, seed + j)
      var c = 0
      while (c < k) {
        System.arraycopy(cents(c), 0, flat, (j * ksub + c) * subDim, subDim)
        c += 1
      }
      // unused centroid slots (k < ksub on tiny corpora) stay at the fold of
      // the first centroid so they can never win an argmin spuriously: copy
      // centroid 0 — ties resolve to the smaller id in the encode kernel
      while (c < ksub) {
        System.arraycopy(flat, (j * ksub) * subDim, flat, (j * ksub + c) * subDim, subDim)
        c += 1
      }
      j += 1
    }
    Codebook(m, ksub, subDim, flat)
  }

  /** Driver-local Lloyd with k-means++ seeding; empty cells re-seed to the
    * point farthest from its assigned centroid (standard repair), keeping
    * the codebook deterministic.
    */
  private def localKmeans(
      pts: Array[Array[Double]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    val dim = pts.head.length
    var cents = Similarity.kmeansPlusPlusInit(pts, k, seed)
    val assign = new Array[Int](pts.length)
    var it = 0
    while (it < iters) {
      // assignment
      var i = 0
      while (i < pts.length) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var j = 0
          val p = pts(i)
          val ct = cents(c)
          while (j < dim) { val t = p(j) - ct(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      // update
      val sums = Array.fill(k)(new Array[Double](dim))
      val cnts = new Array[Int](k)
      i = 0
      while (i < pts.length) {
        val c = assign(i)
        cnts(c) += 1
        val s = sums(c)
        val p = pts(i)
        var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
        i += 1
      }
      val next = new Array[Array[Double]](k)
      var c = 0
      while (c < k) {
        if (cnts(c) > 0) {
          val s = sums(c)
          val ct = new Array[Double](dim)
          var j = 0
          while (j < dim) { ct(j) = s(j) / cnts(c); j += 1 }
          next(c) = ct
        } else {
          // empty cell: re-seed deterministically to the worst-fit point
          var worst = 0
          var worstD = -1.0
          var i2 = 0
          while (i2 < pts.length) {
            val p = pts(i2)
            val ct = cents(assign(i2))
            var d = 0.0
            var j = 0
            while (j < dim) { val t = p(j) - ct(j); d += t * t; j += 1 }
            if (d > worstD) { worstD = d; worst = i2 }
            i2 += 1
          }
          next(c) = pts(worst).clone()
        }
        c += 1
      }
      cents = next
      it += 1
    }
    cents
  }

  /** PQ codes column: `array<byte>` of length `m`. Codegen'd per-row kernel;
    * encode once, store next to the id, and search over codes.
    */
  def encode(vec: Column, cb: Codebook): Column =
    PqExprs.pqEncode(vec, cb.flat, cb.m, cb.ksub)

  /** ADC cosine estimate column for a fixed query against a codes column. */
  def adcCosine(codes: Column, cb: Codebook, query: Seq[Float]): Column = {
    val (ipLut, sqLut, qNorm) = luts(cb, query)
    PqExprs.pqAdcCosine(codes, ipLut, sqLut, qNorm, cb.ksub)
  }

  /** Query lookup tables: `ipLut[j*ksub+c] = <q_j, centroid_{j,c}>`,
    * `sqLut[j*ksub+c] = |centroid_{j,c}|²` — subspaces are disjoint
    * coordinate blocks, so reconstructed dot and norm decompose exactly.
    */
  private[ops] def luts(cb: Codebook, query: Seq[Float]): (Array[Double], Array[Double], Double) = {
    require(query.length == cb.dim,
      s"pq query has ${query.length} dims, codebook expects ${cb.dim}")
    val q = query.map(_.toDouble).toArray
    val ip = new Array[Double](cb.m * cb.ksub)
    val sq = new Array[Double](cb.m * cb.ksub)
    var j = 0
    while (j < cb.m) {
      var c = 0
      while (c < cb.ksub) {
        val off = (j * cb.ksub + c) * cb.subDim
        var dot = 0.0
        var nn = 0.0
        var d = 0
        while (d < cb.subDim) {
          val cv = cb.flat(off + d)
          dot += q(j * cb.subDim + d) * cv
          nn += cv * cv
          d += 1
        }
        ip(j * cb.ksub + c) = dot
        sq(j * cb.ksub + c) = nn
        c += 1
      }
      j += 1
    }
    (ip, sq, math.sqrt(q.map(x => x * x).sum))
  }

  /** IVFADC top-k: probe the query's `nProbe` IVF cells, rank candidates by
    * ADC over the m-byte codes, exact-rescore the best `k·refine` from the
    * float column, return the exact-cosine top-k of those. With
    * `nProbe ≥ cells` and `refine` covering every candidate this is
    * EXACTLY [[Similarity.bruteForceTopK]] (the re-score is exact and
    * nothing is pruned) — the correctness gate q60 pins that; recall at
    * pruning settings is measured in RECALL.json.
    *
    * Scale shape: the scan ranks codes (m bytes/row, map-only, codegen'd),
    * `TakeOrdered` keeps k·refine rows, and only those join back to the
    * float table — the full-precision column is touched for a constant
    * number of rows.
    */
  def ivfTopKPqAdc(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      cb: Codebook,
      query: Seq[Float],
      k: Int,
      nProbe: Int = 2,
      refine: Int = 8): DataFrame = {
    val qArr = query.map(_.toDouble).toArray
    val probeCells = centroids.zipWithIndex
      .map { case (c, i) =>
        (i, c.zip(qArr).map { case (x, y) => (x - y) * (x - y) }.sum)
      }
      .sortBy(_._2)
      .take(math.min(nProbe, centroids.length))
      .map(_._1)
    val nRefine = math.min(k.toLong * refine, Int.MaxValue.toLong).toInt
    val coded = df.select(
      col(idCol).as("__pq_id"),
      Similarity.nearestCentroid(col(vecCol), centroids).as("__cell"),
      encode(col(vecCol), cb).as("__codes"))
    val cands = coded
      .filter(col("__cell").isin(probeCells.toIndexedSeq: _*))
      .select(col("__pq_id"),
        adcCosine(col("__codes"), cb, query).as("__adc"))
      .orderBy(col("__adc").desc, col("__pq_id"))
      .limit(nRefine)
    cands
      .join(df.select(col(idCol).as("__pq_id"), col(vecCol).as("__v")), "__pq_id")
      .select(col("__pq_id").as(idCol),
        Similarity.cosine(col("__v"), lit(query.toArray)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
