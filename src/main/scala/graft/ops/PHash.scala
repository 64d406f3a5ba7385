package graft.ops

/** 64-bit perceptual image hash (DCT pHash) — the content-based near-dup
  * key for images: the same photo re-encoded (JPEG quality change, PNG ↔
  * JPEG) or mildly resized keeps a nearby hash, while byte-level hashing
  * sees a different file entirely.
  *
  * Algorithm (public literature / the pHash + imagehash convention):
  *   1. luma plane, area-averaged down to 32 × 32 (box filter — each
  *      source pixel contributes to exactly one cell, streaming, O(1)
  *      memory beyond the 32×32 accumulators);
  *   2. 2-D DCT-II (separable, precomputed 32×32 cosine table);
  *   3. keep the top-left 8 × 8 low-frequency block;
  *   4. bit k = coefficient k > median of the 64 (median = mean of the two
  *      middle order statistics, the numpy convention).
  * Hamming distance between hashes ≈ perceptual distance; ≤ 10 of 64 bits
  * is the customary near-dup band.
  *
  * Pure double-precision math with a fixed summation order — bit-stable
  * across JVMs and partitionings, so planted-duplicate gates can assert
  * exact equality. The reference has no media surface at all
  * (parser.py:326-344); this is beyond-reference, motivated by multimodal
  * corpus dedup.
  */
object PHash {

  private val N = 32

  /** cos((2x+1) u π / 2N) for the separable DCT-II. */
  private val cosTable: Array[Array[Double]] = Array.tabulate(N, N) { (u, x) =>
    math.cos((2 * x + 1) * u * math.Pi / (2.0 * N))
  }

  /** Hash a decoded luma stream (row-major, `w*h` values in [0, 255]).
    * Returns None for degenerate images (zero pixels — the corrupt-payload
    * decode contract), which must stay OUT of Hamming banding.
    */
  def phash64(w: Int, h: Int, lumas: Iterator[Int]): Option[Long] = {
    if (w <= 0 || h <= 0) return None
    // 1. area-average to 32x32: target cell of pixel (x, y) is
    // (x*N/w, y*N/h) — every pixel lands in exactly one cell
    val sums = new Array[Double](N * N)
    val cnts = new Array[Int](N * N)
    var i = 0L
    // Long: a gigapixel stream from a production decoder overflows Int
    // w*h, which would skip both loops and hash every oversized image to
    // the same Some(0L) — the zero-sentinel clustering nulls exist to
    // prevent
    val total = w.toLong * h
    while (i < total && lumas.hasNext) {
      val l = lumas.next()
      val x = i % w
      val y = i / w
      val cell = (y.toLong * N / h).toInt * N + (x.toLong * N / w).toInt
      sums(cell) += l
      cnts(cell) += 1
      i += 1
    }
    if (i < total) return None // truncated stream: treat as undecodable
    val img = new Array[Double](N * N)
    var c = 0
    while (c < N * N) {
      // w,h >= 1 means every cell gets >= 0 pixels; empty cells (possible
      // only when w or h < N) inherit 0.0 — deterministic either way
      img(c) = if (cnts(c) == 0) 0.0 else sums(c) / cnts(c)
      c += 1
    }
    // 2. separable DCT-II: rows, then columns (normalization constants
    // cancel in the median comparison, so plain cosine sums suffice)
    val rows = new Array[Double](N * N)
    var y = 0
    while (y < N) {
      var u = 0
      while (u < N) {
        var acc = 0.0
        var x = 0
        while (x < N) { acc += img(y * N + x) * cosTable(u)(x); x += 1 }
        rows(y * N + u) = acc
        u += 1
      }
      y += 1
    }
    val dct = new Array[Double](8 * 8) // only the low 8x8 block is needed
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var yy = 0
        while (yy < N) { acc += rows(yy * N + u) * cosTable(v)(yy); yy += 1 }
        dct(v * 8 + u) = acc
        u += 1
      }
      v += 1
    }
    // 3-4. median threshold over the 64 low-frequency coefficients
    val sorted = dct.clone()
    java.util.Arrays.sort(sorted)
    val med = (sorted(31) + sorted(32)) / 2.0
    var bits = 0L
    var k = 0
    while (k < 64) {
      if (dct(k) > med) bits |= (1L << k)
      k += 1
    }
    Some(bits)
  }

  /** Hamming distance between two hashes. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
