package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** Round-9 additions: the streaming e2e gate query (q56) against a batch
  * replay computed in-Spark — the DuckDB oracle covers the same ground in
  * Verify; this pins it in the suite where a refactor of StreamingOps or
  * Readers breaks fast.
  */
class Round9Spec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q56: streaming jsonl → dedup → sessionize equals the batch replay") {
    val streamed = graft.SparkEntry.queries("q56_stream_e2e")(spark, dir)

    // batch replay: distinct events, session_window aggregation (the same
    // operator sessionize uses — on a batch frame it needs no watermark)
    val ev = graft.sources.Readers.readEvents(spark, dir)
      .select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("user_id"))
      .distinct()
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val batch = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_event"), max(col("ts")).as("last_event"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"),
        unix_micros(col("first_event")).as("first_us"),
        unix_micros(col("last_event")).as("last_us"))

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("int8 quantization: payload layout, cosine accuracy, zero vector") {
    import graft.ops.expr.QuantKernels
    import org.apache.spark.sql.catalyst.util.ArrayData
    def q(v: Array[Double]): Array[Byte] =
      QuantKernels.quantize(ArrayData.toArrayData(v), isFloat = false)
    def exact(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val rnd = new scala.util.Random(7)
    val dims = 64
    for (_ <- 0 until 200) {
      val a = Array.fill(dims)(rnd.nextGaussian())
      val b0 = Array.fill(dims)(rnd.nextGaussian())
      // mix in a near-duplicate sometimes so the high-cosine regime is hit
      val b = if (rnd.nextBoolean()) a.zip(b0).map { case (x, y) => x + 0.1 * y }
              else b0
      val err = math.abs(QuantKernels.cosineQ(q(a), q(b)) - exact(a, b))
      assert(err < 0.04, s"quantized cosine off by $err")
    }
    // payload: 4-byte scale header + one byte per dim
    assert(q(Array.fill(dims)(1.0)).length == 4 + dims)
    // zero vector: scale 0, cosine 0 against anything
    assert(QuantKernels.cosineQ(q(Array.fill(dims)(0.0)),
      q(Array.fill(dims)(1.0))) == 0.0)
    // identical vectors: exactly 1.0 (codes equal)
    val v = Array.fill(dims)(rnd.nextGaussian())
    assert(QuantKernels.cosineQ(q(v), q(v)) == 1.0)
  }

  test("bucket-pair generator: string ids orient correctly; boundary-exact pair kept") {
    import spark.implicits._
    // J("a b c d", "a b c x") with 2-shingles: grams {ab,bc,cd} vs
    // {ab,bc,cx} → inter 2, union 4, J = 0.5 — boundary-exact at t = 0.5
    // (the epsilon-guarded prunes must keep it)
    val docs = Seq(
      ("zzz", "a b c d"), ("aaa", "a b c x"), ("mmm", "totally different text here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5,
      shingleN = 2)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    assert(pairs == Set(("aaa", "zzz"))) // oriented by id ORDER, not input order
    // string-gram verification path (hashGrams = false) through the same
    // generator
    val pairsStr = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5,
      shingleN = 2, hashGrams = false)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    assert(pairsStr == Set(("aaa", "zzz")))
  }

  test("quantized IVF pairs == exact IVF pairs on the test embeddings") {
    val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .filter(aggregate(col("embedding"), lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double")) > 0)
    val cents = Similarity.trainCentroids(e0, "embedding", k = 4, iters = 3)
    val exactP = Similarity.cosineNearDuplicatePairsIvf(
      e0, "vec_id", "embedding", threshold = 0.30, centroids = cents,
      nProbe = 2, maxBucketSize = Int.MaxValue)
      .select(col("id_a"), col("id_b"))
    val quantP = Similarity.cosineNearDuplicatePairsIvfQuantized(
      e0, "vec_id", "embedding", threshold = 0.30, centroids = cents,
      nProbe = 2, maxBucketSize = Int.MaxValue)
      .select(col("id_a"), col("id_b"))
    assert(exactP.count() > 0)
    // quantized ⊆ exact by construction (same candidates modulo the
    // margin, exact re-score final); equality = margin covered the error
    assert(quantP.exceptAll(exactP).count() == 0)
    assert(exactP.exceptAll(quantP).count() == 0)
  }
}
