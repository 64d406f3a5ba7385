package graft.dftly

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.TextStats

/** dftly expressions are stateless scalar transforms, so the whole engine
  * works unchanged under Structured Streaming (SURVEY.md §2.9). Proven here
  * with a MemoryStream → Dftly.select → memory-sink pipeline, plus a
  * windowed-aggregation composition over compiled expressions.
  */
class StreamingSpec extends SparkTestBase {

  import spark.implicits._

  test("Dftly.select applies to a stream; results match the batch run") {
    val input = MemoryStream[(Long, Double, Double)](spark)
    val yaml =
      """id: $_1
        |revenue: $_2 * (1 - $_3)
        |big: "YES if $_2 > 100 else NO"
        |""".stripMargin
    val streamed = Dftly.select(input.toDF(), yaml)
    val q = streamed.writeStream.format("memory").queryName("dftly_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, 50.0, 0.1), (2L, 200.0, 0.25))
      q.processAllAvailable()
      val got = spark.table("dftly_stream").orderBy("id").collect()
      assert(got.length == 2)
      assert(math.abs(got(0).getDouble(1) - 45.0) < 1e-9)
      assert(got(0).getString(2) == "NO")
      assert(math.abs(got(1).getDouble(1) - 150.0) < 1e-9)
      assert(got(1).getString(2) == "YES")
    } finally q.stop()
  }

  test("compiled expressions compose with watermark + windowed aggregation") {
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    val df = input.toDF().toDF("ts", "text")
    val enriched = df.select(
      col("ts"),
      TextStats.tokenCountWs(col("text")).as("n_tok"),
      Dftly.compile(Dftly.parse("$text[0:3]"), Some(df.schema)).as("prefix")
    )
    val agg = enriched
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"), col("prefix"))
      .agg(sum(col("n_tok")).as("toks"))
    val q = agg.writeStream.format("memory").queryName("dftly_windowed")
      .outputMode("update").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:05")
      val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:30")
      input.addData((t0, "abc def"), (t1, "abcdef ghi jkl"))
      q.processAllAvailable()
      val got = spark.table("dftly_windowed").collect()
      assert(got.map(_.getString(1)).toSet == Set("abc"))
      assert(got.map(_.getLong(2)).sum == 5) // 2 + 3 tokens, same window+prefix
    } finally q.stop()
  }

  test("sessionize: inactivity gap splits sessions, complete mode emits counts") {
    import graft.ops.StreamingOps
    val input = MemoryStream[(java.sql.Timestamp, Long)](spark)
    val df = input.toDF().toDF("ts", "user_id")
    val sessions = StreamingOps.sessionize(df, Seq("user_id"), "ts", "5 minutes", "1 minute")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      // user 1: two bursts separated by > 5 min; user 2: one event
      input.addData(
        (t("2026-01-01 00:00:00"), 1L), (t("2026-01-01 00:02:00"), 1L),
        (t("2026-01-01 00:20:00"), 1L),
        (t("2026-01-01 00:01:00"), 2L))
      q.processAllAvailable()
      // advance the watermark far past all session ends so they emit
      input.addData((t("2026-01-01 01:00:00"), 99L))
      q.processAllAvailable()
      input.addData((t("2026-01-01 02:00:00"), 99L))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .select($"user_id", $"n_events").as[(Long, Long)].collect().toSeq
        .filter(_._1 != 99L).sorted
      assert(got == Seq((1L, 2L), (1L, 1L), (2L, 1L)).sorted, got.toString)
    } finally q.stop()
  }

  test("decontamination + PII redaction run unchanged on a stream (map-side broadcast probe)") {
    import graft.ops.{Corpus, Decontam}
    val input = MemoryStream[(Long, String)](spark)
    val train = input.toDF().toDF("id", "text")
    val evalSet = Seq((1L, "the secret answer")).toDF("eid", "etext")
    val out = Decontam.markContaminatedMapSide(train, "text", evalSet, "etext", n = 2)
      .withColumn("clean", Corpus.redactPii(col("text")))
    val q = out.writeStream.format("memory").queryName("decontam_stream")
      .outputMode("append").start()
    try {
      input.addData(
        (10L, "this has the secret answer inside"),
        (11L, "mail me@x.org instead"))
      q.processAllAvailable()
      val got = spark.table("decontam_stream")
        .select($"id", $"contaminated", $"clean")
        .as[(Long, Boolean, String)].collect().sortBy(_._1)
      assert(got.toSeq == Seq(
        (10L, true, "this has the secret answer inside"),
        (11L, false, "mail <EMAIL> instead")))
    } finally q.stop()
  }

  test("simhashPairsWithinWatermark: near-dups inside the horizon pair up, outside they don't") {
    import graft.ops.StreamingOps
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val df = input.toDF().toDF("id", "ts", "text")
    val pairs = StreamingOps.simhashPairsWithinWatermark(
      df, "id", "text", "ts", "10 minutes")
    val q = pairs.writeStream.format("memory").queryName("sh_pairs")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val dup = "the quick brown fox jumps over the lazy dog again and again in the long morning"
    val other = "completely different content about spark shuffles and parquet footers and codegen"
    try {
      input.addData(
        (1L, t("2026-01-01 00:00:00"), dup),
        (2L, t("2026-01-01 00:05:00"), dup), // inside the horizon → pair
        (3L, t("2026-01-01 00:06:00"), other), // unrelated → no pair
        (4L, t("2026-01-01 02:00:00"), dup)) // same text but outside ±10 min
      q.processAllAvailable()
      val got = spark.table("sh_pairs")
        .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect()
      assert(got.nonEmpty, "identical texts within the horizon must pair")
      // (1,2) is the ONLY pair — possibly multiple times (once per shared
      // chunk, per the documented contract); never 3 (unrelated) or 4
      // (outside the event-time bound, even though the text is identical)
      assert(got.forall(p => p._1 == 1L && p._2 == 2L && p._3 == 0), got.mkString(","))
    } finally q.stop()
  }

  test("simhashPairsWithinWatermark matches the batch operator on in-horizon data") {
    import graft.ops.{Dedup, StreamingOps}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(80)
    val batchPairs = Dedup.simhashNearDuplicatePairs(
      docs, "doc_id", "text", maxHamming = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val stream = StreamingOps.simhashPairsWithinWatermark(
      input.toDF().toDF("id", "ts", "text"), "id", "text", "ts", "1 hour",
      maxHamming = 3)
    val q = stream.writeStream.format("memory").queryName("sh_parity")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      input.addData(docs.as[(Long, String)].collect()
        .map { case (id, t) => (id, t0, t) }.toSeq: _*)
      q.processAllAvailable()
      // distinct: the stream emits once per shared chunk by contract
      val streamPairs = spark.table("sh_parity")
        .select($"id_a", $"id_b").distinct().as[(Long, Long)].collect().toSet
      assert(streamPairs == batchPairs,
        s"stream/batch divergence: only-stream=${streamPairs -- batchPairs}, " +
          s"only-batch=${batchPairs -- streamPairs}")
    } finally q.stop()
  }

  test("hammingPairsWithinWatermark: streaming image near-dup over pHash signatures") {
    import graft.ops.{Multimodal, PHash, StreamingOps}
    // precompute pHashes of real PNGs (the map-side step a streaming media
    // pipeline runs before the engine), feed (id, ts, sig) to the generic
    // engine: identical pixels inside the horizon MUST pair at hamming 0;
    // outside the horizon must not, undecodable (null sig) never
    val dec = graft.ops.JdkMediaDecoder()
    def ph(text: String): Option[Long] = {
      val (w, h, _, l) = dec.decodeImage(graft.SparkEntry.renderTestPng(text, 48, 32))
      PHash.phash64(w, h, l)
    }
    val input = MemoryStream[(Long, java.sql.Timestamp, Option[Long])](spark)
    val pairs = StreamingOps.hammingPairsWithinWatermark(
      input.toDF().toDF("id", "ts", "sig"), "id", "sig", "ts", "10 minutes",
      maxHamming = 10)
    val q = pairs.writeStream.format("memory").queryName("ph_pairs")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      input.addData(
        (1L, t("2026-01-01 00:00:00"), ph("same picture")),
        (2L, t("2026-01-01 00:04:00"), ph("same picture")),   // in horizon
        (3L, t("2026-01-01 00:05:00"), ph("другое изображение")), // unrelated
        (4L, t("2026-01-01 03:00:00"), ph("same picture")),   // outside
        (5L, t("2026-01-01 00:06:00"), None))                 // undecodable
      q.processAllAvailable()
      val got = spark.table("ph_pairs")
        .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect()
      assert(got.nonEmpty, "identical images within the horizon must pair")
      assert(got.forall(p => p._1 == 1L && p._2 == 2L && p._3 == 0), got.mkString(","))
    } finally q.stop()
  }

  test("minhashPairsWithinWatermark is seed-compatible with batch MinHash-LSH on in-horizon data") {
    import graft.ops.{Dedup, StreamingOps}
    // real documents + planted near-dups (drop the last 2 words) so the
    // threshold has pairs to find; all timestamps in one horizon → the
    // stream must find EXACTLY the batch pair set (same gram hashing, same
    // affine minhash coefficients, same band cuts; verify is the same
    // exact-Jaccard kernel on both sides, so values agree too)
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(50)
    val docs = base.unionByName(base.limit(10).select(
      ($"doc_id" + 100000L).as("doc_id"),
      concat_ws(" ", slice(split($"text", "\\s+"), lit(1),
        greatest(size(split($"text", "\\s+")) - 2, lit(1)))).as("text")))
    val batchPairs = Dedup.nearDuplicatePairs(
      docs, "doc_id", "text", threshold = 0.5)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(batchPairs.nonEmpty, "planted near-dups must pair in batch")
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val stream = StreamingOps.minhashPairsWithinWatermark(
      input.toDF().toDF("id", "ts", "text"), "id", "text", "ts", "1 hour",
      threshold = 0.5)
    val q = stream.writeStream.format("memory").queryName("mh_parity")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      input.addData(docs.as[(Long, String)].collect()
        .map { case (id, t) => (id, t0, t) }.toSeq: _*)
      q.processAllAvailable()
      // distinct: the stream emits once per shared band by contract
      val streamPairs = spark.table("mh_parity")
        .select($"id_a", $"id_b", $"jaccard").distinct()
        .as[(Long, Long, Double)].collect()
        .map(p => (p._1, p._2) -> p._3).toMap
      assert(streamPairs == batchPairs,
        s"stream/batch divergence: only-stream=${streamPairs.keySet -- batchPairs.keySet}, " +
          s"only-batch=${batchPairs.keySet -- streamPairs.keySet}")
    } finally q.stop()
  }

  test("minhashPairsWithinWatermark: near-dup text inside the horizon pairs, late identical text doesn't") {
    import graft.ops.StreamingOps
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val pairs = StreamingOps.minhashPairsWithinWatermark(
      input.toDF().toDF("id", "ts", "text"), "id", "text", "ts", "10 minutes",
      threshold = 0.5)
    val q = pairs.writeStream.format("memory").queryName("mh_pairs")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val doc = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different content about spark catalyst plans and shuffles"
    try {
      input.addData(
        (1L, t("2026-01-01 00:00:00"), doc),
        (2L, t("2026-01-01 00:05:00"), near),  // inside horizon → pair
        (3L, t("2026-01-01 00:06:00"), other), // dissimilar → no pair
        (4L, t("2026-01-01 02:00:00"), doc))   // identical but outside ±10 min
      q.processAllAvailable()
      val got = spark.table("mh_pairs")
        .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect()
      assert(got.nonEmpty, "near-dup text within the horizon must pair")
      assert(got.forall(p => p._1 == 1L && p._2 == 2L && p._3 >= 0.5), got.mkString(","))
    } finally q.stop()
  }

  test("cosinePairsWithinWatermark is seed-compatible with batch LSH: same pairs on in-horizon data") {
    import graft.ops.{Similarity, StreamingOps}
    // real embeddings, all timestamps inside one horizon → the stream must
    // find EXACTLY the batch operator's pair set (same hyperplane seeds,
    // same planes/tables, no bucket-size cap on either side at this scale)
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding").limit(60)
    val batchPairs = Similarity.cosineNearDuplicatePairs(
      embs, "vec_id", "embedding", threshold = 0.8, dim = 64,
      planesPerTable = 6, numTables = 4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val input = MemoryStream[(Long, java.sql.Timestamp, Array[Float])](spark)
    val stream = StreamingOps.cosinePairsWithinWatermark(
      input.toDF().toDF("id", "ts", "vec"), "id", "vec", "ts", "1 hour",
      threshold = 0.8, dim = 64, planesPerTable = 6, numTables = 4)
    val q = stream.writeStream.format("memory").queryName("cos_parity")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      input.addData(embs.as[(Long, Array[Float])].collect()
        .map { case (id, v) => (id, t0, v) }.toSeq: _*)
      q.processAllAvailable()
      val streamPairs = spark.table("cos_parity")
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(streamPairs == batchPairs,
        s"stream/batch divergence: only-stream=${streamPairs -- batchPairs}, " +
          s"only-batch=${batchPairs -- streamPairs}")
    } finally q.stop()
  }

  test("cosinePairsWithinWatermark: near-identical vectors inside the horizon pair, orthogonal/late ones don't") {
    import graft.ops.StreamingOps
    val input = MemoryStream[(Long, java.sql.Timestamp, Array[Float])](spark)
    val df = input.toDF().toDF("id", "ts", "vec")
    val pairs = StreamingOps.cosinePairsWithinWatermark(
      df, "id", "vec", "ts", "10 minutes",
      threshold = 0.95, dim = 8, planesPerTable = 8, numTables = 4)
    val q = pairs.writeStream.format("memory").queryName("cos_pairs")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val base = Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)
    val near = base.map(_ * 1.001f) // cosine ~1
    val ortho = Array(8f, -7f, 6f, -5f, 4f, -3f, 2f, -1f)
    try {
      input.addData(
        (1L, t("2026-01-01 00:00:00"), base),
        (2L, t("2026-01-01 00:05:00"), near),  // inside horizon → pair
        (3L, t("2026-01-01 00:06:00"), ortho), // dissimilar → no pair
        (4L, t("2026-01-01 02:00:00"), base))  // identical but outside ±10 min
      q.processAllAvailable()
      val got = spark.table("cos_pairs")
        .select($"id_a", $"id_b", $"cosine").as[(Long, Long, Double)].collect()
      assert(got.nonEmpty, "near-identical vectors within the horizon must pair")
      // (1,2) is the ONLY pair — possibly multiple times (once per shared
      // table, per the documented contract)
      assert(got.forall(p => p._1 == 1L && p._2 == 2L && p._3 >= 0.95), got.mkString(","))
    } finally q.stop()
  }

  test("sessionize works identically on a batch frame") {
    import graft.ops.StreamingOps
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (t("2026-01-01 00:00:00"), 1L), (t("2026-01-01 00:02:00"), 1L),
      (t("2026-01-01 00:20:00"), 1L), (t("2026-01-01 00:01:00"), 2L)
    ).toDF("ts", "user_id")
    val got = StreamingOps.sessionize(df, Seq("user_id"), "ts", "5 minutes", "1 minute")
      .select($"user_id", $"n_events", $"session_start")
      .as[(Long, Long, java.sql.Timestamp)].collect().toSeq.sortBy(r => (r._1, r._3.getTime))
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
  }

}
