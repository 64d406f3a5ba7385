package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase
import graft.ops.expr.NativeSig

class NativeSigSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("native minhash == HOF minhash on real documents") {
    val staged = docs
      .select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
      .select($"doc_id", Dedup.shingleHashes($"sh").as("hs"), $"sh")
      .select(
        $"doc_id",
        Dedup.minhashSignature($"hs", 16).as("hof"),
        NativeSig.minhashSignature($"sh", 16).as("native")
      )
    val bad = staged.filter(!($"hof" === $"native")).count()
    assert(bad == 0)
  }

  test("minhash over hash_sorted_distinct longs == minhash over the strings") {
    // the hashed grams ARE XXH64(token, Seed) — the exact value the string
    // kernel computes per token before masking — so the two paths must be
    // BIT-identical (this is what lets nearDuplicatePairs hash grams once
    // and reuse the array for both signature and verify)
    val staged = docs
      .select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
      .select(
        $"doc_id",
        NativeSig.minhashSignature($"sh", 32).as("fromStrings"),
        NativeSig.minhashSignature(
          NativeSig.hashSortedDistinct($"sh"), 32).as("fromLongs"))
    assert(staged.filter(!($"fromStrings" === $"fromLongs")).count() == 0)
  }

  test("native minhash stays inside whole-stage codegen") {
    val q = docs
      .select(Dedup.shingles($"text", 3).as("sh"))
      .select(NativeSig.minhashSignature($"sh", 64).as("sig"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected codegen:\n$plan")
    assert(q.count() == docs.count())
  }

  test("simhash: identical tokens → identical sig; one word changed → small hamming") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog again and again today"),
      ("b", "the quick brown fox jumps over the lazy dog again and again today"),
      ("c", "the quick brown fox jumps over the lazy dog again and again tonight"),
      ("d", "completely different words about spark query engines and columnar io")
    ).toDF("id", "text")
      .select($"id", NativeSig.simhash64(split($"text", "\\s+")).as("sig"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(m("a"), m("c")) < 20)
    assert(hamming(m("a"), m("c")) > 0)
    assert(hamming(m("a"), m("d")) > hamming(m("a"), m("c")))
  }

  test("simhash near-dup pipeline finds planted duplicates, none spurious") {
    val base = docs.limit(100).select($"doc_id", $"text")
    // mutate one word in the middle — hamming stays small
    val mutated = docs.limit(8).select(
      ($"doc_id" + 100000L).as("doc_id"),
      regexp_replace($"text", "^(\\S+ \\S+ \\S+) \\S+", "$1 zzzz").as("text"))
    val all = base.union(mutated).cache()
    try {
      val pairs = Dedup.simhashNearDuplicatePairs(all, "doc_id", "text", maxHamming = 12)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val planted = (0 until 8).map(i => (i.toLong, i + 100000L)).toSet
      assert(planted.subsetOf(pairs), s"missed: ${planted -- pairs}")
      // verify every reported pair really is within the hamming budget
      val sigs = all.select($"doc_id",
        NativeSig.simhash64(split($"text", "\\s+")).as("sig"))
        .as[(Long, Long)].collect().toMap
      pairs.foreach { case (x, y) =>
        assert(java.lang.Long.bitCount(sigs(x) ^ sigs(y)) <= 12)
      }
    } finally all.unpersist()
  }

  test("SQL registration: functions usable from spark.sql") {
    NativeSig.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs_sql")
    val r = spark.sql(
      """SELECT simhash64(split(text, '\\s+')) AS sh,
        |       minhash_signature(split(text, '\\s+'), 8) AS mh
        |FROM docs_sql LIMIT 3""".stripMargin).collect()
    assert(r.length == 3)
    assert(r.forall(row => row.getSeq[Long](1).length == 8))
  }

  test("type check rejects non-array input") {
    val df = Seq("abc").toDF("s")
    val e = intercept[Exception](df.select(NativeSig.simhash64($"s")).collect())
    assert(e.getMessage.contains("simhash64") || e.getMessage.toLowerCase.contains("type"))
  }

  test("native minhash of an empty token array is null, like the HOF guard") {
    val df = Seq(Seq.empty[String], Seq("a", "b")).toDF("toks")
    val out = df.select(NativeSig.minhashSignature($"toks", 8).as("sig"))
      .select($"sig".isNull).as[Boolean].collect().toSeq
    assert(out == Seq(true, false))
    // two empty docs must NOT band-match on sentinel signatures downstream
    val docs = Seq((1L, ""), (2L, ""), (3L, "real text here to shingle on"))
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDuplicatePairs(docs, "doc_id", "text", threshold = 0.1)
    assert(pairs.filter($"id_a" === 1L && $"id_b" === 2L).count() == 0)
  }


  test("native signbit signature == HOF formulation on real embeddings") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planes = Similarity.hyperplanes(12, 64, seed = 7L)
    val both = embs.select(
      NativeSig.signBitSignature($"embedding", planes).as("native"),
      Similarity.hofSignBitSignature($"embedding", planes).as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
    // signatures actually vary across rows (not a constant)
    assert(both.select("native").distinct().count() > 1)
  }

  test("native signbit stays inside whole-stage codegen") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planes = Similarity.hyperplanes(24, 64)
    val q = embs.select(NativeSig.signBitSignature($"embedding", planes).as("sig"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected codegen:\n$plan")
    assert(q.count() == embs.count())
  }


  test("native cosine == HOF cosine bit-exactly on real embeddings, inside codegen") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = embs.select($"vec_id".as("id_a"), $"embedding".as("va")).limit(50)
    val b = embs.select($"vec_id".as("id_b"), $"embedding".as("vb")).limit(50)
    val pairs = a.crossJoin(b)
    val both = pairs.select(
      NativeSig.cosineSim($"va", $"vb").as("native"),
      Similarity.hofCosine($"va", $"vb").as("hof"))
    // bit-exact: same accumulation order, same zero-norm guard
    assert(both.filter($"native" =!= $"hof").count() == 0)
    val zero = Seq((Array(0f, 0f), Array(1f, 2f))).toDF("za", "zb")
      .select(NativeSig.cosineSim($"za", $"zb")).as[Double].head
    assert(zero == 0.0)
    // codegen check on a map-only projection (join operators sit outside
    // whole-stage codegen regardless of the expression)
    val q = embs.select(NativeSig.cosineSim($"embedding", $"embedding").as("c"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected codegen:\n$plan")
  }


  test("native nearest-centroid == HOF argmin on real embeddings, ties to smaller index") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.trainCentroids(embs.limit(100), "embedding", k = 4, iters = 1)
    val both = embs.select(
      NativeSig.nearestCentroid($"embedding", cents).as("native"),
      Similarity.hofNearestCentroid($"embedding", cents).as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
    assert(both.select("native").distinct().count() > 1)
    // exact tie: duplicated centroid → both formulations pick index 0
    val dupCents = Array(Array(1.0, 0.0), Array(1.0, 0.0))
    val tie = Seq(Array(1f, 0f)).toDF("v").select(
      NativeSig.nearestCentroid($"v", dupCents).as("native"),
      Similarity.hofNearestCentroid($"v", dupCents).as("hof"))
      .as[(Int, Int)].head()
    assert(tie == ((0, 0)))
    // codegen check
    val plan = embs.select(NativeSig.nearestCentroid($"embedding", cents))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected codegen:\n$plan")
    // dimension mismatch fails loud instead of scoring a prefix — pin the
    // actual message (unwrapping whatever execution layer wraps it in)
    def rootMessage(t: Throwable): String = {
      var cur = t
      while (cur.getCause != null && (cur.getCause ne cur)) cur = cur.getCause
      String.valueOf(cur.getMessage)
    }
    val e = intercept[Exception] {
      Seq(Array(1f, 2f, 3f)).toDF("v")
        .select(NativeSig.nearestCentroid($"v", dupCents)).collect()
    }
    assert(rootMessage(e).contains("nearest_centroid") && rootMessage(e).contains("dims"),
      rootMessage(e))
    val e2 = intercept[Exception] {
      Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
        .select(NativeSig.cosineSim($"a", $"b")).collect()
    }
    assert(rootMessage(e2).contains("cosine_sim"), rootMessage(e2))
  }

  test("native word shingles == HOF shingles on real documents + edge cases") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .union(Seq("", "   ", "one", "a b", "a\tb\nc  d", "x y x y x y").toDF("text"))
    for (n <- Seq(1, 3, 5)) {
      val both = docs.select(
        Dedup.shingles($"text", n).as("native"),
        Dedup.hofShingles($"text", n).as("hof"))
      val bad = both.filter(!($"native" <=> $"hof")).collect()
      assert(bad.isEmpty, s"n=$n first=${bad.headOption}")
    }
    val plan = docs.select(Dedup.shingles($"text", 3))
      .queryExecution.executedPlan.toString
    assert(plan.contains("word_shingles"), plan)
  }

}
