package graft.ops

import org.apache.spark.sql.functions._

import graft.dftly.SparkTestBase

/** DSIR importance weighting + Gumbel top-k selection: tokenization/gram
  * contracts, full-arithmetic differential against an independent local
  * reference (MessageDigest + plain maps), the absent-bucket default, and
  * sampling determinism.
  */
class DsirSpec extends SparkTestBase {

  private lazy val sq = spark
  import sq.implicits._

  // ---- independent local reference ---------------------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def refTokens(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  private def refGrams(text: String, maxN: Int): Seq[String] = {
    val t = refTokens(text)
    if (maxN == 1) t
    else t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  private def refBucket(g: String, nibbles: Int): String =
    md5hex(g).take(nibbles)

  private def refCounts(corpus: Seq[String], nibbles: Int, maxN: Int): Map[String, Long] =
    corpus.flatMap(refGrams(_, maxN)).groupBy(refBucket(_, nibbles))
      .map { case (b, gs) => b -> gs.size.toLong }

  private def refWeight(
      text: String, raw: Map[String, Long], tgt: Map[String, Long],
      nibbles: Int, maxN: Int): Double = {
    val m = math.pow(16.0, nibbles.toDouble)
    val cr = raw.values.sum.toDouble
    val ct = tgt.values.sum.toDouble
    refGrams(text, maxN).map { g =>
      val b = refBucket(g, nibbles)
      math.log(tgt.getOrElse(b, 0L) + 1.0) - math.log(ct + m) -
        math.log(raw.getOrElse(b, 0L) + 1.0) + math.log(cr + m)
    }.sum
  }

  // ---- contracts ----------------------------------------------------

  test("tokens and grams: lowercase, whitespace runs, bigram adjacency") {
    val got = Seq(Tuple1("Hello  WORLD\n foo")).toDF("t")
      .select(Dsir.grams(col("t"), 2).as("g")).as[Seq[String]].head()
    assert(got == Seq("hello", "world", "foo", "hello world", "world foo"))
    val uni = Seq(Tuple1("One two")).toDF("t")
      .select(Dsir.grams(col("t"), 1).as("g")).as[Seq[String]].head()
    assert(uni == Seq("one", "two"))
    val single = Seq(Tuple1("solo")).toDF("t")
      .select(Dsir.grams(col("t"), 2).as("g")).as[Seq[String]].head()
    assert(single == Seq("solo"))
    val empty = Seq(Tuple1("   ")).toDF("t")
      .select(Dsir.grams(col("t"), 2).as("g")).as[Seq[String]].head()
    assert(empty == Seq.empty)
  }

  test("hashedGramCounts matches the local reference (occurrences, not distinct)") {
    val corpus = Seq("the cat sat", "the dog sat sat", "a b a b a")
    val got = Dsir.hashedGramCounts(corpus.toDF("text"), "text", nibbles = 1, maxN = 2)
      .as[(String, Long)].collect().toMap
    assert(got == refCounts(corpus, 1, 2))
  }

  test("withLogWeights: full-arithmetic differential vs local reference") {
    val raw = Seq(
      1L -> "the quick brown fox", 2L -> "lorem ipsum dolor sit amet",
      3L -> "the encyclopedia of science", 4L -> "buy cheap pills now now now")
    val tgt = Seq("the encyclopedia of knowledge", "science of the brown fox")
    val rawM = refCounts(raw.map(_._2), 2, 2)
    val tgtM = refCounts(tgt, 2, 2)
    val got = Dsir.dsirLogWeights(
      raw.toDF("doc_id", "text"), tgt.toDF("text"), "doc_id", "text", nibbles = 2)
      .select(col("doc_id"), col("log_weight")).as[(Long, Double)].collect().toMap
    raw.foreach { case (id, text) =>
      val exp = refWeight(text, rawM, tgtM, 2, 2)
      assert(math.abs(got(id) - exp) < 1e-9, s"doc $id: got ${got(id)}, expected $exp")
    }
    // like-target docs must outscore the spam doc
    assert(got(3L) > got(4L))
  }

  test("identical raw and target models give ~zero weights") {
    val c = Seq(1L -> "alpha beta gamma", 2L -> "delta epsilon")
    val got = Dsir.dsirLogWeights(
      c.toDF("doc_id", "text"), c.map(_._2).toDF("text"), "doc_id", "text")
      .select(col("log_weight")).as[Double].collect()
    got.foreach(w => assert(math.abs(w) < 1e-9))
  }

  test("absent-bucket default: scoring a frame outside both corpora") {
    // count tables built over corpora that share no grams with the scored
    // doc: every bucket miss must contribute ln(Cr+m) - ln(Ct+m)
    val rawC = Dsir.hashedGramCounts(Seq("aa bb").toDF("text"), "text", 1, 1)
    val tgtC = Dsir.hashedGramCounts(Seq("cc dd ee").toDF("text"), "text", 1, 1)
    val doc = Seq(1L -> "zz yy xx ww").toDF("doc_id", "text")
    val got = Dsir.withLogWeights(doc, "doc_id", "text", rawC, tgtC, 1, 1)
      .select(col("log_weight")).as[Double].head()
    // reference handles present AND absent buckets uniformly
    val exp = refWeight("zz yy xx ww",
      refCounts(Seq("aa bb"), 1, 1), refCounts(Seq("cc dd ee"), 1, 1), 1, 1)
    assert(math.abs(got - exp) < 1e-9)
  }

  test("empty target corpus degrades to a uniform model, not silent zeros") {
    val raw = Seq(1L -> "aa bb aa").toDF("doc_id", "text")
    val got = Dsir.dsirLogWeights(raw,
      Seq.empty[String].toDF("text"), "doc_id", "text", nibbles = 1, maxN = 1)
      .select(col("log_weight")).as[Double].head()
    val exp = refWeight("aa bb aa", refCounts(Seq("aa bb aa"), 1, 1),
      Map.empty, 1, 1)
    assert(math.abs(got - exp) < 1e-9)
    assert(got != 0.0) // the uniform-target model is NOT a no-op
  }

  test("token-less documents score exactly 0.0") {
    val raw = Seq(1L -> "some words here", 2L -> "  ")
    val got = Dsir.dsirLogWeights(
      raw.toDF("doc_id", "text"), Seq("words").toDF("text"), "doc_id", "text")
      .select(col("doc_id"), col("log_weight")).as[(Long, Double)].collect().toMap
    assert(got(2L) == 0.0)
  }

  test("gumbelNoise: matches the md5 construction, finite, u in (0,1)") {
    val got = Seq(Tuple1(7L)).toDF("id")
      .select(Dsir.gumbelNoise(col("id"), 42L).as("g")).as[Double].head()
    val v = java.lang.Long.parseLong(md5hex("42:7").take(8), 16).toDouble
    val u = (v + 0.5) / 4294967296.0
    val exp = -math.log(-math.log(u))
    assert(math.abs(got - exp) < 1e-12)
  }

  test("dsirSample: deterministic, independently replayed top-k") {
    val raw = (0L until 60L).map(i => i ->
      (if (i % 3 == 0) "the quick brown fox jumps" else s"filler junk spam $i"))
    val tgt = Seq("the quick brown fox", "fox jumps high")
    val rawM = refCounts(raw.map(_._2), 2, 2)
    val tgtM = refCounts(tgt, 2, 2)
    val expTop = raw.map { case (id, text) =>
      val w = refWeight(text, rawM, tgtM, 2, 2)
      val v = java.lang.Long.parseLong(md5hex(s"9:$id").take(8), 16).toDouble
      val g = -math.log(-math.log((v + 0.5) / 4294967296.0))
      (id, w + g)
    }.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    val got = Dsir.dsirSample(raw.toDF("doc_id", "text"), tgt.toDF("text"),
      "doc_id", "text", k = 10, nibbles = 2, seed = 9L)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got == expTop)
    // rerun is identical
    val again = Dsir.dsirSample(raw.toDF("doc_id", "text"), tgt.toDF("text"),
      "doc_id", "text", k = 10, nibbles = 2, seed = 9L)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(again == got)
  }

  test("dsirSample: k >= corpus returns everything") {
    val raw = Seq(1L -> "a b", 2L -> "c d").toDF("doc_id", "text")
    val got = Dsir.dsirSample(raw, Seq("a").toDF("text"), "doc_id", "text", k = 99)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }
}
