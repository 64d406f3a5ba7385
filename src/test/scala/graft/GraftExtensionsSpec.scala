package graft

import org.apache.spark.sql.SparkSession

import graft.dftly.SparkTestBase

class GraftExtensionsSpec extends SparkTestBase {

  test("GraftExtensions injects the SQL surface into a fresh session") {
    // withExtensions exercises the same injection path a deployment's
    // `--conf spark.sql.extensions=graft.GraftExtensions` uses (the conf
    // route only differs in loading the class by reflection from the
    // SparkContext conf, which a shared test context cannot carry);
    // restore the shared session afterwards so other suites are untouched
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne shared, "must be a new session, or the test proves nothing")
      val row = s.sql(
        """SELECT
          |  cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
          |  size(word_shingles('a b c d', 3)) AS ns,
          |  size(minhash_signature(array('x', 'y'), 16)) AS nm,
          |  simhash64(array('x', 'y')) = simhash64(array('x', 'y')) AS sh,
          |  jaccard_sorted(array('a', 'b'), array('a', 'b')) AS j,
          |  top_ngram_fraction('a a a b', 2) AS f,
          |  jaccard_sorted(array('a', 'b'), array('a', 'c'), 0.8) AS jt,
          |  size(minhash_signature(array('x'), 16L)) AS nl,
          |  jaccard_sorted(hash_sorted_distinct(array('a', 'b', 'a')),
          |                 hash_sorted_distinct(array('b', 'a'))) AS jh
          |""".stripMargin).head()
      assert(row.getDouble(0) == 1.0)
      assert(row.getInt(1) == 2)   // shingles of 4 tokens, n=3
      assert(row.getInt(2) == 16)
      assert(row.getBoolean(3))
      assert(row.getDouble(4) == 1.0)
      assert(math.abs(row.getDouble(5) - 2.0 / 3) < 1e-12)
      // plain SQL literals: 0.8 parses as decimal(1,1), 16L as bigint —
      // both must work for the threshold/int parameters. The early-exit
      // contract only promises below-threshold pairs score < minJ (exact
      // value or 0.0), exact above it.
      assert(row.getDouble(6) < 0.8, "J=1/3 stays below the 0.8 threshold")
      assert(row.getInt(7) == 16)
      // hashed-gram arrays: dedup + sort + relabel preserve set equality
      assert(row.getDouble(8) == 1.0)
      // round-9 functions: unicode_normalize (scalar, default + explicit
      // form) and misra_gries_sketch (aggregate — exact when budget covers
      // the distinct tokens: err 0, true counts)
      val r9 = s.sql(
        """SELECT
          |  unicode_normalize('cafe' || char(776)) AS nfc_len_probe,
          |  unicode_normalize('ﬁle', 'NFKC') AS nfkc
          |""".stripMargin).head()
      assert(r9.getString(1) == "file")
      val agg = s.sql(
        """SELECT misra_gries_sketch(t, 8) AS sk
          |FROM VALUES ('a'), ('a'), ('b') AS v(t)""".stripMargin).head()
      val sk = agg.getStruct(0)
      assert(sk.getLong(0) == 3L && sk.getLong(1) == 0L)
      assert(sk.getSeq[org.apache.spark.sql.Row](2)
        .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("a" -> 2L, "b" -> 1L))
      // session-3 functions: dup_ngram_coverage (scalar), bpe_pre_tokens
      // (scalar), kmv_distinct (aggregate — exact regime below k)
      val s3 = s.sql(
        """SELECT
          |  dup_ngram_coverage('a b a b', 2) AS cov,
          |  bpe_pre_tokens('it''s ok') AS pre,
          |  deflate_ratio(repeat('spam ', 200)) AS lowent
          |""".stripMargin).head()
      assert(s3.getDouble(0) == 1.0)
      assert(s3.getSeq[String](1) == Seq("it", "'s", " ok"))
      assert(s3.getDouble(2) < 0.1)
      val kmv = s.sql(
        """SELECT kmv_distinct(t, 16) AS sk
          |FROM VALUES ('a'), ('a'), ('b') AS v(t)""".stripMargin).head().getStruct(0)
      assert(kmv.getDouble(0) == 2.0 && kmv.getBoolean(1))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("wrong arity and non-integer parameters fail loudly") {
    graft.ops.expr.NativeSig.register(spark)
    val arity = intercept[Exception] {
      spark.sql("SELECT word_shingles('a')").head()
    }
    assert(arity.getMessage.contains("word_shingles(text, n)"))
    val typ = intercept[Exception] {
      spark.sql("SELECT word_shingles('a b', 'x')").head()
    }
    assert(typ.getMessage.contains("literal integer"))
  }

  test("lang_id: two-arity multi-code form, k=1 equals single-code, " +
    "non-literal / bad k fail loudly") {
    graft.ops.expr.NativeSig.register(spark)
    val ruUk = "привет мир это тест і ще є українські слова як їжак та " +
      "багато інших слів що мають значення"
    val row = spark.sql(
      s"SELECT lang_id('$ruUk', 3), lang_id('$ruUk', 1), lang_id('$ruUk')")
      .head()
    assert(row.getString(0).split(",").length >= 1)
    assert(row.getString(1) == row.getString(2)) // k=1 == single-code form
    val nonLit = intercept[Exception] {
      spark.sql("SELECT lang_id(t, length(t)) FROM VALUES ('x') AS v(t)").head()
    }
    assert(nonLit.getMessage.contains("literal integer"))
    val badK = intercept[Exception] {
      spark.sql("SELECT lang_id('x', 0)").head()
    }
    assert(badK.getMessage.contains(">= 1"))
  }

  test("numeric_charref_decode registered as a SQL function") {
    graft.ops.expr.NativeSig.register(spark)
    val got = spark.sql(
      "SELECT numeric_charref_decode('It&#8217;s &#x2019;ok&#x2019; &#38;')"
    ).head().getString(0)
    // codepoint 38 stays literal by contract (stripHtml decodes it last)
    assert(got == "It’s ’ok’ &#38;")
  }

  test("main_content / html_blocks / unigram_* registered as SQL functions") {
    graft.ops.expr.NativeSig.register(spark)
    val para = graft.SparkEntry.HtmlFixturePara
    val kept = spark.sql(
      s"SELECT main_content('<nav><a href=x>Home</a></nav><p>$para</p>')"
    ).head().getString(0)
    assert(kept == para)
    val nBlocks = spark.sql(
      s"SELECT size(html_blocks('<nav>a</nav><p>$para</p>'))"
    ).head().getInt(0)
    assert(nBlocks == 2)
    // unigram over a real .vocab file path (string literal → plan-time load)
    val vf = java.io.File.createTempFile("graft_sql_unigram", ".vocab")
    vf.deleteOnExit()
    java.nio.file.Files.write(vf.toPath,
      graft.SparkEntry.UnigramFixtureModel.toVocabLines.mkString("\n")
        .getBytes("UTF-8"))
    val row = spark.sql(
      s"""SELECT unigram_encode('hello world', '${vf.getAbsolutePath}') AS ids,
         |  unigram_count('hello world', '${vf.getAbsolutePath}') AS n
         |""".stripMargin).head()
    assert(row.getSeq[Int](0) == Seq(0, 5, 6) && row.getInt(1) == 3)
    // a column reference as the vocab path is a clear contract error
    val e = intercept[Exception] {
      spark.sql(
        "SELECT unigram_count(t, t) FROM VALUES ('a') AS v(t)").head()
    }
    assert(e.getMessage.contains("vocabPath must be a literal string"))
    // wordpiece over a real vocab.txt path (same plan-time load contract)
    val wf = java.io.File.createTempFile("graft_sql_wordpiece", ".txt")
    wf.deleteOnExit()
    java.nio.file.Files.write(wf.toPath,
      graft.SparkEntry.WordPieceFixtureModel.toVocabLines.mkString("\n")
        .getBytes("UTF-8"))
    val wp = spark.sql(
      s"""SELECT wordpiece_encode('unaffable', '${wf.getAbsolutePath}') AS ids,
         |  wordpiece_count('it''s', '${wf.getAbsolutePath}') AS n
         |""".stripMargin).head()
    assert(wp.getSeq[Int](0) == Seq(7, 10) && wp.getInt(1) == 3)
  }

  test("kmv_distinct: non-string input is cast, non-literal seed is a clear error") {
    graft.ops.expr.NativeSig.register(spark)
    // int column: the registration casts to string (matching
    // Corpus.approxDistinct) — no executor ClassCastException
    val kmv = spark.sql(
      """SELECT kmv_distinct(i, 16) AS sk
        |FROM VALUES (1), (1), (2), (3) AS v(i)""".stripMargin)
      .head().getStruct(0)
    assert(kmv.getDouble(0) == 3.0 && kmv.getBoolean(1))
    // a column reference as seed must be a targeted analysis error, not a
    // raw unbound-reference crash
    val e = intercept[Exception] {
      spark.sql(
        """SELECT kmv_distinct(t, 16, i) FROM VALUES ('a', 1) AS v(t, i)"""
      ).head()
    }
    assert(e.getMessage.contains("seed must be a literal"))
    val n = intercept[Exception] {
      spark.sql("SELECT kmv_distinct(t, 16, NULL) FROM VALUES ('a') AS v(t)").head()
    }
    assert(n.getMessage.contains("seed must be a literal"))
  }
}
