package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.ops.expr._

/** Spark extensions entry point:
  *
  * {{{
  * spark-sql --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * registers the SQL-expressible native kernels in every session of the
  * deployment — pure-SQL users get the codegen'd text/similarity
  * primitives without touching the Scala API. (The kernels that take
  * driver-side array constants — hyperplanes, centroids — remain
  * Scala-API-only; SQL has no literal syntax for them.)
  *
  * For an already-running session, [[graft.ops.expr.NativeSig.register]]
  * installs the same functions as temp functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be a literal integer; got the non-literal expression ${e.sql}")
    e.eval()
  } match {
    case i: Int                    => i
    case l: Long if l.isValidInt   => l.toInt
    case l: Long => throw new IllegalArgumentException(
      s"$what must fit in an int; got $l")
    case other => throw new IllegalArgumentException(
      s"$what must be a literal integer; got $other")
  }

  private def dblLit(e: Expression, what: String): Double = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be a literal number; got the non-literal expression ${e.sql}")
    e.eval()
  } match {
    case d: Double => d
    case f: Float  => f.toDouble
    case i: Int    => i.toDouble
    case l: Long   => l.toDouble
    // a plain SQL literal like 0.8 parses as decimal(1,1), not double
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a literal number; got $other")
  }

  private def strLit(e: Expression, what: String): String = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be a literal string; got the non-literal expression ${e.sql}")
    e.eval()
  } match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString
    case null => throw new IllegalArgumentException(
      s"$what must be a literal string; got NULL")
    case other => throw new IllegalArgumentException(
      s"$what must be a literal string; got $other")
  }

  /** Every native kernel whose parameters SQL can express. */
  private[graft] val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> { es =>
      require(es.length == 1, "simhash64(tokens)")
      SimHash64(es.head)
    },
    "minhash_signature" -> { es =>
      require(es.length == 2, "minhash_signature(tokens, numHashes)")
      MinHashSignature(es.head, intLit(es(1), "numHashes"))
    },
    "cosine_sim" -> { es =>
      require(es.length == 2, "cosine_sim(a, b)")
      CosineSim(es.head, es(1))
    },
    "word_shingles" -> { es =>
      require(es.length == 2, "word_shingles(text, n)")
      WordShingles(es.head, intLit(es(1), "n"))
    },
    "top_ngram_fraction" -> { es =>
      require(es.length == 2, "top_ngram_fraction(text, n)")
      TopNgramFraction(es.head, intLit(es(1), "n"))
    },
    "jaccard_sorted" -> { es =>
      es match {
        case Seq(a, b)    => JaccardSorted(a, b)
        case Seq(a, b, t) => JaccardSorted(a, b, dblLit(t, "minJ"))
        case _ => throw new IllegalArgumentException(
          "jaccard_sorted(sortedA, sortedB[, minJ])")
      }
    },
    "hash_sorted_distinct" -> { es =>
      require(es.length == 1, "hash_sorted_distinct(strings)")
      HashSortedDistinct(es.head)
    },
    "window_hashes" -> { es =>
      require(es.length == 2, "window_hashes(text, w)")
      WindowHashes(es.head, intLit(es(1), "w"))
    },
    "mask_repeated_windows" -> { es =>
      require(es.length == 3, "mask_repeated_windows(text, positions, w)")
      MaskRepeatedWindows(es.head, es(1), intLit(es(2), "w"))
    },
    // lang_id(text) → one code; lang_id(text, maxLangs) → up to maxLangs
    // comma-joined codes, primary first (the cc-index `languages` shape
    // indexWarc emits — exposed so config-only SQL curation can produce
    // the identical column). maxLangs is a plan-time literal, same
    // foldability contract as every registered parameter.
    "lang_id" -> { es =>
      es match {
        case Seq(t)    => LangIdExpr(t)
        case Seq(t, k) =>
          val kk = intLit(k, "lang_id maxLangs")
          require(kk >= 1, s"lang_id maxLangs must be >= 1, got $kk")
          LangIdTopExpr(t, kk)
        case _ => throw new IllegalArgumentException(
          "lang_id(text[, maxLangs])")
      }
    },
    "surt_host_norm" -> { es =>
      require(es.length == 1, "surt_host_norm(host)")
      SurtHostNormExpr(es.head)
    },
    // lang_id codes (single or comma-joined) re-spelled as ISO 639-3 —
    // the published cc-index `languages` spelling
    "iso639_3" -> { es =>
      require(es.length == 1, "iso639_3(langCodes)")
      Iso6393Expr(es.head)
    },
    "fix_encoding" -> { es =>
      require(es.length == 1 || es.length == 2, "fix_encoding(text[, maxPasses])")
      FixEncodingExpr(es.head,
        if (es.length == 2) intLit(es(1), "maxPasses") else 3)
    },
    "redact_validated" -> { es =>
      require(es.length == 1, "redact_validated(text)")
      RedactValidatedExpr(es.head)
    },
    "quantize_vec" -> { es =>
      require(es.length == 1, "quantize_vec(vec)")
      QuantizeVec(es.head)
    },
    "cosine_sim_q" -> { es =>
      require(es.length == 2, "cosine_sim_q(qa, qb)")
      CosineSimQ(es.head, es(1))
    },
    "unicode_normalize" -> { es =>
      require(es.length == 1 || es.length == 2, "unicode_normalize(text[, form])")
      val form = if (es.length == 2) es(1).eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => throw new IllegalArgumentException(
          s"form must be a literal string; got $other")
      } else "NFC"
      UnicodeNormalize(es.head, form)
    },
    "dup_ngram_coverage" -> { es =>
      require(es.length == 2, "dup_ngram_coverage(text, n)")
      DupNgramCoverage(es.head, intLit(es(1), "n"))
    },
    "misra_gries_sketch" -> { es =>
      require(es.length == 2, "misra_gries_sketch(token, budget) [aggregate]")
      MisraGriesSketch(es.head, intLit(es(1), "budget")).toAggregateExpression()
    },
    "deflate_ratio" -> { es =>
      require(es.length == 1, "deflate_ratio(text)")
      DeflateRatio(es.head)
    },
    "bpe_pre_tokens" -> { es =>
      require(es.length == 1, "bpe_pre_tokens(text)")
      BpePreTokensExpr(es.head)
    },
    "numeric_charref_decode" -> { es =>
      require(es.length == 1, "numeric_charref_decode(text)")
      NumericCharRefDecode(es.head)
    },
    "kmv_distinct" -> { es =>
      require(es.length == 2 || es.length == 3,
        "kmv_distinct(value, k[, seed]) [aggregate]")
      val seed = if (es.length == 3) {
        // eval() on a non-foldable expression (a column reference) throws a
        // raw unbound-reference error — check foldability first and report
        // the contract instead.
        if (!es(2).foldable) throw new IllegalArgumentException(
          s"kmv_distinct seed must be a literal integer; got the " +
            s"non-literal expression ${es(2).sql}")
        es(2).eval() match {
          case l: Long => l
          case i: Int  => i.toLong
          case null => throw new IllegalArgumentException(
            "kmv_distinct seed must be a literal integer; got NULL")
          case other => throw new IllegalArgumentException(
            s"seed must be a literal integer; got $other")
        }
      } else 42L
      // Match Corpus.approxDistinct: the sketch hashes string bytes, so
      // cast any input to string here rather than failing analysis.
      val child = es.head.dataType match {
        case org.apache.spark.sql.types.StringType => es.head
        case _ => org.apache.spark.sql.catalyst.expressions.Cast(
          es.head, org.apache.spark.sql.types.StringType)
      }
      KmvSketch(child, intLit(es(1), "k"), seed).toAggregateExpression()
    },
    "html_blocks" -> { es =>
      require(es.length == 1, "html_blocks(html)")
      HtmlBlocksExpr(es.head, HtmlContent.ContentRules())
    },
    "main_content" -> { es =>
      require(es.length == 1, "main_content(html)")
      MainContentExpr(es.head, HtmlContent.ContentRules())
    },
    // the vocab path must be a string LITERAL: the model loads driver-side
    // at plan time (the same place the Scala API loads it) and rides the
    // task binary — SQL users point at the same .vocab file a trained or
    // released model ships
    "unigram_encode" -> { es =>
      require(es.length == 2, "unigram_encode(text, vocabPath)")
      UnigramEncodeExpr(es.head,
        UnigramModel.fromVocabFile(strLit(es(1), "vocabPath")))
    },
    "unigram_count" -> { es =>
      require(es.length == 2, "unigram_count(text, vocabPath)")
      UnigramCountExpr(es.head,
        UnigramModel.fromVocabFile(strLit(es(1), "vocabPath")))
    },
    // BERT-family WordPiece under a vocab.txt (same literal-path, plan-time
    // load contract as unigram_*)
    "wordpiece_encode" -> { es =>
      require(es.length == 2, "wordpiece_encode(text, vocabTxtPath)")
      WordPieceEncodeExpr(es.head,
        WordPieceModel.fromVocabFile(strLit(es(1), "vocabTxtPath")))
    },
    "wordpiece_count" -> { es =>
      require(es.length == 2, "wordpiece_count(text, vocabTxtPath)")
      WordPieceCountExpr(es.head,
        WordPieceModel.fromVocabFile(strLit(es(1), "vocabTxtPath")))
    },
    "payload_text" -> { es =>
      require(es.length == 2, "payload_text(payload, contentType)")
      PayloadTextExpr(es.head, es(1))
    },
    "wordpiece_pre_tokens" -> { es =>
      es match {
        case Seq(t)     => WordPiecePreTokensExpr(t, lowercase = false)
        case Seq(t, lc) =>
          if (!lc.foldable) throw new IllegalArgumentException(
            "wordpiece_pre_tokens lowercase must be a literal boolean")
          lc.eval() match {
            case b: java.lang.Boolean => WordPiecePreTokensExpr(t, b)
            case other => throw new IllegalArgumentException(
              s"wordpiece_pre_tokens lowercase must be a literal boolean; got $other")
          }
        case _ => throw new IllegalArgumentException(
          "wordpiece_pre_tokens(text[, lowercase])")
      }
    })

  /** Install the same functions as temp functions on a live session. */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
