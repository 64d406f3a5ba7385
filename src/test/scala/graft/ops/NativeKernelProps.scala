package graft.ops

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.ops.expr.SigKernels

/** Randomized parity for the native kernels against straight-line JVM
  * reference implementations — pure kernel-level properties (no Spark
  * session), complementing the DataFrame-level native-vs-HOF parity specs.
  */
object NativeKernelProps extends Properties("NativeKernels") {

  private val word: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  private val ws: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r", "  ")).map(_.mkString)

  /** Text with random words separated by random whitespace runs, with
    * optional leading/trailing whitespace and a small vocabulary so n-grams
    * actually repeat.
    */
  private val text: Gen[String] = for {
    vocab <- Gen.choose(1, 5)
    words <- Gen.listOf(Gen.oneOf((0 until vocab).map(i => s"w$i")))
    seps <- Gen.listOfN(math.max(words.size - 1, 0), ws)
    lead <- Gen.oneOf("", " ", "\t ")
    trail <- Gen.oneOf("", " ", "\n")
  } yield lead + words.zipAll(seps, "", "").map { case (w, s) => w + s }.mkString + trail

  private def tokens(s: String): Seq[String] =
    s.split("\\s+").filter(_.nonEmpty).toSeq

  private def refShingles(s: String, n: Int): Seq[String] = {
    val toks = tokens(s)
    if (toks.isEmpty) Nil
    else if (toks.size <= n) Seq(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
  }

  property("wordShingles == reference sliding-window shingling") =
    Prop.forAll(text, Gen.choose(1, 4)) { (s, n) =>
      val got = SigKernels.wordShingles(UTF8String.fromString(s), n)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      got == refShingles(s, n)
    }

  property("topNgramFraction == reference multiset mode / total") =
    Prop.forAll(text, Gen.choose(1, 4)) { (s, n) =>
      val toks = tokens(s)
      val expected =
        if (toks.size < n) 0.0
        else {
          val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
          grams.groupBy(identity).values.map(_.size).max.toDouble / grams.size
        }
      val got = SigKernels.topNgramFraction(UTF8String.fromString(s), n)
      got == expected
    }

  private val sortedDistinct: Gen[Seq[String]] =
    Gen.listOf(word).map(_.distinct.sorted)

  property("jaccardSorted == reference set Jaccard") =
    Prop.forAll(sortedDistinct, sortedDistinct) { (a, b) =>
      def arr(xs: Seq[String]) =
        new GenericArrayData(xs.map(x => UTF8String.fromString(x): Any).toArray)
      val got = SigKernels.jaccardSorted(arr(a), arr(b))
      val inter = a.toSet.intersect(b.toSet).size
      val uni = a.toSet.union(b.toSet).size
      val expected = if (uni == 0) 0.0 else inter.toDouble / uni
      got == expected
    }

  property("jaccardSortedMin: exact above threshold, never passes below") =
    Prop.forAll(sortedDistinct, sortedDistinct, Gen.choose(1, 10)) { (a, b, t10) =>
      val t = t10 / 10.0
      def arr(xs: Seq[String]) =
        new GenericArrayData(xs.map(x => UTF8String.fromString(x): Any).toArray)
      val exact = SigKernels.jaccardSorted(arr(a), arr(b))
      val bounded = SigKernels.jaccardSortedMin(arr(a), arr(b), t)
      if (exact >= t) bounded == exact // survivors are exact
      else bounded < t                 // early exit stays below the filter
    }

  property("cosine == reference sequential fold (bit-exact)") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(-10f, 10f)), Gen.listOf(Gen.chooseNum(-10f, 10f))) {
      (a0, b0) =>
        val n = math.min(a0.size, b0.size)
        val a = a0.take(n)
        val b = b0.take(n)
        def arr(xs: Seq[Float]) = new GenericArrayData(xs.map(x => x: Any).toArray)
        val got = SigKernels.cosine(arr(a), arr(b), aFloat = true, bFloat = true)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        a.zip(b).foreach { case (x0, y0) =>
          val x = x0.toDouble; val y = y0.toDouble
          dot += x * y; na += x * x; nb += y * y
        }
        val d = math.sqrt(na) * math.sqrt(nb)
        val expected = if (d == 0) 0.0 else dot / d
        java.lang.Double.compare(got, expected) == 0
    }
}

/** Numeric-character-reference decode: total on arbitrary input, decodes
  * a rendered reference of every valid scalar, idempotent once entity
  * forms are gone, and never touches text without `&#`.
  */
object CharRefProps extends Properties("NumericCharRefDecode") {

  private val kernel = graft.ops.expr.NumericCharRefDecode(
    org.apache.spark.sql.catalyst.expressions.Literal("x"))

  private def decode(s: String): String =
    kernel.decode(UTF8String.fromString(s)).toString

  // arbitrary unicode text, salted with '&' '#' ';' digits so partial
  // entity shapes actually occur
  private val junk: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar.map(_.toString), Gen.const("&"), Gen.const("#"),
    Gen.const(";"), Gen.const("&#"), Gen.const("&#x"),
    Gen.choose(0, 0x2FFF).map(cp => new String(Character.toChars(cp))))).map(_.mkString)

  property("total: never throws on arbitrary text") =
    Prop.forAll(junk) { s => decode(s); true }

  property("decodes every valid scalar value, decimal and hex") =
    Prop.forAll(Gen.choose(1, 0x10FFFF).suchThat(cp => cp < 0xD800 || cp > 0xDFFF)
        .suchThat(_ != 38)) { cp =>
      val expect = new String(Character.toChars(cp))
      decode(s"a&#$cp;b") == s"a${expect}b" &&
        decode(s"a&#x${cp.toHexString};b") == s"a${expect}b" &&
        decode(s"a&#X${cp.toHexString.toUpperCase};b") == s"a${expect}b"
    }

  property("idempotent when no '&#' digit sequence survives decoding") =
    Prop.forAll(junk) { s =>
      val once = decode(s)
      val twice = decode(once)
      // decoding can EXPOSE new refs only if a ref decoded to '&' or '#'
      // glyph adjacency — cp 38 is excluded by contract, '#' (35) is not;
      // restrict the claim to outputs with no remaining candidate
      !"&#\\d|&#[xX][0-9a-fA-F]".r.findFirstIn(once).isDefined ==> (twice == once)
    }

  property("entity-free text is unchanged") =
    Prop.forAll(Gen.asciiPrintableStr.map(_.replace("&#", "&_"))) { s =>
      decode(s) == s
    }
}
