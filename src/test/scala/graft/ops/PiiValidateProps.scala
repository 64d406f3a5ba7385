package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.ops.expr.PiiValidate

/** Randomized arithmetic properties for the validated-PII checksums —
  * pure kernel-level (no Spark session).
  */
object PiiValidateProps extends Properties("PiiValidate") {

  private val digitsGen: Gen[Array[Int]] =
    Gen.choose(12, 18).flatMap(n => Gen.listOfN(n, Gen.choose(0, 9)))
      .map(_.toArray)

  /** Check-digit closure: for ANY payload, the Luhn-computed check digit
    * makes the full number validate, and every other check digit fails —
    * the arithmetic is exactly mod-10-complete.
    */
  property("luhn check-digit closure") = forAll(digitsGen) { payload =>
    // compute the check digit for payload ++ [c]: position parity of the
    // payload shifts by one because c occupies the rightmost slot
    val n = payload.length
    var sum = 0
    for (i <- 0 until n) {
      var d = payload(n - 1 - i)
      if (i % 2 == 0) { d *= 2; if (d > 9) d -= 9 } // rightmost payload digit doubles
      sum += d
    }
    val check = (10 - sum % 10) % 10
    val full = payload :+ check
    val ok = PiiValidate.luhnOk(full, full.length)
    val others = (0 to 9).filter(_ != check).forall { c =>
      !PiiValidate.luhnOk(payload :+ c, full.length)
    }
    ok && others
  }

  /** Single-digit transcription errors are always caught (the property
    * Luhn was designed for).
    */
  property("luhn catches any single-digit error") = forAll(
    digitsGen, Gen.choose(0, 100), Gen.choose(1, 9)) { (payload, posSeed, delta) =>
    val n = payload.length
    var sum = 0
    for (i <- 0 until n) {
      var d = payload(n - 1 - i)
      if (i % 2 == 0) { d *= 2; if (d > 9) d -= 9 }
      sum += d
    }
    val full = payload :+ ((10 - sum % 10) % 10)
    val pos = posSeed % full.length
    val corrupted = full.clone()
    corrupted(pos) = (corrupted(pos) + delta) % 10
    !PiiValidate.luhnOk(corrupted, corrupted.length)
  }

  /** IBAN check digits: in the ISO 13616 range 02–98 exactly one pair
    * passes mod-97 for any BBAN (the standard restricts to that range
    * precisely because cd and cd+97 share a residue — over the full
    * 00–99 space the arithmetic admits one or two solutions).
    */
  property("iban mod-97 admits exactly one check pair in 02..98") = forAll(
    Gen.listOfN(12, Gen.oneOf(('A' to 'Z') ++ ('0' to '9'))).map(_.mkString)
  ) { bban =>
    val passing = (2 to 98).count { cd =>
      PiiValidate.ibanOk(f"DE$cd%02d$bban")
    }
    passing == 1
  }

  /** Entropy bounds: 0 for constant strings, ≤ log2(alphabet) always. */
  property("entropy bounds") = forAll(
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)) { s =>
    val h = PiiValidate.entropyBits(s, 0, s.length)
    val distinct = s.distinct.length
    val bound = math.log(distinct.toDouble) / math.log(2.0)
    (h >= -1e-9 && h <= bound + 1e-9) :| s"h=$h bound=$bound"
  }
}
