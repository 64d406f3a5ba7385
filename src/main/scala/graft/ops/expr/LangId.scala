package graft.ops.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The language-ID model: a linear classifier over two interpretable,
  * oracle-replayable feature families —
  *
  *   - TOKEN features: lowercased whitespace tokens matched against
  *     per-language function-word lists, weight per OCCURRENCE (counts, not
  *     set intersection — repetition is signal);
  *   - CHARACTER-RANGE features: per-character Unicode-range weights, the
  *     script detectors (kana → ja, Hangul → ko, Thai → th, …) plus
  *     single-letter discriminators inside shared scripts (і/ї/є/ґ → uk
  *     against the shared Cyrillic block, ы/ъ/э/ё → ru; ß → de; ñ → es…).
  *
  * `score(lang) = Σ_token w_tok + Σ_char w_char`; argmax wins, ties break
  * in [[Langs]] order, an all-zero score is `"und"`. Every feature weight
  * is a small integer so the whole decision is exactly replayable in any
  * SQL engine (the q14 oracle inlines [[TokenFeatures]] as a VALUES join
  * and each range as a `regexp_extract_all` count — one shared source of
  * truth, no hash bits cross the engine boundary).
  *
  * The feature tables are authored, not trained: this is the classic
  * stopword/script heuristic at useful coverage (28 languages), not a
  * fasttext replacement — but unlike a 40-marker toy it separates the major
  * web languages, and the weights live in one table a user can extend.
  *
  * Known coarse spots, by construction: zh vs ja on kana-free text leans zh
  * (CJK ideographs weigh 2:1 zh — real Japanese is >25% kana, which at 3×
  * outweighs it); da vs no share most function words and tie toward da;
  * sr/bg/mk collapse into the shared-Cyrillic ru bucket.
  */
object LangModel {

  /** Canonical order — also the tie-break priority. */
  val Langs: IndexedSeq[String] = IndexedSeq(
    "en", "es", "de", "fr", "pt", "it", "nl", "sv", "da", "no",
    "fi", "pl", "cs", "ro", "hu", "tr", "id", "vi", "ru", "uk",
    "el", "ar", "he", "hi", "th", "zh", "ja", "ko")

  private val tokenWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with",
      "it", "was", "as", "on", "are", "this", "be", "by", "have", "not", "at"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "del",
      "las", "por", "con", "una", "es", "para", "como", "pero", "sus", "le"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "ein",
      "nicht", "im", "dem", "des", "auf", "für", "eine", "als", "auch", "sich",
      "werden"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "un", "une",
      "dans", "que", "qui", "pour", "pas", "sur", "avec", "plus", "par", "ce",
      "vous"),
    "pt" -> Seq("o", "a", "de", "que", "e", "do", "da", "em", "um", "para",
      "com", "não", "uma", "os", "no", "se", "na", "por", "mais", "dos"),
    "it" -> Seq("il", "la", "di", "che", "e", "è", "un", "per", "in", "una",
      "sono", "con", "non", "del", "le", "si", "gli", "come", "anche",
      "questo"),
    "nl" -> Seq("de", "het", "een", "en", "van", "is", "dat", "op", "te",
      "zijn", "met", "voor", "niet", "aan", "er", "maar", "ook", "als", "bij",
      "naar"),
    "sv" -> Seq("och", "att", "det", "som", "en", "på", "är", "av", "för",
      "med", "den", "till", "inte", "har", "de", "om", "ett", "han", "var",
      "jag"),
    "da" -> Seq("og", "det", "at", "en", "den", "til", "er", "som", "på",
      "de", "med", "han", "af", "for", "ikke", "der", "var", "mig", "sig",
      "men"),
    "no" -> Seq("og", "det", "at", "en", "et", "den", "til", "er", "som",
      "på", "de", "med", "han", "av", "ikke", "der", "så", "var", "meg",
      "seg"),
    "fi" -> Seq("ja", "on", "ei", "että", "se", "hän", "oli", "mutta",
      "ovat", "kun", "niin", "myös", "joka", "sen", "tämä", "ole", "mitä",
      "kuin", "vain", "jos"),
    "pl" -> Seq("i", "w", "nie", "na", "się", "z", "do", "to", "że", "jest",
      "jak", "po", "co", "tak", "o", "ale", "przez", "od", "za", "tym"),
    "cs" -> Seq("a", "se", "na", "je", "že", "v", "s", "to", "do", "jako",
      "za", "ale", "po", "co", "tak", "jsem", "jsou", "být", "byl", "pro"),
    "ro" -> Seq("și", "de", "în", "la", "a", "cu", "pe", "este", "care",
      "nu", "se", "din", "mai", "o", "ca", "dar", "sunt", "fost", "sau",
      "după"),
    "hu" -> Seq("a", "az", "és", "nem", "hogy", "is", "egy", "van", "de",
      "meg", "ez", "már", "csak", "volt", "ha", "mint", "vagy", "még", "el",
      "ki"),
    "tr" -> Seq("bir", "ve", "bu", "için", "de", "da", "ne", "ile", "mi",
      "ama", "çok", "daha", "gibi", "kadar", "sonra", "ben", "o", "en",
      "var", "yok"),
    "id" -> Seq("yang", "dan", "di", "itu", "dengan", "untuk", "tidak",
      "ini", "dari", "dalam", "akan", "pada", "juga", "saya", "ke", "karena",
      "ada", "mereka", "sudah", "atau"),
    "vi" -> Seq("của", "và", "là", "có", "không", "được", "trong", "đã",
      "người", "những", "một", "cho", "với", "các", "này", "để", "khi",
      "tôi", "anh", "em"),
    "ru" -> Seq("и", "в", "не", "на", "я", "что", "он", "с", "это", "как",
      "по", "но", "его", "к", "у", "из", "за", "то", "все", "она"),
    "uk" -> Seq("і", "в", "не", "на", "я", "що", "він", "з", "це", "як",
      "по", "але", "його", "до", "у", "із", "за", "те", "все", "вона"),
    "el" -> Seq("και", "το", "της", "να", "την", "που", "με", "από", "για",
      "στο", "είναι", "τα", "των", "ο", "η", "σε", "δεν", "μου", "αυτό",
      "τον"),
    "ar" -> Seq("في", "من", "على", "أن", "إلى", "عن", "هذا", "التي", "الذي",
      "مع", "كان", "لا", "ما", "هو", "أو", "كل", "لم", "بعد", "قد", "بين"),
    "he" -> Seq("של", "את", "על", "לא", "זה", "הוא", "עם", "כי", "גם",
      "היא", "אבל", "או", "יש", "אני", "מה", "אם", "רק", "כל", "היה",
      "אחד"),
    "hi" -> Seq("के", "में", "की", "है", "को", "से", "का", "पर", "यह",
      "और", "ने", "कि", "हैं", "था", "भी", "नहीं", "एक", "वह", "तो", "ही")
    // th/zh/ja/ko: no whitespace-delimited function words — script ranges
    // below carry them
  )

  /** `(token, lang, weight)` — the VALUES table the oracle inlines. */
  val TokenFeatures: Seq[(String, String, Int)] =
    for ((l, ws) <- tokenWords; w <- ws) yield (w, l, 1)

  private val tokenWordMap: Map[String, Seq[String]] = tokenWords.toMap

  /** The per-language function-word list (the classifier's token
    * features), empty for languages carried only by script ranges
    * (th/zh/ja/ko) and for unknown codes — the lang-keyed stopword
    * surface the quality ladder ([[graft.ops.TextStats.stopwordsFor]],
    * jusText, Gopher) reuses: one 28-language table, one source of truth.
    */
  def functionWords(lang: String): Seq[String] =
    tokenWordMap.getOrElse(lang, Seq.empty)

  /** `(loCodepoint, hiCodepoint, lang, weightPerChar)` — entries are
    * independent (overlaps simply both fire), each replayable as
    * `len(regexp_extract_all(text, '[\x{lo}-\x{hi}]')) * w`. All BMP, so
    * UTF-16 char iteration and codepoint regexes agree.
    */
  val CharRangeFeatures: Seq[(Int, Int, String, Int)] = Seq(
    // script blocks
    (0x3040, 0x309F, "ja", 3), // Hiragana
    (0x30A0, 0x30FF, "ja", 3), // Katakana
    (0x4E00, 0x9FFF, "zh", 2), // CJK Unified Ideographs: shared, zh-leaning
    (0x4E00, 0x9FFF, "ja", 1),
    (0xAC00, 0xD7A3, "ko", 3), // Hangul syllables
    (0x1100, 0x11FF, "ko", 3), // Hangul jamo
    (0x0E00, 0x0E7F, "th", 3), // Thai
    (0x0900, 0x097F, "hi", 3), // Devanagari
    (0x0600, 0x06FF, "ar", 3), // Arabic
    (0x0590, 0x05FF, "he", 3), // Hebrew
    (0x0370, 0x03FF, "el", 3), // Greek
    (0x0400, 0x04FF, "ru", 1), // Cyrillic: shared ru/uk, ties break to ru
    (0x0400, 0x04FF, "uk", 1),
    // single-letter discriminators inside shared scripts
    (0x044B, 0x044B, "ru", 5), // ы
    (0x044A, 0x044A, "ru", 5), // ъ
    (0x044D, 0x044D, "ru", 5), // э
    (0x0451, 0x0451, "ru", 5), // ё
    (0x0456, 0x0456, "uk", 5), // і
    (0x0457, 0x0457, "uk", 5), // ї
    (0x0454, 0x0454, "uk", 5), // є
    (0x0491, 0x0491, "uk", 5), // ґ
    // Latin-script diacritic discriminators
    (0x00DF, 0x00DF, "de", 4), // ß
    (0x00F1, 0x00F1, "es", 4), // ñ
    (0x00BF, 0x00BF, "es", 4), // ¿
    (0x00A1, 0x00A1, "es", 4), // ¡
    (0x00E3, 0x00E3, "pt", 3), // ã
    (0x00F5, 0x00F5, "pt", 3), // õ
    (0x011F, 0x011F, "tr", 4), // ğ
    (0x015F, 0x015F, "tr", 4), // ş
    (0x0131, 0x0131, "tr", 4), // ı
    (0x0142, 0x0142, "pl", 4), // ł
    (0x017C, 0x017C, "pl", 4), // ż
    (0x0119, 0x0119, "pl", 4), // ę
    (0x0105, 0x0105, "pl", 4), // ą
    (0x0159, 0x0159, "cs", 4), // ř
    (0x011B, 0x011B, "cs", 4), // ě
    (0x016F, 0x016F, "cs", 4), // ů
    (0x0151, 0x0151, "hu", 4), // ő
    (0x0171, 0x0171, "hu", 4), // ű
    (0x0219, 0x0219, "ro", 4), // ș
    (0x021B, 0x021B, "ro", 4), // ț
    (0x01B0, 0x01B0, "vi", 4), // ư
    (0x01A1, 0x01A1, "vi", 4), // ơ
    (0x0111, 0x0111, "vi", 4), // đ
    (0x1EA0, 0x1EF9, "vi", 4), // Latin Extended Additional (Vietnamese)
    (0x00F8, 0x00F8, "da", 1), // ø: shared da/no
    (0x00F8, 0x00F8, "no", 1),
    (0x00E6, 0x00E6, "da", 1), // æ: shared da/no
    (0x00E6, 0x00E6, "no", 1))

  private val langIdx: Map[String, Int] = Langs.zipWithIndex.toMap

  /** token → flat `[langIdx0, w0, langIdx1, w1, …]` */
  private val tokenMap: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    TokenFeatures.groupBy(_._1).foreach { case (tok, fs) =>
      m.put(tok, fs.flatMap { case (_, l, w) => Seq(langIdx(l), w) }.toArray)
    }
    m
  }

  private val rLo = CharRangeFeatures.map(_._1).toArray
  private val rHi = CharRangeFeatures.map(_._2).toArray
  private val rLang = CharRangeFeatures.map(f => langIdx(f._3)).toArray
  private val rW = CharRangeFeatures.map(_._4).toArray
  private val minCharFeature: Int = rLo.min // ASCII pays one compare per char

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** One pass for tokens (over the ROOT-lowercased text) + one for chars
    * (over the raw text — scripts are case-closed); argmax as documented.
    */
  def classify(text: UTF8String): UTF8String = {
    val scores = scoreAll(text.toString, -1)
    var best = 0
    var bi = -1
    var k = 0
    while (k < scores.length) {
      if (scores(k) > best) { best = scores(k); bi = k }
      k += 1
    }
    UTF8String.fromString(if (bi < 0) "und" else Langs(bi))
  }

  /** Up to `maxLangs` detected languages as a comma-joined string, primary
    * first — the published cc-index's `languages` field shape (it lists up
    * to three codes for genuinely mixed pages). A secondary is listed when
    *   1. its total score is at least HALF the primary's (a 50/50
    *      bilingual page reports both; incidental shared function words —
    *      `de`/`la` live in four Romance lists — never reach half), AND
    *   2. it shows EXCLUSIVE evidence of at least
    *      `min(10, max(1, best/8))` — proportional on short texts, capped
    *      at two-discriminator mass on long ones. Exclusive evidence is
    *      the per-feature-site MARGIN over the primary: each token/char
    *      contributes `max(0, w_secondary − w_primary)`, so a shared
    *      Cyrillic char (both langs +1) contributes nothing, a uk
    *      discriminator letter contributes its extra weight over the
    *      shared block, and a language-unique function word contributes
    *      fully. This kills shared-script shadows: on pure-Russian text
    *      `uk` rides every shared char to over half of `ru`'s score but
    *      has ZERO margin anywhere, while a genuinely Russian+Ukrainian
    *      page carries і/ї/є and uk function words in proportion to its
    *      Ukrainian mass — and a single OCR-noise discriminator char
    *      (margin 5) stays under the floor.
    * Order: total score descending, [[Langs]] order on ties;
    * `classifyTop(text, 1)` equals [[classify]] by construction.
    * All-zero scores → `"und"`.
    */
  def classifyTop(text: UTF8String, maxLangs: Int): UTF8String = {
    val raw = text.toString
    val totals = scoreAll(raw, -1)
    var best = 0
    var primary = -1
    var k = 0
    while (k < totals.length) {
      if (totals(k) > best) { best = totals(k); primary = k }
      k += 1
    }
    if (primary < 0) return UTF8String.fromString("und")
    if (maxLangs <= 1) return UTF8String.fromString(Langs(primary))
    val excl = scoreAll(raw, primary)
    val floor = math.max(1, best / 2)
    val exclFloor = math.min(10, math.max(1, best / 8))
    val sb = new java.lang.StringBuilder(16)
    sb.append(Langs(primary))
    // one pass collects the (at most Langs.length−1) candidates over both
    // floors, then an insertion sort by total descending — built stable
    // over the index-ordered collection pass, so equal totals keep Langs
    // order (the documented tie-break). O(n log n) on ≤27 items, instead
    // of walking every score level from best down to best/2 (O(best×28) —
    // millions of iterations on a 64 KiB sample where best reaches 10^5).
    val cand = new Array[Int](totals.length)
    var m = 0
    var i = 0
    while (i < totals.length) {
      if (i != primary && totals(i) >= floor && excl(i) >= exclFloor) {
        cand(m) = i; m += 1
      }
      i += 1
    }
    var a = 1
    while (a < m) {
      val v = cand(a)
      var b = a - 1
      while (b >= 0 && totals(cand(b)) < totals(v)) {
        cand(b + 1) = cand(b); b -= 1
      }
      cand(b + 1) = v
      a += 1
    }
    var taken = 1
    var j = 0
    while (j < m && taken < maxLangs) {
      sb.append(',')
      sb.append(Langs(cand(j)))
      taken += 1
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** The shared scoring pass behind [[classify]]/[[classifyTop]].
    * `excludeSharedWith >= 0` switches to the exclusive-evidence (margin)
    * pass: each feature SITE (one token occurrence, one character)
    * contributes `max(0, w_lang − w_excluded)` per language instead of
    * `w_lang` — shared evidence cancels, language-unique evidence stays.
    */
  private def scoreAll(raw: String, excludeSharedWith: Int): Array[Int] = {
    val lower = raw.toLowerCase(java.util.Locale.ROOT)
    val n = Langs.length
    val scores = new Array[Int](n)
    val len = lower.length
    var i = 0
    while (i < len) {
      while (i < len && isWs(lower.charAt(i))) i += 1
      if (i < len) {
        val st = i
        while (i < len && !isWs(lower.charAt(i))) i += 1
        val hit = tokenMap.get(lower.substring(st, i))
        if (hit != null) {
          if (excludeSharedWith < 0) {
            var j = 0
            while (j < hit.length) { scores(hit(j)) += hit(j + 1); j += 2 }
          } else {
            // margin pass: this token site contributes
            // max(0, w_lang − w_excluded) per language
            var wP = 0
            var j = 0
            while (j < hit.length) {
              if (hit(j) == excludeSharedWith) wP = hit(j + 1)
              j += 2
            }
            j = 0
            while (j < hit.length) {
              if (hit(j) != excludeSharedWith) {
                val m = hit(j + 1) - wP
                if (m > 0) scores(hit(j)) += m
              }
              j += 2
            }
          }
        }
      }
    }
    val rn = rLo.length
    val rlen = raw.length
    // margin pass scratch: per-char per-lang weight accumulator, reset via
    // the touched list (no per-char allocation)
    val tmp = if (excludeSharedWith >= 0) new Array[Int](n) else null
    val touched = if (excludeSharedWith >= 0) new Array[Int](rn) else null
    var c = 0
    while (c < rlen) {
      val ch = raw.charAt(c).toInt
      if (ch >= minCharFeature) {
        if (excludeSharedWith < 0) {
          var j = 0
          while (j < rn) {
            if (ch >= rLo(j) && ch <= rHi(j)) scores(rLang(j)) += rW(j)
            j += 1
          }
        } else {
          var wP = 0
          var tCount = 0
          var j = 0
          while (j < rn) {
            if (ch >= rLo(j) && ch <= rHi(j)) {
              val l = rLang(j)
              if (l == excludeSharedWith) wP += rW(j)
              else {
                if (tmp(l) == 0) { touched(tCount) = l; tCount += 1 }
                tmp(l) += rW(j)
              }
            }
            j += 1
          }
          var t = 0
          while (t < tCount) {
            val l = touched(t)
            val m = tmp(l) - wP
            if (m > 0) scores(l) += m
            tmp(l) = 0
            t += 1
          }
        }
      }
      c += 1
    }
    scores
  }
}

/** Native language-ID expression over [[LangModel]] — a codegen'd two-pass
  * classify per row, no UDF, weights static.
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"lang_id needs a string column, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(input: Any): Any =
    LangModel.classify(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.expr.LangModel.classify($c)")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** `lang_id(text, maxLangs)` — [[LangModel.classifyTop]] as a codegen'd
  * expression: up to `maxLangs` comma-joined ISO 639-1 codes, primary
  * first (the cc-index `languages` field shape — the same classifier
  * [[graft.sources.Warc.indexWarc]] runs, exposed so config-only corpus
  * curation can produce the identical multi-code column).
  * `LangIdTopExpr(c, 1)` equals [[LangIdExpr]] by construction.
  */
case class LangIdTopExpr(child: Expression, maxLangs: Int)
    extends UnaryExpression {
  require(maxLangs >= 1, s"lang_id maxLangs must be >= 1, got $maxLangs")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"lang_id needs a string column, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(input: Any): Any =
    LangModel.classifyTop(input.asInstanceOf[UTF8String], maxLangs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.expr.LangModel.classifyTop($c, $maxLangs)")

  override protected def withNewChildInternal(newChild: Expression): LangIdTopExpr =
    copy(child = newChild)
}

/** ISO 639-1 → 639-3 re-speller for [[LangModel]] code strings, single
  * (`en` → `eng`) or comma-joined (`fr,en` → `fra,eng`) — the published
  * cc-index `languages` spelling. Unknown codes (incl. `und`) pass
  * through unchanged: a join key must never vanish.
  */
object LangIso639 {
  /** [[LangModel.Langs]]' ISO 639-1 codes mapped to ISO 639-2/3 T codes. */
  val Mapping: Map[String, String] = Map(
    "en" -> "eng", "es" -> "spa", "de" -> "deu", "fr" -> "fra",
    "pt" -> "por", "it" -> "ita", "nl" -> "nld", "sv" -> "swe",
    "da" -> "dan", "no" -> "nor", "fi" -> "fin", "pl" -> "pol",
    "cs" -> "ces", "ro" -> "ron", "hu" -> "hun", "tr" -> "tur",
    "id" -> "ind", "vi" -> "vie", "ru" -> "rus", "uk" -> "ukr",
    "el" -> "ell", "ar" -> "ara", "he" -> "heb", "hi" -> "hin",
    "th" -> "tha", "zh" -> "zho", "ja" -> "jpn", "ko" -> "kor")

  def convert(codes: UTF8String): UTF8String = {
    if (codes == null) return null
    val s = codes.toString
    val parts = s.split(",", -1)
    val sb = new java.lang.StringBuilder(s.length + parts.length)
    var i = 0
    while (i < parts.length) {
      if (i > 0) sb.append(',')
      sb.append(Mapping.getOrElse(parts(i), parts(i)))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `iso639_3(codes)` — [[LangIso639.convert]] as a codegen'd expression. */
case class Iso6393Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"iso639_3 needs a string column, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "iso639_3"
  override protected def nullSafeEval(input: Any): Any =
    LangIso639.convert(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.expr.LangIso639.convert($c)")
  override protected def withNewChildInternal(newChild: Expression): Iso6393Expr =
    copy(child = newChild)
}
