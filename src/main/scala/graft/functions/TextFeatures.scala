package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text featurization: the integer counts and the language pick
  * behind the quality/lang-id operators, as a native expression.
  *
  * The declarative formulations re-tokenize and re-scan the text once per
  * ratio (and `qualityScore` references each ratio more than once inside
  * `when` chains, which Catalyst's subexpression elimination does not
  * always collapse across conditional branches) — every pass an
  * interpreted higher-order evaluation. At corpus scale, per-document
  * featurization is the hot loop of a training-data pipeline; this
  * expression computes everything in one traversal and stays inside
  * whole-stage codegen.
  *
  * Only INTEGER counts (and the lang string) are produced here — the
  * ratio/score arithmetic remains declarative on top, so the doubles the
  * DuckDB oracle replays are bit-identical to the previous formulation.
  */
final case class TextFeatures(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextFeatures.schema
  override def prettyName: String = "graft_text_features"

  override protected def nullSafeEval(input: Any): Any =
    TextFeatures.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextFeatures$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextFeatures =
    copy(child = newChild)
}

object TextFeatures {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_upper", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("lang_pred", StringType, nullable = false)))

  // same lists as TextStats — semantics pinned by the DuckDB oracle
  private val stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "of", "and", "to", "in", "a", "is", "that", "it", "was",
      "for", "on", "are", "as", "with", "at", "be", "this", "have", "or")
      .foreach(s.add)
    s
  }

  private val langProfiles: Array[(String, java.util.HashSet[String])] = Array(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "por", "que", "una", "para"),
    "it" -> Seq("il", "la", "di", "e", "che", "non", "per", "una", "sono", "con"),
    "pt" -> Seq("o", "a", "de", "e", "que", "do", "da", "em", "um", "para"),
    "nl" -> Seq("de", "het", "een", "en", "van", "is", "dat", "op", "te", "niet")
  ).map { case (l, ws) =>
    val s = new java.util.HashSet[String]()
    ws.foreach(s.add)
    (l, s)
  }

  private val punct = java.util.regex.Pattern.compile("[\\p{Punct}]")

  def compute(input: UTF8String): InternalRow = {
    val text = input.toString
    // per-code-point counts (matches length()/regexp_replace code-point
    // semantics for the supplementary-plane case)
    var nChars = 0; var nPunct = 0; var nDigit = 0; var nUpper = 0
    var ci = 0
    while (ci < text.length) {
      val cp = text.codePointAt(ci)
      nChars += 1
      if (cp >= '0' && cp <= '9') nDigit += 1
      if (cp >= 'A' && cp <= 'Z') nUpper += 1
      if (cp < 128 && punct.matcher(String.valueOf(cp.toChar)).matches()) nPunct += 1
      ci += Character.charCount(cp)
    }
    // token stats over the UNLOWERED text (token boundaries are case-
    // insensitive, so counts match the lowered variants)
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    var sumWordLen = 0L
    var nStop = 0
    val langSeen: Array[java.util.HashSet[String]] =
      Array.fill(langProfiles.length)(new java.util.HashSet[String]())
    toks.foreach { t =>
      sumWordLen += t.codePointCount(0, t.length)
      val lt = t.toLowerCase
      if (stopwords.contains(lt)) nStop += 1
      var li = 0
      while (li < langProfiles.length) {
        if (langProfiles(li)._2.contains(lt)) langSeen(li).add(lt)
        li += 1
      }
    }
    // greatest((hits, lang)) — ties break toward the LARGER lang string,
    // mirroring the struct comparison in the declarative greatest(...)
    var bestHits = -1; var bestLang = ""
    var li = 0
    while (li < langProfiles.length) {
      val h = langSeen(li).size
      val l = langProfiles(li)._1
      if (h > bestHits || (h == bestHits && l.compareTo(bestLang) > 0)) {
        bestHits = h; bestLang = l
      }
      li += 1
    }
    val lang = if (bestHits > 0) bestLang else "und"
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      nChars, toks.length, sumWordLen, nPunct, nDigit, nUpper, nStop,
      UTF8String.fromString(lang)))
  }

  def textFeatures(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      TextFeatures(org.apache.spark.sql.GraftSqlBridge.expressionOf(text)))
}
