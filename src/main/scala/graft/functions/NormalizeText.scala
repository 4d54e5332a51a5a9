package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization in ONE pass: Unicode NFC composition,
  * locale-independent lowercasing, C0/C1 control characters dropped,
  * and whitespace runs collapsed to single spaces with the ends
  * trimmed — the cleanup stage that runs BEFORE tokenization, dedup
  * and fingerprinting so that byte-level variants ("e"+combining
  * accent vs "é", CRLF vs space runs, stray controls) hash and shingle
  * identically.
  *
  * Why native: the composable form chains four regexp/udf passes, each
  * re-walking (and re-allocating) the string interpreted. This is a
  * per-row projection inside whole-stage codegen; the NFC pass is
  * skipped entirely when `Normalizer.isNormalized` says the input
  * already is (the overwhelmingly common case for real corpora).
  *
  * Determinism: NFC is a Unicode-stable algorithm and lowercasing uses
  * the locale-independent per-code-point mapping, so the output is a
  * pure function of the input bytes on every JVM; the DuckDB oracle
  * (`nfc_normalize` + `lower` + regexp collapse) agrees on the ASCII
  * driver corpus, and NormalizeTextSpec pins the non-ASCII semantics
  * in-JVM.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = GraftFunctions.NormalizeTextName

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeText.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {

  /** Static entry point shared by eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val raw = s.toString
    val nfc =
      if (Normalizer.isNormalized(raw, Normalizer.Form.NFC)) raw
      else Normalizer.normalize(raw, Normalizer.Form.NFC)
    val out = new java.lang.StringBuilder(nfc.length)
    var pendingSpace = false
    var emitted = false
    var i = 0
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      if (Character.isWhitespace(cp)) pendingSpace = true
      else if (Character.isISOControl(cp)) () // drop C0/C1 controls
      else {
        if (pendingSpace && emitted) out.append(' ')
        pendingSpace = false
        emitted = true
        // locale-independent per-code-point lowercase (what String
        // .toLowerCase(Locale.ROOT) applies, minus locale lookups)
        out.appendCodePoint(Character.toLowerCase(cp))
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(out.toString)
  }
}
