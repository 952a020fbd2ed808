package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Web-crawl text arrives in mixed normalization forms: the same visible
  * string can be composed ("é", U+00E9) or decomposed ("e"+U+0301), and
  * compatibility variants (ligatures, full-width forms, superscripts)
  * explode the token space. Every dedup/fingerprint/join key over raw
  * text silently misses equal-but-differently-encoded pairs unless the
  * text is normalized first, so this belongs at the very front of a
  * training-data pipeline — before `rolling_hash`, MinHash shingles,
  * or any exact-match groupBy key.
  *
  * Reference scope: the reference's cleaning layer is byte/accent-level
  * only (custom_functions.py convert_gender_to_string-style scalar maps);
  * Unicode canonicalization is a beyond-reference addition motivated by
  * the LLM-pipeline brief. NFC is oracle-checked (DuckDB `nfc_normalize`);
  * the compatibility forms are spec-pinned with published UAX#15 vectors.
  *
  * The hot path is a single static call over the value; `Normalizer`
  * itself fast-paths already-normalized ASCII (`isNormalized` is O(n)
  * with no allocation), which is the overwhelming case in real corpora,
  * so the expression stays cheap at 100 TB.
  */
object NormalizeExpr {

  /** Parse once at plan time; generated code references the enum by
    * field name so per-row cost is just the normalize call. */
  def formOf(name: String): Normalizer.Form = name.toUpperCase match {
    case "NFC"  => Normalizer.Form.NFC
    case "NFD"  => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other  => throw new IllegalArgumentException(
      s"unicode_normalize: unknown form '$other' (want NFC|NFD|NFKC|NFKD)")
  }

  /** Static helper referenced by both interpreted eval and codegen. */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  /** Column-level entry point. */
  def unicode_normalize(c: Column, form: String = "NFC"): Column =
    GraftShim.columnOf(UnicodeNormalize(GraftShim.expressionOf(c), form))
}

case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  // validate eagerly so a bad form fails at plan time, not per row
  @transient private lazy val parsedForm = NormalizeExpr.formOf(form)

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    NormalizeExpr.normalize(input.asInstanceOf[UTF8String], parsedForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formName = parsedForm.name
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NormalizeExpr.normalize($c, java.text.Normalizer.Form.$formName)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}
