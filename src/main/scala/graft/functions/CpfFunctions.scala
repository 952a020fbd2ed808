package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Brazilian CPF (tax id) validation/repair as pure Column expressions.
  *
  * Reference semantics: CPFCleaner (patchwork.py:607-726) with the mod-11
  * double check digit (`_validate_digits`, patchwork.py:611-621):
  *   - strip `.` and `-` separators
  *   - reject values containing non-digits after stripping
  *   - left-pad with zeros to 11 digits
  *   - reject all-same-digit values (000... through 999...)
  *   - verify both check digits, else null
  *
  * Everything is expression-composed (substring/cast arithmetic) — no UDF —
  * so the whole check stays inside whole-stage codegen at any scale.
  */
object CpfFunctions {

  /** Digits-only form: separators stripped, zero-padded to 11; values
    * longer than 11 digits keep the FIRST 11, matching the reference's
    * `numeric_chars[:11]` truncation (patchwork.py:607-726) rather than
    * rejecting. Null when the stripped value still contains non-digits
    * or is empty. */
  def cpfNormalize(c: Column): Column = {
    val stripped = translate(c, ".-", "")
    val digitsOnly = stripped.rlike("^[0-9]+$")
    when(digitsOnly, lpad(substring(stripped, 1, 11), 11, "0"))
      .otherwise(lit(null))
  }

  private def digit(c: Column, i: Int): Column =
    substring(c, i, 1).cast("int")

  /** Mod-11 check digit over positions 1..n with weights (n+1)..2:
    * dv = (sum(d_i * (n+2-i)) * 10) % 11 % 10  (patchwork.py:611-621). */
  private def checkDigit(c: Column, n: Int): Column = {
    val s = (1 to n).map(i => digit(c, i) * lit(n + 2 - i))
      .reduce(_ + _)
    s * lit(10) % lit(11) % lit(10)
  }

  /** True iff an 11-digit normalized CPF has valid check digits and is not
    * an all-same-digit sequence. Input must already be normalized. */
  def cpfChecksumOk(c: Column): Column = {
    val allSame = c === repeat(substring(c, 1, 1), 11)
    !allSame &&
      checkDigit(c, 9) === digit(c, 10) &&
      checkDigit(c, 10) === digit(c, 11)
  }

  /** Full repair: normalized value when valid, null otherwise
    * (CPFCleaner's cleaned output). */
  def cpfClean(c: Column): Column = {
    val norm = cpfNormalize(c)
    when(norm.isNotNull && cpfChecksumOk(norm), norm).otherwise(lit(null))
  }

  /** Validation predicate over raw input. */
  def cpfIsValid(c: Column): Column = cpfClean(c).isNotNull

  /** Display mask xxx.xxx.xxx-xx over an 11-digit normalized CPF (the
    * inverse of cpfNormalize's stripping); null for anything else. */
  def cpfFormat(c: Column): Column =
    when(c.rlike("^[0-9]{11}$"),
      concat(substring(c, 1, 3), lit("."), substring(c, 4, 3), lit("."),
        substring(c, 7, 3), lit("-"), substring(c, 10, 2)))
}
