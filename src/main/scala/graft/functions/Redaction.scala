package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for text corpora — emails, phone numbers, and CPF-shaped
  * ids replaced with stable placeholder tokens, plus per-category match
  * counts for audit.
  *
  * Patterns stay in the conservative regex subset shared by the JVM and
  * RE2-family engines (no backrefs, no lookaround) so an external oracle
  * replays them identically. Everything is codegen'd `regexp_replace` /
  * `regexp_extract_all` — per-row, shuffle-free, scale-neutral.
  */
object Redaction {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** +55-style international or bare 8-11 digit runs with separators. */
  val PhonePattern = "\\+[0-9]{2} [0-9]{2} [0-9]{4,5}-[0-9]{4}"
  val CpfPattern = "[0-9]{3}\\.[0-9]{3}\\.[0-9]{3}-[0-9]{2}"

  def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  def redactEmails(c: Column): Column =
    regexp_replace(c, EmailPattern, "<EMAIL>")
  def redactPhones(c: Column): Column =
    regexp_replace(c, PhonePattern, "<PHONE>")
  def redactCpfs(c: Column): Column =
    regexp_replace(c, CpfPattern, "<CPF>")

  /** All categories, emails first (an email can contain digit runs; the
    * fixed order makes the composition deterministic). */
  def redactAll(c: Column): Column =
    redactCpfs(redactPhones(redactEmails(c)))
}
