package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction — the scrubbing pass every production
  * training-data pipeline runs before anything else sees the text
  * (reference scope: grafeo-memory stores raw user messages verbatim;
  * a 100 TB corpus built from such logs must redact before training).
  *
  * Five classic structured-PII categories, each a single regex in the
  * RE2 ∩ java.util.regex COMMON SUBSET (no backreferences, no
  * lookaround) so the DuckDB oracle compiles the very same automaton:
  * emails, credit-card numbers, SSNs, US phone numbers, IPv4s.
  * Real deployments extend [[Categories]] with locale packs; the
  * operator shape does not change.
  *
  * Scale shape: pure per-row `regexp_replace`/`regexp_extract_all`
  * over builtin codegen'd expressions — no UDF, no shuffle, no state.
  * At 100 TB this pass fuses into whichever scan feeds it (one
  * WholeStageCodegen span with the quality/langid kernels); cost is
  * linear CPU with zero exchange, which is exactly what a scrub pass
  * must be.
  */
object PiiOps {

  /** The four NUMERIC patterns (CC/SSN/Phone/IPv4) are `\b`-anchored so
    * a digit run embedded in a longer token (an id, a hash) is NOT
    * treated as PII — redaction must not corrupt non-PII content. Email
    * is unanchored by design: its character classes span word and
    * non-word chars, so `\b` has no clean placement there.
    */
  val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val CreditCard = "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b"
  val Ssn = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val Phone = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** (category, pattern, replacement) in application order. The five
    * patterns are pairwise non-overlapping on any input (group shapes
    * 3-3-4 / 3-2-4 / 4-4-4-4 / dotted octets / @-anchored are mutually
    * exclusive), so order only matters for determinism, not semantics.
    */
  val Categories: Seq[(String, String, String)] = Seq(
    ("email", Email, "<EMAIL>"),
    ("cc", CreditCard, "<CC>"),
    ("ssn", Ssn, "<SSN>"),
    ("phone", Phone, "<PHONE>"),
    ("ip", Ipv4, "<IP>"))

  /** Text with every category match replaced by its placeholder token
    * (Spark's regexp_replace replaces ALL occurrences; the oracle's
    * regexp_replace uses the 'g' flag for the same semantics).
    */
  def redact(text: Column): Column =
    Categories.foldLeft(text) { case (c, (_, re, tok)) =>
      regexp_replace(c, re, tok)
    }

  /** Match count of one pattern (counted on the UNREDACTED text, so
    * category counts are independent of application order).
    */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** True when the text contains no match of any category — the gate a
    * strict pipeline uses to drop rather than redact.
    */
  def piiFree(text: Column): Column =
    Categories.map { case (_, re, _) => matchCount(text, re) === 0L }
      .reduce(_ && _)
}
