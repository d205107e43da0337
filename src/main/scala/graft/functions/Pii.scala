package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass every published
  * web-scale curation pipeline runs before training (emails, IP
  * addresses, phone numbers; the Dolma/FineWeb rule family).
  *
  * Everything here is pure map-side column arithmetic over codegen'd
  * regexp kernels: zero shuffles, zero UDFs, no driver state — the scan
  * and the redact both ride inside whole-stage codegen next to whatever
  * else the pipeline computes in the same pass. At 100 TB that is the
  * only acceptable shape for a per-document scrub: it adds no stage
  * boundary and no memory beyond the regex automata.
  *
  * Pattern dialect contract: every regex below restricts itself to the
  * syntax that Java's `Pattern` (Spark) and RE2 (the DuckDB oracle)
  * interpret IDENTICALLY — explicit character classes, bounded
  * quantifiers, non-capturing groups, `\b` word boundaries; no
  * backreferences, no lookaround, no possessive quantifiers. The oracle
  * replays the same patterns verbatim, so a dialect divergence would
  * hash-mismatch immediately.
  */
object Pii {

  /** Local-part @ domain.tld — deliberately pragmatic (the RFC 5322
    * grammar is not regular); matches the address shapes that occur in
    * crawled text. */
  val emailRe: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4. Octet values are not range-checked (999.0.0.1
    * matches) — the standard curation trade: range arithmetic in a
    * regex triples its size for a vanishingly rare false positive, and
    * a redactor that over-redacts a malformed quad is strictly safer
    * than one that under-redacts. */
  val ipv4Re: String =
    "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** NANP-style phone: 3-3-4 digit groups with `-`, `.` or space
    * separators (optionally parenthesised area code). Runs AFTER the
    * IPv4 pass in [[redact]], so a dotted quad is already gone before
    * the dot-separated phone shape could see it. */
  val phoneRe: String =
    "(?:\\([0-9]{3}\\)[ ]?|[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}\\b"

  /** All three patterns with their replacement tags, in redaction
    * order: emails first (an address contains dots and digits that the
    * later patterns could otherwise nibble at), then IPs, then phones. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", emailRe, "<EMAIL>"),
    ("ipv4", ipv4Re, "<IP>"),
    ("phone", phoneRe, "<PHONE>"))

  /** Scan a corpus: doc id, one codegen'd `regexp_count` per pattern,
    * and the any-hit flag. Pure map-side. */
  def scan(docs: DataFrame, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame = {
    val counted = docs.select(
      (col(idCol) +: patterns.map { case (name, re, _) =>
        regexp_count(col(textCol), lit(re)).cast("long").as(s"n_$name")
      }): _*)
    counted.withColumn("has_pii",
      patterns.map { case (name, _, _) => col(s"n_$name") }
        .reduce(_ + _) > 0)
  }

  /** Redacted text column: the three global regexp_replace passes in
    * [[patterns]] order. Spark's regexp_replace replaces every
    * occurrence (the oracle needs RE2's explicit 'g' flag for the same
    * semantics). Idempotent: no replacement tag matches any pattern. */
  def redactCol(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, re, tag)) =>
      regexp_replace(c, lit(re), lit(tag))
    }

  /** Redact a corpus: id + scrubbed text. Map-side only. */
  def redact(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame =
    docs.select(col(idCol), redactCol(col(textCol)).as("redacted"))

  /** Deterministic synthetic PII traffic for fixtures whose text
    * carries none (the driver's word-soup documents): appends an email
    * to every 5th doc, a dotted quad to every 7th, a phone to every
    * 11th — all derived from the id, so the DuckDB oracle regenerates
    * the identical corpus with string concatenation. This is a TEST
    * harness for the scanner above, not a production operator: it
    * exists so the oracle comparison carries real match traffic
    * instead of vacuously agreeing on all-zeros. */
  def withSyntheticPii(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val id = col(idCol)
    val t0 = col(textCol)
    val t1 = when(id % 5 === 0,
      concat(t0, lit(" contact user"), id.cast("string"),
        lit("@example.com now"))).otherwise(t0)
    val t2 = when(id % 7 === 0,
      concat(t1, lit(" node 10."), (id % 256).cast("string"),
        lit(".0."), (id % 250).cast("string"), lit(" up")))
      .otherwise(t1)
    val t3 = when(id % 11 === 0,
      concat(t2, lit(" call 555-867-"),
        (lit(1000) + id % 9000).cast("string"), lit(" today")))
      .otherwise(t2)
    docs.withColumn(textCol, t3)
  }

  /** The DuckDB side of [[withSyntheticPii]] — the same deterministic
    * enrichment as one nested SQL expression over (doc_id, text),
    * shared by every oracle that scans or redacts the synthetic
    * traffic. Kept adjacent to the Scala builder above so the two
    * cannot drift silently. */
  def syntheticPiiSql(id: String = "doc_id",
                      text: String = "text"): String = {
    val t1 = s"CASE WHEN $id % 5 = 0 THEN $text || ' contact user' || " +
      s"CAST($id AS STRING) || '@example.com now' ELSE $text END"
    val t2 = s"CASE WHEN $id % 7 = 0 THEN ($t1) || ' node 10.' || " +
      s"CAST($id % 256 AS STRING) || '.0.' || " +
      s"CAST($id % 250 AS STRING) || ' up' ELSE ($t1) END"
    s"CASE WHEN $id % 11 = 0 THEN ($t2) || ' call 555-867-' || " +
      s"CAST(1000 + $id % 9000 AS STRING) || ' today' ELSE ($t2) END"
  }
}
