package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction — the scrub pass every training-data
  * pipeline runs before text leaves the ingest tier (emails, phone
  * numbers, IP addresses, US-SSN-shaped ids → typed placeholder
  * tokens, plus per-document match counts for audit/filter rules).
  *
  * Scale shape: a PURE per-row projection over codegen'd
  * `regexp_replace`/`regexp_count` — zero shuffle, zero state; at
  * 100 TB it pipelines inside whole-stage codegen behind whatever
  * scan feeds it. Patterns are written in the RE2 ∩ java.util.regex
  * common dialect (no lookaround, no backrefs, explicit ASCII
  * classes, greedy-only quantifiers) so the DuckDB oracle replays
  * them byte-identically — and so the same set ports to any
  * RE2-based scrubber.
  *
  * Redaction order is fixed (EMAIL → SSN → IP → PHONE) and the
  * shapes are mutually non-overlapping (an SSN is 3-2-4 digits, a
  * phone 3-3-4; an IP is dot-separated, a phone dash/space), so the
  * composition is deterministic rather than order-lucky. Counts are
  * taken on the ORIGINAL text, independent of application order.
  */
object Pii {

  /** (kind, pattern, replacement) in application order. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("ip", "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b", "<IP>"),
    ("phone",
     "(\\+?[0-9]{1,3}[- ])?\\(?[0-9]{3}\\)?[- ][0-9]{3}[- ][0-9]{4}\\b",
     "<PHONE>"))

  /** Append `clean` (all PII kinds replaced by their tokens), one
    * `n_<kind>` long count per pattern, and the `n_pii` total. */
  def redact(df: DataFrame, textCol: String = "text"): DataFrame = {
    val counts = patterns.map { case (kind, re, _) =>
      s"n_$kind" -> regexp_count(col(textCol), lit(re)).cast("long")
    }
    val clean = patterns.foldLeft(col(textCol)) { case (c, (_, re, tok)) =>
      regexp_replace(c, lit(re), lit(tok))
    }
    df.withColumns(counts.toMap)
      .withColumn("clean", clean)
      .withColumn("n_pii", patterns.map(p => col(s"n_${p._1}")).reduce(_ + _))
  }

  /** DuckDB mirror: the `clean` SELECT expression over `textCol`.
    * DuckDB string literals keep backslashes verbatim, so the Java
    * pattern text embeds unchanged (RE2 reads the same escapes). */
  def mirrorClean(textCol: String): String =
    patterns.foldLeft(textCol) { case (e, (_, re, tok)) =>
      s"regexp_replace($e, '$re', '$tok', 'g')"
    }

  /** DuckDB mirror: one `n_<kind>` count expression per pattern. */
  def mirrorCounts(textCol: String): Seq[String] =
    patterns.map { case (kind, re, _) =>
      s"CAST(len(regexp_extract_all($textCol, '$re')) AS BIGINT) AS n_$kind"
    }
}
