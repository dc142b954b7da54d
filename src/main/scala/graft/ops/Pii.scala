package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII detection and redaction — the privacy pass every training-data
 * pipeline runs before export (scan for identifier-shaped strings,
 * count them per category, and rewrite them to typed placeholders).
 *
 * Detection is shape-based (regex), deliberately: at corpus scale the
 * scan must be a pure map-side projection, and the regex dialect is
 * restricted to the RE2-compatible subset (character classes, bounded
 * quantifiers, `\b` word boundaries — no lookaround) so the identical
 * pattern strings run on Spark (Java regex) and any RE2 engine with
 * the same matches. Shape-based means `1.2.3.4`-style version strings
 * DO count as IPv4 hits — the operator reports candidate identifiers,
 * and precision tuning belongs to the pattern list, not the plumbing.
 *
 * Scale notes: zero shuffle — `regexp_extract_all`/`regexp_replace`
 * are codegen'd row-local expressions, so the scan runs at parquet
 * read speed and composes with any downstream filter (e.g. route
 * `n_pii > 0` rows to a quarantine sink). Category patterns are
 * disjoint by construction (different separator shapes), so redaction
 * order cannot cascade.
 *
 * Reference scope: the reference engine has no privacy pass; this is
 * part of the training-pipeline surface built on the same kernels as
 * the text-analysis operators.
 */
object Pii {

  /** (category, RE2-safe pattern, redaction placeholder). */
  val categories: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("card", "\\b\\d{4} \\d{4} \\d{4} \\d{4}\\b", "<CARD>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Per-category match count for one text column. */
  def countCol(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** The text with every category rewritten to its placeholder. */
  def redactCol(text: Column): Column =
    categories.foldLeft(text) { case (c, (_, p, repl)) =>
      regexp_replace(c, lit(p), lit(repl))
    }

  /**
   * Scan + redact in one projection: per-record category counts, the
   * total, and the redacted text. Keyed by `idCol`; row-local, so the
   * plan is a single whole-stage-codegen map over the scan.
   */
  def scanRedact(records: DataFrame, idCol: String = "rec_id",
      textCol: String = "text"): DataFrame = {
    val counts = categories.map { case (n, p, _) =>
      countCol(col(textCol), p).as(s"n_$n")
    }
    val total = categories.map { case (n, _, _) => col(s"n_$n") }
      .reduce(_ + _).as("n_pii")
    records
      .select((col(idCol) +: counts :+ redactCol(col(textCol)).as("redacted")): _*)
      .withColumn("n_pii", total)
  }
}
