package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data curation — the redaction pass a
  * corpus pipeline runs before text reaches a tokenizer (emails, phone
  * numbers, IPs, SSN-shaped ids → placeholder tokens).
  *
  * Patterns are RE2-safe (character classes, bounded repeats, `\b`; no
  * lookaround or backreferences) so the exact same regex runs in Spark's
  * Java engine and the DuckDB oracle. Rules apply IN ORDER, each counting
  * its matches on the text state it actually rewrites — so `n_<rule>` is
  * the number of replacements performed, and an email's digits can't be
  * double-counted by the later IP rule (it's already `<EMAIL>` by then).
  *
  * Scale posture: pure codegen'd projections (regexp_replace /
  * regexp_extract_all) — linear per row, no shuffle, no UDFs.
  */
object Redact {

  /** (name, pattern, replacement) — order matters; see class doc. */
  val piiRules: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("phone", "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b", "<PHONE>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"))

  /** Appends `redacted` plus one `n_<rule>` count column per rule.
    * SSN runs before phone (a 3-2-4 digit group would otherwise be
    * eaten as a malformed phone prefix); both run before IPv4. */
  def piiScrub(df: DataFrame, text: Column,
               rules: Seq[(String, String, String)] = piiRules): DataFrame = {
    val staged = rules.foldLeft(df.withColumn("redacted", text)) {
      case (acc, (name, pat, repl)) =>
        acc
          .withColumn(s"n_$name",
            size(regexp_extract_all(col("redacted"), lit(pat), lit(0))).cast("long"))
          .withColumn("redacted", regexp_replace(col("redacted"), pat, repl))
    }
    staged
  }
}
