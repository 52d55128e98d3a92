package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training-data curation — THE privacy gate a corpus
  * pipeline runs before text reaches a tokenizer (emails, phone numbers,
  * IPs, SSN-shaped ids → placeholder tokens).
  *
  * ONE rule table and ONE operator (round-16 consolidation — two
  * divergent "the privacy gate" implementations were a trap for a
  * consumer choosing one): every pattern lives in the named-constant
  * table below, and [[redact]] is the single engine. The two registered
  * surfaces are thin parameterizations of it —
  * [[piiScrub]] (q107: the 4-rule superset, `<EMAIL>`-style
  * placeholders, counts on the sequentially-rewritten state) and
  * [[graft.operators.Curation.piiRedact]] (q276: email/intl-phone/IPv4,
  * `[EMAIL]`-style, counts on the ORIGINAL text) — so they cannot
  * silently drift.
  *
  * Patterns are RE2-safe (character classes, bounded repeats, `\b`; no
  * lookaround or backreferences) so the exact same regex runs in Spark's
  * Java engine and the DuckDB oracle. Rules apply IN ORDER.
  *
  * COUNT CONVENTIONS — the one real semantic fork, so it is a parameter:
  *
  *  - `countsOnOriginal = false` (replacement counts): each rule counts
  *    on the text state it actually rewrites, so `n_<rule>` equals the
  *    number of replacements performed — an email's digits can't be
  *    double-counted by the later IP rule (it's already `<EMAIL>` by
  *    then). This is the convention for "how much did the scrub edit".
  *  - `countsOnOriginal = true` (detection counts): every rule counts on
  *    the ORIGINAL text — "how much PII did the document CONTAIN",
  *    independent of rule order. A pattern NESTED inside an
  *    earlier-replaced match (e.g. the IPv4-shaped domain in
  *    `user@10.2.3.4`) is counted but never separately replaced, so
  *    count totals can exceed placeholder occurrences in the clean
  *    text — correct for detection, and the documented reason the two
  *    conventions exist instead of one.
  *
  * Under BOTH conventions placeholders contain no digits, so an earlier
  * replacement can never CREATE a later match.
  *
  * Scale posture: pure codegen'd projections (regexp_replace /
  * regexp_extract_all) — linear per row, no join, no aggregate, no
  * shuffle (plan-pinned): the operator scales with scan bandwidth, the
  * shape a 100 TB privacy pass must have.
  */
object Redact {

  // ---------------- THE pattern table (single source of truth) ----
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  /** US 3-3-4 with `-`/`.`/space separators. */
  val PhoneUsRe = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
  /** Dashed 2-3-3-4 — the TPC-H `c_phone` shape. */
  val PhoneIntlRe = "\\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** (name, pattern, replacement) — the scrub superset, in application
    * order: SSN before phone (a 3-2-4 digit group would otherwise be
    * eaten as a malformed phone prefix); both before IPv4. */
  val piiRules: Seq[(String, String, String)] = Seq(
    ("email", EmailRe, "<EMAIL>"),
    ("ssn", SsnRe, "<SSN>"),
    ("phone", PhoneUsRe, "<PHONE>"),
    ("ipv4", Ipv4Re, "<IP>"))

  /** q276's parameterization: the detection-count convention's rule
    * set (rule names double as the output column suffixes). */
  val curationPiiRules: Seq[(String, String, String)] = Seq(
    ("emails", EmailRe, "[EMAIL]"),
    ("phones", PhoneIntlRe, "[PHONE]"),
    ("ips", Ipv4Re, "[IP]"))

  /** THE redaction engine: appends `redacted` (the text after every
    * rule applied in order) followed by one `n_<rule>` count column per
    * rule — `redacted` FIRST, the pre-consolidation public order a
    * positional consumer may depend on (round-16 advice). See the
    * object doc for the two count conventions. */
  def redact(df: DataFrame, text: Column,
             rules: Seq[(String, String, String)] = piiRules,
             countsOnOriginal: Boolean = false): DataFrame = {
    // states(i) = text after rules 0..i-1 — rule i counts on states(i)
    // (replacement convention) or on the original (detection convention)
    val states = rules.scanLeft(text) { case (t, (_, pat, repl)) =>
      regexp_replace(t, pat, repl)
    }
    rules.zip(states.init).foldLeft(df.withColumn("redacted", states.last)) {
      case (acc, ((name, pat, _), pre)) =>
        acc.withColumn(s"n_$name",
          size(regexp_extract_all(if (countsOnOriginal) text else pre,
            lit(pat), lit(0))).cast("long"))
    }
  }

  /** [[redact]] under the replacement-count convention with the scrub
    * superset — q107's surface. */
  def piiScrub(df: DataFrame, text: Column,
               rules: Seq[(String, String, String)] = piiRules): DataFrame =
    redact(df, text, rules, countsOnOriginal = false)
}
