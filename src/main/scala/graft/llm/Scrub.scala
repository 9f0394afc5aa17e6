package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII/URL scrubbing — the masking stage of an LLM curation pipeline
  * (C4/RefinedWeb-style cleanup): URLs, e-mail addresses, and IPv4
  * literals are replaced with stable placeholder tokens so downstream
  * dedup/fingerprinting doesn't key on volatile identifiers and the
  * training corpus doesn't memorize them.
  *
  * Pure row-local `regexp_replace` chains — no shuffle, fully
  * codegen'd, and the patterns avoid constructs whose semantics differ
  * between Java regex (Spark) and RE2 (the DuckDB oracle): no
  * lookaround, no backreferences. */
object Scrub {

  val UrlPattern = "(https?://|www\\.)\\S+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  def maskUrls(text: Column, token: String = "<URL>"): Column =
    regexp_replace(text, UrlPattern, token)

  def maskEmails(text: Column, token: String = "<EMAIL>"): Column =
    regexp_replace(text, EmailPattern, token)

  def maskIpv4(text: Column, token: String = "<IP>"): Column =
    regexp_replace(text, Ipv4Pattern, token)

  /** Full scrub: masked text plus per-kind match counts (the counts
    * feed curation telemetry and let a gate drop identifier-dense
    * documents). Order matters and is fixed: URLs first (an URL may
    * contain '@' or dotted quads), then e-mails, then bare IPs. */
  def scrub(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_urls", size(regexp_extract_all(col(textCol), lit(UrlPattern), lit(0))))
      .withColumn("__t1", maskUrls(col(textCol)))
      .withColumn("n_emails", size(regexp_extract_all(col("__t1"), lit(EmailPattern), lit(0))))
      .withColumn("__t2", maskEmails(col("__t1")))
      .withColumn("n_ips", size(regexp_extract_all(col("__t2"), lit(Ipv4Pattern), lit(0))))
      .withColumn("scrubbed", maskIpv4(col("__t2")))
      .drop("__t1", "__t2")
}
