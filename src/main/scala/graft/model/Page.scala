package graft.model

import java.sql.Timestamp

/** The unit of data for the whole engine: one Common-Crawl-style page.
  *
  * Shape mandated by the input hint (BASELINE.json:15):
  * `(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)`.
  * Mirrors the reference's datatrove `Document` (text + id + metadata — see
  * /root/reference/datatrove/1_local_language_and_filter.py:48-55) but with
  * the metadata dict flattened into explicit, Catalyst-prunable columns.
  */
case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** Per-page pipeline verdict. `drop_stage` is the FIRST stage that dropped
  * the page (reference semantics: a doc dropped at stage k never reaches
  * stage k+1 — /root/reference/datatrove/findweb.py:90-115), or null if kept.
  * `scrubbed_text` is the byte-exact post-C4/PII/toxicity text for kept rows.
  */
case class PageResult(
    url: String,
    warc_ts: Timestamp,
    lang: String,
    lang_pred: String,
    lang_prob: Double,
    keep: Boolean,
    drop_stage: String,
    scrubbed_text: String,
    perplexity: Double,
    n_tokens: Int
)

/** Canonical stage names, ordered as the reference pipeline runs them
  * (/root/reference/datatrove/findweb.py:90-115 for 1..5, minhash stages
  * at findweb.py:130-232; exact dedup is the utils/ tool family,
  * /root/reference/utils/dedup_large_csv.py).
  */
object DropStage {
  /** URL/domain blocklist filter — runs before everything else, like the
    * reference's URLFilter position in the datatrove stack
    * (findweb.py:12). Off by default (empty blocklist) to preserve
    * reference label parity.
    */
  val UrlFilter   = "0_url_filter"
  /** Robots meta opt-out (`noindex`/`none`) — crawl compliance, north-rule
    * extension; off by default (PipelineConfig.respectRobots).
    */
  val Robots      = "0_robots_noindex"
  val NonEnglish  = "1_non_english"
  val GopherRep   = "2_gopher_repetition"
  val GopherQual  = "3_gopher_quality"
  val C4          = "4_c4"
  val FineWeb     = "5_fineweb"
  val ExactDup    = "6_exact_dup"
  val MinhashDup  = "7_minhash_dup"
  val Perplexity  = "8_perplexity"
  val all: Seq[String] = Seq(UrlFilter, Robots, NonEnglish, GopherRep,
    GopherQual, C4, FineWeb, ExactDup, MinhashDup, Perplexity)
}
