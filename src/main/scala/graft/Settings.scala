package graft

/** Engine constants mirroring the reference's configuration.
  *
  * Sources (all in /root/reference/):
  *  - DOMAIN_REGION_MAP: spark/jobs/silver_batch_job.py:28-51
  *  - RISK_THRESHOLDS:   spark/jobs/gold_batch_job.py:33-38,
  *                       config/settings.py:136-150
  *  - anomaly thresholds: spark/jobs/silver_batch_job.py:126-131
  *  - DQ thresholds:      spark/jobs/dq/dq_checks.py (completeness 0.95,
  *                        accuracy 0.99, timeliness P95 <= 180s)
  */
object Settings {
  val SchemaVersion = "1.0.0"

  /** domain -> (region, language); 18 target wikipedias. */
  val DomainRegionMap: Seq[(String, String, String)] = Seq(
    ("zh.wikipedia.org", "asia_pacific", "zh"),
    ("ja.wikipedia.org", "asia_pacific", "ja"),
    ("ko.wikipedia.org", "asia_pacific", "ko"),
    ("vi.wikipedia.org", "asia_pacific", "vi"),
    ("id.wikipedia.org", "asia_pacific", "id"),
    ("th.wikipedia.org", "asia_pacific", "th"),
    ("de.wikipedia.org", "europe", "de"),
    ("fr.wikipedia.org", "europe", "fr"),
    ("it.wikipedia.org", "europe", "it"),
    ("es.wikipedia.org", "europe", "es"),
    ("pl.wikipedia.org", "europe", "pl"),
    ("nl.wikipedia.org", "europe", "nl"),
    ("ru.wikipedia.org", "europe", "ru"),
    ("en.wikipedia.org", "americas", "en"),
    ("pt.wikipedia.org", "americas", "pt"),
    ("ar.wikipedia.org", "middle_east", "ar"),
    ("fa.wikipedia.org", "middle_east", "fa"),
    ("he.wikipedia.org", "middle_east", "he"))

  /** Anomaly thresholds (silver_batch_job.py:126-131). */
  val LargeDeletionThreshold: Int = -5000
  val LargeAdditionThreshold: Int = 50000

  /** Risk scoring thresholds (gold_batch_job.py:33-38). */
  val RiskEditsPerHour   = 50.0
  val RiskLargeDeletions = 3
  val RiskAnonymousRatio = 0.5

  /** DQ thresholds (dq_checks.py). */
  val CompletenessThreshold = 0.95
  val UniquenessThreshold   = 0.95
  val AccuracyThreshold     = 0.99
  val TimelinessP95Seconds  = 180.0
  val MinActivityForRisk    = 5
}
