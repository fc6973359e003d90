package graft.wiki

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test corpus derived from FIXTURES.md (the reference's only concrete
  * inputs: scripts/test_kafka_messages.py:27-127 + README sample).
  */
object FixtureData {

  final case class KafkaRecord(topic: String, partition: Int, offset: Long,
                               timestamp: Timestamp, value: String)

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Build a producer envelope: data is a JSON *string*. */
  def envelope(id: Option[String], data: String,
               ingestedAt: String = "2026-01-01T10:00:05Z"): String = {
    val idPart = id.map(i => s""""id": "$i"""").getOrElse(""""id": null""")
    s"""{$idPart, "data": "${esc(data)}", "_processing": {"ingested_at": "$ingestedAt", "producer_version": "1.0.0-test", "environment": "test"}}"""
  }

  // 1704200400 = 2024-01-02 13:00:00 UTC
  val editEvent: String =
    """{"id": 1234567890, "type": "edit", "namespace": 0, "title": "Python_(programming_language)", "comment": "Updated syntax examples", "timestamp": 1704200400, "user": "TestUser123", "bot": false, "length": {"old": 45000, "new": 45150}, "revision": {"old": 123456789, "new": 123456790}, "meta": {"domain": "en.wikipedia.org", "dt": "2024-01-02T13:00:00Z", "id": "test-event-001"}, "server_name": "en.wikipedia.org", "wiki": "enwiki"}"""

  // same hour, new page, +5000 bytes
  val newPageEvent: String =
    """{"id": 1234567891, "type": "new", "namespace": 0, "title": "New_Article", "comment": "created", "timestamp": 1704201000, "user": "SecondUser", "bot": false, "length": {"old": 0, "new": 5000}, "revision": {"old": 0, "new": 123456791}, "meta": {"domain": "en.wikipedia.org", "dt": "2024-01-02T13:10:00Z", "id": "test-event-002"}, "server_name": "en.wikipedia.org", "wiki": "enwiki"}"""

  // anonymous IPv4 user, large deletion (-19000), ja domain
  val anonDeleteEvent: String =
    """{"id": 1234567892, "type": "edit", "namespace": 0, "title": "Tokyo", "comment": "removed section", "timestamp": 1704204600, "user": "192.168.1.1", "bot": false, "length": {"old": 20000, "new": 1000}, "revision": {"old": 223456789, "new": 223456790}, "meta": {"domain": "ja.wikipedia.org", "dt": "2024-01-02T14:10:00Z", "id": "test-event-003"}, "server_name": "ja.wikipedia.org", "wiki": "jawiki"}"""

  // malformed: no meta.id, no type, no length → surrogate key + coalesce paths
  val malformedEvent: String =
    """{"id": 999, "namespace": 0, "title": "Mystery", "timestamp": 1704204700, "user": "GhostUser", "meta": {"domain": "de.wikipedia.org", "dt": "2024-01-02T14:11:40Z"}, "server_name": "de.wikipedia.org", "wiki": "dewiki"}"""

  // no domain, no meta.id → silver is_valid=false path
  val noDomainEvent: String =
    """{"id": 777, "type": "log", "timestamp": 1704204800, "user": "NoDomainUser", "wiki": "xxwiki"}"""

  def kafkaRecords: Seq[KafkaRecord] = {
    def ts(s: String) = Timestamp.valueOf(s)
    Seq(
      KafkaRecord("raw-events", 0, 0L, ts("2024-01-02 13:00:05"),
        envelope(Some("test-event-001"), editEvent)),
      KafkaRecord("raw-events", 0, 1L, ts("2024-01-02 13:10:05"),
        envelope(Some("test-event-002"), newPageEvent)),
      KafkaRecord("raw-events", 1, 0L, ts("2024-01-02 14:10:05"),
        envelope(Some("test-event-003"), anonDeleteEvent)),
      KafkaRecord("raw-events", 1, 1L, ts("2024-01-02 14:11:45"),
        envelope(None, malformedEvent)),
      // exact duplicate of the first record (SSE reconnect replay)
      KafkaRecord("raw-events", 0, 2L, ts("2024-01-02 13:00:06"),
        envelope(Some("test-event-001"), editEvent)),
      KafkaRecord("raw-events", 1, 2L, ts("2024-01-02 14:13:00"),
        envelope(None, noDomainEvent)))
  }

  def kafkaDf(spark: SparkSession): DataFrame = {
    val sp = spark
    import sp.implicits._
    kafkaRecords.toDF()
  }
}
