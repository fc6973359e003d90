package graft.wiki

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Injected time source. The reference couples transforms to wall
  * clock (`current_timestamp()`, `utcnow` lookbacks — SURVEY §7.4);
  * injecting the clock makes every transform deterministic under test.
  */
trait Clock {
  /** Processing-time column (replaces current_timestamp()). */
  def now: Column
}

object Clock {
  val system: Clock = new Clock {
    def now: Column = current_timestamp()
  }

  /** Fixed instant, e.g. "2026-01-01 10:30:00". */
  def fixed(iso: String): Clock = new Clock {
    def now: Column = to_timestamp(lit(iso))
  }
}
