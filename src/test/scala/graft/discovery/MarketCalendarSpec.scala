package graft.discovery

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the gap-classification branches of `market_calendar.py:425-494`
  * (classify_gap) and the >80h weekend splitting (:502-556). */
class MarketCalendarSpec extends SparkSpecBase {
  import spark.implicits._

  private def ms(iso: String): Long = java.time.Instant.parse(iso).toEpochMilli

  private def classify(start: String, end: String): String =
    Seq((ms(start), ms(end))).toDF("s", "e")
      .select(MarketCalendar.classifyGap(col("s"), col("e")).as("c"))
      .collect().head.getString(0)

  test("seamless under 5 seconds") {
    assert(classify("2024-03-06T10:00:00Z", "2024-03-06T10:00:04Z") === "seamless")
  }

  test("primary weekend pattern: Friday evening to Sunday open") {
    // Fri 2024-03-08 21:00 UTC -> Sun 2024-03-10 21:30 UTC (~48.5h)
    assert(classify("2024-03-08T21:00:00Z", "2024-03-10T21:30:00Z") === "weekend")
  }

  test("alternative weekend pattern: Saturday to Sunday open") {
    // Sat 2024-03-09 10:00 -> Sun 2024-03-10 20:00 (34h, within 24-50)
    assert(classify("2024-03-09T10:00:00Z", "2024-03-10T20:00:00Z") === "weekend")
  }

  test("Friday-evening gap NOT landing at Sunday open is not a weekend") {
    // Fri 21:00 -> Mon 12:00 (~63h) misses the Sunday<=22:00 end -> large
    assert(classify("2024-03-08T21:00:00Z", "2024-03-11T12:00:00Z") === "large")
  }

  test("holiday gap: >=20h containing Jan 1") {
    assert(classify("2023-12-31T10:00:00Z", "2024-01-01T10:00:00Z") === "holiday")
  }

  test("duration fallbacks: short / moderate / large") {
    assert(classify("2024-03-06T10:00:00Z", "2024-03-06T10:20:00Z") === "short")
    assert(classify("2024-03-06T10:00:00Z", "2024-03-06T12:00:00Z") === "moderate")
    assert(classify("2024-03-06T10:00:00Z", "2024-03-06T20:00:00Z") === "large")
  }

  test("24/7 markets skip the weekend/holiday branches") {
    val df = Seq((ms("2024-03-08T21:00:00Z"), ms("2024-03-10T21:30:00Z")))
      .toDF("s", "e")
      .select(MarketCalendar.classifyGap(col("s"), col("e"),
        weekendClosure = false).as("c"))
    assert(df.collect().head.getString(0) === "large")
  }

  test("gap splitting: <=80h passes through; multi-weekend outage splits") {
    val s1 = ms("2024-03-08T21:00:00Z"); val e1 = ms("2024-03-10T21:00:00Z")
    assert(MarketCalendar.splitGapAtWeekendBoundaries(s1, e1) === Seq((s1, e1)))

    // Wed 2024-03-06 -> Tue 2024-03-19 (~13 days over two weekends):
    // trading | weekend | trading | weekend | trading segments
    val s2 = ms("2024-03-06T10:00:00Z"); val e2 = ms("2024-03-19T10:00:00Z")
    val segs = MarketCalendar.splitGapAtWeekendBoundaries(s2, e2)
    assert(segs.length === 5)
    assert(segs.head._1 === s2 && segs.last._2 === e2)
    // segments tile the gap with no holes
    assert(segs.sliding(2).forall { case Seq(a, b) => a._2 == b._1 })
    // boundaries land at Fri 20:00 close and Sun 22:00 open
    assert(segs(0)._2 === ms("2024-03-08T20:00:00Z"))
    assert(segs(1)._2 === ms("2024-03-10T22:00:00Z"))
    assert(segs(2)._2 === ms("2024-03-15T20:00:00Z"))
    assert(segs(3)._2 === ms("2024-03-17T22:00:00Z"))
  }
}
