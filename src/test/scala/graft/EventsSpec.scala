package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Events

class EventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.5, "{}"),
    (2L, ts("2024-01-01 10:10:00"), 7L, "click", 2.5, "{}"),
    // 50-minute gap > 30-minute session gap → new session
    (3L, ts("2024-01-01 11:00:00"), 7L, "view", 4.0, "{}"),
    (4L, ts("2024-01-01 10:05:00"), 9L, "click", 8.0, "{}")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("hourlyRollup buckets by hour and type with exact sums") {
    val out = Events.hourlyRollup(events)
      .select("hour", "event_type", "n_events", "n_users", "value_sum")
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(out == Set(
      ("2024-01-01 10:00:00", "click", 3L, 2L, 12.0),
      ("2024-01-01 11:00:00", "view", 1L, 1L, 4.0)))
  }

  test("sessionize splits on the idle gap") {
    val out = Events.sessionize(events, 1800L)
      .select("user_id", "session_id", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (7L, 1L, 2L, 600000000L),  // 10:00–10:10
      (7L, 2L, 1L, 0L),          // 11:00
      (9L, 1L, 1L, 0L)))
  }

  test("topNPerUser ranks by value desc") {
    val out = Events.topNPerUser(events, 1)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(out == Set((7L, 3L), (9L, 4L)))
  }

  test("movingSum covers the last 4 rows per user") {
    val out = Events.movingSum(events)
      .select("event_id", "mov_sum").as[(Long, Double)].collect().toMap
    assert(out(1L) == 1.5)
    assert(out(2L) == 4.0)
    assert(out(3L) == 8.0)
    assert(out(4L) == 8.0)
  }
}
