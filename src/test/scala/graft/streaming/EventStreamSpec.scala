package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class EventStreamSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("streaming hourly counts equal the batch aggregation") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val events = (1 to 200).map { i =>
      (i.toLong, new Timestamp(1700000000000L + i * 60000L),
        (i % 7).toLong, s"type${i % 3}", i * 0.5)
    }
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    mem.addData(events)
    val sdf = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.hourlyCounts(sdf)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hourly")
      .orderBy("hour_start", "event_type").collect()
    val batch = EventStream.hourlyCounts(
      events.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .orderBy("hour_start", "event_type").collect()
    assert(streamed.sameElements(batch))
    assert(streamed.nonEmpty)
  }

  test("sessionizer closes sessions at gaps") {
    import spark.implicits._
    // one user, two bursts separated by a 2h gap; small gapMs closes burst 1
    val evs = (Seq.tabulate(5)(i =>
        EventStream.Ev(i.toLong, new Timestamp(1700000000000L + i * 60000L), 1L, "a", 1.0)) ++
      Seq.tabulate(4)(i =>
        EventStream.Ev(100 + i.toLong, new Timestamp(1700000000000L + 7200000L + i * 60000L), 1L, "a", 2.0)))
      .toDS()
    val sessions = EventStream.sessionize(evs, gapMs = 10 * 60 * 1000L)
      .collect()
    // batch mode emits sessions closed by observed gaps (the still-open
    // final burst stays in state — streaming would emit it on timeout)
    assert(sessions.length == 1)
    assert(sessions.head.n_events == 5)
    assert(sessions.head.sum_value == 5.0)
  }
}
