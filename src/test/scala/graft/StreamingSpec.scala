package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streaming
import graft.streaming.Streaming.Event

/** Structured Streaming tests: the same transform definitions must
  * produce, over incremental micro-batches, exactly what the batch plan
  * produces over the full input — plus custom keyed state via
  * mapGroupsWithState accumulating across batches. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val events: Seq[Event] = {
    import spark.implicits._
    Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().toSeq
  }

  test("hourly windowed counts: two micro-batches == one batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = Streaming.hourlyCounts(stream.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    try {
      val (a, b) = events.splitAt(events.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      val streamed = spark.table("hourly")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = Streaming.hourlyCounts(Tables.events(spark, Sf0001))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("session windows: incremental sessions converge to the batch gaps-and-islands") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = Streaming.userSessions(stream.toDF())
      .writeStream.format("memory").queryName("sessions").outputMode("complete").start()
    try {
      // out-of-order delivery: second half first
      val (a, b) = events.splitAt(events.size / 2)
      stream.addData(b); q.processAllAvailable()
      stream.addData(a); q.processAllAvailable()
      val streamed = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batch = Streaming.userSessions(Tables.events(spark, Sf0001))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-user counts across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = Streaming.runningUserCounts(stream.toDS())
      .writeStream.format("memory").queryName("running").outputMode("update").start()
    try {
      val (a, b) = events.splitAt(events.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      // update mode appends each batch's updated rows; the final value
      // per user is the max (counts only grow)
      val finalCounts = spark.table("running")
        .groupBy("user_id").max("n_events")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = events.groupBy(_.user_id).map { case (u, es) => u -> es.size.toLong }
      assert(finalCounts == expected)
    } finally q.stop()
  }
}
