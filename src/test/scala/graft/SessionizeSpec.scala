package graft

import graft.streaming.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class SessionizeSpec extends SparkSuite {

  private def ev(u: Long, s: String) = Sessionize.Event(u, Timestamp.valueOf(s))

  test("flatMapGroupsWithState closes sessions on gap; timeout flushes idle keys") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessions(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()

    // user 1: two events 5 min apart (one session), then a 2-hour gap
    mem.addData(
      ev(1, "2025-05-24 09:00:00"), ev(1, "2025-05-24 09:05:00"),
      ev(2, "2025-05-24 09:30:00"))
    q.processAllAvailable()
    mem.addData(ev(1, "2025-05-24 11:30:00")) // closes user 1's first session
    q.processAllAvailable()
    q.stop()

    // User 1's first session closes on the gap; user 2 went idle, so the
    // event-time timeout (watermark 11:20 > 09:30 + gap) flushes their
    // session. User 1's 11:30 session is still open (timeout 12:00).
    val out = spark.table("sess_out").as[Sessionize.Session].collect()
    assert(out.length == 2)
    val s1 = out.find(_.userId == 1L).get
    assert(s1.nEvents == 2 && s1.endMs - s1.startMs == 5 * 60 * 1000L)
    val s2 = out.find(_.userId == 2L).get
    assert(s2.nEvents == 1 && s2.startMs == s2.endMs)
  }
}
