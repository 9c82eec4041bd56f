package graft

import graft.streaming.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class SessionizeSpec extends SparkSuite {

  private def ev(u: Long, s: String) = Sessionize.Event(u, Timestamp.valueOf(s))

  test("flatMapGroupsWithState closes sessions on gap, keeps open state") {
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

    val out = spark.table("sess_out").as[Sessionize.Session].collect()
    assert(out.length == 1) // only the closed session is emitted
    val s = out.head
    assert(s.userId == 1L && s.nEvents == 2)
    assert(s.endMs - s.startMs == 5 * 60 * 1000L)
  }
}
