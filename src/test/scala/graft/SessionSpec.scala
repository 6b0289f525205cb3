package graft

import org.apache.spark.sql.functions._

/** Sessionization invariants (SURVEY §5.3): every event lands in
  * exactly one session; intra-session gaps < 30 min; inter-session
  * gaps >= 30 min.
  */
class SessionSpec extends SparkSuite {

  test("sessions partition the event stream with correct gap semantics") {
    val sessions = operators.TimeSeries.tsSession30m.run(spark, sf).collect()
    val events = Tables
      .events(spark, sf)
      .select(col("user_id"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1)))

    // every event in exactly one session
    val total = sessions.map(_.getLong(4)).sum
    assert(total == events.length, s"events $total vs ${events.length}")

    val gapUs = 1800L * 1000000
    for ((user, ss) <- sessions.groupBy(_.getLong(0))) {
      val sorted = ss.sortBy(_.getLong(1))
      for (s <- sorted) {
        val start = s.getAs[java.time.LocalDateTime](2)
        val end = s.getAs[java.time.LocalDateTime](3)
        assert(!end.isBefore(start))
      }
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray) if sorted.length > 1) {
        val endA = a.getAs[java.time.LocalDateTime](3)
        val startB = b.getAs[java.time.LocalDateTime](2)
        val gap = java.time.Duration.between(endA, startB)
        assert(gap.toNanos / 1000 > gapUs, s"user $user inter-session gap $gap")
      }
      // events within a session are <= 30 min apart neighbor-to-neighbor
      val userEvents = events.filter(_._1 == user).map(_._2).sorted(Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _))
      for (s <- sorted) {
        val inSess = userEvents.filter(t => !t.isBefore(s.getAs[java.time.LocalDateTime](2)) && !t.isAfter(s.getAs[java.time.LocalDateTime](3)))
        assert(inSess.length == s.getLong(4), s"user $user session count")
        for (Seq(x, y) <- inSess.sliding(2).map(_.toSeq) if inSess.length > 1) {
          assert(java.time.Duration.between(x, y).toNanos / 1000 <= gapUs)
        }
      }
    }
  }
}
