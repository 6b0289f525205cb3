package graft.sources

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.types.StructType

/** Admission-control contract of the DSv2 synthetic source: the
  * engine-supplied ReadLimit — not our own rowsPerTrigger — decides
  * how far `latestOffset(start, limit)` may advance. Trigger.Once
  * sends ReadAllAvailable and Trigger.AvailableNow may send composite
  * limits; a source that hard-codes its default pace under-drains
  * those triggers (round-6 ADVICE finding, fixed and pinned here).
  */
class ReadLimitSpec extends graft.SparkSuite {

  private def stream(lo: Long = 0L, hi: Long = 2000L, perTrigger: Long = 100L) =
    new SyntheticMicroBatchStream(lo, hi, perTrigger, new StructType())

  private def off(id: Long) = SyntheticOffset(id)
  private def end(o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o.asInstanceOf[SyntheticOffset].id

  test("default limit advances by rowsPerTrigger") {
    val s = stream()
    assert(end(s.latestOffset(off(0), s.getDefaultReadLimit)) == 100L)
  }

  test("ReadAllAvailable (Trigger.Once) drains to hi in one batch") {
    val s = stream()
    assert(end(s.latestOffset(off(0), ReadLimit.allAvailable())) == 2000L)
  }

  test("engine maxRows overrides the source default, clamped at hi") {
    val s = stream()
    assert(end(s.latestOffset(off(0), ReadLimit.maxRows(250L))) == 250L)
    assert(end(s.latestOffset(off(250), ReadLimit.maxRows(5000L))) == 2000L)
  }

  test("composite limit: most restrictive row cap wins") {
    val s = stream()
    val composite = ReadLimit.compositeLimit(
      Array(ReadLimit.minRows(10L, 1000L), ReadLimit.maxRows(50L))
    )
    assert(end(s.latestOffset(off(0), composite)) == 50L)
  }

  test("restart truth still holds under engine limits") {
    val s = stream()
    // checkpoint-restored start beyond anything this instance has seen
    assert(end(s.latestOffset(off(900), ReadLimit.maxRows(100L))) == 1000L)
    // and ReadAllAvailable from a restored start never re-delivers
    val s2 = stream()
    assert(end(s2.latestOffset(off(1500), ReadLimit.allAvailable())) == 2000L)
  }
}
