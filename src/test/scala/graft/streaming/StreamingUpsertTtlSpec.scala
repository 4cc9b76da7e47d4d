package graft.streaming

import org.apache.spark.api.java.Optional

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingUpsert.{KeyState, KeyedEvent}

/** TTL fold tested through Spark's public `TestGroupState` harness.
  *
  * A live-query test is deliberately avoided here: with
  * `ProcessingTimeTimeout` the micro-batch engine re-runs batches
  * continuously to fire timeouts, so `processAllAvailable()` never
  * quiesces — the state-transition function is the unit under test.
  */
class StreamingUpsertTtlSpec extends AnyFunSuite {

  private def fold = StreamingUpsert.foldGroupTtl(60000L) _

  test("fresh key folds to the max-order event and arms the TTL clock") {
    val s = TestGroupState.create[KeyState](
      Optional.empty[KeyState], GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty[Long],
      hasTimedOut = false)
    val out = fold("a",
      Iterator(KeyedEvent("a", 1, "c", "v1"), KeyedEvent("a", 3, "u", "v3")), s).toSeq
    assert(out.map(_.payload) == Seq("v3"))
    assert(s.get.order == 3)
    assert(s.getTimeoutTimestampMs.get() == 61000L) // batch time + ttl
  }

  test("stale arrival emits nothing but re-arms the clock (key still active)") {
    val s = TestGroupState.create[KeyState](
      Optional.of(KeyState("a", 3, "u", "v3")), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 5000L, eventTimeWatermarkMs = Optional.empty[Long],
      hasTimedOut = false)
    assert(fold("a", Iterator(KeyedEvent("a", 2, "u", "v2")), s).isEmpty)
    assert(s.get.payload == "v3")
    assert(s.getTimeoutTimestampMs.get() == 65000L)
  }

  test("timed-out idle key is evicted without emitting") {
    val s = TestGroupState.create[KeyState](
      Optional.of(KeyState("b", 2, "c", "v2")), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 100000L, eventTimeWatermarkMs = Optional.empty[Long],
      hasTimedOut = true)
    assert(fold("b", Iterator.empty, s).isEmpty)
    assert(!s.exists)
  }
}
