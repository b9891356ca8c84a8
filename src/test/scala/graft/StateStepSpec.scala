package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{StreamingOps, UserState}

/** Multi-batch semantics of `stream_custom_state`'s transition — the
  * scenario the single-file fixture stream cannot produce (it yields
  * exactly one data batch): a LATE, OLDER event arriving in a later
  * micro-batch must not overwrite the newer event's type. The state
  * carries the latest event's full (ts_ord, event_id) key for exactly
  * this; before that fix the comparison restarted from MinValue each
  * batch and any later-batch event won. */
class StateStepSpec extends AnyFunSuite {

  private def row(v: Double, t: String, ord: Long, id: Long) =
    (7L, v, t, ord, id)

  test("an older late arrival in a later batch never overwrites " +
      "last_type; a newer one does") {
    val afterB1 = StreamingOps.stateStep(None,
      Iterator(row(5.0, "purchase", ord = 1000L, id = 1L)))
    assert(afterB1 == UserState(1L, 5.0, 1000L, 1L, "purchase"))
    // batch 2 carries a LATE event (ord 800 < 1000): counted, but the
    // latest-type must stay 'purchase'
    val afterB2 = StreamingOps.stateStep(Some(afterB1),
      Iterator(row(3.0, "click", ord = 800L, id = 2L)))
    assert(afterB2.n == 2L && afterB2.maxValue == 5.0)
    assert(afterB2.lastType == "purchase" && afterB2.lastTs == 1000L,
      s"late arrival overwrote the newer event: $afterB2")
    // batch 3 carries a genuinely newer event: it wins
    val afterB3 = StreamingOps.stateStep(Some(afterB2),
      Iterator(row(9.0, "view", ord = 2000L, id = 3L)))
    assert(afterB3 == UserState(3L, 9.0, 2000L, 3L, "view"))
    // ts tie broken by event_id, the total order the oracle uses
    val tie = StreamingOps.stateStep(Some(afterB3),
      Iterator(row(1.0, "tie_hi", ord = 2000L, id = 9L),
        row(1.0, "tie_lo", ord = 2000L, id = 4L)))
    assert(tie.lastType == "tie_hi" && tie.lastId == 9L)
  }

  private def c(t: String, ord: Long, id: Long) = (7L, t, ord, id)

  test("scd2Step: unordered batch folds in (ts_ord, event_id) order, " +
      "runs collapse, cross-batch changes version, a late event at or " +
      "behind the applied tip is dropped") {
    import graft.streaming.Scd2State
    // batch 1 arrives UNORDERED: a(1) b(3) a(2) by ord -> a,a,b -> v2
    val b1 = StreamingOps.scd2Step(None,
      Iterator(c("b", 300L, 3L), c("a", 100L, 1L), c("a", 200L, 2L)))
    assert(b1 == Scd2State(2L, "b", 300L, 3L), b1)
    // batch 2: same type extends the run (no new version), then a
    // change opens version 3
    val b2 = StreamingOps.scd2Step(Some(b1),
      Iterator(c("b", 400L, 4L), c("a", 500L, 5L)))
    assert(b2 == Scd2State(3L, "a", 500L, 5L), b2)
    // batch 3: a LATE row behind the applied tip is dropped — applying
    // it would renumber published versions
    val b3 = StreamingOps.scd2Step(Some(b2),
      Iterator(c("z", 450L, 99L)))
    assert(b3 == b2, s"late row was applied: $b3")
    // ord tie at the tip: equal (ord, id) dropped, higher id applied
    val b4 = StreamingOps.scd2Step(Some(b3),
      Iterator(c("q", 500L, 5L), c("r", 500L, 6L)))
    assert(b4 == Scd2State(4L, "r", 500L, 6L), b4)
  }
}
