package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamSessions.{mergeSessions, Session}

/** Interval-merge core of the streaming sessionizer (the state-machine step
  * is driven end-to-end by gate t22 against the batch oracle).
  */
class StreamSessionsSpec extends AnyFunSuite {

  test("merge joins within-gap neighbors, keeps distinct sessions apart") {
    val out = mergeSessions(Seq(
      Session(0, 0, 1), Session(10, 10, 1), Session(200, 200, 1)), gapMs = 50)
    assert(out === List(Session(0, 10, 2), Session(200, 200, 1)))
  }

  test("a bridging event re-merges previously separate open sessions") {
    // 0..10 and 100..110 are separate at gap 50 until 60 arrives
    val out = mergeSessions(Seq(
      Session(0, 10, 3), Session(100, 110, 2), Session(60, 60, 1)), gapMs = 50)
    assert(out === List(Session(0, 110, 6)))
  }

  test("boundary: gap exactly equal merges (matches batch > gap split rule)") {
    assert(mergeSessions(Seq(Session(0, 0, 1), Session(50, 50, 1)), 50)
      === List(Session(0, 50, 2)))
    assert(mergeSessions(Seq(Session(0, 0, 1), Session(51, 51, 1)), 50)
      === List(Session(0, 0, 1), Session(51, 51, 1)))
  }

  test("unordered input and overlaps are normalized") {
    val out = mergeSessions(Seq(
      Session(500, 600, 2), Session(0, 100, 1), Session(50, 80, 4)), gapMs = 10)
    assert(out === List(Session(0, 100, 5), Session(500, 600, 2)))
  }
}
