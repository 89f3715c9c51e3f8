package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Streaming

/** Cross-batch statefulness of j3 sessionization: with
  * `maxFilesPerTrigger=1` every staged time-range chunk is its own
  * micro-batch, so the open session MUST survive in `GroupState`
  * (as an O(1) `OpenSession`, never an event buffer) across batches —
  * a stateless per-batch sessionizer would emit fragmented sessions
  * with restarted ids at every chunk boundary (the ADVICE r3 hazard).
  * Asserting batch-split == single-batch output proves the
  * incremental `Sessions.advance` state path end-to-end; its algebra
  * is property-pinned against `Sessions.split` in `SessionSplitSpec`. */
class StreamingSessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("sessionization result is identical whether or not batches split") {
    val single = Streaming.j3SessionizeWith(spark, sf, oneFilePerBatch = false).collect()
    val split = Streaming.j3SessionizeWith(spark, sf, oneFilePerBatch = true).collect()
    assert(single.nonEmpty)
    assert(split.toSeq == single.toSeq)
  }
}
