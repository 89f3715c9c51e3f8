package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Streaming

/** Cross-batch statefulness of j3 sessionization: with
  * `maxFilesPerTrigger=1` every staged chunk is its own micro-batch,
  * so per-user timestamps MUST survive in GroupState until the
  * end-of-stream punctuation file flushes them — chunks are hash-split,
  * not time-split, so a stateless per-batch sessionizer would emit
  * fragmented sessions with restarted ids (the ADVICE r3 hazard).
  * Asserting batch-split == single-batch output proves the state path. */
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
