package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{OpenSession, Session, Sessions}

/** Properties of the pure sessionization core used by the j3
  * GroupState function: sessions partition the input, intra-session
  * gaps are ≤ gap, inter-session gaps are > gap, ids are 1-based and
  * time-ordered, and the split is input-order-invariant (the state
  * function feeds it hash-split, unordered micro-batches). */
class SessionSplitSpec extends AnyFunSuite {
  private val gap = 1800000000L // 30 min in micros

  private val tsGen: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 40L).flatMap(h =>
      Gen.chooseNum(0L, 3600000000L).map(off => h * 3600000000L + off)))

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }

  test("sessions partition events; gap bounds hold; ids ordered") {
    check(Prop.forAll(tsGen) { ts =>
      val sessions = Sessions.split(7L, ts.toArray, gap)
      val sorted = ts.sorted
      val partitioned = sessions.map(_.n_events).sum == ts.length.toLong
      val idsOrdered = sessions.map(_.session_id) == (1L to sessions.length.toLong)
      val intraOk = sessions.forall { s =>
        val inside = sorted.filter(t => t >= s.start_us && t <= s.end_us)
        s.start_us <= s.end_us &&
          inside.length.toLong == s.n_events &&
          inside.sliding(2).forall {
            case Seq(a, b) => b - a <= gap
            case _ => true
          }
      }
      val interOk = sessions.sliding(2).forall {
        case Seq(a, b) => b.start_us - a.end_us > gap
        case _ => true
      }
      partitioned && idsOrdered && intraOk && interOk
    })
  }

  test("advance folded over time-ordered batch splits (+close) == split") {
    // The j3 streaming contract: batches are contiguous time ranges
    // (arbitrary order WITHIN a batch), folded through the O(1)
    // OpenSession state; closing the final open session must reproduce
    // the whole-history split exactly — ids, bounds, and counts.
    check(Prop.forAll(tsGen, Gen.long) { (ts, seed) =>
      val rnd = new scala.util.Random(seed)
      val sorted = ts.sorted.toArray
      val nChunks = 1 + rnd.nextInt(5)
      val cuts = (Array.fill(nChunks - 1)(rnd.nextInt(sorted.length + 1)).sorted :+ sorted.length)
      var st: Option[OpenSession] = None
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      var prev = 0
      cuts.foreach { c =>
        val chunk = rnd.shuffle(sorted.slice(prev, c).toSeq).toArray
        val (closed, open) = Sessions.advance(9L, st, chunk, gap)
        out ++= closed; st = open; prev = c
      }
      st.foreach(o => out += Sessions.close(9L, o))
      out.toSeq == Sessions.split(9L, sorted, gap)
    })
  }

  test("split is invariant to input order (micro-batch arrival order)") {
    check(Prop.forAll(tsGen, Gen.long) { (ts, seed) =>
      val a = Sessions.split(1L, ts.toArray, gap)
      val b = Sessions.split(1L, ts.reverse.toArray, gap)
      val c = Sessions.split(1L, new scala.util.Random(seed).shuffle(ts).toArray, gap)
      a == b && a == c
    })
  }
}
