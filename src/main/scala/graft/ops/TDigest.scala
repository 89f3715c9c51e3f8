package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Merging t-digest (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests", public algorithm) as a typed
  * `Aggregator`: the engine-native form of the reference's
  * `quantileTDigest` family, built on the same partial-state algebra
  * as D12/VecMean — buffers are bounded centroid lists that MERGE
  * map-side, so the exchange carries one ≤δ-centroid digest per
  * (group × task) regardless of input size.
  *
  * Scale function: the quadratic k₁-style size bound
  * `4·W·q(1−q)/δ` — centroids near the median absorb more mass than
  * the tails, which is what gives t-digests their constant RELATIVE
  * rank error at extreme quantiles. `SketchSpec` pins the rank error
  * of p50/p90/p99 against exact percentiles.
  */
case class TDigestBuf(means: Array[Double], weights: Array[Double], used: Int)

class TDigestAgg(delta: Int, qs: Array[Double]) extends Aggregator[Double, TDigestBuf, Array[Double]] {
  private val bufferCap = delta * 5

  override def zero: TDigestBuf = TDigestBuf(new Array(bufferCap), new Array(bufferCap), 0)

  /** Greedy size-bounded centroid merge over mean-sorted input.
    * `private[graft]` so [[TDigestCentroidsAgg]] (the i2c verdict
    * twin's centroid-table view) certifies THIS exact procedure, not
    * a reimplementation. */
  private[graft] def compress(means: Array[Double], weights: Array[Double]): TDigestBuf = {
    val n = means.length
    if (n == 0) return TDigestBuf(Array.empty, Array.empty, 0)
    val idx = (0 until n).sortBy(i => means(i))
    val total = weights.sum
    val om = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ow = scala.collection.mutable.ArrayBuffer.empty[Double]
    var cm = means(idx.head)
    var cw = weights(idx.head)
    var cum = 0.0 // weight fully emitted before the current cluster
    idx.tail.foreach { i =>
      val m2 = means(i); val w2 = weights(i)
      val qMid = (cum + (cw + w2) / 2) / total
      val bound = math.max(1.0, 4.0 * total * qMid * (1 - qMid) / delta)
      if (cw + w2 <= bound) {
        // weighted mean keeps the centroid unbiased
        cm = (cm * cw + m2 * w2) / (cw + w2); cw += w2
      } else {
        om += cm; ow += cw; cum += cw; cm = m2; cw = w2
      }
    }
    om += cm; ow += cw
    TDigestBuf(om.toArray, ow.toArray, om.length)
  }

  /** The buffer is a MUTABLE pre-allocated scratch (ScalaAggregator
    * keeps one live object per group per task; serialization only at
    * the shuffle): appending a point is an O(1) slot write, and when
    * the scratch fills it compresses in place back to ≤δ-ish
    * centroids — amortized O(1) per row, vs O(cap) per row for an
    * immutable `:+` append (measured 25 s → sub-second at sf0.1). */
  override def reduce(b: TDigestBuf, x: Double): TDigestBuf = {
    var buf = b
    if (buf.used == buf.means.length) {
      val c = compress(buf.means.take(buf.used), buf.weights.take(buf.used))
      if (c.used < buf.means.length) {
        System.arraycopy(c.means, 0, buf.means, 0, c.used)
        System.arraycopy(c.weights, 0, buf.weights, 0, c.used)
        buf = TDigestBuf(buf.means, buf.weights, c.used)
      } else {
        // compression gave no headroom (e.g. a post-merge buffer already
        // at the size bound): grow the scratch instead of overflowing
        val cap = math.max(bufferCap, c.used * 2)
        val nm = new Array[Double](cap); val nw = new Array[Double](cap)
        System.arraycopy(c.means, 0, nm, 0, c.used)
        System.arraycopy(c.weights, 0, nw, 0, c.used)
        buf = TDigestBuf(nm, nw, c.used)
      }
    }
    buf.means(buf.used) = x
    buf.weights(buf.used) = 1.0
    TDigestBuf(buf.means, buf.weights, buf.used + 1)
  }

  override def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf =
    if (a.used == 0) b else if (b.used == 0) a
    else compress(a.means.take(a.used) ++ b.means.take(b.used),
      a.weights.take(a.used) ++ b.weights.take(b.used))

  /** Standard t-digest quantile: linear interpolation between centroid
    * midpoints of the mean-sorted digest. */
  override def finish(buf: TDigestBuf): Array[Double] = {
    val d = compress(buf.means.take(buf.used), buf.weights.take(buf.used))
    val n = d.used
    if (n == 0) return qs.map(_ => Double.NaN)
    if (n == 1) return qs.map(_ => d.means(0))
    val total = d.weights.sum
    // cumulative weight at each centroid midpoint
    val mids = new Array[Double](n)
    var cum = 0.0
    var i = 0
    while (i < n) { mids(i) = cum + d.weights(i) / 2; cum += d.weights(i); i += 1 }
    qs.map { q =>
      val target = q * total
      if (target <= mids(0)) d.means(0)
      else if (target >= mids(n - 1)) d.means(n - 1)
      else {
        var j = 1
        while (mids(j) < target) j += 1
        val f = (target - mids(j - 1)) / (mids(j) - mids(j - 1))
        d.means(j - 1) + f * (d.means(j) - d.means(j - 1))
      }
    }
  }

  override def bufferEncoder: Encoder[TDigestBuf] = Encoders.product[TDigestBuf]
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

/** Centroid-table view of the SAME t-digest (i2c verdict twin): the
  * identical zero/reduce/merge/compress as [[TDigestAgg]] — every call
  * delegates — but `finish` emits the final digest itself as an
  * interleaved [m1, w1, m2, w2, …] array instead of interpolated
  * quantile reads, so a cross-engine oracle can hash every centroid
  * the greedy merge produced, not just four reads off them. */
class TDigestCentroidsAgg(delta: Int) extends Aggregator[Double, TDigestBuf, Array[Double]] {
  private val inner = new TDigestAgg(delta, Array(0.5))
  override def zero: TDigestBuf = inner.zero
  override def reduce(b: TDigestBuf, x: Double): TDigestBuf = inner.reduce(b, x)
  override def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf = inner.merge(a, b)
  override def finish(buf: TDigestBuf): Array[Double] = {
    val d = inner.compress(buf.means.take(buf.used), buf.weights.take(buf.used))
    val out = new Array[Double](d.used * 2)
    var i = 0
    while (i < d.used) { out(2 * i) = d.means(i); out(2 * i + 1) = d.weights(i); i += 1 }
    out
  }
  override def bufferEncoder: Encoder[TDigestBuf] = Encoders.product[TDigestBuf]
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}
