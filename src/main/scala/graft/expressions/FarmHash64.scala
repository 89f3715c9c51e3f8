package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FarmHash Fingerprint64 (Geoff Pike's farmhash, `farmhashna::Hash64`
  * — the public, frozen fingerprint algorithm; the reference engine
  * exposes it as `farmFingerprint64`, its recommended stable 64-bit
  * content fingerprint alongside the cityHash64 family). Implemented
  * from the published algorithm; byte-parity with Guava's independent
  * `Hashing.farmHashFingerprint64()` implementation is pinned across
  * every length branch in `VectorExpressionSpec`. A FINGERPRINT must
  * be bit-stable forever across engines and versions — that is the
  * whole contract (dedup keys, content addressing, cross-system
  * joins) — which is why this is a parity port, not "any good hash".
  */
object FarmHash64 {
  private final val K0 = 0xc3a5c85c97cb3127L
  private final val K1 = 0xb492b66fbe98f273L
  private final val K2 = 0x9ae16a3b2f90404fL

  private def f64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      (b(i + 1) & 0xffL) << 8 |
      (b(i + 2) & 0xffL) << 16 |
      (b(i + 3) & 0xffL) << 24 |
      (b(i + 4) & 0xffL) << 32 |
      (b(i + 5) & 0xffL) << 40 |
      (b(i + 6) & 0xffL) << 48 |
      (b(i + 7) & 0xffL) << 56

  private def f32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      (b(i + 1) & 0xffL) << 8 |
      (b(i + 2) & 0xffL) << 16 |
      (b(i + 3) & 0xffL) << 24

  private def rotr(v: Long, s: Int): Long = java.lang.Long.rotateRight(v, s)
  private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  private def hashLen16(u: Long, v: Long, mul: Long): Long = {
    var a = (u ^ v) * mul
    a ^= (a >>> 47)
    var b = (v ^ a) * mul
    b ^= (b >>> 47)
    b * mul
  }

  private def hashLen0to16(s: Array[Byte], off: Int, len: Int): Long =
    if (len >= 8) {
      val mul = K2 + len * 2
      val a = f64(s, off) + K2
      val b = f64(s, off + len - 8)
      val c = rotr(b, 37) * mul + a
      val d = (rotr(a, 25) + b) * mul
      hashLen16(c, d, mul)
    } else if (len >= 4) {
      val mul = K2 + len * 2
      val a = f32(s, off)
      hashLen16(len + (a << 3), f32(s, off + len - 4), mul)
    } else if (len > 0) {
      val a = s(off) & 0xff
      val b = s(off + (len >> 1)) & 0xff
      val c = s(off + len - 1) & 0xff
      val y = a + (b << 8)
      val z = len + (c << 2)
      shiftMix(y * K2 ^ z * K0) * K2
    } else K2

  private def hashLen17to32(s: Array[Byte], off: Int, len: Int): Long = {
    val mul = K2 + len * 2
    val a = f64(s, off) * K1
    val b = f64(s, off + 8)
    val c = f64(s, off + len - 8) * mul
    val d = f64(s, off + len - 16) * K2
    hashLen16(rotr(a + b, 43) + rotr(c, 30) + d, a + rotr(b + K2, 18) + c, mul)
  }

  private def hashLen33to64(s: Array[Byte], off: Int, len: Int): Long = {
    val mul = K2 + len * 2
    val a = f64(s, off) * K2
    val b = f64(s, off + 8)
    val c = f64(s, off + len - 8) * mul
    val d = f64(s, off + len - 16) * K2
    val y = rotr(a + b, 43) + rotr(c, 30) + d
    val z = hashLen16(y, a + rotr(b + K2, 18) + c, mul)
    val e = f64(s, off + 16) * mul
    val f = f64(s, off + 24)
    val g = (y + f64(s, off + len - 32)) * mul
    val h = (z + f64(s, off + len - 24)) * mul
    hashLen16(rotr(e + f, 43) + rotr(g, 30) + h, e + rotr(f + a, 18) + g, mul)
  }

  def hash(bytes: Array[Byte]): Long = hash(bytes, 0, bytes.length)

  /** farmhashna::Hash64 over s[off0, off0+len). The >64-byte path keeps
    * the 56-byte rolling state (x, y, z, v, w) of the published
    * algorithm; v/w pairs are inlined as four longs to stay
    * allocation-free per 64-byte block. */
  def hash(s: Array[Byte], off0: Int, len: Int): Long =
    if (len <= 16) hashLen0to16(s, off0, len)
    else if (len <= 32) hashLen17to32(s, off0, len)
    else if (len <= 64) hashLen33to64(s, off0, len)
    else {
      val seed = 81L
      var x = seed
      var y = seed * K1 + 113L
      var z = shiftMix(y * K2 + 113L) * K2
      var vf = 0L; var vs = 0L; var wf = 0L; var ws = 0L
      x = x * K2 + f64(s, off0)
      var off = off0
      val end = off0 + ((len - 1) / 64) * 64
      val last64 = end + ((len - 1) & 63) - 63
      while ({
        x = rotr(x + y + vf + f64(s, off + 8), 37) * K1
        y = rotr(y + vs + f64(s, off + 48), 42) * K1
        x ^= ws
        y += vf + f64(s, off + 40)
        z = rotr(z + wf, 33) * K1
        // v = weakHashLen32WithSeeds(s+off, vs*K1, x+wf)
        var a = vs * K1 + f64(s, off)
        var b = rotr((x + wf) + a + f64(s, off + 24), 21)
        var c = a
        a += f64(s, off + 8); a += f64(s, off + 16)
        b += rotr(a, 44)
        vf = a + f64(s, off + 24); vs = b + c
        // w = weakHashLen32WithSeeds(s+off+32, z+ws, y+f64(s,off+16))
        a = (z + ws) + f64(s, off + 32)
        b = rotr((y + f64(s, off + 16)) + a + f64(s, off + 56), 21)
        c = a
        a += f64(s, off + 40); a += f64(s, off + 48)
        b += rotr(a, 44)
        wf = a + f64(s, off + 56); ws = b + c
        val t = z; z = x; x = t
        off += 64
        off != end
      }) ()
      val mul = K1 + ((z & 0xff) << 1)
      off = last64
      wf += ((len - 1) & 63).toLong
      vf += wf
      wf += vf
      x = rotr(x + y + vf + f64(s, off + 8), 37) * mul
      y = rotr(y + vs + f64(s, off + 48), 42) * mul
      x ^= ws * 9L
      y += vf * 9L + f64(s, off + 40)
      z = rotr(z + wf, 33) * mul
      var a = vs * mul + f64(s, off)
      var b = rotr((x + wf) + a + f64(s, off + 24), 21)
      var c = a
      a += f64(s, off + 8); a += f64(s, off + 16)
      b += rotr(a, 44)
      vf = a + f64(s, off + 24); vs = b + c
      a = (z + ws) + f64(s, off + 32)
      b = rotr((y + f64(s, off + 16)) + a + f64(s, off + 56), 21)
      c = a
      a += f64(s, off + 40); a += f64(s, off + 48)
      b += rotr(a, 44)
      wf = a + f64(s, off + 56); ws = b + c
      val t = z; z = x; x = t
      hashLen16(hashLen16(vf, wf, mul) + shiftMix(y) * K0 + z,
        hashLen16(vs, ws, mul) + x, mul)
    }
}

/** `farm_fingerprint64(string|binary) -> bigint` — codegen'd scalar
  * around [[FarmHash64.hash]]; the generated code calls the static
  * forwarder directly, so the whole-stage pipeline keeps one virtual-
  * call-free loop (same pattern as `jump_hash`). */
case class FarmFingerprint64Expr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "farm_fingerprint64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or binary, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => FarmHash64.hash(s.getBytes)
    case b: Array[Byte] => FarmHash64.hash(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val get = child.dataType match {
        case _: StringType => s"byte[] $bytes = $c.getBytes();"
        case _ => s"byte[] $bytes = $c;"
      }
      s"""
         |$get
         |${ev.value} = graft.expressions.FarmHash64.hash($bytes, 0, $bytes.length);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
