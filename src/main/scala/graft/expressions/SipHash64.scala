package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SipHash-2-4 (Aumasson & Bernstein, "SipHash: a fast short-input
  * PRF" — the published algorithm) with the zero key, matching the
  * reference engine's `sipHash64` default-key semantics. Like
  * [[FarmHash64]] this is a parity port of a frozen public algorithm,
  * not "any good hash": byte-parity with Guava's independent
  * SipHash-2-4 implementation is pinned in `VectorExpressionSpec`
  * across every tail length (0..7 residual bytes) and multi-block
  * inputs. */
object SipHash64 {
  def hash(data: Array[Byte]): Long = hash(data, 0L, 0L)

  def hash(data: Array[Byte], k0: Long, k1: Long): Long = {
    var v0 = 0x736f6d6570736575L ^ k0
    var v1 = 0x646f72616e646f6dL ^ k1
    var v2 = 0x6c7967656e657261L ^ k0
    var v3 = 0x7465646279746573L ^ k1
    val len = data.length
    val end = len - (len % 8)
    var i = 0
    while (i < end) {
      val m = (data(i) & 0xffL) |
        (data(i + 1) & 0xffL) << 8 |
        (data(i + 2) & 0xffL) << 16 |
        (data(i + 3) & 0xffL) << 24 |
        (data(i + 4) & 0xffL) << 32 |
        (data(i + 5) & 0xffL) << 40 |
        (data(i + 6) & 0xffL) << 48 |
        (data(i + 7) & 0xffL) << 56
      v3 ^= m
      // 2 compression rounds
      v0 += v1; v1 = java.lang.Long.rotateLeft(v1, 13); v1 ^= v0; v0 = java.lang.Long.rotateLeft(v0, 32)
      v2 += v3; v3 = java.lang.Long.rotateLeft(v3, 16); v3 ^= v2
      v0 += v3; v3 = java.lang.Long.rotateLeft(v3, 21); v3 ^= v0
      v2 += v1; v1 = java.lang.Long.rotateLeft(v1, 17); v1 ^= v2; v2 = java.lang.Long.rotateLeft(v2, 32)
      v0 += v1; v1 = java.lang.Long.rotateLeft(v1, 13); v1 ^= v0; v0 = java.lang.Long.rotateLeft(v0, 32)
      v2 += v3; v3 = java.lang.Long.rotateLeft(v3, 16); v3 ^= v2
      v0 += v3; v3 = java.lang.Long.rotateLeft(v3, 21); v3 ^= v0
      v2 += v1; v1 = java.lang.Long.rotateLeft(v1, 17); v1 ^= v2; v2 = java.lang.Long.rotateLeft(v2, 32)
      v0 ^= m
      i += 8
    }
    // last block: residual bytes little-endian + (len & 0xff) in the top byte
    var last = (len & 0xffL) << 56
    var j = len - 1
    while (j >= end) {
      last |= (data(j) & 0xffL) << (8 * (j - end))
      j -= 1
    }
    v3 ^= last
    v0 += v1; v1 = java.lang.Long.rotateLeft(v1, 13); v1 ^= v0; v0 = java.lang.Long.rotateLeft(v0, 32)
    v2 += v3; v3 = java.lang.Long.rotateLeft(v3, 16); v3 ^= v2
    v0 += v3; v3 = java.lang.Long.rotateLeft(v3, 21); v3 ^= v0
    v2 += v1; v1 = java.lang.Long.rotateLeft(v1, 17); v1 ^= v2; v2 = java.lang.Long.rotateLeft(v2, 32)
    v0 += v1; v1 = java.lang.Long.rotateLeft(v1, 13); v1 ^= v0; v0 = java.lang.Long.rotateLeft(v0, 32)
    v2 += v3; v3 = java.lang.Long.rotateLeft(v3, 16); v3 ^= v2
    v0 += v3; v3 = java.lang.Long.rotateLeft(v3, 21); v3 ^= v0
    v2 += v1; v1 = java.lang.Long.rotateLeft(v1, 17); v1 ^= v2; v2 = java.lang.Long.rotateLeft(v2, 32)
    v0 ^= last
    // finalization: 4 rounds with v2 ^= 0xff
    v2 ^= 0xffL
    var r = 0
    while (r < 4) {
      v0 += v1; v1 = java.lang.Long.rotateLeft(v1, 13); v1 ^= v0; v0 = java.lang.Long.rotateLeft(v0, 32)
      v2 += v3; v3 = java.lang.Long.rotateLeft(v3, 16); v3 ^= v2
      v0 += v3; v3 = java.lang.Long.rotateLeft(v3, 21); v3 ^= v0
      v2 += v1; v1 = java.lang.Long.rotateLeft(v1, 17); v1 ^= v2; v2 = java.lang.Long.rotateLeft(v2, 32)
      r += 1
    }
    v0 ^ v1 ^ v2 ^ v3
  }
}

/** `sip_hash64(string|binary) -> bigint` — zero-key SipHash-2-4 as a
  * codegen'd scalar; the generated code calls the static forwarder,
  * same pattern as `farm_fingerprint64`/`jump_hash`. */
case class SipHash64Expr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "sip_hash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or binary, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => SipHash64.hash(s.getBytes)
    case b: Array[Byte] => SipHash64.hash(b)
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
         |${ev.value} = graft.expressions.SipHash64.hash($bytes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
