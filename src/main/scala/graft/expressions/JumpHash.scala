package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Jump Consistent Hash (Lamping & Veach, "A Fast, Minimal Memory,
  * Consistent Hash Algorithm", arXiv:1406.2294 — public): maps a
  * 64-bit key to one of `buckets` shards such that growing the
  * bucket count from n to n+1 moves only ~1/(n+1) of keys — THE
  * shard-routing primitive for resharding a 100 TB table without a
  * full rewrite (the engine analog of the reference's
  * `jumpConsistentHash`). Stateless, loop-based (data-dependent
  * iteration count), so it needs a real codegen Expression — it is
  * not expressible as a SQL function composition. Codegen and
  * interpreted paths are pinned equal in `VectorExpressionSpec`. */
object JumpHash {
  def jump(key0: Long, buckets: Int): Int = {
    var key = key0
    var b = -1L
    var j = 0L
    while (j < buckets) {
      b = j
      key = key * 2862933555777941757L + 1
      j = ((b + 1) * (2147483648.0 / (((key >>> 33) + 1).toDouble))).toLong
    }
    b.toInt
  }
}

case class JumpConsistentHash(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "jump_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jump_hash requires (bigint, int), got ${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullSafeEval(key: Any, buckets: Any): Any =
    JumpHash.jump(key.asInstanceOf[Long], buckets.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, n) => {
      val key = ctx.freshName("key")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      s"""
         |long $key = $k;
         |long $b = -1L;
         |long $j = 0L;
         |while ($j < $n) {
         |  $b = $j;
         |  $key = $key * 2862933555777941757L + 1L;
         |  $j = (long) (($b + 1) * (2147483648.0 / (double) (($key >>> 33) + 1)));
         |}
         |${ev.value} = (int) $b;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
