package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}

/** Custom codegen'd vector kernels (brief's preferred extension path:
  * a native Catalyst Expression with doGenCode beats interpreted
  * higher-order folds in the hot path). Both accumulate in double in
  * sequential index order — bit-identical to the interpreted fold
  * `aggregate(zip_with(a, b, f), 0.0, +)` they replace and to the
  * DuckDB oracle's `list_sum(list_transform(range, i -> f(a[i], b[i])))`,
  * so swapping the implementation cannot change a hash-compared result.
  * Element types float and double are supported independently per side
  * (an IVF centroid is a double array probed by float queries). */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  /** Scalar combine in Java source; operands are double variables. */
  protected def combineJava(x: String, y: String): String
  /** Scalar combine for interpreted eval. */
  protected def combine(x: Double, y: Double): Double

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (lt, rt) = (elemType(left).get, elemType(right).get)
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += combine(get(xs, i, lt), get(ys, i, rt))
      i += 1
    }
    s
  }

  private def getterJava(t: DataType): String =
    if (t == FloatType) "getFloat" else "getDouble"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lg, rg) = (getterJava(elemType(left).get), getterJava(elemType(right).get))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.$lg($i);
         |  double $y = (double) $b.$rg($i);
         |  ${ev.value} += ${combineJava(x, y)};
         |}
       """.stripMargin
    })
  }
}

object MinHashSigs {
  /** Odd 64-bit constants; signature i uses rotl(h, 1+7i mod 63) ^ M(i)
    * — a bijective order-permutation per signature over one xxhash64
    * base hash per shingle (standard minhash-from-one-hash practice). */
  val Mixers: Array[Long] = Array(
    0x9e3779b97f4a7c15L, 0xbf58476d1ce4e5b9L, 0x94d049bb133111ebL, 0x2545f4914f6cdd1dL,
    0xff51afd7ed558ccdL, 0xc4ceb9fe1a85ec53L, 0x87c37b91114253d5L, 0x4cf5ad432745937fL,
    0x52dce729d95d84a5L, 0x38495ab5c52d9f8bL, 0x6a09e667f3bcc909L, 0xbb67ae8584caa73bL,
    0x3c6ef372fe94f82bL, 0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL)
  def rot(i: Int): Int = 1 + (7 * i) % 63
}

/** minhash_sigs(shingles) → array<long> of 16 banded-minhash
  * signatures, computed in a single codegen'd loop: one xxhash64 per
  * shingle plus 16 rotate-xor mixes — replacing an interpreted
  * aggregate/zip_with fold that cost ~15k Expression.eval calls/row. */
case class MinHashSigsExpr(child: Expression) extends UnaryExpression {
  import MinHashSigs._

  override def prettyName: String = "minhash_sigs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(Mixers.length)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var j = 0
      while (j < Mixers.length) {
        val m = java.lang.Long.rotateLeft(h, rot(j)) ^ Mixers(j)
        if (m < mins(j)) mins(j) = m
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      val mixBody = Mixers.zipWithIndex.map { case (mx, j) =>
        s"""$m = java.lang.Long.rotateLeft($h, ${rot(j)}) ^ ${mx}L;
           |if ($m < $mins[$j]) $mins[$j] = $m;""".stripMargin
      }.mkString("\n")
      s"""
         |long[] $mins = new long[${Mixers.length}];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  long $m;
         |  $mixBody
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_bands(shingles) → array<long> of 8 LSH band hashes, fusing
  * [[MinHashSigsExpr]] with the banding step (band b = xxhash64 chain
  * over sigs 2b and 2b+1, seed 42 — the same combination the previous
  * `transform(..., xxhash64(sigs[2b], sigs[2b+1]))` lambda computed).
  * One codegen pass per row: no intermediate signature array column,
  * so the LSH pipeline needs no shuffle barrier to guard against
  * CollapseProject inlining the signature computation into a lambda. */
case class MinHashBandsExpr(child: Expression) extends UnaryExpression {
  import MinHashSigs._

  override def prettyName: String = "minhash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  private def bandHash(lo: Long, hi: Long): Long =
    XXH64.hashLong(hi, XXH64.hashLong(lo, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(Mixers.length)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var j = 0
      while (j < Mixers.length) {
        val m = java.lang.Long.rotateLeft(h, rot(j)) ^ Mixers(j)
        if (m < mins(j)) mins(j) = m
        j += 1
      }
      i += 1
    }
    val bands = new Array[Long](Mixers.length / 2)
    var b = 0
    while (b < bands.length) {
      bands(b) = bandHash(mins(2 * b), mins(2 * b + 1))
      b += 1
    }
    new GenericArrayData(bands)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val bands = ctx.freshName("bands")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val mixBody = Mixers.zipWithIndex.map { case (mx, j) =>
        s"""$m = java.lang.Long.rotateLeft($h, ${rot(j)}) ^ ${mx}L;
           |if ($m < $mins[$j]) $mins[$j] = $m;""".stripMargin
      }.mkString("\n")
      s"""
         |long[] $mins = new long[${Mixers.length}];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |  long $h = $xxh.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  long $m;
         |  $mixBody
         |}
         |long[] $bands = new long[${Mixers.length / 2}];
         |for (int $b = 0; $b < ${Mixers.length / 2}; $b++) {
         |  $bands[$b] = $xxh.hashLong($mins[2 * $b + 1], $xxh.hashLong($mins[2 * $b], 42L));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bands);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** simhash64(tokens) → 64-bit SimHash (Charikar 2002, public
  * algorithm): per token one xxhash64(seed 42), each of the 64 bits
  * votes +1/-1 on the per-bit counter; output bit j is set iff the
  * vote is positive. Near-identical token multisets differ in few
  * bits, so Hamming distance estimates cosine similarity of the
  * token-frequency vectors. Codegen'd single loop, same style as
  * [[MinHashSigsExpr]]. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var j = 0
      while (j < 64) {
        votes(j) += (if (((h >>> j) & 1L) != 0L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      s"""
         |int[] $votes = new int[64];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $votes[$j] += (($h >>> $j) & 1L) != 0L ? 1 : -1;
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) ${ev.value} |= (1L << $j);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** dot_f(a, b) = Σ a_i * b_i */
case class DotProductF(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "dot_f"
  override protected def combineJava(x: String, y: String): String = s"$x * $y"
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Base for the k-centroid scan kernels: `cents` is the k×dim
  * centroid matrix FLATTENED row-major into one array<double> literal
  * (k = cents.length / vec.length), so the whole argmin is ONE
  * expression with ONE literal regardless of k. The previous shape —
  * an `array()` of k separate `l2sq_f(vec, typedLit(centroid_c))`
  * calls — made Catalyst analyze and janino compile k kernel
  * instances per stage: at k=64 that alone cost ~6 s per Lloyd
  * iteration at sf1 (25 s of l44's 36 s), pure plan overhead that
  * re-paid itself every iteration. Per-centroid distance accumulates
  * in the same sequential index order as [[L2SquaredF]], and the
  * argmin keeps the FIRST strict minimum — exactly
  * `array_position(d, array_min(d))` — so the swap cannot change
  * l40b's oracle-certified assignments. */
abstract class CentroidScan extends BinaryExpression {
  private def vecElem(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (vecElem(left).isDefined && right.dataType == ArrayType(DoubleType, false)
      || vecElem(left).isDefined && right.dataType == ArrayType(DoubleType, true))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<double>), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  /** true → emit the argmin index (int); false → the min distance. */
  protected def emitIndex: Boolean

  /** ADVICE r14: a flattened centroid literal whose length is not a
    * multiple of the vector dim previously TRUNCATED the trailing
    * values (integer division for k), and an empty vector yielded
    * index 0 / +Infinity — plausible wrong assignments from malformed
    * input. Both now return NULL (eval and codegen), which any
    * downstream grouping/join surfaces immediately instead of
    * silently mis-clustering. */
  override def nullable: Boolean = true

  // r20 (guide §1.2 per-task work): the k×dim centroid operand is the
  // SAME object for every row (kmeansAssign passes one flattened
  // literal), but the original kernel read it element-wise through
  // ArrayData virtual calls — k·dim megamorphic accessor calls per ROW
  // dominated Lloyd rounds once k follows √n (measured ~4× on the
  // sf10 corpus). Both paths now extract the operand into a primitive
  // double[] ONCE per distinct operand object (reference-compared
  // cache — a literal hits every row) and the row vector once per row;
  // the arithmetic and its order are unchanged, so assignments are
  // bit-identical (VectorExpressionSpec pins eval ≡ codegen).
  @transient private var cachedSrc: ArrayData = _
  @transient private var cachedCents: Array[Double] = _

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    if (dim == 0 || cents.numElements() % dim != 0) return null
    if (!(cents eq cachedSrc)) {
      cachedCents = cents.toDoubleArray()
      cachedSrc = cents
    }
    val cs = cachedCents
    val k = cs.length / dim
    val fl = vecElem(left).get == FloatType
    val v = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      v(j) = if (fl) vec.getFloat(j).toDouble else vec.getDouble(j)
      j += 1
    }
    var best = Double.PositiveInfinity
    var bestC = 0
    var c = 0
    while (c < k) {
      var s = 0.0
      var i = 0
      while (i < dim) {
        val d = v(i) - cs(c * dim + i)
        s += d * d
        i += 1
      }
      if (s < best) { best = s; bestC = c }
      c += 1
    }
    if (emitIndex) bestC else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toArr = if (vecElem(left).get == FloatType) "toFloatArray" else "toDoubleArray"
    val va = ctx.freshName("va")
    val vaT = if (vecElem(left).get == FloatType) "float[]" else "double[]"
    val srcRef = ctx.addMutableState(
      "org.apache.spark.sql.catalyst.util.ArrayData", "centScanSrc")
    val centsRef = ctx.addMutableState("double[]", "centScanCents")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dim = ctx.freshName("dim")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      s"""
         |int $dim = $a.numElements();
         |if ($dim == 0 || $b.numElements() % $dim != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  if ($b != $srcRef) {
         |    $centsRef = $b.toDoubleArray();
         |    $srcRef = $b;
         |  }
         |  $vaT $va = $a.$toArr();
         |  int $k = $centsRef.length / $dim;
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      double $d = (double) $va[$i] - $centsRef[$c * $dim + $i];
         |      $s += $d * $d;
         |    }
         |    if ($s < $best) { $best = $s; $bestC = $c; }
         |  }
         |  ${ev.value} = ${if (emitIndex) bestC else best};
         |}
       """.stripMargin
    })
  }
}

/** argmin_l2sq_f(vec, flat_cents) → 0-based index of the nearest
  * centroid (first strict min on exact-tie distances). */
case class ArgMinL2F(left: Expression, right: Expression) extends CentroidScan {
  override def prettyName: String = "argmin_l2sq_f"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override protected def emitIndex: Boolean = true
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** min_l2sq_f(vec, flat_cents) → squared distance to that centroid. */
case class MinL2F(left: Expression, right: Expression) extends CentroidScan {
  override def prettyName: String = "min_l2sq_f"
  override def dataType: DataType = DoubleType
  override protected def emitIndex: Boolean = false
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** l2sq_f(a, b) = Σ (a_i - b_i)² */
case class L2SquaredF(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "l2sq_f"
  override protected def combineJava(x: String, y: String): String = s"($x - $y) * ($x - $y)"
  override protected def combine(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** sortable_double_bits(x) → a signed LONG whose ordering matches the
  * double ordering of x (the IEEE-754 radix-sort key, public domain
  * technique): non-negative doubles keep their raw bits (already
  * ascending), negative doubles map to the negated magnitude bits, so
  * the whole line is monotone and -0.0 ties +0.0 at zero. Lets rank/
  * bucket operators slice a double domain DETERMINISTICALLY (e.g. top
  * 16 bits = sign+exponent+4 mantissa bits ≈ 16 ordered slices per
  * binade) without a min/max statistics pass over the data — see
  * Aggregates.exactPercentileByRank. */
case class SortableDoubleBitsExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "sortable_double_bits"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bits = java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
    if (bits >= 0L) bits else -(bits & Long.MaxValue)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val bits = ctx.freshName("bits")
      s"""
         |long $bits = Double.doubleToLongBits($x);
         |${ev.value} = $bits >= 0L ? $bits : -($bits & Long.MAX_VALUE);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernel for [[SimHash64Md5Expr]]: per-token hash = the first 8 MD5
  * digest bytes read LITTLE-ENDIAN, bit-identical to DuckDB 1.0's
  * `md5_number_upper(token)` — empirically pinned in `SketchSpec`.
  * Static so codegen can call it like Spark's own hash helpers. */
object SimHash64Md5 {
  def hashToken(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
    var h = 0L
    var i = 7
    while (i >= 0) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
    h
  }

  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = hashToken(arr.getUTF8String(i))
      var j = 0
      while (j < 64) {
        votes(j) += (if (((h >>> j) & 1L) != 0L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** simhash64_md5(tokens) — the same Charikar vote loop as
  * [[SimHash64Expr]] with the per-token hash swapped to MD5 (see
  * [[SimHash64Md5]]): the cross-engine-REPLAYABLE variant. DuckDB has
  * no xxhash64, so the production l13 signature can't be recomputed by
  * the oracle; this variant can, which lets the l13 banded-signature
  * pair arithmetic be certified end-to-end against a DuckDB
  * brute-force over the same parquet (VERDICT r11 #2). MD5-per-token
  * is ~5× the cost of XXH64 — used only by the bounded `l13b` verdict
  * query, never the production path. */
case class SimHash64Md5Expr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64_md5"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64Md5.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.SimHash64Md5.simhash($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** md5_u64(str) — [[SimHash64Md5.hashToken]] exposed as a scalar: the
  * first 8 MD5 digest bytes little-endian, bit-identical to DuckDB's
  * `md5_number_upper(str)` (pinned in `SketchSpec`). The cross-engine-
  * replayable hash primitive for bounded verdict tables that need a
  * per-string hash the oracle can recompute (the production paths keep
  * xxhash64); the Long carries the UBIGINT's bit pattern — unsigned
  * ORDER (minhash selection) needs a sign-bit flip before comparison. */
case class Md5U64Expr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "md5_u64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64Md5.hashToken(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.SimHash64Md5.hashToken($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
