package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{ArgMinL2F, DotProductF, L2SquaredF, MinHashBandsExpr, MinHashSigsExpr, MinL2F, SimHash64Expr}

/** Engine extension point (SURVEY §2 custom-operator path (b)/(c)):
  * registers the codegen'd vector kernels so they resolve like any
  * built-in through the SQL front door and `call_function`. Enabled by
  * `spark.sql.extensions=graft.GraftExtensions` (Engine.session does). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // the ClickHouse-named scalar/aggregate surface, resolved through
    // the SQL text front door (VERDICT r18 next #1) — see ChNames
    ChNames.register(ext)
    ext.injectFunction((
      FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotProductF].getName, "dot_f"),
      (children: Seq[Expression]) => DotProductF(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("l2sq_f"),
      new ExpressionInfo(classOf[L2SquaredF].getName, "l2sq_f"),
      (children: Seq[Expression]) => L2SquaredF(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("argmin_l2sq_f"),
      new ExpressionInfo(classOf[ArgMinL2F].getName, "argmin_l2sq_f"),
      (children: Seq[Expression]) => ArgMinL2F(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("min_l2sq_f"),
      new ExpressionInfo(classOf[MinL2F].getName, "min_l2sq_f"),
      (children: Seq[Expression]) => MinL2F(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigsExpr].getName, "minhash_sigs"),
      (children: Seq[Expression]) => MinHashSigsExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBandsExpr].getName, "minhash_bands"),
      (children: Seq[Expression]) => MinHashBandsExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64Expr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash64_md5"),
      new ExpressionInfo(classOf[graft.expressions.SimHash64Md5Expr].getName, "simhash64_md5"),
      (children: Seq[Expression]) => graft.expressions.SimHash64Md5Expr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("md5_u64"),
      new ExpressionInfo(classOf[graft.expressions.Md5U64Expr].getName, "md5_u64"),
      (children: Seq[Expression]) => graft.expressions.Md5U64Expr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("sortable_double_bits"),
      new ExpressionInfo(
        classOf[graft.expressions.SortableDoubleBitsExpr].getName, "sortable_double_bits"),
      (children: Seq[Expression]) =>
        graft.expressions.SortableDoubleBitsExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("jump_hash"),
      new ExpressionInfo(classOf[graft.expressions.JumpConsistentHash].getName, "jump_hash"),
      (children: Seq[Expression]) =>
        graft.expressions.JumpConsistentHash(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("farm_fingerprint64"),
      new ExpressionInfo(classOf[graft.expressions.FarmFingerprint64Expr].getName, "farm_fingerprint64"),
      (children: Seq[Expression]) =>
        graft.expressions.FarmFingerprint64Expr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("sip_hash64"),
      new ExpressionInfo(classOf[graft.expressions.SipHash64Expr].getName, "sip_hash64"),
      (children: Seq[Expression]) =>
        graft.expressions.SipHash64Expr(children.head)))
    // Spark ships BloomFilterAggregate / BloomFilterMightContain for its
    // runtime row-level filters but does not register them as SQL
    // functions; surface them for the l31 incremental-dedup op (the
    // aggregate OR-merges fixed-size partials map-side; the probe is a
    // codegen'd BinaryExpression — no UDF).
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))
  }
}
