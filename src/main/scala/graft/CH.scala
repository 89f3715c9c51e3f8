package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ClickHouse-named scalar combinators (SURVEY §2.H), each a pure
  * codegen'd Catalyst expression — no UDFs anywhere (SURVEY §4).
  *
  * The one directly-evidenced reference function is `toYYYYMM`
  * (reference `Dockerfile:228`, the query_log PARTITION BY expression);
  * the rest are the ClickHouse 25.7 surface delivered by the pinned
  * binary (reference `Dockerfile:102-126`).
  */
object CH {

  /** CH `toYYYYMM(d)` → 202401-style int. Arithmetic on year/month is
    * cheaper than a format-string round trip and stays in codegen. */
  def toYYYYMM(c: Column): Column = (year(c) * 100 + month(c)).cast(IntegerType)

  def toYear(c: Column): Column = year(c)
  def toMonth(c: Column): Column = month(c)
  def toDayOfMonth(c: Column): Column = dayofmonth(c)
  def toHour(c: Column): Column = hour(c)
  def toStartOfMonth(c: Column): Column = date_trunc("month", c)
  def toStartOfDay(c: Column): Column = date_trunc("day", c)
  def toStartOfWeek(c: Column): Column = date_trunc("week", c)

  /** CH `multiIf(c1,v1, c2,v2, …, default)` as a when-chain. */
  def multiIf(branches: (Column, Column)*)(default: Column): Column =
    branches.foldRight(default) { case ((c, v), acc) => when(c, v).otherwise(acc) }

  /** CH `if(c,a,b)`. */
  def iff(c: Column, a: Column, b: Column): Column = when(c, a).otherwise(b)

  /** CH `intDiv` — integral division truncating toward zero, via
    * Catalyst's IntegralDivide (same semantics for positive operands). */
  def intDiv(a: Column, b: Column): Column = call_function("div", a, b)

  def ifNull(a: Column, b: Column): Column = coalesce(a, b)

  /** CH `arrayJoin` — the row-exploding scalar; `Generator` in Spark. */
  def arrayJoin(c: Column): Column = explode(c)

  /** Cast to an exact decimal for order-independent money aggregation
    * (SURVEY §7.1 determinism axiom). */
  def dec(c: Column, p: Int = 12, s: Int = 2): Column = c.cast(DecimalType(p, s))

  /** sumIf / countIf / avgIf combinators (SURVEY §2.D3). */
  def sumIf(x: Column, cond: Column): Column = sum(when(cond, x))
  def countIf(cond: Column): Column = count(when(cond, lit(1)))
}
