package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ClickHouse function-NAME surface through the SQL text door
  * (VERDICT r18 next #1): every assert here types a CH-spelled query
  * body at `spark.sql` (what the HTTP/MySQL/PG doors hand it after the
  * ChSql clause rewrite) and checks the value against the documented
  * CH semantics. Scalar expectations are computed independently (by
  * hand or by a Spark-spelled twin), not by re-running the same
  * builder. */
class ChNamesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one(sql: String): Any =
    ChSql.sql(spark, sql).collect().head.get(0)

  private def row(sql: String): Seq[Any] =
    ChSql.sql(spark, sql).collect().head.toSeq

  // ---- date/time -------------------------------------------------------

  test("toYYYYMM / toYYYYMMDD (Dockerfile:228's partition expression)") {
    assert(one("SELECT toYYYYMM(DATE'2024-03-07')") == 202403)
    assert(one("SELECT toYYYYMM(TIMESTAMP'1998-12-01 23:59:59')") == 199812)
    assert(one("SELECT toYYYYMMDD(DATE'2024-03-07')") == 20240307)
    assert(one("SELECT toYYYYMMDDhhmmss(TIMESTAMP'2024-03-07 01:02:03')") == 20240307010203L)
  }

  test("calendar part extractors match CH conventions") {
    assert(row(
      """SELECT toYear(d), toQuarter(d), toMonth(d), toDayOfMonth(d),
        |  toDayOfYear(d), toHour(t), toMinute(t), toSecond(t)
        |FROM (SELECT DATE'2024-03-07' AS d, TIMESTAMP'2024-03-07 13:14:15' AS t)""".stripMargin) ==
      Seq(2024, 1, 3, 7, 67, 13, 14, 15))
    // 2024-03-07 is a Thursday: CH toDayOfWeek = 4 (Mon=1)
    assert(one("SELECT toDayOfWeek(DATE'2024-03-07')") == 4)
    assert(one("SELECT toDayOfWeek(DATE'2024-03-10')") == 7) // Sunday
  }

  test("toStartOf family: CH return types and week modes") {
    assert(one("SELECT toStartOfMonth(TIMESTAMP'2024-03-07 13:14:15')").toString == "2024-03-01")
    assert(one("SELECT toStartOfYear(DATE'2024-03-07')").toString == "2024-01-01")
    assert(one("SELECT toStartOfQuarter(DATE'2024-05-07')").toString == "2024-04-01")
    // CH default mode 0: week starts SUNDAY; mode 1: Monday
    assert(one("SELECT toStartOfWeek(DATE'2024-03-07')").toString == "2024-03-03")
    assert(one("SELECT toStartOfWeek(DATE'2024-03-07', 1)").toString == "2024-03-04")
    assert(one("SELECT toMonday(DATE'2024-03-07')").toString == "2024-03-04")
    assert(one("SELECT toStartOfDay(TIMESTAMP'2024-03-07 13:14:15')").toString ==
      "2024-03-07 00:00:00.0")
    assert(one("SELECT toStartOfHour(TIMESTAMP'2024-03-07 13:14:15')").toString ==
      "2024-03-07 13:00:00.0")
    assert(one("SELECT toStartOfFifteenMinutes(TIMESTAMP'2024-03-07 13:44:15')").toString ==
      "2024-03-07 13:30:00.0")
  }

  test("add*/subtract* work on Date and DateTime; dateDiff unit vocabulary") {
    assert(one("SELECT addDays(DATE'2024-02-28', 2)").toString.startsWith("2024-03-01"))
    assert(one("SELECT addMonths(TIMESTAMP'2024-01-31 10:00:00', 1)").toString ==
      "2024-02-29 10:00:00.0")
    assert(one("SELECT subtractHours(TIMESTAMP'2024-03-01 01:00:00', 2)").toString ==
      "2024-02-29 23:00:00.0")
    assert(one("SELECT dateDiff('day', DATE'2024-01-01', DATE'2024-03-01')") == 60)
    assert(one("SELECT dateDiff('month', DATE'2024-01-31', DATE'2024-02-01')") == 1)
    assert(one("SELECT dateDiff('year', DATE'2023-12-31', DATE'2024-01-01')") == 1)
    assert(one(
      "SELECT dateDiff('second', TIMESTAMP'2024-01-01 00:00:00', TIMESTAMP'2024-01-01 00:01:30')") == 90L)
    assert(one(
      "SELECT dateDiff('hour', TIMESTAMP'2024-01-01 00:00:00', TIMESTAMP'2024-01-02 03:00:00')") == 27L)
  }

  test("toUnixTimestamp / fromUnixTimestamp round-trip; formatDateTime %-specifiers") {
    assert(one("SELECT toUnixTimestamp(TIMESTAMP'1970-01-02 00:00:00')") == 86400L)
    assert(one("SELECT fromUnixTimestamp(86400)").toString == "1970-01-02 00:00:00.0")
    assert(one(
      "SELECT formatDateTime(TIMESTAMP'2024-03-07 13:14:15', '%Y-%m-%d %H:%i:%s')") ==
      "2024-03-07 13:14:15")
    assert(one("SELECT formatDateTime(DATE'2024-03-07', '%F')") == "2024-03-07")
  }

  // ---- conversions / conditionals ---------------------------------------

  test("toInt*/toFloat*/toString/toDecimal cast family") {
    assert(one("SELECT toInt64('42')") == 42L)
    assert(one("SELECT toInt32(7.9)") == 7) // CH truncates toward zero, like cast
    assert(one("SELECT toUInt64(5)") == new java.math.BigDecimal(5))
    assert(one("SELECT toFloat64('2.5')") == 2.5d)
    assert(one("SELECT toString(DATE'2024-03-07')") == "2024-03-07")
    assert(one("SELECT toDecimal64('3.14159', 2)") == new java.math.BigDecimal("3.14"))
    assert(one("SELECT toDate('2024-03-07')").toString == "2024-03-07")
    assert(one("SELECT parseDateTimeBestEffort('2024-03-07 01:02:03')").toString ==
      "2024-03-07 01:02:03.0")
  }

  test("multiIf / ifNull / empty / intDiv family") {
    assert(one("SELECT multiIf(1 > 2, 'a', 2 > 1, 'b', 'z')") == "b")
    assert(one("SELECT multiIf(1 > 2, 'a', 'z')") == "z")
    assert(one("SELECT ifNull(CAST(NULL AS INT), 9)") == 9)
    assert(one("SELECT empty('')") == true)
    assert(one("SELECT notEmpty('x')") == true)
    assert(one("SELECT intDiv(7, 2)") == 3L)
    assert(one("SELECT intDivOrZero(7, 0)") == 0L)
    assert(one("SELECT modulo(7, 3)") == 1)
    assert(one("SELECT moduloOrZero(7, 0)") == 0L)
    assert(one("SELECT plus(2, 3)") == 5)
    assert(one("SELECT divide(7, 2)") == 3.5d) // CH divide is float division
    assert(one("SELECT roundBankers(CAST(2.5 AS DOUBLE))") == 2.0d)
    assert(one("SELECT roundBankers(CAST(3.5 AS DOUBLE))") == 4.0d)
    assert(one("SELECT exp2(10)") == 1024.0d)
  }

  // ---- strings ------------------------------------------------------------

  test("string family: split/replace/trim/extract/match/count") {
    assert(one("SELECT splitByChar(',', 'a,b,,c')") ==
      Seq("a", "b", "", "c"))
    assert(one("SELECT arrayStringConcat(array('a','b'), '-')") == "a-b")
    assert(one("SELECT replaceAll('aXbXc', 'X', '_')") == "a_b_c")
    assert(one("SELECT replaceRegexpAll('ab12cd', '[0-9]+', '#')") == "ab#cd")
    // CH backrefs are \1 — translated to Java's $1 for literals
    assert(one("SELECT replaceRegexpAll('2024-03-07', '(\\\\d+)-(\\\\d+)-(\\\\d+)', '\\\\3/\\\\2/\\\\1')") ==
      "07/03/2024")
    assert(one("SELECT trimLeft('  x ')") == "x ")
    assert(one("SELECT positionUTF8('Hello', 'll')") == 3)
    assert(one("SELECT extract('key=val', '=(\\\\w+)')") == "val")
    assert(one("SELECT extract('abc123', '[0-9]+')") == "123")
    assert(one("SELECT extractAll('a1b22c333', '[0-9]+')") == Seq("1", "22", "333"))
    assert(one("SELECT match('hello42', '^[a-z]+[0-9]+$')") == true)
    assert(one("SELECT countSubstrings('abcabcab', 'ab')") == 3L)
    assert(one("SELECT multiSearchAny('hello world', array('xyz', 'wor'))") == true)
    assert(one("SELECT notLike('abc', 'a%')") == false)
    assert(one("SELECT lengthUTF8('héllo')") == 5)
    assert(one("SELECT base64Decode(base64Encode('graft'))") == "graft")
    assert(one("SELECT substringIndex('a.b.c', '.', 2)") == "a.b")
  }

  // ---- arrays (lambda-first CH forms) ---------------------------------------

  test("array higher-order family: CH lambda-first argument order") {
    assert(one("SELECT arrayMap(x -> x * 2, array(1, 2, 3))") == Seq(2, 4, 6))
    assert(one("SELECT arrayFilter(x -> x % 2 = 0, array(1, 2, 3, 4))") == Seq(2, 4))
    assert(one("SELECT arrayExists(x -> x > 2, array(1, 2, 3))") == true)
    assert(one("SELECT arrayAll(x -> x > 0, array(1, 2, 3))") == true)
    assert(one("SELECT arrayFirst(x -> x > 1, array(1, 2, 3))") == 2)
    assert(one("SELECT arrayCount(x -> x > 1, array(1, 2, 3))") == 2)
    assert(one("SELECT arraySum(array(1, 2, 3))") == 6.0d)
    assert(one("SELECT arrayAvg(array(1, 2, 3))") == 2.0d)
    assert(one("SELECT arrayReduce('max', array(1, 5, 3))") == 5)
  }

  test("array utility family") {
    assert(one("SELECT arrayUniq(array(1, 2, 2, 3))") == 3)
    assert(one("SELECT arraySort(array(3, 1, 2))") == Seq(1, 2, 3))
    assert(one("SELECT arrayReverseSort(array(3, 1, 2))") == Seq(3, 2, 1))
    assert(one("SELECT arrayDistinct(array(1, 2, 2))") == Seq(1, 2))
    assert(one("SELECT arrayConcat(array(1), array(2, 3))") == Seq(1, 2, 3))
    assert(one("SELECT arraySlice(array(1, 2, 3, 4), 2, 2)") == Seq(2, 3))
    assert(one("SELECT arraySlice(array(1, 2, 3, 4), 3)") == Seq(3, 4))
    assert(one("SELECT arrayPushBack(array(1), 2)") == Seq(1, 2))
    assert(one("SELECT arrayPopBack(array(1, 2))") == Seq(1))
    assert(one("SELECT arrayPopFront(array(1, 2))") == Seq(2))
    assert(one("SELECT has(array(1, 2), 2)") == true)
    assert(one("SELECT hasAny(array(1, 2), array(2, 9))") == true)
    assert(one("SELECT hasAll(array(1, 2, 3), array(1, 3))") == true)
    assert(one("SELECT indexOf(array(10, 20, 30), 20)") == 2L)
    assert(one("SELECT indexOf(array(10), 99)") == 0L)
    assert(one("SELECT arrayEnumerate(array('a', 'b', 'c'))") == Seq(1, 2, 3))
    assert(one("SELECT arrayDifference(array(1, 4, 9))") == Seq(0, 3, 5))
    assert(one("SELECT arrayIntersect(array(1, 2, 3), array(2, 3, 4), array(3))") == Seq(3))
    assert(one("SELECT range(4)") == Seq(0, 1, 2, 3))
    assert(one("SELECT range(0)") == Seq())
    assert(one("SELECT arrayFlatten(array(array(1), array(2, 3)))") == Seq(1, 2, 3))
  }

  test("arrayJoin explodes rows like CH's row-generating scalar") {
    val got = ChSql.sql(spark, "SELECT arrayJoin(array(1, 2, 3)) AS v")
      .collect().map(_.get(0)).toSeq
    assert(got == Seq(1, 2, 3))
  }

  // ---- maps / JSON ------------------------------------------------------------

  test("map and JSON extraction family") {
    assert(one("SELECT mapKeys(map('a', 1, 'b', 2))") == Seq("a", "b"))
    assert(one("SELECT mapValues(map('a', 1))") == Seq(1))
    assert(one("SELECT mapContains(map('a', 1), 'a')") == true)
    val j = """'{"k": "v", "n": 7, "f": 2.5, "b": true, "arr": [1,2]}'"""
    assert(one(s"SELECT JSONExtractString($j, 'k')") == "v")
    assert(one(s"SELECT JSONExtractInt($j, 'n')") == 7L)
    assert(one(s"SELECT JSONExtractFloat($j, 'f')") == 2.5d)
    assert(one(s"SELECT JSONExtractBool($j, 'b')") == true)
    assert(one(s"SELECT JSONHas($j, 'k')") == true)
    assert(one(s"SELECT JSONHas($j, 'zz')") == false)
    assert(one(s"SELECT JSONLength('[1,2,3]')") == 3)
    assert(one(s"SELECT JSONLength($j)") == 5)
    assert(one(s"SELECT JSONExtractKeys('{\"x\":1,\"y\":2}')") == Seq("x", "y"))
  }

  // ---- hash / bits / URL --------------------------------------------------------

  test("hash, bit and URL families") {
    // sipHash64/farmFingerprint64 resolve to the byte-parity kernels
    assert(one("SELECT sipHash64('graft')").isInstanceOf[Long])
    assert(one("SELECT halfMD5('graft')").isInstanceOf[Long])
    assert(one("SELECT SHA256('abc')") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(one("SELECT bitAnd(12, 10)") == 8)
    assert(one("SELECT bitOr(12, 10)") == 14)
    assert(one("SELECT bitXor(12, 10)") == 6)
    assert(one("SELECT bitShiftLeft(1, 10)") == 1024)
    assert(one("SELECT bitCount(255)") == 8)
    assert(one("SELECT bitTest(5, 0)") == 1.toByte)
    assert(one("SELECT bitTest(5, 1)") == 0.toByte)
    val u = "'https://www.example.com/a/b?q=1&r=2#frag'"
    assert(one(s"SELECT protocol($u)") == "https")
    assert(one(s"SELECT domain($u)") == "www.example.com")
    assert(one(s"SELECT domainWithoutWWW($u)") == "example.com")
    assert(one(s"SELECT path($u)") == "/a/b")
    assert(one(s"SELECT queryString($u)") == "q=1&r=2")
    assert(one(s"SELECT extractURLParameter($u, 'r')") == "2")
    assert(one(s"SELECT cutQueryString($u)") == "https://www.example.com/a/b")
    assert(one("SELECT IPv4NumToString(3232235777)") == "192.168.1.1")
    assert(one("SELECT IPv4StringToNum('192.168.1.1')") == 3232235777L)
  }

  // ---- aggregates -----------------------------------------------------------------

  test("aggregate family over a literal relation") {
    val t = "FROM (VALUES (1, 10), (2, 20), (2, 30), (3, NULL)) AS t(k, v)"
    assert(one(s"SELECT countIf(k = 2) $t") == 2L)
    assert(one(s"SELECT sumIf(v, k = 2) $t") == 50L)
    assert(one(s"SELECT avgIf(v, k = 2) $t") == 25.0d)
    assert(one(s"SELECT uniqExact(k) $t") == 3L)
    assert(one(s"SELECT uniq(k) $t") == 3L)
    assert(one(s"SELECT argMax(k, v) $t") == 2)
    assert(one(s"SELECT argMin(k, v) $t") == 1)
    assert(one(s"SELECT median(v) $t") == 20.0d)
    assert(one(s"SELECT arraySort(groupArray(k)) $t") == Seq(1, 2, 2, 3))
    assert(one(s"SELECT arraySort(groupUniqArray(k)) $t") == Seq(1, 2, 3))
    // v ∈ {10,20,30} (NULL skipped): mean 20, population variance 200/3
    assert(math.abs(one(s"SELECT varPop(v) $t").asInstanceOf[Double] - 200.0 / 3) < 1e-9)
    assert(one(s"SELECT avgWeighted(v, k) $t") == (10 * 1 + 20 * 2 + 30 * 2) / 5.0d)
    assert(one(s"SELECT groupBitOr(k) $t") == 3)
    assert(one(s"SELECT any(v) FROM (VALUES (CAST(NULL AS INT)), (7)) AS t(v)") == 7)
    assert(one(s"SELECT stddevPop(v) FROM (VALUES (2), (2)) AS t(v)") == 0.0d)
  }

  // ---- parametric grammar ------------------------------------------------------------

  test("parametric syntax: quantile(q)(x), quantiles, uniqUpTo") {
    val t = "FROM (VALUES (1), (2), (3), (4), (5)) AS t(v)"
    assert(one(s"SELECT quantile(0.5)(v) $t") == 3.0d)
    assert(one(s"SELECT quantileExact(0.25)(v) $t") == 2.0d)
    assert(one(s"SELECT quantiles(0.25, 0.75)(v) $t") == Seq(2.0d, 4.0d))
    assert(one(s"SELECT uniqUpTo(3)(v) $t") == 4L) // 5 distinct, capped at n+1
    assert(one(s"SELECT uniqUpTo(9)(v) $t") == 5L)
    // nested call in the argument position
    assert(one(s"SELECT quantile(0.5)(v + intDiv(v, 5)) $t") == 3.0d)
    // approx family resolves (value check is sketch-dependent)
    assert(one(s"SELECT quantileTDigest(0.5)(v) $t").isInstanceOf[Double])
    // a string literal containing the shape is data
    assert(one("SELECT 'quantile(0.5)(x)'") == "quantile(0.5)(x)")
  }

  // ---- r20 widening (VERDICT r19 next #5) ------------------------------

  test("r20 dates: ISO week/year, last day, quarters, relative nums, slots") {
    // 2024-01-01 is a Monday in ISO week 1 of 2024; 2023-01-01 is a
    // Sunday in ISO week 52 of ISO year 2022
    assert(one("SELECT toISOWeek(DATE'2024-01-01')") == 1)
    assert(one("SELECT toISOWeek(DATE'2023-01-01')") == 52)
    assert(one("SELECT toISOYear(DATE'2023-01-01')") == 2022)
    assert(one("SELECT toISOYear(DATE'2024-12-31')") == 2025) // ISO week 1 of 2025
    assert(one("SELECT toLastDayOfMonth(DATE'2024-02-07')").toString == "2024-02-29")
    assert(one("SELECT addQuarters(DATE'2024-01-15', 2)").toString.startsWith("2024-07-15"))
    assert(one("SELECT subtractQuarters(DATE'2024-01-15', 1)").toString.startsWith("2023-10-15"))
    assert(one("SELECT toRelativeMonthNum(DATE'2024-03-07')") == 2024 * 12 + 3)
    assert(one("SELECT toRelativeDayNum(DATE'1970-01-03')") == 2)
    assert(one("SELECT timeSlot(TIMESTAMP'2024-03-07 13:44:15')").toString ==
      "2024-03-07 13:30:00.0")
    assert(one("SELECT monthName(DATE'2024-03-07')") == "March")
    assert(one("SELECT toUnixTimestamp64Milli(TIMESTAMP'1970-01-02 00:00:01')") == 86401000L)
    assert(one("SELECT fromUnixTimestamp64Milli(86400000)").toString ==
      "1970-01-02 00:00:00.0")
    assert(one("SELECT parseDateTime('07/03/2024', '%d/%m/%Y')").toString ==
      "2024-03-07 00:00:00.0")
    assert(one("SELECT parseDateTimeBestEffortOrNull('not a date')") == null)
  }

  test("r20 conversions: OrZero/OrNull via TRY casts, toTypeName") {
    assert(one("SELECT toInt64OrZero('42')") == 42L)
    assert(one("SELECT toInt64OrZero('abc')") == 0L)
    assert(one("SELECT toInt64OrNull('abc')") == null)
    assert(one("SELECT toInt32OrNull('7')") == 7)
    assert(one("SELECT toFloat64OrZero('2.5')") == 2.5)
    assert(one("SELECT toFloat64OrNull('x')") == null)
    assert(one("SELECT toTypeName(1 + 1)") == "int")
  }

  test("r20 math/misc: intExp2/10, isFinite/isInfinite, uuid shapes") {
    assert(one("SELECT intExp2(10)") == 1024L)
    assert(one("SELECT intExp10(3)") == 1000L)
    assert(one("SELECT isFinite(1.5)") == true)
    assert(one("SELECT isFinite(CAST('Infinity' AS DOUBLE))") == false)
    assert(one("SELECT isFinite(CAST('NaN' AS DOUBLE))") == false)
    assert(one("SELECT isInfinite(CAST('-Infinity' AS DOUBLE))") == true)
    assert(one("SELECT isInfinite(2.0)") == false)
    assert(one("SELECT generateUUIDv4()").toString.length == 36)
    val r = one("SELECT randCanonical()").asInstanceOf[Double]
    assert(r >= 0.0 && r < 1.0)
  }

  test("r20 strings: tokens, format, countMatches, trailing char, IP/URL helpers") {
    assert(one("SELECT tokens('a, b; c-d')") ==
      Seq("a", "b", "c", "d"))
    assert(one("SELECT format('{} owes {} cents', 'bob', 42)") == "bob owes 42 cents")
    assert(one("SELECT format('100% of {}', 'x')") == "100% of x")
    assert(one("SELECT appendTrailingCharIfAbsent('dir', '/')") == "dir/")
    assert(one("SELECT appendTrailingCharIfAbsent('dir/', '/')") == "dir/")
    assert(one("SELECT concatAssumeInjective('a', 'b', 'c')") == "abc")
    assert(one("SELECT reverseUTF8('abc')") == "cba")
    assert(one("SELECT countMatches('a1b22c333', '[0-9]+')") == 3)
    assert(one("SELECT isIPv4String('192.168.0.1')") == true)
    assert(one("SELECT isIPv4String('256.1.1.1')") == false)
    assert(one("SELECT isIPv4String('a.b.c.d')") == false)
    assert(one("SELECT topLevelDomain('https://news.example.com/p')") == "com")
    assert(one("SELECT encodeURLComponent('a b&c')") == "a+b%26c")
    assert(one("SELECT decodeURLComponent('a+b%26c')") == "a b&c")
  }

  test("r20 arrays: arrayWithConstant, arrayProduct, arrayCumSum") {
    assert(one("SELECT arrayWithConstant(3, 'x')") == Seq("x", "x", "x"))
    assert(one("SELECT arrayProduct(array(2, 3, 4))") == 24.0)
    assert(one("SELECT arrayCumSum(array(1, 2, 3))") == Seq(1.0, 3.0, 6.0))
    assert(one("SELECT arrayCumSum(array())") == Seq())
  }

  test("r20 json: typed JSONExtract with the CH type grammar, mapFromArrays") {
    val j = """'{"a": 7, "b": "x", "c": 2.5}'"""
    assert(one(s"SELECT JSONExtract($j, 'a', 'Int64')") == 7L)
    assert(one(s"SELECT JSONExtract($j, 'b', 'String')") == "x")
    assert(one(s"SELECT JSONExtract($j, 'c', 'Float64')") == 2.5)
    assert(one(s"SELECT JSONExtract($j, 'a', 'Nullable(Int32)')") == 7)
    assert(one(s"SELECT JSONExtractUInt($j, 'a')") == 7L)
    assert(one("SELECT mapFromArrays(array('k1', 'k2'), array(1, 2))") ==
      Map("k1" -> 1, "k2" -> 2))
  }

  test("r20 aggregates: countDistinct spelling and the widened -If family") {
    Engine.registerAll(spark, TestSpark.sf)
    val df = ChSql.sql(spark,
      """SELECT countDistinct(o_orderstatus) AS ds,
        |  uniqExactIf(o_custkey, o_totalprice > 100000) AS ue,
        |  anyIf(o_orderstatus, o_orderpriority = '1-URGENT') AS a1,
        |  argMaxIf(o_orderstatus, o_totalprice, o_orderkey % 2 = 0) AS am,
        |  sumWithOverflow(o_custkey) AS so
        |FROM orders""".stripMargin)
    val r = df.collect().head
    // independent Spark-spelled twin
    val tw = spark.sql(
      """SELECT count(DISTINCT o_orderstatus),
        |  count(DISTINCT CASE WHEN o_totalprice > 100000 THEN o_custkey END),
        |  first(CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderstatus END, true),
        |  max_by(CASE WHEN o_orderkey % 2 = 0 THEN o_orderstatus END,
        |         CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END),
        |  sum(o_custkey)
        |FROM orders""".stripMargin).collect().head
    assert(r.toSeq == tw.toSeq)
    // groupArrayIf keeps only matching rows
    assert(one("SELECT array_sort(groupArrayIf(x, x > 1)) FROM (SELECT explode(array(1,2,3)) AS x)") ==
      Seq(2, 3))
    assert(one("SELECT uniqIf(x, x > 1) FROM (SELECT explode(array(1,2,3,3)) AS x)") == 2L)
  }

  test("a full CH-spelled analytics body runs end-to-end on testdata") {
    Engine.registerAll(spark, TestSpark.sf)
    val df = ChSql.sql(spark,
      """SELECT toYYYYMM(o_orderdate) AS ym,
        |  uniqExact(o_custkey) AS buyers,
        |  countIf(o_totalprice > 100000) AS big,
        |  quantile(0.5)(o_totalprice) AS med
        |FROM orders
        |PREWHERE toYear(o_orderdate) = 1995
        |GROUP BY ym ORDER BY ym LIMIT 3""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows.head.getInt(0) == 199501)
    assert(rows.forall(_.getLong(1) > 0))
  }
}
