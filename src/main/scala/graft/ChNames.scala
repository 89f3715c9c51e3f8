package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{ArrayAggregate, ArrayExists, ArrayFilter, ArrayForAll, ArrayTransform, Cast, EvalMode, Expression, ExpressionInfo, LambdaFunction, Literal, UnresolvedNamedLambdaVariable}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse FUNCTION-NAME resolution for the SQL text front door
  * (VERDICT r18 "What's missing" #1 / next-round #1): a real ClickHouse
  * query body — `SELECT toYYYYMM(ts), uniqExact(id), countIf(x > 0)
  * FROM t GROUP BY 1` — must resolve when pasted at the HTTP/MySQL/PG
  * wire doors. The CH-named surface already existed as Scala
  * combinators ([[CH]]); this registers it through the session
  * FunctionRegistry so it resolves from TEXT.
  *
  * Mechanism: every builder returns a composition of
  * [[UnresolvedFunction]]s over Spark's own built-ins (plus the
  * engine's injected kernels) — the analyzer's ResolveFunctions
  * fixed-point then resolves the inner names exactly as if the user
  * had typed the Spark spelling. That keeps this file a pure NAME MAP:
  * no evaluation code, no codegen, no new expression classes to
  * maintain; everything lands on codegen'd built-ins. Registry lookups
  * are case-insensitive, so `toYYYYMM`/`toyyyymm` both hit.
  *
  * Scope: CH names that DON'T already resolve. Where Spark ships the
  * same name with the same meaning (`length`, `lower`, `concat`,
  * `coalesce`, `abs`, `round`, `xxHash64` → `xxhash64`, …) nothing is
  * registered — the case-insensitive registry already serves them.
  * Deliberately NOT registered (documented divergences, each would
  * silently change meaning for Spark-SQL users of the same session):
  * `position` (CH argument order is (haystack, needle) — Spark ships
  * the reverse; use `positionUTF8`/`locate`), 1-based `arr[i]`
  * indexing (Spark is 0-based), `arrayElement` (CH returns a type
  * default out of bounds, Spark NULL/error), `arrayCompact` (Spark's
  * same-named built-in removes NULLs, CH removes consecutive dups).
  *
  * Reference surface: the pinned ClickHouse 25.7 binary's function
  * namespace (reference `Dockerfile:102-126`); the one directly
  * evidenced name is `toYYYYMM` (`Dockerfile:228`). Parametric
  * aggregate syntax — `quantile(0.9)(x)` — is a grammar form, not a
  * name, and rewrites in [[ChSql.rewriteParametricAggs]].
  */
object ChNames {

  private type B = Seq[Expression] => Expression

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(name, args.toSeq, isDistinct = false)

  private def lit(v: Any): Expression = Literal(v)
  private def nul: Expression = Literal(null, NullType)

  /** Fresh-named lambda `x -> body(x)` for higher-order expressions.
    * HOFs must be the RESOLVED expression classes (ArrayTransform &c.),
    * not UnresolvedFunction("transform") — the analyzer validates that
    * a lambda's parent IS a HigherOrderFunction before the inner name
    * would resolve, so the indirection fails analysis. */
  private def lam1(body: Expression => Expression): LambdaFunction = {
    val x = UnresolvedNamedLambdaVariable(Seq("__ch_x"))
    LambdaFunction(body(x), Seq(x))
  }
  private def lam2(body: (Expression, Expression) => Expression): LambdaFunction = {
    val x = UnresolvedNamedLambdaVariable(Seq("__ch_x"))
    val i = UnresolvedNamedLambdaVariable(Seq("__ch_i"))
    LambdaFunction(body(x, i), Seq(x, i))
  }
  private def lamFn(e: Expression): LambdaFunction = e match {
    case l: LambdaFunction => l
    case other => throw new IllegalArgumentException(
      s"expected a lambda (x -> …), got: $other")
  }
  /** CH arraySum shape: fold `+` over the array in DOUBLE. */
  private def arrSum(arr: Expression): Expression = {
    val acc = UnresolvedNamedLambdaVariable(Seq("__ch_acc"))
    val x = UnresolvedNamedLambdaVariable(Seq("__ch_x"))
    new ArrayAggregate(arr, lit(0.0d), LambdaFunction(fn("+", acc, x), Seq(acc, x)))
  }

  private def litString(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got: $other")
  }
  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType)   => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  // ---- date/time -----------------------------------------------------

  /** CH `formatDateTime` %-specifiers → java.time pattern (the subset
    * with an exact, unambiguous equivalent; %M is skipped — its
    * meaning changed across CH versions). Literal-only. */
  private def chDateFormat(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case 'Y' => sb.append("yyyy")
          case 'y' => sb.append("yy")
          case 'm' => sb.append("MM")
          case 'd' => sb.append("dd")
          case 'H' => sb.append("HH")
          case 'h' => sb.append("hh")
          case 'i' => sb.append("mm")
          case 's' | 'S' => sb.append("ss")
          case 'F' => sb.append("yyyy-MM-dd")
          case 'D' => sb.append("MM/dd/yy")
          case 'T' => sb.append("HH:mm:ss")
          case 'e' => sb.append("d")
          case 'j' => sb.append("DDD")
          case 'a' => sb.append("EEE")
          case 'w' => sb.append("e")
          case '%' => sb.append('%')
          case o => throw new IllegalArgumentException(
            s"formatDateTime: unsupported specifier %$o")
        }
        i += 2
      } else {
        // literal run; quote letters so they don't read as pattern
        if (c.isLetter) sb.append('\'').append(c).append('\'') else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** `timestampadd`-shaped add/subtract family (CH addDays etc. accept
    * Date and DateTime; `+ make_interval(...)` coerces both sides). */
  private def addUnits(t: Expression, n: Expression,
      years: Expression = lit(0), months: Expression = lit(0),
      weeks: Expression = lit(0), days: Expression = lit(0),
      hours: Expression = lit(0), mins: Expression = lit(0),
      secs: Expression = lit(0)): Expression = {
    def pick(u: Expression) = if (u eq n) n else u
    fn("+", t, fn("make_interval", pick(years), pick(months), pick(weeks),
      pick(days), pick(hours), pick(mins), Cast(pick(secs), DecimalType(18, 6))))
  }
  private def neg(n: Expression): Expression = fn("negative", n)

  private val dateTime: Seq[(String, B)] = Seq(
    // toYYYYMM is the one directly-evidenced reference function
    // (Dockerfile:228, the query_log PARTITION BY expression)
    "toYYYYMM" -> (a => Cast(
      fn("+", fn("*", fn("year", a(0)), lit(100)), fn("month", a(0))), IntegerType)),
    "toYYYYMMDD" -> (a => Cast(
      fn("+", fn("*", fn("+", fn("*", fn("year", a(0)), lit(100)), fn("month", a(0))),
        lit(100)), fn("day", a(0))), IntegerType)),
    "toYYYYMMDDhhmmss" -> (a =>
      Cast(fn("date_format", a(0), lit("yyyyMMddHHmmss")), LongType)),
    "toYear" -> (a => fn("year", a(0))),
    "toQuarter" -> (a => fn("quarter", a(0))),
    "toMonth" -> (a => fn("month", a(0))),
    "toDayOfMonth" -> (a => fn("day", a(0))),
    "toDayOfYear" -> (a => fn("dayofyear", a(0))),
    // CH toDayOfWeek: Monday = 1 … Sunday = 7; Spark weekday: Monday = 0
    "toDayOfWeek" -> (a => fn("+", fn("weekday", a(0)), lit(1))),
    "toHour" -> (a => fn("hour", a(0))),
    "toMinute" -> (a => fn("minute", a(0))),
    "toSecond" -> (a => fn("second", a(0))),
    "toDate" -> (a => Cast(a(0), DateType)),
    "toDateTime" -> (a => Cast(a(0), TimestampType)),
    "toStartOfYear" -> (a => Cast(fn("date_trunc", lit("year"), a(0)), DateType)),
    "toStartOfQuarter" -> (a => Cast(fn("date_trunc", lit("quarter"), a(0)), DateType)),
    "toStartOfMonth" -> (a => Cast(fn("date_trunc", lit("month"), a(0)), DateType)),
    // CH toStartOfWeek default mode 0 = week starts SUNDAY (mode 1/3 =
    // Monday); Spark date_trunc('week') is Monday-based, so build from
    // day arithmetic (dayofweek: Sunday = 1, weekday: Monday = 0)
    "toStartOfWeek" -> (a => {
      val d = Cast(a(0), DateType)
      val monday = a.length > 1 && litInt(a(1), "toStartOfWeek mode") % 2 == 1
      if (monday) fn("date_sub", d, fn("weekday", a(0)))
      else fn("date_sub", d, fn("-", fn("dayofweek", a(0)), lit(1)))
    }),
    "toMonday" -> (a => fn("date_sub", Cast(a(0), DateType), fn("weekday", a(0)))),
    "toStartOfDay" -> (a => fn("date_trunc", lit("day"), a(0))),
    "toStartOfHour" -> (a => fn("date_trunc", lit("hour"), a(0))),
    "toStartOfMinute" -> (a => fn("date_trunc", lit("minute"), a(0))),
    "toStartOfFiveMinutes" -> (a => trunSecs(a(0), 300)),
    "toStartOfTenMinutes" -> (a => trunSecs(a(0), 600)),
    "toStartOfFifteenMinutes" -> (a => trunSecs(a(0), 900)),
    "toUnixTimestamp" -> (a => fn("unix_timestamp", a(0))),
    "fromUnixTimestamp" -> (a => fn("timestamp_seconds", a(0))),
    "addYears" -> (a => addUnits(a(0), a(1), years = a(1))),
    "addMonths" -> (a => addUnits(a(0), a(1), months = a(1))),
    "addWeeks" -> (a => addUnits(a(0), a(1), weeks = a(1))),
    "addDays" -> (a => addUnits(a(0), a(1), days = a(1))),
    "addHours" -> (a => addUnits(a(0), a(1), hours = a(1))),
    "addMinutes" -> (a => addUnits(a(0), a(1), mins = a(1))),
    "addSeconds" -> (a => addUnits(a(0), a(1), secs = a(1))),
    "subtractYears" -> (a => addUnits(a(0), neg(a(1)), years = neg(a(1)))),
    "subtractMonths" -> (a => addUnits(a(0), neg(a(1)), months = neg(a(1)))),
    "subtractWeeks" -> (a => addUnits(a(0), neg(a(1)), weeks = neg(a(1)))),
    "subtractDays" -> (a => addUnits(a(0), neg(a(1)), days = neg(a(1)))),
    "subtractHours" -> (a => addUnits(a(0), neg(a(1)), hours = neg(a(1)))),
    "subtractMinutes" -> (a => addUnits(a(0), neg(a(1)), mins = neg(a(1)))),
    "subtractSeconds" -> (a => addUnits(a(0), neg(a(1)), secs = neg(a(1)))),
    // CH dateDiff('unit', start, end) counts UNIT-BOUNDARY crossings
    // (dateDiff('month', Jan-31, Feb-01) = 1); Spark's same-named
    // 3-arg parser form is timestampdiff (complete intervals → 0), so
    // [[ChSql]] renames the call to chDateDiff at text level — Spark's
    // parser otherwise intercepts `datediff(unit, a, b)` as grammar
    // and rejects a quoted unit before any registry lookup. The 2-arg
    // Spark spelling falls through to the built-in day difference.
    "chDateDiff" -> (a => {
      if (a.length == 2) fn("datediff", a(0), a(1))
      else dateDiffUnits(a)
    }),
    "formatDateTime" -> (a => fn("date_format", a(0),
      lit(chDateFormat(litString(a(1), "formatDateTime format"))))),
    "parseDateTimeBestEffort" -> (a => Cast(a(0), TimestampType)),
    "today" -> (_ => fn("current_date")),
    "yesterday" -> (_ => fn("date_sub", fn("current_date"), lit(1))),
    // ---- r20 widening (VERDICT r19 next #5) ----
    // Spark's weekofyear IS the ISO week number
    "toISOWeek" -> (a => fn("weekofyear", a(0))),
    // ISO year = calendar year of that ISO week's Thursday
    "toISOYear" -> (a => fn("year",
      fn("date_add", fn("date_sub", Cast(a(0), DateType), fn("weekday", a(0))), lit(3)))),
    "toLastDayOfMonth" -> (a => fn("last_day", a(0))),
    "addQuarters" -> (a => addUnits(a(0), fn("*", a(1), lit(3)),
      months = fn("*", a(1), lit(3)))),
    "subtractQuarters" -> (a => addUnits(a(0), neg(fn("*", a(1), lit(3))),
      months = neg(fn("*", a(1), lit(3))))),
    "toRelativeYearNum" -> (a => fn("year", a(0))),
    "toRelativeMonthNum" -> (a =>
      fn("+", fn("*", fn("year", a(0)), lit(12)), fn("month", a(0)))),
    "toRelativeDayNum" -> (a =>
      fn("datediff", Cast(a(0), DateType), Cast(lit("1970-01-01"), DateType))),
    "timeSlot" -> (a => trunSecs(a(0), 1800)),
    "toStartOfSecond" -> (a => fn("date_trunc", lit("second"), a(0))),
    "toDateTime64" -> (a => Cast(a(0), TimestampType)),
    "toDate32" -> (a => Cast(a(0), DateType)),
    "fromUnixTimestamp64Milli" -> (a => fn("timestamp_millis", a(0))),
    "toUnixTimestamp64Milli" -> (a => fn("unix_millis", Cast(a(0), TimestampType))),
    "parseDateTimeBestEffortOrNull" -> (a =>
      Cast(a(0), TimestampType, None, EvalMode.TRY)),
    "parseDateTime" -> (a => fn("to_timestamp", a(0),
      lit(chDateFormat(litString(a(1), "parseDateTime format"))))),
    "monthName" -> (a => fn("date_format", a(0), lit("MMMM"))))

  private def dateDiffUnits(a: Seq[Expression]): Expression = {
      val unit = litString(a(0), "dateDiff unit").toUpperCase
      val ts = (e: Expression) => Cast(e, TimestampType)
      unit match {
        case "SECOND" => fn("-", fn("unix_timestamp", ts(a(2))), fn("unix_timestamp", ts(a(1))))
        case "MINUTE" => fn("div", fn("-", fn("unix_timestamp", ts(a(2))),
          fn("unix_timestamp", ts(a(1)))), lit(60L))
        case "HOUR" => fn("div", fn("-", fn("unix_timestamp", ts(a(2))),
          fn("unix_timestamp", ts(a(1)))), lit(3600L))
        case "DAY" => fn("datediff", Cast(a(2), DateType), Cast(a(1), DateType))
        case "WEEK" => fn("div", fn("datediff", Cast(a(2), DateType), Cast(a(1), DateType)), lit(7))
        case "MONTH" => Cast(fn("months_between",
          fn("date_trunc", lit("month"), Cast(a(2), DateType)),
          fn("date_trunc", lit("month"), Cast(a(1), DateType))), IntegerType)
        case "QUARTER" => fn("div", Cast(fn("months_between",
          fn("date_trunc", lit("quarter"), Cast(a(2), DateType)),
          fn("date_trunc", lit("quarter"), Cast(a(1), DateType))), IntegerType), lit(3))
        case "YEAR" => fn("-", fn("year", a(2)), fn("year", a(1)))
        case o => throw new IllegalArgumentException(s"dateDiff: unsupported unit $o")
      }
  }

  private def trunSecs(t: Expression, secs: Int): Expression =
    fn("timestamp_seconds",
      fn("*", fn("div", fn("unix_timestamp", t), lit(secs.toLong)), lit(secs.toLong)))

  // ---- conversions -----------------------------------------------------

  private val conversions: Seq[(String, B)] = Seq(
    "toInt8" -> (a => Cast(a(0), ByteType)),
    "toInt16" -> (a => Cast(a(0), ShortType)),
    "toInt32" -> (a => Cast(a(0), IntegerType)),
    "toInt64" -> (a => Cast(a(0), LongType)),
    // unsigned widens per SURVEY §1.2 (no Spark unsigned)
    "toUInt8" -> (a => Cast(a(0), ShortType)),
    "toUInt16" -> (a => Cast(a(0), IntegerType)),
    "toUInt32" -> (a => Cast(a(0), LongType)),
    "toUInt64" -> (a => Cast(a(0), DecimalType(20, 0))),
    "toFloat32" -> (a => Cast(a(0), FloatType)),
    "toFloat64" -> (a => Cast(a(0), DoubleType)),
    "toString" -> (a => Cast(a(0), StringType)),
    "toDecimal32" -> (a => Cast(a(0), DecimalType(9, litInt(a(1), "toDecimal32 scale")))),
    "toDecimal64" -> (a => Cast(a(0), DecimalType(18, litInt(a(1), "toDecimal64 scale")))),
    "toDecimal128" -> (a => Cast(a(0), DecimalType(38, litInt(a(1), "toDecimal128 scale")))),
    // OrZero/OrNull variants (r20): CH's non-throwing casts map onto
    // Spark's TRY eval mode
    "toInt32OrNull" -> (a => Cast(a(0), IntegerType, None, EvalMode.TRY)),
    "toInt64OrNull" -> (a => Cast(a(0), LongType, None, EvalMode.TRY)),
    "toFloat64OrNull" -> (a => Cast(a(0), DoubleType, None, EvalMode.TRY)),
    "toInt32OrZero" -> (a =>
      fn("coalesce", Cast(a(0), IntegerType, None, EvalMode.TRY), lit(0))),
    "toInt64OrZero" -> (a =>
      fn("coalesce", Cast(a(0), LongType, None, EvalMode.TRY), lit(0L))),
    "toFloat64OrZero" -> (a =>
      fn("coalesce", Cast(a(0), DoubleType, None, EvalMode.TRY), lit(0.0d))),
    "toTypeName" -> (a => fn("typeof", a(0))))

  // ---- conditionals / misc ----------------------------------------------

  private val conditionals: Seq[(String, B)] = Seq(
    // multiIf(c1,v1, c2,v2, …, default) — right-fold of if()
    "multiIf" -> (a => {
      require(a.length >= 3 && a.length % 2 == 1,
        s"multiIf needs cond/value pairs + default, got ${a.length} args")
      a.dropRight(1).grouped(2).toSeq.foldRight(a.last) {
        case (Seq(c, v), acc) => fn("if", c, v, acc)
      }
    }),
    "ifNull" -> (a => fn("coalesce", a(0), a(1))),
    "assumeNotNull" -> (a => a(0)),
    "toNullable" -> (a => a(0)),
    "empty" -> (a => fn("=", fn("length", a(0)), lit(0))),
    "notEmpty" -> (a => fn("not", fn("=", fn("length", a(0)), lit(0)))),
    "intDiv" -> (a => fn("div", a(0), a(1))),
    "intDivOrZero" -> (a =>
      fn("if", fn("=", a(1), lit(0)), lit(0L), fn("div", a(0), a(1)))),
    "modulo" -> (a => fn("mod", a(0), a(1))),
    "moduloOrZero" -> (a =>
      fn("if", fn("=", a(1), lit(0)), lit(0L), Cast(fn("mod", a(0), a(1)), LongType))),
    "plus" -> (a => fn("+", a(0), a(1))),
    "minus" -> (a => fn("-", a(0), a(1))),
    "multiply" -> (a => fn("*", a(0), a(1))),
    "divide" -> (a => fn("/", a(0), a(1))),
    "negate" -> (a => fn("negative", a(0))),
    "exp2" -> (a => fn("power", lit(2.0d), a(0))),
    "exp10" -> (a => fn("power", lit(10.0d), a(0))),
    "roundBankers" -> (a => fn("bround", a: _*)),
    // r20 widening
    "intExp2" -> (a => Cast(fn("shiftleft", lit(1L), a(0)), LongType)),
    "intExp10" -> (a => Cast(fn("power", lit(10.0d), a(0)), LongType)),
    "isFinite" -> (a => fn("and", fn("not", fn("isnan", Cast(a(0), DoubleType))),
      fn("<", fn("abs", Cast(a(0), DoubleType)), lit(Double.PositiveInfinity)))),
    "isInfinite" -> (a =>
      fn("=", fn("abs", Cast(a(0), DoubleType)), lit(Double.PositiveInfinity))),
    "generateUUIDv4" -> (_ => fn("uuid")),
    "randCanonical" -> (a => fn("rand", a: _*)))

  // ---- strings ----------------------------------------------------------

  private val strings: Seq[(String, B)] = Seq(
    "lengthUTF8" -> (a => fn("char_length", a(0))),
    "lowerUTF8" -> (a => fn("lower", a(0))),
    "upperUTF8" -> (a => fn("upper", a(0))),
    "substringUTF8" -> (a => fn("substring", a: _*)),
    // CH position is (haystack, needle) — registered under the UTF8
    // name only; bare `position` stays Spark's (substr, str)
    "positionUTF8" -> (a => fn("locate", a(1), a(0))),
    "splitByChar" -> (a => fn("split", a(1),
      lit(java.util.regex.Pattern.quote(litString(a(0), "splitByChar separator"))), lit(-1))),
    "splitByString" -> (a => fn("split", a(1),
      lit(java.util.regex.Pattern.quote(litString(a(0), "splitByString separator"))), lit(-1))),
    "arrayStringConcat" -> (a =>
      if (a.length > 1) fn("array_join", a(0), a(1)) else fn("array_join", a(0), lit(""))),
    "concatWithSeparator" -> (a => fn("concat_ws", a: _*)),
    "replaceAll" -> (a => fn("replace", a(0), a(1), a(2))),
    // CH regex replacement backrefs are \1; Java's are $1
    "replaceRegexpAll" -> (a => fn("regexp_replace", a(0), a(1), a(2) match {
      case Literal(s: UTF8String, StringType) =>
        lit(s.toString.replaceAll("\\\\(\\d)", "\\$$1"))
      case e => e
    })),
    "trimLeft" -> (a => fn("ltrim", a(0))),
    "trimRight" -> (a => fn("rtrim", a(0))),
    "trimBoth" -> (a => fn("trim", a(0))),
    "leftPad" -> (a => fn("lpad", a: _*)),
    "rightPad" -> (a => fn("rpad", a: _*)),
    "substringIndex" -> (a => fn("substring_index", a: _*)),
    "mid" -> (a => fn("substring", a: _*)),
    // CH extract(haystack, re): first capture group when the pattern
    // has one, else the whole match; '' on no match — regexp_extract's
    // exact contract. Registered as chExtract ONLY: bare `extract` is
    // SQL-standard `extract(field FROM ts)` in Spark, and shadowing it
    // broke every datetime-part query in the session (the documented-
    // divergence rule) — ChSql renames CH-shaped extract calls.
    "chExtract" -> (a => fn("regexp_extract", a(0), a(1),
      lit(if (litString(a(1), "extract pattern").contains("(")) 1 else 0))),
    "extractAll" -> (a => fn("regexp_extract_all", a(0), a(1),
      lit(if (litString(a(1), "extractAll pattern").contains("(")) 1 else 0))),
    "match" -> (a => fn("rlike", a(0), a(1))),
    "countSubstrings" -> (a => fn("div",
      fn("-", fn("length", a(0)), fn("length", fn("replace", a(0), a(1), lit("")))),
      fn("length", a(1)))),
    "multiSearchAny" -> (a =>
      new ArrayExists(a(1), lam1(x => fn("contains", a(0), x)))),
    "notLike" -> (a => fn("not", fn("like", a(0), a(1)))),
    "notILike" -> (a => fn("not", fn("ilike", a(0), a(1)))),
    "base64Encode" -> (a => fn("base64", Cast(a(0), BinaryType))),
    "base64Decode" -> (a => Cast(fn("unbase64", a(0)), StringType)),
    // r20 widening
    "tokens" -> (a => fn("array_remove",
      fn("split", a(0), lit("[^A-Za-z0-9_]+")), lit(""))),
    // CH format('{} and {}', a, b) — literal template, {} placeholders
    "format" -> (a => {
      val tmpl = litString(a(0), "format template")
      require(!tmpl.matches("(?s).*\\{\\d+\\}.*"),
        "format: positional {n} placeholders are not supported")
      fn("format_string",
        (lit(tmpl.replace("%", "%%").replace("{}", "%s")) +: a.drop(1)): _*)
    }),
    "appendTrailingCharIfAbsent" -> (a =>
      fn("if", fn("endswith", a(0), a(1)), a(0), fn("concat", a(0), a(1)))),
    "concatAssumeInjective" -> (a => fn("concat", a: _*)),
    "reverseUTF8" -> (a => fn("reverse", a(0))),
    "countMatches" -> (a =>
      fn("size", fn("regexp_extract_all", a(0), a(1), lit(0)))),
    "isIPv4String" -> (a => fn("rlike", a(0),
      lit("^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}" +
        "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"))))

  // ---- arrays (CH higher-order forms put the lambda FIRST) ---------------

  private val arrays: Seq[(String, B)] = Seq(
    "arrayMap" -> (a => ArrayTransform(a(1), lamFn(a(0)))),
    "arrayFilter" -> (a => ArrayFilter(a(1), lamFn(a(0)))),
    "arrayExists" -> (a => new ArrayExists(a(1), lamFn(a(0)))),
    "arrayAll" -> (a => ArrayForAll(a(1), lamFn(a(0)))),
    // A call whose ARGUMENTS include a lambda must resolve to a
    // HigherOrderFunction at the ROOT (the analyzer validates the
    // built result's class), so these fold with ArrayAggregate instead
    // of wrapping filter() in get()/size()
    "arrayFirst" -> (a => {
      val l = lamFn(a(0))
      val acc = UnresolvedNamedLambdaVariable(Seq("__ch_acc"))
      // zero = a typed NULL of the element type (get at index -1)
      new ArrayAggregate(a(1), fn("get", a(1), lit(-1)),
        LambdaFunction(
          fn("if", fn("isnotnull", acc), acc,
            fn("if", l.function, l.arguments.head, acc)),
          Seq(acc) ++ l.arguments))
    }),
    "arrayCount" -> (a => {
      val l = lamFn(a(0))
      val acc = UnresolvedNamedLambdaVariable(Seq("__ch_acc"))
      new ArrayAggregate(a(1), lit(0),
        LambdaFunction(fn("+", acc, fn("if", l.function, lit(1), lit(0))),
          Seq(acc) ++ l.arguments))
    }),
    "arraySum" -> (a => arrSum(a(0))),
    "arrayAvg" -> (a => fn("/", arrSum(a(0)), Cast(fn("size", a(0)), DoubleType))),
    "arrayMin" -> (a => fn("array_min", a(0))),
    "arrayMax" -> (a => fn("array_max", a(0))),
    "arraySort" -> (a => fn("array_sort", a(0))),
    "arrayReverseSort" -> (a => fn("reverse", fn("array_sort", a(0)))),
    "arrayDistinct" -> (a => fn("array_distinct", a(0))),
    "arrayUniq" -> (a => fn("size", fn("array_distinct", a(0)))),
    "arrayConcat" -> (a => fn("concat", a: _*)),
    "arrayReverse" -> (a => fn("reverse", a(0))),
    "arrayZip" -> (a => fn("arrays_zip", a: _*)),
    "arraySlice" -> (a =>
      if (a.length > 2) fn("slice", a(0), a(1), a(2))
      else fn("slice", a(0), a(1), fn("size", a(0)))),
    "arrayPushBack" -> (a => fn("array_append", a(0), a(1))),
    "arrayPushFront" -> (a => fn("array_prepend", a(0), a(1))),
    "arrayPopBack" -> (a => fn("slice", a(0), lit(1),
      fn("greatest", fn("-", fn("size", a(0)), lit(1)), lit(0)))),
    "arrayPopFront" -> (a => fn("slice", a(0), lit(2),
      fn("greatest", fn("-", fn("size", a(0)), lit(1)), lit(0)))),
    "has" -> (a => fn("array_contains", a(0), a(1))),
    "hasAny" -> (a => fn("arrays_overlap", a(0), a(1))),
    "hasAll" -> (a => ArrayForAll(a(1), lam1(x => fn("array_contains", a(0), x)))),
    "indexOf" -> (a => fn("array_position", a(0), a(1))),
    "arrayEnumerate" -> (a => ArrayTransform(a(0), lam2((_, i) => fn("+", i, lit(1))))),
    "arrayDifference" -> (a => ArrayTransform(a(0),
      lam2((x, i) => fn("-", x,
        fn("if", fn("=", i, lit(0)), x, fn("get", a(0), fn("-", i, lit(1)))))))),
    "arrayIntersect" -> (a => a.reduceLeft((l, r) => fn("array_intersect", l, r))),
    "arrayFlatten" -> (a => fn("flatten", a(0))),
    "arrayJoin" -> (a => org.apache.spark.sql.catalyst.expressions.Explode(a(0))),
    "range" -> (a =>
      if (a.length == 1) fn("slice", fn("sequence", lit(0), a(0)), lit(1), a(0))
      else fn("slice", fn("sequence", a(0), a(1), if (a.length > 2) a(2) else lit(1)),
        lit(1), fn("div", fn("-", a(1), a(0)),
          Cast(if (a.length > 2) a(2) else lit(1), LongType)))),
    "arrayReduce" -> (a => litString(a(0), "arrayReduce aggregate name").toLowerCase match {
      case "sum" => arrSum(a(1))
      case "min" => fn("array_min", a(1))
      case "max" => fn("array_max", a(1))
      case "count" => fn("size", a(1))
      case "avg" => fn("/", arrSum(a(1)), Cast(fn("size", a(1)), DoubleType))
      case o => throw new IllegalArgumentException(s"arrayReduce: unsupported aggregate '$o'")
    }),
    // r20 widening
    "arrayWithConstant" -> (a => fn("array_repeat", a(1), a(0))),
    "arrayProduct" -> (a => {
      val acc = UnresolvedNamedLambdaVariable(Seq("__ch_acc"))
      val x = UnresolvedNamedLambdaVariable(Seq("__ch_x"))
      new ArrayAggregate(a(0), lit(1.0d), LambdaFunction(fn("*", acc, x), Seq(acc, x)))
    }),
    // cumulative sum in DOUBLE (the arraySum precedent)
    "arrayCumSum" -> (a => {
      val acc = UnresolvedNamedLambdaVariable(Seq("__ch_acc"))
      val x = UnresolvedNamedLambdaVariable(Seq("__ch_x"))
      new ArrayAggregate(a(0),
        fn("slice", fn("array", lit(0.0d)), lit(1), lit(0)), // empty Array(Double)
        LambdaFunction(fn("array_append", acc,
          // try_element_at: ANSI mode throws on index -1 of an empty acc
          fn("+", fn("coalesce", fn("try_element_at", acc, lit(-1)), lit(0.0d)),
            Cast(x, DoubleType))), Seq(acc, x)))
    }))

  // ---- maps / json --------------------------------------------------------

  private def jsonPath(k: Expression): Expression = k match {
    case Literal(s: UTF8String, StringType) => lit("$." + s.toString)
    case e => fn("concat", lit("$."), e)
  }

  private val maps: Seq[(String, B)] = Seq(
    "mapKeys" -> (a => fn("map_keys", a(0))),
    "mapValues" -> (a => fn("map_values", a(0))),
    "mapContains" -> (a => fn("map_contains_key", a(0), a(1))),
    "tuple" -> (a => fn("struct", a: _*)),
    "JSONExtractString" -> (a => fn("get_json_object", a(0), jsonPath(a(1)))),
    "JSONExtractInt" -> (a => Cast(fn("get_json_object", a(0), jsonPath(a(1))), LongType)),
    "JSONExtractFloat" -> (a => Cast(fn("get_json_object", a(0), jsonPath(a(1))), DoubleType)),
    "JSONExtractBool" -> (a => Cast(fn("get_json_object", a(0), jsonPath(a(1))), BooleanType)),
    "JSONExtractRaw" -> (a => fn("get_json_object", a(0), jsonPath(a(1)))),
    "JSONHas" -> (a => fn("isnotnull", fn("get_json_object", a(0), jsonPath(a(1))))),
    "JSONLength" -> (a => fn("coalesce",
      fn("json_array_length", a(0)), fn("size", fn("json_object_keys", a(0))))),
    "JSONExtractKeys" -> (a => fn("json_object_keys", a(0))),
    "simpleJSONExtractString" -> (a => fn("get_json_object", a(0), jsonPath(a(1)))),
    "visitParamExtractString" -> (a => fn("get_json_object", a(0), jsonPath(a(1)))),
    // r20 widening: the typed form — JSONExtract(json, 'key', 'Int64')
    // — with the CH type grammar mapped by the shared chType
    "JSONExtract" -> (a => Cast(fn("get_json_object", a(0), jsonPath(a(1))),
      ChDdl.chType(litString(a(2), "JSONExtract type"))._1)),
    "JSONExtractUInt" -> (a =>
      Cast(fn("get_json_object", a(0), jsonPath(a(1))), LongType)),
    "mapFromArrays" -> (a => fn("map_from_arrays", a(0), a(1))))

  // ---- hash / encoding / bits ---------------------------------------------

  private val bits: Seq[(String, B)] = Seq(
    "sipHash64" -> (a => fn("sip_hash64", a(0))),
    "farmFingerprint64" -> (a => fn("farm_fingerprint64", a(0))),
    "halfMD5" -> (a => fn("md5_u64", a(0))),
    "SHA256" -> (a => fn("sha2", a(0), lit(256))),
    "bitAnd" -> (a => fn("&", a(0), a(1))),
    "bitOr" -> (a => fn("|", a(0), a(1))),
    "bitXor" -> (a => fn("^", a(0), a(1))),
    "bitNot" -> (a => fn("~", a(0))),
    "bitShiftLeft" -> (a => fn("shiftleft", a(0), a(1))),
    "bitShiftRight" -> (a => fn("shiftright", a(0), a(1))),
    "bitCount" -> (a => fn("bit_count", a(0))),
    "bitTest" -> (a => Cast(fn("&", fn("shiftright", a(0), a(1)), lit(1)), ByteType)))

  // ---- URL / IP -------------------------------------------------------------

  private val urls: Seq[(String, B)] = Seq(
    "protocol" -> (a => fn("lower", fn("parse_url", a(0), lit("PROTOCOL")))),
    "domain" -> (a => fn("coalesce", fn("parse_url", a(0), lit("HOST")), lit(""))),
    "domainWithoutWWW" -> (a => fn("regexp_replace",
      fn("coalesce", fn("parse_url", a(0), lit("HOST")), lit("")), lit("^www\\."), lit(""))),
    "path" -> (a => fn("coalesce", fn("parse_url", a(0), lit("PATH")), lit(""))),
    "queryString" -> (a => fn("coalesce", fn("parse_url", a(0), lit("QUERY")), lit(""))),
    "fragment" -> (a => fn("coalesce", fn("parse_url", a(0), lit("REF")), lit(""))),
    "extractURLParameter" -> (a =>
      fn("coalesce", fn("parse_url", a(0), lit("QUERY"), a(1)), lit(""))),
    "cutQueryString" -> (a => fn("regexp_replace", a(0), lit("\\?.*$"), lit(""))),
    "cutFragment" -> (a => fn("regexp_replace", a(0), lit("#.*$"), lit(""))),
    "IPv4NumToString" -> (a => fn("concat_ws", lit("."),
      Cast(fn("&", fn("shiftright", a(0), lit(24)), lit(255L)), StringType),
      Cast(fn("&", fn("shiftright", a(0), lit(16)), lit(255L)), StringType),
      Cast(fn("&", fn("shiftright", a(0), lit(8)), lit(255L)), StringType),
      Cast(fn("&", a(0), lit(255L)), StringType))),
    "IPv4StringToNum" -> (a => {
      def oct(i: Int): Expression =
        Cast(fn("get", fn("split", a(0), lit("\\.")), lit(i)), LongType)
      fn("+", fn("*", fn("+", fn("*", fn("+", fn("*", oct(0), lit(256L)), oct(1)),
        lit(256L)), oct(2)), lit(256L)), oct(3))
    }),
    // r20 widening
    "topLevelDomain" -> (a => fn("regexp_extract",
      fn("coalesce", fn("parse_url", a(0), lit("HOST")), lit("")),
      lit("\\.([^.]+)$"), lit(1))),
    "encodeURLComponent" -> (a => fn("url_encode", a(0))),
    "decodeURLComponent" -> (a => fn("url_decode", a(0))))

  // ---- aggregates ------------------------------------------------------------

  private val aggregates: Seq[(String, B)] = Seq(
    "countIf" -> (a => fn("count", fn("if", a(0), lit(1), nul))),
    "sumIf" -> (a => fn("sum", fn("if", a(1), a(0), nul))),
    "avgIf" -> (a => fn("avg", fn("if", a(1), a(0), nul))),
    "minIf" -> (a => fn("min", fn("if", a(1), a(0), nul))),
    "maxIf" -> (a => fn("max", fn("if", a(1), a(0), nul))),
    "uniq" -> (a => fn("approx_count_distinct", a: _*)),
    "uniqHLL12" -> (a => fn("approx_count_distinct", a: _*)),
    "uniqCombined" -> (a => fn("approx_count_distinct", a: _*)),
    "uniqCombined64" -> (a => fn("approx_count_distinct", a: _*)),
    "uniqExact" -> (a => UnresolvedFunction("count", a.toSeq, isDistinct = true)),
    "median" -> (a => fn("percentile", a(0), lit(0.5d))),
    "medianExact" -> (a => fn("percentile", a(0), lit(0.5d))),
    "argMax" -> (a => fn("max_by", a(0), a(1))),
    "argMin" -> (a => fn("min_by", a(0), a(1))),
    "groupArray" -> (a => fn("collect_list", a(0))),
    "groupUniqArray" -> (a => fn("collect_set", a(0))),
    "any" -> (a => fn("first", a(0), lit(true))),
    "anyLast" -> (a => fn("last", a(0), lit(true))),
    "stddevPop" -> (a => fn("stddev_pop", a(0))),
    "stddevSamp" -> (a => fn("stddev_samp", a(0))),
    "varPop" -> (a => fn("var_pop", a(0))),
    "varSamp" -> (a => fn("var_samp", a(0))),
    "covarPop" -> (a => fn("covar_pop", a(0), a(1))),
    "covarSamp" -> (a => fn("covar_samp", a(0), a(1))),
    "skewPop" -> (a => fn("skewness", a(0))),
    "kurtPop" -> (a => fn("kurtosis", a(0))),
    // CH skips rows with NULL value — the weight sum must skip them too
    "avgWeighted" -> (a => fn("/",
      fn("sum", fn("*", Cast(a(0), DoubleType), Cast(a(1), DoubleType))),
      fn("sum", fn("if", fn("isnull", a(0)), nul, Cast(a(1), DoubleType))))),
    "groupBitAnd" -> (a => fn("bit_and", a(0))),
    "groupBitOr" -> (a => fn("bit_or", a(0))),
    "groupBitXor" -> (a => fn("bit_xor", a(0))),
    // r20 widening: the countDistinct spelling + more -If combinators
    "countDistinct" -> (a => UnresolvedFunction("count", a.toSeq, isDistinct = true)),
    "anyIf" -> (a => fn("first", fn("if", a(1), a(0), nul), lit(true))),
    "uniqIf" -> (a => fn("approx_count_distinct", fn("if", a(1), a(0), nul))),
    "uniqExactIf" -> (a => UnresolvedFunction("count",
      Seq(fn("if", a(1), a(0), nul)), isDistinct = true)),
    "argMaxIf" -> (a => fn("max_by",
      fn("if", a(2), a(0), nul), fn("if", a(2), a(1), nul))),
    "argMinIf" -> (a => fn("min_by",
      fn("if", a(2), a(0), nul), fn("if", a(2), a(1), nul))),
    "groupArrayIf" -> (a => fn("collect_list", fn("if", a(1), a(0), nul))),
    "sumWithOverflow" -> (a => fn("sum", a(0))))

  val builders: Seq[(String, B)] =
    dateTime ++ conversions ++ conditionals ++ strings ++ arrays ++
      maps ++ bits ++ urls ++ aggregates

  def register(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.ChNames", name),
        (children: Seq[Expression]) => b(children)))
    }
}
