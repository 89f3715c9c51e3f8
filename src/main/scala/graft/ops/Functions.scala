package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{CH, Engine}

/** Scalar function families (SURVEY §2.H) — one declared query per
  * family, each touching several representative members, all pure
  * Catalyst built-ins (codegen'd, no UDFs). `toYYYYMM` is the one
  * directly reference-evidenced function (`Dockerfile:228`).
  *
  * Parity notes vs the DuckDB oracle: per-row double arithmetic is
  * IEEE-deterministic; libm-backed fns (exp/ln/sqrt) are rounded to
  * 6 dp on both sides; Spark dayofweek is 1=Sunday while DuckDB dow is
  * 0=Sunday (oracle shifts); oracles express map/struct lookups with
  * literal keys as plain column references (same result, no dialect
  * dependency).
  */
object Functions {
  type Q = (SparkSession, String) => DataFrame

  /** H1: math — abs/floor/ceil/sqrt/exp/ln/pow/sign/mod/intDiv. */
  private def h1Math(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "part")
      .select(
        col("p_partkey"),
        abs(col("p_size") - 25).as("abs_v"),
        floor(col("p_retailprice") / 10).cast("long").as("floor_v"),
        ceil(col("p_retailprice") / 10).cast("long").as("ceil_v"),
        round(sqrt(col("p_retailprice")), 6).as("sqrt_v"),
        round(exp(col("p_size") / 100.0), 6).as("exp_v"),
        round(log(col("p_retailprice")), 6).as("ln_v"),
        pow(col("p_size"), 2).as("pow_v"),
        signum(col("p_size") - 25).cast("int").as("sign_v"),
        (col("p_size") % 7).as("mod_v"),
        CH.intDiv(col("p_size"), lit(7)).as("intdiv_v"))
      .orderBy("p_partkey")

  /** H2: date/time — toYYYYMM (reference `Dockerfile:228`), extracts,
    * truncation, diffs, month arithmetic, epoch. */
  private def h2DateTime(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        CH.toYYYYMM(col("o_orderdate")).as("yyyymm"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate")).as("days_to_98"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3mo"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy("o_orderkey")

  /** H3: strings — length/case/substring/concat/trim/pad/reverse/
    * repeat/replace/split-element. */
  private def h3Strings(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "customer")
      .select(
        col("c_custkey"),
        length(col("c_name")).as("len_v"),
        lower(col("c_name")).as("lower_v"),
        upper(col("c_mktsegment")).as("upper_v"),
        substring(col("c_name"), 1, 8).as("sub_v"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("concat_v"),
        trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trim_v"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("lpad_v"),
        reverse(col("c_mktsegment")).as("rev_v"),
        repeat(substring(col("c_name"), 1, 2), 3).as("rep_v"),
        call_function("replace", col("c_name"), lit("0"), lit("#")).as("repl_v"),
        element_at(split(col("c_name"), "#"), 2).as("split_v"))
      .orderBy("c_custkey")

  /** H4: string search / regex — like/ilike/rlike/extract/count/contains. */
  private def h4Regex(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "part")
      .select(
        col("p_partkey"),
        col("p_name").like("%gre%").as("like_v"),
        col("p_name").ilike("%GRE%").as("ilike_v"),
        col("p_name").rlike("^[a-z]+ ").as("rlike_v"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("extract_v"),
        (size(split(col("p_name"), "a")) - 1).as("count_a"),
        col("p_name").contains("red").as("contains_v"),
        (col("p_name").contains("red") || col("p_name").contains("blue")).as("multisearch_v"),
        col("p_name").startsWith("a").as("starts_v"),
        col("p_name").endsWith("e").as("ends_v"))
      .orderBy("p_partkey")

  /** H7: arrays — higher-order transform/filter/aggregate + sort/
    * distinct/contains/position/slice/size/sequence, joined to strings
    * for engine-neutral output. */
  private def h7Arrays(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("p_name"), " ")
    Engine.t(spark, dir, "part")
      .select(
        col("p_partkey"),
        array_join(transform(words, w => upper(w)), ",").as("upper_words"),
        array_join(filter(words, w => length(w) > 4), ",").as("long_words"),
        aggregate(transform(words, w => length(w)), lit(0), (acc, x) => acc + x).as("total_len"),
        array_join(sort_array(words), ",").as("sorted_words"),
        array_join(sort_array(array_distinct(words)), ",").as("distinct_words"),
        array_contains(words, "green").as("has_green"),
        array_position(words, "green").as("pos_green"),
        array_join(slice(words, 1, 2), ",").as("first2"),
        size(words).as("n_words"),
        array_join(transform(sequence(lit(1), pmod(col("p_size"), lit(5)) + 1), i => i.cast("string")), ",").as("seq_v"))
      .orderBy("p_partkey")
  }

  /** H8: arrayJoin → explode (Generator), the row-expanding scalar. */
  private def h8Explode(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "part")
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(100)

  /** H9: map & tuple (struct) ops. Oracle resolves the literal-key
    * lookups to plain columns — same values, no dialect dependency. */
  private def h9MapStruct(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        struct(col("o_orderstatus").as("s"), col("o_orderpriority").as("p")).as("tup"),
        map(lit("s"), col("o_orderstatus"), lit("p"), col("o_orderpriority")).as("m"))
      .select(
        col("o_orderkey"),
        col("tup").getField("s").as("tuple_status"),
        col("tup").getField("p").as("tuple_prio"),
        element_at(col("m"), "s").as("map_status"),
        array_join(sort_array(map_keys(col("m"))), ",").as("keys_v"),
        size(col("m")).as("m_card"))
      .orderBy("o_orderkey")

  /** H10: JSON extraction over events.props. */
  private def h10Json(spark: SparkSession, dir: String): DataFrame =
    Engine.events(spark, dir)
      .filter(col("event_id") < 2000)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"),
        get_json_object(col("props"), "$.missing").isNull.as("missing_null"),
        array_join(json_object_keys(col("props")), ",").as("keys_v"))
      .orderBy("event_id")

  /** H11: cryptographic hashes — md5 / sha256 (bit-identical across
    * engines; xxhash64 is declared separately without oracle). */
  private def h11Hash(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "customer")
      .filter(col("c_custkey") <= 1000)
      .select(
        col("c_custkey"),
        md5(col("c_name").cast("binary")).as("md5_v"),
        sha2(col("c_name").cast("binary"), 256).as("sha256_v"))
      .orderBy("c_custkey")

  /** H11b: engine-internal 64-bit hash (xxhash64 standing in for
    * cityHash64) — no oracle (different hash family per engine). */
  private def h11XxHash(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "customer")
      .filter(col("c_custkey") <= 100)
      .select(col("c_custkey"), xxhash64(col("c_name")).as("xxh64"))
      .orderBy("c_custkey")

  /** H11c: `farmFingerprint64` — the reference's stable 64-bit content
    * fingerprint, reproduced BIT-EXACTLY by the custom codegen
    * expression [[graft.expressions.FarmHash64]] (FarmHash
    * Fingerprint64, a frozen public algorithm — unlike the
    * engine-internal xxhash64 stand-in above, this value is portable
    * across engines by contract). No DuckDB oracle (DuckDB has no farm
    * fingerprint); byte-parity with Guava's independent implementation
    * is pinned in `VectorExpressionSpec` across every length branch. */
  private def h11FarmFingerprint(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "customer")
      .filter(col("c_custkey") <= 100)
      .select(col("c_custkey"),
        call_function("farm_fingerprint64", col("c_name")).as("farm_fp64"))
      .orderBy("c_custkey")

  /** H11d: `sipHash64` — zero-key SipHash-2-4 via the custom codegen
    * expression [[graft.expressions.SipHash64]]; same portability
    * contract as h11c (frozen public algorithm, parity pinned against
    * Guava's independent implementation in `VectorExpressionSpec`). */
  private def h11SipHash(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "customer")
      .filter(col("c_custkey") <= 100)
      .select(col("c_custkey"),
        call_function("sip_hash64", col("c_name")).as("sip64"))
      .orderBy("c_custkey")

  /** H12: base64/hex encode-decode round trips. */
  private def h12Encoding(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "nation")
      .select(
        col("n_nationkey"),
        base64(col("n_name").cast("binary")).as("b64"),
        unbase64(base64(col("n_name").cast("binary"))).cast("string").as("b64_rt"),
        hex(col("n_name").cast("binary")).as("hex_v"),
        unhex(hex(col("n_name").cast("binary"))).cast("string").as("hex_rt"))
      .orderBy("n_nationkey")

  /** H13: bit operations. */
  private def h13Bit(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "supplier")
      .select(
        col("s_suppkey"),
        col("s_suppkey").bitwiseAND(lit(255L)).as("and_v"),
        col("s_suppkey").bitwiseOR(lit(16L)).as("or_v"),
        col("s_suppkey").bitwiseXOR(lit(170L)).as("xor_v"),
        shiftleft(col("s_suppkey"), 2).as("shl_v"),
        shiftright(col("s_suppkey"), 1).as("shr_v"))
      .orderBy("s_suppkey")

  /** H14: URL functions — parse_url host/path/query-param; oracle uses
    * regex equivalents (DuckDB has no parse_url). */
  private def h14Url(spark: SparkSession, dir: String): DataFrame = {
    // '#' in p_brand ("Brand#13") would start a URI fragment — strip it.
    val url = concat(lit("https://ex.com/"),
      call_function("replace", col("p_brand"), lit("#"), lit("-")), lit("/item?id="),
      col("p_partkey"), lit("&q="), call_function("replace", lower(col("p_type")), lit(" "), lit("+")))
    Engine.t(spark, dir, "part")
      .select(
        col("p_partkey"),
        parse_url(url, lit("HOST")).as("host_v"),
        parse_url(url, lit("PATH")).as("path_v"),
        parse_url(url, lit("QUERY"), lit("q")).as("q_v"))
      .orderBy("p_partkey")
  }

  /** H15/I4 kin: width_bucket + fixed-width floor bucketing. */
  private def h15Bucket(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "orders")
      .groupBy(
        width_bucket(col("o_totalprice"), lit(0.0), lit(600000.0), lit(12L)).as("wb"),
        (floor(col("o_totalprice") / 100000) * 100000).cast("long").as("floor_bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("wb", "floor_bucket")

  /** H16: rand/randn/uuid — nondeterministic; declared without oracle.
    * Emits distribution sanity stats instead of raw values. */
  private def h16Rand(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "customer")
      .select(rand(42).as("u"), randn(42).as("g"), expr("uuid()").as("id"))
      .agg(
        count(lit(1)).as("n"),
        count_distinct(col("id")).as("n_uuid"),
        round(avg(col("u")), 2).as("mean_u"),
        round(avg(col("g")), 1).as("mean_g"))

  /** H17: IP functions — CH `IPv4NumToString` / `IPv4StringToNum` as
    * pure integer/string arithmetic (no IP type needed, fully
    * codegen'd). A deterministic IPv4 is synthesized per user (Knuth
    * multiplicative hash mod 2^32, the tables carry no IP column),
    * formatted octet-wise, and parsed back — the round trip rides in
    * the oracle-checked output. */
  private def h17Ip(spark: SparkSession, dir: String): DataFrame = {
    val o = (sh: Int) => expr(s"shiftright(ipnum, $sh) & 255")
    Engine.t(spark, dir, "events")
      .select(col("user_id")).distinct()
      .filter(col("user_id") < 50)
      .withColumn("ipnum", pmod(col("user_id") * lit(2654435761L), lit(4294967296L)))
      .withColumn("ipstr", concat_ws(".",
        o(24).cast("string"), o(16).cast("string"), o(8).cast("string"), o(0).cast("string")))
      .withColumn("ipnum_rt",
        element_at(split(col("ipstr"), "\\."), 1).cast("long") * 16777216L +
        element_at(split(col("ipstr"), "\\."), 2).cast("long") * 65536L +
        element_at(split(col("ipstr"), "\\."), 3).cast("long") * 256L +
        element_at(split(col("ipstr"), "\\."), 4).cast("long"))
      .select("user_id", "ipnum", "ipstr", "ipnum_rt")
      .orderBy("user_id")
  }

  /** H18: bitmap aggregates — the CH `groupBitmap*` family. Event
    * types map to fixed bit positions; `bit_or` folds each user's
    * presence mask in constant space per group (the bitmap-sketch
    * shape: the exchange carries one long per user, never a value
    * list), then a rollup counts users by `bit_count(mask)`. */
  private def h18Bitmap(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "events")
      .filter(col("ts") < lit("2024-01-02 00:00:00").cast("timestamp")) // day-1 slice: masks actually vary
      .select(col("user_id"),
        expr("""CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
               WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8 WHEN 'view' THEN 16 ELSE 0 END""")
          .cast("long").as("b"))
      .groupBy("user_id").agg(bit_or(col("b")).as("mask"))
      .groupBy(expr("bit_count(mask)").cast("int").as("n_types"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("n_types")

  /** H19: regression stats — CH `simpleLinearRegression(x, y)`. The
    * moments (Σx, Σy, Σx², Σxy) are summed in DECIMAL — associative
    * and order-independent, so map-side partials are exact at any
    * parallelism — and slope/intercept are derived from them in IEEE
    * double with the same expression nesting as the oracle, making
    * the result bit-deterministic. Built-in `regr_slope` is avoided
    * deliberately: its double summation order differs per engine and
    * per partitioning. */
  private def h19Linreg(spark: SparkSession, dir: String): DataFrame = {
    val x = CH.dec(col("l_quantity"))
    val y = CH.dec(col("l_extendedprice"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    Engine.t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(x * y).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        round((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))
          / (d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))), 6).as("slope"),
        round((d(col("sy")) - (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))
          / (d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) * d(col("sx"))) / d(col("n")), 6).as("intercept"))
      .orderBy("l_returnflag")
  }

  /** H20: geo functions — `greatCircleDistance`, `geohashEncode`-style
    * cell bucketing, and a bounding-box `pointInPolygon` special case
    * (ClickHouse 25.7 geo family, reference `Dockerfile:102-126`
    * pinned binary). Coordinates derive from key columns on an exact
    * binary lattice (multiples of 1/8 degree), so lat/lon and the cell
    * ids are bit-identical across engines; only the haversine itself
    * is floating point, and every emitted distance is rounded past the
    * libm ulp gap. Pure codegen'd trig folded into the scan + one
    * rollup on nationkey — no shuffle before the aggregate's own. */
  private def h20Geo(spark: SparkSession, dir: String): DataFrame = {
    def d(c: Column): Column = c.cast("double")
    val lat1 = d(pmod(col("c_custkey"), lit(144)) * 1.25 - 90 + 0.125)
    val lon1 = d(pmod(col("c_custkey"), lit(288)) * 1.25 - 180 + 0.125)
    val lat2 = d(pmod(col("c_nationkey"), lit(36)) * 5.0 - 90 + 2.5)
    val lon2 = d(pmod(col("c_nationkey"), lit(72)) * 5.0 - 180 + 2.5)
    val a = pow(sin(radians(lat2 - lat1) / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2)
    val distKm = lit(2.0 * 6371.0) * asin(least(lit(1.0), sqrt(a)))
    val cellId = (floor((lat1 + 90) * 8) * 3000 + floor((lon1 + 180) * 8)).cast("long")
    val inBox = lat1 >= -45 && lat1 < 45 && lon1 >= 0 && lon1 < 90
    Engine.t(spark, dir, "customer")
      .select(col("c_nationkey"), distKm.as("dist_km"), cellId.as("cell_id"),
        inBox.cast("int").as("in_box"))
      .groupBy("c_nationkey")
      .agg(
        count(lit(1)).as("n_customers"),
        round(min(col("dist_km")), 4).as("min_dist_km"),
        round(max(col("dist_km")), 4).as("max_dist_km"),
        round(avg(col("dist_km")), 4).as("avg_dist_km"),
        countDistinct(col("cell_id")).as("n_cells"),
        sum(col("in_box")).cast("long").as("n_in_box"))
      .orderBy("c_nationkey")
  }

  /** H21: string-distance family (CH `editDistance`): Levenshtein
    * between two columns and against a constant probe — pure codegen'd
    * built-in, O(len²) per row folded into the scan. */
  private def h21EditDistance(spark: SparkSession, dir: String): DataFrame =
    Engine.t(spark, dir, "part")
      .filter(col("p_partkey") <= 100)
      .select(
        col("p_partkey"),
        levenshtein(col("p_name"), col("p_type")).as("lev_name_type"),
        levenshtein(substring(col("p_name"), 1, 10), lit("promo brush")).as("lev_probe"))
      .orderBy("p_partkey")

  /** H7b: CH array-transform family — `arrayCumSum`, `arrayDifference`,
    * `arrayEnumerate`, `arrayIntersect` — as pure higher-order Catalyst
    * expressions over the word-length arrays of p_name (no UDFs; the
    * per-row arrays are tiny so the O(n) fold stays in codegen).
    * CH semantics: arrayDifference emits 0 for the first element;
    * intersect is emitted sorted+distinct so both engines agree on
    * order. All arrays string-joined (driver hash discipline). */
  private def h22ArrayTransforms(spark: SparkSession, dir: String): DataFrame = {
    val L = "transform(split(p_name, ' '), w -> length(w))"
    def csv(arr: String) = s"array_join(transform($arr, x -> cast(x as string)), ',')"
    Engine.t(spark, dir, "part")
      .select(
        col("p_partkey"),
        expr(csv(L)).as("lens_csv"),
        expr(csv(s"aggregate($L, cast(array() as array<int>), " +
          "(acc, x) -> concat(acc, array(coalesce(try_element_at(acc, -1), 0) + x)))"))
          .as("cum_csv"),
        expr(csv(s"transform(sequence(1, size($L)), i -> " +
          s"CASE WHEN i = 1 THEN 0 ELSE element_at($L, i) - element_at($L, i - 1) END)"))
          .as("diff_csv"),
        expr(csv(s"sequence(1, size($L))")).as("enum_csv"),
        expr(csv(s"array_sort(array_distinct(filter($L, x -> x in (4, 5, 6))))"))
          .as("common_csv"))
      .orderBy("p_partkey")
  }

  /** H23: CH display helpers — `formatReadableSize` (1024-based unit
    * ladder), `formatReadableQuantity` (1000-based), and `bar(x,min,
    * max,width)` (ASCII gauge; full blocks only — CH's eighth-block
    * glyphs are a rendering nicety, not semantics). All codegen'd
    * when-chains. NOT `%.2f`: Java's Formatter rounds the SHORTEST
    * decimal repr of a double (427.335 → 427.34) while C printf rounds
    * the exact binary value (427.33499…97 → 427.33) — so the 2-dp
    * string is built from exact integer cents on both engines. */
  private def h23Readable(spark: SparkSession, dir: String): DataFrame = {
    val b = (col("o_totalprice").cast("double") * 100).as("b")
    def fmt(v: Column, unit: String) = {
      val cents = round(v * 100).cast("long")
      concat(CH.intDiv(cents, lit(100L)).cast("string"), lit("."),
        lpad((cents % 100).cast("string"), 2, "0"), lit(if (unit.isEmpty) "" else " " + unit))
    }
    Engine.t(spark, dir, "orders")
      .filter(col("o_orderkey") <= 2000)
      .select(col("o_orderkey"), b, col("o_totalprice").cast("double").as("q"))
      .select(
        col("o_orderkey"),
        CH.multiIf(
          (col("b") < 1024L) -> fmt(col("b"), "B"),
          (col("b") < 1048576L) -> fmt(col("b") / 1024, "KiB"),
          (col("b") < 1073741824L) -> fmt(col("b") / 1048576, "MiB"))(
          fmt(col("b") / 1073741824L, "GiB")).as("size_h"),
        CH.multiIf(
          (col("q") < 1000) -> fmt(col("q"), ""),
          (col("q") < 1000000) -> fmt(col("q") / 1000, "thousand"))(
          fmt(col("q") / 1000000, "million")).as("qty_h"),
        repeat(lit("#"), least(floor(col("q") / 600000.0 * 20).cast("int"), lit(20))).as("bar_s"))
      .orderBy("o_orderkey")
  }

  /** H24: CH timezone family (`toTimeZone`, tz-aware hour/day parts).
    * Storage stays UTC (reference fixes server TZ to UTC,
    * `Dockerfile:220`); conversion is a read-time projection —
    * `from_utc_timestamp` against the IANA zone db, rendered to
    * strings so the engines compare wall-clock semantics, not
    * timestamp encodings. Includes a half-hour-offset zone to prove
    * the conversion is real zone math, not a whole-hour shift. */
  private def h24Timezone(spark: SparkSession, dir: String): DataFrame = {
    def at(zone: String) = from_utc_timestamp(col("ts"), zone)
    Engine.events(spark, dir)
      .filter(col("event_id") < 500)
      .select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("utc_s"),
        date_format(at("America/New_York"), "yyyy-MM-dd HH:mm:ss").as("ny_s"),
        date_format(at("Asia/Kolkata"), "yyyy-MM-dd HH:mm:ss").as("kolkata_s"),
        hour(at("America/New_York")).as("ny_hour"),
        dayofmonth(at("Asia/Kolkata")).as("kolkata_day"))
      .orderBy("event_id")
  }

  /** H8b: multi-array `ARRAY JOIN` — CH expands PARALLEL arrays in
    * lockstep (zip), not as a cross product. Spark-native:
    * `posexplode(arrays_zip(...))` — one Generate node, still
    * pipelined inside the scan stage. DuckDB's multi-unnest zips the
    * same way, so the oracle is the natural SQL. */
  private def h8bMultiArrayJoin(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("p_name"), " ")
    Engine.t(spark, dir, "part")
      .filter(col("p_partkey") <= 500)
      .select(col("p_partkey"),
        posexplode(arrays_zip(words, transform(words, w => length(w)))).as(Seq("idx", "z")))
      .select(col("p_partkey"), (col("idx") + 1).as("pos"),
        col("z").getField("0").as("word"), col("z").getField("1").as("wlen"))
      .orderBy("p_partkey", "pos")
  }

  /** H26: `jumpConsistentHash` — consistent shard routing via the
    * engine's codegen'd [[graft.expressions.JumpConsistentHash]]
    * kernel. The op routes orders into 8 shards AND into 9, and counts
    * per-shard membership + moved keys: the minimal-movement property
    * (~1/9 of keys move on reshard) is visible in the declared output
    * and spec-asserted. No oracle (the hash is engine-internal);
    * rows-only + VectorExpressionSpec properties. */
  private def h26ConsistentHash(spark: SparkSession, dir: String): DataFrame = {
    val key = xxhash64(col("o_orderkey"))
    val s8 = call_function("jump_hash", key, lit(8))
    val s9 = call_function("jump_hash", key, lit(9))
    Engine.t(spark, dir, "orders")
      .select(s8.as("shard"), s9.as("shard_after_grow"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n"),
        CH.countIf(col("shard") =!= col("shard_after_grow")).as("n_moved"))
      .orderBy("shard")
  }

  /** H8c: LEFT ARRAY JOIN — CH's outer variant: rows whose array is
    * empty survive with a NULL element instead of disappearing.
    * Spark-native: `explode_outer` (same Generate node, outer=true).
    * The long-words array is empty for many parts, so the outer
    * semantics are actually exercised. */
  private def h8cLeftArrayJoin(spark: SparkSession, dir: String): DataFrame = {
    val longWords = filter(split(col("p_name"), " "), w => length(w) > 8)
    Engine.t(spark, dir, "part")
      .filter(col("p_partkey") <= 300)
      .select(col("p_partkey"), explode_outer(longWords).as("long_word"))
      .orderBy(col("p_partkey"), asc_nulls_first("long_word"))
  }

  /** H8d: CH `ARRAY JOIN` as SQL *text* — the unnest clause routes
    * through [[graft.ChSql]] to an explode Generate (h8's builder
    * path); the WHERE/ORDER BY around it stay plain Spark SQL. */
  private def h8dArrayJoinSql(spark: SparkSession, dir: String): DataFrame = {
    Engine.registerAll(spark, dir)
    graft.ChSql.sql(spark,
      """SELECT p_partkey, word FROM part ARRAY JOIN split(p_name, ' ') AS word
        |WHERE p_partkey <= 200 ORDER BY p_partkey, word""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "h8c_left_array_join" -> (h8cLeftArrayJoin _),
    "h8d_array_join_sql" -> (h8dArrayJoinSql _),
    "h26_consistent_hash" -> (h26ConsistentHash _),
    "h8b_multi_array_join" -> (h8bMultiArrayJoin _),
    "h24_timezone" -> (h24Timezone _),
    "h23_readable" -> (h23Readable _),
    "h22_array_transforms" -> (h22ArrayTransforms _),
    "h21_edit_distance" -> (h21EditDistance _),
    "h20_geo" -> (h20Geo _),
    "h17_ip" -> (h17Ip _),
    "h18_bitmap" -> (h18Bitmap _),
    "h19_linreg" -> (h19Linreg _),
    "h1_math" -> (h1Math _),
    "h2_datetime" -> (h2DateTime _),
    "h3_strings" -> (h3Strings _),
    "h4_regex" -> (h4Regex _),
    "h7_arrays" -> (h7Arrays _),
    "h8_explode" -> (h8Explode _),
    "h9_map_struct" -> (h9MapStruct _),
    "h10_json" -> (h10Json _),
    "h11_hash" -> (h11Hash _),
    "h11_xxhash64" -> (h11XxHash _),
    "h11_farm_fingerprint64" -> (h11FarmFingerprint _),
    "h11_siphash64" -> (h11SipHash _),
    "h12_encoding" -> (h12Encoding _),
    "h13_bit" -> (h13Bit _),
    "h14_url" -> (h14Url _),
    "h15_bucket" -> (h15Bucket _),
    "h16_rand_uuid" -> (h16Rand _))

  val oracles: Map[String, String] = Map(
    "h8c_left_array_join" ->
      """WITH t AS (SELECT p_partkey,
        |    list_filter(string_split(p_name, ' '), w -> length(w) > 8) AS lw
        |  FROM part WHERE p_partkey <= 300)
        |SELECT p_partkey, unnest(lw) AS long_word FROM t WHERE len(lw) > 0
        |UNION ALL
        |SELECT p_partkey, NULL AS long_word FROM t WHERE len(lw) = 0
        |ORDER BY p_partkey, long_word NULLS FIRST""".stripMargin,
    "h8b_multi_array_join" ->
      """WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS ws
        |  FROM part WHERE p_partkey <= 500)
        |SELECT p_partkey,
        |  CAST(generate_subscripts(ws, 1) AS INT) AS pos,
        |  unnest(ws) AS word,
        |  CAST(unnest(list_transform(ws, x -> length(x))) AS INT) AS wlen
        |FROM w ORDER BY p_partkey, pos""".stripMargin,
    "h24_timezone" ->
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS utc_s,
        |  strftime((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York', '%Y-%m-%d %H:%M:%S') AS ny_s,
        |  strftime((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Kolkata', '%Y-%m-%d %H:%M:%S') AS kolkata_s,
        |  CAST(hour((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York') AS INT) AS ny_hour,
        |  CAST(day((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Kolkata') AS INT) AS kolkata_day
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin,
    "h23_readable" ->
      """WITH t AS (SELECT o_orderkey,
        |    CAST(o_totalprice AS DOUBLE) * 100 AS b,
        |    CAST(o_totalprice AS DOUBLE) AS q
        |  FROM orders WHERE o_orderkey <= 2000),
        |f AS (SELECT o_orderkey, b, q,
        |    CAST(round(CASE WHEN b < 1024 THEN b
        |      WHEN b < 1048576 THEN b / 1024
        |      WHEN b < 1073741824 THEN b / 1048576
        |      ELSE b / 1073741824 END * 100) AS BIGINT) AS bc,
        |    CAST(round(CASE WHEN q < 1000 THEN q
        |      WHEN q < 1000000 THEN q / 1000
        |      ELSE q / 1000000 END * 100) AS BIGINT) AS qc
        |  FROM t)
        |SELECT o_orderkey,
        |  CAST(bc // 100 AS VARCHAR) || '.' || lpad(CAST(bc % 100 AS VARCHAR), 2, '0') ||
        |    CASE WHEN b < 1024 THEN ' B' WHEN b < 1048576 THEN ' KiB'
        |         WHEN b < 1073741824 THEN ' MiB' ELSE ' GiB' END AS size_h,
        |  CAST(qc // 100 AS VARCHAR) || '.' || lpad(CAST(qc % 100 AS VARCHAR), 2, '0') ||
        |    CASE WHEN q < 1000 THEN '' WHEN q < 1000000 THEN ' thousand'
        |         ELSE ' million' END AS qty_h,
        |  repeat('#', least(CAST(floor(q / 600000.0 * 20) AS INT), 20)) AS bar_s
        |FROM f ORDER BY o_orderkey""".stripMargin,
    "h22_array_transforms" ->
      """WITH t AS (SELECT p_partkey,
        |    list_transform(string_split(p_name, ' '), w -> CAST(length(w) AS INT)) AS l
        |  FROM part)
        |SELECT p_partkey,
        |  array_to_string(list_transform(l, x -> CAST(x AS VARCHAR)), ',') AS lens_csv,
        |  array_to_string(list_transform(range(1, len(l) + 1),
        |    i -> CAST(CAST(list_sum(l[1:i]) AS INT) AS VARCHAR)), ',') AS cum_csv,
        |  array_to_string(list_transform(range(1, len(l) + 1),
        |    i -> CAST(CASE WHEN i = 1 THEN 0 ELSE l[i] - l[i-1] END AS VARCHAR)), ',') AS diff_csv,
        |  array_to_string(list_transform(range(1, len(l) + 1),
        |    i -> CAST(i AS VARCHAR)), ',') AS enum_csv,
        |  coalesce(array_to_string(list_transform(list_sort(list_distinct(list_filter(l, x -> x IN (4, 5, 6)))),
        |    x -> CAST(x AS VARCHAR)), ','), '') AS common_csv
        |FROM t ORDER BY p_partkey""".stripMargin,
    "h21_edit_distance" ->
      """SELECT p_partkey,
        |  CAST(levenshtein(p_name, p_type) AS INT) AS lev_name_type,
        |  CAST(levenshtein(substr(p_name, 1, 10), 'promo brush') AS INT) AS lev_probe
        |FROM part WHERE p_partkey <= 100 ORDER BY p_partkey""".stripMargin,
    "h20_geo" ->
      """WITH pts AS (SELECT c_nationkey,
        |    CAST((c_custkey % 144) * 1.25 - 90 + 0.125 AS DOUBLE) AS lat1,
        |    CAST((c_custkey % 288) * 1.25 - 180 + 0.125 AS DOUBLE) AS lon1,
        |    CAST((c_nationkey % 36) * 5.0 - 90 + 2.5 AS DOUBLE) AS lat2,
        |    CAST((c_nationkey % 72) * 5.0 - 180 + 2.5 AS DOUBLE) AS lon2
        |  FROM customer),
        |dd AS (SELECT c_nationkey,
        |    2.0 * 6371.0 * asin(least(1.0, sqrt(
        |      pow(sin(radians(lat2 - lat1) / 2), 2)
        |      + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2)))) AS dist_km,
        |    CAST(floor((lat1 + 90) * 8) * 3000 + floor((lon1 + 180) * 8) AS BIGINT) AS cell_id,
        |    CASE WHEN lat1 >= -45 AND lat1 < 45 AND lon1 >= 0 AND lon1 < 90 THEN 1 ELSE 0 END AS in_box
        |  FROM pts)
        |SELECT c_nationkey, count(*) AS n_customers,
        |  round(min(dist_km), 4) AS min_dist_km,
        |  round(max(dist_km), 4) AS max_dist_km,
        |  round(avg(dist_km), 4) AS avg_dist_km,
        |  count(DISTINCT cell_id) AS n_cells,
        |  CAST(sum(in_box) AS BIGINT) AS n_in_box
        |FROM dd GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "h17_ip" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id < 50),
        |n AS (SELECT user_id, (user_id * 2654435761) % 4294967296 AS ipnum FROM u),
        |s AS (SELECT user_id, ipnum,
        |        CAST((ipnum >> 24) & 255 AS VARCHAR) || '.' || CAST((ipnum >> 16) & 255 AS VARCHAR)
        |        || '.' || CAST((ipnum >> 8) & 255 AS VARCHAR) || '.' || CAST(ipnum & 255 AS VARCHAR) AS ipstr
        |      FROM n)
        |SELECT user_id, ipnum, ipstr,
        |  CAST(string_split(ipstr, '.')[1] AS BIGINT) * 16777216
        |  + CAST(string_split(ipstr, '.')[2] AS BIGINT) * 65536
        |  + CAST(string_split(ipstr, '.')[3] AS BIGINT) * 256
        |  + CAST(string_split(ipstr, '.')[4] AS BIGINT) AS ipnum_rt
        |FROM s ORDER BY user_id""".stripMargin,
    "h18_bitmap" ->
      """WITH m AS (
        |  SELECT user_id, bit_or(CAST(CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
        |    WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8 WHEN 'view' THEN 16 ELSE 0 END AS BIGINT)) AS mask
        |  FROM events WHERE ts < TIMESTAMP '2024-01-02 00:00:00' GROUP BY user_id)
        |SELECT CAST(bit_count(mask) AS INT) AS n_types, count(*) AS n_users
        |FROM m GROUP BY 1 ORDER BY n_types""".stripMargin,
    "h19_linreg" ->
      """WITH mo AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope,
        |  round((sy - (CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx) / CAST(n AS DOUBLE), 6) AS intercept
        |FROM mo ORDER BY l_returnflag""".stripMargin,
    "h1_math" ->
      """SELECT p_partkey,
        |  abs(p_size - 25) AS abs_v,
        |  CAST(floor(p_retailprice / 10) AS BIGINT) AS floor_v,
        |  CAST(ceil(p_retailprice / 10) AS BIGINT) AS ceil_v,
        |  round(sqrt(p_retailprice), 6) AS sqrt_v,
        |  round(exp(p_size / 100.0), 6) AS exp_v,
        |  round(ln(p_retailprice), 6) AS ln_v,
        |  pow(p_size, 2) AS pow_v,
        |  CAST(sign(p_size - 25) AS INT) AS sign_v,
        |  p_size % 7 AS mod_v,
        |  p_size // 7 AS intdiv_v
        |FROM part ORDER BY p_partkey""".stripMargin,
    "h2_datetime" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS yyyymm,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS d,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "h3_strings" ->
      """SELECT c_custkey,
        |  CAST(length(c_name) AS INT) AS len_v,
        |  lower(c_name) AS lower_v,
        |  upper(c_mktsegment) AS upper_v,
        |  substr(c_name, 1, 8) AS sub_v,
        |  c_mktsegment || '|' || c_name AS concat_v,
        |  trim('  ' || c_mktsegment || '  ') AS trim_v,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS lpad_v,
        |  reverse(c_mktsegment) AS rev_v,
        |  repeat(substr(c_name, 1, 2), 3) AS rep_v,
        |  replace(c_name, '0', '#') AS repl_v,
        |  string_split(c_name, '#')[2] AS split_v
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "h4_regex" ->
      """SELECT p_partkey,
        |  p_name LIKE '%gre%' AS like_v,
        |  p_name ILIKE '%GRE%' AS ilike_v,
        |  regexp_matches(p_name, '^[a-z]+ ') AS rlike_v,
        |  coalesce(regexp_extract(p_name, '([a-z]+)$', 1), '') AS extract_v,
        |  CAST(len(string_split(p_name, 'a')) - 1 AS INT) AS count_a,
        |  contains(p_name, 'red') AS contains_v,
        |  contains(p_name, 'red') OR contains(p_name, 'blue') AS multisearch_v,
        |  starts_with(p_name, 'a') AS starts_v,
        |  ends_with(p_name, 'e') AS ends_v
        |FROM part ORDER BY p_partkey""".stripMargin,
    "h7_arrays" ->
      """SELECT p_partkey,
        |  array_to_string(list_transform(string_split(p_name, ' '), w -> upper(w)), ',') AS upper_words,
        |  coalesce(array_to_string(list_filter(string_split(p_name, ' '), w -> length(w) > 4), ','), '') AS long_words,
        |  CAST(coalesce(list_sum(list_transform(string_split(p_name, ' '), w -> length(w))), 0) AS INT) AS total_len,
        |  array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_words,
        |  array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ',') AS distinct_words,
        |  list_contains(string_split(p_name, ' '), 'green') AS has_green,
        |  CAST(coalesce(list_position(string_split(p_name, ' '), 'green'), 0) AS INT) AS pos_green,
        |  array_to_string(list_slice(string_split(p_name, ' '), 1, 2), ',') AS first2,
        |  CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
        |  array_to_string(list_transform(range(1, (p_size % 5) + 2), i -> CAST(i AS VARCHAR)), ',') AS seq_v
        |FROM part ORDER BY p_partkey""".stripMargin,
    "h8_explode" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(p_name, ' ')) AS word FROM part
        |) GROUP BY word ORDER BY n DESC, word ASC LIMIT 100""".stripMargin,
    "h8d_array_join_sql" ->
      """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
        |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey, word""".stripMargin,
    "h9_map_struct" ->
      """SELECT o_orderkey,
        |  o_orderstatus AS tuple_status,
        |  o_orderpriority AS tuple_prio,
        |  o_orderstatus AS map_status,
        |  'p,s' AS keys_v,
        |  2 AS m_card
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "h10_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |  json_extract_string(props, '$.missing') IS NULL AS missing_null,
        |  array_to_string(json_keys(props), ',') AS keys_v
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin,
    "h11_hash" ->
      """SELECT c_custkey, md5(c_name) AS md5_v, sha256(c_name) AS sha256_v
        |FROM customer WHERE c_custkey <= 1000 ORDER BY c_custkey""".stripMargin,
    "h12_encoding" ->
      """SELECT n_nationkey,
        |  base64(CAST(n_name AS BLOB)) AS b64,
        |  decode(from_base64(base64(CAST(n_name AS BLOB)))) AS b64_rt,
        |  hex(n_name) AS hex_v,
        |  decode(unhex(hex(n_name))) AS hex_rt
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "h13_bit" ->
      """SELECT s_suppkey,
        |  s_suppkey & 255 AS and_v,
        |  s_suppkey | 16 AS or_v,
        |  xor(s_suppkey, 170) AS xor_v,
        |  s_suppkey << 2 AS shl_v,
        |  s_suppkey >> 1 AS shr_v
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "h14_url" ->
      """WITH u AS (
        |  SELECT p_partkey,
        |    'https://ex.com/' || replace(p_brand, '#', '-') || '/item?id=' || p_partkey || '&q=' || replace(lower(p_type), ' ', '+') AS url
        |  FROM part)
        |SELECT p_partkey,
        |  regexp_extract(url, '^https://([^/]+)', 1) AS host_v,
        |  regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path_v,
        |  regexp_extract(url, 'q=([^&]*)', 1) AS q_v
        |FROM u ORDER BY p_partkey""".stripMargin,
    "h15_bucket" ->
      """SELECT
        |  CASE WHEN o_totalprice < 0 THEN 0
        |       WHEN o_totalprice >= 600000 THEN 13
        |       ELSE CAST(floor(o_totalprice / 50000) AS BIGINT) + 1 END AS wb,
        |  CAST(floor(o_totalprice / 100000) * 100000 AS BIGINT) AS floor_bucket,
        |  count(*) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY wb, floor_bucket""".stripMargin)
}
