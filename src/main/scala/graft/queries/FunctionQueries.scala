package graft.queries

import graft.QueryDef
import org.apache.spark.sql.functions._

/** SURVEY §2.5 scalar-function families, one oracle query per family:
  * strings (vendor/ibis/expr/operations/strings.py, ~35 ops), temporal
  * (temporal.py, ~40), arrays incl. lambda transform/filter (arrays.py —
  * lambdas the reference's own DataFusion backend can't run,
  * xorq_datafusion/compiler.py:97-106), maps (maps.py), structs
  * (structs.py), JSON (json.py), numeric (numeric.py), generic
  * (generic.py) and Bucket (histograms.py:18).
  *
  * Scale notes: every function here is a codegen'd row-local
  * `org.apache.spark.sql.functions` expression — no shuffle, no UDF, no
  * codegen break; these stay inside WholeStageCodegen and vectorize over
  * the parquet scan, so the 100 TB cost is the scan itself. Outputs are
  * kept scalar (arrays serialized via array_join) per the driver-harness
  * contract.
  */
object FunctionQueries {

  import org.apache.spark.sql.Column

  /** array_join over any element type (array_join wants array<string>). */
  private def ajoin(c: Column): Column =
    array_join(transform(c, _.cast("string")), ",")

  val defs: Seq[QueryDef] = Seq(

    // Strings: case/length/substr/pad/translate/levenshtein/locate/
    // reverse/repeat/ascii/split/concat_ws (strings.py:26-388).
    q("fn_strings",
      """SELECT p_partkey,
        |       upper(p_name) AS up, lower(p_brand) AS lo,
        |       length(p_name) AS len,
        |       substr(p_name, 3, 5) AS sub,
        |       lpad(p_brand, 10, '*') AS lp, rpad(p_brand, 10, '.') AS rp,
        |       translate(p_type, 'EOC', 'eoc') AS tr,
        |       levenshtein(p_name, p_brand) AS lev,
        |       instr(p_name, 'e') AS pos,
        |       reverse(p_brand) AS rev,
        |       repeat(p_type, 2) AS rep,
        |       ascii(p_name) AS asc_c,
        |       split_part(p_name, ' ', 1) AS w1,
        |       concat_ws('-', p_brand, p_type) AS cw,
        |       starts_with(p_name, 'red') AS sw,
        |       contains(p_name, 'ring') AS has_ring
        |FROM part WHERE p_partkey < 300 ORDER BY p_partkey""") { c =>
      c.part.filter(col("p_partkey") < 300)
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"), lower(col("p_brand")).as("lo"),
          length(col("p_name")).as("len"),
          substring(col("p_name"), 3, 5).as("sub"),
          lpad(col("p_brand"), 10, "*").as("lp"),
          rpad(col("p_brand"), 10, ".").as("rp"),
          translate(col("p_type"), "EOC", "eoc").as("tr"),
          levenshtein(col("p_name"), col("p_brand")).as("lev"),
          instr(col("p_name"), "e").as("pos"),
          reverse(col("p_brand")).as("rev"),
          repeat(col("p_type"), 2).as("rep"),
          ascii(col("p_name")).as("asc_c"),
          element_at(split(col("p_name"), " "), 1).as("w1"),
          concat_ws("-", col("p_brand"), col("p_type")).as("cw"),
          col("p_name").startsWith("red").as("sw"),
          col("p_name").contains("ring").as("has_ring"))
        .orderBy("p_partkey")
    },

    // Regex family: RegexSearch/Extract/Replace (strings.py:243-282),
    // LIKE/ILIKE (:223-242). DuckDB regexp_replace needs the 'g' flag to
    // match Spark's replace-all default.
    q("fn_strings_regex",
      """SELECT p_partkey,
        |       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |       regexp_replace(p_name, '[aeiou]', '_', 'g') AS vowless,
        |       regexp_matches(p_name, '^[a-z]+ [a-z]+$') AS two_words,
        |       p_name LIKE '%bolt%' AS has_bolt,
        |       p_name ILIKE '%RING%' AS has_ring_i,
        |       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
        |FROM part WHERE p_partkey < 300 ORDER BY p_partkey""") { c =>
      c.part.filter(col("p_partkey") < 300)
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("vowless"),
          col("p_name").rlike("^[a-z]+ [a-z]+$").as("two_words"),
          col("p_name").like("%bolt%").as("has_bolt"),
          col("p_name").ilike("%RING%").as("has_ring_i"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"))
        .orderBy("p_partkey")
    },

    // Temporal on dates: extract family (temporal.py:103-189), truncate
    // (:25-57), Strftime (:70), add/diff (:276-365), DateFromYMD (:222),
    // last_day. DuckDB dayofweek is 0-based Sunday; Spark is 1-based.
    q("fn_temporal",
      """SELECT o_orderkey,
        |       year(o_orderdate) AS y, month(o_orderdate) AS mo,
        |       day(o_orderdate) AS d, quarter(o_orderdate) AS q,
        |       dayofweek(o_orderdate) + 1 AS dow,
        |       dayofyear(o_orderdate) AS doy,
        |       weekofyear(o_orderdate) AS wk,
        |       date_trunc('month', o_orderdate) AS tmon,
        |       o_orderdate + INTERVAL 30 DAY AS plus30,
        |       o_orderdate + INTERVAL 2 MONTH AS plus2m,
        |       date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS dd,
        |       CAST(last_day(o_orderdate) AS TIMESTAMP) AS ld,
        |       CAST(make_date(year(o_orderdate), month(o_orderdate), 15) AS TIMESTAMP) AS mid,
        |       strftime(o_orderdate, '%Y-%m-%d') AS fmt,
        |       CAST(epoch(o_orderdate) AS BIGINT) AS ue
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""") { c =>
      c.orders.filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("d"),
          quarter(col("o_orderdate")).as("q"),
          dayofweek(col("o_orderdate")).as("dow"),
          dayofyear(col("o_orderdate")).as("doy"),
          weekofyear(col("o_orderdate")).as("wk"),
          date_trunc("month", col("o_orderdate")).as("tmon"),
          // DATE results go out as TIMESTAMP: pandas reads parquet DATE
          // as object cells, which the hash harness cannot compare.
          date_add(to_date(col("o_orderdate")), 30)
            .cast("timestamp_ntz").as("plus30"),
          add_months(to_date(col("o_orderdate")), 2)
            .cast("timestamp_ntz").as("plus2m"),
          datediff(lit("1998-01-01").cast("date"),
            to_date(col("o_orderdate"))).as("dd"),
          last_day(col("o_orderdate")).cast("timestamp_ntz").as("ld"),
          make_date(year(col("o_orderdate")), month(col("o_orderdate")),
            lit(15)).cast("timestamp_ntz").as("mid"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt"),
          unix_timestamp(col("o_orderdate")).as("ue"))
        .orderBy("o_orderkey")
    },

    // Temporal on timestamps: hour/minute/second extraction, hour trunc,
    // TemporalDelta (temporal.py:442-474 → timestampdiff), Date cast.
    q("fn_temporal_ts",
      """SELECT event_id,
        |       hour(CAST(ts AS TIMESTAMP)) AS h,
        |       minute(CAST(ts AS TIMESTAMP)) AS mi,
        |       second(CAST(ts AS TIMESTAMP)) AS s,
        |       date_trunc('hour', CAST(ts AS TIMESTAMP)) AS th,
        |       date_trunc('day', CAST(ts AS TIMESTAMP)) AS dt,
        |       date_diff('minute', date_trunc('day', CAST(ts AS TIMESTAMP)),
        |                 CAST(ts AS TIMESTAMP)) AS min_into_day
        |FROM events WHERE event_id < 1500 ORDER BY event_id""") { c =>
      c.events.filter(col("event_id") < 1500)
        .select(col("event_id"),
          hour(col("ts")).as("h"), minute(col("ts")).as("mi"),
          second(col("ts")).as("s"),
          date_trunc("hour", col("ts")).as("th"),
          to_date(col("ts")).cast("timestamp_ntz").as("dt"),
          expr("timestampdiff(MINUTE, date_trunc('day', ts), ts)")
            .as("min_into_day"))
        .orderBy("event_id")
    },

    // Arrays incl. HOF lambdas (arrays.py:18-324; ArrayMap :93 /
    // ArrayFilter :108 are unrunnable on the reference's own backend —
    // Spark runs them codegen'd). Array cells → array_join strings.
    q("fn_arrays",
      """SELECT n_nationkey,
        |       array_to_string([n_nationkey, n_regionkey, 42], ',') AS arr,
        |       len([n_nationkey, n_regionkey, 42]) AS sz,
        |       [n_nationkey, n_regionkey, 42][2] AS el2,
        |       list_contains([n_nationkey, n_regionkey, 42], 42) AS has42,
        |       list_position([n_nationkey, n_regionkey, 7], 7) AS pos7,
        |       array_to_string(list_transform([n_nationkey, n_regionkey, 42],
        |                                      x -> x * 2), ',') AS dbl,
        |       array_to_string(list_filter([n_nationkey, n_regionkey, 42],
        |                                   x -> x % 2 = 0), ',') AS evens,
        |       CAST(list_aggregate([n_nationkey, n_regionkey, 42], 'sum') AS BIGINT) AS tot,
        |       array_to_string(list_sort([42, n_nationkey, n_regionkey]), ',') AS srt,
        |       array_to_string(list_sort(list_distinct([n_regionkey, n_regionkey, 1])), ',') AS dst,
        |       array_to_string(list_slice([n_nationkey, n_regionkey, 42], 1, 2), ',') AS sl,
        |       array_to_string(flatten([[n_nationkey], [n_regionkey, 42]]), ',') AS fla,
        |       array_to_string(generate_series(1, 1 + n_nationkey % 4), ',') AS seq,
        |       list_min([n_nationkey, n_regionkey, 42]) AS mn,
        |       list_max([n_nationkey, n_regionkey, 42]) AS mx
        |FROM nation ORDER BY n_nationkey""") { c =>
      val arr = array(col("n_nationkey"), col("n_regionkey"), lit(42))
      c.nation.select(col("n_nationkey"),
          ajoin(arr).as("arr"),
          size(arr).cast("long").as("sz"),
          element_at(arr, 2).as("el2"),
          array_contains(arr, 42).as("has42"),
          array_position(array(col("n_nationkey"), col("n_regionkey"),
            lit(7)), 7).as("pos7"),
          ajoin(transform(arr, x => x * 2)).as("dbl"),
          ajoin(filter(arr, x => x % 2 === 0)).as("evens"),
          aggregate(arr, lit(0), (a, x) => a + x).cast("long").as("tot"),
          ajoin(array_sort(array(lit(42), col("n_nationkey"),
            col("n_regionkey")))).as("srt"),
          ajoin(array_sort(array_distinct(array(col("n_regionkey"),
            col("n_regionkey"), lit(1))))).as("dst"),
          ajoin(slice(arr, 1, 2)).as("sl"),
          ajoin(flatten(array(array(col("n_nationkey")),
            array(col("n_regionkey"), lit(42))))).as("fla"),
          ajoin(sequence(lit(1), lit(1) + pmod(col("n_nationkey"),
            lit(4)))).as("seq"),
          array_min(arr).as("mn"),
          array_max(arr).as("mx"))
        .orderBy("n_nationkey")
    },

    // Maps (maps.py:14-99): construct, size, get (+default), contains,
    // keys/values, merge. Oracle computes the expected values directly —
    // the map semantics under test are Spark's.
    q("fn_maps",
      """SELECT n_nationkey,
        |       2 AS msz,
        |       n_nationkey AS get_nk,
        |       -1 AS get_missing,
        |       TRUE AS has_rk,
        |       'nk,rk' AS ks,
        |       concat(n_nationkey, ',', n_regionkey) AS vs,
        |       99 AS merged_xx,
        |       n_regionkey AS from_arrays_b
        |FROM nation ORDER BY n_nationkey""") { c =>
      val m = map(lit("nk"), col("n_nationkey"), lit("rk"), col("n_regionkey"))
      c.nation.select(col("n_nationkey"),
          size(m).as("msz"),
          element_at(m, "nk").as("get_nk"),
          coalesce(try_element_at(m, lit("zz")), lit(-1)).as("get_missing"),
          map_contains_key(m, "rk").as("has_rk"),
          array_join(map_keys(m), ",").as("ks"),
          ajoin(map_values(m)).as("vs"),
          element_at(map_concat(m, map(lit("xx"), lit(99))), "xx")
            .as("merged_xx"),
          element_at(map_from_arrays(array(lit("a"), lit("b")),
            array(col("n_nationkey"), col("n_regionkey"))), "b")
            .as("from_arrays_b"))
        .orderBy("n_nationkey")
    },

    // Structs (structs.py: StructField :15, StructColumn :35): build,
    // field access, nesting, null-safe struct equality.
    q("fn_structs",
      """SELECT n_nationkey,
        |       n_name AS f_name,
        |       n_regionkey AS f_rk,
        |       n_regionkey AS nested_rk,
        |       TRUE AS self_eq,
        |       n_regionkey = 0 AS is_r0
        |FROM nation ORDER BY n_nationkey""") { c =>
      val st = struct(col("n_name").as("nm"), col("n_regionkey").as("rk"))
      val nested = struct(st.as("inner"), col("n_nationkey").as("nk"))
      c.nation.select(col("n_nationkey"),
          st.getField("nm").as("f_name"),
          st.getField("rk").as("f_rk"),
          nested.getField("inner").getField("rk").as("nested_rk"),
          (st === struct(col("n_name").as("nm"),
            col("n_regionkey").as("rk"))).as("self_eq"),
          (st.getField("rk") === 0).as("is_r0"))
        .orderBy("n_nationkey")
    },

    // JSON (json.py:14-86): extract from the events.props JSON column,
    // typed unwrap via from_json, and to_json construction (layout is
    // deterministic; oracle rebuilds the same string).
    q("fn_json",
      """SELECT event_id,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
        |       json_extract_string(props, '$.missing') AS k_missing,
        |       concat('{"event_id":', event_id, ',"event_type":"', event_type, '"}') AS built
        |FROM events WHERE event_id < 1500 ORDER BY event_id""") { c =>
      c.events.filter(col("event_id") < 1500)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          expr("from_json(props, 'k BIGINT').k").as("k_int"),
          get_json_object(col("props"), "$.missing").as("k_missing"),
          to_json(struct(col("event_id"), col("event_type"))).as("built"))
        .orderBy("event_id")
    },

    // VARIANT (Spark 4's semi-structured type): parse_json into a
    // variant, typed variant_get extraction (strict + try_ for missing
    // paths), schema_of_variant, and the canonical to_json round trip
    // — the open-schema path a 100 TB event pipeline uses when props
    // have no fixed struct. Oracle extracts the same values from the
    // raw JSON text.
    q("fn_variant",
      """SELECT event_id,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
        |       json_extract_string(props, '$.missing') AS k_missing,
        |       'OBJECT<k: BIGINT>' AS vschema,
        |       concat('{"k":', json_extract_string(props, '$.k'), '}') AS vjson
        |FROM events WHERE event_id < 1500 ORDER BY event_id""") { c =>
      c.events.filter(col("event_id") < 1500)
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'string')")
            .as("k_str"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')")
            .as("k_int"),
          expr("try_variant_get(parse_json(props), '$.missing', 'string')")
            .as("k_missing"),
          expr("schema_of_variant(parse_json(props))").as("vschema"),
          expr("to_json(parse_json(props))").as("vjson"))
        .orderBy("event_id")
    },

    // Numeric (numeric.py:29-378): rounding/sign, exp/log family, roots,
    // trig, degree conversion, pmod/floordiv, bitwise ops, clip, hex.
    q("fn_numeric",
      """SELECT p_partkey,
        |       abs(p_size - 20) AS ab,
        |       CAST(ceil(p_retailprice / 7) AS BIGINT) AS ce,
        |       CAST(floor(p_retailprice / 7) AS BIGINT) AS fl,
        |       round(p_retailprice / 7 + 1e-9, 2) AS rd,
        |       sign(p_size - 20) AS sg,
        |       round(exp(p_size / 50.0) + 1e-9, 6) AS ex,
        |       round(ln(p_size + 1.0) + 1e-9, 6) AS lg,
        |       round(log10(p_size + 1.0) + 1e-9, 6) AS l10,
        |       round(log2(p_size + 1.0) + 1e-9, 6) AS l2,
        |       round(sqrt(p_size) + 1e-9, 6) AS sq,
        |       round(cbrt(p_size) + 1e-9, 6) AS cb,
        |       round(pow(p_size, 1.5) + 1e-9, 4) AS pw,
        |       round(sin(p_size) + 1e-9, 6) AS sn,
        |       round(cos(p_size) + 1e-9, 6) AS cs,
        |       round(atan2(p_size, 7) + 1e-9, 6) AS at2,
        |       round(degrees(p_size / 100.0) + 1e-9, 6) AS dg,
        |       round(radians(p_size) + 1e-9, 6) AS rad,
        |       ((p_size - 20) % 7 + 7) % 7 AS pm,
        |       CAST((p_size + 20) // 7 AS BIGINT) AS fd,
        |       p_size & 12 AS ba, p_size | 12 AS bo, xor(p_size, 12) AS bx,
        |       p_size << 2 AS shl, p_size >> 1 AS shr,
        |       bit_count(p_size) AS bc,
        |       greatest(least(p_size, 30), 10) AS clip,
        |       to_hex(p_size) AS hx
        |FROM part ORDER BY p_partkey""") { c =>
      c.part.select(col("p_partkey"),
          abs(col("p_size") - 20).as("ab"),
          ceil(col("p_retailprice") / 7).as("ce"),
          floor(col("p_retailprice") / 7).as("fl"),
          r2(col("p_retailprice") / 7).as("rd"),
          signum(col("p_size") - 20).cast("int").as("sg"),
          r6(exp(col("p_size") / 50.0)).as("ex"),
          r6(log(col("p_size") + 1.0)).as("lg"),
          r6(log10(col("p_size") + 1.0)).as("l10"),
          r6(log2(col("p_size") + 1.0)).as("l2"),
          r6(sqrt(col("p_size"))).as("sq"),
          r6(cbrt(col("p_size"))).as("cb"),
          r4(pow(col("p_size"), 1.5)).as("pw"),
          r6(sin(col("p_size"))).as("sn"),
          r6(cos(col("p_size"))).as("cs"),
          r6(atan2(col("p_size"), lit(7))).as("at2"),
          r6(degrees(col("p_size") / 100.0)).as("dg"),
          r6(radians(col("p_size"))).as("rad"),
          pmod(col("p_size") - 20, lit(7)).as("pm"),
          expr("(p_size + 20) div 7").as("fd"),
          col("p_size").bitwiseAND(12).as("ba"),
          col("p_size").bitwiseOR(12).as("bo"),
          col("p_size").bitwiseXOR(12).as("bx"),
          shiftleft(col("p_size"), 2).as("shl"),
          shiftright(col("p_size"), 1).as("shr"),
          bit_count(col("p_size")).as("bc"),
          greatest(least(col("p_size"), lit(30)), lit(10)).as("clip"),
          hex(col("p_size")).as("hx"))
        .orderBy("p_partkey")
    },

    // Generic (generic.py): Cast/TryCast :40/:58, Coalesce :104,
    // NullIf :93, Greatest/Least :114/:124, hashes :236-269, cases
    // :288-318; logical (logical.py): Between :111, InValues :136,
    // IdenticalTo :106 (null-safe =), IfElse :151.
    q("fn_generic",
      """SELECT p_partkey,
        |       CAST(p_size AS DOUBLE) AS size_d,
        |       CAST(p_size AS VARCHAR) AS size_s,
        |       coalesce(try_cast(p_name AS INT), -1) AS bad_cast,
        |       coalesce(nullif(p_type, 'ECONOMY'), 'fallback') AS nz,
        |       greatest(p_size, 25) AS gr, least(p_size, 25) AS le,
        |       md5(p_name) AS m5,
        |       sha256(p_name) AS sh,
        |       CASE WHEN p_size > 20 THEN 'big' ELSE 'small' END AS iff,
        |       p_size BETWEEN 10 AND 30 AS bt,
        |       p_type IN ('ECONOMY', 'SMALL') AS iv,
        |       ifnull(nullif(p_size, 11), -1) AS nvl,
        |       p_size IS NOT DISTINCT FROM 11 AS idt
        |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""") { c =>
      c.part.filter(col("p_partkey") < 500)
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size_d"),
          col("p_size").cast("string").as("size_s"),
          coalesce(expr("try_cast(p_name as int)"), lit(-1)).as("bad_cast"),
          coalesce(nullif(col("p_type"), lit("ECONOMY")), lit("fallback"))
            .as("nz"),
          greatest(col("p_size"), lit(25)).as("gr"),
          least(col("p_size"), lit(25)).as("le"),
          md5(col("p_name").cast("binary")).as("m5"),
          sha2(col("p_name").cast("binary"), 256).as("sh"),
          when(col("p_size") > 20, "big").otherwise("small").as("iff"),
          col("p_size").between(10, 30).as("bt"),
          col("p_type").isin("ECONOMY", "SMALL").as("iv"),
          ifnull(nullif(col("p_size"), lit(11)), lit(-1)).as("nvl"),
          (col("p_size") <=> 11).as("idt"))
        .orderBy("p_partkey")
    },

    // URL-field extraction (strings.py:316-362 → parse_url) +
    // FindInSet (:156). DuckDB has no parse_url; the oracle rebuilds
    // each field from the constructed URL's parts.
    q("fn_strings_url",
      """SELECT n_nationkey,
        |       replace(lower(n_name), '_', '-') || '.example.com' AS host,
        |       '/region/' || n_regionkey AS path,
        |       'k=' || n_nationkey AS query_str,
        |       CAST(n_nationkey AS VARCHAR) AS k_param,
        |       CAST(coalesce(array_position(string_split('alpha,beta,gamma', ','),
        |            CASE WHEN n_regionkey = 1 THEN 'beta' ELSE 'delta' END), 0)
        |            AS INT) AS fis
        |FROM nation ORDER BY n_nationkey""") { c =>
      // hostname must be URI-legal (no underscores) for parse_url
      val url = concat(lit("http://"),
        regexp_replace(lower(col("n_name")), "_", "-"),
        lit(".example.com/region/"), col("n_regionkey"),
        lit("?k="), col("n_nationkey"))
      c.nation.select(col("n_nationkey"),
          parse_url(url, lit("HOST")).as("host"),
          parse_url(url, lit("PATH")).as("path"),
          parse_url(url, lit("QUERY")).as("query_str"),
          parse_url(url, lit("QUERY"), lit("k")).as("k_param"),
          find_in_set(when(col("n_regionkey") === 1, "beta")
            .otherwise("delta"), lit("alpha,beta,gamma")).as("fis"))
        .orderBy("n_nationkey")
    },

    // Timestamp construction (temporal.py: TimestampFromYMDHMS :246,
    // TimestampFromUNIX :261, StringToTimestamp :81, DateFromYMD :222).
    q("fn_temporal_make",
      """SELECT o_orderkey,
        |       make_timestamp(year(o_orderdate), month(o_orderdate),
        |                      day(o_orderdate), 12, 30, 45.0) AS mk_ts,
        |       CAST(to_timestamp(CAST(epoch(o_orderdate) AS BIGINT)) AS TIMESTAMP) AS from_unix,
        |       strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS reparsed,
        |       CAST(make_date(year(o_orderdate), 6, 15) AS TIMESTAMP) AS mk_date
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""") { c =>
      c.orders.filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          make_timestamp_ntz(year(col("o_orderdate")),
            month(col("o_orderdate")), dayofmonth(col("o_orderdate")),
            lit(12), lit(30), lit(45.0)).as("mk_ts"),
          timestamp_seconds(unix_timestamp(col("o_orderdate")))
            .cast("timestamp_ntz").as("from_unix"),
          to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd"),
            "yyyy-MM-dd").cast("timestamp_ntz").as("reparsed"),
          make_date(year(col("o_orderdate")), lit(6), lit(15))
            .cast("timestamp_ntz").as("mk_date"))
        .orderBy("o_orderkey")
    },

    // Misc long-tail: calendar-month delta (computed identically on
    // both engines — Spark timestampdiff(MONTH) counts COMPLETE months
    // while DuckDB date_diff('month') counts boundary crossings, so
    // neither is used directly), TryCast-family division, E/Pi
    // constants (generic.py:222/:229), ArrayExcept.
    q("fn_misc",
      """SELECT o_orderkey,
        |       (1998 - year(o_orderdate)) * 12 + (6 - month(o_orderdate)) AS cal_months_to_jun98,
        |       coalesce(CAST(NULL AS DOUBLE), -1.0) AS div_by_zero,
        |       round(o_totalprice / nullif(year(o_orderdate) - 1995, 0) + 1e-9, 2) AS try_div,
        |       round(pi() + 1e-9, 6) AS pi_c,
        |       round(exp(1.0) + 1e-9, 6) AS e_c,
        |       coalesce(array_to_string(list_sort(list_filter([year(o_orderdate), 1997, 1998],
        |                         x -> NOT list_contains([1997, 1998], x))), ','), '') AS yr_except
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""") { c =>
      val yr = year(col("o_orderdate"))
      c.orders.filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          ((lit(1998) - yr) * 12 + (lit(6) - month(col("o_orderdate"))))
            .as("cal_months_to_jun98"),
          coalesce(expr("try_divide(o_totalprice, 0)"), lit(-1.0))
            .as("div_by_zero"),
          r2(expr("try_divide(o_totalprice, nullif(year(o_orderdate) - 1995, 0))"))
            .as("try_div"),
          r6(expr("pi()")).as("pi_c"),
          r6(expr("e()")).as("e_c"),
          ajoin(array_sort(array_except(array(yr, lit(1997), lit(1998)),
            array(lit(1997), lit(1998))))).as("yr_except"))
        .orderBy("o_orderkey")
    },

    // Bucket / histogram (histograms.py:18, lowered to a CASE chain at
    // sql/rewrites.py:530-583) — fixed bin edges over l_quantity.
    q("fn_bucket",
      """SELECT CASE WHEN l_quantity < 10 THEN '[0,10)'
        |            WHEN l_quantity < 25 THEN '[10,25)'
        |            WHEN l_quantity < 40 THEN '[25,40)'
        |            ELSE '[40,)' END AS bucket,
        |       count(*) AS cnt,
        |       round(sum(l_quantity) + 1e-9, 2) AS qty
        |FROM lineitem GROUP BY 1 ORDER BY bucket""") { c =>
      c.lineitem
        .withColumn("bucket",
          when(col("l_quantity") < 10, "[0,10)")
            .when(col("l_quantity") < 25, "[10,25)")
            .when(col("l_quantity") < 40, "[25,40)")
            .otherwise("[40,)"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"), r2(sum(col("l_quantity"))).as("qty"))
        .orderBy("bucket")
    }
  )
}
