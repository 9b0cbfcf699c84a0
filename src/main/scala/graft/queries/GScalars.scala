package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Det.r4

/** Groups G (scalar functions — the reference's cleaning/normalization
  * surface) and H (array / map / JSON) of SURVEY.md §2.
  *
  * Dialect discipline (SURVEY §7.3.4): DuckDB `regexp_replace` needs the 'g'
  * flag to match Spark's replace-all; `dayofweek` is Sun=1..7 in Spark vs
  * Sun=0..6 in DuckDB; Spark `floor`/`ceil` return LONG while DuckDB's return
  * DOUBLE (cast explicitly); array set-ops are wrapped in sort/distinct so
  * element order is canonical on both engines.
  */
object GScalars {

  val m: ListMap[String, Q] = ListMap(
    // -------------------------------------------------------- G. scalar fns
    "g_string_basic" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("lo_brand"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 5).as("name_pre"),
        lpad(col("p_brand"), 10, "*").as("brand_pad"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"))
        .orderBy("p_partkey")),

    "g_string_regex" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        // explicit group 0: Spark requires the index, DuckDB defaults to it
        regexp_extract(col("p_name"), "[a-z]+", 0).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
        .orderBy("p_partkey")),

    "g_string_more" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
        reverse(col("p_name")).as("rev"),
        repeat(col("p_brand"), 2).as("rep"),
        regexp_replace(col("p_name"), " ", "_").as("snake"))
        .orderBy("p_partkey")),

    "g_string_split" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .orderBy("doc_id", "w")),

    "g_string_levenshtein" -> ((s, d) =>
      Tables.nation(s, d).crossJoin(Tables.region(s, d))
        .select(col("n_nationkey"), col("r_regionkey"),
          levenshtein(col("n_name"), col("r_name")).cast("long").as("dist"))
        .orderBy("n_nationkey", "r_regionkey")),

    "g_date_extract" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        // cast to long: computed ints are INT in Spark but BIGINT in DuckDB
        year(col("o_orderdate")).cast("long").as("yr"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        month(col("o_orderdate")).cast("long").as("mth"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"))
        .orderBy("o_orderkey")),

    "g_date_trunc_format" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("cnt"), r4(sum("o_totalprice")).as("total"))
        .orderBy("ym")),

    "g_date_arith" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        datediff(to_date(lit("2000-01-01")), col("o_orderdate").cast("date")).cast("long").as("days_to_y2k"),
        last_day(col("o_orderdate").cast("date")).as("month_end"))
        .orderBy("o_orderkey")),

    "g_math" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        r4(sqrt(col("l_extendedprice"))).as("sq"),
        floor(col("l_extendedprice")).as("fl"),
        ceil(col("l_extendedprice")).as("cl"),
        abs(col("l_quantity") * -1).as("ab"),
        r4(pow(col("l_quantity"), 2)).as("pw"),
        r4(log(col("l_extendedprice"))).as("ln_p"),
        r4(exp(col("l_discount"))).as("exp_d"),
        signum(col("l_discount") - 0.05).as("sg"),
        pmod(col("l_orderkey"), lit(7)).as("pm"),
        (col("l_orderkey") % 5).as("md"))
        .orderBy("l_orderkey", "l_linenumber", "sq", "ab", "exp_d")),

    "g_mask" -> ((s, d) =>
      // mask() (Spark 4 PII surface): class-wise character masking —
      // uppercase→X, lowercase→x, digit→n by default; per-class override
      // with NULL meaning keep. Complements i_pii_redact (regex/k-anon)
      // with the column-level default-deny redaction primitive.
      Tables.customer(s, d).select(
        col("c_custkey"),
        expr("mask(c_name)").as("masked_name"),
        expr("mask(CAST(c_custkey AS STRING), NULL, NULL, '#', NULL)")
          .as("masked_key"),
        expr("mask(c_mktsegment, 'Z', 'z', 'n', '_')").as("masked_seg"))
        .orderBy("c_custkey")),

    "g_collation" -> ((s, d) => {
      // collation-aware grouping (Spark 4 collations): UTF8_LCASE merges
      // case variants of the same name into one group — n_distinct_raw=2
      // for the case-mixed rows proves the merge happened under the
      // collation, not by pre-lowercasing the data
      val base = Tables.nation(s, d)
      val mixed = base.select(
        when(col("n_nationkey") % 2 === 1, lower(col("n_name")))
          .otherwise(col("n_name")).as("name"))
        .unionAll(base.select(col("n_name").as("name")))
      mixed
        .select(expr("collate(name, 'UTF8_LCASE')").as("k"), col("name"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("name")).as("n_distinct_raw"))
        .select(lower(col("k")).as("name_ci"), col("n_rows"),
          col("n_distinct_raw"))
        .orderBy("name_ci")
    }),

    "g_bitwise" -> ((s, d) =>
      // bitwise surface: and/or/xor, shifts, popcount — the bit-packing
      // toolkit behind bucket ids, morton keys, and bloom filters
      Tables.orders(s, d).select(
        col("o_orderkey"),
        (col("o_orderkey").bitwiseAND(255)).as("b_and"),
        (col("o_orderkey").bitwiseOR(4096)).as("b_or"),
        (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("b_xor"),
        bit_count(col("o_orderkey")).as("pop"),
        shiftleft(col("o_orderkey"), 2).as("shl"),
        shiftright(col("o_orderkey"), 3).as("shr"))
        .orderBy("o_orderkey")),

    "g_try_errors" -> ((s, d) =>
      // error-safe evaluation (the try_* family): malformed casts and
      // zero divisors become NULL instead of killing the job — the ANSI
      // posture a 100 TB batch needs (one bad row must not fail the
      // stage; the NULLs are then countable/quarantinable like
      // p_expectations does). DuckDB mirrors: try_cast is 1:1; try_divide
      // mirrors as x / nullif(y, 0).
      Tables.orders(s, d).select(
        col("o_orderkey"),
        r4(expr("try_divide(o_totalprice, o_custkey % 3)")).as("td"),
        expr("try_cast(o_orderpriority AS INT)").as("bad_cast"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)")
          .as("prio_num"),
        expr("try_cast(o_orderdate AS STRING)").as("dt_str"))
        .orderBy("o_orderkey")),

    "g_conditional" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        coalesce(expr("nullif(o_orderstatus,'P')"), lit("NONE")).as("st"),
        greatest(col("o_totalprice"), lit(100000.0)).as("gr"),
        least(col("o_totalprice"), lit(100000.0)).as("ls"))
        .orderBy("o_orderkey")),

    "g_hash_anonymize" -> ((s, d) =>
      // the reference's signature transform: deterministic surrogate keys
      // (anon_ticket_number / anon_plate_id analogs) via md5/sha256
      Tables.customer(s, d).select(
        col("c_custkey"),
        md5(col("c_name")).as("plate_hash"),
        sha2(concat_ws("|", col("c_name"), col("c_mktsegment")), 256).as("ticket_hash"))
        .orderBy("c_custkey")),

    // ---------------------------------------------------- H. array/map/json
    "h_array_basic" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("w", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("w")).cast("long").as("n_tokens"),
          array_contains(col("w"), "join").as("has_join"),
          // arrays serialized to CSV: the driver's pandas differ cannot
          // sort/hash array cells (the array ops still run; only the final
          // projection is scalar)
          array_join(slice(col("w"), 1, 3), ",").as("first3"),
          array_join(sort_array(array_distinct(col("w"))), ",").as("uniq_sorted"))
        .orderBy("doc_id")),

    "h_array_hof" -> ((s, d) =>
      Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
        .selectExpr(
          "vec_id",
          "round(aggregate(transform(e, x -> x * 2), 0.0D, (acc, x) -> acc + x), 4) AS sum2x",
          "CAST(size(filter(e, x -> x > 0)) AS BIGINT) AS n_pos",
          "exists(e, x -> x > 0.5) AS has_big")
        .orderBy("vec_id")),

    "h_array_setops" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("w", split(col("text"), " "))
        .select(
          col("doc_id"),
          array_join(sort_array(array_intersect(col("w"),
            array(lit("join"), lit("hash"), lit("scan")))), ",").as("kw_hits"),
          size(array_union(col("w"),
            array(lit("join"), lit("hash"), lit("scan")))).cast("long").as("n_union"))
        .orderBy("doc_id")),

    "h_explode" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .withColumn("pos", col("pos").cast("long"))
        .orderBy("doc_id", "pos")),

    "h_json_get" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .orderBy("event_id")),

    "h_from_json" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("j", from_json(col("props"), org.apache.spark.sql.types.StructType(
          Seq(org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))))
        .select(col("event_id"), col("j.k").as("k_val"))
        .orderBy("event_id")),

    // map ops with keys serialized via array_join → oracle-comparable
    "h_map_ops" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("m", map_from_arrays(
          array(lit("k")),
          array(get_json_object(col("props"), "$.k").cast("int"))))
        .select(col("event_id"), element_at(col("m"), "k").as("mk"),
          array_join(map_keys(col("m")), ",").as("keys"))
        .orderBy("event_id")),

    "h_variant_get" -> ((s, d) =>
      // Spark 4 VARIANT: parse semi-structured text once into the binary
      // variant encoding, then extract typed fields with variant_get —
      // the schema-on-read path for heterogeneous JSON at scale
      Tables.events(s, d)
        .withColumn("v", parse_json(col("props")))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'int')").as("k_val"))
        .orderBy("event_id")),

    "g_url_parse" -> ((s, d) =>
      // URL decomposition (domain filtering is a standard corpus-curation
      // step); URLs synthesized deterministically from part attributes
      Tables.part(s, d)
        .withColumn("url", concat(lit("https://"),
          lower(regexp_replace(col("p_brand"), "#", "")),
          lit(".example.com/part/"), col("p_partkey")))
        .select(col("p_partkey"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"))
        .orderBy("p_partkey")),

    "h_to_json" -> ((s, d) =>
      // serialization exercised on BOTH engines, compared through a
      // parse-back canonicalization (round 9): raw to_json text is not
      // hash-comparable (key order / spacing are engine-specific), so the
      // key emits the fields extracted from its OWN serialized output —
      // the round trip is the contract, and it is oracle hash-matched.
      // OperatorSpec still checks the raw string is parseable JSON with
      // both keys present.
      Tables.events(s, d)
        .select(col("event_id"),
          to_json(struct(col("event_id"), col("event_type"))).as("js"))
        .select(col("event_id"),
          from_json(col("js"), org.apache.spark.sql.types.StructType.fromDDL(
            "event_id BIGINT, event_type STRING")).as("p"))
        .select(col("event_id"), col("p.event_id").as("rt_id"),
          col("p.event_type").as("rt_type"))
        .orderBy("event_id")),
  )

  val oracle: ListMap[String, String] = ListMap(
    "g_string_basic" ->
      ("SELECT p_partkey, upper(p_name) AS up_name, lower(p_brand) AS lo_brand, " +
        "length(p_name) AS name_len, substring(p_name, 1, 5) AS name_pre, " +
        "lpad(p_brand, 10, '*') AS brand_pad, " +
        "concat_ws('-', p_brand, p_type) AS brand_type, " +
        "trim('  ' || p_name || '  ') AS trimmed " +
        "FROM part ORDER BY p_partkey"),
    "g_string_regex" ->
      ("SELECT p_partkey, regexp_extract(p_name, '[a-z]+') AS first_word, " +
        "regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled " +
        "FROM part ORDER BY p_partkey"),
    "g_string_more" ->
      ("SELECT p_partkey, translate(p_name, 'aeiou', 'AEIOU') AS tr, " +
        "reverse(p_name) AS rev, repeat(p_brand, 2) AS rep, " +
        "replace(p_name, ' ', '_') AS snake FROM part ORDER BY p_partkey"),
    "g_string_split" ->
      ("SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents " +
        "ORDER BY doc_id, w"),
    "g_string_levenshtein" ->
      ("SELECT n_nationkey, r_regionkey, levenshtein(n_name, r_name) AS dist " +
        "FROM nation CROSS JOIN region ORDER BY n_nationkey, r_regionkey"),
    "g_date_extract" ->
      ("SELECT o_orderkey, year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr, " +
        "month(o_orderdate) AS mth, day(o_orderdate) AS dom, " +
        "dayofweek(o_orderdate) + 1 AS dow " + // Sun=0..6 → Spark's Sun=1..7
        "FROM orders ORDER BY o_orderkey"),
    "g_date_trunc_format" ->
      ("SELECT date_trunc('month', o_orderdate) AS month_start, " +
        "strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS cnt, " +
        "round(sum(o_totalprice), 4) AS total " +
        "FROM orders GROUP BY month_start, ym ORDER BY ym"),
    "g_date_arith" ->
      ("SELECT o_orderkey, (o_orderdate::DATE + INTERVAL 30 DAY)::DATE AS plus30, " +
        "date_diff('day', o_orderdate::DATE, DATE '2000-01-01') AS days_to_y2k, " +
        "last_day(o_orderdate::DATE) AS month_end " +
        "FROM orders ORDER BY o_orderkey"),
    "g_math" ->
      ("SELECT l_orderkey, l_linenumber, round(sqrt(l_extendedprice), 4) AS sq, " +
        "CAST(floor(l_extendedprice) AS BIGINT) AS fl, " +
        "CAST(ceil(l_extendedprice) AS BIGINT) AS cl, " +
        "abs(l_quantity * -1) AS ab, round(pow(l_quantity, 2), 4) AS pw, " +
        "round(ln(l_extendedprice), 4) AS ln_p, round(exp(l_discount), 4) AS exp_d, " +
        "CASE WHEN l_discount - 0.05 > 0 THEN 1.0 WHEN l_discount - 0.05 < 0 " +
        "THEN -1.0 ELSE 0.0 END::DOUBLE AS sg, " +
        "((l_orderkey % 7) + 7) % 7 AS pm, l_orderkey % 5 AS md " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, sq, ab, exp_d"),
    // DuckDB has no mask() — the oracle is the regex chain it abbreviates
    "g_mask" ->
      ("SELECT c_custkey, " +
        "regexp_replace(regexp_replace(regexp_replace(c_name, " +
        "'[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') " +
        "AS masked_name, " +
        "regexp_replace(c_custkey::VARCHAR, '[0-9]', '#', 'g') AS masked_key, " +
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        "c_mktsegment, '[A-Z]', 'Z', 'g'), '[a-z]', 'z', 'g'), " +
        "'[0-9]', 'n', 'g'), '[^Zzn]', '_', 'g') AS masked_seg " +
        "FROM customer ORDER BY c_custkey"),
    // the oracle lowercases explicitly — collation grouping must agree
    "g_collation" ->
      ("WITH mixed AS (SELECT CASE WHEN n_nationkey % 2 = 1 " +
        "THEN lower(n_name) ELSE n_name END AS name FROM nation " +
        "UNION ALL SELECT n_name FROM nation) " +
        "SELECT lower(name) AS name_ci, count(*) AS n_rows, " +
        "count(DISTINCT name) AS n_distinct_raw " +
        "FROM mixed GROUP BY lower(name) ORDER BY name_ci"),
    // DuckDB: ^ is power — xor() is the operator-function; shifts match
    "g_bitwise" ->
      ("SELECT o_orderkey, o_orderkey & 255 AS b_and, " +
        "o_orderkey | 4096 AS b_or, xor(o_orderkey, o_custkey) AS b_xor, " +
        "CAST(bit_count(o_orderkey) AS INTEGER) AS pop, " +
        "o_orderkey << 2 AS shl, o_orderkey >> 3 AS shr " +
        "FROM orders ORDER BY o_orderkey"),
    "g_try_errors" ->
      ("SELECT o_orderkey, round(o_totalprice / nullif(o_custkey % 3, 0), 4) AS td, " +
        "TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast, " +
        "TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num, " +
        "TRY_CAST(o_orderdate AS VARCHAR) AS dt_str " +
        "FROM orders ORDER BY o_orderkey"),
    "g_conditional" ->
      ("SELECT o_orderkey, coalesce(nullif(o_orderstatus, 'P'), 'NONE') AS st, " +
        "greatest(o_totalprice, 100000.0) AS gr, least(o_totalprice, 100000.0) AS ls " +
        "FROM orders ORDER BY o_orderkey"),
    "g_hash_anonymize" ->
      ("SELECT c_custkey, md5(c_name) AS plate_hash, " +
        "sha256(concat_ws('|', c_name, c_mktsegment)) AS ticket_hash " +
        "FROM customer ORDER BY c_custkey"),
    "h_array_basic" ->
      ("SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, " +
        "list_contains(string_split(text, ' '), 'join') AS has_join, " +
        "array_to_string(string_split(text, ' ')[1:3], ',') AS first3, " +
        "array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') " +
        "AS uniq_sorted FROM documents ORDER BY doc_id"),
    "h_array_hof" ->
      ("SELECT vec_id, " +
        "(round(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * 2), 'sum'), 4) + 0.0) AS sum2x, " +
        "len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_pos, " +
        "len(list_filter(embedding::DOUBLE[], x -> x > 0.5)) > 0 AS has_big " +
        "FROM embeddings ORDER BY vec_id"),
    "h_array_setops" ->
      ("SELECT doc_id, " +
        // coalesce: DuckDB's array_to_string([]) is NULL, Spark's array_join is ''
        "coalesce(array_to_string(list_sort(list_intersect(list_distinct(string_split(text, ' ')), " +
        "['join','hash','scan'])), ','), '') AS kw_hits, " +
        "len(list_distinct(string_split(text, ' ') || ['join','hash','scan'])) AS n_union " +
        "FROM documents ORDER BY doc_id"),
    "h_explode" ->
      ("SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1 AS pos, " +
        "unnest(string_split(text, ' ')) AS w FROM documents ORDER BY doc_id, pos"),
    "h_json_get" ->
      ("SELECT event_id, json_extract(props, '$.k')::INT AS k_val FROM events " +
        "ORDER BY event_id"),
    "h_from_json" ->
      ("SELECT event_id, json_extract(props, '$.k')::INT AS k_val FROM events " +
        "ORDER BY event_id"),
    "h_map_ops" ->
      ("SELECT event_id, json_extract(props, '$.k')::INT AS mk, 'k' AS keys " +
        "FROM events ORDER BY event_id"),
    "h_variant_get" ->
      ("SELECT event_id, json_extract(props, '$.k')::INT AS k_val FROM events " +
        "ORDER BY event_id"),
    "g_url_parse" ->
      ("SELECT p_partkey, lower(replace(p_brand, '#', '')) || '.example.com' AS host, " +
        "'/part/' || p_partkey AS path FROM part ORDER BY p_partkey"),
    "h_to_json" ->
      // parse-back canonicalization: DuckDB serializes with ITS to_json,
      // extracts with ITS json path ops — the round-tripped VALUES are
      // the engine-neutral comparison surface
      ("SELECT event_id, " +
        "CAST(json_extract(js, '$.event_id') AS BIGINT) AS rt_id, " +
        "json_extract_string(js, '$.event_type') AS rt_type FROM (" +
        "SELECT event_id, to_json(struct_pack(" +
        "event_id := event_id, event_type := event_type)) AS js " +
        "FROM events) ORDER BY event_id"),
  )
}
