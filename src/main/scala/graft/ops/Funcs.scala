package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.H — string / math / date / JSON / array+map scalar
  * functions. Everything is `org.apache.spark.sql.functions` built-ins
  * (codegen'd); libm-dependent results (ln/pow) are rounded to 6 dp so
  * JVM-vs-DuckDB last-ulp drift cannot flip the compare.
  */
object Funcs extends graft.QueryModule {

  /** String pipeline (`fetch_data.py:294,58-64,130,292`): trim/upper,
    * substring probe, split, concat, regexp extraction. */
  private def fnString(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(trim(col("p_name"))).as("up"),
      length(col("p_name")).as("n_chars"),
      size(split(col("p_name"), " ")).as("n_words"),
      concat_ws("/", col("p_brand"), col("p_type")).as("path"),
      substring(col("p_name"), 1, 4).as("prefix"),
      instr(col("p_name"), "widget").as("widget_at"),
      regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"))
      .orderBy("p_partkey")

  /** Math library (`fetch_data.py:182-184,36,108`): abs, sqrt, ln, pow,
    * least/greatest, banker's rounding. */
  private def fnMath(s: SparkSession, d: String): DataFrame =
    // r14 (guide §2.3 "project before the exchange" — inverted for
    // DERIVED columns): the math battery used to compute BELOW the
    // global orderBy, so every sqrt/ln/pow ran twice (once in the range
    // partitioner's sampling pass, once for real) and the exchange
    // carried the four derived doubles. Sorting the RAW columns first
    // and projecting above the sort computes each function once and
    // shuffles only source columns; output rows and order unchanged
    // (the sort keys are source columns either way).
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"), col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(-col("l_quantity")).as("abs_qty"),
        bround(sqrt(col("l_extendedprice")), 6).as("root"),
        bround(log(col("l_extendedprice")), 6).as("nat_log"),
        bround(pow(col("l_discount") + 1, 3), 6).as("cubed"),
        least(col("l_tax"), col("l_discount")).as("lo"),
        greatest(col("l_tax"), col("l_discount")).as("hi"))

  /** Date/time (`fetch_data.py:272,319,156`; `update.yml:6`): truncation,
    * field extraction, interval arithmetic, epoch, ISO-8601 formatting. */
  private def fnDate(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      year(col("o_orderdate")).as("yr"),
      month(col("o_orderdate")).as("mo"),
      datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_98"),
      date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
      unix_timestamp(col("o_orderdate")).as("epoch_s"),
      date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("iso"))
      .orderBy("o_orderkey")

  /** Extended datetime battery (§H completeness, r7): week/quarter
    * truncation, ISO week numbering, month arithmetic, boundary dates —
    * the calendar surface every reporting query leans on. Cross-engine
    * traps mirrored explicitly: Spark `dayofweek` is 1=Sunday while
    * DuckDB's is 0=Sunday (+1 on the oracle); Spark `weekofyear` is ISO
    * week ≡ DuckDB `weekofyear`; quarter/last_day/add_months agree. */
  private def fnDatetimeExtra(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      date_trunc("week", col("o_orderdate")).cast("date").as("week_start"),
      date_trunc("quarter", col("o_orderdate")).cast("date").as("q_start"),
      quarter(col("o_orderdate")).as("q"),
      dayofweek(col("o_orderdate")).as("dow"),
      dayofyear(col("o_orderdate")).as("doy"),
      weekofyear(col("o_orderdate")).as("iso_week"),
      last_day(col("o_orderdate").cast("date")).as("month_end"),
      add_months(col("o_orderdate").cast("date"), 3).as("plus_q"))
      .orderBy("o_orderkey")

  /** Extended array battery (§H completeness, r7): position lookup,
    * set algebra (union/intersect/except), flatten, repeat, and
    * aggregate-over-array — emitted as SORTED joined strings so neither
    * engine's internal set-op ordering leaks into the compare. Spark's
    * array_position returns 0 when absent, DuckDB's list_position
    * returns NULL — coalesced on the oracle side. */
  private def fnArrayExtra(s: SparkSession, d: String): DataFrame = {
    val ws = split(col("p_name"), " ")
    val const = array(lit("red"), lit("green"), lit("blue"))
    def sortedJoin(c: org.apache.spark.sql.Column) =
      array_join(array_sort(array_distinct(c)), "|")
    Tables.part(s, d).select(
      col("p_partkey"),
      array_position(ws, "widget").as("pos_widget"),
      size(flatten(array(ws, const))).as("n_flat"),
      sortedJoin(array_intersect(ws, const)).as("inter"),
      sortedJoin(array_except(ws, const)).as("except_c"),
      sortedJoin(array_union(ws, const)).as("union_c"),
      array_join(array_repeat(substring(col("p_name"), 1, 3), 2), "|")
        .as("rep"),
      array_max(ws).as("max_word"))
      .orderBy("p_partkey")
  }

  /** JSON scalar functions (`fetch_data.py:313-319`): path extraction +
    * record serialization. */
  /** Extended string battery [N] (§H completeness round 2): padding,
    * character translation, repetition, reversal, and built-in
    * levenshtein — all pure string ops, byte-identical across engines. */
  private def fnStringExtra(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      lpad(col("p_name"), 16, "*").as("padded"),
      rpad(col("p_brand"), 10, ".").as("rpadded"),
      translate(col("p_name"), "aeiou", "AEIOU").as("xlated"),
      repeat(substring(col("p_name"), 1, 3), 2).as("rep"),
      reverse(col("p_name")).as("rev"),
      levenshtein(col("p_name"), reverse(col("p_name"))).as("lev_rev"))
      .orderBy("p_partkey")

  /** ANSI error-handling battery [N]: Spark 4 runs ANSI mode BY DEFAULT
    * — division by zero, bad casts, and integer overflow now THROW
    * mid-job instead of silently corrupting (QueriesSpec proves the
    * throw). The `try_*` family is the per-expression opt-out: each
    * converts its own failure to NULL without disabling ANSI for the
    * rest of the plan — at 100 TB the difference between one poisoned
    * row nulling out and a 6-hour job dying at hour 5. */
  private def fnTryErrors(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      expr("try_divide(o_totalprice, o_custkey % 3)").as("safe_div"),
      expr("try_cast(o_orderpriority AS INT)").as("bad_cast"),
      expr("try_add(o_orderkey, 9223372036854775800L)").as("near_overflow"),
      expr("try_element_at(array(o_orderkey, o_custkey), 3)").as("oob_idx"))
      .orderBy("o_orderkey")

  /** Spark 4 VARIANT path [N]: semi-structured props parse ONCE into
    * the binary variant encoding, then typed `variant_get` access —
    * at scale this replaces per-access JSON string re-parsing
    * (`get_json_object` re-tokenizes the string on every extraction;
    * variant decodes once per row and serves every field from the
    * binary form). `try_variant_get` on a missing path types to null
    * instead of erroring; aggregates run on the extracted exact ints. */
  private def fnVariant(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), expr("parse_json(props)").as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'int')").as("k"),
        expr("try_variant_get(v, '$.missing', 'int')").as("miss"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        count(col("miss")).as("n_missing"))
      .orderBy("event_type")

  private def fnJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k"),
      to_json(struct(col("event_id"), col("event_type"))).as("rec"))
      .orderBy("event_id")

  /** Array/map + higher-order functions (`fetch_data.py:295,319,180-189`):
    * size, element access, HOF aggregate (sequential double accumulation),
    * sort+slice carried through as a real array column. */
  private def fnArrayMap(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"),
      size(col("embedding")).as("n_dims"),
      bround(element_at(col("embedding"), 1).cast("double"), 6).as("first_elem"),
      bround(aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x.cast("double")), 4)
        .as("sum_elems"),
      array_join(
        transform(slice(sort_array(col("embedding"), asc = false), 1, 3),
          x => floor(x.cast("double") * 1e6).cast("long").cast("string")),
        ",").as("top3"))
      .orderBy("vec_id")

  /** Bitwise battery [N] (§H completeness — the one scalar family the
    * earlier rounds skipped): AND/OR/XOR masks, shifts, and popcount
    * over the integer keys. All pure integer ops — bit-identical across
    * engines by construction. */
  private def fnBitwise(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      col("o_orderkey").bitwiseAND(lit(255L)).as("band"),
      col("o_orderkey").bitwiseOR(col("o_custkey")).as("bor"),
      col("o_orderkey").bitwiseXOR(col("o_custkey")).as("bxor"),
      shiftleft(col("o_orderkey"), 2).as("shl"),
      shiftright(col("o_orderkey"), 3).as("shr"),
      bit_count(col("o_orderkey")).as("pop"))
      .orderBy("o_orderkey")

  /** Regexp battery (§H completeness, r7): extract-all, global replace,
    * count, rlike — the text-wrangling calls every ETL leans on. All
    * codegen'd built-ins; DuckDB mirrors with regexp_extract_all /
    * regexp_replace(.., 'g') / regexp_matches (its regexp_replace is
    * FIRST-occurrence unless the 'g' flag is passed — the classic
    * cross-engine trap, mirrored explicitly). */
  private def fnRegexp(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      array_join(expr("regexp_extract_all(p_name, '[a-z]+', 0)"), "|")
        .as("words"),
      regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
      expr("regexp_count(p_name, '[aeiou]')").cast("int").as("n_vowels"),
      col("p_name").rlike("^(red|blue)").as("is_color"),
      regexp_extract(col("p_type"), "^(.)", 1).as("type_initial"))
      .orderBy("p_partkey")

  /** Map-typed column battery (§H completeness, r7): build a map from
    * delimited text (`str_to_map`), then element access, cardinality,
    * sorted key/value projections, `map_concat` and `transform_values`
    * — maps survive end-to-end in Spark; the oracle mirrors the VALUE
    * semantics with plain string ops (DuckDB's MAP type needn't appear
    * for the outputs to be comparable). */
  private def fnMapOps(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        expr("str_to_map(concat('priority:', o_orderpriority, " +
          "',status:', o_orderstatus), ',', ':')").as("m"))
      .select(
        col("o_orderkey"),
        element_at(col("m"), "priority").as("priority"),
        size(col("m")).as("n_entries"),
        array_join(array_sort(map_keys(col("m"))), "|").as("keys_sorted"),
        element_at(expr("transform_values(m, (k, v) -> upper(v))"), "status")
          .as("status_upper"),
        element_at(expr("map_concat(m, map('src', 'etl'))"), "src").as("src"))
      .orderBy("o_orderkey")

  /** Table-generator battery [N] (§H completeness round 3): the four
    * row-producing generator shapes — `posexplode` (element + ordinal),
    * `stack` (wide→long reshaping without a join), `inline` (array-of-
    * struct flattening), and `explode_outer` (the null-preserving
    * variant, where an empty array must still yield its parent row).
    * One generator per select as Catalyst requires; the four legs union
    * by name. Generators run inside the scan projection — no shuffle,
    * no join, output rows ≈ Σ array sizes, linear at any scale. */
  private def fnGenerators(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
    val ws = split(col("p_name"), " ")
    val words = p
      .select(col("p_partkey"), posexplode(ws))
      .select(col("p_partkey"), lit("word").as("src"), col("pos"),
        col("col").as("val"))
    val attrs = p.selectExpr("p_partkey", "'attr' AS src",
      "stack(2, 0, p_brand, 1, p_type) AS (pos, val)")
    val inlined = p
      .select(col("p_partkey"), lit("inline").as("src"),
        expr("inline(array(struct(0 AS pos, p_type AS val), " +
          "struct(1 AS pos, CAST(p_size AS STRING) AS val)))"))
      .select(col("p_partkey"), col("src"), col("pos"), col("val"))
    val outer = p
      .select(col("p_partkey"), lit("outer").as("src"),
        lit(-1).as("pos"),
        explode_outer(filter(ws, w => length(w) === 4)).as("val"))
    words.unionByName(attrs).unionByName(inlined).unionByName(outer)
      .orderBy(col("p_partkey"), col("src"), col("pos"),
        col("val").asc_nulls_first)
  }

  /** URL scalar battery [N]: `parse_url` component extraction and the
    * form-encode/decode pair. The URL is CONSTRUCTED from table columns,
    * so the oracle can state each expected component directly from the
    * same construction — the check is that Spark's parser gives back
    * exactly what was built (and that encode is an exact inverse of
    * decode). Pure per-row string work, codegen'd, no shuffle. */
  private def fnUrl(s: SparkSession, d: String): DataFrame = {
    val url = concat(lit("https://"), lower(col("c_mktsegment")),
      lit(".example.com/cust/"), col("c_custkey"),
      lit("?ref="), col("c_nationkey"), lit("&utm_source=x"))
    Tables.customer(s, d).select(
      col("c_custkey"),
      parse_url(url, lit("HOST")).as("host"),
      parse_url(url, lit("PATH")).as("path"),
      parse_url(url, lit("QUERY"), lit("ref")).as("ref_param"),
      url_encode(col("c_name")).as("enc"),
      (url_decode(url_encode(col("c_name"))) === col("c_name"))
        .as("roundtrip"))
      .orderBy("c_custkey")
  }

  /** XML battery [N] — Spark 4 ships the XML data source and
    * `from_xml`/`xpath_*` in core (the former spark-xml package,
    * SPARK-44265). The document is CONSTRUCTED from customer columns
    * (numerics stringified via decimal, never double, so both engines
    * agree on the text), parsed back with a typed `from_xml` schema,
    * and cross-checked by the Hive-style xpath extractors; the oracle
    * restates every output straight from the base columns, so any
    * parse/extract defect hash-fails. */
  private def fnXml(s: SparkSession, d: String): DataFrame = {
    val xml = concat(
      lit("<cust><name>"), col("c_name"),
      lit("</name><bal>"), col("c_acctbal").cast("decimal(12,2)"),
      lit("</bal><nation>"), col("c_nationkey"),
      lit("</nation></cust>"))
    Tables.customer(s, d)
      .select(col("c_custkey"), xml.as("xml"))
      .select(
        col("c_custkey"),
        expr("from_xml(xml, 'name STRING, bal DECIMAL(12,2), nation INT')")
          .as("p"),
        expr("xpath_string(xml, '/cust/name')").as("xp_name"),
        expr("xpath_int(xml, '/cust/nation')").as("xp_nation"))
      .select(col("c_custkey"), col("p.name").as("name"),
        // decimals stay internal (XML text + typed parse); the output
        // boundary is double, per the repo-wide no-DecimalType convention
        col("p.bal").cast("double").as("bal"), col("p.nation").as("nation"),
        col("xp_name"), col("xp_nation"))
      .orderBy("c_custkey")
  }

  /** Collation-aware comparison [N] — Spark 4.0 collations
    * (SPARK-46830): a case-INSENSITIVE equi-join via `UTF8_LCASE`
    * without rewriting either side through `lower()`. The fact side
    * carries deliberately mixed-case labels (parity-cased from the
    * key), the dim side Title-case; the collated comparison is still a
    * plain hash-join key (collation folds into the join key's binary
    * representation — no nested loop, no expression wrapper blocking
    * pushdown). The oracle lowers both sides explicitly; hash equality
    * proves the collation semantics. Output restates only
    * deterministic casings (the collated key itself keeps an arbitrary
    * representative, so it never leaves the join). */
  private def fnCollation(s: SparkSession, d: String): DataFrame = {
    val mixed = Tables.customer(s, d).select(col("c_custkey"),
      when(pmod(col("c_custkey"), lit(2)) === 0, upper(col("c_mktsegment")))
        .otherwise(lower(col("c_mktsegment"))).as("seg_mixed"))
    val dim = Tables.customer(s, d)
      .select(initcap(lower(col("c_mktsegment"))).as("seg_dim")).distinct()
    mixed.join(dim,
        expr("collate(seg_mixed, 'UTF8_LCASE')") ===
          expr("collate(seg_dim, 'UTF8_LCASE')"))
      .select(col("c_custkey"), col("seg_mixed"), col("seg_dim"))
      .orderBy("c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_collation" -> fnCollation,
    "fn_generators" -> fnGenerators,
    "fn_url" -> fnUrl,
    "fn_xml" -> fnXml,
    "fn_regexp" -> fnRegexp,
    "fn_map_ops" -> fnMapOps,
    "fn_datetime_extra" -> fnDatetimeExtra,
    "fn_array_extra" -> fnArrayExtra,
    "fn_string_extra" -> fnStringExtra,
    "fn_try_errors" -> fnTryErrors,
    "fn_variant" -> fnVariant,
    "fn_bitwise" -> fnBitwise,
    "fn_string" -> fnString,
    "fn_math" -> fnMath,
    "fn_date" -> fnDate,
    "fn_json" -> fnJson,
    "fn_array_map" -> fnArrayMap)

  val oracles: Map[String, String] = Map(
    // parallel unnests zip in DuckDB (pos list + word list); stack and
    // inline are UNION ALL; the outer leg's empty-array null row is an
    // explicit WHERE len = 0 branch. Spark ASC sorts NULLS FIRST.
    "fn_generators" ->
      """WITH t AS (
        |  SELECT p_partkey, string_split(p_name, ' ') AS ws,
        |         p_brand, p_type, p_size
        |  FROM part),
        |w AS (
        |  SELECT p_partkey, 'word' AS src,
        |         CAST(unnest(range(len(ws))) AS INTEGER) AS pos,
        |         unnest(ws) AS val
        |  FROM t),
        |a AS (
        |  SELECT p_partkey, 'attr' AS src, 0 AS pos, p_brand AS val FROM t
        |  UNION ALL
        |  SELECT p_partkey, 'attr', 1, p_type FROM t),
        |i AS (
        |  SELECT p_partkey, 'inline' AS src, 0 AS pos, p_type AS val FROM t
        |  UNION ALL
        |  SELECT p_partkey, 'inline', 1, CAST(p_size AS VARCHAR) FROM t),
        |o AS (
        |  SELECT p_partkey, 'outer' AS src, CAST(-1 AS INTEGER) AS pos,
        |         unnest(list_filter(ws, x -> len(x) = 4)) AS val
        |  FROM t WHERE len(list_filter(ws, x -> len(x) = 4)) > 0
        |  UNION ALL
        |  SELECT p_partkey, 'outer', -1, NULL
        |  FROM t WHERE len(list_filter(ws, x -> len(x) = 4)) = 0)
        |SELECT * FROM (
        |  SELECT * FROM w UNION ALL SELECT * FROM a
        |  UNION ALL SELECT * FROM i UNION ALL SELECT * FROM o)
        |ORDER BY p_partkey, src, pos, val NULLS FIRST""".stripMargin,
    // components restated from the construction; c_name's only
    // non-form-safe byte is '#' (→ %23)
    "fn_collation" ->
      """WITH m AS (
        |  SELECT c_custkey,
        |         CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
        |              ELSE lower(c_mktsegment) END AS seg_mixed
        |  FROM customer),
        |dim AS (
        |  SELECT DISTINCT upper(substr(c_mktsegment, 1, 1))
        |           || lower(substr(c_mktsegment, 2)) AS seg_dim
        |  FROM customer)
        |SELECT c_custkey, seg_mixed, seg_dim
        |FROM m JOIN dim ON lower(seg_mixed) = lower(seg_dim)
        |ORDER BY c_custkey""".stripMargin,
    "fn_xml" ->
      """SELECT c_custkey,
        |       c_name AS name,
        |       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal,
        |       CAST(c_nationkey AS INTEGER) AS nation,
        |       c_name AS xp_name,
        |       CAST(c_nationkey AS INTEGER) AS xp_nation
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_url" ->
      """SELECT c_custkey,
        |       lower(c_mktsegment) || '.example.com' AS host,
        |       '/cust/' || c_custkey AS path,
        |       CAST(c_nationkey AS VARCHAR) AS ref_param,
        |       replace(replace(c_name, '#', '%23'), ' ', '+') AS enc,
        |       true AS roundtrip
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_array_extra" ->
      """WITH t AS (
        |  SELECT p_partkey, p_name, string_split(p_name, ' ') AS ws,
        |         ['red', 'green', 'blue'] AS c
        |  FROM part)
        |SELECT p_partkey,
        |       CAST(coalesce(list_position(ws, 'widget'), 0) AS BIGINT)
        |         AS pos_widget,
        |       CAST(len(flatten([ws, c])) AS INTEGER) AS n_flat,
        |       coalesce(array_to_string(list_sort(list_distinct(
        |         list_intersect(ws, c))), '|'), '') AS inter,
        |       coalesce(array_to_string(list_sort(list_distinct(
        |         list_filter(ws, x -> NOT list_contains(c, x)))), '|'), '')
        |         AS except_c,
        |       coalesce(array_to_string(list_sort(list_distinct(
        |         list_concat(ws, c))), '|'), '') AS union_c,
        |       substr(p_name, 1, 3) || '|' || substr(p_name, 1, 3) AS rep,
        |       list_aggregate(ws, 'max') AS max_word
        |FROM t ORDER BY p_partkey""".stripMargin,
    "fn_datetime_extra" ->
      """SELECT o_orderkey,
        |       CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
        |       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start,
        |       CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
        |       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
        |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |       CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS plus_q
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_regexp" ->
      """SELECT p_partkey,
        |       array_to_string(regexp_extract_all(p_name, '[a-z]+', 0), '|')
        |         AS words,
        |       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |       CAST(len(regexp_extract_all(p_name, '[aeiou]', 0)) AS INTEGER)
        |         AS n_vowels,
        |       regexp_matches(p_name, '^(red|blue)') AS is_color,
        |       regexp_extract(p_type, '^(.)', 1) AS type_initial
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_map_ops" ->
      """SELECT o_orderkey,
        |       o_orderpriority AS priority,
        |       2 AS n_entries,
        |       'priority|status' AS keys_sorted,
        |       upper(o_orderstatus) AS status_upper,
        |       'etl' AS src
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_string_extra" ->
      """SELECT p_partkey,
        |       lpad(p_name, 16, '*') AS padded,
        |       rpad(p_brand, 10, '.') AS rpadded,
        |       translate(p_name, 'aeiou', 'AEIOU') AS xlated,
        |       repeat(substring(p_name, 1, 3), 2) AS rep,
        |       reverse(p_name) AS rev,
        |       CAST(levenshtein(p_name, reverse(p_name)) AS INTEGER)
        |         AS lev_rev
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_try_errors" ->
      """SELECT o_orderkey,
        |       o_totalprice / nullif(o_custkey % 3, 0) AS safe_div,
        |       TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
        |       CASE WHEN o_orderkey > 7 THEN NULL
        |            ELSE o_orderkey + 9223372036854775800 END AS near_overflow,
        |       CAST(NULL AS BIGINT) AS oob_idx
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_variant" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER))
        |            AS BIGINT) AS sum_k,
        |       count(CASE WHEN json_extract(props, '$.missing')
        |                  IS NOT NULL THEN 1 END) AS n_missing
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "fn_bitwise" ->
      """SELECT o_orderkey,
        |       o_orderkey & 255 AS band,
        |       o_orderkey | o_custkey AS bor,
        |       xor(o_orderkey, o_custkey) AS bxor,
        |       o_orderkey << 2 AS shl,
        |       o_orderkey >> 3 AS shr,
        |       CAST(bit_count(o_orderkey) AS INTEGER) AS pop
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_string" ->
      """SELECT p_partkey,
        |       upper(trim(p_name)) AS up,
        |       CAST(length(p_name) AS INTEGER) AS n_chars,
        |       CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
        |       p_brand || '/' || p_type AS path,
        |       substring(p_name, 1, 4) AS prefix,
        |       CAST(position('widget' IN p_name) AS INTEGER) AS widget_at,
        |       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |       abs(-l_quantity) AS abs_qty,
        |       round_even(sqrt(l_extendedprice), 6) AS root,
        |       round_even(ln(l_extendedprice), 6) AS nat_log,
        |       round_even(pow(l_discount + 1, 3), 6) AS cubed,
        |       least(l_tax, l_discount) AS lo,
        |       greatest(l_tax, l_discount) AS hi
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_suppkey, l_partkey, l_quantity, l_extendedprice""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        |       date_trunc('month', o_orderdate) AS month_start,
        |       CAST(year(o_orderdate) AS INTEGER) AS yr,
        |       CAST(month(o_orderdate) AS INTEGER) AS mo,
        |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS days_to_98,
        |       CAST(o_orderdate AS DATE) + 30 AS plus30,
        |       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |       strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS iso
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |       CAST(json_extract(props, '$.k') AS INTEGER) AS k,
        |       to_json({'event_id': event_id, 'event_type': event_type}) AS rec
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_array_map" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS INTEGER) AS n_dims,
        |       round_even(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
        |       round_even((SELECT sum(CAST(u.x AS DOUBLE)) FROM unnest(embedding) u(x)), 4) AS sum_elems,
        |       array_to_string(list_transform((list_sort(embedding, 'DESC'))[1:3],
        |         x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)), ',') AS top3
        |FROM embeddings ORDER BY vec_id""".stripMargin)
}
