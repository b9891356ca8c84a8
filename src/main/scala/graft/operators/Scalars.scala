package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY.md §2h — scalar functions (string / date / math / array / json).
  *
  * Each R-tier row cites the plain-Java code it re-expresses; everything is
  * built from `org.apache.spark.sql.functions._` so it stays inside
  * whole-stage codegen (the reference does all of this row-at-a-time on the
  * driver — `Creator:226-234`, `TimeEx:129-141`).
  */
object Scalars {

  /** epoch-millis → UTC year/month/day/hour parts (`Creator:226-234`,
    * `Debug:135-141`); here from the TimestampType edge per SURVEY §7.3(4). */
  def fnEpochToParts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir).filter($"event_id" < 2000)
      .select($"event_id",
        unix_millis($"ts").as("epoch_ms"),
        year($"ts").cast("long").as("year"),
        month($"ts").cast("long").as("month"),
        dayofmonth($"ts").cast("long").as("day"),
        hour($"ts").cast("long").as("hour"),
        minute($"ts").cast("long").as("minute"))
      .orderBy($"event_id")
  }

  /** Truncate to day/hour/week buckets — the `(ts / 86400000) * 86400000`
    * integer math of `TimeEx:129-141` as date_trunc. */
  def fnTimeTrunc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(
        date_trunc("week", $"ts").as("week"),
        date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n"),
        countDistinct(date_trunc("hour", $"ts")).as("n_hours"))
      .orderBy($"week", $"day")
  }

  /** Wall-clock partition values (`Bulk:162-176`, `KMS:195-200`),
    * determinized: the timestamp is a literal parameter (SURVEY §7.3). */
  def fnTimePartsLiteral(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir).limit(1)   // one-row carrier
      .select(lit("2024-01-15 10:30:45").cast("timestamp").as("t"))
      .select(
        year($"t").cast("long").as("year"),
        month($"t").cast("long").as("month"),
        dayofmonth($"t").cast("long").as("day"),
        hour($"t").cast("long").as("hour"))
  }

  /** `fn_current_time_parts` — the reference's wall-clock → partition
    * derivation, end to end: `LocalDateTime.now(UTC)` split into
    * year/month/day/hour (`Bulk:162-176`; `Calendar.getInstance(UTC)` at
    * `KMS:195-200`) and formatted into the partition path
    * (`KMS:203-204`). Determinized per SURVEY §7.3: "now" is a literal
    * timestamp parameter so the oracle can replay it — a leap-day edge
    * on purpose. */
  def fnCurrentTimeParts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir).limit(1)   // one-row carrier
      .select(lit("2024-02-29 23:05:09").cast("timestamp").as("now"))
      .select(
        year($"now").cast("long").as("year"),
        month($"now").cast("long").as("month"),
        dayofmonth($"now").cast("long").as("day"),
        hour($"now").cast("long").as("hour"),
        format_string(
          "tenants=%s/year=%04d/month=%02d/day=%02d/hour=%02d",
          lit("acme"), year($"now"), month($"now"), dayofmonth($"now"),
          hour($"now")).as("partition_path"))
  }

  /** `fn_uuid_filename` — the reference's data-file naming
    * `"data-" + UUID.randomUUID() + ".parquet"` (`Local:95`, `Bulk:151`,
    * `Creator:409`), determinized per SURVEY §7.3 like `fn_rand_int`
    * (seeded) and `fn_time_parts_literal` (literal param): the UUID is
    * name-based — MD5 of the file's partition key with RFC 4122
    * version-3/variant bits set — so the oracle replays it. At scale
    * content-keyed names are what you want anyway: retried task commits
    * collide on the same name instead of leaking orphan files. */
  def fnUuidFilename(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir).filter($"event_id" < 500)
      .withColumn("hx",
        md5(concat(lit("graft-file:"), $"event_id".cast("string"))))
      // RFC 4122 bits on the 32-char hex: version nibble (13th) = '3';
      // variant nibble (17th) = (d & 3) | 8 ≡ substr('89ab', d%4 + 1, 1)
      .withColumn("uuid", expr(
        """concat_ws('-',
          |  substring(hx, 1, 8), substring(hx, 9, 4),
          |  concat('3', substring(hx, 14, 3)),
          |  concat(substring('89ab',
          |    ((locate(substring(hx, 17, 1), '0123456789abcdef') - 1) % 4)
          |      + 1, 1), substring(hx, 18, 3)),
          |  substring(hx, 21, 12))""".stripMargin))
      .select($"event_id",
        concat(lit("data-"), $"uuid", lit(".parquet")).as("filename"))
      .orderBy($"event_id")
  }

  /** Hive-style partition path formatting (`KMS:203-204` String.format). */
  def fnStringFmt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir).filter($"event_id" < 1000)
      .select($"event_id",
        format_string("tenant=%d/year=%04d/month=%02d/day=%02d/hour=%02d",
          $"user_id", year($"ts"), month($"ts"), dayofmonth($"ts"),
          hour($"ts")).as("partition_path"),
        concat_ws("-", $"event_type", $"user_id".cast("string"))
          .as("tagged"))
      .orderBy($"event_id")
  }

  /** Case handling + suffix filter (`Bulk:72` lower().endsWith(".parquet")). */
  def fnStrCase(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .filter(lower($"p_type").endsWith("dard") || lower($"p_type") === "promo")
      .select($"p_partkey", lower($"p_name").as("name_lc"),
        upper($"p_brand").as("brand_uc"),
        substring($"p_type", 1, 5).as("type_prefix"),
        length($"p_name").cast("long").as("name_len"))
      .orderBy($"p_partkey")
  }

  /** Null-safe stringify (`Hidden:217-220` val==null?null:toString) via
    * cast + nullif/coalesce. */
  def fnNullSafeCast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir).filter($"c_custkey" < 1000)
      .select($"c_custkey",
        $"c_nationkey".cast("string").as("nation_str"),
        nullif($"c_mktsegment", lit("BUILDING")).as("seg_or_null"),
        coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("(none)"))
          .as("seg_filled"))
      .orderBy($"c_custkey")
  }

  /** JSON extraction from the `props` column (X-tier; motivates
    * `get_json_object` — SURVEY §2h note). */
  def fnJsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir).filter($"event_id" < 2000)
      .select($"event_id",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .orderBy($"event_id")
  }

  /** `fn_url_parse` — URL decomposition into scheme/domain/path/query,
    * the reference's `cs_url → cs_scheme/cs_domain/cs_path/cs_query`
    * field family (`AIGEventsSchemaValidator.java` url fields; the
    * generator emits the same split). URLs are synthesized
    * deterministically from the doc row, then taken apart with the
    * codegen'd `parse_url` kernel — per-row expressions only. */
  def fnUrlParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val url = concat(lit("https://"), $"source", lit(".example.com/d/"),
      $"doc_id", lit("?lang="), $"lang", lit("&v=2"))
    Tables.documents(spark, dir)
      .select($"doc_id", url.as("cs_url"))
      .select($"doc_id", $"cs_url",
        parse_url($"cs_url", lit("PROTOCOL")).as("cs_scheme"),
        parse_url($"cs_url", lit("HOST")).as("cs_domain"),
        parse_url($"cs_url", lit("PATH")).as("cs_path"),
        parse_url($"cs_url", lit("QUERY")).as("cs_query"),
        parse_url($"cs_url", lit("QUERY"), lit("lang")).as("q_lang"))
      .orderBy($"doc_id")
  }

  /** Cyclic round-robin assignment (`Creator:219-243` `i % N` over provider/
    * model arrays) — pmod + element_at. */
  def fnModCycle(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val providers = array(AiProviders.map(lit): _*)
    val models = array(AiModels.map(lit): _*)
    Tables.events(spark, dir).filter($"event_id" < 1000)
      .select($"event_id",
        element_at(providers, (pmod($"event_id", lit(5)) + 1).cast("int"))
          .as("ai_provider_id"),
        element_at(models, (pmod($"event_id" * 3 + 1, lit(5)) + 1).cast("int"))
          .as("cs_model"),
        pmod($"event_id" * MixConst + 12345L, lit(1000L)).as("prng"))
      .orderBy($"event_id")
  }

  /** `fn_rand_int` — seeded random ints in [50, 5000)
    * (`Creator:244-248` ThreadLocalRandom.nextInt(50, 5000)). rand(seed)
    * is deterministic per seed but its stream is engine-specific, so the
    * oracle checks the distribution contract — count, range bounds, coarse
    * mean — not the stream values (SURVEY §7.3 determinism note). */
  def fnRandInt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.range(10000)
      .select((lit(50) + floor(rand(42) * 4950)).cast("int").as("v"))
      .agg(count(lit(1)).as("n"),
        (min($"v") >= 50 && max($"v") < 5000).as("in_range"),
        avg($"v").between(2300, 2750).as("mean_centered"))
  }

  /** Exact math scalars: abs/ceil/floor/sign/mod/greatest/least. */
  def fnMath(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir).filter($"c_custkey" < 1000)
      .select($"c_custkey",
        abs(dec($"c_acctbal")).cast("double").as("abs_bal"),
        ceil($"c_acctbal").as("ceil_bal"),
        floor($"c_acctbal").as("floor_bal"),
        signum($"c_acctbal").cast("long").as("sign_bal"),
        pmod($"c_custkey", lit(7L)).as("mod7"),
        greatest($"c_custkey", $"c_nationkey".cast("long")).as("gr"),
        least($"c_custkey", $"c_nationkey".cast("long")).as("le"))
      .orderBy($"c_custkey")
  }

  /** Array build + explode of words (UDTF shape, `explode` = built-in
    * Generator; list<struct> model at `Validator:97-131`). */
  def explodeArray(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).filter($"doc_id" < 100)
      .select($"doc_id", explode(split($"text", " ")).as("word"))
      .filter($"word" =!= "")
      .orderBy($"doc_id", $"word")
  }

  /** Array / map / JSON collection functions (X-tier additions per SURVEY
    * §2h note): array_contains, slice, array_sort/distinct, map build +
    * lookup, from_json/to_json round-trip. Array outputs are stringified
    * so the DuckDB hash compare stays scalar. */
  def fnCollections(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = array_remove(split($"text", " "), "")
    Tables.documents(spark, dir).filter($"doc_id" < 200)
      .select($"doc_id",
        array_contains(words, "data").as("has_data"),
        concat_ws("|", slice(words, 1, 3)).as("first3"),
        concat_ws("|", slice(array_sort(array_distinct(words)), 1, 5))
          .as("sorted_uniq5"),
        size(array_distinct(words)).cast("long").as("n_uniq"),
        element_at(
          map(lit("lang"), $"lang", lit("source"), $"source"), "lang")
          .as("map_lang"))
      .orderBy($"doc_id")
  }

  /** from_json / to_json round-trip over the events props column. */
  def fnJsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir).filter($"event_id" < 1000)
      .select($"event_id",
        from_json($"props", lit("k LONG")).getField("k").as("k_parsed"),
        to_json(struct($"event_id", $"event_type")).as("j"))
      .orderBy($"event_id")
  }

  /** regexp_extract with a capture group + split + element access. */
  def fnRegexpExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey",
        regexp_extract($"p_brand", "Brand#(\\d+)", 1).cast("long")
          .as("brand_num"),
        element_at(split($"p_name", " "), 1).as("first_word"),
        size(split($"p_name", " ")).cast("long").as("n_words"))
      .orderBy($"p_partkey")
  }

  /** Date/interval arithmetic: shifts, day diffs, month truncation. */
  def fnDateArith(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir).filter($"o_orderkey" < 2000)
      .select($"o_orderkey", $"o_orderdate",
        ($"o_orderdate" + expr("INTERVAL 30 DAYS")).as("due_date"),
        datediff(lit("2002-01-01").cast("date"),
          $"o_orderdate".cast("date")).cast("long").as("age_days"),
        date_trunc("month", $"o_orderdate").as("order_month"),
        last_day($"o_orderdate".cast("date")).as("month_end"))
      .orderBy($"o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_date_arith" -> (fnDateArith _),
    "fn_regexp_extract" -> (fnRegexpExtract _),
    "fn_collections" -> (fnCollections _),
    "fn_json_roundtrip" -> (fnJsonRoundtrip _),
    "fn_epoch_to_parts" -> (fnEpochToParts _),
    "fn_time_trunc" -> (fnTimeTrunc _),
    "fn_time_parts_literal" -> (fnTimePartsLiteral _),
    "fn_current_time_parts" -> (fnCurrentTimeParts _),
    "fn_uuid_filename" -> (fnUuidFilename _),
    "fn_string_fmt" -> (fnStringFmt _),
    "fn_str_case" -> (fnStrCase _),
    "fn_null_safe_cast" -> (fnNullSafeCast _),
    "fn_json_extract" -> (fnJsonExtract _),
    "fn_mod_cycle" -> (fnModCycle _),
    "fn_rand_int" -> (fnRandInt _),
    "fn_math" -> (fnMath _),
    "fn_url_parse" -> (fnUrlParse _),
    "explode_array" -> (explodeArray _))

  val oracles: Map[String, String] = Map(
    "fn_url_parse" ->
      """WITH u AS (SELECT doc_id,
        |  'https://' || source || '.example.com/d/' || doc_id ||
        |  '?lang=' || lang || '&v=2' AS cs_url FROM documents)
        |SELECT doc_id, cs_url,
        |  'https' AS cs_scheme,
        |  regexp_extract(cs_url, 'https://([^/]+)/', 1) AS cs_domain,
        |  regexp_extract(cs_url, 'https://[^/]+(/[^?]*)', 1) AS cs_path,
        |  regexp_extract(cs_url, '\?(.*)$', 1) AS cs_query,
        |  regexp_extract(cs_url, '[?&]lang=([^&]*)', 1) AS q_lang
        |FROM u ORDER BY doc_id""".stripMargin,
    "fn_rand_int" ->
      """SELECT CAST(10000 AS BIGINT) AS n, true AS in_range,
        |  true AS mean_centered""".stripMargin,
    "fn_date_arith" ->
      """SELECT o_orderkey, o_orderdate,
        |  o_orderdate + INTERVAL 30 DAY AS due_date,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
        |    AS age_days,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
        |    AS order_month,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin,
    "fn_regexp_extract" ->
      """SELECT p_partkey,
        |  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT)
        |    AS brand_num,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  len(string_split(p_name, ' ')) AS n_words
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_collections" ->
      """SELECT doc_id,
        |  list_contains(list_filter(string_split(text, ' '), t -> t <> ''),
        |    'data') AS has_data,
        |  array_to_string(list_filter(string_split(text, ' '),
        |    t -> t <> '')[1:3], '|') AS first3,
        |  array_to_string(list_sort(list_distinct(list_filter(
        |    string_split(text, ' '), t -> t <> '')))[1:5], '|')
        |    AS sorted_uniq5,
        |  len(list_distinct(list_filter(string_split(text, ' '),
        |    t -> t <> ''))) AS n_uniq,
        |  lang AS map_lang
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,
    "fn_json_roundtrip" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_parsed,
        |  '{"event_id":' || event_id || ',"event_type":"' || event_type
        |    || '"}' AS j
        |FROM events WHERE event_id < 1000 ORDER BY event_id""".stripMargin,
    "fn_epoch_to_parts" ->
      """SELECT event_id, epoch_us(ts) // 1000 AS epoch_ms,
        |  year(ts) AS year, month(ts) AS month, day(ts) AS day,
        |  hour(ts) AS hour, minute(ts) AS minute
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin,
    "fn_time_trunc" ->
      """SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
        |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n,
        |  COUNT(DISTINCT date_trunc('hour', ts)) AS n_hours
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "fn_time_parts_literal" ->
      """SELECT CAST(2024 AS BIGINT) AS year, CAST(1 AS BIGINT) AS month,
        |  CAST(15 AS BIGINT) AS day, CAST(10 AS BIGINT) AS hour""".stripMargin,
    "fn_uuid_filename" ->
      """WITH h AS (
        |  SELECT event_id,
        |    md5('graft-file:' || CAST(event_id AS VARCHAR)) AS hx
        |  FROM events WHERE event_id < 500)
        |SELECT event_id,
        |  'data-' ||
        |  substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-' ||
        |  '3' || substr(hx, 14, 3) || '-' ||
        |  substr('89ab',
        |    ((strpos('0123456789abcdef', substr(hx, 17, 1)) - 1) % 4) + 1,
        |    1) || substr(hx, 18, 3) || '-' ||
        |  substr(hx, 21, 12) ||
        |  '.parquet' AS filename
        |FROM h ORDER BY event_id""".stripMargin,
    "fn_current_time_parts" ->
      """WITH t AS (SELECT TIMESTAMP '2024-02-29 23:05:09' AS now)
        |SELECT CAST(year(now) AS BIGINT) AS year,
        |  CAST(month(now) AS BIGINT) AS month,
        |  CAST(day(now) AS BIGINT) AS day,
        |  CAST(hour(now) AS BIGINT) AS hour,
        |  printf('tenants=%s/year=%04d/month=%02d/day=%02d/hour=%02d',
        |    'acme', year(now), month(now), day(now), hour(now))
        |    AS partition_path
        |FROM t""".stripMargin,
    "fn_string_fmt" ->
      """SELECT event_id,
        |  printf('tenant=%d/year=%04d/month=%02d/day=%02d/hour=%02d',
        |    user_id, year(ts), month(ts), day(ts), hour(ts))
        |    AS partition_path,
        |  event_type || '-' || CAST(user_id AS VARCHAR) AS tagged
        |FROM events WHERE event_id < 1000 ORDER BY event_id""".stripMargin,
    "fn_str_case" ->
      """SELECT p_partkey, lower(p_name) AS name_lc, upper(p_brand) AS brand_uc,
        |  substr(p_type, 1, 5) AS type_prefix, length(p_name) AS name_len
        |FROM part
        |WHERE lower(p_type) LIKE '%dard' OR lower(p_type) = 'promo'
        |ORDER BY p_partkey""".stripMargin,
    "fn_null_safe_cast" ->
      """SELECT c_custkey, CAST(c_nationkey AS VARCHAR) AS nation_str,
        |  NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(none)') AS seg_filled
        |FROM customer WHERE c_custkey < 1000 ORDER BY c_custkey""".stripMargin,
    "fn_json_extract" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin,
    "fn_mod_cycle" ->
      s"""SELECT event_id,
        |  ${sqlList(AiProviders)}
        |    [CAST(event_id % 5 AS INT) + 1] AS ai_provider_id,
        |  ${sqlList(AiModels)}
        |    [CAST((event_id * 3 + 1) % 5 AS INT) + 1] AS cs_model,
        |  (event_id * $MixConst + 12345) % 1000 AS prng
        |FROM events WHERE event_id < 1000 ORDER BY event_id""".stripMargin,
    "fn_math" ->
      """SELECT c_custkey,
        |  CAST(abs(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS abs_bal,
        |  CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
        |  CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
        |  CAST(sign(c_acctbal) AS BIGINT) AS sign_bal,
        |  c_custkey % 7 AS mod7,
        |  greatest(c_custkey, CAST(c_nationkey AS BIGINT)) AS gr,
        |  least(c_custkey, CAST(c_nationkey AS BIGINT)) AS le
        |FROM customer WHERE c_custkey < 1000 ORDER BY c_custkey""".stripMargin,
    "explode_array" ->
      """SELECT doc_id, u.word FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents WHERE doc_id < 100
        |) u WHERE word <> '' ORDER BY doc_id, word""".stripMargin)
}
