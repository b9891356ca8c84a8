package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2k — synthetic AIG-event generation, schema validation and
  * DDL emission (port of `aig/AIGEventsTableCreator.java:209-352` +
  * `aig/AIGEventsSchemaValidator.java`).
  *
  * Determinism deltas per FIXTURES.md §B: wall-clock → fixed literal base
  * timestamp; ThreadLocalRandom → pure arithmetic (hash-mix) on the row
  * index; UUIDs → counters. Generation is `spark.range(N)` + expressions —
  * fully distributed and codegen'd, no driver-side record lists (the
  * reference materializes all records in heap at `Creator:209-214`).
  */
object GenOps {

  /** AIG events schema — the queried core of the 73-field schema at
    * `Validator:61-146`; required fields NOT NULL per `Validator:65-68`. */
  val aigSchema: StructType = StructType(Seq(
    StructField("transaction_id", IntegerType, nullable = true),
    StructField("tenant_id", IntegerType, nullable = false),
    StructField("home_pop", StringType, nullable = false),
    StructField("service_id", StringType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("type", StringType, nullable = true),
    StructField("ai_provider_id", StringType, nullable = true),
    StructField("cs_model", StringType, nullable = true),
    StructField("rs_status", IntegerType, nullable = true),
    StructField("rs_response_time", IntegerType, nullable = true),
    StructField("usage_total", IntegerType, nullable = true),
    StructField("usage_input", IntegerType, nullable = true),
    StructField("usage_output", IntegerType, nullable = true),
    StructField("action", StringType, nullable = true),
    StructField("activity", StringType, nullable = true),
    StructField("policy", ArrayType(StructType(Seq(
      StructField("type", StringType, nullable = true),
      StructField("name", StringType, nullable = true),
      StructField("action", StringType, nullable = true),
      StructField("profile", ArrayType(StringType), nullable = true),
      StructField("object_id", IntegerType, nullable = true)))),
      nullable = true),
    StructField("ratelimit", ArrayType(StringType), nullable = true),
    StructField("tenant", IntegerType, nullable = true),
    StructField("year", IntegerType, nullable = true),
    StructField("month", IntegerType, nullable = true),
    StructField("day", IntegerType, nullable = true),
    StructField("hour", IntegerType, nullable = true)))

  /** Deterministic hash-mix "random" in [0, m) from the row index — the
    * seeded stand-in for ThreadLocalRandom (`Creator:244-248`). */
  private def mix(i: org.apache.spark.sql.Column, salt: Long, m: Long) =
    pmod(i * MixConst + salt, lit(m))

  /** Base timestamp: 2024-01-15 00:00:00 UTC in epoch millis — the fixed
    * literal replacing `System.currentTimeMillis()` (`Creator:213`). */
  private val baseMs = 1705276800000L

  /** `gen_events` — N synthetic events with the reference's value domains
    * (FIXTURES.md §B): 10 tenants at 1000+i%10, cyclic categoricals,
    * hash-mixed metrics, derived partition columns. Flat columns only so
    * the DuckDB twin is a pure range() expression. */
  def genEvents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = 1000L
    val providers = array(AiProviders.map(lit): _*)
    val services = array(Seq("ai-gateway-v1", "ai-gateway-v2", "ai-proxy",
      "ml-service").map(lit): _*)
    val pops = array(Seq("us-west-2", "us-east-1", "eu-west-1",
      "ap-southeast-1").map(lit): _*)
    val models = array(AiModels.map(lit): _*)
    val i = $"id"
    val ts = lit(baseMs) + i * 60000L   // one event per minute
    val t = timestamp_millis(ts)
    spark.range(n)
      .select(
        i.cast("int").as("transaction_id"),
        (lit(1000) + pmod(i, lit(10L)).cast("int")).as("tenant_id"),
        element_at(pops, (pmod(i, lit(4L)) + 1).cast("int")).as("home_pop"),
        element_at(services, (pmod(i, lit(4L)) + 1).cast("int"))
          .as("service_id"),
        ts.as("timestamp"),
        lit("aig").as("type"),
        element_at(providers, (pmod(i, lit(5L)) + 1).cast("int"))
          .as("ai_provider_id"),
        element_at(models, (pmod(i * 7L + 3L, lit(5L)) + 1).cast("int"))
          .as("cs_model"),
        element_at(array(lit(200), lit(400), lit(500)),
          (when(mix(i, 17L, 10L) < 8L, lit(0L))
            .when(mix(i, 17L, 10L) === 8L, lit(1L))
            .otherwise(lit(2L)) + 1).cast("int")).as("rs_status"),
        (lit(50) + mix(i, 101L, 4950L).cast("int")).as("rs_response_time"),
        (lit(10) + mix(i, 211L, 990L).cast("int")).as("usage_total"),
        (lit(5) + mix(i, 307L, 495L).cast("int")).as("usage_input"),
        (lit(5) + mix(i, 401L, 495L).cast("int")).as("usage_output"),
        when(mix(i, 503L, 10L) < 9L, "allow").otherwise("throttle")
          .as("action"),
        concat(lit("ai_request_"), pmod(i, lit(3L)).cast("string"))
          .as("activity"),
        year(t).as("year"), month(t).as("month"),
        dayofmonth(t).as("day"), hour(t).as("hour"))
      .orderBy($"transaction_id")
  }

  /** `validate_schema` — the Validator's 6-step schema assertions
    * (`Validator:149-275`) as a queryable (field, type, nullable) relation
    * from the in-code StructType; oracle pins the expected shape. */
  def validateSchema(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    aigSchema.fields.zipWithIndex.map { case (f, idx) =>
      (idx.toLong, f.name, f.dataType.sql, f.nullable)
    }.toSeq.toDF("pos", "field", "data_type", "nullable")
      .orderBy($"pos")
  }

  /** `ddl_generate` — CREATE TABLE DDL emission from the schema
    * (`Validator:277-305`, `CreatorTest:61-82`): partition spec + the
    * reference's table properties (`Creator:184-191`). */
  def ddlGenerate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cols = aigSchema.fields.take(15).map { f =>
      s"${f.name} ${f.dataType.sql}${if (f.nullable) "" else " NOT NULL"}"
    }.mkString(", ")
    val ddl = s"CREATE TABLE IF NOT EXISTS aig.events ($cols) " +
      "USING parquet PARTITIONED BY (tenant, year, month, day, hour) " +
      "TBLPROPERTIES (" +
      "'write.format.default'='parquet', " +
      "'write.parquet.compression-codec'='zstd', " +
      "'write.target-file-size-bytes'='134217728', " +
      "'write.parquet.page-size-bytes'='1048576', " +
      "'write.parquet.dict-size-bytes'='2097152')"
    Seq((1L, ddl)).toDF("id", "ddl")
  }

  /** `gen_nested` — the nested-structure generators (`gen_policy_structs`
    * `Creator:283-311`): 20% of rows carry 1–3 policy structs built as a
    * real array<struct> via transform(sequence), then exploded + flattened
    * so the DuckDB twin (same arithmetic over range×unnest) can hash it. */
  def genNested(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val i = $"id"
    val types = array(lit("dlp"), lit("rate_limit"), lit("content_filter"))
    val actions = array(lit("allow"), lit("deny"), lit("redact"))
    val nPolicy = (lit(1) + mix(i, 701L, 3L)).cast("int")
    val policies = transform(sequence(lit(0), nPolicy - 1), j => struct(
      element_at(types, (pmod(i + j, lit(3L)) + 1).cast("int")).as("type"),
      concat(lit("policy_"), pmod(i * 3 + j, lit(5L)).cast("string"))
        .as("name"),
      element_at(actions, (pmod(i + j * 2, lit(3L)) + 1).cast("int"))
        .as("action"),
      (lit(1) + pmod(i + j, lit(2L))).cast("int").as("n_profiles"),
      (i * 10 + j).cast("int").as("object_id")))
    spark.range(1000)
      .filter(mix(i, 601L, 10L) < 2)      // 20% of rows carry policies
      .select(i.as("gen_id"), explode(policies).as("p"))
      .select($"gen_id", $"p.type".as("type"), $"p.name".as("name"),
        $"p.action".as("action"), $"p.n_profiles".as("n_profiles"),
        $"p.object_id".as("object_id"))
      .orderBy($"gen_id", $"object_id")
  }

  /** `gen_file_structs` — the cs_files/rs_files file-metadata generator
    * (`Creator:313-338`; element schema `Validator:110-131`): cs on 30% of
    * rows / rs on 25%, 1–2 structs each, fields object_id / purpose / type
    * / mime_type / filename / bytes(100..9999) / create_at (within the
    * hour before update_at). Same determinism deltas as gen_events
    * (wall clock → baseMs literal, ThreadLocalRandom → hash-mix), same
    * flatten-via-explode strategy as gen_nested so DuckDB can hash it. */
  def genFileStructs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val i = $"id"
    val mimes = array(lit("text/plain"), lit("application/json"))
    def fileKind(kind: String, purpose: String, pct: Int, saltP: Long,
        saltN: Long): DataFrame = {
      val tpe = if (purpose == "input") "prompt" else "response"
      val nFiles = (lit(1) + mix(i, saltN, 2L)).cast("int")
      val files = transform(sequence(lit(0), nFiles - 1), j => struct(
        (lit(3000) + i + j).cast("int").as("object_id"),
        lit(purpose).as("purpose"),
        lit(tpe).as("type"),
        element_at(mimes, (pmod(i + j, lit(2L)) + 1).cast("int"))
          .as("mime_type"),
        concat(lit(purpose + "_"), i.cast("string"), lit("_"),
          j.cast("string"), lit(".txt")).as("filename"),
        (lit(100) + mix(i * 2 + j, 1409L, 9900L)).cast("long").as("bytes"),
        (lit(baseMs) - mix(i + j, 1511L, 3600000L)).as("create_at"),
        lit(baseMs).as("update_at")))
      spark.range(1000)
        .filter(mix(i, saltP, 100L) < pct)
        .select(i.as("gen_id"), lit(kind).as("kind"), explode(files).as("f"))
    }
    fileKind("cs", "input", 30, 1009L, 1201L)
      .unionByName(fileKind("rs", "output", 25, 1103L, 1301L))
      .select($"gen_id", $"kind", $"f.object_id".as("object_id"),
        $"f.purpose".as("purpose"), $"f.type".as("type"),
        $"f.mime_type".as("mime_type"), $"f.filename".as("filename"),
        $"f.bytes".as("bytes"), $"f.create_at".as("create_at"),
        $"f.update_at".as("update_at"))
      .orderBy($"kind", $"gen_id", $"object_id")
  }

  /** `gen_ratelimit` — list<string> tag generator (`Creator:340-352`:
    * 50% of rows, 1–2 tags from a fixed vocabulary), exploded flat. */
  def genRatelimit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val i = $"id"
    val tags = array(lit("token_bucket"), lit("sliding_window"),
      lit("fixed_window"), lit("adaptive_limit"))
    val nTags = (lit(1) + mix(i, 811L, 2L)).cast("int")
    val tagList = transform(sequence(lit(0), nTags - 1), j =>
      element_at(tags, (pmod(i + j, lit(4L)) + 1).cast("int")))
    spark.range(1000)
      .filter(mix(i, 907L, 2L) === 0)      // 50% of rows
      .select(i.as("gen_id"), posexplode(tagList).as(Seq("pos", "tag")))
      .select($"gen_id", $"pos".cast("long").as("pos"), $"tag")
      .orderBy($"gen_id", $"pos")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gen_file_structs" -> (genFileStructs _),
    "gen_ratelimit" -> (genRatelimit _),
    "gen_nested" -> (genNested _),
    "gen_events" -> (genEvents _),
    "validate_schema" -> (validateSchema _),
    "ddl_generate" -> (ddlGenerate _))

  /** The DuckDB twin of gen_events — same arithmetic over range(1000). */
  private val genSql: String = {
    val mixS = (salt: Long, m: Long) => s"(i * $MixConst + $salt) % $m"
    s"""SELECT CAST(i AS INT) AS transaction_id,
       |  CAST(1000 + i % 10 AS INT) AS tenant_id,
       |  (['us-west-2','us-east-1','eu-west-1','ap-southeast-1'])
       |    [CAST(i % 4 AS INT) + 1] AS home_pop,
       |  (['ai-gateway-v1','ai-gateway-v2','ai-proxy','ml-service'])
       |    [CAST(i % 4 AS INT) + 1] AS service_id,
       |  $baseMs + i * 60000 AS "timestamp",
       |  'aig' AS type,
       |  ${sqlList(AiProviders)}
       |    [CAST(i % 5 AS INT) + 1] AS ai_provider_id,
       |  ${sqlList(AiModels)}
       |    [CAST((i * 7 + 3) % 5 AS INT) + 1] AS cs_model,
       |  ([200, 400, 500])[CAST(
       |    CASE WHEN ${mixS(17L, 10L)} < 8 THEN 0
       |         WHEN ${mixS(17L, 10L)} = 8 THEN 1 ELSE 2 END AS INT) + 1]
       |    AS rs_status,
       |  CAST(50 + ${mixS(101L, 4950L)} AS INT) AS rs_response_time,
       |  CAST(10 + ${mixS(211L, 990L)} AS INT) AS usage_total,
       |  CAST(5 + ${mixS(307L, 495L)} AS INT) AS usage_input,
       |  CAST(5 + ${mixS(401L, 495L)} AS INT) AS usage_output,
       |  CASE WHEN ${mixS(503L, 10L)} < 9 THEN 'allow' ELSE 'throttle' END
       |    AS action,
       |  'ai_request_' || CAST(i % 3 AS VARCHAR) AS activity,
       |  CAST(year(ep) AS INT) AS year, CAST(month(ep) AS INT) AS month,
       |  CAST(day(ep) AS INT) AS day, CAST(hour(ep) AS INT) AS hour
       |FROM (SELECT i, make_timestamp(($baseMs + i * 60000) * 1000) AS ep
       |      FROM range(1000) t(i))
       |ORDER BY transaction_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "gen_file_structs" ->
      s"""WITH cs AS (
         |  SELECT i, 'cs' AS kind, 'input' AS purpose, 'prompt' AS type,
         |    1 + (i * 2654435761 + 1201) % 2 AS nf
         |  FROM range(1000) t(i)
         |  WHERE (i * 2654435761 + 1009) % 100 < 30),
         |rs AS (
         |  SELECT i, 'rs' AS kind, 'output' AS purpose, 'response' AS type,
         |    1 + (i * 2654435761 + 1301) % 2 AS nf
         |  FROM range(1000) t(i)
         |  WHERE (i * 2654435761 + 1103) % 100 < 25),
         |fb AS (SELECT * FROM cs UNION ALL SELECT * FROM rs)
         |SELECT i AS gen_id, kind,
         |  CAST(3000 + i + j AS INT) AS object_id, purpose, type,
         |  (['text/plain','application/json'])[CAST((i + j) % 2 AS INT) + 1]
         |    AS mime_type,
         |  purpose || '_' || CAST(i AS VARCHAR) || '_' ||
         |    CAST(j AS VARCHAR) || '.txt' AS filename,
         |  CAST(100 + ((i * 2 + j) * 2654435761 + 1409) % 9900 AS BIGINT)
         |    AS bytes,
         |  $baseMs - ((i + j) * 2654435761 + 1511) % 3600000 AS create_at,
         |  $baseMs AS update_at
         |FROM fb, unnest(range(0, nf)) AS u(j)
         |ORDER BY kind, gen_id, object_id""".stripMargin,
    "gen_ratelimit" ->
      """SELECT i AS gen_id, j AS pos,
        |  (['token_bucket','sliding_window','fixed_window','adaptive_limit'])
        |    [CAST((i + j) % 4 AS INT) + 1] AS tag
        |FROM (SELECT i, 1 + (i * 2654435761 + 811) % 2 AS nt
        |      FROM range(1000) t(i)
        |      WHERE (i * 2654435761 + 907) % 2 = 0),
        |  unnest(range(0, nt)) AS u(j)
        |ORDER BY gen_id, pos""".stripMargin,
    "gen_nested" ->
      """WITH base AS (
        |  SELECT i, 1 + (i * 2654435761 + 701) % 3 AS np
        |  FROM range(1000) t(i)
        |  WHERE (i * 2654435761 + 601) % 10 < 2)
        |SELECT i AS gen_id,
        |  (['dlp','rate_limit','content_filter'])
        |    [CAST((i + j) % 3 AS INT) + 1] AS type,
        |  'policy_' || CAST((i * 3 + j) % 5 AS VARCHAR) AS name,
        |  (['allow','deny','redact'])[CAST((i + j * 2) % 3 AS INT) + 1]
        |    AS action,
        |  CAST(1 + (i + j) % 2 AS INT) AS n_profiles,
        |  CAST(i * 10 + j AS INT) AS object_id
        |FROM base, unnest(range(0, np)) AS u(j)
        |ORDER BY gen_id, object_id""".stripMargin,
    "gen_events" -> genSql,
    "validate_schema" -> {
      val rows = aigSchema.fields.zipWithIndex.map { case (f, idx) =>
        val pos = if (idx == 0) "CAST(0 AS BIGINT)" else idx.toString
        s"($pos, '${f.name}', '${f.dataType.sql.replace("'", "''")}', " +
          s"${f.nullable})"
      }.mkString(",\n  ")
      s"""SELECT * FROM (VALUES
         |  $rows
         |) AS t(pos, field, data_type, nullable) ORDER BY pos""".stripMargin
    },
    "ddl_generate" -> {
      val cols = aigSchema.fields.take(15).map { f =>
        s"${f.name} ${f.dataType.sql}${if (f.nullable) "" else " NOT NULL"}"
      }.mkString(", ")
      val ddl = (s"CREATE TABLE IF NOT EXISTS aig.events ($cols) " +
        "USING parquet PARTITIONED BY (tenant, year, month, day, hour) " +
        "TBLPROPERTIES (" +
        "'write.format.default'='parquet', " +
        "'write.parquet.compression-codec'='zstd', " +
        "'write.target-file-size-bytes'='134217728', " +
        "'write.parquet.page-size-bytes'='1048576', " +
        "'write.parquet.dict-size-bytes'='2097152')").replace("'", "''")
      s"SELECT CAST(1 AS BIGINT) AS id, '$ddl' AS ddl"
    })
}
