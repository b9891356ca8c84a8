package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY.md §2g — set operations (X-tier; the reference's multi-file ingest
  * at `Bulk:83-94` is semantically a UNION ALL of per-file scans) and
  * §2f — sorts / limits / top-k.
  */
object SetOps {

  /** UNION (distinct) of two key sets. */
  def setopUnion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val eventUsers = Tables.events(spark, dir)
      .select($"user_id".as("id")).filter($"id" < 400)
    val custKeys = Tables.customer(spark, dir)
      .select($"c_custkey".as("id")).filter($"id" < 400)
    eventUsers.union(custKeys).distinct().orderBy($"id")
  }

  /** UNION ALL via unionByName with different column order (name-resolved,
    * mirroring schema-by-name resolution in `Nested:230-282`). */
  def setopUnionAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val a = Tables.events(spark, dir).filter($"event_type" === "click")
      .select($"event_id", $"user_id")
    val b = Tables.events(spark, dir).filter($"event_type" === "error")
      .select($"user_id", $"event_id")   // reversed on purpose
    a.unionByName(b)
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .orderBy($"user_id")
  }

  /** INTERSECT of event users and customer keys. */
  def setopIntersect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir).select($"user_id".as("id"))
      .intersect(Tables.customer(spark, dir).select($"c_custkey".as("id")))
      .orderBy($"id")
  }

  /** EXCEPT: customer keys with no events. */
  def setopExcept(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir).select($"c_custkey".as("id"))
      .filter($"id" < 2000)
      .except(Tables.events(spark, dir).select($"user_id".as("id")))
      .orderBy($"id")
  }

  // ---- §2f sorts / limits ----

  /** Global top-k — Spark plans TakeOrderedAndProject (per-partition top-k
    * then merge on driver; no full sort of the table — `TimeEx:276-279`'s
    * sorted().limit(6) shape). */
  def topkOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey",
        dec($"o_totalprice").cast("double").as("totalprice"))
      .orderBy($"totalprice".desc, $"o_orderkey")
      .limit(10)
  }

  /** `limit_first` — first-record probe (`Hidden:214-217`: read one record
    * of a file to extract its partition value); the earliest event by
    * (ts, event_id), planned as TakeOrdered — no full sort. */
  def limitFirst(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type")
      .orderBy($"ts", $"event_id")
      .limit(1)
  }

  /** limit-n probe (`Debug:119-122`: first 5 records) with a total order
    * for determinism (SURVEY §7.3). */
  def limitN(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type")
      .orderBy($"event_id")
      .limit(5)
  }

  /** `sort_by_key` — the reference's hourly-histogram sort+take-6
    * (`TimeEx:276-279`: sorted(comparingByKey).limit(6)). */
  def sortByKey(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(hour($"ts").cast("long").as("hour_of_day"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"hour_of_day")
      .limit(6)
  }

  /** `topk_per_key` — top-3 orders by price per customer via the custom
    * TopKPerKey operator (graft.plans): partial per-partition bounded
    * heaps, then ONE hash exchange carrying ≤ 3 rows per (customer,
    * upstream partition), then the final heap pass — the per-key
    * generalization of `TimeEx:276-279`'s sorted().limit(6) that the
    * built-in Window(row_number)+Filter spelling shuffles every row for.
    * The tie-break on o_orderkey makes the top-3 set unique, so the
    * row_number oracle is exact. */
  def topkPerKey(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey",
        dec($"o_totalprice").cast("double").as("totalprice"))
    graft.plans.TopK.perKey(base,
        keyCols = Seq($"o_custkey"),
        orderCols = Seq($"totalprice".desc, $"o_orderkey".asc), k = 3)
      .orderBy($"o_custkey", $"totalprice".desc, $"o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sort_by_key" -> (sortByKey _),
    "topk_per_key" -> (topkPerKey _),
    "setop_union" -> (setopUnion _),
    "setop_union_all" -> (setopUnionAll _),
    "setop_intersect" -> (setopIntersect _),
    "setop_except" -> (setopExcept _),
    "topk_orders" -> (topkOrders _),
    "limit_first" -> (limitFirst _),
    "limit_n" -> (limitN _))

  val oracles: Map[String, String] = Map(
    "sort_by_key" ->
      """SELECT hour(ts) AS hour_of_day, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1 LIMIT 6""".stripMargin,
    "setop_union" ->
      """SELECT user_id AS id FROM events WHERE user_id < 400
        |UNION
        |SELECT c_custkey FROM customer WHERE c_custkey < 400
        |ORDER BY id""".stripMargin,
    "setop_union_all" ->
      """SELECT user_id, COUNT(*) AS n FROM (
        |  SELECT event_id, user_id FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT event_id, user_id FROM events WHERE event_type = 'error'
        |) GROUP BY user_id ORDER BY user_id""".stripMargin,
    "setop_intersect" ->
      """SELECT user_id AS id FROM events
        |INTERSECT
        |SELECT c_custkey FROM customer
        |ORDER BY id""".stripMargin,
    "setop_except" ->
      """SELECT c_custkey AS id FROM customer WHERE c_custkey < 2000
        |EXCEPT
        |SELECT user_id FROM events
        |ORDER BY id""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
        |FROM orders
        |ORDER BY totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "topk_per_key" ->
      """SELECT o_orderkey, o_custkey, totalprice FROM (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
        |    row_number() OVER (
        |      PARTITION BY o_custkey
        |      ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
        |        DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, totalprice DESC, o_orderkey""".stripMargin,
    "limit_first" ->
      """SELECT event_id, ts, user_id, event_type FROM events
        |ORDER BY ts, event_id LIMIT 1""".stripMargin,
    "limit_n" ->
      """SELECT event_id, user_id, event_type FROM events
        |ORDER BY event_id LIMIT 5""".stripMargin)
}
