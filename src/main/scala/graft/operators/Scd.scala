package graft.operators

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) maintenance without a table
  * format: the keyed MERGE every lakehouse runs on dimension updates,
  * expressed as plain DataFrame algebra — unchanged rows pass through,
  * changed rows are closed (valid_to set) and re-opened as the new
  * current version. The batch twin of
  * [[graft.streaming.EventStreams.upsertRollupBatch]]'s keyed upsert; on
  * disk both end as a partition-overwrite write.
  */
object Scd {

  /** Apply one batch of updates to a current SCD2 dimension.
    *
    * @param dim     current dimension; must carry `valid_from`,
    *                `valid_to` (null = open), `is_current`
    * @param updates (key, changed attribute columns) new versions
    * @param key     business key
    * @param batchDay effective date of the batch
    * @return the new dimension state (history preserved)
    */
  def scd2Apply(dim: DataFrame, updates: DataFrame, key: String,
                batchDay: String): DataFrame = {
    val attrs = updates.columns.filterNot(_ == key).toSeq
    // one hash-join on the key decides each row's fate; history rows
    // (is_current = 0) never join, so the probe side is only the open set
    val joined = dim.join(updates.withColumnRenamed(key, "_uk")
        .select(col("_uk") +: attrs.map(c => col(c).as(s"_new_$c")): _*),
      col(key) === col("_uk") && col("is_current") === 1, "left")
    val untouched = joined.filter(col("_uk").isNull)
      .select(dim.columns.map(col): _*)
    val closed = joined.filter(col("_uk").isNotNull)
      .select(dim.columns.map(col): _*)
      .withColumn("valid_to", lit(batchDay))
      .withColumn("is_current", lit(0))
    val opened = joined.filter(col("_uk").isNotNull)
      .select(Seq(col(key)) ++
        dim.columns.filterNot(c => c == key || attrs.contains(c) ||
          Seq("valid_from", "valid_to", "is_current").contains(c)).map(col) ++
        attrs.map(c => col(s"_new_$c").as(c)): _*)
      .withColumn("valid_from", lit(batchDay))
      .withColumn("valid_to", lit(null).cast("string"))
      .withColumn("is_current", lit(1))
    untouched.unionByName(closed).unionByName(opened.select(untouched.columns.map(col): _*))
  }

  /** q60: SCD2 over the customer dimension — a deterministic update
    * batch (every 10th customer's balance shifts) applied to the
    * as-loaded dimension, returning full version history. The oracle
    * replays the same merge as set algebra in SQL.
    */
  def q60Scd2(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"))
      .withColumn("valid_from", lit("2024-01-01"))
      .withColumn("valid_to", lit(null).cast("string"))
      .withColumn("is_current", lit(1))
    val updates = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"),
        Num.roundD(col("c_acctbal") + 100.0, 2).as("c_acctbal"))
    scd2Apply(dim, updates, "c_custkey", "2024-06-01")
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  val q60Sql: String =
    s"""WITH dim AS (
       |  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
       |    '2024-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
       |    1 AS is_current
       |  FROM customer),
       |upd AS (
       |  SELECT c_custkey, ${Num.sqlRoundD("c_acctbal + 100.0", 2)} AS c_acctbal
       |  FROM customer WHERE c_custkey % 10 = 0)
       |SELECT d.c_custkey, d.c_name, d.c_nationkey, d.c_acctbal,
       |  d.valid_from, d.valid_to, d.is_current
       |FROM dim d LEFT JOIN upd u USING (c_custkey) WHERE u.c_custkey IS NULL
       |UNION ALL
       |SELECT d.c_custkey, d.c_name, d.c_nationkey, d.c_acctbal,
       |  d.valid_from, '2024-06-01' AS valid_to, 0 AS is_current
       |FROM dim d JOIN upd u USING (c_custkey)
       |UNION ALL
       |SELECT d.c_custkey, d.c_name, d.c_nationkey, u.c_acctbal,
       |  '2024-06-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
       |  1 AS is_current
       |FROM dim d JOIN upd u USING (c_custkey)
       |ORDER BY c_custkey, valid_from""".stripMargin
}
