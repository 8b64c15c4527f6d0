package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O15: relational (JDBC) sink with the reference's merge semantics.
  *
  * The reference writes row-at-a-time through psycopg2 with
  * `ON CONFLICT DO NOTHING` / `DO UPDATE` clauses and commit-per-page
  * (course_catalog.py:94–108,212; user_course_activity.py:73–102,153).
  * Spark's JDBC writer batches inserts per partition; conflict semantics
  * are applied SET-WISE before the write (anti-join / union+window — the
  * same O12/O13 kernels as ops.Merge), so the sink only ever appends or
  * atomically replaces. In a micro-batch (`foreachBatch`) pipeline,
  * batch = page reproduces the reference's page-granular atomicity unit.
  *
  * At scale: `numPartitions` bounds connection fan-in; per-partition
  * batched prepared statements replace the reference's one-round-trip-
  * per-row pattern (SURVEY §4.1).
  */
object JdbcSink {

  private def writer(df: DataFrame, url: String, table: String,
                     driver: String, numPartitions: Int) =
    df.coalesce(numPartitions).write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)

  def readTable(spark: SparkSession, url: String, table: String,
                driver: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver).load()

  /** Plain append (create on first write). */
  def append(df: DataFrame, url: String, table: String, driver: String,
             numPartitions: Int = 4): Unit =
    writer(df, url, table, driver, numPartitions)
      .mode(SaveMode.Append).save()

  /** Config-driven overload: connection params come from the typed dotenv
    * contract (graft.config.GraftConfig — the reference's get_db_config,
    * course_catalog.py:23–32), so callers never hardwire URLs/creds.
    */
  def append(df: DataFrame, db: graft.config.GraftConfig.DbConfig,
             table: String, driver: String): Unit =
    writer(df, db.jdbcUrl(), table, driver, 4)
      .option("user", db.user).option("password", db.password)
      .mode(SaveMode.Append).save()

  /** O12 at the sink: `ON CONFLICT DO NOTHING` — append only the rows
    * whose key is not already present. Reads back only the KEY column
    * (column pruning pushes into the JDBC query).
    */
  def appendIfAbsent(df: DataFrame, url: String, table: String,
                     driver: String, key: String): Unit = {
    val spark = df.sparkSession
    val existingKeys = readTable(spark, url, table, driver).select(key)
    val fresh = df.join(existingKeys, Seq(key), "left_anti")
    writer(fresh, url, table, driver, 4).mode(SaveMode.Append).save()
  }

  /** O13 at the sink: `ON CONFLICT DO UPDATE` — latest-wins merge of the
    * incoming batch over the stored table, two-phase through a staging
    * table. The merge itself is the O13 union+window kernel (distributed,
    * one shuffle); staging breaks the read-write cycle (the final
    * overwrite would otherwise drop the table its own input plan reads)
    * without ever collecting rows to the driver.
    */
  def upsert(df: DataFrame, url: String, table: String, driver: String,
             key: String): Unit = {
    val spark = df.sparkSession
    val existing = readTable(spark, url, table, driver)
    val merged = df.withColumn("_pri", lit(1))
      .unionByName(existing.withColumn("_pri", lit(0)))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(col("_pri").desc)))
      .where(col("_rn") === 1).drop("_pri", "_rn")
    val staging = table + "_STAGING"
    writer(merged, url, staging, driver, 4).mode(SaveMode.Overwrite).save()
    writer(readTable(spark, url, staging, driver), url, table, driver, 4)
      .mode(SaveMode.Overwrite).save()
  }
}
