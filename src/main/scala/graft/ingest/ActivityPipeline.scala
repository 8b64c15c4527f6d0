package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's second pipeline (user_course_activity.py): a straight
  * line from paginated JSON to a wide upserted fact table —
  * 22 all-optional fields (py:104–125, every access `.get()`), five
  * ISO-8601 `Z`-suffixed timestamps parsed with null passthrough
  * (`parse_timestamp`, py:181–185; `last_activity_date` stays a date,
  * py:121), merged latest-wins on (user_id, course_id)
  * (`ON CONFLICT DO UPDATE`, py:73–102).
  *
  * Spark-first: the whole 22-column projection + casts is one codegen'd
  * projection (`to_timestamp` parses `Z` natively — no UDF), and the merge
  * is the O13 union+window kernel, one shuffle on the composite key.
  */
object ActivityPipeline {

  /** In-flight schema: timestamps arrive as strings, cast on projection
    * (FIXTURES.md §A.3).
    */
  val rawSchema: StructType = {
    val s = Seq(
      "user_id" -> LongType, "user_name" -> StringType,
      "user_surname" -> StringType, "user_email" -> StringType,
      "user_role" -> StringType, "user_external_id" -> StringType,
      "course_id" -> LongType, "course_title" -> StringType,
      "course_category" -> StringType, "course_duration" -> DoubleType,
      "completion_ratio" -> DoubleType,
      "num_video_consumed_minutes" -> DoubleType,
      "course_enroll_date" -> StringType, "course_start_date" -> StringType,
      "course_completion_date" -> StringType,
      "course_first_completion_date" -> StringType,
      "course_last_accessed_date" -> StringType,
      "last_activity_date" -> StringType, "is_assigned" -> BooleanType,
      "assigned_by" -> StringType, "user_is_deactivated" -> BooleanType,
      "lms_user_id" -> StringType)
    StructType(s.map { case (n, t) => StructField(n, t) })
  }

  private val tsCols = Seq("course_enroll_date", "course_start_date",
    "course_completion_date", "course_first_completion_date",
    "course_last_accessed_date")

  /** Typed projection: `Z`-suffixed ISO-8601 → timestamp (null-safe),
    * `last_activity_date` → date (py:121 passes it through unparsed; the
    * sink column is DATE, user_course_activity_database.sql:19).
    */
  def typed(raw: DataFrame): DataFrame =
    tsCols.foldLeft(raw)((df, c) => df.withColumn(c, to_timestamp(col(c))))
      .withColumn("last_activity_date", to_date(col("last_activity_date")))

  /** Latest-wins upsert of an incoming batch over the stored fact
    * (O13 on the (user_id, course_id) composite key).
    */
  def upsert(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val u = incoming.withColumn("_pri", lit(1))
      .unionByName(existing.withColumn("_pri", lit(0)))
    u.withColumn("_rn", row_number().over(
        Window.partitionBy(col("user_id"), col("course_id"))
          .orderBy(col("_pri").desc)))
      .where(col("_rn") === 1).drop("_pri", "_rn")
  }

  /** Page of JSON bodies → typed frame (the full source→sink path minus
    * the physical write).
    */
  def fromJson(spark: SparkSession, bodies: Seq[String]): DataFrame = {
    import spark.implicits._
    typed(spark.read.schema(rawSchema).json(spark.createDataset(bodies)))
  }
}
