package graft

import graft.ingest.{ActivityPipeline, CatalogPipeline, CourseFixture}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** End-to-end composite pipelines: the catalog 1-record→13-relation
  * fan-out and the activity parse→cast→upsert line (SURVEY §2.1 composite
  * pipeline shapes; §5.2 golden end-to-end).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("catalog fan-out emits all 13 relations with golden cardinalities") {
    val out = CatalogPipeline.fanout(spark, CourseFixture.raw(spark))
    val counts = out.view.mapValues(_.count()).toMap
    assert(counts === Map(
      "courses" -> 4, "categories" -> 2, "subcategories" -> 3,
      "course_categories" -> 4, "course_subcategories" -> 4,
      "topics" -> 6, "promo_videos" -> 3, "instructors" -> 6,
      "requirements" -> 2, "what_you_will_learn" -> 7, "images" -> 5,
      "caption_languages" -> 6, "caption_locales" -> 4))
    // surrogate keys: dense from 1, FK join closes (every bridge row
    // resolves to a dim row)
    val cats = out("categories").select($"id").as[Long].collect().sorted
    assert(cats.toSeq === (1L to cats.length))
    assert(out("course_categories").join(out("categories"),
      out("course_categories")("category_id") === out("categories")("id"))
      .count() === 4)
    // wide projection keeps the struct path (locale.locale)
    val locales = out("courses").select($"locale").as[String].collect().toSet
    assert(locales === Set("en_US", "en_GB", "fr_FR"))
  }

  test("activity pipeline parses Z timestamps, keeps nulls, upserts latest-wins") {
    val bodies = Seq(
      """{"user_id": 1, "course_id": 10, "user_name": "ann",
        |"completion_ratio": 0.5,
        |"course_enroll_date": "2024-01-05T10:00:00Z",
        |"course_completion_date": null,
        |"last_activity_date": "2024-02-01"}""".stripMargin.replace("\n", " "),
      """{"user_id": 2, "course_id": 10, "user_name": "bob",
        |"course_enroll_date": "2024-01-06T09:30:00Z"}""".stripMargin.replace("\n", " "))
    val df = ActivityPipeline.fromJson(spark, bodies)
    val r1 = df.where($"user_id" === 1).head()
    assert(r1.getAs[Timestamp]("course_enroll_date") ===
      Timestamp.valueOf("2024-01-05 10:00:00"))
    assert(r1.getAs[Timestamp]("course_completion_date") === null)
    assert(r1.getAs[java.sql.Date]("last_activity_date") ===
      java.sql.Date.valueOf("2024-02-01"))
    // all 22 columns present and typed
    assert(df.columns.length === 22)

    // duplicate (user, course) across pages: the later batch wins
    val page2 = ActivityPipeline.fromJson(spark, Seq(
      """{"user_id": 1, "course_id": 10, "user_name": "ann2", "completion_ratio": 0.9}"""))
    val merged = ActivityPipeline.upsert(df, page2)
    assert(merged.count() === 2)
    val updated = merged.where($"user_id" === 1).head()
    assert(updated.getAs[String]("user_name") === "ann2")
    assert(updated.getAs[Double]("completion_ratio") === 0.9)
  }
}
