package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-shaped course records (FIXTURES.md §A.2; field evidence
  * course_catalog.py:101–161) used by the O2–O10 normalization fan-out.
  *
  * The SAME literal JSON strings feed both sides of the correctness gate:
  * Spark parses them via `from_json` with [[schema]], and the DuckDB oracle
  * receives them embedded as a `(VALUES …)` relation built by
  * [[valuesClause]] — so the compare can never drift on fixture contents.
  *
  * Records are deliberately heterogeneous:
  *  - 101: every field present (happy path).
  *  - 102: optional scalars absent (`mobile_native_deeplink`,
  *    `last_update_date` — the reference's `.get()` idiom,
  *    course_catalog.py:102–106) and NO `requirements` key (guard case 1,
  *    course_catalog.py:138).
  *  - 103: `requirements.list` explicitly null (guard case 2 — the
  *    reference's `isinstance(..., list)` check), empty arrays/map.
  *  - 104: `requirements.list` present but EMPTY (explodes to zero rows),
  *    multiple topics/instructors for fan-out counts.
  */
object CourseFixture {

  /** One compact JSON document per line; no single quotes (SQL-embedding). */
  val records: Seq[String] = Seq(
    """{"id": 101, "title": "Spark Fundamentals", "description": "Intro to Spark", "url": "/course/spark/", "estimated_content_length": 480, "num_lectures": 42, "num_videos": 40, "mobile_native_deeplink": "udemy://101", "is_practice_test_course": false, "num_quizzes": 5, "num_practice_tests": 0, "has_closed_caption": true, "last_update_date": "2024-03-15", "xapi_activity_id": "xapi-101", "is_custom": false, "is_imported": false, "headline": "Learn Spark", "level": "Beginner", "locale": {"locale": "en_US"}, "primary_category": {"title": "Development", "url": "/dev/"}, "primary_subcategory": {"title": "Data Science", "url": "/data/"}, "topics": [{"id": 11, "title": "Apache Spark", "url": "/t/spark/"}, {"id": 12, "title": "Big Data", "url": "/t/bigdata/"}], "promo_video_url": [{"type": "video/mp4", "label": "720", "file": "p101.mp4"}], "instructors": ["alice", "bob"], "requirements": {"list": ["Basic SQL", "Some Python"]}, "what_you_will_learn": {"list": ["Build ETL jobs", "Tune shuffles"]}, "images": {"480x270": "101-480.jpg", "100x100": "101-100.jpg"}, "caption_languages": ["English", "German"], "caption_locales": [{"locale": "en_US", "title": "English", "english_title": "English"}]}""",
    """{"id": 102, "title": "Advanced SQL", "description": "Window functions and more", "url": "/course/sql/", "estimated_content_length": 300, "num_lectures": 28, "num_videos": 25, "is_practice_test_course": false, "num_quizzes": 3, "num_practice_tests": 1, "has_closed_caption": false, "xapi_activity_id": "xapi-102", "is_custom": true, "is_imported": false, "headline": "Master SQL", "level": "Intermediate", "locale": {"locale": "en_GB"}, "primary_category": {"title": "IT Operations", "url": "/it/"}, "primary_subcategory": {"title": "Databases", "url": "/db/"}, "topics": [{"id": 21, "title": "SQL", "url": "/t/sql/"}], "promo_video_url": [], "instructors": ["carol"], "what_you_will_learn": {"list": ["Write window functions"]}, "images": {"480x270": "102-480.jpg"}, "caption_languages": [], "caption_locales": []}""",
    """{"id": 103, "title": "Intro to Python", "description": "Python basics", "url": "/course/py/", "estimated_content_length": 120, "num_lectures": 10, "num_videos": 10, "mobile_native_deeplink": null, "is_practice_test_course": false, "num_quizzes": 0, "num_practice_tests": 0, "has_closed_caption": true, "last_update_date": "2023-11-02", "xapi_activity_id": "xapi-103", "is_custom": false, "is_imported": true, "headline": "Python from zero", "level": "Beginner", "locale": {"locale": "fr_FR"}, "primary_category": {"title": "Development", "url": "/dev/"}, "primary_subcategory": {"title": "Programming", "url": "/prog/"}, "topics": [], "promo_video_url": [], "instructors": [], "requirements": {"list": null}, "what_you_will_learn": {"list": ["Read Python code"]}, "images": {}, "caption_languages": ["French"], "caption_locales": [{"locale": "fr_FR", "title": "Francais", "english_title": "French"}]}""",
    """{"id": 104, "title": "Data Engineering Bootcamp", "description": "End to end pipelines", "url": "/course/de/", "estimated_content_length": 900, "num_lectures": 80, "num_videos": 75, "mobile_native_deeplink": "udemy://104", "is_practice_test_course": false, "num_quizzes": 12, "num_practice_tests": 2, "has_closed_caption": true, "last_update_date": "2024-06-30", "xapi_activity_id": "xapi-104", "is_custom": false, "is_imported": false, "headline": "Pipelines at scale", "level": "Expert", "locale": {"locale": "en_US"}, "primary_category": {"title": "Development", "url": "/dev/"}, "primary_subcategory": {"title": "Data Science", "url": "/data/"}, "topics": [{"id": 31, "title": "ETL", "url": "/t/etl/"}, {"id": 32, "title": "Apache Spark", "url": "/t/spark/"}, {"id": 33, "title": "Orchestration", "url": "/t/orch/"}], "promo_video_url": [{"type": "video/mp4", "label": "720", "file": "p104-a.mp4"}, {"type": "video/webm", "label": "1080", "file": "p104-b.webm"}], "instructors": ["dave", "erin", "frank"], "requirements": {"list": []}, "what_you_will_learn": {"list": ["Design DAGs", "Operate clusters", "Debug skew"]}, "images": {"480x270": "104-480.jpg", "750x422": "104-750.jpg"}, "caption_languages": ["English", "Spanish", "Italian"], "caption_locales": [{"locale": "en_US", "title": "English", "english_title": "English"}, {"locale": "es_ES", "title": "Espanol", "english_title": "Spanish"}]}""",
  )

  /** Explicit in-flight schema (FIXTURES.md §A.2; SURVEY.md §1.2) — optional
    * fields nullable, required fields validated downstream rather than
    * inferred. `from_json` null-defaults absent fields, which is exactly the
    * reference's `dict.get()` idiom (O5).
    */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("url", StringType),
    StructField("estimated_content_length", IntegerType),
    StructField("num_lectures", IntegerType),
    StructField("num_videos", IntegerType),
    StructField("mobile_native_deeplink", StringType),
    StructField("is_practice_test_course", BooleanType),
    StructField("num_quizzes", IntegerType),
    StructField("num_practice_tests", IntegerType),
    StructField("has_closed_caption", BooleanType),
    StructField("last_update_date", DateType),
    StructField("xapi_activity_id", StringType),
    StructField("is_custom", BooleanType),
    StructField("is_imported", BooleanType),
    StructField("headline", StringType),
    StructField("level", StringType),
    StructField("locale", StructType(Seq(StructField("locale", StringType)))),
    StructField("primary_category", StructType(Seq(
      StructField("title", StringType), StructField("url", StringType)))),
    StructField("primary_subcategory", StructType(Seq(
      StructField("title", StringType), StructField("url", StringType)))),
    StructField("topics", ArrayType(StructType(Seq(
      StructField("id", LongType), StructField("title", StringType),
      StructField("url", StringType))))),
    StructField("promo_video_url", ArrayType(StructType(Seq(
      StructField("type", StringType), StructField("label", StringType),
      StructField("file", StringType))))),
    StructField("instructors", ArrayType(StringType)),
    StructField("requirements", StructType(Seq(
      StructField("list", ArrayType(StringType))))),
    StructField("what_you_will_learn", StructType(Seq(
      StructField("list", ArrayType(StringType))))),
    StructField("images", MapType(StringType, StringType)),
    StructField("caption_languages", ArrayType(StringType)),
    StructField("caption_locales", ArrayType(StructType(Seq(
      StructField("locale", StringType), StructField("title", StringType),
      StructField("english_title", StringType))))),
  ))

  /** Raw one-column frame of JSON bodies — the O1 page payload as it would
    * arrive from the paginated source (`data['results']` elements).
    */
  def raw(s: SparkSession): DataFrame = {
    import s.implicits._
    s.createDataset(records).toDF("body")
  }

  /** O2: typed decode. One parsed struct column exploded to top level. */
  def parsed(s: SparkSession): DataFrame =
    raw(s).select(from_json(col("body"), schema).as("c")).select(col("c.*"))

  /** DuckDB relation with the identical records: `(VALUES …) v(body)`. */
  val valuesClause: String =
    records.map(r => "('" + r.replace("'", "''") + "')")
      .mkString("(VALUES ", ", ", ") v(body)")
}
