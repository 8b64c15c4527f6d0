package graft

import graft.ingest.{CourseFixture, Normalize}
import org.apache.spark.sql.functions._

/** Golden fan-out test (SURVEY §5.2 item 4): the 4-record course fixture
  * through every O2–O10 child relation, with exact expected cardinalities
  * and the guard semantics of records 102/103/104.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("O2 typed decode parses all records with full schema") {
    val p = CourseFixture.parsed(spark)
    assert(p.count() === 4)
    assert(p.where($"id".isNull).count() === 0)
    assert(p.schema.fieldNames.toSet === CourseFixture.schema.fieldNames.toSet)
  }

  test("O5 null-defaulting: absent optional fields surface as NULL") {
    val p = CourseFixture.parsed(spark)
    val r102 = p.where($"id" === 102)
      .select($"mobile_native_deeplink", $"last_update_date").head()
    assert(r102.isNullAt(0) && r102.isNullAt(1))
  }

  test("golden fan-out cardinalities (1 record -> 12 relations)") {
    // (course_id -> topics, promos, instructors, requirements, outcomes,
    //  images, caption_langs, caption_locales) per the fixture contents.
    val want = Map(
      101L -> Seq(2L, 1L, 2L, 2L, 2L, 2L, 2L, 1L),
      102L -> Seq(1L, 0L, 1L, 0L, 1L, 1L, 0L, 0L),
      103L -> Seq(0L, 0L, 0L, 0L, 1L, 0L, 1L, 1L),
      104L -> Seq(3L, 2L, 3L, 0L, 3L, 2L, 3L, 2L))
    val got = Normalize.q36FanoutCensus(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toSeq).toMap
    assert(got === want)
  }

  test("O9 guard: requirements explode only when .list is a real array") {
    val reqs = Normalize.q34RequirementsGuarded(spark, sfDir)
      .select($"course_id").distinct().as[Long].collect().toSet
    // 101 has 2 items; 102 lacks the key; 103 has list=null; 104 is empty
    assert(reqs === Set(101L))
  }

  test("explode row count equals sum of array sizes (O6/O7)") {
    val p = CourseFixture.parsed(spark)
    val sums = p.agg(
      sum(coalesce(size($"topics"), lit(0))),
      sum(coalesce(size($"instructors"), lit(0)))).head()
    assert(Normalize.q31ExplodeTopics(spark, sfDir).count() === sums.getLong(0))
    assert(Normalize.q32ExplodeInstructors(spark, sfDir).count() === sums.getLong(1))
  }

  test("O8 map explode emits one row per entry with key/value columns") {
    val rows = Normalize.q33ExplodeImages(spark, sfDir)
      .where($"course_id" === 101).as[(Long, String, String)].collect().toSet
    assert(rows === Set((101L, "100x100", "101-100.jpg"),
                        (101L, "480x270", "101-480.jpg")))
  }
}
