package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** O2–O10: the reference's JSON normalization fan-out, Spark-first.
  *
  * The reference consumes one nested course document per row and emits rows
  * into 12 tables via per-row Python loops + INSERTs
  * (course_catalog.py:90–167). Here the same fan-out is declarative: parse
  * once with `from_json` (O2), then each child relation is a
  * projection/`explode` over the parsed struct — Catalyst prunes the parse
  * to just the fields each query touches (`ColumnPruning` pushes struct
  * field extraction into the `from_json` call as a pruned schema), and every
  * explode is a `Generate` operator that runs inside whole-stage codegen.
  * Nothing shuffles until an aggregation asks for it — at 100 TB the
  * fan-out itself is embarrassingly parallel, one pass per child table over
  * the parsed batch.
  *
  * Oracle twins read the IDENTICAL literal records via
  * `CourseFixture.valuesClause` and DuckDB's JSON functions
  * (`json_extract`, `json_transform` + `unnest`, `json_keys`).
  */
object Normalize {

  import CourseFixture.{parsed, valuesClause}

  // ─── q30: wide typed projection + struct paths (O2/O3/O4/O5) ───────────
  // The reference's 19-col courses INSERT (course_catalog.py:94–108) with
  // struct-path access `course['locale']['locale']` (:107),
  // `primary_category['title']` (:112) and `.get()` null-defaulting for
  // deeplink/last_update_date (:102–106).
  def q30CourseFlatten(s: SparkSession, d: String): DataFrame =
    parsed(s).select(
      col("id").as("course_id"),
      col("title"),
      col("level"),
      col("locale.locale").as("locale"),
      col("primary_category.title").as("category"),
      col("primary_subcategory.title").as("subcategory"),
      col("mobile_native_deeplink").as("deeplink"),
      col("num_lectures").cast("long").as("n_lectures"),
      col("has_closed_caption").as("has_cc"),
      col("last_update_date").as("last_update"))
    .orderBy(col("course_id"))

  val q30Sql: String =
    s"""SELECT CAST(json_extract(body, '$$.id') AS BIGINT) AS course_id,
       |  json_extract_string(body, '$$.title') AS title,
       |  json_extract_string(body, '$$.level') AS level,
       |  json_extract_string(body, '$$.locale.locale') AS locale,
       |  json_extract_string(body, '$$.primary_category.title') AS category,
       |  json_extract_string(body, '$$.primary_subcategory.title') AS subcategory,
       |  json_extract_string(body, '$$.mobile_native_deeplink') AS deeplink,
       |  CAST(json_extract(body, '$$.num_lectures') AS BIGINT) AS n_lectures,
       |  CAST(json_extract_string(body, '$$.has_closed_caption') AS BOOLEAN) AS has_cc,
       |  CAST(json_extract_string(body, '$$.last_update_date') AS DATE) AS last_update
       |FROM $valuesClause
       |ORDER BY course_id""".stripMargin

  // ─── q31: explode array-of-struct (O6) — topics ────────────────────────
  // course_catalog.py:123–125: one child row per topic element.
  def q31ExplodeTopics(s: SparkSession, d: String): DataFrame =
    parsed(s)
      .select(col("id").as("course_id"), explode(col("topics")).as("t"))
      .select(col("course_id"), col("t.id").as("topic_id"),
              col("t.title").as("topic_title"), col("t.url").as("topic_url"))
      .orderBy(col("course_id"), col("topic_id"))

  val q31Sql: String =
    s"""SELECT course_id, t.id AS topic_id, t.title AS topic_title,
       |  t.url AS topic_url
       |FROM (
       |  SELECT CAST(json_extract(body, '$$.id') AS BIGINT) AS course_id,
       |    unnest(json_transform(json_extract(body, '$$.topics'),
       |      '[{"id":"BIGINT","title":"VARCHAR","url":"VARCHAR"}]')) AS t
       |  FROM $valuesClause)
       |ORDER BY course_id, topic_id""".stripMargin

  // ─── q32: explode array-of-string (O7) — instructors ───────────────────
  // course_catalog.py:133–135.
  def q32ExplodeInstructors(s: SparkSession, d: String): DataFrame =
    parsed(s)
      .select(col("id").as("course_id"),
              explode(col("instructors")).as("instructor"))
      .orderBy(col("course_id"), col("instructor"))

  val q32Sql: String =
    s"""SELECT CAST(json_extract(body, '$$.id') AS BIGINT) AS course_id,
       |  unnest(json_transform(json_extract(body, '$$.instructors'),
       |    '["VARCHAR"]')) AS instructor
       |FROM $valuesClause
       |ORDER BY course_id, instructor""".stripMargin

  // ─── q33: explode map (O8) — images size→url ───────────────────────────
  // course_catalog.py:149–151: `course['images'].items()`.
  def q33ExplodeImages(s: SparkSession, d: String): DataFrame =
    parsed(s)
      .select(col("id").as("course_id"), explode(col("images")))
      .withColumnRenamed("key", "size_key")
      .withColumnRenamed("value", "url")
      .orderBy(col("course_id"), col("size_key"))

  val q33Sql: String =
    s"""WITH k AS (
       |  SELECT CAST(json_extract(body, '$$.id') AS BIGINT) AS course_id,
       |    json_extract(body, '$$.images') AS imgs,
       |    unnest(json_keys(body, '$$.images')) AS size_key
       |  FROM $valuesClause)
       |SELECT course_id, size_key,
       |  json_extract_string(imgs, '$$."' || size_key || '"') AS url
       |FROM k
       |ORDER BY course_id, size_key""".stripMargin

  // ─── q34: guarded explode (O9) — requirements ──────────────────────────
  // course_catalog.py:138–141: emit only when the `requirements` key exists
  // AND `.list` is a list. With a typed schema both "key absent" (102) and
  // "list is null" (103) surface as NULL, and an empty list (104) explodes
  // to zero rows — the isNotNull guard + plain explode reproduce the
  // reference's emit-only-if-present semantics exactly.
  def q34RequirementsGuarded(s: SparkSession, d: String): DataFrame =
    parsed(s)
      .where(col("requirements.list").isNotNull)
      .select(col("id").as("course_id"),
              explode(col("requirements.list")).as("requirement"))
      .orderBy(col("course_id"), col("requirement"))

  val q34Sql: String =
    s"""SELECT CAST(json_extract(body, '$$.id') AS BIGINT) AS course_id,
       |  unnest(json_transform(json_extract(body, '$$.requirements.list'),
       |    '["VARCHAR"]')) AS requirement
       |FROM $valuesClause
       |WHERE json_type(body, '$$.requirements.list') = 'ARRAY'
       |ORDER BY course_id, requirement""".stripMargin

  // ─── q35: nested-list unwrap (O10) — what_you_will_learn ───────────────
  // course_catalog.py:144–146: unguarded `.list` explode.
  def q35UnwrapLearn(s: SparkSession, d: String): DataFrame =
    parsed(s)
      .select(col("id").as("course_id"),
              explode(col("what_you_will_learn.list")).as("outcome"))
      .orderBy(col("course_id"), col("outcome"))

  val q35Sql: String =
    s"""SELECT CAST(json_extract(body, '$$.id') AS BIGINT) AS course_id,
       |  unnest(json_transform(
       |    json_extract(body, '$$.what_you_will_learn.list'),
       |    '["VARCHAR"]')) AS outcome
       |FROM $valuesClause
       |ORDER BY course_id, outcome""".stripMargin

  // ─── q36: fan-out census — all child cardinalities in one parse ────────
  // The composite pipeline shape (course_catalog.py:90–167): 1 record → 12
  // tables. One pass computes every child relation's cardinality; at scale
  // this is the cheap pre-flight that sizes each fan-out write.
  def q36FanoutCensus(s: SparkSession, d: String): DataFrame =
    parsed(s).select(
      col("id").as("course_id"),
      coalesce(size(col("topics")), lit(0)).cast("long").as("n_topics"),
      coalesce(size(col("promo_video_url")), lit(0)).cast("long").as("n_promos"),
      coalesce(size(col("instructors")), lit(0)).cast("long").as("n_instructors"),
      coalesce(size(col("requirements.list")), lit(0)).cast("long").as("n_requirements"),
      coalesce(size(col("what_you_will_learn.list")), lit(0)).cast("long").as("n_outcomes"),
      coalesce(size(col("images")), lit(0)).cast("long").as("n_images"),
      coalesce(size(col("caption_languages")), lit(0)).cast("long").as("n_caption_langs"),
      coalesce(size(col("caption_locales")), lit(0)).cast("long").as("n_caption_locales"))
    .orderBy(col("course_id"))

  val q36Sql: String =
    s"""SELECT CAST(json_extract(body, '$$.id') AS BIGINT) AS course_id,
       |  CAST(coalesce(json_array_length(body, '$$.topics'), 0) AS BIGINT) AS n_topics,
       |  CAST(coalesce(json_array_length(body, '$$.promo_video_url'), 0) AS BIGINT) AS n_promos,
       |  CAST(coalesce(json_array_length(body, '$$.instructors'), 0) AS BIGINT) AS n_instructors,
       |  CAST(coalesce(json_array_length(body, '$$.requirements.list'), 0) AS BIGINT) AS n_requirements,
       |  CAST(coalesce(json_array_length(body, '$$.what_you_will_learn.list'), 0) AS BIGINT) AS n_outcomes,
       |  CAST(coalesce(len(json_keys(body, '$$.images')), 0) AS BIGINT) AS n_images,
       |  CAST(coalesce(json_array_length(body, '$$.caption_languages'), 0) AS BIGINT) AS n_caption_langs,
       |  CAST(coalesce(json_array_length(body, '$$.caption_locales'), 0) AS BIGINT) AS n_caption_locales
       |FROM $valuesClause
       |ORDER BY course_id""".stripMargin

  // ─── q37: explode array-of-struct #2 — caption_locales ─────────────────
  // course_catalog.py:159–161; empty arrays (102) must produce no rows.
  def q37CaptionLocales(s: SparkSession, d: String): DataFrame =
    parsed(s)
      .select(col("id").as("course_id"), explode(col("caption_locales")).as("cl"))
      .select(col("course_id"), col("cl.locale").as("cl_locale"),
              col("cl.title").as("cl_title"),
              col("cl.english_title").as("cl_english"))
      .orderBy(col("course_id"), col("cl_locale"))

  val q37Sql: String =
    s"""SELECT course_id, cl.locale AS cl_locale, cl.title AS cl_title,
       |  cl.english_title AS cl_english
       |FROM (
       |  SELECT CAST(json_extract(body, '$$.id') AS BIGINT) AS course_id,
       |    unnest(json_transform(json_extract(body, '$$.caption_locales'),
       |      '[{"locale":"VARCHAR","title":"VARCHAR","english_title":"VARCHAR"}]')) AS cl
       |  FROM $valuesClause)
       |ORDER BY course_id, cl_locale""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_course_flatten"       -> (q30CourseFlatten _),
    "q31_explode_topics"       -> (q31ExplodeTopics _),
    "q32_explode_instructors"  -> (q32ExplodeInstructors _),
    "q33_explode_images"       -> (q33ExplodeImages _),
    "q34_requirements_guarded" -> (q34RequirementsGuarded _),
    "q35_unwrap_learn"         -> (q35UnwrapLearn _),
    "q36_fanout_census"        -> (q36FanoutCensus _),
    "q37_caption_locales"      -> (q37CaptionLocales _),
  )

  val oracleSql: Map[String, String] = Map(
    "q30_course_flatten"       -> q30Sql,
    "q31_explode_topics"       -> q31Sql,
    "q32_explode_instructors"  -> q32Sql,
    "q33_explode_images"       -> q33Sql,
    "q34_requirements_guarded" -> q34Sql,
    "q35_unwrap_learn"         -> q35Sql,
    "q36_fanout_census"        -> q36Sql,
    "q37_caption_locales"      -> q37Sql,
  )
}
