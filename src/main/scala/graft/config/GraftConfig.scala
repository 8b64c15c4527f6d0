package graft.config

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Typed config surface mirroring the reference's dotenv contract
  * (/root/reference/.env_template:1–10; loaded by
  * scripts/course_catalog.py:15–50 and user_course_activity.py:15–50):
  * five DB connection keys, two API credentials, two account keys.
  *
  * Deviations from the reference, both deliberate:
  *  - the reference `os.getenv`s each key with a None default and lets
  *    psycopg2/requests fail later; this loader FAILS FAST with the full
  *    list of missing keys (a 1000-executor job should die at submit
  *    time, not after the cluster spins up);
  *  - results are typed case classes, not string dicts — DB_PORT parses
  *    to Int at load.
  *
  * Precedence follows dotenv semantics: real environment variables win
  * over `.env` file entries (load_dotenv's default `override=False`).
  */
object GraftConfig {

  final case class DbConfig(name: String, user: String, password: String,
                            host: String, port: Int) {
    /** JDBC form of the reference's psycopg2 connection params. */
    def jdbcUrl(scheme: String = "postgresql"): String =
      s"jdbc:$scheme://$host:$port/$name"
  }
  final case class ApiCredentials(clientKey: String, clientSecret: String)
  final case class AccountDetails(name: String, id: String) {
    /** course_catalog.py:236 */
    def catalogStartUrl(pageSize: Int = 20): String =
      s"https://$name.udemy.com/api-2.0/organizations/$id/courses/list/?page_size=$pageSize&page=1"
    /** user_course_activity.py:198 */
    def activityStartUrl: String =
      s"https://$name.udemy.com/api-2.0/organizations/$id/analytics/user-course-activity/"
  }
  final case class Loaded(db: DbConfig, api: ApiCredentials, account: AccountDetails)

  sealed trait ConfigError { def message: String }
  final case class MissingFile(path: String) extends ConfigError {
    def message = s"env file not found: $path" // reference exit(1) analogue
  }
  final case class MissingKeys(keys: Seq[String]) extends ConfigError {
    def message = s"missing required config keys: ${keys.mkString(", ")}"
  }
  final case class BadValue(key: String, detail: String) extends ConfigError {
    def message = s"bad value for $key: $detail"
  }

  val RequiredKeys: Seq[String] = Seq(
    "DB_NAME", "DB_USER", "DB_PASSWORD", "DB_HOST", "DB_PORT",
    "CLIENT_KEY", "CLIENT_SECRET", "ACCOUNT_NAME", "ACCOUNT_ID")

  /** Parse dotenv lines: `KEY=VALUE`, `#` comments (full-line, or inline
    * after whitespace in an UNQUOTED value — python-dotenv semantics, so
    * `DB_PORT=5432 # prod` reads as `5432` while a quoted `"pass #1"`
    * keeps its `#`, and `"v" # comment` strips BOTH the comment and the
    * quotes) and blanks ignored, values may contain `=` and embedded
    * `#` (only a whitespace-preceded `#` starts a comment). A leading
    * `export ` prefix is stripped (python-dotenv accepts shell-sourceable
    * files: `export KEY=VALUE` binds `KEY`). Malformed lines are skipped
    * (dotenv behavior), not errors.
    */
  def parseDotenv(lines: Seq[String]): Map[String, String] =
    lines.iterator
      .map(_.trim)
      .map(l => if (l.startsWith("export ")) l.stripPrefix("export ").trim else l)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        l.indexOf('=') match {
          case i if i > 0 =>
            val k = l.substring(0, i).trim
            val raw = l.substring(i + 1).trim
            val v =
              if (raw.nonEmpty && (raw.head == '"' || raw.head == '\'')) {
                // quoted: value = up to the MATCHING close quote; anything
                // after (e.g. an inline comment) is discarded. An
                // unterminated quote keeps the literal (dotenv behavior).
                val close = raw.indexOf(raw.head, 1)
                if (close > 0) raw.substring(1, close) else raw
              } else {
                // unquoted: cut at the first whitespace-PRECEDED '#'
                // (an embedded 'db#1' '#' is part of the value)
                raw.indices.find(j =>
                  raw(j) == '#' && (j == 0 || raw(j - 1).isWhitespace)) match {
                  case Some(0) => ""
                  case Some(j) => raw.substring(0, j).trim
                  case None    => raw
                }
              }
            Some(k -> v)
          case _ => None
        }
      }.toMap

  /** Build the typed config from a resolved key→value map. */
  def fromMap(vars: Map[String, String]): Either[ConfigError, Loaded] = {
    val missing = RequiredKeys.filter(k => vars.get(k).forall(_.isEmpty))
    if (missing.nonEmpty) Left(MissingKeys(missing))
    else {
      val portStr = vars("DB_PORT")
      portStr.toIntOption match {
        case None => Left(BadValue("DB_PORT", s"'$portStr' is not an integer"))
        case Some(port) =>
          Right(Loaded(
            DbConfig(vars("DB_NAME"), vars("DB_USER"), vars("DB_PASSWORD"),
                     vars("DB_HOST"), port),
            ApiCredentials(vars("CLIENT_KEY"), vars("CLIENT_SECRET")),
            AccountDetails(vars("ACCOUNT_NAME"), vars("ACCOUNT_ID"))))
      }
    }
  }

  /** Load from a `.env` file with environment overlay (env wins). */
  def fromFile(path: Path,
               env: Map[String, String] = sys.env): Either[ConfigError, Loaded] =
    if (!Files.exists(path)) Left(MissingFile(path.toString))
    else fromMap(parseDotenv(Files.readAllLines(path).asScala.toSeq) ++
                 env.view.filterKeys(RequiredKeys.contains).toMap)
}
