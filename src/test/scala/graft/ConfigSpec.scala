package graft

import graft.config.GraftConfig
import graft.config.GraftConfig._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Dotenv config contract: 9 required keys mirroring
  * /root/reference/.env_template, fail-fast with the full missing list,
  * env-over-file precedence, typed port.
  */
class ConfigSpec extends AnyFunSuite {

  private val full = Seq(
    "# .env",
    "DB_NAME=graft",
    "DB_USER=etl",
    "DB_PASSWORD='s3cr=t'", // quoted value containing '='
    "DB_HOST=db.internal",
    "DB_PORT=5432",
    "",
    "CLIENT_KEY=\"ck\"",
    "CLIENT_SECRET=cs",
    "",
    "ACCOUNT_NAME=acme",
    "ACCOUNT_ID=42")

  test("full template parses into typed config with quotes stripped") {
    val Right(c) = fromMap(parseDotenv(full)): @unchecked
    assert(c.db === DbConfig("graft", "etl", "s3cr=t", "db.internal", 5432))
    assert(c.db.jdbcUrl() === "jdbc:postgresql://db.internal:5432/graft")
    assert(c.api === ApiCredentials("ck", "cs"))
    assert(c.account.catalogStartUrl() ===
      "https://acme.udemy.com/api-2.0/organizations/42/courses/list/?page_size=20&page=1")
    assert(c.account.activityStartUrl ===
      "https://acme.udemy.com/api-2.0/organizations/42/analytics/user-course-activity/")
  }

  test("inline comments strip from unquoted values, survive in quoted ones") {
    val parsed = parseDotenv(Seq(
      "DB_PORT=5432 # prod port",
      "DB_HOST=db#1.internal # primary", // embedded # kept, comment cut
      "DB_PASSWORD='pass #1' ",          // quoted -> # untouched
      "CLIENT_KEY=\"ck\" # quoted THEN commented",
      "DB_USER= # only a comment"))
    assert(parsed("DB_PORT") === "5432")
    assert(parsed("DB_HOST") === "db#1.internal")
    assert(parsed("DB_PASSWORD") === "pass #1")
    assert(parsed("CLIENT_KEY") === "ck")
    assert(parsed("DB_USER") === "")
  }

  test("'export KEY=VALUE' binds KEY (shell-sourceable dotenv form)") {
    val parsed = parseDotenv(Seq(
      "export DB_HOST=db.internal",
      "export DB_PORT=5432 # inline comment still strips",
      "EXPORTED=keep",       // no space: not the export form
      "export=literal"))     // key literally named 'export'
    assert(parsed("DB_HOST") === "db.internal")
    assert(parsed("DB_PORT") === "5432")
    assert(parsed("EXPORTED") === "keep")
    assert(parsed("export") === "literal")
    assert(!parsed.contains("export DB_HOST"))
  }

  test("missing required keys fail fast with the complete list") {
    val Left(err) = fromMap(parseDotenv(full.filterNot(l =>
      l.startsWith("DB_PASSWORD") || l.startsWith("ACCOUNT_ID")))): @unchecked
    assert(err === MissingKeys(Seq("DB_PASSWORD", "ACCOUNT_ID")))
    assert(err.message.contains("DB_PASSWORD") && err.message.contains("ACCOUNT_ID"))
  }

  test("empty values count as missing (reference CHANGE_ME placeholders)") {
    val Left(err) = fromMap(parseDotenv(full.map(l =>
      if (l.startsWith("DB_USER")) "DB_USER=" else l))): @unchecked
    assert(err === MissingKeys(Seq("DB_USER")))
  }

  test("non-integer DB_PORT is a BadValue, not a crash downstream") {
    val Left(err) = fromMap(parseDotenv(full.map(l =>
      if (l.startsWith("DB_PORT")) "DB_PORT=fivefourthreetwo" else l))): @unchecked
    assert(err.isInstanceOf[BadValue])
    assert(err.message.contains("DB_PORT"))
  }

  test("missing file is its own error (reference exit(1) analogue)") {
    val Left(err) = fromFile(Paths.get("/nonexistent/.env")): @unchecked
    assert(err === MissingFile("/nonexistent/.env"))
  }

  test("real environment variables win over file entries (dotenv default)") {
    val dir = Files.createTempDirectory("graftenv")
    val f = dir.resolve(".env")
    Files.write(f, String.join("\n", full: _*).getBytes)
    val Right(c) = fromFile(f, env = Map("DB_HOST" -> "override.host")): @unchecked
    assert(c.db.host === "override.host")
    assert(c.db.name === "graft") // file value survives where env is silent
  }
}
