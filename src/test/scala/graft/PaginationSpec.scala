package graft

import graft.sources.Pagination
import graft.sources.Pagination.{Decision, Failure, Page}
import org.scalatest.funsuite.AnyFunSuite

/** O1/O16/O17/O18 source semantics, fixture-driven (no sockets). */
class PaginationSpec extends AnyFunSuite {

  private val pages = Map(
    "p1" -> Page(Seq("r1", "r2"), Some("p2")),
    "p2" -> Page(Seq("r3"), Some("p3")),
    "p3" -> Page(Seq("r4"), None))

  test("cursor chain follows next until null and counts progress (O1/O18)") {
    val (out, stats) =
      Pagination.fetchAll("p1", u => Right(pages(u)), Pagination.catalogPolicy)
    assert(out === Vector("r1", "r2", "r3", "r4"))
    assert(stats === Pagination.IngestStats(3, 4, 0, 0, aborted = false))
  }

  test("catalog policy: 524 sleeps 1800s and retries; other HTTP aborts (O16)") {
    var failures = List(Failure.Http(524), Failure.MalformedBody)
    var slept = Vector.empty[Int]
    val fetch: String => Either[Failure, Page] = u =>
      if (u == "p2" && failures.nonEmpty) {
        val f = failures.head; failures = failures.tail; Left(f)
      } else Right(pages(u))
    val (out, stats) = Pagination.fetchAll("p1", fetch,
      Pagination.catalogPolicy, sleep = slept :+= _)
    assert(out.size === 4)
    assert(stats.retries === 2)
    assert(slept === Vector(1800, 1800))

    // a 404 mid-run aborts but keeps prior pages (course_catalog.py `break`)
    val fetch404: String => Either[Failure, Page] = {
      case "p2" => Left(Failure.Http(404))
      case u    => Right(pages(u))
    }
    val (partial, st2) =
      Pagination.fetchAll("p1", fetch404, Pagination.catalogPolicy)
    assert(partial === Vector("r1", "r2") && st2.aborted)
  }

  test("activity policy classifies 503/429 as retry and 500 as fatal (O16)") {
    assert(Pagination.activityPolicy(Failure.Http(503)) === Decision.RetryAfter(3600))
    assert(Pagination.activityPolicy(Failure.Http(429)) === Decision.RetryAfter(1800))
    assert(Pagination.activityPolicy(Failure.Http(500)) === Decision.Fail)
    intercept[Pagination.FatalFetchException] {
      Pagination.fetchAll("p1", _ => Left(Failure.Http(500)),
        Pagination.activityPolicy)
    }
  }

  test("permanent retryable failure trips maxRetriesPerPage") {
    intercept[Pagination.FatalFetchException] {
      Pagination.fetchAll("p1", _ => Left(Failure.Http(524)),
        Pagination.catalogPolicy, maxRetriesPerPage = 3)
    }
  }

  test("rate limiter sleeps 300s per 1k and 1800s per 10k records (O17)") {
    var slept = Vector.empty[Int]
    val rl = new Pagination.RateLimiter(slept :+= _)
    rl.recordsIngested(10000)
    // 1000..9000 → 9×300s; 10000 → 1800s (the reference's ≤2.2 rec/s
    // ceiling: 4500s of sleep per 10k records, SURVEY §6)
    assert(slept.count(_ == 300) === 9)
    assert(slept.count(_ == 1800) === 1)
    assert(rl.sleptSeconds === 4500)
    assert(rl.totalIngested === 10000)
  }
}
