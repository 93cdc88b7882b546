package graft

import graft.operators.Urls
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val rows =
    Urls.robots(spark, "/root/testdata/sf0.001").collect()

  test("longest match wins: /p/1x re-allowed under the /p/ disallow") {
    val under1 = rows.filter(r =>
      r.getAs[String]("path").startsWith("/p/1"))
    val others = rows.filter(r => {
      val p = r.getAs[String]("path")
      p.startsWith("/p/") && !p.startsWith("/p/1") && !p.startsWith("/p/2")
    })
    assert(under1.nonEmpty && others.nonEmpty)
    assert(under1.forall(_.getAs[Boolean]("allowed")),
      "Allow /p/1 (longer) must beat Disallow /p/ (shorter)")
    assert(under1.forall(_.getAs[String]("matched_rule") == "/p/1"))
    assert(others.forall(!_.getAs[Boolean]("allowed")),
      "paths under /p/ with no longer rule stay disallowed")
    assert(others.forall(_.getAs[String]("matched_rule") == "/p/"))
  }

  test("equal-length tie goes to Allow (RFC 9309 least-restrictive rule)") {
    val tied = rows.filter(r =>
      r.getAs[String]("host") == "src0.example.com" &&
        r.getAs[String]("path").startsWith("/p/2"))
    assert(tied.nonEmpty)
    assert(tied.forall(_.getAs[Boolean]("allowed")))
    assert(tied.forall(_.getAs[String]("matched_rule") == "/p/2"))
    // the same paths on hosts WITHOUT the tie pair stay disallowed
    val untied = rows.filter(r =>
      r.getAs[String]("host") != "src0.example.com" &&
        r.getAs[String]("path").startsWith("/p/2"))
    assert(untied.nonEmpty && untied.forall(!_.getAs[Boolean]("allowed")))
  }

  test("verdict covers every canonical keeper exactly once") {
    val canon = Urls.urlCanon(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == canon.length)
    assert(rows.map(_.getAs[String]("canon_url")).distinct.length == rows.length)
  }
}
