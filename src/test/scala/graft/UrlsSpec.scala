package graft

import graft.operators.Urls
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("canonical() edge cases: case, tracking params, fragments, scheme-less") {
    val cases = Seq(
      // authority lowercases, PATH case is preserved (RFC 3986)
      ("HTTPS://EX.COM/Path/?utm_x=1#f", "https://ex.com/Path"),
      // non-tracking query strings survive
      ("https://ex.com/p?page=2", "https://ex.com/p?page=2"),
      // fragment-only and slash-only cleanups
      ("https://ex.com/a#sec", "https://ex.com/a"),
      ("https://ex.com/a/", "https://ex.com/a"),
      // already canonical is a fixpoint
      ("https://ex.com/a", "https://ex.com/a"),
      // scheme-less input degrades gracefully (no authority to lower)
      ("ex.com/p/", "ex.com/p"),
      // utm strip takes the WHOLE tracking query, not just one param
      ("https://ex.com/p?utm_a=1&utm_b=2", "https://ex.com/p"),
      // trailing slash collapses ACROSS the query boundary: these two
      // spellings of the same resource must canonicalize identically
      ("https://ex.com/p/?page=2", "https://ex.com/p?page=2"),
      // mixed queries keep their non-tracking params…
      ("https://ex.com/p?a=1&utm_b=2", "https://ex.com/p?a=1"),
      // …whether the utm params lead, trail, or sandwich
      ("https://ex.com/p?utm_a=1&b=2", "https://ex.com/p?b=2"),
      ("https://ex.com/p?utm_a=1&b=2&utm_c=3", "https://ex.com/p?b=2"),
      ("https://ex.com/p?a=1&utm_b=2&c=3", "https://ex.com/p?a=1&c=3"),
      // the full pile-up: slash boundary + mixed utm + fragment
      ("https://ex.com/p/?utm_a=1&page=2#f", "https://ex.com/p?page=2"),
      // all-utm with slash boundary leaves a clean path
      ("https://ex.com/p/?utm_a=1&utm_b=2", "https://ex.com/p"))
    val out = cases.map(_._1).toDF("url")
      .select(col("url"), Urls.canonical(col("url")).as("canon"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (in, want) =>
      assert(out(in) == want, s"canonical('$in') = '${out(in)}', want '$want'")
    }
    // idempotence: canonical(canonical(x)) == canonical(x)
    val twice = cases.map(_._2).toDF("url")
      .select(col("url"), Urls.canonical(col("url")).as("canon"))
      .as[(String, String)].collect()
    twice.foreach { case (in, c) => assert(c == in, s"not a fixpoint: $in -> $c") }
  }
}
