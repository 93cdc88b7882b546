package graft

import graft.operators.Scrub
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the unit splitter and the mix-sample rate curve —
  * the invariants hold for ANY input, not just the corpus. (Raw
  * scalacheck Gen with fixed seeds; the scalatest bridge artifact isn't
  * in the offline cache.)
  */
class ScrubPropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val word = Gen.chooseNum(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val doc = Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, word))
  private val widthGen = Gen.chooseNum(1, 9)

  private def cases: Seq[(List[String], Int)] = (1 to 100).map { s =>
    val p = Gen.Parameters.default
    (doc.apply(p, Seed(s)).getOrElse(Nil),
      widthGen.apply(p, Seed(s * 104729L)).getOrElse(4))
  }

  test("units cover floor(n/w) windows exactly and reassemble to the token prefix") {
    for (((ws, w), i) <- cases.zipWithIndex) {
      val df = Seq((i.toLong, ws.mkString(" "))).toDF("doc_id", "text")
      val units = df.select(
        Scrub.units(graft.functions.TextSim.tokens(col("text")), w).as("us"))
        .as[Seq[String]].head()
      val toks = ws.filter(_.nonEmpty)
      assert(units.length == toks.length / w, s"case $i: ${units.length} windows")
      // every unit is w words; concatenated they are the token prefix
      assert(units.forall(_.split(" ").length == w), s"case $i width")
      assert(units.flatMap(_.split(" ")) == toks.take(toks.length / w * w),
        s"case $i prefix")
    }
  }

  test("mix-sample keep thresholds are monotone in domain size and never exceed 1") {
    // rates as the operator computes them, over a synthetic domain-size
    // sweep: bigger domains never get a HIGHER keep rate, tiny domains
    // keep everything
    val sizes = Seq(1L, 5L, 15L, 16L, 100L, 10000L)
    val df = sizes.toDF("n_docs")
      .withColumn("keep_below",
        least(lit(10000L),
          floor(sqrt(lit(graft.operators.Corpus.MixTarget.toDouble) /
            col("n_docs").cast("double")) * 1e4 + lit(0.5))))
    val out = df.as[(Long, Long)].collect().toMap
    assert(sizes.forall(out(_) <= 10000L))
    assert(sizes.sliding(2).forall { case Seq(a, b) => out(a) >= out(b) })
    // at or below the target, everything survives
    assert(out(1L) == 10000L && out(15L) == 10000L)
    // expected sample size of a big domain ~= sqrt(target * n)
    assert(math.abs(out(10000L) / 10000.0 * 10000 - math.sqrt(15.0 * 10000)) < 1)
  }
}
