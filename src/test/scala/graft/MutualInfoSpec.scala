package graft

import graft.operators.MutualInfo
import org.scalatest.funsuite.AnyFunSuite

class MutualInfoSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame) =
    MutualInfo.mutualInfo(df, "lang", "source").collect().head

  test("perfectly dependent facets: MI = H(X) = H(Y), NMI = 1") {
    // lang determines source bijectively: 2 langs, 2 sources, balanced
    val df = (Seq.fill(50)(("en", "web")) ++ Seq.fill(50)(("de", "books")))
      .toDF("lang", "source")
    val r = row(df)
    val (hx, hy, mi, nmi) = (r.getAs[Double]("h_x"), r.getAs[Double]("h_y"),
      r.getAs[Double]("mi_nats"), r.getAs[Double]("nmi"))
    assert(math.abs(hx - math.log(2)) < 1e-5)
    assert(mi == hx && mi == hy, s"bijection: MI must equal both entropies: $r")
    assert(math.abs(nmi - 1.0) < 1e-6)
  }

  test("independent facets: MI ~ 0, even with unbalanced marginals") {
    // every (lang, source) cell gets count proportional to the product
    // of its marginals: exact independence
    val langs = Seq("en" -> 3, "de" -> 1)
    val sources = Seq("web" -> 2, "books" -> 1, "wiki" -> 1)
    val df = (for {
      (l, lc) <- langs; (s, sc) <- sources
      _ <- 1 to lc * sc * 5
    } yield (l, s)).toDF("lang", "source")
    val r = row(df)
    // micro-nat rounding leaves |MI| < a few micro-nats, not exactly 0
    assert(math.abs(r.getAs[Double]("mi_nats")) < 1e-4, r.toString)
    assert(r.getAs[Long]("n_cells") == 6L)
  }

  test("degenerate facet: H = 0 exactly, NMI NULL (never inf/NaN)") {
    val df = Seq.fill(40)(("en", "web")).toDF("lang", "source") // both constant
    val r = row(df)
    assert(r.getAs[Double]("h_x") == 0.0 && r.getAs[Double]("h_y") == 0.0)
    assert(r.getAs[Double]("mi_nats") == 0.0)
    assert(r.isNullAt(r.fieldIndex("nmi")))
  }

  test("partial dependence sits strictly between 0 and min entropy") {
    // en skews web, de skews books — dependent but not deterministic
    val df = (Seq.fill(40)(("en", "web")) ++ Seq.fill(10)(("en", "books")) ++
      Seq.fill(10)(("de", "web")) ++ Seq.fill(40)(("de", "books")))
      .toDF("lang", "source")
    val r = row(df)
    val mi = r.getAs[Double]("mi_nats")
    assert(mi > 0.05 && mi < r.getAs[Double]("h_x"), r.toString)
    val nmi = r.getAs[Double]("nmi")
    assert(nmi > 0 && nmi < 1)
  }
}
