package graft

import graft.operators.Outliers
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OutliersSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def mkDoc(words: Int): String = Seq.fill(words)("w").mkString(" ")

  test("a planted megadoc is flagged; the bulk is not") {
    val docs = ((1 to 30).map(i => (i.toLong, "web", mkDoc(100 + i % 5))) :+
      (99L, "web", mkDoc(5000))).toDF("doc_id", "source", "text")
    val r = Outliers.lengthOutliers(docs)
      .select("doc_id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(r(99L), "megadoc must be flagged")
    assert((1 to 30).forall(i => !r(i.toLong)), "bulk must pass")
  }

  test("median/MAD are robust: the flag ignores the outlier's own drag") {
    // mean/std would put the cut near the megadoc; median/MAD keep the
    // gate at the bulk — a second, smaller anomaly is still caught
    val docs = ((1 to 40).map(i => (i.toLong, "web", mkDoc(100 + i % 7))) ++
      Seq((98L, "web", mkDoc(1200)), (99L, "web", mkDoc(50000))))
      .toDF("doc_id", "source", "text")
    val r = Outliers.lengthOutliers(docs)
      .select("doc_id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(r(98L) && r(99L), "both anomalies flagged despite the giant")
  }

  test("degenerate source (MAD = 0) scores null z and never flags") {
    val docs = (1 to 10).map(i => (i.toLong, "const", mkDoc(50)))
      .toDF("doc_id", "source", "text")
    val r = Outliers.lengthOutliers(docs)
      .select("mad", "z", "is_outlier")
      .as[(Long, Option[Double], Boolean)].collect()
    assert(r.forall { case (mad, z, f) => mad == 0L && z.isEmpty && !f })
  }

  test("per-source isolation: one source's giants don't move another's gate") {
    val web = (1 to 20).map(i => (i.toLong, "web", mkDoc(100 + i % 5)))
    val dump = (101 to 120).map(i => (i.toLong, "dump", mkDoc(8000 + i % 3)))
    val probe = Seq((999L, "web", mkDoc(8000)))
    val docs = (web ++ dump ++ probe).toDF("doc_id", "source", "text")
    val r = Outliers.lengthOutliers(docs)
      .select("doc_id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(r(999L), "8000-word doc is an outlier FOR web")
    assert((101 to 120).forall(i => !r(i.toLong)),
      "same length is normal FOR dump")
  }

  test("fixture query runs, flags are a small minority, medians positive") {
    val rows = Outliers.outliersQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    val flagged = rows.count(_.getBoolean(6))
    assert(flagged.toDouble / rows.length < 0.1,
      s"$flagged/${rows.length} flagged — robust gate should be selective")
    assert(rows.forall(_.getLong(3) > 0L))
  }
}
