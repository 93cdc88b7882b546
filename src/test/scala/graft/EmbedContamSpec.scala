package graft

import graft.operators.EmbedContam
import graft.sources.IndexStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EmbedContamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("every planted verbatim leak is flagged at cosine 1.0") {
    val out = EmbedContam.embedContam(spark, sf)
      .select(col("train_id"), col("eval_id"), col("cos_sim"))
      .as[(Long, Long, Double)].collect()
    val planted = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % EmbedContam.EvalMod === 0)
      .select(col("vec_id")).as[Long].collect()
      .map(id => (id + 1000000L, id)).toSet
    val flagged = out.map(r => (r._1, r._2)).toSet
    assert(planted.subsetOf(flagged),
      s"missing planted leaks: ${planted -- flagged}")
    val plantedScores = out.filter(r => planted((r._1, r._2))).map(_._3)
    assert(plantedScores.forall(_ == 1.0))
  }

  test("the exact screen never shuffles: eval broadcasts past the scan") {
    val aug = Tables.embAug(spark, sf)
    val ev = aug.filter(col("vec_id") % EmbedContam.EvalMod === 0 &&
      col("vec_id") < 1000000L)
    val tr = aug.filter(col("vec_id") % EmbedContam.EvalMod =!= 0 ||
      col("vec_id") >= 1000000L)
    val plan = EmbedContam.screen(tr, ev).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus must not shuffle:\n$plan")
    assert(plan.contains("BroadcastExchange") || plan.contains("Broadcast"),
      "eval side must broadcast")
  }

  test("served screen off the stored index: subset of exact, full recall wide open") {
    val dir = java.nio.file.Files.createTempDirectory("contam-ix").toString
    val aug = Tables.embAug(spark, sf)
    val ev = aug.filter(col("vec_id") % EmbedContam.EvalMod === 0 &&
      col("vec_id") < 1000000L)
    val tr = aug.filter(col("vec_id") % EmbedContam.EvalMod =!= 0 ||
      col("vec_id") >= 1000000L)
    IndexStore.build(tr, dir, dim = 64, nlist = 8, m = 8, kcode = 16, iters = 3)
    val h = IndexStore.open(spark, dir)
    val served = EmbedContam.screenServed(spark, h, tr, ev, nprobe = 8)
      .select(col("train_id"), col("eval_id")).as[(Long, Long)].collect().toSet
    val exact = EmbedContam.screen(tr, ev)
      .select(col("train_id"), col("eval_id")).as[(Long, Long)].collect().toSet
    assert(served.subsetOf(exact),
      s"re-ranked pairs must be verified-true: ${served -- exact}")
    val planted = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % EmbedContam.EvalMod === 0)
      .select(col("vec_id")).as[Long].collect()
      .map(id => (id + 1000000L, id)).toSet
    assert(planted.subsetOf(served),
      s"full probing must catch every verbatim leak: ${planted -- served}")
  }
}
