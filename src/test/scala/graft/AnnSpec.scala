package graft

import graft.operators.{Ann, KMeansVec}
import graft.sources.{MediaExtract, MediaTransforms}
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("kmeans fit is deterministic and returns k centroids") {
    val vecs = Tables.embeddings(spark, sf)
    val c1 = KMeansVec.fit(vecs, 8, 2)
      .select("cent_id", "c_emb").as[(Long, Array[Float])].collect()
      .sortBy(_._1)
    val c2 = KMeansVec.fit(vecs, 8, 2)
      .select("cent_id", "c_emb").as[(Long, Array[Float])].collect()
      .sortBy(_._1)
    assert(c1.length == 8)
    assert(c1.map(_._1).sameElements(c2.map(_._1)))
    c1.zip(c2).foreach { case ((_, a), (_, b)) => assert(a.sameElements(b)) }
  }

  test("kmeans assignment covers every vector exactly once") {
    val vecs = Tables.embeddings(spark, sf)
    val cents = KMeansVec.fit(vecs, 8, 2)
    val e = vecs.selectExpr("vec_id", "embedding")
      .withColumn("nrm", Ann.norm(org.apache.spark.sql.functions.col("embedding")))
    val assigned = KMeansVec.assign(e, cents)
    assert(assigned.count() == vecs.count())
    assert(assigned.select("vec_id").distinct().count() == vecs.count())
  }

  test("trained IVF achieves decent recall vs brute force") {
    val brute = Ann.bruteForce(spark, sf)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfTrained(spark, sf, k = 8, iters = 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@${Ann.TopK} = $recall too low")
  }

  test("centroid assignment is shuffle-free (no Exchange, no Window sort)") {
    val vecs = Tables.embeddings(spark, sf)
    val e = vecs.selectExpr("vec_id", "embedding")
      .withColumn("nrm", Ann.norm(org.apache.spark.sql.functions.col("embedding")))
    val cents = KMeansVec.fit(vecs, 8, 1)
    val plan = KMeansVec.assign(e, cents).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
    assert(!plan.contains("Window"), s"assignment must not sort/window:\n$plan")
  }

  test("NearestCentroids argmax matches the broadcast-join + window formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf).selectExpr("vec_id", "embedding")
      .withColumn("nrm", Ann.norm(col("embedding")))
    val cents = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
    val viaExpr = KMeansVec.assign(e, cents)
      .select("vec_id", "cent_id").as[(Long, Long)].collect().toMap
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_sim").desc, col("cent_id"))
    val viaJoin = e.crossJoin(broadcast(cents))
      .withColumn("c_sim",
        Ann.cosine(col("embedding"), col("nrm"), col("c_emb"), col("c_nrm")))
      .withColumn("c_rank", row_number().over(w))
      .filter(col("c_rank") === 1)
      .select("vec_id", "cent_id").as[(Long, Long)].collect().toMap
    assert(viaExpr == viaJoin)
  }

  test("aggregator top-k ranking matches the row_number window ranking") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = Ann.bruteForce(spark, sf)
      .select("query_id", "rank", "vec_id", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val e = Tables.embeddings(spark, sf).selectExpr("vec_id", "embedding")
      .withColumn("nrm", Ann.norm(col("embedding")))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val want = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Ann.cosine(col("q_emb"), col("q_nrm"), col("embedding"), col("nrm")).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= Ann.TopK)
      .select(col("query_id"), col("rank").cast("long"), col("vec_id"), col("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("adaptive nprobe: wide margin = full probing, narrow margin probes fewer lists, never below rank-1") {
    import org.apache.spark.sql.functions._
    val vecs = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      .withColumn("nrm", Ann.norm(col("embedding")))
    val cents = KMeansVec.fit(vecs.select(col("vec_id"), col("embedding")), 8, 2)
    val queries = vecs.filter(col("vec_id") % 100 === 0)
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet

    // a margin admitting every list is exactly fixed full probing
    val full = Ann.ivfSearch(spark, vecs, queries, cents, k = 10, nprobe = 8)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val wide = Ann.ivfSearchAdaptive(spark, vecs, queries, cents, k = 10,
      nprobeMax = 8, margin = 2.0)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(wide.nonEmpty && wide == full)

    // narrow margin: candidates ⊇ the rank-1 list, so recall (vs the
    // full-probe reference) is at least nprobe=1's. The margin is the
    // median rank1→rank2 coarse gap, so by construction some queries
    // widen and the rest stay narrow — data-independent of how
    // separated this corpus's lists happen to be.
    val nc0 = graft.functions.NearestCentroids.fromFrame(col("embedding"), cents, 8)
    val gaps = queries.select((element_at(nc0, 1).getField("c_sim") -
      element_at(nc0, 2).getField("c_sim")).as("g")).as[Double].collect().sorted
    val margin = gaps(gaps.length / 2) + 1e-9
    val one = hits(Ann.ivfSearch(spark, vecs, queries, cents, k = 10, nprobe = 1))
    val narrow = hits(Ann.ivfSearchAdaptive(spark, vecs, queries, cents,
      k = 10, nprobeMax = 8, margin = margin))
    val ref = hits(Ann.ivfSearch(spark, vecs, queries, cents, k = 10, nprobe = 8))
    assert((narrow & ref).size >= (one & ref).size,
      "adaptive recall must be at least the single-probe recall")

    // per-query width evidence: every query probes >= 1 list, and the
    // average width is strictly below the cap (easy queries narrow)
    val nc = graft.functions.NearestCentroids.fromFrame(col("embedding"), cents, 8)
    val widths = queries
      .select(size(filter(nc,
        p => p.getField("c_sim") >=
          element_at(nc, 1).getField("c_sim") - margin)).as("w"))
      .as[Int].collect()
    assert(widths.forall(_ >= 1) && widths.exists(_ > 1))
    assert(widths.sum.toDouble / widths.length < 8.0,
      s"average adaptive width ${widths.sum.toDouble / widths.length} must narrow below the cap")
  }

  test("nprobe auto-tuning reaches the recall target with a minimal probe width") {
    import org.apache.spark.sql.functions._
    val vecs = Tables.embeddings(spark, sf)
    val cents = KMeansVec.fit(vecs, 8, 2)
    val queries = vecs.filter(col("vec_id") % 100 === 0)
    val (nprobe, recall) = Ann.tuneNprobe(spark, vecs, queries, cents,
      k = 10, targetRecall = 0.9)
    assert(nprobe >= 1 && nprobe <= 8)
    // either the target was met, or we exhausted every list (recall of
    // full probing == brute force by construction, so this only happens
    // if the target is unreachable... which full probing never is)
    assert(recall >= 0.9, s"nprobe=$nprobe recall=$recall")
    // probing every list IS brute force - sanity-check the ceiling
    val (_, full) = Ann.tuneNprobe(spark, vecs, queries, cents,
      k = 10, targetRecall = 2.0) // unreachable -> runs to nprobe=nlist
    assert(full == 1.0, s"full probing must recover brute force, got $full")
  }

  test("multimodal: media features flow through the ANN library (near-dup + top-k)") {
    import org.apache.spark.sql.functions._
    // image features (stub decoder, real plumbing) as a vector corpus
    val feats = MediaTransforms.extractFeatures(
      MediaExtract.fromDocuments(spark, sf).limit(60)).toDF()
      .select(col("doc_id").as("vec_id"), col("feature").as("embedding"))
    // inject exact duplicate features under offset ids
    val srcIds = feats.filter(col("vec_id") % 5 === 0)
      .select("vec_id").as[Long].collect().toSet
    val corpus = feats.unionAll(
      feats.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
    // near-dup blocking finds every injected copy (exact dups agree on
    // all hyperplane bits, so LSH can never lose them)
    val pairs = Ann.nearDups(corpus, 0.999)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(srcIds.map(i => (i, i + 100000L)).subsetOf(pairs))
    // brute-force top-k: each copy ranks its source at cosine 1.0
    val top = Ann.topKNeighbors(spark, corpus,
      corpus.filter(col("vec_id") >= 100000L), k = 3)
      .select("query_id", "vec_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1)
    srcIds.foreach { src =>
      val hits = top(src + 100000L)
      assert(hits.exists(h => h._2 == src && h._3 == 1.0),
        s"copy of $src must see its source at cos 1.0, got ${hits.toList}")
    }
  }

  test("media transforms: meta, resize, frames, features are deterministic") {
    val ds = MediaExtract.fromDocuments(spark, sf).limit(40)
    val meta = MediaTransforms.decodeMeta(ds).collect()
    assert(meta.length == 40)
    assert(meta.forall(m => m.width >= 16 && m.height >= 16 && m.n_frames >= 1))

    val resized = MediaTransforms.resize(ds, maxSide = 64).collect()
    assert(resized.forall(r => r.width <= 64 && r.height <= 64 &&
      r.width >= 1 && r.height >= 1))

    val frames = MediaTransforms.sampleFrames(ds, stride = 4)
    val byDoc = frames.groupByKey(_.doc_id).count().collect().toMap
    val expected = meta.map(m => m.doc_id ->
      (0 until m.n_frames by 4).size.toLong).toMap
    assert(byDoc == expected)

    val f1 = MediaTransforms.extractFeatures(ds).collect()
      .map(f => f.doc_id -> f.feature.toSeq).toMap
    val f2 = MediaTransforms.extractFeatures(ds).collect()
      .map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(f1 == f2)
    assert(f1.values.forall(v => v.length == MediaTransforms.FeatureDim &&
      v.forall(x => x >= 0f && x < 1f)))
  }
}
