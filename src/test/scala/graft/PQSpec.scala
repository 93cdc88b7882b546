package graft

import graft.operators.{Ann, PQ}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PQSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"
  private val Dim = 64

  test("pq fit/encode/decode: valid codes, deterministic, reconstruction beats noise") {
    val vecs = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val books = PQ.fit(vecs, Dim, m = 8, k = 16, iters = 2)
    assert(books.size == 8 && books.forall(_.count() == 16))

    val codes = PQ.encode(vecs, books, Dim)
    val n = vecs.count()
    assert(codes.count() == n)
    val bounds = codes.select(
      min(array_min(col("codes"))), max(array_max(col("codes"))),
      min(size(col("codes"))), max(size(col("codes"))))
      .as[(Long, Long, Int, Int)].head()
    assert(bounds._1 >= 1L && bounds._2 <= 16L && bounds._3 == 8 && bounds._4 == 8)

    // deterministic end to end
    val codes2 = PQ.encode(vecs, PQ.fit(vecs, Dim, m = 8, k = 16, iters = 2), Dim)
    assert(codes.as[(Long, Seq[Long])].collect().toMap ==
      codes2.as[(Long, Seq[Long])].collect().toMap)

    // reconstruction quality: cos(original, decoded(self)) must beat
    // cos(original, decoded of a DIFFERENT vector) on average — the
    // codes carry vector-specific information, not just corpus priors
    val dec = PQ.decode(codes, books)
      .select(col("vec_id"), col("embedding").as("rec"))
    val both = vecs.join(dec, "vec_id")
      .select(col("vec_id"), col("embedding"), col("rec"),
        Ann.norm(col("embedding")).as("n1"), Ann.norm(col("rec")).as("n2"))
    assert(dec.count() == n)
    val selfCos = both.select(avg(
      Ann.cosine(col("embedding"), col("n1"), col("rec"), col("n2"))))
      .as[Double].head()
    val shifted = both.select(col("vec_id"), col("rec"), col("n2"))
      .withColumn("vec_id", (col("vec_id") + 1) % n)
    val crossCos = both.select(col("vec_id"), col("embedding"), col("n1"))
      .join(shifted, "vec_id")
      .select(avg(Ann.cosine(col("embedding"), col("n1"), col("rec"), col("n2"))))
      .as[Double].head()
    assert(selfCos > crossCos + 0.1,
      s"self-reconstruction $selfCos should beat cross $crossCos")
  }

  test("ivf-pq search recalls a usable fraction of brute-force, full-probe beats narrow") {
    val vecs = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val queries = vecs.filter(col("vec_id") % 100 === 0)
    val truth = Ann.topKNeighbors(spark, vecs, queries, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recall(nprobe: Int): Double = {
      val got = Ann.ivfPqSearch(spark, vecs, queries, Dim,
        nlist = 8, m = 8, kcode = 16, k = 10, nprobe = nprobe)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      (truth & got).size.toDouble / truth.size
    }
    val narrow = recall(2)
    val full = recall(8)
    // PQ distortion bounds recall; probing every list must still beat
    // a 2-list probe, and both must be far above chance (10/500)
    assert(full >= narrow, s"full-probe $full vs narrow $narrow")
    assert(narrow > 0.1, s"narrow recall $narrow")
    assert(full > 0.25, s"full recall $full")
  }

  test("ADC scoring ranks like decode-reconstruct, with no decode join in the plan") {
    import graft.operators.KMeansVec
    val vecs = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val queries = vecs.filter(col("vec_id") % 100 === 0)
    // ADC path at FULL probe = every encoded vector is a candidate, so
    // any ranking difference vs the decode path is scoring-only
    val adcDf = Ann.ivfPqSearch(spark, vecs, queries, Dim,
      nlist = 4, m = 8, kcode = 16, k = 10, nprobe = 4)
    val plan = adcDf.queryExecution.executedPlan.toString
    assert(!plan.contains("__c0") && !plan.contains("__e0"),
      s"ADC plan must not contain the m-way decode join:\n$plan")
    val adc = adcDf.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    // decode path replicated with the same deterministic training: the
    // shape ivfPqSearch had before ADC (reconstruct + exact cosine)
    val cents = KMeansVec.fit(vecs, 4, 3)
    val books = PQ.fit(vecs, Dim, m = 8, k = 16)
    val e = vecs.withColumn("nrm", Ann.norm(col("embedding")))
    val indexed = PQ.encode(
      KMeansVec.assign(e, cents).select(col("vec_id"), col("cent_id"), col("embedding")),
      books, Dim, passthrough = Seq("cent_id"))
    val resident = PQ.decode(indexed, books)
      .withColumn("nrm", Ann.norm(col("embedding")))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    val dec = resident.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Ann.cosine(col("q_emb"), col("q_nrm"), col("embedding"), col("nrm")).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    // ADC sums per-subspace partials where decode folds one flat dot —
    // equal values up to float association, so after round-6 the top-k
    // sets agree except possibly at a rounding-boundary tie
    val overlap = (adc & dec).size.toDouble / dec.size
    assert(overlap >= 0.95, s"ADC vs decode top-k overlap $overlap")
  }

  test("exact re-rank of the PQ shortlist recovers recall lost to quantization") {
    val vecs = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val queries = vecs.filter(col("vec_id") % 100 === 0)
    val truth = Ann.topKNeighbors(spark, vecs, queries, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      (truth & got).size.toDouble / truth.size
    }
    // FULL probe isolates what re-ranking can fix: every miss is PQ
    // distortion (a narrow probe's misses live in unprobed lists, which
    // no amount of re-scoring can recover)
    val plain = recallOf(Ann.ivfPqSearch(spark, vecs, queries, Dim,
      nlist = 8, m = 8, kcode = 16, k = 10, nprobe = 8))
    // 10× shortlist from the same probes, re-scored exactly by id (the
    // production ratio: the shortlist costs code lookups, the re-rank
    // costs |shortlist| exact dots — two orders below a full scan)
    val shortlist = Ann.ivfPqSearch(spark, vecs, queries, Dim,
      nlist = 8, m = 8, kcode = 16, k = 100, nprobe = 8)
    val reranked = recallOf(Ann.rerank(spark, vecs, queries, shortlist, k = 10))
    assert(reranked >= plain,
      s"re-rank recall $reranked must be >= plain PQ recall $plain")
    assert(reranked > 0.5, s"re-rank recall $reranked too low to be useful")
  }
}
