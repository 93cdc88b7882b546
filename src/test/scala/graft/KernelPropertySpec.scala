package graft

import graft.functions.{Hit, NearestCentroids, ScoredHit, TopKByScore}
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the two round-2 native kernels: the bounded
  * top-k aggregator and the nearest-centroid argmax. Both have simple
  * executable specifications (sort-take-k; brute-force argmax) that any
  * insert/merge order or codegen path must reproduce exactly.
  * (Raw scalacheck Gen with fixed seeds; the scalatest bridge artifact
  * isn't in the offline cache.)
  */
class KernelPropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // ---- TopKByScore ----

  /** sim is a deterministic function of id — exactly the real contract
    * (cosine is deterministic per candidate), so duplicate candidates
    * are always bit-identical and tie groups occur (ids sharing a sim).
    */
  private def simOf(id: Long): Double = ((id * 7919) % 11).toDouble / 10.0

  private def hitCases: Seq[List[Long]] = (1 to 200).map { s =>
    val p = Gen.Parameters.default
    val len = Gen.chooseNum(0, 60).apply(p, Seed(s)).getOrElse(0)
    Gen.listOfN(len, Gen.chooseNum(0L, 30L)) // small id space -> dups
      .apply(p, Seed(s * 7919L)).getOrElse(Nil)
  }

  /** Executable spec: distinct ids, sort (sim desc, id asc), take k. */
  private def specTopK(ids: Seq[Long], k: Int): Seq[Hit] =
    ids.distinct.map(id => Hit(simOf(id), id))
      .sortBy(h => (-h.cos_sim, h.vec_id)).take(k)

  test("topk aggregator == sort-take-k spec for any insert order (k=1,3,10)") {
    for (k <- Seq(1, 3, 10); ids <- hitCases) {
      val agg = new TopKByScore(k)
      val sequential = ids.foldLeft(agg.zero)((b, id) =>
        agg.reduce(b, ScoredHit(0L, id, simOf(id))))
      assert(sequential == specTopK(ids, k),
        s"k=$k sequential mismatch for $ids")
    }
  }

  test("topk merge is split-point- and order-insensitive, == spec") {
    for (k <- Seq(2, 5); ids <- hitCases if ids.nonEmpty) {
      val agg = new TopKByScore(k)
      def reduceAll(xs: Seq[Long]) =
        xs.foldLeft(agg.zero)((b, id) => agg.reduce(b, ScoredHit(0L, id, simOf(id))))
      for (cut <- Seq(ids.length / 3, ids.length / 2)) {
        val (l, r) = ids.splitAt(cut)
        val m1 = agg.merge(reduceAll(l), reduceAll(r))
        val m2 = agg.merge(reduceAll(r), reduceAll(l))
        assert(m1 == specTopK(ids, k), s"k=$k cut=$cut mismatch for $ids")
        assert(m2 == m1, s"k=$k merge not symmetric for $ids")
      }
    }
  }

  // ---- Components ----

  test("connected components == union-find spec on random graphs") {
    val p = Gen.Parameters.default
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 25L); b <- Gen.chooseNum(0L, 25L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    val graphs = (1 to 12).map { s =>
      val n = Gen.chooseNum(0, 20).apply(p, Seed(s)).getOrElse(0)
      Gen.listOfN(n, edgeGen).apply(p, Seed(s * 7919L)).getOrElse(Nil).distinct
    }
    for ((edges, gi) <- graphs.zipWithIndex) {
      val nodes = (0L to 25L).toSeq
      // union-find reference
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = nodes.map(n => n -> find(n)).toMap
      val got = graft.operators.Components.connectedComponents(
        nodes.toDF("id"),
        edges.toDF("a_id", "b_id"))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"graph $gi: edges=$edges")
      // fromPairs covers exactly the pair members, same labels
      val members = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val gotPairs = graft.operators.Components.fromPairs(
        edges.toDF("a_id", "b_id"))
        .as[(Long, Long)].collect().toMap
      assert(gotPairs == want.filter(kv => members(kv._1)),
        s"graph $gi fromPairs: edges=$edges")
    }
  }

  // ---- saltedSelfJoin ----

  test("salted self-join == plain self-join pairs on random bucket tables") {
    import org.apache.spark.sql.functions.col
    val p = Gen.Parameters.default
    val rowGen = for {
      id <- Gen.chooseNum(0L, 40L)
      band <- Gen.chooseNum(0, 2)
      bval <- Gen.chooseNum(0L, 5L) // few buckets -> collisions everywhere
    } yield (id, band, bval)
    val tables = (1 to 8).map { s =>
      val n = Gen.chooseNum(0, 50).apply(p, Seed(s)).getOrElse(0)
      Gen.listOfN(n, rowGen).apply(p, Seed(s * 7919L)).getOrElse(Nil).distinct
    }
    for ((rows, ti) <- tables.zipWithIndex; salt <- Seq(1, 3)) {
      val df = rows.toDF("doc_id", "band", "bval")
      val plain = df.as("a").join(df.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"))
        .as[(Long, Long)].collect().sorted.toSeq
      val salted = graft.operators.Skew
        .saltedSelfJoin(df, "doc_id", Seq("band", "bval"), salt)
        .select(col("a.doc_id"), col("b.doc_id"))
        .as[(Long, Long)].collect().sorted.toSeq
      assert(salted == plain, s"table $ti salt=$salt")
    }
  }

  // ---- NearestCentroids ----

  private def vecGen(dim: Int): Gen[Array[Float]] =
    Gen.listOfN(dim, Gen.chooseNum(-100, 100).map(_ / 37.0f)).map(_.toArray)

  test("NearestCentroids == brute-force argmax spec on random inputs") {
    val dim = 8
    val p = Gen.Parameters.default
    val cases = (1 to 40).map { s =>
      val nc = Gen.chooseNum(1, 12).apply(p, Seed(s)).getOrElse(4)
      val cents = Gen.listOfN(nc, vecGen(dim)).apply(p, Seed(s * 31L)).getOrElse(Nil)
      val vecs = Gen.listOfN(20, vecGen(dim)).apply(p, Seed(s * 7919L)).getOrElse(Nil)
      (cents, vecs)
    }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).foldLeft(0.0)((s, p) => s + p._1.toDouble * p._2.toDouble)
    for (((cents, vecs), ci) <- cases.zipWithIndex) {
      val centIds = cents.indices.map(_.toLong + 1).toArray
      val centNrms = cents.map(c => math.sqrt(dot(c, c))).toArray
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      val got = df.select(col("vec_id"),
        org.apache.spark.sql.functions.element_at(
          NearestCentroids(col("embedding"), centIds,
            cents.toArray, centNrms, 1), 1).getField("cent_id").as("cid"))
        .as[(Long, Long)].collect().toMap
      val want = vecs.zipWithIndex.map { case (v, i) =>
        val nrm = math.sqrt(dot(v, v))
        val best = cents.zipWithIndex.map { case (c, j) =>
          (r6(dot(v, c) / (nrm * centNrms(j))), j.toLong + 1)
        }.minBy { case (sim, id) => (-sim, id) }
        i.toLong -> best._2
      }.toMap
      assert(got == want, s"case $ci mismatch")
    }
  }
}
