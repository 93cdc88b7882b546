package graft

import graft.functions.DHash64
import graft.operators.MediaDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MediaDedupSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("dhash64 is exactly invariant under integer upsampling and brightness shift") {
    val payloads = Seq(
      "the quick brown fox jumps over the lazy dog and keeps going for a while",
      "completely different content with its own luminance structure here",
      "short one")
    val df = payloads.zipWithIndex.map { case (t, i) =>
      (i.toLong, t.getBytes("UTF-8"),
        t.flatMap(c => s"$c$c").getBytes("UTF-8"), // 2x upsample
        t.map(c => (c + 2).toChar).getBytes("UTF-8")) // +2 brightness
    }.toDF("id", "orig", "doubled", "bright")
      .select(col("id"),
        DHash64.dhash64(col("orig")).as("h0"),
        DHash64.dhash64(col("doubled")).as("h2"),
        DHash64.dhash64(col("bright")).as("hb"))
      .as[(Long, Long, Long, Long)].collect()
    df.foreach { case (id, h0, h2, hb) =>
      assert(h0 == h2, s"payload $id: 2x upsample must hash identically")
      assert(h0 == hb,
        s"payload $id: uniform brightness shift preserves every gradient sign")
      assert(h0 != 0L, s"payload $id: real content must not hash to 0")
    }
    // empty payload hashes to 0 (the documented guard)
    val e = Seq((0L, Array.empty[Byte])).toDF("id", "p")
      .select(DHash64.dhash64(col("p"))).as[Long].head()
    assert(e == 0L)
  }

  test("banding is COMPLETE vs brute-force Hamming <= 3 (pigeonhole over 4x16 bands)") {
    val media = Tables.mediaAug(spark, dir)
    val banded = MediaDedup.nearDupPairs(media)
      .as[(Long, Long, Long)].collect().toSet
    val sigs = MediaDedup.signatures(media)
    val brute = sigs.as("a").join(sigs.as("b"),
      col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id"), col("b.media_id"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long").as("h"))
      .filter(col("h") <= MediaDedup.MaxHamming)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == brute,
      s"banded detector must equal brute force: banded=${banded.size} brute=${brute.size}")
    assert(brute.nonEmpty, "fixture must plant recoverable dups")
  }

  test("planted re-encodes and 2x-upsamples are all recovered; unrelated payloads are not") {
    val pairs = MediaDedup.mediaNearDup(spark, dir)
      .as[(Long, Long, Long)].collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    val docIds = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long].collect()
    docIds.filter(_ % 10 == 0).foreach { d =>
      assert(byPair.contains((d, d + 1000000L)),
        s"re-encoded copy of $d must be recovered")
    }
    docIds.filter(_ % 7 == 0).foreach { d =>
      assert(byPair.get((d, d + 2000000L)).contains(0L),
        s"2x-upsampled copy of $d must be recovered at Hamming 0")
    }
    // every reported pair is a planted relation, never a cross match
    pairs.foreach { case (a, b, h) =>
      assert(b % 1000000L == a % 1000000L && h <= MediaDedup.MaxHamming,
        s"unexpected cross pair ($a, $b, $h)")
    }
  }

  test("media survivor labeling: every planted copy loses to its source") {
    val kept = MediaDedup.mediaKeep(spark, dir)
      .as[(Long, Long, Boolean)].collect()
    val n = Tables.mediaAug(spark, dir).count()
    assert(kept.length == n, "every payload labeled exactly once")
    val byId = kept.map(r => r._1 -> r).toMap
    kept.filter(_._1 >= 1000000L).foreach { case (id, keepId, isKept) =>
      assert(!isKept && keepId == id % 1000000L,
        s"planted copy $id must lose to its source: keep=$keepId kept=$isKept")
    }
    // originals without planted copies keep themselves
    kept.filter(r => r._1 < 1000000L && r._1 % 10 != 0 && r._1 % 7 != 0)
      .foreach { case (id, keepId, isKept) =>
        assert(isKept && keepId == id, s"unduplicated $id must survive")
      }
  }

  test("dhash64 is SQL-callable via GraftExtensions") {
    Tables.mediaAug(spark, dir).limit(20)
      .createOrReplaceTempView("media_sql_t")
    val viaSql = spark.sql(
      "SELECT media_id, dhash64(payload) AS sig FROM media_sql_t")
      .as[(Long, Long)].collect().toMap
    val viaApi = MediaDedup.signatures(Tables.mediaAug(spark, dir).limit(20))
      .as[(Long, Long)].collect().toMap
    assert(viaSql == viaApi && viaSql.nonEmpty)
  }

  test("plan: salted band self-join, payloads never in a cartesian") {
    val plan = MediaDedup.mediaNearDup(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "band self-join must be salted")
    assert(!plan.contains("CartesianProduct"))
  }
}
