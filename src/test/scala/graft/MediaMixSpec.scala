package graft

import graft.operators.MediaDimsQuery
import org.scalatest.funsuite.AnyFunSuite

class MediaMixSpec extends AnyFunSuite {
  import SparkTestSession._

  private val d = "/root/testdata/sf0.001"
  private lazy val ids = Tables.documents(spark, d)
    .select("doc_id").collect().map(_.getLong(0))
  private lazy val rows = MediaDimsQuery.mediaMix(spark, d).collect()
    .map(r => r.getString(0) -> r).toMap

  test("the census partitions the mixed corpus with the fixture's closed forms") {
    assert(rows.keySet == Set("png", "jpeg", "gif", "wav", "mp4", "other"))
    assert(rows.values.map(_.getAs[Long]("n")).sum == 3L * ids.length)
    assert(rows("png").getAs[Long]("n") == ids.count(_ % 3 == 0).toLong)
    assert(rows("jpeg").getAs[Long]("n") == ids.count(_ % 3 == 1).toLong)
    assert(rows("gif").getAs[Long]("n") == ids.count(_ % 6 == 2).toLong)
    assert(rows("wav").getAs[Long]("n") == ids.count(_ % 2 == 0).toLong)
    assert(rows("mp4").getAs[Long]("n") == ids.count(_ % 2 == 0).toLong)
  }

  test("drop rates match the planted parameters exactly") {
    // images: dims 16 + id%2000 / 16 + id%1333 — small iff either < 64
    def small(id: Long) = (16 + id % 2000) < 64 || (16 + id % 1333) < 64
    val expPng = ids.filter(_ % 3 == 0).count(small).toLong
    assert(rows("png").getAs[Long]("n_drop") == expPng)
    val expGif = ids.filter(_ % 6 == 2).count(small).toLong
    assert(rows("gif").getAs[Long]("n_drop") == expGif)
    // audio: rate = 8000 + (id%12)*4000 — low-fi iff id%12 < 2
    val expWav = ids.filter(_ % 2 == 0).count(id => 8000 + (id % 12) * 4000 < 16000)
    assert(rows("wav").getAs[Long]("n_drop") == expWav.toLong)
    // video: ts = 600(1+id%4), dur = (id%9000)*600+90 -> short iff
    // dur*1000/ts < 3000
    val expMp4 = ids.filter(_ % 2 == 0).count { id =>
      val ts = 600L * (1 + id % 4); val dur = (id % 9000) * 600L + 90L
      dur * 1000L / ts < 3000L
    }
    assert(rows("mp4").getAs[Long]("n_drop") == expMp4.toLong)
    // raw text never drops
    assert(rows("other").getAs[Long]("n_drop") == 0L)
  }

  test("byte mass is positive everywhere and drop_micro is the exact ratio") {
    rows.values.foreach { r =>
      assert(r.getAs[Long]("bytes") > 0L)
      assert(r.getAs[Long]("drop_micro") ==
        r.getAs[Long]("n_drop") * 1000000L / r.getAs[Long]("n"))
    }
  }
}
