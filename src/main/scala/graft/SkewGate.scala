package graft

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skewed-key rehearsal gate (r10 verdict item 4) — runs the salted
  * families on the `--skew` sf1 fixture (~30% of docs on ONE source,
  * ~30% of events on ONE user; `scripts/gen_sf.py 1 testdata_sf1_skew
  * --skew`) and measures what salting is FOR: the straggler ratio.
  *
  * For every family it runs, a [[SparkListener]] collects each task's
  * wall duration, attributed to the family via its job group. The
  * reported figure per family is the worst MATERIAL stage's
  * max/median task-time ratio (material = ≥ [[MinTasks]] tasks and a
  * max task ≥ [[MaterialMs]] — sub-material stages are all fixed
  * overhead at any scale and their ratios are pure noise). A hot key
  * that defeated the salt would put `salt × bucket` rows on one
  * reducer and the ratio would blow past the gate bound; bounded
  * ratios on a corpus where one key holds 30% of the table are the
  * measured evidence the salted plans survive head domains at 10×.
  *
  * Two families are measured but NOT ratio-gated, with the reason in
  * the report: `sessionize` keys state on user_id, so the hot user's
  * rows are ONE task by the operator's sequential-per-key semantics
  * (the ratio IS the skew — bounded only by the hot key's share; the
  * 100 TB answer is time-chunked session stitching, documented in
  * SURVEY §5), and `skew_report` is the diagnosis itself — the gate
  * asserts it DETECTS the plant (top key, ~30% share, a rec_salt that
  * would level it) rather than balancing it.
  *
  * Also runs the UNSALTED contrast (the same band self-join with
  * salt=1) so the report shows the ratio the salt removes on the one
  * fixture where buckets are viral by construction.
  *
  * Usage: `sbt "runMain graft.SkewGate [skewDir]"` (default
  * `testdata_sf1_skew`). Prints one JSON line (the SF1_RESULTS.json
  * skew block) and exits nonzero on a violated bound.
  */
object SkewGate {
  val MinTasks = 8
  val MaterialMs = 500L
  /** Gate bound on max/median task time within a material stage of a
    * salted family. Local[32] tasks on a quiet box spread ~2-3× from
    * scheduling alone; a defeated salt (30% of the corpus on one
    * reducer vs 1/32 on the median) would read ~10×. */
  val RatioBound = 8.0

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata_sf1_skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    // stage → task durations; stage → owning family (job-group id).
    // Listener-bus callbacks are single-threaded; the maps are
    // concurrent only because the driver thread reads them afterwards.
    val taskMs = TrieMap.empty[Int, ArrayBuffer[Long]]
    val stageFam = TrieMap.empty[Int, String]
    sc.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val fam = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
          .getOrElse("")
        j.stageIds.foreach(sid => stageFam.putIfAbsent(sid, fam))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null && t.taskInfo.successful)
          taskMs.getOrElseUpdate(t.stageId, ArrayBuffer.empty) +=
            t.taskInfo.duration
    })

    case class Fam(name: String, sec: Double, rows: Long, gated: Boolean,
      note: String = "")
    var fams = List.empty[Fam]
    def run(name: String, gated: Boolean, note: String = "")(f: => Long): Unit = {
      sc.setJobGroup(name, name)
      val t0 = System.nanoTime()
      val n = f
      fams ::= Fam(name, (System.nanoTime() - t0) / 1e9, n, gated, note)
      sc.clearJobGroup()
      spark.catalog.clearCache()
    }

    val docs = Tables.docsAug(spark, dir).select(col("doc_id"), col("text"))

    run("minhash_pairs", gated = true) {
      operators.Dedup.minhashPairs(docs).count()
    }
    run("prefix_pairs", gated = true) {
      operators.PrefixJoin.prefixPairsRaw(docs).count()
    }
    run("para_fuzzy", gated = true) {
      operators.Scrub.paraFuzzyPairs(docs).count()
    }
    // unsalted contrast: the identical band self-join with salt=1 —
    // candidates only (no verify) so the contrast isolates the join
    run("bands_unsalted_contrast", gated = false,
      note = "salt=1 contrast, not gated") {
      val sig = operators.Dedup.minhashSignatures(operators.Dedup.shingleDocs(docs))
      operators.Skew.saltedSelfJoin(
        operators.Dedup.bandsOf(sig), "doc_id", Seq("band", "bsig"), 1)
        .select(col("a.doc_id"), col("b.doc_id")).count()
    }
    run("sessionize", gated = false,
      note = "per-key sequential semantics: hot user = one task by design") {
      operators.Analytics.sessionize(spark, dir).count()
    }

    // the diagnosis must SEE the plant: events hot user 0 (~30%),
    // docs head domain src0 (~30%), and recommend a leveling salt
    sc.setJobGroup("skew_report", "skew_report")
    val evTop = operators.Skew.report(Tables.events(spark, dir), "user_id")
      .limit(1).collect().head
    val docTop = operators.Skew.report(Tables.documents(spark, dir), "source")
      .limit(1).collect().head
    sc.clearJobGroup()
    def share(r: org.apache.spark.sql.Row): Double =
      r.getAs[Long]("c").toDouble / r.getAs[Long]("n_rows")
    val evOk = evTop.getAs[Long]("key") == 0L && share(evTop) > 0.25 &&
      evTop.getAs[Long]("rec_salt") >= 10L
    val docOk = docTop.getAs[String]("key") == "src0" && share(docTop) > 0.25

    Thread.sleep(3000) // let the listener bus drain the last task events
    spark.stop()

    def q2(d: Double): Double = math.rint(d * 100) / 100
    var violated = List.empty[String]
    val famJson = fams.reverse.map { f =>
      val stages = taskMs.toList
        .filter { case (sid, ds) => stageFam.get(sid).contains(f.name) &&
          ds.length >= MinTasks && ds.max >= MaterialMs }
      val worst = stages.sortBy(-_._2.max).headOption.map { case (_, ds) =>
        val sorted = ds.sorted
        val med = sorted(sorted.length / 2).max(1L)
        (q2(ds.max.toDouble / med), ds.max, med, ds.length)
      }
      val (ratio, maxMs, medMs, nTasks) =
        worst.getOrElse((1.0, 0L, 0L, 0))
      if (f.gated && ratio > RatioBound)
        violated ::= s"${f.name}: max/median $ratio > $RatioBound"
      s""""${f.name}":{"sec":${q2(f.sec)},"rows":${f.rows},""" +
        s""""worst_stage_ratio":$ratio,"max_task_ms":$maxMs,""" +
        s""""median_task_ms":$medMs,"n_tasks":$nTasks,""" +
        s""""gated":${f.gated}${if (f.note.nonEmpty) s""","note":"${f.note}"""" else ""}}"""
    }.mkString("{", ",", "}")

    if (!evOk) violated ::= s"skew_report(events): plant not detected ($evTop)"
    if (!docOk) violated ::= s"skew_report(docs): plant not detected ($docTop)"

    println(s"""{"skew_gate":{"dir":"$dir","ratio_bound":$RatioBound,""" +
      s""""families":$famJson,""" +
      s""""diagnosis":{"events_top_user":${evTop.getAs[Long]("key")},""" +
      s""""events_top_share":${q2(share(evTop))},""" +
      s""""events_rec_salt":${evTop.getAs[Long]("rec_salt")},""" +
      s""""docs_top_source":"${docTop.getAs[String]("key")}",""" +
      s""""docs_top_share":${q2(share(docTop))}},""" +
      s""""violated":[${violated.map(v => s""""$v"""").mkString(",")}]}}""")
    if (violated.nonEmpty) {
      violated.foreach(v => System.err.println(s"SKEW GATE VIOLATED: $v"))
      sys.exit(1)
    }
  }
}
