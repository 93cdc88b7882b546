package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * prints ONE metric-JSON line as the FINAL stdout line. Failures are
  * never swallowed into a healthy-looking number: a failing query is
  * reported as -1 with its error in an "errors" map, and the process
  * exits nonzero so the driver can't mistake a broken run for a bench.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the driver may merge stderr into stdout; a
    // stray WARN after the metric line would break a last-line parse
    spark.sparkContext.setLogLevel("ERROR")
    // warm the session once (parquet footers, codegen infra, task
    // scheduling) so first-run JVM costs aren't charged to whichever
    // query executes first. Uses the REAL loaders: events.parquet is
    // TIMESTAMP(NANOS) and only reads through Tables.events — the raw
    // reader throws and its aborted-job stack trace would pollute the
    // output the driver parses.
    Seq("lineitem", "orders", "documents", "embeddings", "part")
      .foreach(t => Tables.table(spark, sfDir, t).count())
    Tables.events(spark, sfDir).count()
    // JIT/codegen warmup: run every query once at the smallest SF (or
    // the target SF if no sibling sf0.001 exists) and drop the result.
    // First-run cost is compile time — generated-code classes, typed
    // aggregator codegen, exchange setup — not data processing: e.g.
    // q_crawl_bfs at sf0.1 is 4.7s cold and 1.6s warm on the same
    // data. Warming on sf0.001 compiles the identical code paths;
    // clearCache() below guarantees no DATA survives into timing.
    val warmDir = {
      val small = new java.io.File("/root/testdata/sf0.001")
      if (small.isDirectory) small.getPath else sfDir
    }
    // NonFatal only: swallowing OutOfMemoryError/InterruptedException
    // here would leave a corrupt JVM to poison the timed runs below
    // with no visible cause
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run — a local profiling
    // knob (isolate one query without paying the full sweep); the
    // driver never sets it, so official runs always time everything
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val picked = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    picked.foreach { case (_, fn) =>
      try fn(spark, warmDir).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    spark.catalog.clearCache()
    // calibration probe (r5 verdict item): a FIXED-WORK synthetic
    // aggregate (no I/O, constant row count, all cores) timed before
    // and after the sweep, plus /proc/loadavg at both points. The
    // probe's cost is invariant across rounds, so a contended run is
    // detectable from the artifact alone: pre/post probe times well
    // above the quiet-machine constant (~0.2 s here) mean the sweep's
    // numbers are inflated by external CPU pressure, not a plan
    // regression — the failure mode that poisoned the r3 and r5
    // driver benches. Normalization rule (SURVEY §5): compare rounds
    // on times scaled by the round's mean probe time.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 1L << 27, 1L, cpus.toInt)
        .selectExpr("sum(id % 1000003)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ")(0).toDouble
      catch { case scala.util.control.NonFatal(_) => -1.0 }
    calibrate() // untimed: compile the probe's codegen before measuring
    val loadPre = loadavg()
    val calibPre = calibrate()
    var errors = List.empty[(String, String)]
    // Each query is timed as the MIN of two isolated executions, cache
    // cleared after each so run 2 cannot read run 1's persisted
    // intermediates (both runs do the full work at the target SF).
    // Why min-of-2: the r3 driver bench showed one CONTIGUOUS stretch
    // of queries (Map-order positions 15-22) inflated 2.7-6x vs both
    // r2 and every local rerun, with identical plans — a transient
    // external CPU-contention window during the run, not a regression.
    // A single-shot timer lets one such blip write a false regression
    // into whichever queries it lands on; the min of two runs taken
    // seconds apart does not, and stays an honest full execution.
    //
    // Self-adjudication (r6 verdict item): min-of-2 beats a BLIP but
    // not a contention WINDOW wider than both runs (r6 shipped q_chi2
    // at 7.9 s vs 1.0 s quiet). So the fixed-work probe now also runs
    // every [[ProbeEvery]] queries, giving the artifact a contention
    // TIMELINE: quiet = min over all probes, and any query whose
    // segment's bracketing probes exceed 2x quiet is RE-TIMED after
    // the sweep (min with its earlier measurement — every run is a
    // full honest execution, so min never understates). Per-query
    // loadavg stamps ride the side file, so each row carries its own
    // trust signal without a judge re-run.
    val ProbeEvery = 8
    val probes = scala.collection.mutable.ArrayBuffer[Double]()
    // Persisted quiet reference (r7 verdict item 1 / 8): the builder's
    // quiet-close run is committed as BASELINE_BENCH.json (per-query
    // times + the quiet probe median + a machine fingerprint). The
    // median-normalized window detector below is blind to a UNIFORMLY
    // contended run (r7: loadavg 4.6-12.7 for the whole sweep raised
    // the probe median itself, so no window tripped 2x and 5 rows
    // shipped 2-3x inflated with retimed_n: 0) — comparing this run's
    // probe median against the PERSISTED cross-round constant is what
    // detects that case, and the per-query baseline times say which
    // rows to retime or distrust.
    val baselineFile = sys.env.getOrElse("SPARK_GRAFT_BASELINE",
      "BASELINE_BENCH.json")
    val (baseQuiet, baseTimes) = BenchTrust.readBaseline(baselineFile)
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          errors ::= (name -> e.toString.take(200)); false
        }
      // operators persist intermediates (signature tables); isolate
      // runs and queries so no execution reads another's cache
      spark.catalog.clearCache()
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    def timeMin2(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Double, Boolean) = {
      val (t1, ok1) = timeOnce(name, fn)
      if (!ok1) (-1.0, -1.0, false)
      else {
        val (t2, ok2) = timeOnce(name, fn)
        if (!ok2) (-1.0, -1.0, false)
        else (math.min(t1, t2), math.abs(t1 - t2), true)
      }
    }
    val sweep = picked.toSeq.zipWithIndex.map { case ((name, fn), idx) =>
      if (idx % ProbeEvery == 0) probes += calibrate()
      val seg = probes.length - 1
      val (t, spread, ok) = timeMin2(name, fn)
      (name, fn, t, spread, ok, seg, loadavg())
    }
    probes += calibrate()
    // a query's window is contended if EITHER bracketing probe ran
    // >2x the run's MEDIAN probe. Median, not min: in-sweep probes
    // carry a systematically higher floor than the idle pre/post ones
    // (GC debt from the preceding query), so a min threshold flags
    // the whole run (measured: min 0.067 vs in-sweep median 0.29 on a
    // quiet machine). The timeline's job is WINDOWS — outliers vs the
    // run's own typical; a globally-contended run is the pre/post
    // probes' and loadavg stamps' job (the r5 normalization rule).
    val quietProbe = probes.sorted.apply(probes.length / 2)
    def contended(seg: Int): Boolean =
      math.max(probes(seg), probes(math.min(seg + 1, probes.length - 1))) >
        2.0 * quietProbe
    // UNIFORM contention (no window to trip): the run's own probe
    // median is elevated against the persisted quiet constant
    val globalContended = BenchTrust.globalContended(quietProbe, baseQuiet)
    def rowSuspect(name: String, t: Double, spread: Double): Boolean =
      BenchTrust.rowSuspect(t, spread, baseTimes.get(name))
    val retimed = scala.collection.mutable.Set[String]()
    val untrusted = scala.collection.mutable.Set[String]()
    val resultsMid = sweep.map { case (name, fn, t, spread, ok, seg, la) =>
      if (ok && (contended(seg) || rowSuspect(name, t, spread))) {
        retimed += name
        val (t3, spread3, ok3) = timeMin2(name, fn)
        val (tf, spf) =
          if (ok3) (math.min(t, t3), math.min(spread, spread3))
          else (t, spread)
        // still suspect after the retime: the number cannot be made
        // honest on this machine right now — stamp it rather than let
        // it ride the metric line looking clean (r7 finding)
        if (rowSuspect(name, tf, spf)) untrusted += name
        (name, tf, spf, ok, la)
      } else (name, t, spread, ok, la)
    }
    // Tail pass (r9 brief item 5): the mid-sweep retime runs while the
    // neighbors' GC debt is still settling — r9 stamped 12 rows that
    // an immediate quiet re-run all cleared. Re-time every stamped row
    // once more now that the sweep is over, and keep the stamp only
    // for rows that fail twice ([[BenchTrust.tailMerge]], spec'd).
    val tailCleared = scala.collection.mutable.Set[String]()
    val results =
      if (untrusted.isEmpty) resultsMid
      else {
        calibrate() // drain stragglers before the settled-load retimes
        resultsMid.map { case row @ (name, t, spread, ok, _) =>
          if (ok && untrusted(name)) {
            val (t3, sp3, ok3) = timeMin2(name, picked(name))
            val (tf, spf, still) = BenchTrust.tailMerge(
              t, spread, t3, sp3, ok3, baseTimes.get(name))
            if (!still) { untrusted -= name; tailCleared += name }
            (name, tf, spf, ok, loadavg())
          } else row
        }
      }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    // 3-decimal times, trailing zeros stripped: the consumer of this
    // line keeps only a ~2 KB stdout tail, so the line must stay well
    // under that with room for the query count to grow. Full-precision
    // doubles put 67 queries + spread at ~4.5 KB and the round-4
    // artifact captured only the tail of the spread map.
    def num(v: Double, dec: Int = 3): String = {
      val s = String.format(s"%.${dec}f", Double.box(v))
      val t = s.reverse.dropWhile(_ == '0').reverse
      if (t.endsWith(".")) t.dropRight(1) else t
    }
    def qsAt(dec: Int): String = results.map { case (k, v, _, ok, _) =>
      jstr(k) + ":" + (if (ok) num(v, dec) else "-1")
    }.mkString("{", ",", "}")
    // per-query |t1 - t2| alongside the min: a noisy environment shows
    // up as spread, so a driver-side inflation (the r3 contention
    // window) is distinguishable from a real plan regression. Spread is
    // diagnostic, not a gate input — it lives in a SIDE FILE so it can
    // never crowd the metric line out of the stdout tail again.
    val spreadJson = results.map { case (k, _, s, ok, _) =>
      jstr(k) + ":" + (if (ok) num(s) else "-1")
    }.mkString("{", ",", "}")
    // per-query loadavg at timing completion: the row-by-row trust stamp
    val loadJson = results.map { case (k, _, _, _, la) =>
      jstr(k) + ":" + num(la, 2)
    }.mkString("{", ",", "}")
    val probesJson = probes.map(p => num(p, 3)).mkString("[", ",", "]")
    val retimedJson = retimed.toSeq.sorted.map(jstr).mkString("[", ",", "]")
    val errJson = errors.map { case (k, m) => s"${jstr(k)}:${jstr(m)}" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, _, true, _) => v }.sum
    val calibPost = calibrate()
    val loadPost = loadavg()
    val untrustedJson = untrusted.toSeq.sorted.map(jstr).mkString("[", ",", "]")
    val calibJson =
      s"""{"pre_s":${"%.3f".format(calibPre)},"post_s":${"%.3f".format(calibPost)},"load_pre":${"%.2f".format(loadPre)},"load_post":${"%.2f".format(loadPost)},"quiet_probe_s":${"%.3f".format(quietProbe)},"quiet_ref_s":${baseQuiet.map("%.3f".format(_)).getOrElse("null")},"global_contended":$globalContended,"retimed_n":${retimed.size},"tail_cleared_n":${tailCleared.size},"untrusted":$untrustedJson}"""
    spark.stop()
    val sideFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_SIDE", "bench_detail.json")
    try {
      // full times ride the side file too: if query growth ever makes
      // even the degraded stdout line unparseable, the per-query data
      // still exists on disk at full precision
      // per-query ratio vs the persisted quiet baseline (full map in
      // the side file; the metric line carries only the aggregate
      // calib block — 220 ratios would not fit the stdout tail)
      val ratioJson = results.collect {
        case (k, v, _, true, _) if baseTimes.contains(k) && baseTimes(k) > 0 =>
          jstr(k) + ":" + num(v / baseTimes(k), 2)
      }.mkString("{", ",", "}")
      val detail =
        s"""{"times":${qsAt(3)},"spread":$spreadJson,"load":$loadJson,"probes":$probesJson,"retimed":$retimedJson,"ratio_vs_baseline":$ratioJson,"errors":$errJson,"calib":$calibJson,"sf":${jstr(sfDir)}}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(sideFile),
        detail.getBytes("UTF-8"))
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] side-file write failed: $e")
    }
    // hard budget: the driver's tail keeps ~2000 chars; stay far below
    // (target < 1500). Degrade gracefully as the query count grows:
    // 3-decimal times → 2-decimal (10 ms resolution, still well under
    // the 1.3× regression threshold) → drop the empty-or-duplicated
    // errors map (it is also in the side file) — never lose the times.
    def lineAt(dec: Int, withErrors: Boolean): String = {
      val err = if (withErrors) s""","errors":$errJson""" else ""
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":${qsAt(dec)}$err,"calib":$calibJson,"sf":${jstr(sfDir)}}"""
    }
    // Final rung: the query count has outgrown what the tail can hold
    // at ANY precision (99 names × ~17 chars > 1.5 KB before a single
    // digit). Keep the SLOWEST queries individually — they are what a
    // regression gate needs — plus every failure, and collapse the
    // fastest into {"omitted_n","omitted_total"}; the full map is in
    // the side file regardless. Greedy drop of the fastest until the
    // line fits.
    def lineTop(dec: Int, keep: Int): String = {
      val (okQ, badQ) = results.partition(_._4)
      val kept = okQ.sortBy(-_._2).take(keep) ++ badQ
      val omitted = okQ.sortBy(-_._2).drop(keep)
      val qs = kept.map { case (k, v, _, ok, _) =>
        jstr(k) + ":" + (if (ok) num(v, dec) else "-1")
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"omitted_n":${omitted.size},"omitted_total":${num(omitted.map(_._2).sum)},"calib":$calibJson,"sf":${jstr(sfDir)}}"""
    }
    val out = (Seq(lineAt(3, true), lineAt(2, true), lineAt(2, false)) ++
      (results.length to 0 by -8).map(lineTop(2, _)))
      .find(_.length < 1400)
      .getOrElse(lineTop(2, 8))
    System.err.println(s"[bench] metric line length = ${out.length}")
    println(out)
    System.out.flush()
    if (errors.nonEmpty) sys.exit(1)
  }
}
