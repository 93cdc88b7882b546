package graft

import graft.operators.Sax
import org.scalatest.funsuite.AnyFunSuite

class SaxSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def run(cells: Seq[(String, Long, Long)]) =
    Sax.saxOf(cells.toDF("event_type", "t", "y")).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[String]("sax_word")).toMap

  test("a ramp over 8 singleton frames reads aabbccdd") {
    // H=8, W=8: frames are single hours; equi-depth quartile
    // breakpoints at sorted ranks 2/4/6 -> values 1, 3, 5
    val cells = (0L until 8L).map(t => ("ramp", t, t))
    assert(run(cells)("ramp") == "aabbccdd")
  }

  test("a constant series is all-a: nothing exceeds any breakpoint") {
    val cells = (0L until 16L).map(t => ("flat", t, 7L))
    assert(run(cells)("flat") == "aaaaaaaa")
  }

  test("mirrored series get mirrored words (shared alphabet)") {
    val up = (0L until 8L).map(t => ("up", t, t * 10L))
    val down = (0L until 8L).map(t => ("down", t, 70L - t * 10L))
    val words = run(up ++ down)
    assert(words("up") == words("down").reverse)
  }

  test("integer PAA: frame means are exact truncating-div micros") {
    // H=16, W=8: frames of 2 hours; frame 0 holds y=1,2 -> mean 1.5
    val cells = (0L until 16L).map(t => ("m", t, t + 1L))
    val out = Sax.saxOf(cells.toDF("event_type", "t", "y")).collect().head
    assert(out.getAs[Long]("paa_min_micro") == 1500000L)
    assert(out.getAs[Long]("paa_max_micro") == 15500000L)
    assert(out.getAs[Long]("n_frames") == 8L)
  }

  test("shape change shows as a word change (the monitoring use)") {
    val steady = (0L until 8L).map(t => ("s", t, 10L))
    val bursty = (0L until 8L).map(t => ("b", t, if (t == 7L) 100L else 10L))
    val words = run(steady ++ bursty)
    assert(words("s") != words("b"))
    // two distinct pooled values -> ONE deduped breakpoint -> a 2-letter
    // effective alphabet: the burst frame sits exactly one letter above
    // the steady floor ('b'), never a skipped letter (the r9 ADVICE
    // tied-block fix: pre-dedup this read 'd' because three tied rank
    // picks each counted once)
    assert(words("b") == "aaaaaaab")
    assert(words("s") == "aaaaaaaa")
  }

  test("tied breakpoint blocks collapse: letters are contiguous") {
    // heavy ties: half the grid at one value, half at another, plus one
    // top frame — rank picks land inside tied blocks; after dedup the
    // symbols must walk a,b,c with no skips
    val lo = (0L until 4L).map(t => ("x", t, 0L))
    val mid = (4L until 8L).map(t => ("x", t, 10L))
    val words = run(lo ++ mid)
    val letters = words("x").distinct.sorted
    assert(letters.zipWithIndex.forall { case (c, i) => c - 'a' == i },
      s"letters must be contiguous from 'a': ${words("x")}")
  }
}
