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
    assert(words("b").last == 'd') // the burst frame tops the alphabet
  }
}
