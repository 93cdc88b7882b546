package graft

import graft.operators.{Crawl, Markov}
import org.scalatest.funsuite.AnyFunSuite

class MarkovSpec extends AnyFunSuite {
  import SparkTestSession._

  test("two-state closed-form chain converges to the known stationary point") {
    // P = [[0, 1], [1/2, 1/2]] → π = (1/3, 2/3)
    val cells = Seq(("a", "b", 10L, 10L), ("b", "a", 5L, 10L), ("b", "b", 5L, 10L))
    val pi = Markov.stationary(cells, Seq("a", "b"), iters = 60)
    val scale = Crawl.PrScale.toDouble
    assert(math.abs(pi("a") / scale - 1.0 / 3.0) < 1e-9)
    assert(math.abs(pi("b") / scale - 2.0 / 3.0) < 1e-9)
  }

  test("absorbing state soaks all mass; dangling state keeps its own") {
    // a → b, b has no outgoing rows: b keeps what arrives (self-loop)
    val cells = Seq(("a", "b", 1L, 1L))
    val pi = Markov.stationary(cells, Seq("a", "b"), iters = 30)
    assert(pi("a") == 0L)
    assert(pi("b") == Crawl.PrScale) // conservation is exact here (no div loss)
  }

  test("mass conservation within floor loss on the corpus chain") {
    val rows = Markov.markovQuery(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    val n = rows.length.toLong
    // each round floors ≤|S|² unit fractions; 20 rounds
    assert(total <= Crawl.PrScale && total >= Crawl.PrScale - 20L * n * n - n)
    assert(rows.map(_.getDouble(2)).forall(s => s >= 0.0 && s <= 1.0))
  }
}
