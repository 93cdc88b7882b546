package graft.operators

/** Overlap INDEPENDENT Spark job chains from driver threads — the
  * guide's "overlap independent jobs" pattern (§2.6): Spark's scheduler
  * happily runs several jobs at once inside one application; actions
  * are only sequential because driver code calls them sequentially.
  * When a composite operator needs several independent eager results
  * (e.g. the m per-subspace PQ codebooks, or an index build's coarse
  * quantizer next to its PQ training), submitting them from a small
  * pool lets the next chain's tasks back-fill executors freed by the
  * current chain's straggler tail.
  *
  * Results are unchanged: each chain runs exactly the jobs it ran
  * sequentially, FIFO scheduling gives earlier submissions priority,
  * and failures propagate (the first failed chain's exception is
  * rethrown after the pool drains).
  */
object Concurrently {

  /** Map `f` over `items` with up to `maxPool` chains in flight.
    * Returns results in input order.
    */
  def apply[A, B](items: Seq[A], maxPool: Int = 8)(f: A => B): Seq[B] = {
    if (items.lengthCompare(2) < 0) return items.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(items.length, maxPool))
    try {
      import scala.jdk.CollectionConverters._
      val tasks = items.map { a =>
        new java.util.concurrent.Callable[B] { def call(): B = f(a) }
      }
      // invokeAll waits for every task; get() rethrows the first failure
      pool.invokeAll(tasks.asJava).asScala.toSeq.map(_.get())
    } finally pool.shutdown()
  }

  /** Two independent chains in parallel, result as a pair. */
  def both[A, B](fa: => A, fb: => B): (A, B) = {
    val out: Seq[Either[A, B]] = apply(Seq(true, false)) { first =>
      if (first) Left(fa) else Right(fb)
    }
    (out(0).swap.toOption.get, out(1).toOption.get)
  }
}
