package graft

import graft.operators.Scc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SccSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Sequential Tarjan (iterative, explicit stack) — the independent
    * in-test oracle: canonical labels = min id per SCC.
    */
  private def tarjan(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val index = scala.collection.mutable.Map[Long, Int]()
    val low = scala.collection.mutable.Map[Long, Int]()
    val onStack = scala.collection.mutable.Set[Long]()
    val stack = scala.collection.mutable.ArrayBuffer[Long]()
    val label = scala.collection.mutable.Map[Long, Long]()
    var counter = 0
    for (root <- nodes if !index.contains(root)) {
      // explicit DFS stack of (node, child iterator position)
      val work = scala.collection.mutable.ArrayBuffer[(Long, Int)]((root, 0))
      index(root) = counter; low(root) = counter; counter += 1
      stack += root; onStack += root
      while (work.nonEmpty) {
        val (v, ci) = work.last
        val children = adj.getOrElse(v, Seq.empty)
        if (ci < children.length) {
          work(work.length - 1) = (v, ci + 1)
          val w = children(ci)
          if (!index.contains(w)) {
            index(w) = counter; low(w) = counter; counter += 1
            stack += w; onStack += w
            work += ((w, 0))
          } else if (onStack(w)) low(v) = math.min(low(v), index(w))
        } else {
          work.remove(work.length - 1)
          if (work.nonEmpty) {
            val p = work.last._1
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == index(v)) {
            val comp = scala.collection.mutable.ArrayBuffer[Long]()
            var w = -1L
            while ({ w = stack.remove(stack.length - 1); onStack -= w
              comp += w; w != v }) ()
            val m = comp.min
            comp.foreach(c => label(c) = m)
          }
        }
      }
    }
    label.toMap
  }

  test("distributed peeling equals sequential Tarjan on the fixture graph") {
    val e = Tables.edges(spark, sf).as[(Long, Long)].collect().toSeq
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val expected = tarjan(nodes, e)
    val got = Scc.scc(nodes.toDF("id"), e.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got == expected,
      s"diff=${(got.toSet diff expected.toSet).take(5)}")
    // the peeling must not degenerate into one-SCC-per-round
    val nSccs = expected.values.toSet.size
    assert(Scc.lastRounds <= math.max(3, nSccs / 2),
      s"rounds=${Scc.lastRounds} for $nSccs SCCs — peeling degenerated")
  }

  test("a planted 3-cycle trap is one SCC; its tree tendrils are singletons") {
    // ring 10 -> 11 -> 12 -> 10, tendrils: in-tree 1 -> 10, 2 -> 1,
    // out-tree 12 -> 20 -> 21; plus a disconnected 2-cycle 30 <-> 31
    // and an acyclic diamond 40 -> {41, 42} -> 43
    val edges = Seq[(Long, Long)](
      (10L, 11L), (11L, 12L), (12L, 10L),
      (1L, 10L), (2L, 1L), (12L, 20L), (20L, 21L),
      (30L, 31L), (31L, 30L),
      (40L, 41L), (40L, 42L), (41L, 43L), (42L, 43L))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val got = Scc.scc(nodes.toDF("id"), edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    // the ring is ONE component labeled by its min member
    assert(got(10L) == 10L && got(11L) == 10L && got(12L) == 10L)
    // tendrils do NOT join the ring (undirected CC would merge them)
    Seq(1L, 2L, 20L, 21L).foreach(v => assert(got(v) == v, s"tendril $v"))
    // reciprocity-visible 2-cycle still works
    assert(got(30L) == 30L && got(31L) == 30L)
    // acyclic diamond: all singletons
    Seq(40L, 41L, 42L, 43L).foreach(v => assert(got(v) == v))
    assert(got == tarjan(nodes, edges))
  }

  test("mergeEdges: a new edge closing a cycle THROUGH OLD EDGES merges the path of SCCs") {
    // stored graph: 1 -> 2 -> 3 (three singleton SCCs, condensation
    // carries both edges); the new edge 3 -> 1 creates no cycle in
    // the delta alone — only the condensation knows 1 reaches 3
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val e0 = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val labels0 = Scc.scc(nodes, e0)
    val cond0 = Scc.condensation(labels0, e0)
    val (labels1, cond1) = Scc.mergeEdges(labels0, cond0,
      Seq((3L, 1L)).toDF("src", "dst"))
    val got = labels1.as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"cycle through old edges not detected: $got")
    // the merged component's condensation is empty
    assert(cond1.count() == 0)
  }

  test("mergeEdges over a 3-batch schedule equals the full recompute") {
    val e = Tables.edges(spark, sf).as[(Long, Long)].collect().toSeq
    val allNodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val batches = Seq(
      e.filter(p => (p._1 + p._2) % 3 == 0),
      e.filter(p => (p._1 + p._2) % 3 == 1),
      e.filter(p => (p._1 + p._2) % 3 == 2))
    val n0 = (batches(0).map(_._1) ++ batches(0).map(_._2)).distinct
    var labels = Scc.scc(n0.toDF("id"), batches(0).toDF("src", "dst"))
    var cond = Scc.condensation(labels, batches(0).toDF("src", "dst"))
    for (b <- batches.drop(1)) {
      val (l2, c2) = Scc.mergeEdges(labels, cond, b.toDF("src", "dst"))
      labels = l2; cond = c2
    }
    val inc = labels.as[(Long, Long)].collect().toMap
    val full = Scc.scc(allNodes.toDF("id"), e.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(inc == full,
      s"diff=${(inc.toSet diff full.toSet).take(5)} / ${(full.toSet diff inc.toSet).take(5)}")
  }

  test("lookupLabels plan: broadcast joins only, stored labels never sort-merge") {
    // right_outer + broadcast-on-the-preserved-side is a silently
    // ignored hint (BHJ can't build the preserved side) — the rewrite
    // must materialize broadcast semi/outer joins with no SortMergeJoin
    // and no exchange of the stored label table
    val labels = (0L until 1000L).map(i => (i, i % 10)).toDF("id", "scc")
    val batch = Seq((1L, 2L), (3L, 4L), (2000L, 1L)).toDF("src", "dst")
    val looked = Scc.lookupLabels(labels, batch)
    val plan = looked.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // semantics: present endpoints resolve, unseen endpoints are NULL
    val m = looked.select(col("src"), col("dst"), col("s_lbl"), col("d_lbl"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (Option(r.get(2)), Option(r.get(3))))).toMap
    assert(m((1L, 2L)) == (Some(1L), Some(2L)))
    assert(m((2000L, 1L)) == (None, Some(1L)))
  }

  test("empty edge set: every node is its own singleton SCC") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val e = Seq.empty[(Long, Long)].toDF("src", "dst")
    val got = Scc.scc(nodes, e).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
