package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialization for iterative drivers (BFS frontier, Lloyd rounds,
  * label propagation): every hop must cut lineage — at depth 20 over
  * 100 TB of edges one recursive plan would not even compile — and
  * mint fresh attribute ids so hop N+1's self-joins aren't ambiguous.
  *
  * Two strategies, chosen per call:
  * - `localCheckpoint` (default): blocks cached on executors. Fast, but
  *   NOT fault-tolerant — losing an executor loses lineage-less blocks
  *   and kills the job. Right for local/interactive runs.
  * - reliable `checkpoint` to `checkpointDir`: blocks written to
  *   shared storage (HDFS/S3 on a cluster); an executor loss just
  *   re-reads. Right for long multi-hour iterative jobs at scale.
  */
object Iterate {

  def materialize(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (!sc.getCheckpointDir.exists(_.startsWith(dir)))
          sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
}
