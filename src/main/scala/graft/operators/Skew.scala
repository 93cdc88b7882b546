package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew tooling for the hot-key joins every 100 TB pipeline eventually
  * hits (a viral duplicate cluster in an LSH bucket, a mega-customer in
  * a fact join).
  *
  * AQE's skew-join handles storage-level skew for sort-merge joins;
  * salting is the explicit fallback when one logical key is hot enough
  * that even a split partition recomputes the same build row for
  * millions of probe rows, or when the join is broadcast-incompatible.
  */
object Skew {

  /** Salted inner equi-join: the big (skewed) side scatters each row
    * into one of `salt` sub-keys; the small side replicates `salt`×.
    * Same result as `big.join(small, keys)`, but a hot key's rows land
    * on `salt` reducers instead of one.
    *
    * The salt is derived from a hash of the whole row (deterministic,
    * no rand()): identical rows share a salt, which spreads real-world
    * hot keys (many *distinct* rows per key) evenly.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
    salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val b = big.withColumn("__salt",
      pmod(hash(struct(big.columns.map(col): _*)), lit(salt)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, keys :+ "__salt").drop("__salt")
  }

  /** Salted LSH-bucket self-join: joins `df` (aliased `a`) against
    * itself (aliased `b`) on `keyCols` equality plus `a.idCol <
    * b.idCol`, with each bucket split `salt` ways — a viral bucket (one
    * hot band value holding a huge duplicate cluster) lands on `salt`
    * reducers instead of one straggler. Side `a` takes a deterministic
    * `pmod(hash(id), salt)`; side `b` replicates to every salt, so
    * every qualifying pair appears exactly once (at a's salt). Caller
    * selects from the `a.` / `b.` aliases.
    *
    * Cost model: replication multiplies only the band-key table (bare
    * ids + band values — the dedup operators never put payloads through
    * this join), in exchange for bounding the worst partition at
    * |bucket|/salt rows. The pair count is unchanged — salting fixes
    * stragglers, not quadratic blowup (cap bucket df upstream for that).
    */
  def saltedSelfJoin(df: DataFrame, idCol: String, keyCols: Seq[String],
    salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val a = df.withColumn("__salt", pmod(hash(col(idCol)), lit(salt))).as("a")
    val b = df.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1)))).as("b")
    val cond = (keyCols :+ "__salt")
      .map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
      col(s"a.$idCol") < col(s"b.$idCol")
    a.join(b, cond)
  }
}
