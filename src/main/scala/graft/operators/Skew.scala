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
}
