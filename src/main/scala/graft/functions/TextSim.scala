package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Similarity primitives shared by the dedup/ANN operators.
  *
  * Everything is built from md5 + integer arithmetic so the DuckDB
  * oracle can evaluate the *identical* function: one md5 per
  * shingle/token split into two 28-bit ints (h1, h2), expanded into a
  * hash family via Kirsch–Mitzenmacher double hashing
  * (g_k = (h1 + k*h2) mod P). All intermediates stay < 2^36, safe for
  * 64-bit ANSI arithmetic in both engines.
  *
  * Composition over UDFs: these are higher-order-function expressions —
  * per-row, no shuffle. (HOF lambdas are not whole-stage-codegen'd; if
  * a profile ever shows them hot at scale, the drop-in upgrade is a
  * native Catalyst Expression with doGenCode, same semantics.)
  */
object TextSim {

  /** Deterministic 6-dp rounding: `floor(x·1e6 + 0.5)/1e6` evaluated
    * in IEEE double — bit-identical across engines BY CONSTRUCTION,
    * unlike `round(x, 6)` whose half-way handling differs between
    * Spark (BigDecimal HALF_UP on the decimal form) and DuckDB
    * (double-arithmetic rounding): ratios of small integers land on
    * exact binary halves (e.g. 231.7/320 = 0.7240625) and the two
    * `round`s disagree on the 6th digit.
    */
  def r6(c: Column): Column = floor(c * 1e6 + lit(0.5)) / 1e6

  def r6Sql(e: String): String = s"floor(($e) * 1000000.0 + 0.5) / 1000000.0"

  /** 4-dp variant for money-like aggregates (sum_charge etc. are
    * 6-dp-exact in decimal, so their 4-dp rounding hits half-way
    * boundaries where Spark's and DuckDB's `round` disagree).
    */
  def r4(c: Column): Column = floor(c * 1e4 + lit(0.5)) / 1e4

  def r4Sql(e: String): String = s"floor(($e) * 10000.0 + 0.5) / 10000.0"

  /** Order-independent sum of a double column. IEEE double addition is
    * not associative, so `sum(double)` depends on partition/merge order:
    * with enough groups some sum lands on a rounding boundary and the
    * r4/r6'd result flips between runs (q_sessionize flaked exactly
    * this way). Casting each value to decimal(20,6) first (HALF_UP in
    * both engines) makes the sum exact and order-free; the cast back to
    * double is lossless for the magnitudes involved.
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(20,6)")).cast("double")

  def dsumSql(e: String): String = s"sum(($e)::DECIMAL(20,6))::DOUBLE"

  /** Modulus for the double-hashing family (prime, < 2^29). */
  val P: Long = 536870909L
  val MinhashK = 64
  val Bands = 16
  val RowsPerBand = 4
  val SimhashBits = 48
  val SimhashBands = 4 // 12 bits each; Hamming<=3 => some band equal

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Distinct word n-gram shingles (n=3). Caller filters docs with
    * fewer than 3 tokens.
    */
  def shingles3(toks: Column): Column =
    array_distinct(transform(sequence(lit(1), size(toks) - 2), i =>
      concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
        element_at(toks, i + 2))))

  /** SQL mirror of [[shingles3]] over a list column `t`. */
  def shingles3Sql(t: String): String =
    s"list_distinct([$t[i] || ' ' || $t[i+1] || ' ' || $t[i+2] for i in range(1, len($t) - 1)])"

  /** (h1, h2) struct per element: two 28-bit ints from one md5. */
  def hashPair(s: Column): Column = {
    val m = md5(s)
    struct(
      conv(substring(m, 1, 7), 16, 10).cast("long").as("h1"),
      conv(substring(m, 8, 7), 16, 10).cast("long").as("h2"))
  }

  def hashPairSql(s: String): String =
    s"{'h1': ('0x' || substr(md5($s), 1, 7))::BIGINT, 'h2': ('0x' || substr(md5($s), 8, 7))::BIGINT}"

  /** One (h1, h2) struct per array element — md5 evaluated ONCE per
    * element. Always materialize this as its own projection before
    * feeding [[minhashSigFromPairs]]/[[simhash48FromPairs]]: inlining
    * it into their per-k lambdas would re-md5 every element k times
    * (64×/48× — measured 40× slower at sf0.1).
    */
  def hashPairs(arr: Column): Column = transform(arr, s => hashPair(s))

  /** 64-element MinHash signature from a precomputed pair array. */
  def minhashSigFromPairs(pairs: Column): Column =
    transform(sequence(lit(0), lit(MinhashK - 1)), k =>
      array_min(transform(pairs, p => (p("h1") + k * p("h2")) % P)))

  /** 64-element MinHash signature of a shingle array. */
  def minhashSig(shingleArr: Column): Column =
    minhashSigFromPairs(hashPairs(shingleArr))

  def minhashSigSql(shingleList: String): String =
    s"""[ list_min(list_transform(list_transform($shingleList, s -> ${hashPairSql("s")}),
       |      p -> (p.h1 + k * p.h2) % $P)) for k in range(0, $MinhashK) ]""".stripMargin

  /** 48-bit SimHash from a precomputed pair array (multiset — repeated
    * tokens weigh more, like classic simhash term frequency).
    */
  def simhash48FromPairs(pairs: Column): Column =
    aggregate(sequence(lit(0), lit(SimhashBits - 1)), lit(0L), (acc, k) => {
      val bitSum = aggregate(pairs, lit(0L), (a, p) =>
        a + (((p("h1") + k * p("h2")) % P).bitwiseAND(lit(1L)) * 2 - 1))
      acc + when(bitSum > 0, pow(lit(2.0), k).cast("long")).otherwise(lit(0L))
    })

  /** 48-bit SimHash over a token array. */
  def simhash48(toks: Column): Column = simhash48FromPairs(hashPairs(toks))

  def simhash48Sql(tokList: String): String =
    s"""list_sum([ CASE WHEN list_sum(list_transform(
       |    list_transform($tokList, t -> ${hashPairSql("t")}),
       |    p -> ((p.h1 + k * p.h2) % $P & 1) * 2 - 1)) > 0
       |  THEN pow(2, k)::BIGINT ELSE 0 END for k in range(0, $SimhashBits) ])::BIGINT""".stripMargin
}
