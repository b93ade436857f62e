package graft.transform

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew mitigation for joins on hot keys.
  *
  * A join key with a handful of distinct values (or one pathological
  * hot key) concentrates the shuffle on a few reducers; at corpus
  * scale that single partition can exceed executor memory. Salting
  * splits every key into `salt` sub-keys: the big side gets a
  * deterministic per-row salt, the small side is replicated `salt`
  * times, and the join runs on (key, salt) — the hot key's rows now
  * spread over `salt` reducers. Output is row-for-row identical to the
  * plain join.
  *
  * AQE's skew-join split handles many sort-merge cases automatically;
  * explicit salting remains the tool for broadcast-ineligible
  * replicated joins and for engines/plans AQE cannot rewrite.
  */
object Skew {

  /** Deterministic row salt in [0, n): a hash of the whole row, not
    * `rand()` — task retries and speculative execution must re-derive
    * the same salt or the join drops/duplicates rows.
    */
  def rowSalt(df: DataFrame, n: Int): Column =
    pmod(hash(df.columns.map(col): _*), lit(n))

  /** Inner join of a skewed `big` side with a small (but not
    * broadcastable) `small` side on `keys`, spread over `salt`
    * sub-keys per key.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String], salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltedBig = big.withColumn("_graft_salt", rowSalt(big, salt))
    val replicated = small.withColumn("_graft_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(replicated, (keys :+ "_graft_salt").toSeq).drop("_graft_salt")
  }
}
