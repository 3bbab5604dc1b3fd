package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for pathologically skewed keys.
  *
  * AQE's skew-join handles most runtime skew by splitting oversized
  * sort-merge partitions, but it cannot help when the skewed side
  * must shuffle-hash (spills) or when one hot key alone exceeds an
  * executor. Salting splits each hot key's rows across `salts`
  * sub-partitions and replicates the other (small, but too big to
  * broadcast) side once per salt — the classic trade: `salts`× the
  * small side's shuffle volume buys a `salts`× reduction of the
  * largest partition.
  *
  * Result is identical to a plain inner equi-join (spec-pinned);
  * the salt never reaches the output.
  */
object SaltedJoin {

  /** Inner equi-join of a skewed `big` side with a non-broadcastable
    * `small` side on `key`. */
  def inner(big: DataFrame, small: DataFrame, key: String, salts: Int = 16): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // any salt distribution yields the same join result; spreading by
    // row id splits hot keys evenly without needing a data profile
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
