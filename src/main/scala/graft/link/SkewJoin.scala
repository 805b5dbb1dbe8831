package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (north_star: "salted sort-merge join
  * for skewed head entities").
  *
  * The big (skewed) side gets a deterministic per-row salt in [0, S)
  * derived from xxhash64 of caller-chosen row-identity columns (NOT
  * rand() — must be retry-stable, SURVEY.md §7.4); the small side is
  * exploded xS. Result is row-identical to the plain equi-join — there is
  * a ScalaCheck property asserting exactly that — but the shuffle spreads
  * each hot key over S reducer partitions.
  *
  * AQE skew-join handles the same problem adaptively; this explicit form
  * is for joins where the skew is known a priori (hub entities own ~40%
  * of edges in the fixture, mirroring the reference's Alzheimer's hub).
  */
object SkewJoin {

  def salted(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      bigRowIdentity: Seq[Column]): DataFrame = {
    require(saltBuckets > 0)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(bigRowIdentity: _*), lit(saltBuckets.toLong)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig
      .join(saltedSmall, keys :+ "__salt")
      .drop("__salt")
  }
}
