package graft.prune

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seeded train/valid/test splitting + the leakage guard
  * (/root/reference/src/gnn/extract.py:227-288).
  *
  * The reference shuffles with random.seed(42) and slices 70/15/15. A
  * distributed equivalent must be retry-stable AND engine-portable, so
  * the split coordinate is a pure hash of the row key: the first byte of
  * md5(subject|predicate|object|seed), compared lexicographically on the
  * hex string ('b3'/256 = 0.6992, 'd8'/256 = 0.8438 — i.e. ~70/15/15).
  * Hex-prefix comparison is writable identically in any SQL engine
  * (DuckDB oracle parity; no conv() needed).
  */
object Splits {

  /** First two hex chars of the seeded row hash. */
  def hashPrefix(seed: Long): org.apache.spark.sql.Column =
    substring(md5(concat_ws("|",
      col("subject"), col("predicate"), col("object"), lit(seed.toString))), 1, 2)

  /** Adds a `split` column: train/valid/test at ~70/15/15. */
  def assign(triples: DataFrame, seed: Long = 42L): DataFrame =
    triples.withColumn("split",
      when(hashPrefix(seed) < "b3", "train")
        .when(hashPrefix(seed) < "d8", "valid")
        .otherwise("test"))

  /** Leakage guard: any (s,p,o) overlap between splits fails the job —
    * reference raises ValueError("Data leakage detected!") at
    * extract.py:276.
    */
  def checkNoLeakage(withSplit: DataFrame): Unit = {
    val dup = withSplit
      .groupBy(col("subject"), col("predicate"), col("object"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
      .limit(1)
      .count()
    if (dup > 0) throw new IllegalStateException("Data leakage detected!")
  }
}
