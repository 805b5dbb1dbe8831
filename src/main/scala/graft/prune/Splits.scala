package graft.prune

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seeded train/valid/test splitting + the leakage guard
  * (/root/reference/src/gnn/extract.py:227-288).
  *
  * The reference shuffles with random.seed(42) and slices 70/15/15. A
  * distributed equivalent must be retry-stable AND engine-portable, so
  * the split coordinate is a pure hash of the row key: the first 8 hex
  * chars of md5(subject|predicate|object|seed) mapped to [0,1). The same
  * expression is writable in any SQL engine (DuckDB oracle parity).
  */
object Splits {

  /** u in [0,1) from the row content, deterministic. */
  def unitHash(seed: Long): org.apache.spark.sql.Column =
    conv(substring(md5(concat_ws("|",
      col("subject"), col("predicate"), col("object"), lit(seed.toString))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Adds a `split` column: train/valid/test at 70/15/15. */
  def assign(triples: DataFrame, seed: Long = 42L): DataFrame =
    triples.withColumn("split",
      when(unitHash(seed) < 0.7, "train")
        .when(unitHash(seed) < 0.85, "valid")
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
