package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min-Sketch helpers over Datasets/DataFrames.
  *
  * Re-expresses the reference's Algebird-based CMS builders
  * (`src/main/scala/org/anish/spark/skew/Utils.scala:92-121`) on Spark's
  * built-in `org.apache.spark.util.sketch.CountMinSketch`:
  *
  *  - the reference did `ds.rdd.map(cmsMonoid.create).reduce(cmsMonoid.plus)`
  *    (an encoder boundary + RDD round-trip, two extra stages);
  *  - here each sketch is one Catalyst aggregate job
  *    (`df.stat.countMinSketch`, internally a partial+final
  *    `CountMinSketchAgg` — same monoid idea, no RDD detour), so filters
  *    and column pruning still push down to the scan.
  *
  * Parameter translation: Algebird (eps, delta) → Spark (eps, confidence = 1 − delta).
  */
object CmsOps {

  /** CMS over an arbitrary key expression of a DataFrame. One aggregate job. */
  def cmsOf(df: DataFrame, key: Column,
      eps: Double = 0.005, delta: Double = 1e-8, seed: Int = 1): CountMinSketch =
    df.stat.countMinSketch(key, eps, 1.0 - delta, seed)

  /** Per-group sketches: `df.groupBy(groupCols).agg(cmsAgg(col))` — the
    * extension the reference lacked (its monoid reduce was global-only).
    * Returns the sketch serialized as binary; deserialize with [[fromBytes]].
    */
  def cmsAgg(key: Column,
      eps: Double = 0.005, delta: Double = 1e-8, seed: Int = 1): Column =
    count_min_sketch(key, lit(eps), lit(1.0 - delta), lit(seed))

  def fromBytes(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))

  /** Reference-parity implicits: `ds.getCMS(...)` over a Dataset's values
    * (`Utils.scala:108-121`) and `ds.getCmsForKey(...)` over a pair-Dataset's
    * keys (`Utils.scala:92-106`).
    */
  implicit class DatasetCms[T](val ds: Dataset[T]) extends AnyVal {
    def getCMS(eps: Double = 0.005, delta: Double = 1e-8, seed: Int = 1): CountMinSketch = {
      val df = ds.toDF()
      cmsOf(df, df.col(df.columns.head), eps, delta, seed)
    }
  }

  implicit class PairDatasetCms[K, V](val ds: Dataset[(K, V)]) extends AnyVal {
    def getCmsForKey(eps: Double = 0.005, delta: Double = 1e-8, seed: Int = 1): CountMinSketch = {
      val df = ds.toDF("_1", "_2")
      cmsOf(df, df.col("_1"), eps, delta, seed)
    }
  }
}
