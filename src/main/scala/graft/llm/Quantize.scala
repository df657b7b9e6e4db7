package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding storage quantization: symmetric per-vector int8 — a float32
  * embedding column shrinks 4× (plus the one double scale per vector),
  * which at 100 TB is the difference between an ANN index that fits on
  * the cluster and one that doesn't.
  *
  * Codes are `floor(x / maxAbs * 127)` with a per-vector `maxAbs` scale:
  * every step is elementwise IEEE arithmetic in a fixed expression shape,
  * so the codes are deterministic and exactly replayable in SQL (no
  * rounding-mode ambiguity — `floor`, not round-half-X, which differs
  * between engines). A zero vector gets scale 0 and all-zero codes.
  * Dequantization is `code * maxAbs / 127` (approximate by design;
  * max quantization error per component is maxAbs/127).
  *
  * Shuffle-free narrow map; codegen'd higher-order functions only. */
object Quantize {

  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val mx = array_max(transform(v, x => abs(x)))
    val codes = when(mx === 0.0,
        transform(v, _ => lit(0L)))
      .otherwise(transform(v, x => floor(x / mx * 127.0)))
    df.select(col(idCol), codes.as("codes"), mx.as("scale"))
  }

  /** Approximate reconstruction from [[quantizeInt8]] output. */
  def dequantizeInt8(df: DataFrame, codesCol: String, scaleCol: String): DataFrame =
    df.withColumn("vec_approx",
      transform(col(codesCol), c => c.cast("double") * col(scaleCol) / 127.0))
}
