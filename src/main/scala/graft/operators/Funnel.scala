package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: how many users performed step 1, then step 2
  * strictly after it, then step 3 strictly after that, … — the classic
  * product-analytics conversion funnel, here as a deterministic batch
  * operator over an events table.
  *
  * Each stage is one conditional aggregate per user — `min(ts) WHERE
  * type = step AND ts > previous stage's ts` — so the whole funnel is
  * `numSteps` map-side-combined aggregates joined on the user key: no
  * windows, no per-user sorts, no row explosion; a hot user costs one
  * combiner entry per map task. Earliest-completion semantics (always the
  * smallest qualifying timestamp per stage) make the result a pure
  * function of the data.
  *
  * Returns one row per funnel step: (step index, step name, users reaching
  * that step). */
object Funnel {

  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    // stage 0: earliest step-0 event per user
    var reached = events
      .filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__t"))
    var counts = Vector(reached.count())
    steps.zipWithIndex.drop(1).foreach { case (step, _) =>
      reached = events
        .filter(col(typeCol) === step)
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
        .join(reached, "__u")
        .filter(col("__ts") > col("__t"))
        .groupBy("__u")
        .agg(min(col("__ts")).as("__t"))
      counts :+= reached.count()
    }
    steps.zipWithIndex.map { case (s, i) =>
      (i.toLong, s, counts(i))
    }.toDF("step", "step_name", "n_users")
  }
}
