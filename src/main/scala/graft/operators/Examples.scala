package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised-example generation from event sequences — the
  * training-data prep for next-item / next-event models: slide a
  * bounded history window over each entity's ordered stream and emit
  * (history, label) pairs, the sequence-model analogue of the
  * skip-gram generation in [[Cooccur]].
  *
  * Scale shape: one shuffle on the entity key, then a per-partition
  * ordered window with a BOUNDED rows frame — state is histLen rows
  * per entity, never the whole sequence, so arbitrarily long user
  * histories stream through without memory growth (contrast
  * collect_list over the full partition). Order is by the explicit
  * sequence column, not timestamps, so micro-vs-nano timestamp
  * precision across engines can't reorder ties.
  */
object Examples {

  /** (entity, seq, history = the `histLen` labels strictly before this
    * row joined by spaces, label) for every row with a FULL history —
    * ramp-up rows are dropped, the standard fixed-context convention.
    * `seq` must be unique per entity (it is the total order). */
  def nextEventExamples(events: DataFrame, entity: Column, seq: Column,
      label: Column, histLen: Int): DataFrame = {
    require(histLen >= 1, s"histLen must be >= 1, got $histLen")
    val w = Window.partitionBy("entity").orderBy("seq")
      .rowsBetween(-histLen, -1)
    events.select(entity.as("entity"), seq.as("seq"), label.as("label"))
      .withColumn("hist", collect_list("label").over(w))
      .filter(size(col("hist")) === histLen)
      .select(col("entity"), col("seq"),
        concat_ws(" ", col("hist")).as("history"), col("label"))
  }
}
