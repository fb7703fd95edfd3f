package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Continuous data-quality gate: the streaming twin of the batch q134
  * constraint battery. Each micro-batch evaluates a declared set of
  * row-level violation predicates in ONE combinable aggregation and
  * appends a per-epoch report row per rule — exact integer counts, so
  * epoch increments SUM to the all-time truth (the manifest pattern:
  * auditing N rules over M epochs is an aggregation over N×M tiny rows,
  * never a rescan of the data).
  *
  * Reports land under `reportPath/__batch=<epoch>` — the idempotent
  * at-least-once layout every stage in this package shares (a replayed
  * epoch overwrites its own report instead of double-counting).
  *
  * Row-level rules only (null checks, ranges, domains, regex shape):
  * exactly the checks that run AT SCAN SPEED per batch. Cross-row rules
  * (uniqueness, referential integrity) need history state and belong to
  * the batch battery or a keyed-state stage — declaring them here would
  * silently under-count, so the API does not accept them.
  */
object ConstraintMonitor {

  /** A named row-level violation predicate: `violatedIf` is true on
    * rows that BREAK the rule. */
  case class Rule(name: String, violatedIf: Column)

  /** Per-rule violation counts (+ `__rows` scanned) for one static
    * frame — one combinable aggregation, exposed for the spec and for
    * batch backfills over historical epochs. */
  def report(batch: DataFrame, rules: Seq[Rule]): DataFrame = {
    // coalesce: sum over ZERO rows is NULL — an empty epoch must report
    // violations=0/pass=true, not nulls a pass-filter would skip
    val aggs = count(lit(1)).as("__rows") +:
      rules.map(r =>
        coalesce(sum(when(r.violatedIf, 1L).otherwise(0L)), lit(0L)).as(r.name))
    val one = batch.agg(aggs.head, aggs.tail: _*)
    one.select(col("__rows"), explode(array(rules.map(r =>
        struct(lit(r.name).as("rule"), col(r.name).as("violations"))): _*))
      .as("__c"))
      .select(col("__c.rule").as("rule"),
        col("__c.violations").as("violations"),
        col("__rows").as("rows_scanned"),
        (col("__c.violations") === 0).as("pass"))
  }

  /** `rows` must be a STREAMING frame. One report row per rule per
    * epoch lands under `reportPath/__batch=<epoch>`. */
  def start(rows: DataFrame, rules: Seq[Rule], reportPath: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    rows.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        report(batch, rules)
          .coalesce(1) // N tiny rows — one file per epoch, not one per partition
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$reportPath/__batch=$batchId")
        ()
      }
      .start()
}
