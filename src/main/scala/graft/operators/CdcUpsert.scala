package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC keyed upsert — the reference's Redshift staging merge
  * (README.md:571-575: `DELETE FROM target USING staging WHERE id=id;
  * INSERT INTO target SELECT * FROM staging`) and the OpenSearch
  * last-writer-wins keyed upsert (README.md:167-168).
  *
  * Spark-first formulation (SURVEY.md §2.5 K7/K8): dedup the staging batch to
  * the latest change per key with a ranking window, anti-join the target, and
  * union the survivors. No in-place mutation: the output is a new snapshot,
  * which a caller atomically swaps in (zero-downtime semantics).
  *
  * Scale notes: the window and the anti-join both shuffle by `key` only —
  * one exchange each, and AQE coalesces/splits skewed partitions. If the
  * target is bucketed by key on disk, the anti-join avoids re-shuffling the
  * big side entirely.
  */
object Upsert {

  /** Keep only the latest change per key, ordered by `seq` descending
    * (sequence numbers are per-key monotone, README.md:53, 238).
    */
  def latestPerKey(changes: DataFrame, key: Column, seq: Column*): DataFrame = {
    val w = Window.partitionBy(key).orderBy(seq.map(_.desc): _*)
    changes.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Apply a CDC change batch onto a keyed target.
    *
    * @param target  current table state, unique per `keyCol`
    * @param changes raw change stream rows (same schema as target plus `opCol`)
    * @param keyCol  merge key column name
    * @param opCol   CDC op column name with values I/U/D (README.md:224 `metadata.op`)
    * @param seqCols ordering columns defining "latest" within the batch
    */
  def applyChanges(target: DataFrame, changes: DataFrame, keyCol: String,
      opCol: String, seqCols: String*): DataFrame = {
    val latest = latestPerKey(changes, col(keyCol), seqCols.map(col): _*)
    // null-safe anti-join: a NULL merge key is still ONE key — plain
    // equality never matches NULL = NULL, so the old null-key row would
    // survive alongside its replacement, breaking per-key uniqueness
    val survivors = target.join(latest.select(col(keyCol).as("__ck")),
      target(keyCol) <=> col("__ck"), "left_anti")
    // project the change rows down to the target's schema: op and sequencing
    // columns ride along in the change stream but not in the table state.
    // A NULL/unknown op upserts (null-safe compare): a malformed CDC record
    // must not silently DELETE the key (its row was already anti-joined out).
    val upserts = latest.where(!(col(opCol) <=> "D")).select(target.columns.map(col): _*)
    survivors.unionByName(upserts)
  }
}
