package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental latest-wins snapshot over a CHANGELOG STREAM — the streaming
  * counterpart of the batch `cdc1_latest_snapshot` materialization
  * ([[graft.queries.Cdc.latestSnapshot]]): as change records arrive, the
  * per-entity current row converges to exactly what the batch MERGE over
  * the full log would produce.
  *
  * The whole operator is ONE declarative streaming aggregation:
  * `max_by(payload, (ts, event_id))` per entity. Because (ts, event_id) is
  * a total order and max is associative/commutative, the result is
  * independent of arrival order and batching — late or out-of-order change
  * records need no special handling (no watermark is required for
  * correctness; one may be added to bound re-emission frequency).
  *
  * Scale shape: state is ONE small row per live entity — bounded by the
  * entity population, NOT the changelog length — sharded across executors
  * by the uniform entity key, exactly the state discipline of a
  * Delta/Iceberg streaming MERGE. Deletes stay IN the state (a tombstone
  * is information: it must beat earlier upserts that arrive later); the
  * published snapshot filters them at read time, so a late upsert older
  * than the tombstone correctly loses.
  */
object StreamingCdc {

  /** Maintain the latest-wins state over a (possibly streaming) changelog
    * with columns (user_id, event_id, ts, op, value). Emit in Update or
    * Complete mode; filter `op = 'upsert'` for the visible snapshot.
    */
  def snapshotState(changes: DataFrame): DataFrame =
    changes
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("op"), col("value"), col("ts"), col("event_id")),
        struct(col("ts"), col("event_id"))).as("last"),
        count(lit(1)).as("n_changes"))
      .select(col("user_id"),
        expr("unix_millis(last.ts)").as("as_of_ms"),
        col("last.op").as("op"),
        col("last.value").as("current_value"),
        col("n_changes"))

  /** The visible snapshot: tombstoned entities drop out. */
  def snapshot(changes: DataFrame): DataFrame =
    snapshotState(changes).filter(col("op") === "upsert")
      .drop("op")
}
