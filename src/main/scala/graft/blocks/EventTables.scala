package graft.blocks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import BlockOps._

/** The flatten/explode core (SURVEY §2.4 E1–E6): turns the canonical raw
  * block rows ([[BlockSchemas.raw]]) into the engine's four relational views.
  *
  * Spark-first design notes:
  *   - E1's positional tx-hash alignment (`block.data.txs[i]` ↔
  *     `txs_results[i]`) is a zip join on array index *within one row* — done
  *     with `posexplode` + `element_at`, no shuffle, stays in whole-stage
  *     codegen except the two scalar UDFs.
  *   - The per-tx protobuf decode (E5/F13) runs once per tx (not per event):
  *     we explode txs first, attach hash/fee/memo, then explode events.
  *   - All defaults (`?: ""`, `?: emptyList()`, fee `?: ZERO`) mirror
  *     `models/Extensions.kt:137–162` exactly.
  */
object EventTables {

  /** blocks view — one row per height (the reference's `StreamBlock` header
    * facts; `isEmpty` per `StreamBlock.kt:14`).
    */
  def blocks(raw: DataFrame): DataFrame =
    raw.select(
      col("height"),
      col("chain_id"),
      col("time"),
      col("num_txs"),
      (coalesce(col("num_txs"), lit(0)) === 0).as("is_empty"),
      col("historical"),
      col("block.header.data_hash").as("data_hash"),
      col("block.header.app_hash").as("app_hash"),
      col("block.header.proposer_address").as("proposer_address"),
      col("block_id.hash").as("block_hash"))

  /** Exploded per-tx intermediate: one row per (height, tx index), carrying
    * the tx result struct plus hash/fee/denom/memo (E1 positional zip + E5).
    */
  def txs(raw: DataFrame): DataFrame =
    raw
      .filter(col("txs_results").isNotNull)
      .select(
        col("height"), col("time"), col("chain_id"),
        col("block.data.txs").as("raw_txs"),
        posexplode(col("txs_results")).as(Seq("tx_index", "tx")))
      .withColumn("tx_b64", element_at(col("raw_txs"), col("tx_index") + 1))
      .withColumn("tx_hash", coalesce(txHash(col("tx_b64")), lit("")))
      .withColumn("tx_meta", txMetaUdf(col("tx_b64")))
      .drop("raw_txs")

  /** E1: tx_events — one row per (height, tx, event). */
  def txEvents(raw: DataFrame): DataFrame =
    txs(raw)
      .select(
        col("height").as("block_height"),
        col("time").as("block_datetime"),
        col("tx_index"),
        col("tx_hash"),
        explode(coalesce(col("tx.events"), array())).as("event"),
        col("tx_meta"),
        col("tx.gas_wanted").cast("long").as("gas_wanted"),
        col("tx.gas_used").cast("long").as("gas_used"))
      .select(
        col("block_height"),
        col("block_datetime"),
        col("tx_index"),
        col("tx_hash"),
        coalesce(col("event.type"), lit("")).as("event_type"),
        coalesce(col("event.attributes"), array().cast(
          org.apache.spark.sql.types.ArrayType(BlockSchemas.attribute)))
          .as("attributes"),
        attrsToMap(coalesce(col("event.attributes"),
          array().cast(org.apache.spark.sql.types.ArrayType(BlockSchemas.attribute))))
          .as("attributes_decoded"),
        col("tx_meta.feeAmount").cast("decimal(38,0)").as("fee"),
        col("tx_meta.feeDenom").as("denom"),
        col("tx_meta.memo").as("note"),
        col("gas_wanted"),
        col("gas_used"))

  /** E2: block_events — begin-block events, one row per (height, event). */
  def blockEvents(raw: DataFrame): DataFrame =
    raw
      .filter(col("begin_block_events").isNotNull)
      .select(
        col("height").as("block_height"),
        col("time").as("block_datetime"),
        explode(col("begin_block_events")).as("event"))
      .select(
        col("block_height"),
        col("block_datetime"),
        coalesce(col("event.type"), lit("")).as("event_type"),
        col("event.attributes").as("attributes"),
        attrsToMap(coalesce(col("event.attributes"),
          array().cast(org.apache.spark.sql.types.ArrayType(BlockSchemas.attribute))))
          .as("attributes_decoded"))

  /** E3: tx_errors — failed txs (`code != 0`), with the reference's defaults
    * (`toBlockError`: info = log ?: "", fee ?: ZERO, `models/Extensions.kt:126`).
    */
  def txErrors(raw: DataFrame): DataFrame =
    txs(raw)
      .filter(coalesce(col("tx.code").cast("long"), lit(0L)) =!= 0L)
      .select(
        col("height").as("block_height"),
        col("time").as("block_datetime"),
        coalesce(col("tx.code").cast("long"), lit(0L)).as("code"),
        coalesce(col("tx.log"), lit("")).as("info"),
        col("tx_hash"),
        feeOrZero(col("tx_meta.feeAmount")).as("fee"),
        coalesce(col("tx_meta.feeDenom"), lit("")).as("denom"))

  // === stream-level predicates (SURVEY §2.3 P1–P3) ===================

  /** P1: `filterNonEmptyIfSet` — drop empty blocks when asked. */
  def filterNonEmpty(raw: DataFrame, skipEmpty: Boolean): DataFrame =
    if (skipEmpty) raw.filter(size(coalesce(col("block.data.txs"), array())) > 0)
    else raw

  /** P2: `filterByEvents` — keep a block iff any tx-event or begin-block
    * event type is in the given sets; empty sets keep everything
    * (`EventStream.kt:132–149`). Pure HOF `exists`, no UDF, no shuffle.
    */
  def filterByEvents(raw: DataFrame, txEventTypes: Seq[String],
                     blockEventTypes: Seq[String]): DataFrame = {
    if (txEventTypes.isEmpty && blockEventTypes.isEmpty) raw
    else {
      val txMatch =
        if (txEventTypes.isEmpty) lit(false)
        else exists(coalesce(col("txs_results"), array().cast(
          org.apache.spark.sql.types.ArrayType(BlockSchemas.txResult))),
          tx => exists(coalesce(tx("events"), array().cast(
            org.apache.spark.sql.types.ArrayType(BlockSchemas.abciEvent))),
            e => e("type").isin(txEventTypes: _*)))
      val blockMatch =
        if (blockEventTypes.isEmpty) lit(false)
        else exists(coalesce(col("begin_block_events"), array().cast(
          org.apache.spark.sql.types.ArrayType(BlockSchemas.abciEvent))),
          e => e("type").isin(blockEventTypes: _*))
      raw.filter(txMatch || blockMatch)
    }
  }

  // === SQL surface ====================================================

  /** Register the engine's canonical relational views as temp views so the
    * whole surface is reachable from `spark.sql(...)` — `raw_blocks`,
    * `blocks`, `tx_events`, `block_events`, `tx_errors` (the preferred flat
    * tables of SURVEY §2.4 E6). Works identically over a batch fixture read
    * or a blockfeed connector frame; combined with
    * [[graft.Tables.registerAll]] this is the full catalog a reference user
    * queries after switching.
    */
  def registerAll(raw: DataFrame): Unit = {
    raw.createOrReplaceTempView("raw_blocks")
    blocks(raw).createOrReplaceTempView("blocks")
    txEvents(raw).createOrReplaceTempView("tx_events")
    blockEvents(raw).createOrReplaceTempView("block_events")
    txErrors(raw).createOrReplaceTempView("tx_errors")
  }
}
