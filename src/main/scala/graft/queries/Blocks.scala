package graft.queries

import graft.{GQuery, QueryPack}
import graft.blocks._
import org.apache.spark.sql.functions._

/** Driver-facing queries over the reference's golden block fixtures — the
  * event-stream core exercised end-to-end through the engine (scan → merge →
  * explode → decode → filter → agg). Oracles run DuckDB's JSON reader over
  * the SAME template files, so these are genuinely independent recomputations
  * of the reference semantics (not rows-only smoke checks).
  *
  * `sfDir` is ignored: these operators' input is the block fixture corpus
  * (FIXTURES.md §A), not the synthetic star schema.
  */
object Blocks extends QueryPack {

  private val T = FixtureSource.DefaultTemplates
  private val From = 2270370L
  private val To = 2270469L
  private val MaxObj = "maximum_object_size=20000000, union_by_name=true"

  val s1Scan = GQuery(
    "s1_block_scan",
    (s, _) => EventTables.blocks(FixtureSource.blocksRaw(s, T, From, To))
      .select("height", "chain_id", "time", "num_txs", "is_empty"),
    Some(s"""
      SELECT CAST(result.block.header.height AS BIGINT) AS height,
             result.block.header.chain_id AS chain_id,
             CAST(result.block.header.time AS TIMESTAMP) AS time,
             len(COALESCE(result.block.data.txs, [])) AS num_txs,
             len(COALESCE(result.block.data.txs, [])) = 0 AS is_empty
      FROM read_json_auto('$T/block/*.json', $MaxObj)
      WHERE CAST(result.block.header.height AS BIGINT) BETWEEN $From AND $To"""))

  val e1TxEventsByType = GQuery(
    "e1_tx_events_by_type",
    (s, _) => EventTables.txEvents(FixtureSource.blocksRaw(s, T, From, To))
      .groupBy("event_type").agg(count(lit(1)).as("n_events")),
    Some(s"""
      WITH br AS (
        SELECT CAST(result.height AS BIGINT) AS height, result.txs_results AS txs
        FROM read_json_auto('$T/block_results/*.json', $MaxObj)
        WHERE CAST(result.height AS BIGINT) BETWEEN $From AND $To
      ), tx AS (SELECT unnest(txs) AS t FROM br WHERE txs IS NOT NULL),
      ev AS (SELECT unnest(t.events) AS e FROM tx)
      SELECT COALESCE(e.type, '') AS event_type, COUNT(*) AS n_events
      FROM ev GROUP BY 1"""))

  val e2BlockEventsByType = GQuery(
    "e2_block_events_by_type",
    (s, _) => EventTables.blockEvents(FixtureSource.blocksRaw(s, T, From, To))
      .groupBy("event_type").agg(count(lit(1)).as("n_events")),
    Some(s"""
      WITH br AS (
        SELECT CAST(result.height AS BIGINT) AS height,
               result.begin_block_events AS bev
        FROM read_json_auto('$T/block_results/*.json', $MaxObj)
        WHERE CAST(result.height AS BIGINT) BETWEEN $From AND $To
      ), ev AS (SELECT unnest(bev) AS e FROM br WHERE bev IS NOT NULL)
      SELECT COALESCE(e.type, '') AS event_type, COUNT(*) AS n_events
      FROM ev GROUP BY 1"""))

  /** F10 attribute decode down to a key histogram — exercises the base64 HOF
    * pipeline against DuckDB's independent from_base64.
    */
  val f10AttrKeys = GQuery(
    "f10_attr_key_histogram",
    (s, _) => EventTables.blockEvents(FixtureSource.blocksRaw(s, T, From, To))
      .select(explode(col("attributes")).as("a"))
      .select(BlockOps.b64ToUtf8(col("a.key")).as("attr_key"))
      .groupBy("attr_key").agg(count(lit(1)).as("n")),
    Some(s"""
      WITH br AS (
        SELECT result.begin_block_events AS bev
        FROM read_json_auto('$T/block_results/*.json', $MaxObj)
        WHERE CAST(result.height AS BIGINT) BETWEEN $From AND $To
      ), ev AS (SELECT unnest(bev) AS e FROM br WHERE bev IS NOT NULL),
      attr AS (SELECT unnest(e.attributes) AS a FROM ev)
      SELECT decode(from_base64(a.key)) AS attr_key, COUNT(*) AS n
      FROM attr GROUP BY 1"""))

  /** S12–S14 combined history+live with provenance flags, expressed from the
    * driver side as: all block heights, `historical` = ≤ the abci_info current
    * height (3028985 in the fixture template default).
    */
  val s13Combined = GQuery(
    "s13_combined_stream",
    (s, _) => EventTables.blocks(FixtureSource.combinedRaw(s, T, From))
      .select("height", "num_txs", "historical"),
    Some(s"""
      SELECT CAST(result.block.header.height AS BIGINT) AS height,
             len(COALESCE(result.block.data.txs, [])) AS num_txs,
             CAST(result.block.header.height AS BIGINT) <= 3028985 AS historical
      FROM read_json_auto('$T/block/*.json', $MaxObj)"""))

  /** P2 event-type filter: blocks kept iff they contain a `transfer` tx
    * event (`EventStream.kt:132`).
    */
  val p2Filter = GQuery(
    "p2_filter_by_event_type",
    (s, _) => EventTables.blocks(
      EventTables.filterByEvents(
        FixtureSource.blocksRaw(s, T, From, To), Seq("transfer"), Nil))
      .select("height", "num_txs"),
    Some(s"""
      WITH br AS (
        SELECT CAST(result.height AS BIGINT) AS height, result.txs_results AS txs
        FROM read_json_auto('$T/block_results/*.json', $MaxObj)
        WHERE CAST(result.height AS BIGINT) BETWEEN $From AND $To
      ), tx AS (SELECT height, unnest(txs) AS t FROM br WHERE txs IS NOT NULL),
      ev AS (SELECT height, unnest(t.events) AS e FROM tx),
      keep AS (SELECT DISTINCT height FROM ev WHERE e.type = 'transfer')
      SELECT b.height,
             len(COALESCE(b2.result.block.data.txs, [])) AS num_txs
      FROM keep b
      JOIN read_json_auto('$T/block/*.json', $MaxObj) b2
        ON CAST(b2.result.block.header.height AS BIGINT) = b.height"""))

  /** F13 protobuf fee decode — no SQL equivalent (DuckDB cannot parse the
    * protobuf tx body) → rows-only check; exact values are asserted against
    * an independent Python wire-format parse in BlockCoreSpec.
    */
  val f13Fees = GQuery(
    "f13_tx_fees_by_denom",
    (s, _) => EventTables.txs(FixtureSource.blocksRaw(s, T, From, To))
      .select(col("height"), col("tx_index"), col("tx_meta"))
      .distinct()
      .groupBy(col("tx_meta.feeDenom").as("denom"))
      .agg(
        sum(col("tx_meta.feeAmount").cast("decimal(38,0)")).as("total_fee"),
        count(lit(1)).as("n_txs")),
    None)

  override def queries: Seq[GQuery] =
    Seq(s1Scan, e1TxEventsByType, e2BlockEventsByType, f10AttrKeys,
      s13Combined, p2Filter, f13Fees)
}
