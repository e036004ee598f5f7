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

  /** S3: header/meta-only scan over the 20-height `blockchain` pages — the
    * cheap projection path (`HistoricalBlockHeaderFlow.kt:58`); in the DSv2
    * connector this is what column pruning switches to.
    */
  val s3MetaScan = GQuery(
    "s3_meta_scan",
    (s, _) => FixtureSource.blockMetas(s, T, From, To)
      .select("height", "chain_id", "num_txs", "block_size", "block_hash"),
    Some(s"""
      WITH m AS (SELECT unnest(result.block_metas) AS meta
        FROM read_json_auto('$T/blockchain/*.json', $MaxObj))
      SELECT DISTINCT CAST(meta.header.height AS BIGINT) AS height,
             meta.header.chain_id AS chain_id,
             CAST(meta.num_txs AS INT) AS num_txs,
             CAST(meta.block_size AS BIGINT) AS block_size,
             meta.block_id.hash AS block_hash
      FROM m
      WHERE CAST(meta.header.height AS BIGINT) BETWEEN $From AND $To"""))

  /** P1: `filterNonEmptyIfSet` — 29 of the 100 historical fixture blocks
    * carry txs (reference ground truth `EXPECTED_NONEMPTY_BLOCKS`,
    * `testFixtures/.../utils/Constants.kt:12–36`).
    */
  val p1NonEmpty = GQuery(
    "p1_skip_empty_blocks",
    (s, _) => EventTables.blocks(
      EventTables.filterNonEmpty(
        FixtureSource.blocksRaw(s, T, From, To), skipEmpty = true))
      .select("height", "num_txs"),
    Some(s"""
      SELECT CAST(result.block.header.height AS BIGINT) AS height,
             len(COALESCE(result.block.data.txs, [])) AS num_txs
      FROM read_json_auto('$T/block/*.json', $MaxObj)
      WHERE CAST(result.block.header.height AS BIGINT) BETWEEN $From AND $To
        AND len(COALESCE(result.block.data.txs, [])) > 0"""))

  /** E3: tx_errors (`txErroredEvents`, `models/Extensions.kt:108`) — the
    * fixture corpus has zero failed txs, and the oracle independently
    * confirms the empty result; value-level semantics (defaults, fee ?: 0)
    * are covered on synthetic raws in BlockCoreSpec.
    */
  val e3TxErrors = GQuery(
    "e3_tx_errors",
    (s, _) => EventTables.txErrors(FixtureSource.blocksRaw(s, T, From, To))
      .select("block_height", "code", "info"),
    Some(s"""
      WITH br AS (
        SELECT CAST(result.height AS BIGINT) AS height, result.txs_results AS txs
        FROM read_json_auto('$T/block_results/*.json', $MaxObj)
        WHERE CAST(result.height AS BIGINT) BETWEEN $From AND $To
      ), tx AS (SELECT height, unnest(txs) AS t FROM br WHERE txs IS NOT NULL)
      SELECT height AS block_height, CAST(t.code AS BIGINT) AS code,
             COALESCE(t.log, '') AS info
      FROM tx WHERE COALESCE(t.code, 0) != 0"""))

  /** F3/F4: tx-hash derivation `upper(sha256(unbase64(tx)))`
    * (`models/Extensions.kt:35,57`). Rows-only: DuckDB 1.0 cannot sha256 a
    * BLOB. Re-verified against the driver's DuckDB 1.0.0 (2026-08-13):
    * `sha256(from_base64('...'))` fails with "Binder Error: No function
    * matches sha256(BLOB)" — the function only takes VARCHAR, and arbitrary
    * tx bytes are not valid UTF-8 so no lossless VARCHAR path exists
    * (`decode()` throws on invalid UTF-8; the implicit-cast escaped rendering
    * hashes the wrong preimage). Exact digests are instead asserted against
    * independently computed constants in BlockCoreSpec.
    */
  val f4TxHashes = GQuery(
    "f4_tx_hashes",
    (s, _) => FixtureSource.blocksRaw(s, T, From, To)
      .filter(size(coalesce(col("block.data.txs"), array())) > 0)
      .select(
        col("height"),
        posexplode(BlockOps.txHashes(col("block.data.txs")))
          .as(Seq("tx_index", "tx_hash"))),
    None)

  /** P6/K3: console observer's every-nth sampling
    * (`ConsoleObserver.kt:41`) as a pure filter.
    */
  val p6Nth = GQuery(
    "p6_nth_block_sample",
    (s, _) => EventTables.blocks(FixtureSource.blocksRaw(s, T, From, To))
      .filter(col("height") % 10 === 0)
      .select("height", "num_txs"),
    Some(s"""
      SELECT CAST(result.block.header.height AS BIGINT) AS height,
             len(COALESCE(result.block.data.txs, [])) AS num_txs
      FROM read_json_auto('$T/block/*.json', $MaxObj)
      WHERE CAST(result.block.header.height AS BIGINT) BETWEEN $From AND $To
        AND CAST(result.block.header.height AS BIGINT) % 10 = 0"""))

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

  // === the same semantics THROUGH the DSv2 connector ==================
  // These put the blockfeed connector's batch machinery — partition
  // planning, height pushdown, meta-mode column pruning, the executor-side
  // readers — on the driver's oracle gate, not only on specs.

  private def feed(s: org.apache.spark.sql.SparkSession,
                   opts: (String, String)*): org.apache.spark.sql.DataFrame = {
    val r = s.read.format("blockfeed").option("path", T)
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** S1/S3 via the connector: the meta-safe projection flips the scan to the
    * cheap 20-height `/blockchain` page path (column pruning, §4).
    */
  val s1Connector = GQuery(
    "s1b_connector_scan",
    (s, _) => feed(s, "from" -> From.toString, "to" -> To.toString)
      .select("height", "chain_id", "num_txs"),
    Some(s"""
      SELECT CAST(result.block.header.height AS BIGINT) AS height,
             result.block.header.chain_id AS chain_id,
             len(COALESCE(result.block.data.txs, [])) AS num_txs
      FROM read_json_auto('$T/block/*.json', $MaxObj)
      WHERE CAST(result.block.header.height AS BIGINT) BETWEEN $From AND $To"""))

  /** S2 via the connector: explicit height list planned as its own
    * partitions (`List<Long>.toBlockData`, `HistoricalBlockFlow.kt:52`).
    */
  val s2HeightList = GQuery(
    "s2_height_list_scan",
    (s, _) => feed(s, "heights" -> s"$From,2270400,2270444,$To")
      .select("height", "num_txs"),
    Some(s"""
      SELECT CAST(result.block.header.height AS BIGINT) AS height,
             len(COALESCE(result.block.data.txs, [])) AS num_txs
      FROM read_json_auto('$T/block/*.json', $MaxObj)
      WHERE CAST(result.block.header.height AS BIGINT)
            IN ($From, 2270400, 2270444, $To)"""))

  /** E1 via the connector: full-mode per-height fetch feeding the event
    * explode — the reference's end-to-end scan→decode→explode→agg shape.
    */
  val e1Connector = GQuery(
    "e1b_connector_tx_events",
    // heightsPerPartition=8 → ~13 parallel fetch tasks for the 100-height
    // range (the default 128 would plan ONE task here; the reference's
    // concurrency×20 slicing makes the same trade, HistoricalBlockHeaderFlow.kt:73)
    (s, _) => EventTables.txEvents(
        feed(s, "from" -> From.toString, "to" -> To.toString,
          "heightsPerPartition" -> "8"))
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

  /** st6: the MICRO-BATCH connector path on the oracle gate. s1b gates
    * the batch scan; this drains the same ground truth through
    * `readStream.format("blockfeed")` — height-offset planning, admission
    * control (maxHeightsPerTrigger=40 splits the 100 heights into 3
    * micro-batches), executor partition readers, AvailableNow
    * termination — so the offset machinery itself must reproduce s1b's
    * rows exactly. Oracle: s1b's SQL verbatim (DuckDB over the same
    * golden templates).
    */
  val st6StreamConnector = GQuery(
    "st6_stream_connector_scan",
    (s, _) => StreamGate.drain(s,
      s.readStream.format("blockfeed").option("path", T)
        .option("from", From.toString).option("to", To.toString)
        .option("maxHeightsPerTrigger", "40").load()
        .select("height", "chain_id", "num_txs"),
      "st6_blocks", mode = "append"),
    s1Connector.oracle)

  override def queries: Seq[GQuery] =
    Seq(s1Scan, s3MetaScan, e1TxEventsByType, e2BlockEventsByType,
      e3TxErrors, f4TxHashes, f10AttrKeys, s13Combined, p1NonEmpty,
      p2Filter, p6Nth, f13Fees, s1Connector, s2HeightList, e1Connector,
      st6StreamConnector)
}
