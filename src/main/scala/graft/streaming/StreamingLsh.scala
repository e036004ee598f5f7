package graft.streaming

import graft.functions.TextHash
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ONLINE near-duplicate detection: the dd4 MinHash+LSH banding pipeline on
  * an unbounded document stream. Every arriving document is signed
  * (per-row math — identical expressions to the batch pack), exploded into
  * its LSH bands, and checked against the per-band signature store; matches
  * with signature agreement ≥ the threshold emit immediately.
  *
  * This is the streaming half of the incremental-corpus story (dd12 is the
  * batch half): a crawler feed is deduped AS IT ARRIVES, with per-band
  * state instead of a batch self-join.
  *
  * Scale shape:
  *   - state shards by (band, band_hash) across executors — the same
  *     uniform keys the batch join shuffles on, so no hot state peers;
  *   - each new doc compares only against its band-bucket's residents
  *     (the LSH candidate guarantee), never the corpus;
  *   - residency is bounded by the dedup horizon: [[candidatePairsEvicting]]
  *     drops resident signatures the upstream watermark has passed and
  *     clears idle buckets via `GroupStateTimeout.EventTimeTimeout` —
  *     exactly how `dropDuplicatesWithinWatermark` bounds exact-dedup
  *     state. [[candidatePairs]] (NoTimeout) is the bounded-input variant
  *     the batch-equivalence specs drive.
  *
  * Emission semantics: a pair sharing MULTIPLE bands is emitted once per
  * shared band (band-local state cannot see other bands). Batch dd4 appends
  * a `distinct`; a streaming consumer dedupes the (small) candidate stream
  * with `dropDuplicatesWithinWatermark` on (doc_a, doc_b) — or tolerates
  * duplicates, since candidate verification is idempotent.
  */
object StreamingLsh {

  final case class BandRow(band: Int, bandHash: Long, docId: Long, sig: Seq[Long])
  final case class CandPair(docA: Long, docB: Long, agreement: Double)

  val K = 16          // minhash signature length
  val Bands = 4       // LSH bands (4 rows each)

  /** Per-row signing + banding: text → tokens → 3-gram shingles → rolling
    * hashes → 16-perm minhash → 4 band hashes. Stateless, codegen'd, and
    * bit-identical to the batch dd4 pipeline (same TextHash kernels).
    */
  def bandRows(docs: DataFrame): Dataset[BandRow] = {
    implicit val enc: Encoder[BandRow] = Encoders.product[BandRow]
    banded(docs).select(col("band"), col("bandHash"), col("docId"), col("sig"))
      .as[BandRow]
  }

  /** The signing/banding projection chain, carrying any extra columns
    * (e.g. the event-time) straight through — NO join back onto the input:
    * a streaming self-join would be an unwatermarked stream-stream join
    * whose state grows forever.
    */
  private def banded(docs: DataFrame, carry: String*): DataFrame = {
    import TextHash._
    val c = carry.map(col)
    docs
      .select(col("doc_id") +: tokens(col("text")).as("toks") +: c: _*)
      .select(col("doc_id") +: shingles3(col("toks")).as("sh") +: c: _*)
      .select(col("doc_id") +:
        transform(col("sh"), s => polyHash(s)).as("hs") +: c: _*)
      .select(col("doc_id") +: minhashSig(col("hs"), K).as("sig") +: c: _*)
      .select(col("doc_id") +: col("sig") +:
        posexplode(transform(sequence(lit(0), lit(Bands - 1)), b =>
          aggregate(slice(col("sig"), b * (K / Bands) + 1, lit(K / Bands)),
            lit(0L), (acc, v) => (acc * 31 + v) % Mod)))
          .as(Seq("band", "bandHash")) +: c: _*)
      .select(col("band").cast("int").as("band") +: col("bandHash") +:
        col("doc_id").as("docId") +: col("sig") +: c: _*)
  }

  final case class TimedBandRow(
      band: Int, bandHash: Long, docId: Long, sig: Seq[Long],
      eventTime: java.sql.Timestamp)

  /** [[bandRows]] with the document's event-time TIMESTAMP carried through
    * (the watermark column must reach the stateful operator) — the input to
    * the watermark-evicting variant. Callers apply the dedup horizon with
    * `.withWatermark("eventTime", H)` on the result.
    */
  def bandRowsTimed(docs: DataFrame): Dataset[TimedBandRow] = {
    implicit val enc: Encoder[TimedBandRow] = Encoders.product[TimedBandRow]
    banded(docs.withColumn("eventTime", col("arrival_ts")), "eventTime")
      .select(col("band"), col("bandHash"), col("docId"), col("sig"),
        col("eventTime"))
      .as[TimedBandRow]
  }

  /** Watermark-bounded variant of [[candidatePairs]]: resident signatures
    * whose event time has fallen behind the current watermark are dropped
    * before matching (a document only dedups against documents inside the
    * dedup horizon = the upstream watermark delay — exactly
    * `dropDuplicatesWithinWatermark`'s contract, applied to near-dup
    * state), and buckets idle past the watermark clear entirely via
    * event-time timeout. State is bounded by arrivals-per-horizon per
    * bucket no matter how long the stream runs.
    *
    * The caller owns the watermark:
    * `bandRowsTimed(docs).withWatermark("eventTime", H)`.
    */
  def candidatePairsEvicting(rows: Dataset[TimedBandRow],
                             minAgreement: Double): Dataset[CandPair] = {
    implicit val stateEnc: Encoder[Seq[(Long, Seq[Long], Long)]] =
      Encoders.kryo[Seq[(Long, Seq[Long], Long)]]
    implicit val outEnc: Encoder[CandPair] = Encoders.product[CandPair]
    implicit val keyEnc: Encoder[(Int, Long)] = Encoders.product[(Int, Long)]
    rows.groupByKey(r => (r.band, r.bandHash))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), arrivals: Iterator[TimedBandRow],
         state: GroupState[Seq[(Long, Seq[Long], Long)]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            // evict residents the watermark has passed — outside the horizon
            val resident = state.getOption.getOrElse(Seq.empty)
              .filter(_._3 >= wm)
            val fresh = arrivals
              .map(r => (r.docId, r.sig, r.eventTime.getTime)).toSeq
              .distinctBy(_._1).filterNot(f => resident.exists(_._1 == f._1))
            val pool = resident ++ fresh
            val out = for {
              f <- fresh
              other <- pool
              if other._1 != f._1
              a = math.min(f._1, other._1)
              b = math.max(f._1, other._1)
              if resident.exists(_._1 == other._1) || other._1 < f._1
              agreement = f._2.zip(other._2).count { case (x, y) => x == y } / K.toDouble
              if agreement >= minAgreement
            } yield CandPair(a, b, agreement)
            state.update(pool)
            // clear the bucket once the watermark passes its newest resident
            if (pool.nonEmpty)
              state.setTimeoutTimestamp(pool.map(_._3).max + 1)
            out.iterator
          }
      }
  }

  /** The stateful band join: per (band, band_hash) bucket, compare arrivals
    * against resident signatures, emit qualifying pairs, admit the arrivals.
    */
  def candidatePairs(rows: Dataset[BandRow], minAgreement: Double): Dataset[CandPair] = {
    implicit val stateEnc: Encoder[Seq[(Long, Seq[Long])]] =
      Encoders.kryo[Seq[(Long, Seq[Long])]]
    implicit val outEnc: Encoder[CandPair] = Encoders.product[CandPair]
    implicit val keyEnc: Encoder[(Int, Long)] = Encoders.product[(Int, Long)]
    rows.groupByKey(r => (r.band, r.bandHash))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), arrivals: Iterator[BandRow],
         state: GroupState[Seq[(Long, Seq[Long])]]) =>
          val resident = state.getOption.getOrElse(Seq.empty)
          // dedupe re-deliveries of a doc within the bucket (a doc appears
          // once per band, but a retried micro-batch could replay it)
          val fresh = arrivals.map(r => (r.docId, r.sig)).toSeq
            .distinctBy(_._1).filterNot(f => resident.exists(_._1 == f._1))
          val pool = resident ++ fresh
          val out = for {
            f <- fresh
            other <- pool
            if other._1 != f._1
            a = math.min(f._1, other._1)
            b = math.max(f._1, other._1)
            // emit each in-batch pair once (resident pairs emitted on the
            // earlier arrival already)
            if resident.exists(_._1 == other._1) || other._1 < f._1
            agreement = f._2.zip(other._2).count { case (x, y) => x == y } / K.toDouble
            if agreement >= minAgreement
          } yield CandPair(a, b, agreement)
          state.update(pool)
          out.iterator
      }
  }
}
