package graft.blocks

import scala.collection.mutable.ArrayBuffer

/** Minimal protobuf wire-format reader for `cosmos.tx.v1beta1.Tx`, built only
  * from the public protobuf wire spec (varint / length-delimited framing).
  *
  * The reference decodes the full generated class just to pull three scalars
  * (`models/Extensions.kt:37–50`: `authInfo.fee.amount[0]` and `body.memo`);
  * we walk the wire format directly, skipping everything else, so the hot
  * path allocates nothing but the two result strings. Field numbers (public
  * cosmos-sdk proto definitions):
  *
  *   Tx        { body = 1, auth_info = 2, signatures = 3 }
  *   TxBody    { messages = 1, memo = 2, ... }
  *   AuthInfo  { signer_infos = 1, fee = 2 }
  *   Fee       { amount = 1 (repeated Coin), gas_limit = 2, ... }
  *   Coin      { denom = 1, amount = 2 }
  */
object ProtoMini {

  /** fee amount (decimal string), fee denom, memo — all empty when absent. */
  final case class TxMeta(feeAmount: String, feeDenom: String, memo: String)

  // the wire walker lives in ProtoWire (shared with the gRPC transport's
  // message codec since round 9 — one varint/length-guard implementation)
  private type Reader = ProtoWire.Reader

  /** Extract fee/memo from a raw protobuf-encoded Tx. Returns None on any
    * malformed input (parity with the reference, which nulls out on decode
    * failure rather than failing the stream).
    */
  def txMeta(bytes: Array[Byte]): Option[TxMeta] =
    try {
      val r = new Reader(bytes, 0, bytes.length)
      var bodyRange: (Int, Int) = null
      var authRange: (Int, Int) = null
      while (r.hasNext) {
        val (f, w) = r.tag()
        if (f == 1 && w == 2) bodyRange = r.lenDelimited()
        else if (f == 2 && w == 2) authRange = r.lenDelimited()
        else r.skip(w)
      }
      var memo = ""
      if (bodyRange != null) {
        val b = new Reader(bytes, bodyRange._1, bodyRange._2)
        while (b.hasNext) {
          val (f, w) = b.tag()
          if (f == 2 && w == 2) { val (s, e) = b.lenDelimited(); memo = b.utf8(s, e) }
          else b.skip(w)
        }
      }
      var feeAmount = ""; var feeDenom = ""
      if (authRange != null) {
        val a = new Reader(bytes, authRange._1, authRange._2)
        var feeRange: (Int, Int) = null
        while (a.hasNext) {
          val (f, w) = a.tag()
          if (f == 2 && w == 2) feeRange = a.lenDelimited() else a.skip(w)
        }
        if (feeRange != null) {
          val fr = new Reader(bytes, feeRange._1, feeRange._2)
          val coins = ArrayBuffer.empty[(Int, Int)]
          while (fr.hasNext) {
            val (f, w) = fr.tag()
            if (f == 1 && w == 2) coins += fr.lenDelimited() else fr.skip(w)
          }
          // reference takes the FIRST coin (`amountList.firstOrNull()`)
          coins.headOption.foreach { case (cs, ce) =>
            val c = new Reader(bytes, cs, ce)
            while (c.hasNext) {
              val (f, w) = c.tag()
              if (f == 1 && w == 2) { val (s, e) = c.lenDelimited(); feeDenom = c.utf8(s, e) }
              else if (f == 2 && w == 2) { val (s, e) = c.lenDelimited(); feeAmount = c.utf8(s, e) }
              else c.skip(w)
            }
          }
        }
      }
      Some(TxMeta(feeAmount, feeDenom, memo))
    } catch { case _: Exception => None }
}
