package graft

import graft.blocks.ProtoWire
import graft.sources.grpc.{GrpcWire, TendermintGrpcCodec => C}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized adversarial coverage for the shared protobuf wire walker and
  * the gRPC framing (the KernelPropertySpec discipline applied to the wire
  * layer): the corpus round-trip in GrpcCodecSpec proves the REAL payloads
  * survive; these properties prove the primitives hold on the whole value
  * domain — every int64 (both varint halves, the 10-byte negative form),
  * arbitrary byte strings, arbitrary message shapes with unknown fields
  * (forward compatibility: a reader must SKIP fields it does not know),
  * and the time formatter against the full instant range.
  */
class ProtoWirePropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(99L))

  private val anyLong: Gen[Long] = Gen.oneOf(
    Gen.choose(Long.MinValue, Long.MaxValue),
    Gen.oneOf(0L, 1L, -1L, Long.MinValue, Long.MaxValue,
      127L, 128L, -128L, (1L << 32) - 1, 1L << 32, -62135596800L))

  test("varint: every int64 round-trips through tag+encode+decode") {
    sample(anyLong, 500).foreach { v =>
      val w = new ProtoWire.Writer().int64(1, v)
      if (v == 0L) assert(w.bytes.isEmpty) // proto3 omit-zero
      else {
        val r = new ProtoWire.Reader(w.bytes)
        val (f, wt) = r.tag()
        assert(f === 1 && wt === 0)
        assert(r.varint() === v)
        assert(!r.hasNext)
      }
    }
  }

  test("bytes fields: arbitrary byte strings round-trip, empty is omitted") {
    val bytesGen = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    sample(bytesGen, 300).foreach { b =>
      val w = new ProtoWire.Writer().bytesField(3, b)
      if (b.isEmpty) assert(w.bytes.isEmpty)
      else {
        val r = new ProtoWire.Reader(w.bytes)
        val (f, wt) = r.tag()
        assert(f === 3 && wt === 2)
        val (s, e) = r.lenDelimited()
        assert(r.slice(s, e).toSeq === b.toSeq)
      }
    }
  }

  test("unknown-field skipping: a reader ignores fields it does not know") {
    // messages with interleaved unknown varint/len/fixed fields around one
    // known field — the reader walking for field 7 must find it regardless
    val known = 424242L
    sample(anyLong, 200).foreach { junk =>
      val w = new ProtoWire.Writer()
        .int64(3, junk)                              // unknown varint
        .bytesField(5, Array[Byte](1, 2, 3))         // unknown len-delimited
        .int64(7, known)                             // the field we want
        .bytesField(9, "trailing".getBytes("UTF-8")) // unknown after
      val r = new ProtoWire.Reader(w.bytes)
      var found = 0L
      while (r.hasNext) {
        val (f, wt) = r.tag()
        if (f == 7 && wt == 0) found = r.varint() else r.skip(wt)
      }
      assert(found === known)
    }
  }

  test("malformed input never loops or walks out of bounds") {
    // truncated varints, over-long length prefixes, garbage tags: the
    // reader must throw (IllegalArgument / bounds), never hang or succeed
    val junkGen = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    sample(junkGen, 300).foreach { bytes =>
      try {
        val r = new ProtoWire.Reader(bytes)
        var guard = 0
        while (r.hasNext && guard < 10000) {
          val (_, wt) = r.tag()
          r.skip(wt)
          guard += 1
        }
        assert(guard < 10000, "reader failed to terminate")
      } catch {
        case _: IllegalArgumentException => // expected for malformed input
        case _: ArrayIndexOutOfBoundsException =>
          fail("reader walked outside the buffer instead of length-checking")
      }
    }
  }

  test("truncation inside an unknown fixed-width field throws, not silent-succeeds") {
    // wire type 1 (fixed64) / 5 (fixed32) tags followed by FEWER bytes than
    // the type needs: a bare `pos += n` would walk past `end`, flip hasNext,
    // and decode the truncation as a clean end-of-message — dropping any
    // fields that should have followed. Must throw like the varint and
    // length-delimited truncation paths do.
    for ((wt, need) <- Seq((1, 8), (5, 4)); have <- 0 until need) {
      val tag = Array(((3 << 3) | wt).toByte) // unknown field 3
      val bytes = tag ++ Array.fill(have)(0x55.toByte)
      val r = new ProtoWire.Reader(bytes)
      val (_, wtype) = r.tag()
      intercept[IllegalArgumentException](r.skip(wtype))
    }
    // and exactly-enough bytes still skips cleanly
    for ((wt, need) <- Seq((1, 8), (5, 4))) {
      val bytes = Array(((3 << 3) | wt).toByte) ++ Array.fill(need)(0x55.toByte)
      val r = new ProtoWire.Reader(bytes)
      val (_, wtype) = r.tag()
      r.skip(wtype)
      assert(!r.hasNext)
    }
  }

  test("gRPC framing: frame/unframe round-trips arbitrary payloads") {
    val payloadGen = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    sample(payloadGen, 200).foreach { msg =>
      assert(GrpcWire.unframe(GrpcWire.frame(msg)).toSeq === msg.toSeq)
    }
  }

  test("time formatting: parse(format(s, n)) is the identity on the proto domain") {
    // seconds across the Timestamp range Tendermint uses (year 1..2262 keeps
    // nanos-in-long representable; the corpus spans 1 CE zero-times to 2021)
    val secGen = Gen.choose(-62135596800L, 9214646400L) // 0001..2262 CE
    val nanoGen = Gen.oneOf(Gen.choose(0, 999999999),
      Gen.oneOf(0, 1, 999999999, 500000000, 635163940))
    val pairs = sample(Gen.zip(secGen, nanoGen), 400)
    pairs.foreach { case (s, n) =>
      val formatted = C.formatTime(s, n)
      val (s2, n2) = C.parseTime(formatted)
      assert((s2, n2) === ((s, n)), s"via $formatted")
      // Go-style rendering invariants the corpus pins by example
      assert(!formatted.contains(".0Z") || n == 0, s"trailing zeros in $formatted")
      assert(formatted.endsWith("Z"))
    }
  }
}
