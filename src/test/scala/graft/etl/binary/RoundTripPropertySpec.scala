package graft.etl.binary

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.model.{AccountUpdate, ManifestEntry, SnapshotManifest}

/** Property-based encode→decode round-trips (SURVEY.md §5.3): arbitrary
  * accounts through the AppendVec codec, arbitrary storage maps through the
  * bincode manifest codec — including boundary u64 values carried with the
  * reference's i64 wrap convention (sqlite.rs:226-230). */
class RoundTripPropertySpec extends AnyFunSuite {

  /** Drive generators deterministically (the scalatest-scalacheck bridge
    * jar is not in the offline cache; seeds make failures reproducible). */
  private def forAllSeeded[A](gen: Gen[A], cases: Int = 60)(body: A => Unit): Unit =
    (0 until cases).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(0xC0FFEEL + i)))
    }

  private val genBytes32: Gen[Array[Byte]] =
    Gen.containerOfN[Array, Byte](32, Gen.choose(Byte.MinValue, Byte.MaxValue))

  private val genAccount: Gen[AccountUpdate] = for {
    pubkey <- genBytes32
    owner <- genBytes32
    hash <- genBytes32
    slot <- Gen.choose(0L, 1L << 40)
    wv <- Gen.oneOf(Gen.choose(0L, Long.MaxValue), Gen.const(Long.MinValue),
      Gen.const(-1L)) // u64 wrap boundary values
    lamports <- Gen.choose(Long.MinValue, Long.MaxValue)
    rentEpoch <- Gen.choose(Long.MinValue, Long.MaxValue)
    exec <- Gen.oneOf(true, false)
    dataLen <- Gen.choose(0, 300)
    data <- Gen.containerOfN[Array, Byte](dataLen, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield AccountUpdate(pubkey, slot, wv, dataLen.toLong, owner, lamports, exec,
    rentEpoch, hash, data)

  test("AppendVec encode→decode round-trips arbitrary records (+ garbage tail)") {
    forAllSeeded(Gen.zip(Gen.listOfN(8, genAccount), Gen.choose(0, 64))) {
      case (recs: List[AccountUpdate], garbage: Int) =>
        val (bytes, currentLen) = AppendVecCodec.encode(recs, garbage)
        val out = AppendVecCodec.decode(bytes, slot = 7L, currentLen).toList
        assert(out.size === recs.size)
        out.zip(recs).foreach { case (o, r) =>
          assert(o.pubkey.toSeq === r.pubkey.toSeq)
          assert(o.writeVersion === r.writeVersion)
          assert(o.dataLen === r.data.length.toLong)
          assert(o.owner.toSeq === r.owner.toSeq)
          assert(o.lamports === r.lamports)
          assert(o.executable === r.executable)
          assert(o.rentEpoch === r.rentEpoch)
          assert(o.hash.toSeq === r.hash.toSeq)
          assert(o.data.toSeq === r.data.toSeq)
        }
    }
  }

  test("bincode manifest round-trips arbitrary storage maps") {
    val genEntry = for {
      slot <- Gen.choose(0L, 1L << 32)
      id <- Gen.choose(0L, 1L << 16)
      len <- Gen.choose(0L, 1L << 34)
    } yield ManifestEntry(slot, id, len)
    forAllSeeded(Gen.zip(Gen.listOfN(12, genEntry), Gen.choose(0L, Long.MaxValue),
      Gen.oneOf(true, false))) { case (entries, wv, delta) =>
      // manifest map is keyed by (slot, id) — dedup like a HashMap would
      val uniq = entries.groupBy(e => (e.slot, e.id)).map(_._2.head).toSeq
      val m = SnapshotManifest(slot = 999L, writeVersion = wv, isDelta = delta,
        bankHash = new Array[Byte](32), entries = uniq)
      val out = SolanaManifestCodec.decode(SolanaManifestCodec.encode(m))
      assert(out.writeVersion === wv)
      assert(out.isDelta === delta)
      assert(out.entries.toSet === uniq.toSet)
    }
  }

  test("decode is split-invariant: any currentLen cut yields a record prefix") {
    forAllSeeded(Gen.listOfN(6, genAccount)) { recs =>
      val (bytes, currentLen) = AppendVecCodec.encode(recs)
      // cutting at any record boundary yields exactly the records before it
      var off = 0L
      recs.zipWithIndex.foreach { case (r, i) =>
        val out = AppendVecCodec.decode(bytes, 1L, off).toList
        assert(out.size === i)
        off += AppendVecCodec.align8(AppendVecCodec.HeaderSize + r.data.length)
      }
      // a cut inside the LAST record's header drops it, keeping the prefix
      // (cutting inside trailing PADDING must still yield the record — the
      // scan rule only requires header+data to fit, append_vec.rs:221-224)
      if (recs.nonEmpty) {
        val lastStart = off - AppendVecCodec.align8(
          AppendVecCodec.HeaderSize + recs.last.data.length)
        val cutHeader = AppendVecCodec.decode(bytes, 1L,
          lastStart + AppendVecCodec.HeaderSize - 1).toList
        assert(cutHeader.size === recs.size - 1)
        val cutPad = AppendVecCodec.decode(bytes, 1L,
          lastStart + AppendVecCodec.HeaderSize + recs.last.data.length).toList
        assert(cutPad.size === recs.size)
      }
    }
  }
}
