package graft.weights

import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {
  test("GAL triangle fixture: 47 bytes (FIXTURES.md §5)") {
    val rows = Seq(
      (1L, Array(2L, 3L), None),
      (2L, Array(1L, 3L), None),
      (3L, Array(1L, 2L), None))
    val blob = WeightsCodec.encodeWhole(rows, valued = false)
    assert(blob.length == 1 + 4 + 3 * (4 + 2 + 2 * 4))
    assert(blob(0) == 'a'.toByte)
    val (valued, decoded) = WeightsCodec.decodeWhole(blob)
    assert(!valued)
    assert(decoded.map(_._1) == Seq(1L, 2L, 3L))
    assert(decoded.head._2.sameElements(Array(2L, 3L)))
  }

  test("GWT valued roundtrip keeps float32 weights") {
    val rows = Seq((1L, Array(2L), Some(Array(0.25f))),
      (2L, Array(1L), Some(Array(0.75f))))
    val blob = WeightsCodec.encodeWhole(rows, valued = true)
    assert(blob(0) == 'w'.toByte)
    val (valued, decoded) = WeightsCodec.decodeWhole(blob)
    assert(valued)
    assert(decoded.head._3.get.sameElements(Array(0.25f)))
  }

  test("geoda_weights_at slices the exact record bytes; absent fid → None") {
    val rows = Seq(
      (1L, Array(2L, 3L), None),
      (2L, Array(1L, 3L), None),
      (3L, Array(1L, 2L), None))
    val blob = WeightsCodec.encodeWhole(rows, valued = false)
    for ((g, nbrs, _) <- rows) {
      val sliced = WeightsCodec.at(blob, g).get
      assert(sliced.sameElements(WeightsCodec.encodeRecord(g, nbrs, None)))
    }
    assert(WeightsCodec.at(blob, 99L).isEmpty)
    // valued blob: slice must include the float weights
    val vblob = WeightsCodec.encodeWhole(
      Seq((1L, Array(2L), Some(Array(0.25f))),
        (2L, Array(1L), Some(Array(0.75f)))), valued = true)
    assert(WeightsCodec.at(vblob, 2L).get.sameElements(
      WeightsCodec.encodeRecord(2L, Array(1L), Some(Array(0.75f)))))
  }

  test("geoda_queenweights_set explodes a whole blob to per-row records") {
    val rows = Seq(
      (1L, Array(2L, 3L), None),
      (2L, Array(1L, 3L), None),
      (3L, Array(1L, 2L), None))
    val blob = WeightsCodec.encodeWhole(rows, valued = false)
    val set = WeightsCodec.blobToSet(blob)
    assert(set.map(_._1) == Seq(1L, 2L, 3L))
    for (((g, nbrs, _), (sg, rec)) <- rows.zip(set)) {
      assert(g == sg)
      assert(rec.sameElements(WeightsCodec.encodeRecord(g, nbrs, None)))
    }
  }

  test("per-row record roundtrip + uint16 cap enforced") {
    val b = WeightsCodec.encodeRecord(7L, Array(1L, 2L, 3L), None)
    val (idx, nbrs, w) = WeightsCodec.decodeRecord(b)
    assert(idx == 7L && nbrs.sameElements(Array(1L, 2L, 3L)) && w.isEmpty)
    intercept[IllegalArgumentException] {
      WeightsCodec.encodeRecord(1L, new Array[Long](70000), None)
    }
  }
}
