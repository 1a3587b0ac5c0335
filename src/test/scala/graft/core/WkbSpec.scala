package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

class WkbSpec extends AnyFunSuite {
  test("point roundtrip") {
    val b = Wkb.writePoint(1.5, -2.5)
    assert(Wkb.read(b).contains(GPoint(1.5, -2.5)))
  }

  test("polygon roundtrip drops closing vertex, PIP works") {
    val b = Wkb.writePolygon(Array((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)))
    val g = Wkb.read(b).get.asInstanceOf[GPolygon]
    assert(g.numPoints == 4)
    assert(g.contains(2.0, 2.0))
    assert(!g.contains(5.0, 2.0))
    assert(!g.contains(-1.0, -1.0))
    assert(g.bbox == (0.0, 0.0, 4.0, 4.0))
  }

  test("multipolygon flattens into parts list (reference quirk)") {
    // build a WKB MultiPolygon of two unit squares by hand
    val p1 = Wkb.writePolygon(Array((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)))
    val p2 = Wkb.writePolygon(Array((2.0, 0.0), (3.0, 0.0), (3.0, 1.0), (2.0, 1.0)))
    val bb = ByteBuffer.allocate(9 + p1.length + p2.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte); bb.putInt(6); bb.putInt(2); bb.put(p1); bb.put(p2)
    val g = Wkb.read(bb.array()).get.asInstanceOf[GPolygon]
    assert(g.partStarts.sameElements(Array(0, 4)))
    assert(g.numPoints == 8)
    assert(g.contains(0.5, 0.5) && g.contains(2.5, 0.5) && !g.contains(1.5, 0.5))
  }

  test("multipoint keeps only first point (postgeoda.cpp:102-117)") {
    val pt1 = Wkb.writePoint(1.0, 2.0)
    val pt2 = Wkb.writePoint(3.0, 4.0)
    val bb = ByteBuffer.allocate(9 + pt1.length + pt2.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte); bb.putInt(4); bb.putInt(2); bb.put(pt1); bb.put(pt2)
    assert(Wkb.read(bb.array()).contains(GPoint(1.0, 2.0)))
  }

  test("unsupported type → None") {
    val bb = ByteBuffer.allocate(9).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte); bb.putInt(2); bb.putInt(0) // LineString
    assert(Wkb.read(bb.array()).isEmpty)
    assert(Wkb.read(null).isEmpty)
    assert(Wkb.read(Array[Byte](1, 2)).isEmpty)
  }

  test("polygon centroid of unit square") {
    val b = Wkb.writePolygon(Array((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)))
    val g = Wkb.read(b).get
    assert(g.centroid == (1.0, 1.0))
  }
}
