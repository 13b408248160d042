package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Wire-format golden bytes for the TripCancellation codec: the expected
  * hex was derived independently, field by field, from the protobuf
  * encoding spec (tag = field<<3|wire, varints little-endian 7-bit,
  * strings length-delimited) against src/main/protobuf/
  * trip_cancellation.proto — not by running the implementation. */
class ProtoWireSpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)

  private def row(dcId: Any, route: String, dir: Any, date: String,
                  time: String, status: String, ver: Any, trip: String,
                  dcType: String, adType: String, title: String,
                  desc: String, cat: String, sub: String): InternalRow =
    InternalRow.fromSeq(Seq(dcId,
      Option(route).map(u).orNull, dir, Option(date).map(u).orNull,
      Option(time).map(u).orNull, Option(status).map(u).orNull, ver,
      Option(trip).map(u).orNull, Option(dcType).map(u).orNull,
      Option(adType).map(u).orNull, Option(title).map(u).orNull,
      Option(desc).map(u).orNull, Option(cat).map(u).orNull,
      Option(sub).map(u).orNull))

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("golden bytes: all fields, single-byte varints") {
    val bytes = ProtoWire.encode(row(5L, "1014", 2, "20240516", "08:40:00",
      "CANCELED", 1, "603", "CANCEL_DEPARTURE", "CANCEL_ENTIRE_DEPARTURE",
      "T", "D", "STRIKE", "STAFF_SHORTAGE"))
    // 08 05            field 1 varint 5 (deviation_case_id)
    // 12 04 "1014"     field 2 len 4   (route_id)
    // 18 02            field 3 varint 2 (direction_id)
    // 22 08 "20240516" field 4          (start_date)
    // 2a 08 "08:40:00" field 5          (start_time)
    // 30 02            field 6 enum CANCELED=2
    // 38 01            field 7 schema_version 1
    // 42 03 "603" ... 4a/52/5a/62/6a/72 remaining strings
    assert(hex(bytes) ===
      "08051204313031341802220832303234303531362a0830383a34303a3030300238" +
      "0142033630334a1043414e43454c5f444550415254555245521743414e43454c5f" +
      "454e544952455f4445504152545552455a01546201446a06535452494b45720e53" +
      "544146465f53484f5254414745")
  }

  test("golden bytes: multi-byte varint (300 = ac 02), RUNNING, null title") {
    val bytes = ProtoWire.encode(row(300L, "R", 1, "20240516", "28:15:00",
      "RUNNING", 1, "613", "CANCEL_DEPARTURE", "CANCEL_ENTIRE_DEPARTURE",
      null, "d", "ROAD_MAINTENANCE", "ROAD_CLOSED"))
    assert(hex(bytes) ===
      "08ac021201521801220832303234303531362a0832383a31353a30303001380142" +
      "033631334a1043414e43454c5f444550415254555245521743414e43454c5f454e" +
      "544952455f4445504152545552456201646a10524f41445f4d41494e54454e414e" +
      "4345720b524f41445f434c4f534544")
  }

  test("decode inverts encode, including skipped null fields") {
    val r = row(300L, "R", 1, "20240516", "28:15:00", "RUNNING", 1, "613",
      "CANCEL_DEPARTURE", "CANCEL_ENTIRE_DEPARTURE", null, "d",
      "ROAD_MAINTENANCE", "ROAD_CLOSED")
    val back = ProtoWire.decode(ProtoWire.encode(r))
    assert(back === r)
    assert(back.isNullAt(10), "null title must stay null after round trip")
  }

  test("decoder skips unknown fields by wire type (forward compatibility)") {
    val known = ProtoWire.encode(row(5L, "1014", 2, "20240516", "08:40:00",
      "CANCELED", 1, "603", "t", "t", "T", "D", "C", "S"))
    // append field 15 varint (78 01) and field 16 len-delimited (82 01 02 xx xx)
    val extra = known ++ Array[Byte](0x78.toByte, 0x01,
      0x82.toByte, 0x01, 0x02, 0x41, 0x42)
    assert(ProtoWire.decode(extra) === ProtoWire.decode(known))
  }

  test("absent field 7 decodes to the declared default schema_version = 1") {
    // proto2: `optional int32 schema_version = 7 [default = 1]` — when the
    // writer skipped the field (null), a compliant reader reports 1
    val enc = ProtoWire.encode(row(5L, "1014", 2, "20240516", "08:40:00",
      "CANCELED", null, "603", "t", "t", "T", "D", "C", "S"))
    val back = ProtoWire.decode(enc)
    assert(!back.isNullAt(6), "schema_version must not be null")
    assert(back.getInt(6) === 1)
  }

  test("unknown status fails encode loudly") {
    intercept[IllegalArgumentException] {
      ProtoWire.encode(row(1L, "r", 1, "d", "t", "NOT_A_STATUS", 1, "i",
        "a", "b", "c", "d", "e", "f"))
    }
  }
}
