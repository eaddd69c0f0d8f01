package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Byte-level checks for the DV formats. The hand-written fixtures pin the
  * wire format to the PUBLIC specs (ZeroMQ Z85 RFC test vector,
  * RoaringFormatSpec layout) — a self-consistent-but-wrong codec would
  * round-trip fine and still fail these. */
class DeletionVectorsSpec extends AnyFunSuite {

  test("Z85 matches the ZeroMQ RFC test vector and Delta's pad-truncate rule") {
    // RFC 32/Z85: 86 4F D2 6F B5 59 F7 5B ⇔ "HelloWorld"
    val rfc = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b).map(_.toByte)
    assert(Z85.encode(rfc) === "HelloWorld")
    assert(Z85.decode("HelloWorld", 8).toSeq === rfc.toSeq)
    // non-multiple-of-4 input: zero-padded on encode, truncated on decode
    val odd = Array[Byte](1, 2, 3, 4, 5)
    assert(Z85.decode(Z85.encode(odd), 5).toSeq === odd.toSeq)
    // 16-byte UUID is exactly 20 chars
    assert(Z85.encode(new Array[Byte](16)).length === 20)
  }

  test("roaring portable serialization: hand-computed bytes for {1,3}") {
    val bytes = RoaringBitmapArray.serialize(Array(1L, 3L))
    val expected = java.nio.ByteBuffer.allocate(8 + 4 + 8 + 4 + 4 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(1L)        // one 32-bit bitmap
      .putInt(0)          // its high-32 key
      .putInt(12346)      // SERIAL_COOKIE_NO_RUNCONTAINER
      .putInt(1)          // one container
      .putShort(0)        // container key
      .putShort(1)        // cardinality - 1
      .putInt(16)         // offset of the container from bitmap start
      .putShort(1).putShort(3) // array container values
      .array()
    assert(bytes.toSeq === expected.toSeq)
    assert(RoaringBitmapArray.deserialize(bytes).toSeq === Seq(1L, 3L))
  }

  test("roaring round-trips across container types and high-32 buckets") {
    // array container + bitmap container (>4096 dense values) + high bucket
    val dense = (0L until 5000L).map(_ * 2)
    val sparse = Seq(70000L, 1L << 33, (1L << 33) + 65536L + 7L)
    val values = (dense ++ sparse).sorted.toArray
    val back = RoaringBitmapArray.deserialize(RoaringBitmapArray.serialize(values))
    assert(back.toSeq === values.toSeq)
  }

  test("run containers decode (other writers may emit them)") {
    // hand-build: cookie 12347 with size-1=0 in the upper 16 bits, run
    // bitmap 0x01 (container 0 is a run), header (key 0, card-1 = 2),
    // no offset header (size < 4), one run: start 5, length-1 = 2 → {5,6,7}
    val buf = java.nio.ByteBuffer.allocate(8 + 4 + 4 + 4 + 4 + 2 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(1L).putInt(0)               // portable wrapper
      .putInt(12347)                        // SERIAL_COOKIE, size-1 = 0
      .put(0x01.toByte)                     // run bitmap
      .putShort(0).putShort(2)              // key, cardinality-1
      .putShort(1)                          // one run
      .putShort(5).putShort(2)              // start 5, len-1 2
    val arr = java.util.Arrays.copyOfRange(buf.array(), 0, buf.position())
    assert(RoaringBitmapArray.deserialize(arr).toSeq === Seq(5L, 6L, 7L))
  }

  test("DV blob + file layout round-trip; checksum is verified") {
    val positions = Array(0L, 2L, 5L, 1000000L)
    val blob = DeletionVectors.toBlob(positions)
    assert(DeletionVectors.fromBlob(blob).toSeq === positions.toSeq)

    val f = Files.createTempDirectory("graft_dv").resolve("deletion_vector_test.bin")
    val off1 = DeletionVectors.appendToFile(f, blob)
    val blob2 = DeletionVectors.toBlob(Array(7L))
    val off2 = DeletionVectors.appendToFile(f, blob2)
    assert(off1 === 1) // after the version byte
    assert(DeletionVectors.fromBlob(
      DeletionVectors.readFromFile(f, off1, blob.length)).toSeq === positions.toSeq)
    assert(DeletionVectors.fromBlob(
      DeletionVectors.readFromFile(f, off2, blob2.length)).toSeq === Seq(7L))

    // flip a byte inside the first blob → checksum failure
    val bytes = Files.readAllBytes(f)
    bytes(off1 + 4 + 6) = (bytes(off1 + 4 + 6) ^ 0x40).toByte
    Files.write(f, bytes)
    val e = intercept[IllegalArgumentException](
      DeletionVectors.readFromFile(f, off1, blob.length))
    assert(e.getMessage.contains("checksum"))
  }

  test("inline and path storage types resolve through load") {
    val positions = Array(3L, 9L)
    val blob = DeletionVectors.toBlob(positions)
    val inline = DeletionVectors.Descriptor("i", Z85.encode(blob), None, blob.length,
      positions.length.toLong)
    assert(DeletionVectors.fromBlob(
      DeletionVectors.load("/nowhere", inline)).toSeq === positions.toSeq)

    val dir = Files.createTempDirectory("graft_dv_p")
    val f = dir.resolve("deletion_vector_abs.bin")
    val off = DeletionVectors.appendToFile(f, blob)
    val p = DeletionVectors.Descriptor("p", s"file://$f", Some(off), blob.length, 2L)
    assert(DeletionVectors.fromBlob(
      DeletionVectors.load("/nowhere", p)).toSeq === positions.toSeq)

    // 'u': uuid encoded in the path, file under the table root
    val table = Files.createTempDirectory("graft_dv_u")
    val uuid = java.util.UUID.randomUUID()
    val raw = java.nio.ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits).array()
    val uf = table.resolve(s"deletion_vector_$uuid.bin")
    val uoff = DeletionVectors.appendToFile(uf, blob)
    val u = DeletionVectors.Descriptor("u", Z85.encode(raw), Some(uoff), blob.length, 2L)
    assert(DeletionVectors.fromBlob(
      DeletionVectors.load(table.toString, u)).toSeq === positions.toSeq)
  }
}
