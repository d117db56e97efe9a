package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level tests for the container-header probes — including the
  * malformed inputs a 100 TB crawl WILL contain (truncated files, wrong
  * magic, SOS-before-SOF JPEGs), which must fall back, never throw.
  */
class MultimodalHeaderSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val png = hex("89504E470D0A1A0A0000000D4948445200000280000001E00806000000")
  private val jpeg = hex("FFD8FFE000104A46494600010100004800480000" +
    "FFC000110800F0014003011100021101031101FFD9")
  private val gif = hex("47494638396190012C01000000")
  private val wav = hex("524946464400000057415645666D74201000000001000200" +
    "44AC000010B102000400100064617461200000000000000000000000000000000000" +
    "0000000000000000000000000000000000000000")

  test("PNG IHDR dimensions") {
    assert(Multimodal.probe(png) === Some(("png", 640, 480, 1L)))
  }

  test("JPEG SOF dimensions after APP0 skip") {
    assert(Multimodal.probe(jpeg) === Some(("jpeg", 320, 240, 1L)))
  }

  test("GIF logical screen (little-endian)") {
    assert(Multimodal.probe(gif) === Some(("gif", 400, 300, 1L)))
  }

  test("WAV fmt/data chunk walk: channels, bits, sample frames") {
    assert(Multimodal.probe(wav) === Some(("wav", 2, 16, 8L)))
  }

  test("JPEG with a progressive SOF2 marker parses too") {
    val sof2 = jpeg.clone()
    sof2(21) = 0xc2.toByte // FFC0 -> FFC2
    assert(Multimodal.probe(sof2) === Some(("jpeg", 320, 240, 1L)))
  }

  test("MP4 box walk: tkhd dims + mvhd duration (ms in the n_frames slot)") {
    val mp4 = hex("000000206674797069736F6D0000020069736F6D69736F32617663316D703431" +
      "000000D86D6F6F760000006C6D766864000000000000000000000000000003E8" +
      "0000138800010000010000000000000000000000000100000000000000000000" +
      "0000000000010000000000000000000000000000400000000000000000000000" +
      "0000000000000000000000000000000000000002000000647472616B0000005C" +
      "746B686400000003000000000000000000000001000000000000138800000000" +
      "0000000000000000000000000001000000000000000000000000000000010000" +
      "000000000000000000000000400000000280000001680000")
    assert(Multimodal.probe(mp4) === Some(("mp4", 640, 360, 5000L)))
    assert(Multimodal.probe(mp4.take(40)).isEmpty, "truncated moov must fall back")
  }

  test("WebP VP8X canvas size (24-bit LE minus-one fields)") {
    val webp = hex("524946461600000057454250565038580A000000100000001F0300570200")
    assert(Multimodal.probe(webp) === Some(("webp", 800, 600, 1L)))
    assert(Multimodal.probe(webp.take(20)).isEmpty)
  }

  test("FLAC STREAMINFO: channels/bits/total samples from the packed word") {
    val flac = hex("664C6143800000221000100000000E00000E0AC442F0000158880000" +
      "0000000000000000000000000000")
    assert(Multimodal.probe(flac) === Some(("flac", 2, 16, 88200L)))
    assert(Multimodal.probe(flac.take(12)).isEmpty)
  }

  test("malformed inputs fall back instead of throwing") {
    val cases: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      "not media at all".getBytes("UTF-8"),
      png.take(10),            // truncated before IHDR fields
      jpeg.take(3),            // SOI then EOF mid-marker
      hex("FFD8FFDA0002"),     // SOS before any SOF
      wav.take(30),            // RIFF/WAVE but fmt chunk cut off
      gif.take(7))             // GIF magic but no screen descriptor
    cases.foreach(b => assert(Multimodal.probe(b).isEmpty, b.mkString(",")))
  }

  test("WAV chunk size >= 2^31 terminates instead of looping or crashing") {
    // RIFF/WAVE whose first chunk claims size 0xFFFFFFF8: an Int advance
    // wraps to 0 (infinite loop); the Long cursor must just walk off the
    // end and report unrecognized.
    val riffHuge = hex("52494646" + "44000000" + "57415645" + // RIFF size WAVE
      "6A756E6B" + "F8FFFFFF" +                                // "junk" sz=4294967288
      "00" * 24)
    assert(Multimodal.probe(riffHuge).isEmpty)
    // same, but the huge chunk appears after a valid fmt (no data chunk
    // reachable): still terminates, still None
    val fmtThenHuge = hex("52494646" + "44000000" + "57415645" +
      "666D7420" + "10000000" + "0100020044AC000010B1020004001000" + // fmt
      "6A756E6B" + "F8FFFFFF" + "00" * 8)
    assert(Multimodal.probe(fmtThenHuge).isEmpty)
  }
}
