package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavioral contracts of the video frame-sample family beyond the
  * q626/q627 differentials: the animated-GIF encode → real-codec-decode
  * loop is lossless, sampling picks exactly the 0-mod-`every` frames,
  * per-frame brightness shifts stay hash-invariant, and clipLanes'
  * completeness gate drops partial signatures.
  */
class VideoSampleSpec extends SparkSpec {

  private val gv: (Long, Int, Int, Int) => Int = (id, f, x, y) =>
    (((id * 31 + f * 69069L + (x / 8) * 37 + (y / 8) * 91) % 200L) + 3).toInt

  test("videoFrameSample: samples every k-th frame with driver-exact dHash") {
    val s = spark
    import s.implicits._
    val bin = Multimodal.encodeGifAnim(s, Seq(1L).toDF("doc_id"), gv, 36, 32, 7)
    val got = Multimodal.videoFrameSample(s, bin, 3).collect()
      .map(v => (v.frame_idx, v.n_frames, v.d0, v.d1, v.d2, v.d3)).sorted.toSeq
    assert(got.map(_._1) == Seq(0, 3, 6), s"must sample frames 0,3,6: $got")
    assert(got.forall(_._2 == 7))
    // driver-side dHash recompute from the formula (gray = 3·v, floor
    // boundaries gx·36 div 9 = 4px, gy·32 div 8 = 4px)
    val want = Seq(0, 3, 6).map { f =>
      def cell(gx: Int, gy: Int): Long = {
        val xs = (gx * 4 until (gx + 1) * 4); val ys = (gy * 4 until (gy + 1) * 4)
        val vals = for (x <- xs; y <- ys) yield 3L * gv(1L, f, x, y)
        vals.sum / vals.size
      }
      val bits = Array.tabulate(64) { b =>
        if (cell(b % 8, b / 8) > cell(b % 8 + 1, b / 8)) 1L else 0L
      }
      def lane(l: Int): Long = (0 until 16).map(i => bits(l * 16 + i) << i).sum
      (f, 7, lane(0), lane(1), lane(2), lane(3))
    }
    assert(got == want, s"codec-path dHash must match the formula:\n$got\n$want")
  }

  test("per-frame brightness shift leaves sampled hashes unchanged") {
    val s = spark
    import s.implicits._
    val g = gv
    val gv2: (Long, Int, Int, Int) => Int = (id, f, x, y) =>
      g(1L, f, x, y) + (if (id == 2L) 5 else 0)
    val h = Multimodal.videoFrameSample(s,
        Multimodal.encodeGifAnim(s, Seq(1L, 2L).toDF("doc_id"), gv2, 36, 32, 7), 3)
      .toDF().orderBy("doc_id", "frame_idx")
      .select("frame_idx", "d0", "d1", "d2", "d3").collect().toSeq
    assert(h.size == 6 && h.take(3) == h.drop(3),
      s"brightness-shifted clip must hash identically per frame: $h")
  }

  test("clipLanes drops clips missing a sampled position; garbage drops") {
    val s = spark
    import s.implicits._
    val bin = Multimodal.encodeGifAnim(s, Seq(1L).toDF("doc_id"), gv, 36, 32, 7)
      .unionAll(Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "content"))
    val fh = Multimodal.videoFrameSample(s, bin, 3).toDF()
    assert(fh.where(col("doc_id") === 9L).count() == 0, "garbage must drop")
    // clip 1 has frames 0,3,6 — a signature over (0,3) is complete,
    // over (0,4) incomplete and must drop
    assert(Multimodal.clipLanes(fh, Seq(0, 3)).count() == 1)
    val sig = Multimodal.clipLanes(fh, Seq(0, 4))
    assert(sig.count() == 0, "partial signatures must drop")
  }
}
