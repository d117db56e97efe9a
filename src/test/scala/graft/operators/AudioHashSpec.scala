package graft.operators

import graft.SparkSpec

/** Behavioral contracts of the perceptual-audio family beyond the
  * q623/q624/q625 differentials: the encode → real-codec-decode loop,
  * the gain invariance that makes the fingerprint perceptual, drop
  * semantics, and frame-feature exactness vs a driver-side recompute.
  */
class AudioHashSpec extends SparkSpec {

  // a deterministic non-trivial waveform in ±1000
  private val wave: (Long, Int) => Int = (id, i) =>
    (((id * 31 + (i / 100) * 2654435761L + i * 977L) % 2001L) - 1000L).toInt

  test("audioFrames: exact energy / zero crossings / peak vs driver recompute") {
    val s = spark
    import s.implicits._
    val n = 1300; val frames = 13
    val bin = Multimodal.encodeWav(s, Seq(7L).toDF("doc_id"), wave, 8000, n)
    val got = Multimodal.audioFrames(s, bin, frames).collect()
      .map(f => (f.frame, f.energy, f.zc, f.peak)).sorted.toSeq
    val smp = Array.tabulate(n)(wave(7L, _))
    val want = (0 until frames).map { f =>
      val lo = f * n / frames; val hi = (f + 1) * n / frames
      val e = (lo until hi).map(i => smp(i).toLong * smp(i)).sum
      val z = (lo + 1 until hi).count(i => (smp(i - 1) < 0) != (smp(i) < 0)).toLong
      val p = (lo until hi).map(i => math.abs(smp(i).toLong)).max
      (f, e, z, p)
    }
    assert(got == want, s"frame features must be exact:\n$got\n$want")
  }

  test("audioFingerprint: uniform integer gain leaves the hash unchanged") {
    val s = spark
    import s.implicits._
    // doc 2 = doc 1 with every sample ×3 (no clipping at ±3000);
    // bind the waveform locally so the lambda doesn't capture the spec
    val w = wave
    val gv: (Long, Int) => Int = (id, i) =>
      w(1L, i) * (if (id == 2L) 3 else 1)
    val h = Multimodal.audioFingerprint(s,
        Multimodal.encodeWav(s, Seq(1L, 2L).toDF("doc_id"), gv, 8000, 6500))
      .toDF().orderBy("doc_id").select("f0", "f1", "f2", "f3").collect()
    assert(h.length == 2 && h(0) == h(1),
      s"gain-scaled twin must fingerprint identically: ${h.toSeq}")
    // distinct content must separate at least one lane
    val gv2: (Long, Int) => Int = (id, i) =>
      if (id == 3L) w(9L, i) else w(1L, i)
    val h2 = Multimodal.audioFingerprint(s,
        Multimodal.encodeWav(s, Seq(1L, 3L).toDF("doc_id"), gv2, 8000, 6500))
      .toDF().orderBy("doc_id").select("f0", "f1", "f2", "f3").collect()
    assert(h2(0) != h2(1), "distinct content must separate the fingerprint")
  }

  test("audio features drop undecodable, multi-channel, and sub-window payloads") {
    val s = spark
    import s.implicits._
    val garbage = Seq((1L, Array[Byte](9, 9, 9))).toDF("doc_id", "content")
    assert(Multimodal.audioFingerprint(s, garbage).count() == 0)
    assert(Multimodal.audioFrames(s, garbage, 8).count() == 0)
    // decodes fine but 64 samples < 65 windows — dropped, not crashed
    val short = Multimodal.encodeWav(s, Seq(2L).toDF("doc_id"), wave, 8000, 64)
    assert(Multimodal.audioFingerprint(s, short).count() == 0)
    // stereo 16-bit WAV (the q574 fixture) is out of the mono contract
    val stereoHex = "524946463400000057415645666D74201000000001000200401F0000" +
      "007D0000040010006461746110000000E80318FCD00730F848F4B80B0000FF7F"
    val stereo = Seq(3L -> stereoHex).toDF("doc_id", "hx")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.unhex(
          org.apache.spark.sql.functions.col("hx")).as("content"))
    assert(Multimodal.audioFingerprint(s, stereo).count() == 0)
  }

  test("encodeWav round-trips through decodeAudio with exact stats") {
    val s = spark
    import s.implicits._
    val n = 200
    val bin = Multimodal.encodeWav(s, Seq(5L).toDF("doc_id"), wave, 16000, n)
    val f = Multimodal.decodeAudio(s, bin).collect()
    assert(f.length == 1)
    val smp = Array.tabulate(n)(wave(5L, _))
    assert(f(0).channels == 1 && f(0).sample_rate == 16000 &&
      f(0).n_frames == n &&
      f(0).sum_sq == smp.map(v => v.toLong * v).sum &&
      f(0).peak_abs == smp.map(v => math.abs(v.toLong)).max,
      s"decodeAudio stats must match the formula: ${f(0)}")
  }
}
