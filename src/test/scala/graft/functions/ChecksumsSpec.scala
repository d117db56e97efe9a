package graft.functions

import java.util.zip.CRC32

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChecksumsSpec extends SparkSpec {

  test("crc32WrapSum reproduces Go uint32 wrapping addition (SURVEY §7.3.3)") {
    import spark.implicits._
    // strings whose CRC32s sum past 2^32 — wrap must apply
    val rows = (1 to 5000).map(i => s"row-$i")
    val expected = rows.map { s =>
      val c = new CRC32(); c.update(s.getBytes("UTF-8")); c.getValue
    }.foldLeft(0L)((acc, v) => (acc + v) & 0xFFFFFFFFL) // Go uint32 +=
    val got = rows.toDF("s").agg(Checksums.crc32WrapSum(col("s"))).head().getLong(0)
    assert(got == expected)
  }

  test("md5Split slices sum to a commutative chunk checksum") {
    import spark.implicits._
    val df = Seq("a", "b", "c").toDF("s")
    val fwd = df.agg(Checksums.md5SplitSums(col("s")).head,
      Checksums.md5SplitSums(col("s")).tail: _*).head()
    val rev = Seq("c", "b", "a").toDF("s")
      .agg(Checksums.md5SplitSums(col("s")).head, Checksums.md5SplitSums(col("s")).tail: _*).head()
    assert(fwd == rev)
    // split value matches a directly-computed reference for one string
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("a".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val exp0 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
    val got0 = Seq("a").toDF("s").agg(Checksums.md5SplitSums(col("s")).head).head().getLong(0)
    assert(got0 == exp0)
  }

  test("rowMultiset counts duplicates (PROGRAM_* fallback, A4)") {
    import spark.implicits._
    val df = Seq("x", "x", "y").toDF("s")
    val m = Checksums.rowMultiset(df, col("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("x" -> 2L, "y" -> 1L))
  }
}
