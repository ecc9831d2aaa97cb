package graft.ingest

import java.nio.file.Files

import graft.SparkSpec

/** Pins the reference-shaped ingest semantics (SURVEY.md §5 item 1):
  * all three MovieLens delimiters, first-3-fields-only, deterministic
  * dictionary encoding, seeded split fractions.
  */
class RatingsSpec extends SparkSpec {
  import spark.implicits._

  private def writeTmp(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_ing").toFile
    val f = new java.io.File(dir, name)
    val w = new java.io.PrintWriter(f)
    lines.foreach(w.println); w.close()
    f.getAbsolutePath
  }

  test("O16: whitespace layout (ml-100k u.data), tabs and spaces mixed") {
    val p = writeTmp("u.data", Seq("196\t242\t3\t881250949", "186  302  3  891717742", "22\t377\t1\t878887116"))
    val df = Ratings.read(spark, p, Ratings.Whitespace)
    assert(df.collect().map(r => (r.getInt(0), r.getInt(1), r.getFloat(2))).toSet ==
      Set((196, 242, 3f), (186, 302, 3f), (22, 377, 1f)))
  }

  test("O16: :: layout (ml-1m ratings.dat)") {
    val p = writeTmp("ratings.dat", Seq("1::1193::5::978300760", "1::661::3.5::978302109"))
    val df = Ratings.read(spark, p, Ratings.DoubleColon)
    assert(df.collect().map(r => (r.getInt(0), r.getInt(1), r.getFloat(2))).toSet ==
      Set((1, 1193, 5f), (1, 661, 3.5f)))
  }

  test("O16: csv+header layout (ml-25m ratings.csv)") {
    val p = writeTmp("ratings.csv", Seq("userId,movieId,rating,timestamp", "1,296,5.0,1147880044", "2,306,3.5,1147868817"))
    val df = Ratings.read(spark, p, Ratings.CsvHeader)
    assert(df.collect().map(r => (r.getInt(0), r.getInt(1), r.getFloat(2))).toSet ==
      Set((1, 296, 5f), (2, 306, 3.5f)))
  }

  test("O15: dictionary encoding is dense, 0-based, sorted, deterministic") {
    val df = Seq(("zz", 1, 1f), ("aa", 2, 2f), ("mm", 3, 3f), ("aa", 4, 4f))
      .toDF("user", "item", "rating")
    val dict1 = Ratings.dictionary(df, "user").collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val dict2 = Ratings.dictionary(df, "user").collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(dict1 == Map("aa" -> 0L, "mm" -> 1L, "zz" -> 2L))
    assert(dict1 == dict2) // reproducible — unlike the reference's set-order ids (mapid.py:28-29)
  }

  test("O15: encode rewrites both id spaces and preserves ratings") {
    val df = Seq((100, 7, 1f), (100, 9, 2f), (50, 7, 3f)).toDF("user", "item", "rating")
    val (enc, umap, imap) = Ratings.encode(df)
    assert(umap.count() == 2 && imap.count() == 2)
    val rows = enc.collect().map(r => (r.getInt(0), r.getInt(1), r.getFloat(2))).toSet
    // sorted originals: user "100"->0, "50"->1; item "7"->0, "9"->1
    assert(rows == Set((0, 0, 1f), (0, 1, 2f), (1, 0, 3f)))
  }

  test("O17: seeded split reproducible, fractions within binomial CI") {
    val n = 5000
    val df = (1 to n).map(i => (i % 97, i % 53, (i % 5 + 1).toFloat)).toDF("user", "item", "rating")
    val (t1, p1) = Ratings.trainProbeSplit(df)
    val (t2, p2) = Ratings.trainProbeSplit(df)
    assert(t1.count() == t2.count() && p1.count() == p2.count())
    val frac = t1.count().toDouble / n
    // 4σ band around 0.8 for n=5000: ±4*sqrt(0.8*0.2/5000) ≈ ±0.0226
    assert(math.abs(frac - 0.8) < 0.023, s"train fraction $frac out of band")
  }
}
