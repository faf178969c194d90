package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-curation operators (decontamination, repetition metrics, mixture
  * sampling) against hand-computed ground truth.
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("curation-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("decontaminationReport counts shared distinct n-grams per train doc") {
    val train = Seq(
      (1L, "a b c d e"),        // trigrams: abc bcd cde -> shares abc bcd
      (2L, "x y z w"),          // trigrams: xyz yzw -> shares none
      (3L, "a b c a b c d"),    // distinct trigrams: abc bca cab bcd -> shares abc bcd
      (4L, "p q")               // < 3 words -> excluded
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "a b c d q r s")).toDF("doc_id", "text")

    val out = Curation.decontaminationReport(train, eval, n = 3)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    assert(out === Array(
      (1L, 3L, 2L, 0.666667),
      (2L, 2L, 0L, 0.0),
      (3L, 4L, 2L, 0.5)))
  }

  test("decontamination of an exact eval copy is total") {
    val train = Seq((1L, "one two three four five six")).toDF("doc_id", "text")
    val eval = Seq((2L, "one two three four five six")).toDF("doc_id", "text")
    val r = Curation.decontaminationReport(train, eval, n = 3).collect().head
    assert(r.getAs[Double]("contamination") === 1.0)
  }

  test("repetition metrics match hand-computed fractions") {
    val docs = Seq(
      (1L, "a a a b"),           // top 3/4, distinct 2/4, 2grams {aa,aa,ab}: 1-2/3
      (2L, "u v w x y"),         // no repetition at all
      (3L, "solo")               // single word: n_2grams 0 -> dup_2gram_frac 0
    ).toDF("doc_id", "text")

    val out = Curation.withRepetitionMetrics(docs)
      .select("doc_id", "n_words", "top_word_count", "top_word_frac",
        "dup_word_frac", "dup_2gram_frac", "repetitive")
      .orderBy("doc_id")
      .collect()

    val r1 = out(0)
    assert((r1.getLong(1), r1.getLong(2)) === ((4L, 3L)))
    assert(r1.getDouble(3) === 0.75)
    assert(r1.getDouble(4) === 0.5)
    assert(r1.getDouble(5) === 0.333333)
    assert(r1.getInt(6) === 1)

    val r2 = out(1)
    assert(r2.getDouble(3) === 0.2)
    assert(r2.getDouble(4) === 0.0)
    assert(r2.getDouble(5) === 0.0)
    assert(r2.getInt(6) === 1) // 1/5 = 0.2 >= 0.12 top-word default

    val r3 = out(2)
    assert((r3.getLong(1), r3.getLong(2)) === ((1L, 1L)))
    assert(r3.getDouble(5) === 0.0)
  }

  test("repetition flag respects custom thresholds") {
    val docs = Seq((1L, "u v w x y")).toDF("doc_id", "text")
    val strict = Curation.withRepetitionMetrics(docs, topWordFracMax = 0.5)
      .select("repetitive").collect().head.getInt(0)
    assert(strict === 0)
  }

  test("sampleHash is the md5-hex60 derivation") {
    val got = spark.range(3).select(Curation.sampleHash(col("id")))
      .as[Long].collect()
    val want = (0L until 3L).map { id =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"mix:$id".getBytes("UTF-8"))
      val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    assert(got.toSeq === want)
  }

  test("mixtureSample is deterministic, layout-independent, and rate-accurate") {
    val docs = spark.range(20000)
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, "en").otherwise("xx").as("lang"))
    val rates = Map("en" -> 0.5)

    val kept = Curation.mixtureSample(docs, rates).select("doc_id")
    val a = kept.as[Long].collect().sorted.toSeq
    val b = Curation.mixtureSample(docs.repartition(13), rates)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)

    // unknown group at defaultRate 0 -> dropped entirely
    assert(!a.exists(_ % 2 == 1))
    // en kept fraction ~ 0.5 (10k trials, 4 sigma ~ 2%)
    val frac = a.size / 10000.0
    assert(math.abs(frac - 0.5) < 0.02, s"kept frac $frac")
  }
}
