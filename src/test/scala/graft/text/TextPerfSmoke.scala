package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev perf harness (not a test): the dedup/similarity family at a corpus
  * scale two orders above the bench (default 200k docs incl. planted
  * near-dup clusters and a boilerplate flood), to demonstrate the plans'
  * scale behavior — bounded bucket tasks, no full-corpus re-scans, CC
  * convergence. Run:
  *   sbt "Test/runMain graft.text.TextPerfSmoke [nDocs]"
  */
object TextPerfSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 200000
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[textperf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // deterministic synthetic corpus: 30-token docs from a 5k vocab seeded
    // per doc id; every 100th doc duplicates its predecessor with one token
    // changed (near-dup), every 1000th copies it verbatim (exact dup), and
    // ids 0-499 share one boilerplate string (the skew-cap flood)
    val gen = udf { (id: Long) =>
      if (id < 500) "boilerplate header text repeated verbatim across the crawl"
      else {
        val r = new scala.util.Random(id / 100 * 100) // same seed within a century
        val words = Array.fill(30)("tok" + r.nextInt(5000))
        if (id % 100 != 0) words((id % 30).toInt) = "mut" + id
        words.mkString(" ")
      }
    }
    val docs = spark.range(nDocs).select($"id".as("doc_id"), gen($"id").as("text"))
      .persist()
    time("corpus materialize")(docs.count())

    time("exact dedup groups")(TextOps.exactDupGroups(docs).count())
    val sigs = TextOps.minhashSignatures(docs)
    val pairs = time("minhash signatures + candidates")(
      TextOps.minhashCandidates(sigs, threshold = 0.5))
    val nPairs = time("minhash candidates count")(pairs.count())
    println(s"[textperf] candidate pairs: $nPairs")
    time("simhash candidates")(
      TextOps.simhashCandidates(TextOps.simhashSignatures(docs), maxHamming = 3).count())
    val clusters = time("connected components + dupClusters")(
      TextOps.dupClusters(docs, pairs).filter($"cluster" =!= $"doc_id").count())
    println(s"[textperf] docs folded into a non-trivial cluster: $clusters")
    spark.stop()
  }
}
