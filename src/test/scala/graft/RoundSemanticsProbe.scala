package graft

/** Dev probe (not a test): print Spark round(x, k) for adversarial doubles
  * so tools/round_census.py can diff them against DuckDB's round. */
object RoundSemanticsProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("roundprobe")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val xs = scala.io.Source.fromFile(args(0)).getLines()
      .map(java.lang.Double.parseDouble).toSeq
    val df = xs.toDF("x")
      .select(col("x"), round(col("x"), 6).as("r6"), round(col("x"), 4).as("r4"))
      .collect()
    val out = new java.io.PrintWriter(args(1))
    df.foreach(r => out.println(
      s"${java.lang.Double.toHexString(r.getDouble(0))} ${r.getDouble(1)} ${r.getDouble(2)}"))
    out.close()
    spark.stop()
  }
}
