package graft

import org.apache.spark.sql.SparkSession

object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // simulate the at-scale plan: with broadcast off, both sides of a join
    // must exchange — showing whether ReusedExchange covers the big scans
    if (sys.env.contains("PLAN_AUDIT_NO_BROADCAST")) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    }
    val dir = "/root/testdata/sf0.01"
    val names = sys.env.get("PLAN_AUDIT_QUERIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .filter(_.nonEmpty)
      .getOrElse(Seq("q05_nation_revenue", "q21_car_trimmed_mean", "q33_pipeline_high_gamma"))
    for (name <- names) {
      val df0 = SparkEntry.queries(name)(spark, dir)
      // PLAN_AUDIT_COUNT audits the bench harness's actual plan shape:
      // Bench times df.count(), whose optimized plan can differ from the
      // query's own (aggregate pruning above sources, dropped sorts)
      val df = if (sys.env.contains("PLAN_AUDIT_COUNT"))
        df0.groupBy().count() else df0
      // run first so AQE finalizes: runtime ReusedExchange / skew splits /
      // broadcast demotions only appear in the post-execution plan
      if (sys.env.contains("PLAN_AUDIT_EXECUTE")) df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length
      val reused = "ReusedExchange".r.findAllIn(plan).length
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
      val smj = "SortMergeJoin".r.findAllIn(plan).length
      val wgl = "WindowGroupLimit".r.findAllIn(plan).length
      println(s"== $name: exchanges=$exchanges reused=$reused broadcastJoins=$bhj sortMergeJoins=$smj windowGroupLimits=$wgl")
      plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join")
          || l.contains("Scan") || l.contains("WindowGroupLimit")
          || l.contains("Aggregate"))
        .take(30).foreach(l => println("   " + l.trim.take(150)))
    }
    spark.stop()
  }
}
