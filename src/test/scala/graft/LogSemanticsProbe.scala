package graft

/** Dev probe: print Math.log / StrictMath.log for input doubles so the
  * round_census tooling can diff them bitwise against DuckDB's ln(). */
object LogSemanticsProbe {
  def main(args: Array[String]): Unit = {
    val out = new java.io.PrintWriter(args(1))
    scala.io.Source.fromFile(args(0)).getLines().foreach { l =>
      val x = java.lang.Double.parseDouble(l)
      out.println(s"${java.lang.Double.toHexString(x)} " +
        s"${java.lang.Double.toHexString(math.log(x))} " +
        s"${java.lang.Double.toHexString(StrictMath.log(x))} " +
        s"${java.lang.Double.toHexString(math.exp(x))} " +
        s"${java.lang.Double.toHexString(math.log1p(x))} " +
        s"${java.lang.Double.toHexString(math.sqrt(x))}")
    }
    out.close()
  }
}
