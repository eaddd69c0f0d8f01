package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: print parsed (unresolved) plans for the statement shapes
  * the plan-based auto-routes must recognize. Not a test — run manually. */
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    val p = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser
    for (s <- Seq(
      "SELECT c.seg, count(*) AS cnt FROM v1 o JOIN v2 c ON o.k = c.k WHERE o.p > 1 GROUP BY c.seg ORDER BY c.seg",
      "SELECT o.k, count(DISTINCT o.x) AS d FROM v1 o GROUP BY o.k HAVING count(*) > 1 ORDER BY o.k LIMIT 5",
      "SELECT DISTINCT k, s FROM v1 ORDER BY k",
      "SELECT k, count(*) FROM v1 GROUP BY k",
      "SELECT * FROM v1 o JOIN v2 c ON o.k = c.k",
      "SELECT o.k FROM v1 o JOIN v2 c ON o.k = c.k JOIN v3 d ON c.j = d.j",
      "SELECT sum(a+1) AS s FROM v1 GROUP BY k, j HAVING sum(b) > 2 AND k > 1"
    )) {
      println("=== " + s)
      println(p.parsePlan(s).treeString)
    }
    spark.stop()
  }
}
