package graft

import org.apache.spark.sql.DataFrame
import graft.queries.{BenchQueries, SqlQueries}

/** SURVEY.md §7.1: the DataFrame builders and the SQL texts are the same
  * queries — row-for-row. */
class SqlParitySpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(r => (0 until r.length).map(i => String.valueOf(r.get(i))))

  private val covered =
    (BenchQueries.headline ++ queries.RelationalQueries.all ++
      queries.FunctionQueries.all ++ queries.LlmQueries.all ++
      queries.AnalyticsQueries.all)
      .filter(q => SqlQueries.texts.contains(q.name))

  covered.foreach { q =>
    test(s"${q.name}: SQL text matches the DataFrame builder") {
      val viaDf = rows(q.build(spark, sf001))
      val viaSql = rows(SqlQueries.run(spark, sf001, q.name))
      assert(viaSql === viaDf, q.name)
    }
  }
}
