package graft

import org.apache.spark.sql.functions._

/** The pure-SQL surface of every registered graft function: a SQL user
  * without the Column API gets the same codegen'd expressions. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("round-5 functions resolve and compute through spark.sql") {
    assert(spark.sql(
      "SELECT jaro_winkler('martha', 'marhta')").as[Double].head()
      === 0.9611111111111111)

    Seq(("x", 3L, 5L)).toDF("s", "lo", "hi")
      .createOrReplaceTempView("sv_in")
    val sig = spark.sql(
      "SELECT simhash_votes(lo, hi) FROM sv_in").as[Long].head()
    assert(sig === ((5L << 32) | 3L)) // single row: signature = its bits

    val est = spark.sql(
      """SELECT cms_estimate(sk, 'a', 3, 64) FROM (
           SELECT cms_sketch(t, 3, 64) AS sk FROM (
             SELECT explode(array('a', 'a', 'b')) AS t))""")
      .as[Long].head()
    assert(est >= 2L && est <= 3L) // 'a' twice, ≤ +collision

    val agms = spark.sql(
      """SELECT agms_sketch(k, 32) FROM (
           SELECT explode(array(1L, 1L, 2L)) AS k)""")
      .as[Seq[Long]].head()
    assert(agms.length === 32 && agms.exists(_ != 0L))

    val wav = spark.sql(
      "SELECT audio_info(CAST(NULL AS BINARY)) IS NULL").as[Boolean].head()
    assert(wav)
  }
}
