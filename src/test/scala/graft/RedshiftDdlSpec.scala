package graft

import org.apache.spark.sql.types._

import graft.sources.{JdbcUpsertSink, RedshiftDdl}
import graft.sources.RedshiftDdl.{Col, TableSpec}

/** Redshift DDL generator (sources/RedshiftDdl): reference clause shape
  * (DISTKEY/compound PK, load_to_redshift.py:81-104), ANSI stripping,
  * and a live Derby round-trip of the stripped form through the real
  * ensureTable + upsert path. */
class RedshiftDdlSpec extends SparkSpec {
  import spark.implicits._

  private val genreKpis = TableSpec("genre_kpis",
    cols = Seq(
      Col("genre", "VARCHAR(255)"),
      Col("total_streams", "BIGINT"),
      Col("unique_listeners", "BIGINT"),
      Col("avg_stream_duration", "DECIMAL(10,2)"),
      Col("date_processed", "TIMESTAMP", Some("CURRENT_TIMESTAMP"))),
    primaryKey = Seq("genre", "date_processed"),
    distKey = Some("genre"))

  test("createTable emits the reference's Redshift clause set") {
    val ddl = RedshiftDdl.createTable(genreKpis)
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS genre_kpis"))
    assert(ddl.contains("avg_stream_duration DECIMAL(10,2)"))
    assert(ddl.contains("date_processed TIMESTAMP DEFAULT CURRENT_TIMESTAMP"))
    assert(ddl.contains("PRIMARY KEY (genre, date_processed)"))
    assert(ddl.contains("DISTSTYLE KEY DISTKEY (genre)"))
    // no sort keys declared -> no SORTKEY clause
    assert(!ddl.contains("SORTKEY"))
  }

  test("sort keys render as a compound SORTKEY; EVEN tables skip DISTSTYLE") {
    val ts = TableSpec("hourly_kpis",
      cols = Seq(Col("hour", "TIMESTAMP"), Col("total_streams", "BIGINT")),
      sortKeys = Seq("hour"))
    val ddl = RedshiftDdl.createTable(ts)
    assert(ddl.contains("COMPOUND SORTKEY (hour)"))
    assert(!ddl.contains("DISTSTYLE")) // EVEN is Redshift's default
  }

  test("toAnsi strips layout clauses, keeps PK semantics") {
    val ansi = RedshiftDdl.toAnsi(genreKpis)
    assert(!ansi.contains("DISTSTYLE") && !ansi.contains("SORTKEY"))
    assert(ansi.contains("PRIMARY KEY (genre, date_processed)"))
  }

  test("toAnsi DDL runs on Derby and feeds the live upsert path") {
    val spec = TableSpec("rsddl_kpis",
      cols = Seq(
        Col("\"genre\"", "VARCHAR(64) NOT NULL"),
        Col("\"listen_count\"", "BIGINT"),
        Col("\"load_date\"", "DATE NOT NULL")),
      primaryKey = Seq("\"genre\"", "\"load_date\""))
    val sink = JdbcUpsertSink("jdbc:derby:memory:rsddl;create=true")
    sink.ensureTable(RedshiftDdl.toAnsi(spec), "rsddl_kpis")
    sink.ensureTable(RedshiftDdl.toAnsi(spec), "rsddl_kpis") // idempotent
    val d1 = java.sql.Date.valueOf("2024-06-25")
    val batch = Seq(("rock", 10L, d1)).toDF("genre", "listen_count", "load_date")
    sink.upsert(batch, "rsddl_kpis", Seq("genre"), "load_date")
    sink.upsert(batch, "rsddl_kpis", Seq("genre"), "load_date")
    assert(sink.countWhere("rsddl_kpis", "1=1") === 1)
  }

  test("fromSchema maps Spark types; complex columns fail loudly") {
    val schema = StructType(Seq(
      StructField("genre", StringType),
      StructField("total_streams", LongType),
      StructField("avg_stream_duration", DoubleType),
      StructField("hour", TimestampType)))
    val spec = RedshiftDdl.fromSchema("t", schema,
      primaryKey = Seq("genre"), distKey = Some("genre"),
      overrides = Map("avg_stream_duration" -> "DECIMAL(10,2)"))
    assert(spec.cols.map(c => c.name -> c.sqlType) === Seq(
      "genre" -> "VARCHAR(256)", "total_streams" -> "BIGINT",
      "avg_stream_duration" -> "DECIMAL(10,2)", "hour" -> "TIMESTAMP"))
    val bad = StructType(Seq(StructField("v", ArrayType(FloatType))))
    val e = intercept[IllegalArgumentException] {
      RedshiftDdl.fromSchema("t", bad)
    }
    assert(e.getMessage.contains("no Redshift mapping"))
    // key validation: a distKey not among the columns is a spec bug
    val e2 = intercept[IllegalArgumentException] {
      TableSpec("t", Seq(Col("a", "BIGINT")), distKey = Some("missing"))
    }
    assert(e2.getMessage.contains("missing"))
  }
}
