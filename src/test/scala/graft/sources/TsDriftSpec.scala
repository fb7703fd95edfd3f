package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.types.TimestampType

/** Schema-drift guard for the events loader (VERDICT r5 task #2).
  *
  * The driver's testdata has shipped `ts` as parquet TIMESTAMP(NANOS) and
  * later TIMESTAMP(MICROS, isAdjustedToUTC=false); at 100 TB mixed physical
  * encodings across files are routine. `Tables.events` must load every
  * encoding to the same epoch instants with the same TimestampType schema —
  * this spec reads three fixture files carrying identical logical values in
  * the three encodings Spark distinguishes (nanos→LongType via nanosAsLong,
  * micros-NTZ→TimestampNTZType, micros-UTC→TimestampType) and asserts the
  * loader converges them.
  */
class TsDriftSpec extends SparkTestBase {
  private def fixture(name: String): String =
    getClass.getResource(s"/tsdrift/$name").getPath

  test("Tables.documents/embeddings normalize drifted physical types to the contract") {
    import org.apache.spark.sql.types._
    val drifted = getClass.getResource("/schemadrift/drifted").getPath
    val docs = Tables.documents(spark, drifted)
    assert(docs.schema("doc_id").dataType == LongType)
    assert(docs.schema("n_chars").dataType == LongType)
    // typed-Dataset encoders (the dedup paths) must work on the drifted file
    import spark.implicits._
    assert(docs.select("doc_id", "text").as[(Long, String)].collect().length == 2)

    val emb = Tables.embeddings(spark, drifted)
    assert(emb.schema("vec_id").dataType == LongType)
    assert(emb.schema("embedding").dataType.asInstanceOf[ArrayType]
      .elementType == FloatType, "ANN family requires float elements")
    assert(emb.schema("label").dataType == IntegerType)
    // the native FloatType vector expression must run on the drifted file
    graft.plans.VectorExpressions.register(spark)
    emb.createOrReplaceTempView("emb_drift")
    val d = spark.sql(
      """SELECT graft_sqdist(a.embedding, b.embedding) AS d
        |FROM emb_drift a JOIN emb_drift b ON a.vec_id = 1 AND b.vec_id = 2
        |""".stripMargin).collect().head.getDouble(0)
    assert(math.abs(d - 2.0) < 1e-6, s"sqdist on drifted file: $d")

    // and the well-formed driver testdata takes the zero-cost path: no
    // Cast nodes appear in the plan for an already-conforming file
    val clean = Tables.embeddings(spark, "/root/testdata/sf0.001")
    assert(!clean.queryExecution.analyzed.toString.contains("cast(embedding"),
      "conforming file must not pay a cast")
  }

  test("Tables.events converges nanos / micros-ntz / micros-utc encodings") {
    val encodings = Seq("nanos", "micros_ntz", "micros_utc")
    val loaded = encodings.map { e =>
      val df = Tables.events(spark, fixture(e))
      assert(df.schema("ts").dataType == TimestampType,
        s"$e: loader must land on TimestampType, got ${df.schema("ts").dataType}")
      e -> df.selectExpr("event_id", "unix_micros(ts) as us")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }.toMap
    val expected = Seq(
      (1L, 1577836800000000L), (2L, 1577923200123456L), (3L, 1609459199999999L))
    encodings.foreach { e =>
      assert(loaded(e) == expected, s"$e: values drifted: ${loaded(e)}")
    }
  }
}
