package graft

import java.nio.file.{Files, Paths}

import graft.store.ParquetEventStore
import graft.streaming.EventStreamIngest

/** Structured-Streaming ingest: page files → parse/flatten → dedup-append
  * store, via the real `readStream`/`foreachBatch` pipeline. */
class StreamIngestSpec extends SparkSpec {

  private def page(guids: Seq[String]): String = {
    val resources = guids.map { g =>
      s"""{"metadata":{"guid":"$g","created_at":"2024-01-01T10:00:00Z"},
         |"entity":{"type":"t","actor":"a","actor_type":"t","actor_name":"n",
         |"actor_username":"u","actee":"e","actee_type":"t","actee_name":"n",
         |"organization_guid":"","space_guid":"sg","metadata":"{}"}}""".stripMargin
    }.mkString(",")
    s"""{"total_results":${guids.size},"total_pages":1,"next_url":"","resources":[$resources]}"""
  }

  it("ingests page files exactly-once into the store") {
    val pagesDir = Files.createTempDirectory("graft-pages").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val wh = Files.createTempDirectory("graft-wh").toString
    val store = new ParquetEventStore(spark, wh)
    store.init()

    Files.writeString(Paths.get(pagesDir, "page1.json"), page(Seq("g1", "g2")))
    Files.writeString(Paths.get(pagesDir, "page2.json"), page(Seq("g2", "g3"))) // overlap

    val q = EventStreamIngest.fromPageFiles(spark, pagesDir, ckpt, store, triggerMillis = 100)
    try {
      q.processAllAvailable()
      store.events.count() shouldBe 3L
      // late page arrives; dedup keeps the store consistent
      Files.writeString(Paths.get(pagesDir, "page3.json"), page(Seq("g3", "g4")))
      q.processAllAvailable()
      store.events.count() shouldBe 4L
    } finally q.stop()
  }

  it("resumes from the checkpoint after a restart without reprocessing or losing pages") {
    val pagesDir = Files.createTempDirectory("graft-pages-r").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-r").toString
    val wh = Files.createTempDirectory("graft-wh-r").toString
    val store = new ParquetEventStore(spark, wh)
    store.init()

    Files.writeString(Paths.get(pagesDir, "page1.json"), page(Seq("g1", "g2")))
    val q1 = EventStreamIngest.fromPageFiles(spark, pagesDir, ckpt, store, triggerMillis = 100)
    try { q1.processAllAvailable(); store.events.count() shouldBe 2L } finally q1.stop()

    // page lands while the query is DOWN; restart with the same checkpoint
    Files.writeString(Paths.get(pagesDir, "page2.json"), page(Seq("g3")))
    val q2 = EventStreamIngest.fromPageFiles(spark, pagesDir, ckpt, store, triggerMillis = 100)
    try {
      q2.processAllAvailable()
      val rows = store.events.orderBy("id").select("id", "guid").collect()
      rows.map(_.getString(1)) shouldBe Array("g1", "g2", "g3") // no dups, no loss
      rows.map(_.getLong(0)) shouldBe Array(1L, 2L, 3L) // ingest sequence continuous
    } finally q2.stop()
  }

  it("ingests a Kafka-wire-shaped record stream through the same parse/sink pipeline") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-ckpt-k").toString
    val wh = Files.createTempDirectory("graft-wh-k").toString
    val store = new ParquetEventStore(spark, wh)
    store.init()
    // the exact column shape spark-sql-kafka surfaces for a topic
    val input = MemoryStream[(String, String)]
    val records = input.toDS().toDF("k", "v").select(
      F.col("k").cast("binary").as("key"),
      F.col("v").cast("binary").as("value"),
      F.lit("cf-pages").as("topic"),
      F.lit(0).as("partition"),
      F.crc32(F.col("v").cast("binary")).as("offset")) // stand-in offset (monotonic id is not streamable)
    val q = EventStreamIngest.fromKafkaShaped(records, ckpt, store, triggerMillis = 100)
    try {
      input.addData(("p1", page(Seq("k1", "k2"))), ("p2", page(Seq("k2", "k3")))) // overlap
      q.processAllAvailable()
      store.events.count() shouldBe 3L
      input.addData(("p3", page(Seq("k3", "k4"))))
      q.processAllAvailable()
      store.events.orderBy("id").select("guid").collect().map(_.getString(0)) shouldBe
        Array("k1", "k2", "k3", "k4")
    } finally q.stop()
  }

  it("MetricsListener publishes streaming progress into the registry") {
    import graft.metrics.MetricsRegistry
    import graft.streaming.MetricsListener
    val reg = new MetricsRegistry
    val listener = new MetricsListener(reg)
    spark.streams.addListener(listener)
    try {
      val pagesDir = Files.createTempDirectory("graft-pages-m").toString
      val ckpt = Files.createTempDirectory("graft-ckpt-m").toString
      Files.writeString(Paths.get(pagesDir, "p.json"), page(Seq("m1", "m2")))
      val q = spark.readStream.option("wholetext", "true").text(pagesDir)
        .writeStream.queryName("mlisten").format("memory")
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
      // listener events are async; give the bus a moment
      val deadline = System.currentTimeMillis() + 10000
      while (reg.counterValue("streaming_mlisten_input_rows_total") < 1.0 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      reg.counterValue("streaming_mlisten_input_rows_total") should be >= 1.0
    } finally spark.streams.removeListener(listener)
  }

  it("windowedCounts aggregates per minute with a watermark") {
    import spark.implicits._
    val parsed = EventStreamIngest.parsePages(Seq(page(Seq("a", "b"))).toDF("value"))
    val out = EventStreamIngest.windowedCounts(parsed).collect()
    out.length shouldBe 1
    out(0).getLong(2) shouldBe 2L
  }
}
