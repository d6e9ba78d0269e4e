package graft

import graft.sources.{HttpReply, HttpTransport}
import graft.sources.v2.CfEventsTable

/** End-to-end DSv2 micro-batch source: readStream.format("graft-cf-events")
  * against a scripted transport, into a memory sink. */
class CfEventsSourceSpec extends SparkSpec {

  private def pageBody(guids: Seq[String], ats: Seq[String], next: String): String = {
    val resources = guids.zip(ats).map { case (g, at) =>
      s"""{"metadata":{"guid":"$g","created_at":"$at"},
         |"entity":{"type":"t","actor":"a","actor_type":"t","actor_name":"n",
         |"actor_username":"u","actee":"e","actee_type":"t","actee_name":"n",
         |"organization_guid":"","space_guid":"sg","metadata":{}}}""".stripMargin
    }.mkString(",")
    s"""{"total_results":${guids.size},"total_pages":2,"next_url":"$next","resources":[$resources]}"""
  }

  it("streams pages as micro-batches with ''->NULL edges and typed timestamps") {
    val p1 = "/v2/events?q=timestamp%3E1970-01-01T00%3A00%3A00Z&results-per-page=100"
    val p2 = "/v2/events?page=2"
    val transport = new HttpTransport with Serializable {
      def get(url: String, headers: Map[String, String]): HttpReply = url match {
        case u if u.endsWith(p2) || u == p2 => HttpReply(200, pageBody(Seq("g3"), Seq("2024-01-01T12:00:00Z"), ""))
        case u if u.endsWith(p1) || u == p1 => HttpReply(200,
          pageBody(Seq("g1", "g2"), Seq("2024-01-01T10:00:00Z", "2024-01-01T11:00:00Z"), p2))
        case u => // post-overlap resume fetches: nothing new
          HttpReply(200, s"""{"total_results":0,"total_pages":0,"next_url":"","resources":[]}""")
      }
      def post(url: String, body: String, headers: Map[String, String]): HttpReply =
        throw new UnsupportedOperationException
    }
    CfEventsTable.transportOverride.set(transport)
    try {
      val stream = spark.readStream
        .format("graft-cf-events")
        .option("apiAddress", "")
        .option("paginationWaitMillis", "0")
        .load()
      val q = stream.writeStream
        .format("memory")
        .queryName("cf_events_out")
        .start()
      try {
        q.processAllAvailable()
        val rows = spark.table("cf_events_out")
          .orderBy("guid")
          .selectExpr("guid", "cast(created_at as string)", "organization_guid", "space_guid")
          .collect()
        rows.map(_.getString(0)) shouldBe Array("g1", "g2", "g3")
        rows(0).getString(1) shouldBe "2024-01-01 10:00:00"
        rows(0).isNullAt(2) shouldBe true // '' -> NULL
        rows(0).getString(3) shouldBe "sg"
      } finally q.stop()
    } finally CfEventsTable.transportOverride.set(null)
  }

  it("fails the stream fast on a fetch error instead of silently dropping pages") {
    val transport = new HttpTransport with Serializable {
      def get(url: String, headers: Map[String, String]): HttpReply = HttpReply(500, "upstream down")
      def post(url: String, body: String, headers: Map[String, String]): HttpReply =
        throw new UnsupportedOperationException
    }
    CfEventsTable.transportOverride.set(transport)
    try {
      val q = spark.readStream
        .format("graft-cf-events")
        .option("apiAddress", "")
        .option("paginationWaitMillis", "0")
        .load()
        .writeStream.format("memory").queryName("cf_events_fail").start()
      try {
        val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        ex.getMessage should include("cf-events fetch failed")
      } finally q.stop()
    } finally CfEventsTable.transportOverride.set(null)
  }

  it("authenticates via UAA when credentials are passed as source options") {
    val tokenPosts = new java.util.concurrent.atomic.AtomicInteger(0)
    val transport = new HttpTransport with Serializable {
      def get(url: String, headers: Map[String, String]): HttpReply =
        if (url.endsWith("/v2/info"))
          HttpReply(200, """{"token_endpoint":"https://uaa.example.com"}""")
        else if (!headers.get("Authorization").contains("Bearer tok-dsv2"))
          HttpReply(401, """{"error":"invalid_token"}""")
        else if (url.contains("timestamp%3E1970-01-01")) // initial fetch only; resume fetches drain empty
          HttpReply(200, pageBody(Seq("g1"), Seq("2024-01-01T10:00:00Z"), ""))
        else HttpReply(200, """{"total_results":0,"total_pages":0,"next_url":"","resources":[]}""")
      def post(url: String, body: String, headers: Map[String, String]): HttpReply = {
        tokenPosts.incrementAndGet()
        HttpReply(200, """{"access_token":"tok-dsv2","token_type":"bearer","expires_in":43199}""")
      }
    }
    CfEventsTable.transportOverride.set(transport)
    try {
      val q = spark.readStream
        .format("graft-cf-events")
        .option("apiAddress", "")
        .option("paginationWaitMillis", "0")
        .option("cfClientId", "auditor")
        .option("cfClientSecret", "s3cret")
        .load()
        .writeStream.format("memory").queryName("cf_events_auth").start()
      try {
        q.processAllAvailable()
        spark.table("cf_events_auth").select("guid").collect().map(_.getString(0)) shouldBe Array("g1")
        tokenPosts.get() should be >= 1
      } finally q.stop()
    } finally CfEventsTable.transportOverride.set(null)
  }
}
