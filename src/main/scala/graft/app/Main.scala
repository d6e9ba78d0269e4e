package graft.app

import java.time.Duration
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession

import graft.metrics.{MetricsRegistry, MetricsServer}
import graft.sources.{AuthenticatedTransport, CfAuditEventFetcher, CfAuthConfig, HttpTransport, JdkHttpTransport, UaaAuthenticator}
import graft.store.{EventStore, JdbcEventStore, ParquetEventStore}
import graft.streaming.{Collector, Informer, SplunkHecClient, SplunkShipper}

/** Env-var config mirroring the reference's names and defaults
  * (`main_config.go:34-65`). Durations accept Go-style suffixed values
  * for the common forms (`200ms`, `15s`, `2m`). */
final case class Config(
    deployEnv: String,
    databaseUrl: String,
    warehouseDir: String,
    cfApiAddress: String,
    cfClientId: String,
    cfClientSecret: String,
    cfUsername: String,
    cfPassword: String,
    paginationWaitMillis: Long,
    collectorScheduleMillis: Long,
    informerScheduleMillis: Long,
    shipperScheduleMillis: Long,
    splunkApiKey: String,
    splunkUrl: String,
    listenPort: Int)

object Config {
  private def env(k: String, default: String = ""): String =
    sys.env.getOrElse(k, default)

  private[app] def parseDurationMillis(s: String, defaultMillis: Long): Long =
    if (s.isEmpty) defaultMillis
    else if (s.endsWith("ms")) s.dropRight(2).toLong
    else if (s.endsWith("s")) s.dropRight(1).toLong * 1000L
    else if (s.endsWith("m")) s.dropRight(1).toLong * 60000L
    else if (s.endsWith("h")) s.dropRight(1).toLong * 3600000L
    else s.toLong

  def fromEnv(): Config = Config(
    deployEnv = env("DEPLOY_ENV", "dev"),
    databaseUrl = env("DATABASE_URL"),
    warehouseDir = env("WAREHOUSE_DIR", "/tmp/graft-warehouse"),
    cfApiAddress = env("CF_API_ADDRESS"),
    cfClientId = env("CF_CLIENT_ID"),
    cfClientSecret = env("CF_CLIENT_SECRET"),
    cfUsername = env("CF_USERNAME"),
    cfPassword = env("CF_PASSWORD"),
    paginationWaitMillis = parseDurationMillis(env("FETCHER_PAGINATION_WAIT_TIME"), 200L),
    collectorScheduleMillis = parseDurationMillis(env("COLLECTOR_SCHEDULE"), 2L * 60 * 1000),
    informerScheduleMillis = parseDurationMillis(env("INFORMER_SCHEDULE"), 15000L),
    shipperScheduleMillis = parseDurationMillis(env("SHIPPER_SCHEDULE"), 15000L),
    splunkApiKey = env("SPLUNK_API_KEY"),
    splunkUrl = env("SPLUNK_HEC_ENDPOINT_URL"),
    listenPort = env("PORT", "9299").toInt)
}

/** Process wiring (`main.go:24-135`): init store, start the four loops on
  * daemon threads, serve /metrics + /health, shut down gracefully on
  * SIGTERM (ST7). Collector/informer errors are fatal; shipper errors are
  * absorbed by its own loop (ST5). The Splunk shipper starts only when
  * both SPLUNK_* vars are set (ST8, main.go:110-122). */
object Main {
  def main(args: Array[String]): Unit = {
    val cfg = Config.fromEnv()
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("paasauditorspark")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

    val store: EventStore =
      if (cfg.databaseUrl.nonEmpty)
        new JdbcEventStore(spark, cfg.databaseUrl, new java.util.Properties())
      else new ParquetEventStore(spark, cfg.warehouseDir)
    store.init() // DDL before anything else (main.go:36-43)

    // root lager logger, main_config.go's NewLogger analog
    val logger = graft.logging.Lager("paasauditorspark")
    logger.info("starting", "deploy_env" -> cfg.deployEnv)

    val registry = new MetricsRegistry
    val server = new MetricsServer(registry, cfg.listenPort)
    server.start()

    val stop = new AtomicBoolean(false)
    sys.addShutdownHook { stop.set(true) }

    val rawHttp = new JdkHttpTransport(Duration.ofSeconds(30)) // CF timeout (main_config.go:51)
    // UAA OAuth (main.go:45-48): authenticate every CF request when client
    // or user credentials are configured; bare transport otherwise (stubs).
    val authCfg = CfAuthConfig(cfg.cfApiAddress, cfg.cfClientId, cfg.cfClientSecret,
      cfg.cfUsername, cfg.cfPassword)
    val http: HttpTransport =
      if (authCfg.enabled) new AuthenticatedTransport(rawHttp, new UaaAuthenticator(rawHttp, authCfg))
      else rawHttp
    val fetcher = new CfAuditEventFetcher(http, cfg.cfApiAddress,
      paginationWaitMillis = cfg.paginationWaitMillis,
      logger = logger.session("cf-audit-event-fetcher")) // main.go:52
    val collector = new Collector(spark, store, fetcher, registry, logger = logger)
    val informer = new Informer(store, registry, logger = logger)

    val threads = scala.collection.mutable.ArrayBuffer.empty[Thread]
    def spawn(name: String)(body: => Unit): Unit = {
      val t = new Thread(() => body, name)
      t.setDaemon(true)
      t.start()
      threads += t
    }

    @volatile var fatal: Option[Throwable] = None
    // STREAMING_PIPELINE=1 runs the COMPOSED shape: one Structured
    // Streaming query (DSv2 source → dedup → store → pooled parallel ship,
    // Trigger.ProcessingTime) in place of the collector+shipper threads —
    // same semantics, Spark-native execution with checkpointed offsets.
    // Requires the SPLUNK_* pair (the composed query ships every trigger).
    val composed = sys.env.getOrElse("STREAMING_PIPELINE", "").nonEmpty &&
      cfg.splunkApiKey.nonEmpty && cfg.splunkUrl.nonEmpty
    var composedQuery: Option[org.apache.spark.sql.streaming.StreamingQuery] = None
    if (composed) {
      def mkClient() = new SplunkHecClient(
        new JdkHttpTransport(Duration.ofSeconds(2)), cfg.splunkUrl, cfg.splunkApiKey)
      val shipper = new SplunkShipper(store, mkClient(), cfg.deployEnv, registry, logger = logger)
      val pipeline = new graft.streaming.StreamingPipeline(
        spark, store, shipper, () => mkClient(), cfg.cfApiAddress,
        triggerMillis = cfg.collectorScheduleMillis, logger = logger,
        sourceOptions = Map(
          "paginationWaitMillis" -> cfg.paginationWaitMillis.toString,
          "cfClientId" -> cfg.cfClientId, "cfClientSecret" -> cfg.cfClientSecret,
          "cfUsername" -> cfg.cfUsername, "cfPassword" -> cfg.cfPassword))
      composedQuery = Some(pipeline.start(s"${cfg.warehouseDir}/_pipeline_checkpoint"))
    } else {
      spawn("collector") {
        collector.run(cfg.collectorScheduleMillis, () => stop.get()) match {
          case Left(e) => fatal = Some(e); stop.set(true) // fail-fast (main.go:94-97)
          case Right(_) => ()
        }
      }
      if (cfg.splunkApiKey.nonEmpty && cfg.splunkUrl.nonEmpty) { // ST8
        val hecHttp = new JdkHttpTransport(Duration.ofSeconds(2)) // shipper.go:63
        val hec = new SplunkHecClient(hecHttp, cfg.splunkUrl, cfg.splunkApiKey)
        val shipper = new SplunkShipper(store, hec, cfg.deployEnv, registry, logger = logger)
        spawn("shipper") { shipper.run(cfg.shipperScheduleMillis, () => stop.get()) }
      }
    }
    spawn("informer") { informer.run(cfg.informerScheduleMillis, () => stop.get()) }

    while (!stop.get()) {
      // composed-mode fail-fast: a source/store failure kills the query —
      // surface it and exit like the collector path (main.go:94-97)
      composedQuery.filter(q => !q.isActive).foreach { q =>
        fatal = Option(q.exception.orNull); stop.set(true)
      }
      Thread.sleep(200L)
    }
    composedQuery.foreach(q => try q.stop() catch { case _: Exception => () })
    threads.foreach(_.join(5000L))
    server.stop()
    spark.stop()
    fatal.foreach { e => System.err.println(s"fatal: $e"); e.printStackTrace(); sys.exit(1) }
  }
}
