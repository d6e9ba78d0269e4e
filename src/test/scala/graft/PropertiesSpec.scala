package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Row, functions => F}
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.model.Schemas
import graft.operators.AuditQueries

/** Property-based checks (ScalaCheck) for the invariants the reference
  * relies on but never tests (SURVEY §5): dedup idempotence, cursor-resume
  * safety under arbitrary batches, and cap monotonicity. */
object PropertiesSpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each case runs Spark jobs; keep it tight

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val genEvent: Gen[(String, Long)] = for {
    guid <- Gen.chooseNum(0, 30).map(i => s"g$i") // small key space → collisions
    at <- Gen.chooseNum(0L, 86400L)
  } yield (guid, at)

  private val genBatch: Gen[List[(String, Long)]] = Gen.listOfN(40, genEvent)

  private def df(batch: List[(String, Long)]) =
    batch.toDF("guid", "secs")
      .withColumn("created_at", F.timestamp_seconds(F.col("secs") + 1))
      .withColumn("event_type", F.lit("t"))
      .drop("secs")

  private val emptyGuids = Seq.empty[String].toDF("guid")

  property("dedup is idempotent: store(batch ++ batch) == store(batch)") =
    Prop.forAll(genBatch) { batch =>
      val once = AuditQueries.dedupAgainst(df(batch), emptyGuids)
        .select("guid").collect().map(_.getString(0)).sorted.toSeq
      val twice = AuditQueries.dedupAgainst(df(batch ++ batch), emptyGuids)
        .select("guid").collect().map(_.getString(0)).sorted.toSeq
      once == twice
    }

  property("dedup output keys = distinct(batch) minus existing") =
    Prop.forAll(genBatch, genBatch) { (batch, stored) =>
      val out = AuditQueries.dedupAgainst(df(batch), df(stored).select("guid"))
        .select("guid").collect().map(_.getString(0)).toSet
      val expect = batch.map(_._1).toSet -- stored.map(_._1).toSet
      out == expect
    }

  property("unshipped = events at/after cursor except the shipped guid, capped earliest-first") =
    Prop.forAll(genBatch, Gen.chooseNum(0L, 86400L), Gen.chooseNum(1, 50)) { (batch, curSecs, cap) =>
      val uniq = batch.distinctBy(_._1)
      val events = df(uniq)
      val cursorTs = new Timestamp((curSecs + 1) * 1000L)
      val shippedGuid = uniq.headOption.map(_._1).getOrElse("none")
      val cursors = Seq(("s", cursorTs, shippedGuid)).toDF("name", "updated_at", "shipped_id")
      val got = AuditQueries.unshipped(events, cursors, "s", batchCap = cap, payloadCols = Seq("guid"))
        .collect().map(_.getString(0)).toSet
      val eligible = uniq.filter { case (_, at) => (at + 1) * 1000L >= cursorTs.getTime }
      val capped = eligible.sortBy { case (g, at) => (at, g) }.take(cap)
      val expect = capped.map(_._1).filterNot(_ == shippedGuid).toSet
      got == expect
    }

  property("ingest sequence is dense, unique, and respects (created_at, guid) order") =
    Prop.forAll(genBatch) { batch =>
      val uniq = batch.distinctBy(_._1)
      Prop.collect(uniq.size) {
        val out = AuditQueries.assignIngestSeq(df(uniq), base = 0L)
          .select("id", "created_at", "guid").collect()
          .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).sortBy(_._1)
        val ids = out.map(_._1).toSeq
        val ordered = out.map(x => (x._2.getTime, x._3)).toSeq
        ids == (1L to uniq.size.toLong) && ordered == ordered.sorted
      }
    }

  property("splitOnCheck partitions the batch exactly") =
    Prop.forAll(genBatch) { batch =>
      val d = df(batch).withColumn("created_at",
        F.when(F.col("guid") === "g0", F.lit(Schemas.epoch)).otherwise(F.col("created_at")))
      val (ok, bad) = AuditQueries.splitOnCheck(d)
      ok.count() + bad.count() == batch.size
    }
}
