package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.UnitDb
import graft.model.TopicKey

/** S5 enforcement on the streaming PUBLISH path: an unauthorized row
  * dead-letters like any malformed topic (reference hdl_conn.go:489-507
  * rejects a bad PUBLISH per message, never the connection). */
class SecureIngestSpec extends SparkSpec {

  test("secure streaming ingest: unauthorized rows dead-letter, not abort") {
    val base = Files.createTempDirectory("graftsec").toString
    val db = UnitDb.open(spark, base + "/store", secureMode = true)
    val k = db.keyGen("st.ok", TopicKey.AllowWrite)
    import spark.implicits._
    val src = Seq(
      (s"$k/st.ok", "good1"), (s"$k/st.ok", "good2"),
      ("st.ok", "nokey"), // missing key
      (s"${db.keyGen("st.ok", TopicKey.AllowRead)}/st.ok", "readkey") // wrong flag
    ).toDF("topic", "p")
      .select(col("topic"), col("p").cast("binary").as("payload"))
    val parsed = StreamIngest.toParsed(db, src, 0L).collect()
    assert(parsed.count(_.msg.isDefined) == 2)
    assert(parsed.count(_.reject.isDefined) == 2)
    assert(parsed.flatMap(_.reject).forall(_.reason.contains("unauthorized")))
    assert(parsed.flatMap(_.msg).forall(_.topic == "st.ok"),
      "stored topics are bare — the key prefix never reaches the store")
    db.close()
  }
}
