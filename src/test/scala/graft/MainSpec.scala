package graft

import graft.core.Lakehouse
import graft.pipeline.Medallion
import org.apache.spark.sql.functions._

/** The CLI layer dispatcher: per-layer stages compose to the same lake state
  * as runCycle (the Main.main entry forks its own session, so the dispatch
  * logic is exercised through the same Medallion calls it routes to). */
class MainSpec extends SparkSpec {

  test("layer-by-layer dispatch produces the same features as runCycle") {
    val csv = tmpDir("main-csv")
    graft.core.Graft.events(spark, sf)
      .select("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(csv)

    val a = tmpDir("main-a"); val b = tmpDir("main-b")
    Medallion.runCycle(spark, csv, a)
    // the dispatcher's sequence, one layer at a time
    Medallion.ingestRaw(spark, csv, b)
    Medallion.stage(spark, b)
    Medallion.analytics(spark, b)
    Medallion.features(spark, b)
    val fa = Lakehouse.read(spark, Medallion.featuresPath(a))
    val fb = Lakehouse.read(spark, Medallion.featuresPath(b))
    assert(fa.exceptAll(fb).isEmpty && fb.exceptAll(fa).isEmpty)
    assert(fa.count() > 0)
  }

  test("raw-domain layer ingests the exporter CSVs into enriched raw tables") {
    import graft.pipeline.RawIngestion
    val csv = tmpDir("raw-csv"); val lake = tmpDir("raw-lake")
    def write(name: String, header: String, rows: String*): Unit = {
      val p = java.nio.file.Paths.get(csv, s"$name.csv")
      java.nio.file.Files.writeString(p, (header +: rows).mkString("\n"))
    }
    write("blocks", "timestamp,number,hash,base_fee_per_gas",
      "1704067200,100,bh100,7")
    write("transactions",
      "hash,from_address,to_address,nonce,transaction_index,gas,gas_price,max_fee_per_gas,max_priority_fee_per_gas,value,input,block_hash,block_timestamp,block_number,transaction_type",
      "h1,a,b,1,0,21000,5,6,7,9,0x,bh100,1704067200,100,2")
    write("receipts",
      "transaction_hash,block_number,cumulative_gas_used,gas_used,contract_address,root,status,effective_gas_price",
      "h1,100,42000,21000,,r,1,5")
    write("logs", "log_index,transaction_hash,address,data,topics,block_number",
      "0,h1,0xc,0x,t1|t2,100")
    write("token_transfers",
      "token_address,from_address,to_address,transaction_hash,value,log_index,block_number",
      "0xtok,a,b,h1,1000,0,100")
    write("traces",
      "transaction_hash,from_address,to_address,trace_type,call_type,reward_type,trace_id,error,value,gas,gas_used,subtraces,status,block_number",
      "h1,a,b,call,call,,t,,500,1,1,0,1,100")
    RawIngestion.ingest(spark, csv, lake)
    val tx = Lakehouse.read(spark, s"$lake/raw/ethereum_transactions").head()
    assert(tx.getAs[Long]("receipt_gas_used") == 21000L)
    assert(tx.getAs[String]("date_partition") == "2024-01")
    val lg = Lakehouse.read(spark, s"$lake/raw/ethereum_logs").head()
    assert(lg.getAs[scala.collection.Seq[String]]("topics").toSeq == Seq("t1", "t2"))
    assert(lg.getAs[Long]("block_timestamp") == 1704067200L)
    val tr = Lakehouse.read(spark, s"$lake/raw/ethereum_traces").head()
    assert(tr.getAs[String]("block_hash") == "bh100")
    assert(Lakehouse.read(spark, s"$lake/raw/ethereum_token_transfers").count() == 1)
  }
}
