package graft

import org.apache.spark.sql.SparkSession

/** Shared exporter-CSV fixture for the domain DAG specs — batch 1 of
  * DomainPipelineSpec's two-cycle story (0xaaaa11 sends 2 ETH to 0xbbbb22
  * in block 17000100 @ 2024-01-01, plus the erc20/trace/log side feeds),
  * single-sourced so DataQualitySpec's gate case and the pipeline spec
  * cannot drift apart. */
object DomainFixtures {

  def writeCsv(dir: String, name: String, header: String, rows: String*): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, s"$name.csv"),
      (header +: rows).mkString("\n")): Unit

  val txHeader: String =
    "hash,from_address,to_address,nonce,transaction_index,gas,gas_price,max_fee_per_gas,max_priority_fee_per_gas,value,input,block_hash,block_timestamp,block_number,transaction_type"
  val rcHeader: String =
    "transaction_hash,block_number,cumulative_gas_used,gas_used,contract_address,root,status,effective_gas_price"

  /** batch 1: 0xaaaa11 sends 2 ETH to 0xbbbb22 (fee 21000 * 1e9 / 1e18 =
    * 2.1e-5 ETH) in block 17000100 @ 2024-01-01 (past the reference's
    * genesis-adjacent watermark defaults). */
  def writeCsvFixture(spark: SparkSession, csv: String): Unit = {
    writeCsv(csv, "blocks", "timestamp,number,hash,base_fee_per_gas",
      "1704067200,17000100,bh100,7")
    writeCsv(csv, "transactions", txHeader,
      s"h1,0xaaaa11,0xbbbb22,1,0,21000,1000000000,0,0,2000000000000000000,0x,bh100,1704067200,17000100,2")
    writeCsv(csv, "receipts", rcHeader, "h1,17000100,21000,21000,,r,1,1000000000")
    writeCsv(csv, "logs", "log_index,transaction_hash,address,data,topics,block_number",
      "0,h1,0xc,0x,t1|t2,17000100")
    // the token transfer flows through the erc20 branch (metadata below)
    writeCsv(csv, "token_transfers",
      "token_address,from_address,to_address,transaction_hash,value,log_index,block_number",
      "0xtok,0xaaaa11,0xbbbb22,h1,1000,1,17000100")
    writeCsv(csv, "traces",
      "transaction_hash,from_address,to_address,trace_type,call_type,reward_type,trace_id,error,value,gas,gas_used,subtraces,status,block_number",
      "h1,0xaaaa11,0xbbbb22,call,call,,t1,,0,21000,21000,0,1,17000100")
    // metadata for 0xtok (decimals 9) so the transfer reaches the
    // features PRICED, through the contract gate
    writeCsv(csv, "tokens_metadata",
      "contract_address,symbol,decimals,created_timestamp,date_partition",
      "0xtok,TOK,9,1704000000,2024-01")
  }
}
