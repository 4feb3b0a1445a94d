package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl._
import graft.queries.Tables

/** Dev-only stage profile of the events→envelope→decode path. */
object DevProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = Tables.events(spark, sfDir)
    events.count() // warm

    if (args.contains("explain")) {
      val tx = Ingest.parseRaw(EventEnvelopes.txEnvelopes(events))
        .filter(col("event_type") === "transaction")
        .select(col("payload.gas_price"), col("block_number"))
      println("=== narrow tx projection, optimized ===")
      println(tx.queryExecution.optimizedPlan.toString.take(4000))
      spark.stop(); return
    }

    def time(name: String)(f: => Long): Unit = {
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-30s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
      }
    }

    val env = EventEnvelopes.transferEnvelopes(events)
    time("to_json only") { env.count() }
    time("decode repart32") {
      TokenTransferDecoder.decode(Ingest.parseRaw(env.repartition(32)))
        .select("tx_hash").count()
    }
    time("decode genbarrier r32") {
      TokenTransferDecoder.decode(
        env.repartition(32).toDF()
          .select(explode(array(from_json(col("value"), graft.schema.Envelope.schema))).as("e"))
          .select("e.*"))
        .select("tx_hash").count()
    }
    val par = Ingest.parseRaw(env.repartition(32))
    time("parse repart32") {
      par.select("payload.tx_hash").filter(col("payload.tx_hash").isNotNull).count()
    }
    graft.functions.KeccakFunctions.register(spark)
    graft.functions.GraftFunctions.register(spark)
    time("parse+2checksum r32") {
      par.select(
        graft.functions.KeccakFunctions.checksumAddress(
          concat(lit("0x"), lower(substring(element_at(col("payload.topics"), 2), -40, 40)))).as("f"),
        graft.functions.KeccakFunctions.checksumAddress(
          concat(lit("0x"), lower(substring(element_at(col("payload.topics"), 3), -40, 40)))).as("t"))
        .filter(length(col("f")) > 0).count()
    }
    time("parse+hexdec r32") {
      par.select(graft.functions.GraftFunctions.hexToDecimal(col("payload.data")).as("a"))
        .filter(col("a").isNotNull || col("a").isNull).count()
    }
    time("parse+regex r32") {
      par.select(
          regexp_replace(lower(trim(element_at(col("payload.topics"), 2))), "^(0x)?0*", "").as("h"))
        .filter(col("h").rlike("^[0-9a-f]*$")).count()
    }
    val parsed = Ingest.parseRaw(env)
    time("+ from_json") { parsed.select("block_number").filter(col("block_number") > 0).count() }
    time("+ from_json all payload") { parsed.select("payload.*", "block_number").filter(col("block_number") > 0).count() }
    val decoded = TokenTransferDecoder.decode(parsed)
    time("full decode") { decoded.count() }
    time("decode no order") { decoded.select("tx_hash").count() }
    // checksum alone
    graft.functions.KeccakFunctions.register(spark)
    time("checksum 2x per row") {
      parsed.select(
        graft.functions.KeccakFunctions.checksumAddress(
          concat(lit("0x"), lower(substring(element_at(col("payload.topics"), 2), -40, 40)))).as("f"),
        graft.functions.KeccakFunctions.checksumAddress(
          concat(lit("0x"), lower(substring(element_at(col("payload.topics"), 3), -40, 40)))).as("t"))
        .filter(length(col("f")) > 0).count()
    }
    spark.stop()
  }
}
// appended: cluster loop instrumentation
object DevProbe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Tables.documents(spark, sfDir)
    val t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup.nearDuplicates(docs, 0.5)
    val n = pairs.count()
    println(f"pairs rows=$n  ${(System.nanoTime()-t0)/1e9}%.1f s")
    val t1 = System.nanoTime()
    val comp = graft.dedup.Dedup.connectedComponents(pairs)
    println(f"components build ${(System.nanoTime()-t1)/1e9}%.1f s")
    val t2 = System.nanoTime()
    println("rows=" + comp.count())
    println(f"materialize ${(System.nanoTime()-t2)/1e9}%.1f s  iters=" + graft.dedup.Dedup.lastComponentIterations)
    spark.stop()
  }
}

/** Dev-only: CC cost breakdown with the pair input pre-materialized, so the
  * per-round constant shows up separately from the near-dup DAG. */
object DevProbe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Tables.documents(spark, sfDir)
    val t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup.nearDuplicates(docs, 0.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(f"pairs materialized rows=${pairs.count()}  ${(System.nanoTime()-t0)/1e9}%.1f s")
    for (run <- 0 to 2) {
      val t1 = System.nanoTime()
      val comp = graft.dedup.Dedup.connectedComponents(pairs)
      val n = comp.count()
      println(f"run$run CC rows=$n  ${(System.nanoTime()-t1)/1e9}%.2f s  iters=" +
        graft.dedup.Dedup.lastComponentIterations)
    }
    spark.stop()
  }
}
