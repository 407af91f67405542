package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic, distributed NEXMark-style generator.
  *
  * Capability port of the reference generator
  * (/root/reference/flock/src/datasource/nexmark/event.rs:83-97 Event::new,
  * 152-185 Person, 247-311 Auction, 355-371 Bid; epoch loop nexmark.rs:
  * 357-390): same logical data model — a 1:3:46 person/auction/bid mix per
  * 50-event block (config.rs default proportions), epoch-bucketed event
  * time, hot-key skew on auctions/bidders, log-uniform prices.
  *
  * NOT a port of Rust SmallRng (SURVEY §7.2): randomness is derived from
  * xxhash64(event_id, salt), which makes generation a pure per-row column
  * expression — every row is computed independently from its id, so the
  * generator runs distributed via spark.range(n) with zero driver-side
  * state, scales linearly with executors, and is bit-reproducible at any
  * parallelism. The same expressions drive the batch tables and the
  * rate-source streaming tables.
  */
object Nexmark {
  /** Event-time origin (ms since epoch, 2024-01-01T00:00:00Z). */
  val BaseMs = 1704067200000L

  val PersonsPerBlock = 1
  val AuctionsPerBlock = 3
  val BidsPerBlock = 46
  val Block = 50 // PersonsPerBlock + AuctionsPerBlock + BidsPerBlock

  /** Generator config mirroring the reference CLI's knobs (reference
    * benchmarks/src/nexmark/main.rs:62-74 `-g` generator count,
    * config.rs person/auction/bid proportions). `generators` maps to
    * source parallelism: the pure-column design derives every event from
    * its id, so N generators == N range/rate partitions producing the
    * bit-identical event stream at any N — the property the reference
    * gets from seeding each generator's SmallRng from the event index.
    */
  final case class Config(
      personProportion: Int = PersonsPerBlock,
      auctionProportion: Int = AuctionsPerBlock,
      bidProportion: Int = BidsPerBlock,
      generators: Int = 8) {
    require(personProportion >= 1 && auctionProportion >= 1 && bidProportion >= 1,
      "each event-type proportion must be >= 1")
    require(generators >= 1, "generators must be >= 1")
    val block: Int = personProportion + auctionProportion + bidProportion
  }

  /** Uniform double in [0,1) derived from (id, salt) — codegen'd, stateless. */
  private def u01(id: Column, salt: String): Column =
    (abs(xxhash64(id, lit(salt))) % lit(1000000000L)).cast(DoubleType) / lit(1e9)

  /** Uniform long in [0, n) — guards n >= 1. */
  private def uniformLong(id: Column, salt: String, n: Column): Column =
    abs(xxhash64(id, lit(salt))) % greatest(n, lit(1L))

  /** Event time: events are spread evenly across 1-second epochs at
    * `eventsPerSecond` (the reference's Epoch granule, datasource/epoch.rs:22).
    */
  private def eventTime(id: Column, eventsPerSecond: Long): Column =
    timestamp_millis(lit(BaseMs) + (id.cast(LongType) / eventsPerSecond).cast(LongType) * 1000L +
      ((id % eventsPerSecond) * 1000L / eventsPerSecond).cast(LongType))

  // Within each block: first `personProportion` ids → person, next
  // `auctionProportion` → auction, rest → bid. Column `/` is DOUBLE
  // division — the fractional part would leak into the id arithmetic
  // downstream (e.g. `blockOf*ap + offset` picks up `ap*offset/block`,
  // off-by-one once that exceeds 1) — so blockOf must be exact integer
  // division: subtract the remainder first, then the quotient is an
  // integer-valued double (exact below 2^53) cast back to LONG.
  private def offsetOf(id: Column, cfg: Config = Config()) = id % cfg.block
  private def blockOf(id: Column, cfg: Config = Config()) =
    ((id - offsetOf(id, cfg)) / cfg.block).cast(LongType)

  private def rangeIds(spark: SparkSession, nEvents: Long, cfg: Config) =
    spark.range(0L, nEvents, 1L, numPartitions = cfg.generators)

  /** Person events: `personProportion` per block; p_id is dense. */
  def persons(spark: SparkSession, nEvents: Long, eventsPerSecond: Long = 1000,
      cfg: Config = Config()): DataFrame = {
    val ids = rangeIds(spark, nEvents, cfg)
      .filter(offsetOf(col("id"), cfg) < cfg.personProportion)
    val id = col("id")
    val pId = (blockOf(id, cfg) * cfg.personProportion + offsetOf(id, cfg))
      .cast(IntegerType)
    val states = array(Seq("or", "id", "ca", "wa", "az").map(lit): _*)
    val cities = array(Seq("portland", "boise", "seattle", "phoenix", "eugene").map(lit): _*)
    ids.select(
      pId.as("p_id"),
      concat(lit("person_"), pId).as("name"),
      concat(lit("user"), pId, lit("@example.com")).as("email_address"),
      lpad(conv(substring(md5(id.cast(StringType)), 1, 12), 16, 10), 16, "0").as("credit_card"),
      element_at(cities, (uniformLong(id, "city", lit(5L)) + 1).cast(IntegerType)).as("city"),
      element_at(states, (uniformLong(id, "state", lit(5L)) + 1).cast(IntegerType)).as("state"),
      eventTime(id, eventsPerSecond).as("p_date_time"))
  }

  /** Auction events: 3 per block; a_id is dense. Hot sellers: 50% of
    * auctions are listed by the most recent person (reference hot-key
    * logic, event.rs:247-311).
    */
  def auctions(spark: SparkSession, nEvents: Long, eventsPerSecond: Long = 1000,
      cfg: Config = Config()): DataFrame = {
    val ids = rangeIds(spark, nEvents, cfg)
      .filter(offsetOf(col("id"), cfg) >= cfg.personProportion &&
        offsetOf(col("id"), cfg) < cfg.personProportion + cfg.auctionProportion)
    val id = col("id")
    val aId = (blockOf(id, cfg) * cfg.auctionProportion +
      (offsetOf(id, cfg) - cfg.personProportion)).cast(IntegerType)
    // persons 0..(block+1)*pp - 1 exist once this block's persons emitted
    val curPerson = (blockOf(id, cfg) + 1) * cfg.personProportion
    val hotSeller = blockOf(id, cfg) * cfg.personProportion
    val seller = when(u01(id, "hotseller") < 0.5, hotSeller)
      .otherwise(uniformLong(id, "seller", curPerson))
    ids.select(
      aId.as("a_id"),
      concat(lit("item_"), aId).as("item_name"),
      concat(lit("desc_"), md5(id.cast(StringType)).substr(1, 8)).as("description"),
      (uniformLong(id, "initbid", lit(1000L)) + 100).cast(IntegerType).as("initial_bid"),
      (uniformLong(id, "reserve", lit(1000L)) + 200).cast(IntegerType).as("reserve"),
      eventTime(id, eventsPerSecond).as("a_date_time"),
      (eventTime(id, eventsPerSecond) +
        make_dt_interval(lit(0), lit(0), lit(0),
          (uniformLong(id, "expires", lit(20L)) + 1).cast(DoubleType))).as("expires"),
      seller.cast(IntegerType).as("seller"),
      uniformLong(id, "category", lit(10L)).cast(IntegerType).as("category"))
  }

  /** Bid events: 46 per block. Hot auctions/bidders: 50% of bids hit the
    * most recent auction, 50% the most recent person; price is log-uniform
    * 10^(U*6)*100 cents (reference event.rs:355-371).
    */
  def bids(spark: SparkSession, nEvents: Long, eventsPerSecond: Long = 1000,
      cfg: Config = Config()): DataFrame =
    bidsFromIds(rangeIds(spark, nEvents, cfg).toDF()
      .filter(offsetOf(col("id"), cfg) >=
        cfg.personProportion + cfg.auctionProportion), eventsPerSecond, cfg)

  /** The bid projection, applicable to any DataFrame with an `id` column —
    * reused by the rate-source streaming variant. `keep` carries extra
    * input columns through (e.g. a file-landing tick index).
    */
  def bidsFromIds(ids: DataFrame, eventsPerSecond: Long = 1000,
      cfg: Config = Config(), keep: Seq[String] = Nil): DataFrame = {
    val id = col("id")
    // auctions 0..(block+1)*ap - 1 exist once this block's auctions emitted
    val curAuction = (blockOf(id, cfg) + 1) * cfg.auctionProportion
    val hotAuction = curAuction - 1
    val curPerson = (blockOf(id, cfg) + 1) * cfg.personProportion
    val hotBidder = blockOf(id, cfg) * cfg.personProportion
    val auction = when(u01(id, "hotauction") < 0.5, hotAuction)
      .otherwise(uniformLong(id, "auction", curAuction))
    val bidder = when(u01(id, "hotbidder") < 0.5, hotBidder)
      .otherwise(uniformLong(id, "bidder", curPerson))
    ids.select(Seq(
      auction.cast(IntegerType).as("auction"),
      bidder.cast(IntegerType).as("bidder"),
      (pow(lit(10.0), u01(id, "price") * 6.0) * 100.0).cast(IntegerType).as("price"),
      eventTime(id, eventsPerSecond).as("b_date_time")) ++ keep.map(col): _*)
  }

  /** Streaming bids via the rate source: `rowsPerSecond` ids/sec, each id
    * mapped through the same pure-column bid projection. Event time is the
    * deterministic generator time (so windows are reproducible), not the
    * rate-source wall clock.
    */
  def bidStream(spark: SparkSession, rowsPerSecond: Int = 1000,
      eventsPerSecond: Long = 1000, cfg: Config = Config()): DataFrame = {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .option("numPartitions", cfg.generators)
      .load()
    bidsFromIds(rate.select(col("value").as("id")), eventsPerSecond, cfg)
  }

  /** Side-input table for q13-style stream–static joins (reference
    * actor.rs:575-629 loads a CSV keyed 0..999 with `key -> value`).
    */
  def sideInput(spark: SparkSession, n: Long = 1000): DataFrame =
    spark.range(0, n).select(
      col("id").cast(IntegerType).as("key"),
      concat(lit("side_"), col("id") % 100).as("value"))
}
