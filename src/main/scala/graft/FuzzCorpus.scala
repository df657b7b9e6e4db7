package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.util.Random

/** Seeded adversarial corpus generator for the differential fuzz harness
  * ([[FuzzCheck]]): writes the same ten tables, with the same physical
  * parquet schemas, as the driver's fixture — but with the hostile
  * features the fixed fixture never exhibits:
  *
  *  - NULLs in every non-key column (the fixture is documented NULL-free,
  *    so every NULL convention on the query surface was spec-trusted until
  *    this harness);
  *  - duplicate foreign keys, heavy-hitter key skew, exact value TIES
  *    (2-decimal money collides constantly at these row counts; embedding
  *    coordinates are multiples of 1/64 so dot products tie exactly);
  *  - negative and large magnitudes inside each operator's documented
  *    exactness envelope;
  *  - unicode extremes: emoji, CJK, RTL, combining marks, an extra
  *    non-ASCII event category flowing through group keys and sorts;
  *  - empty/whitespace/long-repetitive documents, exact and near
  *    duplicates (so the dedup family has real work), zero vectors and
  *    duplicate embeddings (distance ties, the mx=0 quantize guard).
  *
  * PRIMARY keys stay non-null and unique in the hostile and degenerate
  * profiles — that is the documented contract of every keyed operator
  * (deterministic tie-breaks need a total order). The r17 BAD-KEY profile
  * (seed ≤ -100) attacks exactly that invariant on purpose, because a real
  * ingest will: see [[corruptKeys]]. Generation is driver-side by design: a
  * few thousand rows per table, seeded `scala.util.Random`, written once
  * per seed, so any divergence the harness finds replays exactly. */
object FuzzCorpus {

  // NTZ (naive) timestamps — the fixture's physical parquet type
  // (isAdjustedToUTC=false); a tz-adjusted TimestampType here would make
  // DuckDB render '+00' suffixes the fixture never has
  private def ts(micros: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)

  private val DAY_US = 86400000000L
  // epoch day ranges matching the fixture (queries parameterize on them)
  private val EVENT_DAY0 = 19723L
  private val EVENT_DAYS = 30
  private def dateUs(epochDay: Long, intraUs: Long): Long =
    epochDay * DAY_US + intraUs

  /** null with probability p, else v — the workhorse of the whole file. */
  private def orNull(r: Random, p: Double)(v: => Any): Any =
    if (r.nextDouble() < p) null else v

  private def money2(r: Random, lo: Double, hi: Double): Double = {
    // 2-decimal money on a COARSE grid: collisions (exact ties) by design
    val cents = (lo * 100).toLong + r.nextLong(((hi - lo) * 100).toLong + 1)
    // snap 30% of values to a whole-dollar grid for even denser ties
    val snapped = if (r.nextDouble() < 0.3) cents / 100 * 100 else cents
    snapped / 100.0
  }

  private val unicodeWords = Seq(
    "café", "straße", "你好", "世界",
    "привет", "مرحبا",
    "😀🔥", "étoile", "über",
    "naïve", "日本語", "한국어")
  private val asciiWords = Seq(
    "the", "fast", "key", "order", "sort", "table", "scan", "merge",
    "part", "window", "small", "hash", "join", "batch", "stream", "spark",
    "dup", "group", "query", "row", "data", "slow", "filter", "customer",
    "line", "value", "column", "big", "vector", "agg")

  // ——————————————————————————————— tables ———————————————————————————————

  private def region(spark: SparkSession, r: Random) = {
    val names = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    val rows = names.zipWithIndex.map { case (n, i) => Row(i, n) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("r_regionkey", IntegerType, nullable = false),
        StructField("r_name", StringType, nullable = true))))
  }

  private def nation(spark: SparkSession, r: Random) = {
    val rows = (0 until 25).map(i => Row(i, s"NATION_$i", i % 5))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("n_nationkey", IntegerType, nullable = false),
        StructField("n_name", StringType, nullable = true),
        StructField("n_regionkey", IntegerType, nullable = true))))
  }

  private def supplier(spark: SparkSession, r: Random, n: Int) = {
    val rows = (0 until n).map { i =>
      Row(i.toLong, f"Supplier#$i%09d",
        orNull(r, 0.05)(r.nextInt(25)),
        orNull(r, 0.06)(money2(r, -1000, 10000)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("s_suppkey", LongType, nullable = false),
        StructField("s_name", StringType, nullable = true),
        StructField("s_nationkey", IntegerType, nullable = true),
        StructField("s_acctbal", DoubleType, nullable = true))))
  }

  private def customer(spark: SparkSession, r: Random, n: Int) = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    val rows = (0 until n).map { i =>
      Row(i.toLong, f"Customer#$i%09d",
        orNull(r, 0.08)(r.nextInt(25)),
        orNull(r, 0.06)(money2(r, -1000, 10000)),
        orNull(r, 0.08)(segs(r.nextInt(segs.size))))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(
        StructField("c_custkey", LongType, nullable = false),
        StructField("c_name", StringType, nullable = true),
        StructField("c_nationkey", IntegerType, nullable = true),
        StructField("c_acctbal", DoubleType, nullable = true),
        StructField("c_mktsegment", StringType, nullable = true))))
  }

  private def part(spark: SparkSession, r: Random, n: Int) = {
    val types = Seq("ECONOMY", "STANDARD", "LARGE", "MEDIUM", "PROMO",
      "SMALL")
    val adjs = Seq("cold", "small", "large", "hot", "dim", "bright",
      "café", "über")
    val nouns = Seq("widget", "bolt", "gear", "cog", "spring")
    val rows = (0 until n).map { i =>
      Row(i.toLong,
        orNull(r, 0.04)(
          s"${adjs(r.nextInt(adjs.size))} ${nouns(r.nextInt(nouns.size))}"),
        orNull(r, 0.04)(s"Brand#${r.nextInt(25) + 1}"),
        orNull(r, 0.05)(types(r.nextInt(types.size))),
        orNull(r, 0.05)(r.nextInt(50) + 1),
        orNull(r, 0.05)(money2(r, 100, 2000)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("p_partkey", LongType, nullable = false),
        StructField("p_name", StringType, nullable = true),
        StructField("p_brand", StringType, nullable = true),
        StructField("p_type", StringType, nullable = true),
        StructField("p_size", IntegerType, nullable = true),
        StructField("p_retailprice", DoubleType, nullable = true))))
  }

  private def orders(spark: SparkSession, r: Random, n: Int, nCust: Int) = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val statuses = Seq("F", "O", "P")
    val day0 = java.time.LocalDate.of(1995, 1, 1).toEpochDay
    val daySpan = (java.time.LocalDate.of(2001, 8, 1).toEpochDay - day0).toInt
    val rows = (0 until n).map { i =>
      // heavy-hitter skew: 25% of orders land on 3 hot customers
      val cust =
        if (r.nextDouble() < 0.25) r.nextInt(3).toLong
        else r.nextLong(nCust.toLong)
      Row(i.toLong,
        orNull(r, 0.03)(cust),
        orNull(r, 0.04)(statuses(r.nextInt(statuses.size))),
        orNull(r, 0.05)(money2(r, -500, 400000)),
        orNull(r, 0.04)(
          ts(dateUs(day0 + r.nextInt(daySpan), r.nextLong(DAY_US)))),
        orNull(r, 0.05)(prios(r.nextInt(prios.size))))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(
        StructField("o_orderkey", LongType, nullable = false),
        StructField("o_custkey", LongType, nullable = true),
        StructField("o_orderstatus", StringType, nullable = true),
        StructField("o_totalprice", DoubleType, nullable = true),
        StructField("o_orderdate", TimestampNTZType, nullable = true),
        StructField("o_orderpriority", StringType, nullable = true))))
  }

  private def lineitem(spark: SparkSession, r: Random, n: Int,
      nOrders: Int, nParts: Int, nSupp: Int) = {
    val flags = Seq("A", "N", "R")
    val statuses = Seq("F", "O")
    val day0 = java.time.LocalDate.of(1995, 1, 1).toEpochDay
    val daySpan = (java.time.LocalDate.of(2001, 11, 1).toEpochDay - day0).toInt
    var ok = -1L; var ln = 0
    val rows = (0 until n).map { _ =>
      // 1-7 lines per order; (orderkey, linenumber) stays unique — the
      // deterministic-tie-break id contract (line_id = ok*10+ln)
      if (ln >= 1 + r.nextInt(7) || ok < 0) { ok += 1; ln = 1 } else ln += 1
      // hot parts: 20% of lines hit 2 hot parts (skew-join fodder)
      val pk = if (r.nextDouble() < 0.2) r.nextInt(2).toLong
               else r.nextLong(nParts.toLong)
      Row(ok, orNull(r, 0.03)(pk),
        orNull(r, 0.03)(r.nextLong(nSupp.toLong)),
        ln,
        orNull(r, 0.05)((r.nextInt(66) - 5).toDouble), // integral, some ≤ 0
        orNull(r, 0.05)(money2(r, -100000, 10000000)),
        orNull(r, 0.05)((r.nextInt(15) - 2) / 100.0),  // -0.02..0.12
        orNull(r, 0.05)(r.nextInt(11) / 100.0),
        orNull(r, 0.04)(flags(r.nextInt(flags.size))),
        orNull(r, 0.04)(statuses(r.nextInt(statuses.size))),
        orNull(r, 0.05)(
          ts(dateUs(day0 + r.nextInt(daySpan), r.nextLong(DAY_US)))))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("l_orderkey", LongType, nullable = false),
        StructField("l_partkey", LongType, nullable = true),
        StructField("l_suppkey", LongType, nullable = true),
        StructField("l_linenumber", IntegerType, nullable = false),
        StructField("l_quantity", DoubleType, nullable = true),
        StructField("l_extendedprice", DoubleType, nullable = true),
        StructField("l_discount", DoubleType, nullable = true),
        StructField("l_tax", DoubleType, nullable = true),
        StructField("l_returnflag", StringType, nullable = true),
        StructField("l_linestatus", StringType, nullable = true),
        StructField("l_shipdate", TimestampNTZType, nullable = true))))
  }

  private def events(spark: SparkSession, r: Random, n: Int) = {
    // the five fixture categories PLUS a non-ASCII one: unicode must
    // survive group keys, sorts, and the '|'-composite stream key
    val types = Seq("view", "click", "purchase", "signup", "error",
      "päuse🛑")
    val props = Seq.tabulate(8)(i => s"""{"k": ${i * 7 - 3}}""") ++
      Seq("{}", """{"k": null}""")
    val rows = (0 until n).map { i =>
      val day = EVENT_DAY0 + (i % EVENT_DAYS) // every day populated
      val user = if (r.nextDouble() < 0.5) r.nextInt(30).toLong
                 else r.nextLong(400L)
      // value: mix of 2-dec money, 6-dec micro-precision, negatives,
      // exact zero, and a large-magnitude tail
      val v = r.nextInt(5) match {
        case 0 => money2(r, -100, 1000)
        case 1 => r.nextInt(2000000).toDouble / 1000000.0
        case 2 => 0.0
        case 3 => -money2(r, 0, 500)
        case _ => money2(r, 0, 999999)
      }
      Row(i.toLong,
        ts(dateUs(day, r.nextLong(DAY_US))), // ts NON-NULL: watermark contract
        orNull(r, 0.06)(user),
        types(r.nextInt(types.size)),        // type NON-NULL: stream key contract
        orNull(r, 0.06)(v),
        orNull(r, 0.08)(props(r.nextInt(props.size))))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("event_id", LongType, nullable = false),
        StructField("ts", TimestampNTZType, nullable = false),
        StructField("user_id", LongType, nullable = true),
        StructField("event_type", StringType, nullable = false),
        StructField("value", DoubleType, nullable = true),
        StructField("props", StringType, nullable = true))))
  }

  private def sentence(r: Random, words: Int): String =
    Seq.fill(words)(
      if (r.nextDouble() < 0.12) unicodeWords(r.nextInt(unicodeWords.size))
      else asciiWords(r.nextInt(asciiWords.size))).mkString(" ")

  private def documents(spark: SparkSession, r: Random, n: Int) = {
    val langs = Seq("en", "de", "fr", "es", "zh", "ru", "pt", "ja")
    val texts = new scala.collection.mutable.ArrayBuffer[String](n)
    (0 until n).foreach { i =>
      val t = r.nextInt(20) match {
        case 0 if texts.nonEmpty =>            // exact duplicate
          texts(r.nextInt(texts.size))
        case 1 if texts.nonEmpty =>            // near duplicate: one-word edit
          val base = texts(r.nextInt(texts.size))
          val toks = base.split(" ")
          if (toks.length < 4) base
          else toks.updated(r.nextInt(toks.length),
            asciiWords(r.nextInt(asciiWords.size))).mkString(" ")
        case 2 => ""                           // empty
        case 3 => " \t\n "                     // whitespace-only
        case 4 =>                              // long repetitive (boilerplate)
          val para = sentence(r, 25)
          Seq.fill(4)(para).mkString(" ")
        case 5 =>                              // RTL + CJK + emoji mix
          "مرحبا 世界 " +
            "😀 étoile " + sentence(r, 6)
        case _ => sentence(r, 5 + r.nextInt(60))
      }
      texts += t
    }
    val rows = (0 until n).map { i =>
      val t = texts(i)
      Row(i.toLong, t,
        orNull(r, 0.10)(langs(r.nextInt(langs.size))),
        orNull(r, 0.10)(s"src${r.nextInt(10)}"),
        t.codePointCount(0, t.length).toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false),
        StructField("lang", StringType, nullable = true),
        StructField("source", StringType, nullable = true),
        StructField("n_chars", LongType, nullable = true))))
  }

  private def embeddings(spark: SparkSession, r: Random, n: Int,
      dim: Int = 64) = {
    val vecs = new scala.collection.mutable.ArrayBuffer[Seq[Float]](n)
    (0 until n).foreach { i =>
      val v: Seq[Float] = r.nextInt(12) match {
        case 0 => Seq.fill(dim)(0.0f)                 // zero vector (mx=0 guard)
        case 1 if vecs.nonEmpty =>                    // exact duplicate (ties)
          vecs(r.nextInt(vecs.size))
        case _ =>
          // coordinates on the 1/64 grid: floats AND their double products
          // are exactly representable, so distance ties are EXACT ties
          Seq.fill(dim)((r.nextInt(129) - 64) / 64.0f)
      }
      vecs += v
    }
    val rows = (0 until n).map { i =>
      Row(i.toLong, vecs(i), orNull(r, 0.10)(r.nextInt(3)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType, containsNull = false),
          nullable = false),
        StructField("label", IntegerType, nullable = true))))
  }

  // ————————————————————— degenerate profile (r16) —————————————————————
  // The hostile profile above attacks VALUE conventions (NULLs, ties,
  // unicode); this one attacks CARDINALITY conventions the generators
  // above exclude by construction: zero-row tables, single-row tables,
  // single-group tables, all-one-value columns (the min(nr,nc)<2 /
  // zero-variance guards), groups of size exactly k for the k-anonymity
  // boundary (k=25 in kanonymity_audit), NULL `documents.text`, all-zero
  // and all-identical embedding corpora. Selected by a NEGATIVE seed in
  // [[write]]; per-table variants rotate with |seed| so two degenerate
  // seeds cover different corners.

  private def degSupplier(spark: SparkSession, r: Random, v: Int) = v % 3 match {
    case 0 => supplier(spark, r, 0)   // zero-row dimension
    case 1 => supplier(spark, r, 1)   // single row
    case _ =>                         // all-one-value columns
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          (0 until 40).map(i => Row(i.toLong, "Supplier#X", 7, 100.0)), 1),
        StructType(Seq(
          StructField("s_suppkey", LongType, nullable = false),
          StructField("s_name", StringType, nullable = true),
          StructField("s_nationkey", IntegerType, nullable = true),
          StructField("s_acctbal", DoubleType, nullable = true))))
  }

  /** Engineered k-anonymity boundary: (nation, segment) groups of size
    * exactly 25 (== k), 24 (k-1), 26 (k+1), and 1 — plus a constant-balance
    * group (l-diversity = 1), a NULL-QI group, and a NULL-band group. */
  private def degCustomer(spark: SparkSession, r: Random) = {
    val groups = Seq(
      // (nationkey, segment, size, balance mode)  bal: 0=constant 1=varied
      (Some(1), Some("BUILDING"), 25, 0),
      (Some(1), Some("MACHINERY"), 24, 1),
      (Some(2), Some("BUILDING"), 26, 1),
      (Some(3), Some("FURNITURE"), 1, 1),
      (None, Some("HOUSEHOLD"), 25, 1),   // NULL QI column, size == k
      (Some(4), None, 3, 2))              // NULL segment + NULL balances
    var id = -1L
    val rows = groups.flatMap { case (nat, seg, size, balMode) =>
      (0 until size).map { _ =>
        id += 1
        val bal: Any = balMode match {
          case 0 => 1500.0                 // one band for the whole group
          case 1 => money2(r, -1000, 9000)
          case _ => null
        }
        Row(id, f"Customer#$id%09d", nat.map(Int.box).orNull, bal, seg.orNull)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("c_custkey", LongType, nullable = false),
        StructField("c_name", StringType, nullable = true),
        StructField("c_nationkey", IntegerType, nullable = true),
        StructField("c_acctbal", DoubleType, nullable = true),
        StructField("c_mktsegment", StringType, nullable = true))))
  }

  private def degPart(spark: SparkSession, r: Random, v: Int) = v % 3 match {
    case 0 => part(spark, r, 1)
    case 1 => part(spark, r, 0)
    case _ =>                         // constant brand/type/size
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          (0 until 50).map(i =>
            Row(i.toLong, "same widget", "Brand#9", "STANDARD", 10,
              money2(r, 100, 2000))), 1),
        StructType(Seq(
          StructField("p_partkey", LongType, nullable = false),
          StructField("p_name", StringType, nullable = true),
          StructField("p_brand", StringType, nullable = true),
          StructField("p_type", StringType, nullable = true),
          StructField("p_size", IntegerType, nullable = true),
          StructField("p_retailprice", DoubleType, nullable = true))))
  }

  private def degOrders(spark: SparkSession, r: Random, v: Int, nCust: Int) =
    v % 3 match {
      case 0 => orders(spark, r, 0, nCust)
      case 1 => orders(spark, r, 1, math.max(nCust, 1))
      case _ =>                        // single hot customer: one group
        val day0 = java.time.LocalDate.of(1995, 1, 1).toEpochDay
        val rows = (0 until 300).map { i =>
          Row(i.toLong, 0L, "O", money2(r, 100, 5000),
            ts(dateUs(day0 + r.nextInt(2000), r.nextLong(DAY_US))), "2-HIGH")
        }
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1),
          StructType(Seq(
            StructField("o_orderkey", LongType, nullable = false),
            StructField("o_custkey", LongType, nullable = true),
            StructField("o_orderstatus", StringType, nullable = true),
            StructField("o_totalprice", DoubleType, nullable = true),
            StructField("o_orderdate", TimestampNTZType, nullable = true),
            StructField("o_orderpriority", StringType, nullable = true))))
    }

  private def degLineitem(spark: SparkSession, r: Random, v: Int,
      nParts: Int, nSupp: Int) = v % 3 match {
    case 0 => lineitem(spark, r, 1, 1, math.max(nParts, 1), math.max(nSupp, 1))
    case 1 => lineitem(spark, r, 0, 0, math.max(nParts, 1), math.max(nSupp, 1))
    case _ =>
      // single (returnflag, linestatus) group, CONSTANT quantity and
      // discount: zero-variance corr/stddev paths, one-group aggregates
      val day0 = java.time.LocalDate.of(1995, 6, 1).toEpochDay
      val rows = (0 until 400).map { i =>
        Row(i.toLong / 4, (i % math.max(nParts, 8)).toLong,
          (i % math.max(nSupp, 4)).toLong, (i % 4) + 1,
          5.0, money2(r, 100, 100000), 0.05, 0.02, "N", "O",
          ts(dateUs(day0 + r.nextInt(400), r.nextLong(DAY_US))))
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2),
        StructType(Seq(
          StructField("l_orderkey", LongType, nullable = false),
          StructField("l_partkey", LongType, nullable = true),
          StructField("l_suppkey", LongType, nullable = true),
          StructField("l_linenumber", IntegerType, nullable = false),
          StructField("l_quantity", DoubleType, nullable = true),
          StructField("l_extendedprice", DoubleType, nullable = true),
          StructField("l_discount", DoubleType, nullable = true),
          StructField("l_tax", DoubleType, nullable = true),
          StructField("l_returnflag", StringType, nullable = true),
          StructField("l_linestatus", StringType, nullable = true),
          StructField("l_shipdate", TimestampNTZType, nullable = true))))
  }

  private def degEvents(spark: SparkSession, r: Random, v: Int) = v % 3 match {
    case 0 => events(spark, r, 0)       // zero-row stream source
    case 1 => events(spark, r, 1)       // single event
    case _ =>
      // one event_type, one user, every event at the SAME instant per day:
      // total timestamp ties, single-group folds, zero-range windows
      val rows = (0 until 500).map { i =>
        Row(i.toLong, ts(dateUs(EVENT_DAY0 + (i % EVENT_DAYS), 43200000000L)),
          7L, "view", 10.0, """{"k": 1}""")
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2),
        StructType(Seq(
          StructField("event_id", LongType, nullable = false),
          StructField("ts", TimestampNTZType, nullable = false),
          StructField("user_id", LongType, nullable = true),
          StructField("event_type", StringType, nullable = false),
          StructField("value", DoubleType, nullable = true),
          StructField("props", StringType, nullable = true))))
  }

  /** NULL text (the last unfuzzed blind spot — the fixture generator
    * guarantees non-null), empty text, single-token docs, and per-variant:
    * an all-identical corpus (one dup family spanning every row) or a
    * single-document corpus. `n_chars` is NULL exactly when text is. */
  private def degDocuments(spark: SparkSession, r: Random, v: Int) = {
    val texts: Seq[Any] = v % 3 match {
      case 0 => Seq.fill(60)("the same exact boilerplate paragraph again")
      case 1 => Seq(sentence(r, 12))    // single document
      case _ =>
        (0 until 80).map { i =>
          i % 8 match {
            case 0 => null              // NULL text
            case 1 => ""                // empty
            case 2 => "word"            // single token
            case 3 => " \t "            // whitespace
            case _ => sentence(r, 3 + r.nextInt(20))
          }
        }
    }
    val rows = texts.zipWithIndex.map { case (t, i) =>
      Row(i.toLong, t,
        if (i % 5 == 4) null else "en", // near-constant lang
        "src0",                          // CONSTANT source column
        if (t == null) null
        else Long.box(t.asInstanceOf[String]
          .codePointCount(0, t.asInstanceOf[String].length).toLong))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = true),
        StructField("lang", StringType, nullable = true),
        StructField("source", StringType, nullable = true),
        StructField("n_chars", LongType, nullable = true))))
  }

  private def degEmbeddings(spark: SparkSession, r: Random, v: Int,
      dim: Int = 64) = {
    val vecs: Seq[Seq[Float]] = v % 3 match {
      case 0 => Seq.fill(50)(Seq.fill(dim)(0.0f))          // ALL zero vectors
      case 1 => Seq(Seq.fill(dim)(1.0f / 8))               // single vector
      case _ =>                                            // all identical
        Seq.fill(60)(Seq.tabulate(dim)(i => (i % 5 - 2) / 64.0f))
    }
    val rows = vecs.zipWithIndex.map { case (vv, i) =>
      Row(i.toLong, vv, if (v % 3 == 2) Int.box(1) else Int.box(i % 2))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType, containsNull = false),
          nullable = false),
        StructField("label", IntegerType, nullable = true))))
  }

  // ———————————————————— bad-key ingest profile (r17) ————————————————————
  // Primary keys are the ONE invariant every profile above preserves —
  // "PRIMARY keys stay non-null and unique" is each keyed operator's
  // documented contract. A real 100-TB ingest WILL violate it (upstream
  // retries re-deliver rows; a malformed extract NULLs an id), and the
  // worst failure is silent: nondeterministic tie-breaks or quiet
  // mis-dedup no green gate ever sees. Seeds ≤ -100 select this profile:
  // the hostile VALUE corpus for base seed (|seed|-100), with
  // doc_id/vec_id/event_id then corrupted three ways — NULL ids,
  // duplicated ids with DIFFERENT content (the id no longer identifies a
  // row), and full-row duplicates (the retry-ingest shape). Every keyed
  // operator must either compute defined, oracle-matched output over this
  // corpus or reject loudly with a rejection registered in
  // scripts/fuzzcheck.py's BADKEY_REJECT.

  private def corruptKeys(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, idCol: String, r: Random,
      nNull: Int, nDupDiff: Int, nDupRow: Int) = {
    val schema = StructType(df.schema.map(f =>
      if (f.name == idCol) f.copy(nullable = true) else f))
    val idIdx = schema.fieldIndex(idCol)
    val rows = scala.collection.mutable.ArrayBuffer(df.collect().toSeq: _*)
    def setId(row: Row, id: Any): Row = Row.fromSeq(row.toSeq.updated(idIdx, id))
    // full-row duplicates first (they clone pristine ids)
    (0 until nDupRow).foreach(_ => rows += rows(r.nextInt(rows.size)))
    // same id, different content: victim keeps its columns, takes donor's id
    (0 until nDupDiff).foreach { _ =>
      val v = r.nextInt(rows.size); val d = r.nextInt(rows.size)
      rows(v) = setId(rows(v), rows(d).get(idIdx))
    }
    (0 until nNull).foreach { _ =>
      val v = r.nextInt(rows.size)
      rows(v) = setId(rows(v), null)
    }
    val shuffled = r.shuffle(rows.toSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(shuffled, df.rdd.getNumPartitions), schema)
  }

  // ———————————————— micro-batch slicing profile (r16) ————————————————
  // The batch fuzz profiles replay every query over ONE micro-batch; this
  // reshapes a written corpus so the 20 stream_* queries run through
  // HOSTILE multi-batch boundaries instead (VERDICT r15 task 2), while the
  // batch surface and the DuckDB oracle read the identical row multiset.

  /** Hostile but arrival-plausible events: ids are the arrival order
    * (latenessUpdates' cross-batch contract), event time tracks arrival
    * with ±25 min jitter — bounded strictly under every stream query's
    * 1-hour watermark, so a slicing cut at ANY id boundary delivers late
    * rows the watermark must still accept, never rows it may drop (the
    * fixture's day-striped ts pattern would violate that: id order there
    * jumps 29 days backward). Values/users/props keep the full hostile
    * treatment (NULLs, skew, ties, unicode). */
  private def eventsStreamShaped(spark: SparkSession, r: Random, n: Int) = {
    val types = Seq("view", "click", "purchase", "signup", "error",
      "päuse🛑")
    val props = Seq.tabulate(8)(i => s"""{"k": ${i * 7 - 3}}""") ++
      Seq("{}", """{"k": null}""")
    val spanUs = EVENT_DAYS.toLong * DAY_US
    val rows = (0 until n).map { i =>
      val base = dateUs(EVENT_DAY0, 0) + i.toLong * spanUs / n
      val jitterUs = r.nextLong(3000000000L) - 1500000000L // ±25 min
      val user = if (r.nextDouble() < 0.5) r.nextInt(30).toLong
                 else r.nextLong(400L)
      val v = r.nextInt(5) match {
        case 0 => money2(r, -100, 1000)
        case 1 => r.nextInt(2000000).toDouble / 1000000.0
        case 2 => 0.0
        case 3 => -money2(r, 0, 500)
        case _ => money2(r, 0, 999999)
      }
      Row(i.toLong,
        ts(math.max(dateUs(EVENT_DAY0, 0), base + jitterUs)),
        orNull(r, 0.06)(user),
        types(r.nextInt(types.size)),
        orNull(r, 0.06)(v),
        orNull(r, 0.08)(props(r.nextInt(props.size))))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("event_id", LongType, nullable = false),
        StructField("ts", TimestampNTZType, nullable = false),
        StructField("user_id", LongType, nullable = true),
        StructField("event_type", StringType, nullable = false),
        StructField("value", DoubleType, nullable = true),
        StructField("props", StringType, nullable = true))))
  }

  /** Write `slices` as mtime-staggered `slice_%03d.parquet` files inside
    * `outDir` so the file stream source (with maxFilesPerTrigger=1)
    * replays them as ORDERED micro-batches. Shared by the fuzz slicer and
    * [[graft.FaultProbe]]'s streaming workload — one implementation of
    * the stagger/naming mechanics, so the two can't drift. */
  private[graft] def writeSliceFiles(spark: SparkSession,
      outDir: java.io.File, schema: StructType,
      slices: Seq[Seq[Row]]): Unit = {
    val mtime0 = System.currentTimeMillis() - slices.length * 4000L
    slices.zipWithIndex.foreach { case (slice, i) =>
      val tmp = new java.io.File(outDir.getParentFile,
        s"__tmp_slice_${outDir.getName}")
      spark.createDataFrame(
          spark.sparkContext.parallelize(slice, 1), schema)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file for ${outDir.getName} slice $i"))
      val dest = new java.io.File(outDir, f"slice_$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      // the mtime stagger IS the micro-batch order contract (the file
      // stream source sorts by mtime); a filesystem that rejects the
      // update must fail the slicing leg loudly, not replay out of order
      require(dest.setLastModified(mtime0 + i * 2000L),
        s"could not stagger mtime for $dest — slice order would be undefined")
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
  }

  /** Replace `dir/<table>.parquet` (single file) with a DIRECTORY of `k`
    * slice files: rows sorted by `idCol`, cut at seeded random boundaries,
    * row order SHUFFLED within each slice, written via [[writeSliceFiles]].
    * Batch readers and the DuckDB oracle glob the directory — same row
    * multiset, different delivery. */
  private def sliceTableFile(spark: SparkSession, dir: String, table: String,
      idCol: String, k: Int, r: Random): Unit = {
    val file = new java.io.File(s"$dir/$table.parquet")
    require(file.isFile, s"sliceTableFile: $file is not a single-file table")
    val df = spark.read.parquet(file.toString)
    val schema = df.schema
    val rows = df.collect()
      .sortBy(_.getAs[Long](idCol))
    // k-1 distinct interior cut points → k non-empty contiguous ranges
    val cuts = (Seq(0, rows.length) ++
      Seq.fill(k - 1)(1 + r.nextInt(math.max(rows.length - 1, 1))))
      .distinct.sorted
    val slices = cuts.zip(cuts.tail).map { case (a, b) =>
      r.shuffle(rows.slice(a, b).toSeq)
    }
    require(file.delete(), s"sliceTableFile: could not remove $file")
    val outDir = new java.io.File(s"$dir/$table.parquet")
    require(outDir.mkdir(), s"sliceTableFile: could not mkdir $outDir")
    writeSliceFiles(spark, outDir, schema, slices)
  }

  /** Reshape a written corpus for the micro-batch-slicing fuzz leg:
    * regenerate `events` stream-shaped (see [[eventsStreamShaped]]) and
    * slice it plus `documents` (the stream_cdc_apply source) into `k`
    * mtime-ordered micro-batch files each. Run queries with
    * `graft.stream.maxFilesPerTrigger=1`. */
  def resliceForStreaming(spark: SparkSession, dir: String, seed: Long,
      k: Int): Unit = {
    val r = new Random(seed * 7919L + 13L)
    val ev = new java.io.File(s"$dir/events.parquet")
    if (ev.isDirectory) org.apache.commons.io.FileUtils.deleteDirectory(ev)
    else if (ev.exists()) ev.delete()
    writeTables(dir, Seq("events" -> eventsStreamShaped(spark, r, 4000)))
    sliceTableFile(spark, dir, "events", "event_id", k, r)
    sliceTableFile(spark, dir, "documents", "doc_id", k, r)
  }

  /** Write all ten tables for one seed into `dir/<table>.parquet`.
    * Seed ≥ 0: the hostile VALUE profile (NULLs, ties, unicode, skew).
    * Seed in [-99, -1]: the DEGENERATE CARDINALITY profile — per-table
    * variants rotate with |seed| (|seed| and |seed|+1 and |seed|+2
    * together cover every variant of every table).
    * Seed ≤ -100: the BAD-KEY INGEST profile — the hostile corpus for
    * base seed |seed|-100, with documents/embeddings/events primary keys
    * corrupted (NULL, duplicate-id-different-content, full-row dupes). */
  def write(spark: SparkSession, dir: String, seed: Long): Unit = {
    val r = new Random(seed)
    if (seed <= -100) {
      val base = new Random(-seed - 100)
      val nCust = 400; val nParts = 250; val nSupp = 60
      val tables = Seq(
        "region" -> region(spark, base),
        "nation" -> nation(spark, base),
        "supplier" -> supplier(spark, base, nSupp),
        "customer" -> customer(spark, base, nCust),
        "part" -> part(spark, base, nParts),
        "orders" -> orders(spark, base, 1200, nCust),
        "lineitem" -> lineitem(spark, base, 4000, 1200, nParts, nSupp),
        "events" -> corruptKeys(spark, events(spark, base, 4000),
          "event_id", r, nNull = 80, nDupDiff = 120, nDupRow = 60),
        "documents" -> corruptKeys(spark, documents(spark, base, 320),
          "doc_id", r, nNull = 8, nDupDiff = 12, nDupRow = 6),
        "embeddings" -> corruptKeys(spark, embeddings(spark, base, 240),
          "vec_id", r, nNull = 6, nDupDiff = 9, nDupRow = 5))
      writeTables(dir, tables)
      return
    }
    if (seed < 0) {
      val v = (-seed).toInt
      val nCust = 104 // degCustomer row count (fixed group design)
      val tables = Seq(
        "region" -> region(spark, r),
        "nation" -> nation(spark, r),
        "supplier" -> degSupplier(spark, r, v),
        "customer" -> degCustomer(spark, r),
        "part" -> degPart(spark, r, v + 1),
        "orders" -> degOrders(spark, r, v + 2, nCust),
        "lineitem" -> degLineitem(spark, r, v, 250, 60),
        "events" -> degEvents(spark, r, v + 1),
        "documents" -> degDocuments(spark, r, v + 2),
        "embeddings" -> degEmbeddings(spark, r, v))
      writeTables(dir, tables)
      return
    }
    val nCust = 400; val nParts = 250; val nSupp = 60
    val tables = Seq(
      "region" -> region(spark, r),
      "nation" -> nation(spark, r),
      "supplier" -> supplier(spark, r, nSupp),
      "customer" -> customer(spark, r, nCust),
      "part" -> part(spark, r, nParts),
      "orders" -> orders(spark, r, 1200, nCust),
      "lineitem" -> lineitem(spark, r, 4000, 1200, nParts, nSupp),
      "events" -> events(spark, r, 4000),
      "documents" -> documents(spark, r, 320),
      "embeddings" -> embeddings(spark, r, 240))
    writeTables(dir, tables)
  }

  // single-FILE parquet per table (the fixture's exact layout — the
  // DuckDB side of the harness reads the same path string as Spark)
  private def writeTables(dir: String,
      tables: Seq[(String, org.apache.spark.sql.DataFrame)]): Unit =
    tables.foreach { case (name, df) =>
      val tmp = s"$dir/__tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file written for $name"))
      val dest = new java.io.File(s"$dir/$name.parquet")
      if (dest.exists()) dest.delete()
      java.nio.file.Files.move(part.toPath, dest.toPath)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
}
