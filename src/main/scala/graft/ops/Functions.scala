package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StringType, TimestampType}

import graft.engine.{Etl, Transforms}
import graft.engine.Transforms.{ConcatLit, DatePart, Lower, Upper}

/** Scalar-function families (SURVEY §2.B "Scalar functions"), including the
  * reference-implemented transforms R7–R12 routed through the `engine/` layer
  * so the parity code (string coercion, 1-based month, non-date no-op —
  * reference ETLProcess.java:528-567) is exercised by the oracle gate.
  *
  * Everything here is a Catalyst expression — whole-stage codegen, no UDFs,
  * so at 100 TB these run inside the scan stage with zero extra shuffles.
  */
object Functions {

  // project_rename — R7 parity via Etl.mapColumns (unmapped columns dropped,
  // PKs must be mapped; reference ETLProcess.java:313-345).
  private val projectRename = Op("project_rename",
    """SELECT c_custkey AS id, c_name AS full_name, c_acctbal AS balance
      |FROM customer ORDER BY id""".stripMargin) { (s, d) =>
    Etl(t(s, d, "customer"))
      .mapColumns(
        Seq("c_custkey" -> "id", "c_name" -> "full_name", "c_acctbal" -> "balance"),
        destPks = Seq("id"))
      .result.orderBy("id")
  }

  // fn_string — R8/R9/R11 via Transforms (toString coercion: ConcatLit on a
  // BIGINT column) + the delegated trim/substring/split/regexp surface.
  private val fnString = Op("fn_string",
    """SELECT c_custkey,
      |  upper(c_name) AS name_up, lower(c_mktsegment) AS seg_lo,
      |  CAST(c_custkey AS VARCHAR) || '_x' AS key_tag,
      |  trim('  pad  ') AS trimmed,
      |  substr(c_name, 1, 8) AS name_head,
      |  array_to_string(string_split(c_name, '#'), '|') AS name_parts,
      |  regexp_extract(c_name, '([0-9]+)', 1) AS name_num,
      |  length(c_name) AS name_len,
      |  replace(c_mktsegment, 'A', '@') AS seg_repl
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = t(s, d, "customer")
    c.select(
        col("c_custkey"),
        Transforms(Upper, col("c_name"), StringType).as("name_up"),
        Transforms(Lower, col("c_mktsegment"), StringType).as("seg_lo"),
        Transforms(ConcatLit("_x"), col("c_custkey"), LongType).as("key_tag"),
        trim(lit("  pad  ")).as("trimmed"),
        substring(col("c_name"), 1, 8).as("name_head"),
        array_join(split(col("c_name"), "#"), "|").as("name_parts"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_num"),
        length(col("c_name")).as("name_len"),
        regexp_replace(col("c_mktsegment"), "A", "@").as("seg_repl"))
      .orderBy("c_custkey")
  }

  // fn_date — R10 parity: DatePart with the reference's Spanish part names
  // (case-insensitive per ETLProcess.java:555; month 1-based per :559;
  // unknown part and non-date input are no-ops per :564-565/:548-550).
  private val fnDate = Op("fn_date",
    """SELECT o_orderkey,
      |  EXTRACT(YEAR FROM o_orderdate) AS y, EXTRACT(MONTH FROM o_orderdate) AS m,
      |  EXTRACT(DAY FROM o_orderdate) AS dom, EXTRACT(HOUR FROM o_orderdate) AS h,
      |  o_orderstatus AS status_noop,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val o = t(s, d, "orders")
    val dp = (part: String) => Transforms(DatePart(part), col("o_orderdate"), TimestampType)
    o.select(
        col("o_orderkey"),
        dp("Año").cast("long").as("y"),
        dp("mes").cast("long").as("m"),
        dp("DÍA").cast("long").as("dom"),
        dp("hora").cast("long").as("h"),
        // non-date input → no-op passthrough (reference :548-550)
        Transforms(DatePart("año"), col("o_orderstatus"), StringType).as("status_noop"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate")).as("days_to_98"))
      .orderBy("o_orderkey")
  }

  // fn_math — round via DECIMAL so HALF_UP matches on both engines; sqrt is
  // IEEE-correctly-rounded so doubles agree bit-for-bit.
  private val fnMath = Op("fn_math",
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_discount - 0.05) AS disc_dev,
      |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,4)), 1) AS DOUBLE) AS price_r1,
      |  CAST(floor(l_quantity) AS BIGINT) AS q_floor,
      |  CAST(ceil(l_quantity) AS BIGINT) AS q_ceil,
      |  CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END AS q_class,
      |  l_orderkey % 7 AS key_mod,
      |  sqrt(l_quantity) AS q_sqrt
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val li = t(s, d, "lineitem")
    li.select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        round(col("l_extendedprice").cast(DecimalType(18, 4)), 1)
          .cast("double").as("price_r1"),
        floor(col("l_quantity")).as("q_floor"),
        ceil(col("l_quantity")).as("q_ceil"),
        when(col("l_quantity") > 25, "big").otherwise("small").as("q_class"),
        (col("l_orderkey") % 7).as("key_mod"),
        sqrt(col("l_quantity")).as("q_sqrt"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // fn_array — element access + exact-decimal fold over ArrayType(FloatType).
  // `aggregate` keeps the fold inside Catalyst (no UDF); decimal accumulator
  // makes the sum order-independent and bit-identical to the oracle.
  private val fnArray = Op("fn_array",
    """SELECT vec_id,
      |  len(embedding) AS dim,
      |  CAST(embedding[1] AS DOUBLE) AS first_v,
      |  CAST(list_aggregate(list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(20,7))), 'sum') AS DOUBLE) AS sum_v,
      |  CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS min_v,
      |  CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS max_v
      |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = t(s, d, "embeddings")
    e.select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        // float results widen to double on BOTH sides (exact) so the compare
        // sees identical float64 bits instead of engine-specific float32 repr.
        // try_element_at: DuckDB list indexing yields NULL out-of-bounds,
        // ANSI element_at THROWS — the try_ form matches the oracle and
        // keeps a malformed (short/empty) array from killing the job
        try_element_at(col("embedding"), lit(1)).cast("double").as("first_v"),
        aggregate(
          transform(col("embedding"), x => x.cast(DecimalType(20, 7))),
          lit(0).cast(DecimalType(30, 7)),
          (acc, x) => (acc + x).cast(DecimalType(30, 7))).cast("double").as("sum_v"),
        array_min(col("embedding")).cast("double").as("min_v"),
        array_max(col("embedding")).cast("double").as("max_v"))
      .orderBy("vec_id")
  }

  // fn_map_json — parse events.props with an explicit schema (from_json) and
  // a path extract (get_json_object). Schema'd parse beats string probing at
  // scale: one pass, codegen'd, null on malformed.
  private val fnMapJson = Op("fn_map_json",
    """SELECT event_id,
      |  CAST(json_extract(props, '$.k') AS INT) AS k,
      |  CAST(json_extract(props, '$.k') AS INT) AS k2
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    // exchange (r13): both JSON parses ran in the one-file scan's single
    // task, twice over (the final sort's range-sampling job re-executes the
    // projection) — measured 2 × ~0.55 s single-task at sf0.1. Post-
    // exchange the parse is shuffle-wide and the sampling job re-reads the
    // exchange's shuffle files instead of re-parsing.
    exchange(t(s, d, "events").select("event_id", "props"))
      .select(
        col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"),
        get_json_object(col("props"), "$.k").cast("int").as("k2"))
      .orderBy("event_id")
  }

  // fn_cast_null — casts + coalesce/nullif (R12 null-passthrough parity).
  private val fnCastNull = Op("fn_cast_null",
    """SELECT o_orderkey,
      |  nullif(o_orderstatus, 'F') AS status_n,
      |  coalesce(nullif(o_orderstatus, 'F'), 'X') AS status_x,
      |  CAST(o_orderkey AS VARCHAR) AS key_str,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_2dp,
      |  CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val o = t(s, d, "orders")
    o.select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("F")).as("status_n"),
        coalesce(nullif(col("o_orderstatus"), lit("F")), lit("X")).as("status_x"),
        col("o_orderkey").cast("string").as("key_str"),
        col("o_totalprice").cast(DecimalType(18, 2)).cast("double").as("price_2dp"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("prio_num"))
      .orderBy("o_orderkey")
  }

  // fn_explode — the generator/UDTF surface (lateral view): split each
  // document into one row per token with its position. Generate is a
  // narrow op (no shuffle); only the final presentation sort shuffles.
  private val fnExplode = Op("fn_explode",
    """SELECT doc_id, pos, tok FROM (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |    generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
      |  FROM documents)
      |WHERE doc_id <= 50 ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
    t(s, d, "documents").filter(col("doc_id") <= 50)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select("doc_id", "pos", "tok")
      .orderBy("doc_id", "pos")
  }

  // fn_bitwise — the bit-manipulation surface (masks, shifts, popcount) the
  // hash/sketch ops rely on, exposed as its own verified family.
  private val fnBitwise = Op("fn_bitwise",
    """SELECT o_orderkey,
      |  o_orderkey & 255 AS lo_byte,
      |  o_orderkey | 4096 AS with_flag,
      |  xor(o_orderkey, 21845) AS xored,
      |  o_orderkey << 2 AS shl2,
      |  o_orderkey >> 3 AS shr3,
      |  bit_count(o_orderkey) AS pop
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val k = col("o_orderkey")
    t(s, d, "orders").select(
        k,
        k.bitwiseAND(255).as("lo_byte"),
        k.bitwiseOR(4096).as("with_flag"),
        k.bitwiseXOR(21845).as("xored"),
        shiftleft(k, 2).as("shl2"),
        shiftright(k, 3).as("shr3"),
        bit_count(k).as("pop"))
      .orderBy("o_orderkey")
  }

  // fn_timestamp_fmt — timestamp formatting + epoch conversions (the
  // other half of the fn_date surface): pattern-formatted strings and
  // millisecond epochs. Patterns differ per engine (JDK vs strftime), so
  // each side spells its own dialect of the SAME format; epoch_ms is
  // exact integer arithmetic on both.
  private val fnTimestampFmt = Op("fn_timestamp_fmt",
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS d_str,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_str,
      |  epoch_ms(o_orderdate) AS ts_ms
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val ts = col("o_orderdate")
    t(s, d, "orders").select(
        col("o_orderkey"),
        date_format(ts, "yyyy-MM-dd").as("d_str"),
        date_format(ts, "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        unix_millis(ts.cast("timestamp")).as("ts_ms"))
      .orderBy("o_orderkey")
  }

  // win_frame_time — time-RANGE window frame: per-customer trailing-30-day
  // revenue, ordered by order date. RANGE frames are peer-inclusive, so
  // the frame SET (all orders within [t-30d, t]) is partition-order
  // independent and the decimal sum is deterministic without a unique
  // tiebreak. Goes through spark.sql — interval RANGE bounds are
  // SQL-only surface (also the R2 raw-SQL parity path).
  private val winFrameTime = Op("win_frame_time",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate
      |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS trailing_30d
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS trailing_30d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)
  }

  // fn_try — error-safe expression surface (ANSI-adjacent): casts and
  // divisions that return NULL instead of failing the job. At 100 TB one
  // malformed row must not kill a 6-hour pipeline; try_* turns data errors
  // into per-row nulls a later audit query can count.
  // Cost note: a FAILING try_cast pays a caught-exception per row (the
  // error-class machinery formats a message and fills a stack trace —
  // measured ~7 µs/row here, and pri_bad fails on EVERY row by design, in
  // BOTH the range-sampling job and the main pass). `tryIntScreen` guards
  // the cast with a cheap regex accepting exactly the strings ANSI
  // string→int parses (optional ≤0x20 trim chars — UTF8String.trimAll's
  // set — optional sign, ASCII digits): a screen-rejected string is one
  // try_cast maps to NULL anyway, so results are identical and the
  // exception path survives only for overflow-length digit strings, which
  // the screen cannot exclude without re-implementing range checks.
  private val fnTry = Op("fn_try",
    """SELECT o_orderkey,
      |  TRY_CAST(o_orderpriority AS INTEGER) AS pri_bad,
      |  TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS pri_num,
      |  o_totalprice / nullif(o_orderkey % 3, 0) AS ratio_or_null
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    def tryInt(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(c.rlike("^[\\x00-\\x20]*[+-]?[0-9]+[\\x00-\\x20]*$"),
        c.try_cast("int"))
    t(s, d, "orders").select(
        col("o_orderkey"),
        tryInt(col("o_orderpriority")).as("pri_bad"),
        tryInt(substring(col("o_orderpriority"), 1, 1)).as("pri_num"),
        try_divide(col("o_totalprice"),
          nullif(col("o_orderkey") % 3, lit(0))).as("ratio_or_null"))
      .orderBy("o_orderkey")
  }

  // fn_variant — Spark 4's VARIANT type over the events JSON props:
  // parse_json keeps the document in a typed binary form, variant_get
  // extracts typed fields lazily — unlike from_json (fn_map_json) no
  // schema is declared up front, the semi-structured analog of
  // schema-on-read at 100 TB.
  private val fnVariant = Op("fn_variant",
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
      |  props IS NOT NULL AND json_valid(props) AS is_json
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    // exchange (r13): the fn_map_json pattern — the variant parses ran in
    // the one-file scan's single task, twice (sampling job + main pass)
    exchange(t(s, d, "events").select("event_id", "props"))
      .createOrReplaceTempView("events")
    s.sql(
      // coalesce: on INVALID json try_parse_json is null and the bare
      // comparison would yield NULL where DuckDB's json_valid says false.
      // try_parse_json in k_int too: a malformed props row must yield a
      // NULL field, not kill the job (the op's whole error-tolerance story).
      """SELECT event_id,
        |  variant_get(try_parse_json(props), '$.k', 'int') AS k_int,
        |  props IS NOT NULL
        |    AND coalesce(is_variant_null(try_parse_json(props)) = false, false) AS is_json
        |FROM events ORDER BY event_id""".stripMargin)
  }

  // fn_generate_series — date-spine generation via sequence+explode: one
  // literal row explodes into the series, then joins/aggregates run
  // distributed. This is the parallel-friendly series form (recursion —
  // recursive_cte — is inherently sequential per step).
  private val fnGenerateSeries = Op("fn_generate_series",
    """SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
      |                              TIMESTAMP '1995-03-01', INTERVAL 1 DAY)) AS d
      |ORDER BY d""".stripMargin) { (s, d) =>
    s.range(1)
      .select(explode(sequence(
        lit("1995-01-01").cast("timestamp"),
        lit("1995-03-01").cast("timestamp"),
        expr("INTERVAL 1 DAY"))).as("d"))
      .orderBy("d")
  }

  // fn_url — URL structural decomposition (parse_url): the per-domain
  // bookkeeping primitive of a crawl-derived corpus (domain quotas, host
  // dedup keys, query-param stripping all start from HOST/PATH/QUERY).
  // URLs are synthesized from the document columns so the op is
  // self-contained; the oracle reconstructs each component from the same
  // base columns — the components, not the parser, are the contract.
  // parse_url is a Catalyst expression: scan-stage codegen, no shuffle.
  private val fnUrl = Op("fn_url",
    // All fields are parsed from ONE assembled URL, so a NULL source/lang
    // voids the whole row (Spark concat is NULL-propagating): the oracle
    // mirrors that all-or-nothing contract with a shared guard — per-field
    // independence would diverge the moment any component is NULL
    // (NULL-fixture find).
    """WITH g AS (SELECT doc_id, source, lang,
      |  source IS NOT NULL AND lang IS NOT NULL AS ok FROM documents)
      |SELECT doc_id,
      |  CASE WHEN ok THEN 'https' END AS proto,
      |  CASE WHEN ok THEN source || '.example.org' END AS host,
      |  CASE WHEN ok THEN '/docs/' || CAST(doc_id AS VARCHAR) END AS path,
      |  CASE WHEN ok THEN 'lang=' || lang || '&v=1' END AS query,
      |  CASE WHEN ok THEN lang END AS qp_lang,
      |  CASE WHEN ok THEN 'top' END AS frag
      |FROM g ORDER BY doc_id""".stripMargin) { (s, d) =>
    val url = concat(
      lit("https://"), col("source"), lit(".example.org/docs/"),
      col("doc_id").cast(StringType),
      lit("?lang="), col("lang"), lit("&v=1#top"))
    t(s, d, "documents")
      .select(col("doc_id"), url.as("url"))
      .select(
        col("doc_id"),
        parse_url(col("url"), lit("PROTOCOL")).as("proto"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("lang")).as("qp_lang"),
        parse_url(col("url"), lit("REF")).as("frag"))
      .orderBy("doc_id")
  }

  // fn_mask — character-class data masking (`mask`): the display/export
  // redaction primitive (pii_redact is the pattern-level scrub; this is
  // the blanket character-class form for showing shapes without values).
  // Default mask keeps punctuation; the custom form collapses everything.
  // Scan-stage Catalyst expression; the oracle reproduces the class map
  // with regexp_replace chains.
  // Unicode classes, not [A-Z]: Spark's mask() classifies via
  // Character.isUpperCase/isLowerCase/isDigit (unicode-aware), so the
  // oracle chains must use \p{Lu}/\p{Ll}/\p{Nd} or an accented name
  // escapes the mask on one side only (found by the r11 unicode fixture).
  private val fnMask = Op("fn_mask",
    """SELECT c_custkey,
      |  regexp_replace(regexp_replace(regexp_replace(c_name,
      |    '\p{Lu}', 'X', 'g'), '\p{Ll}', 'x', 'g'), '\p{Nd}', 'n', 'g') AS name_masked,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(c_mktsegment,
      |    '\p{Lu}', '*', 'g'), '\p{Ll}', '*', 'g'), '\p{Nd}', '#', 'g'),
      |    '[^*#]', '-', 'g') AS seg_masked
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    t(s, d, "customer").select(
        col("c_custkey"),
        mask(col("c_name")).as("name_masked"),
        mask(col("c_mktsegment"), lit("*"), lit("*"), lit("#"), lit("-"))
          .as("seg_masked"))
      .orderBy("c_custkey")
  }

  // fn_digest — content integrity hashing (md5 + sha2-256, the digests
  // shard_manifest-style audit trails and content-addressed stores key
  // on) plus an AES encrypt→decrypt round trip (the at-rest column
  // protection path; GCM picks a random IV per row, so the CIPHERTEXT is
  // non-deterministic but the round trip is exact — which is why the
  // verified output is the decrypted text, not the ciphertext). All
  // scan-stage expressions; the oracle computes the same digests and
  // passes the text through where the crypto must round-trip to.
  private val fnDigest = Op("fn_digest",
    """SELECT doc_id,
      |  md5(text) AS h_md5,
      |  sha256(text) AS h_sha256,
      |  text AS aes_roundtrip
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    t(s, d, "documents").select(
        col("doc_id"),
        md5(col("text")).as("h_md5"),
        sha2(col("text"), 256).as("h_sha256"),
        expr("cast(aes_decrypt(aes_encrypt(text, '0123456789abcdef')," +
          " '0123456789abcdef') as string)").as("aes_roundtrip"))
      .orderBy("doc_id")
  }

  // fn_encode — binary-to-text transport encodings (base64 + hex), both
  // directions: the framing layer under every manifest/interchange format
  // (fn_digest makes the bytes; this op ships them through text-only
  // channels). Spark's base64/hex/unbase64/unhex are RFC 4648 / plain
  // nibble codecs over the UTF-8 bytes, bit-identical to DuckDB's
  // to_base64/hex/from_base64 — the oracle asserts that equivalence plus
  // both decode round trips. Pure scan-stage expressions.
  private val fnEncode = Op("fn_encode",
    """SELECT c_custkey,
      |  to_base64(encode(c_name)) AS b64,
      |  hex(c_name) AS hx,
      |  decode(from_base64(to_base64(encode(c_name)))) AS b64_rt,
      |  c_name AS hex_rt,
      |  hex(c_custkey) AS hx_int
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    t(s, d, "customer").select(
        col("c_custkey"),
        base64(col("c_name")).as("b64"),
        hex(col("c_name")).as("hx"),
        unbase64(base64(col("c_name"))).cast("string").as("b64_rt"),
        unhex(hex(col("c_name"))).cast("string").as("hex_rt"),
        hex(col("c_custkey")).as("hx_int"))
      .orderBy("c_custkey")
  }

  // --------------------------------------------------------------------
  // fn_json_roundtrip — the nested-document bridge: relational lines are
  // NESTED into one JSON document per order (header fields + an array of
  // line structs, deterministically ordered), serialized with to_json,
  // parsed back with an explicit schema, and FLATTENED (explode) to the
  // original rows. Event payloads / API exports ship exactly this shape;
  // the op proves both directions of the bridge in one query.
  //
  // The oracle is the IDENTITY (the same rows straight off lineitem) —
  // deliberately: emitting JSON text would make the check depend on both
  // engines' serializer quirks (key order, float formatting), while
  // nest→serialize→parse→flatten == id proves the whole bridge is
  // lossless with no cross-engine formatting hazard. Quantities travel
  // as exact DECIMAL so the text round trip cannot drift.
  //
  // Scale shape: one keyed aggregate (collect_list per order — bounded
  // by lines-per-order), then pure scan-stage serialize/parse/explode.
  // --------------------------------------------------------------------
  private val fnJsonRoundtrip = Op("fn_json_roundtrip",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS qty,
      |  l_returnflag
      |FROM lineitem WHERE l_orderkey <= 2000
      |ORDER BY l_orderkey, l_linenumber, qty, l_returnflag""".stripMargin) { (s, d) =>
    val docSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "l_orderkey BIGINT, lines ARRAY<STRUCT<ln: INT, qty: DECIMAL(18,2), rf: STRING>>")
    val doc = t(s, d, "lineitem").filter(col("l_orderkey") <= 2000)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast(DecimalType(18, 2)).as("qty"), col("l_returnflag"))
      .groupBy("l_orderkey")
      // deterministic array order: the fixture's (orderkey, linenumber)
      // is NOT unique (see dq_check), so the sort key includes the payload
      .agg(array_sort(collect_list(struct(
        col("l_linenumber").as("ln"), col("qty"), col("l_returnflag").as("rf"))))
        .as("lines"))
      .select(to_json(struct(col("l_orderkey"), col("lines"))).as("doc"))
    doc.select(from_json(col("doc"), docSchema).as("d"))
      .select(col("d.l_orderkey"), explode(col("d.lines")).as("line"))
      .select(col("l_orderkey"), col("line.ln").as("l_linenumber"),
        col("line.qty").cast("double").as("qty"), col("line.rf").as("l_returnflag"))
      .orderBy("l_orderkey", "l_linenumber", "qty", "l_returnflag")
  }

  val ops: Seq[Op] = Seq(
    projectRename, fnString, fnDate, fnMath, fnArray, fnMapJson, fnCastNull,
    fnExplode, fnBitwise, fnTimestampFmt, winFrameTime, fnTry,
    fnVariant, fnGenerateSeries, fnUrl, fnMask, fnDigest, fnEncode,
    fnJsonRoundtrip,
  )
}
