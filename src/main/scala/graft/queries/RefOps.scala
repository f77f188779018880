package graft.queries

import graft.Q
import graft.engine.{Snapshot, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Queries re-expressing the reference pipelines' own data operations
  * (SURVEY.md §2A) over the fixture tables.
  */
object RefOps {

  /** A8/A9: negative line filters — the `pg_restore -l | grep -v` TOC
    * filter (backup.sh:374) and sed `/…/d` deletions
    * (psql-backups.sh:146-148), as NOT-contains / NOT-regexp predicates. */
  val lineFilter: Q = Q(
    "q_ref_line_filter",
    (s, d) =>
      Tables.documents(s, d)
        .filter(!col("text").contains("slow")
          && !col("text").rlike("fast (join|scan)"))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id"),
    Some("""SELECT doc_id, source, n_chars
    FROM documents
    WHERE NOT contains(text, 'slow')
      AND NOT regexp_matches(text, 'fast (join|scan)')
    ORDER BY doc_id"""))

  /** A10: positive existence test (`grep -q`, backup.sh:124-126) — per
    * source, how many documents match and whether any does. */
  val grepExists: Q = Q(
    "q_ref_grep_exists",
    (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("text").contains("slow"), 1L).otherwise(0L))
            .as("n_matching"))
        .withColumn("any_match", col("n_matching") > 0)
        .orderBy("source"),
    Some("""SELECT source, count(*) AS n_docs,
      CAST(sum(CASE WHEN contains(text, 'slow') THEN 1 ELSE 0 END)
        AS BIGINT) AS n_matching,
      sum(CASE WHEN contains(text, 'slow') THEN 1 ELSE 0 END) > 0 AS any_match
    FROM documents GROUP BY source ORDER BY source"""))

  /** A12/A13: delimiter normalization + numeric token extraction — the
    * `sed s/\r/\n/ | csvcut | grep -o [0-9]*` task-id parse
    * (backup.sh:130). */
  val extractId: Q = Q(
    "q_ref_extract_id",
    (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          regexp_replace(col("props"), "[{}\" ]", "").as("normalized"),
          regexp_extract(col("props"), "[0-9]+", 0).cast("long").as("task_id"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
      regexp_replace(props, '[{}" ]', '', 'g') AS normalized,
      CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS task_id
    FROM events ORDER BY event_id"""))

  /** A20/A21: length-guarded identifier truncation (≥30 → 29 chars,
    * psql-backups.sh:56-62) + name concatenation (backup.sh:75-76). */
  val identifier: Q = Q(
    "q_ref_identifier",
    (s, d) => {
      val svc = concat(col("c_name"), lit("-"), col("c_mktsegment"))
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          svc.as("service_name"),
          when(length(svc) >= 30, substring(svc, 1, 29)).otherwise(svc)
            .as("trimmed_name"),
          concat_ws("-", lit("pg"),
            when(length(svc) >= 30, substring(svc, 1, 29)).otherwise(svc),
            lit("auto-restore")).as("restore_instance"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey,
      c_name || '-' || c_mktsegment AS service_name,
      CASE WHEN length(c_name || '-' || c_mktsegment) >= 30
        THEN substr(c_name || '-' || c_mktsegment, 1, 29)
        ELSE c_name || '-' || c_mktsegment END AS trimmed_name,
      concat_ws('-', 'pg',
        CASE WHEN length(c_name || '-' || c_mktsegment) >= 30
          THEN substr(c_name || '-' || c_mktsegment, 1, 29)
          ELSE c_name || '-' || c_mktsegment END,
        'auto-restore') AS restore_instance
    FROM customer ORDER BY c_custkey"""))

  /** A18/A19: version parse + compare + engine dispatch — the
    * `${DB_ENGINE_VERSION%%.*}` major extraction and ≥10 branching
    * (backup.sh:172-178; psql-backups.sh:82-88). */
  val versionDispatch: Q = Q(
    "q_ref_version_dispatch",
    (s, d) =>
      Tables.part(s, d)
        .withColumn("ver",
          format_string("%d.%d", col("p_size") % 3 + 9, col("p_size")))
        .select(
          col("p_partkey"),
          col("ver"),
          split(col("ver"), "\\.").getItem(0).cast("long").as("major"),
          when(split(col("ver"), "\\.").getItem(0).cast("long") >= 10,
            lit("globals-only")).otherwise(lit("full-dump")).as("dump_mode"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
      printf('%d.%d', p_size % 3 + 9, p_size) AS ver,
      CAST(split_part(printf('%d.%d', p_size % 3 + 9, p_size), '.', 1)
        AS BIGINT) AS major,
      CASE WHEN CAST(split_part(printf('%d.%d', p_size % 3 + 9, p_size),
        '.', 1) AS BIGINT) >= 10
        THEN 'globals-only' ELSE 'full-dump' END AS dump_mode
    FROM part ORDER BY p_partkey"""))

  /** A14/A17: last-status selection (`tail -1` of the polled lifecycle
    * column, backup.sh:143-156) — latest event per user. */
  val statusLast: Q = Q(
    "q_ref_status_last",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("last_status"),
          col("ts").as("last_ts"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, event_type AS last_status, ts AS last_ts
    FROM (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
        row_number() OVER (PARTITION BY user_id
          ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1 ORDER BY user_id"""))

  /** A15: non-empty validation (`[ -s "$DUMP_FILE" ]`, backup.sh:215)
    * over every fixture table at once. */
  val nonemptyGuard: Q = Q(
    "q_ref_nonempty_guard",
    (s, d) => {
      val l = Tables.lineitem(s, d).agg(count(lit(1)).as("lineitem_rows"))
      val o = Tables.orders(s, d).agg(count(lit(1)).as("orders_rows"))
      val c = Tables.customer(s, d).agg(count(lit(1)).as("customer_rows"))
      l.crossJoin(o).crossJoin(c)
        .withColumn("all_nonempty",
          col("lineitem_rows") > 0 && col("orders_rows") > 0
            && col("customer_rows") > 0)
    },
    Some("""SELECT
      (SELECT count(*) FROM lineitem) AS lineitem_rows,
      (SELECT count(*) FROM orders) AS orders_rows,
      (SELECT count(*) FROM customer) AS customer_rows,
      (SELECT count(*) FROM lineitem) > 0
        AND (SELECT count(*) FROM orders) > 0
        AND (SELECT count(*) FROM customer) > 0 AS all_nonempty"""))

  /** A7: snapshot round-trip verification — write lineitem to a
    * throwaway parquet dir, restore, diff both ways with EXCEPT ALL
    * (backup.sh:264-299,372-376 strengthened to content equality). The
    * oracle states the postcondition: restore equals source exactly.
    *
    * CONTRACT NOTE: this is a pipeline JOB, not a lazy query —
    * *building* the returned DataFrame runs the snapshot write+restore
    * (idempotent: stable overwrite dir). A harness that constructs
    * queries without executing them will still perform the write. */
  val roundTrip: Q = Q(
    "q_ref_round_trip",
    (s, d) => {
      // NOT widened (earlier r18 draft did): the A/B measured the
      // round trip 3.26→2.20 s without the fan-out — the snapshot
      // write + digests are I/O-shaped, so an extra full-row exchange
      // only added bytes in flight, and widening the write also
      // changed the snapshot to 32 tiny files (guide §6: small-files
      // tax on the restore scan).
      val src = Tables.lineitem(s, d)
      // stable overwrite target — repeated Verify/Bench runs reuse it
      // instead of accumulating temp copies
      val dest = s"${sys.props("java.io.tmpdir")}/graft_snapshot/lineitem"
      val rt = Snapshot.roundTripVerify(s, src, dest)
      import s.implicits._
      Seq((rt.originalRows, rt.restoredRows, rt.missing, rt.extra, rt.verified))
        .toDF("original_rows", "restored_rows", "n_missing", "n_extra",
          "verified")
    },
    Some("""SELECT
      (SELECT count(*) FROM lineitem) AS original_rows,
      (SELECT count(*) FROM lineitem) AS restored_rows,
      CAST(0 AS BIGINT) AS n_missing,
      CAST(0 AS BIGINT) AS n_extra,
      true AS verified"""))

  /** B2/A12: CSV as a first-class source — the engine form of the
    * `sqlcmd -s ',' | csvcut` tool-output parse (backup.sh:130). Events
    * project to CSV (header, explicit schema), re-ingest through the
    * csv reader, and aggregate; the oracle states the round-trip
    * postcondition directly over the original parquet. Int/string
    * columns only — exact through text.
    *
    * CONTRACT NOTE: like q_ref_round_trip, building this DataFrame
    * executes the CSV export job (idempotent overwrite of a stable
    * tmp dir) before returning the lazy re-read. */
  val csvSource: Q = Q(
    "q_ref_csv_source",
    (s, d) => {
      val dest = s"${sys.props("java.io.tmpdir")}/graft_csv/events_csv"
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .write.mode("overwrite").option("header", "true").csv(dest)
      s.read
        .schema("event_id LONG, user_id LONG, event_type STRING, k LONG")
        .option("header", "true")
        .csv(dest)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
      CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        AS BIGINT) AS sum_k,
      count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type"""))

  /** B2c: ORC as a source/sink format — the second columnar format a
    * lake engine must read (Spark's built-in ORC datasource; predicate
    * pushdown and column pruning work as with parquet). Documents
    * project to ORC, re-ingest, and aggregate; the oracle states the
    * round-trip postcondition over the original parquet.
    *
    * CONTRACT NOTE: like q_ref_csv_source, building this DataFrame
    * executes the ORC export job (idempotent overwrite, stable tmp dir). */
  val orcSource: Q = Q(
    "q_ref_orc_source",
    (s, d) => {
      val dest = s"${sys.props("java.io.tmpdir")}/graft_orc/documents_orc"
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").orc(dest)
      s.read.orc(dest)
        .where(col("n_chars") >= 100)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang", "source")
    },
    Some("""SELECT lang, source, count(*) AS n,
      CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE n_chars >= 100
    GROUP BY lang, source ORDER BY lang, source"""))

  /** B2d: JSON-lines as a source/sink format — completes the built-in
    * format family (parquet/ORC/CSV/JSON). Orders project to JSONL
    * (timestamps as ISO strings for text-format determinism),
    * re-ingest with an explicit schema (schema inference is a second
    * full scan — never at 100 TB), and aggregate; the oracle states
    * the round-trip postcondition over the original parquet.
    *
    * CONTRACT NOTE: like q_ref_csv_source, building this DataFrame
    * executes the JSON export job (idempotent overwrite, stable tmp
    * dir). */
  val jsonSource: Q = Q(
    "q_ref_json_source",
    (s, d) => {
      val dest = s"${sys.props("java.io.tmpdir")}/graft_json/orders_json"
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_day"))
        .write.mode("overwrite").json(dest)
      s.read
        .schema("o_orderkey LONG, o_custkey LONG, o_orderstatus STRING," +
          " o_totalprice DOUBLE, o_day STRING")
        .json(dest)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          Det.dsum(col("o_totalprice"), 2).as("sum_price"),
          countDistinct(col("o_day")).as("n_days"))
        .orderBy("o_orderstatus")
    },
    Some(s"""SELECT o_orderstatus, count(*) AS n,
      ${Det.sqlSum("o_totalprice", 2)} AS sum_price,
      count(DISTINCT strftime(o_orderdate, '%Y-%m-%d')) AS n_days
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** EXT: XML as a source/sink format — completes the built-in text
    * format family (CSV `q_ref_csv_source`, JSONL `q_ref_json_source`,
    * ORC `q_ref_orc_source`) with Spark 4's native XML datasource (the
    * spark-xml package merged into core). Customer rows project to
    * integer/enum columns only (XML is a text format: the established
    * text-round-trip rule is integers and strings, no float re-parse
    * surface), export as one `<row>` element per record, re-ingest
    * with an explicit schema (inference = a second full scan — never
    * at 100 TB), and aggregate; the oracle states the round-trip
    * postcondition over the original parquet.
    *
    * CONTRACT NOTE: like q_ref_csv_source, building this DataFrame
    * executes the XML export job (idempotent overwrite, stable tmp
    * dir). Bench runs it in the I/O-last block. */
  val xmlSource: Q = Q(
    "q_ref_xml_source",
    (s, d) => {
      val dest = s"${sys.props("java.io.tmpdir")}/graft_xml/customer_xml"
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
        .write.mode("overwrite").option("rowTag", "row").xml(dest)
      s.read
        .schema("c_custkey LONG, c_nationkey INT, c_mktsegment STRING")
        .option("rowTag", "row")
        .xml(dest)
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("c_nationkey")).as("n_nations"),
          sum(col("c_custkey")).as("sum_key"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS n,
      count(DISTINCT c_nationkey) AS n_nations,
      CAST(sum(c_custkey) AS BIGINT) AS sum_key
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** EXT: incremental snapshot diff as a declared query — classify the
    * delta between two snapshot generations into inserts / deletes /
    * unchanged (multiset semantics, engine.Snapshot.incremental's
    * contract). The "current" generation is a deterministic mutation of
    * lineitem: every l_orderkey % 7 == 0 row deleted, every
    * l_orderkey % 13 == 0 survivor re-priced (update = delete+insert).
    * This declared form reduces the multiset diff to ONE shuffle: union
    * the generations with a signed weight (+1 prev, −1 cur), group by
    * a 128-bit row digest (two independently-seeded xxhash64 over every
    * column), and read inserts/deletes off the sign of the summed
    * weight (a group with d < 0 has −d copies only in cur = inserted;
    * d > 0 means d copies only in prev = deleted). Grouping on the
    * digest instead of the full row shuffles ~24 bytes/row instead of
    * the whole ~100-byte row — at 100 TB that is the difference between
    * shuffling 200 TB and ~50 TB — and identical rows collapse under
    * the digest exactly as they would under the row. The salts are
    * PREPENDED (first fold), not appended: xxhash64 folds columns
    * left-to-right using the running hash as the next seed, so an
    * appended salt would leave both chains with the identical 64-bit
    * internal state over the row columns — any state collision would
    * collide h1 and h2 together, making the effective odds ~n²/2^65
    * (≈3 expected silent collisions at 10¹⁰ rows). With the salt first
    * the two chains diverge from fold one and behave as independent
    * 64-bit digests: odds for two DIFFERENT rows sharing both hashes
    * ~n²/2^129, ~10⁻²² at 10¹⁰ rows. (Caveat: Spark's hash functions
    * skip NULL columns, so rows differing only in null placement would
    * collide — benign for the null-free lineitem schema; schemas with
    * nullable columns should add an isnull-bitmask column to rowCols.)
    * Two EXCEPT ALL legs — the naive shape — shuffle both
    * generations twice and carry full rows; this carries digests once.
    * The engine's digest fast path (Snapshot.verifyContent) still
    * answers the cheaper "did anything change" question with scalar
    * aggs only. */
  val incremental: Q = Q(
    "q_ref_incremental",
    (s, d) => {
      // r19 refinement (guide §2.3 "aggregate before you shuffle",
      // taken to its algebraic end): both generations come off ONE
      // scan, so each input row's (+1, prev-digest) and (−1,
      // cur-digest) contributions are visible TOGETHER map-side — and
      // a ±1 pair on the SAME digest cancels inside its group sum no
      // matter what else shares the digest (group d is a sum;
      // removing a zero-sum pair changes nothing). Unchanged rows
      // (the mass) therefore never reach the exchange: only deleted
      // rows (+1) and repriced rows (+1 prev, −1 cur) ship — the r18
      // shape's 4.49 GB digest shuffle at sf20 (two full-row scan
      // branches, 240M rows, partial aggregation combining nothing
      // because digests are unique) drops to the ~27% of rows whose
      // digest actually changed. n_unchanged folds out of the group
      // algebra as |cur| − n_inserted, with |cur| a column-pruned
      // scalar count. A repriced row whose digests coincide cancels
      // here exactly as its d = 0 group contributed nothing there.
      val prev = Tables.lineitem(s, d)
      val rowCols = prev.columns.toSeq.map(col)
      val curPrice = when(col("l_orderkey") % 13 === 0,
        col("l_extendedprice") + lit(1.0))
        .otherwise(col("l_extendedprice"))
      val curCols = prev.columns.toSeq.map { c =>
        if (c == "l_extendedprice") curPrice else col(c) }
      val survives = col("l_orderkey") % 7 =!= 0
      val contrib = struct(col("h1p").as("h1"), col("h2p").as("h2"),
        lit(1L).as("w"))
      val contribCur = struct(col("h1c").as("h1"), col("h2c").as("h2"),
        lit(-1L).as("w"))
      val changed = prev.select(
          xxhash64(lit(1L) +: rowCols: _*).as("h1p"),
          xxhash64(lit(2L) +: rowCols: _*).as("h2p"),
          when(survives, xxhash64(lit(1L) +: curCols: _*)).as("h1c"),
          when(survives, xxhash64(lit(2L) +: curCols: _*)).as("h2c"))
        .where(col("h1c").isNull ||
          col("h1p") =!= col("h1c") || col("h2p") =!= col("h2c"))
        .select(explode(
          when(col("h1c").isNull, array(contrib))
            .otherwise(array(contrib, contribCur))).as("x"))
        .select(col("x.h1").as("h1"), col("x.h2").as("h2"),
          col("x.w").as("w"))
      val diff = changed.groupBy(col("h1"), col("h2"))
        .agg(sum(col("w")).as("d"))
        .agg(
          sum(when(col("d") < 0, -col("d")).otherwise(0L))
            .cast("long").as("n_inserted"),
          sum(when(col("d") > 0, col("d")).otherwise(0L))
            .cast("long").as("n_deleted"))
      val curCount = prev.where(survives).agg(count(lit(1)).as("n_cur"))
      diff.crossJoin(curCount)
        .select(col("n_inserted"), col("n_deleted"),
          (col("n_cur") - col("n_inserted")).cast("long")
            .as("n_unchanged"))
    },
    Some("""WITH cur AS (
      SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        CASE WHEN l_orderkey % 13 = 0 THEN l_extendedprice + 1.0
          ELSE l_extendedprice END AS l_extendedprice,
        l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
      FROM lineitem WHERE l_orderkey % 7 != 0)
    SELECT
      (SELECT count(*) FROM (SELECT * FROM cur EXCEPT ALL
        SELECT * FROM lineitem)) AS n_inserted,
      (SELECT count(*) FROM (SELECT * FROM lineitem EXCEPT ALL
        SELECT * FROM cur)) AS n_deleted,
      (SELECT count(*) FROM cur) -
        (SELECT count(*) FROM (SELECT * FROM cur EXCEPT ALL
          SELECT * FROM lineitem)) AS n_unchanged"""))

  /** EXT: MERGE INTO — apply an upsert/delete/insert changelog batch to
    * a snapshot (engine.Snapshot.applyChangelog), the maintenance op
    * between full dumps. The changelog is derived deterministically
    * from orders itself: keys %7==0 are updated (status → 'M'), keys
    * %13==0 deleted (wins over update), and keys %31==0 re-inserted
    * under a fresh negative key (the pure-insert path). At 100 TB the
    * base never shuffles: untouched rows pass a broadcast anti-join on
    * touched keys and upserts union in shuffle-free (MergeSpec pins
    * both plan properties). */
  val mergeUpsert: Q = Q(
    "q_ref_merge_upsert",
    (s, d) => {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate")
      val base = Tables.orders(s, d).select(cols.map(col): _*)
      val mods = base
        .where(col("o_orderkey") % 7 === 0 || col("o_orderkey") % 13 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 13 === 0, col("o_orderstatus"))
            .otherwise(lit("M")).as("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"),
          when(col("o_orderkey") % 13 === 0, lit("D"))
            .otherwise(lit("U")).as("op"))
      val inserts = base
        .where(col("o_orderkey") % 31 === 0)
        .select((-col("o_orderkey")).as("o_orderkey"), col("o_custkey"),
          lit("I").as("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), lit("U").as("op"))
      Snapshot.applyChangelog(base, mods.unionByName(inserts),
          Seq("o_orderkey"), "op")
        .orderBy("o_orderkey")
    },
    Some("""WITH chg AS (
      SELECT o_orderkey, o_custkey,
        CASE WHEN o_orderkey % 13 = 0 THEN o_orderstatus ELSE 'M' END
          AS o_orderstatus,
        o_totalprice, o_orderdate,
        CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op
      FROM orders WHERE o_orderkey % 7 = 0 OR o_orderkey % 13 = 0
      UNION ALL
      SELECT -o_orderkey, o_custkey, 'I', o_totalprice, o_orderdate, 'U'
      FROM orders WHERE o_orderkey % 31 = 0)
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
    FROM (
      SELECT b.o_orderkey, b.o_custkey, b.o_orderstatus, b.o_totalprice,
        b.o_orderdate
      FROM orders b LEFT JOIN chg c ON b.o_orderkey = c.o_orderkey
      WHERE c.o_orderkey IS NULL
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        o_orderdate
      FROM chg WHERE op = 'U')
    ORDER BY o_orderkey"""))

  /** A6 counterpart: bad-record QUARANTINE. The reference restores with
    * `pg_restore --exit-on-error` (backup.sh:375) — FAILFAST, the right
    * call for a transactional restore. At 100 TB of scraped input,
    * one malformed record aborting the job is the wrong trade, so the
    * engine's ingest twin is PERMISSIVE parsing with a corrupt-record
    * column: malformed rows keep flowing, tagged with their raw line
    * for a quarantine sink, and the good rows aggregate exactly
    * (decimal-domain sum). Corruption here is synthesized
    * deterministically (every 13th key's numeric field becomes "N/A"),
    * so the DuckDB oracle knows precisely which rows quarantine —
    * the parse path is real, the fixture is the contract. */
  val csvQuarantine: Q = Q(
    "q_ref_csv_quarantine",
    (s, d) => {
      val line = concat(
        col("c_custkey"), lit(","), col("c_name"), lit(","),
        when(col("c_custkey") % 13 === 3, lit("N/A"))
          .otherwise(col("c_acctbal").cast("string")))
      Tables.customer(s, d)
        .select(line.as("line"))
        .select(from_csv(col("line"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "k BIGINT, name STRING, bal DOUBLE, _bad STRING"),
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_bad")).as("r"))
        .select(col("r.k"), col("r.bal"), col("r._bad"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(when(col("_bad").isNull, 1)).as("n_good"),
          count(when(col("_bad").isNotNull, 1)).as("n_quarantined"),
          Det.dsum(when(col("_bad").isNull, col("bal")), 2)
            .as("good_bal_sum"))
    },
    Some(s"""SELECT count(*) AS n_rows,
      count(*) FILTER (WHERE c_custkey % 13 != 3) AS n_good,
      count(*) FILTER (WHERE c_custkey % 13 = 3) AS n_quarantined,
      CAST(sum(CAST(c_acctbal AS DECIMAL(28,2)))
        FILTER (WHERE c_custkey % 13 != 3) AS DOUBLE) AS good_bal_sum
    FROM customer"""))

  /** A1-INCREMENTAL as a declared, ORACLE-CHECKED query (r15): the
    * high-watermark JDBC extract in the correctness gate, not just
    * its spec. The Spark side seeds a LIVE embedded Derby database
    * from the customer fixture (key-capped at 20k rows — the protocol
    * demo is bounded; the ranged-parallel scale story is
    * [[graft.engine.JdbcExtract]] + JdbcExtractSpec), folds TWO
    * incremental generations — the second over rows that "arrive"
    * only after the first fold, exactly the daily shape — and reads
    * the union back through `readIncremental`. The oracle restates
    * the postcondition directly over the fixture (the
    * q_multimodal_decode pattern): the aggregates can only match
    * COUNT/SUM/COUNT-DISTINCT over customer if the two folds covered
    * every source row EXACTLY once — a missed range, a double-applied
    * fold, or a watermark ahead of published data all break the hash.
    * Exercised end-to-end per run: bounds discovery from the live
    * min, the derived watermark, the remote-pushed delta predicate,
    * and two atomic generation publishes.
    *
    * CONTRACT NOTE: like q_ref_csv_source, building this DataFrame
    * runs the extract job (fresh db + root per call, deleted at the
    * end; the 20k-row seed collect is the bounded harness side of the
    * live database, same class as TrainBpe's driver fit).
    *
    * MULTI-JVM NOTE (r16): the r15 harness used `jdbc:derby:memory:`,
    * which exists only in the DRIVER JVM — the local-cluster Verify
    * pass flushed out that every executor-side ranged read found no
    * database (and a writable FILE db is single-JVM too: db.lck).
    * The production shape is a network database every executor can
    * reach; the embedded stand-in for that is Derby's documented
    * read-only JAR subprotocol (`jdbc:derby:jar:(file)db`), which any
    * number of JVMs may boot concurrently. So the harness now seeds a
    * writable file db in the driver, shuts it down, and publishes an
    * immutable day-snapshot jar per fold — the extract reads ONLY
    * through the jar URLs, so every read path is executor-safe under
    * any master. */
  val jdbcIncremental: Q = Q(
    "q_ref_jdbc_incremental",
    (s, d) => {
      // Harness (Derby seed + two jar publishes) is built ONCE per
      // process per fixture (VERDICT r16: the per-call seed made this
      // a top-3 bench line that mostly measured DDL, not the engine);
      // the per-call body below is the engine path under test: two
      // incremental folds, the union read-back, the aggregate.
      val snap = JdbcHarness.forFixture(s, d)
      val tag = java.util.UUID.randomUUID().toString.take(8)
      val root =
        s"${sys.props("java.io.tmpdir")}/graft_jdbc_incr_extract/$tag"
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      try {
        // The jar dbs stay BOOTED for the process lifetime (the
        // harness's shutdown hook releases them with the tree): a
        // per-call shutdown here raced concurrent executions of this
        // query in one JVM — the first call's finally shut the
        // process-CACHED db down underneath the second call's
        // in-flight ranged extract (ADVICE r17). Boots are read-only
        // and bounded: two jar dbs per fixture, once per JVM.
        graft.engine.JdbcExtract.incremental(
          s, snap.day1Url, "CUST_LIVE", "ID", 4, root, props)
        graft.engine.JdbcExtract.incremental(
          s, snap.day2Url, "CUST_LIVE", "ID", 4, root, props)
        val out = graft.engine.JdbcExtract.readIncremental(s, root)
          .groupBy((col("ID") % 10).as("key_mod"))
          .agg(count(lit(1)).as("n"),
            sum(col("BAL")).as("sum_bal_cents"),
            countDistinct(col("ID")).as("n_distinct"))
          .orderBy("key_mod")
        // Materialize the 10 group rows so the per-call extract root
        // can be dropped eagerly — lazily returning a reader over it
        // leaked a fresh ~20k-row parquet tree per build (ADVICE r15).
        val groups = out.collect().toSeq
        import scala.jdk.CollectionConverters._
        s.createDataFrame(groups.asJava, out.schema)
      } finally {
        // In finally so FAILED builds clean up too (ADVICE r16: the
        // success-path-only delete re-opened the leak it was fixing,
        // one orphaned tree per failed fold/read).
        val rootPath = new org.apache.hadoop.fs.Path(root)
        val fs = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(rootPath, true)
        ()
      }
    },
    Some("""SELECT c_custkey % 10 AS key_mod, count(*) AS n,
      CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT))
        AS BIGINT) AS sum_bal_cents,
      count(DISTINCT c_custkey) AS n_distinct
    FROM customer WHERE c_custkey <= 20000
    GROUP BY 1 ORDER BY key_mod"""))

  val all: Seq[Q] = Seq(
    lineFilter, grepExists, extractId, identifier, versionDispatch,
    statusLast, nonemptyGuard, roundTrip, csvSource, orcSource,
    jsonSource, xmlSource, incremental, mergeUpsert, csvQuarantine,
    jdbcIncremental)
}

/** Process-level Derby harness for q_ref_jdbc_incremental: seeds the
  * live db from the customer fixture and publishes the two immutable
  * day-snapshot jars ONCE per (fixture dir), so the declared query's
  * timed body measures the incremental extract engine path, not DDL +
  * jar packaging (VERDICT r16 "What's wrong" #2). The jars are Derby's
  * documented read-only JAR subprotocol (`jdbc:derby:jar:(file)db`) —
  * bootable concurrently from any number of executor JVMs, which is
  * what makes the extract multi-JVM-safe (see the query's Scaladoc).
  *
  * Cleanup: a failed build deletes its partial tree and rethrows (no
  * orphan per failure); successful builds live for the process (bench
  * runs the query 3×, Verify once) and are removed by a single JVM
  * shutdown hook. */
private[queries] object JdbcHarness {
  final case class Snapshots(base: String, day1Db: String, day2Db: String) {
    def day1Url: String = s"jdbc:derby:$day1Db"
    def day2Url: String = s"jdbc:derby:$day2Db"
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Snapshots]()
  @volatile private var hookInstalled = false

  def shutdown(db: String): Unit =
    try {
      java.sql.DriverManager.getConnection(s"jdbc:derby:$db;shutdown=true")
      ()
    } catch { case _: java.sql.SQLException => () } // success signal

  def forFixture(s: org.apache.spark.sql.SparkSession,
      fixtureDir: String): Snapshots =
    cache.computeIfAbsent(fixtureDir, d => build(s, d))

  private def installHook(): Unit = synchronized {
    if (!hookInstalled) {
      hookInstalled = true
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        cache.values().forEach { snap =>
          // Release the jar dbs THIS JVM booted before deleting their
          // backing files — shutdown lives here, at harness teardown,
          // not per query call (ADVICE r17: a per-call shutdown shut
          // the shared cached db under a concurrent call's extract).
          shutdown(snap.day1Db)
          shutdown(snap.day2Db)
          deleteTree(java.nio.file.Paths.get(snap.base))
        }))
    }
  }

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try
        walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }

  private def build(s: org.apache.spark.sql.SparkSession,
      d: String): Snapshots = {
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home",
        sys.props("java.io.tmpdir")) // keep derby.log out of the repo
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val base = s"${sys.props("java.io.tmpdir")}/graft_jdbc_incr/$tag"
    val dbDir = s"$base/livedb"
    val day1Jar = s"$base/day1.jar"
    val day2Jar = s"$base/day2.jar"
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
      val rows = Tables.customer(s, d)
        .where(col("c_custkey") <= 20000)
        .select(col("c_custkey"),
          (Det.dec(col("c_acctbal"), 2, 12) * 100).cast("long"))
        .orderBy("c_custkey")
        .collect() // bounded by the key cap: ≤20k (id, cents) pairs
      var created = false
      def seed(slice: Array[org.apache.spark.sql.Row]): Unit = {
        val conn = java.sql.DriverManager
          .getConnection(s"jdbc:derby:$dbDir;create=true")
        try {
          conn.setAutoCommit(false)
          if (!created) {
            conn.createStatement().executeUpdate(
              "CREATE TABLE CUST_LIVE (ID BIGINT NOT NULL PRIMARY KEY, " +
                "BAL BIGINT NOT NULL)")
            created = true
          }
          val ps =
            conn.prepareStatement("INSERT INTO CUST_LIVE VALUES (?, ?)")
          slice.foreach { r =>
            ps.setLong(1, r.getLong(0)); ps.setLong(2, r.getLong(1))
            ps.addBatch()
          }
          ps.executeBatch(); ps.close()
          conn.commit()
        } finally conn.close()
      }
      // Archive the cleanly-shut-down db dir as livedb/** inside a jar
      // (lock files excluded) — Derby boots it read-only from any JVM.
      def publishDaySnapshot(jarPath: String): Unit = {
        shutdown(dbDir)
        val basePath = java.nio.file.Paths.get(dbDir)
        val out = new java.util.jar.JarOutputStream(
          new java.io.FileOutputStream(jarPath))
        val walk = java.nio.file.Files.walk(basePath)
        try {
          walk.filter(p => java.nio.file.Files.isRegularFile(p))
            .filter(p => !p.getFileName.toString.endsWith(".lck"))
            .forEach { p =>
              out.putNextEntry(new java.util.jar.JarEntry("livedb/" +
                basePath.relativize(p).toString.replace('\\', '/')))
              java.nio.file.Files.copy(p, out)
              out.closeEntry()
            }
        } finally { walk.close(); out.close() }
      }
      val mid = rows.length / 2
      seed(rows.take(mid)) // day 1 arrives
      publishDaySnapshot(day1Jar)
      seed(rows.drop(mid)) // day 2 arrives after the first fold
      publishDaySnapshot(day2Jar)
      installHook()
      Snapshots(base,
        s"jar:($day1Jar)livedb", s"jar:($day2Jar)livedb")
    } catch {
      case e: Throwable =>
        shutdown(dbDir)
        deleteTree(java.nio.file.Paths.get(base))
        throw e
    }
  }
}
