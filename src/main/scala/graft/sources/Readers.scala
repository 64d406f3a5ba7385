package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampNTZType}

/** Schema-adaptive table readers.
  *
  * The driver-generated testdata has changed vintage across rounds:
  * `events.parquet:ts` was TIMESTAMP(NANOS) (which Spark refuses to read
  * natively — PARQUET_TYPE_ILLEGAL — unless
  * `spark.sql.legacy.parquet.nanosAsLong` maps it to a raw Long) and is now
  * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads directly as
  * TIMESTAMP_NTZ. Rather than hard-code either era, branch on the dtype the
  * scan actually produces so the same build survives either testdata
  * vintage.
  */
object Readers {

  /** Read `<dir>/events.parquet` with `ts` normalized to TIMESTAMP_NTZ
    * (microsecond precision — the same truncation DuckDB applies to nanos).
    *
    * `spreadPartitions` opts into [[graft.ops.Dedup.ensureParallelism]] for
    * CPU-dense downstream work on unsplittable (single-row-group) files.
    * Default OFF: events queries are map-only projections or feed joins
    * (whose own exchange already redistributes), and the blanket guard
    * measured 4× slower on cheap-per-row map-only plans — see the trade
    * documented at the `ensureParallelism` definition.
    */
  def readEvents(
      s: SparkSession,
      dir: String,
      spreadPartitions: Boolean = false
  ): DataFrame = {
    // Harmless for micros-era files: the flag only affects INT64
    // TIMESTAMP(NANOS) columns, which otherwise fail analysis outright.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val plain = s.read.parquet(s"$dir/events.parquet")
    val raw =
      if (spreadPartitions) graft.ops.Dedup.ensureParallelism(plain) else plain
    raw.schema("ts").dataType match {
      case LongType =>
        // Nanos era: integer-divide to µs — `/` would go through double,
        // which cannot represent nanosecond epochs (> 2^53) exactly.
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case TimestampNTZType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }

  /** Compressed-JSONL corpus ingestion — the format real training corpora
    * actually arrive in (one JSON object per line, gzip-shard files).
    *
    * Scale contract (100 TB):
    *   - `schema` is REQUIRED by the scale path and strongly preferred
    *     everywhere: without it Spark runs a full inference pass over every
    *     byte before the real scan — a doubled read at corpus scale. With an
    *     explicit schema the parser also prunes: Jackson skips subtrees for
    *     fields the schema omits, so projection happens inside the parse
    *     (the JSONL analogue of parquet column pruning).
    *   - `.gz` files are NOT splittable — one task per shard. That matches
    *     how corpora ship (many 100–500 MB shards → natural parallelism);
    *     one giant gz file would serialize the read, and this reader can't
    *     fix that. Uncompressed `.jsonl` stays line-splittable
    *     (`multiLine` is left false for exactly this reason).
    *   - bad-record policy is explicit, not an afterthought: web-scale JSONL
    *     always contains torn lines. `keep` parks them in
    *     `_corrupt_record` for audit, `drop` discards silently,
    *     `fail` aborts the job on first corruption.
    *
    * @param schema      DDL string (`"doc_id BIGINT, text STRING"`) or null
    *                    to infer (small/interactive use only)
    * @param badRecords  `keep` (PERMISSIVE + `_corrupt_record` column) |
    *                    `drop` (DROPMALFORMED) | `fail` (FAILFAST).
    *                    Spark caveat under `keep`: a query whose referenced
    *                    columns are ONLY `_corrupt_record` is disallowed
    *                    straight off raw files — select at least one data
    *                    column (or cache) before filtering on it.
    * @param options     extra DataFrameReader options (e.g. `timeZone`,
    *                    a custom `lineSep`). May override the `lineSep`
    *                    default but NOT the bad-record policy: `mode` /
    *                    `columnNameOfCorruptRecord` are applied after user
    *                    options so `badRecords` stays authoritative.
    */
  /** Shared bad-record policy → (parser mode, effective schema). `keep`
    * appends `_corrupt_record` to the schema (PERMISSIVE only materializes
    * corrupt lines when the schema carries the column).
    */
  private def badRecordsPolicy(
      badRecords: String,
      base: Option[StructType]
  ): (String, Option[StructType]) = badRecords match {
    case "keep" =>
      ("PERMISSIVE", base.map(st =>
        if (st.fieldNames.contains("_corrupt_record")) st
        else StructType(st.fields :+ StructField("_corrupt_record", StringType))))
    case "drop" => ("DROPMALFORMED", base)
    case "fail" => ("FAILFAST", base)
    case other => throw new IllegalArgumentException(
      s"badRecords must be keep|drop|fail, got $other")
  }

  def readJsonl(
      s: SparkSession,
      path: String,
      schema: String = null,
      badRecords: String = "drop",
      options: Map[String, String] = Map.empty
  ): DataFrame = {
    val (mode, finalSchema) =
      badRecordsPolicy(badRecords, Option(schema).map(StructType.fromDDL))
    // compression codec is picked per-file from the extension (.gz/.zst/…)
    // by Hadoop's codec factory — mixed plain+gz+zst directories just work
    val r = s.read
      .option("lineSep", "\n")
      .options(options)
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    finalSchema.fold(r)(st => r.schema(st)).json(path)
  }

  /** CSV/TSV corpus ingestion with the same explicit-schema +
    * bad-record contract as [[readJsonl]] — the tabular-dump shape
    * (metadata sidecars, URL lists, label files) that rides along with
    * every web-scale corpus.
    *
    * Scale contract:
    *   - `schema` explicit for the same reason as jsonl: no inference
    *     pass (CSV inference reads every byte TWICE — once for types,
    *     once for real).
    *   - `multiLine` stays FALSE by default: a quoted embedded newline
    *     makes the file non-splittable (one task per file, however big).
    *     Flat records keep the line-splittable scan; producers with
    *     embedded newlines should escape them or accept
    *     `options = Map("multiLine" -> "true")` and shard small.
    *   - malformed rows (wrong column count, untypeable cells) follow
    *     `badRecords`: keep → `_corrupt_record` audit column, drop, fail.
    *     Policy options are applied AFTER user options so `badRecords`
    *     stays authoritative (same rule as jsonl). CSV column-pruning
    *     caveat: a plan that reads NO data columns (a bare `count()`)
    *     parses nothing, so malformation goes undetected there — counts
    *     run over raw lines; any real projection applies the policy.
    *   - `.gz`/`.zst` shards decompress per-file via Hadoop's codec
    *     factory, mixed directories included.
    */
  def readCsv(
      s: SparkSession,
      path: String,
      schema: String = null,
      badRecords: String = "drop",
      sep: String = ",",
      header: Boolean = false,
      options: Map[String, String] = Map.empty
  ): DataFrame = {
    // keep without a schema would silently keep NOTHING: CSV only
    // materializes _corrupt_record when the schema carries the column,
    // so malformed rows would surface as indistinguishable all-null rows
    require(schema != null || badRecords != "keep",
      "readCsv: badRecords=keep requires an explicit schema (the " +
        "_corrupt_record audit column must be part of the read schema)")
    val (mode, finalSchema) =
      badRecordsPolicy(badRecords, Option(schema).map(StructType.fromDDL))
    // sep/header declared by the caller are authoritative — applied AFTER
    // user options, same rule as the bad-record policy (an options
    // {sep: ","} must not silently defeat a declared tsv format)
    val r = s.read
      .options(options)
      .option("sep", sep)
      .option("header", header.toString)
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    // null schema = inference, the documented small/interactive-only path
    // (CSV inference is a second full read of every byte)
    finalSchema.fold(r.option("inferSchema", "true"))(st => r.schema(st))
      .csv(path)
  }

  /** Streaming variant of [[readCsv]]: watch a directory for newly-landed
    * CSV/TSV shards. Schema REQUIRED (no inference over files that don't
    * exist yet); same bad-record policy and separator/header handling as
    * batch; `maxFilesPerTrigger` bounds per-micro-batch ingestion.
    */
  def readCsvStream(
      s: SparkSession,
      path: String,
      schema: String,
      badRecords: String = "drop",
      sep: String = ",",
      header: Boolean = false,
      maxFilesPerTrigger: Int = 0
  ): DataFrame = {
    require(schema != null && schema.nonEmpty,
      "readCsvStream requires an explicit schema")
    val (mode, finalSchema) =
      badRecordsPolicy(badRecords, Some(StructType.fromDDL(schema)))
    val r = s.readStream
      .schema(finalSchema.get)
      .option("sep", sep)
      .option("header", header.toString)
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    (if (maxFilesPerTrigger > 0)
       r.option("maxFilesPerTrigger", maxFilesPerTrigger)
     else r).csv(path)
  }

  /** Streaming variant of [[readJsonl]]: watch a directory for new
    * `.jsonl(.gz)` shards and emit their rows as an unbounded stream — the
    * standard shape for a continuously-landing corpus drop. Schema is
    * REQUIRED (a streaming source cannot run an inference pass over files
    * that don't exist yet). Same bad-record policy as batch; the same
    * downstream operators (dftly expressions, watermarked dedup,
    * sessionize) apply unchanged.
    *
    * Scale knob: `maxFilesPerTrigger` bounds how many newly-landed shards
    * one micro-batch ingests — backpressure for a bursty producer
    * (0 = unbounded, Spark's default).
    */
  def readJsonlStream(
      s: SparkSession,
      path: String,
      schema: String,
      badRecords: String = "drop",
      maxFilesPerTrigger: Int = 0
  ): DataFrame = {
    require(schema != null && schema.nonEmpty,
      "readJsonlStream requires an explicit schema")
    val (mode, finalSchema) =
      badRecordsPolicy(badRecords, Some(StructType.fromDDL(schema)))
    val r = s.readStream
      .schema(finalSchema.get)
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("lineSep", "\n")
    (if (maxFilesPerTrigger > 0)
       r.option("maxFilesPerTrigger", maxFilesPerTrigger)
     else r).json(path)
  }
}
