package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.SignalFrame
import graft.io.{Edf, Readers}

/** Driver-oracle coverage for the IO layer (SURVEY S1-S6, S10): each query
  * reads a checked-in fixture (tools/iofixtures.py, deterministic
  * exact-binary values) through the engine's reader, and the oracle
  * recomputes the expected frame INDEPENDENTLY in DuckDB from the same raw
  * fixture text (read_csv/read_json + the documented conversions). The EDF
  * fixture is binary, so its oracle is a parquet golden derived by the
  * fixture generator from the source arrays — independent of the Scala
  * parser.
  *
  * The sfDir argument is unused: IO contracts are scale-independent
  * (format parsing + timestamp synthesis), and the fixtures are the same
  * at every verify scale.
  */
object IoQueries {

  private[queries] lazy val ioDir: String =
    sys.props.getOrElse("graft.io.dir",
      s"${sys.props("user.dir")}/src/test/resources/io")

  /** Where the sink round-trip queries (q99/q100/q102) materialize their
    * output. The oracle reads the SAME files back with DuckDB, so a green
    * row certifies the sink's on-disk format, not a re-computation.
    *
    * Namespaced per JVM: building a sink query's plan WRITES here (the
    * write IS the operator under test), and every harness builds plans —
    * Verify, Bench, PlanContractSpec — so two concurrent runs sharing one
    * directory would interleave output and the oracle would read mixed
    * files. The oracle SQL below renders from the same value inside the
    * same JVM, so the driver's DuckDB pass always reads this run's files.
    * Sibling dirs are swept by PID LIVENESS, not mtime: each dir name
    * encodes its owner's pid, so a dir is dead exactly when that process
    * is gone. (The former 1-hour-mtime sweep could delete a live run's
    * files mid-oracle: sink files are written at plan-build time and
    * DuckDB reads do not refresh mtime.) A pid recycled by an unrelated
    * process keeps a dead dir alive; the 24h mtime fallback reaps those. */
  private[queries] lazy val sinkDir: String = {
    val base = sys.props.getOrElse("graft.sink.dir",
      s"${sys.props("user.dir")}/target/sink_roundtrip")
    val mine = s"run_${ProcessHandle.current().pid()}"
    def del(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(del)
      f.delete()
    }
    def ownerAlive(name: String): Boolean =
      name.stripPrefix("run_").toLongOption.exists(pid =>
        ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false))
    val fallbackCutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    Option(new java.io.File(base).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName != mine &&
        (!ownerAlive(f.getName) || f.lastModified < fallbackCutoff))
      .foreach(del)
    new java.io.File(base, mine).getPath
  }

  private val metricsSchema = StructType(Seq(
    StructField("subject", LongType), StructField("segment", LongType),
    StructField("first_ts_us", LongType), StructField("n_detected", LongType),
    StructField("n_expected", LongType), StructField("n_missing", LongType),
    StructField("pct_missing", DoubleType), StructField("n_artifact", LongType),
    StructField("pct_artifact", DoubleType), StructField("invalid", DoubleType)))

  private val beatJsonSchema = StructType(Seq(
    StructField("Segment", LongType), StructField("Timestamp", LongType),
    StructField("Signal", DoubleType), StructField("Beat", LongType),
    StructField("Artifact", LongType)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2: E4 ZIP modality frame with the ACC unit conversion
    // (1/64 g -> m/s²) and Magnitude (reference physioview.py:196-371).
    "q92_e4_acc" -> ((s, _) =>
      Readers.e4Modality(s, s"$ioDir/e4.zip", "ACC.csv")),

    // S1: EDF long frame (channel, idx, ts_us, value); reference
    // Actiwave.preprocess, physioview.py:50-159.
    "q93_edf_frame" -> ((s, _) =>
      Edf.read(s, s"$ioDir/actiwave.edf")),

    // S6: batch-of-CSVs directory as ONE partitioned scan, subject from
    // file name, idx from the Timestamp sample clock (reference
    // dashboard/callbacks.py:743-892).
    "q94_batch_csv" -> ((s, _) =>
      Readers.batchCsvDir(s, s"$ioDir/batch",
        Map("time_s" -> "Timestamp", "eda_uS" -> "EDA"))),

    // S3: E4 IBI event file, seconds -> ms (physioview.py:487-523).
    "q95_e4_ibi" -> ((s, _) =>
      Readers.e4Ibi(s, s"$ioDir/e4.zip")),

    // S4: column-mapped CSV upload (dashboard/utils.py:437-492).
    "q96_mapped_csv" -> ((s, _) =>
      Readers.mappedCsv(s, s"$ioDir/mapped.csv",
        Map("when" -> "Timestamp", "microsiemens" -> "EDA"))),

    // S10: beat-editor edit-instruction source (physioview.py:1690-1737).
    "q97_beat_edits" -> ((s, _) =>
      Readers.readBeatEdits(s, s"$ioDir/edited.json")),

    // S8 round-trip: flagship q19 metrics table through the CSV sink
    // (reference dashboard/callbacks.py:794-1101 temp-CSV export), read
    // back with an explicit schema. The oracle DuckDB-reads the same CSV
    // files, so hash-green certifies the written format end to end.
    "q99_sink_csv" -> ((s, dir) => {
      val out = s"$sinkDir/q99_metrics_csv"
      Readers.writeCsvSingle(SqaQueries.queries("q19_sqa_metrics")(s, dir), out)
      s.read.schema(metricsSchema).option("header", "true").csv(out)
    }),

    // S9 round-trip: beat-editor JSON export (physioview.py:1594-1688) of
    // the canonical signal frame, read back; oracle = DuckDB read_json
    // over the same files.
    "q100_sink_beatjson" -> ((s, dir) => {
      val sig = SignalFrame.fromEvents(s, dir)
        .withColumn("segment",
          SignalFrame.segment(col("idx"), SqaQueries.FS, SqaQueries.SEG))
      val out = s"$sinkDir/q100_beatjson"
      Readers.writeBeatEditorJson(sig, "value", out)
      s.read.schema(beatJsonSchema).json(out)
    }),

    // §3.1 lifecycle (dashboard/callbacks.py:696-1120) as an oracle row:
    // dispatch-route a MIXED directory — E4 zip through the BVP cardiac
    // chain (van Gent detection at 64 Hz), mapped CSV through the EDA
    // chain — via RunPipeline into the reference's temp/render CSV sink
    // surface, then read the landed cardiac SQA table back. The oracle
    // DuckDB-reads the same files, so a green row certifies
    // dispatch → modality plan → sink end to end on disk. (The checked-in
    // EDF fixture's 8 Hz ECG cannot carry the 1-15 Hz cardiac bandpass;
    // the EDF route is exercised by EndToEndSpec on the reference sample.)
    "q134_run_pipeline" -> ((s, _) => {
      val base = new java.io.File(s"$sinkDir/q134_pipeline")
      val mixed = new java.io.File(base, "in"); mixed.mkdirs()
      def cp(src: String, dst: String): Unit =
        java.nio.file.Files.copy(new java.io.File(src).toPath,
          new java.io.File(mixed, dst).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      cp(s"$ioDir/e4.zip", "subjA.zip")
      cp(s"$ioDir/mapped.csv", "subjB.csv")
      // one file the dispatcher must skip (S7's negative path)
      java.nio.file.Files.write(new java.io.File(mixed, "notes.txt").toPath,
        "not physiological".getBytes("UTF-8"))
      val opts = graft.ops.RunPipeline.Options(segSize = 1, e4Dtype = "PPG",
        csvDtype = "EDA", csvFs = 1,
        csvMapping = Map("when" -> "Timestamp", "microsiemens" -> "EDA",
          "temp_c" -> "TEMP"))
      graft.ops.RunPipeline.runDirectory(s, mixed.getPath,
        s"$base/temp", s"$base/render", opts)
      s.read.schema(metricsSchema).option("header", "true")
        .csv(s"$base/temp/subjA_SQA.csv")
    }),

    // Sharded JSONL training-data sink round trip: assign each document a
    // deterministic hash shard ([[graft.llm.Pipeline.shardAssign]]'s
    // portable md5 hash), write `shard=K/` line-delimited JSON
    // ([[Readers.writeJsonlShards]]), read the landed files back, and
    // report per shard. The oracle computes the SAME report from the
    // source `documents` table, so a green row certifies the written
    // payload (ids, full text, lang) survived the JSON round trip exactly.
    "q150_jsonl_shards" -> ((s, dir) => {
      val docs = graft.core.Tables.documents(s, dir)
      val shards = graft.llm.Pipeline
        .shardAssign(docs, "doc_id", numShards = 8, salt = "jsonl1")
        .select("doc_id", "shard")
      val out = s"$sinkDir/q150_jsonl"
      Readers.writeJsonlShards(
        docs.join(shards, Seq("doc_id"))
          .select("doc_id", "text", "lang", "source", "shard"),
        "shard", out)
      val payload = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType),
        StructField("source", StringType)))
      s.read.schema(payload).option("basePath", out).json(s"$out/shard=*")
        .groupBy(col("shard").cast("long").as("shard"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("sum_chars"),
          countDistinct(col("lang")).as("n_langs"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
    }),

    // S5: CSV header probe (dashboard/utils.py:422-428) as a row set;
    // oracle = DuckDB sniff_csv over the same fixture.
    "q101_csv_headers" -> ((s, _) => {
      import s.implicits._
      Readers.csvHeaders(s, s"$ioDir/mapped.csv").zipWithIndex
        .map { case (h, i) => (i.toLong, h) }.toDF("pos", "name")
    }),

    // S13: Actiwave-EDF validity probe + parsed header facts
    // (reference _check_edf, dashboard/utils.py:289-296) over one valid
    // EDF and one non-EDF file. The oracle is a VALUES literal of the
    // fixture GENERATOR's construction constants (tools/iofixtures.py:
    // 2 channels, 12 records, 1 s records, 2020-09-14T12:26:40Z) —
    // independent of the Scala parser.
    "q104_edf_validity" -> ((s, _) => {
      import s.implicits._
      def probe(name: String) = {
        val bytes = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$ioDir/$name"))
        val hdr = try Some(Edf.parse(bytes)) catch { case _: Throwable => None }
        (name, Edf.isValidActiwave(bytes), hdr.map(_.channels.size),
          hdr.map(_.nRecords), hdr.map(_.recordDurationS),
          hdr.map(_.startEpochUs))
      }
      Seq(probe("actiwave.edf"), probe("e4.zip"))
        .toDF("file", "valid", "n_channels", "n_records",
          "record_duration_s", "start_epoch_us")
    }),

    // Audio pipeline composition: binaryFile scan -> executor-side
    // RIFF/WAVE PCM decode (Multimodal.decodeWav, one task per file — the
    // batch-audio shape at 100 TB) -> K15a polyphase 2x resample. The
    // oracle convolves the same Kaiser-sinc taps in SQL over the fixture
    // GENERATOR's decode (wav_frame.parquet, sample/32768 exact binary),
    // so green certifies decoder AND resampler end to end.
    "q111_wav_resample" -> ((s, _) => {
      import s.implicits._
      val frame = s.read.format("binaryFile").load(s"$ioDir/tone.wav")
        .select(col("content")).as[Array[Byte]]
        .mapPartitions(_.flatMap { bytes =>
          val w = graft.llm.Multimodal.decodeWav(bytes)
            .getOrElse(throw new IllegalArgumentException("undecodable WAV"))
          w.samples.iterator.zipWithIndex
            .map { case (v, i) => (0L, i.toLong, v) }
        }).toDF("subject", "idx", "value")
      graft.kernels.Resample.resamplePoly(frame, up = 2, down = 1)
        .withColumn("value_rs", bround(col("value_rs"), 6))
    }),

    // Image pipeline composition: binaryFile scan -> executor-side P6 PPM
    // decode (Multimodal.decodePpm) -> nearest-neighbor resize 11x7 -> 5x3
    // (the 'resize' transform of the multimodal brief; one task per image
    // at 100 TB, pure integer index math, zero shuffle) -> pixel rows. The
    // oracle replays the identical integer index arithmetic
    // (least(H-1, y*H/h)) in SQL over the fixture GENERATOR's decode
    // (ppm_pixels.parquet), so green certifies decoder AND resize end to
    // end, independent of the Scala decoder.
    "q116_image_resize" -> ((s, _) => {
      import s.implicits._
      s.read.format("binaryFile").load(s"$ioDir/img.ppm")
        .select(col("content")).as[Array[Byte]]
        .mapPartitions(_.flatMap { bytes =>
          val full = graft.llm.Multimodal.decodePpm(bytes)
            .getOrElse(throw new IllegalArgumentException("undecodable PPM"))
          val img = graft.llm.Multimodal.resizeNearest(full, 5, 3)
          (0 until img.height).iterator.flatMap { y =>
            (0 until img.width).iterator.map { x =>
              val p = img.rgb(y * img.width + x)
              (y.toLong, x.toLong, ((p >> 16) & 0xff).toLong,
                ((p >> 8) & 0xff).toLong, (p & 0xff).toLong)
            }
          }
        }).toDF("y", "x", "r", "g", "b")
    }),

    // Audio spectral features via the Walsh-Hadamard transform: decoded
    // WAV -> 64-sample windows -> 64-point WHT (coef k = sum of
    // x[n] * (-1)^popcount(k AND n)) -> per-sequency-band energies.
    // Sequency band energy is the WHT analog of DFT band power
    // (Beauchamp, "Walsh Functions and Their Applications") and is
    // ALL-INTEGER: int16 samples recovered exactly from the normalized
    // doubles, +/-1 kernel, long sums — bit-identical on any engine, no
    // cross-engine libm trig in play. Shape: ONE shuffle (window
    // grouping); the transform itself is a pure expression over the
    // collected 64-array, so windows parallelize embarrassingly at 100 TB
    // and no 64x row blow-up ever reaches an exchange.
    "q124_wav_wht" -> ((s, _) => {
      import s.implicits._
      val win = 64
      val frame = s.read.format("binaryFile").load(s"$ioDir/tone.wav")
        .select(col("content")).as[Array[Byte]]
        .mapPartitions(_.flatMap { bytes =>
          val w = graft.llm.Multimodal.decodeWav(bytes)
            .getOrElse(throw new IllegalArgumentException("undecodable WAV"))
          // samples are int16/32768 — *32768 recovers the integer exactly
          w.samples.iterator.zipWithIndex.map { case (v, i) =>
            (i.toLong / win, i.toLong % win, math.round(v * 32768))
          }
        }).toDF("win", "n", "raw")
        .filter(col("win") < lit(400L / win)) // drop the partial tail
      val arr = frame.groupBy("win")
        .agg(array_sort(collect_list(struct(col("n"), col("raw")))).as("__s"))
        .withColumn("__x", transform(col("__s"), e => e("raw")))
      val coefs = transform(sequence(lit(0), lit(win - 1)), k =>
        aggregate(sequence(lit(0), lit(win - 1)), lit(0L), (acc, n) =>
          acc + when(bit_count(k.bitwiseAND(n)) % 2 === 0,
            element_at(col("__x"), n + 1))
            .otherwise(-element_at(col("__x"), n + 1))))
      arr.withColumn("__c", coefs)
        .select(col("win"), posexplode(col("__c")).as(Seq("k", "coef")))
        .groupBy(col("win"), shiftright(col("k"), 4).as("band"))
        .agg(sum(col("coef") * col("coef")).as("energy"))
    }),

    // Perceptual image hashing (dHash): binaryFile scan over a directory
    // of PPMs -> executor-side decode -> integer luma -> 11x6 nearest
    // resize -> 60-bit difference hash. One task per image at 100 TB,
    // all-integer, zero shuffle. The oracle replays the identical
    // luma/resize/compare/shift arithmetic in SQL over the fixture
    // GENERATOR's pixel decode (imgset_pixels.parquet), so green
    // certifies decoder, luma, resize mapping and bit packing end to end.
    "q122_image_dhash" -> ((s, _) => {
      import s.implicits._
      s.read.format("binaryFile").load(s"$ioDir/imgset/*.ppm")
        .select(regexp_extract(col("path"), "([^/]+)\\.ppm$", 1).as("img"),
          col("content"))
        .as[(String, Array[Byte])]
        .mapPartitions(_.map { case (name, bytes) =>
          val img = graft.llm.Multimodal.decodePpm(bytes)
            .getOrElse(throw new IllegalArgumentException("undecodable PPM"))
          (name, graft.llm.Multimodal.dhash60(img))
        }).toDF("img", "dhash")
    }),

    // Image near-duplicate pairs over the dHash fingerprints via the SAME
    // banded pigeonhole layer text SimHash uses (Dedup.fingerprintPairs):
    // candidates share one of four 15-bit bands, Hamming verification is
    // confined to candidates — never an all-pairs scan. At billions of
    // images this is one equi-join on (band_idx, band_val). The fixture
    // plants a brightness-shifted exact dup (hamming 0) and a local patch
    // edit (low hamming) among independent images.
    "q123_image_dup_pairs" -> ((s, _) => {
      val hashes = queries("q122_image_dhash")(s, "")
      graft.llm.Dedup.fingerprintPairs(hashes, "img", "dhash",
        numBands = 4, maxHamming = 12)
        .select(col("id_a").as("img_a"), col("id_b").as("img_b"),
          col("hamming"))
    }),

    // S11 round-trip: EngineConfig JSON save -> load -> frame view
    // (reference _create_configs/_load_config, dashboard/utils.py:327-372);
    // oracle = DuckDB read_json of the same written file.
    "q102_sink_config" -> ((s, _) => {
      val out = s"$sinkDir/q102_config"
      val cfg = graft.io.EngineConfig(
        source = "E4", dataType = "EDA", samplingRate = 4, segmentSize = 10,
        filters = true, scrDetection = true, scrAmplitude = 0.1,
        artifactMethod = "hegarty", artifactTolerance = 0.5,
        useTemperature = false, temperatureVariable = None,
        minEda = Some(0.05), maxEda = Some(60.0), headers = None)
      graft.io.EngineConfig.save(s, cfg, out)
      graft.io.EngineConfig.toFrame(s, graft.io.EngineConfig.load(s, out))
    })
  )

  /** Shared dHash CTE chain for q122/q123: identical integer luma, nearest
    * 11x6 index mapping (least(H-1, y*H/6)), neighbor compare and bit
    * packing as Multimodal.dhash60 — recomputed from the generator's
    * pixel decode, independent of the Scala decoder. */
  private def dhashSql: String =
    s"""WITH px AS (
       |  SELECT img, y, x, (299*r + 587*g + 114*b) // 1000 AS lum
       |  FROM read_parquet('$ioDir/imgset_pixels.parquet')),
       |grid AS (
       |  SELECT gy.generate_series AS y, gx.generate_series AS x
       |  FROM generate_series(0, 5) gy CROSS JOIN generate_series(0, 10) gx),
       |small AS (
       |  SELECT p.img, g.y, g.x, p.lum
       |  FROM grid g JOIN px p
       |    ON p.y = least(11, (g.y * 12) // 6)
       |   AND p.x = least(15, (g.x * 16) // 11)),
       |bits AS (
       |  SELECT a.img, a.y, a.x,
       |    CASE WHEN b.lum > a.lum THEN 1 ELSE 0 END AS bit
       |  FROM small a JOIN small b
       |    ON b.img = a.img AND b.y = a.y AND b.x = a.x + 1
       |  WHERE a.x < 10),
       |hashes AS (
       |  SELECT img,
       |    CAST(SUM(CAST(bit AS BIGINT) << (y * 10 + x)) AS BIGINT) AS dhash
       |  FROM bits GROUP BY img)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q124_wav_wht" ->
      s"""WITH s AS (
         |  SELECT idx // 64 AS win, idx % 64 AS n,
         |    CAST(round(value * 32768) AS BIGINT) AS raw
         |  FROM read_parquet('$ioDir/wav_frame.parquet') WHERE idx < 384),
         |coef AS (
         |  SELECT win, k,
         |    SUM(CASE WHEN bit_count(k & n) % 2 = 0 THEN raw ELSE -raw END) AS c
         |  FROM s, unnest(range(0, 64)) AS t(k)
         |  GROUP BY win, k)
         |SELECT win, CAST(k // 16 AS INTEGER) AS band,
         |  CAST(SUM(c * c) AS BIGINT) AS energy
         |FROM coef GROUP BY 1, 2""".stripMargin,

    "q122_image_dhash" ->
      s"""$dhashSql
         |SELECT img, dhash FROM hashes""".stripMargin,

    "q123_image_dup_pairs" ->
      s"""$dhashSql,
         |bands AS (
         |  SELECT img, dhash, b AS band_idx,
         |    (dhash >> (b * 15)) & 32767 AS band_val
         |  FROM hashes, unnest(range(0, 4)) AS t(b)),
         |cand AS (
         |  SELECT DISTINCT a.img AS img_a, a.dhash AS fp_a,
         |    b.img AS img_b, b.dhash AS fp_b
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         |  WHERE a.img < b.img)
         |SELECT img_a, img_b, bit_count(xor(fp_a, fp_b)) AS hamming
         |FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= 12""".stripMargin,

    "q92_e4_acc" ->
      s"""WITH raw AS (
         |  SELECT row_number() OVER () - 1 AS rn, c0, c1, c2
         |  FROM read_csv('$ioDir/e4/ACC.csv', header=false,
         |    columns={'c0':'DOUBLE','c1':'DOUBLE','c2':'DOUBLE'})),
         |meta AS (SELECT
         |  max(CASE WHEN rn = 0 THEN c0 END) AS tstart,
         |  max(CASE WHEN rn = 1 THEN c0 END) AS fs FROM raw),
         |conv AS (
         |  SELECT rn - 2 AS idx,
         |    CAST(trunc((tstart + (rn - 2) / fs) * 1e6) AS BIGINT) AS ts_us,
         |    c0 / 64 * 9.81 AS "X", c1 / 64 * 9.81 AS "Y", c2 / 64 * 9.81 AS "Z"
         |  FROM raw, meta WHERE rn >= 2)
         |SELECT idx, ts_us, "X", "Y", "Z",
         |  sqrt("X" * "X" + "Y" * "Y" + "Z" * "Z") AS "Magnitude"
         |FROM conv""".stripMargin,

    "q93_edf_frame" ->
      s"SELECT * FROM read_parquet('$ioDir/edf_frame.parquet')",

    "q94_batch_csv" ->
      s"""SELECT regexp_extract(filename, '([^/]+)\\.csv', 1) AS subject,
         |  time_s AS "Timestamp", eda_uS AS "EDA",
         |  row_number() OVER (PARTITION BY filename ORDER BY time_s) - 1 AS idx
         |FROM read_csv('$ioDir/batch/*.csv', header=true, filename=true)""".stripMargin,

    "q95_e4_ibi" ->
      s"""WITH raw AS (
         |  SELECT row_number() OVER () - 1 AS rn, c0, c1
         |  FROM read_csv('$ioDir/e4/IBI.csv', header=false,
         |    columns={'c0':'VARCHAR','c1':'VARCHAR'})),
         |meta AS (SELECT CAST(max(CASE WHEN rn = 0 THEN c0 END) AS DOUBLE) AS tstart
         |  FROM raw)
         |SELECT CAST(trunc((tstart + CAST(c0 AS DOUBLE)) * 1e6) AS BIGINT) AS ts_us,
         |  CAST(c1 AS DOUBLE) * 1000.0 AS "IBI"
         |FROM raw, meta WHERE rn >= 1""".stripMargin,

    "q96_mapped_csv" ->
      s"""SELECT "when" AS "Timestamp", microsiemens AS "EDA"
         |FROM read_csv('$ioDir/mapped.csv', header=true)""".stripMargin,

    "q97_beat_edits" ->
      s"""SELECT x, y, "from", "to", editType
         |FROM read_json('$ioDir/edited.json', format='newline_delimited',
         |  columns={'x':'BIGINT','y':'DOUBLE','from':'BIGINT','to':'BIGINT',
         |           'editType':'VARCHAR'})""".stripMargin,

    "q99_sink_csv" ->
      s"""SELECT * FROM read_csv('$sinkDir/q99_metrics_csv/*.csv',
         |  header=true, types={'subject':'BIGINT','segment':'BIGINT',
         |    'first_ts_us':'BIGINT','n_detected':'BIGINT',
         |    'n_expected':'BIGINT','n_missing':'BIGINT',
         |    'pct_missing':'DOUBLE','n_artifact':'BIGINT',
         |    'pct_artifact':'DOUBLE','invalid':'DOUBLE'})""".stripMargin,

    // Computed from the SOURCE table (not the landed files): the Spark
    // side aggregates the read-back JSONL, so equality certifies the
    // write→read fidelity of every payload field.
    "q150_jsonl_shards" ->
      """WITH sh AS (
        |  SELECT doc_id, text, lang,
        |    ('0x' || substr(md5('jsonl1' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      % 8 AS shard
        |  FROM documents)
        |SELECT shard, COUNT(*) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM sh GROUP BY 1""".stripMargin,

    "q134_run_pipeline" ->
      s"""SELECT * FROM read_csv(
         |  '$sinkDir/q134_pipeline/temp/subjA_SQA.csv/*.csv',
         |  header=true, types={'subject':'BIGINT','segment':'BIGINT',
         |    'first_ts_us':'BIGINT','n_detected':'BIGINT',
         |    'n_expected':'BIGINT','n_missing':'BIGINT',
         |    'pct_missing':'DOUBLE','n_artifact':'BIGINT',
         |    'pct_artifact':'DOUBLE','invalid':'DOUBLE'})""".stripMargin,

    "q100_sink_beatjson" ->
      s"""SELECT * FROM read_json('$sinkDir/q100_beatjson/*.json',
         |  format='newline_delimited',
         |  columns={'Segment':'BIGINT','Timestamp':'BIGINT',
         |    'Signal':'DOUBLE','Beat':'BIGINT','Artifact':'BIGINT'})""".stripMargin,

    "q104_edf_validity" ->
      """SELECT * FROM (VALUES
        |  ('actiwave.edf', true, 2, 12, 1.0, 1600086400000000),
        |  ('e4.zip', false, NULL, NULL, NULL, NULL))
        |  AS t(file, valid, n_channels, n_records,
        |       record_duration_s, start_epoch_us)""".stripMargin,

    "q101_csv_headers" ->
      s"""SELECT generate_subscripts(columns, 1) - 1 AS pos,
         |  unnest(columns).name AS name
         |FROM sniff_csv('$ioDir/mapped.csv')""".stripMargin,

    "q111_wav_resample" -> KernelQueries.polyResampleSql(
      s"""SELECT CAST(0 AS BIGINT) AS subject, idx, value
         |FROM read_parquet('$ioDir/wav_frame.parquet')""".stripMargin),

    // Same integer index math as Multimodal.resizeNearest: source pixel
    // (least(6, y*7//3), least(10, x*11//5)) for target grid 5x3 of an
    // 11x7 source. All-integer, exact on both engines.
    "q116_image_resize" ->
      s"""WITH src AS (
         |  SELECT * FROM read_parquet('$ioDir/ppm_pixels.parquet')),
         |grid AS (
         |  SELECT gy.generate_series AS y, gx.generate_series AS x
         |  FROM generate_series(0, 2) gy CROSS JOIN generate_series(0, 4) gx)
         |SELECT gr.y, gr.x, src.r, src.g, src.b
         |FROM grid gr JOIN src
         |  ON src.y = least(6, (gr.y * 7) // 3)
         | AND src.x = least(10, (gr.x * 11) // 5)""".stripMargin,

    "q102_sink_config" ->
      s"""SELECT * FROM read_json('$sinkDir/q102_config/*.json',
         |  format='newline_delimited',
         |  columns={'source':'VARCHAR','dataType':'VARCHAR',
         |    'samplingRate':'BIGINT','segmentSize':'BIGINT',
         |    'filters':'BOOLEAN','scrDetection':'BOOLEAN',
         |    'scrAmplitude':'DOUBLE','artifactMethod':'VARCHAR',
         |    'artifactTolerance':'DOUBLE','useTemperature':'BOOLEAN',
         |    'temperatureVariable':'VARCHAR','minEda':'DOUBLE',
         |    'maxEda':'DOUBLE'})""".stripMargin
  )
}
