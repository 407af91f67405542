package graft.operators

import graft.{Catalog, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads modeled as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches. The decode step is REAL: m02 writes genuine BMP/WAV/Y4M
  * container bytes (trivial uncompressed formats, pure-JVM parsable — see
  * `Media`) and decodes actual pixels/samples/frames back out of them; the
  * Spark-side shape is the partition-batch `mapPartitions` with a typed
  * Encoder (the JVM equivalent of `mapInPandas`), metadata extraction, and
  * a per-modality rollup.
  *
  * Scale notes: assets are opaque blobs → all per-asset work is narrow
  * (no shuffle until the final per-modality rollup); a 100 TB corpus
  * partitions by file and streams batch-at-a-time through the decoder.
  */
object Multimodal {
  import Catalog.dec

  private def T(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** m01 — binary asset table + metadata: documents' text bytes stand in
    * for media payloads (binary column), fingerprinted and rolled up per
    * modality. The sha256 fingerprint is the content-addressing key a
    * 100 TB media lake dedups on.
    */
  private val m01 = Q(
    "m01_binary_assets",
    (s, d) => {
      import s.implicits._
      T(s, d, "documents")
        .select($"doc_id",
          encode($"text", "UTF-8").as("payload"), // binary column
          sha2($"text".cast(BinaryType), 256).as("sha"),
          element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
            ($"doc_id" % 3 + 1).cast(IntegerType)).as("modality"))
        .groupBy($"modality")
        .agg(count(lit(1)).as("n_assets"),
          sum(length($"payload").cast(LongType)).as("total_bytes"),
          countDistinct($"sha").as("n_distinct"))
        .orderBy($"modality")
    },
    Some("""
      WITH a AS (SELECT doc_id, encode(text) AS payload, sha256(text) AS sha,
                   CASE doc_id % 3 WHEN 0 THEN 'image/png'
                     WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS modality
                 FROM documents)
      SELECT modality, COUNT(*) AS n_assets,
        CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
        COUNT(DISTINCT sha) AS n_distinct
      FROM a GROUP BY modality ORDER BY modality"""))

  /** m02 — partition-batch REAL decode (the mapInPandas shape): each doc
    * gets genuine container bytes (BMP image / RIFF-WAV audio / YUV4MPEG2
    * video by the doc_id%3 layout), which stream through `Media.MediaCodec`
    * partition by partition via a typed `mapPartitions` — header parsing,
    * palette indirection, bottom-up BMP rows, RIFF chunk walking, FRAME
    * markers, the lot — then the decoded metadata aggregates per modality.
    * The oracle re-derives every decoded value (dimensions, sample/frame
    * counts, content sums) from the generation rule in pure SQL, so a pass
    * proves the decoder read real content back through real containers.
    * The decoder dispatches on MAGIC BYTES, never on the layout rule.
    */
  private val m02 = Q(
    "m02_decode_meta",
    (s, d) => {
      import s.implicits._
      val ids = T(s, d, "documents").select($"doc_id").as[Long]
      val meta = ids.mapPartitions(_.map { id =>
        val payload = (id % 3) match {
          case 0 => Media.MediaGen.bmp(id)
          case 1 => Media.MediaGen.wav(id)
          case _ => Media.MediaGen.y4m(id)
        }
        Media.MediaCodec.decode(id, payload)
      })
      meta.toDF()
        .groupBy($"modality")
        .agg(count(lit(1)).as("n"),
          sum($"n_bytes").as("sum_bytes"),
          sum($"width".cast(LongType)).as("sum_w"),
          sum($"height".cast(LongType)).as("sum_h"),
          sum($"n_frames").as("sum_frames"),
          sum($"content_sum").as("sum_content"))
        .orderBy($"modality")
    },
    Some(s"""
      WITH img AS (
        SELECT d.doc_id,
          CAST(SUM((((d.doc_id // 3) % 40) * 41 + r.r * 7 + c.c * 13) % 240 +
            CASE WHEN (r.r * 16 + c.c) % 61 = (d.doc_id // 120) % 61
              THEN 15 ELSE 0 END) AS BIGINT) AS content
        FROM documents d, UNNEST(range(0, 16)) r(r), UNNEST(range(0, 16)) c(c)
        WHERE d.doc_id % 3 = 0 GROUP BY d.doc_id),
      aud AS (
        SELECT d.doc_id, 160 + (d.doc_id % 37) * 16 AS n,
          CAST(SUM(CASE WHEN i.i < 160 + (d.doc_id % 37) * 16
            THEN (d.doc_id * 13 + i.i * 7) % 2048 - 1024 ELSE 0 END)
            AS BIGINT) AS content
        FROM documents d, UNNEST(range(0, 736)) i(i)
        WHERE d.doc_id % 3 = 1 GROUP BY d.doc_id),
      vid AS (
        SELECT d.doc_id, 1 + d.doc_id % 5 AS f,
          CAST(SUM(CASE WHEN fr.f < 1 + d.doc_id % 5
            THEN (d.doc_id * 11 + fr.f * 5 + i.i * 3) % 256 ELSE 0 END)
            AS BIGINT) AS content
        FROM documents d, UNNEST(range(0, 5)) fr(f), UNNEST(range(0, 96)) i(i)
        WHERE d.doc_id % 3 = 2 GROUP BY d.doc_id)
      SELECT 'audio/wav' AS modality, COUNT(*) AS n,
        CAST(SUM(44 + 2 * n) AS BIGINT) AS sum_bytes,
        CAST(0 AS BIGINT) AS sum_w, CAST(0 AS BIGINT) AS sum_h,
        CAST(SUM(n) AS BIGINT) AS sum_frames,
        CAST(SUM(content) AS BIGINT) AS sum_content FROM aud
      UNION ALL
      SELECT 'image/bmp', COUNT(*),
        CAST(COUNT(*) * ${Media.BmpBytes} AS BIGINT),
        CAST(COUNT(*) * 16 AS BIGINT), CAST(COUNT(*) * 16 AS BIGINT),
        CAST(COUNT(*) AS BIGINT), CAST(SUM(content) AS BIGINT) FROM img
      UNION ALL
      SELECT 'video/y4m', COUNT(*),
        CAST(SUM(${Media.Y4mHeader.length} + f * (6 + 96)) AS BIGINT),
        CAST(COUNT(*) * 8 AS BIGINT), CAST(COUNT(*) * 8 AS BIGINT),
        CAST(SUM(f) AS BIGINT), CAST(SUM(content) AS BIGINT) FROM vid
      ORDER BY modality"""))

  /** m03 — byte-range "frame sampling": fixed-offset slices of the binary
    * payload (what a real pipeline does to thumbnail/preview without full
    * decode), fingerprinted per slice.
    */
  private val m03 = Q(
    "m03_frame_sample",
    (s, d) => {
      import s.implicits._
      val assets = T(s, d, "documents")
        .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      assets
        .select($"doc_id",
          length($"payload").as("n_bytes"),
          md5(expr("substr(payload, 1, 64)")).as("head_fp"),
          md5(expr("substr(payload, greatest(1, length(payload) - 63), 64)")).as("tail_fp"))
        .orderBy($"doc_id")
    },
    // DuckDB 1.0 has no substr-on-BLOB; the documents are pure ASCII
    // (verified: octet_length == length for every row), so the varchar
    // slice hashes the identical bytes as Spark's binary slice.
    Some("""
      SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        md5(substr(text, 1, 64)) AS head_fp,
        md5(substr(text, greatest(1, length(text) - 63), 64)) AS tail_fp
      FROM documents ORDER BY doc_id"""))

  /** m04 — modality routing by MAGIC BYTES: payloads get real file-format
    * signatures (PNG / RIFF-WAV / MP4 ftyp) prepended by the generator
    * rule, and the query re-derives the modality by sniffing the leading
    * bytes of the binary column — the first thing a media-lake ingest does
    * to mixed blobs. The oracle computes modality from the generating rule
    * instead of the bytes, so the check proves the sniffer reads the right
    * bytes back. Narrow per-row binary work + one tiny rollup.
    */
  private val m04 = Q(
    "m04_magic_sniff",
    (s, d) => {
      import s.implicits._
      // Real container layouts: PNG's full 8-byte signature at offset 0;
      // WAV is 'RIFF' + chunk size + 'WAVE' (format tag at offset 8); MP4
      // is a 4-byte big-endian box size, then 'ftyp' at offset 4 and the
      // brand at 8 — the signature is NOT at offset 0, which is exactly
      // what naive sniffers get wrong.
      val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
      val wav = "RIFF".getBytes("UTF-8") ++ Array[Byte](0, 0, 0, 0) ++
        "WAVE".getBytes("UTF-8")
      val mp4 = Array[Byte](0, 0, 0, 0x18) ++ "ftypisom".getBytes("UTF-8")
      val magic = when($"doc_id" % 3 === 0, lit(png))
        .when($"doc_id" % 3 === 1, lit(wav))
        .otherwise(lit(mp4))
      val assets = T(s, d, "documents")
        .select($"doc_id",
          concat(magic, encode($"text", "UTF-8")).as("payload"))
      val sniffed = assets.select($"doc_id", $"payload",
        when(substring($"payload", 1, 8) === lit(png), "image/png")
          .when(substring($"payload", 1, 4) === lit("RIFF".getBytes("UTF-8")) &&
            substring($"payload", 9, 4) === lit("WAVE".getBytes("UTF-8")), "audio/wav")
          .when(substring($"payload", 5, 4) === lit("ftyp".getBytes("UTF-8")), "video/mp4")
          .otherwise("unknown").as("modality"))
      sniffed.groupBy($"modality")
        .agg(count(lit(1)).as("n_assets"),
          sum(length($"payload").cast(LongType)).as("total_bytes"))
        .orderBy($"modality")
    },
    Some("""
      SELECT CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 'image/png'
               WHEN 1 THEN 'audio/wav'
               ELSE 'video/mp4' END AS modality,
        COUNT(*) AS n_assets,
        CAST(SUM(octet_length(encode(text)) +
                 CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 8 ELSE 12 END)
             AS BIGINT) AS total_bytes
      FROM documents
      GROUP BY modality ORDER BY modality"""))

  /** m05 — SHARD PACKING (webdataset/tar-shard export): assign each
    * asset, in deterministic doc_id order within its modality, to a
    * fixed-byte-budget shard — shard = floor(bytes_before / budget), the
    * byte-level twin of p26's token-level sequence packing. The output is
    * the shard manifest a tar-writer consumes: per shard, the asset
    * count, payload bytes, id range, and fill ratio. Training loaders
    * (webdataset et al.) want shards of near-equal BYTES, not equal
    * counts — media sizes vary by orders of magnitude, so count-balanced
    * shards starve loader workers.
    *
    * 100 TB shape: one window per modality — a range-partitioned prefix
    * sum over asset sizes (partition by the shard key; no global sort),
    * then a rollup on (modality, shard_id). The actual tar write is the
    * partition-batch m02 shape: repartition by shard_id, write each
    * partition's members sequentially. Straddling assets keep their
    * start shard (same contract as p26).
    */
  private val m05 = Q(
    "m05_shard_packing",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val budget = 4096L
      val w = Window.partitionBy($"modality").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      T(s, d, "documents")
        .select($"doc_id",
          element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
            ($"doc_id" % 3 + 1).cast(IntegerType)).as("modality"),
          length(encode($"text", "UTF-8")).cast(LongType).as("n_bytes"))
        .withColumn("bytes_before",
          coalesce(sum($"n_bytes").over(w), lit(0L)))
        .withColumn("shard_id", expr(s"bytes_before div $budget"))
        .groupBy($"modality", $"shard_id")
        .agg(count(lit(1)).as("n_assets"),
          sum($"n_bytes").as("shard_bytes"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
        .withColumn("fill_ratio",
          dec($"shard_bytes".cast(DoubleType) / lit(budget.toDouble), 18, 6))
        .orderBy($"modality", $"shard_id")
    },
    Some("""
      WITH a AS (
        SELECT doc_id,
          CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
            WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS modality,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents),
      t AS (
        SELECT modality, doc_id, n_bytes,
          CAST(COALESCE(SUM(n_bytes) OVER (PARTITION BY modality
            ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) AS BIGINT) AS bytes_before
        FROM a)
      SELECT modality, CAST(bytes_before // 4096 AS BIGINT) AS shard_id,
        COUNT(*) AS n_assets, CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
        MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
        CAST(CAST(SUM(n_bytes) AS DOUBLE) / 4096.0 AS DECIMAL(18,6))
          AS fill_ratio
      FROM t GROUP BY modality, bytes_before // 4096
      ORDER BY modality, shard_id"""))

  /** m06 — contrastive pair manifest: build (image, caption) training
    * pairs the way an image-text curation stack does — image assets join
    * caption documents on a shared pair key, captions below the quality
    * floor (8 tokens, the p20 gate) drop the whole pair, and the manifest
    * carries content addresses (image sha256, caption md5), not payloads.
    * Pairing key here is doc_id div 3 (the i-th image with the i-th
    * caption under the modality layout of m01). Scale shape: one
    * co-partitioned equi-join on the pair key + a narrow gate — payload
    * bytes never move, only digests do.
    */
  private val m06 = Q(
    "m06_pair_manifest",
    (s, d) => {
      import s.implicits._
      val docs = T(s, d, "documents").select($"doc_id", $"text")
      val img = docs.filter($"doc_id" % 3 === 0)
        .select(expr("doc_id div 3").as("pair_id"),
          sha2($"text".cast(BinaryType), 256).as("image_sha"),
          length(encode($"text", "UTF-8")).cast(LongType).as("image_bytes"))
      val cap = docs.filter($"doc_id" % 3 === 1)
        .select(expr("doc_id div 3").as("pair_id"),
          md5($"text").as("caption_digest"),
          size(split($"text", " ")).as("caption_tokens"))
      img.join(cap, "pair_id")
        .filter($"caption_tokens" >= 8)
        .select($"pair_id", $"image_sha", $"image_bytes",
          $"caption_digest", $"caption_tokens")
        .orderBy($"pair_id")
    },
    Some("""
      WITH img AS (
        SELECT doc_id // 3 AS pair_id, sha256(text) AS image_sha,
          CAST(octet_length(encode(text)) AS BIGINT) AS image_bytes
        FROM documents WHERE doc_id % 3 = 0),
      cap AS (
        SELECT doc_id // 3 AS pair_id, md5(text) AS caption_digest,
          CAST(length(string_split(text, ' ')) AS INT) AS caption_tokens
        FROM documents WHERE doc_id % 3 = 1)
      SELECT pair_id, image_sha, image_bytes, caption_digest, caption_tokens
      FROM img JOIN cap USING (pair_id)
      WHERE caption_tokens >= 8
      ORDER BY pair_id"""))

  /** m07 — perceptual-hash near-dup groups over REAL decoded pixels: the
    * multimodal form of the MinHash-LSH dedup topology. Each image asset's
    * BMP bytes are decoded (real container parse, `Media.MediaCodec`) and
    * perceptually hashed with a genuine integer DCT pHash
    * (`Media.PHash.phash64`: 2×2 mean-pool to 8×8, 8×8 DCT-II with a
    * 10⁶-quantized cosine basis, one bit per above-mean AC coefficient —
    * exact integer arithmetic end to end, so the DuckDB oracle re-derives
    * the identical 63-bit hash from the pixel generation rule and the SAME
    * inlined cosine table). Hashes band into 4 × 15-bit bands; assets
    * sharing a band bucket become candidates, each verified by Hamming
    * distance (is_near ⟺ bit_count(xor) ≤ 14 — candidates AND verdicts
    * both emitted, the audit-friendly form). Output is the STAR form —
    * every member pairs with its bucket's min-id canonical — so output
    * stays LINEAR in asset count even when a 100 TB lake holds million-way
    * duplicate families (the p17 lesson; all-pairs is the p08 quadratic
    * class).
    *
    * 100 TB shape: decode+hash is narrow per-partition work (payload bytes
    * never shuffle — only 8-byte hashes do); one shuffle on the
    * (band, value) bucket key; the canonical's hash rejoins by id; the
    * Hamming verify is codegen'd integer xor+bit_count.
    */
  private val m07 = Q(
    "m07_phash_neardup",
    (s, d) => {
      import s.implicits._
      val ids = T(s, d, "documents")
        .filter($"doc_id" % 3 === 0).select($"doc_id").as[Long]
      val assets = ids.mapPartitions(_.map { id =>
        val (w, h, px) = Media.MediaCodec.decodeBmp(Media.MediaGen.bmp(id))
        (id, Media.PHash.phash64(w, h, px))
      }).toDF("doc_id", "phash")
      val bands = assets.select($"doc_id", $"phash",
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("bidx"),
            shiftright($"phash", 15 * i).bitwiseAND(lit(0x7fffL)).as("bval"))): _*))
          .as("b"))
        .select($"doc_id", $"phash",
          $"b.bidx".as("bidx"), $"b.bval".as("bval"))
      val heads = bands.groupBy($"bidx", $"bval")
        .agg(min($"doc_id").as("canon_id"))
      val canonHash = assets
        .select($"doc_id".as("canon_id"), $"phash".as("canon_phash"))
      bands.join(heads, Seq("bidx", "bval"))
        .filter($"doc_id" > $"canon_id")
        .join(canonHash, Seq("canon_id"))
        .select(lit("image/bmp").as("modality"), $"canon_id",
          $"doc_id".as("member_id"),
          bit_count($"phash".bitwiseXOR($"canon_phash")).cast(LongType)
            .as("hamming"))
        .distinct()
        .withColumn("is_near", $"hamming" <= 14)
        .orderBy($"canon_id", $"member_id")
    },
    Some(s"""
      WITH ct(k, n, c) AS (VALUES ${Media.PHash.cosTableSql}),
      imgs AS (
        SELECT doc_id, (doc_id // 3) % 40 AS cl, (doc_id // 120) % 61 AS vr
        FROM documents WHERE doc_id % 3 = 0),
      px AS (
        SELECT i.doc_id, r.r, c.c,
          CAST((i.cl * 41 + r.r * 7 + c.c * 13) % 240 +
            CASE WHEN (r.r * 16 + c.c) % 61 = i.vr THEN 15 ELSE 0 END
            AS BIGINT) AS v
        FROM imgs i, UNNEST(range(0, 16)) r(r), UNNEST(range(0, 16)) c(c)),
      pooled AS (
        SELECT doc_id, r // 2 AS pr, c // 2 AS pc,
          CAST(SUM(v) // 4 AS BIGINT) AS pv
        FROM px GROUP BY doc_id, r // 2, c // 2),
      dct AS (
        SELECT p.doc_id, a.k AS u, b.k AS v,
          CAST(SUM(p.pv * a.c * b.c) AS BIGINT) AS coef
        FROM pooled p JOIN ct a ON a.n = p.pr JOIN ct b ON b.n = p.pc
        GROUP BY p.doc_id, a.k, b.k),
      acs AS (
        SELECT doc_id, CAST(SUM(coef) AS BIGINT) AS ac FROM dct
        WHERE NOT (u = 0 AND v = 0) GROUP BY doc_id),
      ph AS (
        SELECT d.doc_id,
          CAST(SUM(CASE WHEN 63 * d.coef > s.ac
            THEN (CAST(1 AS BIGINT) << (d.u * 8 + d.v - 1))
            ELSE 0 END) AS BIGINT) AS phash
        FROM dct d JOIN acs s USING (doc_id)
        WHERE NOT (d.u = 0 AND d.v = 0) GROUP BY d.doc_id),
      bands AS (
        SELECT doc_id, phash, t.i AS bidx, (phash >> (15 * t.i)) & 32767 AS bval
        FROM ph, UNNEST(range(0, 4)) t(i)),
      heads AS (
        SELECT bidx, bval, MIN(doc_id) AS canon_id
        FROM bands GROUP BY bidx, bval)
      SELECT DISTINCT 'image/bmp' AS modality, h.canon_id,
        b.doc_id AS member_id,
        CAST(bit_count(xor(b.phash, c.phash)) AS BIGINT) AS hamming,
        bit_count(xor(b.phash, c.phash)) <= 14 AS is_near
      FROM bands b
      JOIN heads h ON h.bidx = b.bidx AND h.bval = b.bval
        AND b.doc_id > h.canon_id
      JOIN ph c ON c.doc_id = h.canon_id
      ORDER BY canon_id, member_id"""))

  val all: Seq[Q] = Seq(m01, m02, m03, m04, m05, m06, m07)
}
