package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column plumbing (builder prompt north star): media as
  * opaque `binary` payloads beside a typed metadata struct, with
  * decode/feature-extraction as partition-batch functions. The real
  * image/audio codecs are not in this environment, so the decode step is
  * a clearly-marked DETERMINISTIC FAKE ([[fakeDecode]]) — the Spark-side
  * contract (schema, binary column, partition batching, feature-vector
  * shape) is real and tested.
  *
  * Scale design:
  *  - Payloads stay opaque bytes end-to-end; Spark never interprets
  *    them, so the scan is a straight parquet binary read and the only
  *    per-row cost is the extractor itself.
  *  - Extraction runs via mapPartitions on a typed Dataset — one
  *    function invocation per PARTITION, not per row (the JVM analog of
  *    arrow-batched pandas UDFs): codec/session setup amortizes across
  *    the batch, the iterator streams without materializing the
  *    partition, and output rows carry only compact features.
  *  - No shuffle anywhere before the output ordering.
  */
object Multimodal {

  /** Typed rows for the extractor stage. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], format: String, width: Long)
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, histogram: Array[Double])

  /** documents → media table: utf8 bytes as the opaque payload plus a
    * metadata struct (format/width/source) — the schema a real
    * image/audio table would carry. */
  def media(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("utf8-text").as("format"),
        col("n_chars").as("width"),
        col("source").as("source")).as("meta"))

  /** FAKE DECODE — deterministic stand-in for an image/audio codec:
    * 16-bucket byte histogram, L1-normalized. A real deployment swaps
    * this body for the codec call; the partition-batch contract and
    * output shape stay identical. */
  def fakeDecode(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    payload.foreach(b => hist((b & 0xFF) / 16) += 1.0)
    val n = math.max(1.0, payload.length.toDouble)
    hist.map(_ / n)
  }

  /** Partition-batched feature extraction over the typed Dataset. */
  def extractFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    media(s, dir)
      .select(col("doc_id"), col("payload"),
        col("meta.format").as("format"), col("meta.width").as("width"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition setup would open the codec ONCE here
        rows.map(r => MediaFeatures(r.doc_id, r.payload.length, fakeDecode(r.payload)))
      }
      .toDF()
  }

  /** Binary-column scalar surface — oracle-checked: byte length, first
    * byte, payload digest all computed on the binary payload (DuckDB
    * mirrors via encode()/octet_length; md5 of the blob equals md5 of
    * the utf8 text it encodes). */
  val q55BinaryMeta: Q = Q.sql(
    "q55_binary_meta",
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  ascii(substr(text, 1, 1)) AS first_byte,
      |  md5(text) AS payload_md5,
      |  length(text) AS width
      |FROM documents
      |ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    media(s, dir)
      .select(
        col("doc_id"),
        length(col("payload")).as("n_bytes"), // length(binary) = byte count
        ascii(col("payload").cast("string")).as("first_byte"),
        md5(col("payload")).as("payload_md5"),
        col("meta.width").as("width"))
      .orderBy(col("doc_id"))
  }

  /** Histogram features via the mapPartitions extractor — oracle-paired:
    * the fake decode is a deterministic 16-bucket byte histogram, which
    * DuckDB replays from character codes (the corpus is pure ASCII —
    * verified octet_length(encode(text)) == length(text) at every sf —
    * so char code == byte value and char count == byte count). Each
    * bucket fraction is the same exact double cnt/n in both engines;
    * round(...,9) absorbs summation-order differences in h_sum.
    * Bench-included: the extractor IS the workload a media pipeline
    * times. */
  val q56MediaFeatures: Q = Q.sql(
    "q56_media_features",
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  round(len(list_filter(codes, c -> c // 16 = 6)) / greatest(1.0, len(codes)), 9) AS h6,
      |  round(list_sum(list_transform(range(0, 16), b ->
      |    len(list_filter(codes, c -> c // 16 = b)) / greatest(1.0, len(codes)))), 9) AS h_sum
      |FROM (
      |  SELECT doc_id, text,
      |    list_transform(string_split_regex(text, ''), ch -> ascii(ch)) AS codes
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    extractFeatures(s, dir)
      .select(col("doc_id"), col("n_bytes"),
        round(element_at(col("histogram"), 7), 9).as("h6"),
        round(aggregate(col("histogram"), lit(0.0), (a, x) => a + x), 9).as("h_sum"))
      .orderBy(col("doc_id"))
  }

  private def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map(b => f"${b & 0xFF}%02x").mkString
  }

  final case class MediaResized(doc_id: Long, n_bytes_in: Int, n_bytes_out: Int, out_md5: String)
  final case class FrameSample(doc_id: Long, n_frames: Int, n_sampled: Int, sample_md5: String)

  /** FAKE RESIZE — stride-4 byte decimation, the codec-free stand-in for
    * an image downscale. Same partition-batch contract as [[fakeDecode]]:
    * a real deployment swaps the body for the codec call. */
  def fakeResize(payload: Array[Byte], stride: Int): Array[Byte] =
    Iterator.range(0, payload.length, stride).map(payload).toArray

  /** Resize over the media table (stride 4): emits output size + digest
    * so the oracle verifies the RESIZED BYTES, not just a count. */
  val q77MediaResize: Q = Q.sql(
    "q77_media_resize",
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes_in,
      |  len(range(1, length(text)+1, 4)) AS n_bytes_out,
      |  md5(array_to_string(list_transform(range(1, length(text)+1, 4),
      |      i -> substr(text, i, 1)), '')) AS out_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    media(s, dir)
      .select(col("doc_id"), col("payload"),
        col("meta.format").as("format"), col("meta.width").as("width"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val out = fakeResize(r.payload, 4)
          MediaResized(r.doc_id, r.payload.length, out.length, md5Hex(out))
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** FAKE FRAME-SAMPLE — treat the payload as a "video" of fixed 64-byte
    * frames and keep every 4th, the codec-free stand-in for keyframe
    * extraction. Digest of the concatenated sample proves frame
    * boundaries and order survived. */
  def fakeFrameSample(payload: Array[Byte], frameLen: Int, every: Int): (Int, Array[Array[Byte]]) = {
    val frames = payload.grouped(frameLen).toArray
    (frames.length, Iterator.range(0, frames.length, every).map(frames).toArray)
  }

  val q78FrameSample: Q = Q.sql(
    "q78_frame_sample",
    """SELECT doc_id,
      |  CAST((length(text) + 63) // 64 AS INTEGER) AS n_frames,
      |  len(range(0, (length(text) + 63) // 64, 4)) AS n_sampled,
      |  md5(array_to_string(list_transform(range(0, (length(text) + 63) // 64, 4),
      |      f -> substr(text, f*64 + 1, 64)), '')) AS sample_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    media(s, dir)
      .select(col("doc_id"), col("payload"),
        col("meta.format").as("format"), col("meta.width").as("width"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (n, sampled) = fakeFrameSample(r.payload, 64, 4)
          FrameSample(r.doc_id, n, sampled.length, md5Hex(sampled.flatten))
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** 64-bit perceptual DIFFERENCE hash (dHash — the aHash/pHash family's
    * robust member) of a media payload from its decoded signal profile:
    * bit b = (count of code 59+b) > (count of code 60+b). On real media
    * the decode is the codec's downsampled luma and the counts are pixel
    * buckets; here the deterministic fake decode reads byte codes, which
    * DuckDB replays exactly (pure-ASCII corpus: char code = byte value).
    * Row-local — 65 counting passes over the decoded array, no shuffle,
    * 8 bytes out per row. */
  private[graft] def dhashOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (doc, code-slot) grain: one explode + map-side-combined count beats
    // 65 row-local filter passes over every payload (measured 5.7s → ~1s
    // at sf0.1); the 65-slot dense axis (a 65-row broadcast grid, the
    // q96/q139 dense-axis idiom) restores zero-count slots so adjacent
    // comparisons see them, and the per-doc window runs over exactly 65
    // rows — never data-sized.
    val counts = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .select(col("doc_id"), (ascii(col("ch")) - 59).as("b"))
      .filter(col("b") >= 0 && col("b") <= 64)
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("cnt"))
    val slots = docs.sparkSession.range(0, 65)
      .select(col("id").cast("int").as("b"))
    val dense = docs.select(col("doc_id"))
      .crossJoin(broadcast(slots))
      .join(counts, Seq("doc_id", "b"), "left")
      .select(col("doc_id"), col("b"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("b"))
    dense.withColumn("nxt", lead(col("cnt"), 1).over(w))
      .filter(col("b") < 64)
      .groupBy(col("doc_id"))
      .agg(sum(when(col("cnt") > col("nxt"),
        expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(lit(0L))).as("h"))
  }

  /** Perceptual-duplicate groups — the media twin of q24's byte-exact
    * dedup: payloads whose DECODED content profile hashes identically
    * are re-encodings/mutations of the same underlying media even when
    * the bytes differ. Group-grain report (h, n_docs, first_doc), one
    * map-side-combined aggregation at 64-bit hash grain; no doc-doc
    * pairing anywhere (the q24/q128 discipline — pair joins over
    * near-uniform perceptual hashes are the O(N²) trap). For banded
    * Hamming-distance matching of DISCRIMINATIVE hashes, q70's
    * pigeonhole machinery applies unchanged to this hash column. */
  val q187PhashGroups: Q = Q.sql(
    "q187_phash_groups",
    """WITH codes AS (
      |  SELECT doc_id, list_transform(string_split_regex(text, ''), ch -> ascii(ch)) AS cs
      |  FROM documents),
      |cnts AS (
      |  SELECT doc_id, list_transform(range(0, 65), i ->
      |    len(list_filter(cs, c -> c = 59 + i))) AS cn
      |  FROM codes),
      |bits AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(range(0, 64), b ->
      |      CASE WHEN cn[b+1] > cn[b+2] THEN 1::BIGINT << b ELSE 0 END)) AS BIGINT) AS h
      |  FROM cnts)
      |SELECT h, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS first_doc
      |FROM bits GROUP BY h HAVING count(*) >= 2
      |ORDER BY h""".stripMargin
  ) { (s, dir) =>
    dhashOf(Tables.documents(s, dir))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("h"))
  }

  val all: Seq[Q] = Seq(q55BinaryMeta, q56MediaFeatures, q77MediaResize, q78FrameSample,
    q187PhashGroups)
}
