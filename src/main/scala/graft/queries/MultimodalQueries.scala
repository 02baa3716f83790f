package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Hashing
import graft.ops.Multimodal

/** Multimodal column operators as driver-verified queries. The `documents`
  * payload stands in for the media bytes (same UTF-8 bytes in both
  * engines), and every derived value is md5-based, so the decode-header
  * stub, feature hashing, and frame sampling are hash-checked end to end
  * — the plumbing a real codec plugs into (graft.ops.Multimodal).
  */
object MultimodalQueries extends QueryModule {

  private def hx = "md5(text)"

  def defs: Map[String, QueryDef] = Map(
    "mm_meta" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val (w, h, c) = Multimodal.fakeMeta(col("text").cast("binary"))
        docs.select(col("doc_id"), w.as("width"), h.as("height"), c.as("channels"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
              |  64 + (${Hashing.h64Sql(hx, "w")} % 576) AS width,
              |  64 + (${Hashing.h64Sql(hx, "h")} % 416) AS height,
              |  1 + (${Hashing.h64Sql(hx, "c")} % 3) AS channels
              |FROM documents ORDER BY doc_id""".stripMargin)),

    "mm_features" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val hxc = md5(col("text").cast("binary"))
        def f(i: Int) =
          (Hashing.h64(hxc, s"feat:$i") % 1000000L).cast("double") / 1000000.0
        val checksum = (0 until 16).map(i => Hashing.h64(hxc, s"feat:$i") % 1000000L)
          .reduce(_ + _)
        docs.select(col("doc_id"), f(0).as("f0"), f(7).as("f7"), f(15).as("f15"),
            checksum.as("checksum"))
          .orderBy(col("doc_id"))
      },
      {
        def f(i: Int) = s"CAST((${Hashing.h64Sql(hx, s"feat:$i")} % 1000000) AS DOUBLE) / 1000000.0"
        val checksum = (0 until 16)
          .map(i => s"(${Hashing.h64Sql(hx, s"feat:$i")} % 1000000)").mkString(" + ")
        Some(s"""SELECT doc_id, ${f(0)} AS f0, ${f(7)} AS f7, ${f(15)} AS f15,
                |  ($checksum) AS checksum
                |FROM documents ORDER BY doc_id""".stripMargin)
      }),

    "mm_frames" -> QueryDef(
      (s, d) =>
        Multimodal.sampleFrames(Tables.documents(s, d), "doc_id", "text",
            frameBytes = 256, stride = 4)
          .orderBy(col("asset_id"), col("frame_idx")),
      Some("""WITH n AS (
             |  SELECT doc_id, text,
             |    greatest(CAST(ceil(length(text) / 256.0) AS BIGINT), 1) AS nf
             |  FROM documents
             |), ex AS (
             |  SELECT doc_id, text, unnest(range(0, nf)) AS frame_idx FROM n
             |)
             |SELECT doc_id AS asset_id, frame_idx,
             |  md5(substring(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS frame_hash
             |FROM ex WHERE frame_idx % 4 = 0
             |ORDER BY asset_id, frame_idx""".stripMargin))
  )
}
