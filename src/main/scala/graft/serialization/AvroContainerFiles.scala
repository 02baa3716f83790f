package graft.serialization

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, struct, to_json}

/** Distributed writer of Avro object-container files from a DataFrame —
  * the encode twin of COPY INTO `FILEFORMAT = AVRO` (no spark-avro
  * DataSource jar exists in this environment, so both directions ride
  * graft's own avro layer; cf. the reference's Avro-first serialization
  * surface, `/root/reference/src/serialization.rs:212-441`).
  *
  * One container file per non-empty partition, written through Hadoop
  * [[org.apache.hadoop.fs.FileSystem]] (local or DFS). Records convert
  * from each row's PLAIN JSON encoding under `schemaJson` via avro's
  * JsonDecoder — use non-union, non-null writer schemas (the
  * reference's fixture discipline): a null field is OMITTED by to_json
  * and the decoder then fails loudly rather than writing a torn record.
  *
  * Scale: a pure executor-side foreachPartition — no driver collect,
  * no whole-file buffering (DataFileWriter streams); file count =
  * partition count, so `repartition(n)` sizes the output.
  *
  * Task-failure discipline: each task streams into a HIDDEN temp file
  * (`.part-*.tmp` — every graft reader, and COPY INTO's listing, skips
  * dot-files) and renames into a DETERMINISTIC per-partition name only
  * on success. A task that dies mid-write leaves only invisible temp
  * litter; its retry re-derives the same partition and the
  * delete-then-rename replaces whatever a previous attempt landed —
  * no duplicated records, no torn container ever visible under the
  * final name. */
object AvroContainerFiles {

  def write(df: DataFrame, dir: String, schemaJson: String): Unit = {
    val jsons = df
      .select(to_json(struct(df.columns.toSeq.map(col): _*)).as("j"))
      .selectExpr("j").as(org.apache.spark.sql.Encoders.STRING)
    jsons.foreachPartition { (it: Iterator[String]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val fin = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.avro")
        val tmp = new org.apache.hadoop.fs.Path(dir,
          f".part-$pid%05d-${java.util.UUID.randomUUID()}.avro.tmp")
        val fs = fin.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val os = fs.create(tmp, false)
        val w = new DataFileWriter[AnyRef](new GenericDatumWriter[AnyRef](schema))
        w.create(schema, os)
        try {
          val reader = new GenericDatumReader[AnyRef](schema)
          it.foreach { j =>
            w.append(reader.read(null, DecoderFactory.get().jsonDecoder(schema, j)))
          }
        } finally w.close()
        fs.delete(fin, false): Unit // a prior attempt's complete twin
        if (!fs.rename(tmp, fin)) {
          fs.delete(tmp, false): Unit
          throw new java.io.IOException(s"atomic rename to $fin failed")
        }
      }
    }
  }
}
