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
  * partition count, so `repartition(n)` sizes the output. */
object AvroContainerFiles {

  def write(df: DataFrame, dir: String, schemaJson: String): Unit = {
    val jsons = df
      .select(to_json(struct(df.columns.toSeq.map(col): _*)).as("j"))
      .selectExpr("j").as(org.apache.spark.sql.Encoders.STRING)
    jsons.foreachPartition { (it: Iterator[String]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val out = new org.apache.hadoop.fs.Path(dir,
          s"part-${java.util.UUID.randomUUID()}.avro")
        val fs = out.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val os = fs.create(out, false)
        val w = new DataFileWriter[AnyRef](new GenericDatumWriter[AnyRef](schema))
        w.create(schema, os)
        try {
          val reader = new GenericDatumReader[AnyRef](schema)
          it.foreach { j =>
            w.append(reader.read(null, DecoderFactory.get().jsonDecoder(schema, j)))
          }
        } finally w.close()
      }
    }
  }
}
