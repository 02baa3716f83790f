package graft.tools
import org.apache.hadoop.fs.Path
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("probe", 2)
    val conf = spark.sessionState.newHadoopConf()
    val f = new Path(args(0))
    val fs = f.getFileSystem(conf)
    // call the internals without the catch
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, fs.getConf))
    println("footer blocks: " + reader.getFooter.getBlocks.size())
    println(graft.delta.ParquetStats.forFile(fs, f, Set("date")))
    spark.stop()
  }
}
