package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Shallow clone: zero-copy fork via absolute-path add references;
  * clone DML never touches the source; DVs ride as absolute "p"
  * descriptors. */
class ShallowCloneSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType)))

  private def df(ids: Range) = ids.map(i => (i.toLong, s"v$i")).toDF("id", "v")

  private def parquetCount(dir: String): Int = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    def walk(p: Path): Int =
      if (!fs.exists(p)) 0
      else fs.listStatus(p).map { st =>
        if (st.isDirectory) {
          if (st.getPath.getName == "_delta_log") 0 else walk(st.getPath)
        } else if (st.getPath.getName.endsWith(".parquet") &&
          !st.getPath.toString.contains("_delta_log")) 1
        else 0
      }.sum
    walk(new Path(dir))
  }

  test("clone copies zero data files; reads equal the source; DML isolates") {
    val src = DeltaTable.forPath(spark, tmpDir("clone-src")).create(schema)
    src.append(df(0 until 100))
    src.append(df(100 until 150))
    val cloneDir = tmpDir("clone-dst")
    val clone = src.shallowCloneTo(cloneDir + "/t")
    assert(parquetCount(cloneDir + "/t") === 0, "a SHALLOW clone must copy nothing")
    assert(clone.toDF.count() === 150L)
    assert(clone.toDF.orderBy("id").collect()(7).getString(1) === "v7")
    // stats rode along: log-only count answers without opening parquet
    assert(clone.statsSummary(Seq("id")).collect()(0).getLong(0) === 150L)
    // DML on the clone: local rewrite + log-level remove of the reference
    assert(clone.delete(col("id") < 50) > 0L)
    assert(clone.toDF.count() === 100L)
    assert(src.toDF.count() === 150L, "the source must never observe clone DML")
    // appends land locally
    clone.append(df(1000 until 1010))
    assert(clone.toDF.count() === 110L && src.toDF.count() === 150L)
    // re-clone refuses over an existing table
    assertThrows[IllegalArgumentException](src.shallowCloneTo(cloneDir + "/t"))
  }

  test("deletion vectors ride the clone as absolute descriptors") {
    val src = DeltaTable.forPath(spark, tmpDir("clone-dv-src")).create(schema, Nil,
      configuration = Map(DeltaTable.DvConfigKey -> "true"))
    src.append(df(0 until 3000)) // big enough for a file-backed DV
    src.deleteWithDv(col("id") % 2 === 0)
    val clone = src.shallowCloneTo(tmpDir("clone-dv-dst") + "/t")
    val dv = clone.snapshot.files.flatMap(_.deletionVector)
    assert(dv.nonEmpty && dv.forall(d => d.storageType == "p" || d.storageType == "i"))
    assert(clone.toDF.count() === 1500L, "the clone subtracts the source's DV")
    assert(clone.toDF.filter(col("id") % 2 === 0).count() === 0L)
  }

  test("partitioned sources refuse loudly") {
    val src = DeltaTable.forPath(spark, tmpDir("clone-part-src"))
      .create(schema, Seq("v"))
    src.append(df(0 until 4))
    assertThrows[IllegalArgumentException](
      src.shallowCloneTo(tmpDir("clone-part-dst") + "/t"))
  }
}
