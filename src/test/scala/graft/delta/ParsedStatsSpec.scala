package graft.delta

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.delta.Actions.{AddFile, ParsedStats}
import graft.delta.DataSkipping.ColPred

/** Checkpoint `stats_parsed` (delta-spark's acceleration struct): the
  * stats JSON decodes ONCE at checkpoint-write time into a typed struct;
  * cold reads prune from it without re-parsing JSON. Contracts:
  * cold-read parity with the JSON history burned away, pruning from
  * parsed stats ALONE, preference over the JSON, and legacy checkpoints
  * (no struct) reading exactly as before. */
class ParsedStatsSpec extends SparkSpec {
  import spark.implicits._

  test("cold read from a stats_parsed checkpoint: burned JSONs, identical answers, typed pruning") {
    val dir = tmpDir("pstats-cold")
    val rows = (0L until 90L).map { i =>
      (i, s"name$i", i * 1.5,
        new Timestamp(1700000000000L + i * 3600_000L),
        Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        (i % 3).toString)
    }.toDF("id", "name", "score", "ts", "d", "p")
    val t = DeltaTable.forPath(spark, dir).create(rows.schema, Seq("p"))
    // three appends with DISJOINT id ranges → three prunable file groups
    (0 until 3).foreach(g => t.append(
      rows.filter(col("id") >= g * 30L && col("id") < (g + 1) * 30L).coalesce(1)))
    val before = t.scan(Seq(ColPred("id", "<", 25L))).orderBy("id").collect().toSeq
    val v = t.snapshot.version
    t.log.checkpointAt(v)
    t.log.cleanupMetadata(v)
    // the burned history proves the cold read runs from the checkpoint
    assert(!new java.io.File(s"$dir/_delta_log/${"%020d".format(1L)}.json").exists())
    val cold = DeltaTable.forPath(spark, dir)
    val snap = cold.snapshot
    assert(snap.files.nonEmpty && snap.files.forall(_.parsedStats.isDefined),
      "every checkpoint-replayed add carries the parsed struct")
    // typed values decoded: longs, strings, timestamps, dates
    val ps = snap.files.map(f => f.parsedStats.get).sortBy(_.minValues("id").toString)
    assert(ps.head.numRecords.isDefined && ps.head.numRecords.get > 0L)
    assert(ps.head.minValues("id").isInstanceOf[java.lang.Long])
    assert(ps.head.minValues("name").isInstanceOf[String])
    assert(ps.head.minValues("ts").isInstanceOf[Timestamp])
    assert(ps.head.minValues("d").isInstanceOf[Date])
    // answers identical to the warm pre-checkpoint read
    val after = cold.scan(Seq(ColPred("id", "<", 25L))).orderBy("id").collect().toSeq
    assert(after === before)
    // and the parsed stats PRUNE: only the first id-range's files survive
    // (one per partition dir)
    val survivors = cold.scanFiles(Seq(ColPred("id", "<", 25L)))
    assert(survivors.size < snap.files.size)
    assert(survivors.forall(f => f.parsedStats.get.minValues("id")
      .asInstanceOf[java.lang.Long] < 25L))
    // timestamp predicates prune from the typed bound too
    val tsPred = ColPred("ts", "<", new Timestamp(1700000000000L + 20L * 3600_000L))
    assert(cold.scanFiles(Seq(tsPred)).size < snap.files.size)
    assert(cold.scan(Seq(tsPred)).count() ===
      rows.filter(col("ts") < lit(new Timestamp(1700000000000L + 20L * 3600_000L))).count())
  }

  test("pruning consumes parsed stats alone and prefers them over the JSON") {
    // stats JSON and parsed struct DISAGREE: the JSON claims [0, 100]
    // (would keep), the parsed struct [1000, 2000] (prunes) — preference
    // is observable
    val poisoned = AddFile(path = "a.parquet",
      stats = Some("""{"numRecords":5,"minValues":{"x":0},"maxValues":{"x":100}}"""))
      .withParsedStats(Some(ParsedStats(Some(5L),
        Map("x" -> java.lang.Long.valueOf(1000L)),
        Map("x" -> java.lang.Long.valueOf(2000L)), Map.empty)))
    // no JSON at all: parsed stats carry the whole decision
    val parsedOnly = AddFile(path = "b.parquet", stats = None)
      .withParsedStats(Some(ParsedStats(Some(5L),
        Map("x" -> java.lang.Long.valueOf(1L)),
        Map("x" -> java.lang.Long.valueOf(9L)), Map.empty)))
    val meta = Actions.Metadata(id = "m", schemaString = StructType(Seq(
      StructField("x", LongType))).json)
    val snap = Snapshot(0L, Some(meta), Seq(poisoned, parsedOnly), Map.empty)
    val kept = DataSkipping.prune(snap, Seq(ColPred("x", "<", 10L))).map(_.path)
    assert(kept === Seq("b.parquet"),
      s"parsed bounds must prune a.parquet and keep b.parquet, got $kept")
    // absent parsed stats: the JSON path still rules (fallback intact)
    val jsonOnly = AddFile(path = "c.parquet",
      stats = Some("""{"numRecords":5,"minValues":{"x":50},"maxValues":{"x":60}}"""))
    val snap2 = Snapshot(0L, Some(meta), Seq(jsonOnly), Map.empty)
    assert(DataSkipping.prune(snap2, Seq(ColPred("x", ">", 70L))).isEmpty)
    assert(DataSkipping.prune(snap2, Seq(ColPred("x", ">", 55L))).map(_.path) === Seq("c.parquet"))
  }

  test("legacy checkpoints without stats_parsed read exactly as before") {
    val dir = tmpDir("pstats-legacy")
    val df = (0L until 40L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = DeltaTable.forPath(spark, dir).create(df.schema)
    t.append(df.filter(col("id") < 20L).coalesce(1))
    t.append(df.filter(col("id") >= 20L).coalesce(1))
    val v = t.snapshot.version
    t.log.checkpointAt(v)
    // strip the acceleration struct, simulating a checkpoint written by a
    // pre-round-16 engine (or any foreign writer)
    val ckPath = s"$dir/_delta_log/${"%020d".format(v)}.checkpoint.parquet"
    val stripped = spark.read.parquet(ckPath)
      .withColumn("add", col("add").dropFields("stats_parsed"))
    val tmp = tmpDir("pstats-legacy-tmp")
    stripped.coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    fs.delete(new org.apache.hadoop.fs.Path(ckPath), false)
    fs.rename(part, new org.apache.hadoop.fs.Path(ckPath))
    t.log.cleanupMetadata(v)
    val cold = DeltaTable.forPath(spark, dir)
    assert(cold.snapshot.files.forall(_.parsedStats.isEmpty))
    assert(cold.toDF.count() === 40L)
    // JSON-stats pruning still works on the legacy form
    assert(cold.scanFiles(Seq(ColPred("id", "<", 5L))).size === 1)
    assert(cold.scan(Seq(ColPred("id", "<", 5L))).count() === 5L)
  }
}
