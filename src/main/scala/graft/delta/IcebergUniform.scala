package graft.delta

import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.{Schema => AvroSchema}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

/** UniForm-style ICEBERG METADATA MIRROR for a graft Delta table —
  * delta-spark's "Universal Format" idea (Delta remains the source of
  * truth; Iceberg snapshot/manifest metadata is written alongside the
  * `_delta_log` so Iceberg-reader engines can see the SAME parquet files
  * without a copy). At 100 TB, cross-engine interop without rewriting
  * the data is the entire point: the data files are shared, only
  * kilobytes of metadata are mirrored.
  *
  * [[sync]] materializes one Iceberg v2 snapshot describing the CURRENT
  * Delta snapshot's live file set:
  *
  *  - `metadata/vN.metadata.json` — table metadata (schema with
  *    assigned field-ids, identity partition spec, snapshot list,
  *    snapshot-log/metadata-log) per the Iceberg table-spec layout;
  *  - `metadata/snap-<id>-<uuid>.avro` — the manifest list (one
  *    `manifest_file` entry per manifest);
  *  - `metadata/<uuid>-m0.avro` — the snapshot's NEW manifest. When
  *    every Delta commit since the prior mirrored version is
  *    append-only (adds, no removes — determined from the commit JSONs,
  *    cost ∝ the change), the new manifest holds ONLY the appended
  *    files and the manifest list carries the prior snapshot's
  *    manifests forward verbatim (summary operation "append") — with
  *    auto-sync on every commit, per-commit mirror cost is then ∝ the
  *    commit, not the table. Deletes/rewrites, aged-out commit JSONs,
  *    or the manifest count reaching `graft.uniform.maxManifests`
  *    (spark conf, default 8 — the compaction bound on reader fan-out)
  *    fall back to one full-state manifest of every live file (summary
  *    "overwrite");
  *  - `metadata/version-hint.text` — the HadoopTables current-version
  *    pointer.
  *
  * Mapping choices (documented contract):
  *  - Iceberg snapshot-id = sequence-number = the DELTA VERSION — both
  *    monotone because Delta versions are; syncing twice at one Delta
  *    version is a no-op (idempotent, returns the existing file).
  *  - Field-ids assign depth-first over the Delta schema, 1-based —
  *    stable for an unchanged schema; a changed schema gets a fresh
  *    schema-id (last-column-id grows monotonically across syncs).
  *  - Tables with ACTIVE DELETION VECTORS refuse loudly: Iceberg
  *    readers cannot apply Delta DVs, so mirroring such a snapshot
  *    would resurrect deleted rows in the other engine. (delta-spark's
  *    UniForm blocks the same combination.) Purge DVs (OPTIMIZE /
  *    rewrite) before syncing.
  *  - Column-mapped tables refuse: partition directories carry PHYSICAL
  *    names there, and this mirror intentionally exports logical names.
  *  - Partition columns must be int/long/string/date typed (identity
  *    transform); Delta's string-encoded partitionValues convert to the
  *    typed Iceberg partition struct.
  *
  * VERIFICATION SCOPE: no Iceberg reader engine exists in this sandbox
  * (zero egress, no iceberg jars), so conformance is pinned
  * STRUCTURALLY by IcebergUniformSpec — the snapshot chain, manifest
  * list, and manifest entries round-trip through the avro/JSON layers
  * and list exactly the live files through append / DELETE / OPTIMIZE
  * lifecycles — and CANNOT be end-to-end verified against an external
  * reader here. Reference shapes: the Apache Iceberg table spec
  * (format v2) and delta-io/delta's IcebergConversionTransaction.
  * KNOWN LIMIT: the mirrored data files are plain Spark parquet with
  * NO embedded Iceberg field-ids (embedding them would rewrite data —
  * the copy UniForm exists to avoid), so by-id column resolution finds
  * nothing; the exported `schema.name-mapping.default` property is the
  * spec's sanctioned name-based fallback, and readers that honor it
  * (all current Iceberg engines do for imported parquet) resolve
  * correctly. */
object IcebergUniform {

  private val M = Actions.mapper // shared Jackson (same JSON discipline)

  /** Write (or advance) the Iceberg metadata mirror for `table`'s
    * current snapshot. Returns the absolute path of the current
    * `vN.metadata.json` (existing one when already in sync). */
  def sync(table: DeltaTable): String = {
    val snap = table.snapshot
    require(snap.version >= 0, s"no table at ${table.path}")
    val meta = snap.metadata.getOrElse(
      throw new IllegalStateException("snapshot carries no metadata"))
    require(snap.files.forall(_.deletionVector.isEmpty),
      "IcebergUniform.sync: table has active deletion vectors - an " +
        "Iceberg reader cannot apply them and would resurrect deleted " +
        "rows; purge DVs (OPTIMIZE/rewrite) before syncing")
    require(!meta.configuration.get("delta.columnMapping.mode")
        .exists(m => m != "none"),
      "IcebergUniform.sync: column-mapped tables are not mirrored " +
        "(partition dirs carry physical names; this export is logical)")

    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    val root = new Path(table.path)
    val fs = root.getFileSystem(conf)
    val metaDir = new Path(root, "metadata")
    fs.mkdirs(metaDir)

    val hint = new Path(metaDir, "version-hint.text")
    // a torn/unparsable/ABSENT hint recovers from the metadata listing
    // (the HadoopTables fallback): the hint write is delete-then-rename
    // (local-fs rename won't clobber), so a concurrent reader — or a
    // crash between the two — can observe no hint while vN.metadata.json
    // files exist; restarting the lineage from that window would mint a
    // fresh table-uuid and orphan the snapshot history
    val prior: Option[ObjectNode] =
      hintedVersion(fs, metaDir, hint).flatMap { n =>
        val p = new Path(metaDir, s"v$n.metadata.json")
        scala.util.Try {
          if (fs.exists(p))
            Some(M.readTree(readString(fs, p)).asInstanceOf[ObjectNode])
          else None
        }.toOption.flatten
      }
    // idempotency: the mirror is already at this Delta version — return
    // the existing file (plain value, no non-local return through a
    // lambda: a NonLocalReturnControl crossing a future try/finally is a
    // refactoring landmine)
    val upToDate = prior
      .filter(p => p.path("current-snapshot-id").asLong(-1L) == snap.version)
      .map(p => new Path(metaDir,
        s"v${p.path("__graft-metadata-version").asLong(1L)}.metadata.json")
        .toString)
    if (upToDate.isDefined) upToDate.get
    else writeNewSnapshot(table, snap, meta, prior, fs, root, metaDir, hint)
  }

  private def writeNewSnapshot(table: DeltaTable,
                               snap: Snapshot, meta: Actions.Metadata,
                               prior: Option[ObjectNode],
                               fs: org.apache.hadoop.fs.FileSystem,
                               root: Path, metaDir: Path,
                               hint: Path): String = {

    val schema = snap.schema.getOrElse(new StructType())
    val startId = prior.map(_.path("last-column-id").asInt(0)).getOrElse(0)
    val (schemaNode, lastColumnId, topIds) = icebergSchema(schema,
      prior, startId)
    val schemaId = schemaNode.path("schema-id").asInt()
    val nowMs = System.currentTimeMillis()
    val uuid = prior.map(_.path("table-uuid").asText())
      .getOrElse(java.util.UUID.randomUUID().toString)
    val mdVersion = prior.map(_.path("__graft-metadata-version").asLong(0L) + 1L)
      .getOrElse(1L)

    // ---- manifest (one, all live files) + manifest list ----
    val partCols = meta.partitionColumns
    val partTypes = partCols.map { c =>
      val f = schema(c)
      f.dataType match {
        case IntegerType | DateType | LongType | StringType => f.dataType
        case t => throw new IllegalArgumentException(
          s"IcebergUniform.sync: partition column $c has type ${t.sql} - " +
            "only int/long/string/date identity partitions are mirrored")
      }
    }
    // spec-0 fields built once, shared by the metadata.json and the
    // avro key metadata (ManifestReader resolves partitions from the
    // "partition-spec" JSON embedded in the manifest itself)
    val specFieldsNode = M.createArrayNode()
    partCols.zipWithIndex.foreach { case (c, i) =>
      val f = specFieldsNode.addObject()
      f.put("name", c)
      f.put("transform", "identity")
      f.put("source-id", topIds(c))
      f.put("field-id", 1000 + i)
    }
    // INCREMENTAL manifests (the delta-spark UniForm shape): with
    // auto-sync on every commit, a full-state manifest per sync is
    // O(live files) per COMMIT — the wrong cost at 100 TB for an
    // append-heavy ingest engine. When every Delta commit since the
    // prior mirrored version is append-only (adds, no removes — read
    // from the commit JSONs, cost ∝ the change, not the table), the new
    // snapshot writes ONE manifest holding just the appended files and
    // its manifest list carries the prior snapshot's manifests forward
    // verbatim. Any delete/rewrite — or the manifest count reaching
    // `graft.uniform.maxManifests` (spark conf, default 8; the
    // compaction that bounds reader fan-out), or aged-out commit
    // JSONs — falls back to the full-state rewrite.
    val priorVersion = prior.map(_.path("current-snapshot-id").asLong())
    val appendedSincePrior: Option[Seq[Actions.AddFile]] =
      priorVersion.flatMap { pv =>
        try {
          val acts = ((pv + 1) to snap.version).flatMap(table.log.readVersion)
          if (acts.exists(_.remove.isDefined)) None
          else Some(acts.flatMap(_.add)
            // a re-add of the same path within the range supersedes —
            // keep the last occurrence (Delta replay order)
            .foldLeft(scala.collection.mutable.LinkedHashMap
                .empty[String, Actions.AddFile]) { (m, a) =>
              m.remove(a.path); m.put(a.path, a); m
            }.values.toSeq)
        } catch { case _: java.io.IOException => None }
      }
    val carried: Seq[ManifestRef] = appendedSincePrior match {
      case Some(_) => priorManifests(fs, prior)
      case None => Nil
    }
    val maxManifests = scala.util.Try(org.apache.spark.sql.SparkSession.active
      .conf.get("graft.uniform.maxManifests", "8").toInt).getOrElse(8)
    val incremental = appendedSincePrior.isDefined && carried.nonEmpty &&
      carried.size + 1 <= maxManifests
    val manifestFiles: Seq[Actions.AddFile] =
      if (incremental) appendedSincePrior.get else snap.files
    val manifestUuid = java.util.UUID.randomUUID().toString
    val manifestPath = new Path(metaDir, s"$manifestUuid-m0.avro")
    val (addedRows, manifestLen) =
      writeManifest(fs, manifestPath, manifestFiles, snap.version, partCols,
        partTypes, root, M.writeValueAsString(schemaNode), schemaId,
        M.writeValueAsString(specFieldsNode))
    val newRef = ManifestRef(manifestPath.toString, manifestLen,
      specId = 0, content = 0, seq = snap.version, minSeq = snap.version,
      addedSnapshotId = snap.version, addedFiles = manifestFiles.size,
      existingFiles = 0, deletedFiles = 0, addedRows = addedRows,
      existingRows = 0L, deletedRows = 0L)
    val listRefs = (if (incremental) carried else Nil) :+ newRef
    val listPath = new Path(metaDir, s"snap-${snap.version}-$manifestUuid.avro")
    writeManifestList(fs, listPath, listRefs, snap.version,
      parentId = priorVersion)

    // ---- metadata.json ----
    val out = M.createObjectNode()
    out.put("format-version", 2)
    out.put("table-uuid", uuid)
    out.put("location", root.toString)
    out.put("last-sequence-number", snap.version)
    out.put("last-updated-ms", nowMs)
    out.put("last-column-id", lastColumnId)
    out.put("current-schema-id", schemaId)
    val schemas = out.putArray("schemas")
    prior.map(_.path("schemas")).collect { case a: ArrayNode =>
      a.forEach(s => if (s.path("schema-id").asInt() != schemaId)
        schemas.add(s))
    }
    schemas.add(schemaNode)
    out.put("default-spec-id", 0)
    val specs = out.putArray("partition-specs")
    val spec = specs.addObject()
    spec.put("spec-id", 0)
    spec.set[ObjectNode]("fields", specFieldsNode): Unit
    out.put("last-partition-id", 1000 + math.max(partCols.size - 1, 0))
    out.put("default-sort-order-id", 0)
    val orders = out.putArray("sort-orders")
    val order0 = orders.addObject()
    order0.put("order-id", 0)
    order0.putArray("fields")
    val props = out.putObject("properties")
    props.put("write.parquet.compression-codec",
      meta.configuration.getOrElse("delta.parquet.compression.codec", "snappy"))
    // the mirrored data files are plain Spark parquet WITHOUT embedded
    // Iceberg field-ids, and spec-compliant readers resolve parquet
    // columns BY field-id — so without a fallback every column reads as
    // null. schema.name-mapping.default is Iceberg's sanctioned
    // name-based fallback: it maps column names to the assigned
    // field-ids (the same mechanism Iceberg uses for imported/migrated
    // parquet). Readers that honor it resolve correctly; embedding real
    // field-ids in the parquet itself would require rewriting data
    // files, which UniForm exists to avoid.
    props.put("schema.name-mapping.default",
      M.writeValueAsString(nameMapping(schemaNode)))
    out.put("current-snapshot-id", snap.version)
    val refs = out.putObject("refs")
    val main = refs.putObject("main")
    main.put("snapshot-id", snap.version)
    main.put("type", "branch")
    val snapshots = out.putArray("snapshots")
    prior.map(_.path("snapshots")).collect { case a: ArrayNode =>
      a.forEach(n => snapshots.add(n): Unit)
    }
    val sn = snapshots.addObject()
    sn.put("snapshot-id", snap.version)
    prior.foreach(p =>
      sn.put("parent-snapshot-id", p.path("current-snapshot-id").asLong()): Unit)
    sn.put("sequence-number", snap.version)
    sn.put("timestamp-ms", nowMs)
    sn.putObject("summary")
      .put("operation", if (incremental) "append" else "overwrite")
    sn.put("manifest-list", listPath.toString)
    sn.put("schema-id", schemaId)
    val snapLog = out.putArray("snapshot-log")
    prior.map(_.path("snapshot-log")).collect { case a: ArrayNode =>
      a.forEach(n => snapLog.add(n): Unit)
    }
    val sl = snapLog.addObject()
    sl.put("timestamp-ms", nowMs)
    sl.put("snapshot-id", snap.version)
    val mdLog = out.putArray("metadata-log")
    prior.foreach { p =>
      p.path("metadata-log") match {
        case a: ArrayNode => a.forEach(n => mdLog.add(n): Unit)
        case _ =>
      }
      val e = mdLog.addObject()
      e.put("timestamp-ms", p.path("last-updated-ms").asLong())
      e.put("metadata-file", new Path(metaDir,
        s"v${p.path("__graft-metadata-version").asLong()}.metadata.json").toString)
    }
    // mirror-private field (double-underscore namespaced; Iceberg readers
    // ignore unknown fields): lets the NEXT sync find/carry state
    out.put("__graft-metadata-version", mdVersion)

    // HadoopTables commit protocol: write-temp-then-rename for BOTH the
    // metadata file and the hint — a crash mid-write (or a concurrent
    // sync) can no longer leave a torn file the next reader chokes on;
    // rename is the atomic unit on HDFS-like stores
    val mdPath = new Path(metaDir, s"v$mdVersion.metadata.json")
    writeAtomic(fs, mdPath, M.writerWithDefaultPrettyPrinter()
      .writeValueAsString(out))
    writeAtomic(fs, hint, mdVersion.toString)
    mdPath.toString
  }

  // ---- schema conversion -------------------------------------------------

  /** Delta/Spark schema → Iceberg schema JSON with depth-first 1-based
    * field-ids. Returns (schemaNode, lastColumnId, topLevelName→id).
    * An unchanged schema (same JSON as the prior current schema) reuses
    * the prior schema-id and ids; a changed one assigns fresh ids above
    * the prior last-column-id and bumps schema-id. */
  private def icebergSchema(schema: StructType, prior: Option[ObjectNode],
                            priorLastId: Int): (ObjectNode, Int, Map[String, Int]) = {
    var nextId = priorLastId
    def alloc(): Int = { nextId += 1; nextId }
    def typeNode(dt: DataType): Object = dt match {
      case ByteType | ShortType | IntegerType => "int"
      case LongType => "long"
      case FloatType => "float"
      case DoubleType => "double"
      case BooleanType => "boolean"
      case StringType => "string"
      case BinaryType => "binary"
      case DateType => "date"
      case TimestampType => "timestamptz"
      case TimestampNTZType => "timestamp"
      case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
      case s: StructType =>
        val n = M.createObjectNode()
        n.put("type", "struct")
        val fs = n.putArray("fields")
        s.fields.foreach { f =>
          val fn = fs.addObject()
          fn.put("id", alloc())
          fn.put("name", f.name)
          fn.put("required", !f.nullable)
          fn.set[ObjectNode]("type", toJson(typeNode(f.dataType))): Unit
        }
        n
      case a: ArrayType =>
        val n = M.createObjectNode()
        n.put("type", "list")
        n.put("element-id", alloc())
        n.set[ObjectNode]("element", toJson(typeNode(a.elementType)))
        n.put("element-required", !a.containsNull)
        n
      case m: MapType =>
        val n = M.createObjectNode()
        n.put("type", "map")
        n.put("key-id", alloc())
        n.set[ObjectNode]("key", toJson(typeNode(m.keyType)))
        n.put("value-id", alloc())
        n.set[ObjectNode]("value", toJson(typeNode(m.valueType)))
        n.put("value-required", !m.valueContainsNull)
        n
      case other => throw new IllegalArgumentException(
        s"IcebergUniform: unmappable type ${other.sql}")
    }
    def build(schemaId: Int): ObjectNode = {
      val n = M.createObjectNode()
      n.put("type", "struct")
      n.put("schema-id", schemaId)
      val fs = n.putArray("fields")
      schema.fields.foreach { f =>
        val fn = fs.addObject()
        fn.put("id", alloc())
        fn.put("name", f.name)
        fn.put("required", !f.nullable)
        fn.set[ObjectNode]("type", toJson(typeNode(f.dataType))): Unit
      }
      n
    }
    val priorSchema: Option[ObjectNode] = prior.flatMap { p =>
      val sid = p.path("current-schema-id").asInt(-1)
      var found: Option[ObjectNode] = None
      p.path("schemas") match {
        case a: ArrayNode => a.forEach { s =>
          if (s.path("schema-id").asInt() == sid)
            found = Some(s.asInstanceOf[ObjectNode])
        }
        case _ =>
      }
      found
    }
    // same field layout as the prior current schema → reuse it verbatim
    // (ids must stay stable across syncs for an unchanged schema)
    val candidateId = priorSchema.map(_.path("schema-id").asInt() + 1).getOrElse(0)
    val fresh = build(candidateId)
    val node = priorSchema match {
      case Some(p) if sameFields(p, fresh) => nextId = priorLastId; p
      case _ => fresh
    }
    val tops = {
      var m = Map.empty[String, Int]
      node.path("fields").forEach(f =>
        m += f.path("name").asText() -> f.path("id").asInt())
      m
    }
    (node, math.max(nextId, priorLastId), tops)
  }

  /** Field-layout equality ignoring schema-id AND all id assignments:
    * the candidate schema's ids are allocated above the prior
    * last-column-id while the prior's start at 1, so comparing with ids
    * included can never match — which would mint a fresh schema-id,
    * reassign EVERY field-id, and grow last-column-id unboundedly on
    * every sync of an unchanged table (breaking the "field-ids stable
    * for an unchanged schema" contract and silently redefining
    * partition-spec 0's source-ids). Structure (names, required,
    * types, nesting) is what "unchanged" means. */
  private def sameFields(a: ObjectNode, b: ObjectNode): Boolean =
    stripIds(a.path("fields")) == stripIds(b.path("fields"))

  /** Deep copy with every id-assignment key removed, recursively. */
  private def stripIds(n: com.fasterxml.jackson.databind.JsonNode)
      : com.fasterxml.jackson.databind.JsonNode = {
    val c = n.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
    def walk(x: com.fasterxml.jackson.databind.JsonNode): Unit = x match {
      case o: ObjectNode =>
        o.remove(java.util.Arrays.asList(
          "id", "element-id", "key-id", "value-id")): Unit
        o.elements().forEachRemaining(walk(_))
      case a: ArrayNode => a.forEach(walk(_))
      case _ =>
    }
    walk(c)
    c
  }

  /** Iceberg name-mapping JSON (the `schema.name-mapping.default` table
    * property): one entry per field with its assigned field-id, nested
    * `fields` for struct children, and the spec-mandated synthetic names
    * for list elements (`element`) and map keys/values (`key`/`value`). */
  private def nameMapping(schemaNode: ObjectNode): ArrayNode =
    mappingOfFields(schemaNode.path("fields"))

  private def mappingOfFields(
      fields: com.fasterxml.jackson.databind.JsonNode): ArrayNode = {
    val arr = M.createArrayNode()
    fields.forEach { f =>
      val e = arr.addObject()
      e.put("field-id", f.path("id").asInt())
      e.putArray("names").add(f.path("name").asText()): Unit
      nestedMapping(f.path("type")).foreach(n => e.set[ObjectNode]("fields", n): Unit)
    }
    arr
  }

  private def nestedMapping(t: com.fasterxml.jackson.databind.JsonNode)
      : Option[ArrayNode] = t match {
    case o: ObjectNode if o.path("type").asText() == "struct" =>
      Some(mappingOfFields(o.path("fields")))
    case o: ObjectNode if o.path("type").asText() == "list" =>
      val arr = M.createArrayNode()
      val e = arr.addObject()
      e.put("field-id", o.path("element-id").asInt())
      e.putArray("names").add("element"): Unit
      nestedMapping(o.path("element")).foreach(n => e.set[ObjectNode]("fields", n): Unit)
      Some(arr)
    case o: ObjectNode if o.path("type").asText() == "map" =>
      val arr = M.createArrayNode()
      val k = arr.addObject()
      k.put("field-id", o.path("key-id").asInt())
      k.putArray("names").add("key"): Unit
      nestedMapping(o.path("key")).foreach(n => k.set[ObjectNode]("fields", n): Unit)
      val v = arr.addObject()
      v.put("field-id", o.path("value-id").asInt())
      v.putArray("names").add("value"): Unit
      nestedMapping(o.path("value")).foreach(n => v.set[ObjectNode]("fields", n): Unit)
      Some(arr)
    case _ => None
  }

  private def toJson(t: Object): com.fasterxml.jackson.databind.JsonNode =
    t match {
      case s: String => M.getNodeFactory.textNode(s)
      case n: com.fasterxml.jackson.databind.JsonNode => n
      case other => throw new IllegalStateException(s"bad type node: $other")
    }

  // ---- avro layers ---------------------------------------------------------

  private def partitionAvroSchema(partCols: Seq[String],
                                  partTypes: Seq[DataType]): AvroSchema = {
    // each r102 field carries its Iceberg partition-field id (1000+i) —
    // ManifestReader resolves the partition struct BY these attributes
    val fields = partCols.zip(partTypes).zipWithIndex.map { case ((c, t), i) =>
      val base = t match {
        case IntegerType | DateType => "\"int\""
        case LongType => "\"long\""
        case _ => "\"string\""
      }
      s"""{"name":${M.writeValueAsString(c)},"type":["null",$base],""" +
        s""""default":null,"field-id":${1000 + i}}"""
    }.mkString(",")
    new AvroSchema.Parser().parse(
      s"""{"type":"record","name":"r102","fields":[$fields]}""")
  }

  /** Write the single manifest file; returns (total rows, file length). */
  /** One manifest-list entry — either the freshly written manifest or a
    * prior snapshot's manifest carried forward verbatim (the
    * incremental-append path). */
  private final case class ManifestRef(path: String, length: Long,
                                       specId: Int, content: Int,
                                       seq: Long, minSeq: Long,
                                       addedSnapshotId: Long,
                                       addedFiles: Int, existingFiles: Int,
                                       deletedFiles: Int, addedRows: Long,
                                       existingRows: Long, deletedRows: Long)

  /** The prior CURRENT snapshot's manifests, read from its manifest
    * list — O(#manifests), never O(files). Empty on any read problem
    * (the caller then falls back to a full-state rewrite). */
  private def priorManifests(fs: org.apache.hadoop.fs.FileSystem,
                             prior: Option[ObjectNode]): Seq[ManifestRef] =
    prior.toSeq.flatMap { p =>
      val curId = p.path("current-snapshot-id").asLong()
      var listPath: String = null
      p.path("snapshots").forEach(s =>
        if (s.path("snapshot-id").asLong() == curId)
          listPath = s.path("manifest-list").asText())
      if (listPath == null) Nil
      else scala.util.Try {
        readAvro(fs, new Path(listPath)).map { r =>
          ManifestRef(
            r.get("manifest_path").toString,
            r.get("manifest_length").asInstanceOf[Long],
            r.get("partition_spec_id").asInstanceOf[Int],
            r.get("content").asInstanceOf[Int],
            r.get("sequence_number").asInstanceOf[Long],
            r.get("min_sequence_number").asInstanceOf[Long],
            r.get("added_snapshot_id").asInstanceOf[Long],
            r.get("added_files_count").asInstanceOf[Int],
            r.get("existing_files_count").asInstanceOf[Int],
            r.get("deleted_files_count").asInstanceOf[Int],
            r.get("added_rows_count").asInstanceOf[Long],
            r.get("existing_rows_count").asInstanceOf[Long],
            r.get("deleted_rows_count").asInstanceOf[Long])
        }
      }.getOrElse(Nil)
    }

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
                            path: Path, files: Seq[Actions.AddFile],
                            snapVersion: Long,
                            partCols: Seq[String], partTypes: Seq[DataType],
                            root: Path, schemaJson: String, schemaId: Int,
                            specJson: String): (Long, Long) = {
    val partSchema = partitionAvroSchema(partCols, partTypes)
    val dataFile = new AvroSchema.Parser().parse(
      s"""{"type":"record","name":"data_file","fields":[
         |  {"name":"content","type":"int","field-id":134},
         |  {"name":"file_path","type":"string","field-id":100},
         |  {"name":"file_format","type":"string","field-id":101},
         |  {"name":"partition","type":${partSchema.toString},"field-id":102},
         |  {"name":"record_count","type":"long","field-id":103},
         |  {"name":"file_size_in_bytes","type":"long","field-id":104}
         |]}""".stripMargin)
    val entry = new AvroSchema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |  {"name":"status","type":"int","field-id":0},
         |  {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
         |  {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
         |  {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
         |  {"name":"data_file","type":${dataFile.toString},"field-id":2}
         |]}""".stripMargin)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](entry))
    // Iceberg's ManifestReader requires the table schema and the
    // partition spec in the avro key-value metadata — it resolves
    // entries against THESE, not the metadata.json
    w.setMeta("format-version", "2")
    w.setMeta("content", "data")
    w.setMeta("schema", schemaJson)
    w.setMeta("schema-id", schemaId.toString)
    w.setMeta("partition-spec", specJson)
    w.setMeta("partition-spec-id", "0")
    val os = fs.create(path, true)
    w.create(entry, os)
    var rows = 0L
    files.foreach { a =>
      val rec = new GenericData.Record(entry)
      rec.put("status", 1) // ADDED in this snapshot
      rec.put("snapshot_id", java.lang.Long.valueOf(snapVersion))
      rec.put("sequence_number", java.lang.Long.valueOf(snapVersion))
      rec.put("file_sequence_number", java.lang.Long.valueOf(snapVersion))
      val df = new GenericData.Record(dataFile)
      df.put("content", 0)
      val abs = new Path(a.path)
      df.put("file_path",
        (if (abs.isAbsolute) abs else new Path(root, a.path)).toString)
      df.put("file_format", "PARQUET")
      val part = new GenericData.Record(partSchema)
      partCols.zip(partTypes).foreach { case (c, t) =>
        val v = a.partitionValues.get(c).orNull
        part.put(c, if (v == null) null else t match {
          case IntegerType => java.lang.Integer.valueOf(v)
          case DateType => java.lang.Integer.valueOf(
            java.time.LocalDate.parse(v).toEpochDay.toInt)
          case LongType => java.lang.Long.valueOf(v)
          case _ => v
        })
      }
      df.put("partition", part)
      val n = a.stats.map(s =>
        Actions.mapper.readTree(s).path("numRecords").asLong(0L)).getOrElse(0L)
      rows += n
      df.put("record_count", java.lang.Long.valueOf(n))
      df.put("file_size_in_bytes", java.lang.Long.valueOf(a.size))
      rec.put("data_file", df)
      w.append(rec)
    }
    w.close()
    (rows, fs.getFileStatus(path).getLen)
  }

  private def writeManifestList(fs: org.apache.hadoop.fs.FileSystem,
                                path: Path, refs: Seq[ManifestRef],
                                snapshotId: Long,
                                parentId: Option[Long]): Unit = {
    val s = new AvroSchema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |  {"name":"manifest_path","type":"string","field-id":500},
        |  {"name":"manifest_length","type":"long","field-id":501},
        |  {"name":"partition_spec_id","type":"int","field-id":502},
        |  {"name":"content","type":"int","field-id":517},
        |  {"name":"sequence_number","type":"long","field-id":515},
        |  {"name":"min_sequence_number","type":"long","field-id":516},
        |  {"name":"added_snapshot_id","type":"long","field-id":503},
        |  {"name":"added_files_count","type":"int","field-id":504},
        |  {"name":"existing_files_count","type":"int","field-id":505},
        |  {"name":"deleted_files_count","type":"int","field-id":506},
        |  {"name":"added_rows_count","type":"long","field-id":512},
        |  {"name":"existing_rows_count","type":"long","field-id":513},
        |  {"name":"deleted_rows_count","type":"long","field-id":514}
        |]}""".stripMargin)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](s))
    // ManifestListReader's expected key metadata: the owning snapshot,
    // its parent, and the sequence number, alongside the format version
    w.setMeta("format-version", "2")
    w.setMeta("snapshot-id", snapshotId.toString)
    w.setMeta("parent-snapshot-id", parentId.map(_.toString).getOrElse("null"))
    w.setMeta("sequence-number", snapshotId.toString)
    val os = fs.create(path, true)
    w.create(s, os)
    refs.foreach { m =>
      val rec = new GenericData.Record(s)
      rec.put("manifest_path", m.path)
      rec.put("manifest_length", java.lang.Long.valueOf(m.length))
      rec.put("partition_spec_id", m.specId)
      rec.put("content", m.content)
      rec.put("sequence_number", java.lang.Long.valueOf(m.seq))
      rec.put("min_sequence_number", java.lang.Long.valueOf(m.minSeq))
      rec.put("added_snapshot_id", java.lang.Long.valueOf(m.addedSnapshotId))
      rec.put("added_files_count", m.addedFiles)
      rec.put("existing_files_count", m.existingFiles)
      rec.put("deleted_files_count", m.deletedFiles)
      rec.put("added_rows_count", java.lang.Long.valueOf(m.addedRows))
      rec.put("existing_rows_count", java.lang.Long.valueOf(m.existingRows))
      rec.put("deleted_rows_count", java.lang.Long.valueOf(m.deletedRows))
      w.append(rec)
    }
    w.close()
  }

  // ---- small fs helpers ----------------------------------------------------

  private def readString(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
  }

  private def writeString(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                          s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** Current mirror version: the hint when readable and pointing at an
    * existing metadata file, else the max `vN.metadata.json` in the
    * listing (the HadoopTables recovery path — the hint is a HINT, not
    * the source of truth; see the sync() comment on the delete-rename
    * window). */
  private def hintedVersion(fs: org.apache.hadoop.fs.FileSystem,
                            metaDir: Path, hint: Path): Option[Long] = {
    val fromHint =
      if (!fs.exists(hint)) None
      else scala.util.Try(readString(fs, hint).trim.toLong).toOption
    fromHint
      .filter(n => fs.exists(new Path(metaDir, s"v$n.metadata.json")))
      .orElse {
        val re = "^v(\\d+)\\.metadata\\.json$".r
        if (!fs.exists(metaDir)) None
        else fs.listStatus(metaDir).toSeq
          .flatMap(_.getPath.getName match {
            case re(n) => scala.util.Try(n.toLong).toOption
            case _ => None
          }).maxOption
      }
  }

  /** Write to a temp sibling, then atomically rename into place (the
    * HadoopTables protocol — readers never observe a partial file). */
  private def writeAtomic(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                          s: String): Unit = {
    val tmp = new Path(p.getParent,
      s".${p.getName}.tmp-${java.util.UUID.randomUUID()}")
    writeString(fs, tmp, s)
    fs.delete(p, false): Unit // local fs rename won't clobber; delete first
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false): Unit
      throw new java.io.IOException(s"atomic rename to $p failed")
    }
  }

  /** Read back the live file set the CURRENT Iceberg snapshot lists —
    * the structural-verification entry IcebergUniformSpec drives (walks
    * version-hint → metadata.json → manifest-list avro → manifest avro,
    * exactly the chain an Iceberg reader walks). */
  def currentFiles(table: DeltaTable): Seq[(String, Long, Long)] = {
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    val root = new Path(table.path)
    val fs = root.getFileSystem(conf)
    val metaDir = new Path(root, "metadata")
    val n = hintedVersion(fs, metaDir, new Path(metaDir, "version-hint.text"))
      .getOrElse(throw new java.io.FileNotFoundException(
        s"no Iceberg mirror at $metaDir — sync() first"))
    val md = M.readTree(readString(fs, new Path(metaDir, s"v$n.metadata.json")))
    val curId = md.path("current-snapshot-id").asLong()
    var listPath: String = null
    md.path("snapshots").forEach(s =>
      if (s.path("snapshot-id").asLong() == curId)
        listPath = s.path("manifest-list").asText())
    require(listPath != null, s"current snapshot $curId not in snapshot list")
    val manifests = readAvro(fs, new Path(listPath))
      .map(_.get("manifest_path").toString)
    manifests.flatMap { mp =>
      readAvro(fs, new Path(mp)).map { e =>
        val dfr = e.get("data_file").asInstanceOf[GenericRecord]
        (dfr.get("file_path").toString,
          dfr.get("record_count").asInstanceOf[Long],
          dfr.get("file_size_in_bytes").asInstanceOf[Long])
      }
    }
  }

  private def readAvro(fs: org.apache.hadoop.fs.FileSystem,
                       p: Path): Seq[GenericRecord] = {
    val local = java.io.File.createTempFile("graft-ice", ".avro")
    try {
      fs.copyToLocalFile(false, p, new Path(local.getAbsolutePath), true)
      val r = new DataFileReader(local,
        new GenericDatumReader[GenericRecord]())
      try {
        val b = Seq.newBuilder[GenericRecord]
        while (r.hasNext) b += r.next()
        b.result()
      } finally r.close()
    } finally { local.delete(): Unit }
  }
}
