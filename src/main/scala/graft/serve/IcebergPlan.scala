package graft.serve

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.catalog.Graft
import graft.format.{DataFileEntry, Manifests, TableMetadata}
import graft.objects.Json
import graft.spark.{ColumnMapping, GraftCatalog, StatValues}
import graft.storage.StorageOps
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SERVER-SIDE SCAN PLANNING — the Iceberg REST OpenAPI spec's
  * `POST /v1/{prefix}/namespaces/{ns}/tables/{t}/plan`
  * (PlanTableScanRequest → completed PlanTableScanResult).
  *
  * This is the 100 TB move of the served plane: instead of shipping the
  * whole manifest tree for the client to prune, the CLIENT'S FILTER is
  * evaluated here against graft's native per-file statistics (min/max/
  * null counts recorded at commit time, plus exact identity-partition
  * values recovered from the path), and only the surviving file-scan
  * tasks — with the delete files that apply to each — cross the wire.
  * Evaluation is Iceberg's inclusive-projection posture: a file is
  * dropped only when the stats PROVE no row can match; anything
  * unknown (missing stat, unparseable literal, transformed term) keeps
  * the file and the client's residual filter does the rest. The task
  * inventory is read back from the SAME avro manifests the table load
  * serves ([[IcebergManifests.ensure]]), so plan responses and
  * manifest walks can never disagree about the file set.
  *
  * Supported expression JSON (the spec's serialization): `true`/
  * `false`, `and`/`or`/`not`, `is-null`/`not-null`, `is-nan`/`not-nan`
  * (conservative), `lt`/`lt-eq`/`gt`/`gt-eq`/`eq`/`not-eq`, `in`/
  * `not-in`; terms are plain column names or `{"type": "reference"}`
  * wrappers. `not` is rewritten into negation normal form before
  * evaluation (inclusive evaluators cannot negate "might match").
  */
object IcebergPlan {

  // ---- expression tree (negation-normal-form after parse) ----

  private sealed trait Expr
  private case object ETrue extends Expr
  private case object EFalse extends Expr
  private final case class EAnd(l: Expr, r: Expr) extends Expr
  private final case class EOr(l: Expr, r: Expr) extends Expr
  private final case class ECmp(op: String, col: String, v: JsonNode)
    extends Expr
  private final case class EIn(col: String, vs: Seq[JsonNode],
      negated: Boolean) extends Expr
  private final case class ENull(col: String, negated: Boolean) extends Expr
  /** Anything the server cannot reason about — never prunes. */
  private case object EUnknown extends Expr

  private def termOf(n: JsonNode): Option[String] = {
    val t = n.get("term")
    if (t == null) None
    else if (t.isTextual) Some(t.asText())
    else if (t.isObject && t.path("type").asText() == "reference")
      Some(t.path("term").asText())
    else None // a transform term (bucket[16](k) etc.) — unknown
  }

  private def parse(n: JsonNode): Expr = {
    if (n == null || n.isNull) return ETrue
    if (n.isBoolean) return if (n.asBoolean()) ETrue else EFalse
    val tpe = n.path("type").asText()
    tpe match {
      case "true" => ETrue
      case "false" => EFalse
      case "and" => EAnd(parse(n.get("left")), parse(n.get("right")))
      case "or" => EOr(parse(n.get("left")), parse(n.get("right")))
      case "not" => negate(parse(n.get("child")))
      case "lt" | "lt-eq" | "gt" | "gt-eq" | "eq" | "not-eq" =>
        termOf(n).map(c => ECmp(tpe, c, n.get("value"))).getOrElse(EUnknown)
      case "in" | "not-in" =>
        termOf(n).map { c =>
          val vs = Option(n.get("values"))
            .filter(_.isArray)
            .map(a => (0 until a.size()).map(a.get))
            .getOrElse(Seq.empty)
          EIn(c, vs, negated = tpe == "not-in")
        }.getOrElse(EUnknown)
      case "is-null" | "not-null" =>
        termOf(n).map(c => ENull(c, negated = tpe == "not-null"))
          .getOrElse(EUnknown)
      case "is-nan" | "not-nan" => EUnknown // conservative
      case "" => throw new IllegalArgumentException(
        "filter expression without a type")
      case other => throw new IllegalArgumentException(
        s"unsupported filter expression type: $other")
    }
  }

  private def negate(e: Expr): Expr = e match {
    case ETrue => EFalse
    case EFalse => ETrue
    case EAnd(l, r) => EOr(negate(l), negate(r))
    case EOr(l, r) => EAnd(negate(l), negate(r))
    case ECmp(op, c, v) =>
      val inv = op match {
        case "lt" => "gt-eq"; case "lt-eq" => "gt"
        case "gt" => "lt-eq"; case "gt-eq" => "lt"
        case "eq" => "not-eq"; case "not-eq" => "eq"
      }
      ECmp(inv, c, v)
    case EIn(c, vs, neg) => EIn(c, vs, !neg)
    case ENull(c, neg) => ENull(c, !neg)
    case EUnknown => EUnknown
  }

  // ---- per-file inclusive evaluation over native stats ----

  /** Per-column facts about one data file: min/max (internal values),
    * null count, row count; identity-partition columns carry EXACT
    * values folded in as mn == mx (or all-null).
    */
  private[serve] final case class ColFacts(mn: Option[Any], mx: Option[Any],
      nulls: Option[Long], rows: Long, dt: DataType)

  /** Test seam: parse a spec filter and evaluate it against facts —
    * the inclusive-evaluation property tests drive this directly.
    */
  private[serve] def mightMatchJson(filter: JsonNode,
      facts: String => Option[ColFacts]): Boolean =
    mightMatch(parse(filter), facts)

  private def mightMatch(e: Expr, facts: String => Option[ColFacts])
      : Boolean = e match {
    case ETrue | EUnknown => true
    case EFalse => false
    case EAnd(l, r) => mightMatch(l, facts) && mightMatch(r, facts)
    case EOr(l, r) => mightMatch(l, facts) || mightMatch(r, facts)
    case ENull(c, negated) => facts(c) match {
      case None => true
      case Some(f) =>
        if (!negated) f.nulls.forall(_ > 0)
        else f.nulls.forall(_ < f.rows)
    }
    case ECmp(op, c, vNode) => facts(c) match {
      case None => true
      case Some(f) =>
        literal(vNode, f.dt) match {
          case None => true // unparseable literal — residual decides
          case Some(v) =>
            def cmpMn = f.mn.map(mn => StatValues.compare(mn, v, f.dt))
            def cmpMx = f.mx.map(mx => StatValues.compare(mx, v, f.dt))
            op match {
              case "lt" => cmpMn.forall(_ < 0)
              case "lt-eq" => cmpMn.forall(_ <= 0)
              case "gt" => cmpMx.forall(_ > 0)
              case "gt-eq" => cmpMx.forall(_ >= 0)
              case "eq" => cmpMn.forall(_ <= 0) && cmpMx.forall(_ >= 0)
              case "not-eq" =>
                // cannot match only when every row equals v
                !(cmpMn.contains(0) && cmpMx.contains(0) &&
                  f.nulls.contains(0L))
            }
        }
    }
    case EIn(c, vs, negated) => facts(c) match {
      case None => true
      case Some(f) =>
        if (!negated)
          vs.exists(v => mightMatch(ECmp("eq", c, v), facts)) ||
            vs.isEmpty // empty IN matches nothing, but stay conservative
        else {
          // cannot match only when the file is single-valued on a
          // member of the set
          val single = f.mn.isDefined && f.mx.isDefined &&
            StatValues.compare(f.mn.get, f.mx.get, f.dt) == 0 &&
            f.nulls.contains(0L)
          !(single && vs.exists(v =>
            literal(v, f.dt).exists(l =>
              StatValues.compare(f.mn.get, l, f.dt) == 0)))
        }
    }
  }

  /** Spec literal JSON → internal comparable value for `dt`. */
  private def literal(v: JsonNode, dt: DataType): Option[Any] = {
    if (v == null || v.isNull) return None
    try dt match {
      case LongType => Some(v.asLong())
      case IntegerType | ShortType | ByteType => Some(v.asInt())
      case DoubleType | FloatType =>
        StatValues.internal(v.asDouble().toString, dt)
      case StringType => Some(UTF8String.fromString(v.asText()))
      case BooleanType => Some(v.asBoolean())
      case DateType =>
        if (v.isNumber) Some(v.asInt())
        else Some(java.time.LocalDate.parse(v.asText()).toEpochDay.toInt)
      case TimestampType | TimestampNTZType =>
        if (v.isNumber) Some(v.asLong())
        else None
      case _ => None
    } catch { case _: Exception => None }
  }

  // ---- plan store: async polling + paged task fetches ----

  /** Tasks per page of a paginated plan result; override per table
    * with `graft.plan.page-size`.
    */
  val PageSizeDefault = 1000
  val PageSizeProp = "graft.plan.page-size"

  /** Data-file count above which the plan answers `submitted` +
    * plan-id instead of a synchronous body; override per table with
    * `graft.plan.async-threshold`. At 100 TB a million-task plan in
    * one response is a driver-side bottleneck on BOTH ends — the
    * submitted/poll/paged-fetch shape is the spec's pressure valve.
    */
  val AsyncThresholdDefault = 100000
  val AsyncThresholdProp = "graft.plan.async-threshold"

  /** One fully-planned scan, servable for plan-id polling and paged
    * task fetches. The page bodies are NOT retained here: every page
    * is spilled to storage as a derived object
    * (`serve/plans/<plan-id>/page-<i>.json`) at registration, so the
    * JVM never holds more than the byte-bounded hot cache of pages —
    * the feature exists to serve million-task plans, and pre-serialized
    * pages at ~500 B/task retained per plan-COUNT was a designed-in
    * driver OOM. The plan metadata (result body + page count +
    * cancelled flag) also persists beside the pages, so ANY server
    * process over the same storage — or this one after eviction —
    * serves any poll, page fetch, or cancel. Planning itself is
    * synchronous even for `submitted` responses — the protocol shape,
    * not the compute venue, is what keeps a million-task plan from
    * shipping as one JSON body; a real worker pool slots in behind
    * [[register]] without changing any route.
    */
  private final case class StoredPlan(resultJson: String, nPages: Int,
      @volatile var cancelled: Boolean = false)

  private def planDir(id: String): String = s"serve/plans/$id"
  private def metaKey(id: String): String = s"${planDir(id)}/plan.json"
  private def pageKey(id: String, i: Int): String =
    s"${planDir(id)}/page-$i.json"
  private def cancelKey(id: String): String =
    s"${planDir(id)}/cancelled"

  /** Plan metadata entries are a few hundred bytes (result body with
    * opaque tokens + counters); bound by count, ACCESS order so
    * actively-polled plans survive registration bursts.
    */
  private val MaxStoredPlanMetas = 4096
  private val plans = new java.util.LinkedHashMap[String, StoredPlan](
      16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, StoredPlan]): Boolean =
      size() > MaxStoredPlanMetas
  }

  /** Hot page cache, bounded by Σ serialized-page BYTES (not plan
    * count), access-order so pages of actively-paginated plans are
    * not evicted by newly registered plans mid-pagination. A miss
    * re-reads the spilled page object. Overridable for tests and
    * deployments via -Dgraft.plan.page-cache-bytes.
    */
  @volatile var maxPageCacheBytes: Long =
    java.lang.Long.getLong("graft.plan.page-cache-bytes", 64L << 20)
  private var pageCacheBytes = 0L
  private val pageCache =
    new java.util.LinkedHashMap[String, String](16, 0.75f, true)

  private def pageBytes(s: String): Long = 2L * s.length + 64

  private def cachePut(key: String, page: String): Unit =
    pageCache.synchronized {
      if (pageCache.put(key, page) == null) pageCacheBytes += pageBytes(page)
      val it = pageCache.entrySet().iterator()
      while (pageCacheBytes > maxPageCacheBytes && it.hasNext) {
        val e = it.next()
        if (e.getKey != key) { // never evict the page being served
          pageCacheBytes -= pageBytes(e.getValue)
          it.remove()
        }
      }
    }

  /** Test/ops visibility: resident page-cache bytes. */
  def pageCacheResidentBytes: Long = pageCache.synchronized(pageCacheBytes)

  /** Drop all in-memory plan state (spilled objects stay): simulates a
    * fresh server process over the same storage in specs.
    */
  private[serve] def dropInMemoryStoreForTest(): Unit = {
    plans.synchronized(plans.clear())
    pageCache.synchronized { pageCache.clear(); pageCacheBytes = 0L }
  }

  /** Plan-artifact TTL: spilled plan objects (pages + metadata) are
    * garbage once every client has paginated them — without a bound
    * they accumulate in storage forever. The creation time is embedded
    * in the plan id (`p<millis>-<uuid>`), so expiry needs no per-object
    * mtime support from the store. Overridable via
    * -Dgraft.plan.ttl-millis; default 24 h (a paginating client holds a
    * plan for minutes, not days).
    */
  @volatile var planTtlMillis: Long =
    java.lang.Long.getLong("graft.plan.ttl-millis", 24L * 3600 * 1000)

  private def newPlanId(): String =
    s"p${System.currentTimeMillis()}-${java.util.UUID.randomUUID()}"

  private def createdAt(planId: String): Option[Long] =
    if (planId.startsWith("p") && planId.contains('-'))
      try Some(planId.substring(1, planId.indexOf('-')).toLong)
      catch { case _: NumberFormatException => None }
    else None

  /** Delete spilled artifacts of plans past the TTL. Runs on the
    * register path (the only place storage grows); one delimiter
    * listing per sweep, and losing a delete race with another server
    * sweeping the same prefix is harmless.
    */
  private def sweepExpired(storage: StorageOps): Unit = {
    val cutoff = System.currentTimeMillis() - planTtlMillis
    storage.listCommonPrefixes("serve/plans/").foreach { p =>
      val id = p.substring(p.lastIndexOf('/') + 1)
      if (createdAt(id).exists(_ < cutoff)) {
        try storage.deleteTree(p) catch { case _: Exception => () }
        plans.synchronized { plans.remove(id); () }
      }
    }
  }

  private def ensureObject(storage: StorageOps, rel: String,
      bytes: => Array[Byte]): Unit =
    if (!storage.exists(rel)) {
      try storage.writeAtomic(rel, bytes)
      catch { case _: graft.storage.AtomicSealFailureException => () }
    }

  private def register(storage: StorageOps, id: String, resultJson: String,
      pages: IndexedSeq[String]): Unit = {
    sweepExpired(storage)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    pages.zipWithIndex.foreach { case (p, i) =>
      ensureObject(storage, pageKey(id, i), p.getBytes(utf8))
      cachePut(s"$id#$i", p)
    }
    val meta = Json.mapper.createObjectNode()
    meta.put("pages", pages.size)
    meta.set[JsonNode]("result", Json.mapper.readTree(resultJson))
    ensureObject(storage, metaKey(id), meta.toString.getBytes(utf8))
    plans.synchronized { plans.put(id, StoredPlan(resultJson, pages.size)); () }
  }

  private def stored(storage: StorageOps, planId: String): StoredPlan = {
    val hit = plans.synchronized(plans.get(planId))
    if (hit != null) return hit
    // evicted or planned by another server process: reload the
    // persisted metadata (the plan id is an opaque UUID — reject
    // anything path-unsafe before touching storage)
    require(planId.nonEmpty && planId.forall(c =>
      c.isLetterOrDigit || c == '-'), s"malformed plan id: $planId")
    if (!storage.exists(metaKey(planId))) throw new NoSuchElementException(
      s"no such plan: $planId (expired or never submitted)")
    val meta = Json.mapper.readTree(storage.read(metaKey(planId)))
    val p = StoredPlan(meta.get("result").toString, meta.get("pages").asInt(),
      cancelled = storage.exists(cancelKey(planId)))
    plans.synchronized { plans.put(planId, p); () }
    p
  }

  /** `GET .../plan/{plan-id}` — FetchPlanningResult. */
  def fetchPlanningResult(storage: StorageOps, planId: String): String = {
    val p = stored(storage, planId)
    if (p.cancelled) """{"plan-status":"cancelled"}""" else p.resultJson
  }

  /** `DELETE .../plan/{plan-id}` — cancel planning. The marker object
    * makes the cancellation visible to every server over the storage
    * and durable past metadata eviction.
    */
  def cancelPlan(storage: StorageOps, planId: String): Unit = {
    val p = stored(storage, planId)
    p.cancelled = true
    ensureObject(storage, cancelKey(planId), Array.emptyByteArray)
  }

  /** `POST .../tasks` — FetchScanTasksResult for one opaque
    * plan-task token.
    */
  def fetchScanTasks(storage: StorageOps, body: JsonNode): String = {
    val token = Option(body.get("plan-task")).map(_.asText()).getOrElse(
      throw new IllegalArgumentException("fetch-tasks needs a plan-task"))
    val decoded = new String(java.util.Base64.getUrlDecoder.decode(token),
      java.nio.charset.StandardCharsets.UTF_8)
    val (planId, idx) = decoded.lastIndexOf('#') match {
      case -1 => throw new IllegalArgumentException(
        s"malformed plan-task token")
      case i => (decoded.substring(0, i), decoded.substring(i + 1).toInt)
    }
    val p = stored(storage, planId)
    require(!p.cancelled, s"plan $planId was cancelled")
    if (idx < 0 || idx >= p.nPages) throw new NoSuchElementException(
      s"no such plan task page: $idx")
    val key = s"$planId#$idx"
    val cached = pageCache.synchronized(pageCache.get(key))
    if (cached != null) cached
    else {
      val page = new String(storage.read(pageKey(planId, idx)),
        java.nio.charset.StandardCharsets.UTF_8)
      cachePut(key, page)
      page
    }
  }

  private def taskToken(planId: String, idx: Int): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(
      s"$planId#$idx".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  // ---- the endpoint ----

  /** Handle one PlanTableScanRequest; returns the PlanTableScanResult
    * JSON — `completed` with inline tasks (small plans), `completed`
    * with opaque `plan-tasks` tokens (paginated past the table's page
    * size), or `submitted` + plan-id (past the async threshold).
    * IllegalArgumentException → HTTP 400.
    */
  def plan(storage: StorageOps, ns: String, t: String,
      body: JsonNode): String = {
    val txn = Graft.beginTransaction(storage)
    try planIn(storage, txn, ns, t, body)
    finally txn.close()
  }

  private def planIn(storage: StorageOps, txn: graft.txn.Transaction,
      ns: String, t: String, body: JsonNode): String = {
    val td = Graft.describeTable(storage, txn, ns, t)
    val raw = TableMetadata.read(storage, td.metadataLocation)
    val meta = raw.copy(snapshots = raw.allSnapshots(storage),
      snapshotLog = Seq.empty)
    val filter = parse(body.get("filter"))
    val snapId =
      if (body.hasNonNull("snapshot-id")) body.get("snapshot-id").asLong()
      else meta.currentSnapshotId
    if (snapId < 0) { // empty table: zero tasks
      val out = Json.mapper.createObjectNode()
      out.put("plan-status", "completed")
      out.putArray("file-scan-tasks")
      out.putArray("delete-files")
      return out.toString
    }
    val snap = meta.snapshots.find(_.id == snapId).getOrElse(
      throw new IllegalArgumentException(s"no such snapshot: $snapId"))
    require(!IcebergManifests.unservable(snap),
      s"table $ns.$t has pending merge-on-read PREDICATE deletes and " +
        "this server has no co-located Spark session to materialize them")
    val schema = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    val partCols = td.properties.get(GraftCatalog.PartitionColsProp)
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
    val manifests =
      IcebergManifests.ensure(storage, ns, t, meta, schema, partCols)
    val mlAbs = manifests.manifestLists.getOrElse(snapId,
      throw new IllegalArgumentException(s"snapshot $snapId is not servable"))

    // read the SAME manifests the table load serves
    final case class Entry(df: org.apache.avro.generic.GenericRecord,
        seq: Long, content: Int)
    val entries = Seq.newBuilder[Entry]
    IcebergStatic.readAvro(storage, IcebergCommits.toRel(storage, mlAbs))
      .foreach { m =>
        val mRel = IcebergCommits.toRel(storage,
          IcebergCommits.req(m, "manifest_path").toString)
        val mContent = IcebergCommits.intOf(IcebergCommits.opt(m, "content"), 0)
        IcebergStatic.readAvro(storage, mRel).foreach { e =>
          if (IcebergCommits.intOf(IcebergCommits.opt(e, "status"), 1) != 2) {
            val df = IcebergCommits.req(e, "data_file")
              .asInstanceOf[org.apache.avro.generic.GenericRecord]
            val seq = Option(IcebergCommits.opt(e, "sequence_number"))
              .map(IcebergCommits.longOf).getOrElse(0L)
            val fileContent =
              IcebergCommits.intOf(IcebergCommits.opt(df, "content"), 0)
            entries += Entry(df,
              seq, if (mContent == 0) 0 else fileContent)
          }
        }
      }

    // native per-file stats, keyed by the absolute path the manifests
    // plan; identity-partition values fold in as exact mn == mx facts
    val renames = ColumnMapping.renames(schema)
    val statsByAbs: Map[String, DataFileEntry] =
      Manifests.filesOf(storage, snap)
        .map(f => storage.absolute(f.path) -> f).toMap
    def factsFor(abs: String): String => Option[ColFacts] = {
      val st = statsByAbs.get(abs)
      (logical: String) => {
        val field = schema.fields.find(_.name == logical)
        field.flatMap { fld =>
          val phys = renames.getOrElse(logical, logical)
          if (partCols.contains(logical)) {
            val v = st.flatMap(f => IcebergManifests.partitionValue(
              f.path, logical, fld.dataType))
            val internal = v.map {
              case s: String => UTF8String.fromString(s)
              case x => x
            }
            Some(ColFacts(internal, internal,
              if (internal.isDefined) Some(0L)
              else st.map(_.rowCount), // no path value = treat as null
              st.map(_.rowCount).getOrElse(0L), fld.dataType))
          } else st.map { f =>
            ColFacts(
              f.minValues.get(phys)
                .flatMap(StatValues.internal(_, fld.dataType)),
              f.maxValues.get(phys)
                .flatMap(StatValues.internal(_, fld.dataType)),
              f.nullCounts.get(phys), f.rowCount, fld.dataType)
          }
        }
      }
    }

    def contentFileJson(df: org.apache.avro.generic.GenericRecord,
        content: Int): ObjectNode = {
      val n = Json.mapper.createObjectNode()
      n.put("spec-id",
        if (content == 2) (if (partCols.nonEmpty) 1 else 0) else 0)
      n.put("content", content match {
        case 0 => "data"
        case 1 => "position-deletes"
        case 2 => "equality-deletes"
      })
      n.put("file-path", IcebergCommits.req(df, "file_path").toString)
      n.put("file-format", "PARQUET")
      val part = n.putArray("partition")
      IcebergCommits.opt(df, "partition") match {
        case pr: org.apache.avro.generic.GenericRecord =>
          pr.getSchema.getFields.forEach { f =>
            val v = pr.get(f.name())
            if (v == null) part.addNull()
            else v match {
              case i: java.lang.Integer => part.add(i.intValue())
              case l: java.lang.Long => part.add(l.longValue())
              case other => part.add(String.valueOf(other))
            }
          }
        case _ => ()
      }
      n.put("record-count",
        IcebergCommits.longOf(IcebergCommits.req(df, "record_count")))
      n.put("file-size-in-bytes", IcebergCommits.longOf(
        IcebergCommits.req(df, "file_size_in_bytes")))
      IcebergCommits.opt(df, "equality_ids") match {
        case l: java.util.List[_] =>
          val ids = n.putArray("equality-ids")
          l.forEach(v => ids.add(IcebergCommits.intOf(v, -1)))
        case _ => ()
      }
      n
    }

    val all = entries.result()
    val deletes = all.filter(_.content != 0)
    val dataEntries = all.filter(_.content == 0)
    // delete files index (order stable: manifest order)
    val deleteIdx = deletes.zipWithIndex
    val deleteNodes = deleteIdx.map { case (d, _) =>
      contentFileJson(d.df, d.content)
    }
    def partTuple(df: org.apache.avro.generic.GenericRecord): String =
      IcebergCommits.opt(df, "partition") match {
        case pr: org.apache.avro.generic.GenericRecord =>
          pr.getSchema.getFields.toArray.map {
            case f: org.apache.avro.Schema.Field =>
              String.valueOf(pr.get(f.name()))
          }.mkString("|")
        case _ => ""
      }
    // partition tuples render ONCE per entry (not per data×delete
    // pair — the avro record walk is O(fields) with allocations)
    val deleteTuples = deleteIdx.map { case (d, i) =>
      (d, i, if (partCols.isEmpty) "" else partTuple(d.df))
    }
    val taskNodes = Seq.newBuilder[ObjectNode]
    var kept = 0
    dataEntries.foreach { e =>
      val abs = IcebergCommits.req(e.df, "file_path").toString
      if (mightMatch(filter, factsFor(abs))) {
        kept += 1
        val eTuple = if (partCols.isEmpty) "" else partTuple(e.df)
        val task = Json.mapper.createObjectNode()
        taskNodes += task
        task.set("data-file", contentFileJson(e.df, 0))
        val refs = task.putArray("delete-file-references")
        deleteTuples.foreach { case (d, i, dTuple) =>
          val applies = d.content match {
            // position deletes apply to files committed at or before
            // their sequence, within the same partition
            case 1 => d.seq >= e.seq &&
              (partCols.isEmpty || dTuple == eTuple)
            // equality deletes bind strictly later, globally
            case 2 => d.seq > e.seq
            case _ => false
          }
          if (applies) refs.add(i)
        }
        Option(body.get("filter")).filterNot(_.isNull)
          .foreach { f =>
            task.set[JsonNode]("residual-filter", f); ()
          }
      }
    }
    val pageSize = td.properties.get(PageSizeProp).map(_.toInt)
      .getOrElse(PageSizeDefault)
    val asyncThreshold = td.properties.get(AsyncThresholdProp).map(_.toInt)
      .getOrElse(AsyncThresholdDefault)
    assemble(storage, taskNodes.result(), deleteNodes, dataEntries.size - kept,
      pageSize, async = dataEntries.size > asyncThreshold)
  }

  /** Shape the response: inline tasks when the plan is small, opaque
    * `plan-tasks` tokens past the page size, `submitted` + plan-id
    * past the async threshold. Every page is a self-contained
    * FetchScanTasksResult — its tasks reference delete files by index
    * into ITS OWN delete-files array.
    */
  private def assemble(storage: StorageOps, taskNodes: Seq[ObjectNode],
      deleteNodes: Seq[ObjectNode], pruned: Int, pageSize: Int,
      async: Boolean): String = {
    def withDeletes(n: ObjectNode): ObjectNode = {
      val da = n.putArray("delete-files")
      deleteNodes.foreach(da.add)
      n
    }
    if (!async && taskNodes.lengthCompare(pageSize) <= 0) {
      val out = Json.mapper.createObjectNode()
      out.put("plan-status", "completed")
      val ta = out.putArray("file-scan-tasks")
      taskNodes.foreach(ta.add)
      withDeletes(out)
      out.put("pruned-data-files", pruned)
      return out.toString
    }
    val pagesJson = (if (taskNodes.isEmpty) IndexedSeq(Seq.empty[ObjectNode])
      else taskNodes.grouped(pageSize).toIndexedSeq).map { g =>
      val pn = Json.mapper.createObjectNode()
      val ta = pn.putArray("file-scan-tasks")
      g.foreach(ta.add)
      withDeletes(pn).toString
    }
    val planId = newPlanId()
    val result = Json.mapper.createObjectNode()
    result.put("plan-status", "completed")
    val pt = result.putArray("plan-tasks")
    pagesJson.indices.foreach(i => pt.add(taskToken(planId, i)))
    withDeletes(result)
    result.put("pruned-data-files", pruned)
    register(storage, planId, result.toString, pagesJson)
    if (async) s"""{"plan-status":"submitted","plan-id":"$planId"}"""
    else result.toString
  }
}
