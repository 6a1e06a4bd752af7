package graft.rest

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, Executors}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.catalog.{Catalog, CommitConflict, SqlCatalog}
import graft.core.SchemaJson
import graft.format.{PartitionSpec, SortOrder, TableMetadata}

/** Iceberg-REST-spec catalog server over any backing [[Catalog]] (reference
  * consumes this protocol in `catalog/rest/rest.go`; the endpoint shapes are
  * the public REST spec). Commits arrive as requirements+updates, are
  * validated and applied against the backing catalog's CURRENT metadata
  * under a per-table lock, and race through the backing CAS — so a REST
  * server in front of a Hadoop or SQL catalog keeps exactly that catalog's
  * concurrency story.
  *
  * Also serves POST `.../tables/{t}/plan`: server-side scan planning that
  * returns [[graft.codec.TaskCodec]] payloads (reference
  * `catalog/rest/scan_planning.go` — tasks planned remotely, executed
  * locally).
  *
  * With `credentials` set, the server speaks the spec's OAuth2
  * client-credentials flow (reference auth surface in
  * `catalog/rest/rest.go`): `POST /v1/oauth/tokens` (form-encoded) issues
  * short-lived bearer tokens and every other endpoint answers 401 without a
  * live one.
  *
  * `POST /v1/transactions/commit` is the spec's multi-table commit
  * (reference `catalog/rest/rest.go` commitTransaction): every table's
  * requirements validate, then all staged updates commit atomically through
  * the backing [[graft.catalog.TransactionalCatalog]].
  */
final class RestCatalogServer(backing: Catalog, port: Int = 0,
    credentials: Map[String, String] = Map.empty,
    tokenTtlMs: Long = 3600 * 1000L,
    /** Vendor of storage credentials scoped to a table's location (reference
      * access-delegation vending, `catalog/rest/scan_planning.go:442-450`):
      * the SERVER owns storage identity; scan plans and the
      * `GET .../credentials` endpoint hand short-lived, prefix-scoped
      * credentials to readers. None = no vending (storage is open or the
      * client has ambient access).
      */
    vendCredentials: Option[String => Seq[graft.io.StorageCredential]] = None,
    /** Async scan planning (reference `catalog/rest/scan_planning.go`,
      * spec planTableScan): plans with at least this many tasks return
      * `{"status":"submitted","plan-id":…}` and complete via
      * `GET …/plan/{plan-id}` polling. Int.MaxValue = always inline.
      */
    asyncPlanThreshold: Int = Int.MaxValue,
    /** When > 0, a completed plan carries at most this many inline
      * file-scan-tasks; the rest shard into opaque `plan-tasks` handles
      * served by `POST …/tasks` (spec fetchScanTasks) — a 10⁶-file plan
      * never ships as one response body.
      */
    planTaskShardSize: Int = 0,
    /** How long parked async-plan state (and unfetched shard handles)
      * survives without a terminal fetch or cancel: a client that submits
      * a plan and dies must not grow server memory forever under client
      * churn. Expired ids answer the same typed NoSuchPlanIdException 404
      * as unknown ones.
      */
    planTtlMs: Long = 10 * 60 * 1000L) {

  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val commitLocks = new ConcurrentHashMap[String, Object]()
  // namespace properties when the backing catalog has none (Hadoop)
  private val nsProps = new ConcurrentHashMap[String, Map[String, String]]()
  // live bearer tokens -> expiry epoch ms
  private val tokens = new ConcurrentHashMap[String, java.lang.Long]()

  // async scan planning state: plan-id -> (completed result, polls left,
  // status); plan-task handle -> shard result. Bounded three ways:
  // terminal fetch evicts the plan, cancel evicts plan + shards, and a
  // TTL sweep (run on every plan/shard access) reclaims state abandoned
  // by clients that died mid-protocol. Counters observable by tests.
  private final class PendingPlan(val node: ObjectNode, var pollsLeft: Int,
    var status: String, val handles: Seq[String] = Nil,
    val expiresAtMs: Long = Long.MaxValue)
  private val plans = new ConcurrentHashMap[String, PendingPlan]()
  // shards park as a SERIALIZE-AT-FETCH thunk, not a pre-built JSON tree:
  // eager per-shard serialization inside submit was ~85% of time-to-first-
  // tasks at 100k files (PLAN_CURVE_r15 item 3) and single-threaded; lazy
  // thunks cut submit to the plan+inline cost and spread serialization
  // across the 8-thread fetch fan-out. One-shot handles make each thunk
  // run at most once.
  private val planShards = new ConcurrentHashMap[String, (() => ObjectNode, Long)]()

  private def sweepExpiredPlans(): Unit = {
    val now = System.currentTimeMillis()
    plans.forEach { (id, p) =>
      if (p.expiresAtMs < now) { plans.remove(id); () }
    }
    planShards.forEach { (h, v) =>
      if (v._2 < now) { planShards.remove(h); () }
    }
  }
  val planPolls = new java.util.concurrent.atomic.AtomicInteger(0)
  val taskFetches = new java.util.concurrent.atomic.AtomicInteger(0)
  def pendingPlanCount: Int = plans.size
  def pendingShardCount: Int = planShards.size

  def boundPort: Int = server.getAddress.getPort
  def uri: String = s"http://127.0.0.1:$boundPort"

  // daemon threads + explicit shutdown: HttpServer.stop() does NOT stop a
  // user-supplied executor, and a lingering non-daemon pool pins the JVM
  private val pool = Executors.newFixedThreadPool(8, r => {
    val t = new Thread(r, "rest-catalog-server")
    t.setDaemon(true)
    t
  })

  def start(): RestCatalogServer = {
    server.createContext("/v1/", handle _)
    server.setExecutor(pool)
    // HttpServer.start() spawns the internal HTTP-Dispatcher thread,
    // which inherits the CREATING thread's daemon flag (and is otherwise
    // non-daemon): start from a daemon thread so a server left running —
    // e.g. a gate whose read thunk still needs the catalog — never pins
    // the JVM at exit
    val starter = new Thread(() => server.start(), "rest-catalog-server-start")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    this
  }

  def stop(): Unit = {
    server.stop(0)
    pool.shutdownNow()
    ()
  }

  // ---- routing -----------------------------------------------------------

  private def handle(ex: HttpExchange): Unit = {
    try route(ex)
    catch {
      case e: CommitConflict => sendError(ex, 409, "CommitFailedException", e.getMessage)
      case e: NoSuchElementException => sendError(ex, 404, "NoSuchTableException", e.getMessage)
      case e: IllegalArgumentException => sendError(ex, 400, "BadRequestException", e.getMessage)
      case e: Exception => sendError(ex, 500, "InternalServerError", String.valueOf(e.getMessage))
    } finally ex.close()
  }

  private def route(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val segs = ex.getRequestURI.getPath.stripPrefix("/v1/").split("/").filter(_.nonEmpty).toList
    if (segs == List("oauth", "tokens")) return issueToken(ex)
    if (credentials.nonEmpty && !authorized(ex))
      return sendError(ex, 401, "NotAuthorizedException", "missing or expired bearer token")
    (method, segs) match {
      case ("GET", List("config")) =>
        val o = mapper.createObjectNode()
        o.putObject("defaults"); o.putObject("overrides")
        sendJson(ex, 200, o)
      case ("POST", List("transactions", "commit")) => commitTransaction(ex)
      case ("POST", List("tables", "rename")) => renameTable(ex)
      case ("POST", List("namespaces", ns, "register")) => registerTable(ex, ns)
      case ("GET", List("namespaces")) => listNamespaces(ex)
      case ("POST", List("namespaces")) => createNamespace(ex)
      case ("GET", List("namespaces", ns)) => getNamespace(ex, ns)
      case ("HEAD", List("namespaces", ns)) => // spec namespaceExists
        val exists = backing match {
          case sq: SqlCatalog => sq.namespaceExists(ns)
          case _ => nsProps.containsKey(ns) || backing.listTables().exists(t =>
            (if (t.contains('.')) t.substring(0, t.lastIndexOf('.')) else "default") == ns)
        }
        if (exists) ex.sendResponseHeaders(204, -1)
        else ex.sendResponseHeaders(404, -1)
      case ("DELETE", List("namespaces", ns)) => dropNamespace(ex, ns)
      case ("POST", List("namespaces", ns, "properties")) => updateNamespace(ex, ns)
      case ("GET", List("namespaces", ns, "tables")) => listTables(ex, ns)
      case ("POST", List("namespaces", ns, "tables")) => createTable(ex, ns)
      case ("GET", List("namespaces", ns, "tables", t)) => loadTable(ex, ns, t)
      case ("HEAD", List("namespaces", ns, "tables", t)) =>
        if (backing.tableExists(fullName(ns, t))) { ex.sendResponseHeaders(204, -1) }
        else ex.sendResponseHeaders(404, -1)
      case ("POST", List("namespaces", ns, "tables", t)) => commitTable(ex, ns, t)
      case ("DELETE", List("namespaces", ns, "tables", t)) =>
        backing.dropTable(fullName(ns, t)); ex.sendResponseHeaders(204, -1)
      case ("POST", List("namespaces", ns, "tables", t, "plan")) => planScan(ex, ns, t)
      case ("GET", List("namespaces", ns, "tables", t, "plan", id)) => planStatus(ex, id)
      case ("DELETE", List("namespaces", ns, "tables", t, "plan", id)) => cancelPlan(ex, id)
      case ("POST", List("namespaces", ns, "tables", t, "tasks")) => fetchScanTasks(ex)
      case ("GET", List("namespaces", ns, "tables", t, "credentials")) =>
        loadCredentials(ex, ns, t)
      case ("POST", List("namespaces", ns, "tables", t, "metrics")) =>
        receiveMetrics(ex, ns, t)
      case ("GET", List("namespaces", ns, "functions")) => listFunctions(ex, ns)
      case ("GET", List("namespaces", ns, "functions", f)) => loadFunction(ex, ns, f)
      case ("GET", List("namespaces", ns, "views")) => listViews(ex, ns)
      case ("POST", List("namespaces", ns, "views")) => createView(ex, ns)
      case ("GET", List("namespaces", ns, "views", v)) => loadView(ex, ns, v)
      case ("HEAD", List("namespaces", ns, "views", v)) =>
        if (views.viewExists(fullName(ns, v))) ex.sendResponseHeaders(204, -1)
        else ex.sendResponseHeaders(404, -1)
      case ("POST", List("namespaces", ns, "views", v)) => commitView(ex, ns, v)
      case ("DELETE", List("namespaces", ns, "views", v)) =>
        views.dropView(fullName(ns, v)); ex.sendResponseHeaders(204, -1)
      case ("POST", List("views", "rename")) => renameView(ex)
      case _ => sendError(ex, 404, "NotFound", s"$method /${segs.mkString("/")}")
    }
  }

  private def fullName(ns: String, table: String): String =
    if (ns == "default") table else s"$ns.$table"

  // ---- OAuth2 client-credentials flow ------------------------------------

  /** `POST /v1/oauth/tokens`: form-encoded client_credentials grant → a
    * short-lived opaque bearer token (spec TokenResponse shape).
    */
  private def issueToken(ex: HttpExchange): Unit = {
    if (credentials.isEmpty)
      return sendError(ex, 400, "BadRequestException", "auth is not enabled")
    val form = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      .split("&").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
    if (!form.get("grant_type").contains("client_credentials")) {
      val o = mapper.createObjectNode()
      o.put("error", "unsupported_grant_type")
      return sendJson(ex, 400, o)
    }
    val ok = (for {
      id <- form.get("client_id")
      secret <- form.get("client_secret")
    } yield credentials.get(id).contains(secret)).getOrElse(false)
    if (!ok) {
      val o = mapper.createObjectNode()
      o.put("error", "invalid_client")
      o.put("error_description", "bad client credentials")
      return sendJson(ex, 401, o)
    }
    val tok = java.util.UUID.randomUUID().toString.replace("-", "")
    tokens.put(tok, System.currentTimeMillis() + tokenTtlMs)
    val o = mapper.createObjectNode()
    o.put("access_token", tok)
    o.put("token_type", "bearer")
    o.put("expires_in", tokenTtlMs / 1000)
    sendJson(ex, 200, o)
  }

  private def authorized(ex: HttpExchange): Boolean = {
    val header = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
    if (!header.startsWith("Bearer ")) return false
    val tok = header.stripPrefix("Bearer ").trim
    Option(tokens.get(tok)) match {
      case Some(exp) if exp > System.currentTimeMillis() => true
      case Some(_) => tokens.remove(tok); false // expired
      case None => false
    }
  }

  // ---- multi-table transaction -------------------------------------------

  /** `POST /v1/transactions/commit`: validate every change's requirements
    * against current metadata, apply its updates, then commit the whole set
    * through the backing catalog's atomic multi-table CAS. Any conflict —
    * requirement or CAS — leaves every table untouched (409).
    */
  private def commitTransaction(ex: HttpExchange): Unit = {
    val tc = backing match {
      case t: graft.catalog.TransactionalCatalog => t
      case _ => throw new IllegalArgumentException(
        "backing catalog does not support multi-table transactions")
    }
    val body = readJson(ex)
    val changes = Option(body.get("table-changes"))
      .map(_.elements().asScala.toSeq).getOrElse(Nil)
    if (changes.isEmpty)
      throw new IllegalArgumentException("empty table-changes")

    // deterministic lock order prevents deadlock between racing transactions
    val parsed = changes.map { ch =>
      val ido = ch.get("identifier")
      val ns = ido.get("namespace").elements().asScala.map(_.asText()).mkString(".")
      val full = fullName(if (ns.isEmpty) "default" else ns, ido.get("name").asText())
      val reqs = Option(ch.get("requirements"))
        .map(_.elements().asScala.map(UpdateJson.requirementFromNode).toSeq).getOrElse(Nil)
      val ups = Option(ch.get("updates"))
        .map(_.elements().asScala.map(UpdateJson.updateFromNode).toSeq).getOrElse(Nil)
      (full, reqs, ups)
    }
    require(parsed.map(_._1).distinct.size == parsed.size,
      "duplicate table in transaction")
    val locks = parsed.map(_._1).sorted.map(n => commitLocks.computeIfAbsent(n, _ => new Object))

    def withLocks(ls: Seq[Object])(body: => Unit): Unit = ls match {
      case Seq() => body
      case l +: rest => l.synchronized(withLocks(rest)(body))
    }
    withLocks(locks) {
      val staged = parsed.map { case (full, reqs, ups) =>
        if (!backing.tableExists(full))
          throw new NoSuchElementException(s"no such table: $full")
        val t = backing.loadTable(full)
        reqs.foreach { r =>
          Requirement.check(r, Some(t.metadata)).foreach(msg =>
            throw new CommitConflict(s"requirement failed for $full: $msg"))
        }
        val applied0 = ups.foldLeft(t.metadata)(MetadataUpdate.apply)
        val now = System.currentTimeMillis()
        val (mlog, dropped) =
          graft.table.MetadataLogPolicy.appended(applied0, t.metadataPath, now)
        val applied = applied0.copy(
          lastUpdatedMs = math.max(applied0.lastUpdatedMs, now),
          metadataLog = mlog)
        (graft.catalog.StagedCommit(full, t.metadata, applied, t.currentVersion),
          (applied, dropped))
      }
      tc.commitTransaction(staged.map(_._1))
      staged.foreach { case (_, (applied, dropped)) =>
        graft.table.MetadataLogPolicy.deleteTrimmed(applied, dropped)
      }
      ex.sendResponseHeaders(204, -1)
    }
  }

  // ---- namespaces --------------------------------------------------------

  /** Spec pagination (`pageToken` / `pageSize` query params, reference
    * `rest.go:1181-1260`): listings sort by name, the page token is the
    * LAST name of the previous page (opaque to clients — any
    * monotonically-ordered cursor satisfies the spec), and
    * `next-page-token` appears only while more remain. A catalog holding
    * 10⁵ tables must never ship one giant listing response; without
    * `pageSize` the full (bounded) listing returns in one page, token
    * still honored.
    */
  private def paginated(ex: HttpExchange,
      names: Seq[String]): (Seq[String], Option[String]) = {
    val params = Option(ex.getRequestURI.getQuery).getOrElse("")
      .split('&').filter(_.contains('=')).map { kv =>
        val i = kv.indexOf('=')
        kv.substring(0, i) ->
          java.net.URLDecoder.decode(kv.substring(i + 1), "UTF-8")
      }.toMap
    val sorted = names.sorted
    val remaining = params.get("pageToken").filter(_.nonEmpty)
      .map(t => sorted.dropWhile(_ <= t)).getOrElse(sorted)
    params.get("pageSize").flatMap(_.toIntOption).filter(_ > 0) match {
      case Some(sz) if remaining.length > sz =>
        (remaining.take(sz), Some(remaining(sz - 1)))
      case _ => (remaining, None)
    }
  }

  private def listNamespaces(ex: HttpExchange): Unit = {
    val names = backing match {
      case sq: SqlCatalog => sq.listNamespaces()
      case _ =>
        (nsProps.keys.asScala.toSeq ++ backing.listTables().map(t =>
          if (t.contains('.')) t.substring(0, t.lastIndexOf('.')) else "default")).distinct.sorted
    }
    val (page, next) = paginated(ex, names)
    val o = mapper.createObjectNode()
    val arr = o.putArray("namespaces")
    page.foreach { n => val a = arr.addArray(); a.add(n); () }
    next.foreach(o.put("next-page-token", _))
    sendJson(ex, 200, o)
  }

  private def createNamespace(ex: HttpExchange): Unit = {
    val body = readJson(ex)
    val ns = body.get("namespace").elements().asScala.map(_.asText()).mkString(".")
    val props = Option(body.get("properties")).map(_.properties().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty)
    backing match {
      case sq: SqlCatalog => sq.createNamespace(ns, props)
      case _ => nsProps.put(ns, props)
    }
    val o = mapper.createObjectNode()
    val arr = o.putArray("namespace"); arr.add(ns)
    val po = o.putObject("properties"); props.foreach { case (k, v) => po.put(k, v) }
    sendJson(ex, 200, o)
  }

  private def getNamespace(ex: HttpExchange, ns: String): Unit = {
    val props = backing match {
      case sq: SqlCatalog =>
        if (!sq.namespaceExists(ns)) throw new NoSuchElementException(s"no such namespace: $ns")
        sq.loadNamespaceProperties(ns)
      case _ => Option(nsProps.get(ns))
        .getOrElse(throw new NoSuchElementException(s"no such namespace: $ns"))
    }
    val o = mapper.createObjectNode()
    val arr = o.putArray("namespace"); arr.add(ns)
    val po = o.putObject("properties"); props.foreach { case (k, v) => po.put(k, v) }
    sendJson(ex, 200, o)
  }

  private def dropNamespace(ex: HttpExchange, ns: String): Unit = {
    // spec: dropping a namespace that still holds tables is a 409
    val nonEmpty = backing.listTables().exists(t =>
      (if (t.contains('.')) t.substring(0, t.lastIndexOf('.')) else "default") == ns)
    if (nonEmpty)
      return sendError(ex, 409, "NamespaceNotEmptyException",
        s"namespace $ns is not empty")
    backing match {
      case sq: SqlCatalog => sq.dropNamespace(ns)
      case _ => nsProps.remove(ns)
    }
    ex.sendResponseHeaders(204, -1)
  }

  private def updateNamespace(ex: HttpExchange, ns: String): Unit = {
    val body = readJson(ex)
    val removals = Option(body.get("removals"))
      .map(_.elements().asScala.map(_.asText()).toSet).getOrElse(Set.empty)
    val updates = Option(body.get("updates")).map(_.properties().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty)
    backing match {
      case sq: SqlCatalog => sq.updateNamespaceProperties(ns, removals, updates)
      case _ => nsProps.compute(ns, (_, old) =>
        (Option(old).getOrElse(Map.empty) -- removals) ++ updates)
    }
    val o = mapper.createObjectNode()
    val rem = o.putArray("removed"); removals.foreach(rem.add)
    val upd = o.putArray("updated"); updates.keys.foreach(upd.add)
    o.putArray("missing")
    sendJson(ex, 200, o)
  }

  // ---- tables ------------------------------------------------------------

  private def listTables(ex: HttpExchange, ns: String): Unit = {
    val inNs = backing.listTables()
      .map(t => if (t.contains('.'))
        (t.substring(0, t.lastIndexOf('.')), t.substring(t.lastIndexOf('.') + 1))
      else ("default", t))
      .filter(_._1 == ns)
    val (page, next) = paginated(ex, inNs.map(_._2))
    val o = mapper.createObjectNode()
    val arr = o.putArray("identifiers")
    page.foreach { t =>
      val io = arr.addObject()
      val na = io.putArray("namespace"); na.add(ns)
      io.put("name", t)
    }
    next.foreach(o.put("next-page-token", _))
    sendJson(ex, 200, o)
  }

  private def createTable(ex: HttpExchange, ns: String): Unit = {
    val body = readJson(ex)
    val name = body.get("name").asText()
    val schema = SchemaJson.schemaFromJsonNode(body.get("schema"))
    val spec = Option(body.get("partition-spec")).filterNot(_.isNull)
      .map(UpdateJson.specFromNode).getOrElse(PartitionSpec.Unpartitioned)
    val order = Option(body.get("write-order")).filterNot(_.isNull)
      .map(UpdateJson.sortOrderFromNode).getOrElse(SortOrder.Unsorted)
    val props = Option(body.get("properties")).map(_.properties().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty)
    val t = backing.createTable(fullName(ns, name), schema, spec, order, props)
    sendJson(ex, 200, loadResult(t.metadataPath, t.metadata))
  }

  private def loadTable(ex: HttpExchange, ns: String, name: String): Unit = {
    val full = fullName(ns, name)
    if (!backing.tableExists(full)) throw new NoSuchElementException(s"no such table: $full")
    val t = backing.loadTable(full)
    sendJson(ex, 200, loadResult(t.metadataPath, t.metadata))
  }

  /** Spec `POST /v1/tables/rename` (reference `catalog/rest/endpoints.go:
    * 104`): body carries source/destination identifiers; 204 on success.
    * Only catalogs whose identity is a mutable pointer support it.
    */
  private def renameTable(ex: HttpExchange): Unit = {
    val body = readJson(ex)
    def ident(n: com.fasterxml.jackson.databind.JsonNode): String = {
      val ns = n.get("namespace").elements().asScala.map(_.asText()).mkString(".")
      fullName(if (ns.isEmpty) "default" else ns, n.get("name").asText())
    }
    backing match {
      case sq: graft.catalog.SqlCatalog =>
        sq.renameTable(ident(body.get("source")), ident(body.get("destination")))
        ex.sendResponseHeaders(204, -1)
      case _ =>
        sendError(ex, 400, "BadRequestException",
          "backing catalog does not support rename")
    }
  }

  /** Spec `POST /v1/namespaces/{ns}/register` (reference
    * `catalog/rest/rest.go:1564-1610`): points a new catalog entry at an
    * existing metadata file, no rewrite; responds like loadTable.
    */
  private def registerTable(ex: HttpExchange, ns: String): Unit = {
    val body = readJson(ex)
    val full = fullName(ns, body.get("name").asText())
    val loc = body.get("metadata-location").asText()
    backing match {
      case sq: graft.catalog.SqlCatalog =>
        val t = sq.registerTable(full, loc)
        sendJson(ex, 200, loadResult(t.metadataPath, t.metadata))
      case _ =>
        sendError(ex, 400, "BadRequestException",
          "backing catalog does not support register")
    }
  }

  /** The commit endpoint: requirements validate against CURRENT metadata,
    * updates apply to it, and the result commits through the backing CAS.
    * The per-table lock serializes REST-level commits; a racing non-REST
    * writer still loses (or wins) at the backing CAS.
    */
  private def commitTable(ex: HttpExchange, ns: String, name: String): Unit = {
    val full = fullName(ns, name)
    val body = readJson(ex)
    val reqs = Option(body.get("requirements"))
      .map(_.elements().asScala.map(UpdateJson.requirementFromNode).toSeq).getOrElse(Nil)
    val ups = Option(body.get("updates"))
      .map(_.elements().asScala.map(UpdateJson.updateFromNode).toSeq).getOrElse(Nil)

    val lock = commitLocks.computeIfAbsent(full, _ => new Object)
    lock.synchronized {
      val exists = backing.tableExists(full)
      val current = if (exists) Some(backing.loadTable(full)) else None
      reqs.foreach { r =>
        Requirement.check(r, current.map(_.metadata)).foreach(msg =>
          throw new CommitConflict(s"requirement failed: $msg"))
      }
      val t = current.getOrElse(throw new NoSuchElementException(s"no such table: $full"))
      val applied0 = ups.foldLeft(t.metadata)(MetadataUpdate.apply)
      val now = System.currentTimeMillis()
      val (mlog, dropped) =
        graft.table.MetadataLogPolicy.appended(applied0, t.metadataPath, now)
      val applied = applied0.copy(
        lastUpdatedMs = math.max(applied0.lastUpdatedMs, now),
        metadataLog = mlog)
      val newPath = backing.commit(full, t.metadata, applied, t.currentVersion,
        Some(t.metadataPath))
      graft.table.MetadataLogPolicy.deleteTrimmed(applied, dropped)
      sendJson(ex, 200, loadResult(newPath, applied))
    }
  }

  /** Remote scan planning: plan on the server, ship codec payloads. */
  private def planScan(ex: HttpExchange, ns: String, name: String): Unit = {
    val full = fullName(ns, name)
    if (!backing.tableExists(full)) throw new NoSuchElementException(s"no such table: $full")
    val t = backing.loadTable(full)
    val body = readJson(ex)
    var scan = t.newScan
    Option(body.get("snapshot-id")).filterNot(_.isNull)
      .foreach(n => scan = scan.useSnapshot(n.asLong()))
    Option(body.get("filter")).filterNot(_.isNull).foreach { f =>
      scan = scan.withFilter(graft.core.ExprJson.fromJson(f.toString, Some(t.schema)))
    }
    Option(body.get("select")).filterNot(_.isNull).foreach { sel =>
      val cols = sel.elements().asScala.map(_.asText()).toSeq
      if (cols.nonEmpty) scan = scan.select(cols: _*)
    }
    val tasks = scan.planFiles()
    val schemaId = scan.snapshot.flatMap(_.schemaId).getOrElse(t.metadata.currentSchemaId)
    val schema = t.metadata.schemaById(schemaId).getOrElse(t.schema)
    val o = mapper.createObjectNode()
    o.put("status", "completed")
    o.put("format-version", t.metadata.formatVersion)
    o.put("schema-id", schemaId)
    // the SPEC FileScanTask JSON wire (scan_task_decoder.go:40-177, Java
    // ContentFileParser): data-file objects in plain JSON, one deduplicated
    // delete-files array per ENVELOPE referenced by index — any
    // spec-conformant engine can consume this plan. Inline tasks form one
    // envelope; each plan-task shard is its own (references are
    // envelope-scoped, so shards resolve independently).
    // Inline up to the shard size; the remainder travels as opaque
    // plan-task handles resolved by POST …/tasks (spec fetchScanTasks) —
    // a wide plan never ships as one response body, and the client fans
    // the shard fetches out.
    val (inline, sharded) =
      if (planTaskShardSize > 0) tasks.splitAt(planTaskShardSize)
      else (tasks, Seq.empty[graft.table.FileScanTask])
    ScanTaskJson.writeTasks(mapper, o, inline, t.metadata.specById,
      schema, scan.filter)
    val shardHandles = Seq.newBuilder[String]
    if (sharded.nonEmpty) {
      val handles = o.putArray("plan-tasks")
      sharded.grouped(planTaskShardSize).foreach { group =>
        val handle = s"pt-${java.util.UUID.randomUUID()}"
        val filter = scan.filter
        val specById = t.metadata.specById _
        val mk = () => {
          val shard = mapper.createObjectNode()
          ScanTaskJson.writeTasks(mapper, shard, group, specById, schema, filter)
          shard
        }
        planShards.put(handle, (mk, System.currentTimeMillis() + planTtlMs))
        handles.add(handle)
        shardHandles += handle
        ()
      }
    }
    // plan-scoped storage credentials ride on the completed plan (reference
    // `catalog/rest/scan_planning.go:442-450`): the executors that run these
    // tasks need to open the files, and the server is who has storage access
    vendCredentials.foreach(v => credentialsNode(o, v(t.metadata.location)))
    if (tasks.size >= asyncPlanThreshold) {
      // async submit (spec planTableScan "submitted"): the result parks
      // under a plan-id; at least one poll returns "submitted" before the
      // completed payload, exercising the client's poll loop for real
      sweepExpiredPlans()
      val id = s"plan-${java.util.UUID.randomUUID()}"
      plans.put(id, new PendingPlan(o, pollsLeft = 1, status = "submitted",
        handles = shardHandles.result(),
        expiresAtMs = System.currentTimeMillis() + planTtlMs))
      val sub = mapper.createObjectNode()
      sub.put("status", "submitted")
      sub.put("plan-id", id)
      sendJson(ex, 200, sub)
    } else sendJson(ex, 200, o)
  }

  /** `GET …/plan/{plan-id}` (spec fetchPlanningResult): submitted until the
    * poll budget drains, then the completed payload; a cancelled plan
    * reports "cancelled"; an unknown or expired id is the TYPED 404 the
    * reference's polling layer keys on (`scan_planning.go:50-120`:
    * NoSuchPlanIdException → retry-with-a-new-plan, unlike a table-gone
    * 404 which aborts).
    */
  private def planStatus(ex: HttpExchange, id: String): Unit = {
    planPolls.incrementAndGet()
    sweepExpiredPlans()
    plans.get(id) match {
      case null =>
        sendError(ex, 404, "NoSuchPlanIdException", s"no such plan: $id")
      case p if p.status == "cancelled" =>
        val o = mapper.createObjectNode(); o.put("status", "cancelled")
        sendJson(ex, 200, o)
      case p if p.pollsLeft > 0 =>
        p.pollsLeft -= 1
        val o = mapper.createObjectNode(); o.put("status", "submitted")
        sendJson(ex, 200, o)
      case p =>
        // terminal fetch: the payload leaves with the response, so the
        // parked plan is reclaimed here (its unfetched shard handles stay
        // until fetched one-shot or TTL-swept — the client fans those out
        // AFTER reading this payload)
        plans.remove(id)
        sendJson(ex, 200, p.node)
    }
  }

  /** `DELETE …/plan/{plan-id}` (spec cancelPlanning): idempotent on a live
    * plan; unknown id is the typed 404.
    */
  private def cancelPlan(ex: HttpExchange, id: String): Unit = {
    sweepExpiredPlans()
    plans.get(id) match {
      case null => sendError(ex, 404, "NoSuchPlanIdException", s"no such plan: $id")
      case p =>
        p.status = "cancelled"
        // reclaim the plan's shard state: nothing will fetch them now
        p.handles.foreach(planShards.remove)
        ex.sendResponseHeaders(204, -1)
    }
  }

  /** `POST …/tasks` (spec fetchScanTasks): resolve one opaque plan-task
    * handle to its shard of file-scan-tasks. Unknown handle → typed 404
    * (NoSuchPlanTaskException, distinct from table-gone).
    */
  private def fetchScanTasks(ex: HttpExchange): Unit = {
    taskFetches.incrementAndGet()
    sweepExpiredPlans()
    val handle = Option(readJson(ex).get("plan-task")).map(_.asText()).getOrElse("")
    // one-shot handles: serving a shard evicts it, so shard state is
    // bounded by in-flight plans, not by server lifetime; a re-fetch gets
    // the typed 404 the client maps to NoSuchPlanTaskException
    planShards.remove(handle) match {
      case null =>
        sendError(ex, 404, "NoSuchPlanTaskException", s"no such plan task: $handle")
      case entry @ (mkShard, _) =>
        // serialize-at-fetch: if the thunk fails (transient — e.g. heap
        // pressure while the fan-out serializes concurrently), the
        // one-shot handle must survive for the client's retry; consuming
        // it would turn a retryable 500 into a misleading terminal 404
        val shard = try mkShard() catch {
          case e: Throwable => planShards.put(handle, entry); throw e
        }
        sendJson(ex, 200, shard)
    }
  }

  /** `GET .../tables/{t}/credentials` (spec loadCredentials): table-scoped
    * storage credentials a reader re-fetches when its vended set expires
    * (reference `catalog/rest/rest.go:1153-1179`).
    */
  private def loadCredentials(ex: HttpExchange, ns: String, name: String): Unit = {
    val full = fullName(ns, name)
    if (!backing.tableExists(full)) throw new NoSuchElementException(s"no such table: $full")
    val v = vendCredentials.getOrElse(
      throw new IllegalArgumentException("credential vending is not enabled"))
    val o = mapper.createObjectNode()
    credentialsNode(o, v(backing.loadTable(full).metadata.location))
    sendJson(ex, 200, o)
  }

  private def credentialsNode(o: ObjectNode,
      creds: Seq[graft.io.StorageCredential]): Unit = {
    val arr = o.putArray("storage-credentials")
    creds.foreach { c =>
      val co = arr.addObject()
      co.put("prefix", c.prefix)
      val cfg = co.putObject("config")
      c.config.toSeq.sortBy(_._1).foreach { case (k, v) => cfg.put(k, v) }
    }
  }

  // received metrics reports, newest last (spec reportMetrics endpoint is
  // fire-and-forget; the buffer exists so gates can assert the round-trip)
  private val metricsReports =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, graft.metrics.MetricsReport)]()

  def receivedMetricsReports: Seq[(String, graft.metrics.MetricsReport)] = {
    import scala.jdk.CollectionConverters._
    metricsReports.iterator().asScala.toSeq
  }

  /** `POST .../tables/{t}/metrics` (spec reportMetrics): accept a scan or
    * commit report in the wire form and acknowledge with 204. The body is
    * parsed — not just buffered — so a malformed report fails loudly here
    * instead of rotting in a log.
    */
  private def receiveMetrics(ex: HttpExchange, ns: String, name: String): Unit = {
    val full = fullName(ns, name)
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    metricsReports.add(full -> graft.metrics.Wire.fromJson(body))
    ex.sendResponseHeaders(204, -1)
  }

  // ---- functions (spec function endpoints; reference rest.go:2419-2560,
  // endpoints listFunctions/loadFunction — the spec defines no create or
  // HEAD routes; existence is checked by loading) --------------------------

  private def udfs: graft.catalog.MetaObjects = backing.viewStore match {
    case Some(m: graft.catalog.MetaObjects) => m
    case _ => throw new IllegalArgumentException(
      "backing catalog does not store functions")
  }

  private def listFunctions(ex: HttpExchange, ns: String): Unit = {
    val (page, next) = paginated(ex, udfs.listFunctions())
    val o = mapper.createObjectNode()
    val arr = o.putArray("identifiers")
    page.foreach { f =>
      val id = arr.addObject()
      val na = id.putArray("namespace"); na.add(ns)
      id.put("name", f)
      ()
    }
    next.foreach(o.put("next-page-token", _))
    sendJson(ex, 200, o)
  }

  /** The load 404 distinguishes a missing namespace from a missing
    * function by error.type (reference `rest.go:2504-2540` discriminates
    * exactly this way — functions live in the default namespace of the
    * flat store).
    */
  private def loadFunction(ex: HttpExchange, ns: String, fn: String): Unit = {
    if (ns != "default")
      return sendError(ex, 404, "NoSuchNamespaceException", s"no such namespace: $ns")
    if (!udfs.functionExists(fn))
      return sendError(ex, 404, "NoSuchFunctionException", s"no such function: $fn")
    val d = udfs.loadFunction(fn)
    val o = mapper.createObjectNode()
    o.put("metadata-location", udfs.functionLocation(fn))
    val m = o.putObject("metadata")
    m.put("name", d.name)
    m.put("return-type", d.returnType)
    m.put("definition", d.definition)
    d.comment.foreach(m.put("comment", _))
    val ps = m.putArray("parameters")
    d.parameters.foreach { case (n, t) =>
      val p = ps.addObject(); p.put("name", n); p.put("type", t); ()
    }
    sendJson(ex, 200, o)
  }

  // ---- views (spec view endpoints; reference rest.go:2013-2380) ---------

  private def views: graft.catalog.ViewStore = backing.viewStore.getOrElse(
    throw new IllegalArgumentException("backing catalog does not store views"))

  private def viewResult(m: graft.catalog.ViewMetadata): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("metadata-location", s"${m.location}/v${m.metadataSeq}.view.json")
    o.set[ObjectNode]("metadata", graft.catalog.ViewJson.toNode(m))
    o
  }

  private def listViews(ex: HttpExchange, ns: String): Unit = {
    val (page, next) = paginated(ex, views.listViews())
    val o = mapper.createObjectNode()
    val arr = o.putArray("identifiers")
    page.foreach { n =>
      val id = arr.addObject()
      id.putArray("namespace")
      id.put("name", n)
      ()
    }
    next.foreach(o.put("next-page-token", _))
    sendJson(ex, 200, o)
  }

  private def createView(ex: HttpExchange, ns: String): Unit = {
    val body = readJson(ex)
    val name = fullName(ns, body.get("name").asText)
    if (views.viewExists(name))
      return sendError(ex, 409, "ViewAlreadyExistsException",
        s"view $name already exists")
    val version = graft.catalog.ViewJson.versionFrom(body.get("view-version"))
    val props = Option(body.get("properties")).map(p =>
      p.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
      .getOrElse(Map.empty[String, String])
    sendJson(ex, 200, viewResult(views.createViewVersioned(name, version, props)))
  }

  private def loadView(ex: HttpExchange, ns: String, v: String): Unit = {
    val name = fullName(ns, v)
    if (!views.viewExists(name))
      return sendError(ex, 404, "NoSuchViewException", s"no such view: $name")
    sendJson(ex, 200, viewResult(views.loadView(name)))
  }

  /** `POST .../views/{v}`: commit — replace-version appends a new current
    * version, update-properties mutates properties only. The store's CAS
    * guards concurrent writers; a lost race surfaces as 409.
    */
  private def commitView(ex: HttpExchange, ns: String, v: String): Unit = {
    val name = fullName(ns, v)
    if (!views.viewExists(name))
      return sendError(ex, 404, "NoSuchViewException", s"no such view: $name")
    val body = readJson(ex)
    val updated = body.get("action").asText match {
      case "replace-version" =>
        views.replaceViewVersioned(name,
          graft.catalog.ViewJson.versionFrom(body.get("view-version")))
      case "update-properties" =>
        val set = Option(body.get("set")).map(p =>
          p.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
          .getOrElse(Map.empty[String, String])
        val remove = Option(body.get("remove")).map(
          _.elements().asScala.map(_.asText).toSeq).getOrElse(Nil)
        views.updateViewProperties(name, set, remove)
      case other => throw new IllegalArgumentException(
        s"unknown view commit action: $other")
    }
    sendJson(ex, 200, viewResult(updated))
  }

  private def renameView(ex: HttpExchange): Unit = {
    val body = readJson(ex)
    def ident(n: com.fasterxml.jackson.databind.JsonNode): String = {
      val nsArr = n.get("namespace").elements().asScala.map(_.asText).toSeq
      fullName(if (nsArr.isEmpty) "default" else nsArr.mkString("."),
        n.get("name").asText)
    }
    val from = ident(body.get("source"))
    val to = ident(body.get("destination"))
    if (!views.viewExists(from))
      return sendError(ex, 404, "NoSuchViewException", s"no such view: $from")
    if (views.viewExists(to))
      return sendError(ex, 409, "ViewAlreadyExistsException",
        s"view $to already exists")
    sendJson(ex, 200, viewResult(views.renameView(from, to)))
  }

  private def loadResult(path: String, meta: TableMetadata): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("metadata-location", path)
    o.set[ObjectNode]("metadata", mapper.readTree(TableMetadata.toJson(meta)).asInstanceOf[ObjectNode])
    // table-scoped storage credentials ride on load/create/commit responses
    // (reference rest.go:1380-1395): the client's table IO applies them
    // lazily and re-fetches through GET .../credentials on expiry
    vendCredentials.foreach(v => credentialsNode(o, v(meta.location)))
    o
  }

  // ---- plumbing ----------------------------------------------------------

  private def readJson(ex: HttpExchange): JsonNode = {
    val bytes = ex.getRequestBody.readAllBytes()
    if (bytes.isEmpty) mapper.createObjectNode()
    else mapper.readTree(new String(bytes, StandardCharsets.UTF_8))
  }

  private def sendJson(ex: HttpExchange, code: Int, node: JsonNode): Unit = {
    val out = mapper.writeValueAsString(node).getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, out.length)
    ex.getResponseBody.write(out)
  }

  private def sendError(ex: HttpExchange, code: Int, errType: String, msg: String): Unit = {
    val o = mapper.createObjectNode()
    val e = o.putObject("error")
    e.put("message", msg); e.put("type", errType); e.put("code", code)
    try sendJson(ex, code, o) catch { case _: Exception => () }
  }
}
