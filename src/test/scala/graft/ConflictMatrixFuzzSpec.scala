package graft

import java.nio.file.Files

import scala.collection.mutable
import scala.util.{Failure, Random, Success, Try}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.{CommitConflict, CommitStateUnknown, HadoopCatalog}
import graft.core._
import graft.format.PartitionSpec
import graft.table.{Evolve, Maintenance, SparkRead, ValidationException, Writer}

/** Pairwise conflict-matrix fuzz (reference
  * `table/conflict_validation.go:68-860`): two random operations race from
  * ONE stale base — A commits, then B commits from the SAME pre-A handle
  * (the deterministic worst-case schedule, no threads needed). Under the
  * default serializable isolation the universal invariant is:
  *
  *   - B SUCCEEDED  → the table equals the SERIAL model base→A→B
  *     (B's effect recomputed over A's state — position-based deletes that
  *     could not be recomputed must have conflicted instead);
  *   - B CONFLICTED → the table equals base→A exactly (nothing partial).
  *
  * Either outcome is legal for any pair — the validators choose — but a
  * silent third state (lost update, resurrected delete, phantom) is a bug.
  * The two r16 wrong-answer races (MoR lost update, DV-supersede
  * resurrect) are exactly such third states; this suite generalizes those
  * fixed shapes to the full operation matrix so the next gap surfaces
  * here first.
  */
class ConflictMatrixFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val segs = Seq("A", "B", "C")
  private type Model = mutable.Map[Long, (String, Int)] // id -> (seg, v)

  /** One racing operation: a table action plus its predicate-semantics
    * model transform (state-independent, so the serial recompute is exact).
    */
  private case class Op(name: String,
      run: graft.table.Table => graft.table.Table,
      model: Model => Unit)

  private def ops(r: Random, m: Model, nextId: () => Long): Op = {
    import spark.implicits._
    r.nextInt(12) match {
      case 0 | 1 => // append a fresh batch
        val rows = (0 until 4 + r.nextInt(6))
          .map(_ => (nextId(), segs(r.nextInt(segs.size)), r.nextInt(100)))
        Op(s"append(${rows.size})",
          t => Writer.append(spark, t, rows.toDF("id", "seg", "v")),
          mm => rows.foreach { case (id, s, v) => mm(id) = (s, v) })
      case 2 | 3 => // CoW delete by value predicate
        val x = r.nextInt(100)
        Op(s"cowDelete(v<$x)",
          t => Writer.deleteWhere(spark, t, Expr.lt("v", x)),
          mm => mm.filterInPlace { case (_, (_, v)) => v >= x })
      case 4 | 5 => // v3 DV delete by id range
        val a = r.nextLong(60); val b = a + 5 + r.nextInt(30)
        Op(s"dvDelete[$a,$b)",
          t => Writer.deleteWhereDV(spark, t,
            Expr.and(Expr.gtEq("id", a), Expr.lt("id", b))),
          mm => mm.filterInPlace { case (id, _) => id < a || id >= b })
      case 6 | 7 => // equality delete on a key sample
        val ids = r.shuffle(m.keys.toSeq).take(2 + r.nextInt(6))
        Op(s"eqDelete(${ids.size})",
          t => Writer.equalityDelete(spark, t, ids.toDF("id"), Seq("id")),
          mm => ids.foreach(mm.remove))
      case 8 => // CoW delete by segment (partition-aligned)
        val s = segs(r.nextInt(segs.size))
        Op(s"cowDelete(seg=$s)",
          t => Writer.deleteWhere(spark, t, Expr.eq("seg", s)),
          mm => mm.filterInPlace { case (_, (seg, _)) => seg != s })
      case 9 | 10 => // bin-pack compaction (content-neutral)
        Op("compact",
          t => Maintenance.rewriteDataFiles(spark, t, rewriteAll = true).table,
          _ => ())
      case 11 => // delete-file compaction (content-neutral)
        Op("deleteCompact",
          t => Maintenance.rewritePositionDeleteFiles(spark, t).table,
          _ => ())
    }
  }

  private def isConflict(e: Throwable): Boolean = {
    var c = e
    while (c != null) {
      if (c.isInstanceOf[ValidationException] ||
        c.isInstanceOf[CommitConflict] ||
        c.isInstanceOf[CommitStateUnknown]) return true
      c = c.getCause
    }
    false
  }

  private def contents(t: graft.table.Table): Map[Long, (String, Int)] =
    SparkRead.read(spark, t.newScan).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap

  private def walk(seed: Long, rounds: Int): Unit = {
    val r = new Random(seed)
    val wh = Files.createTempDirectory(s"graft-cmx-$seed").toString
    val cat = new HadoopCatalog(wh)
    (0 until rounds).foreach { round =>
      import spark.implicits._
      var idGen = 0L
      def nextId(): Long = { val v = idGen; idGen += 1; v }
      val baseRows = (0 until 60)
        .map(_ => (nextId(), segs(r.nextInt(segs.size)), r.nextInt(100)))
      val df = baseRows.toDF("id", "seg", "v")
      val schema = SchemaBridge.fromSpark(df.schema)
      val t0 = cat.createTable(s"cmx$round", schema,
        PartitionSpec.builder(schema).add("seg", Transforms.Identity).build())
      // upgrade FIRST so every appended row carries v3 lineage; two
      // appends so files span lineage blocks; some rounds carry a
      // pre-existing DV so the racers contend with prior delete state
      val up0 = Evolve.upgradeFormatVersion(t0, 3)
      val t1 = Writer.append(spark, up0, df.filter($"id" < 30))
      val t2 = Writer.append(spark, t1, df.filter($"id" >= 30))
      val model: Model = mutable.Map(baseRows.map { case (id, s, v) => id -> ((s, v)) }: _*)
      val base = if (r.nextBoolean()) {
        val x = r.nextLong(50)
        model.remove(x)
        Writer.deleteWhereDV(spark, t2, Expr.eq("id", x))
      } else t2

      val opA = ops(r, m = model, nextId)
      Try(opA.run(base)) match {
        case Success(_) => ()
        case Failure(e) => fail(
          s"seed=$seed round=$round: first op ${opA.name} failed on a " +
          s"quiet table: ${e.getMessage}")
      }
      opA.model(model) // model after A
      // one or two more racers, EACH from the same stale pre-A handle; the
      // model folds in exactly the ops that committed, in commit order
      val racers = (0 until 1 + r.nextInt(2)).map(_ => ops(r, m = model, nextId))
      racers.foreach { op =>
        val outcome = Try(op.run(base))
        val fin = contents(cat.loadTable(s"cmx$round"))
        outcome match {
          case Success(_) =>
            op.model(model) // serial recompute over the committed state
            assert(fin === model.toMap,
              s"seed=$seed round=$round: ${op.name} after ${opA.name} " +
              s"SUCCEEDED but the table is not the serial composition " +
              s"(extra=${(fin.keySet -- model.keySet).take(5)}, " +
              s"missing=${(model.keySet -- fin.keySet).take(5)})")
          case Failure(e) =>
            assert(isConflict(e),
              s"seed=$seed round=$round: ${op.name} after ${opA.name} " +
              s"failed with a NON-conflict error: $e")
            assert(fin === model.toMap,
              s"seed=$seed round=$round: ${op.name} CONFLICTED after " +
              s"${opA.name} but the table moved off the committed state")
        }
      }
      // v3 lineage stays coherent whatever the outcome
      val rids = SparkRead.read(spark,
          cat.loadTable(s"cmx$round").newScan.withRowLineage)
        .select("_row_id").collect().map(_.getLong(0))
      assert(rids.distinct.length === rids.length,
        s"seed=$seed round=$round: duplicate _row_id after the race")
    }
  }

  test("pairwise stale-base races: serial composition or clean conflict") {
    walk(seed = 424242L, rounds = 18)
  }
  test("three-way stale-base races over a second seed") {
    walk(seed = 77031L, rounds = 14)
  }
}
