package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.core.Expr.{And, Not, Op, Or, Predicate}
import graft.core.IcebergTypes._
import graft.format._

/** Seeded-random soundness fuzz over the pruning stack. The unit vectors
  * pin known cases (reference `evaluators_test.go`); this spec asserts the
  * INVARIANTS that make pruning safe at all, across thousands of generated
  * (rows, stats, filter) triples:
  *
  *  1. inclusive metrics evaluator: a file containing ANY matching row is
  *     never pruned (mis-prune = silently wrong results at 100 TB);
  *  2. strict metrics evaluator: a file it claims is only claimed when
  *     EVERY row matches (over-claim = metadata-only delete drops live rows);
  *  3. inclusive partition projection + partition/manifest evaluators: a
  *     matching row's partition tuple (identity/bucket/truncate/day/month
  *     transforms, nulls included) always survives both file-level
  *     partition filtering and manifest FieldSummary pruning.
  *
  * File stats are synthesized the way real writers produce them: string
  * bounds truncated-with-increment at 3 chars, NaN-bearing double columns
  * drop their bounds entirely (parquet-mr invalidates stats on NaN), and a
  * third of files carry counts-only or no stats (the AddFiles import
  * shape). Ground truth is `Expr.evalRow` over `rewriteNot`-normalized
  * filters — the same row semantics `partitionMatches` trusts.
  */
class PruningFuzzSpec extends AnyFunSuite {

  private val schema = IcebergSchema(Seq(
    NestedField(1, "id", LongT, required = true),
    NestedField(2, "s", StringT, required = false),
    NestedField(3, "d", DoubleT, required = false),
    NestedField(4, "n", IntT, required = false),
    NestedField(5, "dt", DateT, required = false)))

  private val typeOf: String => IcebergType =
    schema.fields.map(f => f.name -> f.fieldType).toMap

  type R = Map[String, Any]

  private val sPool = Seq("", "a", "ab", "abc", "abcd", "abcde", "abcz",
    "aac", "b", "zz", "abéx", "abcdzz")

  private def genRow(r: Random): R = Map(
    "id" -> Long.box(r.nextInt(21).toLong),
    "s" -> (if (r.nextInt(5) == 0) null else sPool(r.nextInt(sPool.size))),
    "d" -> (r.nextInt(7) match {
      case 0 => null
      case 1 => Double.box(Double.NaN)
      case k => Double.box((k - 4) * 1.5)
    }),
    "n" -> (if (r.nextInt(5) == 0) null else Int.box(r.nextInt(11) - 5)),
    "dt" -> (if (r.nextInt(5) == 0) null
      else Int.box(r.nextInt(9) - 3))) // straddles 1970: floor-div stress

  // ---- filter generator over the full predicate algebra

  private def lit(r: Random, field: String): Any = field match {
    case "id" => Long.box(r.nextInt(21).toLong)
    case "s" => sPool(1 + r.nextInt(sPool.size - 1)) // non-empty strings
    case "d" => Double.box((r.nextInt(7) - 3) * 1.5)
    case "n" => Int.box(r.nextInt(11) - 5)
    case "dt" => Int.box(r.nextInt(9) - 3)
  }

  private val fields = Seq("id", "s", "d", "n", "dt")

  private def leaf(r: Random): Expr = {
    val f = fields(r.nextInt(fields.size))
    r.nextInt(12) match {
      case 0 => Predicate(Op.IsNull, f)
      case 1 => Predicate(Op.NotNull, f)
      case 2 => Predicate(Op.Lt, f, Seq(lit(r, f)))
      case 3 => Predicate(Op.LtEq, f, Seq(lit(r, f)))
      case 4 => Predicate(Op.Gt, f, Seq(lit(r, f)))
      case 5 => Predicate(Op.GtEq, f, Seq(lit(r, f)))
      case 6 => Predicate(Op.Eq, f, Seq(lit(r, f)))
      case 7 => Predicate(Op.NotEq, f, Seq(lit(r, f)))
      case 8 => Predicate(Op.In, f, Seq.fill(r.nextInt(4))(lit(r, f)))
      case 9 => Predicate(Op.NotIn, f, Seq.fill(r.nextInt(4))(lit(r, f)))
      case 10 if f == "d" => Predicate(
        if (r.nextBoolean()) Op.IsNan else Op.NotNan, f)
      case 11 if f == "s" => Predicate(
        if (r.nextBoolean()) Op.StartsWith else Op.NotStartsWith, f,
        Seq(Seq("", "a", "ab", "abc", "abcd", "z")(r.nextInt(6))))
      case _ => Predicate(Op.Eq, f, Seq(lit(r, f)))
    }
  }

  private def genExpr(r: Random, depth: Int): Expr =
    if (depth == 0) leaf(r)
    else r.nextInt(6) match {
      case 0 => And(genExpr(r, depth - 1), genExpr(r, depth - 1))
      case 1 => Or(genExpr(r, depth - 1), genExpr(r, depth - 1))
      case 2 => Not(genExpr(r, depth - 1))
      case _ => leaf(r)
    }

  // ---- writer-faithful stats synthesis

  private def minMax(ft: IcebergType, vs: Seq[Any]): (Any, Any) = (
    vs.reduce((a, b) => if (Literals.compare(ft, a, b) <= 0) a else b),
    vs.reduce((a, b) => if (Literals.compare(ft, a, b) >= 0) a else b))

  /** mode 0 = full stats (strings truncated@3), 1 = counts only, 2 = none */
  private def mkFile(rows: Seq[R], mode: Int, tag: Int): DataFile = {
    val base = DataFile(DataFileContent.Data, s"fuzz-$tag.parquet", "PARQUET",
      partition = Nil, recordCount = rows.size.toLong, fileSize = 1024L)
    if (mode == 2) return base
    val valueCounts = schema.fields.map(f => f.id -> rows.size.toLong).toMap
    val nullCounts = schema.fields.map(f =>
      f.id -> rows.count(_(f.name) == null).toLong).toMap
    val nanCounts = Map(3 -> rows.count(r => r("d") != null &&
      r("d").asInstanceOf[Double].isNaN).toLong)
    if (mode == 1)
      return base.copy(valueCounts = valueCounts, nullCounts = nullCounts,
        nanCounts = nanCounts)
    val lowers = Map.newBuilder[Int, Array[Byte]]
    val uppers = Map.newBuilder[Int, Array[Byte]]
    schema.fields.foreach { f =>
      val all = rows.map(_(f.name)).filter(_ != null)
      val vs = f.fieldType match {
        case DoubleT => all.filterNot(_.asInstanceOf[Double].isNaN)
        case _ => all
      }
      // parquet-mr invalidates double stats when NaN is present
      val nanPoisoned = f.fieldType == DoubleT && vs.size != all.size
      if (vs.nonEmpty && !nanPoisoned) {
        val (lo, hi) = minMax(f.fieldType, vs)
        f.fieldType match {
          case StringT =>
            lowers += f.id -> Literals.encode(StringT,
              Literals.truncateLower(lo.toString, 3))
            Literals.truncateUpper(hi.toString, 3).foreach(u =>
              uppers += f.id -> Literals.encode(StringT, u))
          case ft =>
            lowers += f.id -> Literals.encode(ft, lo)
            uppers += f.id -> Literals.encode(ft, hi)
        }
      }
    }
    base.copy(valueCounts = valueCounts, nullCounts = nullCounts,
      nanCounts = nanCounts, lowerBounds = lowers.result(),
      upperBounds = uppers.result())
  }

  test("metrics evaluators: inclusive never mis-prunes, strict never over-claims") {
    val r = new Random(20260816L)
    var inclusiveHits = 0
    var strictProofs = 0
    (0 until 6000).foreach { iter =>
      val rows = Seq.fill(1 + r.nextInt(6))(genRow(r))
      val file = mkFile(rows, r.nextInt(3), iter)
      val filter = genExpr(r, 2)
      val rw = Expr.rewriteNot(filter)
      val bound = Expr.bindNames(rw, schema, caseSensitive = true)
      val matches = rows.map(row => Expr.evalRow(rw, typeOf, row(_)))
      val diag = s"iter=$iter\nfilter=$filter\nrows=$rows\nfile=$file"

      if (matches.exists(identity)) {
        inclusiveHits += 1
        assert(Evaluators.fileMightMatch(schema, bound, file),
          s"INCLUSIVE PRUNED A MATCHING FILE\n$diag")
      }
      if (Evaluators.fileMustMatch(schema, bound, file)) {
        strictProofs += 1
        assert(matches.forall(identity),
          s"STRICT CLAIMED A NON-MATCHING ROW\n$diag")
      }
    }
    // the generator must actually exercise both sides
    assert(inclusiveHits > 1000, s"weak generator: $inclusiveHits matching cases")
    assert(strictProofs > 50, s"weak generator: $strictProofs strict proofs")
  }

  test("partition projection + manifest summaries never prune a matching row") {
    val spec = PartitionSpec(0, Seq(
      PartitionField(4, 1000, "n", Transforms.Identity),
      PartitionField(1, 1001, "id_bucket", Transforms.Bucket(8)),
      PartitionField(2, 1002, "s_trunc", Transforms.Truncate(2)),
      PartitionField(5, 1003, "dt_day", Transforms.Days),
      PartitionField(5, 1004, "dt_month", Transforms.Months)))
    val partType = spec.partitionType(schema)
    val r = new Random(816L)
    var hits = 0
    (0 until 6000).foreach { iter =>
      val row = genRow(r)
      val filter = genExpr(r, 2)
      val rw = Expr.rewriteNot(filter)
      if (Expr.evalRow(rw, typeOf, row(_))) {
        hits += 1
        val bound = Expr.bindNames(rw, schema, caseSensitive = true)
        val tuple: Seq[Any] = spec.fields.map { pf =>
          val src = schema.idToField(pf.sourceId)
          val v = row(src.name)
          if (v == null) null
          else pf.transform.apply(
            Transforms.valueFor(pf.transform, v, src.fieldType),
            SchemaBridge.toSparkType(src.fieldType))
        }
        val file = DataFile(DataFileContent.Data, s"fuzz-$iter.parquet",
          "PARQUET", partition = tuple, recordCount = 1L, fileSize = 1024L)
        val pExpr = Evaluators.inclusiveProjection(schema, spec)(bound)
        val diag = s"iter=$iter\nfilter=$filter\nrow=$row\ntuple=$tuple\nprojected=$pExpr"
        assert(Evaluators.partitionMatches(schema, spec, pExpr, file),
          s"PARTITION FILTER PRUNED A MATCHING ROW\n$diag")
        val mf = ManifestFile(s"m-$iter.avro", 1L, 0, ManifestContent.Data,
          1L, 1L, 1L, 1, 0, 0, 1L, 0L, 0L,
          graft.table.Writer.partitionSummaries(Seq(file), partType))
        assert(Evaluators.manifestMightMatch(schema, spec, pExpr, mf),
          s"MANIFEST SUMMARY PRUNED A MATCHING ROW\n$diag")
      }
    }
    assert(hits > 1500, s"weak generator: $hits matching cases")
  }
}
