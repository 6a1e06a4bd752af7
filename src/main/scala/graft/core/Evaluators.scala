package graft.core

import graft.core.Expr._
import graft.core.IcebergTypes._
import graft.format.{DataFile, FieldSummary, ManifestFile, PartitionSpec}

/** Metadata-pruning evaluators — the heart of the reference
  * (`table/evaluators.go:42-1683`). All are *inclusive*: they answer
  * "rows might match" and may only false-positive, never false-negative, so
  * pruning can never change results.
  */
object Evaluators {

  /** Project a data-space predicate to partition space ("inclusive
    * projection", `table/evaluators.go:584-657`). For each partition field
    * whose source column the predicate references, rewrite through the
    * transform; un-projectable nodes degrade to AlwaysTrue.
    *
    * Order-preserving transforms project comparisons by applying the
    * transform to the literal and relaxing strictness (x < v => t(x) <=
    * t(v)); bucket projects only Eq/In.
    */
  def inclusiveProjection(schema: IcebergSchema, spec: PartitionSpec)(expr: Expr): Expr = {
    val bySource: Map[String, Seq[graft.format.PartitionField]] =
      spec.fields.groupBy(pf => schema.idToField(pf.sourceId).name)

    def project(e: Expr): Expr = e match {
      case AlwaysTrue => AlwaysTrue
      case AlwaysFalse => AlwaysFalse
      case And(l, r) => Expr.and(project(l), project(r))
      // OR must project both sides or give up: a partial OR projection is not inclusive
      case Or(l, r) =>
        val pl = project(l); val pr = project(r)
        if (pl == AlwaysTrue || pr == AlwaysTrue) AlwaysTrue else Expr.or(pl, pr)
      case Not(_) => AlwaysTrue // callers rewriteNot first
      case _: BBoxPredicate => AlwaysTrue // geo never projects to partitions here
      case _: VariantPredicate => AlwaysTrue // variants are never partition sources
      case p @ Predicate(op, ref, lits) =>
        bySource.get(ref) match {
          case None => AlwaysTrue // column not partitioned on
          case Some(pfs) =>
            pfs.map(pf => projectPredicate(pf, schema, op, lits))
              .reduceOption(Expr.and).getOrElse(AlwaysTrue)
        }
      // transform predicate: literals are already in partition space when a
      // partition field applies the SAME transform to the same source
      case TransformPredicate(op, tr, ref, _, lits) =>
        bySource.get(ref).toSeq.flatten.filter(_.transform == tr) match {
          case Nil => AlwaysTrue
          case pfs if tr.preservesOrder =>
            pfs.map(pf => Predicate(op, pf.name, lits)).reduce(Expr.and)
          case pfs => op match { // bucket-like: equality ops only
            case Op.Eq | Op.In | Op.IsNull | Op.NotNull =>
              pfs.map(pf => Predicate(op, pf.name, lits)).reduce(Expr.and)
            case _ => AlwaysTrue
          }
        }
    }
    project(rewriteNot(expr))
  }

  private def projectPredicate(pf: graft.format.PartitionField, schema: IcebergSchema,
      op: Op, lits: Seq[Any]): Expr = {
    val srcType = schema.idToField(pf.sourceId).fieldType
    val sparkT = SchemaBridge.toSparkType(srcType)
    def t(v: Any): Any =
      pf.transform.apply(Transforms.valueFor(pf.transform, v, srcType), sparkT)
    pf.transform match {
      case Transforms.Void => AlwaysTrue
      case Transforms.Identity =>
        Predicate(op, pf.name, lits)
      case Transforms.Bucket(_) => op match {
        case Op.Eq => Predicate(Op.Eq, pf.name, lits.map(t))
        case Op.In => Expr.in(pf.name, lits.map(t))
        case Op.IsNull | Op.NotNull => Predicate(op, pf.name)
        case _ => AlwaysTrue
      }
      case tr if tr.preservesOrder => op match {
        case Op.IsNull | Op.NotNull => Predicate(op, pf.name)
        case Op.Lt => Predicate(Op.LtEq, pf.name, Seq(t(lits.head)))
        case Op.LtEq => Predicate(Op.LtEq, pf.name, Seq(t(lits.head)))
        case Op.Gt => Predicate(Op.GtEq, pf.name, Seq(t(lits.head)))
        case Op.GtEq => Predicate(Op.GtEq, pf.name, Seq(t(lits.head)))
        case Op.Eq => Predicate(Op.Eq, pf.name, Seq(t(lits.head)))
        case Op.In => Expr.in(pf.name, lits.map(t))
        case Op.StartsWith => srcType match {
          // truncate[w] on strings: prefix-compare in truncated space
          case StringT => pf.transform match {
            case Transforms.Truncate(w) =>
              val s = lits.head.toString
              if (s.length >= w) Predicate(Op.Eq, pf.name, Seq(s.substring(0, w)))
              else Predicate(Op.StartsWith, pf.name, Seq(s))
            case _ => AlwaysTrue
          }
          case _ => AlwaysTrue
        }
        case _ => AlwaysTrue
      }
      case _ => AlwaysTrue
    }
  }

  /** Manifest-level pruning (`manifestEvalVisitor`, `table/evaluators.go:42-582`):
    * evaluates the partition-space predicate against each manifest's
    * per-partition-field summaries. Returns true iff rows might match.
    */
  def manifestMightMatch(schema: IcebergSchema, spec: PartitionSpec,
      partitionExpr: Expr, manifest: ManifestFile): Boolean = {
    if (manifest.partitions.isEmpty) return true
    val partType = spec.partitionType(schema)
    val byName: Map[String, (FieldSummary, IcebergType)] =
      spec.fields.zip(manifest.partitions).zip(partType.fields).map {
        case ((pf, summary), nf) => pf.name -> (summary, nf.fieldType)
      }.toMap

    def eval(e: Expr): Boolean = e match {
      case AlwaysTrue => true
      case AlwaysFalse => false
      case And(l, r) => eval(l) && eval(r)
      case Or(l, r) => eval(l) || eval(r)
      case Not(c) => true // conservatively might-match; rewriteNot removes these
      case Predicate(op, ref, lits) =>
        byName.get(ref) match {
          case None => true
          case Some((s, ft)) => predMightMatch(op, lits, ft,
            // malformed (wrong-length) bounds degrade to no-bound → keep
            lower = s.lowerBound.flatMap(Literals.decodeChecked(ft, _)),
            upper = s.upperBound.flatMap(Literals.decodeChecked(ft, _)),
            mayNull = s.containsNull,
            mayNan = s.containsNan.getOrElse(true),
            allNull = !s.lowerBound.isDefined && s.containsNull,
            allNan = false)
        }
      case _: TransformPredicate => true // projected before manifest eval
      case _: BBoxPredicate => true
      case _: VariantPredicate => true
    }
    eval(partitionExpr)
  }

  /** File-level stats pruning (inclusive metrics evaluator,
    * `table/evaluators.go:714-1288`). `expr` is in data space; `schema` is
    * the table schema. Returns true iff the file's rows might match.
    */
  def fileMightMatch(schema: IcebergSchema, expr: Expr, f: DataFile): Boolean = {
    if (f.recordCount == 0) return false

    def eval(e: Expr): Boolean = e match {
      case AlwaysTrue => true
      case AlwaysFalse => false
      case And(l, r) => eval(l) && eval(r)
      case Or(l, r) => eval(l) || eval(r)
      case Not(_) => true
      // bbox-vs-file-bounds (reference `table/evaluators.go:1253-1289`): geo
      // bounds are envelope points harvested from the WKB at write time.
      // Only intersects prunes — bounds intersecting the box can't prove
      // every row is outside it, so not-intersects stays might-match.
      case BBoxPredicate(wants, ref, qx0, qy0, qx1, qy1) =>
        if (!wants) true
        else schema.findField(ref) match {
          case Some(field) => field.fieldType match {
            // geography bounds are geodesic and may wrap the antimeridian
            // (lower_x > upper_x); planar XY intersection would mis-prune
            case IcebergTypes.GeographyT(_, _) => true
            case IcebergTypes.GeometryT(_) =>
              val id = field.id
              val allNull = (f.valueCounts.get(id), f.nullCounts.get(id)) match {
                case (Some(v), Some(n)) => v == n
                case _ => false
              }
              if (allNull) false // no geometry can intersect anything
              else (for {
                lo <- f.lowerBounds.get(id).flatMap(Geo.decodeBoundXY)
                hi <- f.upperBounds.get(id).flatMap(Geo.decodeBoundXY)
                // inverted bounds (trust-on-read): unusable, don't prune
                if lo._1 <= hi._1 && lo._2 <= hi._2
              } yield Geo.bboxIntersectsXY(lo._1, lo._2, hi._1, hi._2,
                qx0, qy0, qx1, qy1)).getOrElse(true)
            case _ => true
          }
          case None => true
        }
      case Predicate(op, ref, lits) =>
        schema.findField(ref) match {
          case None => true
          case Some(field) if IcebergTypes.isGeo(field.fieldType) =>
            // geo has no ordering; envelope bounds can't serve value
            // predicates, but null counts still prune IsNull/NotNull
            // (reference containsNullsOnly path)
            val id = field.id
            val geoAllNull = (f.valueCounts.get(id), f.nullCounts.get(id)) match {
              case (Some(v), Some(n)) => v == n
              case _ => false
            }
            op match {
              case Op.IsNull => f.nullCounts.get(id).forall(_ > 0)
              case Op.NotNull => !geoAllNull
              case _ => true
            }
          case Some(field) =>
            val id = field.id
            val ft = field.fieldType
            val valueCount = f.valueCounts.get(id)
            val nullCount = f.nullCounts.get(id)
            val nanCount = f.nanCounts.get(id)
            val allNull = (valueCount, nullCount) match {
              case (Some(v), Some(n)) => v == n
              case _ => false
            }
            val allNan = (valueCount, nanCount) match {
              case (Some(v), Some(n)) => v == n && v > 0
              case _ => false
            }
            predMightMatch(op, lits, ft,
              // malformed (wrong-length) bounds degrade to no-bound → keep
              lower = f.lowerBounds.get(id).flatMap(Literals.decodeChecked(ft, _)),
              upper = f.upperBounds.get(id).flatMap(Literals.decodeChecked(ft, _)),
              mayNull = nullCount.forall(_ > 0),
              mayNan = nanCount.forall(_ > 0),
              allNull = allNull, allNan = allNan)
        }
      // variant_get($.k) over the file's shredded typed_value bounds
      // (reference harvests them in `table/internal/parquet_files.go:
      // 1194-1330`; pruning is the read-side dual): the variant column's
      // lower/upper manifest bounds hold a spec bounds OBJECT keyed by
      // normalized path. A recorded path prunes with the standard range
      // rules; a missing path or cross-type bound stays might-match
      // (untyped residuals invalidate bounds at write time).
      case VariantPredicate(op, ref, path, vt, lits) =>
        schema.findField(ref) match {
          case Some(field) if field.fieldType == VariantT =>
            val norm = VariantBounds.normalizePath(path)
            // compare in a widened domain so int/long and float/double
            // shredded leaves and literals meet on equal footing
            val cmpT = vt match {
              case IntT => LongT; case FloatT => DoubleT; case t => t
            }
            def widen(x: Any): Any = x match {
              case i: Int => i.toLong
              case fl: Float => fl.toDouble
              case other => other
            }
            val lower = f.lowerBounds.get(field.id)
              .flatMap(VariantBounds.get(_, norm)).flatMap(coerce(vt, _))
            val upper = f.upperBounds.get(field.id)
              .flatMap(VariantBounds.get(_, norm)).flatMap(coerce(vt, _))
            if (lower.isEmpty && upper.isEmpty) true
            else predMightMatch(op, lits.map(widen), cmpT, lower, upper,
              mayNull = true, mayNan = true, allNull = false, allNan = false)
          case _ => true
        }
      // transform predicate over file bounds: order-preserving transforms
      // map [lower, upper] to [t(lower), t(upper)] (monotone), so the same
      // range rules apply in transform space; anything unprojectable stays
      // might-match
      case TransformPredicate(op, tr, ref, srcType, lits) =>
        if (!tr.preservesOrder) true
        else schema.findField(ref) match {
          case None => true
          case Some(field) =>
            val id = field.id
            val ft = field.fieldType
            val bounds = scala.util.Try {
              def ap(b: Array[Byte]) =
                tr.apply(Transforms.valueFor(tr, Literals.decodeChecked(ft, b)
                  .getOrElse(throw new IllegalArgumentException(
                    s"malformed bound for $ft")), ft), srcType)
              (f.lowerBounds.get(id).map(ap), f.upperBounds.get(id).map(ap))
            }
            bounds.toOption.forall { case (lo, up) =>
              transformedMightMatch(op, lits, lo, up)
            }
        }
    }
    eval(rewriteNot(expr))
  }

  /** Transform-space comparison (numbers or strings); None = incomparable. */
  private def cmpTransformed(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Number, y: Number) => Some(java.lang.Long.compare(x.longValue, y.longValue))
    case (x: String, y: String) => Some(x.compareTo(y))
    case _ => None
  }

  /** Range rules over transform-space values (numbers or strings). */
  private def transformedMightMatch(op: Op, lits: Seq[Any],
      lower: Option[Any], upper: Option[Any]): Boolean = {
    def cmp(a: Any, b: Any): Int =
      cmpTransformed(a, b).getOrElse(0) // incomparable -> unknown -> might match
    def cmpLower(v: Any) = lower.map(cmp(_, v))
    def cmpUpper(v: Any) = upper.map(cmp(_, v))
    op match {
      case Op.Lt => cmpLower(lits.head).forall(_ < 0)
      case Op.LtEq => cmpLower(lits.head).forall(_ <= 0)
      case Op.Gt => cmpUpper(lits.head).forall(_ > 0)
      case Op.GtEq => cmpUpper(lits.head).forall(_ >= 0)
      case Op.Eq =>
        cmpLower(lits.head).forall(_ <= 0) && cmpUpper(lits.head).forall(_ >= 0)
      case Op.In =>
        lits.exists(v => cmpLower(v).forall(_ <= 0) && cmpUpper(v).forall(_ >= 0))
      case _ => true
    }
  }

  /** Strict dual of [[transformedMightMatch]]: true iff the whole
    * transform-space range [t(lower), t(upper)] satisfies the predicate —
    * incomparable values prove nothing (false), never something.
    */
  private def transformedMustMatch(op: Op, lits: Seq[Any],
      lower: Option[Any], upper: Option[Any]): Boolean = {
    def cmpLower(v: Any): Option[Int] = lower.flatMap(cmpTransformed(_, v))
    def cmpUpper(v: Any): Option[Int] = upper.flatMap(cmpTransformed(_, v))
    op match {
      case Op.Lt => cmpUpper(lits.head).exists(_ < 0)
      case Op.LtEq => cmpUpper(lits.head).exists(_ <= 0)
      case Op.Gt => cmpLower(lits.head).exists(_ > 0)
      case Op.GtEq => cmpLower(lits.head).exists(_ >= 0)
      case Op.Eq =>
        cmpLower(lits.head).exists(_ == 0) && cmpUpper(lits.head).exists(_ == 0)
      case Op.NotEq =>
        cmpLower(lits.head).exists(_ > 0) || cmpUpper(lits.head).exists(_ < 0)
      case Op.In =>
        // single-valued transform range whose value is in the set
        (for { l <- lower; u <- upper; c <- cmpTransformed(l, u) } yield
          c == 0 && lits.exists(v => cmpTransformed(l, v).contains(0))).getOrElse(false)
      case Op.NotIn =>
        lits.forall(v => cmpLower(v).exists(_ > 0) || cmpUpper(v).exists(_ < 0))
      case _ => false
    }
  }

  /** Coerce a decoded variant bound (Long/Double/String/Boolean from the
    * bounds object) into the predicate's comparison domain; None on a
    * cross-type bound (unknown → might match).
    */
  private def coerce(vt: IcebergType, v: Any): Option[Any] = (vt, v) match {
    case (IntT | LongT, l: Long) => Some(l)
    case (FloatT | DoubleT, d: Double) => Some(d)
    case (FloatT | DoubleT, l: Long) => Some(l.toDouble)
    case (StringT, s: String) => Some(s)
    case (BooleanT, b: Boolean) => Some(b)
    case _ => None
  }

  /** Shared inclusive bound logic. `lower`/`upper` are decoded values (None =
    * stat missing => unknown => might match).
    */
  private def predMightMatch(op: Op, lits: Seq[Any], ft: IcebergType,
      lower: Option[Any], upper: Option[Any], mayNull: Boolean, mayNan: Boolean,
      allNull: Boolean, allNan: Boolean): Boolean = {
    def cmpLower(v: Any): Option[Int] = lower.map(l => Literals.compare(ft, l, v))
    def cmpUpper(v: Any): Option[Int] = upper.map(u => Literals.compare(ft, u, v))
    op match {
      case Op.IsNull => mayNull
      case Op.NotNull => !allNull
      case Op.IsNan => mayNan
      case Op.NotNan => !allNan
      case _ if allNull => false // value comparisons can't match an all-null column
      case Op.Lt => cmpLower(lits.head).forall(_ < 0)
      case Op.LtEq => cmpLower(lits.head).forall(_ <= 0)
      case Op.Gt => cmpUpper(lits.head).forall(_ > 0)
      case Op.GtEq => cmpUpper(lits.head).forall(_ >= 0)
      case Op.Eq =>
        cmpLower(lits.head).forall(_ <= 0) && cmpUpper(lits.head).forall(_ >= 0)
      case Op.NotEq => true
      case Op.In =>
        lits.exists(v => cmpLower(v).forall(_ <= 0) && cmpUpper(v).forall(_ >= 0))
      case Op.NotIn => true
      case Op.StartsWith =>
        val prefix = lits.head.toString
        val lowerOk = lower.forall { l =>
          val ls = l.toString
          val lt = if (ls.length > prefix.length) ls.substring(0, prefix.length) else ls
          lt.compareTo(prefix) <= 0
        }
        val upperOk = upper.forall { u =>
          val us = u.toString
          val ut = if (us.length > prefix.length) us.substring(0, prefix.length) else us
          ut.compareTo(prefix) >= 0
        }
        lowerOk && upperOk
      case Op.NotStartsWith => true
    }
  }

  /** Strict metrics evaluator (`table/evaluators.go:1290-1683`): returns true
    * iff EVERY row in the file matches the predicate — the dual of
    * `fileMightMatch`. False negatives are allowed (we fall back to a
    * rewrite); false positives would drop live rows, so every rule is
    * conservative. Used to classify fully-matched files in DELETE WHERE for
    * metadata-only removal (wired as in `table/transaction.go:1767-1860`).
    *
    * `expr` must be NOT-rewritten (`rewriteNot`) first.
    */
  def fileMustMatch(schema: IcebergSchema, expr: Expr, f: DataFile): Boolean = {
    // an empty file vacuously matches: dropping it removes nothing
    if (f.recordCount == 0) return true

    def eval(e: Expr): Boolean = e match {
      case AlwaysTrue => true
      case AlwaysFalse => false
      case And(l, r) => eval(l) && eval(r)
      case Or(l, r) => eval(l) || eval(r)
      case Not(_) => false // conservative; rewriteNot removes these
      // strict proof over transform-space bounds: an order-preserving
      // transform maps [lower, upper] onto [t(lower), t(upper)], so the file
      // fully matches when that whole range satisfies the predicate — the
      // proof behind metadata-only deletes on partition boundaries
      // (DELETE WHERE day(ts) = d drops whole files without a rewrite)
      case TransformPredicate(op, tr, ref, srcType, lits) =>
        if (!tr.preservesOrder) false
        else schema.findField(ref) match {
          case None => false
          case Some(field) =>
            val id = field.id
            val ft = field.fieldType
            val noNulls = f.nullCounts.get(id).contains(0L)
            val noNans = ft match {
              case FloatT | DoubleT => f.nanCounts.get(id).contains(0L)
              case _ => true
            }
            // a null/NaN row fails every transform-space comparison
            if (!noNulls || !noNans) false
            else scala.util.Try {
              def ap(b: Array[Byte]) =
                tr.apply(Transforms.valueFor(tr, Literals.decodeChecked(ft, b)
                  .getOrElse(throw new IllegalArgumentException(
                    s"malformed bound for $ft")), ft), srcType)
              (f.lowerBounds.get(id).map(ap), f.upperBounds.get(id).map(ap))
            }.toOption.exists { case (lo, up) =>
              transformedMustMatch(op, lits, lo, up)
            }
        }
      case _: BBoxPredicate => false
      case _: VariantPredicate => false // bounds can't prove every row matches
      case Predicate(op, ref, lits) =>
        schema.findField(ref) match {
          case None => false
          case Some(field) if IcebergTypes.isGeo(field.fieldType) =>
            // geo bounds are envelopes with no total order: value compares
            // through Literals.compare would throw, and strict proofs need
            // ordering. Only the null predicates are provable from counts.
            val id = field.id
            op match {
              case Op.IsNull => (f.valueCounts.get(id), f.nullCounts.get(id)) match {
                case (Some(v), Some(n)) => v == n
                case _ => false
              }
              case Op.NotNull => f.nullCounts.get(id).contains(0L)
              case _ => false
            }
          case Some(field) =>
            val id = field.id
            val ft = field.fieldType
            val valueCount = f.valueCounts.get(id)
            val nullCount = f.nullCounts.get(id)
            val nanCount = f.nanCounts.get(id)
            val allNull = (valueCount, nullCount) match {
              case (Some(v), Some(n)) => v == n
              case _ => false
            }
            val noNulls = nullCount.contains(0L)
            val noNans = ft match {
              case FloatT | DoubleT => nanCount.contains(0L)
              case _ => true
            }
            // a malformed bound can't PROVE anything: decode to None, and
            // every strict rule's `.exists` collapses to not-proven
            val lower = f.lowerBounds.get(id).flatMap(Literals.decodeChecked(ft, _))
            val upper = f.upperBounds.get(id).flatMap(Literals.decodeChecked(ft, _))
            def cmpLower(v: Any): Option[Int] = lower.map(l => Literals.compare(ft, l, v))
            def cmpUpper(v: Any): Option[Int] = upper.map(u => Literals.compare(ft, u, v))

            op match {
              case Op.IsNull => allNull
              case Op.NotNull => noNulls
              case Op.IsNan => (valueCount, nanCount) match {
                case (Some(v), Some(n)) => v > 0 && v == n
                case _ => false
              }
              // nulls match NotNan (they aren't NaN), so no-NaNs proves the
              // whole file; an all-null column proves it even without
              // nan-counts (reference strictMetricsEval VisitNotNan)
              case Op.NotNan => noNans || allNull
              // a null (or NaN) row fails every value comparison, so strict
              // value predicates require provably-no-nulls/nans first
              case _ if !noNulls || !noNans => false
              case Op.Lt => cmpUpper(lits.head).exists(_ < 0)
              case Op.LtEq => cmpUpper(lits.head).exists(_ <= 0)
              case Op.Gt => cmpLower(lits.head).exists(_ > 0)
              case Op.GtEq => cmpLower(lits.head).exists(_ >= 0)
              case Op.Eq =>
                // all rows equal v iff lower == v == upper
                cmpLower(lits.head).exists(_ == 0) && cmpUpper(lits.head).exists(_ == 0)
              case Op.NotEq =>
                // no row equals v iff v outside [lower, upper]
                cmpLower(lits.head).exists(_ > 0) || cmpUpper(lits.head).exists(_ < 0)
              case Op.In =>
                // single-valued file whose value is in the set
                (lower, upper) match {
                  case (Some(l), Some(u)) if Literals.compare(ft, l, u) == 0 =>
                    lits.exists(v => Literals.compare(ft, l, v) == 0)
                  case _ => false
                }
              case Op.NotIn =>
                lits.forall(v => cmpLower(v).exists(_ > 0) || cmpUpper(v).exists(_ < 0))
              case Op.StartsWith => false // bounds are truncated; never provable
              case Op.NotStartsWith =>
                // no row can start with prefix iff the whole [lower, upper]
                // range lies outside the prefix block (compare truncated)
                val prefix = lits.head.toString
                def trunc(s: String) =
                  if (s.length > prefix.length) s.substring(0, prefix.length) else s
                val upperBelow = upper.exists(u => trunc(u.toString).compareTo(prefix) < 0)
                val lowerAbove = lower.exists { l =>
                  val ls = l.toString
                  // a bound shorter than prefix sorts before it yet rows
                  // extending it may still start with prefix — require strict
                  ls.length >= prefix.length && trunc(ls).compareTo(prefix) > 0
                }
                upperBelow || lowerAbove
            }
        }
    }
    eval(expr)
  }

  /** Partition-value filter at file granularity (exact row eval over the
    * file's partition tuple; `table/scanner.go:480-507`).
    */
  def partitionMatches(schema: IcebergSchema, spec: PartitionSpec,
      partitionExpr: Expr, f: DataFile): Boolean = {
    if (spec.isUnpartitioned) return true
    val partType = spec.partitionType(schema)
    val values: Map[String, Any] = spec.fields.zip(f.partition).map {
      case (pf, v) => pf.name -> v
    }.toMap
    val types: Map[String, IcebergType] = partType.fields.map(nf => nf.name -> nf.fieldType).toMap
    Expr.evalRow(rewriteNot(partitionExpr),
      name => types.getOrElse(name, StringT),
      name => values.getOrElse(name, null))
  }
}
