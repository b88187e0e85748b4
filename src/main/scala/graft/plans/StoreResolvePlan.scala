package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Descending, EqualTo, Expression, IsNotNull, Literal, RowNumber, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Union, Window, WindowGroupLimit}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Recognizes the optimized logical shape of
  * [[graft.sources.MorTableStore.snapshot]] — newest-wins resolution over
  * per-bucket delta stacks — as a single TABLE LEAF, so star-MV rewrites
  * can serve rollups that join a maintained MOR snapshot exactly like they
  * serve copy-on-write snapshots. A CoW snapshot is one parquet relation
  * (matched by exact dir-set lookup); a MOR snapshot is a small plan:
  *
  * {{{
  *   Union                                        // or a single branch
  *   ├─ Project(dataCols, Filter(_op = 'u', Scan(flatDirs)))
  *   └─ Project(dataCols, Filter(_rn = 1 ∧ _op = 'u',
  *        Window(row_number as _rn
  *          PARTITION BY pk ORDER BY _seq DESC, _op DESC, Scan(stackDirs))))
  * }}}
  *
  * Matching is deliberately EXACT and refuses anything it does not fully
  * recognize — a refusal only costs the reroute (the query runs the live
  * resolution), never correctness. The three guards, in order:
  *
  *  1. IDENTITY + FRESHNESS: the union of every scan's root paths must
  *     equal a dir set a maintainer registered
  *     ([[MaterializedView.registerDirs]]) — the same exact-set staleness
  *     guard CoW serving uses. A merge or compaction after the last sync
  *     changes the manifest's dir set and the lookup misses.
  *  2. WHOLE-TABLE SHAPE: only the marker predicates above (plus
  *     optimizer-inferred IsNotNull noise) may appear. A user filter
  *     pushed into the branches — even one on pk columns pushed below the
  *     Window — adds a conjunct or a Filter node the grammar refuses, so
  *     a FILTERED snapshot can never be mistaken for the whole table.
  *  3. NO METADATA LEAK: the subtree's output must be data columns only
  *     (no `_op`/`_seq`/`_rn`), i.e. the resolution is complete.
  *  4. STACKED-DIR PLACEMENT: the registration records which dirs sit in
  *     multi-dir (stacked) buckets; the Window branch must scan exactly
  *     those and the window-less branch exactly the flat ones. A raw
  *     `_op = 'u'` scan over a dir set containing any stacked bucket
  *     (unresolved duplicate key versions) is REFUSED — without this
  *     guard it would be matched as the resolved whole table.
  *
  * Inferred `IsNotNull(<data column>)` conjuncts (the optimizer plants
  * them for every equi-join key and pushes them into both branches) are
  * accepted and RE-EMITTED as leaf-level filters referencing the leaf's
  * output attributes — the star rewrite's existing vacuity logic then
  * drops them for join keys exactly as it does over parquet leaves. They
  * must appear in every branch alike (the optimizer pushes uniformly;
  * asymmetry means something else is going on — refuse).
  *
  * The shape is pinned against [[graft.sources.MorTableStore]]'s
  * `resolveStacks` (see the SERVING CONTRACT note there) and against the
  * post-optimizer form: `InferWindowGroupLimit` may plant a
  * [[WindowGroupLimit]] under the Window — semantically a pure
  * optimization of the rn = 1 filter — which the grammar allows.
  */
private[plans] object StoreResolvePlan {

  /** A matched MOR-resolution leaf: the registered table key, the
    * subtree's output attributes (what joins/aggregates above reference),
    * re-emitted inferred-not-null filters in output-attribute space, and
    * the scan roots (for cost estimation).
    */
  final case class ResolvedLeaf(key: String, output: Seq[Attribute],
      extraFilters: Seq[Expression], roots: Set[String])

  def unapply(p: LogicalPlan): Option[ResolvedLeaf] = {
    // cheap gates first: plausible root node, then registered dir set
    val core = stripProj(p).getOrElse(return None)
    core match {
      case _: Union | _: Filter => ()
      case _ => return None
    }
    val rels = p.collect { case r: LogicalRelation => r }
    if (rels.isEmpty) return None
    val roots = rels.flatMap { r =>
      val rs = MaterializedView.fsRoots(r.relation)
      if (rs.isEmpty) return None // a non-file scan inside — not ours
      rs
    }.toSet
    val reg = MaterializedView.lookupDirReg(roots).getOrElse(return None)
    if (p.output.exists(_.name.startsWith("_"))) return None
    val branches = core match {
      case u: Union => u.children
      case other => Seq(other)
    }
    val perBranch = branches.map(b => branch(b).map((b, _)))
    if (perBranch.exists(_.isEmpty)) return None
    val infos = perBranch.map(_.get)
    val sets = infos.map(_._2._1)
    if (sets.distinct.size != 1) return None // asymmetric pushdown
    // STACKED GUARD: the registration records which dirs belong to
    // multi-dir (stacked) buckets — those rows carry superseded key
    // versions until the newest-wins Window runs, so the Window branch
    // must scan EXACTLY the stacked dirs and the window-less branch
    // exactly the flat ones. Without this, a raw `_op = 'u'` scan of the
    // full dir set of a store with any stacked bucket would be matched as
    // the resolved whole table — wrong results, not just a missed
    // reroute. At most one branch of each kind (resolveStacks emits one;
    // two Window branches splitting the stacked dirs would split a pk's
    // versions across resolutions).
    val (win, flat) = infos.partition(_._2._2)
    if (win.size > 1 || flat.size > 1) return None
    def branchRoots(b: LogicalPlan): Set[String] =
      b.collect { case r: LogicalRelation =>
        MaterializedView.fsRoots(r.relation) }.flatten.toSet
    if (win.flatMap(i => branchRoots(i._1)).toSet != reg.stacked ||
        flat.flatMap(i => branchRoots(i._1)).toSet != (roots -- reg.stacked))
      return None
    val extraNames = sets.head
    val byName = p.output.map(a => a.name -> a).toMap
    val extras = extraNames.toSeq.sorted.map(n =>
      IsNotNull(byName.getOrElse(n, return None)))
    Some(ResolvedLeaf(reg.key, p.output, extras, roots))
  }

  /** Descend through pruning/renaming Projects: attribute references and
    * pure attribute RENAMES (`Alias(attr, name)` — the Expand machinery's
    * PullOutGroupingExpressions re-aliases group columns inside the
    * branches) are semantics-preserving; a Project computing anything
    * else is not part of the store's plan — refuse.
    */
  private def stripProj(p: LogicalPlan): Option[LogicalPlan] = p match {
    case Project(pl, c) =>
      val pure = pl.forall {
        case _: AttributeReference => true
        case Alias(_: AttributeReference, _) => true
        case _ => false
      }
      if (pure) stripProj(c) else None
    case other => Some(other)
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case x => Seq(x)
  }

  /** One union branch: Filter(markers ∧ inferred-not-nulls) over either a
    * bare scan (single-dir buckets) or the resolution Window (stacked
    * buckets). Returns (inferred-not-null DATA column names, whether this
    * is the Window branch), or None when anything beyond the exact
    * grammar appears.
    */
  private def branch(p: LogicalPlan): Option[(Set[String], Boolean)] =
    stripProj(p).flatMap {
      case Filter(cond, child) =>
        var opEq = false
        var rnEq = false
        val extras = Set.newBuilder[String]
        splitConj(cond).foreach {
          case EqualTo(a: AttributeReference, Literal(v, _))
              if a.name == "_op" && String.valueOf(v) == "u" => opEq = true
          case EqualTo(Literal(v, _), a: AttributeReference)
              if a.name == "_op" && String.valueOf(v) == "u" => opEq = true
          case EqualTo(a: AttributeReference, Literal(v, _))
              if a.name == "_rn" && v == 1 => rnEq = true
          case EqualTo(Literal(v, _), a: AttributeReference)
              if a.name == "_rn" && v == 1 => rnEq = true
          case IsNotNull(a: AttributeReference)
              if a.name == "_op" || a.name == "_rn" => ()
          case IsNotNull(a: AttributeReference)
              if !a.name.startsWith("_") => extras += a.name
          case _ => return None
        }
        if (!opEq) return None
        stripProj(child).flatMap {
          case _: LogicalRelation if !rnEq => Some((extras.result(), false))
          case w: Window if rnEq =>
            windowExtras(w).map(below => (extras.result() ++ below, true))
          case _ => None
        }
      case _ => None
    }

  /** The resolution window, exactly: ONE row_number aliased `_rn`,
    * descending order on (`_seq`, `_op`), a nonempty all-data-column
    * partition (the store partitions by its pk — under the registered-dir
    * single-writer contract no other plan carries this signature over
    * these dirs). Below it: Projects, at most one [[WindowGroupLimit]]
    * (the optimizer's rank-limit form of the rn = 1 filter), and Filters
    * whose every conjunct is `IsNotNull(<partition column>)` — when the
    * pk is a join key, the optimizer pushes the inferred not-null PAST
    * the Window (partition-key predicates commute with per-partition
    * resolution: a dropped partition's resolved row would be dropped by
    * the same predicate above). Those conjuncts return as extras so the
    * cross-branch consistency check and the leaf-filter re-emission see
    * them exactly like their flat-branch twins.
    */
  private def windowExtras(w: Window): Option[Set[String]] = {
    val exprOk = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber, _), _)) =>
        a.name == "_rn"
      case _ => false
    }
    val orderOk = w.orderSpec.forall {
      case SortOrder(a: AttributeReference, Descending, _, _) =>
        a.name == "_seq" || a.name == "_op"
      case _ => false
    } && w.orderSpec.size == 2 &&
      w.orderSpec.head.child.asInstanceOf[AttributeReference].name == "_seq"
    val partCols = w.partitionSpec.map {
      case a: AttributeReference if !a.name.startsWith("_") => a.name
      case _ => return None
    }.toSet
    if (!exprOk || !orderOk || partCols.isEmpty) return None
    belowWindow(w.child, partCols, sawLimit = false, Set.empty)
  }

  @scala.annotation.tailrec
  private def belowWindow(p: LogicalPlan, partCols: Set[String],
      sawLimit: Boolean, extras: Set[String]): Option[Set[String]] = p match {
    case Project(pl, c) if pl.forall {
        case _: AttributeReference => true
        case Alias(_: AttributeReference, _) => true
        case _ => false
      } => belowWindow(c, partCols, sawLimit, extras)
    case Filter(cond, c) =>
      val names = splitConj(cond).map {
        case IsNotNull(a: AttributeReference) if partCols.contains(a.name) =>
          Some(a.name)
        case _ => None
      }
      if (names.exists(_.isEmpty)) None
      else belowWindow(c, partCols, sawLimit, extras ++ names.flatten)
    case wgl: WindowGroupLimit if !sawLimit && wgl.limit == 1 =>
      belowWindow(wgl.child, partCols, sawLimit = true, extras)
    case _: LogicalRelation => Some(extras)
    case _ => None
  }
}
