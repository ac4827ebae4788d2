package graft.build

import graft.rel._

/** COLUMN-level lineage over the serializable algebra — which leaf
  * (source, column) pairs feed each output column of a plan. The
  * reference's catalog tracks table/source-level provenance
  * (catalog/replay.py, build/Lineage.scala here); column lineage is the
  * finer governance layer (impact analysis: "who reads this column",
  * PII propagation: "which outputs taint from `email`") that a
  * column-pruning engine can and should expose — and because graft
  * plans are pure data, it is a static walk, no session or execution
  * required.
  *
  * Soundness contract: OVER-approximation. Every real dependency is
  * reported; opaque corners (RRaw SQL fragments, SqlView bodies, UDXF
  * byte-functions, estimator models) conservatively taint from every
  * column their input can see (`Origin(src, "*")` wildcards when the
  * leaf schema is not declared in the plan). An under-approximation
  * would silently clear a tainted column — useless for governance.
  *
  * Leaves are identified by their stable descriptor (path / table /
  * name), matching what build/Lineage.scala records at table level.
  */
object ColumnLineage {

  /** One upstream dependency: `column` of leaf `source` ("*" = any /
    * unknown column of that source). */
  final case class Origin(source: String, column: String)

  private final case class Node(
      resolve: String => Set[Origin],
      /** declared output columns, when the plan pins them */
      known: Option[Set[String]],
      /** union of everything this subtree can read (coarse taint) */
      all: Set[Origin])

  private def leaf(desc: String, schema: Option[Seq[String]]): Node =
    schema match {
      case Some(cols) =>
        val s = cols.toSet
        Node(c => if (s(c)) Set(Origin(desc, c)) else Set.empty,
          Some(s), cols.map(Origin(desc, _)).toSet)
      case None =>
        Node(c => Set(Origin(desc, c)), None, Set(Origin(desc, "*")))
    }

  /** Columns an expression reads, resolved through `in`; RRaw taints
    * from everything visible. */
  private def refs(e: RExpr, in: Node): Set[Origin] = e match {
    case RCol(n) => in.resolve(n)
    case RLit(_, _) | RParam(_, _, _) => Set.empty
    case RCall(_, args) => args.flatMap(refs(_, in)).toSet
    case RBin(_, l, r) => refs(l, in) ++ refs(r, in)
    case RCast(a, _) => refs(a, in)
    case RAgg(_, args, _, filter) =>
      (args ++ filter.toSeq).flatMap(refs(_, in)).toSet
    case RRaw(_) => in.all
  }

  private def projected(in: Node, exprs: Seq[(String, RExpr)]): Node = {
    val m = exprs.map { case (n, e) => n -> refs(e, in) }.toMap
    Node(c => m.getOrElse(c, Set.empty), Some(m.keySet),
      m.values.flatten.toSet)
  }

  private def passThrough(n: Node): Node = n

  private def walk(rel: Rel): Node = rel match {
    case ScanParquet(p) => leaf(p, None)
    case ScanArrow(p) => leaf(p, None)
    case ReadDelta(p) => leaf(p, None)
    case ReadAvro(p) => leaf(p, None)
    case ReadXml(p, _) => leaf(p, None)
    case r: ReadCsv => leaf(r.path, None)
    case r: ReadJdbc => leaf(s"jdbc:${r.table}", None)
    case PinnedRead(p, _) => leaf(p, None)
    case UnboundTable(n, schema) => leaf(n, Some(schema.map(_._1)))
    case InMemory(cols, _) => leaf("inmemory", Some(cols.map(_._1)))
    case SqlView(_, deps) =>
      // coarse: the SQL body is opaque — every output taints from every
      // dependency column
      val alls = deps.map(d => walk(d._2).all).fold(Set.empty)(_ ++ _)
      Node(_ => alls, None, alls)

    case Project(in, exprs) => projected(walk(in), exprs)
    case Aggregate(in, keys, aggs) => projected(walk(in), keys ++ aggs)
    case WindowProject(in, keep, wins) =>
      val n = walk(in)
      val winRefs = wins.map { w =>
        w.name -> (refs(w.fn, n) ++
          w.partitionBy.flatMap(refs(_, n)) ++
          w.orderBy.flatMap(k => refs(k.expr, n)))
      }.toMap
      val keepSet = keep.toSet
      Node(c => winRefs.getOrElse(c,
          if (keepSet.isEmpty || keepSet(c)) n.resolve(c) else Set.empty),
        // a non-empty keep list pins the output schema even when the
        // input's own schema is unknown
        (if (keepSet.nonEmpty) Some(keepSet ++ winRefs.keySet)
         else n.known.map(_ ++ winRefs.keySet)),
        n.all ++ winRefs.values.flatten)

    case Filter(in, _) => passThrough(walk(in))
    case Sort(in, _) => passThrough(walk(in))
    case Limit(in, _, _) => passThrough(walk(in))
    case Distinct(in, _, _, _) => passThrough(walk(in))
    case Sample(in, _, _) => passThrough(walk(in))
    case FillNull(in, _) => passThrough(walk(in))
    case DropNull(in, _, _) => passThrough(walk(in))
    case Unnest(in, _, _) => passThrough(walk(in))
    case Cache(in, _, _) => passThrough(walk(in))
    case Exchange(in, _) => passThrough(walk(in))
    case Tag(in, _, _, _) => passThrough(walk(in))
    case Tee(in, _) => passThrough(walk(in))
    case Publish(in, _, _) => passThrough(walk(in))

    case Join(l, r, _, _) =>
      val (ln, rn) = (walk(l), walk(r))
      // known schemas disambiguate sides; unknown leaves over-approximate
      Node(c => (ln.known, rn.known) match {
          case (Some(lk), _) if lk(c) => ln.resolve(c)
          case (_, Some(rk)) if rk(c) => rn.resolve(c)
          case (Some(lk), Some(_)) if !lk(c) => rn.resolve(c)
          case _ => ln.resolve(c) ++ rn.resolve(c)
        },
        for (a <- ln.known; b <- rn.known) yield a ++ b,
        ln.all ++ rn.all)
    case AsofJoinRel(l, r, _, _, _, _, _) =>
      val (ln, rn) = (walk(l), walk(r))
      Node(c => ln.resolve(c) ++ rn.resolve(c),
        for (a <- ln.known; b <- rn.known) yield a ++ b,
        ln.all ++ rn.all)
    case SetOp(_, l, r) =>
      val (ln, rn) = (walk(l), walk(r))
      Node(c => ln.resolve(c) ++ rn.resolve(c), ln.known orElse rn.known,
        ln.all ++ rn.all)

    case UdxfRel(in, _, schemaIn, schemaOut) =>
      val n = walk(in)
      val taint = schemaIn.flatMap(c => n.resolve(c._1)).toSet
      Node(c => if (schemaOut.exists(_._1 == c)) taint else Set.empty,
        Some(schemaOut.map(_._1).toSet), taint)
    case u: UdwfRel =>
      val n = walk(u.input)
      // the window fn sees whole partition rows — coarse taint
      Node(c => if (c == u.outName) n.all else n.resolve(c),
        n.known.map(_ + u.outName), n.all)
    case FitRel(train, _) =>
      val n = walk(train)
      Node(_ => n.all, Some(Set("step", "param", "value")), n.all)
    case TransformRel(in, model, steps) =>
      val n = walk(in)
      val m = walk(model)
      val outs = steps.map {
        case ScaleSpec(i, o) => o -> (n.resolve(i) ++ m.all)
        case MinMaxSpec(i, o) => o -> (n.resolve(i) ++ m.all)
        case LinRegSpec(x, _, o) => o -> (n.resolve(x) ++ m.all)
        case EstimatorSpec(_, fs, _, o) =>
          o -> (fs.flatMap(n.resolve).toSet ++ m.all)
      }.toMap
      Node(c => outs.getOrElse(c, n.resolve(c)),
        n.known.map(_ ++ outs.keySet), n.all ++ m.all)
  }

  /** Origins per output column. When the plan's output schema is pinned
    * (top is a Project/Aggregate/…), one entry per column; otherwise
    * the single wildcard entry "*" → everything readable. */
  def origins(rel: Rel): Map[String, Set[Origin]] = {
    val n = walk(rel)
    n.known match {
      case Some(cols) => cols.map(c => c -> n.resolve(c)).toMap
      case None => Map("*" -> n.all)
    }
  }

  /** Reverse lineage: output columns tainted by `source`/`column`
    * (impact analysis / PII propagation). A wildcard origin
    * (src, "*") taints every column of that source. */
  def taintedBy(rel: Rel, source: String, column: String): Set[String] =
    origins(rel).collect {
      case (out, os) if os.exists(o => o.source == source &&
        (o.column == column || o.column == "*")) => out
    }.toSet
}
