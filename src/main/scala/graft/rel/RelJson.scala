package graft.rel

import scala.collection.mutable

/** Canonical JSON serialization of [[Rel]] plans — the substrate for
  * content hashing ([[RelHash]]) and build artifacts ([[graft.build]]).
  * Mirrors the reference's YAML expr artifacts (ibis_yaml/translate.py,
  * canonicalize_expr compiler.py:397).
  *
  * Canonical form: every node is `{"t": <type>, ...fields in declared
  * order}`; strings are minimally escaped; no whitespace. Serialization
  * is total and `parse(write(r)) == r` (round-trip tested).
  */
object RelJson {

  // ------------------------------------------------------------- writing

  def write(rel: Rel): String = {
    val sb = new StringBuilder
    wRel(rel, sb)
    sb.toString
  }

  def writeExpr(e: RExpr): String = {
    val sb = new StringBuilder
    wExpr(e, sb)
    sb.toString
  }

  private def s(v: String, sb: StringBuilder): Unit = {
    sb.append('"')
    v.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  private def wRel(r: Rel, sb: StringBuilder): Unit = {
    def obj(t: String)(body: => Unit): Unit = {
      sb.append("{\"t\":"); s(t, sb); body; sb.append('}')
    }
    def f(name: String)(body: => Unit): Unit = {
      sb.append(',').append('"').append(name).append("\":"); body
    }
    def fs(name: String, v: String): Unit = f(name)(s(v, sb))
    def arr[A](xs: Seq[A])(each: A => Unit): Unit = {
      sb.append('[')
      xs.zipWithIndex.foreach { case (x, i) =>
        if (i > 0) sb.append(','); each(x)
      }
      sb.append(']')
    }
    def pairs(name: String, xs: Seq[(String, RExpr)]): Unit =
      f(name)(arr(xs) { case (n, e) =>
        sb.append('['); s(n, sb); sb.append(','); wExpr(e, sb); sb.append(']')
      })
    def sortKeys(name: String, ks: Seq[SortKey]): Unit =
      f(name)(arr(ks) { k =>
        sb.append('['); wExpr(k.expr, sb)
        sb.append(',').append(k.asc).append(',').append(k.nullsFirst)
        sb.append(']')
      })
    def wStep(st: StepSpec): Unit = st match {
      case ScaleSpec(in, out) =>
        sb.append("[\"scale\","); s(in, sb); sb.append(',')
        s(out, sb); sb.append(']')
      case MinMaxSpec(in, out) =>
        sb.append("[\"minmax\","); s(in, sb); sb.append(',')
        s(out, sb); sb.append(']')
      case LinRegSpec(x, y, out) =>
        sb.append("[\"linreg\","); s(x, sb); sb.append(',')
        s(y, sb); sb.append(','); s(out, sb); sb.append(']')
      case EstimatorSpec(e, feats, label, out) =>
        sb.append("[\"est\","); s(e, sb); sb.append(',')
        arr(feats)(s(_, sb)); sb.append(',')
        s(label, sb); sb.append(','); s(out, sb); sb.append(']')
    }

    r match {
      case ScanParquet(p) => obj("scan_parquet")(fs("path", p))
      case ScanArrow(p) => obj("scan_arrow")(fs("path", p))
      case ReadDelta(p) => obj("read_delta")(fs("path", p))
      case ReadAvro(p) => obj("read_avro")(fs("path", p))
      case ReadXml(p, t) => obj("read_xml")(fs("path", p), fs("row_tag", t))
      case ReadJdbc(url, table, props, pc, lo, hi, np) => obj("read_jdbc") {
        fs("url", url); fs("table", table)
        f("props")(arr(props) { case (k, v) =>
          sb.append('['); s(k, sb); sb.append(','); s(v, sb); sb.append(']')
        })
        f("partitionColumn")(pc match {
          case Some(x) => s(x, sb); case None => sb.append("null")
        })
        f("lowerBound")(sb.append(lo)); f("upperBound")(sb.append(hi))
        f("numPartitions")(sb.append(np))
      }
      case ReadCsv(p, h, i, d) => obj("read_csv") {
        fs("path", p); f("header")(sb.append(h))
        f("inferSchema")(sb.append(i)); fs("delimiter", d)
      }
      case UnboundTable(n, schema) => obj("unbound") {
        fs("name", n)
        f("schema")(arr(schema) { case (cn, ct) =>
          sb.append('['); s(cn, sb); sb.append(','); s(ct, sb); sb.append(']')
        })
      }
      case SqlView(sql, deps) => obj("sql_view") {
        fs("sql", sql)
        f("deps")(arr(deps) { case (n, d) =>
          sb.append('['); s(n, sb); sb.append(','); wRel(d, sb); sb.append(']')
        })
      }
      case PinnedRead(p, h) =>
        obj("pinned_read")(fs("path", p), fs("hash", h))
      case InMemory(columns, rows) => obj("in_memory") {
        f("columns")(arr(columns) { case (cn, ct) =>
          sb.append('['); s(cn, sb); sb.append(','); s(ct, sb); sb.append(']')
        })
        f("rows")(arr(rows) { row =>
          sb.append('[')
          row.zipWithIndex.foreach { case (cell, i) =>
            if (i > 0) sb.append(',')
            // a null cell executes as SQL NULL in Lower — it must also
            // serialize (as JSON null), or a runnable plan could not be
            // hashed/built (review-caught NPE)
            if (cell == null) sb.append("null") else s(cell, sb)
          }
          sb.append(']')
        })
      }
      case AsofJoinRel(l, rr, on, lt, rt, rightCols, tol) => obj("asof_join") {
        f("left")(wRel(l, sb)); f("right")(wRel(rr, sb))
        f("on")(arr(on)(s(_, sb)))
        fs("leftTime", lt); fs("rightTime", rt)
        f("rightCols")(arr(rightCols) { case (a, b) =>
          sb.append('['); s(a, sb); sb.append(','); s(b, sb); sb.append(']')
        })
        f("tolerance")(tol match {
          case Some(x) => s(x, sb)
          case None => sb.append("null")
        })
      }
      case Project(in, exprs) => obj("project") {
        f("input")(wRel(in, sb)); pairs("exprs", exprs)
      }
      case Filter(in, p) => obj("filter") {
        f("input")(wRel(in, sb)); f("pred")(wExpr(p, sb))
      }
      case Join(l, rr, how, on) => obj("join") {
        f("left")(wRel(l, sb)); f("right")(wRel(rr, sb)); fs("how", how)
        f("on")(arr(on)(wExpr(_, sb)))
      }
      case Aggregate(in, keys, aggs) => obj("aggregate") {
        f("input")(wRel(in, sb)); pairs("keys", keys); pairs("aggs", aggs)
      }
      case WindowProject(in, keep, wins) => obj("window") {
        f("input")(wRel(in, sb))
        f("keep")(arr(keep)(s(_, sb)))
        f("wins")(arr(wins) { w =>
          sb.append("{\"name\":"); s(w.name, sb)
          sb.append(",\"fn\":"); wExpr(w.fn, sb)
          sb.append(",\"partitionBy\":"); arr(w.partitionBy)(wExpr(_, sb))
          sb.append(",\"orderBy\":"); arr(w.orderBy) { k =>
            sb.append('['); wExpr(k.expr, sb)
            sb.append(',').append(k.asc).append(',').append(k.nullsFirst)
            sb.append(']')
          }
          sb.append(",\"frame\":")
          w.frame match {
            case Some(Frame(kind, st, en)) =>
              sb.append('['); s(kind, sb); sb.append(',')
              sb.append(st).append(',').append(en).append(']')
            case None => sb.append("null")
          }
          sb.append('}')
        })
      }
      case Sort(in, keys) => obj("sort") {
        f("input")(wRel(in, sb)); sortKeys("keys", keys)
      }
      case Limit(in, n, off) => obj("limit") {
        f("input")(wRel(in, sb)); f("n")(sb.append(n))
        f("offset")(sb.append(off))
      }
      case Distinct(in, on, ob, kf) => obj("distinct") {
        f("input")(wRel(in, sb)); f("on")(arr(on)(s(_, sb)))
        sortKeys("orderBy", ob); f("keepFirst")(sb.append(kf))
      }
      case SetOp(kind, l, rr) => obj("setop") {
        fs("kind", kind); f("left")(wRel(l, sb)); f("right")(wRel(rr, sb))
      }
      case Sample(in, fr, seed) => obj("sample") {
        f("input")(wRel(in, sb)); f("fraction")(sb.append(fr))
        f("seed")(sb.append(seed))
      }
      case FillNull(in, repl) => obj("fill_null") {
        f("input")(wRel(in, sb))
        f("repl")(arr(repl) { case (c, v) =>
          sb.append('['); s(c, sb); sb.append(','); s(v, sb); sb.append(']')
        })
      }
      case DropNull(in, how, subset) => obj("drop_null") {
        f("input")(wRel(in, sb)); fs("how", how)
        f("subset")(arr(subset)(s(_, sb)))
      }
      case Unnest(in, c, ke) => obj("unnest") {
        f("input")(wRel(in, sb)); fs("column", c)
        f("keepEmpty")(sb.append(ke))
      }
      case Cache(in, st, sg) => obj("cache") {
        f("input")(wRel(in, sb)); fs("storage", st); fs("strategy", sg)
      }
      case Exchange(in, tg) => obj("exchange") {
        f("input")(wRel(in, sb)); fs("target", tg)
      }
      case Tag(in, k, v, h) => obj("tag") {
        f("input")(wRel(in, sb)); fs("key", k); fs("value", v)
        f("hashing")(sb.append(h))
      }
      case Tee(in, sink) => obj("tee") {
        f("input")(wRel(in, sb)); fs("sink", sink)
      }
      case Publish(in, sink, audit) => obj("publish") {
        f("input")(wRel(in, sb)); fs("sink", sink)
        f("audit")(wRel(audit, sb))
      }
      case UdxfRel(in, fn0, sIn, sOut) => obj("udxf") {
        f("input")(wRel(in, sb)); fs("fn", fn0)
        f("schemaIn")(arr(sIn) { case (n, t) =>
          sb.append('['); s(n, sb); sb.append(','); s(t, sb); sb.append(']')
        })
        f("schemaOut")(arr(sOut) { case (n, t) =>
          sb.append('['); s(n, sb); sb.append(','); s(t, sb); sb.append(']')
        })
      }
      case UdwfRel(in, fn0, pb, ob, outName, outType, mode, params) =>
        obj("udwf") {
          f("input")(wRel(in, sb)); fs("fn", fn0)
          f("partitionBy")(arr(pb)(s(_, sb)))
          f("orderBy")(arr(ob)(s(_, sb)))
          fs("outName", outName); fs("outType", outType); fs("mode", mode)
          f("params")(arr(params) { case (k, v) =>
            sb.append('['); s(k, sb); sb.append(','); s(v, sb)
            sb.append(']')
          })
        }
      case FitRel(train, steps) => obj("fit") {
        f("train")(wRel(train, sb)); f("steps")(arr(steps)(wStep))
      }
      case TransformRel(in, model, steps) => obj("ml_transform") {
        f("input")(wRel(in, sb)); f("model")(wRel(model, sb))
        f("steps")(arr(steps)(wStep))
      }
    }
  }

  private def wExpr(e: RExpr, sb: StringBuilder): Unit = {
    def arr(xs: Seq[RExpr]): Unit = {
      sb.append('[')
      xs.zipWithIndex.foreach { case (x, i) =>
        if (i > 0) sb.append(','); wExpr(x, sb)
      }
      sb.append(']')
    }
    e match {
      case RCol(n) => sb.append("{\"e\":\"col\",\"name\":"); s(n, sb); sb.append('}')
      case RLit(v, d) =>
        sb.append("{\"e\":\"lit\",\"value\":"); s(v, sb)
        sb.append(",\"dtype\":"); s(d, sb); sb.append('}')
      case RCall(fn, args) =>
        sb.append("{\"e\":\"call\",\"fn\":"); s(fn, sb)
        sb.append(",\"args\":"); arr(args); sb.append('}')
      case RBin(op, l, r) =>
        sb.append("{\"e\":\"bin\",\"op\":"); s(op, sb)
        sb.append(",\"left\":"); wExpr(l, sb)
        sb.append(",\"right\":"); wExpr(r, sb); sb.append('}')
      case RCast(a, d) =>
        sb.append("{\"e\":\"cast\",\"arg\":"); wExpr(a, sb)
        sb.append(",\"dtype\":"); s(d, sb); sb.append('}')
      case RAgg(fn, args, dist, fl) =>
        sb.append("{\"e\":\"agg\",\"fn\":"); s(fn, sb)
        sb.append(",\"args\":"); arr(args)
        sb.append(",\"distinct\":").append(dist)
        sb.append(",\"filter\":")
        fl match { case Some(x) => wExpr(x, sb); case None => sb.append("null") }
        sb.append('}')
      case RParam(n, d, df) =>
        sb.append("{\"e\":\"param\",\"name\":"); s(n, sb)
        sb.append(",\"dtype\":"); s(d, sb)
        sb.append(",\"default\":")
        df match { case Some(x) => s(x, sb); case None => sb.append("null") }
        sb.append('}')
      case RRaw(sql) =>
        sb.append("{\"e\":\"raw\",\"sql\":"); s(sql, sb); sb.append('}')
    }
  }

  // ------------------------------------------------------------- parsing

  def parse(json: String): Rel = new P(json).rel()
  def parseExpr(json: String): RExpr = new P(json).expr()

  /** Parse arbitrary JSON to Map/List/String/Long/Double/Boolean/null —
    * the generic face of the same tokenizer (used by the serve
    * transport's request envelopes). */
  def parseAny(json: String): Any = new P(json).any()

  /** The canonical JSON string escaping, quoted — shared by every
    * graft JSON producer so a value serializes identically everywhere. */
  def escape(v: String): String = {
    val sb = new StringBuilder
    s(v, sb)
    sb.toString
  }

  /** Minimal recursive-descent JSON reader specialized to the canonical
    * shapes produced by [[write]]. */
  private final class P(in: String) {
    private var i = 0

    def rel(): Rel = relDecode(obj())

    def expr(): RExpr = decodeExpr(value())

    def any(): Any = value()

    private def relDecode(m: Map[String, Any]): Rel = {
      def str0(k: String) = m(k).asInstanceOf[String]
      def bool0(k: String) = m(k).asInstanceOf[Boolean]
      def long0(k: String) = m(k) match {
        case l: Long => l
        case d: Double => d.toLong
      }
      def list0(k: String) = m(k).asInstanceOf[List[Any]]
      def pairs0(k: String) = list0(k).map { x =>
        val p = x.asInstanceOf[List[Any]]
        (p(0).asInstanceOf[String], decodeExpr(p(1)))
      }
      m("t").asInstanceOf[String] match {
        case "scan_parquet" => ScanParquet(str0("path"))
        case "scan_arrow" => ScanArrow(str0("path"))
        case "read_delta" => ReadDelta(str0("path"))
        case "read_avro" => ReadAvro(str0("path"))
        case "read_xml" => ReadXml(str0("path"), str0("row_tag"))
        case "read_jdbc" => ReadJdbc(str0("url"), str0("table"),
          list0("props").map { x =>
            val p = x.asInstanceOf[List[Any]]
            (p(0).asInstanceOf[String], p(1).asInstanceOf[String])
          },
          m("partitionColumn") match {
            case null => None
            case x => Some(x.asInstanceOf[String])
          },
          long0("lowerBound"), long0("upperBound"),
          long0("numPartitions").toInt)
        case "read_csv" => ReadCsv(str0("path"), bool0("header"),
          bool0("inferSchema"), str0("delimiter"))
        case "unbound" => UnboundTable(str0("name"),
          list0("schema").map { x =>
            val p = x.asInstanceOf[List[Any]]
            (p(0).asInstanceOf[String], p(1).asInstanceOf[String])
          })
        case "sql_view" => SqlView(str0("sql"),
          list0("deps").map { x =>
            val p = x.asInstanceOf[List[Any]]
            (p(0).asInstanceOf[String],
              relDecode(p(1).asInstanceOf[Map[String, Any]]))
          })
        case "pinned_read" => PinnedRead(str0("path"), str0("hash"))
        case "in_memory" => InMemory(
          list0("columns").map { x =>
            val p = x.asInstanceOf[List[Any]]
            (p(0).asInstanceOf[String], p(1).asInstanceOf[String])
          },
          list0("rows").map(_.asInstanceOf[List[Any]]
            .map(_.asInstanceOf[String])))
        case "asof_join" => AsofJoinRel(
          relDecode(m("left").asInstanceOf[Map[String, Any]]),
          relDecode(m("right").asInstanceOf[Map[String, Any]]),
          list0("on").map(_.asInstanceOf[String]),
          str0("leftTime"), str0("rightTime"),
          list0("rightCols").map { x =>
            val p = x.asInstanceOf[List[Any]]
            (p(0).asInstanceOf[String], p(1).asInstanceOf[String])
          },
          m("tolerance") match {
            case null => None
            case x => Some(x.asInstanceOf[String])
          })
        case "project" =>
          Project(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            pairs0("exprs"))
        case "filter" =>
          Filter(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            decodeExpr(m("pred")))
        case "join" =>
          Join(relDecode(m("left").asInstanceOf[Map[String, Any]]),
            relDecode(m("right").asInstanceOf[Map[String, Any]]),
            str0("how"), list0("on").map(decodeExpr))
        case "aggregate" =>
          Aggregate(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            pairs0("keys"), pairs0("aggs"))
        case "window" =>
          WindowProject(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            list0("keep").map(_.asInstanceOf[String]),
            list0("wins").map { x =>
              val w = x.asInstanceOf[Map[String, Any]]
              WinExpr(w("name").asInstanceOf[String], decodeExpr(w("fn")),
                w("partitionBy").asInstanceOf[List[Any]].map(decodeExpr),
                w("orderBy").asInstanceOf[List[Any]].map(decodeSortKey),
                w("frame") match {
                  case null => None
                  case fr: List[Any @unchecked] => Some(Frame(
                    fr(0).asInstanceOf[String],
                    numLong(fr(1)), numLong(fr(2))))
                })
            })
        case "sort" =>
          Sort(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            list0("keys").map(decodeSortKey))
        case "limit" =>
          Limit(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            long0("n"), long0("offset"))
        case "distinct" =>
          Distinct(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            list0("on").map(_.asInstanceOf[String]),
            list0("orderBy").map(decodeSortKey), bool0("keepFirst"))
        case "setop" => SetOp(str0("kind"),
          relDecode(m("left").asInstanceOf[Map[String, Any]]),
          relDecode(m("right").asInstanceOf[Map[String, Any]]))
        case "sample" =>
          Sample(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            m("fraction") match {
              case d: Double => d
              case l: Long => l.toDouble
            }, long0("seed"))
        case "fill_null" =>
          FillNull(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            list0("repl").map { x =>
              val p = x.asInstanceOf[List[Any]]
              (p(0).asInstanceOf[String], p(1).asInstanceOf[String])
            })
        case "drop_null" =>
          DropNull(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            str0("how"), list0("subset").map(_.asInstanceOf[String]))
        case "unnest" =>
          Unnest(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            str0("column"), bool0("keepEmpty"))
        case "cache" =>
          Cache(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            str0("storage"), str0("strategy"))
        case "exchange" =>
          Exchange(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            str0("target"))
        case "tag" =>
          Tag(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            str0("key"), str0("value"), bool0("hashing"))
        case "tee" =>
          Tee(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            str0("sink"))
        case "publish" =>
          Publish(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            str0("sink"),
            relDecode(m("audit").asInstanceOf[Map[String, Any]]))
        case "udxf" =>
          def sch(k: String) = list0(k).map { x =>
            val p = x.asInstanceOf[List[Any]]
            (p(0).asInstanceOf[String], p(1).asInstanceOf[String])
          }
          UdxfRel(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            str0("fn"), sch("schemaIn"), sch("schemaOut"))
        case "udwf" =>
          UdwfRel(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            str0("fn"),
            list0("partitionBy").map(_.asInstanceOf[String]),
            list0("orderBy").map(_.asInstanceOf[String]),
            str0("outName"), str0("outType"),
            // pre-r4 plans have no mode/params fields: evaluate_all, none
            m.get("mode").map(_.asInstanceOf[String])
              .getOrElse("evaluate_all"),
            m.get("params").map(_.asInstanceOf[List[Any]].map { x =>
              val p = x.asInstanceOf[List[Any]]
              (p(0).asInstanceOf[String], p(1).asInstanceOf[String])
            }).getOrElse(Nil))
        case "fit" =>
          FitRel(relDecode(m("train").asInstanceOf[Map[String, Any]]),
            list0("steps").map(decodeStep))
        case "ml_transform" =>
          TransformRel(relDecode(m("input").asInstanceOf[Map[String, Any]]),
            relDecode(m("model").asInstanceOf[Map[String, Any]]),
            list0("steps").map(decodeStep))
        case other => throw new IllegalArgumentException(s"bad node $other")
      }
    }

    private def decodeStep(v: Any): StepSpec = {
      val p = v.asInstanceOf[List[Any]]
      def st(i: Int) = p(i).asInstanceOf[String]
      st(0) match {
        case "scale" => ScaleSpec(st(1), st(2))
        case "minmax" => MinMaxSpec(st(1), st(2))
        case "linreg" => LinRegSpec(st(1), st(2), st(3))
        case "est" => EstimatorSpec(st(1),
          p(2).asInstanceOf[List[Any]].map(_.asInstanceOf[String]),
          st(3), st(4))
        case other => throw new IllegalArgumentException(s"bad step $other")
      }
    }

    private def numLong(v: Any): Long = v match {
      case l: Long => l
      case d: Double => d.toLong
    }

    private def decodeSortKey(v: Any): SortKey = {
      val p = v.asInstanceOf[List[Any]]
      SortKey(decodeExpr(p(0)), p(1).asInstanceOf[Boolean],
        p(2).asInstanceOf[Boolean])
    }

    private def decodeExpr(v: Any): RExpr = {
      val m = v.asInstanceOf[Map[String, Any]]
      m("e").asInstanceOf[String] match {
        case "col" => RCol(m("name").asInstanceOf[String])
        case "lit" => RLit(m("value").asInstanceOf[String],
          m("dtype").asInstanceOf[String])
        case "call" => RCall(m("fn").asInstanceOf[String],
          m("args").asInstanceOf[List[Any]].map(decodeExpr))
        case "bin" => RBin(m("op").asInstanceOf[String],
          decodeExpr(m("left")), decodeExpr(m("right")))
        case "cast" => RCast(decodeExpr(m("arg")),
          m("dtype").asInstanceOf[String])
        case "agg" => RAgg(m("fn").asInstanceOf[String],
          m("args").asInstanceOf[List[Any]].map(decodeExpr),
          m("distinct").asInstanceOf[Boolean],
          m("filter") match {
            case null => None
            case x => Some(decodeExpr(x))
          })
        case "param" => RParam(m("name").asInstanceOf[String],
          m("dtype").asInstanceOf[String],
          m("default") match {
            case null => None
            case x => Some(x.asInstanceOf[String])
          })
        case "raw" => RRaw(m("sql").asInstanceOf[String])
        case other => throw new IllegalArgumentException(s"bad expr $other")
      }
    }

    // ---- generic JSON tokenizer ----

    private def ws(): Unit = while (i < in.length && in(i).isWhitespace) i += 1

    private def value(): Any = {
      ws()
      in(i) match {
        case '{' => objValue()
        case '[' => arrValue()
        case '"' => strValue()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _ => numValue()
      }
    }

    private def obj(): Map[String, Any] = { ws(); objValue() }

    private def objValue(): Map[String, Any] = {
      val m = mutable.LinkedHashMap.empty[String, Any]
      i += 1 // {
      ws()
      if (in(i) == '}') { i += 1; return m.toMap }
      while (true) {
        ws()
        val k = strValue()
        ws(); require(in(i) == ':'); i += 1
        m(k) = value()
        ws()
        if (in(i) == ',') i += 1
        else { require(in(i) == '}'); i += 1; return m.toMap }
      }
      m.toMap
    }

    private def arrValue(): List[Any] = {
      val b = mutable.ListBuffer.empty[Any]
      i += 1 // [
      ws()
      if (in(i) == ']') { i += 1; return b.toList }
      while (true) {
        b += value()
        ws()
        if (in(i) == ',') i += 1
        else { require(in(i) == ']'); i += 1; return b.toList }
      }
      b.toList
    }

    private def strValue(): String = {
      require(in(i) == '"'); i += 1
      val sb = new StringBuilder
      while (in(i) != '"') {
        if (in(i) == '\\') {
          i += 1
          in(i) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            // parseAny reads EXTERNAL JSON (serve envelopes): the full
            // standard escape set, not just what write() emits
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              sb.append(Integer.parseInt(in.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case c => sb.append(c)
          }
          i += 1
        } else { sb.append(in(i)); i += 1 }
      }
      i += 1
      sb.toString
    }

    private def numValue(): Any = {
      val start = i
      while (i < in.length &&
        (in(i).isDigit || "+-.eE".contains(in(i)))) i += 1
      val text = in.substring(start, i)
      // integral literals MUST stay Long: routing a 64-bit seed through
      // Double silently corrupts values beyond 2^53 (fuzz-caught)
      if (text.exists(c => c == '.' || c == 'e' || c == 'E')) text.toDouble
      else text.toLong
    }
  }
}
