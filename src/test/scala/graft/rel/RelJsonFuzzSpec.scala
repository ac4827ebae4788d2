package graft.rel

import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized serializer round-trip: `parse(write(r)) == r` for
  * generator-built plans over every node/expression type, including
  * adversarial strings (quotes, backslashes, control chars, unicode). */
class RelJsonFuzzSpec extends AnyFunSuite {

  private val nastyString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.const("with \"quotes\" and \\back\\slashes"),
    Gen.const("tabs\tnewlines\nand\rreturns"),
    Gen.const("unicode: ü λ 漢字 🚀"),
    Gen.const(""),
    Gen.listOfN(5, Gen.choose(0.toChar, 31.toChar)).map(_.mkString))

  private val genLeafExpr: Gen[RExpr] = Gen.oneOf(
    nastyString.map(RCol),
    Gen.zip(nastyString, Gen.oneOf("int", "double", "string", "boolean"))
      .map { case (v, t) => RLit(v, t) },
    nastyString.map(RRaw),
    Gen.zip(nastyString, Gen.oneOf("int", "bigint"),
      Gen.option(nastyString)).map { case (n, t, d) => RParam(n, t, d) })

  private def genExpr(depth: Int): Gen[RExpr] =
    if (depth <= 0) genLeafExpr
    else Gen.frequency(
      3 -> genLeafExpr,
      1 -> Gen.zip(nastyString, Gen.listOfN(2, genExpr(depth - 1)))
        .map { case (f, a) => RCall(f, a) },
      1 -> Gen.zip(Gen.oneOf("+", "-", "=", "<", "and"),
        genExpr(depth - 1), genExpr(depth - 1))
        .map { case (o, l, r) => RBin(o, l, r) },
      1 -> Gen.zip(genExpr(depth - 1), Gen.oneOf("int", "string"))
        .map { case (a, t) => RCast(a, t) },
      1 -> Gen.zip(nastyString, Gen.listOfN(1, genExpr(depth - 1)),
        Gen.oneOf(true, false), Gen.option(genExpr(depth - 1)))
        .map { case (f, a, d, fl) => RAgg(f, a, d, fl) })

  private val genLeafRel: Gen[Rel] = Gen.oneOf(
    nastyString.map(ScanParquet),
    nastyString.map(ScanArrow),
    nastyString.map(ReadDelta),
    nastyString.map(ReadAvro),
    Gen.zip(nastyString, nastyString).map { case (p, t) => ReadXml(p, t) },
    Gen.zip(nastyString, nastyString, Gen.option(nastyString),
      Gen.choose(0L, 1000L), Gen.choose(1, 64))
      .map { case (u, t, pc, lo, np) =>
        ReadJdbc(u, t, Seq("user" -> "app"), pc, lo, lo + 10, np)
      },
    Gen.zip(nastyString, Gen.oneOf(true, false), Gen.oneOf(true, false),
      Gen.oneOf(",", ";", "\t")).map { case (p, h, i, d) =>
      ReadCsv(p, h, i, d)
    },
    Gen.zip(nastyString,
      Gen.listOfN(2, Gen.zip(nastyString, Gen.const("BIGINT"))))
      .map { case (n, s) => UnboundTable(n, s) },
    Gen.zip(Gen.listOfN(2, Gen.zip(nastyString, Gen.const("STRING"))),
      Gen.listOfN(2, Gen.listOfN(2, nastyString)))
      .map { case (c, r) => InMemory(c, r) },
    Gen.zip(nastyString, nastyString).map { case (p, h) => PinnedRead(p, h) })

  private def genRel(depth: Int): Gen[Rel] =
    if (depth <= 0) genLeafRel
    else Gen.frequency(
      2 -> genLeafRel,
      1 -> Gen.zip(genRel(depth - 1),
        Gen.listOfN(2, Gen.zip(nastyString, genExpr(2))))
        .map { case (in, e) => Project(in, e) },
      1 -> Gen.zip(genRel(depth - 1), genExpr(2))
        .map { case (in, p) => Filter(in, p) },
      1 -> Gen.zip(genRel(depth - 1), genRel(depth - 1),
        Gen.oneOf("inner", "left", "full"), Gen.listOfN(1, genExpr(1)))
        .map { case (l, r, h, on) => Join(l, r, h, on) },
      1 -> Gen.zip(genRel(depth - 1),
        Gen.listOfN(1, Gen.zip(nastyString, genExpr(1))),
        Gen.listOfN(2, Gen.zip(nastyString, genExpr(1))))
        .map { case (in, k, a) => Aggregate(in, k, a) },
      1 -> Gen.zip(genRel(depth - 1), Gen.listOfN(1,
        Gen.zip(genExpr(1), Gen.oneOf(true, false),
          Gen.oneOf(true, false))
          .map { case (e, a, n) => SortKey(e, a, n) }))
        .map { case (in, k) => Sort(in, k) },
      1 -> Gen.zip(genRel(depth - 1), Gen.choose(0L, 1000L),
        Gen.choose(0L, 10L)).map { case (in, n, o) => Limit(in, n, o) },
      1 -> Gen.zip(genRel(depth - 1), nastyString, nastyString,
        Gen.oneOf(true, false))
        .map { case (in, k, v, h) => Tag(in, k, v, h) },
      1 -> Gen.zip(genRel(depth - 1), Gen.oneOf("snapshot", "mtime"))
        .map { case (in, s) => Cache(in, "default", s) },
      1 -> Gen.zip(genRel(depth - 1), genRel(depth - 1),
        Gen.oneOf("union_all", "union", "intersect", "except"))
        .map { case (l, r, k) => SetOp(k, l, r) },
      1 -> Gen.zip(genRel(depth - 1), genRel(depth - 1),
        Gen.listOfN(1, nastyString), nastyString, nastyString,
        Gen.listOfN(1, Gen.zip(nastyString, nastyString)),
        Gen.option(nastyString))
        .map { case (l, r, on, lt, rt, rc, tol) =>
          AsofJoinRel(l, r, on, lt, rt, rc, tol)
        },
      1 -> Gen.zip(genRel(depth - 1), Gen.listOfN(2, nastyString),
        Gen.listOfN(1, Gen.zip(nastyString, genExpr(1), genExpr(1),
          Gen.option(Gen.zip(Gen.oneOf("rows", "range"),
            Gen.oneOf(Long.MinValue, -5L, 0L),
            Gen.oneOf(0L, 5L, Long.MaxValue))
            .map { case (k, s, e) => Frame(k, s, e) }))
          .map { case (n, f, ob, fr) =>
            WinExpr(n, f, Seq(ob),
              Seq(SortKey(ob, asc = true, nullsFirst = false)), fr)
          }))
        .map { case (in, keep, wins) => WindowProject(in, keep, wins) },
      1 -> Gen.zip(genRel(depth - 1), Gen.listOfN(1, nastyString),
        Gen.oneOf(true, false))
        .map { case (in, on, kf) =>
          Distinct(in, on,
            on.map(n => SortKey(RCol(n), asc = false, nullsFirst = true)),
            kf)
        },
      1 -> Gen.zip(genRel(depth - 1), nastyString, Gen.oneOf(true, false))
        .map { case (in, c, ke) => Unnest(in, c, ke) },
      1 -> Gen.zip(genRel(depth - 1), Gen.choose(0.0, 1.0),
        Gen.choose(Long.MinValue, Long.MaxValue))
        .map { case (in, f, s) => Sample(in, f, s) },
      1 -> Gen.zip(genRel(depth - 1),
        Gen.listOfN(2, Gen.zip(nastyString, nastyString)))
        .map { case (in, r) => FillNull(in, r) },
      1 -> Gen.zip(genRel(depth - 1), Gen.oneOf("any", "all"),
        Gen.listOfN(1, nastyString))
        .map { case (in, h, s) => DropNull(in, h, s) },
      1 -> Gen.zip(genRel(depth - 1), nastyString)
        .map { case (in, t) => Exchange(in, t) },
      1 -> Gen.zip(genRel(depth - 1), nastyString)
        .map { case (in, s) => Tee(in, s) },
      1 -> Gen.zip(genRel(depth - 1), nastyString, genRel(depth - 1))
        .map { case (in, s, a) => Publish(in, s, a) },
      1 -> Gen.zip(nastyString,
        Gen.listOfN(1, Gen.zip(nastyString, genRel(depth - 1))))
        .map { case (sql, deps) => SqlView(sql, deps) },
      1 -> Gen.zip(genRel(depth - 1), nastyString,
        Gen.listOfN(2, Gen.zip(nastyString, Gen.oneOf("BIGINT", "STRING"))),
        Gen.listOfN(2, Gen.zip(nastyString, Gen.oneOf("INT", "DOUBLE"))))
        .map { case (in, fn, si, so) => UdxfRel(in, fn, si, so) },
      1 -> Gen.zip(genRel(depth - 1), nastyString,
        Gen.listOfN(1, nastyString), Gen.listOfN(1, nastyString),
        nastyString, Gen.oneOf("DOUBLE", "BIGINT"))
        .flatMap { case (in, fn, pb, ob, on, ot) =>
          Gen.zip(
            Gen.oneOf("evaluate_all", "evaluate", "evaluate_all_with_rank"),
            Gen.listOfN(1, Gen.zip(nastyString, nastyString)))
            .map { case (mode, ps) =>
              UdwfRel(in, fn, pb, ob, on, ot, mode, ps)
            }
        },
      1 -> Gen.zip(genRel(depth - 1), genStep)
        .map { case (in, st) => FitRel(in, Seq(st)) },
      1 -> Gen.zip(genRel(depth - 1), genRel(depth - 1),
        Gen.listOfN(2, genStep))
        .map { case (in, m, st) => TransformRel(in, m, st) })

  private def genStep: Gen[StepSpec] = Gen.oneOf(
    Gen.zip(nastyString, nastyString).map { case (i, o) => ScaleSpec(i, o) },
    Gen.zip(nastyString, nastyString).map { case (i, o) => MinMaxSpec(i, o) },
    Gen.zip(nastyString, nastyString, nastyString)
      .map { case (x, y, o) => LinRegSpec(x, y, o) },
    Gen.zip(nastyString, Gen.listOfN(2, nastyString), nastyString,
      nastyString)
      .map { case (e, fs, y, o) => EstimatorSpec(e, fs, y, o) })

  test("random plans round-trip byte-identically (500 cases)") {
    val params = Gen.Parameters.default
    var seed = rng.Seed(42L)
    var checked = 0
    while (checked < 500) {
      genRel(3).apply(params, seed) match {
        case Some(plan) =>
          val json = RelJson.write(plan)
          val back = RelJson.parse(json)
          assert(back == plan, s"plan mismatch for:\n$json")
          assert(RelJson.write(back) == json)
          assert(RelHash.buildHash(plan) == RelHash.buildHash(back))
          checked += 1
        case None =>
      }
      seed = seed.next
    }
  }
}
