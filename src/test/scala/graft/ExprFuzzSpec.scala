package graft

import graft.Model.Quad
import graft.sparql.{BgpPlanner, Sparql}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Differential property tests for the EXPRESSION surface — BIND
  * arithmetic, string/numeric builtins, dateTime accessors,
  * ENCODE_FOR_URI, and variable-predicate BGPs — against independent
  * reference implementations of the documented semantics.
  *
  * Split from [[BgpPropertySpec]] (round 12): together the structural and
  * expression fuzzers execute ~1 000 full queries in one JVM, and the
  * accumulated session bookkeeping pushed the single-suite heap past the
  * stock -Xmx8g. Each suite runs in its own forked JVM (build.sbt
  * testGrouping), bounding the footprint by construction. */
class ExprFuzzSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("BIND arithmetic (incl. round-10 division) == reference semantics on random expressions") {
    val s = spark
    import s.implicits._
    // Reference implementation of the documented BIND semantics: operands
    // parse as longs (non-numeric -> error -> unbound), + - * are
    // long-exact, / is xsd:decimal-style — unbound on /0, exact integer
    // lexical when divisible, else IEEE double division rendered
    // shortest-round-trip (Double.toString == Spark's double->string).
    def refEval(e: String, env: Map[String, String]): Option[String] = {
      // tiny recursive-descent evaluator over the same grammar subset
      var pos = 0
      def ws(): Unit = while (pos < e.length && e(pos) == ' ') pos += 1
      def prim(): Option[String] = {
        ws()
        if (e(pos) == '(') {
          pos += 1; val v = add(); ws()
          require(e(pos) == ')'); pos += 1; v
        } else if (e(pos) == '?') {
          pos += 1; val st = pos
          while (pos < e.length && e(pos).isLetter) pos += 1
          env.get(e.substring(st, pos))
        } else {
          val st = pos
          if (e(pos) == '-') pos += 1
          while (pos < e.length && e(pos).isDigit) pos += 1
          Some(e.substring(st, pos))
        }
      }
      def num(o: Option[String]): Option[Long] = o.flatMap(_.toLongOption)
      def mul(): Option[String] = {
        var acc = prim()
        var more = true
        while (more) {
          ws()
          if (pos < e.length && e(pos) == '*') {
            pos += 1; val r = prim()
            acc = for (a <- num(acc); b <- num(r)) yield (a * b).toString
          } else if (pos < e.length && e(pos) == '/') {
            pos += 1; val r = prim()
            acc = for {
              a <- num(acc); b <- num(r)
              q <- if (b == 0L) None
                   else if (a % b == 0L) Some((a / b).toString)
                   else Some((a.toDouble / b.toDouble).toString)
            } yield q
          } else more = false
        }
        acc
      }
      def add(): Option[String] = {
        var acc = mul()
        var more = true
        while (more) {
          ws()
          if (pos < e.length && e(pos) == '+') {
            pos += 1; val r = mul()
            acc = for (a <- num(acc); b <- num(r)) yield (a + b).toString
          } else if (pos < e.length && e(pos) == '-') {
            pos += 1; val r = mul()
            acc = for (a <- num(acc); b <- num(r)) yield (a - b).toString
          } else more = false
        }
        acc
      }
      add()
    }
    // magnitudes kept well under 2^53 so long->double conversion is
    // identical on both sides and ANSI long arithmetic cannot overflow
    val lexGen = Gen.oneOf("0", "1", "7", "12", "-3", "100003", "999999", "nope")
    def exprGen(depth: Int): Gen[String] =
      if (depth == 0) Gen.frequency(
        2 -> Gen.oneOf("?a", "?b", "?c"),
        1 -> Gen.oneOf("0", "2", "3", "4", "10", "7"))
      else for {
        l <- exprGen(depth - 1); r <- exprGen(depth - 1)
        op <- Gen.oneOf("+", "-", "*", "/")
      } yield s"($l $op $r)"
    val caseGen = for {
      a <- lexGen; b <- lexGen; c <- lexGen
      ex <- exprGen(3)
    } yield (Map("a" -> a, "b" -> b, "c" -> c), ex)
    val cases = (1 to 60).flatMap { i =>
      caseGen(Gen.Parameters.default, Seed(20000L + i))
    }
    assert(cases.size >= 50)
    cases.foreach { case (env, ex) =>
      // TestTerms.t (round 13): fuzz values store as the loader would
      // encode them — string values quoted, shorthand numerics bare — so
      // the differential covers the quoted-term builtin paths end-to-end
      val quads = Seq(
        Quad("urn:g#", "urn:s#1", "urn:p#a", env("a")),
        Quad("urn:g#", "urn:s#1", "urn:p#b", env("b")),
        Quad("urn:g#", "urn:s#1", "urn:p#c", env("c"))).map(TestTerms.t).toDF()
      val q = Sparql.parse(
        "PREFIX p: <urn:p#> SELECT ?r WHERE { ?s p:a ?a . ?s p:b ?b . " +
          s"?s p:c ?c . BIND($ex AS ?r) }")
      val got = BgpPlanner.evaluate(quads, q).collect()
        .map(r => Option(r.getString(0))).toSeq
      val want = Seq(refEval(ex, env))
      assert(got == want, s"BIND($ex) over $env: planner=$got reference=$want")
    }
  }

  // ---- string-builtin differential fuzz (round-11 surface) ---------------

  /** Tiny AST over the string-builtin subset, rendered to SPARQL and
    * evaluated by an independent reference implementation of the
    * DOCUMENTED semantics (strict on unbound; STRAFTER/STRBEFORE empty/
    * absent-separator rules; SUBSTR = 1-based XPath; REPLACE = Java
    * regex, which the portable pattern subset keeps identical to
    * XPath). */
  sealed trait SE
  case class SVar(n: String) extends SE
  case class SLit(s: String) extends SE
  case class SFn1(fn: String, a: SE) extends SE // UCASE LCASE STRLEN STR
  case class SConcat(a: SE, b: SE) extends SE
  case class SCut(a: SE, sep: String, after: Boolean) extends SE
  case class SSub(a: SE, start: Int, len: Option[Int]) extends SE
  case class SRep(a: SE, pat: String, rep: String) extends SE

  def renderSE(e: SE): String = e match {
    case SVar(n) => s"?$n"
    case SLit(s) => "\"" + s + "\""
    case SFn1(fn, a) => s"$fn(${renderSE(a)})"
    case SConcat(a, b) => s"CONCAT(${renderSE(a)}, ${renderSE(b)})"
    case SCut(a, sep, af) =>
      s"${if (af) "STRAFTER" else "STRBEFORE"}(${renderSE(a)}, \"$sep\")"
    case SSub(a, st, l) =>
      s"SUBSTR(${renderSE(a)}, $st${l.map(", " + _).getOrElse("")})"
    case SRep(a, p, r) => s"REPLACE(${renderSE(a)}, \"$p\", \"$r\")"
  }

  def evalSE(e: SE, env: Map[String, String]): String = e match {
    case SVar(n) => env(n)
    case SLit(s) => s
    case SFn1("UCASE", a) => evalSE(a, env).toUpperCase(java.util.Locale.ROOT)
    case SFn1("LCASE", a) => evalSE(a, env).toLowerCase(java.util.Locale.ROOT)
    case SFn1("STRLEN", a) => evalSE(a, env).length.toString
    case SFn1("STR", a) => evalSE(a, env)
    case SFn1(f, _) => sys.error(f)
    case SConcat(a, b) => evalSE(a, env) + evalSE(b, env)
    case SCut(a, sep, after) =>
      val s = evalSE(a, env)
      if (sep.isEmpty) { if (after) s else "" }
      else {
        val i = s.indexOf(sep)
        if (i < 0) ""
        else if (after) s.substring(i + sep.length)
        else s.substring(0, i)
      }
    case SSub(a, st, l) =>
      val s = evalSE(a, env)
      val from = math.min(st - 1, s.length)
      val sub = s.substring(from)
      l.map(n => sub.take(n)).getOrElse(sub)
    case SRep(a, p, r) => evalSE(a, env).replaceAll(p, r)
  }

  def seGen(depth: Int): Gen[SE] =
    if (depth == 0) Gen.frequency(
      3 -> Gen.oneOf("a", "b", "c").map(SVar(_)),
      2 -> Gen.oneOf("", "x", "Ab#c", "aa", "#").map(SLit(_)))
    else {
      val sub = seGen(depth - 1)
      Gen.frequency(
        2 -> (for (f <- Gen.oneOf("UCASE", "LCASE", "STRLEN", "STR"); a <- sub)
          yield SFn1(f, a)),
        2 -> (for (a <- sub; b <- sub) yield SConcat(a, b)),
        2 -> (for (a <- sub; s <- Gen.oneOf("#", "a", "", "b"); af <- Gen.oneOf(true, false))
          yield SCut(a, s, af)),
        2 -> (for (a <- sub; st <- Gen.choose(1, 4);
            l <- Gen.option(Gen.choose(0, 3))) yield SSub(a, st, l)),
        1 -> (for (a <- sub; p <- Gen.oneOf("a", "b+", "[cx]", "a(b)");
            r <- Gen.oneOf("X", "", "$0")) yield SRep(a, p, r)),
        1 -> sub)
    }

  test("BIND/FILTER string builtins == reference semantics on random expressions") {
    val s = spark
    import s.implicits._
    val valGen = Gen.oneOf("", "abc", "Ab#cD", "aabb", "#x#", "xyz", "b")
    val caseGen = for {
      a <- valGen; b <- valGen; c <- valGen
      e <- seGen(3)
    } yield (Map("a" -> a, "b" -> b, "c" -> c), e)
    val cases = (1 to 80).flatMap { i =>
      caseGen(Gen.Parameters.default, Seed(31000L + i))
    }
    assert(cases.size >= 70)
    cases.foreach { case (env, e) =>
      // TestTerms.t (round 13): fuzz values store as the loader would
      // encode them — string values quoted, shorthand numerics bare — so
      // the differential covers the quoted-term builtin paths end-to-end
      val quads = Seq(
        Quad("urn:g#", "urn:s#1", "urn:p#a", env("a")),
        Quad("urn:g#", "urn:s#1", "urn:p#b", env("b")),
        Quad("urn:g#", "urn:s#1", "urn:p#c", env("c"))).map(TestTerms.t).toDF()
      val ex = renderSE(e)
      val q = Sparql.parse(
        "PREFIX p: <urn:p#> SELECT ?r WHERE { ?s p:a ?a . ?s p:b ?b . " +
          s"?s p:c ?c . BIND($ex AS ?r) }")
      val got = BgpPlanner.evaluate(quads, q).collect()
        .map(r => Option(r.getString(0))).toSeq
      val want = Seq(Some(evalSE(e, env)))
      assert(got == want, s"BIND($ex) over $env: planner=$got reference=$want")
      // the same expression as a FILTER comparison operand: numeric
      // dispatch against a length literal (row kept iff the reference's
      // STRLEN agrees)
      val keep = evalSE(e, env).length > 2
      val qf = Sparql.parse(
        "PREFIX p: <urn:p#> SELECT ?s WHERE { ?s p:a ?a . ?s p:b ?b . " +
          s"?s p:c ?c . FILTER(STRLEN($ex) > 2) }")
      val kept = BgpPlanner.evaluate(quads, qf).collect().nonEmpty
      assert(kept == keep, s"FILTER(STRLEN($ex) > 2) over $env: " +
        s"planner=$kept reference=$keep")
    }
  }

  // ---- variable-predicate differential fuzz (round 11) -------------------

  test("variable-predicate BGPs == naive unification on random graphs") {
    val s = spark
    import s.implicits._
    // pools overlap deliberately: A serves as subject, object AND
    // predicate, so pred=subject / pred=object joins get exercised
    val nodes = Seq("urn:t#A", "urn:t#B", "urn:t#C")
    val preds = Seq("urn:e#p", "urn:e#q", "urn:t#A")
    val termGen = Gen.oneOf("?a", "?b", "?c", "urn:t#A", "urn:t#B")
    val verbGen = Gen.frequency(
      3 -> Gen.oneOf("?p", "?q", "?a"), // ?a doubles as a term var
      2 -> Gen.oneOf("urn:e#p", "urn:e#q"))
    val atomGen = for (su <- termGen; v <- verbGen; o <- termGen)
      yield (su, v, o)
    val tripleGen = for {
      su <- Gen.oneOf(nodes); p <- Gen.oneOf(preds); o <- Gen.oneOf(nodes)
    } yield (su, p, o)
    val caseGen = for {
      nT <- Gen.choose(3, 8)
      ts <- Gen.listOfN(nT, tripleGen)
      nA <- Gen.choose(1, 3)
      as <- Gen.listOfN(nA, atomGen)
    } yield (ts.toSet, as)

    def matchTerm(pat: String, value: String,
        env: Map[String, String]): Option[Map[String, String]] =
      if (pat.startsWith("?")) env.get(pat) match {
        case Some(v0) => if (v0 == value) Some(env) else None
        case None => Some(env + (pat -> value))
      } else if (pat == value) Some(env) else None

    def naive(ts: Set[(String, String, String)],
        as: Seq[(String, String, String)]): Set[Map[String, String]] =
      as.foldLeft(Seq(Map.empty[String, String])) { case (acc, (su, p, o)) =>
        for {
          env <- acc; (t1, t2, t3) <- ts.toSeq
          e1 <- matchTerm(su, t1, env)
          e2 <- matchTerm(p, t2, e1)
          e3 <- matchTerm(o, t3, e2)
        } yield e3
      }.toSet

    val cases = (1 to 60).flatMap { i =>
      caseGen(Gen.Parameters.default, Seed(74000L + i))
    }
    assert(cases.size >= 50)
    var varPredSeen = 0
    cases.foreach { case (ts, as) =>
      val vars = as.flatMap { case (a, b, c) => Seq(a, b, c) }
        .filter(_.startsWith("?")).distinct.sorted
      if (vars.nonEmpty) {
        if (as.exists(_._2.startsWith("?"))) varPredSeen += 1
        val quads = ts.toSeq.map { case (t1, t2, t3) =>
          Quad("urn:g#", t1, t2, t3) }.toDF()
        def term(t: String) = if (t.startsWith("?")) t else s"<$t>"
        val q = Sparql.parse(
          s"SELECT DISTINCT ${vars.mkString(" ")} WHERE { " +
            as.map { case (a, b, c) => s"${term(a)} ${term(b)} ${term(c)} ." }
              .mkString(" ") + " }")
        val got = BgpPlanner.evaluate(quads, q).collect()
          .map(r => vars.indices.map(r.getString).toList).toSet
        val want = naive(ts, as).map(env => vars.map(env).toList)
        assert(got == want, s"atoms=$as over ${ts.size} triples: " +
          s"planner=${got.size} naive=${want.size}\n$got\n$want")
      }
    }
    assert(varPredSeen >= 20) // the surface under test actually appeared
  }

  // ---- numeric-builtin differential fuzz (round-11 §17.4.4 surface) ------

  /** ABS/CEIL/FLOOR/ROUND nested over integer arithmetic: the reference
    * implements the DOCUMENTED semantics independently — integer lexicals
    * on an exact long path, other numerics through xsd:double
    * (Double.toString == Spark's double→string), non-numerics → unbound;
    * ROUND = floor(x + 0.5) (XPath half-toward-+∞). */
  sealed trait NE
  case class NVar(n: String) extends NE
  case class NLit(l: String) extends NE // integer literals only (grammar)
  case class NFn(fn: String, a: NE) extends NE
  case class NOp(a: NE, op: Char, b: NE) extends NE

  def renderNE(e: NE): String = e match {
    case NVar(n) => s"?$n"
    case NLit(l) => l
    case NFn(fn, a) => s"$fn(${renderNE(a)})"
    case NOp(a, op, b) => s"(${renderNE(a)} $op ${renderNE(b)})"
  }

  def evalNE(e: NE, env: Map[String, String]): Option[String] = e match {
    case NVar(n) => Some(env(n))
    case NLit(l) => Some(l)
    case NOp(a, op, b) =>
      for {
        x <- evalNE(a, env).flatMap(_.toLongOption)
        y <- evalNE(b, env).flatMap(_.toLongOption)
        r <- op match {
          case '+' => Some((x + y).toString)
          case '-' => Some((x - y).toString)
          case '*' => Some((x * y).toString)
          case '/' =>
            if (y == 0L) None
            else if (x % y == 0L) Some((x / y).toString)
            else Some((x.toDouble / y.toDouble).toString)
        }
      } yield r
    case NFn(fn, a) =>
      evalNE(a, env).flatMap { s =>
        s.toLongOption match {
          case Some(l) =>
            Some(if (fn == "ABS") math.abs(l).toString else l.toString)
          case None => s.toDoubleOption.map { d =>
            fn match {
              case "ABS" => math.abs(d).toString
              case "CEIL" => math.ceil(d).toLong.toString
              case "FLOOR" => math.floor(d).toLong.toString
              case "ROUND" => math.floor(d + 0.5).toLong.toString
            }
          }
        }
      }
  }

  def neGen(depth: Int): Gen[NE] =
    if (depth == 0) Gen.frequency(
      3 -> Gen.oneOf("a", "b", "c").map(NVar(_)),
      2 -> Gen.oneOf("0", "2", "3", "7", "-4").map(NLit(_)))
    else {
      val sub = neGen(depth - 1)
      Gen.frequency(
        3 -> (for (f <- Gen.oneOf("ABS", "CEIL", "FLOOR", "ROUND"); a <- sub)
          yield NFn(f, a)),
        3 -> (for (a <- sub; b <- sub; op <- Gen.oneOf('+', '-', '*', '/'))
          yield NOp(a, op, b)),
        1 -> sub)
    }

  test("BIND numeric builtins == reference semantics on random expressions") {
    val s = spark
    import s.implicits._
    // integer magnitudes ≤ 99: a depth-3 tree has ≤ 8 leaves, so the
    // largest possible product 99^8 ≈ 9.2e15 stays under both 2^53
    // (long↔double identical) and 2^63 (no ANSI overflow throw)
    val lexGen = Gen.oneOf(
      "0", "1", "7", "-3", "2.5", "-2.5", "-1.6", "10.1", "99", "nope")
    val caseGen = for {
      a <- lexGen; b <- lexGen; c <- lexGen
      e <- neGen(3)
    } yield (Map("a" -> a, "b" -> b, "c" -> c), e)
    val cases = (1 to 80).flatMap { i =>
      caseGen(Gen.Parameters.default, Seed(41000L + i))
    }
    assert(cases.size >= 70)
    cases.foreach { case (env, e) =>
      // TestTerms.t (round 13): fuzz values store as the loader would
      // encode them — string values quoted, shorthand numerics bare — so
      // the differential covers the quoted-term builtin paths end-to-end
      val quads = Seq(
        Quad("urn:g#", "urn:s#1", "urn:p#a", env("a")),
        Quad("urn:g#", "urn:s#1", "urn:p#b", env("b")),
        Quad("urn:g#", "urn:s#1", "urn:p#c", env("c"))).map(TestTerms.t).toDF()
      val ex = renderNE(e)
      val q = Sparql.parse(
        "PREFIX p: <urn:p#> SELECT ?r WHERE { ?s p:a ?a . ?s p:b ?b . " +
          s"?s p:c ?c . BIND($ex AS ?r) }")
      val got = BgpPlanner.evaluate(quads, q).collect()
        .map(r => Option(r.getString(0))).toSeq
      val want = Seq(evalNE(e, env))
      assert(got == want, s"BIND($ex) over $env: planner=$got reference=$want")
    }
  }

  // ---- dateTime-accessor differential fuzz (round-11 §17.4.5) ------------

  test("dateTime accessors == reference component extraction on random lexicals") {
    val s = spark
    import s.implicits._
    val DtRe = ("^(-?\\d{4,})-(\\d{2})-(\\d{2})T(\\d{2}):(\\d{2}):" +
      "(\\d{2}(?:\\.\\d+)?)(Z|[+-]\\d{2}:\\d{2})?$").r
    def refDt(fn: String, lex: String): Option[String] = lex match {
      case DtRe(y, mo, d, h, mi, sec, tz) => fn match {
        case "YEAR" => Some(y.toLong.toString)
        case "MONTH" => Some(mo.toLong.toString)
        case "DAY" => Some(d.toLong.toString)
        case "HOURS" => Some(h.toLong.toString)
        case "MINUTES" => Some(mi.toLong.toString)
        case "SECONDS" =>
          val dd = sec.toDouble
          Some(if (dd % 1 == 0) dd.toLong.toString else dd.toString)
        case "TZ" => Some(Option(tz).getOrElse(""))
      }
      case _ => None
    }
    val partGen = for {
      y <- Gen.oneOf("2010", "1999", "0001", "-0500", "12024")
      mo <- Gen.oneOf("01", "06", "12")
      d <- Gen.oneOf("01", "21", "31")
      h <- Gen.oneOf("00", "11", "23")
      mi <- Gen.oneOf("00", "07", "59")
      sec <- Gen.oneOf("00", "01", "59", "59.5", "07.250")
      tz <- Gen.oneOf("", "Z", "-08:00", "+05:30")
    } yield s"$y-$mo-${d}T$h:$mi:$sec$tz"
    val lexGen = Gen.frequency(
      4 -> partGen,
      1 -> Gen.oneOf("junk", "2020-06-21 11:28:01", "2020-6-1T0:0:0",
        "2020-06-21", "T11:28:01Z", ""))
    val cases = (1 to 60).flatMap { i =>
      (for (l <- lexGen; f <- Gen.oneOf("YEAR", "MONTH", "DAY", "HOURS",
        "MINUTES", "SECONDS", "TZ")) yield (l, f))(
        Gen.Parameters.default, Seed(52000L + i))
    }
    assert(cases.size >= 50)
    cases.foreach { case (lex, fn) =>
      // round-13 encoding: dateTime lexicals are string literals — the
      // accessors must answer through the quoted term exactly as they
      // did over the bare one
      val quads = Seq(TestTerms.t(Quad("urn:g#", "urn:s#1", "urn:p#t", lex))).toDF()
      val q = Sparql.parse("PREFIX p: <urn:p#> SELECT ?r WHERE { " +
        s"?s p:t ?t . BIND($fn(?t) AS ?r) }")
      val got = BgpPlanner.evaluate(quads, q).collect()
        .map(r => Option(r.getString(0))).toSeq
      val want = Seq(refDt(fn, lex))
      assert(got == want, s"$fn(\"$lex\"): planner=$got reference=$want")
    }
  }

  // ---- ENCODE_FOR_URI differential vs the JDK's encoder ------------------

  test("numeric MIN/MAX dispatch == reference per-group semantics on random term bags") {
    val s = spark
    import s.implicits._
    // Reference for the round-12 documented rule: a group whose every
    // member's LEX-STRIPPED form double-parses takes its extreme by
    // (value, then full ENCODED term codepoint as tie-break), keeping
    // the term; any non-castable member falls the group to plain
    // codepoint order over the encoded terms.
    def lexOf(t: String): String = {
      val r = graft.functions.RdfLex.lex(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      r.toString
    }
    def numOf(t: String): Option[Double] =
      try Some(lexOf(t).trim.toDouble).filter(_ => {
        // Spark try_cast(double) accepts leading/trailing spaces and
        // standard decimal/scientific forms — scala toDouble matches on
        // the generated pool (no hex/Infinity forms generated)
        true
      }) catch { case _: NumberFormatException => None }
    def refExtreme(terms: Seq[String], isMin: Boolean): String = {
      val nums = terms.map(numOf)
      if (nums.forall(_.isDefined)) {
        val keyed = terms.zip(nums.map(_.get))
        val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.String)
        val pick = keyed.map { case (t, v) => (v, t) }
        if (isMin) pick.min(ord)._2 else pick.max(ord)._2
      } else {
        // round 13: the mixed-group fallback orders by the LEXICAL with
        // the term as tie-break (quoted/bare encodings would otherwise
        // codepoint-order by encoding, not value)
        val ord = Ordering.Tuple2(Ordering.String, Ordering.String)
        val pick = terms.map(t => (lexOf(t), t))
        if (isMin) pick.min(ord)._2 else pick.max(ord)._2
      }
    }
    val termGen = Gen.oneOf(
      Gen.choose(-50L, 10050L).map(_.toString),
      Gen.oneOf("01", "001", "1", "9", "10", "0009", "-0"),
      Gen.oneOf("2.5", "2.50", "-3.25", "10.1", "0.2", ".5"),
      Gen.oneOf("x", "abc", "", " ", "urn:t#A", "10a"),
      Gen.oneOf("\"5\"@en", "\"05\"@fr", "\"nope\"@en", "\"7.5\"^^<urn:t#k>"))
    val bagGen = for {
      nGroups <- Gen.choose(1, 4)
      bags <- Gen.listOfN(nGroups, Gen.nonEmptyListOf(termGen).map(_.take(8)))
    } yield bags
    val cases = (1 to 60).flatMap { i =>
      bagGen(Gen.Parameters.default, Seed(77000L + i))
    }
    assert(cases.size >= 50)
    cases.foreach { bags =>
      val quads = bags.zipWithIndex.flatMap { case (bag, gi) =>
        bag.map(t => Quad("urn:g#", s"urn:u#$gi", "urn:p#v", t))
      }.toDF()
      val q = Sparql.parse("PREFIX p: <urn:p#> SELECT ?u (MIN(?v) AS ?lo) " +
        "(MAX(?v) AS ?hi) WHERE { ?u p:v ?v . } GROUP BY ?u ORDER BY ?u")
      val got = BgpPlanner.evaluate(quads, q).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      val want = bags.zipWithIndex.map { case (bag, gi) =>
        (s"urn:u#$gi", lexOf(refExtreme(bag, isMin = true)),
          lexOf(refExtreme(bag, isMin = false)))
      }.sortBy(_._1)
      assert(got == want, s"MIN/MAX over $bags: planner=$got reference=$want")
    }
  }

  test("ORDER BY over literal terms == the three-key §15.1 reference on random columns") {
    val s = spark
    import s.implicits._
    // reference: per-row key (isNonNumeric, value, lexical, encoded
    // term); DESC is the exact reverse. Mirrors BgpPlanner.orderKeys
    // (round 13: the lexical third key keeps string terms ordering by
    // VALUE — the order bare encodings always gave — with the raw term
    // as the final tie-break).
    def lexOf(t: String): String = graft.functions.RdfLex.lex(
      org.apache.spark.unsafe.types.UTF8String.fromString(t)).toString
    def key(t: String): (Int, Double, String, String) =
      try { (0, lexOf(t).trim.toDouble, lexOf(t), t) }
      catch { case _: NumberFormatException => (1, 0.0, lexOf(t), t) }
    val termGen = Gen.oneOf(
      Gen.choose(-99L, 199L).map(_.toString),
      Gen.oneOf("01", "1", "10", "9", "2.5", "100", "0.5", "-7"),
      Gen.oneOf("a", "B", "urn:x#q", "zz", ""),
      Gen.oneOf("\"3\"@en", "\"03\"@de", "\"w\"@en"))
    val listGen = Gen.nonEmptyListOf(termGen).map(_.take(12))
    val cases = (1 to 50).flatMap { i =>
      listGen(Gen.Parameters.default, Seed(66000L + i))
    }
    assert(cases.size >= 40)
    cases.foreach { terms =>
      val quads = terms.zipWithIndex.map { case (t, i) =>
        Quad("urn:g#", s"urn:s#$i", "urn:p#v", t) }.toDF()
      def run(dir: String) = BgpPlanner.evaluate(quads, Sparql.parse(
        s"PREFIX p: <urn:p#> SELECT ?v WHERE { ?s p:v ?v . } ORDER BY $dir"))
        .collect().map(_.getString(0)).toSeq
      val asc = terms.sorted(Ordering.by(key)).map(lexOf)
      assert(run("?v") == asc, s"ASC over $terms")
      assert(run("DESC(?v)") == asc.reverse, s"DESC over $terms")
    }
  }

  test("ENCODE_FOR_URI == URLEncoder modulo the documented form-encoding deltas") {
    val s = spark
    import s.implicits._
    // independent reference: java.net.URLEncoder form-encodes; the three
    // deltas to fn:encode-for-uri are exactly space (+ vs %20), '*'
    // (kept vs %2A), and '~' (%7E vs kept)
    def ref(v: String): String =
      java.net.URLEncoder.encode(v, "UTF-8")
        .replace("+", "%20").replace("*", "%2A").replace("%7E", "~")
    val strGen = Gen.oneOf("", "abc", "Los Angeles", "a/b?c#d", "100% ~legit~",
      "日本語", "Français", "a*b.c-d_e", "über straße", "é́",
      "urn:x#1", "()[]{}<>", "a\tb\nc")
    val cases = (1 to 40).flatMap { i =>
      strGen(Gen.Parameters.default, Seed(63000L + i))
    }
    assert(cases.size >= 35)
    cases.foreach { v =>
      // round-13 encoding via TestTerms.t: the operand lexes out of the
      // quoted term ("urn:x#1" stays an IRI — ENCODE_FOR_URI reads ITS
      // lexical identically)
      val quads = Seq(TestTerms.t(Quad("urn:g#", "urn:s#1", "urn:p#v", v))).toDF()
      val q = Sparql.parse("PREFIX p: <urn:p#> SELECT ?r WHERE { " +
        "?s p:v ?v . BIND(ENCODE_FOR_URI(?v) AS ?r) }")
      val got = BgpPlanner.evaluate(quads, q).collect().head.getString(0)
      assert(got == ref(v), s"ENCODE_FOR_URI(\"$v\"): planner=$got jdk=${ref(v)}")
    }
  }
}
