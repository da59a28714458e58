package graft.sparql

import graft.Model

import scala.collection.mutable.ArrayBuffer

/** AST + parser for the SPARQL subset the reference exercises
  * (reference: mortar-parquet-client/client.py:116-140 and
  * mortar-parquet-client/README.md:22-33; inventory in SURVEY.md §2.8):
  *
  *   - `PREFIX` declarations
  *   - `SELECT *` / `SELECT ?a ?b` (+ DISTINCT for good measure)
  *   - basic graph patterns: triple patterns with `;` predicate-object
  *     lists, `,` object lists, `a` for rdf:type
  *   - property paths: sequence `p1/p2`, zero-or-more `p*`, one-or-more
  *     `p+`, inverse `^p`, alternatives `(p1|^p2)` with a shared modifier
  *     (`(p|q)*`) or bare as the whole path (`p|q`)
  *   - inline blank nodes `[ p ?v ]` (anonymous join variables)
  *
  *   - `FILTER` constraints: comparisons (`< <= > >= = !=`) over
  *     variables/literals/IRIs — or string-builtin calls as operands
  *     (`FILTER(STRLEN(?x) > 3)`, `FILTER(STRAFTER(STR(?c),"#") = "5")`)
  *     — with SPARQL's numeric-vs-string dispatch,
  *     `regex(?v, "pat"[, "flags"])`, `CONTAINS`, `STRSTARTS`, `STRENDS`,
  *     `BOUND`, `?v IN (…)` / `?v NOT IN (…)`, combined with `&& || !`
  *     and parentheses
  *   - `FILTER EXISTS { … }` / `FILTER NOT EXISTS { … }` (as the whole
  *     constraint — SPARQL 1.1 §8.1 pattern-based negation; the other
  *     negation idiom, MINUS, is below; both bodies are full recursive
  *     groups)
  *   - `OPTIONAL { … }` groups (SPARQL's LeftJoin(P1, P2, F) form where
  *     the group's own FILTERs condition the join itself), nested to
  *     ARBITRARY depth since round 9 — OPTIONAL-in-OPTIONAL,
  *     UNION-in-OPTIONAL, OPTIONAL-in-UNION-branch, plain `{ … }` groups,
  *     and group-scoped VALUES/MINUS/BIND/EXISTS
  *   - `{ A } UNION { B }` alternatives (branches are full recursive
  *     groups with their own FILTERs; unshared variables stay unbound
  *     per branch)
  *   - `MINUS { … }` groups (solutions removed when compatible on ≥1
  *     shared variable — SPARQL's dom-disjoint rule keeps the row)
  *   - `GRAPH <iri> { … }` / `GRAPH ?g { … }` named-graph scoping
  *     (§13.3) — constant form re-scopes the full recursive group,
  *     variable form binds ?g and supports path modifiers via a shared
  *     per-graph closure
  *   - `VALUES ?v { … }` / `VALUES (?a ?b) { (… …) … }` inline data,
  *     including UNDEF cells (compatible-with-anything, joined via an
  *     explicit null-or-equal condition — see BgpPlanner)
  *   - aggregates in the SELECT clause — `(COUNT(DISTINCT ?x) AS ?n)`,
  *     COUNT/SUM/MIN/MAX/AVG/SAMPLE and
  *     `GROUP_CONCAT([DISTINCT] ?v; SEPARATOR="…")` — with `GROUP BY`,
  *     `HAVING` (alias vars or inline aggregate calls), and solution
  *     modifiers `ORDER BY` (ASC/DESC), `LIMIT`, `OFFSET`
  *   - subqueries `{ SELECT … WHERE { … } … }` (explicit projection;
  *     joined with the ENCLOSING group — top level or any nested group —
  *     on shared variables; deeper subqueries recurse naturally)
  *   - query forms beyond SELECT: `ASK` (one-row true/false),
  *     `CONSTRUCT { template } WHERE { … }` (distinct s/p/o triples;
  *     template rows with an unbound variable are not generated), and
  *     `DESCRIBE <iri>… [?v… WHERE { … }]` (subject-position triples of
  *     the described resources — the minimal common reading of the
  *     spec's implementation-defined description)
  *
  *   - `BIND(expr AS ?v)` with string builtins (CONCAT, STR, UCASE,
  *     LCASE, STRLEN, STRAFTER, STRBEFORE, SUBSTR with literal 1-based
  *     positions, REPLACE with literal pattern/replacement — no flags
  *     argument), COALESCE, IF(cond,t,e) with a full FILTER-expression
  *     condition, and `+ - * /` arithmetic (group-final scope; see
  *     BgpPlanner); non-aggregate `(expr AS ?x)` SELECT expressions
  *     desugar to a trailing BIND (ungrouped queries only)
  *   - property-path modifiers `*` `+` `?` and inverse/alternatives
  *
  * Anything outside this subset (SERVICE, federation, …) is dead
  * surface for the reference's usage and rejected with a clear error.
  */
object Sparql {

  sealed trait Term
  final case class V(name: String) extends Term // ?var
  final case class I(iri: String) extends Term // <iri> / prefixed, expanded
  final case class L(lex: String) extends Term // literal, lexical value

  /** One path element: alternatives of (IRI, inverse?) — `(p|^q)` — under
    * one shared modifier. `mod`: ' ' = exactly-one, '*' = zero-or-more,
    * '+' = one-or-more, '?' = zero-or-one. The single forward unmodified
    * step is the common case; the companion apply keeps it terse.
    *
    * `negated` marks a NEGATED property set (SPARQL 1.1 §9.1): `!p`,
    * `!^p`, `!(p|^q|…)` — the alts become the EXCLUSION set, split by
    * direction at evaluation (forward edges whose predicate avoids the
    * forward alts, union inverse edges avoiding the inverse alts; a part
    * exists only if the set names ≥1 element of that direction). */
  final case class Step(alts: List[(String, Boolean)], mod: Char,
      negated: Boolean = false,
      // VARIABLE predicate `?s ?p ?o` (round 11): the verb is a variable,
      // never combinable with path syntax (the SPARQL grammar's Path
      // production contains no variables) — alts is empty, mod is ' '.
      // The planner binds the quads relation's `p` column to the var.
      varName: Option[String] = None) {
    def star: Boolean = mod == '*'
  }
  object Step {
    def apply(iri: String, star: Boolean): Step =
      Step(List((iri, false)), if (star) '*' else ' ')
  }

  /** Triple pattern whose predicate is a path of ≥1 steps. */
  final case class TriplePattern(s: Term, path: List[Step], o: Term)

  // ---- FILTER expression AST --------------------------------------------
  /** Operand of a FILTER expression. */
  sealed trait FOperand
  final case class FVar(name: String) extends FOperand
  /** Numeric literal — forces NUMERIC comparison (SPARQL operator
    * dispatch on xsd numeric types; a non-numeric bound value is a type
    * error, i.e. the row is dropped). */
  final case class FNum(lexical: String) extends FOperand
  final case class FStr(value: String) extends FOperand
  final case class FIriRef(iri: String) extends FOperand
  /** A string-builtin call (BIND expression) as a comparison operand —
    * `FILTER(STRLEN(?x) > 3)`, `FILTER(STRAFTER(STR(?c), "#") = "5")`.
    * Dispatch follows FCmp's rule: a numeric literal on the other side
    * forces numeric comparison of the builtin's result. */
  final case class FBindOp(expr: BExpr) extends FOperand

  sealed trait FExpr
  /** op ∈ { < <= > >= = != }. */
  final case class FCmp(lhs: FOperand, op: String, rhs: FOperand) extends FExpr
  final case class FRegex(v: String, pattern: String, flags: String) extends FExpr
  final case class FContains(v: String, needle: String) extends FExpr
  final case class FStrStarts(v: String, prefix: String) extends FExpr
  final case class FStrEnds(v: String, suffix: String) extends FExpr
  final case class FBound(v: String) extends FExpr
  /** `?v IN (…)` / `?v NOT IN (…)` — SPARQL 1.1 §17.4.1.9 sugar for an
    * `=`-disjunction. Dispatch is per-list, not per-element: any numeric
    * value puts the WHOLE test in numeric mode (operands try_cast, a
    * non-numeric binding is a type error = row dropped), else codepoint
    * string equality — same rule as [[FCmp]]. */
  final case class FIn(operand: FOperand, values: List[FOperand],
      negated: Boolean) extends FExpr
  final case class FAnd(a: FExpr, b: FExpr) extends FExpr
  final case class FOr(a: FExpr, b: FExpr) extends FExpr
  final case class FNot(a: FExpr) extends FExpr
  /** sameTerm(a, b) — §17.4.1.8 term identity: codepoint equality on the
    * lexical encoding, never numeric-promoted (unlike `=`). */
  final case class FSameTerm(l: FOperand, r: FOperand) extends FExpr
  /** isBlank(?v) — blank nodes are encoded `_:{scope}-{n}` (Turtle.scala),
    * so the test is a prefix check on the lexical form. */
  final case class FIsBlank(v: String) extends FExpr
  /** isNumeric(?v) — true iff the lexical form is a numeric literal
    * (double-castable), the only numeric evidence the untyped store has. */
  final case class FIsNumeric(v: String) extends FExpr
  /** isIRI/isURI(?v) — §17.4.1.1, decidable since round 13's quoted
    * string-literal encoding: bare ∧ not blank ∧ not a shorthand shape. */
  final case class FIsIri(v: String) extends FExpr
  /** isLiteral(?v) — §17.4.1.3: any term carrying a datatype (quoted
    * plain/tagged/typed, or bare numeric/boolean shorthand). */
  final case class FIsLiteral(v: String) extends FExpr
  /** LANGMATCHES(langExpr, rangeExpr) — §17.4.3.1, RFC 4647 basic
    * filtering over RdfTerms-encoded language tags (round 11). */
  final case class FLangMatches(arg: BExpr, range: BExpr) extends FExpr

  /** A braced sub-group: patterns + its own FILTERs + (since round 9)
    * NESTED sub-structure — OPTIONAL-in-OPTIONAL, UNION-in-OPTIONAL,
    * OPTIONAL-in-UNION-branch, plain `{ … }` groups, and group-scoped
    * VALUES/MINUS/BIND/EXISTS — to arbitrary depth. For OPTIONAL the
    * top-level `filters` belong to the left-join itself (SPARQL algebra
    * LeftJoin(P1, P2, F)); for a UNION branch and a plain group they
    * scope to the group. Within a group the evaluation order mirrors the
    * top level: patterns∪groups∪unions∪values join, then optionals,
    * minuses, binds, exists, filters (§18.2.2.2 group scope). */
  final case class PatternGroup(
      patterns: List[TriplePattern], filters: List[FExpr],
      optionals: List[PatternGroup] = Nil,
      unions: List[UnionGroup] = Nil,
      groups: List[PatternGroup] = Nil,
      values: List[ValuesBlock] = Nil,
      minuses: List[PatternGroup] = Nil,
      binds: List[Bind] = Nil,
      exists: List[(PatternGroup, Boolean)] = Nil,
      subqueries: List[Query] = Nil,
      graphs: List[(Term, PatternGroup)] = Nil) // GRAPH <iri>/?g { … }

  /** `{ A } UNION { B } …`: ≥2 branches, solutions concatenated with
    * unshared variables left unbound (SPARQL bag union). */
  final case class UnionGroup(branches: List[PatternGroup])

  /** One aggregate projection `(fn(DISTINCT? ?v|*) AS ?alias)`.
    * fn ∈ COUNT SUM MIN MAX AVG SAMPLE GROUP_CONCAT; `v` None =
    * `COUNT(*)`. The alias joins the variable namespace (it IS a variable
    * per SPARQL), so it appears in `projection` at its written position.
    * `sep` is GROUP_CONCAT's SEPARATOR (default " " per §18.5.1.7). */
  final case class Agg(fn: String, v: Option[String], distinct: Boolean,
      alias: String, sep: String = " ")

  /** Inline data: `VALUES (?a ?b) { ("x" <u>) … }`. Rows hold lexical
    * values (IRI or literal — the quads encoding stores both as strings);
    * a `null` cell is UNDEF (compatible with any binding of that
    * variable — §10.2.2). */
  final case class ValuesBlock(vars: List[String], rows: List[List[String]]) {
    def hasUndef: Boolean = rows.exists(_.contains(null))
  }

  /** BIND expression AST. The quads encoding is lexical strings, so every
    * expression evaluates to a string column; arithmetic is INTEGER-typed
    * (operands try_cast to long, non-integer bindings → unbound) — the
    * xsd:integer case every fixture query needs, with decimal promotion
    * deliberately out of subset (its xsd:decimal exactness rules have no
    * cheap faithful Column form). */
  sealed trait BExpr
  final case class BVar(name: String) extends BExpr
  final case class BLit(value: String) extends BExpr // string/IRI/number lexical
  final case class BConcat(args: List[BExpr]) extends BExpr
  /** COALESCE(e1, e2, …) — first argument that evaluates, error-free, to
    * a bound value (§17.4.1.5). Errors and unbound map to SQL NULL in
    * this compiler, so Catalyst's coalesce IS the faithful translation. */
  final case class BCoalesce(args: List[BExpr]) extends BExpr
  /** IF(cond, then, else) — §17.4.1.2: the condition is a full FILTER
    * boolean expression; an error in the condition is an error for the
    * whole IF (→ unbound), NOT the else-branch. */
  final case class BIf(cond: FExpr, thenE: BExpr, elseE: BExpr) extends BExpr
  /** fn ∈ STR (identity on the lexical encoding), UCASE, LCASE, STRLEN. */
  final case class BStrFn(fn: String, arg: BExpr) extends BExpr
  /** STRLANG(str, tag) / STRDT(str, dt) — §17.4.2.5/.6 term constructors
    * over the RdfTerms encoding (round 11); annotated or blank inputs are
    * type errors → NULL. */
  final case class BStrLang(arg: BExpr, tag: BExpr) extends BExpr
  final case class BStrDt(arg: BExpr, dt: BExpr) extends BExpr
  /** STRAFTER/STRBEFORE(arg, sep): empty string when `sep` is absent. */
  final case class BStrCut(arg: BExpr, sep: String, after: Boolean) extends BExpr
  /** SUBSTR(source, start[, len]) — §17.4.3.3 (XPath fn:substring),
    * 1-based; start/len are literal integers in this subset. */
  final case class BSubstr(arg: BExpr, start: Int, len: Option[Int]) extends BExpr
  /** REPLACE(arg, pattern, replacement) — §17.4.3.4; literal pattern /
    * replacement (the portable regex subset), no flags argument. */
  final case class BReplace(arg: BExpr, pattern: String, replacement: String) extends BExpr
  /** fn ∈ ABS CEIL FLOOR ROUND — §17.4.4 numerics over the lexical
    * encoding: integer lexicals stay exact (long path); other numeric
    * lexicals evaluate in xsd:double. ROUND is XPath fn:round — half
    * rounds toward +∞ (ROUND(-2.5) = -2), NOT half-away-from-zero. */
  final case class BNumFn(fn: String, arg: BExpr) extends BExpr
  /** fn ∈ MD5 SHA1 SHA256 — §17.4.6 hashes of the UTF-8 lexical form,
    * lowercase hex per the spec's examples. */
  final case class BHashFn(fn: String, arg: BExpr) extends BExpr
  /** ENCODE_FOR_URI — §17.4.3.10 = XPath fn:encode-for-uri (percent-
    * encode all but RFC 3986 unreserved, uppercase hex). */
  final case class BEncodeUri(arg: BExpr) extends BExpr
  /** fn ∈ YEAR MONTH DAY HOURS MINUTES SECONDS TZ TIMEZONE — §17.4.5
    * dateTime accessors, evaluated structurally on the xsd:dateTime
    * lexical form (no instant conversion — XPath components are those of
    * the literal's own timezone, so extracting from the lexical IS the
    * faithful semantics; a zone-shifting timestamp cast would not be).
    * TZ reads the designator string ("" when absent, §17.4.5.8);
    * TIMEZONE (§17.4.5.7) renders it as a canonical xsd:dayTimeDuration
    * TERM and type-errors on a designator-less dateTime. */
  final case class BDtFn(fn: String, arg: BExpr) extends BExpr
  /** Integer arithmetic, op ∈ + - *. */
  final case class BArith(l: BExpr, op: Char, r: BExpr) extends BExpr

  /** `BIND(expr AS ?alias)` — alias joins the variable namespace.
    *
    * `priorVars` (group-parsed binds only) is the set of user variables
    * already in scope at the BIND's textual position — §18.2.2.6: BIND
    * ends the preceding basic graph pattern, so (a) the expression sees
    * ONLY variables bound so far (a forward reference evaluates to
    * unbound, not to the later binding), and (b) the alias is a JOIN
    * variable for later patterns in the group. None = every group var is
    * in scope (SELECT-expression desugaring, which is by construction
    * last). */
  final case class Bind(expr: BExpr, alias: String,
      priorVars: Option[Set[String]] = None)

  /** User-visible variables a group can bind, recursively (fresh `_anon`/
    * `_path` join vars excluded). MINUS and EXISTS bodies never bind
    * outward (§8.3: they constrain, they don't extend the domain). */
  def boundVars(g: PatternGroup): Set[String] = (
    g.patterns.flatMap(tp => Seq(tp.s, tp.o).collect { case V(n) => n } ++
      tp.path.flatMap(_.varName)) ++
      g.optionals.flatMap(boundVars) ++ g.groups.flatMap(boundVars) ++
      g.unions.flatMap(_.branches.flatMap(boundVars)) ++
      g.values.flatMap(_.vars) ++ g.binds.map(_.alias) ++
      g.subqueries.flatMap(_.selected) ++
      g.graphs.flatMap { case (t, gg) =>
        (t match { case V(n) => Seq(n); case _ => Nil }) ++ boundVars(gg)
      }
  ).toSet.filterNot(v => v.startsWith("_anon") || v.startsWith("_path"))

  /** Parsed query. `projection` empty = SELECT *. `userVars` is every named
    * variable in order of first appearance (for SELECT *, mirroring
    * rdflib's `res.vars` ordering, client.py:45-46). Group-level `filters`
    * apply to the whole group solution — after OPTIONAL extension, so
    * `FILTER(!BOUND(?x))` works. `orderBy` is (projected name, descending);
    * `aggregates` rows whose alias is not in `projection` were synthesized
    * for HAVING and stay internal. */
  final case class Query(
      projection: List[String],
      distinct: Boolean,
      patterns: List[TriplePattern],
      userVars: List[String],
      filters: List[FExpr] = Nil,
      optionals: List[PatternGroup] = Nil,
      unions: List[UnionGroup] = Nil,
      aggregates: List[Agg] = Nil,
      groupBy: List[String] = Nil,
      having: List[FExpr] = Nil,
      orderBy: List[(String, Boolean)] = Nil,
      limit: Option[Int] = None,
      offset: Option[Int] = None,
      values: List[ValuesBlock] = Nil,
      minuses: List[PatternGroup] = Nil,
      binds: List[Bind] = Nil,
      exists: List[(PatternGroup, Boolean)] = Nil, // (group, positive?)
      subqueries: List[Query] = Nil,
      askForm: Boolean = false,
      template: List[TriplePattern] = Nil, // nonEmpty = CONSTRUCT
      describeTerms: List[Term] = Nil, // nonEmpty = DESCRIBE
      groups: List[PatternGroup] = Nil, // plain nested `{ … }` groups
      graphs: List[(Term, PatternGroup)] = Nil, // GRAPH <iri>/?g { … }
      fromGraphs: List[String] = Nil, // FROM <g> — merged default graph
      fromNamed: List[String] = Nil, // FROM NAMED <g> — GRAPH-visible set
      // trailing `… } VALUES ?v { … }` clause — §18.2.4.7: joins the
      // solution sequence AFTER grouping/HAVING, BEFORE order/slice
      postValues: List[ValuesBlock] = Nil,
      // SELECT expressions when a trailing VALUES exists — §18.2.4 places
      // Extend AFTER the §18.2.4.7 join, so they cannot desugar into the
      // WHERE group (a var bound only by the trailing VALUES must be
      // visible); the planner evaluates these post-join. Empty when there
      // is no trailing VALUES (then the BIND desugar is identical algebra).
      postSelectExprs: List[Bind] = Nil) {
    def selected: List[String] = if (projection.nonEmpty) projection else userVars
  }

  def parse(text: String): Query = new Parser(text).parseQuery()

  // ---------------------------------------------------------------------
  private final class Parser(in: String) {
    private var pos = 0
    private val n = in.length
    private val prefixes = scala.collection.mutable.Map[String, String]()
    private var anonCounter = 0
    private val order = ArrayBuffer[String]() // named vars, first-appearance
    private val aggs = ArrayBuffer[Agg]()
    // non-aggregate SELECT expressions, desugared to trailing BINDs
    private val selectExprs = ArrayBuffer[Bind]()

    /** One group's worth of parse state — the top level and every nested
      * `{ … }` each get their own instance, so VALUES/MINUS/BIND/EXISTS
      * scope to the group that contains them. */
    private final class GroupBufs {
      val patterns = ArrayBuffer[TriplePattern]()
      val filters = ArrayBuffer[FExpr]()
      val optionals = ArrayBuffer[PatternGroup]()
      val unions = ArrayBuffer[UnionGroup]()
      val groups = ArrayBuffer[PatternGroup]()
      val values = ArrayBuffer[ValuesBlock]()
      val minuses = ArrayBuffer[PatternGroup]()
      val binds = ArrayBuffer[Bind]()
      val exists = ArrayBuffer[(PatternGroup, Boolean)]()
      val subqueries = ArrayBuffer[Query]()
      val graphs = ArrayBuffer[(Term, PatternGroup)]()
      /** User variables bound by the elements accumulated SO FAR — the
        * in-scope set at the current parse position (§18.2.2.6). */
      def seenVars: Set[String] =
        boundVars(PatternGroup(patterns.toList, Nil, optionals.toList,
          unions.toList, groups.toList, values.toList, Nil, binds.toList,
          Nil, subqueries.toList, graphs.toList))

      def toGroup: PatternGroup = PatternGroup(patterns.toList,
        filters.toList, optionals.toList, unions.toList, groups.toList,
        values.toList, minuses.toList, binds.toList, exists.toList,
        subqueries.toList, graphs.toList)
      /** Can this group produce bindings? (A binds/filter-only group has
        * nothing to extend and is rejected as empty.) */
      def bindsAnything: Boolean = patterns.nonEmpty || optionals.nonEmpty ||
        unions.nonEmpty || groups.nonEmpty || values.nonEmpty ||
        subqueries.nonEmpty || graphs.nonEmpty
    }
    private var haggCounter = 0 // HAVING-synthesized aggregate aliases

    private def err(msg: String): Nothing = {
      val ctx = in.substring(math.max(0, pos - 40), math.min(n, pos + 40))
      throw new IllegalArgumentException(s"SPARQL parse error at $pos: $msg near ...$ctx...")
    }

    private def skipWs(): Unit = {
      while (pos < n) {
        val c = in.charAt(pos)
        if (c == '#') { while (pos < n && in.charAt(pos) != '\n') pos += 1 }
        else if (c.isWhitespace) pos += 1
        else return
      }
    }

    private def peek: Char = if (pos < n) in.charAt(pos) else ' '

    private def kw(word: String): Boolean = {
      skipWs()
      if (in.regionMatches(true, pos, word, 0, word.length)) {
        val after = pos + word.length
        if (after >= n || !in.charAt(after).isLetterOrDigit) { pos = after; return true }
      }
      false
    }

    /** Non-consuming [[kw]]: true iff `word` is next (after whitespace),
      * leaving `pos` untouched — dispatch lookahead, not a match. */
    private def kwAhead(word: String): Boolean = {
      skipWs()
      in.regionMatches(true, pos, word, 0, word.length) && {
        val after = pos + word.length
        after >= n || !in.charAt(after).isLetterOrDigit
      }
    }

    private def parseIriRef(): String = {
      if (peek != '<') err("expected IRIREF")
      val end = in.indexOf('>', pos + 1)
      if (end < 0) err("unterminated IRIREF")
      val raw = in.substring(pos + 1, end)
      pos = end + 1
      raw
    }

    private def nameChar(c: Char): Boolean = c.isLetterOrDigit || c == '_' || c == '-' || c == '.'

    private def parsePName(): String = {
      val start = pos
      while (pos < n && (nameChar(in.charAt(pos)) || in.charAt(pos) == ':')) pos += 1
      var tok = in.substring(start, pos)
      while (tok.nonEmpty && tok.last == '.') { tok = tok.dropRight(1); pos -= 1 }
      val i = tok.indexOf(':')
      if (i < 0) err(s"expected prefixed name, got '$tok'")
      prefixes.get(tok.substring(0, i)) match {
        case Some(ns) => ns + tok.substring(i + 1)
        case None => err(s"unknown prefix '${tok.substring(0, i)}:'")
      }
    }

    private def parseVar(): String = {
      pos += 1 // '?' or '$'
      val start = pos
      while (pos < n && (in.charAt(pos).isLetterOrDigit || in.charAt(pos) == '_')) pos += 1
      val name = in.substring(start, pos)
      if (name.isEmpty) err("empty variable name")
      if (!order.contains(name)) order += name
      name
    }

    private def parseLiteral(): String = {
      val quote = peek
      pos += 1
      val sb = new StringBuilder
      while (pos < n && in.charAt(pos) != quote) {
        val c = in.charAt(pos)
        if (c == '\\' && pos + 1 < n) {
          val e = in.charAt(pos + 1)
          sb.append(e match {
            case 't' => '\t'; case 'n' => '\n'; case 'r' => '\r'
            case other => other
          })
          pos += 2
        } else { sb.append(c); pos += 1 }
      }
      // missing close quote: fail HERE, not later — advancing past n would
      // let a downstream substring throw a raw StringIndexOutOfBounds
      if (pos >= n) err("unterminated string literal")
      pos += 1
      // optional @lang / ^^type — preserved in the quads' RdfTerms
      // encoding (round 11) so query constants match stored terms; the
      // same bare-shorthand normalization applies on both sides.
      if (peek == '@') {
        pos += 1
        val st = pos
        while (pos < n && (in.charAt(pos).isLetterOrDigit || in.charAt(pos) == '-')) pos += 1
        graft.RdfTerms.encodeLang(sb.toString, in.substring(st, pos))
      } else if (in.startsWith("^^", pos)) {
        pos += 2; skipWs()
        lastLiteralDt = Some(if (peek == '<') parseIriRef() else parsePName())
        graft.RdfTerms.encodeTyped(sb.toString, lastLiteralDt.get)
      } else {
        // round 13: shape-normalized like the Turtle loader — so query
        // constants match stored terms: non-shorthand strings quote,
        // shorthand shapes keep the bare numeric/boolean normalization
        val l = sb.toString
        graft.RdfTerms.encodeTyped(l, graft.RdfTerms.shapeDatatype(l))
      }
    }

    /** Datatype IRI of the literal [[parseLiteral]] just returned, when it
      * carried an explicit `^^dt` — lets parseOperand numeric-dispatch
      * `"5"^^xsd:integer` like the bare literal 5 (§17.3 operator
      * mapping), without threading a tuple through every call site. */
    private var lastLiteralDt: Option[String] = None
    private def parseLiteralTracked(): (String, Option[String]) = {
      lastLiteralDt = None
      val v = parseLiteral()
      (v, lastLiteralDt)
    }

    def parseQuery(): Query = {
      while (kw("PREFIX")) {
        skipWs()
        val colon = in.indexOf(':', pos)
        if (colon < 0) err("bad PREFIX")
        val name = in.substring(pos, colon).trim
        pos = colon + 1
        skipWs()
        prefixes(name) = parseIriRef()
      }
      // ---- ASK form: boolean existence of ≥1 solution --------------------
      if (kw("ASK")) {
        val (fromG, fromN) = parseDatasetClauses()
        kw("WHERE") // optional per the grammar
        skipWs()
        if (peek != '{') err("expected '{' after ASK")
        pos += 1
        val b = new GroupBufs
        parseGroupBody(b, nested = false)
        skipWs()
        if (pos < n) err("unexpected trailing content after ASK group")
        return Query(Nil, distinct = false, b.patterns.toList, order.toList,
          b.filters.toList, b.optionals.toList, b.unions.toList,
          values = b.values.toList, minuses = b.minuses.toList,
          binds = b.binds.toList, exists = b.exists.toList,
          subqueries = b.subqueries.toList, askForm = true,
          groups = b.groups.toList, graphs = b.graphs.toList,
          fromGraphs = fromG, fromNamed = fromN)
      }
      // ---- DESCRIBE form: subject triples of the described resources -----
      if (kw("DESCRIBE")) {
        val terms = ArrayBuffer[Term]()
        var more = true
        while (more) {
          skipWs()
          val whereAhead = in.regionMatches(true, pos, "WHERE", 0, 5) &&
            (pos + 5 >= n || !in.charAt(pos + 5).isLetterOrDigit)
          val fromAhead = in.regionMatches(true, pos, "FROM", 0, 4) &&
            (pos + 4 >= n || !in.charAt(pos + 4).isLetterOrDigit)
          if (peek == '?' || peek == '$') terms += V(parseVar())
          else if (peek == '<') terms += I(parseIriRef())
          else if (!whereAhead && !fromAhead && (peek.isLetter || peek == '_')) terms += I(parsePName())
          else more = false
        }
        if (terms.isEmpty) err("DESCRIBE needs ≥1 IRI or variable")
        val (fromG, fromN) = parseDatasetClauses()
        val hasVar = terms.exists(_.isInstanceOf[V])
        val b = new GroupBufs
        if (kw("WHERE")) {
          skipWs()
          if (peek != '{') err("expected '{' after WHERE")
          pos += 1
          parseGroupBody(b, nested = false)
        } else if (hasVar)
          err("DESCRIBE with variables needs a WHERE group binding them")
        skipWs()
        if (pos < n) err("unexpected trailing content after DESCRIBE query")
        return Query(Nil, distinct = false, b.patterns.toList, order.toList,
          b.filters.toList, b.optionals.toList, b.unions.toList,
          values = b.values.toList, minuses = b.minuses.toList,
          binds = b.binds.toList, exists = b.exists.toList,
          subqueries = b.subqueries.toList, describeTerms = terms.toList,
          groups = b.groups.toList, graphs = b.graphs.toList,
          fromGraphs = fromG, fromNamed = fromN)
      }
      // ---- CONSTRUCT form: template instantiated per solution ------------
      if (kw("CONSTRUCT")) {
        skipWs()
        // §16.2.4 shortcut `CONSTRUCT [FROM …] WHERE { bgp }`: the WHERE
        // group IS the template. The spec restricts the shortcut's body
        // to a template-valid basic graph pattern — anything beyond
        // plain-IRI-predicate triples (FILTER, OPTIONAL, paths, …) is
        // rejected loudly, not silently dropped from the template.
        if (kwAhead("WHERE") || kwAhead("FROM")) {
          val (fromG, fromN) = parseDatasetClauses()
          if (!kw("WHERE")) err("expected WHERE in CONSTRUCT WHERE form")
          skipWs()
          if (peek != '{') err("expected '{'")
          pos += 1
          val b = new GroupBufs
          parseGroupBody(b, nested = false)
          skipWs()
          if (pos < n) err("unexpected trailing content after CONSTRUCT query")
          val plain = b.filters.isEmpty && b.optionals.isEmpty &&
            b.unions.isEmpty && b.groups.isEmpty && b.values.isEmpty &&
            b.minuses.isEmpty && b.binds.isEmpty && b.exists.isEmpty &&
            b.subqueries.isEmpty && b.graphs.isEmpty
          if (!plain || b.patterns.isEmpty)
            err("CONSTRUCT WHERE takes a non-empty basic graph pattern " +
              "only (§16.2.4) — FILTER/OPTIONAL/UNION/… need the explicit " +
              "CONSTRUCT { template } WHERE { … } form")
          b.patterns.foreach { tp =>
            val ok = tp.path.lengthCompare(1) == 0 && tp.path.head.mod == ' ' &&
              tp.path.head.alts.lengthCompare(1) == 0 &&
              !tp.path.head.alts.head._2 && !tp.path.head.negated
            if (!ok) err("CONSTRUCT WHERE patterns must use plain IRI " +
              "predicates (§16.2.4) — property paths have no template form")
          }
          return Query(Nil, distinct = false, b.patterns.toList, order.toList,
            template = b.patterns.toList,
            fromGraphs = fromG, fromNamed = fromN)
        }
        if (peek != '{') err("expected '{' to open the CONSTRUCT template")
        pos += 1
        val tmpl = ArrayBuffer[TriplePattern]()
        skipWs()
        while (peek != '}') {
          if (pos >= n) err("unterminated CONSTRUCT template")
          parseTriplesSameSubject(tmpl)
          skipWs()
          if (peek == '.') { pos += 1; skipWs() }
        }
        pos += 1
        if (tmpl.isEmpty) err("empty CONSTRUCT template")
        tmpl.foreach { tp =>
          val ok = tp.path.lengthCompare(1) == 0 && tp.path.head.mod == ' ' &&
            tp.path.head.alts.lengthCompare(1) == 0 && !tp.path.head.alts.head._2
          if (!ok) err("CONSTRUCT template predicates must be plain IRIs " +
            "(no property paths) — paths belong in the WHERE group")
        }
        val (fromG, fromN) = parseDatasetClauses()
        if (!kw("WHERE")) err("expected WHERE after CONSTRUCT template")
        skipWs()
        if (peek != '{') err("expected '{'")
        pos += 1
        val b = new GroupBufs
        parseGroupBody(b, nested = false)
        skipWs()
        if (pos < n) err("unexpected trailing content after CONSTRUCT query")
        return Query(Nil, distinct = false, b.patterns.toList, order.toList,
          b.filters.toList, b.optionals.toList, b.unions.toList,
          values = b.values.toList, minuses = b.minuses.toList,
          binds = b.binds.toList, exists = b.exists.toList,
          subqueries = b.subqueries.toList, template = tmpl.toList,
          groups = b.groups.toList, graphs = b.graphs.toList,
          fromGraphs = fromG, fromNamed = fromN)
      }
      if (!kw("SELECT")) err("expected SELECT, ASK, or CONSTRUCT")
      val distinct = kw("DISTINCT")
      // REDUCED (§15.3.1) permits — but does not require — eliminating
      // duplicates; returning the full bag is a conforming answer, so it
      // parses as a no-op (the useful direction: a query written for an
      // engine that needs the hint keeps working here)
      if (!distinct) kw("REDUCED")
      skipWs()
      val projection = ArrayBuffer[String]()
      var star = false
      if (peek == '*') { pos += 1; star = true }
      else {
        var more = true
        while (more) {
          skipWs()
          if (peek == '?' || peek == '$') projection += parseVar()
          else if (peek == '(') projection += parseAggProjection()
          else more = false
        }
        if (projection.isEmpty) err("SELECT needs * or variables")
      }
      val (fromG, fromN) = parseDatasetClauses()
      if (!kw("WHERE")) err("expected WHERE")
      skipWs()
      if (peek != '{') err("expected '{'")
      pos += 1
      val b = new GroupBufs
      parseGroupBody(b, nested = false)
      // ---- solution modifiers (SPARQL 1.1 §18.2.4 order) ----------------
      val groupBy = ArrayBuffer[String]()
      if (kw("GROUP")) {
        if (!kw("BY")) err("expected BY after GROUP")
        while ({ skipWs(); peek == '?' || peek == '$' }) groupBy += parseVar()
        if (groupBy.isEmpty) err("GROUP BY needs ≥1 variable")
      }
      val having = ArrayBuffer[FExpr]()
      while (kw("HAVING")) having += parseFilter()
      if (star && (groupBy.nonEmpty || aggs.nonEmpty))
        err("SELECT * cannot be combined with GROUP BY / aggregates")
      val orderBy = ArrayBuffer[(String, Boolean)]()
      if (kw("ORDER")) {
        if (!kw("BY")) err("expected BY after ORDER")
        var more = true
        while (more) {
          skipWs()
          if (kw("DESC")) { expect('('); orderBy += ((parseVarArg(), true)); expect(')') }
          else if (kw("ASC")) { expect('('); orderBy += ((parseVarArg(), false)); expect(')') }
          else if (peek == '?' || peek == '$') orderBy += ((parseVar(), false))
          else more = false
        }
        if (orderBy.isEmpty) err("ORDER BY needs ≥1 key")
      }
      // LIMIT and OFFSET may appear in either order (LimitOffsetClauses)
      var limit = Option.empty[Int]
      var offset = Option.empty[Int]
      var moreSlice = true
      while (moreSlice) {
        if (kw("LIMIT")) limit = Some(parseInt())
        else if (kw("OFFSET")) offset = Some(parseInt())
        else moreSlice = false
      }
      // ValuesClause (grammar: the last production of every query form):
      // ONE trailing VALUES block, joined per §18.2.4.7
      val postVals = ArrayBuffer[ValuesBlock]()
      if (kw("VALUES")) postVals += parseValues()
      skipWs()
      if (pos < n) err("unexpected trailing content after query")
      if (selectExprs.nonEmpty && (groupBy.nonEmpty || aggs.nonEmpty))
        err("SELECT expressions over a grouped query are outside the " +
          "subset (post-aggregation Extend); compute with BIND before " +
          "grouping or project the aggregate alias")
      // With a trailing VALUES, §18.2.4 places the SELECT-expression
      // Extend AFTER the §18.2.4.7 join — carry them separately for the
      // planner's finish(); without one, the WHERE-group BIND desugar is
      // identical algebra (and lets group FILTERs etc. compose as before).
      val (desugared, postSel) =
        if (postVals.isEmpty) (selectExprs.toList, Nil)
        else (Nil, selectExprs.toList)
      Query(projection.toList, distinct, b.patterns.toList, order.toList,
        b.filters.toList, b.optionals.toList, b.unions.toList,
        aggs.toList, groupBy.toList, having.toList, orderBy.toList,
        limit, offset, b.values.toList, b.minuses.toList,
        (b.binds ++ desugared).toList, b.exists.toList, b.subqueries.toList,
        groups = b.groups.toList, graphs = b.graphs.toList,
        fromGraphs = fromG, fromNamed = fromN, postValues = postVals.toList,
        postSelectExprs = postSel)
    }

    private def parseInt(): Int = {
      skipWs()
      val start = pos
      while (pos < n && in.charAt(pos).isDigit) pos += 1
      if (pos == start) err("expected a non-negative integer")
      in.substring(start, pos).toInt
    }

    /** `(fn([DISTINCT] ?v|*) AS ?alias)` — appends to [[aggs]], returns
      * the alias (which takes the projection slot at its written spot). */
    private def parseAggProjection(): String = {
      expect('(')
      // SELECT expressions (§18.2.4.4 Extend): a non-aggregate
      // `(expr AS ?x)` desugars to a trailing BIND over the WHERE group —
      // identical algebra for ungrouped queries (enforced at assembly;
      // with GROUP BY the Extend would run post-aggregation, which BIND
      // cannot express, so that combination is rejected loudly).
      if (!Seq("GROUP_CONCAT", "COUNT", "SUM", "MIN", "MAX", "AVG",
          "SAMPLE").exists(kwAhead)) {
        val e = parseBindExpr()
        if (!kw("AS")) err("SELECT expression needs AS: (expr AS ?x)")
        skipWs()
        if (peek != '?' && peek != '$') err("expected ?alias after AS")
        val alias = parseVar()
        expect(')')
        selectExprs += Bind(e, alias)
        return alias
      }
      val a = parseAggCall()
      if (!kw("AS")) err("aggregate projection needs AS: (COUNT(?x) AS ?n)")
      skipWs()
      if (peek != '?' && peek != '$') err("expected ?alias after AS")
      val alias = parseVar()
      expect(')')
      aggs += a.copy(alias = alias)
      alias
    }

    /** `fn([DISTINCT] ?v|*)` with a placeholder alias. GROUP_CONCAT also
      * accepts `; SEPARATOR="…"` (default " ", §18.5.1.7). */
    private def parseAggCall(): Agg = {
      skipWs()
      val fn = Seq("GROUP_CONCAT", "COUNT", "SUM", "MIN", "MAX", "AVG",
        "SAMPLE").find(kw)
        .getOrElse(err("expected an aggregate " +
          "(COUNT/SUM/MIN/MAX/AVG/SAMPLE/GROUP_CONCAT)"))
      expect('(')
      val distinct = kw("DISTINCT")
      skipWs()
      val v =
        if (peek == '*') {
          if (distinct) err("COUNT(DISTINCT *) is outside the supported subset")
          if (fn != "COUNT") err(s"$fn(*) is not a SPARQL aggregate")
          pos += 1; None
        } else Some(parseVarArg())
      var sep = " "
      skipWs()
      if (peek == ';') {
        if (fn != "GROUP_CONCAT") err(s"'; SEPARATOR' is a GROUP_CONCAT form")
        pos += 1
        if (!kw("SEPARATOR")) err("expected SEPARATOR after ';'")
        expect('=')
        sep = parseStrArg()
      }
      expect(')')
      Agg(fn, v, distinct, "", sep)
    }

    /** Body of a `{ … }` group up to and including the closing brace:
      * triple blocks, FILTER constraints, OPTIONAL groups, `{ A } UNION
      * { B }` alternatives, plain nested `{ … }` groups, and group-scoped
      * VALUES/MINUS/BIND/EXISTS — all recursing to arbitrary depth (the
      * planner's join tree grows with query size, which is the right
      * bound), and since late round 9 EXISTS/MINUS bodies are full
      * recursive groups too. Still TOP-LEVEL-only, with a named error:
      * GRAPH (its planner integration assumes the outer scope). */
    private def parseGroupBody(
        b: GroupBufs,
        nested: Boolean): Unit = {
      skipWs()
      while (peek != '}') {
        if (pos >= n) err("unterminated group")
        if (peek == '{') {
          // `{ SELECT … }` — a braced group whose first token is SELECT is
          // a subquery: extracted verbatim (balanced braces) and parsed by
          // a fresh Parser seeded with the outer PREFIX declarations.
          if (selectAhead()) {
            val sub = parseSubSelect()
            if (sub.projection.isEmpty)
              err("subqueries must project explicit variables " +
                "(SELECT * subqueries are outside the supported subset)")
            // projected vars join the enclosing group's namespace (SPARQL
            // §18.2.1: only a subquery's projected variables are visible
            // outside it)
            sub.selected.foreach(v => if (!order.contains(v)) order += v)
            b.subqueries += sub
          } else {
            // `{ A } UNION { B } [UNION { C } …]`, or — with no UNION
            // keyword following — a plain nested group (joined with the
            // enclosing group per §18.2.2.2)
            val first = parseNestedGroup("group")
            if (kw("UNION")) {
              val branches = ArrayBuffer[PatternGroup](first)
              branches += parseNestedGroup("UNION branch")
              while (kw("UNION")) branches += parseNestedGroup("UNION branch")
              b.unions += UnionGroup(branches.toList)
            } else b.groups += first
          }
        } else if (kw("FILTER")) {
          // EXISTS / NOT EXISTS are pattern-valued constraints (semi/anti
          // joins), not boolean Columns — supported as the WHOLE filter
          // only, so they can't hide inside `&&`/`||` where a join has no
          // faithful Column form.
          if (kw("EXISTS")) {
            b.exists += ((parseNestedGroup("EXISTS"), true))
          } else if (notExistsAhead()) {
            kw("NOT"); kw("EXISTS")
            b.exists += ((parseNestedGroup("NOT EXISTS"), false))
          } else b.filters += parseFilter()
        } else if (kw("OPTIONAL")) {
          b.optionals += parseNestedGroup("OPTIONAL")
        } else if (kw("MINUS")) {
          b.minuses += parseNestedGroup("MINUS")
        } else if (kw("GRAPH")) {
          // allowed at any depth since round 10 — a nested GRAPH group
          // evaluates inside its enclosing group (evalGroup), so
          // `OPTIONAL { GRAPH ?g { … } }` and friends work
          skipWs()
          val term: Term =
            if (peek == '?' || peek == '$') V(parseVar())
            else if (peek == '<') I(parseIriRef())
            else if (peek.isLetter || peek == '_') I(parsePName())
            else err("GRAPH needs an IRI or ?variable")
          b.graphs += ((term, parseNestedGroup("GRAPH")))
        } else if (kw("VALUES")) {
          b.values += parseValues()
        } else if (kw("BIND")) {
          expect('(')
          val e = parseBindExpr()
          if (!kw("AS")) err("expected AS in BIND(expr AS ?var)")
          skipWs()
          if (peek != '?' && peek != '$') err("expected ?var after AS")
          val alias = parseVar()
          expect(')')
          // §18.2.2.6: the alias must be FRESH at this point of the group
          // (syntactic restriction in the REC), and the expression's
          // visible scope is exactly the vars bound so far — recorded for
          // the planner (forward references evaluate to unbound).
          val seen = b.seenVars
          if (seen.contains(alias))
            err(s"BIND would rebind ?$alias — already used in the group " +
              "up to this point (§18.2.2.6 syntactic restriction)")
          b.binds += Bind(e, alias, Some(seen))
        } else {
          rejectUnsupported()
          parseTriplesSameSubject(b.patterns)
        }
        skipWs()
        if (peek == '.') { pos += 1; skipWs() }
      }
      pos += 1
      // §18.2.2.6 positional check at group close: a BIND alias used by a
      // LATER triple pattern is supported (the planner turns the Extend
      // into a join-equality on the alias); an alias consumed by a later
      // OPTIONAL/UNION/nested-group/GRAPH/VALUES/subquery would need the
      // full positional algebra — rejected loudly, not mis-evaluated.
      // MINUS/EXISTS bodies are included although they bind nothing
      // outward: they CONSUME via domain compatibility, which is also
      // positional — the cost is over-rejecting the rare
      // `MINUS { … ?v } BIND(… AS ?v)` (body textually FIRST), where a
      // rename resolves it.
      val structVars = boundVars(PatternGroup(Nil, Nil, b.optionals.toList,
        b.unions.toList, b.groups.toList, b.values.toList, Nil, Nil, Nil,
        b.subqueries.toList, b.graphs.toList)) ++
        b.exists.toList.flatMap(e => boundVars(e._1)) ++
        b.minuses.toList.flatMap(boundVars)
      b.binds.foreach { bd =>
        bd.priorVars.foreach { seen =>
          if (structVars.contains(bd.alias) && !seen.contains(bd.alias))
            err(s"BIND alias ?${bd.alias} is referenced by a later " +
              "OPTIONAL/UNION/group/GRAPH/VALUES/subquery (or a MINUS/" +
              "EXISTS body) in the same group — positional BIND algebra " +
              "beyond later triple patterns is outside the supported " +
              "subset (§18.2.2.6); move the construct before the BIND " +
              "or rename the alias")
        }
      }
    }

    /** `{ … }` after OPTIONAL/GRAPH/UNION or standing alone: full
      * recursive group — triples, filters, nested OPTIONAL/UNION/plain
      * groups, group-scoped VALUES/MINUS/BIND/EXISTS. */
    private def parseNestedGroup(keyword: String): PatternGroup = {
      skipWs()
      if (peek != '{') err(s"expected '{' after $keyword")
      pos += 1
      val b = new GroupBufs
      parseGroupBody(b, nested = true)
      // The empty GroupGraphPattern {} is the one-empty-solution relation
      // {μ0} (§18.2.2.2) — legal standing alone (the planner's evalGroup
      // joins it as identity) and at the top-level WHERE. Inside
      // OPTIONAL/UNION/MINUS/EXISTS/GRAPH the {μ0} algebra has sharper
      // corners (MINUS {} keeps everything by the disjoint-domain rule,
      // OPTIONAL {} is a no-op) — rejected loudly there, per house rule.
      if (!b.bindsAnything && keyword != "group")
        err(s"empty $keyword group")
      b.toGroup
    }

    /** `VALUES ?v { term* }` or `VALUES (?a ?b) { (t1 t2) … }`. An UNDEF
      * cell parses to null — compatible with any binding (§10.2.2); the
      * planner joins such blocks via an explicit null-or-equal condition
      * rather than the greedy equi-join (BgpPlanner.applyValuesUndef). */
    private def parseValues(): ValuesBlock = {
      skipWs()
      val vars = ArrayBuffer[String]()
      val rowForm = peek == '('
      if (rowForm) {
        pos += 1
        while ({ skipWs(); peek == '?' || peek == '$' }) vars += parseVar()
        expect(')')
      } else if (peek == '?' || peek == '$') vars += parseVar()
      else err("expected ?var or (?vars) after VALUES")
      if (vars.isEmpty) err("VALUES needs ≥1 variable")
      skipWs()
      if (peek != '{') err("expected '{' to open the VALUES data block")
      pos += 1
      def parseValueTerm(): String = {
        skipWs()
        if (in.regionMatches(true, pos, "UNDEF", 0, 5) &&
            (pos + 5 >= n || !in.charAt(pos + 5).isLetterOrDigit)) {
          pos += 5
          return null // UNDEF cell: compatible with anything (§10.2.2)
        }
        peek match {
          case '<' => parseIriRef()
          case '"' | '\'' => parseLiteral()
          case c if c.isDigit || c == '-' =>
            val start = pos
            if (peek == '-') pos += 1
            while (pos < n && (in.charAt(pos).isDigit || in.charAt(pos) == '.')) pos += 1
            in.substring(start, pos)
          case _ => parsePName()
        }
      }
      val rows = ArrayBuffer[List[String]]()
      skipWs()
      while (peek != '}') {
        if (pos >= n) err("unterminated VALUES block")
        if (rowForm) {
          expect('(')
          val row = ArrayBuffer[String]()
          while ({ skipWs(); peek != ')' }) row += parseValueTerm()
          pos += 1
          if (row.length != vars.length)
            err(s"VALUES row arity ${row.length} != ${vars.length} variables")
          rows += row.toList
        } else rows += List(parseValueTerm())
        skipWs()
      }
      pos += 1
      if (rows.isEmpty) err("empty VALUES data block")
      ValuesBlock(vars.toList, rows.toList)
    }

    /** Lookahead: is the '{' at `pos` followed by SELECT (a subquery)? */
    private def selectAhead(): Boolean = {
      var p = pos + 1
      while (p < n && in.charAt(p).isWhitespace) p += 1
      in.regionMatches(true, p, "SELECT", 0, 6) &&
        (p + 6 >= n || !in.charAt(p + 6).isLetterOrDigit)
    }

    /** Lookahead: NOT followed by EXISTS (vs a future NOT IN operand). */
    private def notExistsAhead(): Boolean = {
      skipWs()
      if (!in.regionMatches(true, pos, "NOT", 0, 3)) return false
      var p = pos + 3
      if (p < n && in.charAt(p).isLetterOrDigit) return false
      while (p < n && in.charAt(p).isWhitespace) p += 1
      in.regionMatches(true, p, "EXISTS", 0, 6) &&
        (p + 6 >= n || !in.charAt(p + 6).isLetterOrDigit)
    }

    /** Extract the balanced `{ … }` at `pos` (quote- and comment-aware),
      * leaving `pos` after the closing brace; returns the inner text. */
    private def extractBraced(): String = {
      val start = pos
      var depth = 0
      while (pos < n) {
        val c = in.charAt(pos)
        if (c == '"' || c == '\'') { pos += 1; parseLiteral0(c) }
        else if (c == '<') {
          // skip a well-formed IRI ref — its '#' is a fragment, not a
          // comment (FROM <urn:g#> inside a subquery). A '<' that is a
          // comparison operator never reaches '>' before whitespace or a
          // brace, so it falls through to ordinary scanning.
          var j = pos + 1
          while (j < n && in.charAt(j) != '>' &&
            !" \t\n\r{}<\"'".contains(in.charAt(j))) j += 1
          if (j < n && in.charAt(j) == '>') pos = j + 1 else pos += 1
        }
        else if (c == '#') { while (pos < n && in.charAt(pos) != '\n') pos += 1 }
        else {
          if (c == '{') depth += 1
          else if (c == '}') {
            depth -= 1
            if (depth == 0) { pos += 1; return in.substring(start + 1, pos - 1) }
          }
          pos += 1
        }
      }
      err("unterminated group")
    }

    /** Skip a quoted literal body whose OPEN quote was already consumed —
      * brace counting must not see braces inside strings. */
    private def parseLiteral0(quote: Char): Unit = {
      while (pos < n && in.charAt(pos) != quote) {
        if (in.charAt(pos) == '\\' && pos + 1 < n) pos += 2 else pos += 1
      }
      pos += 1
    }

    /** `{ SELECT … }` at `pos`: re-parse the inner text with a fresh
      * Parser seeded with the outer PREFIX declarations (a subquery is a
      * complete query per §18.2.1 — modifiers, aggregates and all, and a
      * deeper subquery re-enters this path in the inner parser, so
      * nesting recurses naturally). */
    private def parseSubSelect(): Query = {
      val inner = extractBraced()
      val prologue = prefixes.map { case (name, iri) =>
        s"PREFIX $name: <$iri>"
      }.mkString("", "\n", "\n")
      new Parser(prologue + inner).parseQuery()
    }

    /** Name the gap explicitly: these SPARQL 1.1 constructs are dead
      * surface for the reference's usage (SURVEY.md §2.8) and rejected
      * with a clear message rather than a confusing parse error. */
    /** `FROM <g>` / `FROM NAMED <g>` dataset clauses (§13.2): FROM
      * graphs MERGE into the query's default graph; FROM NAMED
      * enumerates the graphs visible to GRAPH. Presence of either makes
      * the dataset exactly what is listed (an unlisted side is empty). */
    private def parseDatasetClauses(): (List[String], List[String]) = {
      val dflt = ArrayBuffer[String]()
      val named = ArrayBuffer[String]()
      while (kw("FROM")) {
        val isNamed = kw("NAMED")
        skipWs()
        val iri =
          if (peek == '<') parseIriRef()
          else if (peek.isLetter || peek == '_') parsePName()
          else err("FROM needs an IRI")
        if (isNamed) named += iri else dflt += iri
      }
      (dflt.toList, named.toList)
    }

    private def rejectUnsupported(): Unit = {
      val unsupported = Seq("SERVICE")
      unsupported.foreach { kw =>
        if (in.regionMatches(true, pos, kw, 0, kw.length) &&
            (pos + kw.length >= n || !in.charAt(pos + kw.length).isLetterOrDigit))
          err(s"$kw is outside the supported SPARQL subset " +
            "(basic graph patterns, property paths, blank nodes, FILTER, " +
            "nested OPTIONAL/UNION/groups, GRAPH, MINUS, VALUES, BIND, " +
            "aggregates, subqueries; see SURVEY.md §2.8)")
      }
    }

    // ---- BIND expressions -----------------------------------------------
    // addExpr := mulExpr (('+'|'-') mulExpr)* ;
    // mulExpr := primary (('*'|'/') primary)*
    // primary := ?var | "str" | <iri> | pname | integer | builtin(…) | (expr)
    // All four operators parse (division landed round 10, q134). SPARQL
    // §17.3 integer ÷ integer → xsd:decimal: exact for integral quotients
    // (decimal-typed long division), xsd:double approximation otherwise —
    // see BgpPlanner's BArith '/' case for the full semantics note.
    private def parseBindExpr(): BExpr = parseBindAdd()

    private def parseBindAdd(): BExpr = {
      var e = parseBindMul()
      var more = true
      while (more) {
        skipWs()
        if (peek == '+') { pos += 1; e = BArith(e, '+', parseBindMul()) }
        else if (peek == '-') { pos += 1; e = BArith(e, '-', parseBindMul()) }
        else more = false
      }
      e
    }

    private def parseBindMul(): BExpr = {
      var e = parseBindPrimary()
      var more = true
      while (more) {
        skipWs()
        if (peek == '*') { pos += 1; e = BArith(e, '*', parseBindPrimary()) }
        else if (peek == '/') { pos += 1; e = BArith(e, '/', parseBindPrimary()) }
        else more = false
      }
      e
    }

    // builtin families dispatched by lookahead (kwAhead, then consumed)
    private val NumFns = Seq("ABS", "CEIL", "FLOOR", "ROUND")
    private val HashFns = Seq("MD5", "SHA1", "SHA256")
    private val DtFns =
      Seq("YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS",
        "TIMEZONE", "TZ")

    private def parseBindPrimary(): BExpr = {
      skipWs()
      if (kw("CONCAT")) {
        expect('(')
        val args = ArrayBuffer[BExpr](parseBindExpr())
        while ({ skipWs(); peek == ',' }) { pos += 1; args += parseBindExpr() }
        expect(')')
        BConcat(args.toList)
      } else if (kw("COALESCE")) {
        expect('(')
        val args = ArrayBuffer[BExpr](parseBindExpr())
        while ({ skipWs(); peek == ',' }) { pos += 1; args += parseBindExpr() }
        expect(')')
        BCoalesce(args.toList)
      } else if (kw("IF")) {
        expect('(')
        val c = parseOrExpr()
        skipWs(); expect(',')
        val t = parseBindExpr()
        skipWs(); expect(',')
        val e = parseBindExpr()
        expect(')')
        BIf(c, t, e)
      } else if (kw("STRAFTER")) {
        expect('('); val a = parseBindExpr(); expect(','); val s = parseStrArg()
        expect(')'); BStrCut(a, s, after = true)
      } else if (kw("STRBEFORE")) {
        expect('('); val a = parseBindExpr(); expect(','); val s = parseStrArg()
        expect(')'); BStrCut(a, s, after = false)
      } else if (kw("STRLEN")) {
        expect('('); val a = parseBindExpr(); expect(')'); BStrFn("STRLEN", a)
      } else if (kw("SUBSTR")) {
        expect('('); val a = parseBindExpr(); expect(',')
        val start = parseInt()
        if (start < 1) err("SUBSTR start is 1-based (XPath fn:substring)")
        skipWs()
        val len = if (peek == ',') { pos += 1; Some(parseInt()) } else None
        expect(')'); BSubstr(a, start, len)
      } else if (kw("REPLACE")) {
        expect('('); val a = parseBindExpr(); expect(',')
        val pat = parseStrArg(); expect(','); val rep = parseStrArg()
        skipWs()
        if (peek == ',') err("REPLACE flags argument is outside the " +
          "supported subset (use inline (?i) forms of the portable regex subset)")
        expect(')'); BReplace(a, pat, rep)
      } else if (kw("UCASE")) {
        expect('('); val a = parseBindExpr(); expect(')'); BStrFn("UCASE", a)
      } else if (kw("LCASE")) {
        expect('('); val a = parseBindExpr(); expect(')'); BStrFn("LCASE", a)
      } else if (kw("ENCODE_FOR_URI")) {
        expect('('); val a = parseBindExpr(); expect(')'); BEncodeUri(a)
      } else if (kw("STR")) {
        expect('('); val a = parseBindExpr(); expect(')'); BStrFn("STR", a)
      } else if (kw("LANG")) {
        expect('('); val a = parseBindExpr(); expect(')'); BStrFn("LANG", a)
      } else if (kw("DATATYPE")) {
        expect('('); val a = parseBindExpr(); expect(')')
        BStrFn("DATATYPE", a)
      } else if (kw("STRLANG")) {
        expect('('); val a = parseBindExpr(); expect(',')
        val t = parseBindExpr(); expect(')'); BStrLang(a, t)
      } else if (kw("STRDT")) {
        expect('('); val a = parseBindExpr(); expect(',')
        val d = parseBindExpr(); expect(')'); BStrDt(a, d)
      } else if (NumFns.exists(kwAhead)) {
        val fn = NumFns.find(kwAhead).get; kw(fn)
        expect('('); val a = parseBindExpr(); expect(')'); BNumFn(fn, a)
      } else if (HashFns.exists(kwAhead)) {
        val fn = HashFns.find(kwAhead).get; kw(fn)
        expect('('); val a = parseBindExpr(); expect(')'); BHashFn(fn, a)
      } else if (DtFns.exists(kwAhead)) {
        val fn = DtFns.find(kwAhead).get; kw(fn)
        expect('('); val a = parseBindExpr(); expect(')'); BDtFn(fn, a)
      } else peek match {
        case '?' | '$' => BVar(parseVar())
        case '"' | '\'' => BLit(parseLiteral())
        case '<' => BLit(parseIriRef())
        case '(' => pos += 1; val e = parseBindExpr(); expect(')'); e
        case c if c.isDigit || c == '-' =>
          val start = pos
          if (peek == '-') pos += 1
          while (pos < n && in.charAt(pos).isDigit) pos += 1
          if (pos < n && in.charAt(pos) == '.')
            err("decimal literals in BIND arithmetic are outside the " +
              "supported subset (integer arithmetic only)")
          if (pos == start || !in.substring(start, pos).exists(_.isDigit))
            err("expected integer literal")
          BLit(in.substring(start, pos))
        case _ => BLit(parsePName())
      }
    }

    // ---- FILTER expressions ---------------------------------------------
    // Precedence: || < && < ! < (comparison | builtin | parens), per the
    // SPARQL 1.1 grammar's ConditionalOrExpression chain.
    private def parseFilter(): FExpr = {
      skipWs()
      if (peek == '(') { pos += 1; val e = parseOrExpr(); expect(')'); e }
      else parseBuiltinOrRel() // `FILTER regex(?v, "…")` builtin-call form
    }

    private def expect(c: Char): Unit = {
      skipWs()
      if (peek != c) err(s"expected '$c'")
      pos += 1
    }

    private def parseOrExpr(): FExpr = {
      var e = parseAndExpr()
      skipWs()
      while (in.startsWith("||", pos)) { pos += 2; e = FOr(e, parseAndExpr()); skipWs() }
      e
    }

    private def parseAndExpr(): FExpr = {
      var e = parseUnaryExpr()
      skipWs()
      while (in.startsWith("&&", pos)) { pos += 2; e = FAnd(e, parseUnaryExpr()); skipWs() }
      e
    }

    private def parseUnaryExpr(): FExpr = {
      skipWs()
      if (peek == '!' && !in.startsWith("!=", pos)) { pos += 1; FNot(parseUnaryExpr()) }
      else if (peek == '(') { pos += 1; val e = parseOrExpr(); expect(')'); e }
      else parseBuiltinOrRel()
    }

    private def parseBuiltinOrRel(): FExpr = {
      skipWs()
      if ((in.regionMatches(true, pos, "EXISTS", 0, 6) &&
            (pos + 6 >= n || !in.charAt(pos + 6).isLetterOrDigit)) ||
          notExistsAhead())
        err("EXISTS/NOT EXISTS must be the whole FILTER constraint " +
          "(FILTER EXISTS { … }) — it is a pattern semi/anti-join, which " +
          "has no boolean-expression form in this subset")
      if (kw("REGEX")) {
        expect('('); val v = parseVarArg()
        expect(','); val pat = parseStrArg()
        skipWs()
        val flags = if (peek == ',') { pos += 1; parseStrArg() } else ""
        expect(')')
        FRegex(v, pat, flags)
      } else if (kw("CONTAINS")) {
        expect('('); val v = parseVarArg(); expect(','); val s = parseStrArg()
        expect(')'); FContains(v, s)
      } else if (kw("STRSTARTS")) {
        expect('('); val v = parseVarArg(); expect(','); val s = parseStrArg()
        expect(')'); FStrStarts(v, s)
      } else if (kw("STRENDS")) {
        expect('('); val v = parseVarArg(); expect(','); val s = parseStrArg()
        expect(')'); FStrEnds(v, s)
      } else if (kw("LANGMATCHES")) {
        // §17.4.3.1 — both args are expressions (canonically
        // LANGMATCHES(LANG(?v), "en"))
        expect('('); val a = parseBindExpr(); expect(',')
        val r = parseBindExpr(); expect(')')
        FLangMatches(a, r)
      } else if (kw("BOUND")) {
        expect('('); val v = parseVarArg(); expect(')'); FBound(v)
      } else if (kw("SAMETERM")) {
        // §17.4.1.8 — term identity. The quads encoding is lexical, so
        // identity IS codepoint equality, with NO numeric-dispatch
        // promotion (sameTerm("01", "1") is false where `=` is true).
        expect('('); val l = parseOperand()
        expect(','); val r = parseOperand(); expect(')')
        FSameTerm(l, r)
      } else if (kw("ISBLANK")) {
        expect('('); val v = parseVarArg(); expect(')'); FIsBlank(v)
      } else if (kw("ISNUMERIC")) {
        expect('('); val v = parseVarArg(); expect(')'); FIsNumeric(v)
      } else if (kw("ISIRI") || kw("ISURI")) {
        // supported since round 13: quoted string-literal encoding makes
        // the IRI/literal distinction decidable from the stored bytes
        expect('('); val v = parseVarArg(); expect(')'); FIsIri(v)
      } else if (kw("ISLITERAL")) {
        expect('('); val v = parseVarArg(); expect(')'); FIsLiteral(v)
      } else {
        val l = parseOperand()
        skipWs()
        if (kw("IN")) FIn(l, parseInList(), negated = false)
        else if (in.regionMatches(true, pos, "NOT", 0, 3) &&
            (pos + 3 >= n || !in.charAt(pos + 3).isLetterOrDigit)) {
          kw("NOT")
          if (!kw("IN")) err("expected IN after NOT")
          FIn(l, parseInList(), negated = true)
        } else {
          val op = parseCmpOp()
          val r = parseOperand()
          FCmp(l, op, r)
        }
      }
    }

    /** `( operand, operand, … )` — the value list of IN / NOT IN. */
    private def parseInList(): List[FOperand] = {
      expect('(')
      val vals = ArrayBuffer[FOperand](parseOperand())
      while ({ skipWs(); peek == ',' }) { pos += 1; vals += parseOperand() }
      expect(')')
      vals.toList
    }

    private def parseVarArg(): String = {
      skipWs()
      if (peek != '?' && peek != '$') err("expected a variable argument")
      parseVar()
    }

    private def parseStrArg(): String = {
      skipWs()
      if (peek != '"' && peek != '\'') err("expected a string literal argument")
      // LEXICAL position (regex patterns, CONTAINS needles, SEPARATOR):
      // strip the round-13 term encoding — these are not term operands
      graft.RdfTerms.lexicalOf(parseLiteral())
    }

    /** In OPERAND position `<` introduces an IRIREF; the less-than
      * OPERATOR only occurs in [[parseCmpOp]] position — no ambiguity.
      * An aggregate call operand (`HAVING(COUNT(?x) > 5)`) synthesizes an
      * internal aggregate and stands in as its alias variable. */
    private def parseOperand(): FOperand = {
      skipWs()
      val aggAhead = Seq("COUNT", "SUM", "MIN", "MAX", "AVG").exists { f =>
        in.regionMatches(true, pos, f, 0, f.length) && {
          var p = pos + f.length
          while (p < n && in.charAt(p).isWhitespace) p += 1
          p < n && in.charAt(p) == '('
        }
      }
      if (aggAhead) {
        val a = parseAggCall()
        haggCounter += 1
        val alias = s"_hagg$haggCounter"
        aggs += a.copy(alias = alias)
        return FVar(alias)
      }
      // a builtin call is a full operand: FILTER(STRLEN(?x) > 3),
      // FILTER(ABS(?b) >= 10), FILTER(MONTH(?t) = 3)
      val builtinAhead = Seq("CONCAT", "STRLEN", "STRAFTER", "STRBEFORE",
        "SUBSTR", "REPLACE", "UCASE", "LCASE", "COALESCE", "STR",
        "LANG", "DATATYPE", "STRLANG", "STRDT",
        "ENCODE_FOR_URI", "ABS", "CEIL", "FLOOR", "ROUND",
        "MD5", "SHA1", "SHA256",
        "YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS",
        "TIMEZONE", "TZ").exists { f =>
        in.regionMatches(true, pos, f, 0, f.length) && {
          var p = pos + f.length
          while (p < n && in.charAt(p).isWhitespace) p += 1
          p < n && in.charAt(p) == '('
        }
      }
      if (builtinAhead) return FBindOp(parseBindExpr())
      peek match {
        case '?' | '$' => FVar(parseVar())
        case '<' => FIriRef(parseIriRef())
        case '"' | '\'' =>
          // `"5"^^xsd:integer` normalizes to the bare shorthand and
          // numeric-DISPATCHES like the literal 5 (§17.3 operator
          // mapping); a non-reconstructible typed/tagged literal stays
          // encoded and compares as a TERM (codepoint equality — `=` is
          // term-true, `<` lexical, the documented approximation).
          val (enc, dt) = parseLiteralTracked()
          val numericDt = dt.exists(d => d == graft.RdfTerms.XsdInteger ||
            d == graft.RdfTerms.XsdDecimal || d == graft.RdfTerms.XsdDouble)
          if (numericDt && !enc.startsWith("\"")) FNum(enc) else FStr(enc)
        case c if c.isDigit || c == '-' || c == '+' =>
          val start = pos
          if (peek == '-' || peek == '+') pos += 1
          while (pos < n && (in.charAt(pos).isDigit || in.charAt(pos) == '.')) pos += 1
          if (pos == start || !in.substring(start, pos).exists(_.isDigit))
            err("expected numeric literal")
          FNum(in.substring(start, pos))
        case _ => FIriRef(parsePName())
      }
    }

    private def parseCmpOp(): String = {
      skipWs()
      val two = Seq("<=", ">=", "!=")
      two.find(op => in.startsWith(op, pos)) match {
        case Some(op) => pos += 2; op
        case None =>
          peek match {
            case '<' => pos += 1; "<"
            case '>' => pos += 1; ">"
            case '=' => pos += 1; "="
            case _ => err("expected comparison operator (< <= > >= = !=)")
          }
      }
    }

    private def freshAnon(): Term = { anonCounter += 1; V(s"_anon$anonCounter") }

    private def parseTermNode(patterns: ArrayBuffer[TriplePattern]): Term = {
      skipWs()
      peek match {
        case '?' | '$' => V(parseVar())
        case '<' => I(parseIriRef())
        case '"' | '\'' => L(parseLiteral())
        case '[' =>
          pos += 1
          val v = freshAnon()
          skipWs()
          if (peek != ']') parsePredicateObjectList(v, patterns)
          skipWs()
          if (peek != ']') err("expected ']'")
          pos += 1
          v
        case c if c.isDigit => // numeric literal
          val start = pos
          while (pos < n && (in.charAt(pos).isDigit || in.charAt(pos) == '.')) pos += 1
          var tok = in.substring(start, pos)
          if (tok.endsWith(".")) { tok = tok.dropRight(1); pos -= 1 }
          L(tok)
        case _ => I(parsePName())
      }
    }

    /** `'^'? iri` — one alternative element (no modifier here: SPARQL
      * modifiers bind tighter than `|`, so a per-element modifier inside
      * an alternative set is ambiguous with the shared-modifier form we
      * support and is rejected loudly where it occurs). */
    private def parseAltElt(): (String, Boolean) = {
      skipWs()
      val inv = peek == '^'
      if (inv) { pos += 1; skipWs() }
      val iri = if (peek == '<') parseIriRef() else parsePName()
      (iri, inv)
    }

    /** Path modifier — only when ADJACENT to the path element ('?' with
      * intervening whitespace starts the object variable, not a
      * zero-or-one modifier; parseStep calls this without skipWs). */
    private def parseMod(): Char =
      if (peek == '*') { pos += 1; '*' }
      else if (peek == '+') { pos += 1; '+' }
      else if (peek == '?') { pos += 1; '?' }
      else ' '

    /** Alternative list inside parens (shared by `(p|^q)` and `!(p|^q)`):
      * per-element modifiers rejected loudly, closing paren consumed. */
    private def parseAltGroup(): List[(String, Boolean)] = {
      val alts = ArrayBuffer[(String, Boolean)]()
      alts += parseAltElt()
      if (peek == '*' || peek == '+' || peek == '?')
        err("per-alternative modifiers are outside the supported subset; " +
          "apply the modifier to the whole group: (p|q)*")
      skipWs()
      while (peek == '|') {
        pos += 1; alts += parseAltElt()
        if (peek == '*' || peek == '+' || peek == '?')
          err("per-alternative modifiers are outside the supported subset; " +
            "apply the modifier to the whole group: (p|q)*")
        skipWs()
      }
      expect(')')
      alts.toList
    }

    /** One sequence element: `(alt|alt|…)mod`, `^?iri mod`, or a negated
      * property set `!iri`, `!^iri`, `!(alt|alt|…)` with optional mod. */
    private def parseStep(): Step = {
      skipWs()
      if (peek == '!') {
        pos += 1
        skipWs()
        val alts =
          if (peek == '(') { pos += 1; parseAltGroup() }
          else List(parseAltElt())
        Step(alts, parseMod(), negated = true)
      } else if (peek == '(') {
        pos += 1
        Step(parseAltGroup(), parseMod())
      } else {
        val (iri, inv) = parseAltElt()
        Step(List((iri, inv)), parseMod())
      }
    }

    private def parsePath(): List[Step] = {
      skipWs()
      if (peek == 'a' && pos + 1 < n && !nameChar(in.charAt(pos + 1)) && in.charAt(pos + 1) != ':') {
        pos += 1
        return List(Step(Model.RdfType, star = false))
      }
      // VARIABLE verb (grammar: Verb ::= VarOrIri | Path) — a var can
      // never be a Path element, so modifier/sequence syntax directly
      // after it is rejected loudly rather than mis-parsed
      if (peek == '?' || peek == '$') {
        val v = parseVar()
        if (pos < n && "*+/|^".contains(in.charAt(pos)))
          err(s"property-path syntax after variable predicate ?$v — the " +
            "SPARQL Path grammar has no variables (§9.1); use an IRI path " +
            "or a plain variable verb")
        return List(Step(Nil, ' ', negated = false, varName = Some(v)))
      }
      val steps = ArrayBuffer[Step]()
      var more = true
      while (more) {
        steps += parseStep()
        skipWs()
        if (peek == '/') { pos += 1 }
        else if (peek == '|') {
          // bare top-level alternative `p|^q|r`: supported only as the
          // WHOLE path over modifier-free single steps — anything mixing
          // `|` with `/` or modifiers must parenthesize, because SPARQL's
          // `|`-binds-loosest precedence would otherwise silently diverge
          // from a merged reading
          if (steps.length > 1 || steps.head.mod != ' ')
            err("parenthesize path alternatives used with sequences or " +
              "modifiers: (p|q) or (p|q)*")
          if (steps.head.negated)
            err("alternatives over a negated property set (!p|q) are " +
              "outside the supported subset; negate one whole set: !(p|q)")
          val alts = ArrayBuffer(steps.head.alts: _*)
          while (peek == '|') {
            pos += 1; skipWs()
            if (peek == '!')
              err("alternatives over a negated property set (p|!q) are " +
                "outside the supported subset; negate one whole set: !(p|q)")
            alts += parseAltElt()
            if (peek == '*' || peek == '+' || peek == '?')
              err("parenthesize path alternatives used with modifiers: (p|q)*")
            skipWs()
          }
          if (peek == '/')
            err("parenthesize path alternatives inside sequences: (p|q)/r")
          steps(0) = Step(alts.toList, ' ')
          more = false
        } else more = false
      }
      steps.toList
    }

    private def parsePredicateObjectList(subject: Term, patterns: ArrayBuffer[TriplePattern]): Unit = {
      var more = true
      while (more) {
        val path = parsePath()
        var moreObjects = true
        while (moreObjects) {
          val o = parseTermNode(patterns)
          patterns += TriplePattern(subject, path, o)
          skipWs()
          if (peek == ',') { pos += 1 } else moreObjects = false
        }
        skipWs()
        if (peek == ';') {
          while (peek == ';') { pos += 1; skipWs() }
          more = peek != '.' && peek != '}' && peek != ']'
        } else more = false
      }
    }

    private def parseTriplesSameSubject(patterns: ArrayBuffer[TriplePattern]): Unit = {
      val s = parseTermNode(patterns)
      skipWs()
      if (peek == '.' || peek == '}') return // bare blank-node statement
      parsePredicateObjectList(s, patterns)
    }
  }
}
