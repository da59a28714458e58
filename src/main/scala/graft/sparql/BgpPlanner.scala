package graft.sparql

import graft.plans.Closure
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Basic-graph-pattern planner: SPARQL subset AST → DataFrame plan.
  *
  * Replaces the opaque oxigraph BGP evaluation the reference delegates to
  * (reference: mortar-parquet-client/client.py:42,52). Each triple pattern
  * becomes a filtered projection of the quads table; shared variables become
  * equi-joins; `p*` steps become reflexive-transitive closure relations.
  *
  * Planner-level optimization (SURVEY.md §4): patterns are joined most-
  * selective-first (most constant terms bound), always extending the current
  * join tree through a shared variable when one exists; Catalyst then picks
  * the physical join (these relations are graph-sized → broadcast hash
  * joins, no sort-merge shuffles).
  *
  * Set semantics: per-pattern solutions are DISTINCT mappings (SPARQL BGP
  * matching is over a set of triples); the final SELECT projection keeps
  * duplicates unless DISTINCT — both faithful to rdflib's behavior.
  */
object BgpPlanner {

  import Sparql._

  private final case class Atom(s: Term, p: String, star: Boolean, o: Term) {
    def vars: Seq[String] = Seq(s, o).collect { case V(n) => n }
    def constCount: Int = Seq(s, o).count { case V(_) => false; case _ => true }
  }

  /** Internal column name for a variable (avoids collision with the quads
    * table's own `s`/`p`/`o`/`graph` columns). */
  private def vc(name: String): String = "v_" + name

  /** Evaluate `q` over `quads` ((graph,s,p,o) strings). `graph`=None means
    * default-union semantics (reference: setup-graphs.py:14). */
  def evaluate(quads: DataFrame, q: Query, graph: Option[String] = None): DataFrame = {
    // Graph scoping. Under union, the same triple may live in several named
    // graphs (the reference merges the ontology into EVERY graph,
    // setup-graphs.py:22) — union semantics are set semantics, so dedup.
    val scoped = graph match {
      case Some(g) => quads.filter(col("graph") === g).select("s", "p", "o")
      case None => quads.select("s", "p", "o").distinct()
    }
    evaluateTriples(scoped, q)
  }

  /** Evaluate over an already graph-scoped, deduplicated (s,p,o) relation.
    * Callers issuing many queries should cache that relation once (see
    * Engine) — every triple pattern re-reads it, and re-running the
    * scope+distinct per atom is the planner's only repeated subtree. */
  def evaluateTriples(scoped: DataFrame, q: Query): DataFrame = {
    val spark = scoped.sparkSession
    var pathCounter = 0
    def freshPathVar(): Term = { pathCounter += 1; V(s"_path$pathCounter") }

    // Expand property paths into single-step atoms with fresh join vars.
    val atoms: List[Atom] = q.patterns.flatMap { tp =>
      val hops = tp.path.zipWithIndex.map { case (step, i) =>
        val isLast = i == tp.path.length - 1
        (step, isLast)
      }
      var subj: Term = tp.s
      hops.map { case (step, isLast) =>
        val obj = if (isLast) tp.o else freshPathVar()
        val a = Atom(subj, step.iri, step.star, obj)
        subj = obj
        a
      }
    }

    // Closure relations, one per starred predicate (reused across atoms).
    lazy val allTerms = scoped.select(col("s").as("t"))
      .union(scoped.select(col("o").as("t"))).distinct()
    val closures = scala.collection.mutable.Map[String, DataFrame]()
    def closureFor(p: String): DataFrame = closures.getOrElseUpdate(p, {
      val edges = scoped.filter(col("p") === p)
        .select(col("s").as("src"), col("o").as("dst"))
      Closure.withIdentity(Closure.transitive(edges), allTerms)
    })

    /** Star atom with a constant endpoint: targeted BFS from the constant
      * instead of the full pairwise closure — the selective form a query
      * like `?x subClassOf* brick:Point` actually needs. */
    def targetedStar(p: String, const: String, constIsObject: Boolean): DataFrame = {
      val edges = scoped.filter(col("p") === p)
        .select(col("s").as("src"), col("o").as("dst"))
      val reached = graft.plans.Closure.reachableFrom(edges, const, reverse = constIsObject)
      val spark2 = scoped.sparkSession
      import spark2.implicits._
      val withSelf = reached.select(col("node"))
        .union(Seq(const).toDF("node")).distinct() // zero-length path
      if (constIsObject)
        withSelf.select(col("node").as("as"), lit(const).as("ao"))
      else
        withSelf.select(lit(const).as("as"), col("node").as("ao"))
    }

    def atomDF(a: Atom): Option[DataFrame] = {
      val rel =
        if (a.star) (a.s, a.o) match {
          case (V(_), I(c)) => targetedStar(a.p, c, constIsObject = true)
          case (V(_), L(c)) => targetedStar(a.p, c, constIsObject = true)
          case (I(c), _) => targetedStar(a.p, c, constIsObject = false)
          case (L(c), _) => targetedStar(a.p, c, constIsObject = false)
          case _ => closureFor(a.p).toDF("as", "ao")
        }
        else scoped.filter(col("p") === a.p).select(col("s").as("as"), col("o").as("ao"))
      val filtered = (a.s, a.o) match {
        case (V(x), V(y)) if x == y => rel.filter(col("as") === col("ao"))
        case _ =>
          var r = rel
          a.s match { case V(_) => (); case I(i) => r = r.filter(col("as") === i); case L(l) => r = r.filter(col("as") === l) }
          a.o match { case V(_) => (); case I(i) => r = r.filter(col("ao") === i); case L(l) => r = r.filter(col("ao") === l) }
          r
      }
      (a.s, a.o) match {
        case (V(x), V(y)) if x == y => Some(filtered.select(col("as").as(vc(x))).distinct())
        case (V(x), V(y)) => Some(filtered.select(col("as").as(vc(x)), col("ao").as(vc(y))).distinct())
        case (V(x), _) => Some(filtered.select(col("as").as(vc(x))).distinct())
        case (_, V(y)) => Some(filtered.select(col("ao").as(vc(y))).distinct())
        case _ =>
          // fully-ground pattern: existence test
          if (filtered.isEmpty) None else Some(spark.emptyDataFrame.withColumn("_one", lit(1)).limit(0))
      }
    }

    // Ground atoms that fail their existence test empty the whole result.
    val dfs = new scala.collection.mutable.ArrayBuffer[(Atom, DataFrame)]()
    var failed = false
    atoms.foreach { a =>
      if (!failed) {
        if (a.vars.isEmpty) { if (atomDF(a).isEmpty) failed = true }
        else dfs += ((a, atomDF(a).get))
      }
    }

    val selected = q.selected
    if (failed || dfs.isEmpty) {
      return spark.range(0)
        .select(selected.map(v => lit(null).cast("string").as(v)): _*)
    }

    // Greedy selectivity-ordered join.
    val pending = dfs.sortBy { case (a, _) => -a.constCount }.to(scala.collection.mutable.ListBuffer)
    var (firstAtom, acc) = pending.remove(0)
    var accCols = acc.columns.toSet
    while (pending.nonEmpty) {
      val idx = pending.indexWhere { case (_, d) => d.columns.exists(accCols.contains) }
      val pick = if (idx >= 0) {
        // among connectable atoms prefer max shared vars then max constants
        val candidates = pending.zipWithIndex.filter { case ((_, d), _) => d.columns.exists(accCols.contains) }
        candidates.maxBy { case ((a, d), _) => (d.columns.count(accCols.contains), a.constCount) }._2
      } else 0
      val (a, d) = pending.remove(pick)
      val shared = d.columns.filter(accCols.contains)
      acc = if (shared.nonEmpty) acc.join(d, shared.toSeq) else acc.crossJoin(d)
      accCols ++= d.columns
    }

    val out = acc.select(selected.map(v => col(vc(v)).as(v)): _*)
    if (q.distinct) out.distinct() else out
  }
}
