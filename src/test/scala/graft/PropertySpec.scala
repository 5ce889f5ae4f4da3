package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the pure kernels — invariants that hold for ALL
  * inputs, complementing the example-based specs and the reference-parity
  * suite (which pin exact values on specific corpora).
  */
object GraftProperties extends Properties("graft") {

  private val token = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val tokens = Gen.listOf(token)

  property("simhash: invariant under token order (bag semantics)") =
    forAll(tokens) { ts =>
      val a = graft.ops.NearDup.simhashMd5Hex(ts.mkString(" "))
      val b = graft.ops.NearDup.simhashMd5Hex(scala.util.Random.shuffle(ts).mkString(" "))
      a == b && a.matches("[0-9a-f]{16}")
    }

  property("simhash: whitespace normalization does not change the value") =
    forAll(tokens) { ts =>
      graft.ops.NearDup.simhashMd5Hex(ts.mkString(" ")) ==
        graft.ops.NearDup.simhashMd5Hex("  " + ts.mkString("\t") + "\n")
    }

  private val entity = for {
    t <- Gen.oneOf("Alpha", "Beta", "Gamma", "alpha", "BETA")
    ty <- Gen.oneOf("skill", "concept", "need")
    c <- Gen.choose(0.0, 1.0)
  } yield graft.model.Entity(t, ty, c, "", "s", "", "", primary = false, 0.8)

  property("dedupEntities: unique keys, max confidence kept, members of input") =
    forAll(Gen.listOf(entity)) { es =>
      val out = graft.kg.GraphBuild.dedupEntities(es)
      val keys = out.map(e => (graft.text.PyText.lower(e.text), e.entityType))
      val uniq = keys.distinct == keys
      val maxKept = out.forall { o =>
        val group = es.filter(e =>
          graft.text.PyText.lower(e.text) == graft.text.PyText.lower(o.text) &&
            e.entityType == o.entityType)
        o.confidence == group.map(_.confidence).max
      }
      val member = out.forall(es.contains)
      uniq && maxKept && member && out.size <= es.size
    }

  private val node = for {
    id <- Gen.oneOf("n1", "n2", "n3", "n4")
    c <- Gen.choose(0.0, 1.0)
  } yield graft.model.KgNode(id, id, "skill", c, "f", "s", "", 0.8)

  private val edge = for {
    a <- Gen.oneOf("n1", "n2", "n3", "n4")
    b <- Gen.oneOf("n1", "n2", "n3", "n4")
    c <- Gen.choose(0.0, 1.0)
  } yield graft.model.KgEdge(s"e_${a}_$b", a, b, "relates_to", c, Nil, "")

  property("J9 smoothing: confidences stay within the input hull (averages of averages)") =
    forAll(Gen.listOf(node), Gen.listOf(edge)) { (ns0, es) =>
      val ns = ns0.distinctBy(_.id)
      val all = (ns.map(_.confidence) ++ es.map(_.confidence))
      val (ns2, es2) = graft.kg.GraphBuildV1.smoothConfidences(ns, es)
      if (all.isEmpty) Prop.passed
      else {
        val lo = all.min; val hi = all.max
        // untouched values (no supporting edge / no endpoints) stay as-is and
        // are themselves within the hull; every averaged value is a convex
        // combination of in-hull values
        Prop(ns2.forall(n => n.confidence >= lo - 1e-12 && n.confidence <= hi + 1e-12) &&
          es2.forall(e => e.confidence >= lo - 1e-12 && e.confidence <= hi + 1e-12))
      }
    }

  // NOTE: the reference strips '_' BEFORE the 50-char truncation
  // (graph_extraction_agent.py:705-712), so a capped result may legitimately
  // end with '_' and the function is not idempotent — the property asserts
  // exactly the reference's contract: safe charset, ≤50 chars, no LEADING
  // underscore (leading strip precedes the cap), 'unknown' fallback.
  property("F13 sanitizeKeyComponent: safe charset, capped, no leading underscore") =
    forAll(Gen.asciiPrintableStr) { s =>
      val out = graft.io.Redact.sanitizeKeyComponent(s)
      (out == "unknown" || out.matches("[a-zA-Z0-9\\-_.]{1,50}")) && !out.startsWith("_")
    }

  property("F12 redactString: idempotent and length-bounded patterns removed") =
    forAll(Gen.asciiPrintableStr) { s =>
      val once = graft.io.Redact.redactString(s)
      graft.io.Redact.redactString(once) == once
    }

  property("PyText.split: no empty tokens, count matches wordCount") =
    forAll(Gen.listOf(Gen.oneOf(token, Gen.const(" "), Gen.const(" "), Gen.const("\n")))) { parts =>
      val s = parts.mkString
      val sp = graft.text.PyText.split(s)
      sp.forall(_.nonEmpty) && sp.length == graft.text.PyText.wordCount(s)
    }

  property("simhash banding pigeonhole: hamming <= 3 pairs always share a 16-bit band") =
    forAll(Gen.long, Gen.choose(0, 3), Gen.listOfN(3, Gen.choose(0, 63))) { (base, _, flips) =>
      val other = flips.foldLeft(base)((v, b) => v ^ (1L << b)) // <=3 bits differ
      val bands = (0 until 4).map(b => ((base >>> (16 * b)) & 0xffff, (other >>> (16 * b)) & 0xffff))
      java.lang.Long.bitCount(base ^ other) > 3 || bands.exists(p => p._1 == p._2)
    }

  property("F12 redactColumn contract (driver twin): nested strings never leak an email") = {
    val email = Gen.oneOf("a@b.co", "x.y@z.org")
    forAll(Gen.listOf(Gen.oneOf(email, Gen.const("clean text")))) { parts =>
      // redactString is the same pattern chain redactColumn applies at every
      // nesting level; no element may retain a matching email
      parts.map(graft.io.Redact.redactString)
        .forall(!_.matches(".*[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}.*"))
    }
  }

  property("U5 assembly: labels unique given no pre-existing collisions among needs") =
    forAll(Gen.listOf(Gen.oneOf("T1", "T2", "T3", "")),
           Gen.listOf(Gen.oneOf("P1", "P2", "T1")),
           Gen.listOf(Gen.oneOf("X1", "P1", "T2"))) { (themes, pats, traits) =>
      val out = graft.kg.GraphBuildV1.needsHypernodes(Nil, themes, pats, traits)
      val labels = out.map(_.label)
      labels.distinct == labels // label-exclusion guarantees global uniqueness
    }
}
