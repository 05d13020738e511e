package graft

import graft.engine.SchemaMatch
import org.scalatest.funsuite.AnyFunSuite

/** Pins SchemaMatch.ratio to Python difflib.SequenceMatcher.ratio() values
  * (generated offline from CPython difflib) — the reference's matcher
  * (transformations_code.py:11-35).
  */
class SchemaMatchSpec extends AnyFunSuite {

  val difflibPinned: Seq[(String, String, Double)] = Seq(
    ("first name", "first_name", 0.9),
    ("first name", "c_name", 0.5),
    ("last name", "last_name", 0.8888888888888888),
    ("dob", "date_of_birth", 0.375),
    ("dob", "dob", 1.0),
    ("birthdate", "birth_date", 0.9473684210526315),
    ("c_custkey", "o_custkey", 0.8888888888888888),
    ("c_custkey", "o_orderkey", 0.42105263157894735),
    ("abc", "xyz", 0.0),
    ("customer_id", "customer_id", 1.0),
    ("customer_id", "cust_id", 0.7777777777777778),
    ("order date", "o_orderdate", 0.8571428571428571),
  )

  test("ratio matches difflib.SequenceMatcher exactly") {
    difflibPinned.foreach { case (a, b, expected) =>
      assert(math.abs(SchemaMatch.ratio(a, b) - expected) < 1e-12,
        s"ratio($a, $b)")
    }
  }

  test("findSimilarColumn: best match above cutoff, original spelling") {
    assert(SchemaMatch.findSimilarColumn(
      "first name", Seq("fname", "First_Name", "id"), 0.6) == Some("First_Name"))
    assert(SchemaMatch.findSimilarColumn("first name", Seq("id", "total"), 0.6).isEmpty)
    // difflib breaks ratio ties to the lexicographically LARGER
    // lowercased candidate (heapq.nlargest over (ratio, name) tuples) —
    // verified against CPython: get_close_matches("ab", ["abc","abd"])
    // returns "abd" in either input order
    assert(SchemaMatch.findSimilarColumn(
      "ab", Seq("abc", "abd"), 0.6) == Some("abd"))
    assert(SchemaMatch.findSimilarColumn(
      "ab", Seq("abd", "abc"), 0.6) == Some("abd"))
    // winner maps back to the first ORIGINAL spelling
    assert(SchemaMatch.findSimilarColumn(
      "ab", Seq("ABD", "abd"), 0.6) == Some("ABD"))
    // ARGUMENT ORDER parity (code-review r13): the matching-blocks
    // ratio is asymmetric and get_close_matches computes
    // ratio(candidate, target); ratio("dcd","cbd") = 1/3 but
    // ratio("cbd","dcd") = 2/3, so the swapped order used to return
    // Some("dcd") here where CPython difflib returns no match
    assert(SchemaMatch.findSimilarColumn("cbd", Seq("d", "dcd"), 0.6).isEmpty)
    assert(SchemaMatch.findSimilarColumn("bd", Seq("dbcd"), 0.5).isEmpty)
  }

  test("isDateColumn: contains 'date' or fuzzy-matches synonyms") {
    assert(SchemaMatch.isDateColumn("order_date"))
    assert(SchemaMatch.isDateColumn("DateOfBirth"))
    assert(SchemaMatch.isDateColumn("dob"))          // exact synonym, ratio 1.0
    assert(SchemaMatch.isDateColumn("birth_date"))   // contains "date"
    assert(SchemaMatch.isDateColumn("birthdate"))
    assert(!SchemaMatch.isDateColumn("amount"))
    assert(!SchemaMatch.isDateColumn("customer_id"))
  }

  test("nameSimilarity: exact case-insensitive match scores 1.0") {
    assert(SchemaMatch.nameSimilarity("Customer_ID", "customer_id") == 1.0)
    assert(SchemaMatch.nameSimilarity("c_custkey", "o_custkey") >= 0.8)
    assert(SchemaMatch.nameSimilarity("c_custkey", "o_orderkey") < 0.8)
  }
}
