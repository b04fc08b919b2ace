"""SPARQL 1.1 conformance cases, hand-transcribed from the W3C specs.

Round-14 verdict ask #3 requested running the public ``rdf-tests``
sparql11 manifests; this container has no network, so the manifests are
unreachable. These cases are the offline substitute: each is transcribed
from a documented example in the SPARQL 1.1 Query Language W3C
Recommendation (21 March 2013, https://www.w3.org/TR/sparql11-query/)
or the SPARQL 1.1 Update Recommendation
(https://www.w3.org/TR/sparql11-update/), with its section number in
``section`` so the transcription can be audited against the spec text.
The data is re-expressed in the engine's string/encoded term model
(bnodes in spec data become IRIs — the model's documented reading).

Buckets (scripts/conformance.py): **green** = engine answer matches the
spec answer; **rejected** = the engine refuses LOUDLY (feature outside
the documented subset — never a silent wrong answer); **model** = the
engine's documented term-model deviation changes the answer and the
case encodes the documented behavior (listed so the deviation stays
visible); **WRONG** = any other mismatch — must be empty.

Case shape::

    dict(id, section, kind, data, query, expect, ordered=False, note="")

kind: "select" (expect = list of dicts; values: term string, None for
unbound, or ("num", float) compared numerically), "ask" (bool),
"construct"/"describe"/"update" (expect = set of (s, p, o) result
triples), "reject" (expect SparqlError).
"""

from __future__ import annotations

XSD = "http://www.w3.org/2001/XMLSchema#"
FOAF = "http://xmlns.com/foaf/0.1/"
DC = "http://purl.org/dc/elements/1.1/"
DC10 = "http://purl.org/dc/elements/1.0/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
NS = "http://example.org/ns#"
EX = "http://example.org/"
B = "http://example.org/book/"
V = "http://www.w3.org/2001/vcard-rdf/3.0#"

PREFIXES = {
    "foaf": FOAF, "dc": DC, "dc10": DC10, "rdf": RDF, "rdfs": RDFS,
    "ns": NS, "ex": EX, "book": B, "xsd": XSD, "vcard": V,
}


def INT(n) -> str:
    return f'"{n}"^^<{XSD}integer>'


def DEC(n) -> str:
    return f'"{n}"^^<{XSD}decimal>'


def DT(lex) -> str:
    return f'"{lex}"^^<{XSD}dateTime>'


_ONE = [(EX + "x", EX + "p", EX + "y")]  # one-row scaffold for fn probes

CASES = [
    # ----------------------------------------------------- §2 basics
    dict(
        id="2.1-single-pattern", section="§2.1", kind="select",
        data=[(B + "book1", DC + "title", "SPARQL Tutorial")],
        query="SELECT ?title WHERE { book:book1 dc:title ?title }",
        expect=[{"title": "SPARQL Tutorial"}],
    ),
    dict(
        id="2.2-multiple-matches", section="§2.2", kind="select",
        data=[
            (EX + "a", FOAF + "name", "Johnny Lee Outlaw"),
            (EX + "a", FOAF + "mbox", "mailto:jlow@example.com"),
            (EX + "b", FOAF + "name", "Peter Goodguy"),
            (EX + "b", FOAF + "mbox", "mailto:peter@example.org"),
            (EX + "c", FOAF + "mbox", "mailto:carol@example.org"),
        ],
        query="SELECT ?name ?mbox WHERE "
              "{ ?x foaf:name ?name . ?x foaf:mbox ?mbox }",
        expect=[
            {"name": "Johnny Lee Outlaw", "mbox": "mailto:jlow@example.com"},
            {"name": "Peter Goodguy", "mbox": "mailto:peter@example.org"},
        ],
    ),
    dict(
        id="2.3.1-lang-no-match", section="§2.3.1", kind="select",
        data=[(EX + "x", NS + "p", '"cat"@en')],
        query='SELECT ?v WHERE { ?v ns:p "cat" }',
        expect=[],
        note="a plain 'cat' does not match 'cat'@en",
    ),
    dict(
        id="2.3.1-lang-match", section="§2.3.1", kind="select",
        data=[(EX + "x", NS + "p", '"cat"@en')],
        query='SELECT ?v WHERE { ?v ns:p "cat"@en }',
        expect=[{"v": EX + "x"}],
    ),
    dict(
        id="2.3.2-integer-literal", section="§2.3.2", kind="select",
        data=[(EX + "x", NS + "p", INT(42))],
        query="SELECT ?v WHERE { ?v ?p 42 }",
        expect=[{"v": EX + "x"}],
        note="a bare 42 is \"42\"^^xsd:integer and matches the typed "
             "serialization (round-14 _numeric_const_forms)",
    ),
    dict(
        id="2.3.3-unknown-datatype", section="§2.3.3", kind="select",
        data=[(EX + "x", NS + "p",
               '"abc"^^<http://example.org/datatype#specialDatatype>')],
        query='SELECT ?v WHERE { ?v ?p '
              '"abc"^^<http://example.org/datatype#specialDatatype> }',
        expect=[{"v": EX + "x"}],
    ),
    dict(
        id="2.5-select-expression", section="§2.5", kind="select",
        data=[
            (EX + "P1", FOAF + "givenName", "John"),
            (EX + "P1", FOAF + "surname", "Doe"),
        ],
        query='SELECT (CONCAT(?G, " ", ?S) AS ?name) WHERE '
              "{ ?P foaf:givenName ?G ; foaf:surname ?S }",
        expect=[{"name": "John Doe"}],
    ),
    dict(
        id="2.5-bind", section="§2.5", kind="select",
        data=[
            (EX + "P1", FOAF + "givenName", "John"),
            (EX + "P1", FOAF + "surname", "Doe"),
        ],
        query="SELECT ?name WHERE { ?P foaf:givenName ?G ; "
              'foaf:surname ?S BIND(CONCAT(?G, " ", ?S) AS ?name) }',
        expect=[{"name": "John Doe"}],
    ),
    # ---------------------------------------------------- §3 filters
    dict(
        id="3.1-regex", section="§3.1", kind="select",
        data=[
            (B + "book1", DC + "title", "SPARQL Tutorial"),
            (B + "book2", DC + "title", "The Semantic Web"),
        ],
        query="SELECT ?title WHERE { ?x dc:title ?title "
              'FILTER regex(?title, "^SPARQL") }',
        expect=[{"title": "SPARQL Tutorial"}],
    ),
    dict(
        id="3.1-regex-flags", section="§3.1", kind="select",
        data=[
            (B + "book1", DC + "title", "SPARQL Tutorial"),
            (B + "book2", DC + "title", "The Semantic Web"),
        ],
        query="SELECT ?title WHERE { ?x dc:title ?title "
              'FILTER regex(?title, "web", "i") }',
        expect=[{"title": "The Semantic Web"}],
    ),
    dict(
        id="3.2-numeric-filter", section="§3.2", kind="select",
        data=[
            (B + "book1", DC + "title", "SPARQL Tutorial"),
            (B + "book1", NS + "price", INT(42)),
            (B + "book2", DC + "title", "The Semantic Web"),
            (B + "book2", NS + "price", INT(23)),
        ],
        query="SELECT ?title ?price WHERE { ?x ns:price ?price . "
              "FILTER(?price < 30.5) ?x dc:title ?title }",
        expect=[{"title": "The Semantic Web", "price": INT(23)}],
    ),
    # --------------------------------------------------- §6 OPTIONAL
    dict(
        id="6.1-optional", section="§6.1", kind="select",
        data=[
            (EX + "a", RDF + "type", FOAF + "Person"),
            (EX + "a", FOAF + "name", "Alice"),
            (EX + "a", FOAF + "mbox", "mailto:alice@example.com"),
            (EX + "a", FOAF + "mbox", "mailto:alice@work.example"),
            (EX + "b", RDF + "type", FOAF + "Person"),
            (EX + "b", FOAF + "name", "Bob"),
        ],
        query="SELECT ?name ?mbox WHERE { ?x foaf:name ?name . "
              "OPTIONAL { ?x foaf:mbox ?mbox } }",
        expect=[
            {"name": "Alice", "mbox": "mailto:alice@example.com"},
            {"name": "Alice", "mbox": "mailto:alice@work.example"},
            {"name": "Bob", "mbox": None},
        ],
    ),
    dict(
        id="6.1.1-optional-filter", section="§6.1.1", kind="select",
        data=[
            (B + "book1", DC + "title", "SPARQL Tutorial"),
            (B + "book1", NS + "price", INT(42)),
            (B + "book2", DC + "title", "The Semantic Web"),
            (B + "book2", NS + "price", INT(23)),
        ],
        query="SELECT ?title ?price WHERE { ?x dc:title ?title . "
              "OPTIONAL { ?x ns:price ?price . FILTER(?price < 30) } }",
        expect=[
            {"title": "SPARQL Tutorial", "price": None},
            {"title": "The Semantic Web", "price": INT(23)},
        ],
    ),
    dict(
        id="6.3-two-optionals", section="§6.3", kind="select",
        data=[
            (EX + "a", FOAF + "name", "Alice"),
            (EX + "a", FOAF + "homepage", "http://work.example.org/alice/"),
            (EX + "b", FOAF + "name", "Bob"),
            (EX + "b", FOAF + "mbox", "mailto:bob@work.example"),
        ],
        query="SELECT ?name ?mbox ?hpage WHERE { ?x foaf:name ?name . "
              "OPTIONAL { ?x foaf:mbox ?mbox } "
              "OPTIONAL { ?x foaf:homepage ?hpage } }",
        expect=[
            {"name": "Alice", "mbox": None,
             "hpage": "http://work.example.org/alice/"},
            {"name": "Bob", "mbox": "mailto:bob@work.example",
             "hpage": None},
        ],
    ),
    # ------------------------------------------------------ §7 UNION
    dict(
        id="7-union", section="§7", kind="select",
        data=[
            (B + "book1", DC10 + "title", "SPARQL Query Language Tutorial"),
            (B + "book2", DC + "title", "SPARQL Protocol Tutorial"),
            (B + "book3", DC10 + "title", "SPARQL"),
            (B + "book3", DC + "title", "SPARQL (updated)"),
        ],
        query="SELECT ?title WHERE { { ?book dc10:title ?title } "
              "UNION { ?book dc:title ?title } }",
        expect=[
            {"title": "SPARQL Query Language Tutorial"},
            {"title": "SPARQL Protocol Tutorial"},
            {"title": "SPARQL"},
            {"title": "SPARQL (updated)"},
        ],
    ),
    dict(
        id="7-union-two-vars", section="§7", kind="select",
        data=[
            (B + "book1", DC10 + "title", "SPARQL Query Language Tutorial"),
            (B + "book2", DC + "title", "SPARQL Protocol Tutorial"),
        ],
        query="SELECT ?x ?y WHERE { { ?book dc10:title ?x } "
              "UNION { ?book dc:title ?y } }",
        expect=[
            {"x": "SPARQL Query Language Tutorial", "y": None},
            {"x": None, "y": "SPARQL Protocol Tutorial"},
        ],
    ),
    # --------------------------------------------------- §8 negation
    dict(
        id="8.1.1-not-exists", section="§8.1.1", kind="select",
        data=[
            (EX + "alice", RDF + "type", FOAF + "Person"),
            (EX + "alice", FOAF + "name", "Alice"),
            (EX + "bob", RDF + "type", FOAF + "Person"),
        ],
        query="SELECT ?person WHERE { ?person rdf:type foaf:Person . "
              "FILTER NOT EXISTS { ?person foaf:name ?name } }",
        expect=[{"person": EX + "bob"}],
    ),
    dict(
        id="8.1.2-exists", section="§8.1.2", kind="select",
        data=[
            (EX + "alice", RDF + "type", FOAF + "Person"),
            (EX + "alice", FOAF + "name", "Alice"),
            (EX + "bob", RDF + "type", FOAF + "Person"),
        ],
        query="SELECT ?person WHERE { ?person rdf:type foaf:Person . "
              "FILTER EXISTS { ?person foaf:name ?name } }",
        expect=[{"person": EX + "alice"}],
    ),
    dict(
        id="8.3-minus", section="§8.3", kind="select",
        data=[
            (EX + "alice", FOAF + "givenName", "Alice"),
            (EX + "alice", FOAF + "familyName", "Smith"),
            (EX + "bob", FOAF + "givenName", "Bob"),
            (EX + "bob", FOAF + "familyName", "Jones"),
        ],
        query="SELECT DISTINCT ?s WHERE { ?s ?p ?o . "
              'MINUS { ?s foaf:givenName "Bob" } }',
        expect=[{"s": EX + "alice"}],
    ),
    dict(
        id="8.3.2-minus-disjoint", section="§8.3.2", kind="reject",
        data=[(EX + "a", EX + "b", EX + "c")],
        query="SELECT * WHERE { ?s ?p ?o . "
              'MINUS { ?x foaf:givenName "Bob" } }',
        expect=None,
        note="a MINUS sharing no variable removes nothing per spec — "
             "the engine rejects it loudly instead of silently "
             "evaluating the (almost always unintended) no-op",
    ),
    # ---------------------------------------------- §9 property paths
    dict(
        id="9-path-sequence", section="§9.4", kind="select",
        data=[
            (EX + "alice", FOAF + "knows", EX + "bob"),
            (EX + "bob", FOAF + "name", "Bob"),
        ],
        query="SELECT ?name WHERE { ex:alice foaf:knows/foaf:name ?name }",
        expect=[{"name": "Bob"}],
    ),
    dict(
        id="9-path-inverse", section="§9.4", kind="select",
        data=[(EX + "alice", FOAF + "mbox", "mailto:alice@example.com")],
        query="SELECT ?x WHERE "
              "{ <mailto:alice@example.com> ^foaf:mbox ?x }",
        expect=[{"x": EX + "alice"}],
    ),
    dict(
        id="9-path-star", section="§9.4", kind="select",
        data=[
            (EX + "C1", RDFS + "subClassOf", EX + "C2"),
            (EX + "C2", RDFS + "subClassOf", EX + "C3"),
        ],
        query="SELECT ?t WHERE { ex:C1 rdfs:subClassOf* ?t }",
        expect=[{"t": EX + "C1"}, {"t": EX + "C2"}, {"t": EX + "C3"}],
    ),
    dict(
        id="9-path-plus", section="§9.4", kind="select",
        data=[
            (EX + "alice", FOAF + "knows", EX + "bob"),
            (EX + "bob", FOAF + "knows", EX + "carol"),
        ],
        query="SELECT ?y WHERE { ex:alice foaf:knows+ ?y }",
        expect=[{"y": EX + "bob"}, {"y": EX + "carol"}],
    ),
    dict(
        id="9-path-alternative", section="§9.4", kind="select",
        data=[
            (B + "book1", DC + "title", "T1"),
            (B + "book2", RDFS + "label", "T2"),
        ],
        query="SELECT ?d WHERE { ?book (dc:title|rdfs:label) ?d }",
        expect=[{"d": "T1"}, {"d": "T2"}],
    ),
    dict(
        id="9-path-negated", section="§9.4", kind="select",
        data=[
            (EX + "x", RDF + "type", EX + "T"),
            (EX + "x", FOAF + "name", "X"),
        ],
        query="SELECT ?o WHERE { ex:x !rdf:type ?o }",
        expect=[{"o": "X"}],
    ),
    # ------------------------------------------------ §10 assignment
    dict(
        id="10.1-bind-arith", section="§10.1", kind="select",
        data=[
            (B + "book1", DC + "title", "SPARQL Tutorial"),
            (B + "book1", NS + "price", INT(42)),
            (B + "book1", NS + "discount", DEC("0.2")),
            (B + "book2", DC + "title", "The Semantic Web"),
            (B + "book2", NS + "price", INT(23)),
            (B + "book2", NS + "discount", DEC("0.25")),
        ],
        query="SELECT ?title ?price WHERE { ?x ns:price ?p . "
              "?x ns:discount ?discount "
              "BIND(?p*(1-?discount) AS ?price) "
              "FILTER(?price < 20) ?x dc:title ?title }",
        expect=[{"title": "The Semantic Web", "price": ("num", 17.25)}],
    ),
    dict(
        id="10.2-values", section="§10.2", kind="select",
        data=[
            (B + "book1", DC + "title", "SPARQL Tutorial"),
            (B + "book2", DC + "title", "The Semantic Web"),
        ],
        query="SELECT ?book ?title WHERE { "
              "VALUES ?book { book:book1 } ?book dc:title ?title }",
        expect=[{"book": B + "book1", "title": "SPARQL Tutorial"}],
    ),
    # ------------------------------------------------ §11 aggregates
    dict(
        id="11.1-sum-having", section="§11.1", kind="select",
        data=[
            (B + "org1", B + "affiliates", B + "auth1"),
            (B + "org1", B + "affiliates", B + "auth2"),
            (B + "auth1", B + "writesBook", B + "book1"),
            (B + "book1", B + "price", INT(9)),
            (B + "auth1", B + "writesBook", B + "book2"),
            (B + "book2", B + "price", INT(5)),
            (B + "auth2", B + "writesBook", B + "book3"),
            (B + "book3", B + "price", INT(7)),
            (B + "org2", B + "affiliates", B + "auth3"),
            (B + "auth3", B + "writesBook", B + "book4"),
            (B + "book4", B + "price", INT(7)),
        ],
        query="SELECT (SUM(?lprice) AS ?totalPrice) WHERE { "
              "?org book:affiliates ?auth . "
              "?auth book:writesBook ?book . ?book book:price ?lprice } "
              "GROUP BY ?org HAVING (SUM(?lprice) > 10)",
        expect=[{"totalPrice": ("num", 21.0)}],
    ),
    dict(
        id="11-avg-group", section="§11.4.4", kind="select",
        data=[
            (EX + "a", NS + "size", INT(2)),
            (EX + "a", NS + "size", INT(4)),
            (EX + "b", NS + "size", INT(10)),
        ],
        query="SELECT ?s (AVG(?v) AS ?avg) WHERE { ?s ns:size ?v } "
              "GROUP BY ?s",
        expect=[
            {"s": EX + "a", "avg": ("num", 3.0)},
            {"s": EX + "b", "avg": ("num", 10.0)},
        ],
    ),
    dict(
        id="11-count-distinct", section="§11.4.3", kind="select",
        data=[
            (EX + "a", NS + "tag", "x"),
            (EX + "a", NS + "tag", "x"),
            (EX + "a", NS + "tag", "y"),
        ],
        query="SELECT (COUNT(DISTINCT ?t) AS ?n) WHERE { ?s ns:tag ?t }",
        expect=[{"n": ("num", 2)}],
        note="bag data enters as a set (graph semantics): the two 'x' "
             "rows are one triple",
    ),
    dict(
        id="11-min-max-sample", section="§11.4", kind="select",
        data=[
            (EX + "a", NS + "size", INT(9)),
            (EX + "a", NS + "size", INT(10)),
        ],
        query="SELECT (MIN(?v) AS ?lo) (MAX(?v) AS ?hi) WHERE "
              "{ ?s ns:size ?v }",
        expect=[{"lo": INT(9), "hi": INT(10)}],
        note="§15.1 value order: 9 < 10 although '10' < '9' lexically",
    ),
    dict(
        id="11-group-concat", section="§11.4.6", kind="select",
        data=[
            (EX + "a", NS + "tag", "x"),
            (EX + "a", NS + "tag", "y"),
        ],
        query='SELECT (GROUP_CONCAT(?t; SEPARATOR=" ") AS ?ts) WHERE '
              "{ ?s ns:tag ?t }",
        expect=[{"ts": "x y"}],
        note="the spec leaves concatenation order undefined; the engine "
             "sorts, giving the deterministic 'x y'",
    ),
    # ------------------------------------------------ §12 subqueries
    dict(
        id="12-subquery-min", section="§12", kind="select",
        data=[
            (EX + "alice", FOAF + "knows", EX + "bob"),
            (EX + "alice", FOAF + "knows", EX + "carol"),
            (EX + "bob", FOAF + "name", "B. Bar"),
            (EX + "bob", FOAF + "name", "Bob"),
            (EX + "carol", FOAF + "name", "C. Baz"),
            (EX + "carol", FOAF + "name", "Carol"),
        ],
        query="SELECT ?y ?minName WHERE { ex:alice foaf:knows ?y . "
              "{ SELECT ?y (MIN(?name) AS ?minName) WHERE "
              "{ ?y foaf:name ?name } GROUP BY ?y } }",
        expect=[
            {"y": EX + "bob", "minName": "B. Bar"},
            {"y": EX + "carol", "minName": "C. Baz"},
        ],
    ),
    # ----------------------------------------- §15 solution modifiers
    dict(
        id="15.1-order-by", section="§15.1", kind="select", ordered=True,
        data=[
            (EX + "a", FOAF + "name", "Bob"),
            (EX + "b", FOAF + "name", "Alice"),
        ],
        query="SELECT ?name WHERE { ?x foaf:name ?name } ORDER BY ?name",
        expect=[{"name": "Alice"}, {"name": "Bob"}],
    ),
    dict(
        id="15.1-order-desc-typed", section="§15.1", kind="select",
        ordered=True,
        data=[
            (EX + "a", NS + "emp", INT(9)),
            (EX + "b", NS + "emp", INT(10)),
            (EX + "c", NS + "emp", INT(2)),
        ],
        query="SELECT ?x ?emp WHERE { ?x ns:emp ?emp } "
              "ORDER BY DESC(?emp)",
        expect=[
            {"x": EX + "b", "emp": INT(10)},
            {"x": EX + "a", "emp": INT(9)},
            {"x": EX + "c", "emp": INT(2)},
        ],
        note="value order: 10 > 9 although '9' > '10' lexically",
    ),
    dict(
        id="15.3-limit-offset", section="§15.3-4", kind="select",
        ordered=True,
        data=[
            (EX + "a", FOAF + "name", "Alice"),
            (EX + "b", FOAF + "name", "Bob"),
            (EX + "c", FOAF + "name", "Carol"),
        ],
        query="SELECT ?name WHERE { ?x foaf:name ?name } "
              "ORDER BY ?name LIMIT 1 OFFSET 1",
        expect=[{"name": "Bob"}],
    ),
    dict(
        id="15.5-distinct", section="§15.5", kind="select",
        data=[
            (EX + "x", FOAF + "name", "Alice"),
            (EX + "y", FOAF + "name", "Alice"),
        ],
        query="SELECT DISTINCT ?name WHERE { ?x foaf:name ?name }",
        expect=[{"name": "Alice"}],
    ),
    # ------------------------------------- §16 query forms + datasets
    dict(
        id="16.1-ask-true", section="§16.1 (ASK)", kind="ask",
        data=[(EX + "a", FOAF + "name", "Alice")],
        query='ASK { ?x foaf:name "Alice" }',
        expect=True,
    ),
    dict(
        id="16.1-ask-false", section="§16.1 (ASK)", kind="ask",
        data=[(EX + "a", FOAF + "name", "Alice")],
        query='ASK { ?x foaf:name "Walt" }',
        expect=False,
    ),
    dict(
        id="16.2-construct", section="§16.2", kind="construct",
        data=[(EX + "a", FOAF + "name", "Alice")],
        query="CONSTRUCT { <http://example.org/person#Alice> "
              "vcard:FN ?name } WHERE { ?x foaf:name ?name }",
        expect={("http://example.org/person#Alice", V + "FN", "Alice")},
    ),
    dict(
        id="16.4-describe", section="§16.4", kind="describe",
        data=[
            (EX + "a", FOAF + "name", "Alice"),
            (EX + "b", FOAF + "name", "Bob"),
        ],
        query="DESCRIBE ex:a",
        expect={(EX + "a", FOAF + "name", "Alice")},
        note="DESCRIBE's result form is implementation-defined (§16.4); "
             "the engine returns the subject's concise description",
    ),
    dict(
        id="13.3-graph-var", section="§13.3", kind="select",
        data_quads=[
            ("http://example.org/g1", EX + "x", FOAF + "name", "Alice"),
            (None, EX + "y", FOAF + "name", "Bob"),
        ],
        data=[],
        query="SELECT ?g ?name WHERE { GRAPH ?g { ?x foaf:name ?name } }",
        expect=[{"g": "http://example.org/g1", "name": "Alice"}],
        note="patterns outside GRAPH see the default graph only; "
             "GRAPH ?g ranges over named graphs",
    ),
    # ------------------------------------------------- §17 operators
    dict(
        id="17.4.1.9-in", section="§17.4.1.9", kind="select",
        data=_ONE,
        query="SELECT ?s WHERE { ?s ?p ?o FILTER(2 IN (1, 2, 3)) }",
        expect=[{"s": EX + "x"}],
    ),
    dict(
        id="17.4.1.9-in-empty", section="§17.4.1.9", kind="select",
        data=_ONE,
        query="SELECT ?s WHERE { ?s ?p ?o FILTER(2 IN ()) }",
        expect=[],
    ),
    dict(
        id="17.4.1.10-not-in-empty", section="§17.4.1.10", kind="select",
        data=_ONE,
        query="SELECT ?s WHERE { ?s ?p ?o FILTER(2 NOT IN ()) }",
        expect=[{"s": EX + "x"}],
    ),
    dict(
        id="17.4.1.1-bound", section="§17.4.1.1", kind="select",
        data=[
            (EX + "a", FOAF + "name", "Alice"),
            (EX + "a", FOAF + "mbox", "mailto:alice@example.com"),
            (EX + "b", FOAF + "name", "Bob"),
        ],
        query="SELECT ?name WHERE { ?x foaf:name ?name "
              "OPTIONAL { ?x foaf:mbox ?mbox } FILTER(!BOUND(?mbox)) }",
        expect=[{"name": "Bob"}],
    ),
    dict(
        id="17.4.1.2-if", section="§17.4.1.2", kind="select",
        data=[(EX + "a", NS + "size", INT(42))],
        query="SELECT ?c WHERE { ?s ns:size ?v "
              'BIND(IF(?v > 10, "big", "small") AS ?c) }',
        expect=[{"c": "big"}],
    ),
    dict(
        id="17.4.1.3-coalesce", section="§17.4.1.3", kind="select",
        data=[(EX + "a", FOAF + "name", "Alice")],
        query="SELECT ?d WHERE { ?x foaf:name ?n "
              "OPTIONAL { ?x foaf:mbox ?m } "
              'BIND(COALESCE(?m, "none") AS ?d) }',
        expect=[{"d": "none"}],
    ),
    dict(
        id="17.4.2-str-lang-datatype", section="§17.4.2", kind="select",
        data=[(EX + "a", NS + "p", '"cat"@en'), (EX + "b", NS + "q", INT(42))],
        query="SELECT ?s ?l ?d WHERE { ex:a ns:p ?v . ex:b ns:q ?w "
              "BIND(STR(?v) AS ?s) BIND(LANG(?v) AS ?l) "
              "BIND(DATATYPE(?w) AS ?d) }",
        expect=[{"s": "cat", "l": "en", "d": XSD + "integer"}],
    ),
    dict(
        id="17.4.2.5-strdt", section="§17.4.2.5", kind="select",
        data=_ONE,
        query="SELECT ?v WHERE { ?s ?p ?o "
              'BIND(STRDT("123", xsd:integer) AS ?v) }',
        expect=[{"v": INT(123)}],
    ),
    dict(
        id="17.4.2.6-strlang", section="§17.4.2.6", kind="select",
        data=_ONE,
        query="SELECT ?v WHERE { ?s ?p ?o "
              'BIND(STRLANG("chat", "en") AS ?v) }',
        expect=[{"v": '"chat"@en'}],
    ),
    dict(
        id="17.4.3-string-fns-1", section="§17.4.3", kind="select",
        data=_ONE,
        query="SELECT ?n ?sub ?sub1 ?up ?low WHERE { ?s ?p ?o "
              'BIND(STRLEN("chat") AS ?n) '
              'BIND(SUBSTR("foobar", 4) AS ?sub) '
              'BIND(SUBSTR("foobar", 4, 1) AS ?sub1) '
              'BIND(UCASE("foo") AS ?up) BIND(LCASE("BAR") AS ?low) }',
        expect=[{"n": ("num", 4), "sub": "bar", "sub1": "b",
                 "up": "FOO", "low": "bar"}],
    ),
    dict(
        id="17.4.3-string-fns-2", section="§17.4.3", kind="select",
        data=_ONE,
        query="SELECT ?s WHERE { ?s ?p ?o "
              'FILTER(STRSTARTS("foobar", "foo") && '
              'STRENDS("foobar", "bar") && CONTAINS("foobar", "oba")) }',
        expect=[{"s": EX + "x"}],
    ),
    dict(
        id="17.4.3-strbefore-after", section="§17.4.3.7-8", kind="select",
        data=_ONE,
        query="SELECT ?b ?a ?missing WHERE { ?s ?p ?o "
              'BIND(STRBEFORE("abc", "b") AS ?b) '
              'BIND(STRAFTER("abc", "b") AS ?a) '
              'BIND(STRBEFORE("abc", "xyz") AS ?missing) }',
        expect=[{"b": "a", "a": "c", "missing": ""}],
    ),
    dict(
        id="17.4.3.9-encode-for-uri", section="§17.4.3.9", kind="select",
        data=_ONE,
        query="SELECT ?v WHERE { ?s ?p ?o "
              'BIND(ENCODE_FOR_URI("Los Angeles") AS ?v) }',
        expect=[{"v": "Los%20Angeles"}],
    ),
    dict(
        id="17.4.3.15-replace", section="§17.4.3.15", kind="select",
        data=_ONE,
        query="SELECT ?v WHERE { ?s ?p ?o "
              'BIND(REPLACE("abcd", "b", "Z") AS ?v) }',
        expect=[{"v": "aZcd"}],
    ),
    dict(
        id="17.4.4-numeric-fns", section="§17.4.4", kind="select",
        data=_ONE,
        query="SELECT ?abs ?r1 ?r2 ?c ?f WHERE { ?s ?p ?o "
              "BIND(ABS(-1.5) AS ?abs) BIND(ROUND(2.4999) AS ?r1) "
              "BIND(ROUND(2.5) AS ?r2) BIND(CEIL(10.5) AS ?c) "
              "BIND(FLOOR(10.5) AS ?f) }",
        expect=[{"abs": ("num", 1.5), "r1": ("num", 2), "r2": ("num", 3),
                 "c": ("num", 11), "f": ("num", 10)}],
    ),
    dict(
        id="17.4.5-datetime-accessors", section="§17.4.5", kind="select",
        data=[(EX + "a", NS + "t", DT("2011-01-10T14:45:13.815-05:00"))],
        query="SELECT ?y ?mo ?d ?h ?mi ?sec ?tz WHERE { ?s ns:t ?t "
              "BIND(YEAR(?t) AS ?y) BIND(MONTH(?t) AS ?mo) "
              "BIND(DAY(?t) AS ?d) BIND(HOURS(?t) AS ?h) "
              "BIND(MINUTES(?t) AS ?mi) BIND(SECONDS(?t) AS ?sec) "
              "BIND(TZ(?t) AS ?tz) }",
        expect=[{"y": ("num", 2011), "mo": ("num", 1), "d": ("num", 10),
                 "h": ("num", 14), "mi": ("num", 45),
                 "sec": ("num", 13.815), "tz": "-05:00"}],
    ),
    dict(
        id="17.4.6-hash-fns", section="§17.4.6", kind="select",
        data=_ONE,
        query="SELECT ?m ?s1 WHERE { ?s ?p ?o "
              'BIND(MD5("abc") AS ?m) BIND(SHA1("abc") AS ?s1) }',
        expect=[{"m": "900150983cd24fb0d6963f7d28e17f72",
                 "s1": "a9993e364706816aba3e25717850c26c9cd0d89d"}],
    ),
    dict(
        id="17.4.1.7-term-tests", section="§17.4.1.5-8 / §17.4.2.2-4",
        kind="select",
        data=[
            (EX + "iri", NS + "p", EX + "o"),
            (EX + "lit", NS + "p", "chat"),
            (EX + "num", NS + "p", INT(7)),
        ],
        query="SELECT ?s WHERE { ?s ns:p ?v "
              "FILTER(ISLITERAL(?v) && ISNUMERIC(?v)) }",
        expect=[{"s": EX + "num"}],
    ),
    dict(
        id="17.2.2-ebv", section="§17.2.2", kind="select",
        data=[
            (EX + "a", NS + "flag", f'"false"^^<{XSD}boolean>'),
            (EX + "b", NS + "flag", "false"),
            (EX + "c", NS + "flag", INT(0)),
        ],
        query="SELECT ?s WHERE { ?s ns:flag ?v FILTER(?v) }",
        expect=[{"s": EX + "b"}],
        note="typed false is false by VALUE; the PLAIN 'false' string "
             "is a non-empty string literal = true; 0 is numeric false",
    ),
    # ------------------------------------------------------ rejects
    dict(
        id="rej-service", section="§13 SERVICE (federation)",
        kind="reject", data=_ONE,
        query="SELECT ?s WHERE { SERVICE <http://remote/sparql> "
              "{ ?s ?p ?o } }",
        expect=None,
    ),
    dict(
        id="rej-reduced", section="§15.6 REDUCED", kind="reject",
        data=_ONE,
        query="SELECT REDUCED ?s WHERE { ?s ?p ?o }",
        expect=None,
    ),
    dict(
        id="rej-bnode-fn", section="§17.4.2.9 BNODE", kind="reject",
        data=_ONE,
        query="SELECT (BNODE() AS ?b) WHERE { ?s ?p ?o }",
        expect=None,
    ),
    dict(
        id="rej-uuid", section="§17.4.2.12 UUID", kind="reject",
        data=_ONE,
        query="SELECT (UUID() AS ?u) WHERE { ?s ?p ?o }",
        expect=None,
    ),
    dict(
        id="rej-now", section="§17.4.5.1 NOW", kind="reject",
        data=_ONE,
        query="SELECT (NOW() AS ?t) WHERE { ?s ?p ?o }",
        expect=None,
    ),
    dict(
        id="rej-rand", section="§17.4.4.2 RAND", kind="reject",
        data=_ONE,
        query="SELECT (RAND() AS ?r) WHERE { ?s ?p ?o }",
        expect=None,
    ),
    dict(
        id="rej-timezone", section="§17.4.5.7 TIMEZONE (duration form)",
        kind="reject", data=_ONE,
        query="SELECT (TIMEZONE(?o) AS ?z) WHERE { ?s ?p ?o }",
        expect=None,
        note="the lexical TZ() accessor is supported instead",
    ),
    dict(
        id="rej-replace-flags", section="§17.4.3.15 REPLACE flags",
        kind="reject", data=_ONE,
        query='SELECT (REPLACE("abab", "B", "Z", "i") AS ?v) '
              "WHERE { ?s ?p ?o }",
        expect=None,
    ),
    # ------------------------------------------------------- UPDATE
    dict(
        id="update-insert-data", section="Update §3.1.1", kind="update",
        data=[(B + "book1", DC + "title", "Fundamentals of Compiler "
               "Design")],
        query="INSERT DATA { book:book1 dc:creator "
              '"A.N.Other" }',
        expect={
            (B + "book1", DC + "title",
             "Fundamentals of Compiler Design"),
            (B + "book1", DC + "creator", "A.N.Other"),
        },
    ),
    dict(
        id="update-delete-data", section="Update §3.1.2", kind="update",
        data=[
            (B + "book2", DC + "title", "David Copperfield"),
            (B + "book2", DC + "creator", "Edmund Wells"),
        ],
        query='DELETE DATA { book:book2 dc:creator "Edmund Wells" }',
        expect={(B + "book2", DC + "title", "David Copperfield")},
    ),
    dict(
        id="update-delete-insert-where", section="Update §3.1.3",
        kind="update",
        data=[
            (EX + "president25", FOAF + "givenName", "Bill"),
            (EX + "president25", FOAF + "familyName", "McKinley"),
            (EX + "president42", FOAF + "givenName", "Bill"),
        ],
        query='DELETE { ?person foaf:givenName "Bill" } '
              'INSERT { ?person foaf:givenName "William" } '
              'WHERE { ?person foaf:givenName "Bill" }',
        expect={
            (EX + "president25", FOAF + "givenName", "William"),
            (EX + "president25", FOAF + "familyName", "McKinley"),
            (EX + "president42", FOAF + "givenName", "William"),
        },
    ),
    dict(
        id="update-clear-default", section="Update §3.2.2", kind="update",
        data=[(EX + "a", EX + "p", "v")],
        query="CLEAR DEFAULT",
        expect=set(),
    ),
]
