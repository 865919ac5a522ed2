"""SPARQL 1.1 subset facade: parse -> algebra -> DataFrame plan.

The reference serves SPARQL over its ingested quad store via Fuseki/ARQ
(SURVEY.md §2B: endpoint wiring config-connector.ttl:14-17; the repo's own
tests run SELECT/UNION/GRAPH/COUNT and OPTIONAL/BIND/COALESCE queries).
This package provides that query surface natively on Spark: the parser
builds an algebra tree, the translator emits a DataFrame plan, and Catalyst
does all physical optimization (join selection, pushdown, codegen) — there
is no interpreter loop.

Covered surface (see parser.py docstring for the grammar subset):
SELECT (DISTINCT, expressions+AS, *), ASK, CONSTRUCT; BGPs with ; , sugar;
OPTIONAL, UNION, MINUS, GRAPH, FILTER (comparisons, logicals, arithmetic,
REGEX, IN, EXISTS/NOT EXISTS, term tests), BIND, VALUES; GROUP BY/HAVING +
COUNT/SUM/AVG/MIN/MAX/GROUP_CONCAT/SAMPLE; ORDER BY/LIMIT/OFFSET;
property-path sugar ^p, p1/p2, p1|p2, p+ , p* (fixpoint iteration).
"""

from .engine import SparqlEngine

__all__ = ["SparqlEngine"]
