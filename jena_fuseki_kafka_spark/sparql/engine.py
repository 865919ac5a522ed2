"""SparqlEngine: the user-facing query entry point over a quad DataFrame.

Mirrors the read side of the reference contract (SURVEY.md §3.2): where the
reference populates a DatasetGraph and lets Fuseki/ARQ serve SPARQL over
HTTP, this engine takes the quad table (a QuadStore snapshot or any
DataFrame in QUAD_SCHEMA) and answers SPARQL directly as DataFrame plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..model import QUAD_COLS
from ..store import QuadStore
from .ast import AskQuery, ConstructQuery, SelectQuery
from .parser import parse_sparql
from .translate import Translator


class SparqlEngine:
    def __init__(
        self,
        quads: DataFrame,
        max_path_iterations: int = 256,
        n_buckets: int | None = None,
    ):
        missing = [c for c in QUAD_COLS if c not in quads.columns]
        if missing:
            raise ValueError(f"quads DataFrame missing columns: {missing}")
        self.quads = quads
        self.max_path_iterations = max_path_iterations
        self.n_buckets = n_buckets

    @classmethod
    def from_store(cls, spark, store: QuadStore, **kw) -> "SparqlEngine":
        """Engine over the store snapshot WITH the bucket column: constant-
        subject patterns prune to the one bucket they hash to (point
        lookups read 1/n_buckets of the store)."""
        return cls(
            store.read(spark, with_bucket=True), n_buckets=store.n_buckets, **kw
        )

    def query(self, text: str, dataset: tuple | None = None):
        """Run a SPARQL query.

        SELECT    -> DataFrame with one struct column per projected variable
                     (fields kind/value/datatype/lang)
        ASK       -> bool
        CONSTRUCT -> DataFrame in QUAD_SCHEMA

        ``dataset`` = (default_iris, named_iris) overrides any FROM /
        FROM NAMED clauses in the query — the SPARQL 1.1 Protocol rule for
        ``default-graph-uri`` / ``named-graph-uri`` parameters.
        """
        return self.query_typed(text, dataset=dataset)[1]

    def query_typed(self, text: str, dataset: tuple | None = None):
        """Like :meth:`query`, but returns ``(ast, result)`` so callers can
        branch on the parsed query form (SELECT vs CONSTRUCT/DESCRIBE) —
        e.g. for HTTP serialization, where inferring the form from result
        column names mis-serializes a SELECT that happens to project
        variables named like the quad columns."""
        ast = parse_sparql(text)
        ds = dataset if dataset is not None else getattr(ast, "dataset", None)
        translator = Translator(
            self._scope_dataset(ds), self.max_path_iterations, self.n_buckets
        )
        df = translator.translate(ast)
        if isinstance(ast, AskQuery):
            return ast, df.count() > 0
        return ast, df

    def _scope_dataset(self, ds: tuple | None) -> DataFrame:
        """Build the query dataset per SPARQL 1.1 §13.2: default graph :=
        merge of the FROM graphs (set-union; empty when none named),
        named graphs := exactly the FROM NAMED set.  One narrow filter +
        relabel per part — the graph filters push to the parquet scan, so
        a FROM over one named graph reads only that graph at scale."""
        if ds is None:
            return self.quads
        from ..model import DEFAULT_GRAPH

        default_iris, named_iris = ds
        parts = []
        if default_iris:
            merged = self.quads.filter(F.col("graph").isin(list(default_iris))).withColumn(
                "graph", F.lit(DEFAULT_GRAPH)
            )
            if len(default_iris) > 1:  # single graph: already a set, skip the shuffle
                merged = merged.dropDuplicates(QUAD_COLS)
            parts.append(merged)
        if named_iris:
            parts.append(self.quads.filter(F.col("graph").isin(list(named_iris))))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def select_values(self, text: str, dataset: tuple | None = None) -> DataFrame:
        """SELECT with result columns flattened to their lexical values
        (plain string columns) — convenient for tests and SQL interop."""
        ast = parse_sparql(text)
        if not isinstance(ast, SelectQuery):
            raise ValueError("select_values requires a SELECT query")
        ds = dataset if dataset is not None else ast.dataset
        df = Translator(
            self._scope_dataset(ds), self.max_path_iterations, self.n_buckets
        ).translate(ast)
        return df.select(*[F.col(c)["value"].alias(c) for c in df.columns])
