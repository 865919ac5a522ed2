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

    def query(self, text: str):
        """Run a SPARQL query.

        SELECT    -> DataFrame with one struct column per projected variable
                     (fields kind/value/datatype/lang)
        ASK       -> bool
        CONSTRUCT -> DataFrame in QUAD_SCHEMA
        """
        return self.query_typed(text)[1]

    def query_typed(self, text: str):
        """Like :meth:`query`, but returns ``(ast, result)`` so callers can
        branch on the parsed query form (SELECT vs CONSTRUCT/DESCRIBE) —
        e.g. for HTTP serialization, where inferring the form from result
        column names mis-serializes a SELECT that happens to project
        variables named like the quad columns."""
        ast = parse_sparql(text)
        translator = Translator(self.quads, self.max_path_iterations, self.n_buckets)
        df = translator.translate(ast)
        if isinstance(ast, AskQuery):
            return ast, df.count() > 0
        return ast, df

    def select_values(self, text: str) -> DataFrame:
        """SELECT with result columns flattened to their lexical values
        (plain string columns) — convenient for tests and SQL interop."""
        ast = parse_sparql(text)
        if not isinstance(ast, SelectQuery):
            raise ValueError("select_values requires a SELECT query")
        df = Translator(self.quads, self.max_path_iterations, self.n_buckets).translate(ast)
        return df.select(*[F.col(c)["value"].alias(c) for c in df.columns])
