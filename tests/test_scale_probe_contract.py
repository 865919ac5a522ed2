"""Contract lint for tools/scale_probe.py — keeps the probe from rotting
against gate schemas without paying a Spark run: every probed facet and
group-key column must exist in the gate's ORACLE result schema (DuckDB
DESCRIBE over the sf0.001 views; the driver's column-parity gate already
pins Spark == oracle names), every leg must be defined, and every rule
must be one of the three sanctioned forms."""

import importlib.util
import os

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _load_probe():
    spec = importlib.util.spec_from_file_location(
        "scale_probe", os.path.join(REPO, "tools", "scale_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_probe_entries_well_formed():
    mod = _load_probe()
    from jena_fuseki_kafka_spark.queries import ORACLES, QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    assert mod.PROBES, "probe list must not be empty"
    for name, leg, keys, facets in mod.PROBES:
        assert name in QUERIES, f"{name}: not a registered query"
        assert name in ORACLES, f"{name}: probe requires an oracle-gated query"
        assert leg in mod.LEGS, f"{name}: unknown leg {leg}"
        cols = {
            r[0] for r in con.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
        }
        missing = (set(keys) | set(facets)) - cols
        assert not missing, f"{name}: probed columns {missing} not in oracle schema {cols}"
        for facet, rule in facets.items():
            assert rule in ("xk", "const") or callable(rule), (
                f"{name}.{facet}: rule must be 'xk', 'const', or callable"
            )


def test_legs_reference_real_tables():
    mod = _load_probe()
    for leg, (fact, pk) in mod.LEGS.items():
        assert fact in TABLES, f"leg {leg}: unknown fact table {fact}"
        path = os.path.join(SF, f"{fact}.parquet")
        assert os.path.exists(path), f"leg {leg}: missing fixture {path}"


def test_bnlj_allowlist_importable():
    mod = _load_probe()
    allow = mod._bnlj_allowlist()
    # the one BNLJ the probe's own query set is known to hit must stay
    # exempted at the single source of truth
    assert "q12_subquery_above_avg" in allow
    assert "s01_ann_bruteforce_topk" in allow
