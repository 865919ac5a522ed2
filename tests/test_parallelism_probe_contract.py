"""Contract lint for tools/parallelism_probe.py — keeps the probe from
rotting against the registry without paying a Spark run: every probed
gate must be registered, the expected-differ dict must reference probed
gates only, and both runtime shapes must set the same conf keys (a key
set in one shape but not the other would leak between runs inside the
shared session and poison the comparison)."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_probe():
    spec = importlib.util.spec_from_file_location(
        "parallelism_probe", os.path.join(REPO, "tools", "parallelism_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_probe_gates_registered():
    mod = _load_probe()
    from jena_fuseki_kafka_spark.queries import QUERIES

    assert mod.GATES, "gate list must not be empty"
    unknown = [g for g in mod.GATES if g not in QUERIES]
    assert unknown == [], f"unregistered gates: {unknown}"
    # representative coverage: at least one gate per major family
    prefixes = {g.split("_")[0][:1] for g in mod.GATES}
    for fam in ("q", "r", "d", "s", "t", "p", "m"):
        assert fam in prefixes, f"no {fam}-family gate probed"
    assert any(g.startswith("st") for g in mod.GATES), "no streaming gate probed"


def test_expected_differ_subset_of_gates():
    mod = _load_probe()
    stray = [g for g in mod.EXPECTED_DIFFER if g not in mod.GATES]
    assert stray == [], f"EXPECTED_DIFFER names unprobed gates: {stray}"


def test_shapes_set_identical_conf_keys():
    mod = _load_probe()
    assert set(mod.SHAPES) == {"A", "B"}
    keys_a = set(mod.SHAPES["A"])
    keys_b = set(mod.SHAPES["B"])
    assert keys_a == keys_b, (
        "shape conf keys differ — a key set in one shape only would leak "
        f"between runs in the shared session: {keys_a ^ keys_b}"
    )
    # the two shapes must actually differ, or the probe is vacuous
    assert mod.SHAPES["A"] != mod.SHAPES["B"]
