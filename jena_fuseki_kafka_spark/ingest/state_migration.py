"""Migration of reference (Fuseki-Kafka) offset state files.

The reference persists consumed offsets in a JSON state file
(FusekiOffsetStore.java:112-255).  Two formats exist:

- **current**: ``{"dataset": "/ds", "offsets": {"<topic>-<partition>-<group>":
  N, ...}}`` — keys are ``KafkaEventSource.externalOffsetStoreKey`` strings
  and values are the NEXT offset to read
- **legacy (1.x)**: ``{"dataset": "/ds", "endpoint": "", "topic": "T",
  "offset": N}`` — single-partition, and the stored offset is off by one:
  the actual next offset is N+1 (FusekiOffsetStore.java:244-249 corrects
  this during its own migration; we apply the same correction)

This engine stores progress in Spark Structured Streaming checkpoints, so a
migrating user doesn't convert the file into our state — they convert it
into the Kafka source's ``startingOffsets`` JSON for the FIRST start (after
which the checkpoint owns progress, and the state file can be archived):

    state = migrate_state_file("Replay-RDF0.state", consumer_group="g1")
    offsets_json = starting_offsets_json(state)   # feed to kafka_stream

``kafka_stream(..., starting_offsets=offsets_json)`` then begins exactly
where the reference deployment left off.
"""

from __future__ import annotations

import json
import re

from ..config.connector import ConfigError


def _parse_offset_key(key: str, consumer_group: str | None) -> tuple[str, int] | None:
    """``<topic>-<partition>-<group>`` -> (topic, partition).

    Topic and group may themselves contain dashes, so the split is anchored
    on the *numeric partition segment*: when ``consumer_group`` is given the
    trailing ``-<group>`` is stripped first (unambiguous); otherwise the
    last ``-<digits>-`` occurrence is used.  Returns None for keys that do
    not match (callers may carry other groups' offsets in the same file —
    DockerTestConfigFK.java:366-369 writes two groups)."""
    if consumer_group is not None:
        suffix = "-" + consumer_group
        if not key.endswith(suffix):
            return None
        rest = key[: -len(suffix)]
        topic, dash, part = rest.rpartition("-")
        if not dash or not part.isdigit():
            return None
        return topic, int(part)
    m = re.match(r"^(?P<topic>.+)-(?P<part>\d+)-(?P<group>[^-]+(?:-[^-]+)*)$", key)
    if m is None:
        return None
    return m.group("topic"), int(m.group("part"))


def migrate_state_file(
    path: str,
    consumer_group: str | None = None,
    dataset: str | None = None,
) -> dict:
    """Read a reference state file (either format) into
    ``{"dataset": str, "offsets": {topic: {partition: next_offset}}}``.

    ``consumer_group`` selects that group's offsets from a current-format
    file (required to interpret a legacy file, as the reference also
    requires — FusekiOffsetStore.java:241-243).  ``dataset``, when given,
    is sanity-checked against the file the same way the reference does
    (prefix-tolerant, :205-210).
    """
    with open(path) as f:
        try:
            state = json.load(f)
        except json.JSONDecodeError as e:
            raise ConfigError(f"state file {path!r} is not valid JSON: {e}") from None
    if not isinstance(state, dict):
        raise ConfigError(f"state file {path!r} must contain a JSON object")
    ds = str(state.get("dataset", ""))
    if not ds:
        raise ConfigError(f"no dataset name found in state file {path!r}")
    if dataset is not None and ds != dataset and not ds.startswith(
        dataset + ("" if dataset.endswith("/") else "/")
    ):
        raise ConfigError(f"dataset name does not match: this={dataset} / read={ds}")

    offsets: dict[str, dict[int, int]] = {}

    # legacy single-topic fields: stored offset is off by one (the
    # reference re-processed the last event after upgrade until it added
    # the same +1 correction)
    legacy_topic = str(state.get("topic", "") or "")
    if legacy_topic:
        if consumer_group is None:
            raise ConfigError(
                "must supply a consumer group when reading a legacy state file"
            )
        legacy_offset = int(state.get("offset", -1))
        if legacy_offset >= 0:
            offsets.setdefault(legacy_topic, {})[0] = legacy_offset + 1

    stored = state.get("offsets", {})
    if not isinstance(stored, dict):
        raise ConfigError(
            f"state file {path!r} contains an offsets field whose value is not a JSON object"
        )
    for key, value in stored.items():
        parsed = _parse_offset_key(key, consumer_group)
        if parsed is None:
            continue
        topic, part = parsed
        offsets.setdefault(topic, {})[part] = int(value)
    return {"dataset": ds, "offsets": offsets}


def starting_offsets_json(state: dict) -> str:
    """Render a migrated state as the Kafka source's ``startingOffsets``
    option: ``{"topic": {"0": 23, ...}, ...}`` (offsets are the next
    record to read — the same convention both stores use)."""
    return json.dumps(
        {t: {str(p): o for p, o in parts.items()} for t, parts in state["offsets"].items()}
    )
