"""RDF/Turtle connector-config loader: reads the reference's own
``config-connector.ttl`` files into :class:`ConnectorConfig`.

The reference assembles connector descriptors from an RDF graph
(KafkaConnectorAssembler.java:198-272), with:

- ``fk:Connector`` nodes carrying topic / bootstrapServers / stateFile /
  fusekiServiceName / syncTopic / replayTopic / groupId / dlqTopic /
  startupTopicCheck
- ``fk:cluster`` references to a shared ``fk:Cluster`` node whose
  *connection-level* settings (bootstrapServers, config, configFile) the
  connector inherits — group id and everything else stay per-connector
  (KafkaConnectorAssembler.java:229-233)
- inline Kafka properties as ``fk:config ("key" "value")`` RDF-list pairs
  and external ``.properties`` files via ``fk:configFile``, layered
  cluster-inline < cluster-file < connector-inline < connector-file
  (KafkaConnectorAssembler.java:286-303)
- ``env:``-style values resolved by the same interpolation grammar the
  JSON loader uses (EnvVariables.java:39-115 — handled downstream by
  ``ConnectorConfig.__post_init__``)

Read-policy mapping (FKS.java:105-114, config-connector-latest.ttl):
replayTopic=true -> "replay"; else syncTopic=true -> "sync"; both
false -> "latest".
"""

from __future__ import annotations

import os

from ..model import RdfParseError
from ..rdf.turtle import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, parse_turtle
from .connector import ConfigError, ConnectorConfig, interpolate_env

FK = "http://jena.apache.org/fuseki/kafka#"

T_CONNECTOR = FK + "Connector"
T_CLUSTER = FK + "Cluster"


class _Graph:
    """Minimal triple index over the parser's op tuples."""

    def __init__(self, ops: list[tuple]):
        # op tuple: (op, graph, s, p, o_kind, o_val, o_dt, o_lang)
        self._by_sp: dict[tuple[str, str], list[str]] = {}
        self._by_p: dict[str, list[tuple[str, str]]] = {}
        for _op, _g, s, p, _ok, ov, _dt, _lang in ops:
            self._by_sp.setdefault((s, p), []).append(ov)
            self._by_p.setdefault(p, []).append((s, ov))

    def objects(self, s: str, p: str) -> list[str]:
        return self._by_sp.get((s, p), [])

    def one(self, s: str, p: str) -> str | None:
        vals = self.objects(s, p)
        if len(vals) > 1:
            raise ConfigError(f"{s}: multiple values for <{p}>")
        return vals[0] if vals else None

    def subjects_of_type(self, type_iri: str) -> list[str]:
        return [s for s, o in self._by_p.get(RDF_TYPE, []) if o == type_iri]

    def rdf_list(self, head: str) -> list[str]:
        items: list[str] = []
        seen: set[str] = set()
        while head != RDF_NIL:
            if head in seen:
                raise ConfigError("cyclic RDF list in config graph")
            seen.add(head)
            first = self.objects(head, RDF_FIRST)
            rest = self.objects(head, RDF_REST)
            if len(first) != 1 or len(rest) != 1:
                raise ConfigError("malformed RDF list in config graph")
            items.append(first[0])
            head = rest[0]
        return items


def _bool(value: str | None, default: bool) -> bool:
    if value is None:
        return default
    return value.strip().lower() == "true"


def _load_properties_file(path: str) -> dict[str, str]:
    """Minimal java .properties reader: key=value / key: value lines,
    '#'/'!' comments — the subset Kafka client configs use."""
    props: dict[str, str] = {}
    try:
        with open(path) as f:
            for raw in f:
                line = raw.strip()
                if not line or line[0] in "#!":
                    continue
                for sep in ("=", ":"):
                    if sep in line:
                        k, _, v = line.partition(sep)
                        props[k.strip()] = v.strip()
                        break
                else:
                    props[line] = ""
    except FileNotFoundError:
        raise ConfigError(f"Kafka properties file {path!r} not found") from None
    return props


def _kafka_props_of(graph: _Graph, node: str, base_dir: str) -> dict[str, str]:
    """fk:config ("k" "v") pairs, then fk:configFile files (file wins
    within a level — KafkaConnectorAssembler.java:293-295)."""
    props: dict[str, str] = {}
    for head in graph.objects(node, FK + "config"):
        pair = graph.rdf_list(head)
        if len(pair) != 2:
            raise ConfigError(f"{node}: fk:config must be (key value) pairs")
        props[pair[0]] = pair[1]
    for ref in graph.objects(node, FK + "configFile"):
        resolved = interpolate_env("configFile", ref)
        if not resolved:
            continue
        if resolved.startswith("file:"):
            resolved = resolved[len("file://") :] if resolved.startswith("file://") else resolved[len("file:") :]
        if not os.path.isabs(resolved):
            resolved = os.path.join(base_dir, resolved)
        props.update(_load_properties_file(resolved))
    return props


def _connector_name(node: str) -> str:
    # "<...#connector0>" resolves to "#connector0" / full IRI; take the
    # fragment (or trailing path segment) as the human name
    frag = node.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
    return frag or node


def load_turtle_config(path: str) -> list[ConnectorConfig]:
    """Parse a reference-style Turtle config file into connector configs.

    Produces the same descriptors the JSON path does; registry invariants
    (unique topics/groups, DLQ != input) are enforced by
    :class:`ConnectorConfig` and :func:`..config.registry.validate_registry`.
    """
    with open(path) as f:
        text = f.read()
    try:
        ops = parse_turtle(text)
    except RdfParseError as e:
        raise ConfigError(f"{path}: {e}") from None
    graph = _Graph(ops)
    base_dir = os.path.dirname(os.path.abspath(path))

    configs: list[ConnectorConfig] = []
    for node in graph.subjects_of_type(T_CONNECTOR):
        cluster = graph.one(node, FK + "cluster")

        topics = graph.objects(node, FK + "topic")
        if not topics:
            raise ConfigError(f"connector {node}: fk:topic is required")

        bootstrap = graph.one(node, FK + "bootstrapServers")
        if bootstrap is None and cluster is not None:
            bootstrap = graph.one(cluster, FK + "bootstrapServers")
        if bootstrap is None:
            raise ConfigError(
                f"connector {node}: no bootstrap servers configured on the "
                "connector or its referenced fk:cluster"
            )

        service = graph.one(node, FK + "fusekiServiceName")
        if service is None:
            raise ConfigError(f"connector {node}: fk:fusekiServiceName is required")
        dataset = service if service.startswith("/") else "/" + service

        state_file = graph.one(node, FK + "stateFile")
        if state_file is None:
            raise ConfigError(f"connector {node}: fk:stateFile is required")

        sync = _bool(graph.one(node, FK + "syncTopic"), True)
        replay = _bool(graph.one(node, FK + "replayTopic"), False)
        read_policy = "replay" if replay else ("sync" if sync else "latest")

        # layering: cluster inline+file first, connector inline+file override
        kafka_props: dict[str, str] = {}
        if cluster is not None:
            kafka_props.update(_kafka_props_of(graph, cluster, base_dir))
        kafka_props.update(_kafka_props_of(graph, node, base_dir))

        configs.append(
            ConnectorConfig(
                name=_connector_name(node),
                topics=list(topics),
                dataset=dataset,
                bootstrap_servers=bootstrap,
                state_dir=state_file,
                read_policy=read_policy,
                group_id=graph.one(node, FK + "groupId") or "",
                dlq_topic=graph.one(node, FK + "dlqTopic"),
                check_topics=_bool(graph.one(node, FK + "startupTopicCheck"), False),
                kafka_properties=kafka_props,
            )
        )
    return configs
