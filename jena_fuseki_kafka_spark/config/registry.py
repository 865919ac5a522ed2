"""Connector registry: the FKRegistry equivalent.

Enforces the reference's registration invariants (FKRegistry.java:45-99):
one connector per topic, DLQ topic must not be any connector's input topic,
and (module-level check, FMod_FusekiKafka.java:177-182) unique consumer
group per connector.
"""

from __future__ import annotations

from .connector import ConfigError, ConnectorConfig


class Registry:
    def __init__(self):
        self._by_topic: dict[str, ConnectorConfig] = {}
        self._connectors: list[ConnectorConfig] = []

    def register(self, conn: ConnectorConfig) -> None:
        for topic in conn.topics:
            if topic in self._by_topic:
                raise ConfigError(
                    f"topic {topic!r} already registered to connector "
                    f"{self._by_topic[topic].name!r}"
                )
        if any(c.group_id == conn.group_id for c in self._connectors):
            raise ConfigError(f"duplicate consumer group id {conn.group_id!r}")
        for c in self._connectors:
            if c.dlq_topic and c.dlq_topic in conn.topics:
                raise ConfigError(
                    f"topic {c.dlq_topic!r} is connector {c.name!r}'s DLQ and cannot be input"
                )
            if conn.dlq_topic and conn.dlq_topic in c.topics:
                raise ConfigError(
                    f"DLQ topic {conn.dlq_topic!r} is already an input of {c.name!r}"
                )
        for topic in conn.topics:
            self._by_topic[topic] = conn
        self._connectors.append(conn)

    def unregister(self, name: str) -> None:
        self._connectors = [c for c in self._connectors if c.name != name]
        self._by_topic = {t: c for t, c in self._by_topic.items() if c.name != name}

    def connector_for_topic(self, topic: str) -> ConnectorConfig | None:
        return self._by_topic.get(topic)

    def find_topics(self, dataset: str) -> list[str]:
        """Reverse lookup (FKS.findTopics, FKS.java:238-248)."""
        return sorted(t for t, c in self._by_topic.items() if c.dataset == dataset)

    def connectors(self) -> list[ConnectorConfig]:
        return list(self._connectors)
