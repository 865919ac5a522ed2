"""Topic-existence gate (SURVEY.md §2A A15).

The reference's optional strict startup retries ``allTopicsExist`` until a
timeout, else fails server start (FKS.java:140-194; enabled per-connector
via ``fk:checkTopics``, KafkaConnectorAssembler.java:155, 246-248).  Same
contract here: an injectable checker (the reference injects a
``checkerFactory`` for tests) polled with a bounded retry loop; the default
checker asks the Kafka AdminClient if a client library is importable, else
reports "unknown" and the gate passes open (Spark's own source still fails
lazily on a truly missing topic unless ``failOnDataLoss=false``).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from ..config import ConfigError

DEFAULT_TIMEOUT_S = 5.0  # FKS.java:151 (5 s overall budget)
DEFAULT_RETRY_INTERVAL_S = 0.5


def default_topic_checker(bootstrap_servers: str) -> Callable[[list[str]], set[str] | None]:
    """Return a callable topics -> set of existing topics (None = unknown).

    Uses whichever Kafka admin client is importable; with none installed the
    gate cannot decide and returns None (pass-open, logged by the caller).
    """

    def check(topics: list[str]) -> set[str] | None:
        try:
            from confluent_kafka.admin import AdminClient  # type: ignore

            md = AdminClient({"bootstrap.servers": bootstrap_servers}).list_topics(timeout=5)
            return set(md.topics)
        except ImportError:
            pass
        try:
            from kafka import KafkaAdminClient  # type: ignore

            admin = KafkaAdminClient(bootstrap_servers=bootstrap_servers)
            try:
                return set(admin.list_topics())
            finally:
                admin.close()
        except ImportError:
            return None

    return check


def check_topics_exist(
    topics: list[str],
    checker: Callable[[list[str]], set[str] | None],
    timeout_s: float = DEFAULT_TIMEOUT_S,
    retry_interval_s: float = DEFAULT_RETRY_INTERVAL_S,
    clock: Callable[[], float] = time.monotonic,
    sleep: Callable[[float], None] = time.sleep,
) -> bool:
    """Retry ``checker`` until every topic exists or the timeout lapses.

    Returns True when all topics exist, or when the checker cannot decide
    (None — no admin client available).  Raises ConfigError listing the
    missing topics on timeout — the reference's strict-startup failure
    (FKS.java:180-193).
    """
    deadline = clock() + timeout_s
    missing: list[str] = list(topics)
    while True:
        existing = checker(topics)
        if existing is None:
            return True
        missing = [t for t in topics if t not in existing]
        if not missing:
            return True
        if clock() >= deadline:
            raise ConfigError(f"topics do not exist after {timeout_s}s: {missing}")
        sleep(retry_interval_s)
