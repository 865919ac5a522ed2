"""Config + registry tests, mirroring the reference's layer-5 suite
(TestKafkaConnectorAssembler.java:36-380, TestConnectorDescriptor.java,
TestEnvVariables.java:41-121, TestConfig.java bad-config-*.ttl cases)."""

import pytest

from jena_fuseki_kafka_spark.config import (
    ConfigError,
    ConnectorConfig,
    Registry,
    interpolate_env,
)


def conn(**kw):
    base = dict(name="c1", topics=["t1"], dataset="/tmp/ds1")
    base.update(kw)
    return ConnectorConfig.from_dict(base)


class TestEnvInterpolation:
    # grammar from EnvVariables.java:39-115
    def test_plain_passthrough(self):
        assert interpolate_env("k", "plain") == "plain"
        assert interpolate_env("k", 42) == 42

    def test_bare_env(self, monkeypatch):
        monkeypatch.setenv("MY_TOPIC", "events")
        assert interpolate_env("k", "env:MY_TOPIC") == "events"

    def test_braced_env(self, monkeypatch):
        monkeypatch.setenv("MY_TOPIC", "events")
        assert interpolate_env("k", "env:{MY_TOPIC}") == "events"

    def test_braced_default_used(self, monkeypatch):
        monkeypatch.delenv("NOPE", raising=False)
        assert interpolate_env("k", "env:{NOPE:fallback}") == "fallback"

    def test_braced_default_ignored_when_set(self, monkeypatch):
        monkeypatch.setenv("SET_VAR", "real")
        assert interpolate_env("k", "env:{SET_VAR:fallback}") == "real"

    def test_empty_default_allowed(self, monkeypatch):
        monkeypatch.delenv("NOPE", raising=False)
        assert interpolate_env("k", "env:{NOPE:}") == ""

    def test_unset_no_default_errors(self, monkeypatch):
        monkeypatch.delenv("NOPE", raising=False)
        with pytest.raises(ConfigError, match="NOPE"):
            interpolate_env("k", "env:NOPE")
        with pytest.raises(ConfigError, match="NOPE"):
            interpolate_env("k", "env:{NOPE}")


class TestConnectorConfig:
    def test_defaults_match_reference(self):
        c = conn()
        assert c.batch_size == 5000            # SysJenaKafka.java:126
        assert c.batch_bytes == 50 * 1024 * 1024  # SysJenaKafka.java:77
        assert c.max_txn_duration_s == 300     # PT5M, SysJenaKafka.java:43
        assert c.read_policy == "sync"

    def test_no_topic_rejected(self):
        # bad-config-no-topic.ttl analog
        with pytest.raises(ConfigError, match="topic"):
            conn(topics=[])

    def test_dlq_not_input(self):
        # KConnectorDesc.java:116-119
        with pytest.raises(ConfigError, match="DLQ"):
            conn(dlq_topic="t1")

    def test_bad_read_policy(self):
        with pytest.raises(ConfigError, match="read_policy"):
            conn(read_policy="bogus")

    def test_invalid_numbers_fall_back_to_defaults(self):
        # validate-or-default, KConnectorDesc.java:153-192
        c = conn(batch_size=-5, batch_bytes=0, max_txn_duration_s=-1)
        assert c.batch_size == 5000
        assert c.batch_bytes == 50 * 1024 * 1024
        assert c.max_txn_duration_s == 300

    def test_unknown_keys_rejected(self):
        with pytest.raises(ConfigError, match="unknown"):
            ConnectorConfig.from_dict({"name": "x", "topics": ["t"], "dataset": "d", "bogus": 1})

    def test_env_in_topics(self, monkeypatch):
        monkeypatch.setenv("TOPIC_A", "resolved")
        c = conn(topics=["env:TOPIC_A"])
        assert c.topics == ["resolved"]

    def test_starting_offsets_mapping(self):
        # README.md:169-173 read policies
        assert conn(read_policy="replay").starting_offsets() == "earliest"
        assert conn(read_policy="latest").starting_offsets() == "latest"
        assert conn(read_policy="sync").starting_offsets() == "earliest"


class TestRegistry:
    def test_single_connector_per_topic(self):
        # FKRegistry.java:45-99
        r = Registry()
        r.register(conn())
        with pytest.raises(ConfigError, match="already registered"):
            r.register(conn(name="c2", group_id="g2"))

    def test_duplicate_group_rejected(self):
        # FMod_FusekiKafka.java:177-182
        r = Registry()
        r.register(conn(group_id="shared"))
        with pytest.raises(ConfigError, match="group"):
            r.register(conn(name="c2", topics=["t2"], group_id="shared"))

    def test_dlq_cross_check(self):
        r = Registry()
        r.register(conn(dlq_topic="dead"))
        with pytest.raises(ConfigError, match="DLQ"):
            r.register(conn(name="c2", topics=["dead"], group_id="g2"))

    def test_find_topics_reverse_lookup(self):
        # FKS.findTopics
        r = Registry()
        r.register(conn())
        r.register(conn(name="c2", topics=["t2"], group_id="g2"))
        assert r.find_topics("/tmp/ds1") == ["t1", "t2"]

    def test_unregister(self):
        r = Registry()
        r.register(conn())
        r.unregister("c1")
        assert r.connector_for_topic("t1") is None
        r.register(conn())  # re-register works


class TestTopicGate:
    """A15 topic-existence gate (FKS.java:140-194 contract)."""

    def test_all_exist(self):
        from jena_fuseki_kafka_spark.ingest.topics import check_topics_exist

        assert check_topics_exist(["t1", "t2"], lambda ts: {"t1", "t2", "x"})

    def test_unknown_checker_passes_open(self):
        from jena_fuseki_kafka_spark.ingest.topics import check_topics_exist

        assert check_topics_exist(["t1"], lambda ts: None)

    def test_missing_topic_fails_after_timeout(self):
        import pytest as _pytest

        from jena_fuseki_kafka_spark.config import ConfigError
        from jena_fuseki_kafka_spark.ingest.topics import check_topics_exist

        clock = iter([0.0, 0.2, 0.4, 5.1, 5.2]).__next__
        with _pytest.raises(ConfigError, match="t2"):
            check_topics_exist(
                ["t1", "t2"],
                lambda ts: {"t1"},
                timeout_s=5.0,
                clock=clock,
                sleep=lambda s: None,
            )

    def test_topic_appears_within_retries(self):
        from jena_fuseki_kafka_spark.ingest.topics import check_topics_exist

        answers = iter([{"t1"}, {"t1"}, {"t1", "t2"}])
        assert check_topics_exist(
            ["t1", "t2"],
            lambda ts: next(answers),
            timeout_s=5.0,
            clock=iter([0.0, 0.1, 0.2, 0.3]).__next__,
            sleep=lambda s: None,
        )
