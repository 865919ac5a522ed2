"""Secured-Kafka configuration surface: validation + secret redaction.

The reference passes arbitrary Kafka client properties through
``fk:config`` pairs (KafkaConnectorAssembler.java:92, README.md:305-315)
and exercises the whole e2e suite against SASL- and mutual-TLS-secured
clusters (DockerTestSecureKafka.java:22, DockerTestMutualTlsKafka.java:22,
DockerTestConfigMutualTlsKafka.java).  In a production deployment every
cluster is secured, so misconfigured security must fail at **config
time** — not minutes later when the first micro-batch tries to connect —
and secret material must never leak through status endpoints or logs.

This module provides both halves:

- ``validate_kafka_security(props, name)`` — structural validation of the
  ``security.protocol`` / ``sasl.*`` / ``ssl.*`` bundle: unknown
  protocols, SASL without a mechanism or JAAS config, malformed
  ``sasl.jaas.config`` strings, trust/key-store passwords without a
  store, and store locations pointing at files that do not exist.
- ``redact_properties(props)`` — a copy with every secret-bearing value
  masked, for ``Engine.status()`` / logs / error messages.

Validation is deliberately *structural*: it checks what can be known
without a broker (the reference's secured tests need Docker; this
container has no broker, so config-time checks are the strongest
available gate — the same trade documented for A1).
"""

from __future__ import annotations

import os
import re

from .connector import ConfigError

VALID_SECURITY_PROTOCOLS = {"PLAINTEXT", "SSL", "SASL_PLAINTEXT", "SASL_SSL"}

# SASL mechanisms whose credentials ride in sasl.jaas.config.  GSSAPI
# (Kerberos) and OAUTHBEARER configure via external files/callbacks, so a
# missing jaas string is not an error for them.
_JAAS_MECHANISMS = {"PLAIN", "SCRAM-SHA-256", "SCRAM-SHA-512"}

# JAAS entry: <LoginModuleClass> <controlFlag> [key=value ...] ;
# (javax.security.auth.login.Configuration grammar; Kafka rejects entries
# missing the control flag or the trailing semicolon at client init.)
_JAAS_RE = re.compile(
    r"^\s*[A-Za-z_$][\w$]*(?:\.[A-Za-z_$][\w$]*)+"      # module class (dotted)
    r"\s+(?i:required|requisite|sufficient|optional)"     # control flag
    r"(?:\s+[\w.]+=(?:\"[^\"]*\"|'[^']*'|\S+))*"          # key=value options
    r"\s*;\s*$"
)

# Keys whose values are secrets.  Matched as: exact key, ``*.password``
# suffix, or substring for token/secret-bearing families.
_SECRET_EXACT = {
    "sasl.jaas.config",
    "ssl.keystore.key",
    "ssl.keystore.certificate.chain",
    "ssl.truststore.certificates",
}
_SECRET_SUBSTRINGS = ("password", "secret", "token")

REDACTED = "*****"


def is_secret_key(key: str) -> bool:
    k = key.lower()
    return k in _SECRET_EXACT or any(s in k for s in _SECRET_SUBSTRINGS)


def redact_properties(props: dict) -> dict:
    """Copy of ``props`` with secret values masked — safe for status/logs."""
    return {k: (REDACTED if is_secret_key(k) else v) for k, v in props.items()}


def _require_file(name: str, key: str, path: str) -> None:
    if not path:
        raise ConfigError(f"connector {name!r}: {key} is empty")
    if not os.path.isfile(path):
        raise ConfigError(f"connector {name!r}: {key} {path!r} does not exist")


def validate_kafka_security(props: dict, name: str) -> None:
    """Fail fast on a structurally invalid security bundle.

    Raises :class:`ConfigError` naming the offending key; never includes a
    secret value in the message.
    """
    protocol = props.get("security.protocol", "PLAINTEXT").upper()
    if protocol not in VALID_SECURITY_PROTOCOLS:
        raise ConfigError(
            f"connector {name!r}: security.protocol must be one of "
            f"{sorted(VALID_SECURITY_PROTOCOLS)}, got {props['security.protocol']!r}"
        )
    sasl = protocol.startswith("SASL")
    ssl = protocol.endswith("SSL")

    mechanism = props.get("sasl.mechanism", "").upper()
    jaas = props.get("sasl.jaas.config")
    if sasl:
        if not mechanism:
            raise ConfigError(
                f"connector {name!r}: {protocol} requires sasl.mechanism "
                f"(e.g. PLAIN, SCRAM-SHA-512)"
            )
        if mechanism in _JAAS_MECHANISMS and not jaas:
            raise ConfigError(
                f"connector {name!r}: sasl.mechanism {mechanism} requires sasl.jaas.config"
            )
        if jaas is not None and not _JAAS_RE.match(jaas):
            # structural check only — never echo the string (credentials)
            raise ConfigError(
                f"connector {name!r}: malformed sasl.jaas.config "
                f"(expected '<LoginModuleClass> required [opts] ;')"
            )
    else:
        if mechanism or jaas is not None:
            raise ConfigError(
                f"connector {name!r}: sasl.* properties set but "
                f"security.protocol is {protocol}"
            )

    ts_loc = props.get("ssl.truststore.location")
    ks_loc = props.get("ssl.keystore.location")
    if not ssl:
        if ts_loc or ks_loc:
            raise ConfigError(
                f"connector {name!r}: ssl.*store properties set but "
                f"security.protocol is {protocol}"
            )
        return
    # SSL leg: stores are optional (system CAs / PEM-inline), but whatever
    # is named must exist, and a password without its store is a config bug.
    if ts_loc is not None:
        _require_file(name, "ssl.truststore.location", ts_loc)
    elif props.get("ssl.truststore.password"):
        raise ConfigError(
            f"connector {name!r}: ssl.truststore.password set without "
            f"ssl.truststore.location"
        )
    # mutual TLS: the client keystore (DockerTestMutualTlsKafka.java:22)
    if ks_loc is not None:
        _require_file(name, "ssl.keystore.location", ks_loc)
    elif props.get("ssl.keystore.password") or props.get("ssl.keystore.key"):
        raise ConfigError(
            f"connector {name!r}: ssl.keystore credentials set without "
            f"ssl.keystore.location"
        )
