"""Kafka SASL auth config → Spark Kafka connector options.

Mirrors the reference's auth schema and mechanism dispatch
(internal/integrations/kafka/auth.go:13-101): an ``auth_config`` dict
with up to four mechanism blocks, each gated by ``enabled``; the FIRST
enabled mechanism in the reference's switch order wins
(scram_sha_256 → scram_sha_512 → gssapi_password → gssapi_keytab,
auth.go:55-69).

The JVM Kafka client consumes these as ``kafka.security.protocol`` /
``kafka.sasl.mechanism`` / ``kafka.sasl.jaas.config`` options, which the
Spark connector passes through verbatim — so the translation here is the
whole integration; no sockets are needed to test it.
"""

from __future__ import annotations

_SCRAM_FIELDS = ("username", "password")
_GSSAPI_KEYTAB_FIELDS = ("username", "keytab_file", "realm", "service_name", "config_file")
_GSSAPI_PASSWORD_FIELDS = ("username", "password", "realm", "service_name", "config_file")

#: reference switch order (auth.go:55-69)
MECHANISMS = (
    ("scram_sha_256", _SCRAM_FIELDS),
    ("scram_sha_512", _SCRAM_FIELDS),
    ("gssapi_password", _GSSAPI_PASSWORD_FIELDS),
    ("gssapi_keytab", _GSSAPI_KEYTAB_FIELDS),
)


def _jaas_escape(v: str) -> str:
    return str(v).replace("\\", "\\\\").replace('"', '\\"')


def _require(name: str, block: dict, fields: tuple[str, ...]) -> None:
    """required_if:Enabled,true validation (auth.go:21-52 struct tags)."""
    missing = [f for f in fields if not block.get(f)]
    if missing:
        raise ValueError(
            f"kafka auth {name!r} enabled but missing required fields: {missing}"
        )


def kafka_auth_options(
    auth_config: dict | None, security_protocol: str = "SASL_SSL"
) -> dict[str, str]:
    """Translate the reference auth_config to ``kafka.*`` reader/writer
    options. Returns {} when auth_config is None/empty or no mechanism is
    enabled (plaintext broker — reference newMechanism returns nil,nil).
    """
    if not auth_config:
        return {}
    unknown = set(auth_config) - {m for m, _ in MECHANISMS}
    if unknown:
        raise ValueError(
            f"unknown kafka auth mechanism(s): {sorted(unknown)}; "
            f"supported: {[m for m, _ in MECHANISMS]}"
        )
    for name, fields in MECHANISMS:
        block = auth_config.get(name) or {}
        if not block.get("enabled"):
            continue
        _require(name, block, fields)
        if name in ("scram_sha_256", "scram_sha_512"):
            mech = "SCRAM-SHA-256" if name == "scram_sha_256" else "SCRAM-SHA-512"
            jaas = (
                "org.apache.kafka.common.security.scram.ScramLoginModule required "
                f'username="{_jaas_escape(block["username"])}" '
                f'password="{_jaas_escape(block["password"])}";'
            )
            return {
                "kafka.security.protocol": security_protocol,
                "kafka.sasl.mechanism": mech,
                "kafka.sasl.jaas.config": jaas,
            }
        if name == "gssapi_keytab":
            principal = f'{block["username"]}@{block["realm"]}'
            jaas = (
                "com.sun.security.auth.module.Krb5LoginModule required "
                "useKeyTab=true storeKey=true "
                f'keyTab="{_jaas_escape(block["keytab_file"])}" '
                f'principal="{_jaas_escape(principal)}";'
            )
            return {
                "kafka.security.protocol": security_protocol,
                "kafka.sasl.mechanism": "GSSAPI",
                "kafka.sasl.kerberos.service.name": block["service_name"],
                "kafka.sasl.jaas.config": jaas,
                # krb5.conf is a JVM property, surfaced so deployers can
                # set -Djava.security.krb5.conf on driver+executors
                "_jvm.java.security.krb5.conf": block["config_file"],
            }
        # gssapi_password: the JVM Krb5LoginModule cannot take a password
        # from JAAS config (it authenticates via keytab or ticket cache);
        # the reference's password path (auth.go:73-81) has no faithful
        # JVM-client equivalent — fail loud instead of silently degrading.
        raise ValueError(
            "kafka auth 'gssapi_password' is not supported by JVM Kafka "
            "clients (Krb5LoginModule takes no password); use "
            "'gssapi_keytab' or a kinit ticket cache"
        )
    return {}
