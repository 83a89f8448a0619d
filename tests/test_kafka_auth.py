"""Kafka SASL auth_config → connector options, mirroring the reference's
mechanism dispatch and required-field validation
(internal/integrations/kafka/auth.go:13-101). No broker needed: the
translation IS the integration (the Spark connector passes kafka.*
options through verbatim)."""

import pytest

from collector_spark.sinks.sinks import KafkaSink
from collector_spark.sources.kafka_auth import kafka_auth_options
from collector_spark.sources.sources import KafkaSource

SCRAM256 = {"scram_sha_256": {"enabled": True, "username": "u", "password": "p"}}
SCRAM512 = {"scram_sha_512": {"enabled": True, "username": "u", "password": "p"}}
KEYTAB = {
    "gssapi_keytab": {
        "enabled": True,
        "username": "svc",
        "keytab_file": "/etc/krb.keytab",
        "realm": "EXAMPLE.COM",
        "service_name": "kafka",
        "config_file": "/etc/krb5.conf",
    }
}


GOOD = [
    (None, {}),
    ({}, {}),
    # disabled block → plaintext (reference newMechanism nil,nil)
    ({"scram_sha_256": {"enabled": False}}, {}),
    (
        SCRAM256,
        {
            "kafka.security.protocol": "SASL_SSL",
            "kafka.sasl.mechanism": "SCRAM-SHA-256",
            "kafka.sasl.jaas.config": (
                "org.apache.kafka.common.security.scram.ScramLoginModule "
                'required username="u" password="p";'
            ),
        },
    ),
    (
        SCRAM512,
        {
            "kafka.security.protocol": "SASL_SSL",
            "kafka.sasl.mechanism": "SCRAM-SHA-512",
            "kafka.sasl.jaas.config": (
                "org.apache.kafka.common.security.scram.ScramLoginModule "
                'required username="u" password="p";'
            ),
        },
    ),
    (
        KEYTAB,
        {
            "kafka.security.protocol": "SASL_SSL",
            "kafka.sasl.mechanism": "GSSAPI",
            "kafka.sasl.kerberos.service.name": "kafka",
            "kafka.sasl.jaas.config": (
                "com.sun.security.auth.module.Krb5LoginModule required "
                "useKeyTab=true storeKey=true "
                'keyTab="/etc/krb.keytab" principal="svc@EXAMPLE.COM";'
            ),
            "_jvm.java.security.krb5.conf": "/etc/krb5.conf",
        },
    ),
]

BAD = [
    # required_if:Enabled,true — struct-tag validation (auth.go:21-52)
    {"scram_sha_256": {"enabled": True, "username": "u"}},
    {"scram_sha_512": {"enabled": True, "password": "p"}},
    {"gssapi_keytab": {"enabled": True, "username": "svc"}},
    # unknown mechanism name
    {"plain": {"enabled": True}},
    # JVM clients cannot do password-based GSSAPI
    {
        "gssapi_password": {
            "enabled": True,
            "username": "u",
            "password": "p",
            "realm": "R",
            "service_name": "kafka",
            "config_file": "/etc/krb5.conf",
        }
    },
]


@pytest.mark.parametrize("auth,expected", GOOD)
def test_auth_translation(auth, expected):
    assert kafka_auth_options(auth) == expected


@pytest.mark.parametrize("auth", BAD)
def test_auth_rejected_at_config_time(auth):
    with pytest.raises(ValueError):
        kafka_auth_options(auth)
    # both source and sink validate in their constructors (reference
    # fails in NewInput/NewOutput, not on first use)
    with pytest.raises(ValueError):
        KafkaSource("b:9092", "t", auth_config=auth)
    with pytest.raises(ValueError):
        KafkaSink("b:9092", "t", auth_config=auth)


def test_dispatch_order_first_enabled_wins():
    """Reference switch order: scram_sha_256 before scram_sha_512
    (auth.go:55-69)."""
    both = {**SCRAM256, **SCRAM512}
    assert kafka_auth_options(both)["kafka.sasl.mechanism"] == "SCRAM-SHA-256"


def test_options_reach_reader_and_writer_builders():
    src = KafkaSource("b:9092", "t", auth_config=SCRAM256)
    opts = src.reader_options()
    assert opts["kafka.sasl.mechanism"] == "SCRAM-SHA-256"
    assert opts["subscribe"] == "t"
    assert not any(k.startswith("_jvm.") for k in opts)

    sink = KafkaSink("b:9092", "t", auth_config=KEYTAB)
    wopts = sink.writer_options()
    assert wopts["kafka.sasl.mechanism"] == "GSSAPI"
    assert wopts["kafka.sasl.kerberos.service.name"] == "kafka"
    assert not any(k.startswith("_jvm.") for k in wopts)


def test_security_protocol_override():
    opts = kafka_auth_options(SCRAM256, security_protocol="SASL_PLAINTEXT")
    assert opts["kafka.security.protocol"] == "SASL_PLAINTEXT"


def test_jaas_escaping():
    auth = {"scram_sha_256": {"enabled": True, "username": 'u"x', "password": "p\\q"}}
    jaas = kafka_auth_options(auth)["kafka.sasl.jaas.config"]
    assert 'username="u\\"x"' in jaas
    assert 'password="p\\\\q"' in jaas
