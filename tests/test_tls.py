"""TLS 1.3 transport parity (``cass_cdc_pg_spark/tls.py`` vs
reference ``src/config/tls_config.py``) — context pinning, the
Kafka/JDBC option contracts, and the API server actually serving
TLS 1.3 over a real socket (handshake + request + mutual-TLS
rejection), with certs minted by the openssl CLI."""

from __future__ import annotations

import json
import ssl
import subprocess
import urllib.request

import pytest

from cass_cdc_pg_spark import tls

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- unit


def test_client_context_pins_tls13():
    ctx = tls.create_tls_context(verify_mode=ssl.CERT_NONE)
    assert ctx.minimum_version == ssl.TLSVersion.TLSv1_3
    assert ctx.maximum_version == ssl.TLSVersion.TLSv1_3
    assert ctx.verify_mode == ssl.CERT_NONE
    assert ctx.check_hostname is False


def test_client_context_verifies_by_default():
    ctx = tls.create_tls_context()
    assert ctx.verify_mode == ssl.CERT_REQUIRED
    assert ctx.check_hostname is True


def test_pinned_ca_is_sole_trust_anchor(certs):
    """A supplied ca_file REPLACES the system bundle rather than being
    merged into it — otherwise any publicly-issued cert for the target
    hostname would still verify and the pin is meaningless (r9 ADVICE;
    the reference's bare PROTOCOL_TLS_CLIENT context has the same
    sole-anchor property)."""
    crt, _ = certs["server"]
    pinned = tls.create_tls_context(ca_file=crt)
    assert pinned.cert_store_stats()["x509_ca"] == 1
    # sanity: without a pin the default bundle loads (many CAs)
    system = tls.create_tls_context()
    assert system.cert_store_stats()["x509_ca"] > 1


def test_kafka_options_pem_shape(tmp_path):
    """The JVM Kafka client (KIP-651 PEM support) takes the private
    key INLINE as ssl.keystore.key + the chain as
    ssl.keystore.certificate.chain — librdkafka's ssl.key.location is
    ignored by the Java client and a cert-only PEM keystore location
    is rejected at startup, so the options must carry file CONTENTS
    for the keystore and a path only for the truststore."""
    cert = tmp_path / "c.pem"
    key = tmp_path / "k.pem"
    cert.write_text("CERT-PEM-BODY")
    key.write_text("KEY-PEM-BODY")
    opts = tls.kafka_ssl_options(str(cert), str(key), "ca.pem")
    assert opts["kafka.security.protocol"] == "SSL"
    assert opts["kafka.ssl.enabled.protocols"] == "TLSv1.3"
    assert opts["kafka.ssl.truststore.type"] == "PEM"
    assert opts["kafka.ssl.truststore.location"] == "ca.pem"
    assert opts["kafka.ssl.keystore.type"] == "PEM"
    assert opts["kafka.ssl.keystore.certificate.chain"] == "CERT-PEM-BODY"
    assert opts["kafka.ssl.keystore.key"] == "KEY-PEM-BODY"
    assert "kafka.ssl.key.location" not in opts
    assert "kafka.ssl.keystore.location" not in opts
    # minimal form: no file entries at all
    assert set(tls.kafka_ssl_options()) == {
        "kafka.security.protocol",
        "kafka.ssl.enabled.protocols",
        "kafka.ssl.protocol",
    }
    # path-only mTLS alternative: combined key+cert PEM by location —
    # no secret material enters the option map (no redaction caveat)
    opts2 = tls.kafka_ssl_options(ca_file="ca.pem", keystore_location="kc.pem")
    assert opts2["kafka.ssl.keystore.location"] == "kc.pem"
    assert "kafka.ssl.keystore.key" not in opts2
    assert "kafka.ssl.keystore.certificate.chain" not in opts2


def test_jdbc_properties_escalate_with_ca():
    assert tls.jdbc_ssl_properties()["sslmode"] == "require"
    props = tls.jdbc_ssl_properties("c.pem", "k.pem", "ca.pem")
    assert props["sslmode"] == "verify-full"
    assert props["sslrootcert"] == "ca.pem"
    assert props["sslcert"] == "c.pem"
    assert props["sslkey"] == "k.pem"


# ---------------------------------------------------- e2e over sockets


@pytest.fixture(scope="module")
def certs(tmp_path_factory):
    """Self-signed server cert + a distinct client cert, openssl CLI."""
    d = tmp_path_factory.mktemp("tls")
    out = {}
    for name, cn in (("server", "127.0.0.1"), ("client", "cdc-client")):
        crt, key = d / f"{name}.crt", d / f"{name}.key"
        subprocess.run(
            [
                "openssl", "req", "-x509", "-newkey", "ec",
                "-pkeyopt", "ec_paramgen_curve:prime256v1",
                "-keyout", str(key), "-out", str(crt),
                "-days", "2", "-nodes", "-subj", f"/CN={cn}",
                "-addext", "subjectAltName=IP:127.0.0.1",
            ],
            check=True, capture_output=True,
        )
        out[name] = (str(crt), str(key))
    return out


@pytest.fixture(scope="module")
def tls_server(spark, certs):
    from cass_cdc_pg_spark.api import CdcApiServer, CdcApiService

    crt, key = certs["server"]
    srv = CdcApiServer(CdcApiService(spark, sf_dir=SF))
    tls.secure_server(srv, cert_file=crt, key_file=key)
    host, port = srv.start()
    yield f"https://{host}:{port}", crt
    srv.stop()


def _https_get(url: str, ctx: ssl.SSLContext):
    with urllib.request.urlopen(url, timeout=60, context=ctx) as resp:
        return resp.status, json.loads(resp.read())


def test_api_serves_tls13(tls_server):
    base, server_crt = tls_server
    ctx = tls.create_tls_context(ca_file=server_crt)
    ctx.check_hostname = False  # CN cert; SAN covers the IP but keep lax
    status, body = _https_get(base + "/health", ctx)
    assert status == 200 and body["status"] in ("healthy", "degraded")


def test_negotiated_protocol_is_tls13(tls_server, certs):
    import socket

    base, server_crt = tls_server
    host, port = base.removeprefix("https://").split(":")
    ctx = tls.create_tls_context(ca_file=server_crt)
    ctx.check_hostname = False
    with socket.create_connection((host, int(port)), timeout=30) as raw:
        with ctx.wrap_socket(raw) as s:
            assert s.version() == "TLSv1.3"


def test_plaintext_client_rejected(tls_server):
    base, _ = tls_server
    with pytest.raises(Exception):  # server refuses non-TLS bytes
        urllib.request.urlopen(
            base.replace("https://", "http://") + "/health", timeout=30
        )


@pytest.fixture(scope="module")
def mtls_server(spark, certs):
    from cass_cdc_pg_spark.api import CdcApiServer, CdcApiService

    crt, key = certs["server"]
    client_crt, _ = certs["client"]
    srv = CdcApiServer(CdcApiService(spark, sf_dir=SF))
    # trust exactly the client's self-signed cert as the client CA
    tls.secure_server(srv, cert_file=crt, key_file=key, ca_file=client_crt)
    host, port = srv.start()
    yield f"https://{host}:{port}", crt
    srv.stop()


def test_mutual_tls_requires_client_cert(mtls_server, certs):
    base, server_crt = mtls_server
    bare = tls.create_tls_context(ca_file=server_crt)
    bare.check_hostname = False
    with pytest.raises(Exception):  # no client cert → handshake fails
        _https_get(base + "/health", bare)

    client_crt, client_key = certs["client"]
    authed = tls.create_tls_context(
        cert_file=client_crt, key_file=client_key, ca_file=server_crt
    )
    authed.check_hostname = False
    status, _ = _https_get(base + "/health", authed)
    assert status == 200


def test_kafka_ssl_rejects_conflicting_mtls_identities(tmp_path):
    """keystore_location and cert_file/key_file are alternative mTLS
    identities — supplying both must raise, not silently prefer one
    (a misconfigured client identity would otherwise pass unnoticed)."""
    import pytest

    from cass_cdc_pg_spark.tls import kafka_ssl_options

    pem = tmp_path / "id.pem"
    pem.write_text("dummy")
    with pytest.raises(ValueError, match="not both"):
        kafka_ssl_options(keystore_location=str(pem), cert_file=str(pem))
    with pytest.raises(ValueError, match="not both"):
        kafka_ssl_options(keystore_location=str(pem), key_file=str(pem))
