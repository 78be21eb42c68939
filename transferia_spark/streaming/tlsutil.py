"""Shared client-side TLS ladder for the wire planes.

One trust policy, used identically by the Kafka, Mongo and Schema
Registry clients (and matching the PG/MySQL session ladders'
semantics): a ``tls_ca`` file pins trust to exactly that CA with
hostname verification (the ``verify-full`` analog); ``tls_insecure``
is the explicit opt-out (no verification — lab/self-signed only);
otherwise the system trust store applies with hostname checking
(public-CA deployments). ≈ the reference's TLS connection options
(``pkg/providers/kafka/model_connection.go:8-25``,
``pkg/providers/mongo/client.go`` TLSFile / CACert plumbing,
``pkg/parsers/registry/confluentschemaregistry/..._common.go:12``).
"""

from __future__ import annotations

import ssl


def client_tls_context(
    tls_ca: str | None = None, tls_insecure: bool = False
) -> ssl.SSLContext:
    """Build the client context for one of the three trust modes."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    if tls_ca:
        # trust exactly the given CA, hostname checked
        ctx.load_verify_locations(tls_ca)
    elif tls_insecure:
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    else:
        # system trust store, hostname checked
        ctx.load_default_certs(ssl.Purpose.SERVER_AUTH)
    return ctx


def wrap_client_tls(
    sock,
    server_hostname: str,
    tls_ca: str | None = None,
    tls_insecure: bool = False,
):
    """Wrap an already-connected socket in implicit TLS."""
    return client_tls_context(tls_ca, tls_insecure).wrap_socket(
        sock, server_hostname=server_hostname
    )
