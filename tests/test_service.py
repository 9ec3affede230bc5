"""External-index server/client protocol tests.

Mirrors lantern_cli/tests/external_index_server_test.rs: drive the server
as a real socket peer speaking the binary protocol, including router
redirect, error frames, and fault injection.
"""

import asyncio
import json
import threading
import urllib.request

import numpy as np
import pytest

from lantern_tpu.config import HnswParams, Metric, QuantKind
from lantern_tpu.service.client import ExternalIndexClient, build_via_server
from lantern_tpu.service.index_server import IndexServer, RouterServer, ServerStatus
from lantern_tpu.utils.failpoints import (
    FailurePointError,
    failure_point_disable_all,
    failure_point_enable,
)


class _ServerThread:
    """Runs servers on an asyncio loop in a daemon thread."""

    def __init__(self, *servers):
        self.servers = servers
        self.loop = asyncio.new_event_loop()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.started = threading.Event()

    def _run(self):
        asyncio.set_event_loop(self.loop)
        for s in self.servers:
            self.loop.run_until_complete(s.start())
        self.started.set()
        self.loop.run_forever()

    def __enter__(self):
        self.thread.start()
        assert self.started.wait(10)
        return self

    def __exit__(self, *exc):
        for s in self.servers:
            asyncio.run_coroutine_threadsafe(s.stop(), self.loop).result(5)
        self.loop.call_soon_threadsafe(self.loop.stop)
        self.thread.join(5)


@pytest.fixture(autouse=True)
def _clean_failpoints():
    failure_point_disable_all()
    yield
    failure_point_disable_all()


def test_external_build_roundtrip(rng):
    base = rng.standard_normal((500, 16)).astype(np.float32)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    srv = IndexServer(port=0, status_port=0)
    with _ServerThread(srv):
        ix = build_via_server(base, p, "127.0.0.1", srv.port)
        assert ix.size == 500
        d, labels = ix.search(base[:4], k=3, ef=32)
        assert (labels[:, 0] == np.arange(4)).all()
        ix.validate().raise_if_failed()
        # status endpoint reports success
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.status_port}/status", timeout=5
        ) as r:
            status = json.loads(r.read())
        assert status["status"] == ServerStatus.SUCCEEDED


def test_external_build_device_mode(rng):
    """IndexServer(build='device') bulk-builds the streamed tuples on the
    accelerator at END — the server-side analog of the reference putting
    all cores of the indexing machine on the build (server.rs:133-153)."""
    base = rng.standard_normal((400, 16)).astype(np.float32)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    srv = IndexServer(port=0, status_port=0, build="device")
    with _ServerThread(srv):
        ix = build_via_server(base, p, "127.0.0.1", srv.port)
        assert ix.size == 400
        d, labels = ix.search(base[:4], k=3, ef=48)
        assert (labels[:, 0] == np.arange(4)).all()
        ix.validate().raise_if_failed()


def test_router_redirect(rng):
    base = rng.standard_normal((100, 8)).astype(np.float32)
    p = HnswParams(dim=8, m=4, ef_construction=16)
    srv = IndexServer(port=0, status_port=None)
    with _ServerThread(srv):
        router = RouterServer("127.0.0.1", srv.port, port=0)
        with _ServerThread(router):
            ix = build_via_server(base, p, "127.0.0.1", router.port)
            assert ix.size == 100


def test_capacity_doubling(rng):
    """Streaming 2x the declared estimated_capacity must succeed — the
    server doubles the engine instead of erroring (server.rs:243-247)."""
    base = rng.standard_normal((200, 8)).astype(np.float32)
    p = HnswParams(dim=8, m=4, ef_construction=16)
    srv = IndexServer(port=0, status_port=None, add_batch=32)
    with _ServerThread(srv):
        client = ExternalIndexClient("127.0.0.1", srv.port)
        from lantern_tpu.service import protocol as proto

        client.connect()
        init = proto.InitParams.from_hnsw_params(p, 100)  # declare only half
        sock = client._sock
        sock.sendall(init.pack())
        for i in range(200):
            sock.sendall(proto.pack_tuple(i, base[i].tobytes()))
        sock.sendall(proto.pack_end())
        head = client._check_error_frame(client._recv_exact(sock, 8), sock)
        import struct

        (count,) = struct.unpack("<Q", head)
        assert count == 200
        (size,) = struct.unpack("<Q", client._recv_exact(sock, 8))
        data = client._recv_exact(sock, size)
        client.close()
    import tempfile

    from lantern_tpu.index import Index

    with tempfile.NamedTemporaryFile(suffix=".ldb") as tf:
        tf.write(data)
        tf.flush()
        ix = Index.load(tf.name)
        assert ix.size == 200
        ix.validate().raise_if_failed()


def test_server_error_frame(rng):
    """A server-side failure mid-stream must surface as a client error
    carrying the server's actual message (ERR frame parse, not garbage)."""
    base = rng.standard_normal((50, 8)).astype(np.float32)
    p = HnswParams(dim=8, m=4, ef_construction=16)
    srv = IndexServer(port=0, status_port=None)
    with _ServerThread(srv):
        failure_point_enable("_handle_inner", "on_tuple",
                             dont_trigger_first_nr=49)
        try:
            with pytest.raises((RuntimeError, ConnectionError)) as exc:
                ExternalIndexClient("127.0.0.1", srv.port).build(base, p)
        finally:
            failure_point_disable_all()
        if isinstance(exc.value, RuntimeError):
            # when the frame wins the race with the TCP reset, the real
            # server message must come through intact
            assert "failure point" in str(exc.value)


def _self_signed_ssl_contexts(tmp_path):
    """Generate a self-signed cert; return (server_ctx, client_ctx)."""
    import ssl
    import subprocess

    cert = str(tmp_path / "srv.crt")
    key = str(tmp_path / "srv.key")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", key, "-out", cert, "-days", "1", "-subj",
         "/CN=127.0.0.1"],
        check=True, capture_output=True,
    )
    server_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    server_ctx.load_cert_chain(cert, key)
    client_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    client_ctx.check_hostname = False
    client_ctx.verify_mode = ssl.CERT_NONE  # reference test uses a
    # no-verify verifier too (external_index_server_test.rs:26-78)
    return server_ctx, client_ctx


def test_tls_roundtrip(rng, tmp_path):
    """TLS client <-> server build round-trip with a self-signed cert —
    parity with external_index_server_test.rs:26-78."""
    server_ctx, client_ctx = _self_signed_ssl_contexts(tmp_path)
    base = rng.standard_normal((120, 8)).astype(np.float32)
    p = HnswParams(dim=8, m=4, ef_construction=16)
    srv = IndexServer(port=0, status_port=None, ssl_context=server_ctx)
    with _ServerThread(srv):
        client = ExternalIndexClient("127.0.0.1", srv.port,
                                     ssl_context=client_ctx)
        data = client.build(base, p)
    import tempfile

    from lantern_tpu.index import Index

    with tempfile.NamedTemporaryFile(suffix=".ldb") as tf:
        tf.write(data)
        tf.flush()
        ix = Index.load(tf.name)
        assert ix.size == 120
        d, labels = ix.search(base[:2], k=1, ef=16)
        assert (labels[:, 0] == [0, 1]).all()


def test_failure_point_in_client(rng):
    base = rng.standard_normal((20, 8)).astype(np.float32)
    p = HnswParams(dim=8, m=4, ef_construction=16)
    srv = IndexServer(port=0, status_port=None)
    with _ServerThread(srv):
        failure_point_enable("build", "on_send_tuple", dont_trigger_first_nr=5)
        with pytest.raises(FailurePointError):
            build_via_server(base, p, "127.0.0.1", srv.port)
        failure_point_disable_all()
        # server must recover and serve the next build (serial accept loop)
        ix = build_via_server(base, p, "127.0.0.1", srv.port)
        assert ix.size == 20


def test_pq_build_via_server(rng):
    from lantern_tpu.quant import train_codebook

    base = rng.standard_normal((400, 16)).astype(np.float32)
    p = HnswParams(dim=16, m=8, ef_construction=32, pq=True,
                   num_centroids=16, num_subvectors=4)
    cb = train_codebook(base, num_subvectors=4, num_centroids=16, iters=10)
    srv = IndexServer(port=0, status_port=None)
    with _ServerThread(srv):
        ix = build_via_server(base, p, "127.0.0.1", srv.port, codebook=cb)
        assert ix.size == 400
        assert ix._codebook is not None
        np.testing.assert_allclose(ix._codebook.centroids, cb.centroids, rtol=1e-6)
        d, labels = ix.search(base[:4], k=3, ef=32)
        assert labels.shape == (4, 3)


def test_hamming_build_via_server(rng):
    packed = rng.integers(0, 2**32, size=(200, 2), dtype=np.uint32)
    p = HnswParams(dim=64, m=8, ef_construction=32, metric=Metric.HAMMING,
                   quant=QuantKind.B1)
    srv = IndexServer(port=0, status_port=None)
    with _ServerThread(srv):
        ix = build_via_server(packed, p, "127.0.0.1", srv.port)
        assert ix.size == 200
        d, labels = ix.search(packed[:2], k=1, ef=16)
        assert (d[:, 0] == 0).all()


def test_in_process_bgworkers(rng, tmp_path):
    """ServiceHost = the lantern_extras bgworker analog: daemon + indexing
    server inside the embedding process, supervised with restart
    (lib.rs:50-63, 158-237)."""
    from lantern_tpu.service.bgworkers import ServiceConfig, ServiceHost

    cfg = ServiceConfig(
        enable_daemon=True, enable_indexing_server=True,
        indexing_port=0, status_port=0, jobs_dir=str(tmp_path / "jobs"),
        restart_s=0.1,
    )
    base = rng.standard_normal((120, 8)).astype(np.float32)
    p = HnswParams(dim=8, m=4, ef_construction=16)
    with ServiceHost(cfg) as host:
        # indexing server reachable in-process
        ix = build_via_server(base, p, "127.0.0.1", host.indexing_port)
        assert ix.size == 120
        # daemon executes submitted jobs
        from lantern_tpu.service.daemon import JobQueue

        q = JobQueue(cfg.jobs_dir)
        inp = tmp_path / "texts.txt"
        inp.write_text("a doc\nanother doc\n")
        jid = q.submit("embedding", {"input": str(inp),
                                     "output": str(tmp_path / "e.npy"),
                                     "runtime": "hash",
                                     "runtime_args": {"dim": 8}})
        import time as _t

        deadline = _t.time() + 15
        while _t.time() < deadline and q.get(jid)["status"] not in (
            "completed", "failed",
        ):
            _t.sleep(0.05)
        assert q.get(jid)["status"] == "completed", q.get(jid)
        # kill the server thread's loop: the supervisor must bring it back
        old_port = host.indexing_port
        loop = host._server["loop"]
        loop.call_soon_threadsafe(loop.stop)
        deadline = _t.time() + 15
        while _t.time() < deadline and host.restarts == 0:
            _t.sleep(0.05)
        assert host.restarts >= 1
        ix2 = build_via_server(base[:50], p, "127.0.0.1", host.indexing_port)
        assert ix2.size == 50
        del old_port


def test_client_rejects_magic_colliding_labels():
    """A label whose low 32 bits equal a frame magic would read as END/ERR
    server-side (wire ambiguity inherited from the reference) — the client
    must fail fast instead of silently truncating the build."""
    import numpy as np

    from lantern_tpu.config import HnswParams
    from lantern_tpu.service.client import ExternalIndexClient
    from lantern_tpu.service.index_server import IndexServer
    from lantern_tpu.service.protocol import END_MSG

    srv = IndexServer(port=0, status_port=0)
    with _ServerThread(srv):
        vecs = np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32)
        labels = np.array([1, 2, END_MSG, 4], np.uint64)
        c = ExternalIndexClient("127.0.0.1", srv.port)
        with pytest.raises(ValueError, match="protocol magics"):
            c.build(vecs, HnswParams(dim=8, m=4, ef_construction=16),
                    labels=labels)


def test_wire_payload_is_f32_for_scalar_quant():
    """f16/i8 indexes stream f32 rows (the storage kind rides the init
    frame's quantization field) — regression: element_bits 16/8 desynced
    the client's f32 payload from the server's framing."""
    import numpy as np

    from lantern_tpu.config import HnswParams, QuantKind
    from lantern_tpu.service.protocol import InitParams

    for quant in (QuantKind.F16, QuantKind.I8):
        p = HnswParams(dim=16, m=4, ef_construction=16, quant=quant)
        init = InitParams.from_hnsw_params(p, 100)
        assert init.element_bits == 32
        assert init.tuple_payload_bytes == 16 * 4
        assert init.quantization == int(quant)  # storage kind still carried


def test_build_via_server_scalar_quant_end_to_end(tmp_path):
    """An f16-quantized build streams through the server correctly."""
    import numpy as np

    from lantern_tpu.config import HnswParams, QuantKind
    from lantern_tpu.service.client import build_via_server
    from lantern_tpu.service.index_server import IndexServer

    srv = IndexServer(port=0, status_port=0)
    with _ServerThread(srv):
        rng = np.random.default_rng(3)
        vecs = rng.standard_normal((200, 16)).astype(np.float32)
        p = HnswParams(dim=16, m=8, ef_construction=32, quant=QuantKind.F16)
        ix = build_via_server(vecs, p, "127.0.0.1", srv.port)
        assert ix.size == 200
        d, labels = ix.search(vecs[5], k=3, ef=32)
        assert labels[0, 0] == 5
