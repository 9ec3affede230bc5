"""HTTP API, embeddings, daemon, autotune, CLI tests (R4-R8 analogs)."""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from lantern_tpu.embeddings import (
    HashRuntime,
    get_available_models,
    get_available_runtimes,
    text_embedding,
)
from lantern_tpu.service.daemon import Daemon, JobQueue
from lantern_tpu.service.http_api import HttpApi


def _req(method, url, body=None, auth=None, timeout=10):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    if auth:
        import base64

        req.add_header("Authorization",
                       "Basic " + base64.b64encode(auth.encode()).decode())
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def api():
    api = HttpApi(port=0).start()
    yield api
    api.stop()


def test_http_collection_lifecycle(api, rng):
    base = f"http://127.0.0.1:{api.port}"
    code, info = _req("GET", base + "/")
    assert code == 200 and "endpoints" in info
    code, _ = _req("POST", base + "/collections", {"name": "movies", "metric": "l2sq"})
    assert code == 201
    # duplicate rejected
    with pytest.raises(urllib.error.HTTPError) as e:
        _req("POST", base + "/collections", {"name": "movies"})
    assert e.value.code == 409
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    rows = [{"vector": v.tolist(), "title": f"movie {i}"} for i, v in enumerate(vecs)]
    code, res = _req("POST", base + "/collections/movies/rows", {"rows": rows})
    assert code == 200 and res["inserted"] == 50
    code, res = _req("POST", base + "/collections/movies/search",
                     {"vector": vecs[7].tolist(), "k": 3})
    assert code == 200
    assert res["results"][0]["title"] == "movie 7"
    assert res["results"][0]["distance"] < 1e-3
    code, cols = _req("GET", base + "/collections")
    assert cols[0]["size"] == 50
    code, _ = _req("DELETE", base + "/collections/movies")
    assert code == 200


def test_http_delete_rows_and_compact(api, rng):
    base = f"http://127.0.0.1:{api.port}"
    _req("POST", base + "/collections", {"name": "trash", "metric": "l2sq"})
    vecs = rng.standard_normal((60, 8)).astype(np.float32)
    rows = [{"vector": v.tolist(), "t": i} for i, v in enumerate(vecs)]
    code, res = _req("POST", base + "/collections/trash/rows", {"rows": rows})
    ids = res["ids"]
    # tombstone the first 30, then reclaim them
    code, res = _req("DELETE", base + "/collections/trash/rows",
                     {"ids": ids[:30]})
    assert code == 200 and res["deleted"] == 30
    code, res = _req("POST", base + "/collections/trash/search",
                     {"vector": vecs[0].tolist(), "k": 3})
    assert all(r["id"] != ids[0] for r in res["results"])
    code, res = _req("POST", base + "/collections/trash/compact", {})
    assert code == 200 and res["reclaimed"] == 30 and res["size"] == 30
    code, res = _req("POST", base + "/collections/trash/search",
                     {"vector": vecs[45].tolist(), "k": 3})
    assert res["results"][0]["id"] == ids[45]
    assert res["results"][0]["t"] == 45
    _req("DELETE", base + "/collections/trash")


def test_http_text_search(api):
    base = f"http://127.0.0.1:{api.port}"
    _req("POST", base + "/collections", {"name": "docs", "metric": "cosine"})
    texts = ["the quick brown fox", "lazy dogs sleep all day", "tpu vector search"]
    rows = [
        {"vector": text_embedding("hash", t, dim=64).tolist(), "text": t}
        for t in texts
    ]
    _req("POST", base + "/collections/docs/rows", {"rows": rows})
    code, res = _req("POST", base + "/collections/docs/search",
                     {"text": "quick fox", "k": 1})
    assert code == 200
    assert res["results"][0]["text"] == "the quick brown fox"


def test_http_auth():
    api = HttpApi(port=0, username="admin", password="secret").start()
    try:
        base = f"http://127.0.0.1:{api.port}"
        with pytest.raises(urllib.error.HTTPError) as e:
            _req("GET", base + "/collections")
        assert e.value.code == 401
        code, _ = _req("GET", base + "/collections", auth="admin:secret")
        assert code == 200
    finally:
        api.stop()


def test_embeddings_runtimes():
    assert "hash" in get_available_runtimes()
    assert any(m["runtime"] == "openai" for m in get_available_models())
    rt = HashRuntime(dim=64)
    e = rt.process(["hello world", "hello world", "different text"])
    assert e.shape == (3, 64)
    np.testing.assert_array_equal(e[0], e[1])  # deterministic
    assert np.linalg.norm(e[0] - e[2]) > 0.1
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, rtol=1e-5)


def test_openai_runtime_against_mock():
    """REST runtime speaks the OpenAI wire format (mock server)."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Mock(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            req = json.loads(self.rfile.read(n))
            assert self.headers["Authorization"] == "Bearer test-key"
            body = json.dumps({
                "data": [
                    {"embedding": [float(len(t)), 1.0]} for t in req["input"]
                ]
            }).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Mock)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from lantern_tpu.embeddings import OpenAiRuntime

        rt = OpenAiRuntime("test-key", base_url=f"http://127.0.0.1:{srv.server_address[1]}")
        out = rt.process(["ab", "abcd"])
        np.testing.assert_array_equal(out, [[2.0, 1.0], [4.0, 1.0]])
    finally:
        srv.shutdown()


def test_daemon_jobs(tmp_path, rng):
    q = JobQueue(str(tmp_path / "jobs"))
    # embedding job
    inp = tmp_path / "texts.txt"
    inp.write_text("hello world\nvector search on tpu\n")
    out = tmp_path / "emb.npy"
    j1 = q.submit("embedding", {"input": str(inp), "output": str(out),
                                "runtime": "hash", "runtime_args": {"dim": 32}})
    # index job
    vecs = rng.standard_normal((200, 8)).astype(np.float32)
    vecs_path = tmp_path / "vecs.npy"
    np.save(vecs_path, vecs)
    j2 = q.submit("index", {"input": str(vecs_path),
                            "output": str(tmp_path / "ix.ldb"), "m": 8})
    # failing job
    j3 = q.submit("embedding", {"input": "/nonexistent", "output": "x"})

    d = Daemon(q, backoff_base_s=0.01)
    d.run_pending()
    assert q.get(j1)["status"] == "completed"
    assert q.get(j1)["usage"]["rows"] == 2
    assert np.load(out).shape == (2, 32)
    assert q.get(j2)["status"] == "completed"
    from lantern_tpu.index import Index

    ix = Index.load(str(tmp_path / "ix.ldb"))
    assert ix.size == 200
    j3_doc = q.get(j3)
    assert j3_doc["status"] == "failed" and "nonexistent" in j3_doc["error"]


def test_autotune_small(rng):
    from lantern_tpu.autotune import autotune

    vectors = rng.standard_normal((800, 16)).astype(np.float32)
    best, results = autotune(
        vectors, k=5, target_recall=0.8, sample=800, num_queries=8,
        variants=((8, 40, 64), (16, 60, 76)), engine="native",
    )
    assert len(results) == 2
    assert all(0 <= r.recall <= 1 for r in results)
    assert best is not None and best.recall >= 0.8


def test_cli_pipeline(tmp_path, rng, capsys):
    from lantern_tpu.cli import main

    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    np.save(tmp_path / "data.npy", vecs)
    np.save(tmp_path / "q.npy", vecs[:2])
    main(["build-index", "--input", str(tmp_path / "data.npy"),
          "--output", str(tmp_path / "ix.ldb"), "--m", "8"])
    assert "built 300" in capsys.readouterr().out
    main(["search", "--index", str(tmp_path / "ix.ldb"),
          "--queries", str(tmp_path / "q.npy"), "--k", "3"])
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[0])[0]["label"] == 0
    main(["pq-table", "--input", str(tmp_path / "data.npy"),
          "--output", str(tmp_path / "pq.npz"), "--clusters", "16", "--splits", "4"])
    z = np.load(tmp_path / "pq.npz")
    assert z["codebook"].shape == (4, 16, 4) and z["codes"].shape == (300, 4)
    inp = tmp_path / "texts.txt"
    inp.write_text("a\nb\nc\n")
    main(["create-embeddings", "--input", str(inp),
          "--output", str(tmp_path / "e.npy"), "--runtime", "hash"])
    assert np.load(tmp_path / "e.npy").shape[0] == 3


def test_http_models_endpoints(api):
    base = f"http://127.0.0.1:{api.port}"
    code, models = _req("GET", base + "/models")
    assert code == 200 and any(m["runtime"] == "hash" for m in models)
    code, runtimes = _req("GET", base + "/runtimes")
    assert code == 200 and "openai" in runtimes


def test_daemon_completion_job(tmp_path):
    """add_completion_job analog: one LLM completion per input row with
    per-row failure accounting (lantern_extras/src/daemon.rs:121-227)."""
    import json

    q = JobQueue(str(tmp_path / "jobs"))
    inp = tmp_path / "prompts.txt"
    inp.write_text("hello world\nsecond prompt\n")
    out = tmp_path / "completions.jsonl"
    jid = q.submit("completion", {"input": str(inp), "output": str(out),
                                  "runtime": "hash"})
    Daemon(q, backoff_base_s=0.01).run_pending()
    job = q.get(jid)
    assert job["status"] == "completed", job.get("error")
    assert job["usage"] == {"rows": 2, "failures": 0}
    rows = [json.loads(line) for line in out.read_text().splitlines()]
    assert len(rows) == 2 and all(r["output"].startswith("completion:") for r in rows)
    # deterministic runtime: same prompt -> same completion
    from lantern_tpu.embeddings import llm_completion

    assert rows[0]["output"] == llm_completion("hello world", runtime="hash")


def test_daemon_continuous_watch_job(tmp_path):
    """Client-job analog: rows appended to the input AFTER the job started
    are embedded continuously (client_embedding_jobs.rs:84-139)."""
    import time as _time

    import numpy as np

    q = JobQueue(str(tmp_path / "jobs"))
    inp = tmp_path / "texts.txt"
    inp.write_text("first row\n")
    out = tmp_path / "emb.npy"
    jid = q.submit("embedding", {"input": str(inp), "output": str(out),
                                 "runtime": "hash", "watch": True,
                                 "runtime_args": {"dim": 16}})
    d = Daemon(q, poll_s=0.02, backoff_base_s=0.01).start()
    try:
        deadline = _time.time() + 10
        while _time.time() < deadline:
            if out.exists() and q.get(jid).get("usage", {}).get("rows") == 1:
                break
            _time.sleep(0.02)
        assert q.get(jid)["usage"]["rows"] == 1
        # append rows after the job started (the reference's INSERT trigger)
        with open(inp, "a") as f:
            f.write("second row\nthird row\n")
        while _time.time() < deadline:
            if q.get(jid).get("usage", {}).get("rows") == 3:
                break
            _time.sleep(0.02)
        assert q.get(jid)["usage"]["rows"] == 3
        embs = np.load(out)
        assert embs.shape == (3, 16)
        # cancel terminates the watcher
        q.cancel(jid)
        _time.sleep(0.1)
        assert q.get(jid)["status"] == "canceled"
    finally:
        d.stop()


def test_local_transformer_runtime_poolings(tmp_path):
    """The Ort-runtime analog with a tiny offline BERT (no downloads):
    pooling variants + dynamic batch sizing (ort_runtime.rs:31-134, :318)."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel, BertTokenizerFast

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "hello", "world", "doc", "##s", "a"]
    ))
    tok = BertTokenizerFast(vocab_file=str(vocab))
    cfg = BertConfig(vocab_size=tok.vocab_size, hidden_size=16,
                     num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=32, max_position_embeddings=64)
    torch.manual_seed(0)
    model = BertModel(cfg)

    from lantern_tpu.embeddings import LocalTransformerRuntime

    texts = ["hello world", "a doc", "hello docs world"]
    outs = {}
    for pooling in LocalTransformerRuntime.POOLINGS:
        rt = LocalTransformerRuntime(model=model, tokenizer=tok,
                                     pooling=pooling, batch_size=2,
                                     max_length=16)
        e = rt.process(texts)
        assert e.shape == (3, 16) and np.isfinite(e).all()
        outs[pooling] = e
    # poolings are genuinely different reductions
    assert not np.allclose(outs["mean"], outs["cls"])
    assert (outs["relu_log_max"] >= 0).all()
    # dynamic batch sizing picks something sane
    rt = LocalTransformerRuntime(model=model, tokenizer=tok, batch_size=0,
                                 max_length=16)
    assert 1 <= rt.batch_size <= 512
    with pytest.raises(ValueError, match="pooling"):
        LocalTransformerRuntime(model=model, tokenizer=tok, pooling="nope")


def test_autotune_prior_result_reuse(tmp_path, rng):
    """mod.rs:111-159 parity: a stored result for the model short-circuits
    the sweep; fresh sweeps append to the store."""
    from lantern_tpu.autotune import autotune

    vectors = rng.standard_normal((400, 8)).astype(np.float32)
    store = str(tmp_path / "autotune.json")
    best1, res1 = autotune(
        vectors, sample=400, target_recall=0.5,
        variants=((6, 32, 64), (8, 40, 64)), engine="device",
        model_name="my-model", results_path=store,
    )
    assert best1 is not None and len(res1) == 2
    # second call must reuse (returns exactly one stored row, no sweep)
    best2, res2 = autotune(
        vectors, sample=400, target_recall=0.5,
        variants=((6, 32, 64), (8, 40, 64)), engine="device",
        model_name="my-model", results_path=store,
    )
    assert len(res2) == 1
    assert (best2.m, best2.ef_construction, best2.ef) == (
        best1.m, best1.ef_construction, best1.ef
    )
    # a different model name sweeps fresh
    best3, res3 = autotune(
        vectors, sample=400, target_recall=0.5,
        variants=((6, 32, 64),), engine="device",
        model_name="other-model", results_path=store,
    )
    assert len(res3) == 1 and best3 is not None


def test_model_catalog_and_onnx_gate():
    """get_available_models covers the reference's ONNX registry names
    (ort_runtime.rs:284-302) with textual/visual split; the onnx runtime
    errors clearly when onnxruntime is absent."""
    from lantern_tpu.embeddings import ONNX_MODELS, get_available_models

    models = {m["name"]: m for m in get_available_models()}
    for name in ("clip/ViT-B-32-textual", "clip/ViT-B-32-visual",
                 "BAAI/bge-small-en", "naver/splade-v3",
                 "jinaai/jina-embeddings-v2-base-en"):
        assert name in models
    assert models["clip/ViT-B-32-visual"]["visual"]
    assert not models["clip/ViT-B-32-textual"]["visual"]
    assert models["naver/splade-v3"]["pooling"] == "relu_log_max"
    assert len(ONNX_MODELS) == 17

    try:
        import onnxruntime  # noqa: F401
        pytest.skip("onnxruntime installed; gate not exercised")
    except ImportError:
        pass
    from lantern_tpu.embeddings import get_runtime

    with pytest.raises(RuntimeError, match="onnxruntime"):
        get_runtime("onnx", model_path="/nonexistent.onnx")


def test_local_vision_runtime(tmp_path):
    """CLIP-visual analog (ort_runtime.rs:286,673) with a tiny offline ViT
    injected — image batches embed to the pooled dimension."""
    torch = pytest.importorskip("torch")
    from transformers import ViTConfig, ViTImageProcessor, ViTModel

    cfg = ViTConfig(hidden_size=16, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=32,
                    image_size=32, patch_size=16, num_channels=3)
    torch.manual_seed(0)
    model = ViTModel(cfg)
    proc = ViTImageProcessor(size={"height": 32, "width": 32},
                             do_normalize=False)

    from lantern_tpu.embeddings import LocalVisionRuntime

    rt = LocalVisionRuntime(model=model, processor=proc, batch_size=2)
    imgs = [np.random.default_rng(i).integers(
        0, 255, (32, 32, 3), dtype=np.uint8) for i in range(3)]
    e = rt.process(imgs)
    assert e.shape == (3, 16) and np.isfinite(e).all()


def test_http_pq_requantize_and_rerank(api, rng):
    """POST /pq rebuilds the collection as a PQ index (the reference's pq
    route quantizes the table, http_server/pq.rs); /search then runs ADC
    over codes, and "rerank" re-scores the shortlist on raw rows."""
    base = f"http://127.0.0.1:{api.port}"
    _req("POST", base + "/collections", {"name": "pqcol", "metric": "l2sq"})
    vecs = rng.standard_normal((400, 32)).astype(np.float32)
    rows = [{"vector": v.tolist(), "i": i} for i, v in enumerate(vecs)]
    code, _ = _req("POST", base + "/collections/pqcol/rows", {"rows": rows})
    assert code == 200
    code, res = _req("POST", base + "/collections/pqcol/pq",
                     {"num_subvectors": 8, "num_centroids": 32}, timeout=300)
    assert code == 200 and res["requantized"] == 400
    assert res["codebook"] == [8, 32, 4]
    code, res = _req("POST", base + "/collections/pqcol/search",
                     {"vector": vecs[7].tolist(), "k": 3}, timeout=120)
    assert code == 200 and len(res["results"]) == 3
    code, res = _req("POST", base + "/collections/pqcol/search",
                     {"vector": vecs[7].tolist(), "k": 3, "rerank": 50},
                     timeout=120)
    assert code == 200
    # exact rerank must surface the true nearest row first (distance is
    # true-to-bf16: the device rerank copy stores rows as bf16)
    assert res["results"][0]["i"] == 7
    assert res["results"][0]["distance"] < 0.05


def test_http_external_index_rebuild(api, rng):
    """POST /index with external=true rebuilds via the device builder
    (the CREATE INDEX WITH (external=true) analog, index.rs:51-84)."""
    base = f"http://127.0.0.1:{api.port}"
    _req("POST", base + "/collections", {"name": "ext", "metric": "l2sq"})
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    rows = [{"vector": v.tolist(), "i": i} for i, v in enumerate(vecs)]
    code, _ = _req("POST", base + "/collections/ext/rows", {"rows": rows})
    assert code == 200
    # device build jit-compiles on first use: generous timeout
    code, res = _req("POST", base + "/collections/ext/index",
                     {"external": True, "m": 8, "ef_construction": 48},
                     timeout=300)
    assert code == 200 and res["indexed"] == 300
    code, res = _req("POST", base + "/collections/ext/search",
                     {"vector": vecs[5].tolist(), "k": 3})
    assert code == 200 and res["results"][0]["i"] == 5


def test_http_collection_persistence(tmp_path, rng):
    """data_dir collections survive a server restart (the durability the
    reference gets from Postgres-backed collections)."""
    d = str(tmp_path / "apidata")
    api = HttpApi(port=0, data_dir=d).start()
    base = f"http://127.0.0.1:{api.port}"
    _req("POST", base + "/collections", {"name": "persist", "metric": "l2sq"})
    vecs = rng.standard_normal((30, 8)).astype(np.float32)
    rows = [{"vector": v.tolist(), "tag": i} for i, v in enumerate(vecs)]
    code, res = _req("POST", base + "/collections/persist/rows", {"rows": rows})
    ids = res["ids"]
    code, res = _req("POST", base + "/save")
    assert code == 200 and "persist" in res["saved"]
    api.stop()  # also saves

    api2 = HttpApi(port=0, data_dir=d).start()
    base = f"http://127.0.0.1:{api2.port}"
    code, cols = _req("GET", base + "/collections")
    assert cols[0]["name"] == "persist" and cols[0]["size"] == 30
    code, res = _req("POST", base + "/collections/persist/search",
                     {"vector": vecs[7].tolist(), "k": 3})
    assert res["results"][0]["id"] == ids[7]
    assert res["results"][0]["tag"] == 7
    # inserts continue with non-colliding ids after reload
    code, res = _req("POST", base + "/collections/persist/rows",
                     {"rows": [{"vector": vecs[0].tolist(), "tag": 99}]})
    assert res["ids"][0] not in ids
    api2.stop()


def test_http_index_reparam_rebuilds(api, rng):
    """POST /index with new params on an existing index rebuilds it
    (regression: it silently no-opped and replied success)."""
    base = f"http://127.0.0.1:{api.port}"
    _req("POST", base + "/collections", {"name": "reparam", "metric": "l2sq"})
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    _req("POST", base + "/collections/reparam/rows",
         {"rows": [{"vector": v.tolist()} for v in vecs]})
    code, res = _req("POST", base + "/collections/reparam/index",
                     {"m": 24, "ef_construction": 200})
    assert code == 200
    col = api.state.collections["reparam"]
    assert col.index.params.m == 24
    assert col.index.params.ef_construction == 200
    code, res = _req("POST", base + "/collections/reparam/search",
                     {"vector": vecs[4].tolist(), "k": 1})
    assert res["results"][0]["id"] == 5  # ids start at 1
    _req("DELETE", base + "/collections/reparam")


def test_http_hamming_collection(api, rng):
    """Hamming collections binarize raw bit vectors (regression: f32
    coercion value-cast packed words)."""
    base = f"http://127.0.0.1:{api.port}"
    _req("POST", base + "/collections", {"name": "bits", "metric": "hamming"})
    vecs = rng.standard_normal((50, 64)).astype(np.float32)
    code, res = _req("POST", base + "/collections/bits/rows",
                     {"rows": [{"vector": v.tolist(), "i": i}
                               for i, v in enumerate(vecs)]})
    assert code == 200
    code, res = _req("POST", base + "/collections/bits/search",
                     {"vector": vecs[9].tolist(), "k": 1})
    assert res["results"][0]["i"] == 9
    assert res["results"][0]["distance"] == 0.0
    _req("DELETE", base + "/collections/bits")


def test_master_daemon_lifecycle(tmp_path):
    """Master mode (daemon/mod.rs:217-344): add target -> jobs run; kill the
    target's heartbeat -> all its jobs canceled within a ping; remove the
    target -> daemon stopped and forgotten."""
    import pathlib
    import time

    import numpy as np

    from lantern_tpu.service.daemon import (
        JobQueue,
        MasterDaemon,
        TargetRegistry,
    )

    reg = TargetRegistry(str(tmp_path / "registry.json"))
    md = MasterDaemon(reg, poll_s=0.02, ping_s=0.05,
                      heartbeat_timeout_s=0.3, daemon_poll_s=0.02).start()
    try:
        # --- add a target with a live heartbeat: its jobs run ---
        jobs_a = str(tmp_path / "a_jobs")
        hb_a = tmp_path / "a.heartbeat"
        hb_a.touch()
        reg.add("a", jobs_a, heartbeat=str(hb_a))
        inp = tmp_path / "texts.txt"
        inp.write_text("hello\nworld\n")
        deadline = time.time() + 5
        while "a" not in md.status() and time.time() < deadline:
            time.sleep(0.02)
        qa = JobQueue(jobs_a)
        jid = qa.submit("embedding", {"input": str(inp),
                                      "output": str(tmp_path / "a_out.npy")})
        while qa.get(jid)["status"] != "completed" and time.time() < deadline:
            hb_a.touch()  # keep the target healthy while the job runs
            time.sleep(0.02)
        assert qa.get(jid)["status"] == "completed"
        assert np.load(str(tmp_path / "a_out.npy")).shape[0] == 2

        # --- heartbeat goes stale: queued jobs canceled within a ping ---
        j2 = qa.submit("embedding", {"input": str(inp),
                                     "output": str(tmp_path / "a2.npy")})
        # let the stale timeout elapse without touching the heartbeat;
        # meanwhile block new claims by submitting AFTER staleness:
        time.sleep(0.35)
        deadline = time.time() + 5
        while md.status().get("a", {}).get("healthy", True) \
                and time.time() < deadline:
            time.sleep(0.02)
        st = md.status()["a"]
        assert st["healthy"] is False
        deadline = time.time() + 2
        while qa.get(j2)["status"] not in ("canceled", "completed") \
                and time.time() < deadline:
            time.sleep(0.02)
        assert qa.get(j2)["status"] in ("canceled", "completed")
        # jobs submitted while unhealthy do NOT run (no daemon claims them)
        j3 = qa.submit("embedding", {"input": str(inp),
                                     "output": str(tmp_path / "a3.npy")})
        time.sleep(0.2)
        assert qa.get(j3)["status"] == "queued"

        # --- heartbeat recovers: a fresh daemon resumes the target ---
        hb_a.touch()
        deadline = time.time() + 5
        while qa.get(j3)["status"] != "completed" and time.time() < deadline:
            hb_a.touch()
            time.sleep(0.02)
        assert qa.get(j3)["status"] == "completed"
        assert md.status()["a"]["healthy"] is True

        # --- remove the target: supervisor forgets it ---
        reg.remove("a")
        deadline = time.time() + 5
        while "a" in md.status() and time.time() < deadline:
            time.sleep(0.02)
        assert "a" not in md.status()
        # job files remain on disk (reference leaves target tables intact)
        assert pathlib.Path(jobs_a).exists()
    finally:
        md.stop()


def test_master_daemon_no_heartbeat_always_healthy(tmp_path):
    from lantern_tpu.service.daemon import (
        JobQueue,
        MasterDaemon,
        TargetRegistry,
    )
    import time

    reg = TargetRegistry(str(tmp_path / "registry.json"))
    reg.add("t", str(tmp_path / "t_jobs"))  # no heartbeat path
    md = MasterDaemon(reg, poll_s=0.02, ping_s=0.03,
                      daemon_poll_s=0.02).start()
    try:
        inp = tmp_path / "in.txt"
        inp.write_text("x\n")
        deadline = time.time() + 5
        while "t" not in md.status() and time.time() < deadline:
            time.sleep(0.02)
        q = JobQueue(str(tmp_path / "t_jobs"))
        jid = q.submit("embedding", {"input": str(inp),
                                     "output": str(tmp_path / "o.npy")})
        while q.get(jid)["status"] != "completed" and time.time() < deadline:
            time.sleep(0.02)
        assert q.get(jid)["status"] == "completed"
        assert md.status()["t"]["healthy"] is True
    finally:
        md.stop()
