"""Serving path: batched inference engine, micro-batching HTTP server, and
AOT export round-trip (all on CPU with random weights)."""

import io
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

import jax

from unsupervised_pose_estimation_tpu.config import Options
from unsupervised_pose_estimation_tpu.serve import (InferenceEngine,
                                                    MicroBatcher,
                                                    export_artifact,
                                                    load_artifact,
                                                    make_http_server)

H = W = 32


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    """A tiny orbax checkpoint the engine can load."""
    from unsupervised_pose_estimation_tpu.train.bundle import ModelBundle
    from unsupervised_pose_estimation_tpu.train.checkpoint import \
        save_checkpoint
    from unsupervised_pose_estimation_tpu.train.state import \
        create_train_state

    tmp = tmp_path_factory.mktemp("serve_ckpt")
    cfg = Options(height=H, width=W, compute_dtype="float32",
                  weights_init="scratch")
    bundle = ModelBundle.create(cfg)
    state = create_train_state(bundle, jax.random.PRNGKey(0), 1e-4)
    save_checkpoint(str(tmp), state, cfg)
    return str(tmp), cfg


@pytest.fixture(scope="module")
def engine(ckpt_dir):
    path, cfg = ckpt_dir
    opt = Options(**{**cfg.__dict__, "load_weights_folder": path})
    return InferenceEngine(opt, max_batch=4)


def test_engine_predicts_and_pads(engine, rng_np):
    imgs = rng_np.integers(0, 255, size=(3, H, W, 3)).astype(np.uint8)
    disp = engine.predict(imgs)
    assert disp.shape == (3, H, W)
    assert np.all(np.isfinite(disp)) and np.all(disp > 0) and np.all(disp < 1)
    # padding must not change results vs a full batch
    full = engine.predict(np.concatenate([imgs, imgs[:1]], 0))
    np.testing.assert_allclose(full[:3], disp, atol=1e-6)
    depth = engine.predict_depth(imgs[:1])
    assert depth.shape == (1, H, W) and np.all(depth > 0)


def test_micro_batcher_coalesces(engine, rng_np):
    batcher = MicroBatcher(engine, max_delay_ms=20)
    imgs = [rng_np.integers(0, 255, size=(H, W, 3)).astype(np.uint8)
            for _ in range(6)]
    results = [None] * 6

    def call(i):
        results[i] = batcher.submit(imgs[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    direct = engine.predict(np.stack(imgs[:4], 0))
    for i in range(4):
        np.testing.assert_allclose(results[i], engine.predict(
            imgs[i][None])[0], atol=1e-6)
    assert all(r is not None for r in results)
    batcher.close()
    del direct


def test_http_server_roundtrip(engine, rng_np):
    batcher = MicroBatcher(engine, max_delay_ms=2)
    server = make_http_server(batcher, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert r.status == 200
            assert b'"ok"' in r.read()

        img = rng_np.integers(0, 255, size=(H, W, 3)).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.status == 200
            disp = np.load(io.BytesIO(r.read()))
        assert disp.shape == (H, W) and np.all(np.isfinite(disp))
        # PNG encode/decode is lossless: must equal a direct engine call
        np.testing.assert_allclose(disp, engine.predict(img[None])[0],
                                   atol=1e-6)
    finally:
        server.shutdown()
        batcher.close()


def test_export_artifact_roundtrip(ckpt_dir, tmp_path, rng_np):
    path, cfg = ckpt_dir
    opt = Options(**{**cfg.__dict__, "load_weights_folder": path})
    out = str(tmp_path / "model.stablehlo")
    export_artifact(opt, out, max_batch=2)

    call, meta = load_artifact(out)
    assert meta["height"] == H and meta["max_batch"] == 2
    x = rng_np.uniform(size=(2, H, W, 3)).astype(np.float32)
    disp = np.asarray(call(x))
    assert disp.shape == (2, H, W)

    engine = InferenceEngine(opt, max_batch=2)
    ref = engine.predict((x * 255).astype(np.uint8))
    # uint8 quantization in the engine path vs the raw float artifact call
    exact = np.asarray(call((x * 255).astype(np.uint8).astype(np.float32)
                            / 255.0))
    np.testing.assert_allclose(exact, ref, atol=1e-6)
