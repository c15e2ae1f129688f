"""Serving tier (unet_tpu/cli/serve.py): micro-batcher unit tests plus
an end-to-end HTTP test against a real ThreadingHTTPServer on an
ephemeral port (CPU backend, tiny model). The reference has no serving
path (batch-1 scripts/predict.py:284-309 is its closest analogue); the
contract tested here is the predict CLI's pre/postprocess semantics
behind a fixed-shape compiled program."""

import http.client
import io
import json
import sys
import threading
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


# ---------------------------------------------------------------- unit

def test_microbatcher_batches_concurrent_requests():
    """4 submits inside the window share ONE predict call, and each
    caller gets its own row back."""
    from unet_tpu.cli.serve import MicroBatcher

    calls = []

    def fake_predict(batch, thr):
        calls.append(batch.shape[0])
        assert thr.shape == (batch.shape[0],)
        return batch[..., 0] * 2.0  # (N, H, W)

    b = MicroBatcher(fake_predict, max_batch=4, window_s=0.5)
    xs = [np.full((2, 2, 1), i, np.float32) for i in range(4)]
    outs = [None] * 4

    def call(i):
        outs[i] = b.submit(xs[i], timeout=10.0)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(15.0)
    b.close()

    assert len(calls) == 1 and calls[0] == 4  # one padded dispatch
    for i in range(4):
        np.testing.assert_array_equal(outs[i], np.full((2, 2), 2.0 * i))


def test_microbatcher_pads_partial_batch_and_propagates_errors():
    from unet_tpu.cli.serve import MicroBatcher

    shapes = []

    def fake_predict(batch, thr):
        shapes.append(batch.shape)
        if len(shapes) > 1:
            raise RuntimeError('device fell over')
        return batch[..., 0]

    b = MicroBatcher(fake_predict, max_batch=3, window_s=0.05)
    out = b.submit(np.ones((2, 2, 1), np.float32), timeout=10.0)
    assert shapes[0] == (3, 2, 2, 1)  # padded to the compiled shape
    np.testing.assert_array_equal(out, np.ones((2, 2)))
    with pytest.raises(RuntimeError, match='device fell over'):
        b.submit(np.ones((2, 2, 1), np.float32), timeout=10.0)
    b.close()


# ---------------------------------------------------------- end-to-end

IMG = 32


@pytest.fixture(scope='module')
def server_url(tmp_path_factory):
    """A live server on an ephemeral port, backed by a tiny UNet
    checkpoint saved through the real CheckpointManager."""
    from unet_tpu.cli.serve import create_server
    from unet_tpu.models import create_model
    from unet_tpu.train import create_optimizer, init_train_state
    from unet_tpu.train.callbacks import CheckpointManager

    tmp = tmp_path_factory.mktemp('serve')
    cfg = {'model': {'type': 'unet', 'n_channels': 1, 'n_classes': 2,
                     'bilinear': True, 'base_features': 4,
                     'deep_supervision': False},
           'tpu': {'compute_dtype': 'float32'}}
    model = create_model('unet', n_channels=1, n_classes=2, bilinear=True,
                         base_features=4, dtype=jnp.float32)
    import jax
    state = init_train_state(model, jax.random.key(0),
                             jnp.zeros((1, IMG, IMG, 1), jnp.float32),
                             create_optimizer(1e-3))
    mgr = CheckpointManager(tmp / 'weights', monitor='class_dice.tumor',
                            mode='max')
    mgr.save(state, {'params': state.params,
                     'batch_stats': state.batch_stats},
             0, {'class_dice': {'tumor': 0.5}}, config=cfg)
    mgr.wait()
    mgr.close()

    server, batcher = create_server(tmp / 'weights' / 'last',
                                    img_size=IMG, threshold=0.5,
                                    max_batch=2, batch_window_ms=5.0,
                                    host='127.0.0.1', port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    yield f'{host}:{port}', tmp / 'weights' / 'last'
    server.shutdown()
    batcher.close()
    server.server_close()


def _request(addr, method, path, body=None):
    conn = http.client.HTTPConnection(addr, timeout=60)
    conn.request(method, path, body=body)
    r = conn.getresponse()
    data = r.read()
    headers = dict(r.getheaders())
    conn.close()
    return r.status, headers, data


def _png_bytes(arr):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format='PNG')
    return buf.getvalue()


def test_serve_healthz(server_url):
    addr, _ = server_url
    status, _, data = _request(addr, 'GET', '/healthz')
    assert status == 200
    health = json.loads(data)
    assert health['status'] == 'ok'
    assert health['img_size'] == IMG


def test_serve_predict_png_matches_direct_inference(server_url):
    """POST a non-square PNG; the mask comes back at the ORIGINAL size
    and equals the predict-CLI pipeline run by hand on the same image
    (ref predict.py:100-165 semantics)."""
    from PIL import Image

    import jax
    from unet_tpu.cli.predict import (load_model, postprocess_mask,
                                      preprocess_image)
    from unet_tpu.train.trainer import make_predict_step_u8

    addr, weights = server_url
    rng = np.random.default_rng(3)
    arr = (rng.random((40, 48)) * 255).astype(np.uint8)  # H=40, W=48
    status, headers, data = _request(addr, 'POST', '/predict',
                                     body=_png_bytes(arr))
    assert status == 200
    assert headers['Content-Type'] == 'image/png'
    got = np.asarray(Image.open(io.BytesIO(data)))
    assert got.shape == (40, 48)
    assert set(np.unique(got)) <= {0, 255}
    assert int(headers['X-Tumor-Pixels']) == int((got > 127).sum())

    # reference pipeline by hand on the same image
    src = io.BytesIO(_png_bytes(arr))
    x, orig = preprocess_image(src, IMG)
    model, variables, _ = load_model(weights)
    prob = jax.jit(make_predict_step_u8(model))(
        variables['params'], variables['batch_stats'], x[None])
    want = postprocess_mask(np.asarray(prob[0, ..., 1]), 0.5, orig)
    np.testing.assert_array_equal(got, want)


def test_serve_predict_json_and_threshold(server_url):
    addr, _ = server_url
    rng = np.random.default_rng(4)
    body = _png_bytes((rng.random((IMG, IMG)) * 255).astype(np.uint8))
    status, _, data = _request(
        addr, 'POST', '/predict?format=json&threshold=0.0', body=body)
    assert status == 200
    rec = json.loads(data)
    # threshold 0.0: softmax probs are strictly positive => all tumor
    assert rec['tumor_pixels'] == IMG * IMG
    assert rec['coverage'] == 1.0
    assert rec['width'] == IMG and rec['height'] == IMG


def test_serve_bad_requests(server_url):
    addr, _ = server_url
    assert _request(addr, 'POST', '/predict', body=b'not a png')[0] == 400
    assert _request(addr, 'POST', '/predict', body=b'')[0] == 400
    assert _request(addr, 'POST', '/predict?threshold=abc',
                    body=_png_bytes(np.zeros((8, 8), np.uint8)))[0] == 400
    assert _request(addr, 'GET', '/nope')[0] == 404
    assert _request(addr, 'POST', '/nope', body=b'x')[0] == 404


def test_serve_keepalive_and_error_recovery(server_url):
    """One persistent connection: two good requests back-to-back
    (HTTP/1.1 keep-alive), then a 4xx mid-stream — error responses
    close the connection (unread body bytes must not corrupt the
    stream) and the client transparently reconnects."""
    addr, _ = server_url
    host, port = addr.split(':')
    body = _png_bytes(np.zeros((8, 8), np.uint8))
    conn = http.client.HTTPConnection(host, int(port), timeout=60)
    for _ in range(2):  # same socket, two requests
        conn.request('POST', '/predict?format=json', body=body)
        r = conn.getresponse()
        assert r.status == 200
        r.read()
    conn.request('POST', '/predict?threshold=abc', body=body)
    r = conn.getresponse()
    assert r.status == 400
    assert r.getheader('Connection') == 'close'
    r.read()
    # http.client reconnects a closed keep-alive connection on demand
    conn.request('POST', '/predict?format=json', body=body)
    r = conn.getresponse()
    assert r.status == 200
    assert json.loads(r.read())['width'] == 8
    conn.close()


def test_serve_concurrent_requests(server_url):
    """Concurrent clients all get correct independent answers while the
    batcher multiplexes them through one compiled program."""
    addr, _ = server_url
    rng = np.random.default_rng(5)
    bodies = [_png_bytes((rng.random((IMG, IMG)) * 255).astype(np.uint8))
              for _ in range(4)]
    results = [None] * 4

    def call(i):
        results[i] = _request(addr, 'POST', '/predict?format=json',
                              body=bodies[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join(60.0)
    assert time.time() - t0 < 60
    for st, _, data in results:
        assert st == 200
        assert json.loads(data)['width'] == IMG


def test_serve_per_request_thresholds_share_dispatch(server_url):
    """Two concurrent requests with OPPOSITE thresholds on the same
    image: thresholding runs on device with a per-row (N,) threshold
    vector, so rows sharing one micro-batched dispatch must still get
    their own cut (threshold 0.0 -> every pixel tumor, 1.0 -> none)."""
    addr, _ = server_url
    rng = np.random.default_rng(6)
    body = _png_bytes((rng.random((IMG, IMG)) * 255).astype(np.uint8))
    results = {}

    def call(thr):
        results[thr] = _request(
            addr, 'POST', f'/predict?format=json&threshold={thr}',
            body=body)

    threads = [threading.Thread(target=call, args=(t,))
               for t in (0.0, 1.0)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60.0)
    st0, _, data0 = results[0.0]
    st1, _, data1 = results[1.0]
    assert st0 == 200 and st1 == 200
    assert json.loads(data0)['tumor_pixels'] == IMG * IMG
    assert json.loads(data1)['tumor_pixels'] == 0


def test_serve_data_parallel_sharded_batches(server_url):
    """When max_batch divides the device count (8 virtual CPU devices,
    conftest), create_server shards each dispatch over the data mesh;
    the served mask must equal the single-device u8 inference and
    /healthz must report the parallelism."""
    import jax
    from unet_tpu.cli.serve import create_server
    from unet_tpu.cli.predict import load_model, postprocess_mask
    from unet_tpu.train.trainer import make_predict_step_u8

    _, weights = server_url
    ndev = len(jax.devices())
    if ndev < 2:
        pytest.skip('needs a multi-device mesh')
    server, batcher = create_server(weights, img_size=IMG, threshold=0.5,
                                    max_batch=ndev, batch_window_ms=1.0,
                                    host='127.0.0.1', port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    addr = f'{server.server_address[0]}:{server.server_address[1]}'
    try:
        status, _, data = _request(addr, 'GET', '/healthz')
        assert status == 200
        assert json.loads(data)['data_parallel'] == ndev

        rng = np.random.default_rng(11)
        arr = (rng.random((IMG, IMG)) * 255).astype(np.uint8)
        status, _, data = _request(addr, 'POST', '/predict',
                                   body=_png_bytes(arr))
        assert status == 200
        from PIL import Image
        got = np.asarray(Image.open(io.BytesIO(data)))

        model, variables, _ = load_model(weights)
        prob = jax.jit(make_predict_step_u8(model))(
            variables['params'], variables['batch_stats'],
            arr[None, ..., None])
        want = postprocess_mask(np.asarray(prob[0, ..., 1]), 0.5,
                                (IMG, IMG))
        np.testing.assert_array_equal(got, want)
    finally:
        server.shutdown()
        batcher.close()
        server.server_close()


def test_serve_metrics_endpoint(server_url):
    """/metrics aggregates HTTP and batcher counters: after N predict
    posts the fill histogram accounts for every real row and the
    latency/dispatch numbers are populated."""
    addr, _ = server_url
    rng = np.random.default_rng(5)
    before = json.loads(_request(addr, 'GET', '/metrics')[2])
    n0 = before['requests_total']
    rows0 = before['batcher']['rows_real']
    for _ in range(3):
        body = _png_bytes((rng.random((IMG, IMG)) * 255).astype(np.uint8))
        assert _request(addr, 'POST', '/predict?format=json',
                        body=body)[0] == 200
    # a bad request counts toward request_errors_total, not the batcher
    assert _request(addr, 'POST', '/predict', body=b'junk')[0] == 400

    status, _, data = _request(addr, 'GET', '/metrics')
    assert status == 200
    m = json.loads(data)
    assert m['requests_total'] == n0 + 4
    assert m['request_errors_total'] >= 1
    assert m['mean_latency_ms'] > 0 and m['max_latency_ms'] > 0
    b = m['batcher']
    assert b['rows_real'] == rows0 + 3
    assert sum(b['fill']) == b['dispatches'] >= 1
    assert sum(k * c for k, c in enumerate(b['fill'])) == b['rows_real']
    assert b['mean_device_ms'] > 0
    assert 0.0 <= b['pad_fraction'] <= 1.0


def test_serve_metrics_commit_before_response(server_url):
    """A request's counters commit BEFORE its first response byte
    (serve.py _send): a client that has received its response and then
    polls /metrics must observe requests_total including it. GETs are
    not counted, so the delta across one POST is exactly 1."""
    addr, _ = server_url
    before = json.loads(_request(addr, 'GET', '/metrics')[2])
    rng = np.random.default_rng(9)
    body = _png_bytes((rng.random((IMG, IMG)) * 255).astype(np.uint8))
    status, _, _ = _request(addr, 'POST', '/predict?format=json',
                            body=body)
    assert status == 200
    after = json.loads(_request(addr, 'GET', '/metrics')[2])
    assert after['requests_total'] == before['requests_total'] + 1
    assert after['request_errors_total'] == before['request_errors_total']
