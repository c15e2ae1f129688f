#!/usr/bin/env python
"""Serving-tier throughput: end-to-end HTTP slices/s through unet-serve.

Starts the server in-process (ephemeral port), pre-encodes PNG request
bodies, then drives it with concurrent keep-alive clients — the
worst-case serving shape the reference's batch-1 predict loop implies
(ref scripts/predict.py:284-309): many independent batch-1 requests.
The micro-batcher should aggregate them into near-``--max-batch``
device dispatches; the printed number includes HTTP + PNG decode/encode
+ batching latency, so it is directly comparable to the predict CLI's
end-to-end slices/s.

Usage: python benchmarks/serve_bench.py [--img-size 512] [--clients 16]
       [--requests 256] [--max-batch 8] [--weights DIR_OR_PT]
(no --weights: an untrained flagship-config model checkpoint is built
in a temp dir — throughput doesn't depend on weight values)
"""

import argparse
import http.client
import io
import json
import sys
import tempfile
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('--weights', type=str, default=None)
    p.add_argument('--img-size', type=int, default=512)
    p.add_argument('--base-features', type=int, default=64)
    p.add_argument('--clients', type=int, default=16)
    p.add_argument('--sweep', type=str, default=None,
                   help='comma list of client counts (e.g. 8,16,32,64): '
                        'measure each against the SAME warm server — '
                        'one load+compile, one JSON line per point — '
                        'for the batching/latency-vs-concurrency '
                        'envelope. Overrides --clients.')
    p.add_argument('--requests', type=int, default=256)
    p.add_argument('--max-batch', type=int, default=8)
    p.add_argument('--batch-window-ms', type=float, default=5.0)
    p.add_argument('--device', type=str, default=None)
    return p.parse_args()


def make_checkpoint(tmp, img_size, base_features):
    import jax
    import jax.numpy as jnp
    from unet_tpu.models import create_model
    from unet_tpu.train import create_optimizer, init_train_state
    from unet_tpu.train.callbacks import CheckpointManager

    cfg = {'model': {'type': 'attention_unet', 'n_channels': 1,
                     'n_classes': 2, 'bilinear': True,
                     'base_features': base_features,
                     'deep_supervision': False},
           'tpu': {'compute_dtype': 'bfloat16'}}
    model = create_model('attention_unet', bilinear=True,
                         base_features=base_features, dtype=jnp.bfloat16)
    state = init_train_state(model, jax.random.key(0),
                             jnp.zeros((1, 64, 64, 1), jnp.float32),
                             create_optimizer(1e-3))
    mgr = CheckpointManager(Path(tmp) / 'weights',
                            monitor='class_dice.tumor', mode='max')
    mgr.save(state, {'params': state.params,
                     'batch_stats': state.batch_stats},
             0, {'class_dice': {'tumor': 0.5}}, config=cfg)
    mgr.wait()
    mgr.close()
    return Path(tmp) / 'weights' / 'last'


def main():
    args = parse_args()
    import jax
    if (args.device or '').lower() == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    from PIL import Image

    from unet_tpu.cli.serve import create_server

    tmp = None
    weights = args.weights
    if weights is None:
        tmp = tempfile.TemporaryDirectory()
        weights = make_checkpoint(tmp.name, args.img_size,
                                  args.base_features)

    t0 = time.time()
    server, batcher = create_server(
        weights, img_size=args.img_size, max_batch=args.max_batch,
        batch_window_ms=args.batch_window_ms, host='127.0.0.1', port=0)
    print(f'server up (load+compile {time.time() - t0:.1f}s)')
    threading.Thread(target=server.serve_forever, daemon=True).start()
    host, port = server.server_address[:2]

    # pre-encoded distinct request bodies (PNG encode off the clock;
    # decode stays ON the clock, as in real serving)
    rng = np.random.default_rng(0)
    bodies = []
    for _ in range(16):
        buf = io.BytesIO()
        Image.fromarray((rng.random((args.img_size, args.img_size)) * 255)
                        .astype(np.uint8)).save(buf, format='PNG')
        bodies.append(buf.getvalue())

    def run_point(n_clients, requests):
        """One measured concurrency point against the warm server."""
        n_clients = max(1, n_clients)
        per_client = max(1, requests // n_clients)
        errors = []
        latencies = [[] for _ in range(n_clients)]

        def client(ci):
            conn = http.client.HTTPConnection(host, port, timeout=120)
            try:
                for i in range(per_client):
                    t = time.time()
                    conn.request('POST', '/predict?format=json',
                                 body=bodies[(ci + i) % len(bodies)])
                    r = conn.getresponse()
                    data = r.read()
                    if r.status != 200:
                        errors.append((ci, r.status, data[:80]))
                        return
                    latencies[ci].append(time.time() - t)
            except Exception as e:
                errors.append((ci, type(e).__name__, str(e)[:80]))
            finally:
                conn.close()

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.time() - t0
        done = sum(len(ls) for ls in latencies)
        lat = sorted(x for ls in latencies for x in ls)
        if errors:
            print(f'ERRORS ({len(errors)}): {errors[:4]}')
        if done:
            print(json.dumps({
                'serve_slices_per_sec': round(done / dt, 2),
                'clients': n_clients,
                'requests_done': done,
                'img_size': args.img_size,
                'max_batch': args.max_batch,
                'latency_p50_ms': round(lat[len(lat) // 2] * 1e3, 1),
                'latency_p95_ms': round(lat[int(len(lat) * 0.95)] * 1e3, 1),
            }), flush=True)
        return bool(done)

    # warmup round (first requests pay nothing extra — compile already
    # done — but prime connections/threads)
    run_point(1, max(4, args.requests // 16))

    points = ([int(c) for c in args.sweep.split(',')] if args.sweep
              else [args.clients])
    any_done = False
    for n_clients in points:
        # scale offered load with concurrency so every point sees
        # enough requests per client for stable percentiles
        requests = (args.requests if len(points) == 1
                    else max(args.requests, n_clients * 16))
        any_done |= run_point(n_clients, requests)
    if any_done:
        # server-side view: how well the micro-batcher aggregated the
        # batch-1 clients (fill histogram, padding overhead, device ms;
        # cumulative across the sweep, warmup included)
        try:
            conn = http.client.HTTPConnection(host, port, timeout=30)
            conn.request('GET', '/metrics')
            print(conn.getresponse().read().decode())
            conn.close()
        except Exception as e:
            print(f'/metrics scrape failed: {type(e).__name__}: {e}')
    server.shutdown()
    batcher.close()
    server.server_close()
    if tmp is not None:
        tmp.cleanup()


if __name__ == '__main__':
    main()
