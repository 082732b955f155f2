"""Serving-edge example: an HTTP generator service over an exported
StableHLO artifact — no model source, no pickles, no framework code at
the edge.

The reference deploys by shipping Python+CUDA with its torch pickles
(persistence.py re-executes embedded source at load time,
/root/reference/models/stylegan3/torch_utils/persistence.py). The
TPU-native deployment splits that in two:

    python scripts/export_model.py --checkpoint ckpt.pkl --out g.stablehlo
    python examples/serve_generator.py --artifact g.stablehlo --port 8000

The server deserializes the artifact (weights baked in as constants)
and calls it through jax's export runtime — the only Python needed at
the edge is jax itself; any PJRT backend (TPU serving pods, CPU hosts)
executes the same bytes.

MXU-friendly batching: the artifact has a symbolic batch dimension, but
each CONCRETE batch size triggers its own XLA compile at first call.
The server therefore pads every request up to a fixed bucket ladder
(powers of two) and trims the response — a handful of compiles serve
any request size, and the padded shapes keep the MXU tiled. Requests
larger than the top bucket are chunked through it.

API (JSON over HTTP):
    GET  /healthz            -> {"z_dim", "c_dim", "buckets", "platforms"}
    POST /generate           -> {"shape", "dtype", "images_b64"}
        body {"n": 3, "seed": 7, "labels": [0, 1, 0]?}
        images_b64 = base64 of an .npy blob (np.load round-trips it)

Smoke demo (also the test's path, tests/test_serve_example.py):
    python examples/serve_generator.py --selftest
"""

import argparse
import base64
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class GeneratorService:
    """Deserialized artifact + bucketed batching. Thread-safe: jax
    executables are; only a bucket's FIRST call (its XLA compile) is
    serialized — steady-state requests run concurrently."""

    def __init__(self, artifact_path, buckets=(1, 2, 4, 8, 16, 32),
                 max_request_n=1024):
        from jax import export

        with open(artifact_path, 'rb') as f:
            self.exported = export.deserialize(f.read())
        avals = self.exported.in_avals
        if len(avals[0].shape) != 2:
            # A --which d export takes [B,C,H,W] images; this example is
            # a GENERATOR service (z -> images) and cannot serve it.
            raise ValueError(
                f'expected a generator artifact with a [batch, z_dim] '
                f'input, got input shape {tuple(avals[0].shape)} — a '
                f'discriminator export is not servable here')
        self.z_dim = int(avals[0].shape[1])
        self.c_dim = int(avals[1].shape[1]) if len(avals) > 1 else 0
        lead = avals[0].shape[0]
        if isinstance(lead, int):
            # Concrete-batch G artifact (--batch N export): one bucket.
            self.buckets = (int(lead),)
        else:
            self.buckets = tuple(sorted(set(int(b) for b in buckets)))
        self.max_request_n = int(max_request_n)
        self.platforms = tuple(self.exported.platforms)
        # One lock PER bucket: a cold bucket's first call (XLA compile)
        # must not queue behind an unrelated bucket's compile. The
        # ladder is fixed at construction, so the dict needs no guard.
        self._compile_locks = {b: threading.Lock() for b in self.buckets}
        self._compiled = set()

    def _call(self, z, c):
        # jax compiles once per concrete shape; serialize only a fresh
        # bucket's first call so concurrent requests don't compile the
        # same shape twice, then let executions run concurrently.
        bucket = z.shape[0]
        if bucket not in self._compiled:
            with self._compile_locks[bucket]:
                if bucket not in self._compiled:
                    out = np.asarray(self.exported.call(z, c)
                                     if self.c_dim
                                     else self.exported.call(z))
                    self._compiled.add(bucket)
                    return out
        if self.c_dim:
            return np.asarray(self.exported.call(z, c))
        return np.asarray(self.exported.call(z))

    def generate(self, n, seed=0, labels=None):
        """[n, C, H, W] float32 images for seeded z draws. `labels`:
        int class ids, length n (required iff the artifact is
        conditional)."""
        if n < 1:
            raise ValueError('n must be >= 1')
        if n > self.max_request_n:
            # Bound per-request host memory (z draws + accumulated
            # output chunks); clients page through seeds instead.
            raise ValueError(f'n {n} > max_request_n '
                             f'{self.max_request_n}')
        if self.c_dim and labels is None:
            raise ValueError(f'conditional artifact: labels (len {n}, '
                             f'ids < {self.c_dim}) required')
        if not self.c_dim and labels is not None:
            raise ValueError('unconditional artifact: labels not accepted')
        if labels is not None and len(labels) != n:
            raise ValueError(f'labels length {len(labels)} != n {n}')
        rng = np.random.RandomState(seed)
        z_all = rng.randn(n, self.z_dim).astype(np.float32)
        c_all = None
        if self.c_dim:
            ids = np.asarray(labels, dtype=np.int64)
            if (ids < 0).any() or (ids >= self.c_dim).any():
                raise ValueError(f'label ids must be in [0, {self.c_dim})')
            c_all = np.eye(self.c_dim, dtype=np.float32)[ids]

        top = self.buckets[-1]
        outs = []
        start = 0
        while start < n:
            m = min(n - start, top)
            bucket = next(b for b in self.buckets if b >= m)
            z = np.zeros((bucket, self.z_dim), np.float32)
            z[:m] = z_all[start:start + m]
            c = None
            if self.c_dim:
                # Pad rows with a valid one-hot (class 0); trimmed below.
                c = np.zeros((bucket, self.c_dim), np.float32)
                c[:, 0] = 1.0
                c[:m] = c_all[start:start + m]
            outs.append(self._call(z, c)[:m])
            start += m
        return np.concatenate(outs, axis=0)


def _npy_b64(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return base64.b64encode(buf.getvalue()).decode('ascii')


def make_handler(service):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/healthz':
                return self._send(200, dict(
                    z_dim=service.z_dim, c_dim=service.c_dim,
                    buckets=list(service.buckets),
                    platforms=list(service.platforms)))
            return self._send(404, dict(error='not found'))

        # A /generate body is a tiny JSON dict; anything bigger is a
        # mistake or abuse. Reject before reading so a missing/absurd
        # Content-Length cannot exhaust host memory, and bound every
        # socket read with a timeout so a LYING under-limit
        # Content-Length (declared 1000, sent 8 bytes, socket held
        # open) cannot pin a ThreadingHTTPServer thread forever — the
        # size guard alone only covers the oversized case.
        MAX_BODY = 1 << 20
        timeout = 30  # BaseHTTPRequestHandler: per-connection socket timeout

        def _parse_request(self):
            """Validate transport + fields; raises ValueError (-> 400)
            on anything the CLIENT got wrong, so the except below can
            stay narrow and genuine server bugs surface as 500s."""
            try:
                length = int(self.headers.get('Content-Length') or '')
            except ValueError:
                raise ValueError('Content-Length required')
            if length <= 0:
                raise ValueError('Content-Length must be positive')
            if length > self.MAX_BODY:
                raise ValueError(f'request body > {self.MAX_BODY} bytes')
            try:
                req = json.loads(self.rfile.read(length))
            except (json.JSONDecodeError, UnicodeDecodeError):
                raise ValueError('body is not valid JSON')
            if not isinstance(req, dict):
                raise ValueError('body must be a JSON object')
            unknown = set(req) - {'n', 'seed', 'labels'}
            if unknown:
                raise ValueError(f'unknown fields: {sorted(unknown)}')
            n, seed = req.get('n', 1), req.get('seed', 0)
            if not isinstance(n, int) or isinstance(n, bool):
                raise ValueError('n must be an integer')
            if not isinstance(seed, int) or isinstance(seed, bool):
                raise ValueError('seed must be an integer')
            labels = req.get('labels')
            if labels is not None:
                if not isinstance(labels, list) or \
                        not all(isinstance(x, int) and
                                not isinstance(x, bool) for x in labels):
                    raise ValueError('labels must be a list of ints')
            return n, seed, labels

        def do_POST(self):
            if self.path != '/generate':
                return self._send(404, dict(error='not found'))
            try:
                n, seed, labels = self._parse_request()
                imgs = service.generate(n, seed=seed, labels=labels)
            except ValueError as e:   # client errors only (see above)
                return self._send(400, dict(error=str(e)))
            except Exception as e:    # noqa: BLE001 — a bug in the
                # service must answer 500, not masquerade as a client
                # error or drop the connection with a raw traceback.
                return self._send(500, dict(
                    error=f'{type(e).__name__}: {e}'))
            return self._send(200, dict(
                shape=list(imgs.shape), dtype=str(imgs.dtype),
                images_b64=_npy_b64(imgs)))

        def log_message(self, fmt, *a):  # quiet by default
            if os.environ.get('LATAUG_SERVE_VERBOSE'):
                super().log_message(fmt, *a)

    return Handler


def serve(artifact, host='127.0.0.1', port=8000,
          buckets=(1, 2, 4, 8, 16, 32), max_request_n=1024):
    """Build the service and a bound ThreadingHTTPServer (not started)."""
    service = GeneratorService(artifact, buckets=buckets,
                               max_request_n=max_request_n)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    return service, httpd


def _selftest():
    """End-to-end demo on a synthetic checkpoint (CPU, ~1 min)."""
    import tempfile
    import urllib.request

    import jax
    jax.config.update('jax_platforms', 'cpu')
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tests'))
    from synthetic import make_checkpoint
    from scripts.export_model import build_export

    d = tempfile.mkdtemp(prefix='lataug_serve_')
    ckpt = os.path.join(d, 'ckpt.pkl')
    make_checkpoint(ckpt)
    art = os.path.join(d, 'g.stablehlo')
    with open(art, 'wb') as f:
        f.write(build_export(ckpt, which='g', platforms=('cpu',))
                .serialize())
    service, httpd = serve(art, port=0, buckets=(1, 2, 4))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    url = f'http://127.0.0.1:{port}'
    meta = json.loads(urllib.request.urlopen(f'{url}/healthz').read())
    req = urllib.request.Request(
        f'{url}/generate', data=json.dumps(dict(n=3, seed=7)).encode(),
        headers={'Content-Type': 'application/json'})
    resp = json.loads(urllib.request.urlopen(req).read())
    imgs = np.load(io.BytesIO(base64.b64decode(resp['images_b64'])))
    httpd.shutdown()
    assert imgs.shape[0] == 3 and imgs.ndim == 4, imgs.shape
    print(f'[serve] selftest OK — z_dim={meta["z_dim"]} '
          f'imgs={imgs.shape} via bucket ladder {meta["buckets"]}')


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('--artifact', help='StableHLO file from export_model.py')
    ap.add_argument('--host', default='127.0.0.1')
    ap.add_argument('--port', type=int, default=8000)
    ap.add_argument('--buckets', default='1,2,4,8,16,32',
                    help='batch bucket ladder (comma ints)')
    ap.add_argument('--max-n', type=int, default=1024, dest='max_n',
                    help='largest n a single request may ask for '
                         '(bounds per-request host memory)')
    ap.add_argument('--cpu', action='store_true',
                    help='force the CPU jax backend')
    ap.add_argument('--selftest', action='store_true',
                    help='synthetic end-to-end demo, then exit')
    args = ap.parse_args(argv)
    if args.selftest:
        return _selftest()
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    if not args.artifact:
        ap.error('--artifact is required (or --selftest)')
    buckets = tuple(int(b) for b in args.buckets.split(','))
    service, httpd = serve(args.artifact, args.host, args.port, buckets,
                           max_request_n=args.max_n)
    print(f'[serve] {args.artifact}: z_dim={service.z_dim} '
          f'c_dim={service.c_dim} buckets={service.buckets} on '
          f'http://{args.host}:{httpd.server_address[1]}')
    httpd.serve_forever()


if __name__ == '__main__':
    main()
