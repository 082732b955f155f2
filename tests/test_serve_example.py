"""Serving-edge example (examples/serve_generator.py): bucketed batching
over a deserialized StableHLO artifact + the HTTP surface.

The artifact path (export -> deserialize -> call) is covered by
test_export.py; here the serving layer on top: bucket padding must not
change results (G rows are per-sample independent), oversized requests
chunk through the top bucket, conditional artifacts route labels, and
the HTTP endpoints round-trip images and reject malformed requests.
"""

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from synthetic import make_checkpoint


def _make_artifact(d, c_dim=0, which='g', batch=0):
    import os
    import sys
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    from scripts.export_model import build_export

    ckpt = str(d / 'ckpt.pkl')
    make_checkpoint(ckpt, c_dim=c_dim)
    art = str(d / f'{which}.stablehlo')
    with open(art, 'wb') as f:
        f.write(build_export(ckpt, which=which, batch=batch,
                             platforms=('cpu',)).serialize())
    return art


@pytest.fixture(scope='module')
def artifact(tmp_path_factory):
    return _make_artifact(tmp_path_factory.mktemp('serve'))


@pytest.fixture(scope='module')
def cond_artifact(tmp_path_factory):
    return _make_artifact(tmp_path_factory.mktemp('serve_cond'), c_dim=2)


def _service(artifact, **kw):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        'serve_generator_mod', os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            'examples', 'serve_generator.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod, mod.GeneratorService(artifact, **kw)


def test_bucketed_generate_pads_trims_and_chunks(artifact):
    mod, svc = _service(artifact, buckets=(1, 2, 4))
    assert svc.z_dim == 32 and svc.c_dim == 0
    imgs3 = svc.generate(3, seed=7)   # bucket 4, trimmed to 3
    assert imgs3.shape[0] == 3 and imgs3.ndim == 4
    # Oversized request chunks through the top bucket (4 + 1).
    imgs5 = svc.generate(5, seed=7)
    assert imgs5.shape[0] == 5
    # Same seed => same z stream: bucket padding and chunk boundaries
    # must not leak into results (G rows are per-sample independent).
    np.testing.assert_allclose(imgs5[:3], imgs3, rtol=1e-4, atol=1e-5)
    imgs1 = svc.generate(1, seed=7)   # exact bucket 1, no padding
    np.testing.assert_allclose(imgs1[0], imgs3[0], rtol=1e-4, atol=1e-5)
    # Determinism + seed sensitivity.
    np.testing.assert_array_equal(svc.generate(2, seed=3),
                                  svc.generate(2, seed=3))
    assert np.abs(svc.generate(2, seed=3) -
                  svc.generate(2, seed=4)).max() > 1e-4
    with pytest.raises(ValueError, match='labels not accepted'):
        svc.generate(2, labels=[0, 1])
    with pytest.raises(ValueError, match='max_request_n'):
        svc.generate(10 ** 9)  # per-request memory bound


def test_discriminator_artifact_rejected(artifact, tmp_path):
    """A --which d export takes images, not z: the generator service
    must refuse it up front with a clear error, not serve nonsense."""
    mod, _ = _service(artifact)
    d_art = _make_artifact(tmp_path, which='d', batch=2)
    with pytest.raises(ValueError, match='discriminator'):
        mod.GeneratorService(d_art)


def test_conditional_artifact_routes_labels(cond_artifact):
    mod, svc = _service(cond_artifact, buckets=(1, 2, 4))
    assert svc.c_dim == 2
    a = svc.generate(2, seed=5, labels=[0, 1])
    b = svc.generate(2, seed=5, labels=[1, 1])
    assert a.shape[0] == 2
    # The label changes the image (projection/mapping embed is live).
    assert np.abs(a[0] - b[0]).max() > 1e-4
    np.testing.assert_allclose(a[1], b[1], rtol=1e-4, atol=1e-5)
    with pytest.raises(ValueError, match='labels'):
        svc.generate(2, seed=5)                 # missing labels
    with pytest.raises(ValueError, match='length'):
        svc.generate(2, seed=5, labels=[0])     # wrong length
    with pytest.raises(ValueError, match='ids'):
        svc.generate(1, seed=5, labels=[9])     # out of range


def test_http_surface_roundtrip_and_errors(artifact):
    mod, _ = _service(artifact)
    service, httpd = mod.serve(artifact, port=0, buckets=(1, 2, 4))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f'http://127.0.0.1:{httpd.server_address[1]}'
        meta = json.loads(urllib.request.urlopen(f'{url}/healthz').read())
        assert meta['z_dim'] == 32 and meta['buckets'] == [1, 2, 4]

        req = urllib.request.Request(
            f'{url}/generate',
            data=json.dumps(dict(n=3, seed=7)).encode(),
            headers={'Content-Type': 'application/json'})
        resp = json.loads(urllib.request.urlopen(req).read())
        imgs = np.load(io.BytesIO(base64.b64decode(resp['images_b64'])))
        assert list(imgs.shape) == resp['shape'] and imgs.shape[0] == 3
        # HTTP result == direct service result (same seed/stream).
        np.testing.assert_allclose(imgs, service.generate(3, seed=7),
                                   rtol=1e-4, atol=1e-5)

        # Every malformed body answers 400 (never a dropped connection):
        # labels on an unconditional artifact, a non-object JSON body,
        # and a null n (TypeError inside the handler).
        for body in (dict(n=2, labels=[0, 1]), [1, 2], dict(n=None)):
            bad = urllib.request.Request(
                f'{url}/generate', data=json.dumps(body).encode(),
                headers={'Content-Type': 'application/json'})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad)
            assert ei.value.code == 400, body

        # Transport-level abuse is rejected BEFORE the body is read:
        # an empty body (Content-Length 0) and an unknown field answer
        # 400; an oversized declared body answers 400 without the
        # handler slurping it into memory (advisor round 3).
        for data in (b'', json.dumps(dict(n=1, evil=1)).encode()):
            bad = urllib.request.Request(f'{url}/generate', data=data)
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad)
            assert ei.value.code == 400, data
        big = urllib.request.Request(
            f'{url}/generate', data=b'{"n": 1}',
            headers={'Content-Length': str(64 << 20)})
        with pytest.raises((urllib.error.HTTPError, ConnectionError,
                            urllib.error.URLError)) as ei:
            urllib.request.urlopen(big, timeout=10)
        if isinstance(ei.value, urllib.error.HTTPError):
            assert ei.value.code == 400

        # A genuine SERVER bug answers 500, not a 400 blamed on the
        # client (advisor round 3: the broad except misclassified them).
        orig = service.generate
        service.generate = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError('injected server bug'))
        try:
            bad = urllib.request.Request(
                f'{url}/generate', data=json.dumps(dict(n=1)).encode())
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad)
            assert ei.value.code == 500
            assert 'injected server bug' in json.loads(
                ei.value.read())['error']
        finally:
            service.generate = orig
    finally:
        httpd.shutdown()
