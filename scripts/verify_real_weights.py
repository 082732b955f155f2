"""One-command verification for REAL pretrained weights (deploy-time).

This framework was built with zero network egress, so the artifacts the
reference downloads at runtime could never be fetched here:

  * ``vgg16.pt``         — LPIPS VGG16 TorchScript
                           (ref augments/criteria/lpips/utils.py:11-52,
                           augments/utils/util_latent_aug.py:35-43)
  * an InceptionV3 FID detector — NVIDIA TorchScript pickle or a
    torchvision ``inception_v3`` state dict
                           (ref metrics/frechet_inception_distance.py:22)
  * a trained StyleGAN2/3 network pickle (G_ema + D)

Every converter is tested against realistic stand-ins
(tests/test_converters_realistic.py, tests/test_torch_parity.py); what
remains environment-bound is running them against NVIDIA's actual
bytes. Drop the real files anywhere and this script closes that gap in
one command per artifact:

    convert -> forward golden parity vs the torch artifact ->
    FID-agreement on a synthetic probe set (detector lane).

Usage::

    python scripts/verify_real_weights.py \
        [--vgg16 vgg16.pt] [--inception inception-2015-12-05.pkl] \
        [--network_pkl network-snapshot.pkl] [--sg_repo stylegan2-ada-pytorch] \
        [--outdir converted/] [--tol 1e-3] [--fid_tol 0.01]

Prints one JSON line per check and a final ``verdict`` line; exit 0
iff every check on every PRESENT artifact passed (absent artifacts are
reported as skipped, not failed). ``--sg_repo`` opts into executing the
NVIDIA pickle's embedded torch modules for the generator golden test —
that runs third-party code, so it never happens by default; without it
the generator lane still verifies ingestion + native synthesis.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = []


def report(artifact, check, status, **info):
    row = {"artifact": artifact, "check": check, "status": status, **info}
    RESULTS.append(row)
    print(json.dumps(row), flush=True)


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    denom = np.abs(b).max()
    return float(np.abs(a - b).max() / (denom + 1e-12))


def _iter_script_layers(seq):
    """Yield (kind, layer) over a (possibly scripted) Sequential: kind is
    the original class name ('Conv2d'/'ReLU'/'MaxPool2d'). A loaded
    RecursiveScriptModule does not implement __iter__; its children()
    preserve definition order."""
    try:
        layers = list(seq)
    except NotImplementedError:
        layers = list(seq.children())
    for layer in layers:
        kind = getattr(layer, "original_name", type(layer).__name__)
        yield kind, layer


def verify_vgg16(path, outdir, tol):
    """Convert the LPIPS VGG16 TorchScript file and golden-check the
    converted params against the torch module's own activations."""
    import torch

    import jax.numpy as jnp

    from latentaugment_tpu.models import vgg

    out_path = os.path.join(outdir, "vgg16_lpips.pkl")
    params = vgg.convert_torchscript(path, out_path)
    n_convs = sum(1 for k in params if k.startswith("conv"))
    report("vgg16", "convert", "pass" if n_convs == 13 else "fail",
           mapped_convs=n_convs, out=out_path,
           has_lin="lin" in params)

    mod = torch.jit.load(path, map_location="cpu").eval()
    if not hasattr(mod, "layers"):
        report("vgg16", "forward_parity", "skipped",
               reason="module has no .layers sequential to walk")
        return
    x = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
    plan_names = [it[0] for it in vgg.VGG16_PLAN if it != "M"]
    taps_t = {}
    with torch.no_grad():
        h = torch.from_numpy(x)
        conv_i = 0
        for kind, layer in _iter_script_layers(mod.layers):
            h = layer(h)
            if kind == "ReLU":
                name = plan_names[conv_i]
                if name in vgg.LPIPS_TAPS:
                    taps_t[name] = h.numpy()
                conv_i += 1
    acts = vgg.vgg_features(params, jnp.asarray(x), taps=vgg.LPIPS_TAPS,
                            input_range="unit")
    worst = max(rel_err(acts[t], taps_t[t]) for t in vgg.LPIPS_TAPS)
    report("vgg16", "forward_parity", "pass" if worst < tol else "fail",
           max_rel_err=worst, tol=tol, taps=len(taps_t))

    # LPIPS distance through the embedding property vs the richzhang
    # formula evaluated in torch on the SAME converted weights.
    y = np.random.RandomState(1).randn(2, 3, 64, 64).astype(np.float32)
    dist_t = np.zeros(2, np.float64)
    taps_y = {}
    with torch.no_grad():
        h = torch.from_numpy(y)
        conv_i = 0
        for kind, layer in _iter_script_layers(mod.layers):
            h = layer(h)
            if kind == "ReLU":
                name = plan_names[conv_i]
                if name in vgg.LPIPS_TAPS:
                    taps_y[name] = h
                conv_i += 1
        for tap in vgg.LPIPS_TAPS:
            ta = torch.from_numpy(taps_t[tap])
            tb = taps_y[tap]
            na = ta / (ta.square().sum(1, keepdim=True) + 1e-10).sqrt()
            nb = tb / (tb.square().sum(1, keepdim=True) + 1e-10).sqrt()
            lin = torch.from_numpy(np.asarray(params["lin"][tap])) \
                if "lin" in params else torch.ones(ta.shape[1])
            d = (lin.reshape(1, -1, 1, 1) * (na - nb).square()).sum(1)
            dist_t += d.mean(dim=(1, 2)).numpy()
    dist_j = np.asarray(vgg.lpips_distance(
        params, jnp.asarray(x), jnp.asarray(y), input_range="unit"))
    err = rel_err(dist_j, dist_t)
    report("vgg16", "lpips_distance_parity",
           "pass" if err < tol else "fail", max_rel_err=err, tol=tol)


def _torch_inception_features(mod, x_uint8):
    """Run a torch FID detector on [N,3,H,W] uint8, trying the NVIDIA
    TorchScript signature first, then a plain forward."""
    import torch

    t = torch.from_numpy(x_uint8)
    with torch.no_grad():
        try:
            return mod(t, return_features=True).numpy()
        except (RuntimeError, TypeError):
            out = mod(t.float())
            return (out[0] if isinstance(out, (tuple, list)) else out).numpy()


def verify_inception(path, outdir, tol, fid_tol):
    """Convert the FID detector and check FID agreement: the same two
    synthetic image sets scored by the torch artifact and by our JAX
    InceptionV3 must give FIDs within fid_tol (relative)."""
    import torch

    import jax.numpy as jnp

    from latentaugment_tpu.models import inception

    # The artifact is either a TorchScript module (NVIDIA pickle — also
    # the executable oracle) or a plain state dict (torchvision .pth —
    # conversion source only, nothing to execute without torchvision).
    mod, state = None, None
    try:
        mod = torch.jit.load(path, map_location="cpu").eval()
        state = dict(mod.state_dict())
    except RuntimeError:
        obj = torch.load(path, map_location="cpu", weights_only=True)
        state = dict(obj.get("state_dict", obj))

    out_path = os.path.join(outdir, "inception_fid.pkl")
    try:
        params = inception.convert_torchvision_state(state, out_path,
                                                     strict=True)
        report("inception", "convert", "pass", mapped_leaves=len(
            [0 for _ in _walk_leaves(params)]), out=out_path)
    except (KeyError, ValueError) as e:
        # NVIDIA's TorchScript detector does not use torchvision names;
        # it needs no conversion (we only need it as the torch oracle) —
        # our JAX detector is then verified per-weights via a separate
        # torchvision .pth (pass both files for full coverage).
        params = None
        report("inception", "convert", "skipped",
               reason=f"state dict is not torchvision-shaped ({e}); "
                      "oracle-only artifact")
    if mod is None:
        report("inception", "fid_agreement", "skipped",
               reason="state dict only — no executable torch oracle")
        return

    det_params = params if params is not None else inception.get_inception()
    if params is None:
        report("inception", "fid_agreement_note", "info",
               note="JAX detector runs seeded-init weights (no converted "
                    "params); FID agreement is NOT expected unless the "
                    "converted torchvision weights are also supplied")
    rs = np.random.RandomState(0)
    set_a = (rs.rand(32, 3, 128, 128) * 255).astype(np.uint8)
    set_b = np.clip(set_a.astype(np.int16)
                    + rs.randint(-40, 40, set_a.shape), 0, 255).astype(np.uint8)

    def fid_torch():
        fa = _torch_inception_features(mod, set_a).astype(np.float64)
        fb = _torch_inception_features(mod, set_b).astype(np.float64)
        return _fid(fa, fb)

    def fid_jax():
        fa = np.asarray(inception.inception_features(
            det_params, jnp.asarray(set_a, jnp.float32))).astype(np.float64)
        fb = np.asarray(inception.inception_features(
            det_params, jnp.asarray(set_b, jnp.float32))).astype(np.float64)
        return _fid(fa, fb)

    ft, fj = fid_torch(), fid_jax()
    rel = abs(ft - fj) / (abs(ft) + 1e-12)
    # Without converted weights the JAX side is seeded-random init: a
    # coincidental agreement must NOT read as 'pass' (review round 5).
    if params is None:
        status = "info"
    else:
        status = "pass" if rel < fid_tol else "fail"
    report("inception", "fid_agreement", status,
           fid_torch=ft, fid_jax=fj, rel_diff=rel, fid_tol=fid_tol)


def _fid(fa, fb):
    from latentaugment_tpu.metrics.frechet_inception_distance import (
        fid_from_moments)

    mu_a, sig_a = fa.mean(0), np.cov(fa, rowvar=False)
    mu_b, sig_b = fb.mean(0), np.cov(fb, rowvar=False)
    return float(fid_from_moments(mu_a, sig_a, mu_b, sig_b))


def _walk_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _walk_leaves(v)
        else:
            yield v


def verify_network_pkl(path, outdir, tol, sg_repo):
    """Ingest a real generator pickle through the restricted unpickler
    and synthesize; with --sg_repo, also golden-check our forward
    against NVIDIA's own torch modules reconstructed from the pickle."""
    import jax
    import jax.numpy as jnp

    from latentaugment_tpu.models import networks_for
    from latentaugment_tpu.models.stylegan2 import convert

    g_params, g_cfg, d_params, d_cfg = convert.load_stylegan(path)
    mod_g = networks_for(g_cfg)
    g_cfg.num_fp16_res = 0  # golden comparisons run fp32
    z = jax.random.normal(jax.random.PRNGKey(0), (2, g_cfg.z_dim))
    img = np.asarray(mod_g.generator_apply(g_params, g_cfg, z,
                                           noise_mode="const"))
    ok = (np.isfinite(img).all() and img.std() > 1e-4
          and img.shape[1:] == (g_cfg.img_channels, g_cfg.img_resolution,
                                g_cfg.img_resolution))
    report("network_pkl", "ingest_and_synthesize",
           "pass" if ok else "fail", arch=g_cfg.get("arch", "stylegan2"),
           img_shape=list(img.shape), img_std=float(img.std()),
           has_discriminator=d_params is not None)
    if d_params is not None:
        from latentaugment_tpu.models.stylegan2 import networks as n2

        logits = np.asarray(n2.discriminator_apply(
            d_params, d_cfg, jnp.asarray(img)))
        report("network_pkl", "discriminator_forward",
               "pass" if np.isfinite(logits).all() else "fail",
               logits_shape=list(logits.shape))

    if not sg_repo:
        report("network_pkl", "torch_golden", "skipped",
               reason="pass --sg_repo <stylegan2/3 checkout> to opt into "
                      "executing the pickle's embedded torch modules")
        return
    sys.path.insert(0, sg_repo)
    import pickle

    import torch

    with open(path, "rb") as f:
        obj = pickle.load(f)  # executes NVIDIA persistence code (opted in)
    g_t = (obj.get("G_ema") or obj["G"]).eval()
    with torch.no_grad():
        img_t = g_t(torch.from_numpy(np.asarray(z)),
                    None if g_cfg.c_dim == 0
                    else torch.zeros(2, g_cfg.c_dim),
                    noise_mode="const", force_fp32=True).numpy()
    err = rel_err(img, img_t)
    report("network_pkl", "torch_golden", "pass" if err < tol else "fail",
           max_rel_err=err, tol=tol)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Verify real pretrained weights against their torch "
                    "artifacts in one command (see module docstring).")
    ap.add_argument("--vgg16", help="NVIDIA vgg16.pt (LPIPS TorchScript)")
    ap.add_argument("--inception",
                    help="FID detector: NVIDIA TorchScript pickle or "
                         "torchvision inception_v3 state dict")
    ap.add_argument("--network_pkl", help="trained StyleGAN2/3 pickle")
    ap.add_argument("--sg_repo",
                    help="path to a stylegan2-ada-pytorch/stylegan3 "
                         "checkout; opts into executing the network "
                         "pickle's embedded torch code for golden parity")
    ap.add_argument("--outdir", default="converted_weights",
                    help="where converted native checkpoints are written")
    ap.add_argument("--tol", type=float, default=1e-3,
                    help="max relative error for forward golden parity")
    ap.add_argument("--fid_tol", type=float, default=0.01,
                    help="max relative FID disagreement (the reference-"
                         "parity claim is FID within 1%%)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the JAX side onto CPU")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.outdir, exist_ok=True)

    any_given = False
    for name, fn, extra in (
            ("vgg16", verify_vgg16, (args.tol,)),
            ("inception", verify_inception, (args.tol, args.fid_tol)),
            ("network_pkl", verify_network_pkl, (args.tol, args.sg_repo))):
        path = getattr(args, name)
        if not path:
            report(name, "all", "skipped", reason="no path given")
            continue
        any_given = True
        if not os.path.isfile(path):
            report(name, "all", "fail", reason=f"file not found: {path}")
            continue
        fn(path, args.outdir, *extra)

    failed = [r for r in RESULTS if r["status"] == "fail"]
    print(json.dumps({
        "verdict": "fail" if failed or not any_given else "pass",
        "checks_run": len([r for r in RESULTS if r["status"] != "skipped"]),
        "failed": len(failed),
        "note": None if any_given else "no artifact paths were given",
    }), flush=True)
    return 1 if failed or not any_given else 0


if __name__ == "__main__":
    raise SystemExit(main())
