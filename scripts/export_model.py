"""Export a trained generator/discriminator as a serialized StableHLO
artifact for production serving.

The reference deploys its torch pickles by shipping Python + CUDA ops
with them (persistence.py re-executes embedded source at load time).
The TPU-native serving story needs neither Python model code nor
pickles at inference time: `jax.export` lowers the jitted forward to
StableHLO, serializes it (with the trained weights baked in as
constants), and any PJRT runtime — C++ serving stacks, other hosts,
other JAX versions — can deserialize and call it. One artifact, no
model source, no unpickling of untrusted code at the serving edge.

    python scripts/export_model.py --checkpoint runs/ckpt.pkl \
        --out g.stablehlo [--which g|d] [--batch 0] [--truncation 1.0]

--batch 0 (default) exports with a SYMBOLIC batch dimension: one
artifact serves any batch size (the MXU-friendly move is still to pad
to a few bucketed sizes at the serving layer). The discriminator's
minibatch-stddev groups need a concrete batch — -which d requires
--batch N.

Round-trip consumer (no model code needed):

    from jax import export
    g = export.deserialize(open('g.stablehlo', 'rb').read())
    imgs = g.call(z)            # [B, z_dim] -> [B, C, H, W]

Reference counterpart: the pickle+persistence deployment path this
replaces (/root/reference/models/stylegan3/torch_utils/persistence.py).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_export(checkpoint, which='g', batch=0, truncation=1.0,
                 platforms=('cpu', 'tpu')):
    """Load `checkpoint` and export the requested network. Returns the
    jax.export.Exported object (call .serialize() for the artifact)."""
    import jax
    import jax.numpy as jnp
    from jax import export

    from latentaugment_tpu.models.stylegan2 import convert, networks
    from latentaugment_tpu.models import networks_for

    g_params, g_cfg, d_params, d_cfg = convert.load_stylegan(checkpoint)

    if which == 'g':
        cfg, params = g_cfg, g_params
        gnet = networks_for(cfg)  # SG2 or the alias-free (SG3) family
        lead = export.symbolic_shape('b')[0] if not batch else int(batch)
        data_spec = jax.ShapeDtypeStruct((lead, cfg.z_dim), jnp.float32)

        def fn(z, c=None):
            return gnet.generator_apply(
                params, cfg, z, c=c, truncation_psi=truncation,
                noise_mode='const')
    elif which == 'd':
        if d_params is None:
            raise ValueError(f'{checkpoint} has no discriminator')
        if not batch:
            raise ValueError('--which d needs a concrete --batch '
                             '(minibatch-stddev groups over the batch)')
        cfg, params = d_cfg, d_params
        data_spec = jax.ShapeDtypeStruct(
            (int(batch), cfg.img_channels, cfg.img_resolution,
             cfg.img_resolution), jnp.float32)

        def fn(img, c=None):
            return networks.discriminator_apply(params, cfg, img, c=c)
    else:
        raise ValueError(f'unknown --which {which!r}')

    # Unconditional nets export a one-argument callable; conditional a
    # two-argument (data, one-hot labels) one. Same lead dim on both.
    specs = [data_spec]
    if cfg.c_dim:
        specs.append(jax.ShapeDtypeStruct((data_spec.shape[0], cfg.c_dim),
                                          jnp.float32))
        wrapped = fn
    else:
        def wrapped(x):
            return fn(x)
    return export.export(jax.jit(wrapped), platforms=platforms)(*specs)


def main(argv=None):
    p = argparse.ArgumentParser(
        description='Export a checkpoint as a StableHLO serving artifact')
    p.add_argument('--checkpoint', required=True,
                   help='native or NVIDIA-pickle checkpoint')
    p.add_argument('--out', required=True, help='artifact path')
    p.add_argument('--which', choices=['g', 'd'], default='g')
    p.add_argument('--batch', type=int, default=0,
                   help='0 = symbolic batch dim (G only); N = concrete')
    p.add_argument('--truncation', type=float, default=1.0,
                   help='truncation psi baked into the G export')
    p.add_argument('--platforms', default='cpu,tpu',
                   help='comma-separated lowering platforms')
    p.add_argument('--cpu', action='store_true',
                   help='force the CPU jax backend (tracing only needs '
                        'host compute; the artifact still targets '
                        '--platforms)')
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    exported = build_export(
        args.checkpoint, which=args.which, batch=args.batch,
        truncation=args.truncation,
        platforms=tuple(args.platforms.split(',')))
    blob = exported.serialize()
    with open(args.out, 'wb') as f:
        f.write(blob)
    shapes = ', '.join(str(s.shape) for s in exported.in_avals)
    print(f'[export] {args.which.upper()} -> {args.out} '
          f'({len(blob) / 1e6:.1f} MB, inputs [{shapes}], '
          f'platforms {exported.platforms})')


if __name__ == '__main__':
    main()
