"""Optimization-trajectory GIF builder.

Parity: reference misc/create_gif.py:25-65 — assembles the per-epoch
snapshot PNGs written by the engine's verbose mode (snap_img) into an
animated GIF per sample. cv2/imageio are not in this image; PIL writes
the GIF.
"""

import os
import re

from PIL import Image


def create_gif(snapshot_dir, out_path=None, pattern=r"(.+)_(\d+)\.png$",
               duration_ms=200):
    """Group '<fname>_<epoch>.png' snapshots by fname; write one GIF each."""
    groups = {}
    for f in sorted(os.listdir(snapshot_dir)):
        m = re.match(pattern, f)
        if not m:
            continue
        groups.setdefault(m.group(1), []).append((int(m.group(2)), f))

    outputs = []
    for name, frames in groups.items():
        frames.sort()
        imgs = [Image.open(os.path.join(snapshot_dir, f)).convert("P")
                for _, f in frames]
        if not imgs:
            continue
        out = out_path or os.path.join(snapshot_dir, f"{name}.gif")
        imgs[0].save(out, save_all=True, append_images=imgs[1:],
                     duration=duration_ms, loop=0)
        outputs.append(out)
        print(f"wrote {out} ({len(imgs)} frames)")
    return outputs


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot_dir", required=True)
    ap.add_argument("--duration_ms", type=int, default=200)
    args = ap.parse_args()
    create_gif(args.snapshot_dir, duration_ms=args.duration_ms)
