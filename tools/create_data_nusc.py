#!/usr/bin/env python
"""nuScenes temporal info-pkl creation (with embedded 2D annotations).

Parity target: reference tools/create_data_nusc.py +
tools/data_converter/nuscenes_converter.py. Reads the raw nuScenes JSON
tables directly (devkit-free, toc3d_tpu/data/convert.py); the official
train/val split is taken from the devkit when installed, else pass
--val-scenes FILE (one scene name per line) or everything lands in the
val pkl.

Usage: python tools/create_data_nusc.py --data-root data/nuscenes \\
           --version v1.0-trainval [--val-scenes val_scenes.txt]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--val-scenes", default=None,
                    help="file with one val scene name per line")
    args = ap.parse_args()

    from toc3d_tpu.data.convert import create_nuscenes_infos

    val_names = None
    if args.val_scenes:
        with open(args.val_scenes) as f:
            val_names = {line.strip() for line in f if line.strip()}

    paths = create_nuscenes_infos(args.data_root, args.version,
                                  args.out_dir, val_names)
    for p in paths:
        print("wrote", p)


if __name__ == "__main__":
    main()
