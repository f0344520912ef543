#!/usr/bin/env python
"""Post-hoc breakdown of a closed-loop checkpoint (VERDICT r4 #1).

Loads the TrainState checkpoint a tools/traineval_closedloop.py run left in
<data-dir>/ckpt, re-runs the streaming eval on <data-dir>/infos.pkl, and
prints what the single mAP number hides:

  * per-class, per-distance-threshold AP (the 10-class devkit average
    includes the 7 classes a 3-class synthetic set cannot contain — those
    score AP=0 by construction, capping mAP at 0.3);
  * present-class mAP/NDS (the saturation-free overfit measure);
  * TP error means (translation/scale/orientation/velocity/attribute);
  * score and translation-error distributions of the matched detections
    at the 2 m TP threshold.

Usage:
  python tools/traineval_diag.py --data-dir /tmp/traineval_r04_data \
      [--config tiny] [--out TRAINEVAL_diag.json]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--config", default="tiny")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (default <data-dir>/ckpt)")
    ap.add_argument("--cfg-options", nargs="*", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from PIL import Image
    from toc3d_tpu.configs import get_config
    from toc3d_tpu.configs.presets import apply_overrides
    from toc3d_tpu.data.nuscenes import NuScenesInfos, AugConfig
    from toc3d_tpu.runtime.checkpoint import load_params
    from toc3d_tpu.runtime.nusc_metrics import DIST_THS, DIST_TH_TP
    from traineval_closedloop import run_eval

    cfg = get_config(args.config)
    if args.cfg_options:
        cfg = apply_overrides(cfg, args.cfg_options)

    pkl = os.path.join(args.data_dir, "infos.pkl")
    infos = NuScenesInfos(pkl)
    # source image size from the dataset itself (the closed-loop tool pins
    # train aug to the deterministic eval scale derived from it)
    cam0 = next(iter(infos.infos[0]["cams"].values()))
    with Image.open(cam0["data_path"]) as im:
        src_w, src_h = im.size
    fh, fw = cfg.pad_shape
    s = max(fh / src_h, fw / src_w)
    aug = AugConfig(final_dim=cfg.pad_shape, H=src_h, W=src_w,
                    rand_flip=False, resize_lim=(s, s))

    ckpt = os.path.abspath(args.ckpt or os.path.join(args.data_dir, "ckpt"))
    restored = load_params(ckpt)          # raw TrainState dict
    params = restored["params"] if "params" in restored else restored
    step = int(np.asarray(restored.get("step", -1)))

    summary, detail = run_eval(cfg, params, infos, aug, full=True)
    m, mp = detail["all"], detail["present"]
    present = detail["present_classes"]

    print(f"\ncheckpoint step {step}, {len(infos)} samples, "
          f"present classes: {', '.join(present)}")
    print(f"10-class  mAP {summary['mAP']:.4f}  NDS {summary['NDS']:.4f}   "
          f"(ceiling {len(present)/10:.1f} with {len(present)} present "
          f"classes)")
    print(f"present   mAP {summary['mAP_present']:.4f}  "
          f"NDS {summary['NDS_present']:.4f}")

    print("\nper-class AP by center-distance threshold (present classes):")
    hdr = "  ".join(f"{th:>5}m" for th in DIST_THS)
    print(f"  {'class':<14} {hdr}   mean")
    per_class = {}
    for cls in present:
        aps = [m["label_aps"][cls][th] for th in DIST_THS]
        per_class[cls] = {str(th): round(ap, 4)
                          for th, ap in zip(DIST_THS, aps)}
        row = "  ".join(f"{ap:6.4f}" for ap in aps)
        print(f"  {cls:<14} {row}   {np.mean(aps):6.4f}")

    print(f"\nTP errors at {DIST_TH_TP}m (present-class eval):")
    for k, v in mp["tp_errors"].items():
        print(f"  {k:<12} {v:.4f}")

    # matched-detection score / translation-error distributions (2 m match)
    gt_all, pred_all = detail["gt"], detail["results"]
    scores_m, terrs, scores_un = [], [], []
    for tok, preds in pred_all.items():
        gts = [g for g in gt_all.get(tok, ())]
        taken = set()
        for p in sorted(preds, key=lambda b: -b["detection_score"]):
            if p["detection_name"] not in present:
                continue
            best, bd = None, float("inf")
            for gi, g in enumerate(gts):
                if gi in taken or g["detection_name"] != p["detection_name"]:
                    continue
                d = float(np.hypot(p["translation"][0] - g["translation"][0],
                                   p["translation"][1] - g["translation"][1]))
                if d < bd:
                    best, bd = gi, d
            if best is not None and bd < DIST_TH_TP:
                taken.add(best)
                scores_m.append(p["detection_score"])
                terrs.append(bd)
            else:
                scores_un.append(p["detection_score"])

    def stats(x):
        if not x:
            return {}
        x = np.asarray(x)
        return {"n": len(x), "mean": round(float(x.mean()), 4),
                "p50": round(float(np.percentile(x, 50)), 4),
                "p90": round(float(np.percentile(x, 90)), 4),
                "max": round(float(x.max()), 4)}

    print(f"\nmatched detections   score {stats(scores_m)}")
    print(f"                  trans_err {stats(terrs)}")
    print(f"unmatched (dups/fp)  score {stats(scores_un)}")

    out = {
        "step": step, "samples": len(infos),
        "present_classes": list(present), **summary,
        "label_aps_present": per_class,
        "tp_errors_present": {k: round(float(v), 4)
                              for k, v in mp["tp_errors"].items()},
        "matched_score": stats(scores_m),
        "matched_trans_err": stats(terrs),
        "unmatched_score": stats(scores_un),
        "ceiling_note": ("devkit mAP averages all 10 nuScenes classes; "
                         f"{len(present)} present -> 10-class ceiling "
                         f"{len(present)/10:.1f}"),
    }
    line = json.dumps(out)
    print("\n" + line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
