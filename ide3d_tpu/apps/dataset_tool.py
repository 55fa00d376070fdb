"""Dataset packaging tool (CLI contract: dataset_tool.py / apps/dataset_tool.py).

Converts an image folder (+ optional mask folder + camera-pose json) into the
framework's zip dataset layout: images at a fixed power-of-two resolution,
dataset.json with 25-dim labels, masks mirrored alongside.

Usage:
    python -m ide3d_tpu.apps.dataset_tool --source imgs/ --dest data.zip \
        [--masks masks/ --mask-dest segs.zip] [--resolution 512] [--labels poses.json]
"""

from __future__ import annotations

import argparse
import json
import os
import zipfile


def main(argv=None):
    import numpy as np
    import PIL.Image

    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--dest", required=True)
    ap.add_argument("--masks", default=None)
    ap.add_argument("--mask-dest", default=None)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--labels", default=None,
                    help="json {fname: 25-dim label}; default dataset.json in source")
    args = ap.parse_args(argv)

    exts = {".png", ".jpg", ".jpeg", ".webp"}
    fnames = sorted(
        f for f in os.listdir(args.source) if os.path.splitext(f)[1].lower() in exts
    )
    assert fnames, f"no images in {args.source}"

    labels = None
    label_path = args.labels or os.path.join(args.source, "dataset.json")
    if os.path.exists(label_path):
        with open(label_path) as f:
            data = json.load(f)
        labels = dict(data["labels"]) if "labels" in data else data

    R = args.resolution
    out_labels = []
    with zipfile.ZipFile(args.dest, "w", zipfile.ZIP_STORED) as zf:
        for i, fname in enumerate(fnames):
            img = PIL.Image.open(os.path.join(args.source, fname)).convert("RGB")
            if img.size != (R, R):
                img = img.resize((R, R), PIL.Image.LANCZOS)
            arcname = f"img{i:08d}.png"
            import io as _io

            buf = _io.BytesIO()
            img.save(buf, "PNG")
            zf.writestr(arcname, buf.getvalue())
            if labels is not None and fname in labels:
                out_labels.append([arcname, labels[fname]])
        if out_labels:
            zf.writestr("dataset.json", json.dumps({"labels": out_labels}))
    print(f"wrote {args.dest}: {len(fnames)} images" +
          (f", {len(out_labels)} labels" if out_labels else ""))

    if args.masks:
        dest = args.mask_dest or args.dest.replace(".zip", "_seg.zip")
        mask_names = sorted(
            f for f in os.listdir(args.masks) if os.path.splitext(f)[1].lower() in exts
        )
        with zipfile.ZipFile(dest, "w", zipfile.ZIP_STORED) as zf:
            for i, fname in enumerate(mask_names):
                m = PIL.Image.open(os.path.join(args.masks, fname)).convert("L")
                if m.size != (R, R):
                    m = m.resize((R, R), PIL.Image.NEAREST)
                import io as _io

                buf = _io.BytesIO()
                m.save(buf, "PNG")
                zf.writestr(f"img{i:08d}.png", buf.getvalue())
        print(f"wrote {dest}: {len(mask_names)} masks")


if __name__ == "__main__":
    main()
