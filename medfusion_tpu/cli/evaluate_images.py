"""FID + Improved Precision/Recall between two image folders.

CLI parity with ``/root/reference/scripts/evaluate_images.py``: uint8-preserving
image loading (:33), InceptionV3-2048 features, FID + IPR(knn=3) (:71-73),
batch 100, timestamped logging (:27-30).

Usage:
  python -m medfusion_tpu.cli.evaluate_images --real path/a --fake path/b \
      [--inception-weights weights.npz]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import numpy as np
from PIL import Image

from medfusion_tpu.metrics import (
    FrechetInceptionDistance,
    ImprovedPrecisionRecall,
    InceptionV3,
)

EXTS = {".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp"}


def iter_uint8_batches(folder, batch_size, size=None):
    paths = sorted(p for p in Path(folder).rglob("*") if p.suffix.lower() in EXTS)
    assert paths, f"no images under {folder}"
    batch = []
    for path in paths:
        img = Image.open(path).convert("RGB")
        if size is not None:
            img = img.resize((size, size), Image.BILINEAR)
        batch.append(np.asarray(img, np.uint8))
        if len(batch) == batch_size:
            yield np.stack(batch)
            batch = []
    if batch:
        yield np.stack(batch)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--real", required=True)
    ap.add_argument("--fake", required=True)
    ap.add_argument("--batch-size", type=int, default=100)
    ap.add_argument("--size", type=int, default=None,
                    help="resize images to SIZE x SIZE before featurizing")
    ap.add_argument("--inception-weights", default=None,
                    help=".npz of converted torch-fidelity weights; random init otherwise")
    ap.add_argument("--out", default="results/metrics")
    args = ap.parse_args(argv)

    net = InceptionV3()
    x0 = np.zeros((1, 64, 64, 3), np.uint8)
    params = net.init(jax.random.PRNGKey(0), x0)["params"]
    if args.inception_weights:
        from medfusion_tpu.metrics.inception import convert_torch_inception

        raw = np.load(args.inception_weights)
        params = convert_torch_inception({k: raw[k] for k in raw.files})
    else:
        # auto-pickup of an ingested artifact (cli/ingest_weights) — the
        # one-file-copy path to reference-protocol FID
        from medfusion_tpu.utils import pretrained as PT

        ingested = PT.load_pretrained(PT.INCEPTION)
        if ingested is not None:
            params = ingested
            print(f"using ingested InceptionV3 weights from "
                  f"{PT.weights_dir() / PT.INCEPTION}")
        else:
            print("WARNING: no pretrained InceptionV3 available — features "
                  "are a random projection; FID/P/R are self-consistent but "
                  "NOT comparable to published numbers (ingest the torch "
                  "weights via cli/ingest_weights for parity)")
    featurize = jax.jit(lambda x: net.apply({"params": params}, x))

    fid = FrechetInceptionDistance()
    ipr = ImprovedPrecisionRecall(knn=3)
    for real_flag, folder in [(True, args.real), (False, args.fake)]:
        n = 0
        for batch in iter_uint8_batches(folder, args.batch_size, size=args.size):
            feats = featurize(batch)
            fid.update(feats, real=real_flag)
            ipr.update(feats, real=real_flag)
            n += batch.shape[0]
        print(f"{'real' if real_flag else 'fake'}: {n} images featurized")

    fid_val = fid.compute()
    precision, recall = ipr.compute()
    result = {"FID": fid_val, "precision": precision, "recall": recall,
              "time": time.strftime("%Y-%m-%d %H:%M:%S")}
    print(json.dumps(result))
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / f"metrics_{time.strftime('%Y_%m_%d_%H%M%S')}.json").write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
