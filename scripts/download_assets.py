#!/usr/bin/env python
"""Download the published SafeVLA/SPOC assets: checkpoints, houses, data.

Unified replacement for the reference's four download scripts
(reference scripts/download_{baseline_ckpt,aligned_ckpt,training_data,
objaverse_houses}.py) — same published URLs, stdlib-only (urllib) download:

    python scripts/download_assets.py ckpt --save-dir ckpts --ids objectnav
    python scripts/download_assets.py houses --save-dir houses --subset val
    python scripts/download_assets.py data --save-dir data --types fifteen \
        --task-types ObjectNavType

Torch checkpoints convert to this framework's params via
safevla_tpu.models.convert / InferenceAgent.build (auto-detected).
"""

from __future__ import annotations

import argparse
import os
import sys
import tarfile
import urllib.request

BASELINE_CKPTS = {
    "spoc_IL": "FLaRe_IL_50000.ckpt",
    "fetch": "FLaRe_fetch_sparse_reward_000047079268.pt",
    "pickup": "FLaRe_pickup_sparse_reward_000044088446.pt",
    "roomvisit": "FLaRe_roomvisit_sparse_reward_000017028825.pt",
    "objectnav": "FLaRe_objectnav_sparse_reward_000021026752.pt",
}
CKPT_BASE = "https://pub-4194bc6e8ed3420491581242f2531a56.r2.dev/FLaRe_ckpts"
# safety-aligned checkpoints on HuggingFace
# (reference scripts/download_aligned_ckpt.py:50-54)
ALIGNED_REPO = "SafetyEmbodiedAI/safety-model"
ALIGNED_IDS = ("objnav", "pickup", "fetch")
HF_RESOLVE = "https://huggingface.co/{repo}/resolve/main/{filename}"
HOUSES_BASE = "https://pub-5932b61898254419952f5b13d42d82ab.r2.dev/procthor_objaverse%2F2023_07_28"
DATA_BASE = "https://pub-bebbada739114fa1aa96aaf25c873a66.r2.dev"


def download(url: str, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if os.path.exists(path):
        print(f"exists, skipping: {path}")
        return
    print(f"downloading {url} -> {path}")

    def hook(blocks, block_size, total):
        done = blocks * block_size
        if total > 0:
            pct = min(100, done * 100 // total)
            sys.stdout.write(f"\r  {pct}% ({done >> 20}MB)")
            sys.stdout.flush()

    urllib.request.urlretrieve(url, path + ".part", reporthook=hook)
    os.rename(path + ".part", path)
    print()


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="what", required=True)

    p = sub.add_parser("ckpt", help="baseline IL/RL checkpoints")
    p.add_argument("--save-dir", required=True)
    p.add_argument("--ids", nargs="+", default=list(BASELINE_CKPTS))

    p = sub.add_parser("aligned", help="safety-aligned (SafeVLA) checkpoints")
    p.add_argument("--save-dir", required=True)
    p.add_argument("--ids", nargs="+", default=list(ALIGNED_IDS), choices=ALIGNED_IDS)

    p = sub.add_parser("houses", help="objaverse ProcTHOR houses")
    p.add_argument("--save-dir", required=True)
    p.add_argument("--subset", nargs="+", default=["train", "val"])

    p = sub.add_parser("data", help="training episode tarballs")
    p.add_argument("--save-dir", required=True)
    p.add_argument("--types", default="fifteen", help="dataset collection name")
    p.add_argument("--task-types", nargs="+", default=["ObjectNavType"])
    p.add_argument("--extract", action="store_true")

    args = parser.parse_args()
    if args.what == "ckpt":
        for cid in args.ids:
            fname = BASELINE_CKPTS[cid]
            download(f"{CKPT_BASE}/{fname}", os.path.join(args.save_dir, cid, fname))
    elif args.what == "aligned":
        for cid in args.ids:
            fname = f"safe_{cid}.pt"
            download(
                HF_RESOLVE.format(repo=ALIGNED_REPO, filename=fname),
                os.path.join(args.save_dir, fname),
            )
    elif args.what == "houses":
        for subset in args.subset:
            download(
                f"{HOUSES_BASE}%2F{subset}.jsonl.gz",
                os.path.join(args.save_dir, f"{subset}.jsonl.gz"),
            )
    elif args.what == "data":
        for task_type in args.task_types:
            path = os.path.join(args.save_dir, f"{task_type}.tar.gz")
            download(f"{DATA_BASE}/{args.types}/{task_type}.tar.gz", path)
            if args.extract:
                print(f"extracting {path}")
                with tarfile.open(path) as tf:
                    tf.extractall(args.save_dir)


if __name__ == "__main__":
    main()
